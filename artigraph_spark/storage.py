"""Storage: path templating, partition generation, and discovery.

Parity with /root/reference/src/arti/storage/ (templating :124-157,
generate_partition :193-222; local discovery local.py:45-58; spec parsing
_internal.py:114-183): a Storage declares a path *template* with
placeholders that are late-bound as the artifact is attached to a graph
({graph_name}, {names}, {name}), built ({input_fingerprint}) and
partitioned ({partition_key_spec} — rendered as Hive-style ``key=value``
segments so Spark tooling and the template system agree on layout).

Content fingerprints default to file-status metadata (name, size, mtime) —
at 100 TB, hashing bytes is a non-starter; ``strict=True`` switches to
sha256 of the bytes (the reference's local behavior, local.py:22-27). The
fingerprint *algebra* (XOR combine, path-independence) is unchanged either
way.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os
import re
from urllib.parse import quote, unquote
from typing import Any, ClassVar

from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.internal.models import Model
from artigraph_spark.partitions import PartitionField, PartitionKey

_FP_SEGMENT = "_fingerprint={input_fingerprint}"

# Object-store commit manifest: a single-object PUT of this file flips a
# partition's visible file set atomically (object stores have no atomic
# multi-file rename; single-object writes ARE atomic — the property the
# reference's single-object GCS uploads rely on,
# /root/reference/src/arti/storage/google/cloud/storage.py:28-64).
MANIFEST_NAME = "_MANIFEST.json"


def _read_object_manifest(fs: Any, root: str) -> dict | None:
    """Load a partition's commit manifest, or None when the partition uses
    the legacy unmanifested layout (files directly under the path) — or
    when the manifest parses but has the wrong shape (not a dict with a
    string ``commit``): a reader must degrade to the legacy layout, never
    crash on a foreign/corrupt manifest."""
    import json

    from pyarrow import fs as pafs

    mpath = f"{root.rstrip('/')}/{MANIFEST_NAME}"
    if fs.get_file_info(mpath).type != pafs.FileType.File:
        return None
    try:
        with fs.open_input_stream(mpath) as fh:
            manifest = json.loads(fh.read().decode("utf-8"))
    except (json.JSONDecodeError, UnicodeDecodeError):
        return None  # unparseable bytes degrade exactly like a wrong shape
    if not isinstance(manifest, dict) or not isinstance(manifest.get("commit"), str):
        return None
    return manifest

# Internal discovery marker standing in for "{input_fingerprint}" while the
# spec is turned into a glob (→ "*") and parse regex (→ signed-int capture).
_FP_WILDCARD = "\x00FP\x00"

# Per-component key placeholder: "{date.Y}", "{i.value:02}", "{x.hex}" — the
# reference's template form (tests/arti/storage/test_storage.py:192-213 uses
# "{i.value:02}/{input_fingerprint}"). The optional ":spec" is a std format
# spec applied to the TYPED component value.
_KEY_PH_RX = re.compile(r"\{(?P<name>\w+)\.(?P<component>\w+)(?::(?P<spec>[^}]+))?\}")


def _collapse_slashes(path: str) -> str:
    """Collapse duplicate slashes WITHOUT corrupting URI schemes: the
    "scheme://" separator survives intact — including the empty-authority
    file:/// form, whose third slash begins the PATH and must not fold into
    the separator (a lookbehind-on-':' collapse turned file:///tmp into
    file://tmp, relocating the root into the authority)."""
    if "://" in path:
        scheme, rest = path.split("://", 1)
        return scheme + "://" + re.sub(r"//+", "/", rest)
    return re.sub(r"//+", "/", path)


def _strip_file_scheme(path: str) -> str:
    """file:// URI → plain filesystem path (os/glob calls take paths)."""
    if path.startswith("file://"):
        return path[len("file://") :] or "/"
    return path


class StoragePartition(Model):
    """One physical partition: concrete path + key + the input fingerprint it
    was built from (+ content fingerprint once snapshotted)."""

    path: str
    partition_key: PartitionKey = PartitionKey.not_partitioned()
    input_fingerprint: Fingerprint = Fingerprint.empty()
    content_fingerprint: Fingerprint = Fingerprint.empty()
    # Literal partitions carry their data INLINE (the reference's
    # StringLiteralPartition.value, storage/literal.py): the catalog is the
    # storage plane, so producer outputs bound to StringLiteral storage
    # round-trip through the backend, not the filesystem.
    value: str | None = None

    def compute_content_fingerprint(self, *, strict: bool = False) -> StoragePartition:
        if self.path.startswith("literal://"):
            if self.value is None:
                raise FileNotFoundError(
                    f"literal partition {self.path} has no value"
                )
            fp = Fingerprint.from_string(self.value)
        else:
            fp = _fingerprint_path(self.path, strict=strict)
        return self.model_copy(update={"content_fingerprint": fp})


def _fingerprint_path(path: str, *, strict: bool = False) -> Fingerprint:
    """Fingerprint a file or directory tree.

    Fast mode hashes (relpath, size, mtime_ns) per file — O(#files) metadata
    calls, no data reads; on a cluster this is a cheap listing job. Strict
    mode streams sha256 over the bytes. Scheme-qualified paths route to the
    object-store implementation (same contract over a prefix listing).
    """
    if "://" in path and not path.startswith("file://"):
        return _fingerprint_object_uri(path, strict=strict)
    # file:// URIs are local-filesystem paths to every os-level call below
    # (a LocalFile root MAY be file://-qualified; io.atomic_dir_write strips
    # the same prefix) — without this, a successful write is followed by
    # FileNotFoundError from the fingerprint pass.
    path = _strip_file_scheme(path)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    files = []
    if os.path.isdir(path):
        for root, _dirs, names in os.walk(path):
            for n in sorted(names):
                files.append(os.path.join(root, n))
        files.sort()
    else:
        files = [path]
    fp = Fingerprint.identity()
    for f in files:
        rel = os.path.relpath(f, path)
        if strict:
            # The relpath is part of the digest: the combine is XOR, so two
            # files with IDENTICAL bytes would otherwise cancel to the
            # identity — a partition of two duplicate part files would
            # fingerprint the same as an empty one. The NUL terminator makes
            # the framing unambiguous: without it, (rel='ab', bytes 'c…') and
            # (rel='a', bytes 'bc…') share a digest and can still cancel.
            h = hashlib.sha256(rel.encode() + b"\x00")
            with open(f, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            part = Fingerprint.from_bytes(h.digest())
        else:
            st = os.stat(f)
            part = Fingerprint.from_string(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
        fp = fp.combine(part)
    return fp


def _build_discovery_spec(
    template: str, key_types: dict[str, type[PartitionField]]
) -> tuple[str, re.Pattern[str], bool, str]:
    """Render a storage template into (glob pattern, parse regex, has_fp) —
    the shared half of partition discovery. Candidate ENUMERATION is
    per-storage (filesystem glob vs object listing); the spec/parse contract
    is identical, so it lives once here.

    ``{partition_key_spec}`` expands to Hive-style default-component segments;
    explicit ``{name.component}`` placeholders anywhere in the template are
    ALSO discovery spec (reference parse_spec semantics,
    /root/reference/src/arti/storage/_internal.py:114-183): each becomes a
    named capture, repeated placeholders must agree (backreference), and all
    components of one field merge through ``from_components``."""
    key_spec = "/".join(
        f"{name}={{{name}.{key_types[name].default_component}}}"
        for name in sorted(key_types)
    )
    pattern = template.replace("{partition_key_spec}", key_spec)
    # Both the standard "_fingerprint={input_fingerprint}" segment AND a bare
    # "{input_fingerprint}" anywhere in the path (reference layout, e.g.
    # ".../{date.d}/{input_fingerprint}/test") are discovery spec.
    has_fp = "{input_fingerprint}" in pattern
    pattern = pattern.replace("{input_fingerprint}", _FP_WILDCARD)
    pattern = _collapse_slashes(pattern)

    # Strip empty trailing segments exactly like generate_partition does —
    # otherwise discovery would return ".../t/t/" while generation returns
    # ".../t/t" and the SAME physical data gets two catalog identities
    # (backends key partitions by path).
    if len(pattern) > 1 and not pattern.endswith("://"):
        pattern = pattern.rstrip("/")

    placeholders = list(_KEY_PH_RX.finditer(pattern))
    for m in placeholders:
        if m.group("name") not in key_types:
            raise ValueError(
                f"No {m.group('name')!r} partition key found, expected one of "
                f"{tuple(sorted(key_types))}"
            )
    found = {m.group("name") for m in placeholders}
    if found != set(key_types):
        raise ValueError(
            f"Expected to find partition fields for {sorted(key_types)}, "
            f"only found {sorted(found)}."
        )
    # Validate each field's captured component set is one from_components can
    # actually rebuild — otherwise every candidate path would silently fail
    # to parse and discovery would report no data for data that exists.
    for name in found:
        captured = frozenset(
            m.group("component") for m in placeholders if m.group("name") == name
        )
        if captured not in key_types[name].component_sets:
            raise ValueError(
                f"Cannot reconstruct partition field {name!r} from components "
                f"{sorted(captured)}; {key_types[name].__name__} supports "
                f"{[sorted(s) for s in key_types[name].component_sets]}"
            )

    # Glob-ESCAPE the static text between placeholders: a graph name or root
    # containing glob metacharacters ('exp[1]', 'run?') writes to the literal
    # path, so an unescaped glob would silently discover nothing for data
    # that exists. Placeholder positions become '*' AFTER escaping.
    chunks, last = [], 0
    for m in _KEY_PH_RX.finditer(pattern):
        chunks.append(_glob.escape(pattern[last : m.start()]))
        chunks.append("*")
        last = m.end()
    chunks.append(_glob.escape(pattern[last:]))
    glob_pattern = "".join(chunks).replace(_glob.escape(_FP_WILDCARD), "*")
    # Longest static prefix of the UNESCAPED path (text before the first
    # placeholder, trimmed to a whole segment) — object-store discovery lists
    # under this raw prefix rather than globbing.
    first_dynamic = min(
        [m.start() for m in _KEY_PH_RX.finditer(pattern)]
        + ([pattern.index(_FP_WILDCARD)] if _FP_WILDCARD in pattern else [])
        + [len(pattern)]
    )
    static_prefix = pattern[:first_dynamic].rsplit("/", 1)[0]
    # Group names carry the format spec: occurrences of the same component
    # with the SAME spec render identical text (→ backreference); different
    # specs render differently ("05" vs "5") and get independent captures.
    regex_src, group_by_key, variants, last = "", {}, {}, 0
    for m in placeholders:
        regex_src += re.escape(pattern[last : m.start()])
        gkey = (m.group("name"), m.group("component"), m.group("spec"))
        gname = group_by_key.get(gkey)
        if gname is not None:
            regex_src += f"(?P={gname})"
        else:
            base = (m.group("name"), m.group("component"))
            n = variants[base] = variants.get(base, 0) + 1
            suffix = "" if n == 1 else f"__v{n}"
            gname = f"k_{m.group('name')}__{m.group('component')}{suffix}"
            group_by_key[gkey] = gname
            regex_src += f"(?P<{gname}>[^/]+)"
        last = m.end()
    regex_src += re.escape(pattern[last:])
    regex_src = regex_src.replace(
        re.escape(_FP_WILDCARD), r"(?P<fp>-?\d+)", 1
    ).replace(re.escape(_FP_WILDCARD), r"(?P=fp)")
    return glob_pattern, re.compile("^" + regex_src + "$"), has_fp, static_prefix


def _parse_partition_path(
    path: str,
    rx: re.Pattern[str],
    key_types: dict[str, type[PartitionField]],
    has_fp: bool,
) -> StoragePartition | None:
    """Parse one candidate path against the discovery regex; None if it does
    not match the spec or a key value fails its field parser."""
    # Reserved engine-internal namespace: io.atomic_dir_write stages under
    # "<path>.__tmp_<token>__" and parks overwritten content at
    # "<path>.__old_<token>__"; io.atomic_object_commit stages object-store
    # file sets under "<path>/.__commit_<token>__/". Discovery must NEVER
    # surface any of them — a string-typed partition key at the end of a
    # template would otherwise parse a half-written staging dir as a
    # phantom partition.
    if ".__tmp_" in path or ".__old_" in path or ".__commit_" in path:
        return None
    m = rx.match(path)
    if not m:
        return None
    by_name: dict[str, dict[str, str]] = {}
    for gname, text in m.groupdict().items():
        if gname.startswith("k_") and text is not None:
            # Group names are k_<name>__<component>[__vN]. Key names may
            # themselves contain "__", but components never do — so strip the
            # variant suffix (repeated differently-specced placeholders parse
            # equivalently: "05" vs "5") and split from the RIGHT.
            base = re.sub(r"__v\d+$", "", gname[2:])
            name, component = base.rsplit("__", 1)
            by_name.setdefault(name, {})[component] = unquote(text)
    if set(by_name) != set(key_types):
        return None
    fields: dict[str, PartitionField] = {}
    for name, comps in by_name.items():
        try:
            fields[name] = key_types[name].from_components(**comps)
        except ValueError:
            return None
    try:
        fp = (
            Fingerprint.from_int(int(m.group("fp")))
            if has_fp and m.groupdict().get("fp")
            else Fingerprint.empty()
        )
    except ValueError:
        return None  # out-of-int64 junk in a _fingerprint segment: not ours
    return StoragePartition(
        path=path, partition_key=PartitionKey(fields=fields), input_fingerprint=fp
    )


class Storage(Model):
    """Abstract storage template."""

    includes_input_fingerprint_template: ClassVar[bool] = True

    def resolve_templates(self, **values: str) -> Storage:
        raise NotImplementedError

    def generate_partition(
        self, key: PartitionKey, input_fingerprint: Fingerprint
    ) -> StoragePartition:
        raise NotImplementedError

    def discover_partitions(
        self, key_types: dict[str, type[PartitionField]]
    ) -> list[StoragePartition]:
        raise NotImplementedError


class LocalFile(Storage):
    """Local-filesystem (or any POSIX-mounted / object-store-fuse) storage.

    Template placeholders: {graph_name} {names} {name} {partition_key_spec}
    {input_fingerprint}. Raw (non-produced) artifacts get the fingerprint
    segment stripped on graph assignment, mirroring the reference
    (/root/reference/src/arti/graphs/__init__.py:64-78).
    """

    root: str = "/tmp/artigraph_spark"
    template: str = (
        "{root}/{graph_name}/{path_tags}/{names}/{name}/{partition_key_spec}/" + _FP_SEGMENT
    )
    format_extension: str = ""

    def resolve_templates(self, **values: str) -> LocalFile:
        template = self.template
        if values.pop("strip_input_fingerprint", False):
            template = template.replace("/" + _FP_SEGMENT, "")
        values.setdefault("root", self.root)
        values.setdefault("path_tags", "")  # empty segment collapses away
        for k, v in values.items():
            template = template.replace("{" + k + "}", str(v))
        template = _collapse_slashes(template)
        return self.model_copy(update={"template": template})

    # -- concrete path generation -------------------------------------------

    def _render_key_spec(self, key: PartitionKey) -> str:
        if key.is_not_partitioned:
            return ""
        # Percent-escape values so '/', '=', '%' in partition values can't
        # inject path segments discovery would never re-match.
        return "/".join(
            f"{name}={quote(str(field.components[field.default_component]), safe='')}"
            for name, field in sorted(key.fields.items())
        )

    def generate_partition(
        self, key: PartitionKey, input_fingerprint: Fingerprint
    ) -> StoragePartition:
        path = self.template.replace("{partition_key_spec}", self._render_key_spec(key))

        # Explicit per-component placeholders ({date.Y}, {i.value:02}) — the
        # reference's custom-template contract incl. its error shapes
        # (tests/arti/storage/test_storage.py:192-237).
        refs = {m.group("name") for m in _KEY_PH_RX.finditer(path)}
        if refs and key.is_not_partitioned:
            raise ValueError(
                f"Expected partition key with {tuple(sorted(refs))} but none were passed"
            )
        if not key.is_not_partitioned and "{partition_key_spec}" not in self.template:
            if not refs:
                raise ValueError(f"Expected no partition key but got: {key.values()!r}")
            missing = refs - set(key.fields)
            if missing:
                raise KeyError(sorted(missing)[0])
            unreferenced = set(key.fields) - refs
            if unreferenced:
                # A field the template never renders means distinct keys
                # would collide onto one path and overwrite each other.
                raise ValueError(
                    f"Partition key fields {sorted(unreferenced)} are not "
                    "referenced by the path template; distinct keys would "
                    "collide onto the same path"
                )

        def _render(m: re.Match[str]) -> str:
            name, component, spec = m.group("name", "component", "spec")
            if name not in key.fields:
                raise KeyError(name)
            value = key.fields[name].component_value(component)
            return quote(format(value, spec) if spec else str(value), safe="")

        path = _KEY_PH_RX.sub(_render, path)

        if input_fingerprint.is_empty:
            path = path.replace("/" + _FP_SEGMENT, "")
            if "{input_fingerprint}" in path:
                raise ValueError(
                    f"{type(self).__name__} requires an input_fingerprint, "
                    "but none was provided"
                )
        else:
            if "{input_fingerprint}" not in path:
                raise ValueError(
                    f"{type(self).__name__} does not specify a "
                    "{input_fingerprint} template, but an input_fingerprint "
                    "was provided"
                )
            path = path.replace("{input_fingerprint}", str(input_fingerprint.key))
        path = _collapse_slashes(path)
        if len(path) > 1 and not path.endswith("://"):
            path = path.rstrip("/")  # empty trailing segments (no key, no fp)
        if "{" in path:
            raise ValueError(f"unresolved placeholders remain in {path!r}")
        if ".__tmp_" in path or ".__old_" in path or ".__commit_" in path:
            # quote() leaves '.' and '_' unescaped, so a key value could
            # render into the reserved staging/backup namespace — which
            # discovery unconditionally rejects. Writing there would make
            # the data permanently undiscoverable; fail at generation.
            raise ValueError(
                f"partition path {path!r} collides with the reserved "
                "'.__tmp_'/'.__old_'/'.__commit_' staging namespace"
            )
        return StoragePartition(
            path=path, partition_key=key, input_fingerprint=input_fingerprint
        )

    # -- discovery (glob + parse) -------------------------------------------

    def discover_partitions(
        self, key_types: dict[str, type[PartitionField]]
    ) -> list[StoragePartition]:
        pattern, rx, has_fp, _prefix = _build_discovery_spec(self.template, key_types)
        # A file://-rooted template globs as a plain path; matched paths get
        # the scheme back so they satisfy the parse regex (built from the
        # template) and the catalog keeps one identity per partition.
        scheme = "file://" if pattern.startswith("file://") else ""
        # include_hidden: a bare "{s.value}" component may render a
        # dot-leading segment that glob's "*" would otherwise skip, making
        # discovery blind to partitions generate_partition just wrote.
        parsed = (
            _parse_partition_path(scheme + path, rx, key_types, has_fp)
            for path in sorted(
                _glob.glob(_strip_file_scheme(pattern), include_hidden=True)
            )
        )
        return [p for p in parsed if p is not None]


# --- object-store storage ----------------------------------------------------

# scheme -> factory(uri) returning (pyarrow.fs.FileSystem, path_within_fs).
# Lets tests (and exotic deployments) mount a filesystem for a scheme without
# credentials; unregistered schemes resolve through pyarrow's own
# FileSystem.from_uri (s3://, gs://, hdfs://, ...).
_FS_FACTORIES: dict[str, Any] = {}

# scheme -> checksum(fs, path) returning a provider-reported content checksum
# string (e.g. GCS md5Hash/crc32c, S3 ETag) or None when the provider has
# none for that object. pyarrow's public FileInfo carries only
# path/size/mtime, so provider checksums must come through this hook.
_FS_CHECKSUMS: dict[str, Any] = {}


def register_filesystem(scheme: str, factory: Any, *, checksum: Any = None) -> None:
    """Mount a filesystem factory for a URI scheme; optionally supply a
    ``checksum(fs, path) -> str | None`` hook exposing provider-side content
    checksums, which upgrades fast-mode fingerprints from (size, mtime)
    identity to true content identity at metadata cost — the reference's GCS
    behavior (/root/reference/src/arti/storage/google/cloud/storage.py:28-33
    prefers md5Hash, falls back to crc32c)."""
    _FS_FACTORIES[scheme] = factory
    if checksum is not None:
        _FS_CHECKSUMS[scheme] = checksum
    else:
        _FS_CHECKSUMS.pop(scheme, None)


def _resolve_fs(uri: str) -> tuple[Any, str]:
    scheme = uri.split("://", 1)[0]
    if scheme in _FS_FACTORIES:
        return _FS_FACTORIES[scheme](uri)
    from pyarrow import fs as pafs  # public pyarrow filesystem API

    return pafs.FileSystem.from_uri(uri)


def _fingerprint_object_uri(uri: str, *, strict: bool = False) -> Fingerprint:
    """Object-store twin of ``_fingerprint_path``.

    Fast mode (default) is metadata-only — no object bytes move:

    - scheme has a registered checksum hook → per-object
      ``(relpath, provider_checksum)``: CONTENT identity at listing cost,
      exactly the reference's GCS fingerprinting
      (/root/reference/src/arti/storage/google/cloud/storage.py:28-33);
      objects the hook returns None for fall back per-object to metadata.
    - no hook (pyarrow FileInfo has no checksum field) → per-object
      ``(relpath, size, mtime)``: change-detection identity, not content
      identity — reverting an object's bytes with a fresh mtime reads as
      "changed". Memoization then rebuilds (safe, just not content-addressed).

    Strict mode streams sha256 over the bytes — content identity regardless
    of provider metadata, at read cost.
    """
    from pyarrow import fs as pafs

    fs, root = _resolve_fs(uri)
    checksum = _FS_CHECKSUMS.get(uri.split("://", 1)[0])
    info = fs.get_file_info(root)
    if info.type == pafs.FileType.NotFound:
        raise FileNotFoundError(uri)
    if info.type == pafs.FileType.Directory:
        # Manifest-gated partitions: fingerprint the COMMITTED file set
        # only, with rels relative to the commit dir — so the fingerprint
        # stays content-addressed across rewrites (the commit token never
        # enters the digest) and a concurrent in-flight commit's staging
        # files never perturb it.
        manifest = _read_object_manifest(fs, root)
        if manifest is not None:
            root = f"{root.rstrip('/')}/{manifest['commit']}"
            if fs.get_file_info(root).type == pafs.FileType.NotFound:
                raise FileNotFoundError(f"{uri}: manifested commit dir missing")
        infos = [
            i
            for i in fs.get_file_info(pafs.FileSelector(root, recursive=True))
            if i.type == pafs.FileType.File
        ]
        infos.sort(key=lambda i: i.path)
    else:
        infos = [info]
    fp = Fingerprint.identity()
    for i in infos:
        rel = i.path[len(root) :].lstrip("/") or os.path.basename(i.path)
        if strict:
            # relpath + NUL delimiter seeds the digest so identical-content
            # objects cannot XOR-cancel and the rel/content boundary is
            # unambiguous (see _fingerprint_path).
            h = hashlib.sha256(rel.encode() + b"\x00")
            with fs.open_input_stream(i.path) as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            part = Fingerprint.from_bytes(h.digest())
        else:
            provided = checksum(fs, i.path) if checksum is not None else None
            if provided is not None:
                part = Fingerprint.from_string(f"{rel}:{provided}")
            else:
                mtime = i.mtime_ns if i.mtime_ns is not None else 0
                part = Fingerprint.from_string(f"{rel}:{i.size}:{mtime}")
        fp = fp.combine(part)
    return fp


def _object_partition_visible(path: str, file_uris: list[str]) -> bool:
    """True when the partition holds committed content: a manifest, any
    file outside the reserved ``.__commit_`` staging namespace (legacy
    unmanifested layout), or the path itself being a single object. A
    partition whose only files are under an in-flight commit prefix is
    NOT visible — that is the mid-commit window the manifest closes."""
    prefix = path.rstrip("/") + "/"
    for f in file_uris:
        if f == path:
            return True
        if f.startswith(prefix) and not f[len(prefix) :].startswith(".__commit_"):
            return True
    return False


class ObjectStore(Storage):
    """Object-store storage (s3/gs/abfs or any pyarrow-resolvable URI scheme).

    Parity with the reference's GCS storage
    (/root/reference/src/arti/storage/google/cloud/storage.py:28-64): same
    path-template contract as LocalFile, discovery by listing + spec
    parsing, content fingerprints from object metadata (fast) or bytes
    (strict). Built on the public pyarrow.fs API so no cloud SDK is
    required; Spark reads the same URIs through its Hadoop connectors
    (use scheme="s3a" for Spark-on-S3 path compatibility).

    At 100 TB this is the primary storage plane: discovery is one
    recursive prefix listing (object stores serve these from the index,
    not the data path), and fast fingerprints never read object bytes.
    """

    bucket: str = "artigraph"
    scheme: str = "s3"
    template: str = (
        "{scheme}://{bucket}/{graph_name}/{path_tags}/{names}/{name}/{partition_key_spec}/"
        + _FP_SEGMENT
    )
    format_extension: str = ""

    def resolve_templates(self, **values: str) -> ObjectStore:
        template = self.template
        if values.pop("strip_input_fingerprint", False):
            template = template.replace("/" + _FP_SEGMENT, "")
        values.setdefault("scheme", self.scheme)
        values.setdefault("bucket", self.bucket)
        values.setdefault("path_tags", "")  # empty segment collapses away
        for k, v in values.items():
            template = template.replace("{" + k + "}", str(v))
        template = _collapse_slashes(template)
        return self.model_copy(update={"template": template})

    def generate_partition(
        self, key: PartitionKey, input_fingerprint: Fingerprint
    ) -> StoragePartition:
        # Identical rendering contract to LocalFile (shared tests assert it).
        return LocalFile.generate_partition(self, key, input_fingerprint)  # type: ignore[arg-type]

    _render_key_spec = LocalFile._render_key_spec

    def discover_partitions(
        self, key_types: dict[str, type[PartitionField]]
    ) -> list[StoragePartition]:
        from pyarrow import fs as pafs

        _pattern, rx, has_fp, static_prefix = _build_discovery_spec(
            self.template, key_types
        )

        # One recursive listing under the longest static prefix (everything
        # before the first placeholder), then the shared spec parse. Object
        # stores have no real directories, so partition "paths" are
        # reconstructed from both listed entries and every ancestor prefix
        # of each object.
        scheme = static_prefix.split("://", 1)[0]
        try:
            fs, root = _resolve_fs(static_prefix)
        except (OSError, ValueError) as exc:
            # Filesystem RESOLUTION failing is an infrastructure problem
            # (pyarrow built without this scheme, bad endpoint/credentials)
            # — returning [] here would misreport it as "no data" and make
            # callers silently skip work that exists.
            raise RuntimeError(
                f"cannot resolve filesystem for {static_prefix!r}: {exc}"
            ) from exc
        selector = pafs.FileSelector(root, recursive=True, allow_not_found=True)
        candidates: set[str] = set()
        file_uris: list[str] = []
        base = static_prefix[: len(static_prefix) - len(root)] if root else static_prefix
        for info in fs.get_file_info(selector):
            # Compare against the full "scheme://" prefix: a bare-scheme
            # startswith check misfires on buckets whose NAME begins with the
            # scheme string (e.g. bucket "s3-prod" listed as "s3-prod/…"),
            # yielding scheme-less candidates that never match the parse
            # regex — discovery would silently report zero partitions.
            uri = (
                info.path
                if info.path.startswith(scheme + "://")
                else f"{base}{info.path}"
            )
            if info.type == pafs.FileType.File:
                file_uris.append(uri)
            parts = uri[len(static_prefix) :].strip("/").split("/")
            for depth in range(1, len(parts) + 1):
                candidates.add(static_prefix + "/" + "/".join(parts[:depth]))

        parsed = (
            _parse_partition_path(path, rx, key_types, has_fp)
            for path in sorted(candidates)
        )
        # Manifest gate: a partition whose ONLY content is an in-flight
        # .__commit_ staging prefix is invisible — a reader listing
        # mid-commit must see the previously committed set (which includes
        # its manifest) or no partition at all, never a partial file set.
        return [
            p
            for p in parsed
            if p is not None and _object_partition_visible(p.path, file_uris)
        ]


class StringLiteral(Storage):
    """Inline literal storage — the value lives in the metadata, not on disk
    (parity with /root/reference/src/arti/storage/literal.py:25-52)."""

    value: str | None = None

    includes_input_fingerprint_template: ClassVar[bool] = False

    def resolve_templates(self, **values: str) -> StringLiteral:
        return self

    def generate_partition(
        self, key: PartitionKey, input_fingerprint: Fingerprint
    ) -> StoragePartition:
        if not key.is_not_partitioned:
            raise ValueError("StringLiteral storage cannot be partitioned")
        if not input_fingerprint.is_empty and self.value is not None:
            # Reference contract (storage/literal.py via
            # tests/arti/storage/test_literal_storage.py:31-40): a literal
            # holding a preset value cannot also be a Producer output slot.
            raise ValueError(
                f"Literal storage cannot have a `value` preset ({self.value}) "
                "for a Producer output"
            )
        # Backends key partitions by path: a producer-output literal needs
        # one catalog identity PER input fingerprint or successive builds
        # would overwrite each other's memoized values.
        suffix = "" if input_fingerprint.is_empty else f"/{input_fingerprint.key}"
        return StoragePartition(
            path=f"literal://{self.fingerprint.key}{suffix}",
            partition_key=key,
            input_fingerprint=input_fingerprint,
            value=self.value,
        )

    def discover_partitions(
        self, key_types: dict[str, type[PartitionField]]
    ) -> list[StoragePartition]:
        if self.value is None:
            return []
        return [
            StoragePartition(
                path=f"literal://{self.fingerprint.key}",
                partition_key=PartitionKey.not_partitioned(),
                content_fingerprint=Fingerprint.from_string(self.value),
                value=self.value,
            )
        ]
