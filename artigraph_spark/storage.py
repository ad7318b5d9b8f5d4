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


def _collapse_slashes(path: str) -> str:
    """Collapse duplicate slashes WITHOUT corrupting URI schemes
    (s3a://bucket, hdfs://nn) — only slashes not preceded by ':' fold."""
    return re.sub(r"(?<!:)//+", "/", path)


class StoragePartition(Model):
    """One physical partition: concrete path + key + the input fingerprint it
    was built from (+ content fingerprint once snapshotted)."""

    path: str
    partition_key: PartitionKey = PartitionKey.not_partitioned()
    input_fingerprint: Fingerprint = Fingerprint.empty()
    content_fingerprint: Fingerprint = Fingerprint.empty()

    def compute_content_fingerprint(self, *, strict: bool = False) -> StoragePartition:
        return self.model_copy(
            update={"content_fingerprint": _fingerprint_path(self.path, strict=strict)}
        )


def _fingerprint_path(path: str, *, strict: bool = False) -> Fingerprint:
    """Fingerprint a file or directory tree.

    Fast mode hashes (relpath, size, mtime_ns) per file — O(#files) metadata
    calls, no data reads; on a cluster this is a cheap listing job. Strict
    mode streams sha256 over the bytes.
    """
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
        if strict:
            h = hashlib.sha256()
            with open(f, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            part = Fingerprint.from_bytes(h.digest())
        else:
            st = os.stat(f)
            part = Fingerprint.from_string(
                f"{os.path.relpath(f, path)}:{st.st_size}:{st.st_mtime_ns}"
            )
        fp = fp.combine(part)
    return fp


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
    template: str = "{root}/{graph_name}/{names}/{name}/{partition_key_spec}/" + _FP_SEGMENT
    format_extension: str = ""

    def resolve_templates(self, **values: str) -> LocalFile:
        template = self.template
        if values.pop("strip_input_fingerprint", False):
            template = template.replace("/" + _FP_SEGMENT, "")
        values.setdefault("root", self.root)
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
        if input_fingerprint.is_empty:
            path = path.replace("/" + _FP_SEGMENT, "")
        else:
            path = path.replace("{input_fingerprint}", str(input_fingerprint.key))
        path = _collapse_slashes(path)
        if "{" in path:
            raise ValueError(f"unresolved placeholders remain in {path!r}")
        return StoragePartition(
            path=path, partition_key=key, input_fingerprint=input_fingerprint
        )

    # -- discovery (glob + parse) -------------------------------------------

    def discover_partitions(
        self, key_types: dict[str, type[PartitionField]]
    ) -> list[StoragePartition]:
        key_spec_glob = "/".join(f"{name}=*" for name in sorted(key_types)) or ""
        pattern = self.template.replace("{partition_key_spec}", key_spec_glob)
        has_fp = _FP_SEGMENT in pattern
        pattern = pattern.replace(_FP_SEGMENT, "_fingerprint=*")
        pattern = _collapse_slashes(pattern)

        regex_src = re.escape(pattern)
        for name in sorted(key_types):
            regex_src = regex_src.replace(
                re.escape(f"{name}=*"), f"{re.escape(name)}=(?P<k_{name}>[^/]+)", 1
            )
        regex_src = regex_src.replace(
            re.escape("_fingerprint=*"), r"_fingerprint=(?P<fp>-?\d+)"
        )
        rx = re.compile("^" + regex_src + "$")

        partitions = []
        for path in sorted(_glob.glob(pattern)):
            m = rx.match(path)
            if not m:
                continue
            fields: dict[str, PartitionField] = {}
            ok = True
            for name, fcls in key_types.items():
                try:
                    fields[name] = fcls.parse(
                        fcls.default_component, unquote(m.group(f"k_{name}"))
                    )
                except ValueError:
                    ok = False
                    break
            if not ok:
                continue
            fp = (
                Fingerprint.from_int(int(m.group("fp")))
                if has_fp and m.groupdict().get("fp")
                else Fingerprint.empty()
            )
            partitions.append(
                StoragePartition(
                    path=path,
                    partition_key=PartitionKey(fields=fields),
                    input_fingerprint=fp,
                )
            )
        return partitions


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
        return StoragePartition(
            path=f"literal://{self.fingerprint.key}",
            partition_key=key,
            input_fingerprint=input_fingerprint,
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
            )
        ]
