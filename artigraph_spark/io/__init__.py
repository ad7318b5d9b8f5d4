"""IO registry: (Format × Storage × View) → reader/writer.

Parity with the reference's multiple-dispatch io layer
(/root/reference/src/arti/io/__init__.py:30-82, dispatch registry
internal/dispatch.py) — simplified to an explicit keyed registry with
subclass-aware lookup (views are few; a full multimethod library buys
nothing here).

Readers take (type_, format, partitions, view, spark) and return the view's
representation; multi-partition reads union partitions (requiring a
partitioned Collection, io/__init__.py:42-62). Writers take (data, type_,
format, partition, view, spark) and materialize one partition.
"""

from __future__ import annotations

import contextlib
import functools
import glob as _glob
import json
import os
import pickle
import shutil
import uuid
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType as SparkStringType

from artigraph_spark import types as at
from artigraph_spark.formats import CSV, JSON, ORC, Delta, Format, Parquet, Pickle, Text
from artigraph_spark.storage import (
    LocalFile,
    ObjectStore,
    Storage,
    StoragePartition,
    StringLiteral,
)
from artigraph_spark.types.spark import struct_to_spark, to_spark_type
from artigraph_spark.views import (
    PandasDataFrameView,
    PythonListView,
    PythonScalarView,
    SparkDataFrameView,
    View,
)

_READERS: dict[tuple[type, type, type], Callable[..., Any]] = {}
_WRITERS: dict[tuple[type, type, type], Callable[..., Any]] = {}


def register_reader(fmt: type, storage: type, view: type):
    def deco(fn):
        _READERS[(fmt, storage, view)] = fn
        return fn

    return deco


def register_writer(fmt: type, storage: type, view: type):
    def deco(fn):
        _WRITERS[(fmt, storage, view)] = fn
        return fn

    return deco


def _lookup(registry: dict, fmt: Format, storage: Storage, view: type[View]):
    # Latest registration wins so user handlers for subclasses can override
    # built-ins (same convention as the View registry).
    for (f, s, v), fn in reversed(list(registry.items())):
        if isinstance(fmt, f) and isinstance(storage, s) and issubclass(view, v):
            return fn
    raise LookupError(
        f"no IO handler for ({type(fmt).__name__}, {type(storage).__name__}, {view.__name__})"
    )


def can_read(fmt: Format, storage: Storage, view: type[View]) -> bool:
    try:
        _lookup(_READERS, fmt, storage, view)
        return True
    except LookupError:
        return False


def read(
    type_: at.Type,
    fmt: Format,
    storage: Storage,
    partitions: list[StoragePartition],
    view: type[View],
    spark: SparkSession | None,
) -> Any:
    if not partitions:
        raise FileNotFoundError("No data (no partitions to read)")
    if len(partitions) > 1 and not (
        isinstance(type_, at.Collection) and type_.partition_by
    ):
        raise ValueError("multi-partition read requires a partitioned Collection")
    fn = _lookup(_READERS, fmt, storage, view)
    return fn(type_, fmt, storage, partitions, spark)


def write(
    data: Any,
    type_: at.Type,
    fmt: Format,
    partition: StoragePartition,
    view: type[View],
    spark: SparkSession | None,
    storage: Storage | None = None,
) -> StoragePartition:
    """Write ``data`` to the partition's storage and return the partition —
    possibly UPDATED: literal writers carry the serialized value on the
    returned partition (the catalog is their storage plane, mirroring the
    reference's writer-returns-partition contract,
    /root/reference/src/arti/io/json_stringliteral_python.py:40-52)."""
    # Dispatch on the artifact's actual Storage instance when the caller has
    # it (Graph.write always does) so writers registered for custom Storage
    # subclasses are honored; the path-prefix sniff is only a fallback for
    # legacy direct calls.
    resolved = storage if storage is not None else _storage_of(partition)
    if isinstance(resolved, StringLiteral) and resolved.value is not None:
        # Reference contract: a preset literal value cannot be overwritten —
        # discovery would still surface the ORIGINAL value.
        raise ValueError("Literals with a value already set cannot be written")
    fn = _lookup(_WRITERS, fmt, resolved, view)
    # Stage only when the STORAGE says the path is a local filesystem
    # location — a custom Storage subclass may use scheme-less opaque
    # identifiers (table names, catalog keys) that a path sniff would
    # mistake for local dirs and silently mangle with a staging suffix.
    if isinstance(resolved, LocalFile) and _is_local_path(partition.path):
        # Crash-consistent local materialization: every writer targets a
        # staging dir; the partition path only comes into existence complete.
        with atomic_dir_write(partition.path) as staged:
            fn(data, type_, fmt, partition.model_copy(update={"path": staged}), spark)
        return partition
    if isinstance(resolved, ObjectStore) and "://" in partition.path:
        # Manifest-gated object-store materialization: files stage under a
        # reserved commit prefix; a single-object manifest PUT flips the
        # partition's visible file set atomically.
        with atomic_object_commit(partition.path) as staged:
            fn(data, type_, fmt, partition.model_copy(update={"path": staged}), spark)
        return partition
    out = fn(data, type_, fmt, partition, spark)
    return out if isinstance(out, StoragePartition) else partition


def _storage_of(partition: StoragePartition) -> Storage:
    if partition.path.startswith("literal://"):
        return StringLiteral()
    if "://" in partition.path and not partition.path.startswith("file://"):
        scheme, rest = partition.path.split("://", 1)
        return ObjectStore(scheme=scheme, bucket=rest.split("/", 1)[0])
    return LocalFile()


def _schema_for(type_: at.Type):
    if isinstance(type_, at.Collection):
        return struct_to_spark(type_.element)
    if isinstance(type_, at.Struct):
        return struct_to_spark(type_)
    raise ValueError(f"DataFrame IO needs a Collection/Struct type, got {type_!r}")


def _is_local_path(path: str) -> bool:
    return "://" not in path or path.startswith("file://")


def _os_path(path: str) -> str:
    """file:// URI → plain filesystem path for os-level calls (os.rename and
    friends take paths, not URIs)."""
    if path.startswith("file://"):
        return path[len("file://") :] or "/"
    return path


def _fsync_tree(path: str) -> None:
    """fsync every file and directory under ``path`` so the commit rename
    cannot be reordered before its contents reach disk."""
    for dirpath, _dirnames, filenames in os.walk(path):
        for fname in filenames:
            fd = os.open(os.path.join(dirpath, fname), os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        fd = os.open(dirpath, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


def _fsync_dir(path: str) -> None:
    """fsync one directory so a rename recorded in it is durable."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


@contextlib.contextmanager
def atomic_dir_write(path: str):
    """Stage-then-rename commit protocol for directory writes (closes the
    crash-consistency gap the jar-gated Delta sink would otherwise cover).
    This is the write path's counterpart of the reference's write-then-record
    contract (/root/reference/src/arti/graphs/__init__.py:272-291): a
    partition only becomes observable once its bytes are complete.

    Local paths (including file:// URIs): yields a staging dir
    ``<path>.__tmp_<token>__``; on success fsyncs the staged tree, commits
    with ``os.rename``, and fsyncs the PARENT directory so the commit itself
    is durable. Readers — and the memoization layer's partition discovery,
    which explicitly rejects the reserved ``.__tmp_``/``.__old_`` markers —
    see the OLD complete partition or the NEW complete partition, never a
    torn one. A crash while staging leaves the old partition untouched; the
    only non-atomic window is the two-rename swap when overwriting an
    existing partition, and a crash there leaves the old content recoverable
    at the unique ``<path>.__old_<token>__`` (readers then see a MISSING
    partition — recompute — not torn data). Token-suffixed names keep
    concurrent writers of the same partition from stomping each other's
    staging or backup dirs.

    Object-store URIs yield the final path unchanged: single-object PUTs
    are already atomic, and multi-file commit on object stores requires a
    manifest log (the Delta sink) — documented, not silently faked.
    """
    if not _is_local_path(path):
        yield path
        return
    final = _os_path(path)
    # Reconcile leftovers from previously CRASHED writes of this same
    # partition: token-suffixed backup/staging dirs are post-crash garbage
    # (live writes clean their own in the finally below). Concurrent writers
    # of the SAME partition path are unsupported (last-writer-wins at the
    # rename even with unique tokens) — sweeping here cannot break any
    # supported pattern, and without it every crashed overwrite would leak a
    # full partition copy forever.
    stale_old = _glob.glob(f"{_glob.escape(final)}.__old_*__")
    if not os.path.exists(final) and len(stale_old) == 1:
        # A crash landed between the two commit renames: the backup is the
        # ONLY surviving copy of the partition. Restore it rather than sweep
        # it — if this new attempt then dies during staging, the partition
        # stays readable instead of being permanently gone.
        os.rename(stale_old[0], final)
        stale_old = []
    for stale in stale_old + _glob.glob(f"{_glob.escape(final)}.__tmp_*__"):
        shutil.rmtree(stale, ignore_errors=True)
    token = f"{os.getpid()}_{uuid.uuid4().hex[:8]}"
    tmp = f"{final}.__tmp_{token}__"
    # Writers get the staged path in the SAME form the partition path used:
    # a file:// URI must stay a URI, or a Spark writer on a cluster whose
    # default FS is not the local filesystem would write the bare staged
    # path to HDFS and the local commit would see nothing to rename.
    staged_for_writer = f"file://{tmp}" if path.startswith("file://") else tmp
    try:
        yield staged_for_writer
        if not os.path.exists(tmp):
            # Writer produced nothing (e.g. empty plan edge) — nothing to commit.
            return
        _fsync_tree(tmp)
        old = f"{final}.__old_{token}__"
        had_previous = os.path.exists(final)
        if had_previous:
            os.rename(final, old)
        try:
            os.rename(tmp, final)
        except BaseException:
            # Commit rename failed (e.g. ENOSPC on the parent): restore the
            # old partition rather than leaving it parked under the backup
            # name with the final path missing.
            if had_previous and not os.path.exists(final):
                os.rename(old, final)
            raise
        parent = os.path.dirname(final) or "/"
        _fsync_dir(parent)  # make the commit rename itself durable
        if had_previous:
            shutil.rmtree(old, ignore_errors=True)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


@contextlib.contextmanager
def atomic_object_commit(path: str):
    """Manifest-gated commit for multi-file object-store writes — the
    object-store counterpart of ``atomic_dir_write``. Object stores have no
    atomic directory rename, so stage-then-rename cannot apply; what they DO
    guarantee is atomic single-object PUTs (the property the reference's
    single-object GCS uploads lean on,
    /root/reference/src/arti/storage/google/cloud/storage.py:28-64). The
    protocol generalizes that to multi-file Spark output:

    1. The writer lands its full file set under the reserved staging prefix
       ``<path>/.__commit_<token>__/`` — invisible to discovery (reserved
       namespace) and to manifest-following readers.
    2. One ``_MANIFEST.json`` object naming the exact committed file set
       (+ sizes) is PUT at the partition root — THE atomic flip.
    3. Superseded commit dirs, crashed-commit orphans, and legacy loose
       files are swept only after the flip.

    A reader or discovery listing at ANY point sees the old committed set,
    or the new committed set, or (for a first write) no partition — never a
    partial file set. A crash before step 2 leaves an orphaned staging dir
    (swept by the next write); a crash during the sweep leaves stale but
    unreferenced objects. Data loss window: none.
    """
    import json as _json

    from pyarrow import fs as pafs

    from artigraph_spark.storage import MANIFEST_NAME, _resolve_fs

    fs, root = _resolve_fs(path)
    root = root.rstrip("/")
    token = f"{os.getpid()}_{uuid.uuid4().hex[:8]}"
    commit_rel = f".__commit_{token}__"
    staged_root = f"{root}/{commit_rel}"
    try:
        yield f"{path.rstrip('/')}/{commit_rel}"
    except BaseException:
        # Failed write: drop our staging dir; committed state untouched.
        try:
            fs.delete_dir(staged_root)
        except (OSError, FileNotFoundError):
            pass
        raise
    infos = [
        i
        for i in fs.get_file_info(
            pafs.FileSelector(staged_root, recursive=True, allow_not_found=True)
        )
        if i.type == pafs.FileType.File
    ]
    if not infos:
        # A writer that produced literally zero objects (no _SUCCESS, no
        # empty part file — every real writer emits at least one) did not
        # complete; silently returning would leave the PREVIOUS commit
        # visible as if this overwrite never happened. Surface it, and
        # drop the empty staging dir so nothing orphans.
        try:
            fs.delete_dir(staged_root)
        except (OSError, FileNotFoundError):
            pass
        raise OSError(
            f"atomic_object_commit: writer produced no files under "
            f"{staged_root}; refusing to flip the manifest (previous "
            f"commit left untouched)"
        )
    files = sorted(
        ({"path": i.path[len(staged_root) :].lstrip("/"), "size": i.size} for i in infos),
        key=lambda f: f["path"],
    )
    manifest = {"commit": commit_rel, "files": files}
    with fs.open_output_stream(f"{root}/{MANIFEST_NAME}") as fh:
        fh.write(_json.dumps(manifest, indent=1).encode("utf-8"))
    # Post-flip sweep: everything at the partition root that is not the
    # live commit or its manifest is superseded (old commits, crashed
    # orphans, pre-manifest loose files). Overwrite semantics say a write
    # REPLACES the partition, so nothing here can be load-bearing.
    for i in fs.get_file_info(pafs.FileSelector(root, recursive=False)):
        name = i.path.rsplit("/", 1)[-1]
        if name in (commit_rel, MANIFEST_NAME):
            continue
        try:
            if i.type == pafs.FileType.Directory:
                fs.delete_dir(i.path)
            else:
                fs.delete_file(i.path)
        except (OSError, FileNotFoundError):
            pass  # concurrent sweeper got there first — fine


def committed_data_path(path: str) -> str:
    """Resolve a partition URI to its committed data location: the
    manifest's commit dir when one exists, the path itself otherwise
    (legacy unmanifested layout, local paths, literals)."""
    if not path or "://" not in path or path.startswith(("file://", "literal://")):
        return path
    from artigraph_spark.storage import _read_object_manifest, _resolve_fs

    try:
        fs, root = _resolve_fs(path)
        manifest = _read_object_manifest(fs, root.rstrip("/"))
        if manifest is None:
            return path
        commit = manifest["commit"]
    except (OSError, ValueError, KeyError, TypeError):
        # Unreadable OR wrong-shape manifest (well-formed JSON missing
        # 'commit', a JSON list, ...) — fall back to the legacy layout
        # rather than crashing every reader of the partition.
        return path
    return f"{path.rstrip('/')}/{commit}"


def _committed(reader):
    """Wrap an object-store reader so every partition path is resolved
    through its commit manifest before any bytes are read."""

    @functools.wraps(reader)
    def wrapped(type_, fmt, storage, partitions, spark):
        parts = [
            p.model_copy(update={"path": committed_data_path(p.path)})
            for p in partitions
        ]
        return reader(type_, fmt, storage, parts, spark)

    return wrapped


def _data_files(path: str) -> list[str]:
    path = _os_path(path)  # driver-local os.open, not a Spark reader
    if os.path.isdir(path):
        return sorted(
            f
            for f in _glob.glob(os.path.join(path, "*"))
            if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
        )
    return [path]


# --- Spark DataFrame view ---------------------------------------------------


@register_reader(Parquet, LocalFile, SparkDataFrameView)
def _read_parquet_df(type_, fmt, storage, partitions, spark) -> DataFrame:
    # Explicit schema: never infer/merge footers across 100k files; leaf
    # partition dirs are read directly (no Hive inference needed — all
    # columns live in the files, mirroring the reference's concat read).
    return spark.read.schema(_schema_for(type_)).parquet(*[p.path for p in partitions])


def _apply_layout(data: DataFrame, type_: at.Type) -> DataFrame:
    """Honor the Collection's declared cluster_by: sort rows within each
    task partition before writing (better row-group locality + min/max
    pruning for readers filtering on the cluster keys)."""
    if isinstance(type_, at.Collection) and type_.cluster_by:
        return data.sortWithinPartitions(*type_.cluster_by)
    return data


@register_writer(Parquet, LocalFile, SparkDataFrameView)
def _write_parquet_df(data: DataFrame, type_, fmt, partition, spark) -> None:
    _apply_layout(data, type_).write.mode("overwrite").parquet(partition.path)


@register_reader(JSON, LocalFile, SparkDataFrameView)
def _read_json_df(type_, fmt, storage, partitions, spark) -> DataFrame:
    # Schema always supplied from the artifact Type — never inferred at read.
    return spark.read.schema(_schema_for(type_)).json([p.path for p in partitions])


@register_writer(JSON, LocalFile, SparkDataFrameView)
def _write_json_df(data: DataFrame, type_, fmt, partition, spark) -> None:
    _apply_layout(data, type_).write.mode("overwrite").json(partition.path)


@register_reader(ORC, LocalFile, SparkDataFrameView)
def _read_orc_df(type_, fmt, storage, partitions, spark) -> DataFrame:
    return spark.read.schema(_schema_for(type_)).orc(*[p.path for p in partitions])


@register_writer(ORC, LocalFile, SparkDataFrameView)
def _write_orc_df(data: DataFrame, type_, fmt, partition, spark) -> None:
    _apply_layout(data, type_).write.mode("overwrite").orc(partition.path)


@register_reader(CSV, LocalFile, SparkDataFrameView)
def _read_csv_df(type_, fmt, storage, partitions, spark) -> DataFrame:
    return spark.read.schema(_schema_for(type_)).csv(
        [p.path for p in partitions], header=getattr(fmt, "header", True)
    )


@register_writer(CSV, LocalFile, SparkDataFrameView)
def _write_csv_df(data: DataFrame, type_, fmt, partition, spark) -> None:
    data.write.mode("overwrite").csv(partition.path, header=getattr(fmt, "header", True))


def _text_field(type_: at.Type) -> str:
    """Text IO carries exactly one string column; return its name."""
    schema = _schema_for(type_)
    if len(schema.fields) != 1 or not isinstance(
        schema.fields[0].dataType, SparkStringType
    ):
        raise ValueError(
            "Text format requires a Collection with exactly one String field, "
            f"got {schema.simpleString()}"
        )
    return schema.fields[0].name


@register_reader(Text, LocalFile, SparkDataFrameView)
def _read_text_df(type_, fmt, storage, partitions, spark) -> DataFrame:
    name = _text_field(type_)
    return spark.read.text([p.path for p in partitions]).withColumnRenamed(
        "value", name
    )


@register_writer(Text, LocalFile, SparkDataFrameView)
def _write_text_df(data: DataFrame, type_, fmt, partition, spark) -> None:
    name = _text_field(type_)
    data.select(name).write.mode("overwrite").text(partition.path)


def _require_delta(spark: SparkSession) -> None:
    try:
        spark._jvm.org.apache.spark.sql.delta.DeltaLog  # noqa: B018
    except Exception as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "Delta format requires the delta-spark jars on the classpath "
            "(not present in this environment); use Parquet, or deploy with "
            "--packages io.delta:delta-spark_2.13:<version>"
        ) from e


@register_reader(Delta, LocalFile, SparkDataFrameView)
def _read_delta_df(type_, fmt, storage, partitions, spark) -> DataFrame:
    _require_delta(spark)
    dfs = [spark.read.format("delta").load(p.path) for p in partitions]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


@register_writer(Delta, LocalFile, SparkDataFrameView)
def _write_delta_df(data: DataFrame, type_, fmt, partition, spark) -> None:
    _require_delta(spark)
    _apply_layout(data, type_).write.format("delta").mode("overwrite").save(partition.path)


# Object-store URIs (s3a://, gs://, ...) go through the same Spark reader/
# writer code — Spark's Hadoop connectors resolve the scheme; only the
# dispatch key differs. Delta + pandas handlers included: before the
# ObjectStore sniff existed these paths dispatched via LocalFile, so every
# (format, view) that worked then must stay registered now. Readers are
# wrapped to follow the partition's commit manifest (atomic_object_commit)
# so they only ever read a committed file set.
register_reader(Parquet, ObjectStore, SparkDataFrameView)(_committed(_read_parquet_df))
register_writer(Parquet, ObjectStore, SparkDataFrameView)(_write_parquet_df)
register_reader(JSON, ObjectStore, SparkDataFrameView)(_committed(_read_json_df))
register_writer(JSON, ObjectStore, SparkDataFrameView)(_write_json_df)
register_reader(CSV, ObjectStore, SparkDataFrameView)(_committed(_read_csv_df))
register_writer(CSV, ObjectStore, SparkDataFrameView)(_write_csv_df)
register_reader(ORC, ObjectStore, SparkDataFrameView)(_committed(_read_orc_df))
register_writer(ORC, ObjectStore, SparkDataFrameView)(_write_orc_df)
register_reader(Text, ObjectStore, SparkDataFrameView)(_committed(_read_text_df))
register_writer(Text, ObjectStore, SparkDataFrameView)(_write_text_df)
register_reader(Delta, ObjectStore, SparkDataFrameView)(_committed(_read_delta_df))
register_writer(Delta, ObjectStore, SparkDataFrameView)(_write_delta_df)


# --- pandas DataFrame view (Arrow-bridged, driver-local small data) ---------


@register_reader(Parquet, LocalFile, PandasDataFrameView)
def _read_parquet_pandas(type_, fmt, storage, partitions, spark):
    # Distributed scan → Arrow-batched collect: the Spark reader applies the
    # declared schema; toPandas keeps the transfer columnar.
    return spark.read.schema(_schema_for(type_)).parquet(
        *[p.path for p in partitions]
    ).toPandas()


@register_writer(Parquet, LocalFile, PandasDataFrameView)
def _write_parquet_pandas(data, type_, fmt, partition, spark) -> None:
    schema = _schema_for(type_)
    # createDataFrame(pandas, schema) maps columns by POSITION; align the
    # frame to the declared field order by NAME first, or reordered frames
    # silently write values under the wrong columns.
    df = spark.createDataFrame(data[list(schema.names)], schema=schema)
    _apply_layout(df, type_).write.mode("overwrite").parquet(partition.path)


# The driver-local pandas view reaches object stores through pyarrow's own
# filesystem layer (registered scheme factories included), not through a
# Spark job — works for s3://gs:// AND the credential-free mock:// test
# scheme, mirroring the reference's GCS IO handlers.


def _arrow_schema(type_: at.Type):
    from artigraph_spark.types.arrow import collection_to_arrow_schema, to_arrow

    if isinstance(type_, at.Collection):
        return collection_to_arrow_schema(type_)
    import pyarrow as pa

    return pa.schema(
        [(n, to_arrow(t)) for n, t in type_.fields.items()]  # Struct
    )


@register_reader(Parquet, ObjectStore, PandasDataFrameView)
@_committed
def _read_parquet_pandas_object(type_, fmt, storage, partitions, spark):
    import pandas as pd
    import pyarrow.parquet as pq

    from artigraph_spark.storage import _resolve_fs

    # Declared schema, not file-inferred: an int32-written file must come
    # back as the declared Int64, matching the Spark-path readers that pass
    # spark.read.schema(...).
    schema = _arrow_schema(type_)
    frames = []
    for p in partitions:
        fs, root = _resolve_fs(p.path)
        frames.append(
            pq.read_table(root, filesystem=fs).select(schema.names)
            .cast(schema)
            .to_pandas()
        )
    return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]


@register_writer(Parquet, ObjectStore, PandasDataFrameView)
def _write_parquet_pandas_object(data, type_, fmt, partition, spark) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from artigraph_spark.storage import _resolve_fs

    schema = _schema_for(type_)
    # Honor the Collection's declared cluster_by (row-group locality contract
    # every other writer applies via _apply_layout).
    if isinstance(type_, at.Collection) and type_.cluster_by:
        data = data.sort_values(list(type_.cluster_by), ignore_index=True)
    fs, root = _resolve_fs(partition.path)
    # Overwrite semantics: writing a partition replaces it. Without the wipe,
    # part files from a previous (e.g. Spark-path) write of the same
    # partition would survive and readers union stale rows into the data.
    fs.delete_dir_contents(root, missing_dir_ok=True)
    fs.create_dir(root, recursive=True)
    table = pa.Table.from_pandas(data[list(schema.names)], preserve_index=False)
    table = table.cast(_arrow_schema(type_))
    pq.write_table(table, f"{root}/part-0.parquet", filesystem=fs)


# --- Driver-local python views (reference-parity escape hatches) ------------


@register_reader(JSON, LocalFile, PythonListView)
def _read_json_list(type_, fmt, storage, partitions, spark) -> list:
    out: list = []
    for p in partitions:
        for f in _data_files(p.path):
            with open(f) as fh:
                content = fh.read()
            try:
                loaded = json.loads(content)
                out.extend(loaded if isinstance(loaded, list) else [loaded])
            except json.JSONDecodeError:
                # Spark-written JSON: one object per line.
                out.extend(json.loads(line) for line in content.splitlines() if line)
    return out


@register_writer(JSON, LocalFile, PythonListView)
def _write_json_list(data: list, type_, fmt, partition, spark) -> None:
    path = _os_path(partition.path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.json"), "w") as fh:
        json.dump(data, fh, default=str)


@register_reader(JSON, LocalFile, PythonScalarView)
def _read_json_scalar(type_, fmt, storage, partitions, spark) -> Any:
    (p,) = partitions
    files = _data_files(p.path)
    with open(files[0]) as fh:
        return json.load(fh)


@register_writer(JSON, LocalFile, PythonScalarView)
def _write_json_scalar(data: Any, type_, fmt, partition, spark) -> None:
    path = _os_path(partition.path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.json"), "w") as fh:
        json.dump(data, fh, default=str)


def _literal_values(storage: StringLiteral, partitions) -> list[str]:
    """Serialized literal payloads: producer-written values ride on the
    partitions (through the catalog); a preset ``storage.value`` is the
    raw-artifact fallback."""
    vals = [p.value for p in partitions if p.value is not None]
    if vals:
        return vals
    if storage.value is None:
        raise FileNotFoundError("literal storage has no value")
    return [storage.value]


@register_reader(JSON, StringLiteral, PythonScalarView)
def _read_literal_scalar(type_, fmt, storage: StringLiteral, partitions, spark) -> Any:
    (v,) = _literal_values(storage, partitions)
    return json.loads(v)


@register_reader(JSON, StringLiteral, PythonListView)
def _read_literal_list(type_, fmt, storage: StringLiteral, partitions, spark) -> list:
    out: list = []
    for raw in _literal_values(storage, partitions):
        v = json.loads(raw)
        out.extend(v if isinstance(v, list) else [v])
    return out


@register_writer(JSON, StringLiteral, PythonScalarView)
def _write_literal_scalar(data: Any, type_, fmt, partition, spark) -> StoragePartition:
    return partition.model_copy(update={"value": json.dumps(data, default=str)})


@register_writer(JSON, StringLiteral, PythonListView)
def _write_literal_list(data: list, type_, fmt, partition, spark) -> StoragePartition:
    return partition.model_copy(update={"value": json.dumps(data, default=str)})


@register_reader(Pickle, LocalFile, PythonScalarView)
def _read_pickle_scalar(type_, fmt, storage, partitions, spark) -> Any:
    (p,) = partitions
    with open(_data_files(p.path)[0], "rb") as fh:
        return pickle.load(fh)


@register_writer(Pickle, LocalFile, PythonScalarView)
def _write_pickle_scalar(data: Any, type_, fmt, partition, spark) -> None:
    path = _os_path(partition.path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.pickle"), "wb") as fh:
        pickle.dump(data, fh)


# --- Literal + DataFrame (small inline tables) ------------------------------


@register_reader(JSON, StringLiteral, SparkDataFrameView)
def _read_literal_df(type_, fmt, storage: StringLiteral, partitions, spark) -> DataFrame:
    rows: list = []
    for raw in _literal_values(storage, partitions):
        v = json.loads(raw)
        rows.extend(v if isinstance(v, list) else [v])
    return spark.createDataFrame(rows, schema=_schema_for(type_))
