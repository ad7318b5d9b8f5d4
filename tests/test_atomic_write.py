"""Crash-consistent partition writes: io.write routes every local
materialization through atomic_dir_write (stage → fsync → rename), so a
partition path only ever holds a COMPLETE write. Mirrors the reference's
write-then-record contract (/root/reference/src/arti/graphs/__init__.py:
272-291): data becomes observable only after it is fully written.
"""

import os

import pytest

from artigraph_spark import io
from artigraph_spark import types as at
from artigraph_spark.formats import JSON, Parquet
from artigraph_spark.partitions import PartitionKey, StringField
from artigraph_spark.storage import LocalFile, StoragePartition
from artigraph_spark.views import PythonListView, SparkDataFrameView

COLL = at.Collection(element=at.Struct(fields={"a": at.Int64(), "b": at.String()}))


class KilledMidWrite(Exception):
    """Stands in for the process dying while the writer is emitting bytes."""


class CrashyJSON(JSON):
    """JSON format whose writer dies after emitting torn bytes."""


@io.register_writer(CrashyJSON, LocalFile, PythonListView)
def _crashy_writer(data, type_, fmt, partition, spark) -> None:
    os.makedirs(partition.path, exist_ok=True)
    with open(os.path.join(partition.path, "part-0.json"), "w") as fh:
        fh.write('[{"a": 999, "b": "TORN')  # incomplete JSON — a torn write
    raise KilledMidWrite("simulated crash between stage and rename")


def _partition(tmp_path, name):
    return StoragePartition(
        path=str(tmp_path / name), partition_key=PartitionKey.not_partitioned()
    )


def test_kill_mid_write_leaves_old_partition_readable(spark, tmp_path):
    v1 = [{"a": 1, "b": "x"}]
    p = _partition(tmp_path, "doc")
    io.write(v1, COLL, JSON(), p, PythonListView, spark)

    with pytest.raises(KilledMidWrite):
        io.write([{"a": 2, "b": "y"}], COLL, CrashyJSON(), p, PythonListView, spark)

    # The old, complete partition is untouched — never replaced by torn bytes.
    assert io.read(COLL, JSON(), LocalFile(), [p], PythonListView, spark) == v1
    # No staging/backup residue next to the partition (context-manager abort
    # cleans up; a hard kill would leave a .__tmp_ dir that discovery rejects).
    siblings = os.listdir(tmp_path)
    assert siblings == ["doc"]


def test_overwrite_is_complete_swap(spark, tmp_path):
    """A successful overwrite replaces the whole directory: no stale part
    files from the previous write survive into the new partition."""
    p = _partition(tmp_path, "swap")
    df1 = spark.createDataFrame([(i, "old") for i in range(8)], "a long, b string").repartition(4)
    io.write(df1, COLL, Parquet(), p, SparkDataFrameView, spark)
    files_v1 = set(os.listdir(p.path))

    df2 = spark.createDataFrame([(99, "new")], "a long, b string").coalesce(1)
    io.write(df2, COLL, Parquet(), p, SparkDataFrameView, spark)
    back = io.read(COLL, Parquet(), LocalFile(), [p], SparkDataFrameView, spark)
    assert [(r["a"], r["b"]) for r in back.collect()] == [(99, "new")]
    # Old 4-part file set is gone wholesale (rename swap, not file-wise
    # merge). _SUCCESS/.crc sidecars share names across writes — compare the
    # uniquely-named part files only.
    v1_parts = {f for f in files_v1 if "part-" in f and not f.startswith(".")}
    now = set(os.listdir(p.path))
    assert len(v1_parts) == 4 and not (now & v1_parts)
    assert [d for d in os.listdir(tmp_path) if "__old_" in d or "__tmp_" in d] == []


def test_file_uri_paths_commit_atomically(spark, tmp_path):
    """file:// URIs must be stripped to OS paths before os.rename — a
    verbatim rename of the URI string would fail or litter cwd."""
    p = StoragePartition(
        path=f"file://{tmp_path}/uri_part", partition_key=PartitionKey.not_partitioned()
    )
    io.write([{"a": 5, "b": "u"}], COLL, JSON(), p, PythonListView, spark)
    assert os.path.isdir(tmp_path / "uri_part")
    assert io.read(COLL, JSON(), LocalFile(), [p], PythonListView, spark) == [
        {"a": 5, "b": "u"}
    ]


def test_discovery_rejects_staging_and_backup_dirs(tmp_path):
    """The reserved .__tmp_/.__old_ namespace is invisible to partition
    discovery even where the template ends in a STRING key — the worst case,
    since StringField.from_components would happily parse a staging-suffixed
    segment into a phantom partition."""
    storage = LocalFile(
        root=str(tmp_path),
        template="{root}/corpus/{partition_key_spec}",
    ).resolve_templates()
    key_types = {"lang": StringField}
    good = storage.generate_partition(
        PartitionKey(fields={"lang": StringField(key="en")}),
        input_fingerprint=__import__(
            "artigraph_spark.fingerprint", fromlist=["Fingerprint"]
        ).Fingerprint.empty(),
    )
    os.makedirs(good.path, exist_ok=True)
    open(os.path.join(good.path, "part-0.parquet"), "w").close()

    # A crashed writer's staging dir and a crashed swap's backup dir.
    for junk in (f"{good.path}.__tmp_1234_deadbeef__", f"{good.path}.__old_1234_deadbeef__"):
        os.makedirs(junk, exist_ok=True)
        open(os.path.join(junk, "part-0.parquet"), "w").close()

    found = storage.discover_partitions(key_types)
    assert [p.path for p in found] == [good.path]
    assert found[0].partition_key.fields["lang"].value == "en"


def test_staged_path_keeps_file_scheme(tmp_path):
    """A file:// partition path must yield a file:// staging path — Spark
    writers resolve scheme-less paths against the cluster default FS."""
    with io.atomic_dir_write(f"file://{tmp_path}/part") as staged:
        assert staged.startswith("file://")
        os.makedirs(staged[len("file://"):], exist_ok=True)
        with open(os.path.join(staged[len("file://"):], "f"), "w") as fh:
            fh.write("x")
    assert os.path.isdir(tmp_path / "part")


def test_crashed_write_leftovers_swept_on_next_write(spark, tmp_path):
    """Token-suffixed backup/staging dirs from a hard-killed writer are
    reconciled by the next write of the same partition, not leaked forever."""
    p = _partition(tmp_path, "leaky")
    io.write([{"a": 1, "b": "x"}], COLL, JSON(), p, PythonListView, spark)
    for junk in (f"{p.path}.__old_999_dead__", f"{p.path}.__tmp_999_dead__"):
        os.makedirs(junk)
        open(os.path.join(junk, "garbage"), "w").close()
    io.write([{"a": 2, "b": "y"}], COLL, JSON(), p, PythonListView, spark)
    assert sorted(os.listdir(tmp_path)) == ["leaky"]
    assert io.read(COLL, JSON(), LocalFile(), [p], PythonListView, spark) == [
        {"a": 2, "b": "y"}
    ]


def test_non_localfile_storage_paths_never_staged(spark, tmp_path):
    """A custom Storage whose writer treats the path as an opaque identifier
    (no scheme) must receive it VERBATIM — staging suffixes would corrupt
    catalog keys that merely look like local paths."""
    from artigraph_spark.storage import Storage

    class CatalogStorage(Storage):
        def resolve_templates(self, **values):
            return self

    seen = {}

    @io.register_writer(JSON, CatalogStorage, PythonListView)
    def _catalog_writer(data, type_, fmt, partition, spark) -> None:
        seen["path"] = partition.path

    p = _partition(tmp_path, "cat_key")
    io.write(
        [{"a": 1, "b": "x"}], COLL, JSON(), p, PythonListView, spark,
        storage=CatalogStorage(),
    )
    assert seen["path"] == p.path  # no .__tmp_ suffix


def test_generate_partition_rejects_reserved_namespace(tmp_path):
    from artigraph_spark.fingerprint import Fingerprint
    from artigraph_spark.partitions import PartitionKey, StringField

    storage = LocalFile(
        root=str(tmp_path), template="{root}/corpus/{partition_key_spec}"
    ).resolve_templates()
    with pytest.raises(ValueError, match="reserved"):
        storage.generate_partition(
            PartitionKey(fields={"lang": StringField(key="v.__tmp_x__")}),
            Fingerprint.empty(),
        )


def test_interrupted_swap_backup_restored_not_swept(spark, tmp_path):
    """Crash BETWEEN the two commit renames leaves the partition parked at
    .__old_<token>__ with the final path missing — the backup is then the
    only copy. The next write must RESTORE it before attempting anything,
    so that a second failure during staging does not destroy the data."""
    p = _partition(tmp_path, "swapcrash")
    io.write([{"a": 1, "b": "x"}], COLL, JSON(), p, PythonListView, spark)
    # Simulate the mid-swap crash: final renamed away, new rename never ran.
    os.rename(p.path, f"{p.path}.__old_42_cafe__")
    assert not os.path.exists(p.path)

    # Next attempt dies during staging — the old bytes must survive it.
    with pytest.raises(KilledMidWrite):
        io.write([{"a": 2, "b": "y"}], COLL, CrashyJSON(), p, PythonListView, spark)
    assert io.read(COLL, JSON(), LocalFile(), [p], PythonListView, spark) == [
        {"a": 1, "b": "x"}
    ]
    assert sorted(os.listdir(tmp_path)) == ["swapcrash"]

    # And a SUCCESSFUL retry supersedes the restored content cleanly.
    io.write([{"a": 3, "b": "z"}], COLL, JSON(), p, PythonListView, spark)
    assert io.read(COLL, JSON(), LocalFile(), [p], PythonListView, spark) == [
        {"a": 3, "b": "z"}
    ]
    assert sorted(os.listdir(tmp_path)) == ["swapcrash"]
