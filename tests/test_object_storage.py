"""ObjectStore storage: templating, listing-based discovery, and content
fingerprints against a local-directory-backed mock filesystem (mirrors the
LocalFile suite in test_partitions_storage.py and the reference's GCS
storage contract, /root/reference/src/arti/storage/google/cloud/storage.py).

The ``mock://`` scheme mounts a pyarrow SubTreeFileSystem rooted at a tmp
dir — same public pyarrow.fs API a real s3://, gs://, or hdfs:// resolves
to, no credentials required.
"""

from __future__ import annotations

import datetime

import pytest
from pyarrow import fs as pafs

from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.partitions import DateField, PartitionKey
from artigraph_spark.storage import (
    ObjectStore,
    StoragePartition,
    _FS_FACTORIES,
    register_filesystem,
)

BUCKET = "test-bucket"


@pytest.fixture()
def mock_fs(tmp_path):
    local = pafs.LocalFileSystem()

    def factory(uri: str):
        # mock://test-bucket/a/b -> (fs rooted at tmp_path, "a/b")
        rest = uri.split("://", 1)[1]
        assert rest.split("/", 1)[0] == BUCKET
        within = rest.split("/", 1)[1] if "/" in rest else ""
        return pafs.SubTreeFileSystem(str(tmp_path), local), within

    register_filesystem("mock", factory)
    yield tmp_path
    _FS_FACTORIES.pop("mock", None)


def _storage() -> ObjectStore:
    return ObjectStore(bucket=BUCKET, scheme="mock").resolve_templates(
        graph_name="g", names="t", name="t"
    )


def test_template_resolution_and_generation(mock_fs):
    key = PartitionKey(fields={"date": DateField(key=datetime.date(2021, 10, 1))})
    p = _storage().generate_partition(key, Fingerprint.from_int(42))
    assert p.path == f"mock://{BUCKET}/g/t/t/date=2021-10-01/_fingerprint=42"
    raw = (
        ObjectStore(bucket=BUCKET, scheme="mock")
        .resolve_templates(graph_name="g", names="t", name="t", strip_input_fingerprint=True)
        .generate_partition(key, Fingerprint.empty())
    )
    assert raw.path == f"mock://{BUCKET}/g/t/t/date=2021-10-01"


def test_scheme_double_slash_survives_collapse(mock_fs):
    p = _storage().generate_partition(PartitionKey.not_partitioned(), Fingerprint.from_int(1))
    assert p.path.startswith("mock://")
    assert "//" not in p.path.split("://", 1)[1]


def test_discovery_round_trip(mock_fs):
    storage = ObjectStore(bucket=BUCKET, scheme="mock").resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    for d in ("2021-10-01", "2021-10-02"):
        part_dir = mock_fs / "g" / "t" / "t" / f"date={d}"
        part_dir.mkdir(parents=True)
        (part_dir / "part-0.parquet").write_bytes(b"xx")
    parts = storage.discover_partitions({"date": DateField})
    assert len(parts) == 2
    assert sorted(p.partition_key.values()["date"].isoformat() for p in parts) == [
        "2021-10-01",
        "2021-10-02",
    ]
    assert all(p.path.startswith(f"mock://{BUCKET}/") for p in parts)


def test_discovery_with_fingerprint(mock_fs):
    storage = _storage()
    (mock_fs / "g" / "t" / "t" / "_fingerprint=-7").mkdir(parents=True)
    (mock_fs / "g" / "t" / "t" / "_fingerprint=-7" / "f").write_bytes(b"d")
    parts = storage.discover_partitions({})
    assert len(parts) == 1
    assert parts[0].input_fingerprint == Fingerprint.from_int(-7)


def test_discovery_empty_prefix(mock_fs):
    assert _storage().discover_partitions({"date": DateField}) == []


def test_content_fingerprint_fast_and_strict(mock_fs):
    d = mock_fs / "g" / "t" / "t"
    d.mkdir(parents=True)
    f = d / "obj.bin"
    f.write_bytes(b"hello")
    sp = StoragePartition(path=f"mock://{BUCKET}/g/t/t")
    fast1 = sp.compute_content_fingerprint().content_fingerprint
    strict1 = sp.compute_content_fingerprint(strict=True).content_fingerprint
    assert fast1 != Fingerprint.empty()
    f.write_bytes(b"world")
    strict2 = sp.compute_content_fingerprint(strict=True).content_fingerprint
    assert strict1 != strict2
    f.write_bytes(b"hello")
    strict3 = sp.compute_content_fingerprint(strict=True).content_fingerprint
    assert strict1 == strict3  # content-addressed


def test_content_fingerprint_missing_raises(mock_fs):
    sp = StoragePartition(path=f"mock://{BUCKET}/nope")
    with pytest.raises(FileNotFoundError):
        sp.compute_content_fingerprint()


def test_io_storage_sniff():
    from artigraph_spark.io import _storage_of

    sp = StoragePartition(path="s3a://bkt/g/t/t/part")
    st = _storage_of(sp)
    assert isinstance(st, ObjectStore)
    assert st.scheme == "s3a"
    assert st.bucket == "bkt"


def test_object_store_pandas_io_round_trip(mock_fs):
    """Reference test_gcs_io analogue: write a pandas frame to an object
    store partition via the pyarrow filesystem layer, fingerprint it, read
    it back — no Spark job, no credentials (mock:// scheme)."""
    import pandas as pd

    from artigraph_spark import io
    from artigraph_spark import types as at
    from artigraph_spark.formats import Parquet
    from artigraph_spark.views import PandasDataFrameView

    coll = at.Collection(element=at.Struct(fields={"a": at.Int64(), "b": at.String()}))
    # Raw-artifact form: no input-fingerprint segment (matches how Graph
    # resolves storage for non-produced artifacts).
    storage = ObjectStore(bucket=BUCKET, scheme="mock").resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    pdf = pd.DataFrame({"b": ["x", "y"], "a": [1, 2]})  # reordered on purpose
    io.write(pdf, coll, Parquet(), p, PandasDataFrameView, spark=None, storage=storage)

    fp = p.compute_content_fingerprint().content_fingerprint
    assert fp != Fingerprint.empty()

    back = io.read(coll, Parquet(), storage, [p], PandasDataFrameView, spark=None)
    assert list(back.columns) == ["a", "b"]
    assert sorted(zip(back["a"], back["b"])) == [(1, "x"), (2, "y")]

    found = storage.discover_partitions({})
    assert [f.path for f in found] == [p.path]


def test_object_store_pandas_rewrite_replaces_stale_parts(mock_fs):
    """Rewriting a partition must WIPE it: part files from an earlier write
    of the same path must not survive and merge stale rows into readers."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from artigraph_spark import io
    from artigraph_spark import types as at
    from artigraph_spark.formats import Parquet
    from artigraph_spark.views import PandasDataFrameView

    coll = at.Collection(element=at.Struct(fields={"a": at.Int64()}))
    storage = ObjectStore(bucket=BUCKET, scheme="mock").resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    # Simulate a prior multi-file (Spark-style) write of the same partition.
    fs, root = __import__("artigraph_spark.storage", fromlist=["_resolve_fs"])._resolve_fs(p.path)
    fs.create_dir(root, recursive=True)
    pq.write_table(pa.table({"a": [100, 200]}), f"{root}/part-00000-stale.parquet", filesystem=fs)

    io.write(pd.DataFrame({"a": [1, 2]}), coll, Parquet(), p, PandasDataFrameView, spark=None, storage=storage)
    back = io.read(coll, Parquet(), storage, [p], PandasDataFrameView, spark=None)
    assert sorted(back["a"]) == [1, 2]


def test_object_store_pandas_read_applies_declared_schema(mock_fs):
    """A file written int32 must come back as the DECLARED Int64 (parity
    with the Spark-path readers that pass spark.read.schema(...))."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from artigraph_spark import io
    from artigraph_spark import types as at
    from artigraph_spark.formats import Parquet
    from artigraph_spark.views import PandasDataFrameView

    coll = at.Collection(element=at.Struct(fields={"a": at.Int64()}))
    storage = ObjectStore(bucket=BUCKET, scheme="mock").resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    fs, root = __import__("artigraph_spark.storage", fromlist=["_resolve_fs"])._resolve_fs(p.path)
    fs.create_dir(root, recursive=True)
    pq.write_table(
        pa.table({"a": pa.array([7, 8], type=pa.int32())}),
        f"{root}/part-0.parquet",
        filesystem=fs,
    )
    back = io.read(coll, Parquet(), storage, [p], PandasDataFrameView, spark=None)
    assert str(back["a"].dtype) == "int64"
    assert sorted(back["a"]) == [7, 8]


def test_object_store_pandas_write_honors_cluster_by(mock_fs):
    """cluster_by is the row-group locality contract every writer applies."""
    import pandas as pd
    import pyarrow.parquet as pq

    from artigraph_spark import io
    from artigraph_spark import types as at
    from artigraph_spark.formats import Parquet
    from artigraph_spark.views import PandasDataFrameView

    coll = at.Collection(
        element=at.Struct(fields={"a": at.Int64()}), cluster_by=("a",)
    )
    storage = ObjectStore(bucket=BUCKET, scheme="mock").resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    io.write(
        pd.DataFrame({"a": [3, 1, 2]}), coll, Parquet(), p, PandasDataFrameView,
        spark=None, storage=storage,
    )
    # The physical file lives under the manifested commit dir.
    committed = io.committed_data_path(p.path)
    assert committed != p.path
    fs, root = __import__("artigraph_spark.storage", fromlist=["_resolve_fs"])._resolve_fs(committed)
    stored = pq.read_table(f"{root}/part-0.parquet", filesystem=fs)
    assert stored["a"].to_pylist() == [1, 2, 3]


def test_provider_checksum_upgrades_fast_fingerprint(tmp_path):
    """With a registered checksum hook, fast-mode fingerprints are CONTENT
    identity (mtime churn invisible, content changes visible) — the
    reference's GCS md5Hash behavior. Without it, fast mode falls back to
    (size, mtime) change detection."""
    import hashlib
    import os

    local = pafs.LocalFileSystem()

    def factory(uri: str):
        rest = uri.split("://", 1)[1]
        within = rest.split("/", 1)[1] if "/" in rest else ""
        return pafs.SubTreeFileSystem(str(tmp_path), local), within

    def provider_md5(fs, path):  # simulates server-side md5Hash metadata
        with fs.open_input_stream(path) as fh:
            return hashlib.md5(fh.read()).hexdigest()

    d = tmp_path / "part"
    d.mkdir()
    f = d / "obj.bin"
    f.write_bytes(b"hello")
    sp = StoragePartition(path=f"ck://{BUCKET}/part")

    try:
        register_filesystem("ck", factory, checksum=provider_md5)
        fp1 = sp.compute_content_fingerprint().content_fingerprint
        # mtime-only churn (content identical) → fingerprint stable.
        os.utime(f, ns=(1, 1))
        assert sp.compute_content_fingerprint().content_fingerprint == fp1
        # content change → fingerprint moves.
        f.write_bytes(b"world")
        fp2 = sp.compute_content_fingerprint().content_fingerprint
        assert fp2 != fp1
        # revert content → fingerprint reverts (content-addressed).
        f.write_bytes(b"hello")
        assert sp.compute_content_fingerprint().content_fingerprint == fp1

        # strict mode ignores the hook and hashes bytes itself.
        s1 = sp.compute_content_fingerprint(strict=True).content_fingerprint
        assert s1 != fp1

        # Without the hook, the same mtime churn DOES move the fingerprint.
        register_filesystem("ck", factory)  # re-register, no checksum
        m1 = sp.compute_content_fingerprint().content_fingerprint
        os.utime(f, ns=(2_000_000_000, 2_000_000_000))
        m2 = sp.compute_content_fingerprint().content_fingerprint
        assert m1 != m2
    finally:
        _FS_FACTORIES.pop("ck", None)
        from artigraph_spark.storage import _FS_CHECKSUMS

        _FS_CHECKSUMS.pop("ck", None)


def test_mid_commit_listing_never_shows_partial_partition(mock_fs):
    """THE manifest-gate property: at every intermediate state of a
    multi-file object-store write, discovery + the read path see either the
    old committed set, the new committed set, or (first write) nothing —
    never a partial file set."""
    import json

    import pandas as pd

    from artigraph_spark import io
    from artigraph_spark import types as at
    from artigraph_spark.formats import Parquet
    from artigraph_spark.storage import MANIFEST_NAME, _resolve_fs
    from artigraph_spark.views import PandasDataFrameView

    coll = at.Collection(element=at.Struct(fields={"a": at.Int64()}))
    storage = ObjectStore(bucket=BUCKET, scheme="mock").resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())

    # --- first write, frozen mid-commit (files staged, manifest not yet PUT)
    part_dir = mock_fs / "g" / "t" / "t"
    staging = part_dir / ".__commit_777_feed__"
    staging.mkdir(parents=True)
    (staging / "part-00000.parquet").write_bytes(b"partial")
    assert storage.discover_partitions({}) == []  # invisible mid-commit

    # --- manifest PUT flips it to visible, and readers follow the manifest
    fs, root = _resolve_fs(p.path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"a": [1, 2]}), str(staging / "part-00000.parquet")
    )
    (part_dir / MANIFEST_NAME).write_text(
        json.dumps(
            {"commit": ".__commit_777_feed__", "files": [{"path": "part-00000.parquet", "size": 1}]}
        )
    )
    assert [q.path for q in storage.discover_partitions({})] == [p.path]
    back = io.read(coll, Parquet(), storage, [p], PandasDataFrameView, spark=None)
    assert sorted(back["a"]) == [1, 2]

    # --- overwrite frozen mid-commit: NEW staging exists alongside, reader
    # and fingerprint still resolve the OLD committed set only
    staging2 = part_dir / ".__commit_888_f00d__"
    staging2.mkdir()
    (staging2 / "part-00000.parquet").write_bytes(b"torn new half-written")
    fp_before = p.compute_content_fingerprint(strict=True).content_fingerprint
    back = io.read(coll, Parquet(), storage, [p], PandasDataFrameView, spark=None)
    assert sorted(back["a"]) == [1, 2]
    assert [q.path for q in storage.discover_partitions({})] == [p.path]
    assert (
        p.compute_content_fingerprint(strict=True).content_fingerprint == fp_before
    )

    # --- a REAL overwrite through io.write supersedes atomically and sweeps
    io.write(
        pd.DataFrame({"a": [7, 8, 9]}), coll, Parquet(), p, PandasDataFrameView,
        spark=None, storage=storage,
    )
    back = io.read(coll, Parquet(), storage, [p], PandasDataFrameView, spark=None)
    assert sorted(back["a"]) == [7, 8, 9]
    leftovers = {e.name for e in part_dir.iterdir()}
    assert MANIFEST_NAME in leftovers
    # old commit dir + the torn orphan were swept; exactly one commit remains
    commits = [n for n in leftovers if n.startswith(".__commit_")]
    assert len(commits) == 1
    assert ".__commit_777_feed__" not in leftovers
    assert ".__commit_888_f00d__" not in leftovers


def test_failed_object_write_preserves_committed_state(mock_fs):
    """A writer that dies mid-stage leaves the committed state byte-for-byte
    intact: same manifest, same data, no visibility change."""
    import pandas as pd
    import pytest as _pytest

    from artigraph_spark import io
    from artigraph_spark import types as at
    from artigraph_spark.formats import Parquet
    from artigraph_spark.views import PandasDataFrameView

    coll = at.Collection(element=at.Struct(fields={"a": at.Int64()}))
    storage = ObjectStore(bucket=BUCKET, scheme="mock").resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    io.write(pd.DataFrame({"a": [1]}), coll, Parquet(), p, PandasDataFrameView, spark=None, storage=storage)
    fp1 = p.compute_content_fingerprint(strict=True).content_fingerprint

    class Boom(Exception):
        pass

    class CrashyParquet(Parquet):
        pass

    @io.register_writer(CrashyParquet, ObjectStore, PandasDataFrameView)
    def _crashy(data, type_, fmt, partition, spark):
        from artigraph_spark.storage import _resolve_fs

        fs, root = _resolve_fs(partition.path)
        fs.create_dir(root, recursive=True)
        with fs.open_output_stream(f"{root}/part-0.parquet") as fh:
            fh.write(b"to")  # torn
        raise Boom

    with _pytest.raises(Boom):
        io.write(pd.DataFrame({"a": [2]}), coll, CrashyParquet(), p, PandasDataFrameView, spark=None, storage=storage)

    back = io.read(coll, Parquet(), storage, [p], PandasDataFrameView, spark=None)
    assert list(back["a"]) == [1]
    assert p.compute_content_fingerprint(strict=True).content_fingerprint == fp1
    # the failed attempt's staging dir was dropped
    part_dir = mock_fs / "g" / "t" / "t"
    assert len([n for n in part_dir.iterdir() if n.name.startswith(".__commit_")]) == 1


def test_generate_partition_rejects_commit_namespace(mock_fs):
    """A key value rendering into .__commit_ would be permanently
    undiscoverable — refused at generation, like .__tmp_/.__old_ locally."""
    from artigraph_spark.partitions import StringField

    storage = ObjectStore(
        bucket=BUCKET, scheme="mock",
    ).resolve_templates(graph_name="g", names="t", name="t", strip_input_fingerprint=True)
    with pytest.raises(ValueError, match="reserved"):
        storage.generate_partition(
            PartitionKey(fields={"v": StringField(key=".__commit_x__")}),
            Fingerprint.empty(),
        )


def test_zero_file_commit_refuses_flip_and_keeps_previous(mock_fs):
    """A writer that lands zero objects did not complete: the commit must
    raise (not silently keep serving the old data as if the overwrite
    happened) and the previous committed set must stay intact."""
    import pytest

    from artigraph_spark.io import atomic_object_commit, committed_data_path
    from artigraph_spark.storage import _resolve_fs

    uri = f"mock://{BUCKET}/zero/p"
    with atomic_object_commit(uri) as staged:
        fs, stroot = _resolve_fs(staged)
        fs.create_dir(stroot, recursive=True)
        with fs.open_output_stream(f"{stroot}/part-0.bin") as fh:
            fh.write(b"v1")
    first_commit = committed_data_path(uri)
    assert first_commit != uri
    with pytest.raises(OSError, match="produced no files"):
        with atomic_object_commit(uri) as staged:
            fs, stroot = _resolve_fs(staged)
            fs.create_dir(stroot, recursive=True)  # dir, but zero files
    # Previous commit still the visible one; no stray staging dirs.
    assert committed_data_path(uri) == first_commit
    fs, root = _resolve_fs(uri)
    import pyarrow.fs as pafs

    names = {
        i.path.rsplit("/", 1)[-1]
        for i in fs.get_file_info(pafs.FileSelector(root, recursive=False))
    }
    assert not {n for n in names if n.startswith(".__commit_")} - {
        first_commit.rsplit("/", 1)[-1]
    }


def test_wrong_shape_manifest_degrades_to_legacy_layout(mock_fs):
    """A manifest that parses as JSON but has the wrong shape (missing
    'commit', or not a dict) must degrade readers to the legacy layout,
    never crash them."""
    from artigraph_spark.io import committed_data_path
    from artigraph_spark.storage import MANIFEST_NAME, _resolve_fs

    uri = f"mock://{BUCKET}/badmanifest/p"
    fs, root = _resolve_fs(uri)
    fs.create_dir(root, recursive=True)
    for payload in (b"[1, 2, 3]", b'{"files": []}', b'{"commit": 7}'):
        with fs.open_output_stream(f"{root}/{MANIFEST_NAME}") as fh:
            fh.write(payload)
        assert committed_data_path(uri) == uri  # graceful legacy fallback


def test_corrupt_manifest_degrades_to_legacy_layout(mock_fs):
    """A non-JSON _MANIFEST.json (foreign tool, torn write) must degrade to
    the legacy unmanifested layout for BOTH discovery and fingerprinting,
    never crash a snapshot."""
    d = mock_fs / "g" / "t" / "t" / "_fingerprint=3"
    d.mkdir(parents=True)
    (d / "part-0.json").write_bytes(b'{"v": 1}')
    (d / "_MANIFEST.json").write_bytes(b"\xff\xfenot json at all")
    storage = _storage()
    parts = storage.discover_partitions({})
    assert len(parts) == 1
    snapped = parts[0].compute_content_fingerprint()
    assert not snapped.content_fingerprint.is_empty


def test_unresolvable_scheme_raises_not_empty(tmp_path):
    """Infrastructure failures (unresolvable scheme) must raise, not
    masquerade as an empty bucket."""
    storage = ObjectStore(
        scheme="no-such-scheme", bucket="b"
    ).resolve_templates(graph_name="g", names="t", name="t", strip_input_fingerprint=True)
    with pytest.raises(RuntimeError, match="cannot resolve filesystem"):
        storage.discover_partitions({})
