"""Partition GC: reclaim superseded produced partitions while keeping
chosen snapshots readable and the memoization layer consistent (no catalog
entry may outlive its data)."""

import os

import pytest

from artigraph_spark.backends import JsonFileBackend
from artigraph_spark.executors import LocalSparkExecutor
from artigraph_spark.gc import prune_unreferenced_partitions

from tests.test_graph import make_graph, seed_nums


def _build(tmp_root, backend):
    g, _nums, total = make_graph(tmp_root, backend)
    ex = LocalSparkExecutor()
    snap = g.snapshot(strict_fingerprints=True).build(ex)
    return g, total, snap, ex


def test_prune_keeps_latest_deletes_superseded(tmp_root, spark):
    backend = JsonFileBackend(os.path.join(tmp_root, "catalog.json"))
    seed_nums(tmp_root, [1, 2, 3])
    g1, total1, snap1, _ = _build(tmp_root, backend)

    seed_nums(tmp_root, [1, 2, 3, 4])
    g2, total2, snap2, _ = _build(tmp_root, backend)
    assert snap2.snapshot_id != snap1.snapshot_id

    # Two materialized output partitions exist (one per input fingerprint).
    out_dir = os.path.join(tmp_root, "g/total/total")
    assert len(os.listdir(out_dir)) == 2

    # Dry run reports the victim without touching anything.
    plan = prune_unreferenced_partitions(g2, keep=[snap2], dry_run=True, grace_seconds=0)
    assert list(plan) == ["total"] and len(plan["total"]) == 1
    assert len(os.listdir(out_dir)) == 2

    pruned = prune_unreferenced_partitions(g2, keep=[snap2], grace_seconds=0)
    assert pruned == plan
    assert len(os.listdir(out_dir)) == 1

    # Kept snapshot still reads; pruned snapshot now reports missing data.
    assert snap2.read(total2, annotation=int) == 10
    with pytest.raises(FileNotFoundError):
        snap1.read(total1, annotation=int)

    # Memoization stays consistent: rebuilding the KEPT state is a no-op...
    ex = LocalSparkExecutor()
    make_graph(tmp_root, backend)[0].snapshot(strict_fingerprints=True).build(ex)
    assert (ex.built_partitions, ex.skipped_partitions) == (0, 1)

    # ...and reverting to the PRUNED state rebuilds (catalog entry was
    # dropped with the data — a stale entry would serve a dead path).
    seed_nums(tmp_root, [1, 2, 3])
    g3, total3, _, ex3 = _build(tmp_root, backend)
    assert ex3.built_partitions == 1
    assert g3.snapshot(strict_fingerprints=True).read(total3, annotation=int) == 6


def test_prune_never_touches_raw_artifacts(tmp_root, spark):
    backend = JsonFileBackend(os.path.join(tmp_root, "catalog.json"))
    raw_path = seed_nums(tmp_root, [5, 6])
    g, _total, snap, _ = _build(tmp_root, backend)
    pruned = prune_unreferenced_partitions(g, keep=[snap], grace_seconds=0)
    assert pruned == {}  # nothing superseded, nothing raw
    assert os.path.exists(raw_path)


def test_prune_keep_multiple_snapshots(tmp_root, spark):
    backend = JsonFileBackend(os.path.join(tmp_root, "catalog.json"))
    seed_nums(tmp_root, [1])
    g1, t1, snap1, _ = _build(tmp_root, backend)
    seed_nums(tmp_root, [1, 2])
    g2, t2, snap2, _ = _build(tmp_root, backend)
    pruned = prune_unreferenced_partitions(g2, keep=[snap1, snap2], grace_seconds=0)
    assert pruned == {}
    assert snap1.read(t1, annotation=int) == 1
    assert snap2.read(t2, annotation=int) == 3


def test_prune_survives_artifact_definition_drift(tmp_root, spark):
    """Snapshot links are keyed by the artifact fingerprint AT LINK TIME. A
    definition change (here: nullable tweak) alters the fingerprint without
    moving storage paths — pruning through the NEW graph must still honor
    links recorded under the OLD fingerprint for kept snapshots."""
    import json as _json
    import os as _os

    from artigraph_spark import types as at
    from artigraph_spark.formats import JSON
    from artigraph_spark.graphs import Graph
    from artigraph_spark.storage import LocalFile

    from tests.test_graph import NUM_TYPE, Num, SumNums, Total

    backend = JsonFileBackend(os.path.join(tmp_root, "catalog.json"))

    def build(total_type):
        with Graph("g", backend=backend) as g:
            g.artifacts.nums = Num(type=NUM_TYPE, format=JSON(), storage=LocalFile(root=tmp_root))
            p = SumNums(nums=g.artifacts.nums)
            g.artifacts.total = p.out(
                Total(type=total_type, format=JSON(), storage=LocalFile(root=tmp_root))
            )
        ex = LocalSparkExecutor()
        snap = g.snapshot(strict_fingerprints=True).build(ex)
        return g, g.artifacts.total, snap

    seed_nums(tmp_root, [1, 2, 3])
    g1, t1, snap1 = build(at.Int64(nullable=False))
    seed_nums(tmp_root, [1, 2, 3, 4])
    g2, t2, snap2 = build(at.Int64(nullable=True))
    assert t1.fingerprint != t2.fingerprint  # the drift under test
    out_dir = os.path.join(tmp_root, "g/total/total")
    assert len(_os.listdir(out_dir)) == 2

    # Keeping both snapshots through the NEW graph must delete nothing.
    assert prune_unreferenced_partitions(g2, keep=[snap1, snap2], grace_seconds=0) == {}
    assert snap1.read(t1, annotation=int) == 6
    assert snap2.read(t2, annotation=int) == 10

    # Dropping snap1 prunes its partition even though its links (and its
    # catalog entries) live under the OLD fingerprint — path-keyed deletion.
    pruned = prune_unreferenced_partitions(g2, keep=[snap2], grace_seconds=0)
    assert len(pruned["total"]) == 1
    state = _json.load(open(os.path.join(tmp_root, "catalog.json")))
    for store in state["partitions"].values():
        assert pruned["total"][0] not in store  # no stale entry under ANY fp
    assert snap2.read(t2, annotation=int) == 10
    with pytest.raises(FileNotFoundError):
        snap1.read(t1, annotation=int)


def test_prune_with_memory_backend(tmp_root, spark):
    """The gc path (read_all_snapshot_partitions + delete_partitions_by_path)
    must behave identically on the in-process MemoryBackend."""
    from artigraph_spark.backends import MemoryBackend

    backend = MemoryBackend()
    seed_nums(tmp_root, [1, 2])
    g1, t1, snap1, _ = _build(tmp_root, backend)
    seed_nums(tmp_root, [1, 2, 3])
    g2, t2, snap2, _ = _build(tmp_root, backend)

    pruned = prune_unreferenced_partitions(g2, keep=[snap2], grace_seconds=0)
    assert len(pruned["total"]) == 1
    assert snap2.read(t2, annotation=int) == 6
    with pytest.raises(FileNotFoundError):
        snap1.read(t1, annotation=int)
    # Catalog entry went with the data: reverting rebuilds instead of
    # memoizing a dead path.
    seed_nums(tmp_root, [1, 2])
    _, t3, snap3, ex3 = _build(tmp_root, backend)
    assert ex3.built_partitions == 1
    assert snap3.read(t3, annotation=int) == 3


def test_prune_grace_window_protects_fresh_partitions(tmp_root, spark):
    """Write-then-record race guard: a partition younger than grace_seconds
    is never pruned, even when no kept snapshot references it — exactly the
    state an in-flight build is in between writing bytes and recording the
    snapshot link."""
    backend = JsonFileBackend(os.path.join(tmp_root, "catalog.json"))
    seed_nums(tmp_root, [1, 2, 3])
    g1, t1, snap1, _ = _build(tmp_root, backend)
    seed_nums(tmp_root, [1, 2, 3, 4])
    g2, t2, snap2, _ = _build(tmp_root, backend)
    out_dir = os.path.join(tmp_root, "g/total/total")
    assert len(os.listdir(out_dir)) == 2

    # Default grace (1 h): the superseded partition was written seconds ago
    # — indistinguishable from an in-flight build's output — so it survives,
    # and the dry-run plan agrees.
    assert prune_unreferenced_partitions(g2, keep=[snap2], dry_run=True) == {}
    assert prune_unreferenced_partitions(g2, keep=[snap2]) == {}
    assert len(os.listdir(out_dir)) == 2
    assert snap1.read(t1, annotation=int) == 6

    # Age the partition past the cutoff -> it becomes a victim.
    victim = prune_unreferenced_partitions(
        g2, keep=[snap2], dry_run=True, grace_seconds=0
    )["total"][0]
    old = __import__("time").time() - 7200
    os.utime(victim, (old, old))
    pruned = prune_unreferenced_partitions(g2, keep=[snap2])
    assert pruned["total"] == [victim]
    assert snap2.read(t2, annotation=int) == 10


def test_is_older_than_object_prefix_uses_newest_object(monkeypatch):
    """Object-store 'directories' are synthesized prefixes with NO mtime:
    age must come from the newest object under the prefix, and an
    unknowable age must read as YOUNG (keep) — the guard exists to protect
    in-flight writes."""
    import datetime
    import time

    from pyarrow import fs as pafs

    import artigraph_spark.storage as storage
    from artigraph_spark.gc import _is_older_than

    class Info:
        def __init__(self, type_, mtime_s=None):
            self.type = type_
            self.mtime = (
                datetime.datetime.fromtimestamp(mtime_s) if mtime_s else None
            )

    class FakeFS:
        def __init__(self, file_infos):
            self._files = file_infos

        def get_file_info(self, sel):
            if isinstance(sel, pafs.FileSelector):
                return self._files
            return Info(pafs.FileType.Directory)  # prefix: no mtime

    now = time.time()
    cutoff = now - 3600

    def mount(files):
        fs = FakeFS(files)
        monkeypatch.setattr(storage, "_resolve_fs", lambda p: (fs, "bucket/p"))

    mount([Info(pafs.FileType.File, now - 60)])  # freshly written object
    assert _is_older_than("s3://bucket/p", cutoff) is False
    mount([Info(pafs.FileType.File, now - 7200)])  # genuinely old
    assert _is_older_than("s3://bucket/p", cutoff) is True
    mount([])  # age unknowable → keep, never delete
    assert _is_older_than("s3://bucket/p", cutoff) is False
