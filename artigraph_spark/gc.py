"""Partition garbage collection: reclaim storage from superseded builds.

The memoization layer is content-addressed and append-only — every input
change materializes NEW output partitions under a new input fingerprint and
never deletes the old ones (the reference behaves the same way,
/root/reference/src/arti/executors/__init__.py:34-105: skip-or-build, no
removal). At pipeline scale that is the right default (old snapshots stay
readable, reverts re-hit old outputs with zero compute) but storage grows
without bound. This module adds the retention half the reference leaves
out: delete produced partitions not referenced by any snapshot the caller
wants to keep, and drop their catalog entries so memoization cannot serve
a path whose data is gone.

Raw (non-produced) artifacts are never touched — their data is not ours.
Snapshot links for discarded snapshots are intentionally retained: reading
a pruned snapshot raises FileNotFoundError ("this snapshot was retired"),
rather than silently vanishing from history.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import TYPE_CHECKING, Any, Iterable

from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.partitions import PartitionKey

if TYPE_CHECKING:  # pragma: no cover
    from artigraph_spark.graphs import Graph, GraphSnapshot


def _snapshot_id(s: Any) -> Fingerprint:
    return s if isinstance(s, Fingerprint) else s.snapshot_id


def _is_older_than(path: str, cutoff: float) -> bool:
    """True when the partition's storage mtime predates ``cutoff`` — the
    concurrent-build guard. On object stores a "directory" is a synthesized
    prefix with NO mtime, so the age comes from the NEWEST object under the
    prefix (S3/GCS objects do carry mtimes). Unknown age after that (no
    objects, store exposes no mtimes) reads as YOUNG — i.e. NOT prunable:
    this guard exists to protect in-flight writes, so when age cannot be
    established the safe answer is to keep, not delete."""
    mtime: float | None = None
    if path.startswith("literal://"):
        return True  # no physical data; catalog-only
    if "://" in path and not path.startswith("file://"):
        from pyarrow import fs as pafs

        from artigraph_spark.storage import _resolve_fs

        fs, root = _resolve_fs(path)
        info = fs.get_file_info(root)
        mt = getattr(info, "mtime", None)
        if mt is None and info.type == pafs.FileType.Directory:
            stamps = [
                i.mtime.timestamp()
                for i in fs.get_file_info(
                    pafs.FileSelector(root, recursive=True, allow_not_found=True)
                )
                if i.type == pafs.FileType.File and getattr(i, "mtime", None) is not None
            ]
            mtime = max(stamps) if stamps else None
        else:
            mtime = mt.timestamp() if mt is not None else None
        return mtime is not None and mtime < cutoff
    ospath = path[len("file://") :] if path.startswith("file://") else path
    try:
        mtime = os.path.getmtime(ospath)
    except OSError:
        # Vanished between listing and stat — already gone; nothing to
        # protect, let the prune's own delete be the no-op.
        return True
    return mtime < cutoff


def _delete_path(path: str) -> None:
    if path.startswith("literal://"):
        return  # inline literal — no physical data
    if "://" in path and not path.startswith("file://"):
        from pyarrow import fs as pafs

        from artigraph_spark.storage import _resolve_fs

        fs, root = _resolve_fs(path)
        info = fs.get_file_info(root)
        if info.type == pafs.FileType.Directory:
            fs.delete_dir(root)
        elif info.type == pafs.FileType.File:
            fs.delete_file(root)
        return
    ospath = path[len("file://") :] if path.startswith("file://") else path
    if os.path.isdir(ospath):
        shutil.rmtree(ospath)
    elif os.path.exists(ospath):
        os.remove(ospath)


def prune_unreferenced_partitions(
    graph: Graph,
    keep: Iterable[GraphSnapshot | Fingerprint],
    *,
    dry_run: bool = False,
    grace_seconds: float = 3600.0,
) -> dict[str, list[str]]:
    """Delete produced partitions not referenced by any snapshot in ``keep``.

    Returns ``{artifact_key: [pruned paths]}`` (what WOULD be pruned when
    ``dry_run``). The scan side is partition DISCOVERY — the same listing
    the snapshot path uses, O(metadata) — so pruning never reads data
    bytes; deletion is per-partition directory removal.

    Retention is snapshot-driven, not age-driven: pass the snapshots (or
    snapshot ids / tags resolved via ``GraphSnapshot.from_tag``) that must
    stay readable. Everything else that this graph's producers wrote for
    those artifacts is reclaimed.

    **Concurrent builds**: the build path is write-then-record — partition
    bytes land BEFORE the snapshot link that references them exists. A
    prune racing an in-flight build would therefore see fresh,
    not-yet-linked partitions as garbage and delete them mid-build.
    ``grace_seconds`` (default 1 h) closes that window: partitions whose
    storage mtime is younger than the grace are never touched, so only
    builds stalled longer than the grace between write and record are at
    risk. Pass ``grace_seconds=0`` ONLY when the caller guarantees no
    build runs concurrently (e.g. a maintenance window). Unknown-age
    asymmetry: a LOCAL path that vanished between listing and stat counts
    as old (it is already gone; the delete is a no-op), while a REMOTE
    partition whose store exposes no mtimes is conservatively KEPT —
    age-gated deletion of data whose age cannot be established is how
    in-flight builds get corrupted, so such stores must be pruned by an
    explicit path list instead.
    """
    # References are gathered across ALL artifact fingerprints linked to the
    # kept snapshots — not just the current graph's. Links are keyed by the
    # artifact fingerprint AT LINK TIME; an artifact definition change (type
    # widened, format swapped) alters the fingerprint without moving the
    # storage path, and a fingerprint-scoped lookup would read zero links
    # and delete a kept snapshot's data.
    referenced: set[str] = set()
    for s in keep:
        for p in graph.backend.read_all_snapshot_partitions(_snapshot_id(s)):
            referenced.add(p.path)
    cutoff = time.time() - grace_seconds
    pruned: dict[str, list[str]] = {}
    for key, artifact in sorted(graph._artifacts.items()):
        if not artifact.is_produced:
            continue
        on_disk = artifact.storage.discover_partitions(
            PartitionKey.types_from(artifact.type)
        )
        victims = sorted(
            p.path
            for p in on_disk
            if p.path not in referenced and _is_older_than(p.path, cutoff)
        )
        if not victims:
            continue
        if not dry_run:
            # Catalog entries go FIRST, path-keyed across every artifact
            # fingerprint: if the process dies mid-delete, data without a
            # catalog entry is invisible garbage (produced artifacts are
            # read via backend links, never re-discovered), while a catalog
            # entry without data would memoize a dead path.
            graph.backend.delete_partitions_by_path(set(victims))
            for path in victims:
                _delete_path(path)
        pruned[key] = victims
    return pruned
