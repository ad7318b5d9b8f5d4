"""Scoped AQE control for operators that manage their own partitioning.

AQE (adaptive query execution) re-optimizes at EVERY exchange: each shuffle
becomes an independently submitted query stage with a driver barrier —
materialize the map side, collect statistics, re-plan, submit the next
stage. That re-planning round costs a fixed driver latency per exchange
(the bench's ``dispatch_ms_per_stage`` gauge measures the same mode), and
it also defeats whole-job pipelining: with AQE off the DAG scheduler
submits the complete stage graph at once and overlapping stages back-fill
the executors.

For most declared queries AQE is a clear win and stays on (the session
default): runtime join-strategy switches and skew splitting are exactly
right for one-shot relational plans over data whose statistics Catalyst
can only estimate (measured here: ``minhash_lsh_pairs`` is 2x FASTER with
AQE on). But two operator families pay the per-exchange barrier many times
over and get nothing back, because the information AQE would discover at
runtime is already pinned by the operator itself:

- **fixed-iteration loops** (pagerank, HITS, BFS, connected components):
  the same node-keyed exchange shapes repeat every round over frames whose
  partitioning the operator pins (persisted degree-annotated edges, the
  session's env-derived shuffle-partition width). 8 iterations x 3
  exchanges = 24 driver barriers per run for plans that never change
  between rounds. Measured at sf0.1/local[32]: pagerank 10.6 s -> 5.1 s
  with AQE off (131 -> ~40 stages).
- **skew-bounded pipelines** (degree-ordered triangle wedge enumeration):
  the algorithm bounds per-key fanout by construction (orientation caps
  out-degree at O(sqrt(E))), so AQE's skew splitting is redundant while
  its barriers serialize a deep join pipeline. Measured: triangle counts
  5.9 s -> 3.1 s with AQE off.

The per-exchange barrier count is scale-INDEPENDENT (it depends on plan
shape, not data volume) — but the benefit side is NOT zero at every
scale: the r15 x30 probe (docs/SCALE_PROBE_r15.json) measured pagerank
1.5x FASTER with AQE ON once the loop's input reached 373 MB (runtime
partition coalescing/skew handling earns the barriers when stages do
real data work). The scope is therefore SCALE-ADAPTIVE: it pins AQE off
only while the operator's estimated input is below
``SPARK_GRAFT_PIN_MAX_BYTES`` (default 256 MB — the dispatch-bound
regime where the pin measured ~2x at sf0.1), and leaves the session's
AQE alone above it. ``SPARK_GRAFT_LOOP_AQE=1`` never pins;
``SPARK_GRAFT_LOOP_AQE=0`` always pins.

Thread-safety: Spark session conf is session-global, so the scope is
serialized under a module lock held for the WHOLE operator runtime
(concurrent threads entering pinned operators run one at a time); a
*different* thread planning an unrelated query concurrently on the same
session could still observe AQE off (the same session-conf caveat as
``sources.load``'s nanosAsLong scope). The lock is re-entrant and the
conf toggles only at nesting depth 0, so composed pinned operators (a
graph operator calling connected_components) neither deadlock nor
restore the conf early. The threaded executor runs producers, not
declared queries, so this does not arise in the build/bench paths.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

# Re-entrant: nested pinned scopes (operator composition) must not
# deadlock. The conf is toggled only by the outermost scope (_DEPTH 0).
_LOCK = threading.RLock()
_DEPTH = 0
_PREV: "str | None" = None

_FLAG = "spark.sql.adaptive.enabled"

# Scale-adaptive reuse threshold (bytes of estimated INPUT the fanned-out
# subtree would re-read per extra execution). Below it the frame stays
# lazy — at bench scale (sf0.1 lineitem ≈ 11 MB of parquet) re-running a
# scan+aggregate twice more is cheaper than writing and reading cache
# blocks, measured directly: a forced cut made spearman_price_quantity
# SLOWER at sf0.1. Above it the recompute dominates by construction —
# every extra consumer re-reads the whole input from storage — so the
# histogram is materialized once. 256 MB is the conservative crossover:
# ≥16x the measured break-even scale, far below any "100 TB" regime.
_REUSE_ENV = "SPARK_GRAFT_REUSE_MIN_BYTES"
_REUSE_DEFAULT = 256 * 1024 * 1024

# Optional reliable-checkpoint routing for the cut (r15): when set, frames
# cut above the threshold go through ``operators._checkpoint`` into this
# fault-tolerant directory (HDFS/object store on a cluster) instead of
# executor-local blocks. localCheckpoint blocks cannot be replayed after
# executor loss, and the cut only fires ABOVE the size threshold — i.e.
# exactly at the cluster scale where executor loss is routine — so
# production runs should point this at durable storage; local/bench runs
# leave it unset and keep the cheap executor-local path.
_REUSE_DIR_ENV = "SPARK_GRAFT_REUSE_DIR"

# Catalyst's defaultSizeInBytes for relations with no statistics is
# Long.MaxValue (sometimes scaled); anything this large is "unknown",
# not an actual size. 2^60 ≈ 1.15 exabytes — no real leaf estimate in
# this engine's regime approaches it.
_UNKNOWN_SIZE = 1 << 60


def estimated_input_bytes(df: DataFrame) -> int | None:
    """Sum of the Catalyst size estimates of ``df``'s LEAF relations —
    the bytes one full execution of the frame's subtree re-reads from
    storage.

    Leaves, not the plan root: without CBO column statistics Catalyst's
    default join estimate is the PRODUCT of the input sizes (measured:
    a 11 MB ⋈ 3 MB join at sf0.1 reports 1.5 TB), so a root estimate
    would wildly over-trigger. Leaf sizes are file-length-derived for
    parquet relations (linear in scale factor) and cache-block-sized
    for already-checkpointed upstreams (re-reading cached blocks is
    cheap, and the estimate says so). Leaves with NO estimate (Catalyst
    reports defaultSizeInBytes ≈ Long.MaxValue, e.g. a driver-local
    ``createDataFrame`` relation) count as ZERO: such inputs are either
    driver-local literals (tiny by construction) or already-materialized
    RDDs — re-reading them is cheap, and "unknown" must not be read as
    "huge" or every literal-seeded frame would pay a pointless cut.
    Returns None when the JVM-side walk fails (never raises into an
    operator)."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        sizes = [
            int(str(leaves.apply(i).stats().sizeInBytes()))
            for i in range(leaves.size())
        ]
        return sum(s for s in sizes if s < _UNKNOWN_SIZE)
    except Exception:  # noqa: BLE001 — estimate is advisory only
        return None


def reuse_frame(df: DataFrame) -> DataFrame:
    """Scale-adaptive lineage cut for a SUMMARY-SIZED frame consumed by
    2+ downstream branches of one query.

    Spark recomputes a shared subtree once per consumer unless the
    exchanges are byte-identical — and column pruning specializes each
    branch's aggregate (the range frame keeps only the value column,
    the offsets branch drops it, the window keeps everything), so
    exchange reuse never fires for the bucketed rank/prefix-sum
    pattern: at 100 TB each extra branch is a full fact-table rescan
    (guide §2.4 "remove shuffles outright" / §3.3 "materialising an
    intermediate truncates the plan").

    Below the ``SPARK_GRAFT_REUSE_MIN_BYTES`` input threshold (default
    256 MB) this is a NO-OP — the declared plan, the bench timings and
    the oracle replay at test scale are bit-identical to the lazy
    shape. Above it the frame is cut with ``localCheckpoint(eager=
    False)``: computed once on first action, blocks freed by the
    ContextCleaner when the result frame is dropped (the persist()
    alternative leaks CacheManager entries for lazy query frames no
    caller ever unpersists), partitioning/ordering metadata preserved
    (LogicalRDD carries both, so chained passes keep their
    no-new-exchange property). Fault-tolerance: a localCheckpoint
    cannot be replayed after executor loss, so cluster runs set
    ``SPARK_GRAFT_REUSE_DIR`` to a fault-tolerant directory and the cut
    routes through ``operators._checkpoint`` (reliable ``checkpoint``)
    instead; iterative operators that take an explicit
    ``checkpoint_dir`` argument keep their own routing.

    Only hand this SUMMARY-sized frames (histograms, distinct-value
    maps): the materialization cost is the frame's own size, which for
    a histogram is bounded by the distinct count, not the row count."""
    return reuse_frame_cut(df)[0]


def reuse_frame_cut(df: DataFrame) -> "tuple[DataFrame, bool]":
    """:func:`reuse_frame` plus a flag saying whether the cut fired —
    for callers that restructure neighbouring branches only when the
    frame is actually materialized (e.g. sourcing a min/max range frame
    from the cached histogram instead of the raw rows)."""
    try:
        threshold = int(os.environ.get(_REUSE_ENV, _REUSE_DEFAULT))
    except (TypeError, ValueError):  # malformed env must not break queries
        threshold = _REUSE_DEFAULT
    est = estimated_input_bytes(df)
    if est is None or est < threshold:
        return df, False
    try:
        # Already materialized (the plan is a bare LogicalRDD /
        # InMemoryRelation / driver-local leaf — e.g. a caller cut this
        # frame before passing it down): a second cut would copy the
        # cached blocks for nothing. Composed operators hit this when
        # both a caller and a primitive guard the same frame. A bare
        # FILE-SCAN leaf (LogicalRelation etc.) is NOT materialized —
        # but it is also not worth cutting: each consumer's pruned,
        # pushdown-filtered columnar re-scan is cheaper than one
        # full-width copy into cache, so report cut=False and let the
        # caller keep its below-threshold shape.
        plan = df._jdf.queryExecution().analyzed()
        if plan.children().isEmpty():
            name = plan.getClass().getSimpleName()
            if name in (
                "LogicalRDD",
                "InMemoryRelation",
                "LocalRelation",
                "OneRowRelation",
            ):
                return df, True
            return df, False
    except Exception:  # noqa: BLE001 — guard is advisory only
        pass
    return cut_frame(df), True


def cut_frame(df: DataFrame) -> DataFrame:
    """Apply the reuse cut UNCONDITIONALLY, with the same routing as
    :func:`reuse_frame` (``SPARK_GRAFT_REUSE_DIR`` → reliable checkpoint,
    else executor-local blocks) but no threshold check — for operators
    that already decided the frame is above threshold from an UPSTREAM
    estimate. The case that needs this: once an upstream cut fired, the
    downstream frame's leaves are unknown-size RDD scans (estimated as
    zero), so ``reuse_frame`` on it could never fire even though one
    materialized execution is exactly as justified as the upstream one
    (seasonal_decompose's output under stl_outliers' 3-branch fan-out).
    """
    reuse_dir = os.environ.get(_REUSE_DIR_ENV)
    if reuse_dir:
        from artigraph_spark.operators._checkpoint import checkpoint as _ckpt

        return _ckpt(df, reuse_dir, eager=False)
    return df.localCheckpoint(eager=False)


# Scale crossover for the AQE pin (r15, measured at both ends): below
# it the loop is DISPATCH-bound — the per-exchange re-planning barrier
# dominates and pinning AQE off measured ~2x faster (pagerank 10.6 s ->
# 5.1 s at sf0.1, 11 MB of input; r14). Above it the loop is DATA-bound
# and AQE's runtime partition coalescing/skew handling wins: at x30
# (373 MB of input, docs/SCALE_PROBE_r15.json) pagerank measured 52.8 s
# pinned vs 35.3 s with AQE on (1.5x), results identical. The pin is
# therefore applied only when the loop's estimated input is BELOW this
# threshold — never a constant tuned for one deployment (guide §2).
_PIN_MAX_ENV = "SPARK_GRAFT_PIN_MAX_BYTES"


@contextmanager
def pinned_parallelism(spark, frame: "DataFrame | None" = None):
    """Scope AQE off around an operator-managed eager materialization —
    scale-adaptively: the scope only pins when the operator's estimated
    input (``frame``'s leaf sizes) is below ``SPARK_GRAFT_PIN_MAX_BYTES``
    (default 256 MB), i.e. when the loop is dispatch-bound and the
    per-exchange AQE barrier is the dominant cost. Data-bound loops
    keep the session's AQE (runtime coalescing + skew splitting won
    1.5x at the x30 probe scale). With ``frame=None`` the scope always
    pins (caller opted out of the estimate).

    Env overrides: ``SPARK_GRAFT_LOOP_AQE=1`` never pins (cluster
    operators who want runtime skew handling inside every loop);
    ``SPARK_GRAFT_LOOP_AQE=0`` always pins (measurement/debug).

    The module lock is held for the ENTIRE scope (typically a whole
    operator run): concurrent threads entering pinned operators
    serialize behind it, by design — the alternative is two threads
    fighting over one session-global conf. The lock is re-entrant and
    the conf toggles only at depth 0, so a pinned operator composing
    another pinned operator is safe. Restore semantics: a conf the
    session had explicitly set is restored to that value; a conf left
    at its session default is restored by ``unset`` (never forced to
    "true" — a session whose default is AQE-off stays AQE-off).
    """
    mode = os.environ.get("SPARK_GRAFT_LOOP_AQE", "")
    if mode == "1":
        yield
        return
    if mode != "0" and frame is not None:
        try:
            threshold = int(os.environ.get(_PIN_MAX_ENV, _REUSE_DEFAULT))
        except (TypeError, ValueError):  # malformed env must not break queries
            threshold = _REUSE_DEFAULT
        est = estimated_input_bytes(frame)
        if est is not None and est >= threshold:
            # Data-bound loop: AQE's runtime re-planning earns its
            # barriers — leave the session conf alone entirely.
            yield
            return
    global _DEPTH, _PREV
    with _LOCK:
        if _DEPTH == 0:
            try:
                # None <=> not explicitly set on this session (the
                # default-bypassing two-arg get) — restored via unset.
                _PREV = spark.conf.get(_FLAG, None)
            except Exception:  # noqa: BLE001 — treat as unset
                _PREV = None
            spark.conf.set(_FLAG, "false")
        _DEPTH += 1
        try:
            yield
        finally:
            _DEPTH -= 1
            if _DEPTH == 0:
                prev, _PREV = _PREV, None
                if prev is None:
                    spark.conf.unset(_FLAG)
                else:
                    spark.conf.set(_FLAG, prev)
