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
shape, not data volume), so at cluster scale the same barriers cost
scheduler round-trips while the benefit side is still zero for these
shapes; the default therefore scopes AQE off for them at every scale.
Set ``SPARK_GRAFT_LOOP_AQE=1`` to keep AQE on inside these operators
(e.g. a cluster where runtime skew splitting of a pathological graph
matters more than the barrier cost and salting is not an option).

Thread-safety: Spark session conf is session-global, so the scope is
serialized under a module lock; a *different* thread planning an
unrelated query concurrently on the same session could still observe AQE
off (the same session-conf caveat as ``sources.load``'s nanosAsLong
scope). The threaded executor runs producers, not declared queries, so
this does not arise in the build/bench paths.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

_LOCK = threading.Lock()

_FLAG = "spark.sql.adaptive.enabled"


@contextmanager
def pinned_parallelism(spark):
    """Scope AQE off around an operator-managed eager materialization.

    No-op when ``SPARK_GRAFT_LOOP_AQE=1`` (cluster operators who want
    runtime skew handling inside iterative loops opt back in globally).
    """
    if os.environ.get("SPARK_GRAFT_LOOP_AQE", "0") == "1":
        yield
        return
    with _LOCK:
        try:
            prev = spark.conf.get(_FLAG)
        except Exception:  # noqa: BLE001 — unset: Spark default is on
            prev = "true"
        spark.conf.set(_FLAG, "false")
        try:
            yield
        finally:
            spark.conf.set(_FLAG, prev)
