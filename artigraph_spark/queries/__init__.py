"""Declared query surface: every operator from SURVEY.md §2 Part B.

Each query is registered with a Spark callable ``(spark, sf_dir) -> DataFrame``
and (when SQL-expressible) a DuckDB oracle SQL string producing identical
columns/values. The driver hash-compares them at sf0.01.

Determinism contract (see FIXTURES.md):
  - aggregate doubles through DECIMAL(38,9) (order-independent) — helpers in
    :mod:`artigraph_spark.functions`;
  - totally order any LIMIT/top-k input;
  - no raw arrays/maps/timestamps in output — strings/scalars only;
  - column names aliased identically on both sides.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclasses.dataclass(frozen=True)
class QueryDef:
    name: str
    fn: SparkQuery
    oracle: str | None  # None → driver runs rows-only check
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None, bench: bool = False) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


# The driver's correctness gate records a fixed-size PREFIX of queries() (50
# entries in round 1). Names listed here are emitted first, in this order, so
# the queries that most need a hard-signal row this round — previously
# unsampled families, queries whose implementation changed, and new queries —
# land inside the recorded window. Everything else follows in registration
# order; total registration is unchanged.
#
# REGISTRY-GROWTH POLICY (r10): SURVEY §2 is 100% covered, so new operators
# are now ELECTIVE. At 264 queries against a 50-row window, each new query
# adds ~5 rounds of staleness debt to the rotation; from r10 on, windows are
# ≥60% re-greens (stale-first) and new queries are added only when they cover
# a genuine user-facing gap (a missing operator family member, a scale-path
# variant of a weak plan) — not for count. The rotation drains oldest-first:
# r10 clears the 28 oldest r4-stale; r11 should clear the 3 remaining
# r4-stale plus the 43 r5-stale and start on r6.
_PRIORITY: tuple[str, ...] = (
    # ROUND-13 ROTATION. Recorded-window census at round start:
    # {r6:7, r7:36, r8:40, r9:42, r10:49, r11:44, r12:50}; no
    # never-recorded queries. Window: 2 new + 7 impl-changed
    # (pagerank_copurchase joined late) + the 7 r6-stale spillovers
    # named by the r12 policy + 34 of the 36 r7-stale (alphabetical;
    # t_closeness_orders and target_encode_orders spill to r14's
    # head) = exactly 50. Expected
    # census after the driver records r13:
    # {r7:2, r8:40, r9:42, r10:49, r11:44, r12:43, r13:50}.
    # New-query rationale (registry-growth policy: genuine family
    # gaps only): semdedup_clusters is the embedding-space dedup
    # member (existing members are all lexical) per the r12 verdict's
    # own #4; cdc_chunk_dedup closes the corpus-consumer loop on r12's
    # content_defined_chunks per verdict #5.
    # Impl-changed detail: dedup_clusters + dedup_minhash_end2end
    # (connected_components' convergence probe became a monotone
    # decimal-sum scan — the per-round node-keyed join+count is gone;
    # values unchanged, plan changed); survival_km_users,
    # survival_km_by_first_event, rmst_signup_by_cohort,
    # logrank_click_vs_rest (bucketed_prefix_sums' external-bucket
    # branch gained the NULL-id raise guard — kaplan_meier's pass 2
    # rides bucket_col, so the plan expression changed; values
    # unchanged). kmeans_embeddings ALSO changed plan late in the round
    # (kmeans_exact gained the ragged/NULL-coordinate guard expression;
    # values unchanged, matmul/unroll equality pinned by
    # test_round13_ops) — it already sits in group 4 below as r7-stale,
    # so it earns its fresh row either way.
    # (1) new this round — first driver rows
    "semdedup_clusters", "cdc_chunk_dedup",
    # (2) implementation changed this round (pagerank_copurchase: the
    #     mid-loop lineage cuts went lazy in local-blocks mode late in
    #     the round — values unchanged, job structure changed)
    "pagerank_copurchase", "dedup_clusters", "dedup_minhash_end2end",
    "survival_km_users", "survival_km_by_first_event",
    "rmst_signup_by_cohort", "logrank_click_vs_rest",
    # (3) the 7 r6-stale spillovers (the r12 policy's named set)
    "window_rank_family", "window_running_agg", "window_session",
    "window_sliding", "window_topk_per_group", "window_tumbling",
    "zorder_cluster_keys",
    # (4) 34 of the 36 r7-stale re-greens (alphabetical;
    #     t_closeness_orders + target_encode_orders spill to r14)
    "ab_test_purchase", "acf_hourly", "agg_moments_quantity",
    "attribution_last_touch", "attribution_linear",
    "benford_price_digits", "bfs_hops_copurchase", "cdc_apply_orders",
    "chi2_priority_status", "conversion_latency", "cusum_changepoints",
    "entropy_event_types", "event_paths_top", "event_transitions",
    "ewma_hourly", "g2_keywords_source", "grouped_heavy_hitters_events",
    "heavy_hitter_users", "impute_value_group_mean",
    "inter_event_gaps_users", "k_anonymity_orders", "kmeans_embeddings",
    "knn_label_accuracy", "l_diversity_events", "mi_event_type_hour",
    "negative_samples_orders", "ngram_novelty_docs", "salted_join_revenue",
    "scd2_intervals_orders", "seasonal_decompose_daily",
    "seasonal_naive_mape_daily", "sliding_cms_top_users",
    "snapshot_diff_orders", "sorted_neighborhood_docs",
)

# The queries whose implementation or oracle changed THIS round (the
# window-audit "fresh" set): they hold recent driver rows but earn new
# ones because the plan/values pipeline changed. Declared here so
# `tools/window_audit.py` is reproducible with no arguments.
# (Superseded rotations live in git history and in the committed
# CORRECTNESS_r* artifacts the audit recomputes from.)
ROUND_FRESH: tuple[str, ...] = (
    "pagerank_copurchase", "dedup_clusters", "dedup_minhash_end2end",
    "survival_km_users", "survival_km_by_first_event",
    "rmst_signup_by_cohort", "logrank_click_vs_rest",
)


def _ordered() -> dict[str, QueryDef]:
    _load_modules()
    out: dict[str, QueryDef] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            out[name] = REGISTRY[name]
    for name, qd in REGISTRY.items():
        if name not in out:
            out[name] = qd
    return out


def queries() -> dict[str, SparkQuery]:
    return {name: qd.fn for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}


def bench_queries() -> dict[str, SparkQuery]:
    _load_modules()
    return {name: qd.fn for name, qd in REGISTRY.items() if qd.bench}


_LOADED = False


def _load_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side effects.
    from artigraph_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        exactstats,
        extras,
        joins,
        llm,
        pipeline,
        relational,
        setops,
        timeseries,
        windows,
    )

    _LOADED = True
