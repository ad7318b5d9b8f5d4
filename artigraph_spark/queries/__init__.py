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
    # ROUND-12 ROTATION. Recorded-window history after r11 (CORRECTNESS
    # census at round start): {r5:2, r6:44, r7:36, r8:41, r9:42,
    # r10:49, r11:50}; 4 oracle-bearing queries never recorded — the
    # former rows-only twins, which gained FULL first-party oracles
    # this round (minhash_lsh_pairs on exact-integer shingled
    # signatures; dedup_clusters end-to-end incl. a RECURSIVE-CTE
    # components oracle; simhash_fingerprints on the poly62 flavor;
    # cosine_topk_lsh via embedded hyperplane literals + left-fold
    # dots) — plus ONE elective addition (cdc_chunks_docs:
    # content-defined chunking, the shift-robust member the
    # dedup/fingerprint family lacked; registry-growth policy allows
    # genuine family gaps). Window: 5 never + 7 impl/oracle-changed +
    # 2 r5-stale + 36 r6-stale = exactly 50; the last 7 alphabetical
    # r6 (window_rank_family, window_running_agg, window_session,
    # window_sliding, window_topk_per_group, window_tumbling,
    # zorder_cluster_keys) spill to r13's head. After the driver
    # records r12 the census should read {r6:7, r7:36, r8:41, r9:42,
    # r10:49, r11:39, r12:50}.
    # Impl-changed detail: survival_km_users + survival_km_by_first_event
    # (kaplan_meier's chained prefix passes fused onto one bucketing —
    # keep_bucket/bucket_col in bucketed_prefix_sums);
    # rmst_signup_by_cohort (integral-duration + negative-duration
    # guards, the r11 advice medium item); logrank_click_vs_rest
    # (risk-table lineage cut); quantile_normalize_quantity (range
    # probe moved to the distinct-pair level — the data-sized BNLJ is
    # gone); minhash_signatures (wasted data-sized distinct removed);
    # dedup_minhash_end2end (dedup_clusters' signature lineage cut —
    # values unchanged, plan changed).
    # (1) never recorded — first driver rows (new oracles + the round's
    #     one elective addition)
    "minhash_lsh_pairs", "dedup_clusters", "simhash_fingerprints",
    "cosine_topk_lsh", "cdc_chunks_docs",
    # (2) implementation/oracle changed this round
    "survival_km_users", "survival_km_by_first_event",
    "rmst_signup_by_cohort", "logrank_click_vs_rest",
    "quantile_normalize_quantity", "minhash_signatures",
    "dedup_minhash_end2end",
    # (3) the 2 remaining r5-stale re-greens
    "unigram_logprob", "union_by_name_missing",
    # (4) 36 of the 43 remaining r6-stale re-greens (alphabetical;
    #     minhash_signatures moved up to group 2)
    "agg_approx", "audience_overlap_click_purchase", "cms_decayed_topk",
    "cms_join_size", "constraint_report", "cosine_topk",
    "cosine_topk_ivf_checked", "cosine_topk_lsh_checked",
    "dedup_segments_corpus", "embedding_near_dup", "explode_tokens",
    "grouped_cms_contract", "hll_rollup_users", "in_subquery_sql",
    "interval_join_click_purchase", "join_asof", "lateral_topk_orders",
    "map_explode", "new_users_hourly", "profile_orders",
    "rollup_time_hierarchy", "skew_audit_lineitem_orderkey",
    "sliding_distinct_users", "sliding_quantiles_hourly",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q12_late_lines_by_status", "tpch_q18_large_volume_customers",
    "tpch_q3_shipping_priority", "tpch_q4_late_orders",
    "tpch_q9_nation_margin", "trend_slopes_hourly", "unpivot_stack",
    "window_gap_fill", "window_lag_lead", "window_range_frame",
)

# The queries whose implementation or oracle changed THIS round (the
# window-audit "fresh" set): they hold recent driver rows but earn new
# ones because the plan/values pipeline changed. Declared here so
# `tools/window_audit.py` is reproducible with no arguments.
# (Superseded rotations live in git history and in the committed
# CORRECTNESS_r* artifacts the audit recomputes from.)
ROUND_FRESH: tuple[str, ...] = (
    "survival_km_users", "survival_km_by_first_event",
    "rmst_signup_by_cohort", "logrank_click_vs_rest",
    "quantile_normalize_quantity", "minhash_signatures",
    "dedup_minhash_end2end",
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
