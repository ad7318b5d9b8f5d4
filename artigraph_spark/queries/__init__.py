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
    # ROUND-15 ROTATION. Recorded-window census at round start:
    # {r9:40, r10:49, r11:44, r12:42, r13:49, r14:50} (274 total, no
    # never-recorded queries) — exactly the census the r14 rotation
    # predicted. No new queries this round (optimization round; the
    # registry-growth policy adds none). Window: 4 impl-changed
    # re-greens + ALL 40 r9-stale (alphabetical) + the first 6
    # r10-stale (alphabetical) = exactly 50, draining the oldest
    # stratum completely. Expected census after the driver records
    # r15: {r10:43, r11:44, r12:42, r13:48, r14:47, r15:50}.
    # Impl-changed rationale (values identical, plan pipeline changed
    # — each earns a fresh hash row): winsorize_quantity (both
    # rank-quantile thresholds fused into one conditional aggregation),
    # stl_outliers_daily (single seasonal_decompose derivation via
    # reuse_output), markov_stationary_events (broadcast-total path
    # above the reuse threshold), seasonal_decompose_daily (operator
    # internals now route through reuse_frame_cut/cut_frame).
    # (1) impl changed this round — first driver rows
    "winsorize_quantity", "stl_outliers_daily",
    "markov_stationary_events", "seasonal_decompose_daily",
    # (2) all 40 r9-stale re-greens (alphabetical)
    "agg_collect", "agg_count_distinct", "agg_cube",
    "agg_dedup_pick_first", "agg_distinct_rows", "agg_filtered",
    "agg_global_summary", "agg_grouping_sets", "agg_histogram",
    "agg_minmax_stats", "agg_percentiles", "agg_pivot",
    "agg_pricing_summary", "agg_rollup", "benchmark_contamination",
    "bloom_incremental_dedup", "bm25_ranking", "bootstrap_ci_quantity",
    "ccf_click_purchase", "conditional_distinct", "dup_rate_by_source",
    "effect_size_price", "fk_orphans_audit", "hourly_conversion_bh",
    "length_band_filter_docs", "mann_kendall_hourly",
    "ppl_decile_report", "pseudo_dp_noisy_counts_events",
    "rank_normalize_lineitem", "rfm_segments_users", "set_union_all",
    "set_union_distinct", "shortest_paths_copurchase",
    "simhash_checked", "sort_limit_topk", "text_quality_score",
    "tfidf_terms", "token_bpe_counts", "trimmed_mean_price",
    "upsample_domains",
    # (3) the first 6 r10-stale (alphabetical) to fill 50
    "adamic_adar_copurchase", "auc_status_by_priority",
    "calibration_price_returns", "correlated_group_filter",
    "cuped_user_value", "curriculum_stages_docs",
)

# The queries whose implementation or oracle changed THIS round (the
# window-audit "fresh" set): they hold recent driver rows but earn new
# ones because the plan/values pipeline changed. Declared here so
# `tools/window_audit.py` is reproducible with no arguments.
# (Superseded rotations live in git history and in the committed
# CORRECTNESS_r* artifacts the audit recomputes from.)
ROUND_FRESH: tuple[str, ...] = (
    "winsorize_quantity", "stl_outliers_daily",
    "markov_stationary_events", "seasonal_decompose_daily",
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
