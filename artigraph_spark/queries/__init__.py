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
    # ROUND-11 ROTATION. Recorded-window history after r10 (computed
    # from CORRECTNESS_r0{1..9}.json + CORRECTNESS_r10.json at round
    # start): staleness census {r4:3, r5:43, r6:44, r7:36, r8:42,
    # r9:43, r10:50}; 3 oracle-bearing queries never recorded — the
    # round's elective additions per the registry-growth policy, the
    # complete survival trio unlocked by the kaplan_meier
    # de-colocation: survival_km_by_first_event (grouped KM cohort
    # curves), logrank_click_vs_rest (the Mantel–Cox two-sample
    # test) and rmst_signup_by_cohort (restricted mean survival time
    # — curve, significance, effect size); 2
    # implementations changed this round. The window drains the r4
    # backlog and all but two r5: 3 new + 3 impl-changed + 3 r4-stale
    # + 41 r5-stale = exactly 50 (unigram_logprob and
    # union_by_name_missing, the last two alphabetical r5, spill to
    # r12's head with the 44 r6-stale). After the driver records r11,
    # the census should read {r5:2, r6:44, r7:36, r8:42, r9:43,
    # r10:47, r11:50}.
    # Impl-changed detail: survival_km_users (kaplan_meier risk-table
    # walk moved onto bucketed_prefix_sums — granularity-safe, with the
    # term sum on the DECIMAL(38,9) grid in BOTH engines; the r10
    # verdict watch item) and quantile_normalize_quantity (execution-
    # time max_distinct_values guard on the broadcast rank->value map +
    # quantize_bits escape; plan gains the guard column); late in the
    # round mad_outliers_orders joined (robust_outliers' chained
    # median->deviation passes now lineage-cut their two groups-sized
    # statistic frames — the kaplan_meier lesson applied, measured 2x).
    # NOT impl-changed: the _ranks type-preservation fix keeps the
    # identical long-cast plan for every existing integral-count
    # caller; bucketed_row_numbers' count_col is a pure addition
    # (default None = identical plan); curriculum_stages' global-path
    # fix does not touch curriculum_stages_docs (stratified path).
    # (1) never recorded — first driver rows
    "survival_km_by_first_event", "logrank_click_vs_rest",
    "rmst_signup_by_cohort",
    # (2) implementation/oracle changed this round
    "survival_km_users", "quantile_normalize_quantity",
    "mad_outliers_orders",
    # (3) the 3 remaining r4-stale re-greens
    "text_quality_filter", "text_stats", "weighted_sample_topk",
    # (4) all 43 r5-stale re-greens (alphabetical)
    "anomaly_zscore_hours", "bloom_prefilter_contract",
    "calendar_functions", "chunk_documents", "clustering_coefficient",
    "cohort_retention", "collocation_pmi", "count_min_contract",
    "decontaminate_corpus", "dedup_minhash_end2end", "describe_summary",
    "event_funnel", "grouped_quantiles_events", "hll_by_group",
    "hll_contract", "incremental_dedup", "incremental_dedup_checked",
    "literal_inline_table", "media_decode_mp4",
    "quantile_sketch_contract", "quantize_embeddings", "range_source",
    "redact_pii", "repetition_scores", "select_token_budget",
    "split_corpus", "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue", "tpch_q15_top_supplier",
    "tpch_q16_supplier_relationships", "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue", "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_orders", "tpch_q22_sales_opportunity",
    "tpch_q2_min_cost_supplier", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "triangle_counts_copurchase",
)

# The queries whose implementation or oracle changed THIS round (the
# window-audit "fresh" set): they hold recent driver rows but earn new
# ones because the plan/values pipeline changed. Declared here so
# `tools/window_audit.py` is reproducible with no arguments.
# (Superseded rotations _PRIORITY_R{7,8,9} were deleted in r11 — dead
# data; the history lives in git and in the committed CORRECTNESS_r*
# artifacts the audit recomputes from.)
ROUND_FRESH: tuple[str, ...] = (
    "survival_km_users", "quantile_normalize_quantity",
    "mad_outliers_orders",
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
