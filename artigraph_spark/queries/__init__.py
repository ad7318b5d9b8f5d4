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
    # ROUND-14 ROTATION. Recorded-window census at round start:
    # {r7:2, r8:41*, r9:41, r10:49, r11:44, r12:44, r13:50} — the *
    # counts the r8 ghost `dp_noisy_counts_events` (renamed to
    # pseudo_dp_noisy_counts_events at r9; not a registry query, so it
    # rotates nowhere). No never-recorded queries. Window: 4 new +
    # 3 oracle-changed + the 2 r7-stale spillovers named by the r13
    # policy + all 40 registry r8-stale (alphabetical) + the first 1
    # r9-stale (alphabetical) = exactly 50. Expected census after the
    # driver records r14:
    # {r9:40, r10:49, r11:44, r12:42, r13:49, r14:50} (274 total).
    # New-query rationale (registry-growth policy: genuine family
    # gaps only): semdedup_against is the embedding-space member of
    # the INCREMENTAL dedup trio — exact digest (dedup_against) and
    # lexical (lsh_pairs_between) existed, semantic did not — per the
    # r13 verdict's own #4; duplicate_spans_docs is the
    # exact-substring SPAN member (Lee et al. 2022 suffix-array use
    # case) — no existing member localizes the duplicated region
    # INSIDE a document; remove_duplicate_spans_docs is its rewrite
    # consumer (the cdc_chunk_dedup consumer-loop precedent);
    # contaminated_spans_docs is the cross-corpus member (surgical
    # decontamination — decontaminate_corpus drops whole documents,
    # this cuts only the leaked span).
    # Oracle-changed detail: dedup_clusters, minhash_signatures,
    # minhash_lsh_pairs replay the id-derived fallback pmod-style
    # (((doc_id % m) + m) % m) instead of plain % — values unchanged
    # on the non-negative testdata ids, oracle TEXT changed, so each
    # earns a fresh row under the changed SQL (the r13 verdict's #6).
    # (1) new this round — first driver rows
    "semdedup_against", "duplicate_spans_docs", "remove_duplicate_spans_docs",
    "contaminated_spans_docs",
    # (2) oracle changed this round (pmod-style fallback replay)
    "dedup_clusters", "minhash_signatures", "minhash_lsh_pairs",
    # (3) the 2 r7-stale spillovers (the r13 policy's named set)
    "t_closeness_orders", "target_encode_orders",
    # (4) all 40 registry r8-stale re-greens (alphabetical)
    "array_ops", "association_rules_parts", "bigram_logprob_docs",
    "cdc_time_travel_orders", "containment_pairs_docs",
    "copurchase_support_pairs", "edit_distance_pairs",
    "embedding_mean_pool", "embedding_norms", "fellegi_sunter_docs",
    "filter_between_isin", "filter_null_tests", "hits_copurchase",
    "json_extract", "lang_predict", "map_ops",
    "markov_stationary_events", "mixed_language_docs",
    "multimodal_features", "ngram_jaccard_pairs",
    "pca_explained_embeddings", "pca_project_embeddings",
    "pca_top_component", "proj_select_rename", "readability_docs",
    "rrf_hybrid_topk", "sample_deterministic", "scalar_cast",
    "scalar_conditional", "scalar_datetime", "scalar_math",
    "scalar_string", "set_except", "set_intersect",
    "set_intersect_all", "set_similarity_users", "stl_outliers_daily",
    "theil_sen_daily", "welch_ttest_price", "zipf_slope_docs",
    # (5) the first 1 r9-stale (alphabetical) to fill 50
    "agg_argminmax",
)

# The queries whose implementation or oracle changed THIS round (the
# window-audit "fresh" set): they hold recent driver rows but earn new
# ones because the plan/values pipeline changed. Declared here so
# `tools/window_audit.py` is reproducible with no arguments.
# (Superseded rotations live in git history and in the committed
# CORRECTNESS_r* artifacts the audit recomputes from.)
ROUND_FRESH: tuple[str, ...] = (
    "dedup_clusters", "minhash_signatures", "minhash_lsh_pairs",
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
