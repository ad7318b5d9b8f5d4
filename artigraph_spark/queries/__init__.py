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
    # ROUND-10 ROTATION. Recorded-window history after r9 (computed from
    # CORRECTNESS_r0{1..9}.json at round start): staleness census
    # {r4:31, r5:43, r6:45, r7:46, r8:44, r9:50}; 1 oracle-bearing query
    # never recorded (spearman_price_quantity_quantized, new this round);
    # 21 implementations/oracles changed this round.
    # Impl-changed detail: spearman_price_quantity (joint-histogram
    # rewrite — one scan, frequency-weighted rank maps),
    # tukey_outliers_quantity (+ exact_quantiles_quantity via the shared
    # _quantiles_from_ranks refactor), twap_user_value (zero-span NULL
    # guard, both engines), cuped_user_value (pmod-safe oracle hash),
    # calibration_price_returns (oracle NULL-label filter),
    # kcore_copurchase (peel-loop restructure for until_convergence);
    # then the bucketed_prefix_sums sweep — every distinct-value
    # histogram walk moved off single-partition windows onto the
    # range-bucketed two-phase prefix: auc_status_by_priority,
    # mann_whitney_quantity, ks_price_drift, psi_price_drift, and the
    # _cumulative_hist consumers mad_outliers_orders,
    # feature_bins_lineitem, winsorize_quantity; plus
    # adamic_adar_copurchase (global top-k row_number window →
    # TakeOrderedAndProject + ≤k-row rank window); plus the per-group
    # raw-row sort removals gini_spend_by_nation (Σi·x collapsed onto
    # the rank histogram) and lorenz_spend_by_nation (rank-run × decile
    # interval overlap — both previously serialized a nation's whole
    # unit list onto one core); plus the stratum-colocation removals
    # stratified_split_exact / curriculum_stages_docs /
    # kfold_assign_docs / epoch_shuffle_shards (grouped bucketed
    # row_number — parallelism strata×buckets instead of one partition
    # per stratum/shard; n_shards is now an output-layout choice, not a
    # memory constraint).
    # NOT impl-changed: the _ranks freq_col parameter is a pure addition
    # (default path builds the identical plan), so its other consumers
    # (rank/quantile_normalize, rfm, ppl_decile, length_band, trimmed
    # mean) keep their fresh r9 rows.
    # Window = 1 new + 21 impl-changed + 28 oldest r4-stale = exactly
    # 50. Only ONE entry is a brand-new query; every other slot
    # re-greens an existing one (the ≥60% policy reads on new-query
    # displacement). The 3 r4-stale that spill (text_quality_filter,
    # text_stats, weighted_sample_topk) plus the 43 r5-stale lead the
    # r11 backlog.
    # (1) never recorded — first driver row
    "spearman_price_quantity_quantized",
    # (2) implementation/oracle changed this round
    "spearman_price_quantity", "tukey_outliers_quantity",
    "exact_quantiles_quantity", "twap_user_value", "cuped_user_value",
    "calibration_price_returns", "kcore_copurchase",
    "auc_status_by_priority", "mann_whitney_quantity", "ks_price_drift",
    "psi_price_drift", "mad_outliers_orders", "feature_bins_lineitem",
    "winsorize_quantity", "adamic_adar_copurchase",
    "gini_spend_by_nation", "lorenz_spend_by_nation",
    "stratified_split_exact", "curriculum_stages_docs",
    "kfold_assign_docs", "epoch_shuffle_shards",
    # (3) the 28 oldest r4-stale re-greens (alphabetical)
    "correlated_group_filter", "dedup_exact", "dedup_fingerprint",
    "dedup_lines_in_doc", "doc_rolling_hash", "domain_cap",
    "grouped_map_pandas", "join_cross", "join_full_outer", "join_inner",
    "join_left_anti", "join_left_outer", "join_left_semi", "join_range",
    "join_right_outer", "join_self", "join_star_broadcast",
    "lang_distribution", "media_decode_headers",
    "minhash_lsh_pairs_checked", "nested_struct_access", "pack_sequences",
    "pack_sequences_by_lang", "percent_of_total", "scalar_subquery_filter",
    "stratified_sample_mix", "string_agg", "text_normalize",
)

# The queries whose implementation or oracle changed THIS round (the
# window-audit "fresh" set): they hold recent driver rows but earn new
# ones because the plan/values pipeline changed. Declared here so
# `tools/window_audit.py` is reproducible with no arguments — the
# previous convention (pass --fresh on the command line) made the bare
# run fail for anyone who didn't know the list.
ROUND_FRESH: tuple[str, ...] = (
    "spearman_price_quantity", "tukey_outliers_quantity",
    "exact_quantiles_quantity", "twap_user_value", "cuped_user_value",
    "calibration_price_returns", "kcore_copurchase",
    "auc_status_by_priority", "mann_whitney_quantity", "ks_price_drift",
    "psi_price_drift", "mad_outliers_orders", "feature_bins_lineitem",
    "winsorize_quantity", "adamic_adar_copurchase",
    "gini_spend_by_nation", "lorenz_spend_by_nation",
    "stratified_split_exact", "curriculum_stages_docs",
    "kfold_assign_docs", "epoch_shuffle_shards",
)


_PRIORITY_R9: tuple[str, ...] = (
    # ROUND-9 ROTATION (superseded — kept for the window-audit history).
    # Recorded-window history after r8 (computed from
    # CORRECTNESS_r0{1..8}.json at round start): 10 oracle-bearing
    # queries have never been recorded (the 9 new r9 exact-stats/audit
    # queries + hourly_conversion_bh + pseudo_dp_noisy_counts_events,
    # renamed this round from dp_noisy_counts_events per the r8 advice —
    # the old name's r8 row does not carry over), 9 implementations
    # changed this round, 7 queries are r3-stale and 49 r4-stale.
    # Window = 16 never-recorded + 9 impl-changed + 7 r3-stale + 18
    # oldest r4-stale (alphabetical) = exactly 50; the remaining 31
    # r4-stale (correlated_group_filter, dedup_exact, dedup_fingerprint,
    # dedup_lines_in_doc, doc_rolling_hash, domain_cap, onward) lead the
    # r10 backlog.
    # Impl-changed detail: kcore (non-convergence raise),
    # shortest_paths (weight validation branches), bootstrap_ci (pmod
    # hashing + oracle), bloom_incremental_dedup (unstamped-fallback
    # build path), rank_normalize / quantile_normalize / rfm_segments
    # (bucketed prefix-sum rank rewrite), upsample_domains (DataFrame
    # factors path in the shared entry point), pagerank (unconditional
    # every-4-rounds lineage cut) — all value-identical on the fixtures
    # per this round's oracle runs, but the plans/impls changed, so
    # they earn fresh rows (the r8 convention).
    # (1) never recorded — first driver rows
    "exact_quantiles_quantity", "trimmed_mean_price",
    "tukey_outliers_quantity", "spearman_price_quantity",
    "ccf_click_purchase", "twap_user_value", "fk_orphans_audit",
    "calibration_price_returns", "dup_rate_by_source",
    "hourly_conversion_bh", "length_band_filter_docs",
    "ppl_decile_report", "effect_size_price", "cuped_user_value",
    "mann_kendall_hourly", "pseudo_dp_noisy_counts_events",
    # (2) implementation changed this round
    "kcore_copurchase", "shortest_paths_copurchase",
    "bootstrap_ci_quantity", "bloom_incremental_dedup",
    "rank_normalize_lineitem", "quantile_normalize_quantity",
    "rfm_segments_users", "upsample_domains", "pagerank_copurchase",
    # (3) the 7 remaining r3-stale re-greens (oldest tier, alphabetical)
    "set_union_all", "set_union_distinct", "simhash_checked",
    "sort_limit_topk", "text_quality_score", "tfidf_terms",
    "token_bpe_counts",
    # (4) the 18 oldest r4-stale re-greens (alphabetical; the other 31
    # r4-stale queries lead r10)
    "agg_argminmax", "agg_collect", "agg_count_distinct", "agg_cube",
    "agg_dedup_pick_first", "agg_distinct_rows", "agg_filtered",
    "agg_global_summary", "agg_grouping_sets", "agg_histogram",
    "agg_minmax_stats", "agg_percentiles", "agg_pivot",
    "agg_pricing_summary", "agg_rollup", "benchmark_contamination",
    "bm25_ranking", "conditional_distinct",
)


_PRIORITY_R8: tuple[str, ...] = (
    # ROUND-8 ROTATION (superseded — kept for the window-audit history).
    # Recorded-window history after r7 (computed from
    # CORRECTNESS_r0{1..7}.json at round start): 50 queries hold an r7
    # row, 47 an r6 row, 44 an r5 row, 49 an r4 row, and 28
    # oracle-bearing queries are r3-stale. This round registered 26 new
    # oracle-bearing queries and changed 3 implementations via the
    # round-7 advice fixes (copurchase_support_pairs: DECIMAL(38,0) lift
    # widening; psi_price_drift: _clean routing; bloom_incremental_dedup:
    # stamped bits state — all value-identical on the fixtures per the
    # full oracle re-run, but the impls changed so they earn fresh rows).
    # Window = 26 new + 3 impl-changed + 21 r3-stale (alphabetical;
    # set_union_all, set_union_distinct, simhash_checked,
    # sort_limit_topk, text_quality_score, tfidf_terms, and
    # token_bpe_counts spill to r9 with the 49 r4-stale) = exactly 50.
    # The monotone-staleness rule holds: the window's oldest tier (r3)
    # equals the oldest tier outside it.
    # (1) new this round — first driver rows
    "survival_km_users", "theil_sen_daily", "stl_outliers_daily",
    "mann_whitney_quantity", "welch_ttest_price", "bootstrap_ci_quantity",
    "cdc_time_travel_orders", "dp_noisy_counts_events",
    "containment_pairs_docs", "readability_docs", "fellegi_sunter_docs",
    "set_similarity_users", "hits_copurchase", "pca_top_component",
    "kcore_copurchase", "bigram_logprob_docs", "association_rules_parts",
    "markov_stationary_events", "zipf_slope_docs",
    "quantile_normalize_quantity", "pca_project_embeddings",
    "shortest_paths_copurchase", "rrf_hybrid_topk",
    "lorenz_spend_by_nation", "mixed_language_docs",
    "pca_explained_embeddings",
    # (2) implementation changed this round (r7-advice fixes)
    "copurchase_support_pairs", "psi_price_drift", "bloom_incremental_dedup",
    # (3) the 28 r3-stale oracle-bearing queries, alphabetical (all share
    # the same r3 age; a stable deterministic order beats a judgement call)
    "array_ops", "edit_distance_pairs", "embedding_mean_pool",
    "embedding_norms", "filter_between_isin", "filter_null_tests",
    "json_extract", "lang_predict", "map_ops", "multimodal_features",
    "ngram_jaccard_pairs", "proj_select_rename", "sample_deterministic",
    "scalar_cast", "scalar_conditional", "scalar_datetime", "scalar_math",
    "scalar_string", "set_except", "set_intersect", "set_intersect_all",
)


_PRIORITY_R7: tuple[str, ...] = (
    # ROUND-7 ROTATION (superseded — kept for the window-audit history).
    # Recorded-window history after r6 (computed from
    # CORRECTNESS_r0{1..6}.json at round start): 50 queries have an r6
    # row, 44 an r5 row, 49 an r4 row, 28 are r3-stale, and 2
    # oracle-bearing queries (sliding_cms_top_users, ngram_novelty_docs)
    # have NEVER had a driver row (registered r6 past the window — the
    # r6 verdict's top item). This round registered 16 new oracle-bearing
    # queries and changed 4 implementations (sliding_cms_topk candidate
    # prune; heavy hitters' arrow-local pass 1; stratified split's exact
    # integer division). Order: (1) the 2 never-recorded, (2) the 16 new,
    # (3) the 3 other impl-changed, (4) all 28 r3-stale oldest-first —
    # then (5) late-r7 review fixes changed domain_cap /
    # weighted_sample_topk / describe_summary / agg_global_summary (and
    # join_range, already in the r3 block) — they join the impl-changed
    # block, displacing the last four r3-stale (set_intersect,
    # set_except, set_intersect_all, sample_deterministic) and the
    # single r4-stale slot (agg_pricing_summary) to r8's rotation.
    # window_session joins too (microsecond gap arithmetic — boundary
    # sessions could shift on future fixtures); the other
    # operator-review fixes (join_asof null guard, salted_join salt
    # expr, media box walker) were value-identical under the full
    # oracle re-run. The 10 late-r7 registrations (2b) then displaced
    # ten more r3-stale to r8, and the 3 model-evaluation additions
    # (2c: AUC / PSI drift / categorical entropy) displaced three more
    # (filter_between_isin, filter_null_tests, scalar_math), and the 7
    # statistical-audit additions (2d) displaced seven more (lang_predict
    # through proj_select_rename).
    # The privacy-audit pair (2e: k-anonymity / l-diversity) then
    # displaced tfidf_terms and edit_distance_pairs to r8, and the
    # CDC-apply + seasonal-decomposition pair (2f) displaced the last
    # two r3-stale (ngram_jaccard_pairs, simhash_checked) — all four
    # r3 re-greens now lead r8's backlog. attribution_linear (2f) then
    # displaced window_session from the impl-changed block: its r7
    # change was value-identical on the fixtures (full oracle re-run),
    # so its r6 row stays valid while a never-recorded query gains its
    # first hard signal. knn_label_accuracy, ab_test_purchase,
    # t_closeness_orders, and rank_normalize_lineitem (2f) likewise
    # displaced agg_global_summary, describe_summary,
    # weighted_sample_topk, and domain_cap (value-identical late-r7
    # review fixes; the full oracle archive docs/ORACLE_r07.txt carries
    # their evidence).
    # Window = 2 + 16 + 10 + 3 + 7 + 2 + 7 + 3 = exactly 50.
    # (1) never recorded — the only oracle-bearing queries with no hard
    # signal ever (sliding_cms_top_users also changed impl this round)
    "sliding_cms_top_users", "ngram_novelty_docs",
    # (2) new this round — first driver rows
    "salted_join_revenue", "ewma_hourly", "inter_event_gaps_users",
    "scd2_intervals_orders", "conversion_latency", "agg_moments_quantity",
    "copurchase_support_pairs", "snapshot_diff_orders",
    "impute_value_group_mean", "winsorize_quantity",
    "curriculum_stages_docs",
    "event_transitions", "mad_outliers_orders", "feature_bins_lineitem",
    "negative_samples_orders", "kfold_assign_docs",
    # (2b) new in the late-r7 session — first driver rows (10 queries:
    # changepoint/ACF/attribution/path/RFM event analytics, sorted-
    # neighborhood blocking, BFS hops, exact k-means, LOO target
    # encoding, per-group Gini)
    "acf_hourly", "cusum_changepoints", "attribution_last_touch",
    "sorted_neighborhood_docs", "bfs_hops_copurchase",
    "kmeans_embeddings", "event_paths_top", "rfm_segments_users",
    "target_encode_orders", "gini_spend_by_nation",
    # (2c) model-evaluation trio added at round tail — first driver rows
    "auc_status_by_priority", "psi_price_drift", "entropy_event_types",
    # (2d) statistical-audit wave (chi2/MI/KS/Benford), G2 keywords,
    # Adamic-Adar link prediction, seasonal-naive backtest — first rows
    "chi2_priority_status", "mi_event_type_hour", "ks_price_drift",
    "benford_price_digits", "g2_keywords_source", "adamic_adar_copurchase",
    "seasonal_naive_mape_daily",
    # (2e) privacy-audit pair — first driver rows
    "k_anonymity_orders", "l_diversity_events",
    # (2f) CDC merge-apply + classical seasonal decomposition + linear
    # multi-touch attribution + k-NN label accuracy — first rows
    "cdc_apply_orders", "seasonal_decompose_daily", "attribution_linear",
    "knn_label_accuracy", "ab_test_purchase", "t_closeness_orders",
    "rank_normalize_lineitem",
    # (3) implementation changed this round — need fresh rows
    "heavy_hitter_users", "grouped_heavy_hitters_events",
    "stratified_split_exact",
    # (4) r3-stale block: fully displaced to r8 by the 2e/2f additions
    # (ngram_jaccard_pairs, simhash_checked, tfidf_terms,
    # edit_distance_pairs lead r8's backlog; simhash_checked also
    # re-greens the late-r7 simhash change — value-identical on the
    # fixtures, re-verified through the full oracle run).
    # Not listed: lang_predict/text_quality_score/token_bpe_counts/
    # multimodal_features/embedding_norms/embedding_mean_pool/
    # proj_select_rename/filter_between_isin/filter_null_tests/scalar_math/
    # scalar_string/scalar_datetime/scalar_conditional/
    # scalar_cast/array_ops/map_ops/json_extract/sort_limit_topk/
    # set_union_all/set_union_distinct — displaced from the r3-stale
    # block to r8 by the 10 late-r7 registrations and the (2c) trio
    # (they join r8's stale-first rotation ahead of the r4-stale run),
    # plus the
    # remaining r4/r5/r6-green queries (registration order, past the
    # window) and the 4 rows-only queries (minhash_lsh_pairs,
    # dedup_clusters, simhash_fingerprints, cosine_topk_lsh) whose
    # oracle-checked `*_checked` contract twins carry the hard signal.
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
