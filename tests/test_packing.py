"""Sequence packing / contamination / stratified sampling operators."""

import pytest
from pyspark.sql import functions as F

from artigraph_spark.operators.packing import (
    benchmark_contamination,
    ngrams,
    pack_sequences,
    stratified_sample,
    token_count,
)


def test_pack_sequences_exact_layout(spark):
    # Token stream: 5 + 3 + 6 + 2 = 16 tokens, capacity 8 →
    # bins: doc1[0,5) doc2[5,8) all bin0; doc3[8,14) bin1; doc4[14,16) bin1.
    d = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 6), (4, 2)], "doc_id long, n long"
    )
    rows = sorted(
        (r["doc_id"], r["bin_id"], r["tokens_in_bin"])
        for r in pack_sequences(d, "doc_id", "n", capacity=8).collect()
    )
    assert rows == [(1, 0, 5), (2, 0, 3), (3, 1, 6), (4, 1, 2)]


def test_pack_sequences_straddle_and_empty(spark):
    # 6 + 0 + 5: doc2 (zero tokens) occupies nothing; doc3 straddles the
    # capacity-8 boundary: [6,11) → 2 tokens in bin0, 3 in bin1.
    d = spark.createDataFrame([(1, 6), (2, 0), (3, 5)], "doc_id long, n long")
    rows = sorted(
        (r["doc_id"], r["bin_id"], r["tokens_in_bin"])
        for r in pack_sequences(d, "doc_id", "n", capacity=8).collect()
    )
    assert rows == [(1, 0, 6), (3, 0, 2), (3, 1, 3)]
    # Conservation: every token lands in exactly one bin.
    assert sum(t for _, _, t in rows) == 11


def test_pack_sequences_partitioning_independent(spark):
    d = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n")
    )
    a = pack_sequences(d, "doc_id", "n", capacity=64, num_buckets=4).collect()
    b = pack_sequences(d.repartition(13), "doc_id", "n", capacity=64, num_buckets=32).collect()
    key = lambda rows: sorted((r["doc_id"], r["bin_id"], r["tokens_in_bin"]) for r in rows)
    assert key(a) == key(b)


def test_pack_sequences_validation_and_empty_input(spark):
    d = spark.createDataFrame([], "doc_id long, n long")
    assert pack_sequences(d, "doc_id", "n", capacity=8).count() == 0
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(d, "doc_id", "n", capacity=0)


def test_ngrams_and_token_count(spark):
    d = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "text string")
    out = d.select(
        token_count(F.col("text")).alias("n"), ngrams(F.col("text"), 3).alias("g")
    ).collect()
    assert out[0]["n"] == 4 and out[0]["g"] == ["a b c", "b c d"]
    assert out[1]["g"] == []  # shorter than n → no grams, not null
    assert out[2]["n"] == 0 and out[2]["g"] == []


def test_benchmark_contamination_counts(spark):
    bench = spark.createDataFrame([(0, "the quick brown fox jumps")], "doc_id long, text string")
    train = spark.createDataFrame(
        [
            (10, "the quick brown fox runs"),  # shares 2 of 3 trigrams
            (11, "totally novel text here now"),  # clean
            (12, "a b"),  # too short — not assessable, absent from output
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            benchmark_contamination(train, bench, "doc_id", "text", n=3).collect()}
    assert set(rows) == {10, 11}
    assert rows[10]["total_ngrams"] == 3 and rows[10]["overlap_ngrams"] == 2
    assert rows[10]["contamination"] == pytest.approx(2 / 3)
    assert rows[11]["overlap_ngrams"] == 0 and rows[11]["contamination"] == 0.0


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b")
        .otherwise("c").alias("s"),
    )
    out = stratified_sample(df, "s", {"a": 0.5, "b": 0.05}, F.col("k"))
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert "c" not in counts  # unlisted stratum dropped
    assert counts["a"] == pytest.approx(20000 / 3 * 0.5, rel=0.1)
    assert counts["b"] == pytest.approx(20000 / 3 * 0.05, rel=0.3)
    # Partitioning-independent membership.
    a = sorted(r["k"] for r in out.collect())
    b = sorted(
        r["k"]
        for r in stratified_sample(
            df.repartition(17), "s", {"a": 0.5, "b": 0.05}, F.col("k")
        ).collect()
    )
    assert a == b


def test_cap_per_group(spark):
    from artigraph_spark.operators.packing import cap_per_group

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("src")
    )
    out = cap_per_group(df, "src", 10, order_key=F.col("doc_id"))
    counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 10, "1": 10, "2": 10}
    # Deterministic: lowest ids kept under id ordering.
    kept0 = sorted(r["doc_id"] for r in out.filter(F.col("src") == "0").collect())
    assert kept0 == [0, 3, 6, 9, 12, 15, 18, 21, 24, 27]
    with pytest.raises(ValueError, match="k must be positive"):
        cap_per_group(df, "src", 0, order_key=F.col("doc_id"))


def test_pack_sequences_duplicate_ids_conserve_tokens(spark):
    # Duplicate ids tie in the ORDER BY; the ROWS frame still gives each row
    # its own cumulative slot (RANGE would merge tie peers and overlap bins).
    d = spark.createDataFrame([(1, 5), (1, 5), (2, 2)], "doc_id long, n long")
    rows = pack_sequences(d, "doc_id", "n", capacity=8).collect()
    per_bin = {}
    for r in rows:
        per_bin[r["bin_id"]] = per_bin.get(r["bin_id"], 0) + r["tokens_in_bin"]
    assert per_bin == {0: 8, 1: 4}  # 12 tokens → full bin 0, 4 in bin 1
    assert sum(r["tokens_in_bin"] for r in rows) == 12


def test_pack_sequences_drops_null_rows(spark):
    d = spark.createDataFrame(
        [(1, 4), (None, 9), (3, None), (4, 4)], "doc_id long, n long"
    )
    rows = sorted(
        (r["doc_id"], r["bin_id"], r["tokens_in_bin"])
        for r in pack_sequences(d, "doc_id", "n", capacity=8).collect()
    )
    assert rows == [(1, 0, 4), (4, 0, 4)]


def test_stratified_sample_negative_keys(spark):
    # Signed keys must hash into [0, denominator), not below every threshold.
    df = spark.range(0, 1000).select(
        (F.col("id") - 500).alias("k"), F.lit("a").alias("s")
    )
    out = stratified_sample(df, "s", {"a": 0.05}, F.col("k"))
    n = out.count()
    assert 10 <= n <= 120  # ~5%, NOT all 1000
    neg = out.filter(F.col("k") < 0).count()
    assert neg < 120  # negative keys are sampled at the same rate, not 100%


def test_normalize_text(spark):
    from artigraph_spark.operators.text import normalize_text

    d = spark.createDataFrame(
        [("“Hello” — It’s   \tFINE\x07",), ("  already clean  ",)],
        "text string",
    )
    out = [r["t"] for r in d.select(normalize_text(F.col("text")).alias("t")).collect()]
    assert out[0] == '"hello" - it\'s fine'
    assert out[1] == "already clean"


def test_weighted_sample_topk(spark):
    from artigraph_spark.operators.packing import weighted_sample_topk

    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        # two weight classes: 100x heavier rows (ids divisible by 10)
        F.when(F.col("id") % 10 == 0, 1000).otherwise(10).alias("w"),
    )
    out = weighted_sample_topk(df, "doc_id", "w", k=200).collect()
    assert len(out) == 200
    heavy = sum(1 for r in out if r["w"] == 1000)
    # Heavy rows are 10% of the pool but 100x the weight — they must
    # dominate the sample (statistically near-certain, deterministic here).
    assert heavy > 120
    # Partitioning-independent selection.
    out2 = weighted_sample_topk(df.repartition(17), "doc_id", "w", k=200).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)
    # NULL / non-positive weights excluded, k validated.
    df2 = spark.createDataFrame([(1, None), (2, 0), (3, 5)], "doc_id long, w long")
    assert [r["doc_id"] for r in weighted_sample_topk(df2, "doc_id", "w", 10).collect()] == [3]
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_topk(df2, "doc_id", "w", 0)


def test_dedup_lines_and_repetition_ratio(spark):
    from artigraph_spark.operators.text import dedup_lines, line_repetition_ratio

    d = spark.createDataFrame(
        [("nav\nbody text\nnav\nfooter\nnav",), ("all\nunique\nlines",)],
        "text string",
    )
    rows = d.select(
        dedup_lines(F.col("text")).alias("t"),
        line_repetition_ratio(F.col("text")).alias("r"),
    ).collect()
    assert rows[0]["t"] == "nav\nbody text\nfooter"  # first occurrences, in order
    assert rows[0]["r"] == pytest.approx(2 / 5)
    assert rows[1]["t"] == "all\nunique\nlines" and rows[1]["r"] == 0.0


def test_pack_sequences_by_group(spark):
    from artigraph_spark.operators.packing import pack_sequences_by_group

    d = spark.createDataFrame(
        [("en", 1, 5), ("en", 2, 5), ("de", 3, 7), ("de", 4, 3), ("xx", 5, 0), (None, 6, 4)],
        "lang string, doc_id long, n long",
    )
    rows = sorted(
        (r["lang"], r["doc_id"], r["bin_id"], r["tokens_in_bin"])
        for r in pack_sequences_by_group(d, "lang", "doc_id", "n", capacity=8).collect()
    )
    # en: 5+5=10 tokens → bin0 full (5+3), bin1 gets 2; de: 7+3 → bin0 full, bin1 gets 2.
    assert rows == [
        ("de", 3, 0, 7), ("de", 4, 0, 1), ("de", 4, 1, 2),
        ("en", 1, 0, 5), ("en", 2, 0, 3), ("en", 2, 1, 2),
    ]
    # zero-token and NULL-group rows dropped; bin spaces are per group.
    langs = {r[0] for r in rows}
    assert langs == {"en", "de"}


def test_pack_sequences_by_group_partitioning_independent(spark):
    from artigraph_spark.operators.packing import pack_sequences_by_group

    d = spark.range(0, 400).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 9 + 1).alias("n"),
    )
    key = lambda rows: sorted(
        (r["g"], r["doc_id"], r["bin_id"], r["tokens_in_bin"]) for r in rows
    )
    a = pack_sequences_by_group(d, "g", "doc_id", "n", 64, num_buckets=3).collect()
    b = pack_sequences_by_group(d.repartition(11), "g", "doc_id", "n", 64, num_buckets=16).collect()
    assert key(a) == key(b)


def test_weighted_sample_no_collapse_at_extreme_weights(spark):
    """The rank key must stay weight-sensitive for billion-scale weights:
    ranking on u^(1/w) directly rounds to 1.0 for large w and silently
    degrades into id-order. With the log-domain key, a 1000x heavier
    minority must still dominate the sample at w ~ 1e9."""
    from artigraph_spark.operators.packing import weighted_sample_topk

    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, F.lit(1_000_000_000_000))
        .otherwise(F.lit(1_000_000_000))
        .alias("w"),
    )
    out = weighted_sample_topk(df, "doc_id", "w", k=200).collect()
    heavy = sum(1 for r in out if r["w"] == 1_000_000_000_000)
    assert heavy > 120  # weight still governs selection, not id order
    # And the selection is NOT simply the smallest ids (the collapse symptom).
    ids = sorted(r["doc_id"] for r in out)
    assert ids != list(range(200))


def test_pack_rejects_non_integral_id(spark):
    """The range-bucketing core needs an integral id; a string id must fail
    up front with the requirement spelled out, not deep in the plan."""
    import pytest
    from pyspark.sql import functions as F

    from artigraph_spark.operators.packing import pack_sequences, pack_sequences_by_group

    df = spark.createDataFrame(
        [("a", "en", 5), ("b", "en", 7)], "doc string, lang string, n long"
    )
    with pytest.raises(ValueError, match="integral id"):
        pack_sequences(df, "doc", "n", 10)
    with pytest.raises(ValueError, match="integral id"):
        pack_sequences_by_group(df, "lang", "doc", "n", 10)
    # A double id is equally out: int() truncation of the bounds silently
    # misbuckets — refuse it too.
    with pytest.raises(ValueError, match="integral id"):
        pack_sequences(df.select(F.lit(1.5).alias("doc"), "n"), "doc", "n", 10)


def test_pack_persist_not_checkpoint_lineage_intact(spark):
    """The metadata passes use persist(MEMORY_AND_DISK) + explicit
    unpersist, NOT localCheckpoint: the returned plan must trace back to
    the real source (no ExistingRDD lineage break — executor loss means
    recompute, not job failure) and no cached blocks may stay pinned."""
    from pyspark.sql import functions as F

    from artigraph_spark.operators.packing import pack_sequences

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("n")
    )
    # Scope the pinned-block assertion to THIS call: other operators (e.g.
    # connected_components' final localCheckpoint) legitimately hold blocks
    # for the lifetime of their result DataFrame.
    jsc = spark.sparkContext._jsc.sc()
    pinned_before = jsc.getPersistentRDDs().size()
    out = pack_sequences(df, "id", "n", 64)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" not in plan  # lineage reaches the source, unbroken
    assert out.count() > 0
    # Explicit unpersist ran: nothing from the pack call is still pinned.
    assert jsc.getPersistentRDDs().size() == pinned_before


def test_decontaminate_corpus_removes_flagged_keeps_short(spark):
    """decontaminate_corpus drops training docs at/over the contamination
    threshold, keeps clean docs, and keeps docs too short to assess (no
    n-gram can leak in under n tokens); the audit table stays complete."""
    from artigraph_spark.operators.packing import decontaminate_corpus

    bench = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog indeed"),  # ~copy
            (2, "completely unrelated prose about spark partitions"),
            (3, "hi there"),  # < 3 tokens: unassessable, kept
        ],
        "doc_id long, text string",
    )
    clean, audit = decontaminate_corpus(train, bench, "doc_id", "text", threshold=0.5)
    kept = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert kept == [2, 3]
    a = {r["doc_id"]: r["contamination"] for r in audit.collect()}
    assert set(a) == {1, 2}  # short doc has no audit row (no n-grams)
    assert a[1] >= 0.5 and a[2] == 0.0
    # the clean frame keeps every input column
    assert clean.columns == train.columns

    import pytest as _pytest

    with _pytest.raises(ValueError, match="threshold"):
        decontaminate_corpus(train, bench, "doc_id", "text", threshold=0.0)


def test_select_token_budget_exact_prefix(spark):
    """Selection = the exact greedy prefix by (score desc, id asc) whose
    running token total fits the budget; running totals are exact."""
    from pyspark.sql import functions as F

    from artigraph_spark.operators.packing import select_token_budget

    rows = [(i, float((i * 37) % 100), (i % 5) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n long")
    budget = 120
    got = {
        r["doc_id"]: r["running_total"]
        for r in select_token_budget(df, "doc_id", "score", "n", budget).collect()
    }
    # oracle: greedy prefix in python
    run, want = 0, {}
    for i, s, n in sorted(rows, key=lambda t: (-t[1], t[0])):
        if run + n > budget:
            break
        run += n
        want[i] = run
    assert got == want


def test_select_token_budget_edges(spark):
    """Empty input, zero budget, all-equal scores (bucket width 0), and
    NULL/non-positive counts."""
    from artigraph_spark.operators.packing import select_token_budget

    df = spark.createDataFrame(
        [(1, 5.0, 3), (2, 5.0, None), (3, 5.0, 0), (4, 5.0, 2)],
        "doc_id long, score double, n long",
    )
    out = select_token_budget(df, "doc_id", "score", "n", 5).collect()
    # equal scores -> id order: doc 1 (3), doc 4 (2); NULL/0 counts dropped
    assert {(r["doc_id"], r["running_total"]) for r in out} == {(1, 3), (4, 5)}
    assert select_token_budget(df, "doc_id", "score", "n", 0).count() == 0
    empty = df.filter("doc_id < 0")
    assert select_token_budget(empty, "doc_id", "score", "n", 10).count() == 0


def test_select_token_budget_prunes_over_budget_buckets(spark):
    """Buckets whose driver-side offset already exceeds the budget never
    reach the exchange: with a tiny budget the kept-bucket broadcast frame
    is a single bucket."""
    from pyspark.sql import functions as F

    from artigraph_spark.operators.packing import select_token_budget

    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("double").alias("score"),
        F.lit(10).alias("n"),
    )
    out = select_token_budget(df, "doc_id", "score", "n", 50)
    rows = out.collect()
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["running_total"])] == [
        9999, 9998, 9997, 9996, 9995
    ]
    # the pruned offsets frame feeds the plan as a tiny ExistingRDD;
    # correctness of the prune is visible in the rows, the plan lock in
    # test_plans asserts no global sort.


def test_upsample_domains_counts_and_determinism(spark):
    """floor(r) copies always, +1 decided by the row hash; repeat runs and
    repartitioned inputs give byte-identical output; unknown domains drop."""
    from pyspark.sql import functions as F

    from artigraph_spark.operators.packing import upsample_domains

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else ("b" if i % 3 == 0 else "c")) for i in range(300)],
        "doc_id long, src string",
    )
    factors = {"a": 2.5, "b": 0.25}
    out = upsample_domains(df, "src", factors, F.col("doc_id"))
    rows = sorted((r["doc_id"], r["copy_idx"]) for r in out.collect())
    again = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in upsample_domains(df.repartition(7), "src", factors, F.col("doc_id")).collect()
    )
    assert rows == again
    by_doc = {}
    for d, c in rows:
        by_doc[d] = max(by_doc.get(d, 0), c)
    # every 'a' doc appears 2 or 3 times; 'b' docs 0 or 1; 'c' never
    for d, copies in by_doc.items():
        if d % 2 == 0:
            assert copies in (2, 3)
        else:
            assert d % 3 == 0 and copies == 1
    assert all(d % 2 == 0 or d % 3 == 0 for d, _ in rows)
    # copy_idx is dense 1..k per doc
    from collections import Counter

    per = Counter(d for d, _ in rows)
    for d, k in per.items():
        assert {c for dd, c in rows if dd == d} == set(range(1, k + 1))


def test_temperature_factors_flatten(spark):
    """alpha<1 lifts rare domains relative to common ones while preserving
    the target row total in expectation; alpha=1 is identity."""
    from artigraph_spark.operators.packing import temperature_factors

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, src string",
    )
    f1 = temperature_factors(df, "src", alpha=1.0)
    assert abs(f1["big"] - 1.0) < 1e-9 and abs(f1["small"] - 1.0) < 1e-9
    f5 = temperature_factors(df, "src", alpha=0.5)
    assert f5["small"] > 1.0 > f5["big"]
    total = 900 * f5["big"] + 100 * f5["small"]
    assert abs(total - 1000) < 1e-6


def test_select_token_budget_negative_counts_cannot_deflate_totals(spark):
    """A negative count (upstream tokenizer bug) must not flow into bucket
    totals or the running-total window: it would deflate running_total and
    over-admit past the budget. Non-positive counts are dropped entirely."""
    from artigraph_spark.operators.packing import select_token_budget

    df = spark.createDataFrame(
        [(1, 100.0, -1000), (2, 90.0, 4), (3, 80.0, 4), (4, 70.0, 4)],
        "doc_id long, score double, n long",
    )
    out = sorted(
        (r["doc_id"], r["running_total"])
        for r in select_token_budget(df, "doc_id", "score", "n", 8).collect()
    )
    # Without the guard, doc1's -1000 would admit everything.
    assert out == [(2, 4), (3, 8)]


def test_decontaminate_corpus_precomputed_audit(spark):
    """A materialized audit table short-circuits the contamination join:
    same clean output, and bench may be omitted."""
    from artigraph_spark.operators.packing import decontaminate_corpus

    bench = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog indeed"),
            (2, "completely unrelated prose about spark partitions"),
        ],
        "doc_id long, text string",
    )
    _, audit = decontaminate_corpus(train, bench, "doc_id", "text", threshold=0.5)
    stored = spark.createDataFrame(audit.collect(), audit.schema)  # "materialized"
    clean2, audit2 = decontaminate_corpus(
        train, None, "doc_id", "text", threshold=0.5, audit=stored
    )
    assert sorted(r["doc_id"] for r in clean2.collect()) == [2]
    assert audit2 is stored
    import pytest

    with pytest.raises(ValueError, match="bench is required"):
        decontaminate_corpus(train, None, "doc_id", "text")


def test_split_corpus_validation_and_rates(spark):
    from pyspark.sql import functions as F

    from artigraph_spark.operators.packing import split_corpus

    df = spark.range(0, 20000).select(F.col("id").alias("k"))
    counts = {
        r["split"]: r["n"]
        for r in split_corpus(df, F.col("k"))
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(counts.values()) == 20000  # exhaustive
    assert counts["train"] == pytest.approx(19600, rel=0.02)
    assert counts["valid"] == pytest.approx(200, rel=0.4)
    assert counts["test"] == pytest.approx(200, rel=0.4)
    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(df, F.col("k"), {"train": 0.5, "test": 0.1})
    with pytest.raises(ValueError, match="non-empty"):
        split_corpus(df, F.col("k"), {})


def test_stratified_split_exact_counts_and_determinism(spark):
    import math

    from artigraph_spark.operators.packing import stratified_split_exact

    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(121)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_split_exact(df, "lang", F.col("doc_id"))
    got = [(r["doc_id"], r["lang"], r["split"]) for r in out.collect()]
    # disjoint + exhaustive: every input row labeled exactly once
    assert sorted((d, l) for d, l, _ in got) == sorted((d, l) for d, l in rows)
    # exact per-stratum counts: ceil(.8n) train, ceil(.9n)-ceil(.8n) valid
    from collections import Counter

    per = Counter((l, s) for _, l, s in got)
    for lang in ("en", "fr", "de"):
        n = sum(1 for _, l in rows if l == lang)
        t, v = math.ceil(0.8 * n), math.ceil(0.9 * n)
        assert per[(lang, "train")] == t
        assert per[(lang, "valid")] == v - t
        assert per[(lang, "test")] == n - v
    # partitioning-independent membership
    out2 = stratified_split_exact(df.repartition(7), "lang", F.col("doc_id"))
    assert sorted(map(tuple, out2.collect())) == sorted(got)
    # tiny stratum still gets eval rows (the motivating case): n=10 →
    # exactly 8/1/1 where a 98/1/1 hash split would usually give 10/0/0
    tiny = spark.createDataFrame([(i, "yo") for i in range(10)], ["doc_id", "lang"])
    tc = Counter(
        r["split"]
        for r in stratified_split_exact(tiny, "lang", F.col("doc_id")).collect()
    )
    assert tc == {"train": 8, "valid": 1, "test": 1}
    # boundary semantics: the LAST label absorbs the remainder and may be
    # empty when ceil(cum·n) already covers n (n=5: ceil(4.5)=5 → test 0)
    five = spark.createDataFrame([(i, "yo") for i in range(5)], ["doc_id", "lang"])
    fc = Counter(
        r["split"]
        for r in stratified_split_exact(five, "lang", F.col("doc_id")).collect()
    )
    assert fc == {"train": 4, "valid": 1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        stratified_split_exact(df, "lang", F.col("doc_id"), {"a": 0.5, "b": 0.4})


def test_stratified_split_float_accumulation_fractions(spark):
    """Regression (r6 code review): cumulative float fractions like
    0.1+0.2 = 0.30000000000000004 must not shift the ceil boundary —
    counts follow the exact rationals."""
    import math
    from collections import Counter

    from artigraph_spark.operators.packing import stratified_split_exact

    df = spark.createDataFrame([(i, "s") for i in range(10)], ["doc_id", "stratum"])
    out = stratified_split_exact(
        df, "stratum", F.col("doc_id"), {"a": 0.1, "b": 0.2, "c": 0.7}
    )
    per = Counter(r["split"] for r in out.collect())
    # exact boundaries: ceil(0.1*10)=1, ceil(0.3*10)=3 → a=1, b=2, c=7
    assert per == {"a": 1, "b": 2, "c": 7}
