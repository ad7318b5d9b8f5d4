"""ANSI-mode edge cases found by review: empty/whitespace documents,
single-row groups, large keys, name collisions — each previously a crash or
silent wrong answer under Spark 4's ANSI default."""

import pytest
from pyspark.sql import functions as F

from artigraph_spark.functions import dvar_samp
from artigraph_spark.operators.dedup import (
    dedup_clusters,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_signatures_fast,
    ngram_jaccard_pairs,
)
from artigraph_spark.operators.joins import asof_join
from artigraph_spark.operators.text import avg_token_length, punct_ratio, quality_score


@pytest.mark.slow
def test_dedup_clusters_with_empty_docs(spark):
    """Whitespace-only duplicates are the most common near-dups in real
    corpora — must cluster, not crash with DIVIDE_BY_ZERO."""
    d = spark.createDataFrame(
        [(1, " "), (2, " "), (3, "hello world foo bar baz")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(d, "doc_id", "text").collect()}
    assert len(rows) == 3
    assert rows[2]["cluster_id"] == 1  # the two empty docs cluster together
    assert rows[1]["is_keeper"] and not rows[2]["is_keeper"]


def test_ngram_jaccard_empty_pair(spark):
    d = spark.createDataFrame([(1, " "), (2, "  ")], "doc_id long, text string")
    out = ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=0.5, allow_quadratic=True
    ).collect()
    assert [(r["a"], r["b"], r["jaccard"]) for r in out] == [(1, 2, 1.0)]


def test_text_ratios_on_empty_text(spark):
    d = spark.createDataFrame([("",), (" ",), ("real text here",)], "text string")
    rows = d.select(
        punct_ratio(F.col("text")).alias("p"),
        avg_token_length(F.col("text")).alias("a"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    assert rows[0]["p"] == 0.0 and rows[0]["a"] is None
    assert rows[2]["a"] is not None and rows[2]["q"] > 0


def test_dvar_samp_single_row_group(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 1.0), (2, 3.0)], "g int, x double")
    rows = {r["g"]: r["v"] for r in df.groupBy("g").agg(dvar_samp("x").alias("v")).collect()}
    assert rows[1] is None  # matches F.var_samp semantics
    assert rows[2] == pytest.approx(2.0)


def test_minhash_signatures_total_over_empty_docs(spark):
    d = spark.createDataFrame([(1, "a b c"), (2, "")], "doc_id long, text string")
    slow = minhash_signatures(d, "doc_id", "text", num_hashes=4)
    fast = minhash_signatures_fast(d, "doc_id", "text", num_hashes=4)
    assert slow.count() == 2 and fast.count() == 2  # nobody dropped


def test_lsh_band_validation(spark):
    d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    sigs = minhash_signatures_fast(d, "doc_id", "text", num_hashes=16)
    with pytest.raises(ValueError, match="divide num_hashes"):
        lsh_candidate_pairs(sigs, "doc_id", num_hashes=16, bands=5)
    with pytest.raises(ValueError, match="divide num_hashes"):
        lsh_candidate_pairs(sigs, "doc_id", num_hashes=16, bands=32)


def test_asof_rejects_name_collision(spark):
    left = spark.createDataFrame([(1, 10, 1.0)], "k int, t int, price double")
    right = spark.createDataFrame([(1, 5, 2.0)], "k int, t2 int, price double")
    with pytest.raises(ValueError, match="rename one side"):
        asof_join(left, right, on="k", left_time="t", right_time="t2")


def test_asof_widens_date_to_timestamp(spark):
    """A DATE right side must not truncate timestamp left times to midnight."""
    left = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00")], "k int, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-05", "same-day"), (1, "2024-01-04", "prev-day")],
        "k int, d string, v string",
    ).select("k", F.col("d").cast("date").alias("d"), "v")
    strict = asof_join(left, right, on="k", left_time="ts", right_time="d", strict=True)
    # event at 10:00 is strictly AFTER the same-day midnight order -> matches it
    assert strict.collect()[0]["v"] == "same-day"


def test_sample_hash_no_overflow_on_large_keys(spark):
    df = spark.createDataFrame([(4_000_000_000, 1, 1.0)], "l_orderkey long, l_linenumber int, l_quantity double")
    h = (
        (F.col("l_orderkey") % 1000000007) * 2654435761
        + F.col("l_linenumber") * 40503
    ) % 1000000007
    assert df.select((h % 100).alias("b")).collect()[0]["b"] is not None

def test_lsh_null_signature_columns_do_not_collide(spark):
    """concat_ws drops NULL columns, so without a NULL sentinel the
    signatures (7, NULL) and (NULL, 7) would build the same '7' key and be
    treated as exact duplicates. They must NOT pair (no shared band)."""
    sigs = spark.createDataFrame(
        [(1, 7, None), (2, None, 7)], "doc_id long, mh0 long, mh1 long"
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id", num_hashes=2, bands=2).collect()
    assert pairs == []
    # Whereas genuinely NULL-identical signatures still group as duplicates.
    sigs2 = spark.createDataFrame(
        [(1, None, 7), (2, None, 7)], "doc_id long, mh0 long, mh1 long"
    )
    pairs2 = [(r["a"], r["b"]) for r in
              lsh_candidate_pairs(sigs2, "doc_id", num_hashes=2, bands=2).collect()]
    assert pairs2 == [(1, 2)]


def test_cms_null_keys_do_not_crash_or_pollute(spark):
    """NULL keys hash to NULL cells; builds must not crash and the NULL
    bucket must not leak into real keys' estimates."""
    from artigraph_spark.operators.sketches import cms_estimate, count_min_sketch

    df = spark.createDataFrame([(1,), (1,), (None,), (None,)], "k long")
    sketch = count_min_sketch(df, "k", width=64, depth=3)
    est = {
        r["k"]: r["estimate"]
        for r in cms_estimate(
            sketch, df.filter(F.col("k").isNotNull()).distinct(), "k", width=64, depth=3
        ).collect()
    }
    assert est[1] == 2


def test_bloom_negative_keys_fold_safely(spark):
    """Negative int64 keys must fold below 2^31 (pmod, not %) — no negative
    bit positions, members still guaranteed to pass."""
    from artigraph_spark.operators.sketches import bloom_build, bloom_prefilter

    members = spark.createDataFrame([(-5,), (-9_223_372_036_854_775_000,)], "k long")
    bits = bloom_build(members, "k", num_bits=256, num_hashes=3)
    # exactly ONE negative row: the (num_bits, num_hashes, seed) stamp
    # sentinel (r8) — every actual bit position must be non-negative
    rows = [r["bit"] for r in bits.collect()]
    assert sum(1 for b in rows if b < 0) == 1
    assert all(b >= 0 for b in rows if b != min(rows))
    kept = {
        r["k"]
        for r in bloom_prefilter(members, "k", bits, num_bits=256, num_hashes=3).collect()
    }
    assert kept == {-5, -9_223_372_036_854_775_000}


def test_hll_negative_and_extreme_keys(spark):
    """Extreme int64 keys run through fold + mixer without ANSI overflow."""
    from artigraph_spark.operators.sketches import hll_estimate, hll_sketch

    df = spark.createDataFrame(
        [(-(1 << 62),), ((1 << 62),), (0,), (-1,)], "k long"
    )
    est = hll_estimate(hll_sketch(df, "k", m=64), m=64).collect()[0]["estimate"]
    assert est is not None and est > 0


def test_pagerank_self_loop_and_isolated_edge(spark):
    """Self-loops are legal edges (node feeds itself); ranks stay positive
    and bounded."""
    from artigraph_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "a"), ("a", "b"), ("b", "a")], ["s", "d"])
    r = {row["node"]: row["rank_fx"] for row in pagerank(edges, "s", "d", iterations=4).collect()}
    assert set(r) == {"a", "b"} and all(v > 0 for v in r.values())
    assert sum(r.values()) <= (1 << 30)


def test_time_rollup_all_null_hour(spark):
    """An hour whose values are all NULL/NaN vanishes (no rows survive the
    guard) rather than reporting n>0 with a NULL total."""
    import datetime

    from artigraph_spark.operators.timeseries import time_rollup

    df = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 1, 0), None),
            (datetime.datetime(2024, 1, 1, 1, 30), float("nan")),
            (datetime.datetime(2024, 1, 1, 2, 0), 1.5),
        ],
        "ts timestamp, value double",
    )
    rows = time_rollup(df).filter(F.col("level") == "hour").collect()
    assert len(rows) == 1 and rows[0]["n"] == 1 and rows[0]["total_value"] is not None


def test_collocation_pmi_degenerate_docs(spark):
    """Whitespace-only docs contribute nothing; a single repeated token
    forms the self-bigram with both marginals the same count — finite PMI,
    no DIVIDE_BY_ZERO under ANSI."""
    import math

    from artigraph_spark.operators.text import collocation_pmi

    d = spark.createDataFrame(
        [(1, "  "), (2, ""), (3, "a a a a a")], "doc_id long, text string"
    )
    rows = collocation_pmi(d, "text", min_count=2, top_k=5).collect()
    assert [(r["w1"], r["w2"], r["pair_count"]) for r in rows] == [("a", "a", 4)]
    # N1=5 (a x5), N2=4 (all "a a"): pmi = ln((4/4)/((5/5)*(5/5))) = 0
    assert rows[0]["pmi_r"] == round(math.log(1.0), 6) == 0.0


def test_triangle_counts_string_node_ids(spark):
    """least/greatest, the (degree, id) tie-break, and the ord-struct
    comparison must all work on string ids, not just integers."""
    from artigraph_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x"), ("z", "w")], "s string, d string"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df, "s", "d").collect()}
    assert got == {"x": 1, "y": 1, "z": 1}


def test_grouped_hll_negative_keys_and_null_groups(spark):
    """Negative keys fold below 2^31 without overflow; null groups and null
    keys are excluded rather than forming a phantom group."""
    from artigraph_spark.operators.sketches import (
        grouped_hll_estimate,
        grouped_hll_sketch,
    )

    rows = [("g1", -(1 << 62)), ("g1", -7), ("g1", 7), (None, 1), ("g2", None)]
    df = spark.createDataFrame(rows, "g string, k long")
    sk = grouped_hll_sketch(df, "g", "k", m=64)
    est = grouped_hll_estimate(sk, "g", m=64).collect()
    assert {r["g"] for r in est} == {"g1"}  # g2 had only a null key
    assert est[0]["estimate"] > 0


def test_interval_join_null_times_batch(spark):
    """Null timestamps can't satisfy the range condition: inner drops them,
    leftOuter keeps the left row with null right side."""
    from pyspark.sql import functions as F

    from artigraph_spark.streaming import interval_join

    l = spark.createDataFrame([(1, 100), (1, None)], "k long, t long").select(
        "k", F.timestamp_seconds("t").alias("lts")
    )
    r = spark.createDataFrame([(1, 130)], "k long, t long").select(
        "k", F.timestamp_seconds("t").alias("rts")
    )
    inner = interval_join(l, r, key="k", left_time="lts", right_time="rts", upper="1 minute")
    assert inner.count() == 1
    outer = interval_join(
        l, r, key="k", left_time="lts", right_time="rts", upper="1 minute",
        join_type="leftOuter",
    ).collect()
    assert len(outer) == 2
    assert sum(1 for row in outer if row["rts"] is None) == 1
