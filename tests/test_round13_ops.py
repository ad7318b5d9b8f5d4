"""Round-13 guards + operators: ADVICE-item API boundaries (keep_cols
collision, NULL external bucket ids, ts_col type checks) and the round's
new dedup-family members."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- guards


def test_minhash_fast_keep_cols_collision_raises(spark):
    from artigraph_spark.operators.dedup import minhash_signatures_fast

    df = spark.createDataFrame(
        [(1, "a b c", "x")], "doc_id long, text string, __toks string"
    )
    with pytest.raises(ValueError, match="keep_cols.*collide"):
        minhash_signatures_fast(df, "doc_id", "text", keep_cols=("__toks",))
    with pytest.raises(ValueError, match="collide"):
        minhash_signatures_fast(df, "doc_id", "text", num_hashes=4, keep_cols=("mh2",))
    with pytest.raises(ValueError, match="collide"):
        minhash_signatures_fast(df, "doc_id", "text", keep_cols=("doc_id",))


def test_minhash_fast_keep_cols_mh_outside_range_ok(spark):
    # mh4 is NOT an output of a num_hashes=4 run (outputs are mh0..mh3) —
    # a column by that name passes through untouched.
    from artigraph_spark.operators.dedup import minhash_signatures_fast

    df = spark.createDataFrame([(1, "a b c d", 7)], "doc_id long, text string, mh4 int")
    out = minhash_signatures_fast(df, "doc_id", "text", num_hashes=4, keep_cols=("mh4",))
    row = out.collect()[0]
    assert row["mh4"] == 7
    assert {f"mh{i}" for i in range(4)} <= set(out.columns)


def test_bucketed_prefix_sums_null_bucket_id_raises(spark):
    from artigraph_spark.operators._ranks import bucketed_prefix_sums

    hist = spark.createDataFrame(
        [("g", 1.0, 2, 1), ("g", 2.0, 3, None)],
        "grp string, v double, n long, bk int",
    )
    out = bucketed_prefix_sums(
        hist, ["grp"], "v", ["n"], buckets=4, bucket_col="bk"
    )
    with pytest.raises(Exception, match="NULL bucket id"):
        out.collect()


def test_bucketed_prefix_sums_external_bucket_non_null_ok(spark):
    from artigraph_spark.operators._ranks import bucketed_prefix_sums

    hist = spark.createDataFrame(
        [("g", 1.0, 2, 0), ("g", 2.0, 3, 1)],
        "grp string, v double, n long, bk int",
    )
    rows = (
        bucketed_prefix_sums(hist, ["grp"], "v", ["n"], buckets=4, bucket_col="bk")
        .orderBy("v")
        .collect()
    )
    assert [r["__pre_n"] for r in rows] == [0, 2]
    assert [r["__tot_n"] for r in rows] == [5, 5]


def test_stateful_dedup_ts_col_type_guard(spark):
    from artigraph_spark.streaming import stateful_exact_dedup, stateful_lsh_band_flags

    df = spark.createDataFrame(
        [(1, "h", "2024-01-01")], "doc_id long, h string, ts string"
    )
    with pytest.raises(TypeError, match="stateful_exact_dedup.*timestamp"):
        stateful_exact_dedup(df, "doc_id", "h", ts_col="ts", ttl_seconds=60)
    df2 = spark.createDataFrame(
        [(1, "some text", "2024-01-01")], "doc_id long, text string, ts string"
    )
    with pytest.raises(TypeError, match="stateful_lsh_band_flags.*timestamp"):
        stateful_lsh_band_flags(df2, "doc_id", "text", ts_col="ts", ttl_seconds=60)
