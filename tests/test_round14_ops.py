"""Round-14 operators + contracts: the semdedup quality-aware keeper,
sign-safe pmod oracle replay for id-derived MinHash fallbacks, and the
cross-snapshot semantic dedup member (`semdedup_against`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- semdedup keeper modes


def _collinear_df(spark):
    # One direction, three magnitudes: every pair has cosine exactly 1,
    # but distance to the k=1 centroid differs per point — the keeper
    # modes pick different survivors from the same near-dup set.
    rows = [(1, [1.0]), (2, [0.9]), (3, [0.5])]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_semdedup_default_keeper_is_min_id(spark):
    from artigraph_spark.operators.similarity import semdedup

    out = {r["vec_id"]: r["pruned"] for r in semdedup(
        _collinear_df(spark), k=1, iterations=1, qbits=8, threshold=(9, 10), dim=1
    ).collect()}
    assert out == {1: 0, 2: 1, 3: 1}


def test_semdedup_min_centroid_sim_keeps_farthest_from_centroid(spark):
    from artigraph_spark.operators.similarity import semdedup

    # k=1, iterations=1: centroid = integer mean of the shifted
    # quantized coords; id 3 ([0.5]) is farthest from it (largest
    # dist_q), so it survives and both nearer points are pruned.
    out = {r["vec_id"]: r["pruned"] for r in semdedup(
        _collinear_df(spark), k=1, iterations=1, qbits=8, threshold=(9, 10),
        dim=1, keeper="min_centroid_sim",
    ).collect()}
    assert out == {1: 1, 2: 1, 3: 0}


def test_semdedup_min_centroid_sim_tiebreak_is_min_id(spark):
    from artigraph_spark.operators.similarity import semdedup

    # Identical vectors → identical dist_q → the id tie-break decides:
    # smaller id survives, same as the default mode.
    rows = [(7, [1.0, 0.0]), (8, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {r["vec_id"]: r["pruned"] for r in semdedup(
        df, k=1, iterations=1, qbits=8, threshold=(9, 10), dim=2,
        keeper="min_centroid_sim",
    ).collect()}
    assert out == {7: 0, 8: 1}


def test_semdedup_keeper_modes_agree_on_prune_count(spark):
    # Different survivors, same near-dup structure: both modes prune
    # the same NUMBER of points from the collinear trio.
    from artigraph_spark.operators.similarity import semdedup

    df = _collinear_df(spark)
    kw = dict(k=1, iterations=1, qbits=8, threshold=(9, 10), dim=1)
    n_min_id = semdedup(df, **kw).agg(F.sum("pruned")).collect()[0][0]
    n_div = semdedup(df, keeper="min_centroid_sim", **kw).agg(
        F.sum("pruned")
    ).collect()[0][0]
    assert n_min_id == n_div == 2


def test_semdedup_invalid_keeper_raises(spark):
    from artigraph_spark.operators.similarity import semdedup

    df = _collinear_df(spark)
    with pytest.raises(ValueError, match="keeper"):
        semdedup(df, k=1, dim=1, keeper="max_id")


def test_semdedup_auto_passes_keeper_through(spark):
    from artigraph_spark.operators.similarity import semdedup_auto

    out = {r["vec_id"]: r["pruned"] for r in semdedup_auto(
        _collinear_df(spark), target_cluster_size=128, min_k=1,
        iterations=1, qbits=8, threshold=(9, 10), dim=1,
        keeper="min_centroid_sim",
    ).collect()}
    assert out == {1: 1, 2: 1, 3: 0}


# ------------------------------------- pmod fallback replay (sign-safe)


def test_minhash_fallback_oracle_matches_for_negative_ids(spark):
    """The r14 pmod-style oracle replay ((id % m) + m) % m must match the
    engine's pmod fallback for NEGATIVE numeric ids too — exactly the
    case the retired plain-% replay got wrong."""
    import duckdb

    from artigraph_spark.operators.dedup import minhash_signatures
    from artigraph_spark.queries.llm import _minhash_oracle

    rows = [(-5, ""), (-2147483650, None), (3, ""), (0, "")]
    sdf = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
        for r in minhash_signatures(sdf, "doc_id", "text", num_hashes=8).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        row[0]: tuple(row[1:]) for row in con.execute(_minhash_oracle(8)).fetchall()
    }
    assert got == want
