"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (oracle-checkable); the
LSH-bucketed variant is the scale path: random-hyperplane sign buckets turn
the all-pairs cross join into an equi-join on bucket ids.

All dot products run JVM-side via ``F.zip_with`` + ``F.aggregate`` —
no Python in the row path. Reductions use fixed-point 2^30 scaling
(exact, associative integer sums → engine- and partitioning-independent
results; see artigraph_spark.functions).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from artigraph_spark.operators.windows import top_k_per_group

_SCALE = float(1 << 30)


def dot(a: Column, b: Column) -> Column:
    """Deterministic fixed-point dot product of two float arrays, as double."""
    prods = F.zip_with(
        a, b, lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(_SCALE)).cast("long")
    )
    return F.aggregate(
        prods,
        F.lit(0).cast("long"),
        lambda acc, p: acc + p,
        lambda acc: acc.cast("double") / F.lit(_SCALE),
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the queries, score every
    corpus vector, window-reduce to k.

    Scale: |queries| is broadcast-sized by assumption (ANN query batches);
    the corpus is scanned once with no shuffle until the final per-query
    top-k (WindowGroupLimit prunes to k per map task before the exchange).
    Excludes self-matches.
    """
    # Norms are per-vector, not per-pair: compute each side's norm ONCE
    # (10 queries × 50k corpus would otherwise redo both norms 500k times —
    # measured 3× array-reduction waste in the 10× scale probe).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec__"),
        norm(F.col(vec_col)).alias("__qnorm__"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec__"),
        norm(F.col(vec_col)).alias("__cnorm__"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("__qvec__"), F.col("__cvec__"))
                / (F.col("__qnorm__") * F.col("__cnorm__"))
            ).alias("cos_sim"),
        )
    )
    return top_k_per_group(
        scored,
        "query_id",
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane bucket id: one sign bit per plane, packed to a long."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        d = F.zip_with(vec, lit_plane, lambda x, y: x.cast("double") * y)
        s = F.aggregate(d, F.lit(0.0), lambda acc, p: acc + p)
        bucket = bucket + F.when(s >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH: L independent
    tables of n_planes sign-bits each; candidates = union over tables of
    same-bucket pairs, deduped before scoring. Recall ≈ 1−(1−p^k)^L where
    p = 1−θ/π — single-table LSH recalls poorly (measured 0.16 on the
    fixture); 8×4 recalls ≳0.9. The candidate join is an equi-join on
    (table, bucket) — shuffle-partitioned, no all-pairs. Not
    oracle-checkable (approximate); recall asserted vs brute force in tests.
    """
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]

    def bucketed(df: DataFrame, out_id: str, keep_vec: str, norm_col: str) -> DataFrame:
        buckets = F.array(
            *[lsh_bucket(F.col(vec_col), planes) for planes in tables]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(keep_vec),
            norm(F.col(vec_col)).alias(norm_col),  # once per vector, not per pair
            F.posexplode(buckets).alias("__table__", "__bucket__"),
        )

    q = bucketed(queries, "query_id", "__qvec__", "__qnorm__")
    c = bucketed(corpus, "neighbor_id", "__cvec__", "__cnorm__")
    candidates = (
        c.join(F.broadcast(q), ["__table__", "__bucket__"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__qvec__", "__cvec__", "__qnorm__", "__cnorm__")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("__qvec__"), F.col("__cvec__"))
            / (F.col("__qnorm__") * F.col("__cnorm__"))
        ).alias("cos_sim"),
    )
    return top_k_per_group(
        scored,
        "query_id",
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    )


def mean_pool(df: DataFrame, group_col: str, vec_col: str = "embedding") -> DataFrame:
    """Per-group mean vector, exploded representation (group, pos, mean_val).

    posexplode + groupBy(group, pos) keeps the reduction native and exact
    (decimal sums); re-collect with collect_list over a pos-ordered window if
    an array is needed downstream.
    """
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    scaled_sum = F.sum(
        F.floor(F.col("val").cast("double") * F.lit(_SCALE)).cast("long")
    ).cast("double") / F.lit(_SCALE)
    return exploded.groupBy(group_col, "pos").agg(
        (scaled_sum / F.count("val")).cast("double").alias("mean_val")
    )
