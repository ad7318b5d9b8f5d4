"""Sort / limit / set operations / deterministic sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from artigraph_spark.queries import query
from artigraph_spark.sources import load


@query(
    "sort_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit_topk(spark, sf_dir):
    """Global top-k: orderBy+limit plans as TakeOrderedAndProject — each task
    keeps k rows; no global sort materialization. Total order via tiebreaks."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber"))
        .limit(100)
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side, c_acctbal AS bal
    FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side, s_acctbal AS bal
    FROM supplier WHERE s_acctbal > 1000
    """,
)
def set_union_all(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    top_c = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side"), F.col("c_acctbal").alias("bal")
    )
    top_s = s.filter(F.col("s_acctbal") > 1000).select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side"), F.col("s_acctbal").alias("bal")
    )
    return top_c.unionByName(top_s)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT l_orderkey AS orderkey FROM lineitem WHERE l_orderkey % 7 < 4
    EXCEPT
    SELECT o_orderkey AS orderkey FROM orders WHERE o_orderkey % 7 < 2
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT over partially-overlapping key sets: keys with mod-7 residue in
    {2,3} survive, so the result is non-empty at every scale factor (an
    empty-vs-empty match would prove nothing about EXCEPT semantics)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 < 4).select(
        F.col("l_orderkey").alias("orderkey")
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 < 2).select(
        F.col("o_orderkey").alias("orderkey")
    )
    return li.subtract(o)


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_linenumber FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_linenumber FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_intersect_all(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_linenumber")
    r = li.filter(F.col("l_returnflag") == "R").select("l_linenumber")
    return a.intersectAll(r)


@query(
    "sample_deterministic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE (((l_orderkey % 1000000007) * 2654435761 + l_linenumber * 40503) % 1000000007) % 100 < 10
    """,
)
def sample_deterministic(spark, sf_dir):
    """~10% deterministic sample via integer multiplicative hashing — unlike
    df.sample(seed=..), identical on every engine and immune to partitioning
    (reproducible sampling is what a training pipeline actually needs)."""
    li = load(spark, sf_dir, "lineitem")
    # Reduce the key BEFORE the multiply: keeps the product < 2^62 at any
    # scale factor (raw keys overflow int64 past ~3.5e9 under ANSI mode).
    h = (
        (F.col("l_orderkey") % 1000000007) * 2654435761
        + F.col("l_linenumber") * 40503
    ) % 1000000007
    return li.filter((h % 100) < 10).select("l_orderkey", "l_linenumber", "l_quantity")
