"""Join query surface: equi/outer/semi/anti/cross/range/as-of/self/broadcast.

Plans verified with .explain: dimension joins go broadcast (region/nation/
supplier are broadcast-sized at every SF); fact-fact joins shuffle on the
join key with AQE handling skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from artigraph_spark.functions import dsum, oracle_dsum
from artigraph_spark.operators.joins import asof_join, range_join
from artigraph_spark.queries import query
from artigraph_spark.sources import load


@query(
    "join_inner",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_totalprice, l.l_quantity
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def join_inner(spark, sf_dir):
    li, o = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice", "l_quantity")
    )


@query(
    "join_left_outer",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderstatus,
           COALESCE(b.big_qty, -1.0) AS big_qty
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey, {oracle_dsum('l_quantity')} AS big_qty
        FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey
    ) b ON o.o_orderkey = b.l_orderkey
    """,
)
def join_left_outer(spark, sf_dir):
    """Left join against a pre-aggregated subquery; unmatched rows take -1."""
    li, o = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    big = (
        li.filter(F.col("l_quantity") > 45)
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("big_qty"))
    )
    return o.join(big, o.o_orderkey == big.l_orderkey, "left").select(
        "o_orderkey", "o_orderstatus", F.coalesce("big_qty", F.lit(-1.0)).alias("big_qty")
    )


@query(
    "join_right_outer",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderstatus,
           COALESCE(b.big_qty, -1.0) AS big_qty
    FROM (
        SELECT l_orderkey, {oracle_dsum('l_quantity')} AS big_qty
        FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey
    ) b RIGHT JOIN orders o ON b.l_orderkey = o.o_orderkey
    """,
)
def join_right_outer(spark, sf_dir):
    li, o = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    big = (
        li.filter(F.col("l_quantity") > 45)
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("big_qty"))
    )
    return big.join(o, big.l_orderkey == o.o_orderkey, "right").select(
        "o_orderkey", "o_orderstatus", F.coalesce("big_qty", F.lit(-1.0)).alias("big_qty")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
    FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
      ON c.c_nationkey = s.s_nationkey
    """,
)
def join_full_outer(spark, sf_dir):
    c = load(spark, sf_dir, "customer").groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    s = load(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
)
def join_left_semi(spark, sf_dir):
    """EXISTS as left-semi join (no duplication of the left side)."""
    li, o = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    hot = li.filter(F.col("l_quantity") >= 49)
    return o.join(hot, o.o_orderkey == hot.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
)
def join_left_anti(spark, sf_dir):
    li, o = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    hot = li.filter(F.col("l_quantity") >= 49)
    return o.join(hot, o.o_orderkey == hot.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name, (n.n_regionkey = r.r_regionkey) AS same_region
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark, sf_dir):
    """Cross join of the two fixed-size dimensions (125 rows at any SF)."""
    r, n = load(spark, sf_dir, "region"), load(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name", "n_name", (F.col("n_regionkey") == F.col("r_regionkey")).alias("same_region")
    )


@query(
    "join_range",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
    """,
)
def join_range(spark, sf_dir):
    """Range/interval join keyed on orderkey: equi part hash-joins, the time
    range is the join residual (no BNLJ). Ship dates fall 1..~120 days
    after the order date, so the 60-day window keeps a strict SUBSET of
    lines — the bounds genuinely select. (The previous events-vs-orders
    form compared empty-vs-empty at every scale factor — the date ranges
    never overlap — and could not have caught a broken range_join.)"""
    li, o = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")
    li2 = li.select("l_orderkey", "l_linenumber", "l_shipdate")
    o2 = o.select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("o_end"),
    )
    joined = range_join(
        li2,
        o2,
        li2["l_orderkey"] == o2["o_orderkey"],
        "l_shipdate",
        "o_orderdate",
        "o_end",
    )
    return joined.select("l_orderkey", "l_linenumber", "l_shipdate")


@query(
    "join_asof",
    bench=True,
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           o.last_orderkey, o.last_totalprice
    FROM events e
    ASOF JOIN (
        SELECT user_id, o_orderdate, last_orderkey, last_totalprice FROM (
            SELECT o_custkey AS user_id, o_orderdate,
                   o_orderkey AS last_orderkey, o_totalprice AS last_totalprice,
                   row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    ) o ON e.user_id = o.user_id AND o.o_orderdate <= e.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: latest order at-or-before each event, per customer.

    Implemented with the union-tag trick (operators.joins.asof_join): one
    shuffle on the key, no explosion. Inner semantics (drop events with no
    prior order) to match DuckDB's ASOF JOIN. The right side is first
    reduced to one row per (key, time) — argmax by orderkey — so tie
    survivors are deterministic on both engines.
    """
    from artigraph_spark.operators.windows import dedup_pick_first

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    o = dedup_pick_first(
        load(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("user_id"),
            "o_orderdate",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_totalprice").alias("last_totalprice"),
        ),
        ["user_id", "o_orderdate"],
        [F.col("last_orderkey").desc()],
    )
    out = asof_join(
        e, o, on="user_id", left_time="ts", right_time="o_orderdate",
        right_values=["last_orderkey", "last_totalprice"],
    )
    return out.filter(F.col("last_orderkey").isNotNull()).select(
        "event_id", "user_id", "event_type", "last_orderkey", "last_totalprice"
    )


@query(
    "join_self",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber AS line_a, b.l_linenumber AS line_b,
           a.l_quantity + b.l_quantity AS pair_qty
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    """,
)
def join_self(spark, sf_dir):
    """Self-join: line pairs within an order (aliased sides)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("line_a"),
        F.col("b.l_linenumber").alias("line_b"),
        (F.col("a.l_quantity") + F.col("b.l_quantity")).alias("pair_qty"),
    )


@query(
    "join_star_broadcast",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
    bench=True,
)
def join_star_broadcast(spark, sf_dir):
    """Star-schema revenue rollup (TPC-H Q5-flavored) — the flagship query.

    nation/region are explicitly broadcast; customer joins shuffle on the
    fact keys; the date filter pushes into the lineitem/orders parquet scans.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "salted_join_revenue",
    oracle=f"""
    SELECT o.o_orderpriority,
           {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def salted_join_revenue(spark, sf_dir):
    """Salted skew join, result-parity-proved: lineitem joins orders
    through ``operators.joins.salted_join`` (right side replicated
    salt=16 ways, left scattered by a deterministic hash), then revenue
    rolls up by order priority. Salting only refines the partitioning
    key, so the oracle is the PLAIN join — any divergence (lost or
    duplicated rows from the salt scatter/replicate) breaks the hash
    match. The zipfian-key speedup study for the operator is in
    docs/SCALE.md; this query pins its correctness side. Revenue uses
    the fixed-point order-independent sum (FIXTURES.md)."""
    from artigraph_spark.operators.joins import salted_join

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, "l_orderkey", salt=16)
    return joined.groupBy("o_orderpriority").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )
