"""Aggregation query surface: groupBy/agg families, rollup/cube/grouping sets,
pivot, percentiles, distinct. Decimal-reduced sums per the determinism
contract; Catalyst provides partial (map-side) aggregation for all of these.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from artigraph_spark.functions import (
    davg,
    dstddev_samp,
    dsum,
    dvar_samp,
    oracle_davg,
    oracle_dstddev_samp,
    oracle_dsum,
    oracle_dsum_filter,
    oracle_dvar_samp,
)
from artigraph_spark.queries import query
from artigraph_spark.sources import load


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum('l_quantity')} AS sum_qty,
           {oracle_dsum('l_extendedprice')} AS sum_base_price,
           {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {oracle_davg('l_quantity')} AS avg_qty,
           {oracle_davg('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: 2 group keys, 7 aggregates, one pass."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           count(o_orderpriority) AS n_priority,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderpriority").alias("n_priority"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "agg_minmax_stats",
    oracle=f"""
    SELECT c_nationkey,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal,
           {oracle_dsum('c_acctbal')} AS sum_bal,
           {oracle_dvar_samp('c_acctbal')} AS var_bal,
           {oracle_dstddev_samp('c_acctbal')} AS std_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_minmax_stats(spark, sf_dir):
    """min/max/sum/variance/stddev — the Statistics layer the reference stubs
    (/root/reference/src/arti/statistics/__init__.py:17-33), computed for real."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        dsum("c_acctbal").alias("sum_bal"),
        dvar_samp("c_acctbal").alias("var_bal"),
        dstddev_samp("c_acctbal").alias("std_bal"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS lines,
           array_to_string(list(DISTINCT l_returnflag ORDER BY l_returnflag), ',') AS flags
    FROM lineitem GROUP BY l_orderkey
    """,
)
def agg_collect(spark, sf_dir):
    """collect_list / collect_set, sort-normalized and string-rendered."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.sort_array(F.collect_list("l_linenumber")), ",").alias("lines"),
        F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias("flags"),
    )


@query(
    "agg_filtered",
    oracle=f"""
    SELECT l_linestatus,
           {oracle_dsum_filter('l_quantity', "l_returnflag = 'A'")} AS qty_a,
           {oracle_dsum_filter('l_quantity', "l_returnflag = 'R'")} AS qty_r,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
           COALESCE({oracle_dsum_filter('l_extendedprice', 'l_quantity > 40')}, 0.0) AS big_price
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_filtered(spark, sf_dir):
    """Conditional aggregation: sum/count over predicates (FILTER clauses)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        dsum(F.when(F.col("l_returnflag") == "A", F.col("l_quantity"))).alias("qty_a"),
        dsum(F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))).alias("qty_r"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_disc"),
        F.coalesce(
            dsum(F.when(F.col("l_quantity") > 40, F.col("l_extendedprice"))), F.lit(0.0)
        ).alias("big_price"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '(all)') AS rf,
           COALESCE(l_linestatus, '(all)') AS ls,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           count(*) AS n,
           {oracle_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("ls"),
            "gid",
            "n",
            "sum_qty",
        )
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, '(all)') AS st,
           COALESCE(o_orderpriority, '(all)') AS pri,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n,
           {oracle_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("pri"),
            "gid",
            "n",
            "sum_price",
        )
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '(all)') AS rf,
           COALESCE(l_linestatus, '(all)') AS ls,
           count(*) AS n,
           {oracle_dsum('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS via SQL on a temp view (same Catalyst plan as the
    DataFrame rollup/cube paths)."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("q_lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '(all)') AS rf,
               COALESCE(l_linestatus, '(all)') AS ls,
               count(*) AS n,
               CAST(sum(CAST(floor(l_extendedprice * 1048576.0) AS BIGINT)) AS DOUBLE)
                   / 1048576.0 AS sum_price
        FROM q_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem",
)
def agg_distinct_rows(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_linenumber").distinct()


@query(
    "agg_dedup_pick_first",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def agg_dedup_pick_first(spark, sf_dir):
    """Deterministic dropDuplicates: latest order per customer (total order →
    reproducible survivor, unlike dropDuplicates)."""
    from artigraph_spark.operators.windows import dedup_pick_first

    o = load(spark, sf_dir, "orders")
    return dedup_pick_first(
        o, ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
    ).select("o_custkey", "o_orderkey", "o_totalprice")


@query(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           COALESCE({oracle_dsum_filter('l_quantity', "l_linestatus = 'F'")}, 0.0) AS qty_f,
           COALESCE({oracle_dsum_filter('l_quantity', "l_linestatus = 'O'")}, 0.0) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot on linestatus with an explicit value list (no extra values-scan job)."""
    li = load(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_f"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_o"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.75) AS q75,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact median/quartiles (linear interpolation — same definition both engines)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "agg_approx",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS acd_ok,
           TRUE AS amed_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx(spark, sf_dir):
    """Sketch aggregates — HLL distinct + quantile sketch, the 100 TB
    cardinality-estimation scale path. The sketches themselves are
    engine-specific, so the checkable output asserts their error bounds
    in-query: `acd_ok` = HLL within 3× the configured rsd of the exact
    distinct count, `amed_ok` = approx median within 2 quantity units of the
    exact median; the oracle reproduces the exact count and expects TRUE."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("__acd__"),
        F.median("l_quantity").alias("__med__"),
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(1000)).alias("__amed__"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("__acd__") - F.col("exact_orders"))
            <= F.col("exact_orders").cast("double") * 0.06
        ).alias("acd_ok"),
        (F.abs(F.col("__amed__") - F.col("__med__")) <= F.lit(2.0)).alias("amed_ok"),
    )


@query(
    "agg_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           count(*) AS n,
           {oracle_dsum('o_totalprice')} AS total
    FROM orders GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Fixed-width histogram via arithmetic bucketing (portable width_bucket)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("bucket", F.floor(F.col("o_totalprice") / 50000.0).cast("long"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
    )


@query(
    "agg_global_summary",
    oracle=f"""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           min(l_shipdate) = TIMESTAMP '1995-01-02 00:00:00' AS min_is_known,
           {oracle_dsum('l_quantity')} AS total_qty,
           {oracle_davg('l_extendedprice')} AS avg_price,
           max(l_linenumber) AS max_line
    FROM lineitem
    """,
)
def agg_global_summary(spark, sf_dir):
    """Global (no group key) aggregation — describe/summary-style statistics."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        (F.min("l_shipdate") == F.lit("1995-01-02 00:00:00").cast("timestamp")).alias(
            "min_is_known"
        ),
        dsum("l_quantity").alias("total_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.max("l_linenumber").alias("max_line"),
    )


def _moments_oracle_sql() -> str:
    """DuckDB replica of the fixed-point power-sum moments: identical
    double-arithmetic sequence over identical exact integer sums."""
    s1 = oracle_dsum("l_quantity", 20)
    s2 = oracle_dsum("(l_quantity) * (l_quantity)", 10)
    s3 = oracle_dsum("(l_quantity) * (l_quantity) * (l_quantity)", 10)
    s4 = oracle_dsum(
        "(l_quantity) * (l_quantity) * (l_quantity) * (l_quantity)", 10
    )
    m1, m2, m3, m4 = "(s1/n)", "(s2/n)", "(s3/n)", "(s4/n)"
    var = f"({m2} - {m1} * {m1})"
    skew = (
        f"({m3} - 3.0 * {m1} * {m2} + 2.0 * {m1} * {m1} * {m1})"
        f" / power({var}, 1.5)"
    )
    kurt = (
        f"({m4} - 4.0 * {m1} * {m3} + 6.0 * {m1} * {m1} * {m2}"
        f" - 3.0 * {m1} * {m1} * {m1} * {m1}) / ({var} * {var}) - 3.0"
    )
    return f"""
    WITH s AS (
        SELECT l_returnflag, count(*) AS n,
               {s1} AS s1, {s2} AS s2, {s3} AS s3, {s4} AS s4
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND NOT isnan(l_quantity)
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round({m1}, 6) AS mean_r,
           round({var}, 6) AS var_r,
           CASE WHEN {var} > 0 THEN round({skew}, 6) END AS skew_r,
           CASE WHEN {var} > 0 THEN round({kurt}, 6) END AS kurt_r
    FROM s
    """


@query("agg_moments_quantity", oracle=_moments_oracle_sql(), bench=True)
def agg_moments_quantity(spark, sf_dir):
    """Per-returnflag distribution moments of quantity — population
    mean/variance, skewness, excess kurtosis — from exact fixed-point
    power sums Σx..Σx⁴ (int64/decimal partials, associative at any
    partition count), with the moment formulas run as an identical
    double sequence on both engines. The drift-detection shape. See
    ``operators.quality.moments``."""
    from artigraph_spark.operators.quality import moments

    li = load(spark, sf_dir, "lineitem")
    return moments(li, "l_returnflag", "l_quantity")
