"""Additional operator coverage: nested structs, unpivot, subqueries,
argmin/argmax, calendar functions, explode-to-rows, generated sources.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from artigraph_spark.functions import davg, oracle_davg
from artigraph_spark.queries import query
from artigraph_spark.sources import load


@query(
    "nested_struct_access",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_from_struct,
           o_totalprice AS price_from_struct,
           (o_totalprice > 100000) AS flag_from_struct
    FROM orders
    """,
)
def nested_struct_access(spark, sf_dir):
    """Build a struct column, then project nested fields (dotted access)."""
    o = load(spark, sf_dir, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            (F.col("o_totalprice") > 100000).alias("flag"),
        ).alias("info"),
    )
    return nested.select(
        "o_orderkey",
        F.col("info.status").alias("status_from_struct"),
        F.col("info.price").alias("price_from_struct"),
        F.col("info.flag").alias("flag_from_struct"),
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def unpivot_stack(spark, sf_dir):
    """Unpivot (wide→long) via stack — the inverse of pivot."""
    li = load(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax) AS (measure, value)",
    )


@query(
    "in_subquery_sql",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 50)
    """,
)
def in_subquery_sql(spark, sf_dir):
    """IN / NOT IN subqueries through the SQL API (Catalyst rewrites to
    semi/anti joins — same plans as the DataFrame variants)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("x_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("x_customer")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("x_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM x_orders
        WHERE o_custkey IN (SELECT c_custkey FROM x_customer WHERE c_acctbal > 9000)
          AND o_orderkey NOT IN (SELECT l_orderkey FROM x_lineitem WHERE l_quantity >= 50)
        """
    )


@query(
    "scalar_subquery_filter",
    oracle=f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT {oracle_davg('o_totalprice')} FROM orders)
    """,
)
def scalar_subquery_filter(spark, sf_dir):
    """Filter against a computed global aggregate (scalar subquery shape;
    deterministic via fixed-point mean)."""
    o = load(spark, sf_dir, "orders")
    avg_df = o.agg(davg("o_totalprice").alias("__avg"))
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "agg_argminmax",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS biggest_order,
           arg_min(o_orderkey, o_totalprice - o_orderkey * 1e-9) AS smallest_order,
           max(o_totalprice) AS max_price,
           min(o_totalprice) AS min_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_argminmax(spark, sf_dir):
    """arg_max/arg_min (max_by/min_by) — the orderkey jitter makes the
    extremum unique so tie-breaking is engine-independent."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", F.col("o_totalprice") + F.col("o_orderkey") * 1e-9).alias(
            "biggest_order"
        ),
        F.min_by("o_orderkey", F.col("o_totalprice") - F.col("o_orderkey") * 1e-9).alias(
            "smallest_order"
        ),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "calendar_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
    FROM orders
    """,
)
def calendar_functions(spark, sf_dir):
    """Quarter/week/day-of-year calendar functions (ISO week both engines)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias("quarter_start"),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias("week_start"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
    )


@query(
    "explode_tokens",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos,
           unnest(toks) AS token
    FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
        FROM documents WHERE doc_id < 50
    )
    """,
)
def explode_tokens(spark, sf_dir):
    """Lateral explode with position (posexplode) — text to token rows."""
    from artigraph_spark.operators.dedup import tokens

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token")
    )


@query(
    "range_source",
    oracle="""
    SELECT CAST(r.range AS BIGINT) AS id,
           CAST(r.range * r.range AS BIGINT) AS sq,
           CAST(r.range % 7 AS BIGINT) AS bucket
    FROM range(0, 1000) r
    """,
)
def range_source(spark, sf_dir):
    """Generated (range) source — no files; distributed id generation."""
    return spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") * F.col("id")).alias("sq"),
        (F.col("id") % 7).alias("bucket"),
    )


@query(
    "literal_inline_table",
    oracle="""
    SELECT * FROM (VALUES
        (1, 'alpha', 1.5),
        (2, 'beta', 2.5),
        (3, 'gamma', NULL)
    ) AS t(id, name, score)
    """,
)
def literal_inline_table(spark, sf_dir):
    """Inline literal table (createDataFrame ↔ VALUES) — the StringLiteral
    storage path of the framework."""
    return spark.createDataFrame(
        [Row(id=1, name="alpha", score=1.5), Row(id=2, name="beta", score=2.5), Row(id=3, name="gamma", score=None)],
        schema="id int, name string, score double",
    )


@query(
    "union_by_name_missing",
    oracle="""
    SELECT c_nationkey AS nationkey, c_acctbal AS bal, NULL AS s_suppkey
    FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT s_nationkey AS nationkey, s_acctbal AS bal, s_suppkey
    FROM supplier
    """,
)
def union_by_name_missing(spark, sf_dir):
    """unionByName(allowMissingColumns=True): schema evolution across
    heterogeneous sources."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("bal"))
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("bal"), "s_suppkey"
    )
    return c.unionByName(s, allowMissingColumns=True)
