"""Projection / filter / scalar-expression query surface (SURVEY §2 Part B).

All expressions stay in whole-stage codegen (built-in ``F.*`` only). Filters
and projections are written so Catalyst pushes them into the parquet scan
(verify with ``.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from artigraph_spark.queries import query
from artigraph_spark.sources import load


@query(
    "proj_select_rename",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity AS qty,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def proj_select_rename(spark, sf_dir):
    """Projection: select / rename / computed column; scan reads 4 columns only."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


@query(
    "filter_between_isin",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 30
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1995-07-01 00:00:00'
      AND NOT (l_discount = 0)
    """,
)
def filter_between_isin(spark, sf_dir):
    """Filter: comparison, BETWEEN, IN-list, boolean algebra — all pushed to parquet."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 30)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1995-07-01 00:00:00").cast("timestamp"))
        & ~(F.col("l_discount") == 0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "filter_null_tests",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (NULLIF(l_discount, 0) IS NULL) AS disc_is_zero,
           COALESCE(NULLIF(l_returnflag, 'N'), '-') AS flag_or_dash
    FROM lineitem
    WHERE NULLIF(l_tax, 0) IS NOT NULL
    """,
)
def filter_null_tests(spark, sf_dir):
    """NULL handling: nullif / isNull / isNotNull / coalesce."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.nullif(F.col("l_tax"), F.lit(0)).isNotNull()).select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0)).isNull().alias("disc_is_zero"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("-")).alias("flag_or_dash"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_v,
           CAST(floor(l_quantity / 7) AS BIGINT) AS floor_v,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_v,
           round(sqrt(l_quantity), 3) AS sqrt_r,
           exp(l_discount) AS exp_v,
           ln(l_extendedprice) AS ln_v,
           log10(l_extendedprice) AS log10_v,
           pow(l_quantity, 2) AS pow_v,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_v,
           l_linenumber % 7 AS mod_v,
           l_partkey // 7 AS intdiv_v
    FROM lineitem
    """,
)
def scalar_math(spark, sf_dir):
    """Scalar math: abs/floor/ceil/sqrt/exp/ln/log10/pow/sign/mod/int-div."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_v"),
        F.floor(F.col("l_quantity") / 7).alias("floor_v"),
        F.ceil(F.col("l_quantity") / 7).alias("ceil_v"),
        F.round(F.sqrt("l_quantity"), 3).alias("sqrt_r"),
        F.exp("l_discount").alias("exp_v"),
        F.log(F.col("l_extendedprice")).alias("ln_v"),
        F.log10("l_extendedprice").alias("log10_v"),
        F.pow("l_quantity", F.lit(2)).alias("pow_v"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_v"),
        (F.col("l_linenumber") % 7).alias("mod_v"),
        F.expr("l_partkey div 7").alias("intdiv_v"),
    )


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           p_brand || '#' || p_type AS brand_type,
           substr(p_name, 1, 8) AS name8,
           upper(p_brand) AS up,
           lower(p_type) AS lo,
           trim('  ' || p_brand || '  ') AS trimmed,
           ltrim('  ' || p_brand) AS ltrimmed,
           rtrim(p_brand || '  ') AS rtrimmed,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_name, 'a', '@') AS replaced,
           lpad(p_brand, 12, '*') AS lpadded,
           rpad(p_brand, 12, '*') AS rpadded,
           (p_name LIKE '%er%') AS has_er,
           regexp_extract(p_brand, '[0-9]+') AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           starts_with(p_type, 'S') AS starts_s,
           ends_with(p_type, 'D') AS ends_d,
           CAST(strpos(p_name, 'e') AS BIGINT) AS e_pos,
           split_part(p_type, ' ', 1) AS first_tok
    FROM part
    """,
)
def scalar_string(spark, sf_dir):
    """String ops: concat/substr/case/trim/length/replace/pad/like/regexp/split."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.upper("p_brand").alias("up"),
        F.lower("p_type").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("  "), F.col("p_brand"))).alias("ltrimmed"),
        F.rtrim(F.concat(F.col("p_brand"), F.lit("  "))).alias("rtrimmed"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("replaced"),
        F.lpad("p_brand", 12, "*").alias("lpadded"),
        F.rpad("p_brand", 12, "*").alias("rpadded"),
        F.col("p_name").like("%er%").alias("has_er"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.startswith(F.col("p_type"), F.lit("S")).alias("starts_s"),
        F.endswith(F.col("p_type"), F.lit("D")).alias("ends_d"),
        F.instr(F.col("p_name"), "e").cast("long").alias("e_pos"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_tok"),
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS d,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_ts,
           strftime(o_orderdate, '%Y-%m-%d') AS fmt
    FROM orders
    """,
)
def scalar_datetime(spark, sf_dir):
    """Date/time ops: year/month/day/dow/trunc/add/diff/last_day/epoch/format."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("fmt"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '---') AS seg,
           greatest(c_acctbal, 0.0) AS pos_bal,
           least(c_acctbal, 0.0) AS neg_bal,
           CASE WHEN c_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS nation_parity
    FROM customer
    """,
)
def scalar_conditional(spark, sf_dir):
    """Conditionals: CASE WHEN chains, coalesce/nullif, greatest/least, if."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("---")).alias("seg"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("pos_bal"),
        F.least(F.col("c_acctbal"), F.lit(0.0)).alias("neg_bal"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias("nation_parity"),
    )


@query(
    "scalar_cast",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CAST(l_linenumber AS BIGINT) AS ln_big,
           CAST(l_partkey AS INTEGER) AS pk_int,
           CAST(l_linenumber AS DOUBLE) AS ln_dbl,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(l_orderkey AS VARCHAR) AS ok_str,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day,
           CAST(l_quantity > 25 AS INTEGER) AS qty_gt25
    FROM lineitem
    """,
)
def scalar_cast(spark, sf_dir):
    """Casts across the §1.2 type bridges (int widths, double, string, date, bool)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("long").alias("ln_big"),
        F.col("l_partkey").cast("int").alias("pk_int"),
        F.col("l_linenumber").cast("double").alias("ln_dbl"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.col("l_orderkey").cast("string").alias("ok_str"),
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_day"),
        (F.col("l_quantity") > 25).cast("int").alias("qty_gt25"),
    )


@query(
    "array_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(len(generate_series(1, l_linenumber)) AS INTEGER) AS arr_size,
           generate_series(1, l_linenumber)[1] AS first_el,
           list_contains(generate_series(1, l_linenumber), 3) AS has_three,
           array_to_string(list_transform(generate_series(1, l_linenumber), x -> x * x), ',') AS squares,
           array_to_string(list_reverse_sort(generate_series(1, l_linenumber)), ',') AS rev,
           COALESCE(CAST(list_sum(list_filter(generate_series(1, l_linenumber), x -> x % 2 = 0)) AS BIGINT), 0) AS even_sum,
           array_to_string(list_sort(list_distinct(list_concat(generate_series(1, l_linenumber),
                                                               generate_series(1, 2)))), ',') AS merged
    FROM lineitem
    """,
)
def array_ops(spark, sf_dir):
    """Array ops + HOFs: sequence/size/element_at/contains/transform/filter/aggregate/sort.

    Arrays rendered with array_join so the comparison is string-typed; the
    distinct-merge is sort-normalized per the determinism contract.
    """
    li = load(spark, sf_dir, "lineitem")
    arr = F.sequence(F.lit(1), F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.size(arr).alias("arr_size"),
        F.element_at(arr, 1).alias("first_el"),
        F.array_contains(arr, 3).alias("has_three"),
        F.array_join(F.transform(arr, lambda x: x * x), ",").alias("squares"),
        F.array_join(F.sort_array(arr, asc=False), ",").alias("rev"),
        F.aggregate(
            F.filter(arr, lambda x: x % 2 == 0), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("even_sum"),
        F.array_join(
            F.array_sort(F.array_distinct(F.concat(arr, F.sequence(F.lit(1), F.lit(2))))), ","
        ).alias("merged"),
    )


@query(
    "map_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           'qty,tax' AS key_list,
           l_quantity AS qty_val,
           l_tax AS tax_val,
           2 AS map_size
    FROM lineitem
    """,
)
def map_ops(spark, sf_dir):
    """Map ops: create_map / map_keys / element_at / size.

    The Spark side builds and probes a real MapType column; the oracle states
    the algebraically-equivalent result (element_at(map(k,v), k) ≡ v).
    """
    li = load(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("tax"), F.col("l_tax")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(F.map_keys(m), ",").alias("key_list"),
        F.element_at(m, F.lit("qty")).alias("qty_val"),
        F.element_at(m, F.lit("tax")).alias("tax_val"),
        F.size(m).alias("map_size"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           (json_extract_string(props, '$.missing') IS NULL) AS missing_is_null
    FROM events
    """,
)
def json_extract(spark, sf_dir):
    """JSON scalar functions over the events.props JSON column."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "struct<k: bigint>")
    return e.select(
        "event_id",
        parsed["k"].alias("k_val"),
        (F.get_json_object("props", "$.k").cast("long") * 2).alias("k_doubled"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )
