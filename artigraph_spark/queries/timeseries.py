"""Time-window queries: tumbling/sliding/session windows as deterministic
batch equivalents of the streaming extension (SURVEY §2 — the reference is
batch-only; these define parity between our batch and streaming paths).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from artigraph_spark.functions import (
    davg,
    dsum,
    dsum_safe,
    oracle_davg,
    oracle_dstddev_samp,
    oracle_dsum_safe,
)
from artigraph_spark.queries import query
from artigraph_spark.sources import load


@query(
    "window_tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           (CAST(SUM(CAST(floor((value) * 1048576.0) AS BIGINT)) FILTER (WHERE value IS NOT NULL AND NOT isnan(value)) AS DOUBLE) / 1048576.0) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    bench=True,
)
def window_tumbling(spark, sf_dir):
    """Tumbling 1-hour windows (batch twin of streaming groupBy(F.window))."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            dsum_safe("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_sliding",
    oracle="""
    WITH assigned AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS b, value
        FROM events
    )
    SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n,
           (CAST(SUM(CAST(floor((value) * 1048576.0) AS BIGINT)) FILTER (WHERE value IS NOT NULL AND NOT isnan(value)) AS DOUBLE) / 1048576.0) AS total_value
    FROM assigned GROUP BY 1
    """,
)
def window_sliding(spark, sf_dir):
    """Sliding windows: 1 hour wide, 30-minute hop (each event in 2 windows)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            dsum_safe("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "window_session",
    bench=True,
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > 1800000000 THEN 1
                    ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, event_id, ts, value,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           (CAST(SUM(CAST(floor((value) * 1048576.0) AS BIGINT)) FILTER (WHERE value IS NOT NULL AND NOT isnan(value)) AS DOUBLE) / 1048576.0) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def window_session(spark, sf_dir):
    """Sessionization with a 30-minute inactivity gap (batch; streaming twin
    is F.session_window). Microsecond integer gap arithmetic → engine-exact
    (whole-second truncation mis-assigned sub-second boundary gaps)."""
    from artigraph_spark.operators.windows import sessionize

    e = load(spark, sf_dir, "events")
    sess = sessionize(e, "user_id", "ts", 1800, tiebreak=["event_id"])
    return sess.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.count("*").alias("n_events"),
        dsum_safe("value").alias("total_value"),
    )


@query(
    "window_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS lo,
               time_bucket(INTERVAL '1 hour', max(ts)) AS hi
        FROM events
    ),
    buckets AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
        FROM bounds
    ),
    spine AS (
        SELECT buckets.bucket, et.event_type
        FROM buckets, (SELECT DISTINCT event_type FROM events) AS et
    ),
    agg AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT strftime(spine.bucket, '%Y-%m-%d %H:%M:%S') AS window_start,
           spine.event_type,
           COALESCE(agg.n, 0) AS n,
           (agg.n IS NULL) AS is_gap
    FROM spine LEFT JOIN agg USING (bucket, event_type)
    """,
)
def window_gap_fill(spark, sf_dir):
    """Time-series densification: a complete hourly (bucket × event_type)
    spine over the data's span, with empty buckets filled as zero-count gap
    rows. The spine is built from a broadcast single-row min/max aggregate
    crossed with the distinct key set — F.sequence + explode generates the
    buckets distributed, never on the driver; the fill join is a keyed
    left join (shuffle on (bucket, type), no BNLJ)."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket")
        )
        .crossJoin(F.broadcast(e.select("event_type").distinct()))
    )
    agg = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count("*").alias("__n__"))
    return spine.join(agg, ["bucket", "event_type"], "left").select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        F.coalesce("__n__", F.lit(0)).alias("n"),
        F.col("__n__").isNull().alias("is_gap"),
    )


@query(
    "event_funnel",
    bench=True,
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT s1.user_id,
           strftime(s1.t1, '%Y-%m-%d %H:%M:%S') AS view_at,
           strftime(s2.t2, '%Y-%m-%d %H:%M:%S') AS click_at,
           strftime(s3.t3, '%Y-%m-%d %H:%M:%S') AS purchase_at,
           CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2 ELSE 1 END AS stage_reached
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s2.user_id = s3.user_id
    """,
)
def event_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase — see
    ``operators.timeseries.funnel_stages`` for semantics and scale shape
    (shared with the analytics demo so the oracle-locked logic has exactly
    one definition). Timestamps are compared raw (µs-exact) and only
    formatted for output."""
    from artigraph_spark.operators.timeseries import funnel_stages

    e = load(spark, sf_dir, "events")
    return funnel_stages(e).select(
        "user_id",
        F.date_format("t1", "yyyy-MM-dd HH:mm:ss").alias("view_at"),
        F.date_format("t2", "yyyy-MM-dd HH:mm:ss").alias("click_at"),
        F.date_format("t3", "yyyy-MM-dd HH:mm:ss").alias("purchase_at"),
        "stage_reached",
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT f.user_id, f.cohort_week,
               date_trunc('week', e.ts) AS active_week
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort_week, active_week) / 7 AS BIGINT) AS week_offset,
           count(*) AS n_active
    FROM activity
    GROUP BY cohort_week, active_week
    """,
)
def cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users are assigned to the ISO week of their
    first event; each later week of activity increments that cohort's
    (cohort, offset) cell. distinct-(user, week) before the count makes the
    cell an exact active-user count. Both engines truncate to Monday-start
    weeks and the offset is integer day arithmetic — engine-exact. Shuffles:
    groupBy(user), join on user, distinct + groupBy on the (cohort, week)
    pair — all key-partitioned."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.select("user_id", F.date_trunc("week", "ts").alias("active_week"))
        .join(firsts, "user_id")
        .select("user_id", "cohort_week", "active_week")
        .distinct()
    )
    return activity.groupBy("cohort_week", "active_week").agg(
        F.count(F.lit(1)).alias("n_active")
    ).select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff("active_week", "cohort_week") / 7).cast("long").alias("week_offset"),
        "n_active",
    )


@query(
    "anomaly_zscore_hours",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', ts) AS w,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type,
               {oracle_davg('n')} AS mu,
               {oracle_dstddev_samp('n')} AS sigma
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type,
           strftime(h.w, '%Y-%m-%d %H:%M:%S') AS window_start,
           h.n,
           round((h.n - s.mu) / s.sigma, 6) AS zscore_r
    FROM hourly h JOIN stats s ON h.event_type = s.event_type
    WHERE s.sigma > 0 AND abs((h.n - s.mu) / s.sigma) > 2.0
    """,
)
def anomaly_zscore_hours(spark, sf_dir):
    """Volume-anomaly detection: hourly event counts per type more than 2σ
    from that type's own hourly mean — see
    ``operators.timeseries.hourly_anomalies`` for semantics and scale shape
    (shared with the analytics demo so the oracle-locked logic has exactly
    one definition)."""
    from artigraph_spark.operators.timeseries import hourly_anomalies

    e = load(spark, sf_dir, "events")
    return hourly_anomalies(e).select(
        "event_type",
        F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n",
        "zscore_r",
    )


@query(
    "rollup_time_hierarchy",
    oracle=f"""
    WITH hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS b,
               count(*) AS n,
               SUM(CAST(floor(value * {float(1 << 20)!r}) AS BIGINT)) AS fx
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1
    ), daily AS (
        SELECT time_bucket(INTERVAL '1 day', b) AS b, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(fx) AS BIGINT) AS fx
        FROM hourly GROUP BY 1
    ), monthly AS (
        SELECT date_trunc('month', b) AS b, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(fx) AS BIGINT) AS fx
        FROM daily GROUP BY 1
    )
    SELECT 'hour' AS level, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           n, CAST(fx AS DOUBLE) / {float(1 << 20)!r} AS total_value
    FROM hourly
    UNION ALL
    SELECT 'day', strftime(b, '%Y-%m-%d %H:%M:%S'), n,
           CAST(fx AS DOUBLE) / {float(1 << 20)!r}
    FROM daily
    UNION ALL
    SELECT 'month', strftime(b, '%Y-%m-%d %H:%M:%S'), n,
           CAST(fx AS DOUBLE) / {float(1 << 20)!r}
    FROM monthly
    """,
)
def rollup_time_hierarchy(spark, sf_dir):
    """Hypertable-style hour→day→month rollup where every coarser level
    re-aggregates the finer level's partials (continuous-aggregate
    pattern, see ``operators.timeseries.time_rollup``). The shared
    fixed-point encoding (2^20, ``functions.DEFAULT_BITS``) makes the
    re-aggregation drift-free, so the oracle — which builds its levels the
    same cascaded way at the same scale — matches bit-for-bit."""
    from artigraph_spark.functions import DEFAULT_BITS
    from artigraph_spark.operators.timeseries import time_rollup

    e = load(spark, sf_dir, "events")
    out = time_rollup(e, bits=DEFAULT_BITS)
    return out.select(
        "level",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n",
        "total_value",
    )


@query(
    "interval_join_click_purchase",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id AS user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def interval_join_click_purchase(spark, sf_dir):
    """Batch twin of ``streaming.interval_join`` (same call, batch
    frames): every purchase landing within 30 minutes after a click by
    the same user — the enrichment shape whose streaming form bounds
    symmetric-hash-join state by watermark x horizon. The time bounds
    ride as a join-range residual on the user_id equi-join, not a
    post-join filter; purchase_value is a raw double passthrough (no
    aggregation), so it is cross-engine deterministic as-is."""
    from artigraph_spark.streaming import interval_join

    # Two separate loads (fresh attribute ids) so the self-join's two
    # sides are unambiguous to the analyzer; Catalyst still reuses the
    # scan via exchange/subquery reuse where profitable.
    clicks = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).select(F.col("event_id").alias("click_id"), "user_id", "ts")
    purchases = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
    )
    joined = interval_join(
        clicks,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="ts",
        upper="30 minutes",
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
    )


@query(
    "trend_slopes_hourly",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(floor((floor(epoch(ts)) - 1704067200) / 3600.0) AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2
    ), stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_buckets,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx
        FROM hourly GROUP BY 1
    )
    SELECT event_type, n_buckets,
           round(CASE WHEN n_buckets * sxx - sx * sx <> 0
                 THEN CAST(n_buckets * sxy - sx * sy AS DOUBLE)
                      / CAST(n_buckets * sxx - sx * sx AS DOUBLE)
                 END, 9) AS slope_r
    FROM stats
    """,
)
def trend_slopes_hourly(spark, sf_dir):
    """Per-event-type linear trend of hourly volume (closed-form least
    squares over (hour index, hourly count)). The five sufficient
    statistics are exact int64 sums, so the slope — one double division
    of two exact integers — matches the oracle bit-for-bit; rounding is
    display-only. One data-sized shuffle (the hourly groupBy)."""
    from artigraph_spark.operators.timeseries import trend_slopes

    e = load(spark, sf_dir, "events")
    out = trend_slopes(
        e, "event_type", "ts", bucket_seconds=3600, origin_epoch=1704067200
    )
    return out.select(
        "event_type", "n_buckets", F.round("slope", 9).alias("slope_r")
    )


@query(
    "new_users_hourly",
    oracle="""
    WITH hourly AS (
        SELECT DISTINCT
               CAST(floor((floor(epoch(ts)) - 1704067200) / 3600.0) AS BIGINT) AS b,
               user_id
        FROM events WHERE user_id IS NOT NULL
    ), flagged AS (
        SELECT b, user_id,
               lag(b) OVER (PARTITION BY user_id ORDER BY b) AS prev_b
        FROM hourly
    )
    SELECT b AS bucket,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(SUM(CASE WHEN prev_b IS NULL OR b - prev_b > 24
                         THEN 1 ELSE 0 END) AS BIGINT) AS new_users
    FROM flagged GROUP BY b
    """,
)
def new_users_hourly(spark, sf_dir):
    """Per-hour active and NEW users, where "new" means not seen in the
    trailing 24 hours — the novelty-rate metric. One shuffle on user_id:
    the per-user hour list is deduped, lag() finds each appearance's
    previous hour, and newness is pure integer bucket arithmetic — no
    24-way self-join, no window-of-windows. Exact and oracle-replayed."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    bucket = F.floor(
        (F.unix_timestamp(F.col("ts")) - F.lit(1704067200)) / F.lit(3600.0)
    ).cast("long")
    hourly = e.select(bucket.alias("b"), "user_id").distinct()
    w = Window.partitionBy("user_id").orderBy("b")
    flagged = hourly.withColumn("prev_b", F.lag("b").over(w))
    return flagged.groupBy(F.col("b").alias("bucket")).agg(
        F.count(F.lit(1)).alias("active_users"),
        F.sum(
            F.when(
                F.col("prev_b").isNull() | (F.col("b") - F.col("prev_b") > 24),
                1,
            ).otherwise(0)
        ).alias("new_users"),
    )


@query(
    "ewma_hourly",
    bench=True,
    oracle="""
    WITH ev AS (
        SELECT CAST(floor((floor(epoch(ts)) - 1704067200) / 3600.0) AS BIGINT) AS b,
               CAST(floor(value * 1048576.0) AS BIGINT) AS v
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)
    ), per AS (
        SELECT b, CAST(SUM(v) AS BIGINT) AS s FROM ev GROUP BY 1
    ), present AS (SELECT DISTINCT b AS bucket FROM per),
    contrib AS (
        SELECT p.bucket, per.s,
               CAST(power(2, 7 - (p.bucket - per.b)) AS BIGINT) AS w
        FROM per JOIN present p ON p.bucket BETWEEN per.b AND per.b + 7
    )
    SELECT bucket, count(*) AS n_contrib,
           round(CAST(SUM(CAST(w AS HUGEINT) * s) AS DOUBLE)
                 / (CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) * 1048576.0),
                 9) AS ewma_r
    FROM contrib GROUP BY bucket
    """,
)
def ewma_hourly(spark, sf_dir):
    """Trailing-8-hour exponentially weighted moving average of event
    value per hour: per-hour fixed-point sums weighted by exact powers
    of two (halving per hour of age), missing hours excluded from the
    weight mass — the smoothed-rate primitive behind alert baselines,
    every value oracle-replayed. See ``operators.timeseries.ewma_buckets``."""
    from artigraph_spark.operators.timeseries import ewma_buckets

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
    )
    bucket = F.floor(
        (F.unix_timestamp(F.col("ts")) - F.lit(1704067200)) / F.lit(3600.0)
    ).cast("long")
    out = ewma_buckets(e, bucket, "value", window_buckets=8)
    return out.select(
        "bucket", "n_contrib", F.round(F.col("ewma"), 9).alias("ewma_r")
    )


@query(
    "inter_event_gaps_users",
    oracle="""
    WITH t AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), g AS (
        SELECT user_id,
               t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
        FROM t
    )
    SELECT user_id, count(*) AS n_events, count(gap) AS n_gaps,
           round(CAST(CAST(SUM(gap) AS BIGINT) AS DOUBLE) / count(gap), 9)
               AS avg_gap_s,
           max(gap) AS max_gap_s
    FROM g GROUP BY user_id
    """,
)
def inter_event_gaps_users(spark, sf_dir):
    """Per-user inter-event cadence: gaps between consecutive events as
    integer second differences of the sorted timestamp sequence (unique
    as a value sequence, so tie order cannot change any statistic).
    Single-event users emit NULL gap stats. See
    ``operators.timeseries.inter_event_gaps``."""
    from artigraph_spark.operators.timeseries import inter_event_gaps

    e = load(spark, sf_dir, "events")
    return inter_event_gaps(e, "user_id", "ts")


@query(
    "scd2_intervals_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS valid_from_s,
           lead(CAST(floor(epoch(o_orderdate)) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT), o_orderkey
           ) AS valid_to_s
    FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    """,
)
def scd2_intervals_orders(spark, sf_dir):
    """SCD-type-2 validity intervals per customer: each order is
    effective from its date until the customer's next order (NULL for
    the current record) — the effective-dated-history shape, boundaries
    as exact epoch seconds. See ``operators.timeseries.scd2_intervals``."""
    from artigraph_spark.operators.timeseries import scd2_intervals

    o = load(spark, sf_dir, "orders")
    return scd2_intervals(o, "o_custkey", "o_orderdate", "o_orderkey")


@query(
    "conversion_latency",
    oracle="""
    WITH c AS (
        SELECT user_id, CAST(min(floor(epoch(ts))) AS BIGINT) AS first_click_s
        FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
        GROUP BY user_id
    ), p AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS pt
        FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    )
    SELECT c.user_id, c.first_click_s,
           CAST(min(p.pt) AS BIGINT) AS first_purchase_s,
           CAST(min(p.pt) - c.first_click_s AS BIGINT) AS latency_s
    FROM p JOIN c ON p.user_id = c.user_id AND p.pt >= c.first_click_s
    GROUP BY c.user_id, c.first_click_s
    """,
)
def conversion_latency(spark, sf_dir):
    """Click-to-purchase conversion latency per user: the first
    purchase at-or-after the user's first click, as exact epoch-second
    arithmetic — the funnel-latency companion to `event_funnel`
    (which counts stage reach; this measures the wait). Only
    converting users appear."""
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(F.unix_timestamp(F.col("ts"))).alias("first_click_s"))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_timestamp(F.col("ts")).alias("__pt")
    )
    return (
        p.join(c, "user_id")
        .filter(F.col("__pt") >= F.col("first_click_s"))
        .groupBy("user_id", "first_click_s")
        .agg(F.min("__pt").alias("first_purchase_s"))
        .select(
            "user_id",
            "first_click_s",
            "first_purchase_s",
            (F.col("first_purchase_s") - F.col("first_click_s")).alias(
                "latency_s"
            ),
        )
    )


@query(
    "event_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND event_type IS NOT NULL
    ), c AS (
        SELECT src, dst, count(*) AS n_transitions
        FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n_transitions,
           round(CAST(n_transitions AS DOUBLE) /
                 CAST(sum(n_transitions) OVER (PARTITION BY src) AS BIGINT),
                 9) AS prob
    FROM c
    """,
)
def event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences:
    count and conditional probability of every observed (src, dst)
    next-event pair, ordered by (ts, event_id) so ties break
    deterministically. The sequence-mining summary behind next-action
    models and funnel sanity checks. See
    ``operators.timeseries.transition_matrix``."""
    from artigraph_spark.operators.timeseries import transition_matrix

    e = load(spark, sf_dir, "events")
    return transition_matrix(e, "user_id", "ts", "event_type", "event_id")


def _acf_oracle_sql(bucket_seconds: int, max_lag: int) -> str:
    """DuckDB replica of the exact ACF pipeline: integer mean-centered
    deviations (N·y − T), per-lag product sums, one double division.
    Sums pass through HUGEINT internally; every OUTPUT column is cast to
    a Spark-mappable type (BIGINT/DOUBLE) per the driver's arrow canon."""
    lag_cols = ", ".join(
        f"lag(dev, {k}) OVER (ORDER BY b) AS l{k}" for k in range(1, max_lag + 1)
    )
    arms = "\n    UNION ALL ".join(
        f"""SELECT CAST({k} AS BIGINT) AS lag, count(l{k}) AS n_pairs,
           CAST(sum(dev * l{k}) AS DOUBLE)
           / (SELECT CAST(sum(dev * dev) AS DOUBLE) FROM d) AS acf_r
    FROM l"""
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH pb AS (
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // {bucket_seconds}
               * {bucket_seconds} AS b,
               count(*) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ), s AS (
        SELECT count(*) AS nb, CAST(sum(y) AS BIGINT) AS t FROM pb
    ), d AS (
        SELECT b, (s.nb * pb.y - s.t) AS dev FROM pb, s
    ), l AS (
        SELECT dev, {lag_cols} FROM d
    )
    {arms}
    """


@query("acf_hourly", oracle=_acf_oracle_sql(3600, 24))
def acf_hourly(spark, sf_dir):
    """Autocorrelation of hourly event volume at lags 1..24 — the
    seasonality probe (the fixture's daily usage cycle peaks at lag 24).
    Deviations are exact integers (N·y − T), so the single double
    division replays bit-for-bit in the oracle."""
    from artigraph_spark.operators.timeseries import acf_lags

    e = load(spark, sf_dir, "events")
    return acf_lags(e, "ts", bucket_seconds=3600, max_lag=24)


@query(
    "cusum_changepoints",
    oracle="""
    WITH pb AS (
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS bucket_s,
               count(*) AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ), s AS (
        SELECT count(*) AS nb, CAST(sum(n) AS BIGINT) AS t FROM pb
    )
    SELECT bucket_s, n,
           CAST(s.nb * sum(n) OVER (ORDER BY bucket_s
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - row_number() OVER (ORDER BY bucket_s) * s.t
                AS BIGINT) AS s_scaled
    FROM pb, s
    """,
)
def cusum_changepoints(spark, sf_dir):
    """CUSUM changepoint scores over hourly event counts: the cumulative
    deviation from the global mean, scaled by N to stay in exact int64
    (s_scaled = N·prefix − t·T). The |max| row is the most likely rate
    shift; emitting every bucket's score keeps the full statistic under
    the oracle's hash."""
    from artigraph_spark.operators.timeseries import cusum_scores

    e = load(spark, sf_dir, "events")
    return cusum_scores(e, "ts", bucket_seconds=3600)


@query(
    "attribution_last_touch",
    oracle=f"""
    WITH conv AS (
        SELECT user_id, event_id AS conv_id, ts AS cts, value
        FROM events WHERE event_type = 'purchase'
    ), tch AS (
        SELECT user_id, event_id AS tid, ts AS tts, event_type AS ch
        FROM events WHERE event_type IN ('click', 'view')
    ), pairs AS (
        SELECT c.conv_id, t.tts, t.tid, t.ch
        FROM conv c JOIN tch t ON t.user_id = c.user_id
         AND t.tts < c.cts AND t.tts >= c.cts - INTERVAL 604800 SECONDS
    ), best AS (
        SELECT conv_id, ch FROM (
            SELECT conv_id, ch,
                   row_number() OVER (PARTITION BY conv_id
                                      ORDER BY tts DESC, tid DESC) AS rn
            FROM pairs
        ) WHERE rn = 1
    ), attr AS (
        SELECT c.conv_id, c.value, coalesce(b.ch, 'none') AS channel
        FROM conv c LEFT JOIN best b USING (conv_id)
    )
    SELECT channel, count(*) AS n_conversions,
           {oracle_dsum_safe('value')} AS attributed_value
    FROM attr GROUP BY 1
    """,
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch conversion attribution: each purchase credits the latest
    click/view by the same user in the prior 7 days (µs-exact window, id
    tiebreak); purchases with no qualifying touch land in channel 'none'.
    The oracle replays the winner pick as a row_number window."""
    from artigraph_spark.operators.timeseries import attribute_conversions

    e = load(spark, sf_dir, "events")
    credited = attribute_conversions(
        e, conversion_type="purchase", touch_types=("click", "view"),
        lookback_seconds=604800, model="last",
    )
    vals = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "value"
    )
    return (
        credited.join(vals, "conv_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            dsum_safe("value").alias("attributed_value"),
        )
    )


@query(
    "event_paths_top",
    oracle="""
    WITH seq AS (
        SELECT event_type AS t0,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS n_paths
    FROM seq WHERE t2 IS NOT NULL
    GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 20
    """,
)
def event_paths_top(spark, sf_dir):
    """Top-20 three-step event-type paths per user (µs order, id
    tie-break) — the user-flow mining primitive behind Sankey funnels.
    One per-user window pass; the top-k is totally ordered."""
    from artigraph_spark.operators.timeseries import event_paths

    e = load(spark, sf_dir, "events")
    return event_paths(e, length=3, top_k=20)


@query(
    "rfm_segments_users",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               max(epoch_us(ts)) AS last_us,
               count(*) AS frequency,
               coalesce(CAST(SUM(CAST(floor((value) * 1048576.0) AS BIGINT))
                   FILTER (WHERE value IS NOT NULL AND NOT isnan(value)) AS BIGINT),
                   0) AS m
        FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
        GROUP BY 1
    ), g AS (
        SELECT max(last_us) AS gmax FROM pu
    ), s AS (
        SELECT user_id,
               (g.gmax - pu.last_us) // 86400000000 AS recency_days,
               frequency,
               CAST(m AS DOUBLE) / 1048576.0 AS monetary,
               m
        FROM pu, g
    ), q AS (
        SELECT user_id, recency_days, frequency, monetary,
               CAST(ntile(5) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_q,
               CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_q,
               CAST(ntile(5) OVER (ORDER BY m DESC, user_id) AS BIGINT) AS m_q
        FROM s
    )
    SELECT user_id, recency_days, frequency, monetary, r_q, f_q, m_q,
           CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm_code
    FROM q
    """,
)
def rfm_segments_users(spark, sf_dir):
    """RFM segmentation of purchasing users: whole-day recency from exact
    µs arithmetic, count frequency, fixed-point monetary totals, each
    ntile(5)-scored with user-id tie-breaks so every bucket edge is
    engine-exact."""
    from artigraph_spark.operators.timeseries import rfm_segments

    e = load(spark, sf_dir, "events")
    return rfm_segments(e, quantiles=5)


@query(
    "seasonal_naive_mape_daily",
    oracle="""
    WITH ev AS (
        SELECT event_type AS g,
               CAST(floor((floor(epoch(ts)) - 1704067200) / 3600.0) AS BIGINT) AS b
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ), h AS (SELECT g, b, CAST(count(*) AS BIGINT) AS y FROM ev GROUP BY 1, 2),
    j AS (
        SELECT c.g, c.y, p.y AS f
        FROM h c JOIN h p ON p.g = c.g AND p.b + 24 = c.b
        WHERE c.y != 0
    )
    SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n_scored,
           round((CAST(SUM(CAST(floor(round(abs(CAST(y AS DOUBLE) - CAST(f AS DOUBLE))
                    / CAST(y AS DOUBLE), 9) * 1048576.0) AS BIGINT)) AS DOUBLE)
                  / 1048576.0) / CAST(count(*) AS DOUBLE), 9) AS mape_r
    FROM j GROUP BY g
    """,
)
def seasonal_naive_mape_daily(spark, sf_dir):
    """Seasonal-naive (same hour yesterday) forecast backtest of hourly
    event counts per type — the baseline MAPE every real forecaster must
    beat; low values certify daily seasonality in the stream. See
    ``operators.timeseries.seasonal_naive_mape``."""
    from artigraph_spark.operators.timeseries import seasonal_naive_mape

    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    hourly = e.groupBy(
        "event_type",
        F.floor(
            (F.unix_timestamp(F.col("ts")) - F.lit(1704067200)) / F.lit(3600.0)
        )
        .cast("long")
        .alias("b"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return seasonal_naive_mape(
        hourly, "event_type", "b", "y", season_buckets=24
    )


@query(
    "seasonal_decompose_daily",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
               CAST(count(*) AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ), t AS (
        SELECT day_s, y,
               CAST((((day_s // 86400) % 7) + 7) % 7 AS INTEGER) AS phase,
               CASE WHEN count(*) OVER w = 7
                    THEN CAST(SUM(y) OVER w AS BIGINT) END AS ts7
        FROM daily
        WINDOW w AS (ORDER BY day_s ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), d AS (
        SELECT day_s, y, phase, ts7, 7 * y - ts7 AS det7
        FROM t WHERE ts7 IS NOT NULL
    ), s AS (
        SELECT phase, {oracle_davg('det7')} AS s7 FROM d GROUP BY phase
    ), g AS (
        SELECT {oracle_davg('round(s7, 9)')} AS s7bar FROM s
    )
    SELECT d.day_s, d.y, d.phase,
           round(CAST(d.ts7 AS DOUBLE) / 7.0, 9) AS trend_r,
           round((s.s7 - g.s7bar) / 7.0, 9) AS seasonal_r,
           round(CAST(d.y AS DOUBLE) - CAST(d.ts7 AS DOUBLE) / 7.0
                 - round((s.s7 - g.s7bar) / 7.0, 9), 9) AS resid_r
    FROM d JOIN s USING (phase) CROSS JOIN g
    """,
)
def seasonal_decompose_daily(spark, sf_dir):
    """Classical additive decomposition of the daily event series with a
    weekly (period-7) cycle: centered-MA trend, phase-mean seasonal,
    residual — all exact-integer until the final guard-grid doubles.
    See ``operators.timeseries.seasonal_decompose``."""
    from artigraph_spark.operators.timeseries import seasonal_decompose

    e = load(spark, sf_dir, "events")
    return seasonal_decompose(e, "ts", period=7)


@query(
    "attribution_linear",
    oracle="""
    WITH conv AS (
        SELECT user_id, event_id AS conv_id, ts AS cts
        FROM events WHERE event_type = 'purchase'
    ), tch AS (
        SELECT user_id, event_id AS tid, ts AS tts, event_type AS ch
        FROM events WHERE event_type IN ('click', 'view')
    ), pairs AS (
        SELECT c.conv_id, t.tid, t.ch
        FROM conv c JOIN tch t ON t.user_id = c.user_id
         AND t.tts < c.cts AND t.tts >= c.cts - INTERVAL 604800 SECONDS
    ), counts AS (
        SELECT conv_id, CAST(count(*) AS BIGINT) AS k FROM pairs GROUP BY conv_id
    ), credited AS (
        SELECT p.conv_id, p.ch AS channel,
               CAST(SUM(CAST(floor(1048576.0 / c.k) AS BIGINT)) AS BIGINT)
                   AS credit_fx
        FROM pairs p JOIN counts c USING (conv_id) GROUP BY 1, 2
    ), attr AS (
        SELECT c.conv_id, coalesce(cr.channel, 'none') AS channel,
               coalesce(cr.credit_fx, 1048576) AS credit_fx
        FROM conv c LEFT JOIN credited cr USING (conv_id)
    )
    SELECT channel, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(credit_fx) AS BIGINT) AS credit_total
    FROM attr GROUP BY 1
    """,
)
def attribution_linear(spark, sf_dir):
    """Multi-touch linear attribution: every qualifying click/view in
    the 7-day lookback splits a purchase's credit equally via exact
    fixed-point shares (floor(2^20/k) each — integers, no
    order-dependent float splits); untouched purchases keep full credit
    under 'none'. Per-channel totals stay pure int64."""
    from artigraph_spark.operators.timeseries import attribute_conversions

    e = load(spark, sf_dir, "events")
    credited = attribute_conversions(
        e, conversion_type="purchase", touch_types=("click", "view"),
        lookback_seconds=604800, model="linear",
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("credit_fx").alias("credit_total"),
    )


@query(
    "survival_km_users",
    bench=True,
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS f,
               CAST(floor(epoch(min(CASE WHEN event_type = 'signup'
                                         THEN ts END))) AS BIGINT) AS fe
        FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ), units AS (
        SELECT CASE WHEN fe IS NOT NULL AND (fe - f) // 86400 <= 7
                    THEN (fe - f) // 86400 ELSE 7 END AS duration,
               CASE WHEN fe IS NOT NULL AND (fe - f) // 86400 <= 7
                    THEN 1 ELSE 0 END AS obs
        FROM u
    ), risk AS (
        SELECT duration,
               CAST(SUM(obs) AS BIGINT) AS n_event,
               CAST(SUM(1 - obs) AS BIGINT) AS n_censored
        FROM units GROUP BY duration
    ), t AS (
        SELECT duration, n_event, n_censored,
               CAST(SUM(n_event + n_censored) OVER ()
                    - COALESCE(SUM(n_event + n_censored) OVER (
                          ORDER BY duration
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk
        FROM risk
    ), s AS (
        SELECT duration, n_risk, n_event, n_censored,
               -- grid-snapped log terms sum as exact DECIMAL(38,9)
               -- (order-independent), mirroring the Spark side's
               -- bucketed-prefix decimal sums
               CAST(CASE WHEN n_event > 0 AND n_event < n_risk
                         THEN round(ln(1.0 - CAST(n_event AS DOUBLE)
                                           / CAST(n_risk AS DOUBLE)), 9)
                         ELSE 0.0 END AS DECIMAL(38,9)) AS term,
               MAX(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END) OVER (
                   ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeroed
        FROM t
    )
    SELECT duration, n_risk, n_event, n_censored,
           CASE WHEN zeroed = 1 THEN 0.0
                ELSE round(exp(CAST(SUM(term) OVER (
                         ORDER BY duration
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE)), 9)
           END AS survival_r
    FROM s ORDER BY duration
    """,
)
def survival_km_users(spark, sf_dir):
    """Kaplan–Meier time-to-event curve: days from each user's first event
    to their first 'signup', administratively right-CENSORED at a 7-day
    horizon (the textbook observation-window design — users who sign up
    later, or never, are censored at day 7, not dropped or miscounted as
    events; that censoring bias is what the KM estimator exists to
    remove). See ``operators.timeseries.kaplan_meier``."""
    from artigraph_spark.operators.timeseries import kaplan_meier

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    u = e.groupBy("user_id").agg(
        F.unix_timestamp(F.min("ts")).alias("__f"),
        F.unix_timestamp(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
        ).alias("__fe"),
    )
    d = F.expr("(__fe - __f) div 86400")
    observed = F.col("__fe").isNotNull() & (d <= 7)
    units = u.select(
        F.when(observed, d).otherwise(F.lit(7)).alias("duration"),
        F.when(observed, 1).otherwise(0).alias("obs"),
    )
    return kaplan_meier(units, "duration", "obs")


@query(
    "survival_km_by_first_event",
    oracle="""
    WITH r AS (
        SELECT user_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE ts IS NOT NULL
    ), u AS (
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS f,
               CAST(floor(epoch(min(CASE WHEN event_type = 'signup'
                                         THEN ts END))) AS BIGINT) AS fe,
               min(CASE WHEN rn = 1 THEN event_type END) AS cohort
        FROM r GROUP BY user_id
    ), units AS (
        SELECT cohort,
               CASE WHEN fe IS NOT NULL AND (fe - f) // 86400 <= 7
                    THEN (fe - f) // 86400 ELSE 7 END AS duration,
               CASE WHEN fe IS NOT NULL AND (fe - f) // 86400 <= 7
                    THEN 1 ELSE 0 END AS obs
        FROM u
    ), risk AS (
        SELECT cohort, duration,
               CAST(SUM(obs) AS BIGINT) AS n_event,
               CAST(SUM(1 - obs) AS BIGINT) AS n_censored
        FROM units GROUP BY cohort, duration
    ), t AS (
        SELECT cohort, duration, n_event, n_censored,
               CAST(SUM(n_event + n_censored) OVER (PARTITION BY cohort)
                    - COALESCE(SUM(n_event + n_censored) OVER (
                          PARTITION BY cohort ORDER BY duration
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk
        FROM risk
    ), s AS (
        SELECT cohort, duration, n_risk, n_event, n_censored,
               CAST(CASE WHEN n_event > 0 AND n_event < n_risk
                         THEN round(ln(1.0 - CAST(n_event AS DOUBLE)
                                           / CAST(n_risk AS DOUBLE)), 9)
                         ELSE 0.0 END AS DECIMAL(38,9)) AS term,
               MAX(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END) OVER (
                   PARTITION BY cohort ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeroed
        FROM t
    )
    SELECT cohort, duration, n_risk, n_event, n_censored,
           CASE WHEN zeroed = 1 THEN 0.0
                ELSE round(exp(CAST(SUM(term) OVER (
                         PARTITION BY cohort ORDER BY duration
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE)), 9)
           END AS survival_r
    FROM s ORDER BY cohort, duration
    """,
)
def survival_km_by_first_event(spark, sf_dir):
    """Cohorted Kaplan–Meier: the signup-conversion curve of
    ``survival_km_users`` computed PER ACQUISITION COHORT — the user's
    first event type, a deterministic (ts, event_id)-ordered pick — so
    channels can be compared on conversion speed with censoring handled
    correctly per cohort. One user-keyed window shuffle derives the
    cohort; the per-user aggregate reuses its partitioning (no second
    exchange). See ``operators.timeseries.kaplan_meier(group_cols=)``."""
    from pyspark.sql import Window

    from artigraph_spark.operators.timeseries import kaplan_meier

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    u = (
        e.withColumn("__rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("__f"),
            F.unix_timestamp(
                F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
            ).alias("__fe"),
            F.min(F.when(F.col("__rn") == 1, F.col("event_type"))).alias("cohort"),
        )
    )
    d = F.expr("(__fe - __f) div 86400")
    observed = F.col("__fe").isNotNull() & (d <= 7)
    units = u.select(
        "cohort",
        F.when(observed, d).otherwise(F.lit(7)).alias("duration"),
        F.when(observed, 1).otherwise(0).alias("obs"),
    )
    return kaplan_meier(units, "duration", "obs", group_cols=["cohort"])


@query(
    "rmst_signup_by_cohort",
    oracle="""
    WITH r AS (
        SELECT user_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE ts IS NOT NULL
    ), u AS (
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS f,
               CAST(floor(epoch(min(CASE WHEN event_type = 'signup'
                                         THEN ts END))) AS BIGINT) AS fe,
               min(CASE WHEN rn = 1 THEN event_type END) AS cohort
        FROM r GROUP BY user_id
    ), units AS (
        SELECT cohort,
               CASE WHEN fe IS NOT NULL AND (fe - f) // 86400 <= 7
                    THEN (fe - f) // 86400 ELSE 7 END AS duration,
               CASE WHEN fe IS NOT NULL AND (fe - f) // 86400 <= 7
                    THEN 1 ELSE 0 END AS obs
        FROM u
    ), risk AS (
        SELECT cohort, duration,
               CAST(SUM(obs) AS BIGINT) AS n_event,
               CAST(SUM(1 - obs) AS BIGINT) AS n_censored
        FROM units GROUP BY cohort, duration
    ), t AS (
        SELECT cohort, duration, n_event, n_censored,
               CAST(SUM(n_event + n_censored) OVER (PARTITION BY cohort)
                    - COALESCE(SUM(n_event + n_censored) OVER (
                          PARTITION BY cohort ORDER BY duration
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk
        FROM risk
    ), s AS (
        SELECT cohort, duration, n_risk, n_event,
               CAST(CASE WHEN n_event > 0 AND n_event < n_risk
                         THEN round(ln(1.0 - CAST(n_event AS DOUBLE)
                                           / CAST(n_risk AS DOUBLE)), 9)
                         ELSE 0.0 END AS DECIMAL(38,9)) AS term,
               MAX(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END) OVER (
                   PARTITION BY cohort ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeroed
        FROM t
    ), curve AS (
        SELECT cohort, duration,
               CASE WHEN zeroed = 1 THEN 0.0
                    ELSE round(exp(CAST(SUM(term) OVER (
                             PARTITION BY cohort ORDER BY duration
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS DOUBLE)), 9)
               END AS survival_r
        FROM s
    ), segs AS (
        SELECT cohort,
               CAST(round(survival_r, 9) AS DECIMAL(10,9)) AS sv,
               CAST(least(coalesce(lead(duration) OVER (
                        PARTITION BY cohort ORDER BY duration), 7), 7)
                    - least(duration, 7) AS DECIMAL(18,0)) AS w
        FROM curve
        UNION ALL
        SELECT cohort, CAST(1.0 AS DECIMAL(10,9)),
               CAST(least(min(duration), 7) AS DECIMAL(18,0))
        FROM curve GROUP BY cohort
    )
    SELECT cohort, CAST(7 AS BIGINT) AS horizon,
           round(CAST(SUM(sv * w) AS DOUBLE), 9) AS rmst_r
    FROM segs GROUP BY cohort ORDER BY cohort
    """,
)
def rmst_signup_by_cohort(spark, sf_dir):
    """Restricted mean signup time per acquisition cohort: the area
    under each cohort's Kaplan–Meier conversion curve up to the 7-day
    horizon — "average signup-free days in the first week", the
    single-number effect size that completes the survival trio
    (curve → RMST → log-rank p). See
    ``operators.timeseries.restricted_mean_survival``."""
    from pyspark.sql import Window

    from artigraph_spark.operators.timeseries import (
        kaplan_meier,
        restricted_mean_survival,
    )

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    u = (
        e.withColumn("__rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("__f"),
            F.unix_timestamp(
                F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
            ).alias("__fe"),
            F.min(F.when(F.col("__rn") == 1, F.col("event_type"))).alias("cohort"),
        )
    )
    d = F.expr("(__fe - __f) div 86400")
    observed = F.col("__fe").isNotNull() & (d <= 7)
    units = u.select(
        "cohort",
        F.when(observed, d).otherwise(F.lit(7)).alias("duration"),
        F.when(observed, 1).otherwise(0).alias("obs"),
    )
    curve = kaplan_meier(units, "duration", "obs", group_cols=["cohort"])
    return restricted_mean_survival(
        curve, "duration", "survival_r", 7, group_cols=["cohort"]
    ).orderBy("cohort")


def _logrank_oracle_sql() -> str:
    from artigraph_spark.functions import oracle_phi

    phi = oracle_phi("abs(z_r)")
    return f"""
    WITH r AS (
        SELECT user_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE ts IS NOT NULL
    ), u AS (
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS f,
               CAST(floor(epoch(min(CASE WHEN event_type = 'signup'
                                         THEN ts END))) AS BIGINT) AS fe,
               CASE WHEN min(CASE WHEN rn = 1 THEN event_type END) = 'click'
                    THEN 1 ELSE 0 END AS grp
        FROM r GROUP BY user_id
    ), units AS (
        SELECT grp,
               CASE WHEN fe IS NOT NULL AND (fe - f) // 86400 <= 7
                    THEN (fe - f) // 86400 ELSE 7 END AS duration,
               CASE WHEN fe IS NOT NULL AND (fe - f) // 86400 <= 7
                    THEN 1 ELSE 0 END AS obs
        FROM u
    ), risk AS (
        SELECT duration,
               CAST(SUM(obs) AS BIGINT) AS d,
               CAST(SUM(grp) AS BIGINT) AS x1,
               CAST(SUM(CASE WHEN grp = 1 AND obs = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d1,
               CAST(count(*) AS BIGINT) AS x
        FROM units GROUP BY duration
    ), t AS (
        SELECT *,
               CAST(SUM(x1) OVER ()
                    - COALESCE(SUM(x1) OVER (ORDER BY duration
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n1,
               CAST(SUM(x) OVER ()
                    - COALESCE(SUM(x) OVER (ORDER BY duration
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n
        FROM risk
    ), terms AS (
        SELECT d1, x1, x,
               CAST(CASE WHEN d > 0 THEN round(
                   CAST(CAST(n1 AS HUGEINT) * CAST(d AS HUGEINT) AS DOUBLE)
                   / CAST(n AS DOUBLE), 9) ELSE 0.0 END
                   AS DECIMAL(38,9)) AS e,
               CAST(CASE WHEN d > 0 AND n > 1 THEN round(
                   CAST(CAST(d AS HUGEINT) * CAST(n1 AS HUGEINT)
                        * CAST(n - n1 AS HUGEINT) * CAST(n - d AS HUGEINT)
                        AS DOUBLE)
                   / CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                          * CAST(n - 1 AS HUGEINT) AS DOUBLE), 9)
                   ELSE 0.0 END AS DECIMAL(38,9)) AS v
        FROM t
    ), agg AS (
        SELECT CAST(COALESCE(SUM(x1), 0) AS BIGINT) AS n_treat,
               CAST(COALESCE(SUM(x), 0) - COALESCE(SUM(x1), 0)
                    AS BIGINT) AS n_control,
               CAST(COALESCE(SUM(d1), 0) AS BIGINT) AS o1,
               round(CAST(COALESCE(SUM(e), 0) AS DOUBLE), 9) AS e1_r,
               round(CAST(COALESCE(SUM(v), 0) AS DOUBLE), 9) AS v_r
        FROM terms
    ), zt AS (
        SELECT *,
               CASE WHEN v_r > 0
                    THEN round((CAST(o1 AS DOUBLE) - e1_r) / sqrt(v_r), 9)
               END AS z_r
        FROM agg
    )
    SELECT n_treat, n_control, o1, e1_r, v_r, z_r,
           CASE WHEN z_r IS NOT NULL
                THEN round(2.0 * (1.0 - {phi}), 9) END AS p_r
    FROM zt
    """


@query("logrank_click_vs_rest", oracle=_logrank_oracle_sql())
def logrank_click_vs_rest(spark, sf_dir):
    """Log-rank (Mantel–Cox) test of the signup-conversion curves:
    users acquired via a first 'click' event vs everyone else — is the
    click cohort's time-to-signup curve genuinely different, censoring
    handled correctly on both sides? The significance readout for
    ``survival_km_by_first_event``'s curve comparison. See
    ``operators.timeseries.logrank_test``."""
    from pyspark.sql import Window

    from artigraph_spark.operators.timeseries import logrank_test

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    u = (
        e.withColumn("__rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("__f"),
            F.unix_timestamp(
                F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
            ).alias("__fe"),
            F.min(F.when(F.col("__rn") == 1, F.col("event_type"))).alias("__first"),
        )
    )
    d = F.expr("(__fe - __f) div 86400")
    observed = F.col("__fe").isNotNull() & (d <= 7)
    units = u.select(
        F.when(F.col("__first") == "click", 1).otherwise(0).alias("grp"),
        F.when(observed, d).otherwise(F.lit(7)).alias("duration"),
        F.when(observed, 1).otherwise(0).alias("obs"),
    )
    return logrank_test(units, "duration", "obs", "grp")


@query(
    "theil_sen_daily",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
                    AS DOUBLE) AS x,
               CAST(count(*) AS DOUBLE) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ), pairs AS (
        SELECT a.event_type, a.x AS xa, b.x AS xb,
               round((b.y - a.y) / (b.x - a.x), 9) AS sl
        FROM s a JOIN s b ON a.event_type = b.event_type AND a.x < b.x
    ), ranked AS (
        SELECT event_type, sl,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY sl, xa, xb) AS rn,
               count(*) OVER (PARTITION BY event_type) AS np
        FROM pairs
    ), med AS (
        SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
               round(avg(sl), 9) AS slope_r
        FROM ranked
        WHERE rn = CAST(floor((np + 1) / 2.0) AS BIGINT)
           OR rn = CAST(ceil((np + 1) / 2.0) AS BIGINT)
        GROUP BY event_type
    ), pts AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
        FROM s GROUP BY event_type
    )
    SELECT p.event_type, p.n_points,
           COALESCE(m.n_pairs, 0) AS n_pairs, m.slope_r
    FROM pts p LEFT JOIN med m USING (event_type)
    """,
)
def theil_sen_daily(spark, sf_dir):
    """Theil–Sen robust trend slope of the daily event count per event
    type — the median-of-pairwise-slopes estimator that one spiked day
    cannot drag (trend_slopes_hourly's OLS sibling, 29% breakdown
    point). The pair enumeration runs over the SUMMARY series (≤30
    points per group), never raw rows. See
    ``operators.timeseries.theil_sen_slopes``."""
    from artigraph_spark.operators.timeseries import theil_sen_slopes

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    s = e.groupBy(
        "event_type",
        F.expr("unix_timestamp(date_trunc('day', ts)) div 86400")
        .cast("double")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    return theil_sen_slopes(s, "event_type", "x", "y")


@query(
    "stl_outliers_daily",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_s,
               CAST(count(*) AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ), t AS (
        SELECT day_s, y,
               CASE WHEN count(*) OVER w = 7
                    THEN CAST(SUM(y) OVER w AS BIGINT) END AS ts7,
               CAST((((day_s // 86400) % 7) + 7) % 7 AS INTEGER) AS phase
        FROM daily
        WINDOW w AS (ORDER BY day_s ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), d AS (
        SELECT day_s, y, phase, ts7, 7 * y - ts7 AS det7
        FROM t WHERE ts7 IS NOT NULL
    ), s AS (
        SELECT phase, {oracle_davg('det7')} AS s7 FROM d GROUP BY phase
    ), g AS (
        SELECT {oracle_davg('round(s7, 9)')} AS s7bar FROM s
    ), dec AS (
        SELECT d.day_s, d.y,
               round(CAST(d.y AS DOUBLE) - CAST(d.ts7 AS DOUBLE) / 7.0
                     - round((s.s7 - g.s7bar) / 7.0, 9), 9) AS resid_r
        FROM d JOIN s USING (phase) CROSS JOIN g
    ), rr AS (
        SELECT day_s, y, resid_r,
               row_number() OVER (ORDER BY resid_r, day_s) AS rn,
               count(*) OVER () AS n
        FROM dec
    ), med AS (
        SELECT round(avg(resid_r), 9) AS m FROM rr
        WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
           OR rn = CAST(ceil((n + 1) / 2.0) AS BIGINT)
    ), dev AS (
        SELECT day_s, y, resid_r,
               round(abs(resid_r - (SELECT m FROM med)), 9) AS abs_dev_r
        FROM dec
    ), dr AS (
        SELECT day_s, y, resid_r, abs_dev_r,
               row_number() OVER (ORDER BY abs_dev_r, day_s) AS rn,
               count(*) OVER () AS n
        FROM dev
    ), mad AS (
        SELECT round(avg(abs_dev_r), 9) AS mad FROM dr
        WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
           OR rn = CAST(ceil((n + 1) / 2.0) AS BIGINT)
    )
    SELECT day_s, y, resid_r, abs_dev_r,
           CAST(CASE WHEN abs_dev_r > 3.0 * 1.4826 * (SELECT mad FROM mad)
                     THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM dev
    """,
)
def stl_outliers_daily(spark, sf_dir):
    """Seasonal-residual anomaly flags: classical decomposition of the
    daily event series (trend + weekly seasonal removed), then robust
    median/MAD outlier detection on the RESIDUALS — the decomposition-
    based anomaly pattern that survives both trends and weekly cycles
    where a raw z-score flags every Saturday. Medians are exact
    avg-of-middle order statistics over the summary-sized series (the
    theil_sen convention); the flag threshold is the standard
    3·1.4826·MAD. Composes ``operators.timeseries.seasonal_decompose``;
    zero-MAD series flag any deviation (robust_outliers convention)."""
    from pyspark.sql import Window

    from artigraph_spark.operators.timeseries import seasonal_decompose

    e = load(spark, sf_dir, "events")
    # r15: the decomposed frame feeds 3 branches (median filter, the
    # deviation frame, the final flags) — one scale-adaptive
    # materialization of the whole decomposition instead of 3
    # derivations (no-op below the reuse threshold).
    dec = seasonal_decompose(e, "ts", period=7, reuse_output=True).select(
        "day_s", "y", "resid_r"
    )

    def _exact_median(df, value_col, out_name):
        wo = Window.orderBy(F.col(value_col), F.col("day_s"))
        wg = Window.partitionBy()
        ranked = df.select(
            F.col(value_col),
            F.row_number().over(wo).alias("__rn"),
            F.count(F.lit(1)).over(wg).alias("__n"),
        )
        mid = (F.col("__n") + 1) / F.lit(2.0)
        return ranked.filter(
            (F.col("__rn") == F.floor(mid)) | (F.col("__rn") == F.ceil(mid))
        ).agg(F.round(F.avg(value_col), 9).alias(out_name))

    med = _exact_median(dec, "resid_r", "__m")
    dev = dec.crossJoin(F.broadcast(med)).select(
        "day_s",
        "y",
        "resid_r",
        F.round(F.abs(F.col("resid_r") - F.col("__m")), 9).alias("abs_dev_r"),
    )
    mad = _exact_median(dev, "abs_dev_r", "__mad")
    return dev.crossJoin(F.broadcast(mad)).select(
        "day_s",
        "y",
        "resid_r",
        "abs_dev_r",
        (F.col("abs_dev_r") > F.lit(3.0) * F.lit(1.4826) * F.col("__mad"))
        .cast("bigint")
        .alias("is_outlier"),
    )


def _markov_stationary_oracle(iterations: int, bits: int, pbits: int) -> str:
    """DuckDB replica of the fixed-point stationary-distribution loop
    (operators/timeseries.py `markov_stationary`): quantized transition
    matrix, one CTE per iteration (π is referenced once per level, so
    plain CTEs stay linear — no MATERIALIZED needed)."""
    one_b = float(1 << bits)
    one_p = float(1 << pbits)
    parts = [
        f"""
    WITH seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND event_type IS NOT NULL
    ), c AS (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ), p AS (
        SELECT src, dst,
               CAST(floor(CAST(n AS DOUBLE) * {one_p!r}
                   / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE))
                   AS BIGINT) AS pfx
        FROM c
    ), ns AS (
        SELECT CAST(count(DISTINCT src) AS BIGINT) AS k FROM p
    ), pi0 AS (
        SELECT DISTINCT src AS state,
               CAST(floor({one_b!r} / (SELECT k FROM ns)) AS BIGINT) AS pi
        FROM p
    )"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f""", pi{t} AS (
        SELECT p.dst AS state,
               CAST(SUM(CAST(floor(CAST(pi{t - 1}.pi * p.pfx AS DOUBLE)
                   / {one_p!r}) AS BIGINT)) AS BIGINT) AS pi
        FROM p JOIN pi{t - 1} ON pi{t - 1}.state = p.src
        GROUP BY p.dst
    )"""
        )
    parts.append(f"""
    SELECT state, pi AS pi_fx FROM pi{iterations}""")
    return "".join(parts)


@query("markov_stationary_events", oracle=_markov_stationary_oracle(16, 30, 20))
def markov_stationary_events(spark, sf_dir):
    """Stationary distribution of the per-user event-type Markov chain —
    long-run occupancy per state by fixed-point power iteration over the
    quantized transition matrix; the summary event_transitions only
    implies. Bit-replayed in the unrolled-CTE oracle. See
    ``operators.timeseries.markov_stationary``."""
    from artigraph_spark.operators.timeseries import markov_stationary

    e = load(spark, sf_dir, "events")
    return markov_stationary(
        e, "user_id", "ts", "event_type", "event_id", iterations=16
    )
