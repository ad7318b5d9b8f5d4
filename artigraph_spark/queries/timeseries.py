"""Time-window queries: tumbling/sliding/session windows as deterministic
batch equivalents of the streaming extension (SURVEY §2 — the reference is
batch-only; these define parity between our batch and streaming paths).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from artigraph_spark.functions import dsum
from artigraph_spark.queries import query
from artigraph_spark.sources import load


@query(
    "window_tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           CAST(SUM(CAST(floor(value * 1048576.0) AS BIGINT)) AS DOUBLE) / 1048576.0 AS total_value
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
            dsum("value").alias("total_value"),
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
           CAST(SUM(CAST(floor(value * 1048576.0) AS BIGINT)) AS DOUBLE) / 1048576.0 AS total_value
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
            dsum("value").alias("total_value"),
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
                    WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800 THEN 1
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
           CAST(SUM(CAST(floor(value * 1048576.0) AS BIGINT)) AS DOUBLE) / 1048576.0 AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def window_session(spark, sf_dir):
    """Sessionization with a 30-minute inactivity gap (batch; streaming twin
    is F.session_window). Integer gap arithmetic → engine-exact."""
    from artigraph_spark.operators.windows import sessionize

    e = load(spark, sf_dir, "events")
    sess = sessionize(e, "user_id", "ts", 1800, tiebreak=["event_id"])
    return sess.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
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
