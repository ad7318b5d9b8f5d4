"""Incremental sketch maintenance end-to-end: a bounded event stream is
consumed micro-batch by micro-batch through ``streaming.sketch_state_sink``,
maintaining TWO persisted mergeable-sketch states —

  - per-event-type count-min cells (grouped CMS: merge = sum), and
  - per-hour HyperLogLog registers (grouped HLL: merge = per-register max)

— and the answers read from the MAINTAINED STATE must equal the batch
answers computed from all data at once: per-type user frequencies from
the CMS, and trailing-24 h distinct users per hour from the hourly
registers (the sliding re-summarize of ``sliding_hll_estimates``, run
over stored state instead of data). That is the 100 TB ingest contract:
per-batch work is O(batch)+O(sketch), and history is never reprocessed.

Run: python examples/streaming_sketch_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from artigraph_spark.operators.sketches import (
    grouped_cms_estimate,
    grouped_count_min_sketch,
    grouped_hll_estimate,
    grouped_hll_sketch,
)
from artigraph_spark.session import get_spark
from artigraph_spark.sources import load
from artigraph_spark.streaming import read_sketch_state, sketch_state_sink

HOUR0 = 1704067200  # 2024-01-01 00:00:00 UTC


def hour_bucket(col):
    return F.floor((F.unix_timestamp(col) - F.lit(HOUR0)) / F.lit(3600.0)).cast(
        "long"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="streaming_sketch_")
    spark = get_spark("streaming_sketch_demo")

    # Split the fixture into 3 "arrival" files so the stream really runs
    # multiple micro-batches (maxFilesPerTrigger=1).
    events = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = f"{root}/arrivals"
    for part in range(3):
        events.filter(F.pmod(F.col("event_id"), F.lit(3)) == part).coalesce(
            1
        ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    cms_state = f"{root}/state_cms"
    q1 = sketch_state_sink(
        stream,
        build=lambda df: grouped_count_min_sketch(
            df, "event_type", "user_id", width=128, depth=4, seed=42
        ),
        merge=lambda df: df.groupBy("event_type", "depth_id", "bucket").agg(
            F.sum("cnt").alias("cnt")
        ),
        state_path=cms_state,
        checkpoint=f"{root}/ck_cms",
    )
    q1.processAllAvailable()
    q1.stop()

    hll_state = f"{root}/state_hll"
    q2 = sketch_state_sink(
        stream,
        build=lambda df: grouped_hll_sketch(
            df.select(hour_bucket(F.col("ts")).alias("hour"), "user_id"),
            "hour",
            "user_id",
            m=256,
            seed=11,
        ),
        merge=lambda df: df.groupBy("hour", "register").agg(
            F.max("max_rho").alias("max_rho")
        ),
        state_path=hll_state,
        checkpoint=f"{root}/ck_hll",
    )
    q2.processAllAvailable()
    q2.stop()

    # --- maintained state must equal batch recompute, exactly ---
    batch_events = spark.read.parquet(src)

    cms_stored = read_sketch_state(spark, cms_state)
    keys = batch_events.select("event_type", "user_id").distinct()
    est_stream = grouped_cms_estimate(
        cms_stored, keys, "event_type", "user_id", width=128, depth=4, seed=42
    )
    cms_batch = grouped_count_min_sketch(
        batch_events, "event_type", "user_id", width=128, depth=4, seed=42
    )
    est_batch = grouped_cms_estimate(
        cms_batch, keys, "event_type", "user_id", width=128, depth=4, seed=42
    )
    assert sorted(map(tuple, est_stream.collect())) == sorted(
        map(tuple, est_batch.collect())
    )

    hll_stored = read_sketch_state(spark, hll_state)
    # trailing-24h distinct per hour FROM STORED REGISTERS — the sliding
    # re-summarize without touching event data
    present = hll_stored.select(F.col("hour").alias("bucket")).distinct()
    merged = (
        hll_stored.select(
            F.explode(F.sequence(F.col("hour"), F.col("hour") + 23)).alias(
                "bucket"
            ),
            "register",
            "max_rho",
        )
        .join(present, "bucket", "left_semi")
        .groupBy("bucket", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    sliding_stream = grouped_hll_estimate(merged, "bucket", m=256)
    from artigraph_spark.operators.sketches import sliding_hll_estimates

    sliding_batch = sliding_hll_estimates(
        batch_events, hour_bucket(F.col("ts")), "user_id",
        window_buckets=24, m=256, seed=11,
    )
    got = sorted(map(tuple, sliding_stream.collect()))
    want = sorted(map(tuple, sliding_batch.collect()))
    assert got == want

    print(
        f"streaming sketch demo OK: {len(got)} sliding windows and "
        f"{est_stream.count()} (type, user) frequencies from maintained "
        f"state match batch recompute exactly ({root})"
    )


if __name__ == "__main__":
    main()
