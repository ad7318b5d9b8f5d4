"""Table loading for the synthetic fixture star schema.

At 100 TB each ``load`` is a plain parquet scan: Catalyst handles
predicate pushdown / column pruning / partition pruning; nothing here
materializes. ``BROADCAST_TABLES`` marks the dimension tables that stay
broadcast-sized at every scale factor (region/nation/supplier are fixed
or near-fixed cardinality in TPC-H-style scaling).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

# Serializes the nanosAsLong set→resolve→restore window in load("events")
# against concurrent loads (the threaded executor may load in parallel).
_NANOS_LOCK = threading.Lock()

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions safe to broadcast at any SF (bounded cardinality).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Oracle comparability must not depend on the caller's session config:
    # timestamp formatting/epoch functions are session-timezone-sensitive.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The fixture events.ts is parquet TIMESTAMP(NANOS), which Spark has
        # no native type for: read the raw int64 nanos and truncate to
        # microsecond TimestampType (documented-lossy ns bridge, SURVEY §1.2
        # Timestamp). Derived copies written by Spark already carry a real
        # timestamp — only convert when the column actually reads as long.
        # The legacy flag is scoped to THIS read (set → resolve → restore,
        # under a lock against concurrent loads): the schema is captured at
        # resolution, so later execution doesn't need the flag, and leaving
        # it set would silently retype nanosecond columns in every
        # unrelated parquet read for the rest of the session.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        flag = "spark.sql.legacy.parquet.nanosAsLong"
        with _NANOS_LOCK:
            try:
                prev = spark.conf.get(flag)
            except Exception:
                prev = None
            spark.conf.set(flag, "true")
            try:
                df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
                df.schema  # force resolution while the flag is in effect
            finally:
                if prev is None:
                    spark.conf.unset(flag)
                else:
                    spark.conf.set(flag, prev)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    # Plain scan, no up-front repartition: an injected "parallelism floor"
    # repartition was measured 2.5x SLOWER end-to-end at sf0.01/sf0.1 (the
    # extra full-table exchange dwarfs any scan-parallelism gain on local
    # fixtures), and at 100 TB real inputs have thousands of splittable row
    # groups so the floor would never fire. Let Catalyst/AQE own parallelism.
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}
