"""Bucketed tables: pre-shuffled storage layout for repeat joins/aggs.

At 100 TB, the dominant cost of a fact-fact join is the shuffle. Bucketing
both sides by the join key at WRITE time (``bucketBy`` + ``saveAsTable``)
lets every subsequent join/aggregation on that key run with ZERO exchanges —
the shuffle is paid once, at ingest. This is the storage-layout analogue of
the Collection's cluster_by and the engine's recommendation for the
lineitem⋈orders class of joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str | list[str],
    num_buckets: int,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) table; ``path`` makes it an
    external table at that location (warehouse.dir is a static conf, so
    explicit paths are the flexible deployment choice)."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(num_buckets, *cols)
    if sort_by:
        sort_cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — Catalyst sees the matching hash
    distributions and plans a sort-merge join with no Exchange on either
    side (verify with .explain / tests/test_bucketing.py)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
