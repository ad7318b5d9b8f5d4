"""Data formats (parity with /root/reference/src/arti/formats/: json, pickle;
plus the columnar formats a Spark engine actually runs on: parquet, csv).
A Format is metadata — IO handlers in artigraph_spark.io do the work.
"""

from __future__ import annotations

from typing import ClassVar

from artigraph_spark.internal.models import Model


class Format(Model):
    extension: ClassVar[str] = ""


class Parquet(Format):
    extension: ClassVar[str] = ".parquet"


class JSON(Format):
    extension: ClassVar[str] = ".json"


class CSV(Format):
    extension: ClassVar[str] = ".csv"
    header: bool = True


class ORC(Format):
    """Columnar ORC — Spark-native (predicate pushdown + column pruning like
    parquet); useful for interop with Hive-era warehouses."""

    extension: ClassVar[str] = ".orc"


class Text(Format):
    """Raw line-oriented text — one row per line, exactly one string column.

    The corpus interchange format for LLM pipelines (one doc or one line per
    row); splittable on read, so giant dumps still parallelize."""

    extension: ClassVar[str] = ".txt"


class Pickle(Format):
    extension: ClassVar[str] = ".pickle"


class Delta(Format):
    """Delta Lake format — gives atomic overwrite + time travel for the
    memoization layer on a real deployment. The delta-spark jars are not in
    this environment; the IO handler raises a clear error until they are
    (import-try gate, per the environment contract)."""

    extension: ClassVar[str] = ""
