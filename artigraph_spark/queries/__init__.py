"""Declared query surface: every operator from SURVEY.md §2 Part B.

Each query is registered with a Spark callable ``(spark, sf_dir) -> DataFrame``
and (when SQL-expressible) a DuckDB oracle SQL string producing identical
columns/values. The driver hash-compares them at sf0.01.

Determinism contract (see FIXTURES.md):
  - aggregate doubles through DECIMAL(38,9) (order-independent) — helpers in
    :mod:`artigraph_spark.functions`;
  - totally order any LIMIT/top-k input;
  - no raw arrays/maps/timestamps in output — strings/scalars only;
  - column names aliased identically on both sides.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclasses.dataclass(frozen=True)
class QueryDef:
    name: str
    fn: SparkQuery
    oracle: str | None  # None → driver runs rows-only check
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None, bench: bool = False) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    _load_modules()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_modules()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


def bench_queries() -> dict[str, SparkQuery]:
    _load_modules()
    return {name: qd.fn for name, qd in REGISTRY.items() if qd.bench}


_LOADED = False


def _load_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side effects.
    from artigraph_spark.queries import (  # noqa: F401
        aggregates,
        extras,
        joins,
        llm,
        relational,
        setops,
        timeseries,
        windows,
    )

    _LOADED = True
