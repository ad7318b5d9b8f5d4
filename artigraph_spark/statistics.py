"""Statistics & Thresholds — implemented for real.

The reference ships these as stubs (commented-out Count/CountDistinct/
Min/Max/Sum in /root/reference/src/arti/statistics/__init__.py:17-33,
``Threshold.check`` NotImplemented in thresholds/__init__.py:11-15, and a
TODO hook in the executor, executors/local.py:26-29). Here each Statistic is
a Catalyst aggregate Column; all statistics for an artifact are evaluated in
ONE distributed agg pass (a single job over the output partition), and
Thresholds gate the build exactly at the reference's hook point.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from artigraph_spark.internal.models import Model


class Threshold(Model):
    def check(self, value: Any) -> bool:
        raise NotImplementedError

    def describe(self) -> str:
        return type(self).__name__


class RangeThreshold(Threshold):
    lo: float | None = None
    hi: float | None = None

    def check(self, value: Any) -> bool:
        if value is None:
            return False
        if self.lo is not None and value < self.lo:
            return False
        if self.hi is not None and value > self.hi:
            return False
        return True

    def describe(self) -> str:
        return f"in [{self.lo}, {self.hi}]"


class EqualsThreshold(Threshold):
    expected: Any

    def check(self, value: Any) -> bool:
        return value == self.expected

    def describe(self) -> str:
        return f"== {self.expected!r}"


class NotNullThreshold(Threshold):
    def check(self, value: Any) -> bool:
        return value is not None


class Statistic(Model):
    """A named aggregate over an output Collection, optionally thresholded."""

    column: str | None = None
    threshold: Threshold | None = None

    @property
    def key(self) -> str:
        return f"{type(self).__name__}({self.column or '*'})"

    def expr(self) -> Column:
        raise NotImplementedError


class Count(Statistic):
    def expr(self) -> Column:
        return F.count("*" if self.column is None else self.column)


class CountDistinct(Statistic):
    def expr(self) -> Column:
        return F.countDistinct(self.column)


class ApproxCountDistinct(Statistic):
    """HLL sketch — the 100 TB-friendly distinct count."""

    rsd: float = 0.05

    def expr(self) -> Column:
        return F.approx_count_distinct(self.column, self.rsd)


class Min(Statistic):
    def expr(self) -> Column:
        return F.min(self.column)


class Max(Statistic):
    def expr(self) -> Column:
        return F.max(self.column)


class Sum(Statistic):
    def expr(self) -> Column:
        return F.sum(self.column)


class Mean(Statistic):
    def expr(self) -> Column:
        return F.avg(self.column)


class NullCount(Statistic):
    def expr(self) -> Column:
        return F.count(F.when(F.col(self.column).isNull(), 1))


class RangeViolations(Statistic):
    """Engine-level range CHECK: counts rows whose column is NULL or
    outside [lo, hi] — the build-gating twin of the quality suite's
    ``in_range`` check (operators/quality.py). Pair with
    EqualsThreshold(0) to abort a build on any violation; unlike a
    Min/Max + RangeThreshold pair this counts HOW MANY rows violate and
    treats NULLs as violations."""

    lo: float | None = None
    hi: float | None = None

    def expr(self) -> Column:
        c = F.col(self.column)
        cond = c.isNull()
        if self.lo is not None:
            cond = cond | (c < self.lo)
        if self.hi is not None:
            cond = cond | (c > self.hi)
        return F.count(F.when(cond, 1))


class EnumViolations(Statistic):
    """Engine-level CHECK for Enum-typed columns (Spark has no enum type):
    counts values outside the allowed set, NULL included (NULL is not an
    enum member; without the isNull arm three-valued logic would make
    ``~isin`` evaluate NULL → count skips it → an all-NULL partition
    passes an EqualsThreshold(0) gate). Pair with EqualsThreshold(0)."""

    items: tuple[Any, ...] = ()

    def expr(self) -> Column:
        c = F.col(self.column)
        return F.count(F.when(c.isNull() | ~c.isin(list(self.items)), 1))


class StatisticsResult(Model):
    values: dict[str, Any]
    failures: tuple[str, ...] = ()

    @property
    def ok(self) -> bool:
        return not self.failures


def evaluate(df: DataFrame, statistics: tuple[Statistic, ...]) -> StatisticsResult:
    """Evaluate every statistic in one aggregate pass and apply thresholds."""
    if not statistics:
        return StatisticsResult(values={})
    row = df.agg(*[s.expr().alias(f"s{i}") for i, s in enumerate(statistics)]).collect()[0]
    values: dict[str, Any] = {}
    failures: list[str] = []
    for i, s in enumerate(statistics):
        v = row[f"s{i}"]
        values[s.key] = v
        if s.threshold is not None and not s.threshold.check(v):
            failures.append(f"{s.key}={v!r} violates {s.threshold.describe()}")
    return StatisticsResult(values=values, failures=tuple(failures))
