"""Statistics/threshold gates (the reference's stubbed layer, implemented)."""

import os

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artigraph_spark import statistics as st
from artigraph_spark import types as at
from artigraph_spark.artifacts import Artifact
from artigraph_spark.backends import MemoryBackend
from artigraph_spark.executors import BuildError
from artigraph_spark.formats import JSON
from artigraph_spark.graphs import Graph
from artigraph_spark.producers import Producer
from artigraph_spark.storage import LocalFile


def test_evaluate_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, "a", 7.0)], ["k", "s", "v"]
    )
    res = st.evaluate(
        df,
        (
            st.Count(),
            st.CountDistinct(column="k"),
            st.Min(column="v"),
            st.Max(column="v"),
            st.Sum(column="v"),
            st.NullCount(column="v"),
            st.EnumViolations(column="s", items=("a",)),
        ),
    )
    assert res.values["Count(*)"] == 3
    assert res.values["CountDistinct(k)"] == 2
    assert res.values["Min(v)"] == 5.0
    assert res.values["Max(v)"] == 7.0
    assert res.values["Sum(v)"] == 12.0
    assert res.values["NullCount(v)"] == 1
    assert res.values["EnumViolations(s)"] == 1
    assert res.ok


def test_thresholds():
    assert st.RangeThreshold(lo=0, hi=10).check(5)
    assert not st.RangeThreshold(lo=0, hi=10).check(11)
    assert not st.RangeThreshold(lo=0).check(None)
    assert st.EqualsThreshold(expected=0).check(0)
    assert st.NotNullThreshold().check(1) and not st.NotNullThreshold().check(None)


NUM_TYPE = at.Collection(element=at.Struct(fields={"value": at.Int64()}))


class Nums(Artifact):
    pass


class PassThrough(Producer):
    nums: Nums

    def build(self, nums: DataFrame) -> DataFrame:
        return nums


def _graph(tmp_root, statistics):
    import json

    d = os.path.join(tmp_root, "g/nums/nums")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part-0.json"), "w") as f:
        f.write("\n".join(json.dumps({"value": v}) for v in [1, 2, 30]))
    with Graph("g", backend=MemoryBackend()) as g:
        g.artifacts.nums = Nums(type=NUM_TYPE, format=JSON(), storage=LocalFile(root=tmp_root))
        g.artifacts.out = PassThrough(nums=g.artifacts.nums).out(
            Artifact(type=NUM_TYPE, storage=LocalFile(root=tmp_root), statistics=statistics)
        )
    return g


def test_executor_gates_on_thresholds(tmp_root, spark):
    """The executor hook: statistics evaluated on the built output; threshold
    violation aborts the write (reference hook executors/local.py:26-29)."""
    ok_stats = (
        st.Count(threshold=st.RangeThreshold(lo=1)),
        st.Max(column="value", threshold=st.RangeThreshold(hi=100)),
    )
    g = _graph(tmp_root, ok_stats)
    g.build()  # passes

    bad_stats = (st.Max(column="value", threshold=st.RangeThreshold(hi=10)),)
    g2 = _graph(tmp_root, bad_stats)
    with pytest.raises(BuildError, match="Max\\(value\\)=30"):
        g2.build()


def test_range_violations_counts_and_gates(spark):
    from artigraph_spark import statistics as st

    df = spark.createDataFrame(
        [(1.0,), (5.0,), (11.0,), (None,)], "v double"
    )
    res = st.evaluate(
        df,
        (
            st.RangeViolations(
                column="v", lo=0.0, hi=10.0,
                threshold=st.EqualsThreshold(expected=0),
            ),
        ),
    )
    # 11.0 out of range + NULL → 2 violations, gate fails
    assert res.values["RangeViolations(v)"] == 2
    assert not res.ok
    clean = spark.createDataFrame([(1.0,), (5.0,)], "v double")
    assert st.evaluate(
        clean,
        (
            st.RangeViolations(
                column="v", lo=0.0, hi=10.0,
                threshold=st.EqualsThreshold(expected=0),
            ),
        ),
    ).ok


def test_enum_violations_counts_nulls(spark):
    """NULL is not an enum member: three-valued logic must not let an
    all-NULL column pass an EqualsThreshold(0) gate."""
    from artigraph_spark.statistics import EnumViolations, evaluate

    df = spark.createDataFrame(
        [("a",), (None,), ("z",), (None,)], "status string"
    )
    res = evaluate(df, (EnumViolations(column="status", items=("a", "b")),))
    (v,) = res.values.values()
    assert v == 3  # 'z' + two NULLs
