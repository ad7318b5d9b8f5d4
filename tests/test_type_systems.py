"""TypeSystem registry: priority ordering, extends delegation (mirrors the
reference's adapter suites)."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import types as T

from artigraph_spark import types as at
from artigraph_spark.types import TypeAdapter, TypeSystem
from artigraph_spark.types.pandas import pandas_type_system
from artigraph_spark.types.systems import (
    arrow_type_system,
    python_type_system,
    spark_type_system,
)


def test_spark_system_round_trip():
    assert spark_type_system.to_system(at.Int32()) == T.IntegerType()
    assert spark_type_system.to_artigraph(T.DoubleType()) == at.Float64()


def test_python_system():
    assert python_type_system.to_artigraph(int) == at.Int64(nullable=False)
    assert python_type_system.to_system(at.String(nullable=False)) is str


def test_arrow_system():
    assert arrow_type_system.to_system(at.Float32()) == pa.float32()
    assert arrow_type_system.to_artigraph(pa.int16()) == at.Int16()


def test_pandas_extends_arrow():
    # dtype handled locally
    assert pandas_type_system.to_artigraph(np.dtype("uint16")) == at.UInt16()
    assert pandas_type_system.to_system(at.Float64()) == np.dtype("float64")
    # not a dtype -> falls through to the arrow parent
    assert pandas_type_system.to_artigraph(pa.string()) == at.String()


def test_priority_overrides():
    system = TypeSystem("custom")

    @system.register_adapter
    class Low(TypeAdapter):
        artigraph = at.Int64
        priority = 0

        @classmethod
        def matches_system(cls, type_, *, hints):
            return type_ == "int"

        @classmethod
        def to_system(cls, type_, *, hints):
            return "low"

        @classmethod
        def to_artigraph(cls, type_, *, hints):
            return at.Int64()

    @system.register_adapter
    class High(Low):
        priority = 10

        @classmethod
        def to_system(cls, type_, *, hints):
            return "high"

    assert system.to_system(at.Int64()) == "high"


def test_unknown_raises():
    with pytest.raises(NotImplementedError):
        arrow_type_system.to_artigraph("not-a-type")
