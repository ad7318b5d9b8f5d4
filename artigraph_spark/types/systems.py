"""Registered TypeSystem instances wiring the functional bridges into the
priority-ordered adapter registry (reference architecture:
/root/reference/src/arti/types/__init__.py:284-391 — priorities resolve
overlapping adapters, ``extends`` delegates to parent systems, e.g. pandas
extending numpy there, pandas extending arrow here)."""

from __future__ import annotations

from typing import Any

from artigraph_spark import types as at
from artigraph_spark.types import TypeAdapter, TypeSystem

# --- spark ------------------------------------------------------------------

spark_type_system = TypeSystem("spark")


@spark_type_system.register_adapter
class _SparkBridge(TypeAdapter):
    """Catch-all bridge delegating to the functional converters (which carry
    the lossy-type metadata round-trips)."""

    artigraph = at.Type
    priority = 0

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        from pyspark.sql import types as T

        return isinstance(type_, T.DataType)

    @classmethod
    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> at.Type:
        from artigraph_spark.types.spark import from_spark_type

        return from_spark_type(type_, meta=hints.get("meta"))

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        from artigraph_spark.types.spark import to_spark_type

        return to_spark_type(type_)


# --- python (annotation inference) ------------------------------------------

python_type_system = TypeSystem("python")


@python_type_system.register_adapter
class _PythonBridge(TypeAdapter):
    artigraph = at.Type
    priority = 0

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        return True  # annotations are arbitrary objects; conversion may raise

    @classmethod
    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> at.Type:
        from artigraph_spark.types.python import to_artigraph

        return to_artigraph(type_)

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        from artigraph_spark.types.python import to_python

        return to_python(type_)


# --- arrow ------------------------------------------------------------------

arrow_type_system = TypeSystem("arrow")


@arrow_type_system.register_adapter
class _ArrowBridge(TypeAdapter):
    artigraph = at.Type
    priority = 0

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        import pyarrow as pa

        return isinstance(type_, pa.DataType)

    @classmethod
    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> at.Type:
        from artigraph_spark.types.arrow import from_arrow

        return from_arrow(type_)

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        from artigraph_spark.types.arrow import to_arrow

        return to_arrow(type_)


# --- pandas (extends arrow — dtype strings resolve through arrow types) -----

pandas_type_system = TypeSystem("pandas", extends=(arrow_type_system,))


@pandas_type_system.register_adapter
class _PandasDtypeBridge(TypeAdapter):
    """numpy/pandas dtype → arti Type; anything it can't place falls through
    to the arrow parent system (the ``extends`` mechanism)."""

    artigraph = at.Type
    priority = 10

    _DTYPES = {
        "int8": at.Int8,
        "int16": at.Int16,
        "int32": at.Int32,
        "int64": at.Int64,
        "uint8": at.UInt8,
        "uint16": at.UInt16,
        "uint32": at.UInt32,
        "uint64": at.UInt64,
        "float16": at.Float16,
        "float32": at.Float32,
        "float64": at.Float64,
        "bool": at.Boolean,
        "object": at.String,
        "string": at.String,
    }

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        import numpy as np

        return isinstance(type_, np.dtype | str) and str(type_) in cls._DTYPES

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return type(type_) in {v: k for k, v in cls._DTYPES.items()} or any(
            isinstance(type_, c) for c in cls._DTYPES.values()
        )

    @classmethod
    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> at.Type:
        return cls._DTYPES[str(type_)]()

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        import numpy as np

        for name, t in cls._DTYPES.items():
            if type(type_) is t and name != "object":
                return np.dtype(name)
        raise NotImplementedError(f"no pandas dtype for {type_!r}")
