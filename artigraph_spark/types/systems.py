"""Registered TypeSystem instances wiring the functional bridges into the
priority-ordered adapter registry (reference architecture:
/root/reference/src/arti/types/__init__.py:284-391 — priorities resolve
overlapping adapters, ``extends`` delegates to parent systems — e.g. the
pandas system in .pandas extends the numpy system in .numpy)."""

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


# The pandas system (Series/DataFrame/dtype adapters, extends numpy + arrow)
# lives in artigraph_spark.types.pandas; the numpy system in .numpy; the
# pydantic system in .pydantic. They import the parents defined here, so
# they are separate modules rather than re-exports (no import cycles).
