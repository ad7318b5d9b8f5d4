"""pandas Series / DataFrame ↔ arti Types.

Parity with the reference's pandas system
(/root/reference/src/arti/types/pandas.py:1-105): ``Series ↔ List`` of a
scalar element, ``DataFrame ↔ List(element=Struct(...))`` of per-column
elements, with ``extends`` delegation to the numpy system for dtypes —
plus the arrow system, since Spark's Arrow-batched pandas interop means
arrow types show up wherever pandas does.

This system is what makes the ``applyInPandas``/``mapInPandas`` surface
type-checkable: a declared Collection type converts to the pandas frame a
producer body will actually receive.
"""

from __future__ import annotations

import datetime
from typing import Any

import numpy as np
import pandas as pd

from artigraph_spark import types as at
from artigraph_spark.types import TypeAdapter, TypeSystem
from artigraph_spark.types.numpy import numpy_type_system
from artigraph_spark.types.systems import arrow_type_system

pandas_type_system = TypeSystem("pandas", extends=(numpy_type_system, arrow_type_system))


@pandas_type_system.register_adapter
class _PandasDtypeBridge(TypeAdapter):
    """Named numpy/pandas dtype (``np.dtype`` or dtype string) → arti Type;
    anything it can't place falls through to the numpy, then arrow, parent
    systems (the ``extends`` mechanism)."""

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
        return isinstance(type_, np.dtype | str) and str(type_) in cls._DTYPES

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return any(type(type_) is c for c in cls._DTYPES.values())

    @classmethod
    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> at.Type:
        return cls._DTYPES[str(type_)]()

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        for name, t in cls._DTYPES.items():
            if type(type_) is t and name not in ("object", "string"):
                return np.dtype(name)
        if isinstance(type_, at.String):
            return np.dtype("object")  # pandas' default string representation
        raise NotImplementedError(f"no pandas dtype for {type_!r}")


@pandas_type_system.register_adapter
class SeriesAdapter(TypeAdapter):
    """``pd.Series ↔ List(element=<scalar>)`` (reference SeriesAdapter,
    /root/reference/src/arti/types/pandas.py:16-53). Object-dtype series
    infer String from an exemplar value; List-of-Struct is the
    DataFrameAdapter's territory."""

    artigraph = at.List
    system = pd.Series
    priority = 20

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, at.List) and not isinstance(type_.element, at.Struct)

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, pd.Series)

    @classmethod
    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> at.Type:
        dtype = type_.dtype
        if dtype == np.dtype("O"):
            if len(type_) == 0:
                return at.List(element=at.String())
            example = type_.iloc[0]
            if isinstance(example, str):
                return at.List(element=at.String())
            if isinstance(example, np.ndarray | list):
                # Array column (how Spark's toPandas/applyInPandas presents
                # array<T>): element is itself a List.
                arr = example if isinstance(example, np.ndarray) else np.array(example)
                return at.List(
                    element=at.List(
                        element=pandas_type_system.to_artigraph(arr.dtype, hints=hints)
                    )
                )
            raise NotImplementedError(
                f"unsupported object series element; got {example!r}"
            )
        return at.List(element=pandas_type_system.to_artigraph(dtype, hints=hints))

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        assert isinstance(type_, at.List)
        if isinstance(type_.element, at.String):
            return pd.Series([""])  # object dtype, pandas' string default
        if isinstance(type_.element, at.List):
            # Array column: object-dtype Series of ndarrays (the shape Spark's
            # Arrow bridge hands applyInPandas bodies for array<T> columns).
            # NOTE: np.dtype(<pd.Series>) would silently resolve to the
            # element's scalar dtype and flatten the column — never fall
            # through to the scalar path here.
            inner = pandas_type_system.to_system(
                at.List(element=type_.element.element), hints=hints
            )
            return pd.Series([np.asarray(inner)])
        el = type_.element
        # Temporal elements: pandas' own representations (what Spark's Arrow
        # bridge hands toPandas/applyInPandas) — the arrow-parent fallback
        # below returns pa.DataType objects np.dtype() cannot interpret.
        if isinstance(el, at.Timestamp):
            return pd.Series(pd.to_datetime(["1970-01-01"], utc=True))
        if isinstance(el, at.DateTime):
            return pd.Series(pd.to_datetime(["1970-01-01"]))
        if isinstance(el, at.Date):
            return pd.Series([datetime.date(1970, 1, 1)])
        if isinstance(el, at.Time):
            return pd.Series([datetime.time(0, 0)])
        dtype = pandas_type_system.to_system(el, hints=hints)
        if not isinstance(dtype, np.dtype):  # numpy parent returns scalar classes
            dtype = np.dtype(dtype)
        return pd.Series([dtype.type()], dtype=dtype)


@pandas_type_system.register_adapter
class DataFrameAdapter(TypeAdapter):
    """``pd.DataFrame ↔ List(element=Struct(...))`` (reference
    DataFrameAdapter, /root/reference/src/arti/types/pandas.py:56-105):
    each column round-trips through the SeriesAdapter with its List
    wrapper peeled off/on."""

    artigraph = at.List
    system = pd.DataFrame
    priority = 30

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, at.List) and isinstance(type_.element, at.Struct)

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, pd.DataFrame)

    @classmethod
    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> at.Type:
        assert isinstance(type_, pd.DataFrame)
        fields: dict[str, at.Type] = {}
        for name in type_.columns:
            col = pandas_type_system.to_artigraph(type_[name], hints=hints)
            assert isinstance(col, at.List)
            fields[name] = col.element
        return at.List(element=at.Struct(fields=fields))

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        assert isinstance(type_, at.List)
        assert isinstance(type_.element, at.Struct)
        return pd.DataFrame(
            {
                name: pandas_type_system.to_system(
                    at.List(element=subtype), hints=hints
                )
                for name, subtype in type_.element.fields.items()
            }
        )


def collection_to_pandas_exemplar(type_: at.Collection | at.Struct) -> pd.DataFrame:
    """One-row exemplar DataFrame for a declared table type — the frame shape
    an ``applyInPandas``/``mapInPandas`` producer body receives."""
    element = type_.element if isinstance(type_, at.Collection) else type_
    return pandas_type_system.to_system(at.List(element=element), hints={})
