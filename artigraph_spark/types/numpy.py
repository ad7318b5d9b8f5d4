"""numpy scalars / ndarrays ↔ arti Types.

Parity with the reference's numpy system
(/root/reference/src/arti/types/numpy.py:1-95): one adapter per scalar
type — matching both the scalar class (``np.int64``) and the dtype
(``np.dtype("int64")``) through numpy's equality semantics — plus an
``ndarray ↔ List`` adapter that recurses through nested dimensions.
Precision-ordered priorities resolve overlap the same way the reference's
``priority=_precision`` does.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from artigraph_spark import types as at
from artigraph_spark.types import TypeAdapter, TypeSystem

numpy_type_system = TypeSystem("numpy")


def _register_scalar(artigraph: type[at.Type], system: Any, priority: int = 0) -> None:
    adapter = type(
        f"_Numpy{artigraph.__name__}Adapter",
        (TypeAdapter,),
        {"artigraph": artigraph, "system": system, "priority": priority},
    )

    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        if isinstance(type_, np.ndarray):
            return False
        # Equality works for both the scalar class and np.dtype:
        # np.bool_ == np.bool_ and np.dtype("bool") == np.bool_.
        return bool(type_ == cls.system)

    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return type(type_) is cls.artigraph

    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> at.Type:
        return cls.artigraph()

    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        return cls.system

    adapter.matches_system = classmethod(matches_system)
    adapter.matches_artigraph = classmethod(matches_artigraph)
    adapter.to_artigraph = classmethod(to_artigraph)
    adapter.to_system = classmethod(to_system)
    numpy_type_system.register_adapter(adapter)


_register_scalar(at.Binary, np.bytes_)
_register_scalar(at.Boolean, np.bool_)
_register_scalar(at.String, np.str_)
for _precision in (16, 32, 64):
    _register_scalar(
        getattr(at, f"Float{_precision}"), getattr(np, f"float{_precision}"), _precision
    )
for _precision in (8, 16, 32, 64):
    _register_scalar(
        getattr(at, f"Int{_precision}"), getattr(np, f"int{_precision}"), _precision
    )
    _register_scalar(
        getattr(at, f"UInt{_precision}"), getattr(np, f"uint{_precision}"), _precision
    )


@numpy_type_system.register_adapter
class ArrayAdapter(TypeAdapter):
    """``np.ndarray ↔ List`` with nested-dimension recursion: a 2-d array is
    a ``List(element=List(element=...))``. Conversion inspects (or builds) a
    one-element exemplar, mirroring the reference's zero-value protocol."""

    artigraph = at.List
    system = np.ndarray
    priority = 0

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, np.ndarray)

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, at.List)

    @classmethod
    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> at.Type:
        if len(type_) == 0:
            raise NotImplementedError("cannot infer element type of an empty ndarray")
        value = type_[0] if isinstance(type_[0], np.ndarray) else type(type_[0])
        return at.List(element=numpy_type_system.to_artigraph(value, hints=hints))

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        assert isinstance(type_, at.List)
        element = numpy_type_system.to_system(type_.element, hints=hints)
        # Scalar numpy types instantiate to a zero value (like python types);
        # nested Lists come back as one-element ndarrays to stack.
        value = element if isinstance(element, np.ndarray) else element()
        return np.array([value])
