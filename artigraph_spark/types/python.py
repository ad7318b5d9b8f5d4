"""Python type annotations ↔ arti Types (the inference bridge used when an
Artifact or Producer omits an explicit Type — parity with
/root/reference/src/arti/types/python.py and the annotation introspection in
views).
"""

from __future__ import annotations

import datetime
import types as _pytypes
from typing import Any, Literal, Union, get_args, get_origin

from artigraph_spark import types as at

_SIMPLE: dict[type, type[at.Type]] = {
    bool: at.Boolean,
    bytes: at.Binary,
    datetime.date: at.Date,
    datetime.datetime: at.DateTime,
    datetime.time: at.Time,
    float: at.Float64,
    int: at.Int64,
    str: at.String,
    type(None): at.Null,
}

_REVERSE: dict[type[at.Type], Any] = {
    at.Boolean: bool,
    at.Binary: bytes,
    at.Date: datetime.date,
    at.DateTime: datetime.datetime,
    at.Timestamp: datetime.datetime,
    at.Time: datetime.time,
    at.Float16: float,
    at.Float32: float,
    at.Float64: float,
    at.Int8: int,
    at.Int16: int,
    at.Int32: int,
    at.Int64: int,
    at.UInt8: int,
    at.UInt16: int,
    at.UInt32: int,
    at.UInt64: int,
    at.String: str,
    at.Null: type(None),
}


def to_artigraph(annotation: Any) -> at.Type:
    """Python annotation → arti Type. ``Optional[X]`` folds into
    ``nullable=True``; Literal of homogeneous values becomes an Enum."""
    origin, args = get_origin(annotation), get_args(annotation)
    if origin is Union or origin is _pytypes.UnionType:  # typing.Optional / X | None
        non_none = [a for a in args if a is not type(None)]
        if len(non_none) != 1:
            raise NotImplementedError(f"unsupported union {annotation!r}")
        inner = to_artigraph(non_none[0])
        return inner.model_copy(update={"nullable": True})
    if origin is Literal:
        base = to_artigraph(type(args[0]))
        return at.Enum(type=base, items=tuple(args), nullable=False)
    if origin in (list, tuple):
        if origin is tuple:
            # Only homogeneous forms map to List: tuple[X, ...] or
            # tuple[X, X, ...]-style with one distinct member. A
            # heterogeneous tuple[int, str] silently typed as List(Int64)
            # would validate/write the str leg under the wrong type.
            members = {a for a in args if a is not Ellipsis}
            if len(members) != 1:
                raise NotImplementedError(
                    f"heterogeneous tuple annotation {annotation!r} has no "
                    "single element type; use a Struct-typed artifact"
                )
        return at.List(element=to_artigraph(args[0]), nullable=False)
    if origin in (set, frozenset):
        return at.Set(element=to_artigraph(args[0]), nullable=False)
    if origin is dict:
        return at.Map(
            key=to_artigraph(args[0]), value=to_artigraph(args[1]), nullable=False
        )
    if isinstance(annotation, type) and annotation in _SIMPLE:
        t = _SIMPLE[annotation]
        return t(nullable=annotation is type(None))
    # pydantic models → Struct (the reference's pydantic adapter,
    # /root/reference/src/arti/types/pydantic.py, which extends the python
    # system the same way).
    try:
        from pydantic import BaseModel

        if isinstance(annotation, type) and issubclass(annotation, BaseModel):
            return at.Struct(
                fields={
                    name: to_artigraph(field.annotation)
                    for name, field in annotation.model_fields.items()
                },
                nullable=False,
            )
    except ImportError:  # pragma: no cover
        pass
    raise NotImplementedError(f"cannot infer artigraph type from {annotation!r}")


def infer_type(value: Any) -> at.Type:
    """Infer an arti Type from a VALUE (not an annotation) — the
    Artifact.cast literal path (reference contract:
    tests/arti/artifacts/test_artifact.py:36-76 — (1,2,3) and [1,2,3] both
    infer List(element=Int64()), {"a": 1} infers Map(String, Int64), and
    mixed-type containers are rejected)."""
    if isinstance(value, (list, tuple)):
        element = _infer_uniform([infer_type(v) for v in value], value)
        return at.List(element=element)
    if isinstance(value, dict):
        key = _infer_uniform([infer_type(k) for k in value.keys()], value)
        val = _infer_uniform([infer_type(v) for v in value.values()], value)
        return at.Map(key=key, value=val)
    t = _SIMPLE.get(type(value))
    if t is None:
        raise NotImplementedError(f"Unable to determine type of {value}")
    return t()


def _infer_uniform(types: list[at.Type], value: Any) -> at.Type:
    if not types or any(t != types[0] for t in types):
        raise NotImplementedError(f"Unable to determine type of {value}")
    return types[0]


def to_python(type_: at.Type) -> Any:
    """arti Type → python annotation (inverse bridge)."""
    if isinstance(type_, at.Enum):
        return Literal[tuple(type_.items)]  # type: ignore[valid-type]
    if isinstance(type_, at.List):
        return list[to_python(type_.element)]  # type: ignore[misc]
    if isinstance(type_, at.Set):
        return set[to_python(type_.element)]  # type: ignore[misc]
    if isinstance(type_, at.Map):
        return dict[to_python(type_.key), to_python(type_.value)]  # type: ignore[misc]
    if isinstance(type_, at.Struct | at.Collection):
        return list[dict]
    base = _REVERSE.get(type(type_))
    if base is None:
        raise NotImplementedError(f"no python annotation for {type_!r}")
    if type_.nullable and base is not type(None):
        return base | None
    return base
