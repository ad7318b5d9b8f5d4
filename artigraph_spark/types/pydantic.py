"""pydantic models ↔ arti Struct.

Parity with the reference's pydantic system
(/root/reference/src/arti/types/pydantic.py:1-51): a single BaseModel
adapter extending the python (annotation) system — per-field annotations
convert through the parent; ``to_system`` rebuilds a model class with
``create_model``. The model's class name rides in ``Struct.description``
(this engine's Struct has no ``name`` field; description is excluded from
fingerprints, so naming never perturbs build identity).
"""

from __future__ import annotations

from typing import Any

from pydantic import BaseModel, create_model

from artigraph_spark import types as at
from artigraph_spark.types import TypeAdapter, TypeSystem
from artigraph_spark.types.systems import python_type_system

pydantic_type_system = TypeSystem("pydantic", extends=(python_type_system,))


@pydantic_type_system.register_adapter
class BaseModelAdapter(TypeAdapter):
    artigraph = at.Struct
    system = BaseModel
    priority = 10

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, type) and issubclass(type_, BaseModel)

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, at.Struct)

    @classmethod
    def to_artigraph(cls, type_: type[BaseModel], *, hints: dict[str, Any]) -> at.Type:
        fields: dict[str, at.Type] = {}
        for name, field in type_.model_fields.items():
            if field.annotation is None:
                raise NotImplementedError(f"field {name!r} has no annotation")
            fields[name] = pydantic_type_system.to_artigraph(
                field.annotation, hints=hints
            )
        return at.Struct(fields=fields, description=type_.__name__, nullable=False)

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        assert isinstance(type_, at.Struct)
        annotations = {
            name: pydantic_type_system.to_system(sub, hints=hints)
            for name, sub in type_.fields.items()
        }
        return create_model(
            type_.description or "Model",
            **{name: (hint, ...) for name, hint in annotations.items()},
        )
