"""The engine's schema type system.

Structural parity with the reference's Type tree
(/root/reference/src/arti/types/__init__.py:26-280): every node carries
``nullable`` and a non-fingerprinted ``description``; Collection is the
table abstraction (Struct element + partition_by/cluster_by); Enum wraps a
base type with a validated value set. The TypeSystem/TypeAdapter registry
(:284-391) provides priority-ordered bidirectional conversion with
``extends`` delegation.

The Spark bridge lives in artigraph_spark.types.spark; the Python
(annotation-inference) bridge in artigraph_spark.types.python.
"""

from __future__ import annotations

from typing import Any, ClassVar, Literal

from pydantic import field_validator, model_validator

from artigraph_spark.internal.models import Model, SkipFingerprint

TimePrecision = Literal["second", "millisecond", "microsecond", "nanosecond"]


class Type(Model):
    """Abstract schema node."""

    description: SkipFingerprint(str | None) = None
    nullable: bool = True

    @property
    def friendly_key(self) -> str:
        return type(self).__name__


class Binary(Type):
    byte_size: int | None = None


class Boolean(Type):
    pass


class Date(Type):
    pass


class DateTime(Type):
    """Timezone-naive datetime."""

    precision: TimePrecision = "microsecond"


class Enum(Type):
    """A base type constrained to a finite value set. Spark has no native
    enum; the engine enforces membership with a CHECK-style assertion
    (F.col.isin) at write/validate time."""

    type: Type
    items: tuple[Any, ...]

    @model_validator(mode="after")
    def _check_items(self) -> Enum:
        if not self.items:
            raise ValueError("Enum requires at least one item")
        if len(set(map(repr, self.items))) != len(self.items):
            raise ValueError("Enum items must be unique")
        # Items must match the base type's python representation (reference
        # contract, tests/arti/types/test_types.py:105-115: Float32 enum with
        # int items is rejected).
        from artigraph_spark.types.python import to_python

        try:
            expected = to_python(self.type.model_copy(update={"nullable": False}))
        except NotImplementedError:
            return self  # exotic base type: skip the membership typing check
        if isinstance(expected, type):
            bad = [i for i in self.items if type(i) is not expected]
            if bad:
                raise ValueError(
                    f"incompatible {type(self.type).__name__} ({expected!r}) "
                    f"item(s): {bad}"
                )
        return self


class Float16(Type):
    pass


class Float32(Type):
    pass


class Float64(Type):
    pass


class Geography(Type):
    format: Literal["WKT", "WKB"] = "WKT"
    srid: str | None = None


class Int8(Type):
    pass


class Int16(Type):
    pass


class Int32(Type):
    pass


class Int64(Type):
    pass


class UInt8(Type):
    pass


class UInt16(Type):
    pass


class UInt32(Type):
    pass


class UInt64(Type):
    pass


class List(Type):
    element: Type


class Map(Type):
    key: Type
    value: Type


class Null(Type):
    pass


class Set(Type):
    """List with engine-enforced distinctness (no native Spark set type)."""

    element: Type


class String(Type):
    pass


class Struct(Type):
    fields: dict[str, Type]

    @field_validator("fields")
    @classmethod
    def _non_empty(cls, v: dict[str, Type]) -> dict[str, Type]:
        if not v:
            raise ValueError("Struct requires at least one field")
        return v


class Time(Type):
    """Time-of-day. Spark has no time type — bridged to int64 microseconds
    since midnight (documented-lossy, like the reference's BigQuery TIME
    handling)."""

    precision: TimePrecision = "microsecond"


class Timestamp(Type):
    """UTC timestamp. Spark TimestampType is microsecond; nanosecond inputs
    are a documented-lossy bridge (see sources: events.ts)."""

    precision: TimePrecision = "microsecond"


class Collection(Type):
    """THE table abstraction: a collection of Struct rows with declared
    write layout (partition_by → Hive-style directory partitioning,
    cluster_by → sortWithinPartitions/bucketBy). Mirrors the reference's
    validators: partition/cluster fields must exist and not overlap
    (/root/reference/src/arti/types/__init__.py:179-201)."""

    element: Struct
    partition_by: tuple[str, ...] = ()
    cluster_by: tuple[str, ...] = ()

    @model_validator(mode="after")
    def _check_refs(self) -> Collection:
        fields = self.element.fields
        for attr in ("partition_by", "cluster_by"):
            unknown = [f for f in getattr(self, attr) if f not in fields]
            if unknown:
                raise ValueError(
                    f"{attr} references unknown fields {unknown}; known: {sorted(fields)}"
                )
        overlap = set(self.partition_by) & set(self.cluster_by)
        if overlap:
            raise ValueError(f"partition_by and cluster_by overlap: {sorted(overlap)}")
        return self

    @property
    def partition_fields(self) -> dict[str, Type]:
        return {name: self.element.fields[name] for name in self.partition_by}


class TypeAdapter:
    """One arti-Type ↔ foreign-system bridge. Subclasses set ``artigraph``
    (the Type class), ``system`` (the foreign representation), ``priority``."""

    artigraph: ClassVar[type[Type]]
    system: ClassVar[Any]
    priority: ClassVar[int] = 0

    @classmethod
    def matches_artigraph(cls, type_: Type, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, cls.artigraph)

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        raise NotImplementedError

    @classmethod
    def to_artigraph(cls, type_: Any, *, hints: dict[str, Any]) -> Type:
        raise NotImplementedError

    @classmethod
    def to_system(cls, type_: Type, *, hints: dict[str, Any]) -> Any:
        raise NotImplementedError


class TypeSystem:
    """Priority-ordered adapter registry with ``extends`` delegation: lookups
    try local adapters (highest priority first), then fall back to the
    extended systems — e.g. a pandas system extending numpy."""

    def __init__(self, key: str, *, extends: tuple[TypeSystem, ...] = ()) -> None:
        self.key = key
        self.extends = extends
        self._adapters: list[type[TypeAdapter]] = []

    def register_adapter(self, adapter: type[TypeAdapter]) -> type[TypeAdapter]:
        self._adapters.append(adapter)
        return adapter

    @property
    def adapters(self) -> list[type[TypeAdapter]]:
        return sorted(self._adapters, key=lambda a: a.priority, reverse=True)

    def to_artigraph(self, type_: Any, *, hints: dict[str, Any] | None = None) -> Type:
        hints = hints or {}
        for adapter in self.adapters:
            if adapter.matches_system(type_, hints=hints):
                return adapter.to_artigraph(type_, hints=hints)
        for parent in self.extends:
            try:
                return parent.to_artigraph(type_, hints=hints)
            except NotImplementedError:
                continue
        raise NotImplementedError(f"{self.key} cannot convert to artigraph type: {type_!r}")

    def to_system(self, type_: Type, *, hints: dict[str, Any] | None = None) -> Any:
        hints = hints or {}
        for adapter in self.adapters:
            if adapter.matches_artigraph(type_, hints=hints):
                return adapter.to_system(type_, hints=hints)
        for parent in self.extends:
            try:
                return parent.to_system(type_, hints=hints)
            except NotImplementedError:
                continue
        raise NotImplementedError(f"{self.key} cannot convert from artigraph type: {type_!r}")
