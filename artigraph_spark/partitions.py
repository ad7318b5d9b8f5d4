"""PartitionKey / PartitionField: one key uniquely identifies one partition.

Parity with /root/reference/src/arti/partitions/__init__.py: fields expose
formatted "components" used in storage path templates (DateField → Y/m/d/iso,
IntField → value/hex, NullField → a sentinel), and keys are frozen mappings
name → field. Spark alignment: a PartitionKey corresponds to one Hive
partition directory (``date=2021-10-01/``).
"""

from __future__ import annotations

import datetime
from typing import Any, ClassVar

from artigraph_spark import types as at
from artigraph_spark.internal.models import Model

NOT_PARTITIONED_SENTINEL = "_NONE"


class PartitionField(Model):
    """One partition-key component with named, formattable renderings."""

    default_component: ClassVar[str]

    @property
    def components(self) -> dict[str, str]:
        raise NotImplementedError

    @property
    def value(self) -> Any:
        raise NotImplementedError

    @classmethod
    def parse(cls, component: str, text: str) -> PartitionField:
        raise NotImplementedError

    @classmethod
    def for_type(cls, type_: at.Type) -> type[PartitionField]:
        if isinstance(type_, at.Date):
            return DateField
        if isinstance(type_, at.Int8 | at.Int16 | at.Int32 | at.Int64):
            return IntField
        if isinstance(type_, at.Null):
            return NullField
        if isinstance(type_, at.String | at.Enum):
            return StringField
        raise NotImplementedError(f"no partition field for type {type_!r}")


class DateField(PartitionField):
    key: datetime.date

    default_component: ClassVar[str] = "iso"

    @property
    def components(self) -> dict[str, str]:
        return {
            "Y": f"{self.key.year:04d}",
            "m": f"{self.key.month:02d}",
            "d": f"{self.key.day:02d}",
            "iso": self.key.isoformat(),
        }

    @property
    def value(self) -> datetime.date:
        return self.key

    @classmethod
    def parse(cls, component: str, text: str) -> DateField:
        if component == "iso":
            return cls(key=datetime.date.fromisoformat(text))
        raise ValueError(f"cannot parse DateField from component {component!r} alone")


class IntField(PartitionField):
    key: int

    default_component: ClassVar[str] = "value"

    @property
    def components(self) -> dict[str, str]:
        return {"value": str(self.key), "hex": hex(self.key)}

    @property
    def value(self) -> int:
        return self.key

    @classmethod
    def parse(cls, component: str, text: str) -> IntField:
        if component == "value":
            return cls(key=int(text))
        if component == "hex":
            return cls(key=int(text, 16))
        raise ValueError(f"unknown IntField component {component!r}")


class StringField(PartitionField):
    key: str

    default_component: ClassVar[str] = "value"

    @property
    def components(self) -> dict[str, str]:
        return {"value": self.key}

    @property
    def value(self) -> str:
        return self.key

    @classmethod
    def parse(cls, component: str, text: str) -> StringField:
        return cls(key=text)


class NullField(PartitionField):
    default_component: ClassVar[str] = "value"

    @property
    def components(self) -> dict[str, str]:
        return {"value": NOT_PARTITIONED_SENTINEL}

    @property
    def value(self) -> None:
        return None

    @classmethod
    def parse(cls, component: str, text: str) -> NullField:
        if text != NOT_PARTITIONED_SENTINEL:
            raise ValueError(f"expected {NOT_PARTITIONED_SENTINEL!r}, got {text!r}")
        return cls()


class PartitionKey(Model):
    """Frozen name → PartitionField mapping identifying one partition."""

    fields: dict[str, PartitionField] = {}

    @classmethod
    def not_partitioned(cls) -> PartitionKey:
        return cls(fields={})

    @classmethod
    def from_types(cls, types: dict[str, at.Type], values: dict[str, Any]) -> PartitionKey:
        fields: dict[str, PartitionField] = {}
        for name, type_ in types.items():
            field_cls = PartitionField.for_type(type_)
            v = values[name]
            fields[name] = field_cls() if field_cls is NullField else field_cls(key=v)
        return cls(fields=fields)

    @classmethod
    def types_from(cls, type_: at.Type) -> dict[str, type[PartitionField]]:
        """Partition field classes for a Collection's partition_by columns
        (mirrors PartitionKey.types_from, partitions/__init__.py:62-71)."""
        if not isinstance(type_, at.Collection):
            return {}
        return {
            name: PartitionField.for_type(ftype)
            for name, ftype in type_.partition_fields.items()
        }

    @property
    def is_not_partitioned(self) -> bool:
        return not self.fields

    def components(self) -> dict[str, dict[str, str]]:
        return {name: f.components for name, f in self.fields.items()}

    def values(self) -> dict[str, Any]:
        return {name: f.value for name, f in self.fields.items()}

    def sort_key(self) -> tuple:
        return tuple((name, str(self.fields[name].value)) for name in sorted(self.fields))

    def __hash__(self) -> int:
        return hash(self.sort_key())

    def __eq__(self, other: object) -> bool:
        return isinstance(other, PartitionKey) and self.sort_key() == other.sort_key()
