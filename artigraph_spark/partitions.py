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
    """One partition-key component with named, formattable renderings.

    ``components`` are the pre-formatted string renderings used in Hive-style
    path segments; ``component_value`` exposes the TYPED value behind a
    component so user path templates can apply their own format specs
    (``{date.m:02}``), mirroring the reference's field-component properties
    (/root/reference/src/arti/partitions/__init__.py: DateField.Y/m/d are
    ints, formatted by the template). ``from_components`` reconstructs a
    field from one-or-more component strings — the discovery-side inverse —
    matching /root/reference/tests/arti/partitions/test_partitions.py
    (DateField from Y/m/d, iso, or value; IntField from value or hex)."""

    default_component: ClassVar[str]
    # Exact component-name sets ``from_components`` can rebuild a field from.
    # Discovery validates a template's captured components against this BEFORE
    # matching paths, so an unreconstructable template (e.g. "{date.Y}" alone)
    # fails loudly instead of silently discovering nothing.
    component_sets: ClassVar[tuple[frozenset[str], ...]] = ()

    # Every concrete subclass by name — catalog deserialization resolves
    # field classes through this, so user-defined PartitionField subclasses
    # round-trip through a JsonFileBackend exactly like the built-ins.
    _registry: ClassVar[dict[str, type["PartitionField"]]] = {}

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        # A subclass that declares a default_component but no component_sets
        # must stay discoverable under the default {partition_key_spec}
        # template (which only renders default_component) — otherwise
        # _build_discovery_spec rejects it with ValueError even though
        # from_components can rebuild it.
        if "component_sets" not in cls.__dict__ and "default_component" in cls.__dict__:
            cls.component_sets = (frozenset({cls.default_component}),)
        prior = PartitionField._registry.get(cls.__name__)
        if prior is not None and prior.__module__ != cls.__module__:
            # Two unrelated classes sharing a name would make catalog
            # deserialization silently rebuild one module's entries through
            # the other's class. Same-module redefinition (REPL / test
            # re-execution) replaces quietly.
            raise ValueError(
                f"PartitionField name {cls.__name__!r} already registered by "
                f"{prior.__module__}; rename one of the classes"
            )
        PartitionField._registry[cls.__name__] = cls

    @classmethod
    def by_name(cls, name: str) -> type["PartitionField"]:
        try:
            return cls._registry[name]
        except KeyError:
            raise LookupError(
                f"unknown PartitionField class {name!r} in catalog — is the "
                "module defining it imported in this process?"
            ) from None

    @property
    def components(self) -> dict[str, str]:
        raise NotImplementedError

    @property
    def value(self) -> Any:
        raise NotImplementedError

    def component_value(self, component: str) -> Any:
        """Typed value of one component (default: its rendered string)."""
        return self.components[component]

    @classmethod
    def from_components(cls, **components: str) -> PartitionField:
        """Rebuild a field from component name → text. Subclasses accept any
        unambiguous subset (e.g. DateField: {Y,m,d} jointly, or iso alone)."""
        raise ValueError(f"Unable to parse {cls.__name__!r} from: {components!r}")

    @classmethod
    def parse(cls, component: str, text: str) -> PartitionField:
        return cls.from_components(**{component: text})  # type: ignore[return-value]

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
    component_sets: ClassVar[tuple[frozenset[str], ...]] = (
        frozenset({"iso"}),
        frozenset({"value"}),
        frozenset({"Y", "m", "d"}),
    )

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

    def component_value(self, component: str) -> Any:
        if component == "value":
            # ISO string, not the raw date: str() renders identically, and a
            # numeric format spec ("{date.value:02}") then fails loudly
            # instead of date.__format__ treating it as strftime and
            # collapsing every partition onto the literal spec text.
            return self.key.isoformat()
        if component == "Y":
            return self.key.year
        if component == "m":
            return self.key.month
        if component == "d":
            return self.key.day
        if component == "iso":
            return self.key.isoformat()
        raise KeyError(component)

    @classmethod
    def from_components(cls, **components: str) -> DateField:
        names = set(components)
        if names == {"iso"} or names == {"value"}:
            return cls(key=datetime.date.fromisoformat(next(iter(components.values()))))
        if names == {"Y", "m", "d"}:
            # int() tolerates zero-padding ("01" == "1"), matching the
            # reference's DateField.from_components.
            return cls(
                key=datetime.date(
                    int(components["Y"]), int(components["m"]), int(components["d"])
                )
            )
        raise ValueError(f"Unable to parse 'DateField' from: {components!r}")


class IntField(PartitionField):
    key: int

    default_component: ClassVar[str] = "value"
    component_sets: ClassVar[tuple[frozenset[str], ...]] = (
        frozenset({"value"}),
        frozenset({"hex"}),
        frozenset({"value", "hex"}),
    )

    @property
    def components(self) -> dict[str, str]:
        return {"value": str(self.key), "hex": hex(self.key)}

    @property
    def value(self) -> int:
        return self.key

    def component_value(self, component: str) -> Any:
        if component == "value":
            return self.key
        if component == "hex":
            return hex(self.key)
        raise KeyError(component)

    @classmethod
    def from_components(cls, **components: str) -> IntField:
        names = set(components)
        if names == {"value"}:
            return cls(key=int(components["value"]))
        if names == {"hex"}:
            return cls(key=int(components["hex"], 16))
        if names == {"value", "hex"}:
            value, via_hex = int(components["value"]), int(components["hex"], 16)
            if value != via_hex:
                raise ValueError(
                    f"IntField components disagree: value={value} hex={via_hex}"
                )
            return cls(key=value)
        raise ValueError(f"Unable to parse 'IntField' from: {components!r}")


class StringField(PartitionField):
    key: str

    default_component: ClassVar[str] = "value"
    component_sets: ClassVar[tuple[frozenset[str], ...]] = (frozenset({"value"}),)

    @property
    def components(self) -> dict[str, str]:
        return {"value": self.key}

    @property
    def value(self) -> str:
        return self.key

    @classmethod
    def from_components(cls, **components: str) -> StringField:
        if set(components) == {"value"}:
            return cls(key=components["value"])
        raise ValueError(f"Unable to parse 'StringField' from: {components!r}")


class NullField(PartitionField):
    default_component: ClassVar[str] = "value"
    component_sets: ClassVar[tuple[frozenset[str], ...]] = (frozenset({"value"}),)

    @property
    def components(self) -> dict[str, str]:
        return {"value": NOT_PARTITIONED_SENTINEL}

    @property
    def value(self) -> None:
        return None

    @classmethod
    def from_components(cls, **components: str) -> NullField:
        if set(components) == {"value"}:
            # Accept the path sentinel and the reference's literal "None"
            # rendering (tests/arti/partitions/test_partitions.py:118-129).
            if components["value"] in (NOT_PARTITIONED_SENTINEL, "None"):
                return cls()
            raise ValueError("'NullField' can only be used with 'None'!")
        raise ValueError(f"Unable to parse 'NullField' from: {components!r}")


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

    def canonical(self) -> str:
        """Deterministic, INJECTIVE rendering for fingerprint binding:
        sorted ``name=value`` pairs with both sides percent-escaped —
        a raw join would let a value containing '/' or '=' (or the
        term-multiset's NUL separator) render identically to a different
        key, and two distinct partitions would produce interchangeable
        fingerprint terms. Distinct keys render distinctly, binding a
        content fp to ITS partition."""
        from urllib.parse import quote

        return "/".join(
            f"{quote(name, safe='')}={quote(value, safe='')}"
            for name, value in self.sort_key()
        )

    def __hash__(self) -> int:
        return hash(self.sort_key())

    def __eq__(self, other: object) -> bool:
        return isinstance(other, PartitionKey) and self.sort_key() == other.sort_key()
