"""arti Type ↔ pyarrow bridge (parity with the reference's pyarrow adapter,
/root/reference/src/arti/types/pyarrow.py — incl. the schema-metadata trick
for lossy types). Arrow is the engine's interchange layer (pandas UDFs,
createDataFrame), so round-tripping through it must preserve the Type."""

from __future__ import annotations

import json

import pyarrow as pa

from artigraph_spark import types as at

_META_KEY = b"artigraph_spark"

_SIMPLE_TO_ARROW: dict[type[at.Type], pa.DataType] = {
    at.Boolean: pa.bool_(),
    at.Date: pa.date32(),
    at.Float16: pa.float16(),
    at.Float32: pa.float32(),
    at.Float64: pa.float64(),
    at.Int8: pa.int8(),
    at.Int16: pa.int16(),
    at.Int32: pa.int32(),
    at.Int64: pa.int64(),
    at.UInt8: pa.uint8(),
    at.UInt16: pa.uint16(),
    at.UInt32: pa.uint32(),
    at.UInt64: pa.uint64(),
    at.Null: pa.null(),
    at.String: pa.string(),
    at.Binary: pa.binary(),
}

_PRECISION_UNIT = {"second": "s", "millisecond": "ms", "microsecond": "us", "nanosecond": "ns"}
_UNIT_PRECISION = {v: k for k, v in _PRECISION_UNIT.items()}


def to_arrow(type_: at.Type) -> pa.DataType:
    cls = type(type_)
    if cls in _SIMPLE_TO_ARROW:
        return _SIMPLE_TO_ARROW[cls]
    if isinstance(type_, at.Timestamp):
        return pa.timestamp(_PRECISION_UNIT[type_.precision], tz="UTC")
    if isinstance(type_, at.DateTime):
        return pa.timestamp(_PRECISION_UNIT[type_.precision])
    if isinstance(type_, at.Time):
        # time32 carries s/ms, time64 us/ns — matching the unit exactly is
        # what lets from_arrow recover the declared precision.
        if type_.precision in ("second", "millisecond"):
            return pa.time32(_PRECISION_UNIT[type_.precision])
        return pa.time64(_PRECISION_UNIT[type_.precision])
    if isinstance(type_, at.List | at.Set):
        # Element nullability rides on the item FIELD (pa.list_ of a bare
        # DataType defaults the item to nullable, erasing non-null elements).
        return pa.list_(
            pa.field("item", to_arrow(type_.element), nullable=type_.element.nullable)
        )
    if isinstance(type_, at.Map):
        return pa.map_(
            to_arrow(type_.key),
            pa.field("value", to_arrow(type_.value), nullable=type_.value.nullable),
        )
    if isinstance(type_, at.Struct):
        return pa.struct([_to_arrow_field(n, t) for n, t in type_.fields.items()])
    if isinstance(type_, at.Enum):
        return to_arrow(type_.type)
    if isinstance(type_, at.Geography):
        return pa.string() if type_.format == "WKT" else pa.binary()
    if isinstance(type_, at.Collection):
        return to_arrow(type_.element)
    raise NotImplementedError(f"no arrow mapping for {type_!r}")


def _identity_meta(type_: at.Type) -> dict[bytes, bytes] | None:
    """Field-level metadata carrying what the arrow TYPE cannot: Set-vs-List
    identity, Enum items, Geography format/srid (the reference's
    field-metadata trick — arrow DataTypes have no metadata slot, fields
    do, so identity round-trips for any type embedded in a struct field or
    schema column; a BARE to_arrow(Set(...)) is still a plain list)."""
    m: dict = {}
    if isinstance(type_, at.Set):
        m["set"] = True
    elif isinstance(type_, at.Enum):
        m["enum_items"] = list(type_.items)
    elif isinstance(type_, at.Geography):
        m["geography"] = {"format": type_.format, "srid": type_.srid}
    return {_META_KEY: json.dumps(m).encode()} if m else None


def _to_arrow_field(name: str, type_: at.Type) -> pa.Field:
    return pa.field(
        name, to_arrow(type_), nullable=type_.nullable, metadata=_identity_meta(type_)
    )


def collection_to_arrow_schema(coll: at.Collection) -> pa.Schema:
    """Collection → pa.Schema with layout carried in schema metadata and
    per-column identity metadata on the fields (the reference's round-trip
    trick, pyarrow.py:232-270)."""
    fields = [_to_arrow_field(n, t) for n, t in coll.element.fields.items()]
    meta = {
        _META_KEY: json.dumps(
            {"partition_by": list(coll.partition_by), "cluster_by": list(coll.cluster_by)}
        ).encode()
    }
    return pa.schema(fields, metadata=meta)


def _from_arrow_field(f: pa.Field) -> at.Type:
    base = from_arrow(f.type, nullable=f.nullable)
    if not f.metadata or _META_KEY not in f.metadata:
        return base
    m = json.loads(f.metadata[_META_KEY])
    if m.get("set") and isinstance(base, at.List):
        return at.Set(element=base.element, nullable=base.nullable)
    if "enum_items" in m:
        # Base keeps the field's nullability, matching the Spark bridge's
        # Enum recovery (the arrow type has no separate base-nullable slot).
        return at.Enum(type=base, items=tuple(m["enum_items"]), nullable=base.nullable)
    if "geography" in m:
        g = m["geography"]
        return at.Geography(format=g["format"], srid=g.get("srid"), nullable=base.nullable)
    return base


def from_arrow(dt: pa.DataType, *, nullable: bool = True) -> at.Type:
    for cls, arrow_dt in _SIMPLE_TO_ARROW.items():
        if dt.equals(arrow_dt):
            return cls(nullable=nullable)
    if pa.types.is_timestamp(dt):
        precision = _UNIT_PRECISION[dt.unit]
        if dt.tz is not None:
            return at.Timestamp(precision=precision, nullable=nullable)
        return at.DateTime(precision=precision, nullable=nullable)
    if pa.types.is_time(dt):
        return at.Time(precision=_UNIT_PRECISION[dt.unit], nullable=nullable)
    if pa.types.is_list(dt) or pa.types.is_large_list(dt):
        return at.List(
            element=from_arrow(dt.value_type, nullable=dt.value_field.nullable),
            nullable=nullable,
        )
    if pa.types.is_map(dt):
        return at.Map(
            key=from_arrow(dt.key_type, nullable=False),
            value=from_arrow(dt.item_type, nullable=dt.item_field.nullable),
            nullable=nullable,
        )
    if pa.types.is_struct(dt):
        return at.Struct(
            fields={
                dt.field(i).name: _from_arrow_field(dt.field(i))
                for i in range(dt.num_fields)
            },
            nullable=nullable,
        )
    raise NotImplementedError(f"no artigraph mapping for arrow type {dt!r}")


def arrow_schema_to_collection(schema: pa.Schema) -> at.Collection:
    layout = {}
    if schema.metadata and _META_KEY in schema.metadata:
        layout = json.loads(schema.metadata[_META_KEY])
    return at.Collection(
        element=at.Struct(
            fields={f.name: _from_arrow_field(f) for f in schema}
        ),
        partition_by=tuple(layout.get("partition_by", ())),
        cluster_by=tuple(layout.get("cluster_by", ())),
    )
