"""arti Type ↔ pyspark.sql.types bridge (the analogue of the reference's
pyarrow adapter, /root/reference/src/arti/types/pyarrow.py).

Lossy bridges (documented, round-tripped via StructField metadata under the
``artigraph_spark`` key, mirroring the pyarrow adapter's schema-metadata
trick at pyarrow.py:232-270):
  - unsigned ints → next-wider signed type (UInt64 → Decimal(20,0))
  - Float16 → FloatType
  - Time → LongType (µs since midnight)
  - nanosecond precision → microsecond TimestampType
  - Enum → base type (+ items in metadata)
  - Set → ArrayType (+ marker in metadata)
  - Geography → StringType (WKT) / BinaryType (WKB)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

from artigraph_spark import types as at

_META_KEY = "artigraph_spark"

spark_type_system_key = "spark"

# arti Type class -> (spark type instance, metadata dict | None)
_SIMPLE_TO_SPARK: dict[type[at.Type], tuple[T.DataType, dict[str, Any] | None]] = {
    at.Boolean: (T.BooleanType(), None),
    at.Date: (T.DateType(), None),
    at.Float16: (T.FloatType(), {"lossy": "float16"}),
    at.Float32: (T.FloatType(), None),
    at.Float64: (T.DoubleType(), None),
    at.Int8: (T.ByteType(), None),
    at.Int16: (T.ShortType(), None),
    at.Int32: (T.IntegerType(), None),
    at.Int64: (T.LongType(), None),
    at.UInt8: (T.ShortType(), {"lossy": "uint8"}),
    at.UInt16: (T.IntegerType(), {"lossy": "uint16"}),
    at.UInt32: (T.LongType(), {"lossy": "uint32"}),
    at.UInt64: (T.DecimalType(20, 0), {"lossy": "uint64"}),
    at.Null: (T.NullType(), None),
    at.String: (T.StringType(), None),
    at.Binary: (T.BinaryType(), None),
}

_SPARK_TO_SIMPLE: dict[type[T.DataType], type[at.Type]] = {
    T.BooleanType: at.Boolean,
    T.DateType: at.Date,
    T.FloatType: at.Float32,
    T.DoubleType: at.Float64,
    T.ByteType: at.Int8,
    T.ShortType: at.Int16,
    T.IntegerType: at.Int32,
    T.LongType: at.Int64,
    T.NullType: at.Null,
    T.StringType: at.String,
    T.BinaryType: at.Binary,
}

_LOSSY_REVERSE: dict[str, type[at.Type]] = {
    "float16": at.Float16,
    "uint8": at.UInt8,
    "uint16": at.UInt16,
    "uint32": at.UInt32,
    "uint64": at.UInt64,
}


def to_spark_type(type_: at.Type) -> T.DataType:
    """arti Type → Spark DataType (metadata-free variant; see
    ``collection_to_schema`` for the metadata-preserving table path)."""
    dt, _ = _to_spark(type_)
    return dt


def _to_spark(type_: at.Type) -> tuple[T.DataType, dict[str, Any] | None]:
    cls = type(type_)
    if cls in _SIMPLE_TO_SPARK:
        # COPY the metadata dict: callers (collection_to_schema's layout
        # injection) mutate it, and handing out the table's own dict let
        # one conversion write into module state and every prior schema.
        dt, meta = _SIMPLE_TO_SPARK[cls]
        return dt, (dict(meta) if meta is not None else None)
    if isinstance(type_, at.Enum):
        base, base_meta = _to_spark(type_.type)
        return base, {"enum_items": list(type_.items), **(base_meta or {})}
    if isinstance(type_, at.Timestamp):
        # Any non-default precision must travel (from_spark_type defaults to
        # microsecond): second/millisecond declarations would otherwise
        # round-trip changed and fingerprint differently.
        meta = {"precision": type_.precision} if type_.precision != "microsecond" else None
        return T.TimestampType(), meta
    if isinstance(type_, at.DateTime):
        meta = {"precision": type_.precision} if type_.precision != "microsecond" else None
        return T.TimestampNTZType(), meta
    if isinstance(type_, at.Time):
        return T.LongType(), {"lossy": "time", "precision": type_.precision}
    if isinstance(type_, at.Geography):
        dt: T.DataType = T.StringType() if type_.format == "WKT" else T.BinaryType()
        return dt, {"geography": {"format": type_.format, "srid": type_.srid}}
    if isinstance(type_, at.List):
        el, el_meta = _to_spark(type_.element)
        meta = {"element": el_meta} if el_meta else None
        return T.ArrayType(el, containsNull=type_.element.nullable), meta
    if isinstance(type_, at.Set):
        el, el_meta = _to_spark(type_.element)
        meta: dict[str, Any] = {"set": True}
        if el_meta:
            meta["element"] = el_meta
        return T.ArrayType(el, containsNull=type_.element.nullable), meta
    if isinstance(type_, at.Map):
        k, k_meta = _to_spark(type_.key)
        v, v_meta = _to_spark(type_.value)
        meta = {}
        if k_meta:
            meta["key"] = k_meta  # lossy KEY types (UInt*, Time, ...) travel too
        if v_meta:
            meta["value"] = v_meta
        return T.MapType(k, v, valueContainsNull=type_.value.nullable), meta or None
    if isinstance(type_, at.Struct):
        return struct_to_spark(type_), None
    if isinstance(type_, at.Collection):
        return struct_to_spark(type_.element), None
    raise NotImplementedError(f"no Spark mapping for {type_!r}")


def struct_to_spark(struct: at.Struct) -> T.StructType:
    fields = []
    for name, ftype in struct.fields.items():
        dt, meta = _to_spark(ftype)
        metadata = {_META_KEY: meta} if meta else None
        fields.append(T.StructField(name, dt, nullable=ftype.nullable, metadata=metadata))
    return T.StructType(fields)


def collection_to_schema(coll: at.Collection) -> T.StructType:
    """Collection → StructType; layout (partition_by/cluster_by) travels in
    the schema-level metadata of the first field (Spark has no schema-level
    metadata slot), recovered by ``schema_to_collection``."""
    schema = struct_to_spark(coll.element)
    if coll.partition_by or coll.cluster_by:
        first = schema.fields[0]
        meta = dict(first.metadata or {})
        meta[_META_KEY] = dict(meta.get(_META_KEY) or {})  # never share nested dicts
        meta[_META_KEY]["layout"] = {
            "partition_by": list(coll.partition_by),
            "cluster_by": list(coll.cluster_by),
        }
        schema.fields[0] = T.StructField(first.name, first.dataType, first.nullable, meta)
    return schema


def from_spark_type(dt: T.DataType, *, nullable: bool = True, meta: dict[str, Any] | None = None) -> at.Type:
    meta = meta or {}
    if "enum_items" in meta:
        base_meta = {k: v for k, v in meta.items() if k != "enum_items"}
        base = from_spark_type(dt, nullable=nullable, meta=base_meta)
        return at.Enum(type=base, items=tuple(meta["enum_items"]), nullable=nullable)
    if meta.get("lossy") == "time":
        return at.Time(precision=meta.get("precision", "microsecond"), nullable=nullable)
    if meta.get("lossy") in _LOSSY_REVERSE:
        return _LOSSY_REVERSE[meta["lossy"]](nullable=nullable)
    if "geography" in meta:
        g = meta["geography"]
        return at.Geography(format=g["format"], srid=g.get("srid"), nullable=nullable)
    if isinstance(dt, T.TimestampType):
        return at.Timestamp(precision=meta.get("precision", "microsecond"), nullable=nullable)
    if isinstance(dt, T.TimestampNTZType):
        return at.DateTime(precision=meta.get("precision", "microsecond"), nullable=nullable)
    if isinstance(dt, T.ArrayType):
        el = from_spark_type(dt.elementType, nullable=dt.containsNull, meta=meta.get("element"))
        if meta.get("set"):
            return at.Set(element=el, nullable=nullable)
        return at.List(element=el, nullable=nullable)
    if isinstance(dt, T.MapType):
        return at.Map(
            key=from_spark_type(dt.keyType, nullable=False, meta=meta.get("key")),
            value=from_spark_type(dt.valueType, nullable=dt.valueContainsNull, meta=meta.get("value")),
            nullable=nullable,
        )
    if isinstance(dt, T.StructType):
        return spark_to_struct(dt, nullable=nullable)
    if type(dt) in _SPARK_TO_SIMPLE:
        return _SPARK_TO_SIMPLE[type(dt)](nullable=nullable)
    raise NotImplementedError(f"no artigraph mapping for Spark type {dt!r}")


def spark_to_struct(schema: T.StructType, *, nullable: bool = True) -> at.Struct:
    fields = {}
    for f in schema.fields:
        meta = (f.metadata or {}).get(_META_KEY)
        fields[f.name] = from_spark_type(f.dataType, nullable=f.nullable, meta=meta)
    return at.Struct(fields=fields, nullable=nullable)


def schema_to_collection(schema: T.StructType) -> at.Collection:
    layout = {}
    if schema.fields:
        meta = (schema.fields[0].metadata or {}).get(_META_KEY) or {}
        layout = meta.get("layout") or {}
    return at.Collection(
        element=spark_to_struct(schema),
        partition_by=tuple(layout.get("partition_by", ())),
        cluster_by=tuple(layout.get("cluster_by", ())),
    )
