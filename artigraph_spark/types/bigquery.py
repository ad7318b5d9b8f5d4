"""BigQuery schema ↔ arti Types.

Parity with the reference's BigQuery system
(/root/reference/src/arti/types/bigquery.py:1-279) WITHOUT the cloud SDK
(absent here): schema fields are represented in BigQuery's public JSON
schema format — ``{"name", "type", "mode", "fields", "description"}`` —
and tables as ``{"tableReference", "schema", "timePartitioning",
"clusteringFields"}``, exactly what the REST API and ``bq show --schema``
emit. The mapping table, priority scheme (64-bit-only numerics round
Float16→FLOAT64→Float64), REPEATED↔List handling, and the
partition/cluster translation on Collections all mirror the reference.
"""

from __future__ import annotations

import warnings
from typing import Any

from artigraph_spark import types as at
from artigraph_spark.types import TypeAdapter, TypeSystem

bigquery_type_system = TypeSystem("bigquery")

REQUIRED = "REQUIRED"
NULLABLE = "NULLABLE"
REPEATED = "REPEATED"

# BigQuery fields embed their name; arti Structs hold {name: Type}. The
# enclosing adapter passes the name down through this hint (reference
# BIGQUERY_HINT_FIELD_NAME, bigquery.py:31).
FIELD_NAME_HINT = "bigquery.field_name"
DEFAULT_ANONYMOUS_NAME = "anon"

# Aliases the REST API/legacy SQL emit for the same types.
_CANONICAL = {"INTEGER": "INT64", "FLOAT": "FLOAT64", "RECORD": "STRUCT", "BOOLEAN": "BOOL"}


def _canonical_type(field: dict[str, Any]) -> str:
    t = str(field.get("type", "")).upper()
    return _CANONICAL.get(t, t)


def _make_field(field_type: str, type_: at.Type, hints: dict[str, Any], **kwargs: Any) -> dict[str, Any]:
    out: dict[str, Any] = {
        "name": hints.get(FIELD_NAME_HINT, DEFAULT_ANONYMOUS_NAME),
        "type": field_type,
        "mode": NULLABLE if type_.nullable else REQUIRED,
    }
    if type_.description is not None:
        out["description"] = type_.description
    out.update(kwargs)
    return out


def _is_field(type_: Any) -> bool:
    return isinstance(type_, dict) and "type" in type_


class _BqScalarAdapter(TypeAdapter):
    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        return (
            _is_field(type_)
            and type_.get("mode", NULLABLE) != REPEATED
            and _canonical_type(type_) == cls.system
        )

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return type(type_) is cls.artigraph

    @classmethod
    def to_artigraph(cls, type_: dict[str, Any], *, hints: dict[str, Any]) -> at.Type:
        return cls.artigraph(
            description=type_.get("description"),
            nullable=type_.get("mode", NULLABLE) != REQUIRED,
        )

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        return _make_field(cls.system, type_, hints)


def _gen_adapter(*, artigraph: type[at.Type], system: str, priority: int = 0) -> None:
    bigquery_type_system.register_adapter(
        type(
            f"BigQuery{system}{artigraph.__name__}",
            (_BqScalarAdapter,),
            {"artigraph": artigraph, "system": system, "priority": priority},
        )
    )


_gen_adapter(artigraph=at.Binary, system="BYTES")
_gen_adapter(artigraph=at.Boolean, system="BOOL")
_gen_adapter(artigraph=at.Date, system="DATE")
_gen_adapter(artigraph=at.Geography, system="GEOGRAPHY")
_gen_adapter(artigraph=at.String, system="STRING")

# BQ only has 64-bit ints/floats: Float16 -> FLOAT64 -> Float64 round trips
# widen, matching the reference's documented behavior (bigquery.py:81-90).
for _precision in (16, 32, 64):
    _gen_adapter(
        artigraph=getattr(at, f"Float{_precision}"), system="FLOAT64", priority=_precision
    )
for _precision in (8, 16, 32, 64):
    _gen_adapter(
        artigraph=getattr(at, f"Int{_precision}"), system="INT64", priority=_precision
    )


class _BqTimeAdapter(_BqScalarAdapter):
    # BQ date/time precision is microsecond.
    precision = "microsecond"

    @classmethod
    def to_artigraph(cls, type_: dict[str, Any], *, hints: dict[str, Any]) -> at.Type:
        return cls.artigraph(
            description=type_.get("description"),
            nullable=type_.get("mode", NULLABLE) != REQUIRED,
            precision=cls.precision,
        )


@bigquery_type_system.register_adapter
class DateTimeAdapter(_BqTimeAdapter):
    artigraph = at.DateTime
    system = "DATETIME"


@bigquery_type_system.register_adapter
class TimeAdapter(_BqTimeAdapter):
    artigraph = at.Time
    system = "TIME"


@bigquery_type_system.register_adapter
class TimestampAdapter(_BqTimeAdapter):
    artigraph = at.Timestamp
    system = "TIMESTAMP"


@bigquery_type_system.register_adapter
class StructAdapter(_BqScalarAdapter):
    artigraph = at.Struct
    system = "STRUCT"

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, at.Struct)

    @classmethod
    def to_artigraph(cls, type_: dict[str, Any], *, hints: dict[str, Any]) -> at.Type:
        return at.Struct(
            description=type_.get("description"),
            fields={
                f["name"]: bigquery_type_system.to_artigraph(f, hints=hints)
                for f in type_.get("fields", [])
            },
            nullable=type_.get("mode", NULLABLE) != REQUIRED,
        )

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        assert isinstance(type_, at.Struct)
        return _make_field(
            cls.system,
            type_,
            hints,
            fields=[
                bigquery_type_system.to_system(sub, hints={**hints, FIELD_NAME_HINT: name})
                for name, sub in type_.fields.items()
            ],
        )


@bigquery_type_system.register_adapter
class RepeatedFieldAdapter(TypeAdapter):
    """REPEATED mode ↔ List: catches ALL repeated fields first (priority) and
    re-dispatches the element as a REQUIRED copy, mirroring the reference's
    ListFieldTypeAdapter (bigquery.py:157-205). BigQuery arrays cannot be
    nullable, hold nullable elements, or nest directly."""

    artigraph = at.List
    system = "REPEATED"
    priority = int(1e9)

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        return _is_field(type_) and type_.get("mode") == REPEATED

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, at.List) and not isinstance(type_, at.Collection)

    @classmethod
    def to_artigraph(cls, type_: dict[str, Any], *, hints: dict[str, Any]) -> at.Type:
        element = {**type_, "mode": REQUIRED}
        return at.List(
            description=type_.get("description"),
            element=bigquery_type_system.to_artigraph(element, hints=hints),
            nullable=False,  # arrays cannot be NULL in BigQuery
        )

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        assert isinstance(type_, at.List)
        if type_.nullable:
            warnings.warn("BigQuery doesn't support nullable arrays", stacklevel=2)
        if type_.element.nullable:
            warnings.warn("BigQuery doesn't support nullable array elements", stacklevel=2)
            type_ = type_.model_copy(
                update={"element": type_.element.model_copy(update={"nullable": False})}
            )
        if isinstance(type_.element, at.List):
            raise ValueError("BigQuery doesn't support nested arrays")
        field = bigquery_type_system.to_system(type_.element, hints=hints)
        assert field["mode"] == REQUIRED
        return {**field, "mode": REPEATED}


@bigquery_type_system.register_adapter
class TableAdapter(TypeAdapter):
    """Collection ↔ table dict: schema fields plus DAY time-partitioning on
    the first partition field and clustering fields (reference
    TableTypeAdapter, bigquery.py:208-279)."""

    artigraph = at.Collection
    system = "TABLE"
    priority = RepeatedFieldAdapter.priority + 1

    @classmethod
    def matches_system(cls, type_: Any, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, dict) and "schema" in type_

    @classmethod
    def matches_artigraph(cls, type_: at.Type, *, hints: dict[str, Any]) -> bool:
        return isinstance(type_, at.Collection)

    @classmethod
    def to_artigraph(cls, type_: dict[str, Any], *, hints: dict[str, Any]) -> at.Type:
        kwargs: dict[str, Any] = {}
        tp = type_.get("timePartitioning")
        if tp:
            if tp.get("type", "DAY") != "DAY":
                raise NotImplementedError(
                    f"BigQuery time partitioning other than 'DAY' is not implemented (got {tp['type']!r})"
                )
            if not tp.get("field"):
                # Ingestion-time partitioning (_PARTITIONTIME pseudo-column,
                # what the REST API emits when no column is named) has no
                # schema field to map to a Collection partition key.
                raise NotImplementedError(
                    "BigQuery ingestion-time partitioning (timePartitioning "
                    "without 'field') is not implemented; use column-based "
                    "DAY partitioning"
                )
            kwargs["partition_by"] = (tp["field"],)
        if type_.get("rangePartitioning"):
            raise NotImplementedError("BigQuery integer range partitioning is not implemented")
        if type_.get("clusteringFields"):
            kwargs["cluster_by"] = tuple(type_["clusteringFields"])
        element = bigquery_type_system.to_artigraph(
            {
                "name": DEFAULT_ANONYMOUS_NAME,
                "type": "STRUCT",
                "mode": REQUIRED,
                "fields": type_["schema"]["fields"],
            },
            hints=hints,
        )
        assert isinstance(element, at.Struct)
        ref = type_.get("tableReference", {})
        desc = ".".join(
            p for p in (ref.get("projectId"), ref.get("datasetId"), ref.get("tableId")) if p
        )
        return at.Collection(
            element=element, nullable=False, description=desc or None, **kwargs
        )

    @classmethod
    def to_system(cls, type_: at.Type, *, hints: dict[str, Any]) -> Any:
        assert isinstance(type_, at.Collection)
        struct_field = bigquery_type_system.to_system(type_.element, hints=hints)
        project, _, rest = (type_.description or "").partition(".")
        dataset, _, table_id = rest.partition(".")
        table: dict[str, Any] = {
            "tableReference": {
                "projectId": project or "project",
                "datasetId": dataset or "dataset",
                "tableId": table_id or "table",
            },
            "schema": {"fields": struct_field["fields"]},
        }
        partition, cluster = type_.partition_by, type_.cluster_by
        if partition:
            # BQ supports ONE partition column; surplus fields move to the
            # head of clustering, as the reference does (bigquery.py:258-264).
            head, *tail = partition
            if tail:
                cluster = (*tail, *cluster)
            if head not in type_.element.fields:
                raise ValueError(
                    f"partition_by field {head!r} is not in the Collection "
                    f"element; known fields: {sorted(type_.element.fields)}"
                )
            head_type = type_.element.fields[head]
            if isinstance(head_type, at.Date | at.DateTime | at.Timestamp):
                table["timePartitioning"] = {"type": "DAY", "field": head}
                table["requirePartitionFilter"] = True
            elif isinstance(
                head_type, at.Int8 | at.Int16 | at.Int32 | at.Int64
                | at.UInt8 | at.UInt16 | at.UInt32 | at.UInt64
            ):
                raise NotImplementedError(
                    "BigQuery integer range partitioning is not implemented"
                )
            else:
                raise ValueError("BigQuery only supports integer range or time partitioning")
        if cluster:
            table["clusteringFields"] = list(cluster)
        return table
