"""BigQuery type-system adapters over the public JSON schema representation
(mirrors the reference's tests/arti/types/test_bigquery_adapters.py, with
plain dicts standing in for SDK SchemaField/Table objects)."""

from __future__ import annotations

import pytest

from artigraph_spark import types as at
from artigraph_spark.types.bigquery import (
    FIELD_NAME_HINT,
    bigquery_type_system,
)


@pytest.fixture()
def bq_table() -> dict:
    scalars = [
        {"name": n, "type": t, "mode": "REQUIRED"}
        for n, t in [
            ("binary", "BYTES"),
            ("boolean", "BOOL"),
            ("date", "DATE"),
            ("datetime", "DATETIME"),
            ("float64", "FLOAT64"),
            ("geography", "GEOGRAPHY"),
            ("int64", "INT64"),
            ("string", "STRING"),
            ("time", "TIME"),
            ("timestamp", "TIMESTAMP"),
        ]
    ]
    records = {
        "name": "records",
        "type": "RECORD",  # legacy alias for STRUCT must be accepted
        "mode": "REPEATED",
        "fields": [
            {"name": "id", "type": "INTEGER", "mode": "REQUIRED"},
            {
                "name": "data",
                "type": "RECORD",
                "mode": "REQUIRED",
                "fields": [{"name": "values", "type": "INTEGER", "mode": "REPEATED"}],
            },
        ],
    }
    return {
        "tableReference": {"projectId": "project", "datasetId": "dataset", "tableId": "table"},
        "schema": {"fields": [*scalars, records]},
        "timePartitioning": {"type": "DAY", "field": "date"},
        "clusteringFields": ["int64", "string"],
    }


@pytest.mark.parametrize(
    ("arti_type", "bq_type"),
    [
        (at.Binary, "BYTES"),
        (at.Boolean, "BOOL"),
        (at.Date, "DATE"),
        (at.Float64, "FLOAT64"),
        (at.Geography, "GEOGRAPHY"),
        (at.Int64, "INT64"),
        (at.String, "STRING"),
    ],
)
def test_scalar_round_trip(arti_type, bq_type):
    field = bigquery_type_system.to_system(arti_type(nullable=False), hints={})
    assert field["type"] == bq_type
    assert field["mode"] == "REQUIRED"
    back = bigquery_type_system.to_artigraph(field, hints={})
    assert back == arti_type(nullable=False)


def test_narrow_numerics_widen():
    # BQ only has 64-bit numerics: Float16 -> FLOAT64 -> Float64.
    f = bigquery_type_system.to_system(at.Float16(), hints={})
    assert f["type"] == "FLOAT64"
    assert bigquery_type_system.to_artigraph(f, hints={}) == at.Float64()
    i = bigquery_type_system.to_system(at.Int8(), hints={})
    assert i["type"] == "INT64"
    assert bigquery_type_system.to_artigraph(i, hints={}) == at.Int64()


def test_time_types_microsecond():
    t = bigquery_type_system.to_artigraph(
        {"name": "ts", "type": "TIMESTAMP", "mode": "NULLABLE"}, hints={}
    )
    assert t == at.Timestamp(precision="microsecond")


def test_field_name_hint():
    field = bigquery_type_system.to_system(at.Int64(), hints={FIELD_NAME_HINT: "x"})
    assert field["name"] == "x"
    assert field["mode"] == "NULLABLE"


def test_repeated_round_trip():
    lst = at.List(element=at.Int64(nullable=False), nullable=False)
    field = bigquery_type_system.to_system(lst, hints={})
    assert field["mode"] == "REPEATED"
    assert field["type"] == "INT64"
    back = bigquery_type_system.to_artigraph(field, hints={})
    assert back == lst


def test_nullable_array_elements_warn_and_coerce():
    lst = at.List(element=at.Int64(nullable=True), nullable=False)
    with pytest.warns(UserWarning, match="nullable array elements"):
        field = bigquery_type_system.to_system(lst, hints={})
    assert field["mode"] == "REPEATED"


def test_nested_arrays_rejected():
    nested = at.List(
        element=at.List(element=at.Int64(nullable=False), nullable=False), nullable=False
    )
    with pytest.raises(ValueError, match="nested arrays"):
        bigquery_type_system.to_system(nested, hints={})


def test_struct_round_trip():
    s = at.Struct(
        fields={"a": at.Int64(nullable=False), "b": at.String(nullable=False)},
        nullable=False,
    )
    field = bigquery_type_system.to_system(s, hints={})
    assert field["type"] == "STRUCT"
    assert [f["name"] for f in field["fields"]] == ["a", "b"]
    assert bigquery_type_system.to_artigraph(field, hints={}) == s


def test_table_to_collection(bq_table):
    coll = bigquery_type_system.to_artigraph(bq_table, hints={})
    assert isinstance(coll, at.Collection)
    assert coll.partition_by == ("date",)
    assert coll.cluster_by == ("int64", "string")
    assert coll.description == "project.dataset.table"
    fields = coll.element.fields
    assert fields["int64"] == at.Int64(nullable=False)
    assert isinstance(fields["records"], at.List)
    rec = fields["records"].element
    assert isinstance(rec, at.Struct)
    assert rec.fields["id"] == at.Int64(nullable=False)
    assert isinstance(rec.fields["data"].fields["values"], at.List)


def test_collection_to_table_round_trip(bq_table):
    coll = bigquery_type_system.to_artigraph(bq_table, hints={})
    table = bigquery_type_system.to_system(coll, hints={})
    assert table["tableReference"]["tableId"] == "table"
    assert table["timePartitioning"] == {"type": "DAY", "field": "date"}
    assert table["requirePartitionFilter"] is True
    assert table["clusteringFields"] == ["int64", "string"]
    # Round trip again: stable fixpoint.
    assert bigquery_type_system.to_artigraph(table, hints={}) == coll


def test_int_partitioning_not_implemented():
    coll = at.Collection(
        element=at.Struct(fields={"k": at.Int64(nullable=False)}, nullable=False),
        partition_by=("k",),
        nullable=False,
    )
    with pytest.raises(NotImplementedError, match="integer range"):
        bigquery_type_system.to_system(coll, hints={})


def test_ingestion_time_partitioning_rejected(bq_table):
    t = dict(bq_table)
    t["timePartitioning"] = {"type": "DAY"}  # no field: ingestion-time
    with pytest.raises(NotImplementedError, match="ingestion-time"):
        bigquery_type_system.to_artigraph(t, hints={})
