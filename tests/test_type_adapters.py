"""numpy / pandas / pydantic type-system adapters (mirrors the reference's
tests/arti/types/test_numpy_adapters.py, test_pandas_adapters.py and
test_pydantic_adapters.py parametrizations)."""

from __future__ import annotations

from typing import Literal

import numpy as np
import pandas as pd
import pytest
from pydantic import BaseModel

from artigraph_spark import types as at
from artigraph_spark.types.numpy import numpy_type_system
from artigraph_spark.types.pandas import (
    collection_to_pandas_exemplar,
    pandas_type_system,
)
from artigraph_spark.types.pydantic import pydantic_type_system


@pytest.mark.parametrize(
    ("arti_type", "np_type"),
    [
        pytest.param(at.Binary(), np.bytes_, id="bytes_"),
        pytest.param(at.Boolean(), np.bool_, id="bool"),
        pytest.param(at.Float16(), np.float16, id="float16"),
        pytest.param(at.Float32(), np.float32, id="float32"),
        pytest.param(at.Float64(), np.float64, id="float64"),
        pytest.param(at.Int16(), np.int16, id="int16"),
        pytest.param(at.Int32(), np.int32, id="int32"),
        pytest.param(at.Int64(), np.int64, id="int64"),
        pytest.param(at.Int8(), np.int8, id="int8"),
        pytest.param(at.List(element=at.Int64()), np.array([0]), id="ndarray-1d-int64"),
        pytest.param(
            at.List(element=at.List(element=at.Int64())),
            np.array([[0]]),
            id="ndarray-2d-int64",
        ),
        pytest.param(
            at.List(element=at.List(element=at.String())),
            np.array([[""]]),
            id="ndarray-2d-str",
        ),
        pytest.param(at.String(), np.str_, id="str_"),
        pytest.param(at.UInt16(), np.uint16, id="uint16"),
        pytest.param(at.UInt32(), np.uint32, id="uint32"),
        pytest.param(at.UInt64(), np.uint64, id="uint64"),
        pytest.param(at.UInt8(), np.uint8, id="uint8"),
    ],
)
def test_numpy_type_system(arti_type, np_type):
    output_np_type = numpy_type_system.to_system(arti_type, hints={})
    assert (output_np_type == np_type if not isinstance(np_type, np.ndarray) else (output_np_type == np_type).all())
    assert numpy_type_system.to_artigraph(np_type, hints={}) == arti_type


def test_numpy_dtype_matches_scalar():
    # np.dtype("bool") == np.bool_ — dtype objects resolve through the same
    # scalar adapters as the scalar classes.
    assert numpy_type_system.to_artigraph(np.dtype("bool"), hints={}) == at.Boolean()
    assert numpy_type_system.to_artigraph(np.dtype("float32"), hints={}) == at.Float32()


@pytest.mark.parametrize(
    ("arti_type", "pd_type"),
    [
        pytest.param(
            at.List(
                element=at.Struct(
                    fields={
                        "float64": at.Float64(),
                        "int64": at.Int64(),
                        "str": at.String(),
                    }
                )
            ),
            pd.DataFrame({"float64": [0.0], "int64": [0], "str": [""]}),
            id="df",
        ),
        pytest.param(at.List(element=at.Float64()), pd.Series([0.0]), id="series[float64]"),
        pytest.param(at.List(element=at.Int64()), pd.Series([0]), id="series[int64]"),
        pytest.param(at.List(element=at.String()), pd.Series([""]), id="series[string]"),
    ],
)
def test_pandas_type_system(arti_type, pd_type):
    output_pd_type = pandas_type_system.to_system(arti_type, hints={})
    if isinstance(pd_type, pd.DataFrame):
        pd.testing.assert_frame_equal(output_pd_type, pd_type)
    else:
        pd.testing.assert_series_equal(output_pd_type, pd_type)
    assert pandas_type_system.to_artigraph(pd_type, hints={}) == arti_type


def test_pandas_extends_numpy():
    # A bare numpy scalar class isn't a dtype string — it falls through the
    # local adapters to the numpy parent system.
    assert pandas_type_system.to_artigraph(np.float32, hints={}) == at.Float32()


def test_collection_exemplar():
    coll = at.Collection(
        element=at.Struct(fields={"id": at.Int64(), "text": at.String()})
    )
    pdf = collection_to_pandas_exemplar(coll)
    assert list(pdf.columns) == ["id", "text"]
    assert pdf["id"].dtype == np.dtype("int64")


class MyModel(BaseModel):
    x: int
    y: str
    tags: list[str]


def test_pydantic_to_artigraph():
    arti_type = pydantic_type_system.to_artigraph(MyModel, hints={})
    assert isinstance(arti_type, at.Struct)
    assert set(arti_type.fields) == {"x", "y", "tags"}
    assert isinstance(arti_type.fields["x"], at.Int64)
    assert isinstance(arti_type.fields["y"], at.String)
    assert isinstance(arti_type.fields["tags"], at.List)
    assert isinstance(arti_type.fields["tags"].element, at.String)
    assert arti_type.description == "MyModel"


def test_pydantic_round_trip():
    arti_type = pydantic_type_system.to_artigraph(MyModel, hints={})
    model = pydantic_type_system.to_system(arti_type, hints={})
    assert issubclass(model, BaseModel)
    assert model.__name__ == "MyModel"
    got = {k: f.annotation for k, f in model.model_fields.items()}
    assert got["x"] is int  # nullable=False round-trips to a bare annotation
    inst = model(x=1, y="a", tags=["t"])
    assert inst.x == 1


def test_pydantic_nested_struct_to_model():
    nested = at.Struct(
        fields={
            "inner": at.Struct(fields={"a": at.Int64()}, description="Inner"),
            "n": at.Float64(),
        },
        description="Outer",
    )
    model = pydantic_type_system.to_system(nested, hints={})
    inner = model.model_fields["inner"].annotation
    assert issubclass(inner, BaseModel)
    assert inner.__name__ == "Inner"


def test_pandas_array_column_not_flattened():
    """List(List(Float64)) — an embeddings-style array column — must become
    an object-dtype Series of arrays, not a flat float column."""
    coll = at.Collection(
        element=at.Struct(
            fields={"id": at.Int64(), "embedding": at.List(element=at.Float64())}
        )
    )
    pdf = collection_to_pandas_exemplar(coll)
    assert pdf["embedding"].dtype == np.dtype("object")
    assert isinstance(pdf["embedding"].iloc[0], np.ndarray)
    back = pandas_type_system.to_artigraph(pdf["embedding"], hints={})
    assert isinstance(back, at.List)
    assert isinstance(back.element, at.List)
    assert isinstance(back.element.element, at.Float64)

# --- remaining reference case tables (tests/arti/types/test_pandas_adapters.py
# :19-26, test_pydantic_adapters.py:36-159) --------------------------------


@pytest.mark.xfail(
    reason="Map-valued object columns not representable as a pandas dtype "
    "(mirrors the reference xfail, tests/arti/types/test_pandas_adapters.py:25)"
)
def test_pandas_complex_object_columns():
    coll = at.List(
        element=at.Struct(
            fields={
                "dict": at.Map(key=at.String(), value=at.Int64()),
                "list": at.List(element=at.Int64()),
            }
        )
    )
    out = pandas_type_system.to_system(coll, hints={})
    pd.testing.assert_frame_equal(out, pd.DataFrame({"dict": [{"": 0}], "list": [[0]]}))


class ComplexModel(BaseModel):
    """Mirrors the reference compare_model_to_* coverage: Mapping, sequence
    tuple, and Literal fields (tests/arti/types/test_pydantic_adapters.py:
    60-144)."""

    flags: dict[str, int]
    pair_seq: tuple[int, ...]
    mode: Literal["a", "b"]
    sub: MyModel


def test_pydantic_complex_fields_to_artigraph():
    t = pydantic_type_system.to_artigraph(ComplexModel, hints={})
    assert isinstance(t, at.Struct) and t.description == "ComplexModel"
    assert isinstance(t.fields["flags"], at.Map)
    assert isinstance(t.fields["flags"].key, at.String)
    assert isinstance(t.fields["flags"].value, at.Int64)
    # Sequence-like tuples convert as List (reference PyTuple contract).
    assert isinstance(t.fields["pair_seq"], at.List)
    assert isinstance(t.fields["pair_seq"].element, at.Int64)
    assert isinstance(t.fields["mode"], at.Enum)
    assert isinstance(t.fields["mode"].type, at.String)
    assert set(t.fields["mode"].items) == {"a", "b"}
    # Nested models recurse into nested Structs.
    assert isinstance(t.fields["sub"], at.Struct)
    assert isinstance(t.fields["sub"].fields["x"], at.Int64)


def test_pydantic_complex_fields_round_trip():
    """Reference compare_model_to_generated contract: Mapping→Mapping,
    tuple→list on the way out, Literal→Literal with the same value set,
    nested models regenerate as BaseModel subclasses."""
    from typing import get_args, get_origin

    t = pydantic_type_system.to_artigraph(ComplexModel, hints={})
    model = pydantic_type_system.to_system(t, hints={})
    assert issubclass(model, BaseModel) and model.__name__ == "ComplexModel"
    ann = {k: f.annotation for k, f in model.model_fields.items()}
    assert get_origin(ann["flags"]) is dict
    assert get_args(ann["flags"]) == (str, int)
    assert get_origin(ann["pair_seq"]) is list  # tuples come back as lists
    assert get_args(ann["pair_seq"]) == (int,)
    assert get_origin(ann["mode"]) is Literal
    assert set(get_args(ann["mode"])) == {"a", "b"}
    sub = ann["sub"]
    assert issubclass(sub, BaseModel) and sub.__name__ == "MyModel"
    inst = model(flags={"k": 1}, pair_seq=[1, 2], mode="a", sub={"x": 1, "y": "s", "tags": []})
    assert inst.flags == {"k": 1} and inst.mode == "a"


def test_pydantic_enum_field_naming():
    """Reference test_pydantic_field_naming (tests/arti/types/
    test_pydantic_adapters.py:36-41): converting a model whose field is a
    constrained Literal yields an Enum in that field slot."""

    class Shipment(BaseModel):
        precision: Literal["s", "ms", "us"]

    t = pydantic_type_system.to_artigraph(Shipment, hints={})
    assert isinstance(t, at.Struct)
    assert isinstance(t.fields["precision"], at.Enum)
    assert set(t.fields["precision"].items) == {"s", "ms", "us"}


def test_arrow_roundtrip_time_units_and_element_nullability():
    """Time precisions map to matching arrow units (time32 s/ms, time64
    us/ns) and list/set/map element nullability rides on the item field —
    both previously collapsed to defaults, drifting fingerprints."""
    import pyarrow as pa

    from artigraph_spark import types as at
    from artigraph_spark.types.arrow import from_arrow, to_arrow

    for prec in ("second", "millisecond", "microsecond", "nanosecond"):
        t = at.Time(precision=prec)
        assert from_arrow(to_arrow(t)) == t
    lst = at.List(element=at.Int64(nullable=False), nullable=False)
    assert from_arrow(to_arrow(lst), nullable=False) == lst
    m = at.Map(key=at.String(nullable=False), value=at.Int64(nullable=False), nullable=False)
    assert from_arrow(to_arrow(m), nullable=False) == m
    assert to_arrow(lst).value_field.nullable is False
    assert isinstance(to_arrow(at.Time(precision="second")), type(pa.time32("s")))


def test_arrow_schema_roundtrips_set_enum_geography_identity():
    """Set-vs-List, Enum items, and Geography identity travel in FIELD
    metadata through collection_to_arrow_schema (arrow DataTypes have no
    metadata slot; fields do)."""
    from artigraph_spark import types as at
    from artigraph_spark.types.arrow import (
        arrow_schema_to_collection,
        collection_to_arrow_schema,
    )

    coll = at.Collection(
        element=at.Struct(
            fields={
                "tags": at.Set(element=at.String(nullable=False), nullable=False),
                "status": at.Enum(type=at.String(nullable=False), items=("a", "b"), nullable=False),
                "geo": at.Geography(format="WKT", srid="4326", nullable=False),
                "n": at.Int64(),
            }
        ),
        partition_by=("n",),
    )
    back = arrow_schema_to_collection(collection_to_arrow_schema(coll))
    assert isinstance(back.element.fields["tags"], at.Set)
    assert back.element.fields["status"] == coll.element.fields["status"]
    assert back.element.fields["geo"] == coll.element.fields["geo"]
    assert back.partition_by == ("n",)


def test_spark_schema_no_shared_metadata_mutation():
    """collection_to_schema must not write layout into the module-level
    lossy-metadata tables: a UInt8-first partitioned collection used to
    corrupt every later conversion."""
    from artigraph_spark import types as at
    from artigraph_spark.types.spark import (
        collection_to_schema,
        schema_to_collection,
        struct_to_spark,
    )

    coll = at.Collection(
        element=at.Struct(fields={"u": at.UInt8(), "d": at.Date()}),
        partition_by=("d",),
    )
    collection_to_schema(coll)
    # An unrelated UInt8 struct must convert cleanly afterwards.
    back = schema_to_collection(struct_to_spark(at.Struct(fields={"x": at.UInt8()})))
    assert back.partition_by == ()
    assert isinstance(back.element.fields["x"], at.UInt8)


def test_spark_roundtrip_precision_and_map_keys():
    """second/millisecond timestamp precision and lossy MAP KEY types must
    survive the Spark bridge (both previously collapsed to defaults)."""
    from artigraph_spark import types as at
    from artigraph_spark.types.spark import schema_to_collection, collection_to_schema

    coll = at.Collection(
        element=at.Struct(
            fields={
                "ts": at.Timestamp(precision="second"),
                "dt": at.DateTime(precision="millisecond"),
                "m": at.Map(key=at.UInt8(nullable=False), value=at.Int64(), nullable=False),
            }
        )
    )
    back = schema_to_collection(collection_to_schema(coll))
    assert back.element.fields["ts"] == coll.element.fields["ts"]
    assert back.element.fields["dt"] == coll.element.fields["dt"]
    assert isinstance(back.element.fields["m"].key, at.UInt8)


def test_pandas_exemplar_supports_temporal_columns():
    """Date/Timestamp columns must produce a pandas exemplar (and the
    pandas view must accept such collections) instead of raising
    TypeError through np.dtype(pa.DataType)."""
    from artigraph_spark import types as at
    from artigraph_spark.types.pandas import collection_to_pandas_exemplar
    from artigraph_spark.views import PandasDataFrameView

    coll = at.Collection(
        element=at.Struct(
            fields={
                "d": at.Date(),
                "ts": at.Timestamp(),
                "ntz": at.DateTime(),
                "t": at.Time(),
                "n": at.Int64(),
            }
        )
    )
    df = collection_to_pandas_exemplar(coll)
    assert set(df.columns) == {"d", "ts", "ntz", "t", "n"}
    assert PandasDataFrameView.supports_type(coll)


def test_heterogeneous_tuple_annotation_rejected():
    import pytest

    from artigraph_spark import types as at
    from artigraph_spark.types.python import to_artigraph

    with pytest.raises(NotImplementedError, match="heterogeneous"):
        to_artigraph(tuple[int, str])
    got = to_artigraph(tuple[int, ...])
    assert isinstance(got, at.List) and isinstance(got.element, at.Int64)
