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
