"""Type tree + spark/python bridges (mirrors the reference's
tests/arti/types/test_types.py and test_pyarrow_adapters.py round-trips)."""

import pytest
from pyspark.sql import types as T

from artigraph_spark import types as at
from artigraph_spark.types import python as pyts
from artigraph_spark.types import spark as sts


def test_collection_validators():
    struct = at.Struct(fields={"a": at.Int64(), "b": at.String()})
    at.Collection(element=struct, partition_by=("a",))
    with pytest.raises(ValueError, match="unknown fields"):
        at.Collection(element=struct, partition_by=("missing",))
    with pytest.raises(ValueError, match="overlap"):
        at.Collection(element=struct, partition_by=("a",), cluster_by=("a",))


def test_enum_validators():
    with pytest.raises(ValueError, match="at least one"):
        at.Enum(type=at.String(), items=())
    with pytest.raises(ValueError, match="unique"):
        at.Enum(type=at.String(), items=("x", "x"))


def test_enum_item_type_compatibility():
    # Reference contract (tests/arti/types/test_types.py:105-115): items must
    # match the base type's python representation.
    at.Enum(type=at.Float32(), items=(1.0, 2.0, 3.0))
    with pytest.raises(ValueError, match=r"incompatible Float32.*\[1, 2, 3\]"):
        at.Enum(type=at.Float32(), items=(1, 2, 3))
    with pytest.raises(ValueError, match=r"incompatible Float32.*\[3\]"):
        at.Enum(type=at.Float32(), items=(1.0, 2.0, 3))
    with pytest.raises(ValueError, match="incompatible Int64"):
        at.Enum(type=at.Int64(), items=(True,))  # bool is not an int item


def test_description_not_fingerprinted():
    a = at.Int64(description="one thing")
    b = at.Int64(description="another thing")
    assert a.fingerprint == b.fingerprint
    assert at.Int64().fingerprint != at.Int32().fingerprint


@pytest.mark.parametrize(
    "arti_type,spark_type",
    [
        (at.Boolean(), T.BooleanType()),
        (at.Int8(), T.ByteType()),
        (at.Int16(), T.ShortType()),
        (at.Int32(), T.IntegerType()),
        (at.Int64(), T.LongType()),
        (at.Float32(), T.FloatType()),
        (at.Float64(), T.DoubleType()),
        (at.String(), T.StringType()),
        (at.Binary(), T.BinaryType()),
        (at.Date(), T.DateType()),
        (at.Timestamp(), T.TimestampType()),
        (at.DateTime(), T.TimestampNTZType()),
        (at.Null(), T.NullType()),
    ],
)
def test_simple_spark_mapping(arti_type, spark_type):
    assert sts.to_spark_type(arti_type) == spark_type


def test_lossy_bridges_round_trip_via_metadata():
    """uint/time/enum/set/geography survive a schema round-trip through field
    metadata (the pyarrow-adapter trick re-expressed on Spark)."""
    struct = at.Struct(
        fields={
            "u8": at.UInt8(),
            "u64": at.UInt64(),
            "t": at.Time(precision="millisecond"),
            "e": at.Enum(type=at.String(), items=("a", "b")),
            "s": at.Set(element=at.Int64(nullable=False)),
            "g": at.Geography(format="WKB", srid="EPSG:4326"),
            "f16": at.Float16(),
        }
    )
    schema = sts.struct_to_spark(struct)
    back = sts.spark_to_struct(schema)
    assert back.fields["u8"] == at.UInt8()
    assert back.fields["u64"] == at.UInt64()
    assert back.fields["t"] == at.Time(precision="millisecond")
    assert back.fields["e"] == at.Enum(type=at.String(), items=("a", "b"))
    assert isinstance(back.fields["s"], at.Set)
    assert back.fields["g"] == at.Geography(format="WKB", srid="EPSG:4326")
    assert back.fields["f16"] == at.Float16()


def test_collection_layout_round_trip():
    coll = at.Collection(
        element=at.Struct(fields={"d": at.Date(), "x": at.Int64(), "y": at.Float64()}),
        partition_by=("d",),
        cluster_by=("x",),
    )
    schema = sts.collection_to_schema(coll)
    back = sts.schema_to_collection(schema)
    assert back.partition_by == ("d",)
    assert back.cluster_by == ("x",)
    assert back.element.fields.keys() == coll.element.fields.keys()


def test_nested_containers_round_trip():
    struct = at.Struct(
        fields={
            "arr": at.List(element=at.Struct(fields={"x": at.Int32()}, nullable=False)),
            "m": at.Map(key=at.String(nullable=False), value=at.Float64()),
        }
    )
    back = sts.spark_to_struct(sts.struct_to_spark(struct))
    assert isinstance(back.fields["arr"], at.List)
    assert isinstance(back.fields["arr"].element, at.Struct)
    assert isinstance(back.fields["m"], at.Map)


def test_python_inference():
    assert pyts.to_artigraph(int) == at.Int64(nullable=False)
    assert pyts.to_artigraph(str) == at.String(nullable=False)
    assert pyts.to_artigraph(int | None) == at.Int64(nullable=True)
    assert pyts.to_artigraph(list[int]) == at.List(
        element=at.Int64(nullable=False), nullable=False
    )
    t = pyts.to_artigraph(dict[str, float])
    assert isinstance(t, at.Map)
    assert pyts.to_python(at.Int64(nullable=False)) is int
