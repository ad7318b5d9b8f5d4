"""IO registry dispatch (mirrors tests/arti/io/test_localfile_io.py /
test_literal_io.py): per-(format, storage, view) round trips + lookup errors."""

import pytest

from artigraph_spark import io
from artigraph_spark import types as at
from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.formats import CSV, JSON, ORC, Parquet, Pickle
from artigraph_spark.partitions import PartitionKey
from artigraph_spark.storage import LocalFile, StoragePartition, StringLiteral
from artigraph_spark.views import PythonListView, PythonScalarView, SparkDataFrameView

COLL = at.Collection(element=at.Struct(fields={"a": at.Int64(), "b": at.String()}))


def _partition(tmp_path, name):
    return StoragePartition(path=str(tmp_path / name), partition_key=PartitionKey.not_partitioned())


@pytest.mark.parametrize("fmt", [Parquet(), JSON(), CSV(), ORC()])
def test_dataframe_round_trip(spark, tmp_path, fmt):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string")
    p = _partition(tmp_path, type(fmt).__name__.lower())
    io.write(df, COLL, fmt, p, SparkDataFrameView, spark)
    back = io.read(COLL, fmt, LocalFile(), [p], SparkDataFrameView, spark)
    assert sorted((r["a"], r["b"]) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_json_python_list_round_trip(spark, tmp_path):
    data = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
    p = _partition(tmp_path, "pylist")
    io.write(data, COLL, JSON(), p, PythonListView, spark)
    back = io.read(COLL, JSON(), LocalFile(), [p], PythonListView, spark)
    assert back == data


def test_python_list_reads_spark_written_json(spark, tmp_path):
    """The driver-local list view must read Spark's line-delimited JSON."""
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    p = _partition(tmp_path, "mixed")
    io.write(df, COLL, JSON(), p, SparkDataFrameView, spark)
    back = io.read(COLL, JSON(), LocalFile(), [p], PythonListView, spark)
    assert back == [{"a": 1, "b": "x"}]


def test_scalar_and_pickle_round_trip(spark, tmp_path):
    p = _partition(tmp_path, "scalar")
    io.write(42, at.Int64(), JSON(), p, PythonScalarView, spark)
    assert io.read(at.Int64(), JSON(), LocalFile(), [p], PythonScalarView, spark) == 42
    p2 = _partition(tmp_path, "pickled")
    io.write({"k": (1, 2)}, at.Map(key=at.String(), value=at.Int64()), Pickle(), p2, PythonScalarView, spark)
    assert io.read(
        at.Map(key=at.String(), value=at.Int64()), Pickle(), LocalFile(), [p2], PythonScalarView, spark
    ) == {"k": (1, 2)}


def test_literal_reads(spark):
    lit = StringLiteral(value='[{"a": 1, "b": "x"}]')
    parts = lit.discover_partitions({})
    assert io.read(COLL, JSON(), lit, parts, PythonListView, spark) == [{"a": 1, "b": "x"}]
    df = io.read(COLL, JSON(), lit, parts, SparkDataFrameView, spark)
    assert df.collect()[0]["a"] == 1


def test_no_partitions_raises(spark):
    with pytest.raises(FileNotFoundError, match="No data"):
        io.read(COLL, JSON(), LocalFile(), [], SparkDataFrameView, spark)


def test_multi_partition_requires_partitioned_collection(spark, tmp_path):
    parts = [_partition(tmp_path, "p1"), _partition(tmp_path, "p2")]
    with pytest.raises(ValueError, match="partitioned Collection"):
        io.read(COLL, JSON(), LocalFile(), parts, SparkDataFrameView, spark)


def test_unregistered_combination_raises(spark, tmp_path):
    with pytest.raises(LookupError, match="no IO handler"):
        io.read(COLL, Pickle(), LocalFile(), [_partition(tmp_path, "x")], SparkDataFrameView, spark)


def test_can_read_lookup():
    assert io.can_read(Parquet(), LocalFile(), SparkDataFrameView)
    assert not io.can_read(Pickle(), StringLiteral(), SparkDataFrameView)


def test_pandas_dataframe_round_trip(spark, tmp_path):
    """PandasDataFrameView: pandas in, Arrow-bridged parquet, pandas out —
    with the declared schema (not inference) governing both directions."""
    import pandas as pd

    from artigraph_spark.views import PandasDataFrameView

    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    p = _partition(tmp_path, "pandas")
    io.write(pdf, COLL, Parquet(), p, PandasDataFrameView, spark)
    back = io.read(COLL, Parquet(), LocalFile(), [p], PandasDataFrameView, spark)
    assert isinstance(back, pd.DataFrame)
    assert sorted(zip(back["a"], back["b"])) == [(1, "x"), (2, "y")]


def test_pandas_view_annotation_and_type_support():
    import pandas as pd

    from artigraph_spark.views import PandasDataFrameView, view_for_annotation

    assert view_for_annotation(pd.DataFrame) is PandasDataFrameView
    assert PandasDataFrameView.supports_type(COLL)
    assert not PandasDataFrameView.supports_type(at.Int64())


def test_pandas_write_respects_column_names_not_positions(spark, tmp_path):
    """A reordered pandas frame must still write values under the declared
    column names (createDataFrame maps by position; the writer realigns)."""
    import pandas as pd

    from artigraph_spark.views import PandasDataFrameView

    coll = at.Collection(element=at.Struct(fields={"x": at.String(), "y": at.String()}))
    pdf = pd.DataFrame({"y": ["Y1"], "x": ["X1"]})  # reversed order
    p = _partition(tmp_path, "pandas_reorder")
    io.write(pdf, coll, Parquet(), p, PandasDataFrameView, spark)
    back = io.read(coll, Parquet(), LocalFile(), [p], PandasDataFrameView, spark)
    assert back.iloc[0]["x"] == "X1"
    assert back.iloc[0]["y"] == "Y1"
