"""Raw-file ingestion: binaryFile media scans, text corpora, Text format IO."""

import os

import pytest

from artigraph_spark import io
from artigraph_spark import types as at
from artigraph_spark.formats import Text
from artigraph_spark.operators import multimodal as mm
from artigraph_spark.partitions import PartitionKey
from artigraph_spark.sources.files import (
    documents_from_text_files,
    media_from_binary_files,
    read_binary_files,
    read_text_lines,
)
from artigraph_spark.storage import LocalFile, StoragePartition
from artigraph_spark.views import SparkDataFrameView


@pytest.fixture()
def media_dir(tmp_path):
    d = tmp_path / "lake"
    (d / "sub").mkdir(parents=True)
    (d / "a.png").write_bytes(b"\x89PNG-fake-payload")
    (d / "b.wav").write_bytes(b"RIFF-fake-audio")
    (d / "sub" / "c.unknownext").write_bytes(b"opaque")
    (d / "notes.txt").write_text("hello\nworld\n")
    return str(d)


def test_read_binary_files_schema_and_content(spark, media_dir):
    df = read_binary_files(spark, media_dir)
    assert {f.name for f in df.schema.fields} == {
        "path", "modificationTime", "length", "content",
    }
    rows = {os.path.basename(r["path"]): bytes(r["content"]) for r in df.collect()}
    assert rows["a.png"] == b"\x89PNG-fake-payload"
    assert rows["c.unknownext"] == b"opaque"  # recursive lookup


def test_read_binary_files_glob_prunes_listing(spark, media_dir):
    df = read_binary_files(spark, media_dir, glob="*.png")
    assert [os.path.basename(r["path"]) for r in df.collect()] == ["a.png"]


def test_media_from_binary_files_shape(spark, media_dir):
    media = media_from_binary_files(spark, media_dir)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "mime", "meta",
    ]
    by_path = {r["meta"]["path"]: r for r in media.collect()}
    png = next(r for p, r in by_path.items() if p.endswith("a.png"))
    assert png["mime"] == "image/png"
    assert bytes(png["payload"]) == b"\x89PNG-fake-payload"
    assert png["meta"]["n_bytes"] == str(len(b"\x89PNG-fake-payload"))
    unknown = next(r for p, r in by_path.items() if p.endswith("c.unknownext"))
    assert unknown["mime"] == "application/octet-stream"
    # ids deterministic across scans
    again = {r["meta"]["path"]: r["media_id"] for r in media_from_binary_files(spark, media_dir).collect()}
    assert {p: r["media_id"] for p, r in by_path.items()} == again


def test_media_scan_feeds_feature_extraction(spark, media_dir):
    media = media_from_binary_files(spark, media_dir, glob="*.png")
    feats = mm.extract_features(media, decoder="fake").collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 8


def test_read_text_lines(spark, media_dir):
    lines = read_text_lines(spark, os.path.join(media_dir, "notes.txt")).collect()
    assert sorted(r["line"] for r in lines) == ["hello", "world"]
    assert all(r["file"].endswith("notes.txt") for r in lines)


def test_documents_from_text_files(spark, media_dir):
    docs = documents_from_text_files(spark, media_dir, glob="*.txt")
    rows = docs.collect()
    assert [f.name for f in docs.schema.fields] == ["doc_id", "source", "text"]
    assert len(rows) == 1
    assert rows[0]["text"] == "hello\nworld\n"


def test_text_format_round_trip(spark, tmp_path):
    t = at.Collection(element=at.Struct(fields={"text": at.String()}))
    part = StoragePartition(
        path=str(tmp_path / "corpus"), partition_key=PartitionKey.not_partitioned()
    )
    df = spark.createDataFrame([("alpha",), ("beta",)], "text string")
    io.write(df, t, Text(), part, SparkDataFrameView, spark)
    back = io.read(t, Text(), LocalFile(), [part], SparkDataFrameView, spark)
    assert sorted(r["text"] for r in back.collect()) == ["alpha", "beta"]


def test_text_format_requires_single_string_column(spark, tmp_path):
    t = at.Collection(
        element=at.Struct(fields={"a": at.String(), "b": at.Int64()})
    )
    part = StoragePartition(
        path=str(tmp_path / "bad"), partition_key=PartitionKey.not_partitioned()
    )
    df = spark.createDataFrame([("x", 1)], "a string, b long")
    with pytest.raises(ValueError, match="exactly one String field"):
        io.write(df, t, Text(), part, SparkDataFrameView, spark)
