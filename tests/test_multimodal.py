"""Multimodal plumbing: binary columns, mapInPandas decode, frame sampling.
Pixel/sample decode has no codecs in this env, but decoder="real" does a real
container-header parse (PNG/JPEG/GIF/WAV); tests cover the distributed shape
(schemas, batching, determinism, row expansion) plus header semantics."""

import pytest
from pyspark.sql import functions as F

from artigraph_spark.operators import multimodal as mm


@pytest.fixture()
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    return mm.attach_binary_payload(docs, "text", "doc_id")


def test_payload_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "mime", "meta"]
    row = media.first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["meta"]["codec"] == "utf-8"


def test_extract_features_deterministic(media):
    f1 = mm.extract_features(media, decoder="fake").collect()
    f2 = mm.extract_features(media.repartition(7), decoder="fake").collect()
    by_id_1 = {r["media_id"]: (r["n_bytes"], r["width"], r["height"], tuple(r["feature"])) for r in f1}
    by_id_2 = {r["media_id"]: (r["n_bytes"], r["width"], r["height"], tuple(r["feature"])) for r in f2}
    assert by_id_1 == by_id_2  # partitioning-independent
    assert all(len(v[3]) == 8 for v in by_id_1.values())
    assert all(1 <= v[1] <= 640 and 1 <= v[2] <= 480 for v in by_id_1.values())


def test_real_decoder_parses_headers(spark):
    # "real" resolves to the pure-stdlib container-header parser: dims come
    # from the actual PNG/JPEG headers; feature stays None (no pixel decode).
    rows = [
        (1, mm.png_bytes(320, 200), "image/png", {}),
        (2, mm.jpeg_bytes(64, 48), "image/jpeg", {}),
        (3, b"not a media file", "application/octet-stream", {}),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.extract_features(media, decoder="real").collect()}
    assert (out[1]["width"], out[1]["height"]) == (320, 200)
    assert (out[2]["width"], out[2]["height"]) == (64, 48)
    assert out[3]["width"] is None and out[3]["height"] is None  # garbage → NULLs
    assert all(r["feature"] is None for r in out.values())


def test_jpeg_eoi_terminates_marker_walk():
    # Dimensions must never be read from bytes after EOI (trailing garbage or
    # a concatenated second stream).
    truncated = b"\xff\xd8" + b"\xff\xd9"  # SOI then EOI, no frame header
    trailing = truncated + mm.jpeg_bytes(99, 77)[2:]  # SOF only after EOI
    h = mm.parse_media_header(trailing)
    assert h["codec"] == "jpeg" and h["width"] is None and h["height"] is None
    # RSTn standalone markers are still skipped correctly before SOF.
    rst = b"\xff\xd8" + b"\xff\xd0" + mm.jpeg_bytes(31, 17)[2:]
    h2 = mm.parse_media_header(rst)
    assert (h2["width"], h2["height"]) == (31, 17)


def test_resize_stub_annotates_meta(media):
    out = mm.resize_stub(media, width=64, height=64).first()
    assert out["meta"]["resize"] == "64x64"


def test_frame_sample_expansion(media):
    frames = mm.frame_sample_stub(media, every_n=100)
    agg = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    n_bytes = {r["media_id"]: r["n_bytes"] for r in
               mm.extract_features(media, decoder="fake").collect()}
    for r in agg:
        expected = max(n_bytes[r["media_id"]] // 100, 1)
        assert r["n"] == expected
