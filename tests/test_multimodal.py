"""Multimodal plumbing: binary columns, mapInPandas decode stub, frame
sampling. The decode itself is stubbed (no codecs in env) — what's tested is
the real distributed shape: schemas, batching, determinism, row expansion."""

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


def test_real_decoder_is_explicit_stub(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        mm.extract_features(media, decoder="real").collect()


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
