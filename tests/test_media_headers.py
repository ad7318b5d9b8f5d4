"""Pure-stdlib media header parsing: round-trip through real container
bytes, garbage tolerance, and the binaryFile-lake → decoded-metadata path."""

from artigraph_spark.operators.multimodal import (
    decode_media_headers,
    gif_bytes,
    jpeg_bytes,
    parse_media_header,
    png_bytes,
    synthesize_media,
    wav_bytes,
)
from artigraph_spark.sources.files import media_from_binary_files


def test_png_round_trip():
    h = parse_media_header(png_bytes(640, 480))
    assert (h["codec"], h["width"], h["height"], h["channels"]) == ("png", 640, 480, 3)
    grey = parse_media_header(png_bytes(10, 20, color_type=0))
    assert grey["channels"] == 1
    rgba = parse_media_header(png_bytes(10, 20, color_type=6))
    assert rgba["channels"] == 4


def test_jpeg_round_trip_walks_markers():
    # jpeg_bytes inserts a COM segment before SOF0 — the parser must skip it.
    h = parse_media_header(jpeg_bytes(1920, 1080))
    assert (h["codec"], h["width"], h["height"], h["channels"]) == ("jpeg", 1920, 1080, 3)
    mono = parse_media_header(jpeg_bytes(8, 8, n_channels=1))
    assert mono["channels"] == 1


def test_gif_and_wav():
    g = parse_media_header(gif_bytes(320, 200))
    assert (g["codec"], g["width"], g["height"]) == ("gif", 320, 200)
    w = parse_media_header(wav_bytes(2, 44100))
    assert (w["codec"], w["channels"], w["sample_rate"]) == ("wav", 2, 44100)
    assert w["width"] is None and w["height"] is None


def test_garbage_and_truncated_payloads():
    assert parse_media_header(None)["codec"] is None
    assert parse_media_header(b"")["codec"] is None
    assert parse_media_header(b"not media at all")["codec"] is None
    # Truncated PNG: signature present, IHDR cut — codec only, no dims.
    trunc = parse_media_header(png_bytes(9, 9)[:12])
    assert trunc["codec"] is None or trunc["width"] is None
    # Truncated JPEG: SOI only.
    assert parse_media_header(b"\xff\xd8")["width"] is None


def test_synthesize_and_decode_distributed(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "media_id")
    out = decode_media_headers(synthesize_media(df, "media_id")).collect()
    assert len(out) == 40
    by_id = {r["media_id"]: r for r in out}
    assert by_id[0]["codec"] == "png" and by_id[0]["width"] == 16
    assert by_id[1]["codec"] == "jpeg" and by_id[1]["height"] == 17
    assert by_id[2]["codec"] == "gif" and by_id[2]["channels"] == 1
    assert by_id[3]["codec"] == "wav" and by_id[3]["channels"] == 2
    assert by_id[3]["sample_rate"] == 8000 + 3 * 1000


def test_binary_file_lake_to_decoded_headers(tmp_path, spark):
    """End-to-end: files on disk → binaryFile scan → header decode."""
    (tmp_path / "a.png").write_bytes(png_bytes(100, 50))
    (tmp_path / "b.jpg").write_bytes(jpeg_bytes(30, 40))
    (tmp_path / "c.wav").write_bytes(wav_bytes(1, 16000))
    (tmp_path / "junk.bin").write_bytes(b"\x00\x01\x02")
    media = media_from_binary_files(spark, str(tmp_path))
    rows = {r["mime"]: r for r in decode_media_headers(media).collect()}
    assert rows["image/png"]["width"] == 100 and rows["image/png"]["codec"] == "png"
    assert rows["image/jpeg"]["height"] == 40
    assert rows["audio/wav"]["sample_rate"] == 16000
    assert rows["application/octet-stream"]["codec"] is None


def test_mp4_roundtrip_and_truncation():
    from artigraph_spark.operators.multimodal import mp4_bytes, parse_media_header

    b = mp4_bytes(1920, 1080, duration_ms=42_000)
    h = parse_media_header(b)
    assert (h["codec"], h["width"], h["height"]) == ("mp4", 1920, 1080)
    # truncated mid-box: codec recognized, dims honest None
    # truncation anywhere must yield honest None dims, never tail bytes
    for cut in (4, 8, 20, len(b) - 20):
        t = parse_media_header(b[:cut] if cut >= 20 else b[:-cut])
        assert t["codec"] == "mp4" and t["width"] is None, cut
    # garbage after a valid ftyp magic: no crash
    g = parse_media_header(b[:12] + b"\xff" * 8)
    assert g["codec"] == "mp4"


def test_mp4_oversized_moov_does_not_crash_sampler(spark):
    """A moov whose declared size overruns the buffer (with a non-mvhd
    child) previously drove the duration walk past the payload end —
    struct.error out of mapInPandas. Now it degrades to zero frames."""
    import struct

    from pyspark.sql import functions as F

    from artigraph_spark.operators.multimodal import MEDIA_SCHEMA, video_frame_instants

    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    bad = (
        box(b"ftyp", b"isom")
        + struct.pack(">I", 300)
        + b"moov"
        + box(b"free", b"xx")
    )
    media = spark.createDataFrame(
        [(1, bytearray(bad), "video/mp4", {})], MEDIA_SCHEMA
    )
    assert video_frame_instants(media, every_ms=500).count() == 0


def test_frame_sampling_counts_follow_duration(spark):
    from pyspark.sql import functions as F

    from artigraph_spark.operators.multimodal import synthesize_video, video_frame_instants

    d = spark.range(4).select(F.col("id").alias("doc_id"))
    media = synthesize_video(d, "doc_id")
    frames = video_frame_instants(media, every_ms=500)
    counts = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # duration = 1000 + (id % 60)*500 ms → 500 ms sampling → 2 + id frames
    assert counts == {0: 2, 1: 3, 2: 4, 3: 5}


def test_frame_sampling_validates_step(spark):
    import pytest as _pytest

    from artigraph_spark.operators.multimodal import synthesize_video, video_frame_instants
    from pyspark.sql import functions as F

    d = spark.range(1).select(F.col("id").alias("doc_id"))
    with _pytest.raises(ValueError, match="every_ms"):
        video_frame_instants(synthesize_video(d, "doc_id"), every_ms=0)
