"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-preserving
``mapInPandas`` over Arrow batches, deterministic batch shapes. The actual
media decoding is STUBBED (``NotImplementedError`` behind
``decoder="real"``): the image/audio libraries are not in this container.
``decoder="fake"`` provides a deterministic, content-derived stand-in so
pipelines and tests exercise the full distributed path.

At 100 TB: binary payloads stay columnar (parquet binary with dictionary
off), batches stream through Arrow without driver involvement, and the UDF
cost is amortized per-batch, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from a text fixture: payload = UTF-8 bytes, with
    typed metadata — the schema/partitioning shape of a real media lake."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(
            F.lit("source"), F.lit("fixture"), F.lit("codec"), F.lit("utf-8")
        ).alias("meta"),
    )


def _fake_decode(payload: bytes | None) -> dict[str, Any]:
    """Deterministic stand-in decode: derives 'dimensions' and an 8-dim
    'feature' purely from the bytes, so results are stable across runs,
    partitionings, and engines."""
    if payload is None:
        return {"width": None, "height": None, "feature": None}
    n = len(payload)
    width = (n % 640) + 1
    height = ((n * 7919) % 480) + 1
    feature = [float((payload[i % n] if n else 0) * (i + 1) % 256) / 256.0 for i in range(8)]
    return {"width": width, "height": height, "feature": feature}


def _real_decode(payload: bytes | None) -> dict[str, Any]:
    raise NotImplementedError(
        "real media decoding requires image/audio libraries not present in "
        "this environment; use decoder='fake' or install decoders and extend "
        "_real_decode"
    )


def extract_features(media: DataFrame, *, decoder: str = "fake", batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched, partition-
    preserving — no shuffle; scales linearly with executors)."""
    decode = {"fake": _fake_decode, "real": _real_decode}[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through a mapInPandas stage that
    records the requested dims in metadata (real resampling is decoder
    territory — stubbed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                {**(m if isinstance(m, dict) else {}), "resize": f"{width}x{height}"}
                for m in pdf["meta"]
            ]
            out = pdf.copy()
            out["meta"] = meta
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no) rows per
    asset — the row-expansion shape of real frame extraction, driven by
    payload size as a deterministic stand-in for duration."""
    frames = F.sequence(
        F.lit(0), F.greatest((F.length("payload") / every_n).cast("int") - 1, F.lit(0))
    )
    return media.select(
        "media_id", F.explode(frames).alias("frame_no"), F.lit(every_n).alias("stride")
    )
