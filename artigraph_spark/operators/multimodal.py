"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-preserving
``mapInPandas`` over Arrow batches, deterministic batch shapes.
``decoder="real"`` (alias ``"header"``) performs a REAL pure-stdlib
container-header parse (PNG IHDR / JPEG SOF marker walk / GIF screen
descriptor / WAV fmt chunk): genuine decoded metadata with ``feature=None``,
since pixel/sample-level decoding needs image/audio libraries not present in
this container. ``decoder="fake"`` provides a deterministic, content-derived
stand-in (dims *and* an 8-dim feature) so pipelines and tests exercise the
full distributed path including the feature column.

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

HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def png_bytes(width: int, height: int, *, color_type: int = 2, bit_depth: int = 8) -> bytes:
    """Minimal valid PNG prefix (signature + IHDR chunk with CRC). Test/
    fixture generator for the header parser — not a renderable image."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def jpeg_bytes(width: int, height: int, *, n_channels: int = 3) -> bytes:
    """Minimal JPEG prefix: SOI + a COM segment (exercises marker walking)
    + SOF0 frame header carrying the dimensions."""
    import struct

    comment = b"hdr"
    com = b"\xff\xfe" + struct.pack(">H", 2 + len(comment)) + comment
    sof_payload = struct.pack(">BHHB", 8, height, width, n_channels) + bytes(
        b for c in range(n_channels) for b in (c + 1, 0x11, 0)
    )
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + com + sof


def gif_bytes(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor (little-endian dims)."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def wav_bytes(channels: int, sample_rate: int) -> bytes:
    """RIFF/WAVE header + fmt chunk (PCM, 16-bit), no sample data."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt


def mp4_bytes(width: int, height: int, duration_ms: int = 1000) -> bytes:
    """Minimal ISO-BMFF (MP4) skeleton: ftyp + moov(mvhd + trak(tkhd)) with
    16.16 fixed-point track dimensions — the real box layout, no media data."""
    import struct

    def box(t: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + t + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)  # version+flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", 1000, duration_ms)  # timescale, duration
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">I", 0)
        + struct.pack(">IIII", 0, 0, 1, 0)  # ctime, mtime, track_id, reserved
        + struct.pack(">I", duration_ms)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, reserved
        + b"\x00" * 36  # identity matrix slot (zeros fine for parsing)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (greyscale, RGB, palette, grey+A, RGBA).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOF markers (frame headers carrying dimensions): C0-CF minus C4 (DHT),
# C8 (JPG extension) and CC (DAC), which are not frame headers.
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
# TEM + RSTn only: SOI (D8) and EOI (D9) are also standalone but handled
# explicitly below — EOI must terminate the walk, not be skipped over.
_JPEG_STANDALONE = {0x01, *range(0xD0, 0xD8)}


def _iter_boxes(payload: bytes, lo: int, hi: int, want: bytes):
    """Yield PAYLOAD spans (start, end, complete) of every ISO-BMFF box of
    type ``want`` inside [lo, hi) — ``complete`` is False when the box's
    declared size overruns the buffer; callers must not read fixed-offset
    fields from an incomplete box. Handles the full size grammar: size==0
    (box extends to the end of the enclosing span — legal as the final
    box) and size==1 (64-bit largesize follows the type — every >4 GiB
    mdat in a real crawl). Never reads past the buffer; malformed sizes
    terminate the walk. ONE walker for header parsing and frame sampling
    so truncation behavior cannot diverge."""
    import struct

    hi = min(hi, len(payload))
    j = lo
    while j + 8 <= hi:
        (size,) = struct.unpack(">I", payload[j : j + 4])
        header = 8
        if size == 0:
            size = hi - j
        elif size == 1:
            if j + 16 > hi:
                return
            (size,) = struct.unpack(">Q", payload[j + 8 : j + 16])
            header = 16
        if size < header:
            return
        if payload[j + 4 : j + 8] == want:
            yield (j + header, min(j + size, hi), j + size <= hi)
        j += size


def _walk_boxes(payload: bytes, lo: int, hi: int, want: bytes):
    """First ``want`` box in [lo, hi), or None (see _iter_boxes)."""
    for span in _iter_boxes(payload, lo, hi, want):
        return span
    return None


def parse_media_header(payload: bytes | None) -> dict[str, Any]:
    """Pure-stdlib media header parse: container dimensions/layout WITHOUT
    decoding any pixel/sample data.

    Recognizes PNG (IHDR), JPEG (SOF0/SOF2 family scan), GIF (logical screen
    descriptor), MP4 (ISO-BMFF box walk to trak/tkhd 16.16 dims), and WAV
    (RIFF fmt chunk — channels/sample-rate in
    width/height slots is NOT meaningful, so WAV reports them as None and
    carries layout in ``channels``/``sample_rate``). Unknown or truncated
    payloads return all-None fields rather than raising — a 100 TB crawl
    always contains garbage bytes.

    Returns dict(codec, width, height, channels, sample_rate).
    """
    import struct

    none: dict[str, Any] = {
        "codec": None, "width": None, "height": None,
        "channels": None, "sample_rate": None,
    }
    if not payload:
        return none
    try:
        if payload.startswith(_PNG_SIG) and len(payload) >= 29:
            # IHDR is required to be the first chunk: length at 8, type at
            # 12, data at 16 (width, height big-endian, depth, color type).
            if payload[12:16] == b"IHDR":
                width, height = struct.unpack(">II", payload[16:24])
                color_type = payload[25]
                return {
                    **none, "codec": "png", "width": width, "height": height,
                    "channels": _PNG_CHANNELS.get(color_type),
                }
            return {**none, "codec": "png"}
        if payload.startswith(b"\xff\xd8"):
            i = 2
            n = len(payload)
            while i + 1 < n:
                if payload[i] != 0xFF:  # desynced — bail out, keep codec
                    break
                marker = payload[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if marker in _JPEG_STANDALONE or marker == 0xD8:
                    i += 2  # standalone (TEM/RSTn) or concatenated-stream SOI
                    continue
                if marker == 0xD9:  # EOI — never report dims from trailing bytes
                    break
                if i + 3 >= n:
                    break
                (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
                if marker in _JPEG_SOF and i + 9 < n:
                    height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return {
                        **none, "codec": "jpeg", "width": width,
                        "height": height, "channels": payload[i + 9],
                    }
                i += 2 + seg_len
            return {**none, "codec": "jpeg"}
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            width, height = struct.unpack("<HH", payload[6:10])
            return {**none, "codec": "gif", "width": width, "height": height, "channels": 1}
        if len(payload) >= 12 and payload[4:8] == b"ftyp":
            # ISO-BMFF: walk top-level boxes to moov, then its children to
            # trak/tkhd; track dims are 16.16 fixed-point at the box tail.
            # Dims are read ONLY from a complete tkhd — a box truncated by
            # the buffer would otherwise yield whatever bytes survived at
            # the clamped tail as "dimensions".
            span = _walk_boxes(payload, 0, len(payload), b"moov")
            if span:
                # EVERY trak, not just the first: audio-first layouts carry
                # 0x0 tkhd dims on track 1 and the real video dims later —
                # report the first track with NONZERO dims (the tail 8 bytes
                # are the 16.16 dims in both tkhd versions).
                for trak in _iter_boxes(payload, span[0], span[1], b"trak"):
                    tkhd = _walk_boxes(payload, trak[0], trak[1], b"tkhd")
                    if tkhd and tkhd[2] and tkhd[1] - tkhd[0] >= 84:
                        w16, h16 = struct.unpack(
                            ">II", payload[tkhd[1] - 8 : tkhd[1]]
                        )
                        if w16 >> 16 and h16 >> 16:
                            return {
                                **none, "codec": "mp4",
                                "width": w16 >> 16, "height": h16 >> 16,
                            }
            return {**none, "codec": "mp4"}
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            i = 12
            n = len(payload)
            while i + 8 <= n:
                chunk_id = payload[i : i + 4]
                (chunk_len,) = struct.unpack("<I", payload[i + 4 : i + 8])
                if chunk_id == b"fmt " and i + 16 <= n:
                    channels, sample_rate = struct.unpack("<HI", payload[i + 10 : i + 16])
                    return {
                        **none, "codec": "wav",
                        "channels": channels, "sample_rate": sample_rate,
                    }
                i += 8 + chunk_len + (chunk_len & 1)  # chunks are word-aligned
            return {**none, "codec": "wav"}
    except (struct.error, IndexError):
        return none
    return none


def _header_decode(payload: bytes | None) -> dict[str, Any]:
    """Real (header-only) decode: dimensions/channels from the container
    header via ``parse_media_header``. Pixel/sample-level features would need
    image/audio libraries not present in this environment, so ``feature`` is
    None — the honest boundary between parsed metadata and decoded content."""
    h = parse_media_header(payload)
    return {"width": h["width"], "height": h["height"], "feature": None}


def extract_features(media: DataFrame, *, decoder: str = "fake", batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched, partition-
    preserving — no shuffle; scales linearly with executors).

    decoder="fake": deterministic content-derived stand-in dims+features.
    decoder="header"/"real": pure-stdlib container-header parse (PNG/JPEG/
    GIF/WAV) — real decoded metadata, feature=None (pixel decode needs libs
    not present here)."""
    decode = {"fake": _fake_decode, "header": _header_decode, "real": _header_decode}[decoder]

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


def decode_media_headers(media: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table → per-asset container metadata via the pure-stdlib
    header parser (mapInPandas, Arrow-batched, partition-preserving — the
    same zero-shuffle scan shape as extract_features; parse cost is a few
    struct unpacks per asset, amortized per batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "codec": [h["codec"] for h in parsed],
                    "width": [h["width"] for h in parsed],
                    "height": [h["height"] for h in parsed],
                    "channels": [h["channels"] for h in parsed],
                    "sample_rate": [h["sample_rate"] for h in parsed],
                }
            )

    return media.mapInPandas(run, HEADER_SCHEMA)


def synthesize_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic mixed-media fixture table: REAL container bytes (PNG /
    JPEG / GIF / WAV round-robin by id, dims/layout derived from the id) in
    MEDIA_SCHEMA shape. Built executor-side in mapInPandas — the driver never
    touches payloads — so it scales like any scan."""
    mimes = {0: "image/png", 1: "image/jpeg", 2: "image/gif", 3: "audio/wav"}

    def build(mid: int) -> bytes:
        kind = mid % 4
        width, height = (mid % 600) + 16, (mid % 400) + 16
        if kind == 0:
            return png_bytes(width, height)
        if kind == 1:
            return jpeg_bytes(width, height)
        if kind == 2:
            return gif_bytes(width, height)
        return wav_bytes((mid % 2) + 1, 8000 + (mid % 8) * 1000)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [build(int(i)) for i in ids],
                    "mime": [mimes[int(i) % 4] for i in ids],
                    "meta": [{"source": "synthetic"} for _ in ids],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, MEDIA_SCHEMA
    )


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


def synthesize_video(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic video fixture table: REAL minimal MP4 containers
    (ftyp + moov/trak/tkhd) with id-derived dimensions and durations, in
    MEDIA_SCHEMA shape. Built executor-side in mapInPandas like
    `synthesize_media` — the driver never touches payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        mp4_bytes(
                            (int(i) % 1280) + 16,
                            (int(i) % 720) + 16,
                            1000 + (int(i) % 60) * 500,
                        )
                        for i in ids
                    ],
                    "mime": ["video/mp4" for _ in ids],
                    "meta": [{"source": "synthetic"} for _ in ids],
                }
            )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, MEDIA_SCHEMA
    )


def video_frame_instants(media: DataFrame, *, every_ms: int) -> DataFrame:
    """Frame-sampling plumbing for video: emits the deterministic frame
    timestamps a decoder would extract (one instant per ``every_ms`` of the
    clip, duration parsed from the real container header) with no pixel
    payload — actual frame decode is decoder territory (no video libs in
    this environment; the boundary is explicit, like `resize_stub`).
    Payloads whose header cannot be parsed are skipped, never raised on —
    the shared `_walk_boxes` walker is bounds-safe on truncated boxes."""
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")
    import struct

    def duration_ms(payload: bytes | None) -> int | None:
        if not payload or len(payload) < 12 or payload[4:8] != b"ftyp":
            return None
        try:
            span = _walk_boxes(payload, 0, len(payload), b"moov")
            if not span:
                return None
            mvhd = _walk_boxes(payload, span[0], span[1], b"mvhd")
            if not mvhd or not mvhd[2]:
                return None
            version = payload[mvhd[0]]
            if version == 1:
                # v1: 64-bit ctime/mtime, timescale at 20, 64-bit duration.
                if mvhd[1] - mvhd[0] < 32:
                    return None
                ts, dur = struct.unpack(
                    ">IQ", payload[mvhd[0] + 20 : mvhd[0] + 32]
                )
            else:
                # v0: timescale/duration sit 12 bytes into the payload.
                if mvhd[1] - mvhd[0] < 20:
                    return None
                ts, dur = struct.unpack(
                    ">II", payload[mvhd[0] + 12 : mvhd[0] + 20]
                )
            return int(dur * 1000 / ts) if ts else None
        except struct.error:
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_ts = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = duration_ms(payload)
                if d is None:
                    continue
                for t in range(0, d, every_ms):
                    out_ids.append(mid)
                    out_ts.append(t)
            yield pd.DataFrame({"media_id": out_ids, "frame_ms": out_ts})

    return media.mapInPandas(run, "media_id long, frame_ms long")
