"""Raw-file ingestion: binary media files and line/whole-text corpora.

The LLM-pipeline entry point for data that is not yet columnar: a lake of
image/audio/document files becomes a DataFrame in one scan, then flows into
the multimodal / text operators.

Scale notes:
  - ``binaryFile`` is Spark's built-in datasource: distributed listing,
    per-file splits, content read executor-side (the driver never touches
    payload bytes). ``pathGlobFilter``/``recursiveFileLookup`` prune the
    listing before any read.
  - Whole-file payloads are NOT splittable — one file = one task's row. For
    100 TB of small media files that is exactly right (task per batch of
    files); for giant single files prefer an upstream chunker.
  - ``spark.read.text`` is splittable by line; ``wholetext=True`` gives
    document-per-file semantics (same non-splittable caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Extension → mime for the common media/document types; anything else falls
# back to application/octet-stream. Deliberately tiny — a content sniffer
# belongs in the (stubbed) real decoder, not the ingestion scan.
_MIME_BY_EXT = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "webp": "image/webp",
    "bmp": "image/bmp",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "mp4": "video/mp4",
    "mkv": "video/x-matroska",
    "webm": "video/webm",
    "txt": "text/plain",
    "md": "text/markdown",
    "html": "text/html",
    "json": "application/json",
    "pdf": "application/pdf",
}


def mime_from_path(path):
    """Column expr: best-effort mime type from a path's extension (lowercased);
    octet-stream when unknown. JVM-side only — no UDF."""
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))
    expr = F.lit("application/octet-stream")
    for e, m in _MIME_BY_EXT.items():
        expr = F.when(ext == e, F.lit(m)).otherwise(expr)
    return expr


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Scan a directory of files as (path, modificationTime, length, content).

    Thin, explicit wrapper over the built-in ``binaryFile`` datasource so
    callers get the pruned listing knobs without format-string spelunking.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    reader = reader.option("recursiveFileLookup", str(recursive).lower())
    return reader.load(path)


def media_from_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Binary file lake → the multimodal MEDIA_SCHEMA shape.

    media_id is a deterministic 64-bit hash of the file path (stable across
    re-scans; collision odds negligible below ~billions of files), payload
    the raw bytes, mime guessed from the extension, and meta carries
    provenance (path, size, mtime) as strings.
    """
    bf = read_binary_files(spark, path, glob=glob, recursive=recursive)
    return bf.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        mime_from_path(F.col("path")).alias("mime"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("n_bytes"), F.col("length").cast("string"),
            F.lit("mtime"), F.date_format("modificationTime", "yyyy-MM-dd HH:mm:ss"),
        ).alias("meta"),
    )


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented corpus scan: one row per line, with source file.

    Splittable — large files fan out across tasks, so a single 1 TB text
    dump still parallelizes.
    """
    return spark.read.text(path).select(
        F.input_file_name().alias("file"), F.col("value").alias("line")
    )


def documents_from_text_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Document-per-file corpus → (doc_id, source, text), the documents-table
    shape the dedup/text operators expect. doc_id hashes the path (stable);
    source keeps the path for provenance joins.
    """
    reader = spark.read.format("text").option("wholetext", "true")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    reader = reader.option("recursiveFileLookup", str(recursive).lower())
    return reader.load(path).select(
        F.xxhash64(F.input_file_name()).alias("doc_id"),
        F.input_file_name().alias("source"),
        F.col("value").alias("text"),
    )
