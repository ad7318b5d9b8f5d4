"""The dedup family end-to-end as an incremental Graph (r13 + r14).

documents (external parquet)   embeddings (external parquet)
  → ChunkDedup (content-defined chunk fingerprints → doc-pair report)
  → SpanDedup (exact-substring duplicate spans → destructive rewrite)
  → SemanticDedup (SemDeDup: exact k-means + intra-cluster cosine prune;
     TWO outputs: kept vectors + the prune report)
  → DedupSummary (one-row rollup joining all three reports)

Then a streaming coda: the semantic near-dup GATE
(`stateful_cosine_band_flags`) runs over the embeddings as a bounded
stream and its keep-set is checked against the batch
min-id-per-(table, bucket) rule — the incremental twin of the batch
candidate semantics.

And a cross-snapshot coda (r14): the suite's kept vectors become the
reference corpus and `semdedup_against` checks a simulated re-crawl
batch against it without re-clustering — asserting the exact-twin
recall floor (every non-zero vector still in the reference re-flags).

Demonstrates: two external raw artifacts feeding independent producers,
a 2-output producer, graph memoization over the whole suite (second
run builds nothing), and batch/stream parity for the semantic gate.

Run: python examples/dedup_suite_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artigraph_spark import types as at
from artigraph_spark.artifacts import Artifact
from artigraph_spark.backends import JsonFileBackend
from artigraph_spark.executors import LocalSparkExecutor
from artigraph_spark.formats import Parquet
from artigraph_spark.graphs import Graph
from artigraph_spark.producers import Producer
from artigraph_spark.storage import LocalFile
from artigraph_spark.versions import SemVer

DOCS_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "doc_id": at.Int64(),
            "text": at.String(),
            "lang": at.String(),
            "source": at.String(),
            "n_chars": at.Int64(),
        }
    )
)

VECS_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "vec_id": at.Int64(),
            "embedding": at.List(element=at.Float32()),
            "label": at.Int32(),
        }
    )
)

CHUNK_PAIRS_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "doc_a": at.Int64(),
            "doc_b": at.Int64(),
            "shared_chunks": at.Int64(),
            "shared_tokens": at.Int64(),
            "chunks_a": at.Int64(),
            "chunks_b": at.Int64(),
        }
    )
)

PRUNE_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "vec_id": at.Int64(),
            "cluster": at.Int64(),
            "pruned": at.Int64(),
        }
    )
)

REWRITE_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "doc_id": at.Int64(),
            "text_dedup": at.String(),
            "n_tokens": at.Int64(),
            "tokens_removed": at.Int64(),
        }
    )
)

SUMMARY_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "chunk_pairs": at.Int64(),
            "chunk_docs_flagged": at.Int64(),
            "vectors": at.Int64(),
            "vectors_pruned": at.Int64(),
            "span_docs_cut": at.Int64(),
            "span_tokens_removed": at.Int64(),
        }
    )
)


class Documents(Artifact):
    pass


class Embeddings(Artifact):
    pass


class ChunkDedup(Producer):
    version = SemVer(major=1)

    docs: Documents

    def build(self, docs: DataFrame) -> DataFrame:
        from artigraph_spark.operators.dedup import cdc_chunk_dedup_report

        return cdc_chunk_dedup_report(
            docs, "doc_id", "text", window=4, mask_bits=4, max_df=50, min_shared=2
        )


class SemanticDedup(Producer):
    version = SemVer(major=1)

    vecs: Embeddings

    def build(self, vecs: DataFrame) -> tuple[DataFrame, DataFrame]:
        from artigraph_spark.operators.similarity import semdedup

        report = semdedup(
            vecs, k=4, iterations=2, qbits=8, threshold=(3, 10)
        )
        kept = vecs.join(
            report.filter(F.col("pruned") == 0).select("vec_id"),
            "vec_id",
            "left_semi",
        )
        return kept, report

    def validate_outputs(self, kept: DataFrame, report: DataFrame) -> tuple[bool, str]:
        # the keeper rule guarantees at least one survivor per cluster
        return (kept.limit(1).count() > 0, "semantic dedup pruned every vector")


class SpanDedup(Producer):
    """Exact-substring rewrite (r14): cut every corpus-duplicated span
    from every document — the ExactSubstr destructive policy."""

    version = SemVer(major=1)

    docs: Documents

    def build(self, docs: DataFrame) -> DataFrame:
        from artigraph_spark.operators.dedup import remove_duplicate_spans

        return remove_duplicate_spans(docs, "doc_id", "text", min_tokens=8)


class DedupSummary(Producer):
    version = SemVer(major=2)

    chunk_pairs: Artifact
    prune_report: Artifact
    span_rewrite: Artifact

    def build(
        self,
        chunk_pairs: DataFrame,
        prune_report: DataFrame,
        span_rewrite: DataFrame,
    ) -> DataFrame:
        flagged = chunk_pairs.select(
            F.explode(F.array("doc_a", "doc_b")).alias("d")
        ).distinct()
        return (
            chunk_pairs.agg(F.count(F.lit(1)).alias("chunk_pairs"))
            .crossJoin(flagged.agg(F.count(F.lit(1)).alias("chunk_docs_flagged")))
            .crossJoin(
                prune_report.agg(
                    F.count(F.lit(1)).alias("vectors"),
                    F.sum("pruned").cast("long").alias("vectors_pruned"),
                )
            )
            .crossJoin(
                span_rewrite.agg(
                    F.sum((F.col("tokens_removed") > 0).cast("long"))
                    .cast("long")
                    .alias("span_docs_cut"),
                    F.sum("tokens_removed").cast("long").alias("span_tokens_removed"),
                )
            )
        )


def _check_streaming_gate(spark, sf_dir: str) -> int:
    """Semantic gate coda: bounded-stream keep-set == batch rule."""
    from pyspark.sql import Window

    from artigraph_spark import streaming as stx
    from artigraph_spark.operators.similarity import _hyperplanes, lsh_bucket
    from artigraph_spark.sources import load

    vecs = stx.read_stream(spark, sf_dir, "embeddings", max_files_per_trigger=1)
    out = stx.run_stream_to_batch(
        stx.stateful_cosine_band_flags(
            vecs.select("vec_id", "embedding"), "vec_id", "embedding"
        ),
        query_name="dedup_suite_gate",
        output_mode="append",
    )
    gate = {
        r["vec_id"]: r["keep"]
        for r in out.groupBy("vec_id")
        .agg(F.bool_and("first_in_bucket").alias("keep"))
        .collect()
    }
    tables = [_hyperplanes(64, 8, 42 + 1000 * t) for t in range(4)]
    banded = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        F.posexplode(
            F.array(*[lsh_bucket(F.col("embedding"), p).cast("string") for p in tables])
        ).alias("band_id", "band_sig"),
    )
    w = Window.partitionBy("band_id", "band_sig")
    batch = {
        r["vec_id"]: r["keep"]
        for r in banded.withColumn(
            "first", F.col("vec_id") == F.min("vec_id").over(w)
        )
        .groupBy("vec_id")
        .agg(F.bool_and("first").alias("keep"))
        .collect()
    }
    assert gate == batch, "streaming gate diverged from the batch rule"
    return sum(1 for k in gate.values() if not k)


def _check_incremental_semantic(spark, sf_dir: str, kept: DataFrame) -> tuple[int, int]:
    """Cross-snapshot coda (r14): the suite's KEPT vectors become the
    reference corpus and the full original embedding table plays a
    re-crawl batch — `semdedup_against` must re-flag every non-zero
    vector that is literally present in the reference (the exact-twin
    recall floor: identical vectors share every hyperplane bucket and
    verify at cos = 1) WITHOUT re-clustering the union."""
    from artigraph_spark.operators.similarity import semdedup_against
    from artigraph_spark.sources import load

    new = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rep = semdedup_against(
        new, kept, dim=64, n_planes=4, n_tables=8, qbits=8, threshold=(3, 10)
    )
    # The non-zero filter must use the SAME qbits=8 quantization the
    # verify arm uses: a vector with all |coords| < 2^-8 has a non-zero
    # float norm but quantizes to the all-zero vector, whose self-dot
    # fails the d > 0 arm — it can never re-flag and must not be
    # asserted on.
    qnz = (
        F.aggregate(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * F.lit(256.0)).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v * v,
        )
        > 0
    )
    known = (
        rep.join(kept.select("vec_id"), "vec_id", "left_semi")
        .join(new.filter(qnz).select("vec_id"), "vec_id", "left_semi")
    )
    missed = known.filter(F.col("pruned") == 0).count()
    assert missed == 0, f"{missed} known reference vectors escaped the re-flag"
    total = rep.count()
    flagged = rep.agg(F.sum("pruned").cast("long")).collect()[0][0]
    return int(flagged), int(total)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="dedup_suite_")
    backend = JsonFileBackend(os.path.join(root, "catalog.json"))

    def build_once() -> tuple[LocalSparkExecutor, Graph]:
        with Graph("dedup_suite", backend=backend) as g:
            g.artifacts.docs = Documents(
                type=DOCS_TYPE,
                format=Parquet(),
                storage=LocalFile(root=sf_dir, template="{root}/documents.parquet"),
            )
            g.artifacts.vecs = Embeddings(
                type=VECS_TYPE,
                format=Parquet(),
                storage=LocalFile(root=sf_dir, template="{root}/embeddings.parquet"),
            )
            g.artifacts.chunk_pairs = ChunkDedup(docs=g.artifacts.docs).out(
                Artifact(type=CHUNK_PAIRS_TYPE, storage=LocalFile(root=root))
            )
            kept, report = SemanticDedup(vecs=g.artifacts.vecs).out(
                Artifact(type=VECS_TYPE, storage=LocalFile(root=root)),
                Artifact(type=PRUNE_TYPE, storage=LocalFile(root=root)),
            )
            g.artifacts.kept_vecs = kept
            g.artifacts.prune_report = report
            g.artifacts.span_rewrite = SpanDedup(docs=g.artifacts.docs).out(
                Artifact(type=REWRITE_TYPE, storage=LocalFile(root=root))
            )
            g.artifacts.summary = DedupSummary(
                chunk_pairs=g.artifacts.chunk_pairs,
                prune_report=g.artifacts.prune_report,
                span_rewrite=g.artifacts.span_rewrite,
            ).out(Artifact(type=SUMMARY_TYPE, storage=LocalFile(root=root)))
        ex = LocalSparkExecutor()
        g.snapshot(strict_fingerprints=True).build(ex)
        return ex, g

    ex1, g1 = build_once()
    snap = g1.snapshot(strict_fingerprints=True)
    summary = snap.read(g1.artifacts.summary).collect()[0]
    kept_n = snap.read(g1.artifacts.kept_vecs).count()
    prune_n = snap.read(g1.artifacts.prune_report).count()
    print(
        f"build 1: built={ex1.built_partitions} chunk_pairs={summary['chunk_pairs']} "
        f"chunk_docs_flagged={summary['chunk_docs_flagged']} "
        f"vectors={summary['vectors']} pruned={summary['vectors_pruned']} kept={kept_n} "
        f"span_docs_cut={summary['span_docs_cut']} "
        f"span_tokens_removed={summary['span_tokens_removed']}"
    )
    assert ex1.built_partitions == 4  # one per producer
    assert kept_n + summary["vectors_pruned"] == prune_n
    assert summary["vectors_pruned"] > 0  # synthetic corpus has in-cluster twins at 0.3
    assert summary["span_docs_cut"] > 0  # corpus carries exact duplicated runs

    ex2, _ = build_once()
    print(f"build 2: built={ex2.built_partitions} skipped={ex2.skipped_partitions}")
    assert ex2.built_partitions == 0

    from artigraph_spark.session import get_spark

    spark = get_spark("dedup_suite_demo")
    flagged = _check_streaming_gate(spark, sf_dir)
    print(f"streaming semantic gate: {flagged} vectors flagged, batch parity OK")

    kept_vecs = snap.read(g1.artifacts.kept_vecs).select("vec_id", "embedding")
    inc_flagged, inc_total = _check_incremental_semantic(spark, sf_dir, kept_vecs)
    print(
        f"incremental semantic (semdedup_against vs kept corpus): "
        f"{inc_flagged}/{inc_total} re-crawl vectors flagged, recall floor OK"
    )

    print("dedup suite demo OK:", root)


if __name__ == "__main__":
    main()
