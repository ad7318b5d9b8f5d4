"""End-to-end LLM training-data pipeline as an incremental Graph.

documents (external parquet, raw artifact)
  → QualityFilter (keep docs with ≥10 tokens; statistics-gated)
  → DedupDocs (MinHash-LSH → Jaccard → connected components; TWO outputs:
     the deduped keeper set + a duplicate-pairs report)

Demonstrates: raw artifacts pointing at external data, a 2-output producer,
statistics thresholds, and memoization over the whole pipeline (second run
builds nothing).

Run: python examples/llm_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artigraph_spark import statistics as st
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

PAIRS_TYPE = at.Collection(
    element=at.Struct(fields={"a": at.Int64(), "b": at.Int64()})
)


class Documents(Artifact):
    pass


class QualityFilter(Producer):
    version = SemVer(major=1)

    docs: Documents

    def build(self, docs: DataFrame) -> DataFrame:
        from artigraph_spark.operators.text import token_count

        return docs.filter(token_count(F.col("text")) >= 10)

    def validate_outputs(self, out: DataFrame) -> tuple[bool, str]:
        # never emit an empty corpus
        return (out.limit(1).count() > 0, "quality filter removed every document")


class DedupDocs(Producer):
    version = SemVer(major=1)

    docs: Documents

    def build(self, docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        from artigraph_spark.operators.dedup import dedup_clusters

        clusters = dedup_clusters(docs, "doc_id", "text", jaccard_threshold=0.7)
        keepers = docs.join(
            clusters.filter("is_keeper").select("doc_id"), "doc_id", "left_semi"
        )
        dup_pairs = (
            clusters.filter(~F.col("is_keeper"))
            .select(F.col("cluster_id").alias("a"), F.col("doc_id").alias("b"))
        )
        return keepers, dup_pairs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="llm_pipeline_")
    backend = JsonFileBackend(os.path.join(root, "catalog.json"))

    def build_once() -> tuple[LocalSparkExecutor, Graph]:
        with Graph("llm_pipeline", backend=backend) as g:
            g.artifacts.docs = Documents(
                type=DOCS_TYPE,
                format=Parquet(),
                storage=LocalFile(root=sf_dir, template="{root}/documents.parquet"),
            )
            filtered_art = Documents(
                type=DOCS_TYPE,
                storage=LocalFile(root=root),
                statistics=(
                    st.Count(threshold=st.RangeThreshold(lo=1)),
                    st.NullCount(column="text", threshold=st.EqualsThreshold(expected=0)),
                ),
            )
            g.artifacts.filtered = QualityFilter(docs=g.artifacts.docs).out(filtered_art)
            keepers, dups = DedupDocs(docs=g.artifacts.filtered).out(
                Artifact(type=DOCS_TYPE, storage=LocalFile(root=root)),
                Artifact(type=PAIRS_TYPE, storage=LocalFile(root=root)),
            )
            g.artifacts.keepers = keepers
            g.artifacts.dup_pairs = dups
        ex = LocalSparkExecutor()
        g.snapshot(strict_fingerprints=True).build(ex)
        return ex, g

    ex1, g1 = build_once()
    snap = g1.snapshot(strict_fingerprints=True)
    keepers = snap.read(g1.artifacts.keepers)
    dups = snap.read(g1.artifacts.dup_pairs)
    print(
        f"build 1: built={ex1.built_partitions} keepers={keepers.count()} "
        f"dup_pairs={dups.count()}"
    )
    assert ex1.built_partitions == 2  # one per producer

    ex2, _ = build_once()
    print(f"build 2: built={ex2.built_partitions} skipped={ex2.skipped_partitions}")
    assert ex2.built_partitions == 0

    print("llm pipeline demo OK:", root)


if __name__ == "__main__":
    main()
