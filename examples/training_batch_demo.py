"""Training-batch assembly as an incremental Graph — the pipeline operator
family end-to-end through the framework layer.

documents (external parquet, raw artifact)
  → AuditContamination (benchmark trigram-overlap audit — the expensive
     join, materialized ONCE as the evidence-trail artifact)
  → RemoveContaminated (anti-join of the corpus against the STORED audit
     at 20% — the contamination join is never recomputed)
  → NormalizeAndMix (text normalization + per-language stratified mixing
     + per-source domain cap; statistics-gated)
  → PackBatches (concat-then-chunk sequence packing into 256-token bins;
     TWO outputs: the doc→bin layout + a per-bin manifest)
  → CurriculumOrder (per-language equal-frequency difficulty stages by
     token count — the deterministic easy-to-hard training order, stored
     as its own artifact beside the packed layout)

Demonstrates audit→filter→mix→cap→pack composing under memoization: the
second build is a no-op, and every intermediate (including the audit
evidence trail) is content-addressed through the snapshot.

Run: python examples/training_batch_demo.py [sf_dir]
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

LAYOUT_TYPE = at.Collection(
    element=at.Struct(
        fields={"doc_id": at.Int64(), "bin_id": at.Int64(), "tokens_in_bin": at.Int64()}
    )
)

MANIFEST_TYPE = at.Collection(
    element=at.Struct(
        fields={"bin_id": at.Int64(), "n_docs": at.Int64(), "n_tokens": at.Int64()}
    )
)


AUDIT_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "doc_id": at.Int64(),
            "total_ngrams": at.Int64(),
            "overlap_ngrams": at.Int64(),
            "contamination": at.Float64(),
        }
    )
)


class Documents(Artifact):
    pass


class AuditTable(Artifact):
    pass


class AuditContamination(Producer):
    version = SemVer(major=1)

    docs: Documents

    def build(self, docs: DataFrame) -> DataFrame:
        from artigraph_spark.operators.packing import benchmark_contamination

        # Benchmark stand-in: the first 50 doc ids (a real pipeline points
        # this at the eval-suite artifact).
        return benchmark_contamination(
            docs.filter(F.col("doc_id") >= 50),
            docs.filter(F.col("doc_id") < 50),
            "doc_id",
            "text",
            n=3,
        )


class RemoveContaminated(Producer):
    version = SemVer(major=1)

    docs: Documents
    audit: AuditTable

    def build(self, docs: DataFrame, audit: DataFrame) -> DataFrame:
        from artigraph_spark.operators.packing import decontaminate_corpus

        # The audit comes in MATERIALIZED (its own artifact): the removal
        # anti-joins stored evidence, never re-running the contamination
        # join — the two-producer shape decontaminate_corpus's docstring
        # prescribes for pipelines that keep both outputs.
        clean, _ = decontaminate_corpus(
            docs.filter(F.col("doc_id") >= 50),
            None,
            "doc_id",
            "text",
            threshold=0.2,
            audit=audit,
        )
        return clean


class NormalizeAndMix(Producer):
    version = SemVer(major=1)

    docs: Documents

    def build(self, docs: DataFrame) -> DataFrame:
        from artigraph_spark.operators.packing import cap_per_group, stratified_sample
        from artigraph_spark.operators.text import normalize_text

        cleaned = docs.withColumn("text", normalize_text(F.col("text")))
        mixed = stratified_sample(
            cleaned,
            "lang",
            {"en": 0.9, "de": 0.7, "fr": 0.7, "es": 0.7, "zh": 0.5, "ja": 0.5},
            F.col("doc_id"),
        )
        return cap_per_group(
            mixed, "source", 200,
            order_key=F.struct((F.col("doc_id") * 2_654_435_761) % 1_000_000_007, F.col("doc_id")),
        )
        # Non-emptiness is enforced by the artifact's Count statistic gate —
        # no validate_outputs needed (it would re-count in a second job).


class PackBatches(Producer):
    version = SemVer(major=1)

    mixed: Documents

    def build(self, mixed: DataFrame) -> tuple[DataFrame, DataFrame]:
        from artigraph_spark.operators.packing import pack_sequences, token_count

        counted = mixed.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
        layout = pack_sequences(counted, "doc_id", "n_tokens", capacity=256)
        manifest = layout.groupBy("bin_id").agg(
            F.count("*").alias("n_docs"), F.sum("tokens_in_bin").alias("n_tokens")
        )
        return layout, manifest


STAGE_TYPE = at.Collection(
    element=at.Struct(
        fields={"doc_id": at.Int64(), "lang": at.String(), "stage": at.Int32()}
    )
)


class CurriculumOrder(Producer):
    version = SemVer(major=1)

    mixed: Documents

    def build(self, mixed: DataFrame) -> DataFrame:
        from artigraph_spark.operators.packing import (
            curriculum_stages,
            token_count,
        )

        staged = curriculum_stages(
            mixed,
            token_count(F.col("text")).cast("double"),
            "doc_id",
            stratum_col="lang",
            n_stages=3,
        )
        return staged.select("doc_id", "lang", "stage")


def _short_docs(snap, g) -> int:
    """Training docs too short to form a trigram — unassessable, always kept."""
    from artigraph_spark.operators.packing import token_count

    docs = snap.read(g.artifacts.docs)
    return docs.filter(
        (F.col("doc_id") >= 50) & (token_count(F.col("text")) < 3)
    ).count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="training_batch_")
    backend = JsonFileBackend(os.path.join(root, "catalog.json"))

    def build_once() -> tuple[LocalSparkExecutor, Graph]:
        with Graph("training_batches", backend=backend) as g:
            g.artifacts.docs = Documents(
                type=DOCS_TYPE,
                format=Parquet(),
                storage=LocalFile(root=sf_dir, template="{root}/documents.parquet"),
            )
            g.artifacts.audit = AuditContamination(docs=g.artifacts.docs).out(
                AuditTable(type=AUDIT_TYPE, storage=LocalFile(root=root))
            )
            g.artifacts.clean = RemoveContaminated(
                docs=g.artifacts.docs, audit=g.artifacts.audit
            ).out(Documents(type=DOCS_TYPE, storage=LocalFile(root=root)))
            g.artifacts.mixed = NormalizeAndMix(docs=g.artifacts.clean).out(
                Documents(
                    type=DOCS_TYPE,
                    storage=LocalFile(root=root),
                    statistics=(st.Count(threshold=st.RangeThreshold(lo=1)),),
                )
            )
            layout, manifest = PackBatches(mixed=g.artifacts.mixed).out(
                Artifact(type=LAYOUT_TYPE, storage=LocalFile(root=root)),
                Artifact(
                    type=MANIFEST_TYPE,
                    storage=LocalFile(root=root),
                    # packing invariant as a build gate (round-6
                    # RangeViolations): every bin must hold 1..256 tokens
                    # — a packer bug that overflows a bin ABORTS the
                    # build instead of shipping corrupt batches
                    statistics=(
                        st.RangeViolations(
                            column="n_tokens",
                            lo=1.0,
                            hi=256.0,
                            threshold=st.EqualsThreshold(expected=0),
                        ),
                    ),
                ),
            )
            g.artifacts.layout = layout
            g.artifacts.manifest = manifest
            g.artifacts.curriculum = CurriculumOrder(
                mixed=g.artifacts.mixed
            ).out(Artifact(type=STAGE_TYPE, storage=LocalFile(root=root)))
        ex = LocalSparkExecutor()
        g.snapshot(strict_fingerprints=True).build(ex)
        return ex, g

    ex1, g1 = build_once()
    snap = g1.snapshot(strict_fingerprints=True)
    layout = snap.read(g1.artifacts.layout)
    manifest = snap.read(g1.artifacts.manifest)
    audit = snap.read(g1.artifacts.audit)
    flagged = audit.filter(F.col("contamination") >= 0.2).count()
    clean_n = snap.read(g1.artifacts.clean).count()
    n_bins = manifest.count()
    full = manifest.filter(F.col("n_tokens") == 256).count()
    curriculum = snap.read(g1.artifacts.curriculum)
    stage_sizes = {
        (r["lang"], r["stage"]): r["n"]
        for r in curriculum.groupBy("lang", "stage")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    print(
        f"build 1: built={ex1.built_partitions} clean_docs={clean_n} "
        f"flagged={flagged} layout_rows={layout.count()} "
        f"bins={n_bins} full_bins={full} "
        f"curriculum_stages={len(set(s for _, s in stage_sizes))}"
    )
    assert ex1.built_partitions == 5
    assert full >= n_bins - 1  # every bin but the last is exactly full
    # the audit is the evidence trail: flagged docs are exactly the removal
    assert clean_n == audit.count() - flagged + _short_docs(snap, g1)
    # curriculum covers every mixed doc once, stages equal-frequency per lang
    assert curriculum.count() == snap.read(g1.artifacts.mixed).count()
    for lang in {k for k, _ in stage_sizes}:
        per = sorted(v for (k, _), v in stage_sizes.items() if k == lang)
        assert per[-1] - per[0] <= 1  # ntile balance

    ex2, _ = build_once()
    print(f"build 2: built={ex2.built_partitions} skipped={ex2.skipped_partitions}")
    assert ex2.built_partitions == 0

    print("training batch demo OK:", root)


if __name__ == "__main__":
    main()
