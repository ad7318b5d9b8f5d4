"""Bloom-filter dedup state lifecycle: multi-snapshot ingest where the
ONLY carried state is the filter's bit positions, plus periodic exact
compaction.

Simulates 4 ingest snapshots over the documents table. Snapshot 0 seeds
the state; snapshots 1-3 each mix genuinely new documents with
re-crawled copies of previously admitted content (new doc_ids, same
text). Each ingest:

  1. reads the persisted filter (bit-position parquet — O(num_bits)
     rows, NO digests, NO text),
  2. admits via ``bloom_dedup_against(verify=False)`` — filter-only
     mode: suspects drop outright,
  3. folds the admitted batch into the state (bloom_build ∪ distinct —
     the filter's native merge) and persists the next generation.

Asserted invariants (the round-6 verdict's item 4):

  - **state stays O(bits)**: every generation's row count ≤ num_bits,
    across all snapshots, while the admitted corpus grows;
  - **no false negatives**: a re-crawled copy of admitted content is
    NEVER admitted again;
  - **drops replay exactly**: filter-only over-removal is precisely the
    deterministic false-positive key set — recomputed independently
    from the same universal-hash arithmetic, matching row-for-row
    (the in-Spark twin of the DuckDB oracle replay that
    ``bloom_incremental_dedup`` pins at the query layer);
  - **compaction**: after snapshot 3 the filter is rebuilt exactly from
    the admitted corpus digests at 2× bits — every admitted key still
    passes (membership preserved), and the fresh filter's bit count
    reflects only live content (saturation from snapshot churn gone).

Run: python examples/bloom_dedup_lifecycle_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from artigraph_spark.operators.dedup import bloom_dedup_against, content_key
from artigraph_spark.operators.sketches import bloom_build, bloom_passing_keys
from artigraph_spark.session import get_spark
from artigraph_spark.sources import load

NUM_BITS = 1 << 16
NUM_HASHES = 4
SEED = 7


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("bloom_dedup_lifecycle")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").cache()
    n_docs = docs.count()

    # 4 disjoint waves of genuinely-new documents
    waves = [docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i) for i in range(4)]

    state_root = Path(tempfile.mkdtemp(prefix="bloom_state_"))

    def state_path(gen: int) -> str:
        return str(state_root / f"bits-{gen}")

    def read_state(gen: int):
        return spark.read.parquet(state_path(gen))

    # ---- snapshot 0: seed ---------------------------------------------------
    admitted = bloom_dedup_against(
        waves[0], None, "doc_id", "text",
        num_bits=NUM_BITS, num_hashes=NUM_HASHES, seed=SEED,
        verify=False,
        ref_bits=spark.createDataFrame([], "bit int"),  # empty filter
    ).cache()
    corpus = admitted  # running admitted corpus (held only to CHECK, not as state)
    bloom_build(
        admitted.select(content_key(F.col("text")).alias("__k")),
        "__k", NUM_BITS, NUM_HASHES, SEED,
    ).write.mode("overwrite").parquet(state_path(0))
    print(f"snapshot 0: admitted {admitted.count()} of {waves[0].count()}")

    id_offset = 10_000_000
    for snap in (1, 2, 3):
        # re-crawl: every 3rd previously admitted doc reappears under a new id
        recrawled = (
            corpus.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 0)
            .select(
                (F.col("doc_id") + F.lit(snap * id_offset)).alias("doc_id"),
                "text",
            )
        )
        batch = waves[snap].unionByName(recrawled).cache()
        state = read_state(snap - 1).cache()
        state_rows = state.count()
        assert state_rows <= NUM_BITS, (state_rows, NUM_BITS)

        admitted = bloom_dedup_against(
            batch, None, "doc_id", "text",
            num_bits=NUM_BITS, num_hashes=NUM_HASHES, seed=SEED,
            verify=False, ref_bits=state,
        ).cache()

        # --- no false negatives: no admitted text already in the corpus ---
        dupes_admitted = (
            admitted.select(F.sha2(F.col("text"), 256).alias("h"))
            .join(
                corpus.select(F.sha2(F.col("text"), 256).alias("h")).distinct(),
                "h", "left_semi",
            ).count()
        )
        assert dupes_admitted == 0, f"snapshot {snap}: Bloom false negative!"

        # --- drops replay: dropped-but-not-duplicate == the deterministic
        #     false-positive key set, recomputed independently ---
        batch_keys = batch.select(content_key(F.col("text")).alias("__k"))
        fp_keys = (
            bloom_passing_keys(batch_keys, "__k", state, NUM_BITS, NUM_HASHES, SEED)
            .join(
                corpus.select(content_key(F.col("text")).alias("__k")).distinct(),
                "__k", "left_anti",
            )
        )
        dropped_fresh = (
            batch.join(
                corpus.select(F.sha2(F.col("text"), 256).alias("__h")).distinct(),
                F.sha2(F.col("text"), 256) == F.col("__h"), "left_anti",
            )
            .join(admitted.select("doc_id"), "doc_id", "left_anti")
            .select(content_key(F.col("text")).alias("__k")).distinct()
        )
        a = {r["__k"] for r in fp_keys.collect()}
        b = {r["__k"] for r in dropped_fresh.collect()}
        # filter-only mode drops EXACTLY the passing fresh keys: every
        # false positive is dropped, every fresh drop is a false positive
        assert a == b, f"snapshot {snap}: drops != false-positive set"
        print(
            f"snapshot {snap}: batch {batch.count()} (re-crawled "
            f"{recrawled.count()}), admitted {admitted.count()}, "
            f"state {state_rows} bits, false-positive drops {len(b)}"
        )

        # --- fold admitted batch into the filter state: union of bits ---
        corpus = corpus.unionByName(admitted).cache()
        new_bits = bloom_build(
            admitted.select(content_key(F.col("text")).alias("__k")),
            "__k", NUM_BITS, NUM_HASHES, SEED,
        )
        state.unionByName(new_bits).distinct().write.mode("overwrite").parquet(
            state_path(snap)
        )

    # ---- periodic exact compaction: rebuild from the admitted corpus -------
    final_state = read_state(3)
    compacted = bloom_build(
        corpus.select(content_key(F.col("text")).alias("__k")),
        "__k", NUM_BITS * 2, NUM_HASHES, SEED,
    ).cache()
    assert compacted.count() <= NUM_BITS * 2
    # membership preserved: every admitted key passes the compacted filter
    corpus_keys = corpus.select(content_key(F.col("text")).alias("__k")).distinct()
    passing = bloom_passing_keys(
        corpus_keys, "__k", compacted, NUM_BITS * 2, NUM_HASHES, SEED
    )
    missing = corpus_keys.join(passing, "__k", "left_anti").count()
    assert missing == 0, "compaction lost admitted membership"
    print(
        f"compaction: state {final_state.count()} bits -> "
        f"{compacted.count()} bits at 2x width; corpus "
        f"{corpus.count()}/{n_docs + 0} docs admitted, membership intact"
    )
    print("bloom dedup lifecycle OK")


if __name__ == "__main__":
    main()
