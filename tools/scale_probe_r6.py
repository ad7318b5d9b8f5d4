"""Round-6 targeted scale probe: replicate documents, events, orders and
lineitem ×K (key offsets keep ids unique and joins key-correct) and time
the round-6 queries at both scales. Lighter than the full
`scale_probe.py` sweep — dimension tables pass through at ×1.

Usage: python tools/scale_probe_r6.py [K]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from artigraph_spark.queries import queries
from artigraph_spark.session import get_spark
from artigraph_spark.sources import load

QUERIES = [
    "grouped_cms_contract",
    "cms_decayed_topk",
    "interval_join_click_purchase",
    "bloom_incremental_dedup",
    "stratified_split_exact",
    "cms_join_size",
    "trend_slopes_hourly",
    "epoch_shuffle_shards",
    "zorder_cluster_keys",
    "sliding_distinct_users",
    "constraint_report",
    "profile_orders",
    "heavy_hitter_users",
    "grouped_heavy_hitters_events",
    "skew_audit_lineitem_orderkey",
    "audience_overlap_click_purchase",
    "hll_rollup_users",
    "new_users_hourly",
    "sliding_quantiles_hourly",
    "sliding_cms_top_users",
    "lateral_topk_orders",
]

OFFSETS = {
    "doc_id": 10_000_000, "event_id": 10_000_000, "user_id": 1_000_000,
    "o_orderkey": 10_000_000, "o_custkey": 1_000_000,
    "l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 100_000,
}
TABLES = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}
PASSTHROUGH = ["region", "nation", "customer", "supplier", "part", "embeddings"]


def replicate(spark, src_dir: str, out_dir: str, k: int) -> None:
    for name in PASSTHROUGH:
        load(spark, src_dir, name).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
    for name, keys in TABLES.items():
        df = load(spark, src_dir, name)
        parts = []
        for i in range(k):
            rep = df
            for col in keys:
                rep = rep.withColumn(col, F.col(col) + F.lit(i * OFFSETS[col]))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    qs = queries()
    timings = {}
    for name in QUERIES:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
    return timings


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = "/root/testdata/sf0.1"
    out = f"/tmp/artigraph_scale_r6_x{k}"
    spark = get_spark("scale_probe_r6")
    spark.range(100).count()
    t0 = time.perf_counter()
    replicate(spark, src, out, k)
    build_s = round(time.perf_counter() - t0, 1)
    base = time_queries(spark, src)
    big = time_queries(spark, out)
    print(
        json.dumps(
            {
                "replication": k,
                "build_sec": build_s,
                "sf0.1_sec": base,
                f"x{k}_sec": big,
                "ratio": {q: round(big[q] / base[q], 1) for q in base},
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
