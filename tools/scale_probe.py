"""Scale-up probe: replicate the sf0.1 fixtures K× (with key offsets, so
joins stay key-correct and cardinalities really grow), write them as
multi-file parquet to /tmp, and time the headline queries against both
scales. Evidence that the plans scale, not just pass.

Usage: python tools/scale_probe.py [K]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from artigraph_spark.queries import bench_queries
from artigraph_spark.session import get_spark
from artigraph_spark.sources import TABLES, load

KEY_COLUMNS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # nation/region: fixed dimensions, never replicated
}

# Offsets chosen > max key at sf0.1 so replica keys stay join-consistent.
OFFSETS = {
    "l_orderkey": 10_000_000,
    "o_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "s_suppkey": 100_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}


def replicate(spark, src_dir: str, out_dir: str, k: int) -> None:
    for name in TABLES:
        df = load(spark, src_dir, name)
        if name in ("nation", "region"):
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
            continue
        parts = []
        for i in range(k):
            rep = df
            for col in KEY_COLUMNS.get(name, []):
                rep = rep.withColumn(col, F.col(col) + F.lit(i * OFFSETS[col]))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # repartition → multiple files → real scan parallelism
        out.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    timings = {}
    for name, fn in sorted(bench_queries().items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
    return timings


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = "/root/testdata/sf0.1"
    out = f"/tmp/artigraph_scale_x{k}"
    spark = get_spark("scale_probe")
    spark.range(100).count()

    t0 = time.perf_counter()
    replicate(spark, src, out, k)
    build_s = round(time.perf_counter() - t0, 1)

    base = time_queries(spark, src)
    big = time_queries(spark, out)
    report = {
        "replication": k,
        "build_sec": build_s,
        "sf0.1_sec": base,
        f"x{k}_sec": big,
        "ratio": {
            q: (round(big[q] / base[q], 1) if base[q] > 0 else None) for q in base
        },
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
