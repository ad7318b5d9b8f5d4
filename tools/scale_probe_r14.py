"""Round-14 ×10 scale probe: semdedup_against at sf0.1 vs the ×10
replicated fixtures (tools/scale_probe.replicate layout at /tmp/sfx10).

Two rows, mirroring the r13 semdedup probe's honesty policy:
  - fixed-buckets (n_planes pinned at the query's 4): bucket COUNT is
    fixed at n_tables·2^4, so cross-side bucket co-occupancy — and the
    candidate join — grows ~quadratically in N. Recorded as the
    cautionary row.
  - buckets ∝ N (n_planes 4→8 at ×10: 16→256 buckets per table, ≥10×):
    expected bucket occupancy is pinned as the corpus grows, so the
    candidate join stays linear — the production contract, analogous to
    semdedup's k ∝ N. (n_planes grows like log2 N; +4 planes covers a
    16× corpus growth.)

Usage: python tools/scale_probe_r14.py [x10_dir]
Writes docs/SCALE_PROBE_r14.json fragments to stdout; min-of-2 warm runs.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from artigraph_spark.operators.similarity import semdedup_against  # noqa: E402
from artigraph_spark.session import get_spark  # noqa: E402
from artigraph_spark.sources import load  # noqa: E402


def run_once(spark, sf_dir: str, n_planes: int) -> float:
    e = load(spark, sf_dir, "embeddings")
    new = e.filter(F.col("vec_id") % 2 == 1)
    ref = e.filter(F.col("vec_id") % 2 == 0)
    t0 = time.perf_counter()
    semdedup_against(
        new, ref, dim=64, n_planes=n_planes, n_tables=8, qbits=8,
        threshold=(3, 10),
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def best_of(spark, sf_dir: str, n_planes: int, n: int = 2) -> float:
    return round(min(run_once(spark, sf_dir, n_planes) for _ in range(n + 1)[1:]), 2)


def main() -> None:
    x10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    base = "/root/testdata/sf0.1"
    spark = get_spark("scale_probe_r14")
    spark.range(100).count()

    n1 = load(spark, base, "embeddings").count()
    n10 = load(spark, x10, "embeddings").count()

    # warm-up (plan compile + page cache) then min-of-2 timed
    run_once(spark, base, 4)
    x1 = best_of(spark, base, 4)
    run_once(spark, x10, 4)
    x10_fixed = best_of(spark, x10, 4)
    run_once(spark, x10, 8)
    x10_grown = best_of(spark, x10, 8)

    out = {
        "n_embeddings": {"x1": n1, "x10": n10},
        "semdedup_against_fixed_buckets": {
            "x1": x1, "x10": x10_fixed,
            "ratio": round(x10_fixed / x1, 2) if x1 > 0 else None,
            "note": "n_planes pinned at 4: bucket count fixed -> candidate join ~quadratic in N (cautionary row)",
        },
        "semdedup_against_buckets_prop_N": {
            "x1_planes4": x1, "x10_planes8": x10_grown,
            "ratio": round(x10_grown / x1, 2) if x1 > 0 else None,
            "note": "n_planes 4->8 at x10 (16->256 buckets/table, >=10x): occupancy pinned, linear contract (planes ~ log2 N)",
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
