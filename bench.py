"""Headline benchmark: runs the flagged bench queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed over a full execution (foreach-noop action — results are
consumed on executors, nothing collected to the driver). A warmup pass runs
one trivial job first so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from artigraph_spark.queries import bench_queries  # noqa: E402
from artigraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("artigraph_spark_bench")

    # Warm up the JVM / parquet footer caches with a trivial job.
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name, fn in sorted(bench_queries().items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.foreach(lambda _: None)  # full execution, no driver collect
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
