"""Round-7 targeted scale probe: time named queries at sf0.1 and against
the pre-built ×K replicated fixtures (``/tmp/artigraph_scale_x{K}``,
built by ``tools/scale_probe.py``), printing per-query ratios. Each
query gets one warm-up pass (JIT/codegen) before the timed pass, and
result frames are dropped + GC'd between runs so pinned
localCheckpoint blocks can't inflate neighbours.

Usage: python tools/scale_probe_r7.py [K] query1 query2 ...
       python tools/scale_probe_r7.py query1 query2 ...   (K defaults to 10)

If the fixture dir is missing, it is rebuilt via scale_probe.replicate.
"""

from __future__ import annotations

import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from artigraph_spark.queries import queries
from artigraph_spark.session import get_spark


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    qs = queries()
    timings = {}
    for name in names:
        # Build INSIDE the timed region: eager operators (localCheckpoint
        # results) do their work at build time, not at the noop write.
        df = qs[name](spark, sf_dir)  # warm-up (JIT/codegen)
        df.write.format("noop").mode("overwrite").save()
        del df
        gc.collect()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
        del df
        gc.collect()
    return timings


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0].isdigit():
        k, names = int(argv[0]), argv[1:]
    else:
        k, names = 10, argv
    if not names:
        raise SystemExit("usage: scale_probe_r7.py [K] query1 query2 ...")
    src = "/root/testdata/sf0.1"
    out = f"/tmp/artigraph_scale_x{k}"
    spark = get_spark("scale_probe_r7")
    spark.range(100).count()
    if not Path(out, "lineitem.parquet").exists():
        from tools.scale_probe import replicate

        replicate(spark, src, out, k)
    base = time_queries(spark, src, names)
    big = time_queries(spark, out, names)
    print(
        json.dumps(
            {
                "replication": k,
                "sf0.1_sec": base,
                f"x{k}_sec": big,
                "ratio": {
                    q: (round(big[q] / base[q], 1) if base[q] > 0 else None)
                    for q in base
                },
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
