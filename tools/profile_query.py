"""Per-query optimization profiler (r14): isolate one or more bench/registry
queries, time them with the bench.py methodology (untimed warm-up, median of
3 noop-sink runs), record stage counts and per-stage wall durations from the
status tracker, and optionally dump `.explain("formatted")` to
plans/r14/<name>_<tag>.txt.

Usage:
  python tools/profile_query.py [--plans TAG] [--runs N] name [name ...]

Stage timing is read back from the status tracker per job group: for every
stage the (completion - submission) wall time, sorted descending, so the
expensive stage of a 100-stage pipeline is visible without the UI.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from artigraph_spark.queries import bench_queries, queries  # noqa: E402
from artigraph_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    tag = None
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            tag = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_query")
    qs = dict(queries())
    qs.update(bench_queries())

    from artigraph_spark.sources import load

    spark.range(1000).count()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load(spark, sf_dir, t).limit(1000).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    jsc = sc._jsc.sc()

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if tag:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = Path(__file__).resolve().parent.parent / "plans" / os.environ.get(
                "SPARK_GRAFT_PLAN_ROUND", "r15"
            )
            out.mkdir(parents=True, exist_ok=True)
            (out / f"{name}_{tag}.txt").write_text(plan)
            del df

        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        del df
        gc.collect()

        # stage and job counts for the warm-up pass of this group
        stage_times: list[tuple[int, float]] = []
        n_jobs = len(tracker.getJobIdsForGroup(group))
        sids = set()
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            if info is not None:
                sids.update(info.stageIds)

        sc.setJobGroup(f"timed:{name}", name)
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            del df
            gc.collect()
        med = sorted(ts)[len(ts) // 2]
        results[name] = {
            "median_sec": round(med, 3),
            "warm_first_sec": round(warm, 3),
            "runs": [round(t, 3) for t in ts],
            "n_stages": len(sids),
            "n_jobs": n_jobs,
        }
        print(json.dumps({name: results[name]}))
    print(json.dumps({"all": {n: r["median_sec"] for n, r in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
