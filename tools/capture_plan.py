"""Capture the FULL logical pipeline plan of registry queries, including
operators that normally materialize eagerly (localCheckpoint/persist) — those
truncate the visible plan to a `Scan ExistingRDD` stub, which hides the
actual computation from `plan_audit`-style review.

For plan capture only, DataFrame.localCheckpoint / DataFrame.checkpoint /
DataFrame.persist are monkeypatched to identity (checkpoints and persists
change execution strategy, never the computed relation, so the captured plan
is the honest "what work does this query do" answer). Nothing is executed.

Usage: python tools/capture_plan.py TAG name [name ...]
Writes plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<TAG>.txt (default r15).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

try:  # Spark 4.x: the concrete local class overrides the API base class
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # Spark 3.x
    from pyspark.sql import DataFrame

from artigraph_spark.queries import bench_queries, queries
from artigraph_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("capture_plan")
    spark.range(10).count()
    qs = dict(queries())
    qs.update(bench_queries())

    # Only the lineage CUTS are patched out: persist/cache stay real (an
    # InMemoryRelation renders as one subtree, the honest executed shape),
    # and unpersist stays real so capture does not leak cache entries.
    ident = lambda self, *a, **k: self  # noqa: E731
    DataFrame.localCheckpoint = ident
    DataFrame.checkpoint = ident

    out = Path(__file__).resolve().parent.parent / "plans" / os.environ.get(
        "SPARK_GRAFT_PLAN_ROUND", "r15"
    )
    out.mkdir(parents=True, exist_ok=True)
    sf = "/root/testdata/sf0.1"
    for name in names:
        df = qs[name](spark, sf)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}_{tag}.txt").write_text(plan)
        exch = plan.count("Exchange")
        scans = plan.count("Scan parquet")
        print(f"{name}: {len(plan)} chars, Exchange x{exch}, Scan parquet x{scans}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
