"""Skewed-key join probe: salted_join vs the plain shuffle join on a
hot-key distribution, at two skew levels (5% and 50% of all rows on ONE
key — a 10x skew step). Evidence for operators/joins.py:salted_join's
claim that salting spreads a melting reducer across `salt` buckets.

Setup mirrors the 100 TB failure mode it defends against: the dimension
side is forced OFF the broadcast path (autoBroadcastJoinThreshold=-1 —
standing in for a dim table too large to broadcast), so the join must
shuffle both sides on the key and the hot key lands on one reducer.
Three configs are timed per skew level:

- plain          : shuffle join, AQE skew-split disabled
- plain_aqe_skew : shuffle join, AQE skew-split enabled (the built-in fix)
- salted         : salted_join(salt=16), AQE skew-split disabled

Run CONTENTION-FREE (no concurrent Spark sessions) or the numbers are
garbage. Usage: python tools/skew_probe.py [N_rows] [N_keys]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from artigraph_spark.operators.joins import salted_join
from artigraph_spark.session import get_spark


def build(spark, n: int, k: int, p_hot: float, out: str) -> None:
    """Left: n facts, `p_hot` of them on key 0, rest uniform over k-1 keys
    (deterministic, id-hashed). Right: k-row dimension."""
    left = (
        spark.range(n)
        .withColumn("u", (F.pmod(F.xxhash64("id"), 1_000_000) + 0.5) / 1_000_000.0)
        .withColumn(
            "key",
            F.when(F.col("u") < p_hot, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), k - 1) + 1)
            .cast("long"),
        )
        .select("id", "key", (F.col("id") % 97).alias("val"))
    )
    left.repartition(64).write.mode("overwrite").parquet(f"{out}/left.parquet")
    right = spark.range(k).select(
        F.col("id").alias("key"),
        F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
    )
    right.write.mode("overwrite").parquet(f"{out}/right.parquet")


def timed(df) -> float:
    """Untimed warm pass (footer reads, codegen, shuffle-service spin-up)
    then median of 3 — same methodology as bench.py; without the warm pass
    the first config measured eats all cold-start cost and the comparison
    is ordering noise."""
    df.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[1], 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark("skew_probe")
    spark.range(100).count()  # warm the JVM
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    report: dict = {"n_rows": n, "n_keys": k, "salt": 16, "levels": {}}
    # 5% -> 50% of all rows on one key: the x10 skew step. At 50% the hot
    # reducer holds half the fact table — the "one melting task" regime.
    for p_hot in (0.05, 0.50):
        out = f"/tmp/artigraph_skew_{int(p_hot * 100)}"
        build(spark, n, k, p_hot, out)
        left = spark.read.parquet(f"{out}/left.parquet")
        right = spark.read.parquet(f"{out}/right.parquet")

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plain = timed(left.join(right, "key"))
        salted = timed(salted_join(left, right, "key", salt=16))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        plain_aqe = timed(left.join(right, "key"))

        report["levels"][f"hot_{int(p_hot * 100)}pct"] = {
            "plain_sec": plain,
            "plain_aqe_skew_sec": plain_aqe,
            "salted_sec": salted,
            "salted_vs_plain": round(salted / plain, 2) if plain else None,
        }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
