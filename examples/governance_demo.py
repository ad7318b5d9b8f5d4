"""Data-governance pipeline as an incremental Graph — the quality /
privacy / upsert-maintenance families end-to-end through the framework
layer.

orders (external parquet, raw artifact)
  → ProfileReport (one-pass per-column profile: counts, nulls, typed
     min/max, HLL distinct estimates — the ingest-time table report)
  → PrivacyAudit (k-anonymity violating classes over the
     (status, priority, order-month) quasi-identifiers)
  → DiversityAudit (l-diversity: QI classes whose distinct customer
     count is under l — membership would leak who ordered)
  → MergedSnapshot (cdc_apply: the pre-1997 "current order per
     customer" snapshot updated by the post-1997 changelog — finalized
     orders delete the key, everything else upserts, latest change
     per key wins)

The demo then cross-checks cdc_apply against snapshot_diff — the two
CDC operators must cohere: diffing base vs merged has to report exactly
the added/removed/changed counts computed independently from the
changelog winners. Built twice to prove the whole governance surface
memoizes (second build is a no-op).

Run: python examples/governance_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artigraph_spark import types as at
from artigraph_spark.artifacts import Artifact
from artigraph_spark.backends import JsonFileBackend
from artigraph_spark.executors import LocalSparkExecutor
from artigraph_spark.formats import Parquet
from artigraph_spark.graphs import Graph
from artigraph_spark.producers import Producer
from artigraph_spark.session import get_spark
from artigraph_spark.storage import LocalFile
from artigraph_spark.versions import SemVer

ORDERS_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "o_orderkey": at.Int64(),
            "o_custkey": at.Int64(),
            "o_orderstatus": at.String(),
            "o_totalprice": at.Float64(),
            "o_orderdate": at.Timestamp(),
            "o_orderpriority": at.String(),
        }
    )
)

PROFILE_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "column": at.String(),
            "n": at.Int64(),
            "nulls": at.Int64(),
            "distinct_est": at.Float64(),
            "min_s": at.String(),
            "max_s": at.String(),
        }
    )
)

KANON_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "o_orderstatus": at.String(),
            "o_orderpriority": at.String(),
            "order_month": at.String(),
            "class_n": at.Int64(),
        }
    )
)

LDIV_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "o_orderstatus": at.String(),
            "o_orderpriority": at.String(),
            "class_n": at.Int64(),
            "n_sensitive": at.Int64(),
        }
    )
)

TCLOSE_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "o_orderpriority": at.String(),
            "order_month": at.String(),
            "class_n": at.Int64(),
            "emd_r": at.Float64(),
        }
    )
)

MERGED_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "o_custkey": at.Int64(),
            "o_orderkey": at.Int64(),
            "o_totalprice": at.Float64(),
        }
    )
)

DP_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "o_orderpriority": at.String(),
            "n": at.Int64(),
            "noise_r": at.Float64(),
            "noisy_n_r": at.Float64(),
        }
    )
)

CUT = "1997-01-01"
DP_EPSILON = 0.5
DP_SEED = 11


class Orders(Artifact):
    pass


class ProfileReport(Producer):
    version = SemVer(major=1)

    orders: Orders

    def build(self, orders: DataFrame) -> DataFrame:
        from artigraph_spark.operators.quality import profile_table

        return profile_table(
            orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
        )


class PrivacyAudit(Producer):
    version = SemVer(major=1)

    orders: Orders

    def build(self, orders: DataFrame) -> DataFrame:
        from artigraph_spark.operators.privacy import k_anonymity

        qi = orders.withColumn(
            "order_month", F.date_format("o_orderdate", "yyyy-MM")
        )
        return k_anonymity(
            qi, ["o_orderstatus", "o_orderpriority", "order_month"], 10
        ).select("o_orderstatus", "o_orderpriority", "order_month", "class_n")


class DiversityAudit(Producer):
    version = SemVer(major=1)

    orders: Orders

    def build(self, orders: DataFrame) -> DataFrame:
        from artigraph_spark.operators.privacy import l_diversity

        return l_diversity(
            orders, ["o_orderstatus", "o_orderpriority"], "o_custkey", 50
        ).select("o_orderstatus", "o_orderpriority", "class_n", "n_sensitive")


class ClosenessAudit(Producer):
    version = SemVer(major=1)

    orders: Orders

    def build(self, orders: DataFrame) -> DataFrame:
        from artigraph_spark.operators.privacy import t_closeness

        qi = orders.withColumn(
            "order_month", F.date_format("o_orderdate", "yyyy-MM")
        )
        return t_closeness(
            qi, ["o_orderpriority", "order_month"], "o_orderstatus"
        )


class NoisyRelease(Producer):
    """The release side of the privacy trio: the audits above say what
    is UNSAFE to publish raw; this publishes the priority histogram
    under the derandomized Laplace-SHAPED mechanism (pseudo-DP: the
    deterministic bounded noise carries NO formal epsilon-DP guarantee —
    the output is masked, not private). A memoized re-build republishes
    the SAME noisy view — re-running must not publish a second
    independent draw, which is exactly what the content-key
    derandomization guarantees."""

    version = SemVer(major=1)

    orders: Orders

    def build(self, orders: DataFrame) -> DataFrame:
        from artigraph_spark.operators.privacy import pseudo_dp_noisy_counts

        return pseudo_dp_noisy_counts(
            orders, "o_orderpriority", epsilon=DP_EPSILON, seed=DP_SEED
        )


def _base_and_changes(orders: DataFrame) -> tuple[DataFrame, DataFrame]:
    from pyspark.sql import Window

    cut = F.lit(CUT).cast("timestamp")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    base = (
        orders.filter(F.col("o_orderdate") < cut)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    chg = orders.filter(F.col("o_orderdate") >= cut).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.when(F.col("o_orderstatus") == "F", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return base, chg


class MergedSnapshot(Producer):
    version = SemVer(major=1)

    orders: Orders

    def build(self, orders: DataFrame) -> DataFrame:
        from artigraph_spark.operators.quality import cdc_apply

        base, chg = _base_and_changes(orders)
        return cdc_apply(
            base, chg, "o_custkey", order_cols=["o_orderdate", "o_orderkey"]
        )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="governance_demo_")
    backend = JsonFileBackend(os.path.join(root, "catalog.json"))
    spark = get_spark("governance_demo")

    def build_once() -> tuple[LocalSparkExecutor, Graph]:
        with Graph("governance", backend=backend) as g:
            g.artifacts.orders = Orders(
                type=ORDERS_TYPE,
                format=Parquet(),
                storage=LocalFile(root=sf_dir, template="{root}/orders.parquet"),
            )
            g.artifacts.profile = ProfileReport(orders=g.artifacts.orders).out(
                Artifact(type=PROFILE_TYPE, storage=LocalFile(root=root))
            )
            g.artifacts.kanon = PrivacyAudit(orders=g.artifacts.orders).out(
                Artifact(type=KANON_TYPE, storage=LocalFile(root=root))
            )
            g.artifacts.ldiv = DiversityAudit(orders=g.artifacts.orders).out(
                Artifact(type=LDIV_TYPE, storage=LocalFile(root=root))
            )
            g.artifacts.tclose = ClosenessAudit(orders=g.artifacts.orders).out(
                Artifact(type=TCLOSE_TYPE, storage=LocalFile(root=root))
            )
            g.artifacts.merged = MergedSnapshot(orders=g.artifacts.orders).out(
                Artifact(type=MERGED_TYPE, storage=LocalFile(root=root))
            )
            g.artifacts.release = NoisyRelease(orders=g.artifacts.orders).out(
                Artifact(type=DP_TYPE, storage=LocalFile(root=root))
            )
        ex = LocalSparkExecutor()
        g.snapshot(strict_fingerprints=True).build(ex)
        return ex, g

    ex1, g1 = build_once()
    snap = g1.snapshot(strict_fingerprints=True)

    from artigraph_spark.operators.quality import snapshot_diff
    from artigraph_spark.sources import load

    profile = {r["column"]: r for r in snap.read(g1.artifacts.profile).collect()}
    kanon = snap.read(g1.artifacts.kanon).collect()
    ldiv = snap.read(g1.artifacts.ldiv).collect()
    merged = snap.read(g1.artifacts.merged)

    orders = load(spark, sf_dir, "orders")
    n_orders = orders.count()
    assert set(profile) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    }
    assert profile["o_orderkey"]["n"] == n_orders
    assert profile["o_orderkey"]["nulls"] == 0
    # order keys are unique: the HLL estimate must sit near n
    assert abs(profile["o_orderkey"]["distinct_est"] / n_orders - 1) < 0.25
    assert kanon and all(r["class_n"] < 10 for r in kanon)
    assert all(r["n_sensitive"] < 50 for r in ldiv)
    tclose = snap.read(g1.artifacts.tclose).collect()
    assert tclose and all(0.0 <= r["emd_r"] <= 1.0 for r in tclose)

    # Pseudo-DP release: noise bounded by b*ln(p), additive consistency,
    # and — the point of derandomization — recomputing the release NOW
    # yields byte-identical noise to the stored artifact (a re-run
    # republishes the same masked view instead of a second draw).
    import math as _math

    from artigraph_spark.operators.privacy import pseudo_dp_noisy_counts

    release = {r["o_orderpriority"]: r for r in snap.read(g1.artifacts.release).collect()}
    b = 1.0 / DP_EPSILON
    for r in release.values():
        assert abs(r["noise_r"]) <= b * _math.log(1000000007.0)
        assert abs(r["noisy_n_r"] - (r["n"] + r["noise_r"])) < 1e-9
    recomputed = {
        r["o_orderpriority"]: r
        for r in pseudo_dp_noisy_counts(
            orders, "o_orderpriority", epsilon=DP_EPSILON, seed=DP_SEED
        ).collect()
    }
    assert {k: tuple(v) for k, v in release.items()} == {
        k: tuple(v) for k, v in recomputed.items()
    }

    # cdc_apply ∘ snapshot_diff coherence: diff(base, merged) must report
    # exactly the added/removed/changed the changelog winners imply.
    base, chg = _base_and_changes(orders)
    from pyspark.sql import Window

    wv = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    winners = (
        chg.withColumn("__rn", F.row_number().over(wv))
        .filter("__rn = 1")
        .select("o_custkey", "o_orderkey", "o_totalprice", "op")
    )
    b = base.alias("b").join(
        winners.alias("w"), "o_custkey", "full_outer"
    )
    expected = {
        "added": b.filter("b.o_orderkey IS NULL AND w.op = 'U'").count(),
        "removed": b.filter("b.o_orderkey IS NOT NULL AND w.op = 'D'").count(),
        "changed": b.filter(
            "b.o_orderkey IS NOT NULL AND w.op = 'U' "
            "AND (b.o_orderkey != w.o_orderkey OR b.o_totalprice != w.o_totalprice)"
        ).count(),
    }
    got = {
        r["status"]: r["n"]
        for r in snapshot_diff(
            base, merged, "o_custkey", ["o_orderkey", "o_totalprice"]
        ).collect()
    }
    for status, n in expected.items():
        assert got.get(status, 0) == n, (status, n, got)
    print(
        f"build 1: built={ex1.built_partitions} profile_cols={len(profile)} "
        f"kanon_violations={len(kanon)} ldiv_violations={len(ldiv)} "
        f"merged_rows={merged.count()} diff={got}"
    )
    assert ex1.built_partitions == 6

    ex2, _ = build_once()
    print(f"build 2: built={ex2.built_partitions} skipped={ex2.skipped_partitions}")
    assert ex2.built_partitions == 0

    print("governance demo OK:", root)


if __name__ == "__main__":
    main()
