"""Event analytics + sketches as an incremental Graph — the monitoring
operator family end-to-end through the framework layer.

events (external parquet, raw artifact; ts declared at.Timestamp — the
type bridge hands producers a real TimestampType column)
  → BuildSketches (TWO bounded mergeable summaries, materialized as
     catalog artifacts: HyperLogLog registers + count-min cells — the
     "monitoring snapshot" a 100 TB stream compacts into)
  → FunnelReport (ordered view→click→purchase stage table per user)
  → AnomalyReport (hourly >2σ volume outliers per event type)
  → TrendReport (per-type least-squares slope of hourly volume — the
     round-6 closed-form trend operator, exact-int64 statistics)

Demonstrates that the sketch family composes with memoization: sketches
are tiny content-addressed artifacts, a rebuild on unchanged input is a
no-op, and the distinct-count estimate read back from the STORED
registers matches the live-data estimate (sketch-of-data ==
data-of-sketch, the mergeability contract).

Run: python examples/analytics_demo.py [sf_dir]
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

EVENTS_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "event_id": at.Int64(),
            "ts": at.Timestamp(),  # bridged to Spark TimestampType on read
            "user_id": at.Int64(),
            "event_type": at.String(),
            "value": at.Float64(),
            "props": at.String(),
        }
    )
)

HLL_TYPE = at.Collection(
    element=at.Struct(fields={"register": at.Int64(), "max_rho": at.Int32()})
)

CMS_TYPE = at.Collection(
    element=at.Struct(
        fields={"depth_id": at.Int32(), "bucket": at.Int64(), "cnt": at.Int64()}
    )
)

FUNNEL_TYPE = at.Collection(
    element=at.Struct(fields={"user_id": at.Int64(), "stage_reached": at.Int32()})
)

TREND_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "event_type": at.String(),
            "n_buckets": at.Int64(),
            "slope": at.Float64(),
        }
    )
)

ANOMALY_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "event_type": at.String(),
            "window_start": at.String(),
            "n": at.Int64(),
            "zscore_r": at.Float64(),
        }
    )
)


class Events(Artifact):
    pass


def _with_ts(events: DataFrame) -> DataFrame:
    """The declared at.Timestamp type already hands producers a proper
    TimestampType column (the round-6 fix: the old manual int64-nanos
    division silently corrupted µs fixtures 1000×); kept as a hook for
    fixtures that really do carry raw int64 nanos."""
    from pyspark.sql import types as T

    if isinstance(events.schema["ts"].dataType, T.LongType):
        return events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return events


class BuildSketches(Producer):
    version = SemVer(major=1)

    events: Events

    def build(self, events: DataFrame) -> tuple[DataFrame, DataFrame]:
        from artigraph_spark.operators.sketches import count_min_sketch, hll_sketch

        # HLL over event ids (cardinality >> 2.5·m — the raw estimator's
        # valid range; user_id at sf0.001 is only 15 distinct, squarely in
        # the small-range regime the no-linear-counting tradeoff documents).
        hll = hll_sketch(events, "event_id", m=256)
        cms = count_min_sketch(events, "user_id", width=256, depth=4)
        return hll, cms


class FunnelReport(Producer):
    version = SemVer(major=1)

    events: Events

    def build(self, events: DataFrame) -> DataFrame:
        from artigraph_spark.operators.timeseries import funnel_stages

        return funnel_stages(_with_ts(events)).select(
            "user_id", F.col("stage_reached").cast("int").alias("stage_reached")
        )


class AnomalyReport(Producer):
    version = SemVer(major=1)

    events: Events

    def build(self, events: DataFrame) -> DataFrame:
        from artigraph_spark.operators.timeseries import hourly_anomalies

        return hourly_anomalies(_with_ts(events)).select(
            "event_type",
            F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "zscore_r",
        )


class TrendReport(Producer):
    version = SemVer(major=1)

    events: Events

    def build(self, events: DataFrame) -> DataFrame:
        from artigraph_spark.operators.timeseries import trend_slopes

        return trend_slopes(_with_ts(events), "event_type", "ts")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="analytics_demo_")
    backend = JsonFileBackend(os.path.join(root, "catalog.json"))
    spark = get_spark("analytics_demo")
    # For TIMESTAMP(NANOS) fixtures the reader needs the nanos escape
    # hatch; µs fixtures ignore it. Either way the declared at.Timestamp
    # type yields a TimestampType column after the bridge.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def build_once() -> tuple[LocalSparkExecutor, Graph]:
        with Graph("event_analytics", backend=backend) as g:
            g.artifacts.events = Events(
                type=EVENTS_TYPE,
                format=Parquet(),
                storage=LocalFile(root=sf_dir, template="{root}/events.parquet"),
            )
            hll, cms = BuildSketches(events=g.artifacts.events).out(
                Artifact(type=HLL_TYPE, storage=LocalFile(root=root)),
                Artifact(type=CMS_TYPE, storage=LocalFile(root=root)),
            )
            g.artifacts.hll = hll
            g.artifacts.cms = cms
            g.artifacts.funnel = FunnelReport(events=g.artifacts.events).out(
                Artifact(type=FUNNEL_TYPE, storage=LocalFile(root=root))
            )
            g.artifacts.anomalies = AnomalyReport(events=g.artifacts.events).out(
                Artifact(type=ANOMALY_TYPE, storage=LocalFile(root=root))
            )
            g.artifacts.trends = TrendReport(events=g.artifacts.events).out(
                Artifact(type=TREND_TYPE, storage=LocalFile(root=root))
            )
        ex = LocalSparkExecutor()
        g.snapshot(strict_fingerprints=True).build(ex)
        return ex, g

    ex1, g1 = build_once()
    snap = g1.snapshot(strict_fingerprints=True)

    from artigraph_spark.operators.sketches import hll_estimate
    from artigraph_spark.sources import load

    hll_stored = snap.read(g1.artifacts.hll)
    est = hll_estimate(hll_stored, m=256).collect()[0]["estimate"]
    exact = load(spark, sf_dir, "events").select("event_id").distinct().count()
    funnel = snap.read(g1.artifacts.funnel)
    anomalies = snap.read(g1.artifacts.anomalies).count()
    trends = snap.read(g1.artifacts.trends).collect()
    print(
        f"build 1: built={ex1.built_partitions} hll_est={est:.1f} "
        f"exact_events={exact} funnel_rows={funnel.count()} anomalies={anomalies} "
        f"trends={[(r['event_type'], r['slope']) for r in trends]}"
    )
    assert ex1.built_partitions == 4
    assert len(trends) == 5 and all(r["slope"] is not None for r in trends)
    # the STORED registers must estimate like live data (mergeable summary)
    assert abs(est / exact - 1.0) < 0.25  # m=256 standard error ~6.5%
    assert funnel.filter(F.col("stage_reached") >= 2).count() > 0

    ex2, _ = build_once()
    print(f"build 2: built={ex2.built_partitions} skipped={ex2.skipped_partitions}")
    assert ex2.built_partitions == 0

    print("analytics demo OK:", root)


if __name__ == "__main__":
    main()
