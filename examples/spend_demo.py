"""The reference's spend demo re-expressed on Spark
(/root/reference/docs/examples/spend/demo.py): a date-partitioned
transactions source, one aggregating producer, incremental rebuild.

Run: python examples/spend_demo.py
Expected: first build computes total_spend = 42.0; second build skips
everything (memoized).
"""

from __future__ import annotations

import json
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
from artigraph_spark.formats import JSON
from artigraph_spark.graphs import Graph
from artigraph_spark.producers import Producer
from artigraph_spark.storage import LocalFile
from artigraph_spark.versions import SemVer

TRANSACTIONS_TYPE = at.Collection(
    element=at.Struct(
        fields={
            "id": at.Int64(),
            "date": at.Date(),
            "amount": at.Float64(),
        }
    ),
    partition_by=("date",),
)


class Transactions(Artifact):
    pass


class TotalSpend(Artifact):
    pass


class AggregateSpend(Producer):
    version = SemVer(major=1)

    transactions: Transactions

    def build(self, transactions: DataFrame) -> float:
        # Distributed aggregation; only the single float reaches the driver.
        return transactions.agg(F.sum("amount")).collect()[0][0]


def seed_transactions(root: str) -> None:
    rows = {
        "2021-10-01": [
            {"id": 1, "date": "2021-10-01", "amount": 9.95},
            {"id": 2, "date": "2021-10-01", "amount": 7.5},
        ],
        "2021-10-02": [
            {"id": 3, "date": "2021-10-02", "amount": 5.0},
            {"id": 4, "date": "2021-10-02", "amount": 12.0},
            {"id": 5, "date": "2021-10-02", "amount": 7.55},
        ],
    }
    for date, data in rows.items():
        d = os.path.join(root, "demo/transactions/transactions", f"date={date}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-0.json"), "w") as f:
            f.write("\n".join(json.dumps(r) for r in data))


def make_graph(root: str) -> tuple[Graph, Artifact]:
    backend = JsonFileBackend(os.path.join(root, "catalog.json"))
    with Graph("demo", backend=backend) as g:
        g.artifacts.transactions = Transactions(
            type=TRANSACTIONS_TYPE,
            format=JSON(),
            storage=LocalFile(root=root),
        )
        agg = AggregateSpend(transactions=g.artifacts.transactions)
        g.artifacts.total_spend = agg.out(
            TotalSpend(type=at.Float64(), format=JSON(), storage=LocalFile(root=root))
        )
    return g, g.artifacts.total_spend


def main() -> None:
    root = tempfile.mkdtemp(prefix="spend_demo_")
    seed_transactions(root)

    g, total_spend = make_graph(root)
    ex1 = LocalSparkExecutor()
    snap1 = g.snapshot().build(ex1)
    value = snap1.read(total_spend, annotation=float)
    print(f"build 1: total_spend={value} built={ex1.built_partitions} skipped={ex1.skipped_partitions}")
    assert abs(value - 42.0) < 1e-9, value
    assert ex1.built_partitions == 1

    # Second build: nothing changed -> zero builds (memoized).
    g2, total_spend2 = make_graph(root)
    ex2 = LocalSparkExecutor()
    snap2 = g2.snapshot().build(ex2)
    value2 = snap2.read(total_spend2, annotation=float)
    print(f"build 2: total_spend={value2} built={ex2.built_partitions} skipped={ex2.skipped_partitions}")
    assert ex2.built_partitions == 0 and ex2.skipped_partitions == 1
    assert snap2.snapshot_id == snap1.snapshot_id

    print("spend demo OK:", root)


if __name__ == "__main__":
    main()
