"""ThreadedSparkExecutor: independent producers build concurrently with
identical memoization semantics to the sequential executor."""

import json
import os
import threading
import time

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artigraph_spark import types as at
from artigraph_spark.artifacts import Artifact
from artigraph_spark.backends import JsonFileBackend, MemoryBackend
from artigraph_spark.executors import ThreadedSparkExecutor
from artigraph_spark.formats import JSON
from artigraph_spark.graphs import Graph
from artigraph_spark.producers import Producer
from artigraph_spark.storage import LocalFile
from artigraph_spark.versions import SemVer

NUM_TYPE = at.Collection(element=at.Struct(fields={"value": at.Int64()}))

_concurrent = {"current": 0, "max": 0}
_clock = threading.Lock()


class Nums(Artifact):
    pass


class SlowDouble(Producer):
    version = SemVer(major=1)

    nums: Nums

    def build(self, nums: DataFrame) -> DataFrame:
        with _clock:
            _concurrent["current"] += 1
            _concurrent["max"] = max(_concurrent["max"], _concurrent["current"])
        time.sleep(0.5)
        out = nums.withColumn("value", F.col("value") * 2)
        with _clock:
            _concurrent["current"] -= 1
        return out


def _seed(root):
    d = os.path.join(root, "g/nums/nums")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part-0.json"), "w") as f:
        f.write("\n".join(json.dumps({"value": v}) for v in [1, 2, 3]))


def _graph(root, backend, width=3):
    with Graph("g", backend=backend) as g:
        g.artifacts.nums = Nums(type=NUM_TYPE, format=JSON(), storage=LocalFile(root=root))
        for i in range(width):
            setattr(
                g.artifacts,
                f"out{i}",
                SlowDouble(nums=g.artifacts.nums).out(
                    Artifact(
                        type=NUM_TYPE,
                        storage=LocalFile(root=root, template="{root}/{graph_name}/{names}/{name}_%d/{partition_key_spec}/_fingerprint={input_fingerprint}" % i),
                    )
                ),
            )
    return g


def test_independent_producers_run_concurrently(tmp_root, spark):
    _concurrent["current"] = _concurrent["max"] = 0
    _seed(tmp_root)
    g = _graph(tmp_root, MemoryBackend(), width=3)
    ex = ThreadedSparkExecutor(max_workers=3)
    g.snapshot().build(ex)
    assert ex.built_partitions == 3
    assert _concurrent["max"] >= 2  # actually overlapped


def test_threaded_memoizes_like_sequential(tmp_root, spark):
    backend = JsonFileBackend(os.path.join(tmp_root, "catalog.json"))
    _seed(tmp_root)
    g = _graph(tmp_root, backend, width=2)
    ex1 = ThreadedSparkExecutor(max_workers=2)
    snap1 = g.snapshot(strict_fingerprints=True).build(ex1)
    assert ex1.built_partitions == 2

    g2 = _graph(tmp_root, backend, width=2)
    ex2 = ThreadedSparkExecutor(max_workers=2)
    g2.snapshot(strict_fingerprints=True).build(ex2)
    assert (ex2.built_partitions, ex2.skipped_partitions) == (0, 2)

    df = snap1.read(g.artifacts.out0)
    assert sorted(r["value"] for r in df.collect()) == [2, 4, 6]


def test_threaded_propagates_build_errors(tmp_root, spark):
    from artigraph_spark.executors import BuildError

    class Failing(SlowDouble):
        def validate_outputs(self, *outputs):
            return False, "nope"

    _seed(tmp_root)
    with Graph("g", backend=MemoryBackend()) as g:
        g.artifacts.nums = Nums(type=NUM_TYPE, format=JSON(), storage=LocalFile(root=tmp_root))
        g.artifacts.bad = Failing(nums=g.artifacts.nums).out(
            Artifact(type=NUM_TYPE, storage=LocalFile(root=tmp_root))
        )
    with pytest.raises(BuildError, match="nope"):
        g.snapshot().build(ThreadedSparkExecutor(max_workers=2))
