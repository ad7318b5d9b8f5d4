"""Executor: topo-ordered incremental build with partition memoization.

Parity with /root/reference/src/arti/executors/: the build loop walks
producers in topological order; for each output PartitionKey it computes the
input fingerprint (code ⊕ version ⊕ input contents) and SKIPS the build if
an output partition with that (key, input_fingerprint) already exists in the
backend — the content-addressed memoization that is the engine's core
value-add (executors/__init__.py:34-105, proven by
tests/arti/graphs/test_graph.py:259-327).

Spark-native: producer bodies receive lazy DataFrames (or driver-local
scalars per their declared views); each build/write is a Spark job. The
loop itself is driver-side metadata work — at 100 TB the data plane never
transits the driver.
"""

from __future__ import annotations

import inspect
from typing import Any, get_type_hints

from artigraph_spark import io
from artigraph_spark.graphs import GraphSnapshot
from artigraph_spark.partitions import PartitionKey
from artigraph_spark.producers import Producer
from artigraph_spark.storage import StoragePartition
from artigraph_spark.views import View, view_for_annotation


class BuildError(RuntimeError):
    pass


class LocalSparkExecutor:
    """Sequential driver loop (parallelizable across independent producers
    later; each producer body is already cluster-parallel)."""

    def __init__(self, *, strict_fingerprints: bool = False) -> None:
        self.strict = strict_fingerprints
        self.built_partitions = 0
        self.skipped_partitions = 0

    def build(self, snapshot: GraphSnapshot) -> None:
        graph = snapshot.graph
        backend = graph.backend
        for producer, outputs in graph.build_order():
            input_partitions = {
                name: tuple(
                    backend.read_snapshot_partitions(
                        snapshot.snapshot_id, artifact.fingerprint
                    )
                )
                for name, artifact in producer.inputs().items()
            }
            for name, parts in input_partitions.items():
                if not parts:
                    raise BuildError(
                        f"{type(producer).__name__} input {name!r} has no partitions "
                        f"for this snapshot — upstream build missing?"
                    )
            dependencies = producer.map(**input_partitions)
            output_artifacts = {
                pos: graph._artifacts[key] for pos, key in sorted(outputs.items())
            }
            for partition_key, dep_inputs in dependencies.items():
                input_fp = producer.compute_input_fingerprint(dep_inputs)
                existing_per_output = {}
                for pos, artifact in output_artifacts.items():
                    existing = backend.read_artifact_partitions(
                        artifact.fingerprint, input_fingerprints={input_fp.key}
                    )
                    match = [
                        p for p in existing if p.partition_key == partition_key
                    ]
                    if match:
                        existing_per_output[pos] = match
                if len(existing_per_output) == len(output_artifacts):
                    # Memoized: link existing partitions to this snapshot, skip.
                    for pos, artifact in output_artifacts.items():
                        backend.link_snapshot_partitions(
                            snapshot.snapshot_id,
                            artifact.fingerprint,
                            existing_per_output[pos],
                        )
                    self.skipped_partitions += 1
                    continue
                self._build_partition(
                    snapshot, producer, dep_inputs, partition_key, input_fp, output_artifacts
                )
                self.built_partitions += 1

    def _build_partition(
        self,
        snapshot: GraphSnapshot,
        producer: Producer,
        dep_inputs: dict[str, tuple[StoragePartition, ...]],
        partition_key: PartitionKey,
        input_fp: Any,
        output_artifacts: dict[int, Any],
    ) -> None:
        graph = snapshot.graph
        views = _build_param_views(producer)
        inputs = {}
        for name, parts in dep_inputs.items():
            artifact = producer.inputs()[name]
            inputs[name] = io.read(
                artifact.type,
                artifact.format,
                artifact.storage,
                list(parts),
                views[name],
                graph.spark,
            )
        result = producer.build(**inputs)
        results = result if isinstance(result, tuple) else (result,)
        if len(results) != len(output_artifacts):
            raise BuildError(
                f"{type(producer).__name__} returned {len(results)} outputs, "
                f"expected {len(output_artifacts)}"
            )
        ok, msg = producer.validate_outputs(*results)
        if not ok:
            raise BuildError(f"{type(producer).__name__} validate_outputs failed: {msg}")
        for pos, artifact in output_artifacts.items():
            self._check_statistics(artifact, results[pos], producer)
            snapshot.write(
                results[pos],
                artifact,
                partition_key=partition_key,
                input_fingerprint=input_fp,
            )

    def _check_statistics(self, artifact: Any, result: Any, producer: Producer) -> None:
        """The reference's stubbed statistics/threshold hook
        (executors/local.py:26-29), for real: one agg pass, gate the write."""
        from pyspark.sql import DataFrame

        from artigraph_spark import statistics as st

        if not artifact.statistics or not isinstance(result, DataFrame):
            return
        res = st.evaluate(result, tuple(artifact.statistics))
        if not res.ok:
            raise BuildError(
                f"{type(producer).__name__} output failed statistics thresholds: "
                + "; ".join(res.failures)
            )


def _build_param_views(producer: Producer) -> dict[str, type[View]]:
    hints = get_type_hints(type(producer).build)
    views = {}
    for name in producer._input_names:
        ann = hints.get(name, inspect.Parameter.empty)
        views[name] = view_for_annotation(ann)
    return views
