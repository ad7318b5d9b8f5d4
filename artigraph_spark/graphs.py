"""Graph: a named web of Artifacts connected by Producers.

Parity with /root/reference/src/arti/graphs/__init__.py: context-managed
definition with a dotted artifact namespace (ArtifactBox), sealing +
acyclicity check on exit (:117-141), dependency maps (:164-200),
content-addressed GraphSnapshot (:294-360), snapshot-scoped read/write
(:205-291), and tagging (:370-385).

Spark-native: reads return DataFrames by default; builds run through
LocalSparkExecutor (artigraph_spark.executors) with partition memoization.
"""

from __future__ import annotations

import graphlib
from typing import Any
from urllib.parse import quote

from pyspark.sql import SparkSession

from artigraph_spark import io
from artigraph_spark import types as at
from artigraph_spark.artifacts import Artifact
from artigraph_spark.backends import Backend, MemoryBackend
from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.partitions import PartitionKey
from artigraph_spark.producers import Producer
from artigraph_spark.storage import StoragePartition
from artigraph_spark.views import View, view_for_annotation


class ArtifactBox:
    """Dotted namespace of artifacts: ``g.artifacts.a.b = artifact``.

    Assignment casts (Artifact.cast), late-binds storage templates with the
    graph name and dotted key, and strips the {input_fingerprint} template
    segment for raw artifacts (reference: graphs/__init__.py:56-87)."""

    def __init__(self, graph: Graph, prefix: str = "") -> None:
        object.__setattr__(self, "_graph", graph)
        object.__setattr__(self, "_prefix", prefix)

    def _key(self, name: str) -> str:
        return f"{self._prefix}.{name}" if self._prefix else name

    def __setattr__(self, name: str, value: Any) -> None:
        graph: Graph = self._graph
        if graph.sealed:
            raise RuntimeError(f"graph {graph.name!r} is sealed")
        key = self._key(name)
        artifact = Artifact.cast(value)
        # Percent-escape tag names/values like partition key values: a glob
        # metacharacter or '/' in a tag would otherwise write to a path that
        # discovery's pattern can never re-match.
        rendered_tags = "/".join(
            f"{quote(str(t), safe='')}={quote(str(v), safe='')}"
            for t, v in graph.path_tags.items()
        )
        resolved_storage = artifact.storage.resolve_templates(
            graph_name=graph.name,
            path_tags=rendered_tags,
            names=key.replace(".", "/"),
            name=name,
            strip_input_fingerprint=not artifact.is_produced,
        )
        artifact = artifact.model_copy(update={"storage": resolved_storage})
        graph._artifacts[key] = artifact
        if artifact.is_produced:
            graph._register_producer(key, artifact)

    def __getattr__(self, name: str) -> Any:
        graph: Graph = self._graph
        key = self._key(name)
        if key in graph._artifacts:
            return graph._artifacts[key]
        subprefix = key + "."
        if any(k.startswith(subprefix) for k in graph._artifacts) or not graph.sealed:
            return ArtifactBox(graph, key)
        raise AttributeError(f"no artifact or namespace {key!r} in graph {graph.name!r}")


class Graph:
    def __init__(
        self,
        name: str,
        *,
        backend: Backend | None = None,
        spark: SparkSession | None = None,
        path_tags: dict[str, str] | None = None,
    ) -> None:
        self.name = name
        self.backend = backend or MemoryBackend()
        self._spark = spark
        # Rendered into storage templates as tag=value segments (reference:
        # graphs/__init__.py:105, storage/__init__.py:146-148) — lets two
        # deployments of the same graph (e.g. env=prod / env=dev) write to
        # disjoint path trees without changing artifact identity.
        self.path_tags: dict[str, str] = dict(path_tags or {})
        self._artifacts: dict[str, Artifact] = {}
        # producer node id -> (producer, {position: artifact key}); the node id
        # combines the fingerprint with the instance id so two IDENTICALLY
        # configured producers (same code, same inputs, different outputs)
        # stay distinct nodes.
        self._producers: dict[str, tuple[Producer, dict[int, str]]] = {}
        self.sealed = False

    # -- definition ---------------------------------------------------------

    @property
    def artifacts(self) -> ArtifactBox:
        return ArtifactBox(self)

    def __enter__(self) -> Graph:
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.seal()

    def seal(self) -> None:
        self.sealed = True
        # acyclicity check: graphlib raises CycleError on prepare()
        graphlib.TopologicalSorter(self.dependencies()).prepare()

    @property
    def spark(self) -> SparkSession:
        if self._spark is None:
            from artigraph_spark.session import get_spark

            self._spark = get_spark(f"graph:{self.name}")
        return self._spark

    def _register_producer(self, key: str, artifact: Artifact) -> None:
        bound = artifact.producer_output
        producer = bound.producer if hasattr(bound, "producer") else None
        if producer is None:
            raise ValueError("artifact has producer_output but no producer reference")
        node_id = f"{bound.producer_fingerprint.key}@{id(producer)}"
        entry = self._producers.get(node_id)
        if entry is None:
            self._producers[node_id] = (producer, {bound.position: key})
        elif bound.position in entry[1]:
            raise ValueError(
                f"output position {bound.position} of {type(producer).__name__} is "
                f"already assigned to {entry[1][bound.position]!r}; assigning it "
                f"again as {key!r} would orphan the first key — call .out() once "
                "per producer and assign each output to exactly one key"
            )
        else:
            entry[1][bound.position] = key

    # -- structure ----------------------------------------------------------

    def artifact_key(self, artifact: Artifact) -> str:
        target = artifact.fingerprint
        for key, a in self._artifacts.items():
            if a.fingerprint == target:
                return key
        raise LookupError("artifact is not in this graph")

    def dependencies(self) -> dict[str, set[str]]:
        """node -> set of prerequisite nodes. Artifact nodes are their dotted
        keys; producer nodes are ``producer:<fingerprint>``."""
        deps: dict[str, set[str]] = {k: set() for k in self._artifacts}
        for node_id, (producer, outputs) in self._producers.items():
            pnode = f"producer:{node_id}"
            deps[pnode] = set()
            for _name, input_artifact in producer.inputs().items():
                deps[pnode].add(self.artifact_key(input_artifact))
            for _pos, out_key in outputs.items():
                deps[out_key].add(pnode)
        return deps

    def build_order(self) -> list[tuple[Producer, dict[int, str]]]:
        order = list(graphlib.TopologicalSorter(self.dependencies()).static_order())
        out = []
        for node in order:
            if node.startswith("producer:"):
                out.append(self._producers[node.split(":", 1)[1]])
        return out

    def raw_artifacts(self) -> dict[str, Artifact]:
        return {k: a for k, a in self._artifacts.items() if not a.is_produced}

    # -- snapshot / build ---------------------------------------------------

    def definition_fingerprint(self) -> Fingerprint:
        fp = Fingerprint.from_string(f"Graph:{self.name}")
        for key, artifact in sorted(self._artifacts.items()):
            # BIND key to artifact (hash of the pair) — combining them as two
            # separate XOR terms is separable, so swapping two artifacts
            # between keys would collide on the same graph fingerprint.
            fp = fp.combine(
                Fingerprint.from_string(f"{key}={artifact.fingerprint.key}")
            )
        # Producer nodes must contribute too: artifact fingerprints exclude
        # producer_output (so attaching a producer doesn't cascade-invalidate
        # data), which means div(a=x, b=y) and div(a=y, b=x) graphs would
        # otherwise collide — the producer's Model fingerprint hashes its
        # input artifacts BY FIELD NAME, making the binding part of graph
        # identity (reference: snapshot combines node.fingerprint for every
        # node, graphs/__init__.py:330-332). The in-memory node id (which
        # embeds id(obj)) must NOT leak in — it changes every process.
        for _node_id, (prod, outputs) in self._producers.items():
            binding = ",".join(f"{pos}:{key}" for pos, key in sorted(outputs.items()))
            fp = fp.combine(
                Fingerprint.from_string(f"producer:{prod.fingerprint.key}=>{binding}")
            )
        return fp

    def snapshot(self, *, strict_fingerprints: bool = False) -> GraphSnapshot:
        return GraphSnapshot.from_graph(self, strict=strict_fingerprints)

    def build(self, executor: Any = None) -> GraphSnapshot:
        snap = self.snapshot()
        return snap.build(executor)

    # -- IO -----------------------------------------------------------------

    def read(
        self,
        artifact: Artifact,
        *,
        annotation: Any = None,
        view: type[View] | None = None,
        snapshot: GraphSnapshot | None = None,
    ) -> Any:
        if view is None:
            if annotation is None:
                from artigraph_spark.views import SparkDataFrameView

                view = SparkDataFrameView
            else:
                view = view_for_annotation(annotation)
        if not view.supports_type(artifact.type):
            raise TypeError(f"view {view.__name__} does not support {artifact.type!r}")
        if snapshot is None:
            if artifact.is_produced:
                raise ValueError("reading a produced artifact requires a snapshot")
            partitions = artifact.storage.discover_partitions(
                PartitionKey.types_from(artifact.type)
            )
        else:
            partitions = self.backend.read_snapshot_partitions(
                snapshot.snapshot_id, artifact.fingerprint
            )
        return io.read(
            artifact.type, artifact.format, artifact.storage, partitions, view, self.spark
        )

    def write(
        self,
        data: Any,
        artifact: Artifact,
        *,
        partition_key: PartitionKey | None = None,
        input_fingerprint: Fingerprint | None = None,
        view: type[View] | None = None,
        snapshot: GraphSnapshot | None = None,
        strict_fingerprint: bool = False,
    ) -> StoragePartition:
        key = partition_key or PartitionKey.not_partitioned()
        fp = input_fingerprint or Fingerprint.empty()
        partition = artifact.storage.generate_partition(key, fp)
        if view is None:
            from artigraph_spark.views import SparkDataFrameView, PythonScalarView

            view = (
                SparkDataFrameView
                if isinstance(artifact.type, at.Collection)
                else PythonScalarView
            )
        partition = io.write(
            data, artifact.type, artifact.format, partition, view, self.spark,
            storage=artifact.storage,
        )
        partition = partition.compute_content_fingerprint(strict=strict_fingerprint)
        self.backend.write_artifact_partitions(artifact.fingerprint, [partition])
        if snapshot is not None:
            self.backend.link_snapshot_partitions(
                snapshot.snapshot_id, artifact.fingerprint, [partition]
            )
        return partition


class GraphSnapshot:
    """Graph + point-in-time content fingerprint of all raw input partitions.

    snapshot_id = graph definition fp ⊕ ⊕(raw partition content fps) —
    errors if any raw artifact has no data (reference :343-349)."""

    def __init__(self, graph: Graph, snapshot_id: Fingerprint) -> None:
        self.graph = graph
        self.snapshot_id = snapshot_id

    @classmethod
    def from_graph(cls, graph: Graph, *, strict: bool = False) -> GraphSnapshot:
        if not graph.sealed:
            raise RuntimeError("snapshot requires a sealed graph")
        fp = graph.definition_fingerprint()
        backend = graph.backend
        raw_partitions: dict[Fingerprint, list[StoragePartition]] = {}
        for key, artifact in graph.raw_artifacts().items():
            partitions = artifact.storage.discover_partitions(
                PartitionKey.types_from(artifact.type)
            )
            if not partitions:
                raise FileNotFoundError(
                    f"raw artifact {key!r} has no data at {artifact.storage!r}"
                )
            snapped = [
                p if not p.content_fingerprint.is_empty
                else p.compute_content_fingerprint(strict=strict)
                for p in partitions
            ]
            # Bind each content fp to its artifact key AND partition key,
            # then hash the term MULTISET. A per-term XOR would cancel
            # byte-identical partitions pairwise (two date partitions
            # holding the same bytes == neither), silently colliding
            # distinct raw-data states onto one snapshot_id and serving
            # each other's memoized outputs.
            fp = fp.combine(
                Fingerprint.from_multiset(
                    f"{key}~{p.partition_key.canonical()}~{p.content_fingerprint.key}"
                    for p in snapped
                )
            )
            raw_partitions[artifact.fingerprint] = snapped
        snap = cls(graph, fp)
        backend.write_snapshot(fp, graph.name)
        for afp, parts in raw_partitions.items():
            backend.write_artifact_partitions(afp, parts)
            backend.link_snapshot_partitions(fp, afp, parts)
        return snap

    def build(self, executor: Any = None) -> GraphSnapshot:
        if executor is None:
            from artigraph_spark.executors import LocalSparkExecutor

            executor = LocalSparkExecutor()
        executor.build(self)
        return self

    def read(self, artifact: Artifact, **kwargs: Any) -> Any:
        return self.graph.read(artifact, snapshot=self, **kwargs)

    def write(self, data: Any, artifact: Artifact, **kwargs: Any) -> StoragePartition:
        return self.graph.write(data, artifact, snapshot=self, **kwargs)

    def tag(self, tag: str, *, overwrite: bool = False) -> None:
        self.graph.backend.write_tag(self.graph.name, tag, self.snapshot_id, overwrite=overwrite)

    @classmethod
    def from_tag(cls, graph: Graph, tag: str) -> GraphSnapshot:
        snapshot_id = graph.backend.read_tag(graph.name, tag)
        return cls(graph, snapshot_id)
