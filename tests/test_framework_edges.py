"""Framework edge cases from review: fingerprint binding, producer aliasing,
decorator-provided map/validate, URI roots, escaped partition values."""

import datetime

import pytest
from pyspark.sql import DataFrame

from artigraph_spark import types as at
from artigraph_spark.artifacts import Artifact
from artigraph_spark.backends import MemoryBackend
from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.formats import JSON
from artigraph_spark.graphs import Graph
from artigraph_spark.partitions import DateField, PartitionKey, StringField
from artigraph_spark.producers import Producer, producer
from artigraph_spark.storage import LocalFile, StoragePartition


def test_definition_fingerprint_binds_keys():
    """Swapping two artifacts between keys must change the graph identity
    (XOR-separable combination would collide)."""
    a = Artifact(type=at.Int64())
    b = Artifact(type=at.String())
    with Graph("g", backend=MemoryBackend()) as g1:
        g1.artifacts.x = a
        g1.artifacts.y = b
    with Graph("g", backend=MemoryBackend()) as g2:
        g2.artifacts.x = b
        g2.artifacts.y = a
    assert g1.definition_fingerprint() != g2.definition_fingerprint()


def test_producer_output_aliasing_rejected():
    class P(Producer):
        src: Artifact

        def build(self, src: DataFrame) -> DataFrame:
            return src

    coll = at.Collection(element=at.Struct(fields={"x": at.Int64()}))
    with Graph("g", backend=MemoryBackend()) as g:
        g.artifacts.src = Artifact(type=coll)
        p = P(src=g.artifacts.src)
        out = p.out(Artifact(type=coll))
        g.artifacts.first = out
        with pytest.raises(ValueError, match="orphan"):
            g.artifacts.second = out


def test_producer_decorator_map_and_validate_are_not_bound_wrong():
    """Functions passed via @producer(map=..., validate_outputs=...) must not
    receive the instance as their first user argument."""
    seen = {}

    def my_map(src):
        seen["map_arg"] = src
        return {PartitionKey.not_partitioned(): {"src": tuple(src)}}

    def my_validate(out):
        seen["validate_arg"] = out
        return True, "ok"

    @producer(map=my_map, validate_outputs=my_validate)
    def p(src: DataFrame) -> DataFrame:
        return src

    inst = p(src=Artifact(type=at.Collection(element=at.Struct(fields={"x": at.Int64()}))))
    parts = (StoragePartition(path="/a"),)
    deps = inst.map(src=parts)
    assert seen["map_arg"] == parts  # the partitions, NOT the producer instance
    assert list(deps) == [PartitionKey.not_partitioned()]
    ok, _ = inst.validate_outputs("the-output")
    assert ok and seen["validate_arg"] == "the-output"


def test_uri_roots_not_corrupted():
    storage = LocalFile(root="s3a://bucket/warehouse").resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    assert p.path.startswith("s3a://bucket/warehouse/")
    assert "s3a:/b" not in p.path.replace("s3a://", "")


def test_partition_values_escaped_round_trip(tmp_path):
    """Partition values containing '/' and '=' must survive write-path
    rendering AND discovery parsing."""
    import os

    storage = LocalFile(root=str(tmp_path)).resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    key = PartitionKey(fields={"region": StringField(key="US/East=1")})
    p = storage.generate_partition(key, Fingerprint.empty())
    assert "region=US%2FEast%3D1" in p.path  # escaped, single path segment
    os.makedirs(p.path, exist_ok=True)
    with open(os.path.join(p.path, "part-0.json"), "w") as f:
        f.write("{}")
    found = storage.discover_partitions({"region": StringField})
    assert len(found) == 1
    assert found[0].partition_key.values()["region"] == "US/East=1"


def test_date_partition_still_unescaped_friendly(tmp_path):
    """ISO dates contain no reserved chars — paths stay human-readable."""
    storage = LocalFile(root=str(tmp_path)).resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    key = PartitionKey(fields={"d": DateField(key=datetime.date(2024, 1, 2))})
    p = storage.generate_partition(key, Fingerprint.empty())
    assert p.path.endswith("/d=2024-01-02")
