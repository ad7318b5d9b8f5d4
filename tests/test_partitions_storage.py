"""Partition keys/fields + storage templating/discovery (mirrors
tests/arti/partitions/test_partitions.py and tests/arti/storage/*)."""

import datetime
import os

import pytest

from artigraph_spark import types as at
from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.partitions import (
    DateField,
    IntField,
    NullField,
    PartitionKey,
    StringField,
)
from artigraph_spark.storage import LocalFile, StringLiteral


def test_date_field_components():
    f = DateField(key=datetime.date(2021, 10, 1))
    assert f.components == {"Y": "2021", "m": "10", "d": "01", "iso": "2021-10-01"}
    assert DateField.parse("iso", "2021-10-01") == f


def test_int_field_components():
    f = IntField(key=255)
    assert f.components == {"value": "255", "hex": "0xff"}
    assert IntField.parse("value", "255") == f
    assert IntField.parse("hex", "0xff") == f


def test_null_and_string_fields():
    assert NullField().components["value"] == "_NONE"
    assert StringField(key="x").components["value"] == "x"


def test_partition_key_from_types():
    types = {"date": at.Date(), "bucket": at.Int32()}
    key = PartitionKey.from_types(
        types, {"date": datetime.date(2021, 1, 2), "bucket": 3}
    )
    assert key.values() == {"date": datetime.date(2021, 1, 2), "bucket": 3}
    assert not key.is_not_partitioned
    assert PartitionKey.not_partitioned().is_not_partitioned


def test_key_types_from_collection():
    coll = at.Collection(
        element=at.Struct(fields={"d": at.Date(), "x": at.Int64()}),
        partition_by=("d",),
    )
    assert PartitionKey.types_from(coll) == {"d": DateField}


def test_template_resolution_and_generation(tmp_path):
    storage = LocalFile(root=str(tmp_path)).resolve_templates(
        graph_name="g", names="ns/a", name="a"
    )
    key = PartitionKey(fields={"date": DateField(key=datetime.date(2021, 10, 1))})
    p = storage.generate_partition(key, Fingerprint.from_int(42))
    assert p.path == f"{tmp_path}/g/ns/a/a/date=2021-10-01/_fingerprint=42"
    raw = storage.resolve_templates(strip_input_fingerprint=True).generate_partition(
        key, Fingerprint.empty()
    )
    assert raw.path == f"{tmp_path}/g/ns/a/a/date=2021-10-01"


def test_unresolved_placeholder_rejected(tmp_path):
    storage = LocalFile(root=str(tmp_path))  # templates not resolved
    with pytest.raises(ValueError, match="unresolved"):
        storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())


def test_discovery_round_trip(tmp_path):
    storage = LocalFile(root=str(tmp_path)).resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    for d in ("2021-10-01", "2021-10-02"):
        os.makedirs(f"{tmp_path}/g/t/t/date={d}", exist_ok=True)
        with open(f"{tmp_path}/g/t/t/date={d}/part-0.json", "w") as f:
            f.write("{}")
    parts = storage.discover_partitions({"date": DateField})
    assert len(parts) == 2
    assert sorted(p.partition_key.values()["date"].isoformat() for p in parts) == [
        "2021-10-01",
        "2021-10-02",
    ]


def test_discovery_with_fingerprint(tmp_path):
    storage = LocalFile(root=str(tmp_path)).resolve_templates(
        graph_name="g", names="o", name="o"
    )
    os.makedirs(f"{tmp_path}/g/o/o/_fingerprint=-7", exist_ok=True)
    parts = storage.discover_partitions({})
    assert len(parts) == 1
    assert parts[0].input_fingerprint == Fingerprint.from_int(-7)


def test_content_fingerprint_changes_with_content(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("hello")
    storage_part = (
        LocalFile(root=str(tmp_path))
        .resolve_templates(graph_name="g", names="x", name="x", strip_input_fingerprint=True)
        .generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    )
    from artigraph_spark.storage import StoragePartition

    sp = StoragePartition(path=str(p))
    fp1 = sp.compute_content_fingerprint(strict=True).content_fingerprint
    p.write_text("world")
    fp2 = sp.compute_content_fingerprint(strict=True).content_fingerprint
    assert fp1 != fp2
    p.write_text("hello")
    fp3 = sp.compute_content_fingerprint(strict=True).content_fingerprint
    assert fp1 == fp3  # content-addressed: reverting re-hits the old identity


def test_string_literal_preset_value_rejects_producer_output():
    from artigraph_spark.storage import StringLiteral

    s = StringLiteral(value="test")
    with pytest.raises(ValueError, match="cannot have a `value` preset"):
        s.generate_partition(PartitionKey.not_partitioned(), Fingerprint.from_int(5))
    # Raw (non-produced) literals still generate fine.
    assert s.generate_partition(
        PartitionKey.not_partitioned(), Fingerprint.empty()
    ).path.startswith("literal://")


def test_string_literal():
    s = StringLiteral(value='{"a": 1}')
    parts = s.discover_partitions({})
    assert len(parts) == 1
    assert not parts[0].content_fingerprint.is_empty
    assert StringLiteral(value=None).discover_partitions({}) == []


def test_path_tags_render_into_paths(tmp_path):
    """Graph path_tags become tag=value path segments (reference
    graphs/__init__.py:105, storage/__init__.py:146-148); empty tags
    collapse away entirely."""
    storage = LocalFile(root=str(tmp_path)).resolve_templates(
        graph_name="g", path_tags="env=prod/region=eu", names="t", name="t",
        strip_input_fingerprint=True,
    )
    from artigraph_spark.fingerprint import Fingerprint
    from artigraph_spark.partitions import PartitionKey

    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    assert p.path == f"{tmp_path}/g/env=prod/region=eu/t/t"
    untagged = LocalFile(root=str(tmp_path)).resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    ).generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    assert untagged.path == f"{tmp_path}/g/t/t"


def test_graph_path_tags_flow_to_artifact_storage(tmp_path):
    from artigraph_spark import types as at
    from artigraph_spark.artifacts import Artifact
    from artigraph_spark.formats import JSON
    from artigraph_spark.graphs import Graph

    with Graph("tagged", path_tags={"env": "dev"}) as g:
        g.artifacts.x = Artifact(
            type=at.Int64(), format=JSON(), storage=LocalFile(root=str(tmp_path))
        )
    assert f"{tmp_path}/tagged/env=dev/x/x" in g.artifacts.x.storage.template


def test_generate_and_discover_agree_on_unpartitioned_paths(tmp_path):
    """The path generate_partition writes must be byte-identical to the path
    discover_partitions finds — backends key partitions by path, so a
    trailing-slash disagreement would give one dataset two identities."""
    from artigraph_spark.fingerprint import Fingerprint
    from artigraph_spark.partitions import PartitionKey

    storage = LocalFile(root=str(tmp_path)).resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    os.makedirs(p.path, exist_ok=True)
    with open(os.path.join(p.path, "part-0.json"), "w") as f:
        f.write("{}")
    found = storage.discover_partitions({})
    assert [f.path for f in found] == [p.path]


def test_path_tags_with_glob_metacharacters_survive_discovery(tmp_path):
    """Tag values containing glob metacharacters are percent-escaped at
    render time, so discovery's pattern still matches what was written."""
    from artigraph_spark import types as at
    from artigraph_spark.artifacts import Artifact
    from artigraph_spark.fingerprint import Fingerprint
    from artigraph_spark.formats import JSON
    from artigraph_spark.graphs import Graph
    from artigraph_spark.partitions import PartitionKey

    with Graph("g2", path_tags={"env": "v[1]/x"}) as g:
        g.artifacts.x = Artifact(
            type=at.Int64(), format=JSON(), storage=LocalFile(root=str(tmp_path))
        )
    storage = g.artifacts.x.storage
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    assert "[" not in p.path and "env=v%5B1%5D%2Fx" in p.path
    os.makedirs(p.path, exist_ok=True)
    with open(os.path.join(p.path, "d"), "w") as f:
        f.write("{}")
    assert [f.path for f in storage.discover_partitions({})] == [p.path]


def test_discovery_with_glob_metacharacters_in_static_text(tmp_path):
    """Static template text (root, graph name) is literal path text: glob
    metacharacters in it must not pattern-match (or worse, match nothing and
    hide data that generate_partition just wrote)."""
    root = str(tmp_path / "run[1]")
    storage = LocalFile(root=root).resolve_templates(
        graph_name="exp?a", names="t", name="t", strip_input_fingerprint=True
    )
    key = PartitionKey(fields={"date": DateField(key=datetime.date(2021, 10, 1))})
    p = storage.generate_partition(key, Fingerprint.empty())
    os.makedirs(p.path, exist_ok=True)
    with open(os.path.join(p.path, "part-0.json"), "w") as f:
        f.write("{}")
    parts = storage.discover_partitions({"date": DateField})
    assert [q.path for q in parts] == [p.path]


def test_file_scheme_root_write_fingerprint_discover(tmp_path):
    """A file://-qualified LocalFile root must fingerprint and discover the
    same data a plain-path root does (io's atomic writer already accepts the
    scheme; the metadata side has to agree)."""
    plain = str(tmp_path)
    storage = LocalFile(root="file://" + plain).resolve_templates(
        graph_name="g", names="t", name="t", strip_input_fingerprint=True
    )
    p = storage.generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
    assert p.path.startswith("file://")
    os.makedirs(plain + "/g/t/t", exist_ok=True)
    with open(plain + "/g/t/t/part-0.json", "w") as f:
        f.write('{"v": 1}')
    snapped = p.compute_content_fingerprint(strict=True)
    assert not snapped.content_fingerprint.is_empty
    twin = (
        LocalFile(root=plain)
        .resolve_templates(graph_name="g", names="t", name="t", strip_input_fingerprint=True)
        .generate_partition(PartitionKey.not_partitioned(), Fingerprint.empty())
        .compute_content_fingerprint(strict=True)
    )
    assert snapped.content_fingerprint == twin.content_fingerprint
    assert [q.path for q in storage.discover_partitions({})] == [p.path]


def test_partition_key_canonical_is_injective():
    """Values containing '/', '=', or NUL must not let two distinct keys
    render the same canonical string (fingerprint terms are built from it)."""
    from artigraph_spark.partitions import StringField

    k1 = PartitionKey(fields={"a": StringField(key="1/b=2")})
    k2 = PartitionKey(fields={"a": StringField(key="1"), "b": StringField(key="2")})
    assert k1.canonical() != k2.canonical()
    k3 = PartitionKey(fields={"a": StringField(key="x\x00y")})
    k4 = PartitionKey(fields={"a": StringField(key="x"), "y": StringField(key="")})
    assert k3.canonical() != k4.canonical()
    assert "\x00" not in k3.canonical()
