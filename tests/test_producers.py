"""Producer contract: signature validation, fingerprints, out() binding,
versioning (mirrors tests/arti/producers/test_producer.py:43-736 and
tests/arti/versions/test_version.py)."""

import pytest
from pyspark.sql import DataFrame

from artigraph_spark import types as at
from artigraph_spark.artifacts import Artifact
from artigraph_spark.fingerprint import Fingerprint
from artigraph_spark.partitions import PartitionKey
from artigraph_spark.producers import Producer, producer
from artigraph_spark.storage import StoragePartition
from artigraph_spark.versions import GitCommit, SemVer, StringVersion


class Src(Artifact):
    pass


def _src() -> Src:
    return Src(type=at.Collection(element=at.Struct(fields={"x": at.Int64()})))


def test_build_required():
    with pytest.raises(TypeError, match="must define build"):

        class NoBuild(Producer):
            src: Src


def test_build_params_must_match_fields():
    with pytest.raises(TypeError, match="must match input fields"):

        class Mismatch(Producer):
            src: Src

            def build(self, other: DataFrame) -> DataFrame:  # wrong name
                return other


def test_build_needs_annotations():
    with pytest.raises(TypeError, match="view annotation"):

        class NoAnn(Producer):
            src: Src

            def build(self, src) -> DataFrame:  # type: ignore[no-untyped-def]
                return src


def test_build_needs_return_annotation():
    with pytest.raises(TypeError, match="return annotation"):

        class NoRet(Producer):
            src: Src

            def build(self, src: DataFrame):  # type: ignore[no-untyped-def]
                return src


def test_fields_must_be_artifacts():
    with pytest.raises(TypeError, match="Artifact subclass"):

        class BadField(Producer):
            src: int

            def build(self, src: DataFrame) -> DataFrame:
                return src


def test_map_params_must_match():
    with pytest.raises(TypeError, match="must match input fields"):

        class BadMap(Producer):
            src: Src

            def build(self, src: DataFrame) -> DataFrame:
                return src

            def map(self, wrong):  # type: ignore[no-untyped-def]
                return {}


class Ok(Producer):
    src: Src

    def build(self, src: DataFrame) -> DataFrame:
        return src


def test_default_map_not_partitioned():
    p = Ok(src=_src())
    parts = (StoragePartition(path="/a"), StoragePartition(path="/b"))
    deps = p.map(src=parts)
    assert list(deps) == [PartitionKey.not_partitioned()]
    assert deps[PartitionKey.not_partitioned()]["src"] == parts


def test_out_binding_positions():
    class Two(Producer):
        src: Src

        def build(self, src: DataFrame) -> tuple[DataFrame, DataFrame]:
            return src, src

    p = Two(src=_src())
    a, b = (
        Artifact(type=at.Collection(element=at.Struct(fields={"x": at.Int64()}))),
        Artifact(type=at.Collection(element=at.Struct(fields={"x": at.Int64()}))),
    )
    out_a, out_b = p.out(a, b)
    assert out_a.producer_output.position == 0
    assert out_b.producer_output.position == 1
    assert out_a.producer_output.producer is p
    with pytest.raises(ValueError, match="produces 2 outputs"):
        p.out(a)


def test_out_count_single():
    p = Ok(src=_src())
    bound = p.out(Artifact(type=at.Collection(element=at.Struct(fields={"x": at.Int64()}))))
    assert not isinstance(bound, tuple)


def test_input_fingerprint_content_addressed():
    parts = (
        StoragePartition(path="/a", content_fingerprint=Fingerprint.from_string("A")),
        StoragePartition(path="/b", content_fingerprint=Fingerprint.from_string("B")),
    )
    fp1 = Ok.compute_input_fingerprint({"src": parts})
    # path-independent: same contents at different paths -> same fingerprint
    moved = tuple(p.model_copy(update={"path": p.path + ".moved"}) for p in parts)
    assert Ok.compute_input_fingerprint({"src": moved}) == fp1
    # order-independent
    assert Ok.compute_input_fingerprint({"src": parts[::-1]}) == fp1
    # missing content fingerprint is an error
    with pytest.raises(ValueError, match="no content fingerprint"):
        Ok.compute_input_fingerprint({"src": (StoragePartition(path="/c"),)})


def test_semver_major_only_policy():
    assert SemVer(major=1, minor=0).fingerprint == SemVer(major=1, minor=9, patch=3).fingerprint
    assert SemVer(major=1).fingerprint != SemVer(major=2).fingerprint
    # pre-1.0: every component matters
    assert SemVer(major=0, minor=1).fingerprint != SemVer(major=0, minor=2).fingerprint


def test_other_versions():
    assert GitCommit(sha="abc").fingerprint != GitCommit(sha="def").fingerprint
    assert StringVersion(value="v1").fingerprint == StringVersion(value="v1").fingerprint


def test_producer_decorator():
    @producer(version=SemVer(major=2))
    def double(src: DataFrame) -> DataFrame:
        return src

    assert issubclass(double, Producer)
    assert double.version == SemVer(major=2)
    inst = double(src=_src())
    assert inst._input_names == ("src",)


def test_version_changes_input_fingerprint():
    class V1(Producer):
        version = SemVer(major=1)
        src: Src

        def build(self, src: DataFrame) -> DataFrame:
            return src

    class V2(V1):
        version = SemVer(major=2)

        def build(self, src: DataFrame) -> DataFrame:
            return src

    parts = (StoragePartition(path="/a", content_fingerprint=Fingerprint.from_string("A")),)
    assert V1.compute_input_fingerprint({"src": parts}) != V2.compute_input_fingerprint(
        {"src": parts}
    )


def test_compute_input_fingerprint_rejects_mismatched_names():
    """Reference parity (test_Producer_compute_input_fingerprint): a
    dependency dict whose keys don't match the declared inputs raises
    instead of silently producing a different fingerprint."""
    import pytest

    from artigraph_spark.producers import Producer

    class P(Producer):
        nums: Artifact

        def build(self, nums: int) -> int:
            return nums

    with pytest.raises(ValueError, match="Mismatched dependency inputs"):
        P.compute_input_fingerprint({"junk": ()})


def test_string_annotations_resolved():
    """Reference contract (test_producer.py:184-193 test_Producer_string_annotation):
    quoted hints — or a user module with `from __future__ import annotations`,
    which stringifies EVERY hint — must resolve identically to real ones."""
    class SDocs(Artifact):
        type: at.Type = at.Collection(element=at.Struct(fields={"x": at.Int64()}))

    class SClean(Producer):
        docs: "SDocs"

        @staticmethod
        def build(docs: "DataFrame") -> "DataFrame":
            return docs

    out = SClean(docs=SDocs()).out(SDocs())
    assert isinstance(out, SDocs) and out.is_produced


def test_variadic_tuple_return_rejected():
    """tuple[X, ...] has no fixed output arity — outputs map positionally
    to artifacts, so the signature must be rejected at class definition."""
    with pytest.raises(TypeError, match="variadic"):

        class Variadic(Producer):
            src: Src

            def build(self, src: DataFrame) -> tuple[DataFrame, ...]:
                return (src,)
