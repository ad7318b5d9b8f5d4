"""Artifact.cast contracts (mirrors /root/reference/tests/arti/artifacts/
test_artifact.py:29-76,152-155)."""

import json
import pickle

import pytest

from artigraph_spark import types as at
from artigraph_spark.artifacts import Artifact
from artigraph_spark.formats import JSON
from artigraph_spark.storage import StringLiteral


@pytest.mark.parametrize(
    ("value", "expected_type"),
    [
        ("hi", at.String()),
        (5, at.Int64()),
        (5.0, at.Float64()),
        (None, at.Null()),
        (True, at.Boolean()),
        ((1, 2, 3), at.List(element=at.Int64())),
        ([1, 2, 3], at.List(element=at.Int64())),
        ({"a": 1, "b": 2}, at.Map(key=at.String(), value=at.Int64())),
    ],
)
def test_cast_literals(value, expected_type):
    artifact = Artifact.cast(value)
    assert artifact.type == expected_type
    assert isinstance(artifact.format, JSON)
    assert isinstance(artifact.storage, StringLiteral)
    assert artifact.storage.value == json.dumps(value)


@pytest.mark.parametrize("value", [(1, "a"), {"a": "b", 1: 2}, [], {}, object()])
def test_cast_literals_errors(value):
    with pytest.raises(NotImplementedError, match="Unable to determine type of"):
        Artifact.cast(value)


def test_cast_unserializable_literals_raise_cleanly():
    import datetime

    # Typed (date is a known scalar) but not JSON-storable: keep the cast
    # error contract (NotImplementedError), not a raw json TypeError.
    for value in (datetime.date(2021, 1, 1), b"hi"):
        with pytest.raises(NotImplementedError, match="Unable to serialize"):
            Artifact.cast(value)


def test_cast_artifact_identity():
    a = Artifact.cast(10)
    assert Artifact.cast(a) is a


def test_artifact_pickle_round_trip():
    artifact = Artifact.cast(10)
    assert pickle.loads(pickle.dumps(artifact)) == artifact


def test_cast_non_string_dict_keys_raise_cleanly():
    # json.dumps would stringify the keys, silently violating the declared
    # Map(key=Int64) type on round-trip — refuse instead.
    for value in ({1: 10, 2: 20}, {"ok": {3: "x"}}, [{4: 2}, {5: 3}]):
        with pytest.raises(NotImplementedError, match="string dict keys|Unable to"):
            Artifact.cast(value)
