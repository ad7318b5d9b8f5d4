"""Fingerprint algebra (mirrors /root/reference/tests/arti/test_fingerprints.py:9-50)."""

import pytest

from artigraph_spark.fingerprint import Fingerprint


def test_identity_and_empty():
    ident = Fingerprint.identity()
    assert ident.is_identity and not ident.is_empty
    empty = Fingerprint.empty()
    assert empty.is_empty


def test_combine_xor_identity():
    a = Fingerprint.from_string("a")
    b = Fingerprint.from_string("b")
    assert a.combine(Fingerprint.identity()) == a
    assert a.combine(b) == b.combine(a)  # commutative
    assert a.combine(b).combine(b) == a  # self-inverse
    assert a.combine(b, b) == a


def test_empty_propagates():
    a = Fingerprint.from_string("a")
    assert a.combine(Fingerprint.empty()).is_empty


def test_from_string_stable_and_distinct():
    assert Fingerprint.from_string("x") == Fingerprint.from_string("x")
    assert Fingerprint.from_string("x") != Fingerprint.from_string("y")


def test_int64_range():
    for s in ("a", "b", "hello", "x" * 1000):
        k = Fingerprint.from_string(s).key
        assert -(1 << 63) <= k < (1 << 63)


def test_from_int_rejects_out_of_range():
    # Reference contract (tests/arti/test_fingerprints.py): out-of-int64
    # values raise instead of silently wrapping/aliasing.
    assert Fingerprint.from_int(-5).key == -5
    with pytest.raises(ValueError, match="too large for int64"):
        Fingerprint.from_int(1 << 63)
    with pytest.raises(ValueError, match="too large for int64"):
        Fingerprint.from_int((1 << 64) - 1)


def test_combine_rejects_non_fingerprint():
    f1 = Fingerprint.from_int(1)
    for val in (None, "a", 1):
        with pytest.raises(TypeError):
            f1.combine(val)
