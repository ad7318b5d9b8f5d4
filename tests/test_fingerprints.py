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


def test_strict_path_fingerprint_framing_unambiguous(tmp_path):
    """The strict digest seeds with relpath + NUL so the rel/content
    boundary cannot shift: (rel='ab', bytes 'c') and (rel='a', bytes 'bc')
    must produce DIFFERENT per-file digests — without the delimiter they
    collide, and two such files in one partition XOR-cancel to identity."""
    import os

    from artigraph_spark.fingerprint import Fingerprint
    from artigraph_spark.storage import _fingerprint_path

    d1, d2, both = tmp_path / "d1", tmp_path / "d2", tmp_path / "both"
    for d in (d1, d2, both):
        os.makedirs(d)
    (d1 / "ab").write_bytes(b"c")
    (d2 / "a").write_bytes(b"bc")
    assert _fingerprint_path(str(d1), strict=True) != _fingerprint_path(
        str(d2), strict=True
    )

    (both / "ab").write_bytes(b"c")
    (both / "a").write_bytes(b"bc")
    assert _fingerprint_path(str(both), strict=True) != Fingerprint.identity()
