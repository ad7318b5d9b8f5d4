"""Property-based tests (hypothesis): fingerprint algebra laws and
cross-engine fixed-point determinism on random inputs."""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from artigraph_spark.fingerprint import Fingerprint

fps = st.text(max_size=50).map(Fingerprint.from_string)


@given(fps, fps, fps)
def test_fingerprint_combine_laws(a, b, c):
    # commutative + associative (XOR)
    assert a.combine(b) == b.combine(a)
    assert a.combine(b).combine(c) == a.combine(b.combine(c))
    # identity + self-inverse
    assert a.combine(Fingerprint.identity()) == a
    assert a.combine(b, b) == a


@given(st.integers())
def test_fingerprint_int64_closure(v):
    if -(1 << 63) <= v < (1 << 63):
        assert Fingerprint.from_int(v).key == v
    else:
        with pytest.raises(ValueError, match="too large for int64"):
            Fingerprint.from_int(v)


@st.composite
def double_lists(draw):
    return draw(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=200,
        )
    )


@given(double_lists())
@settings(max_examples=30, deadline=None)
def test_fixed_point_sum_matches_duckdb(values):
    """The fixed-point scheme (floor(x·2^20) int sum / 2^20) must produce
    bit-identical doubles in pure python, and in DuckDB, in ANY order —
    the invariant the whole oracle strategy rests on."""
    scale = float(1 << 20)
    py = float(sum(math.floor(v * scale) for v in values)) / scale
    py_rev = float(sum(math.floor(v * scale) for v in reversed(values))) / scale
    assert py == py_rev
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS x)", [values])
    (dk,) = con.sql(
        "SELECT CAST(SUM(CAST(floor(x * 1048576.0) AS BIGINT)) AS DOUBLE) / 1048576.0 FROM t"
    ).fetchone()
    assert dk == py
