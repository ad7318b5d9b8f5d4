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


# --- sequence packing invariants (operators.packing) -------------------------

pack_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.integers(min_value=0, max_value=50)),
    min_size=0, max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(pack_rows, st.integers(min_value=1, max_value=64))
def test_pack_sequences_invariants(spark, rows, capacity):
    """For ANY input: tokens are conserved per doc, every bin except the
    last is exactly full, and bin ids are the contiguous prefix 0..B-1."""
    from artigraph_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(rows or [(0, 0)], "doc_id long, n long")
    if not rows:
        df = df.filter("false")
    out = pack_sequences(df, "doc_id", "n", capacity=capacity).collect()

    total = sum(n for _, n in rows)
    per_doc_expect = {}
    for i, n in rows:
        if n > 0:
            per_doc_expect[i] = per_doc_expect.get(i, 0) + n
    per_doc_got, per_bin = {}, {}
    for r in out:
        per_doc_got[r["doc_id"]] = per_doc_got.get(r["doc_id"], 0) + r["tokens_in_bin"]
        per_bin[r["bin_id"]] = per_bin.get(r["bin_id"], 0) + r["tokens_in_bin"]
        assert r["tokens_in_bin"] > 0
    assert per_doc_got == per_doc_expect  # conservation, NULL/zero dropped
    if total > 0:
        bins = sorted(per_bin)
        assert bins == list(range((total - 1) // capacity + 1))  # contiguous
        for b in bins[:-1]:
            assert per_bin[b] == capacity  # all bins full except the last
        assert per_bin[bins[-1]] == total - capacity * (len(bins) - 1)
    else:
        assert out == []
