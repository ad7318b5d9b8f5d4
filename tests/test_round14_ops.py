"""Round-14 operators + contracts: the semdedup quality-aware keeper,
sign-safe pmod oracle replay for id-derived MinHash fallbacks, and the
cross-snapshot semantic dedup member (`semdedup_against`)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ------------------------------------------------- semdedup keeper modes


def _collinear_df(spark):
    # One direction, three magnitudes: every pair has cosine exactly 1,
    # but distance to the k=1 centroid differs per point — the keeper
    # modes pick different survivors from the same near-dup set.
    rows = [(1, [1.0]), (2, [0.9]), (3, [0.5])]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_semdedup_default_keeper_is_min_id(spark):
    from artigraph_spark.operators.similarity import semdedup

    out = {r["vec_id"]: r["pruned"] for r in semdedup(
        _collinear_df(spark), k=1, iterations=1, qbits=8, threshold=(9, 10), dim=1
    ).collect()}
    assert out == {1: 0, 2: 1, 3: 1}


def test_semdedup_min_centroid_sim_keeps_farthest_from_centroid(spark):
    from artigraph_spark.operators.similarity import semdedup

    # k=1, iterations=1: centroid = integer mean of the shifted
    # quantized coords; id 3 ([0.5]) is farthest from it (largest
    # dist_q), so it survives and both nearer points are pruned.
    out = {r["vec_id"]: r["pruned"] for r in semdedup(
        _collinear_df(spark), k=1, iterations=1, qbits=8, threshold=(9, 10),
        dim=1, keeper="min_centroid_sim",
    ).collect()}
    assert out == {1: 1, 2: 1, 3: 0}


def test_semdedup_min_centroid_sim_tiebreak_is_min_id(spark):
    from artigraph_spark.operators.similarity import semdedup

    # Identical vectors → identical dist_q → the id tie-break decides:
    # smaller id survives, same as the default mode.
    rows = [(7, [1.0, 0.0]), (8, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {r["vec_id"]: r["pruned"] for r in semdedup(
        df, k=1, iterations=1, qbits=8, threshold=(9, 10), dim=2,
        keeper="min_centroid_sim",
    ).collect()}
    assert out == {7: 0, 8: 1}


def test_semdedup_keeper_modes_agree_on_prune_count(spark):
    # Different survivors, same near-dup structure: both modes prune
    # the same NUMBER of points from the collinear trio.
    from artigraph_spark.operators.similarity import semdedup

    df = _collinear_df(spark)
    kw = dict(k=1, iterations=1, qbits=8, threshold=(9, 10), dim=1)
    n_min_id = semdedup(df, **kw).agg(F.sum("pruned")).collect()[0][0]
    n_div = semdedup(df, keeper="min_centroid_sim", **kw).agg(
        F.sum("pruned")
    ).collect()[0][0]
    assert n_min_id == n_div == 2


def test_semdedup_invalid_keeper_raises(spark):
    from artigraph_spark.operators.similarity import semdedup

    df = _collinear_df(spark)
    with pytest.raises(ValueError, match="keeper"):
        semdedup(df, k=1, dim=1, keeper="max_id")


def test_semdedup_auto_passes_keeper_through(spark):
    from artigraph_spark.operators.similarity import semdedup_auto

    out = {r["vec_id"]: r["pruned"] for r in semdedup_auto(
        _collinear_df(spark), target_cluster_size=128, min_k=1,
        iterations=1, qbits=8, threshold=(9, 10), dim=1,
        keeper="min_centroid_sim",
    ).collect()}
    assert out == {1: 1, 2: 1, 3: 0}


# ------------------------------------- pmod fallback replay (sign-safe)


def test_minhash_fallback_oracle_matches_for_negative_ids(spark):
    """The r14 pmod-style oracle replay ((id % m) + m) % m must match the
    engine's pmod fallback for NEGATIVE numeric ids too — exactly the
    case the retired plain-% replay got wrong."""
    import duckdb

    from artigraph_spark.operators.dedup import minhash_signatures
    from artigraph_spark.queries.llm import _minhash_oracle

    rows = [(-5, ""), (-2147483650, None), (3, ""), (0, "")]
    sdf = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
        for r in minhash_signatures(sdf, "doc_id", "text", num_hashes=8).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        row[0]: tuple(row[1:]) for row in con.execute(_minhash_oracle(8)).fetchall()
    }
    assert got == want


# --------------------------------------------------- semdedup_against


def _against_frames(spark):
    ref = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.01]), (4, [0.0, 1.0])],
        "vec_id: long, embedding: array<float>",
    )
    new = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [-1.0, 0.0]), (12, [0.0, 0.97])],
        "vec_id: long, embedding: array<float>",
    )
    return new, ref


def test_semdedup_against_exact_twin_guaranteed_and_min_ref_id(spark):
    from artigraph_spark.operators.similarity import semdedup_against

    new, ref = _against_frames(spark)
    out = {r["vec_id"]: (r["pruned"], r["ref_match"]) for r in semdedup_against(
        new, ref, dim=2, n_planes=3, n_tables=4, threshold=(9, 10)
    ).collect()}
    # 10 is byte-identical in direction to ref 1 AND 2 — guaranteed
    # candidate (shares every table's bucket with 1), min ref id wins.
    assert out[10] == (1, 1)
    # 11 is anti-parallel to ref 1 (cos = -1): never a match even if
    # bucketed together.
    assert out[11] == (0, None)
    # 12 is a near-twin of ref 4 (cos ≈ 1): verified when candidates
    # surface; either way the flag must agree with ref_match.
    assert out[12][0] == (1 if out[12][1] is not None else 0)


def test_semdedup_against_zero_vectors_never_match(spark):
    from artigraph_spark.operators.similarity import semdedup_against

    ref = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id: long, embedding: array<float>"
    )
    new = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, None)], "vec_id: long, embedding: array<float>"
    )
    rows = semdedup_against(
        new, ref, dim=2, n_planes=2, n_tables=2, threshold=(1, 10)
    ).collect()
    # identical zero vectors share every bucket, but cosine is undefined
    # (dot = 0 fails the d > 0 arm) → never pruned; NULL vector dropped.
    assert {r["vec_id"]: r["pruned"] for r in rows} == {10: 0}


def test_semdedup_against_max_ref_bucket_caps_hot_bucket(spark):
    from artigraph_spark.operators.similarity import semdedup_against

    ref = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id: long, embedding: array<float>",
    )
    new = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id: long, embedding: array<float>"
    )
    kw = dict(dim=2, n_planes=3, n_tables=4, threshold=(9, 10))
    uncapped = semdedup_against(new, ref, **kw).collect()[0]
    assert (uncapped["pruned"], uncapped["ref_match"]) == (1, 1)
    # All three identical refs land in the same bucket of every table;
    # a cap of 2 drops every one of those keys → no candidates at all
    # (the documented recall trade, including the exact-twin guarantee).
    capped = semdedup_against(new, ref, max_ref_bucket=2, **kw).collect()[0]
    assert (capped["pruned"], capped["ref_match"]) == (0, None)


def test_semdedup_against_bad_params_raise(spark):
    from artigraph_spark.operators.similarity import semdedup_against

    new, ref = _against_frames(spark)
    with pytest.raises(ValueError, match="n_planes"):
        semdedup_against(new, ref, dim=2, n_planes=0)
    with pytest.raises(ValueError, match="n_tables"):
        semdedup_against(new, ref, dim=2, n_tables=0)
    with pytest.raises(ValueError, match="max_ref_bucket"):
        semdedup_against(new, ref, dim=2, max_ref_bucket=0)
    with pytest.raises(ValueError, match="threshold"):
        semdedup_against(new, ref, dim=2, threshold=(0, 10))


def test_semdedup_against_wrong_dim_raises_at_execution(spark):
    from artigraph_spark.operators.similarity import semdedup_against

    new, ref = _against_frames(spark)
    with pytest.raises(Exception, match="vector length"):
        semdedup_against(new, ref, dim=5, n_planes=2, n_tables=1).collect()


def test_semdedup_against_auto_derives_planes_and_matches(spark):
    from artigraph_spark.operators.similarity import semdedup_against_auto

    new, ref = _against_frames(spark)
    # 3 ref vectors, target 128 → clamps to min_planes; result identical
    # to the explicit call the other tests pin.
    out = {r["vec_id"]: (r["pruned"], r["ref_match"]) for r in semdedup_against_auto(
        new, ref, dim=2, target_bucket_size=128, min_planes=3,
        n_tables=4, threshold=(9, 10),
    ).collect()}
    assert out[10] == (1, 1)
    with pytest.raises(ValueError, match="target_bucket_size"):
        semdedup_against_auto(new, ref, dim=2, target_bucket_size=0)
    with pytest.raises(ValueError, match="min_planes"):
        semdedup_against_auto(new, ref, dim=2, min_planes=0)


_vec3 = st.lists(
    st.floats(min_value=-1.9, max_value=1.9, allow_nan=False),
    min_size=3, max_size=3,
)


def _mini_oracle_against(new_rows, ref_rows, *, n_planes, n_tables, qbits, p, q):
    """Complete Python replay of semdedup_against: seeded planes, the
    left-fold double plane dot (same IEEE op order as the Spark
    aggregate), floor quantization, bucket equality in >=1 table,
    exact-int threshold verify, min-ref-id rollup."""
    import math

    from artigraph_spark.operators.similarity import _hyperplanes

    tables = [_hyperplanes(3, n_planes, 42 + 1000 * t) for t in range(n_tables)]

    def buckets(vec):
        out = []
        for planes in tables:
            b = 0
            for i, pl in enumerate(planes):
                s = 0.0
                for x, y in zip(vec, pl):
                    s += float(x) * y
                if s >= 0:
                    b |= 1 << i
            out.append(b)
        return out

    def qv(vec):
        return [math.floor(float(x) * (1 << qbits)) for x in vec]

    ref = [(i, qv(v), buckets(v)) for i, v in ref_rows if v is not None]
    expect = {}
    for i, v in new_rows:
        if v is None:
            continue
        nq, nb = qv(v), buckets(v)
        nn = sum(x * x for x in nq)
        matches = []
        for j, rq, rb in ref:
            if not any(a == b for a, b in zip(nb, rb)):
                continue
            d = sum(a * b for a, b in zip(nq, rq))
            if d > 0 and q * q * d * d >= p * p * nn * sum(x * x for x in rq):
                matches.append(j)
        expect[i] = (1 if matches else 0, min(matches) if matches else None)
    return expect


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.one_of(st.none(), _vec3)),
        max_size=8, unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(100, 150), st.one_of(st.none(), _vec3)),
        max_size=8, unique_by=lambda t: t[0],
    ),
)
def test_semdedup_against_matches_python_mini_oracle(spark, new_rows, ref_rows):
    """For ANY small corpus pair: the operator's (pruned, ref_match) per
    new id equals a complete pure-Python replay of the pipeline —
    buckets, fixed-point quantization, int64 verify, min-id rollup."""
    from artigraph_spark.operators.similarity import semdedup_against

    new = spark.createDataFrame(
        new_rows or [(0, None)], "vec_id: long, embedding: array<double>"
    )
    ref = spark.createDataFrame(
        ref_rows or [(0, None)], "vec_id: long, embedding: array<double>"
    )
    if not new_rows:
        new = new.filter("false")
    if not ref_rows:
        ref = ref.filter("false")
    got = {
        r["vec_id"]: (r["pruned"], r["ref_match"])
        for r in semdedup_against(
            new, ref, dim=3, n_planes=3, n_tables=3, qbits=8, threshold=(3, 10)
        ).collect()
    }
    want = _mini_oracle_against(
        new_rows, ref_rows, n_planes=3, n_tables=3, qbits=8, p=3, q=10
    )
    assert got == want


# ----------------------------------------------------- duplicate_spans


def test_duplicate_spans_cross_doc_and_self_repetition(spark):
    from artigraph_spark.operators.dedup import duplicate_spans

    rows = [
        (1, "a b c d e f g h i j unique tail one"),
        (2, "prefix two a b c d e f g h i j different end"),
        (3, "no shared runs here at all whatsoever in this doc"),
        (4, "rep rep rep rep rep rep rep rep"),  # pure self-repetition
        (5, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, "doc_id", "text", min_tokens=4).collect()
    }
    # docs 1/2 share the 10-token run "a b c ... j" (positions 1-10 and
    # 3-12); doc 4's every 4-gram repeats within the doc → whole doc is
    # one span; docs 3 and 5 emit nothing.
    assert out == {(1, 1, 10, 10), (2, 3, 12, 10), (4, 1, 8, 8)}


def test_duplicate_spans_no_duplicates_is_empty(spark):
    from artigraph_spark.operators.dedup import duplicate_spans

    rows = [(1, "every token here is used exactly once total"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert duplicate_spans(df, "doc_id", "text", min_tokens=3).collect() == []


def test_duplicate_spans_bad_params_raise(spark):
    from artigraph_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_tokens"):
        duplicate_spans(df, "doc_id", "text", min_tokens=0)
    with pytest.raises(ValueError, match="bases"):
        duplicate_spans(df, "doc_id", "text", base1=1)
    with pytest.raises(ValueError, match="differ"):
        duplicate_spans(df, "doc_id", "text", base1=131, base2=131)


def _mini_oracle_spans(rows, k, base1=1_000_003, base2=999_983, ref_rows=None):
    import re

    m31 = (1 << 31) - 1

    def tok(text):
        return [t for t in re.split(r"\s+", text.lower()) if t != ""]

    def chash(t):
        acc = 0
        for c in t:
            acc = (acc * 131 + ord(c)) % m31
        return acc

    def fold(hs, base):
        acc = 0
        for h in hs:
            acc = (acc * base + h) % m31
        return acc

    def gram_list(side_rows):
        out = []  # (doc, pos, fp)
        for i, text in side_rows:
            if text is None or i is None:
                continue
            th = [chash(t) for t in tok(text)]
            for p in range(1, len(th) - k + 2):
                win = th[p - 1 : p - 1 + k]
                out.append((i, p, fold(win, base1) * (1 << 31) + fold(win, base2)))
        return out

    grams = gram_list(rows)
    from collections import Counter

    if ref_rows is None:
        cnt = Counter(fp for _, _, fp in grams)
        dup = lambda fp: cnt[fp] >= 2  # noqa: E731
    else:
        ref_fps = {fp for _, _, fp in gram_list(ref_rows)}
        dup = lambda fp: fp in ref_fps  # noqa: E731
    expect = set()
    by_doc = {}
    for i, p, fp in grams:
        if dup(fp):
            by_doc.setdefault(i, []).append(p)
    for i, ps in by_doc.items():
        ps.sort()
        start = prev = ps[0]
        for p in ps[1:] + [None]:
            if p is not None and p == prev + 1:
                prev = p
                continue
            expect.add((i, start, prev + k - 1, prev + k - 1 - start + 1))
            if p is not None:
                start = prev = p
    return expect


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),
            st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=12).map(" ".join),
        ),
        max_size=6, unique_by=lambda t: t[0],
    )
)
def test_duplicate_spans_matches_python_mini_oracle(spark, rows):
    """For ANY corpus over a tiny alphabet (collision-rich on purpose):
    the span report equals a pure-Python replay of tokenization, char
    folds, 62-bit gram packing, occurrence counting, and islands merge."""
    from artigraph_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(rows or [(0, "")], "doc_id long, text string")
    if not rows:
        df = df.filter("false")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, "doc_id", "text", min_tokens=3).collect()
    }
    assert got == _mini_oracle_spans(rows, 3)


# ---------------------------------------------- duplicate_spans_against


def test_spans_against_localizes_leak_and_ignores_self_repetition(spark):
    from artigraph_spark.operators.dedup import (
        duplicate_spans_against,
        remove_duplicate_spans,
    )

    train = spark.createDataFrame(
        [
            (1, "question what is the capital of france answer paris obviously"),
            (2, "completely unrelated training document with its own text body"),
            (3, "x y x y x y x y x y"),  # in-corpus repetition only
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the capital of france answer paris")],
        "doc_id long, text string",
    )
    spans = duplicate_spans_against(train, bench, "doc_id", "text", min_tokens=4)
    got = {tuple(r) for r in spans.collect()}
    # only doc 1's leaked benchmark text flags; doc 3's self-repetition
    # is duplicate_spans' job, not cross-corpus contamination
    assert got == {(1, 2, 9, 8)}
    cut = {
        r["doc_id"]: r["text_dedup"]
        for r in remove_duplicate_spans(
            train, "doc_id", "text", min_tokens=4, spans=spans
        ).collect()
    }
    assert cut[1] == "question obviously"
    assert cut[3] == "x y x y x y x y x y"


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),
            st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=12).map(" ".join),
        ),
        max_size=5, unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(
            st.integers(100, 130),
            st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=12).map(" ".join),
        ),
        max_size=5, unique_by=lambda t: t[0],
    ),
)
def test_spans_against_matches_python_mini_oracle(spark, new_rows, ref_rows):
    from artigraph_spark.operators.dedup import duplicate_spans_against

    new = spark.createDataFrame(new_rows or [(0, "")], "doc_id long, text string")
    ref = spark.createDataFrame(ref_rows or [(0, "")], "doc_id long, text string")
    if not new_rows:
        new = new.filter("false")
    if not ref_rows:
        ref = ref.filter("false")
    got = {
        tuple(r)
        for r in duplicate_spans_against(
            new, ref, "doc_id", "text", min_tokens=3
        ).collect()
    }
    assert got == _mini_oracle_spans(new_rows, 3, ref_rows=ref_rows)


# ---------------------------------------------- remove_duplicate_spans


def test_remove_duplicate_spans_rewrite(spark):
    from artigraph_spark.operators.dedup import remove_duplicate_spans

    rows = [
        (1, "a b c d e f g h i j unique tail one"),
        (2, "prefix two a b c d e f g h i j different end"),
        (3, "untouched doc with no repeats anywhere at all"),
        (4, "rep rep rep rep rep rep rep rep"),  # fully cut
        (6, None),  # token-less → empty string, one row still emitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["tokens_removed"])
        for r in remove_duplicate_spans(df, "doc_id", "text", min_tokens=4).collect()
    }
    assert out[1] == ("unique tail one", 13, 10)
    assert out[2] == ("prefix two different end", 14, 10)
    assert out[3] == ("untouched doc with no repeats anywhere at all", 8, 0)
    assert out[4] == ("", 8, 8)
    assert out[6] == ("", 0, 0)


def test_remove_duplicate_spans_accepts_precomputed_cutlist(spark):
    from artigraph_spark.operators.dedup import duplicate_spans, remove_duplicate_spans

    rows = [(1, "x y z x y z x y z"), (2, "x y z only once here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, "doc_id", "text", min_tokens=3)
    a = sorted(
        map(tuple, remove_duplicate_spans(df, "doc_id", "text", min_tokens=3).collect())
    )
    b = sorted(
        map(tuple, remove_duplicate_spans(
            df, "doc_id", "text", min_tokens=3, spans=spans
        ).collect())
    )
    assert a == b


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),
            st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=12).map(" ".join),
        ),
        max_size=6, unique_by=lambda t: t[0],
    )
)
def test_remove_duplicate_spans_matches_mini_oracle(spark, rows):
    """Rewrite = drop exactly the positions the span mini-oracle covers;
    tokens_removed is conserved against the span report."""
    import re

    from artigraph_spark.operators.dedup import remove_duplicate_spans

    df = spark.createDataFrame(rows or [(0, "")], "doc_id long, text string")
    if not rows:
        df = df.filter("false")
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["tokens_removed"])
        for r in remove_duplicate_spans(df, "doc_id", "text", min_tokens=3).collect()
    }
    spans = _mini_oracle_spans(rows, 3)
    by_doc = {}
    for i, s, e, _ in spans:
        by_doc.setdefault(i, []).append((s, e))
    want = {}
    for i, text in rows:
        toks = [t for t in re.split(r"\s+", text.lower()) if t != ""]
        cut = set()
        for s, e in by_doc.get(i, []):
            cut.update(range(s, e + 1))
        kept = [t for p, t in enumerate(toks, start=1) if p not in cut]
        want[i] = (" ".join(kept), len(toks), len(cut))
    assert got == want


def test_kmeans_large_k_centroid_update_matches_collect_path(spark, monkeypatch):
    # The r14 columnar (toPandas + vectorized floor-divide) centroid
    # update on the large-k arm must be bit-identical to the small-k
    # Row-collect loop: force the large-k arm with the switch at 0 and
    # compare full (id, cluster, dist_q) sets across >0 iterations.
    import artigraph_spark.operators.similarity as sim

    rows = [(i, [float((i * 13 + d * 5) % 17) / 17 - 0.45 for d in range(6)])
            for i in range(1, 61)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    a = {(r["vec_id"], r["cluster"], r["dist_q"])
         for r in sim.kmeans_exact(df, k=7, iterations=3, qbits=10).collect()}
    monkeypatch.setattr(sim, "_UNROLL_MAX_K", 0)
    b = {(r["vec_id"], r["cluster"], r["dist_q"])
         for r in sim.kmeans_exact(df, k=7, iterations=3, qbits=10).collect()}
    assert a == b
    assert len(a) == 60
