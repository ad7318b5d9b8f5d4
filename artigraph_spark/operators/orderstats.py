"""Exact distributed order statistics.

Every operator here rides :mod:`artigraph_spark.operators._ranks`'
bucketed two-phase prefix-sum rank (the r9 primitive): the only
data-sized stage is one map-side-combined groupBy(group, value)
histogram shuffle; quantile/trim/rank arithmetic runs over the
histogram with cross-bucket prefix offsets, so no group is ever sorted
on one partition. This is the EXACT counterpart of the approx_quantile
family — use these when downstream logic needs reproducible,
engine-identical cut points (train/eval splits, fence audits,
rank-based tests), and the approx sketches when an ε-error is fine.

The reference framework (arti) ships no statistics kernels (its
statistics module is a stub tree, src/arti/statistics/__init__.py);
these operators are part of the SURVEY §2 Part B surface the north
star requires.
"""

from __future__ import annotations

from collections.abc import Sequence
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artigraph_spark.operators._adaptive import reuse_frame
from artigraph_spark.operators._ranks import bucketed_group_value_ranks

_DEC = "decimal(38,0)"


def _q_fraction(q: float) -> tuple[int, int]:
    """Exact rational reading of a quantile literal: ``0.1`` means 1/10,
    not the nearest binary double — Fraction(str(q)) keeps ceil(q·n)
    exact where float multiplication could land on the wrong side of an
    integer boundary."""
    frac = Fraction(str(q))
    if not (0 < frac <= 1):
        raise ValueError(f"quantiles must be in (0, 1], got {q}")
    return frac.numerator, frac.denominator


def _clean_base(df: DataFrame, group_cols: Sequence[str], value_col: str) -> DataFrame:
    v = F.col(value_col)
    return df.filter(
        v.isNotNull() & ~F.isnan(v.cast("double"))
    ).select(*group_cols, value_col)


def exact_group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    *,
    buckets: int = 1024,
) -> DataFrame:
    """Exact type-1 (lower-value) quantiles per group: for each q, the
    group's value at rank ``ceil(q·n)`` — the discrete quantile both
    engines agree on bit-for-bit, with NO float rank arithmetic: q is
    read as an exact fraction and the membership test
    ``cum_prev < ceil(q_num·n/q_den) ≤ cum`` rewrites divisionless as
    two DECIMAL(38,0) product comparisons (the quantile_normalize
    interval trick), so no ceil/division rounding can flip a cut point.

    NULL and NaN values are excluded from both ranks and n (the
    rank_normalize contract). Scale shape: the bucketed histogram rank
    (one data-sized shuffle) × a len(qs)-wide literal explode, filtered
    to exactly one histogram row per (group, q).

    Returns ``(*group_cols, q, n, value)`` — ``q`` as the double
    literal for readability, the selection itself exact.
    """
    if not qs:
        raise ValueError("exact_group_quantiles needs at least one quantile")
    gcols = list(group_cols)
    base = _clean_base(df, gcols, value_col)
    ranks = bucketed_group_value_ranks(base, gcols, value_col, buckets=buckets)
    return _quantiles_from_ranks(ranks, gcols, qs)


def _quantiles_from_ranks(
    ranks: DataFrame, gcols: Sequence[str], qs: Sequence[float]
) -> DataFrame:
    """Quantile membership filter over a PRECOMPUTED
    :func:`bucketed_group_value_ranks` histogram — split out so callers
    that already paid the data-sized histogram shuffle (tukey_fences)
    reuse it instead of rebuilding the ranks frame."""
    fracs = [(float(q), *_q_fraction(q)) for q in qs]
    qarr = F.array(
        *[
            F.struct(
                F.lit(qf).alias("q"),
                F.lit(qn).cast("long").alias("__qn"),
                F.lit(qd).cast("long").alias("__qd"),
            )
            for qf, qn, qd in fracs
        ]
    )
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    exploded = ranks.withColumn("__qs", F.explode(qarr))
    a = dec(F.col("__qs.__qn")) * dec(F.col("__ng"))  # q_num·n, exact
    b = dec(F.col("__qs.__qd"))
    cum_prev = dec(F.col("__rg") - 1)
    cum = dec(F.col("__rg") - 1 + F.col("__f"))
    return exploded.filter((a > cum_prev * b) & (a <= cum * b)).select(
        *list(gcols),
        F.col("__qs.q").alias("q"),
        F.col("__ng").alias("n"),
        F.col("__v").alias("value"),
    )


def trimmed_mean_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    trim: float = 0.1,
    bits: int = 20,
    buckets: int = 1024,
) -> DataFrame:
    """Exact trimmed mean per group: drop exactly ``floor(trim·n)`` rows
    from EACH end of the group's value order (the classical trimmed
    mean, scipy's convention) and take the fixed-point mean of the rest
    — the outlier-robust location estimate between mean (trim=0) and
    median.

    Exactness: the trim count is integer ``div`` of the exact fraction
    (``0.1`` read as 1/10); each histogram row keeps
    ``max(0, min(cum, n−k) − max(cum_prev, k))`` of its ``f``
    occurrences — pure int64 arithmetic — and the kept mass rides a
    fixed-point DECIMAL sum with ONE double division at the end
    (round 9). NULL/NaN excluded throughout.

    Returns ``(*group_cols, n, n_kept, trimmed_mean_r)``.
    """
    if not (0 <= trim < 0.5):
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    t_num, t_den = Fraction(str(trim)).numerator, Fraction(str(trim)).denominator
    gcols = list(group_cols)
    base = _clean_base(df, gcols, value_col)
    ranks = bucketed_group_value_ranks(base, gcols, value_col, buckets=buckets)
    k = F.expr(f"CAST(({t_num} * __ng) div {t_den} AS BIGINT)")
    cum_prev = F.col("__rg") - 1
    cum = cum_prev + F.col("__f")
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(cum, F.col("__ng") - k) - F.greatest(cum_prev, k),
    )
    vfx = F.floor(F.col("__v").cast("double") * F.lit(float(1 << bits))).cast("long")
    per_row = ranks.select(
        *gcols,
        F.col("__ng"),
        kept.alias("__kept"),
        (kept.cast(_DEC) * vfx.cast(_DEC)).alias("__mass"),
    )
    return per_row.groupBy(*gcols).agg(
        F.max("__ng").alias("n"),
        F.sum("__kept").alias("n_kept"),
        F.round(
            F.sum("__mass").cast("double")
            / F.lit(float(1 << bits))
            / F.sum("__kept").cast("double"),
            9,
        ).alias("trimmed_mean_r"),
    )


def tukey_fences(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    k: float = 1.5,
    buckets: int = 1024,
) -> DataFrame:
    """Tukey boxplot fences per group: exact type-1 quartiles Q1/Q3, the
    fences ``Q1 − k·IQR`` / ``Q3 + k·IQR``, and how many values fall
    outside each — the third member of the outlier-audit family
    (z-score assumes normality, MAD assumes symmetry of scale; Tukey's
    IQR rule is the distribution-light boxplot standard).

    Quartiles come from the quantile membership filter over ONE shared
    bucketed histogram (exact, no sort concentration); the outlier
    counts are one more pass over the SAME histogram frame joined to the
    per-group fences (group-keyed, summary × histogram) — both sides of
    the plan hang off one ranks lineage, so the data-sized histogram
    exchange is built once and reused (ReusedExchange), not recomputed.
    Fence comparisons and outputs are double (k·IQR is one
    correctly-rounded multiply of exact inputs — engine-identical).

    Returns ``(*group_cols, n, q1, q3, lo_fence_r, hi_fence_r,
    n_low, n_high)``.
    """
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    gcols = list(group_cols)
    base = _clean_base(df, gcols, value_col)
    # r14: the ranks histogram feeds both the quartile filter and the
    # outlier-count join; scale-adaptive single execution of the whole
    # rank machinery (no-op at test scale —
    # operators._adaptive.reuse_frame).
    ranks = reuse_frame(
        bucketed_group_value_ranks(base, gcols, value_col, buckets=buckets)
    )
    quarts = _quantiles_from_ranks(ranks, gcols, [0.25, 0.75])
    fences = (
        quarts.groupBy(*gcols)
        .agg(
            F.max("n").alias("n"),
            F.min(F.when(F.col("q") == 0.25, F.col("value"))).alias("q1"),
            F.min(F.when(F.col("q") == 0.75, F.col("value"))).alias("q3"),
        )
        .select(
            *[F.col(c).alias(f"__fg{i}") for i, c in enumerate(gcols)],
            "n",
            "q1",
            "q3",
            (
                F.col("q1").cast("double")
                - F.lit(float(k))
                * (F.col("q3").cast("double") - F.col("q1").cast("double"))
            ).alias("__lo"),
            (
                F.col("q3").cast("double")
                + F.lit(float(k))
                * (F.col("q3").cast("double") - F.col("q1").cast("double"))
            ).alias("__hi"),
        )
    )
    cond = F.lit(True)
    for i, c in enumerate(gcols):
        cond = cond & ranks[c].eqNullSafe(F.col(f"__fg{i}"))
    joined = ranks.join(fences, cond)
    vd = F.col("__v").cast("double")
    return joined.groupBy(*[ranks[c] for c in gcols]).agg(
        F.max("n").alias("n"),
        F.max("q1").alias("q1"),
        F.max("q3").alias("q3"),
        F.round(F.max("__lo"), 9).alias("lo_fence_r"),
        F.round(F.max("__hi"), 9).alias("hi_fence_r"),
        F.coalesce(
            F.sum(F.when(vd < F.col("__lo"), F.col("__f"))), F.lit(0)
        ).alias("n_low"),
        F.coalesce(
            F.sum(F.when(vd > F.col("__hi"), F.col("__f"))), F.lit(0)
        ).alias("n_high"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    buckets: int = 1024,
    x_quantize_bits: int | None = None,
    y_quantize_bits: int | None = None,
) -> DataFrame:
    """Spearman rank correlation between two numeric columns — the
    monotone-association test (Pearson on ranks): outlier-immune,
    invariant to monotone re-scalings, the right correlation when the
    relationship is monotone but not linear.

    Ties get AVERAGE ranks (the standard tie convention), kept exact by
    scaling every rank by 2: a distinct value with min-rank ``rg`` and
    frequency ``f`` has average rank ``rg + (f−1)/2``, i.e. scaled rank
    ``2·rg + f − 1`` — an integer. The whole statistic is computed off
    ONE joint (x, y) histogram: the fact table is scanned once into a
    map-side-combined groupBy(x, y) count frame (the only data-sized
    shuffle — its exchange is built once and reused across every
    consumer), both marginal rank maps derive from it through the
    frequency-weighted bucketed prefix-sum histogram (no global sort),
    and the correlation is Pearson's product-moment over the scaled
    integer ranks with frequency-weighted DECIMAL(38,0) moment sums
    (exact to n ≈ 1.3e9 rows — n·Σr² ≤ 4n⁴ must fit 38 digits; beyond
    that, sample first) and ONE double square-root division at the end
    (round 9). Rows with NULL/NaN in EITHER column are excluded
    (pairwise-complete, the scipy default for dropped data). Zero rank
    variance (a constant column) returns NULL.

    Near-unique columns: the joint histogram IS the data when every
    value is distinct, so the rank-map joins scale with the distinct
    count. ``x_quantize_bits``/``y_quantize_bits`` bound that: the
    column is first snapped to the fixed-point grid ``floor(v·2^bits)``
    (the kmeans/PCA quantization convention; a NEGATIVE bits coarsens —
    bits=-4 means cells of 16), which caps the rank map at
    range/2^-bits cells independent of row count and the joint
    histogram at |X cells|·|Y cells|. The statistic becomes
    Spearman over the BINNED column (ties averaged within a cell) —
    monotone-equivalent resolution loss, exact and engine-identical
    given the grid (double multiply + floor are IEEE-identical in both
    engines for a power-of-two factor). Default None = exact ranks.

    Returns one row ``(n, rho_r)``.
    """

    def _q(col, bits: int | None):
        if bits is None:
            return col
        return F.floor(col.cast("double") * F.lit(float(2.0**bits))).cast("long")

    xv, yv = F.col(x_col), F.col(y_col)
    ok = (
        xv.isNotNull()
        & ~F.isnan(xv.cast("double"))
        & yv.isNotNull()
        & ~F.isnan(yv.cast("double"))
    )
    # r14: the joint histogram fans out to 3 consumers (x rank map, y
    # rank map, the ranked join) whose divergent column pruning defeats
    # exchange reuse — each would re-run the fact-table scan+groupBy.
    # Scale-adaptive single execution; no-op at test scale, where the
    # forced cut measured SLOWER than the rescans
    # (operators._adaptive.reuse_frame).
    joint = reuse_frame(
        df.filter(ok)
        .groupBy(
            _q(xv, x_quantize_bits).alias("__x"),
            _q(yv, y_quantize_bits).alias("__y"),
        )
        .agg(F.count(F.lit(1)).alias("__jf"))
        .withColumn("__one", F.lit(1))
    )
    scaled = lambda: (2 * F.col("__rg") + F.col("__f") - 1).cast("long")  # noqa: E731
    xmap = bucketed_group_value_ranks(
        joint, ["__one"], "__x", buckets=buckets, freq_col="__jf"
    ).select(F.col("__v").alias("__xv"), scaled().alias("__rx"))
    ymap = bucketed_group_value_ranks(
        joint, ["__one"], "__y", buckets=buckets, freq_col="__jf"
    ).select(F.col("__v").alias("__yv"), scaled().alias("__ry"))
    ranked = joint.join(xmap, F.col("__x") == F.col("__xv")).join(
        ymap, F.col("__y") == F.col("__yv")
    )
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    jf = dec(F.col("__jf"))
    sums = ranked.agg(
        F.sum("__jf").alias("n"),
        F.sum(jf * dec(F.col("__rx"))).alias("__sx"),
        F.sum(jf * dec(F.col("__ry"))).alias("__sy"),
        F.sum(jf * dec(F.col("__rx")) * dec(F.col("__rx"))).alias("__sxx"),
        F.sum(jf * dec(F.col("__ry")) * dec(F.col("__ry"))).alias("__syy"),
        F.sum(jf * dec(F.col("__rx")) * dec(F.col("__ry"))).alias("__sxy"),
    )
    nd = F.col("n").cast(_DEC)
    vx = (nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vy = (nd * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    cov = (nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    return sums.select(
        "n",
        F.when(
            (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 9)
        ).alias("rho_r"),
    )
