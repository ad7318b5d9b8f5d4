"""Distributed exact-rank primitives.

The naive exact rank — ``rank().over(Window.partitionBy(g).orderBy(v))``
— concentrates each group's ENTIRE sort on one partition: with few, huge
groups (3 returnflag groups over a 100 TB lineitem) the job parks the
corpus on 3 cores. These helpers compute the *same exact ranks* through
the repo's bucketed two-phase prefix-sum technique (the
``select_token_budget`` / ``sorted_neighborhood_pairs`` pattern):

1. range-bucket the ordering value with a deterministic monotone map
   (any monotone bucketing is rank-exact as long as ties land in the
   same bucket — trivially true for a pure function of the value);
2. aggregate per-bucket counts (a groups×buckets summary frame) and
   prefix-sum them into per-bucket rank offsets;
3. rank locally WITHIN each (group, bucket) partition — parallelism
   groups×buckets instead of groups — and add the offset.

Exactness does not depend on bucket balance: skewed buckets only cost
parallelism, never correctness, so the bucket map can be a cheap
float expression (floor-linear over the global min/max). Both engines
never see the buckets — they are internal to the Spark plan — so no
cross-engine arithmetic contract applies to them.

Reference scope note: the reference framework (arti) has no ranking
kernels at all; these primitives back the SURVEY §2 normalization /
segmentation operators (rank_normalize, quantile_normalize,
rfm_segments).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DecimalType,
    IntegerType,
    LongType,
    NumericType,
    ShortType,
)

from artigraph_spark.operators._adaptive import reuse_frame, reuse_frame_cut

_NULL_BUCKET = -1  # sorts first asc / last desc, like Spark's null ordering

# Count-like sum columns normalize to long; fractional/decimal masses keep
# Spark's natural sum type (see bucketed_prefix_sums).
_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def _bucket_expr(value: Column, lo: Column, hi: Column, buckets: int) -> Column:
    """Deterministic monotone bucket index of ``value`` in [lo, hi].

    NULL → -1 (mirrors Spark's asc-nulls-first / desc-nulls-last),
    NaN → ``buckets`` (NaN sorts above every number on both engines),
    finite values → floor-linear into [0, buckets-1]. Monotone because
    every step (subtract, divide by a positive range, floor) is
    monotone non-decreasing in the value.
    """
    vd = value.cast("double")
    return (
        F.when(value.isNull(), F.lit(_NULL_BUCKET))
        .when(F.isnan(vd), F.lit(buckets))
        .when(
            hi > lo,
            F.least(
                F.floor((vd - lo) / (hi - lo) * buckets),
                F.lit(buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )


def _range_frame(base: DataFrame, value: Column) -> DataFrame:
    """One-row frame with the non-NaN min/max of ``value`` (NULLs are
    ignored by min/max already) — the broadcast side of the bucket map."""
    vd = value.cast("double")
    guard = F.when(~F.isnan(vd), vd)
    return base.agg(F.min(guard).alias("__lo"), F.max(guard).alias("__hi"))


def bucketed_group_value_ranks(
    base: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    buckets: int = 1024,
    freq_col: str | None = None,
) -> DataFrame:
    """Exact within-group competition (min-)ranks of each DISTINCT value,
    never sorting a whole group on one partition.

    ``base`` must already be filtered to rankable rows (the caller
    decides whether NaN participates; NULL values must be excluded).
    With ``freq_col``, ``base`` is a PRE-AGGREGATED histogram — each row
    stands for ``freq_col`` occurrences of its value (callers that
    already paid a groupBy, e.g. a joint two-column histogram, skip the
    second data-sized shuffle; min/max are weight-blind so the bucket
    map is unchanged). Returns ``(*group_cols, __v, __f, __rg, __ng)``
    — one row per distinct (group, value): its frequency, its
    competition rank (1 + count of strictly smaller values in the group
    — ties share a rank, exactly ``rank()`` over the raw rows), and the
    group's rankable-row count. Join it back to the fact rows on
    (group eq-null-safe, value ==) to attach ranks.

    Plan shape: one map-side-combined groupBy(group, value) histogram
    shuffle (the only data-sized stage), a groups×buckets offsets
    aggregate with a per-group prefix window over ≤buckets rows, a
    WITHIN-bucket histogram window (parallelism groups×buckets), and a
    (group, bucket)-keyed equi-join of the two summary frames. For a
    non-numeric value type the bucket map degenerates to one bucket —
    still a histogram-sized (distinct-values-per-group) sort, never a
    raw-row sort.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if not group_cols:
        raise ValueError("bucketed_group_value_ranks needs group columns")
    gcols = list(group_cols)
    v = F.col(value_col)
    freq = F.count(F.lit(1)) if freq_col is None else F.sum(freq_col)
    # r14: the histogram subtree fans out to 3 consumers (range frame,
    # per-bucket offsets, within-bucket window) whose divergent column
    # pruning defeats exchange reuse — each consumer re-executes the
    # data-sized groupBy from the scan. reuse_frame cuts that to one
    # execution above the input-size threshold, and is a no-op at test
    # scale (operators._adaptive).
    hist, cut = reuse_frame_cut(
        base.groupBy(*gcols, v.alias("__v")).agg(freq.alias("__f"))
    )
    numeric = isinstance(base.schema[value_col].dataType, NumericType)
    if numeric:
        # r14: when the histogram was materialized, the range frame
        # derives from it (min/max over the DISTINCT values equals
        # min/max over the raw rows — bucket maps are rank-invariant
        # anyway) so the raw-row subtree is executed ZERO extra times.
        # When it was not (test scale), keep the original direct min/max
        # over `base` — a map-side aggregate, cheaper than re-running
        # the histogram exchange.
        rng = _range_frame(hist if cut else base, F.col("__v") if cut else v)
        bexpr = _bucket_expr(F.col("__v"), F.col("__lo"), F.col("__hi"), buckets)
        hb = hist.crossJoin(F.broadcast(rng)).select(
            *gcols, "__v", "__f", bexpr.alias("__bk")
        )
    else:
        hb = hist.select(*gcols, "__v", "__f", F.lit(0).alias("__bk"))
    per_bucket = hb.groupBy(*gcols, "__bk").agg(F.sum("__f").alias("__bf"))
    w_off = Window.partitionBy(*gcols).orderBy("__bk")
    offsets = per_bucket.select(
        *[F.col(c).alias(f"__og{i}") for i, c in enumerate(gcols)],
        F.col("__bk").alias("__obk"),
        F.coalesce(
            F.sum("__bf").over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__off"),
        F.sum("__bf").over(Window.partitionBy(*gcols)).alias("__ng"),
    )
    w_local = Window.partitionBy(*gcols, "__bk").orderBy("__v")
    local = hb.withColumn(
        "__lcp",
        F.coalesce(
            F.sum("__f").over(w_local.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    # eq-null-safe on the group keys: a NULL group is a real ranking
    # partition (the raw-window semantics), and eq-null-safe keys stay
    # hash-joinable.
    cond = F.col("__bk") == F.col("__obk")
    for i, c in enumerate(gcols):
        cond = cond & local[c].eqNullSafe(F.col(f"__og{i}"))
    return local.join(offsets, cond).select(
        *gcols,
        "__v",
        "__f",
        (F.col("__off") + F.col("__lcp") + F.lit(1)).cast("long").alias("__rg"),
        F.col("__ng").cast("long").alias("__ng"),
    )


def bucketed_prefix_sums(
    hist: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    sum_cols: Sequence[str],
    *,
    buckets: int = 1024,
    bucket_col: str | None = None,
    keep_bucket: str | None = None,
) -> DataFrame:
    """Exclusive per-group running sums of ``sum_cols`` by ascending
    ``value_col`` over a HISTOGRAM frame, plus group totals — the
    cumulative-distribution substrate for AUC / Mann–Whitney / KS /
    winsorize-style statistics, computed with the same range-bucket
    two-phase pattern as :func:`bucketed_group_value_ranks` so no group
    is ever walked on one partition.

    ``hist`` must hold at most ONE row per (group, value) — the output
    of a ``groupBy(group, value)`` — with no NULL values (NaN is fine:
    it buckets last, Spark's ascending order). ``group_cols`` may be
    empty for a global running sum (the offsets window then runs over a
    single ≤buckets-row summary partition — metadata-sized by
    construction). Appends, for each ``c`` in ``sum_cols``,
    ``__pre_<c>`` (sum of ``c`` over STRICTLY SMALLER values in the
    group, 0 for the smallest) and ``__tot_<c>`` (the group total);
    every input column passes through. Output types: an INTEGRAL
    ``sum_cols`` entry (the count-like default) comes back as long; a
    fractional/decimal entry keeps Spark's natural sum type (e.g.
    DECIMAL(38,9) masses stay exact decimals — never silently truncated
    to integers). Decimal sums must fit 28 integer digits: the
    offset+local addition narrows its operands to precision 37 so the
    result keeps the input's full scale instead of Spark's
    precision-capped scale-8 downgrade.

    Plan shape: one groups×buckets offsets aggregate with a per-group
    prefix window over ≤buckets rows, a within-bucket prefix window
    (parallelism groups×buckets), and a (group, bucket)-keyed equi-join
    of the summary frames — nothing data-sized beyond the histogram the
    caller already built.

    CHAINED PASSES (r12): a second prefix pass over a FIRST pass's
    output — the kaplan_meier shape, where the second pass's sum
    columns depend on the first's prefixes — keys on the identical
    (group, value) frame, so recomputing the bucket map (a min/max
    aggregate over the frame plus a broadcast cross join, one extra
    branch fanning out of the input) is pure waste. Pass
    ``keep_bucket="__kb"`` on pass 1 to retain the internal bucket id
    under that name, and ``bucket_col="__kb"`` on pass 2 to reuse it:
    pass 2 then skips the range-frame branch entirely, and — because
    its groupBy / within-bucket window hash on the same (group, bucket)
    keys pass 1's output is already partitioned AND sorted by — adds no
    data-sized exchange or sort. ``bucket_col`` values must be a prior
    pass's ids over the SAME value column (any monotone-in-value int
    works; exactness never depends on bucket balance).
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if not sum_cols:
        raise ValueError("bucketed_prefix_sums needs sum columns")
    gcols = list(group_cols)
    scols = list(sum_cols)
    integral = [isinstance(hist.schema[c].dataType, _INTEGRAL) for c in scols]
    out_cast = lambda col, i: col.cast("long") if integral[i] else col  # noqa: E731
    # r14: the caller's histogram fans out to 3 consumers here (range
    # frame, per-bucket offsets, within-bucket prefix window) with
    # divergent pruning — no exchange reuse, so each consumer re-runs
    # the caller's whole upstream. Scale-adaptive single execution;
    # no-op at test scale (operators._adaptive.reuse_frame). A chained
    # second pass (bucket_col=...) keeps its no-new-exchange property:
    # the cut preserves partitioning/ordering metadata.
    hist = reuse_frame(hist)
    v = F.col(value_col)
    if bucket_col is not None:
        # bucket_col is the one EXTERNALLY-supplied bucket id (the internal
        # branch computes __bk itself, never NULL). The offsets equi-join on
        # __bk is null-unsafe, so a NULL id would silently DROP those
        # histogram rows — fail loudly instead.
        hb = hist.withColumn(
            "__bk",
            F.when(
                F.col(bucket_col).isNotNull(), F.col(bucket_col).cast("int")
            ).otherwise(
                F.raise_error(
                    F.lit(
                        f"bucketed_prefix_sums: NULL bucket id in bucket_col "
                        f"{bucket_col!r} (ids must be a prior pass's non-NULL "
                        f"keep_bucket output)"
                    )
                )
            ),
        )
    elif isinstance(hist.schema[value_col].dataType, NumericType):
        rng = _range_frame(hist, v)
        hb = hist.crossJoin(F.broadcast(rng)).withColumn(
            "__bk", _bucket_expr(v, F.col("__lo"), F.col("__hi"), buckets)
        ).drop("__lo", "__hi")
    else:
        hb = hist.withColumn("__bk", F.lit(0).cast("int"))
    per_bucket = hb.groupBy(*gcols, "__bk").agg(
        *[F.sum(c).alias(f"__bs{i}") for i, c in enumerate(scols)]
    )
    w_off = Window.partitionBy(*gcols).orderBy("__bk")
    offsets = per_bucket.select(
        *[F.col(c).alias(f"__og{i}") for i, c in enumerate(gcols)],
        F.col("__bk").alias("__obk"),
        *[
            F.coalesce(
                F.sum(f"__bs{i}").over(
                    w_off.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias(f"__off{i}")
            for i in range(len(scols))
        ],
        *[
            out_cast(F.sum(f"__bs{i}").over(Window.partitionBy(*gcols)), i).alias(
                f"__tot_{c}"
            )
            for i, c in enumerate(scols)
        ],
    )
    w_local = Window.partitionBy(*gcols, "__bk").orderBy(value_col)
    local = hb
    for i, c in enumerate(scols):
        local = local.withColumn(
            f"__lc{i}",
            F.coalesce(
                F.sum(c).over(w_local.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
    cond = F.col("__bk") == F.col("__obk")
    for i, c in enumerate(gcols):
        cond = cond & local[c].eqNullSafe(F.col(f"__og{i}"))
    out = local.join(offsets, cond)
    for i, c in enumerate(scols):
        off, lc = F.col(f"__off{i}"), F.col(f"__lc{i}")
        dt = per_bucket.schema[f"__bs{i}"].dataType
        if isinstance(dt, DecimalType):
            # (38,s)+(38,s) would cap at 38 digits by dropping a scale
            # digit — rounding the sum. Narrowing both operands to
            # precision 37 keeps the full scale; values must fit the
            # remaining 37-s integer digits (documented contract).
            narrowed = DecimalType(37, dt.scale)
            pre = off.cast(narrowed) + lc.cast(narrowed)
        else:
            pre = out_cast(off + lc, i)
        out = out.withColumn(f"__pre_{c}", pre)
    drop = (
        ["__obk"]
        + [f"__og{i}" for i in range(len(gcols))]
        + [f"__off{i}" for i in range(len(scols))]
        + [f"__lc{i}" for i in range(len(scols))]
    )
    if keep_bucket is not None:
        out = out.withColumnRenamed("__bk", keep_bucket)
    else:
        drop.append("__bk")
    return out.drop(*drop)


def bucketed_row_numbers(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    *,
    descending: bool = False,
    buckets: int = 1024,
    out_col: str = "__rn",
    count_col: str | None = None,
) -> DataFrame:
    """Exact GLOBAL row_number by (value, *tiebreaks) without a global
    single-partition window sort.

    Equivalent to ``row_number().over(Window.orderBy(value[.desc()],
    *tiebreaks))`` — Spark default null ordering (asc → nulls first,
    desc → nulls last; NaN above every number) — but computed as
    range-bucket offsets + within-bucket local row_numbers, so the sort
    parallelism is ``buckets`` instead of 1. The tiebreak columns must
    make the order total if downstream logic needs determinism (the
    ntile/top-k convention).

    ``count_col`` (optional) additionally appends the TOTAL row count —
    free from the same ≤buckets-row offsets frame (a summary window, no
    second scan of ``df``; the ntile-from-rank callers need exactly
    this pair).

    Returns ``df`` with ``out_col`` (long, 1-based) appended.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    v = F.col(value_col)
    numeric = isinstance(df.schema[value_col].dataType, NumericType)
    if numeric:
        rng = _range_frame(df, v)
        bexpr = _bucket_expr(v, F.col("__lo"), F.col("__hi"), buckets)
        rows = df.crossJoin(F.broadcast(rng)).withColumn("__bk", bexpr).drop(
            "__lo", "__hi"
        )
    else:
        rows = df.withColumn(
            "__bk",
            F.when(v.isNull(), F.lit(_NULL_BUCKET)).otherwise(F.lit(0)).cast("int"),
        )
    per_bucket = rows.groupBy("__bk").agg(F.count(F.lit(1)).alias("__bf"))
    w_off = Window.orderBy(F.col("__bk").desc() if descending else F.col("__bk"))
    off_cols = [
        F.col("__bk").alias("__obk"),
        F.coalesce(
            F.sum("__bf").over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__off"),
    ]
    if count_col is not None:
        off_cols.append(
            F.sum("__bf").over(Window.partitionBy()).cast("long").alias(count_col)
        )
    offsets = per_bucket.select(*off_cols)
    order = [v.desc_nulls_last() if descending else v.asc_nulls_first()]
    order += [F.col(c) for c in tiebreak_cols]
    w_local = Window.partitionBy("__bk").orderBy(*order)
    local = rows.withColumn("__lrn", F.row_number().over(w_local))
    return (
        local.join(F.broadcast(offsets), F.col("__bk") == F.col("__obk"))
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__bk", "__obk", "__off", "__lrn")
    )


def bucketed_group_row_numbers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_cols: Sequence[str],
    *,
    buckets: int = 1024,
    out_col: str = "__rn",
    count_col: str | None = None,
) -> DataFrame:
    """Exact PER-GROUP row_number by (value asc, *tiebreaks) without
    colocating each group's whole row set on one partition.

    Equivalent to ``row_number().over(Window.partitionBy(*groups)
    .orderBy(value, *tiebreaks))`` — Spark default ascending null
    ordering (nulls first, NaN above every number) — but computed as
    per-(group, range-bucket) local row_numbers plus per-group bucket
    offsets, so the sort parallelism is groups×buckets instead of
    groups: the stratified-split/kfold/curriculum substrate (few huge
    strata are exactly where the naive window parks a corpus on a
    handful of cores). The tiebreak columns must make the order total
    within each group if downstream logic needs determinism. For a
    non-numeric value column the bucket map degenerates to one bucket —
    the naive colocation, no worse.

    ``count_col`` (optional) additionally appends the group's total row
    count — free from the same offsets frame, and NOT another
    group-colocating window.

    Returns ``df`` with ``out_col`` (long, 1-based) appended.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if not group_cols:
        raise ValueError("bucketed_group_row_numbers needs group columns")
    gcols = list(group_cols)
    v = F.col(value_col)
    numeric = isinstance(df.schema[value_col].dataType, NumericType)
    if numeric:
        rng = _range_frame(df, v)
        bexpr = _bucket_expr(v, F.col("__lo"), F.col("__hi"), buckets)
        rows = df.crossJoin(F.broadcast(rng)).withColumn("__bk", bexpr).drop(
            "__lo", "__hi"
        )
    else:
        rows = df.withColumn(
            "__bk",
            F.when(v.isNull(), F.lit(_NULL_BUCKET)).otherwise(F.lit(0)).cast("int"),
        )
    per_bucket = rows.groupBy(*gcols, "__bk").agg(F.count(F.lit(1)).alias("__bf"))
    w_off = Window.partitionBy(*gcols).orderBy("__bk")
    off_cols = [
        *[F.col(c).alias(f"__og{i}") for i, c in enumerate(gcols)],
        F.col("__bk").alias("__obk"),
        F.coalesce(
            F.sum("__bf").over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__off"),
    ]
    if count_col is not None:
        off_cols.append(
            F.sum("__bf")
            .over(Window.partitionBy(*gcols))
            .cast("long")
            .alias(count_col)
        )
    offsets = per_bucket.select(*off_cols)
    order = [v.asc_nulls_first()] + [F.col(c) for c in tiebreak_cols]
    w_local = Window.partitionBy(*gcols, "__bk").orderBy(*order)
    local = rows.withColumn("__lrn", F.row_number().over(w_local))
    cond = F.col("__bk") == F.col("__obk")
    for i, c in enumerate(gcols):
        cond = cond & local[c].eqNullSafe(F.col(f"__og{i}"))
    return (
        local.join(offsets, cond)
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__bk", "__obk", "__off", "__lrn", *[f"__og{i}" for i in range(len(gcols))])
    )


def ntile_from_rank(rank_col: str, n_col: str, tiles: int) -> Column:
    """The tile ``ntile(tiles)`` assigns to the 1-based rank in column
    ``rank_col`` within a totally ordered frame of ``n_col`` rows — both
    engines' floor distribution (the first ``n % tiles`` tiles get one
    extra row) as a pure integer projection, so ntile needs only a
    distributed row_number, not a global single-partition window.

    Named columns (not Column objects) because the arithmetic must be
    int64 ``div`` — Column ``/`` is double division, which loses
    exactness past 2^53. Everything here is exact: positive operands
    make truncating ``div`` equal floor, and ceil(a/b) is
    ``(a + b - 1) div b``. The else-branch denominator is guarded with
    greatest(.., 1): when n < tiles the branch is unreachable row-wise,
    but ANSI mode must never see a raw /0.
    """
    if tiles < 1:
        raise ValueError(f"tiles must be >= 1, got {tiles}")
    size_big = f"(({n_col} div {tiles}) + 1)"
    rem = f"({n_col} % {tiles})"
    big_span = f"({rem} * {size_big})"
    small = f"greatest({size_big} - 1, 1)"
    return F.expr(
        f"CASE WHEN {rank_col} <= {big_span} "
        f"THEN ({rank_col} + {size_big} - 1) div {size_big} "
        f"ELSE {rem} + (({rank_col} - {big_span} + {small} - 1) div {small}) "
        f"END"
    ).cast("long")
