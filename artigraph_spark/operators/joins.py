"""Join operators Spark lacks natively: as-of and range joins.

Reference parity: artigraph has no relational joins of its own (producers
are opaque Python — /root/reference/src/arti/producers/__init__.py:71-94);
these are the time-series joins its users hand-roll, designed here for
100 TB: the as-of join is the union-tag trick (one shuffle on the key, no
left×right explosion), not a theta-join + window reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_side__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    *,
    right_values: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` (``<`` when ``strict``) and equal keys.

    Scale design: rather than the naive equi-join on keys + time filter +
    window-reduce (which materializes |left| × |matching right| rows before
    reducing), union both sides tagged, sort within key partitions by time,
    and carry the last-seen right values forward with an ignore-nulls
    ``last(...)`` window. Cost: ONE shuffle of (|left| + |right|) rows on the
    join key — the same lower bound as any co-partitioned join — and no
    intermediate explosion, so a hot key with millions of right rows costs
    sort-time, not quadratic blowup.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_values = right_values or [c for c in right.columns if c not in keys + [right_time]]
    clash = sorted(set(right_values) & set(left.columns))
    if clash:
        raise ValueError(
            f"right_values {clash} also exist on the left side; rename one side "
            "before the as-of join (carried right columns must be unique)"
        )

    lf = left.withColumn(_TAG, F.lit(1))
    # Compare times at the WIDER type: narrowing (e.g. timestamp→date) would
    # silently truncate left times to midnight and corrupt strict semantics.
    from pyspark.sql import types as T

    lt, rt = left.schema[left_time].dataType, right.schema[right_time].dataType
    common = lt if lt == rt else (
        T.TimestampType() if T.TimestampType() in (lt, rt)
        else T.TimestampNTZType() if T.TimestampNTZType() in (lt, rt)
        else lt
    )
    # NULL right times can never satisfy right_time <= left_time, but they
    # sort NULLS FIRST under the window order and would be carried as
    # earlier-than-everything matches — drop them up front.
    rf = right.filter(F.col(right_time).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(right_time).cast(common).alias("__asof_t__"),
        *[F.col(c) for c in right_values],
    ).withColumn(_TAG, F.lit(0))

    # Align columns for the union: left carries nulls for right values and vice versa.
    left_cols = [c for c in left.columns]
    lf = lf.withColumn("__asof_t__", F.col(left_time).cast(common))
    for c in right_values:
        lf = lf.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    for c in left_cols:
        if c not in rf.columns:
            rf = rf.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    ordered_cols = keys + ["__asof_t__", _TAG] + [
        c for c in left_cols if c not in keys
    ] + right_values
    unioned = lf.select(*ordered_cols).unionByName(rf.select(*ordered_cols))

    # Right rows (tag 0) sort before left rows (tag 1) at equal times, giving
    # inclusive semantics; strict mode excludes equal-time right rows by
    # ordering them after. Ties among right rows at equal (key, time) are
    # broken by a deterministic value-hash so the carried row is well-defined
    # on any partitioning.
    tag_order = F.col(_TAG).asc() if not strict else F.col(_TAG).desc()
    tiebreak = F.when(
        F.col(_TAG) == 0,
        F.xxhash64(*[F.col(c).cast("string") for c in right_values]) if right_values else F.lit(0),
    ).otherwise(F.lit(0))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__asof_t__").asc(), tag_order, tiebreak.asc())
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    # Carry the whole right row as ONE struct (single window pass, not one per
    # column) that is non-null exactly when a right row exists: a matched right
    # row whose individual value is NULL still wins — last(col, ignorenulls)
    # per column would skip it and resurrect an older row's value.
    if right_values:
        rv_struct = F.when(
            F.col(_TAG) == 0, F.struct(*[F.col(c).alias(c) for c in right_values])
        )
        carried = unioned.withColumn(
            "__asof_rv__", F.last(rv_struct, ignorenulls=True).over(w)
        )
        for c in right_values:
            carried = carried.withColumn(c, F.col("__asof_rv__").getField(c))
        carried = carried.drop("__asof_rv__")
    else:
        carried = unioned

    return carried.filter(F.col(_TAG) == 1).drop(_TAG, "__asof_t__")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the (small-ish) right side ``salt``
    ways and scatter the left side across salt buckets, so one hot key
    spreads over ``salt`` reducers instead of melting a single one.

    Use when a handful of keys dominate (power-law joins on user/session
    ids) and AQE's skew-join split isn't available or isn't enough; cost is
    ``salt×`` replication of the right side. Results are identical to a
    plain join (salting only refines the partitioning key).

    Only inner/left/left_semi/left_anti are supported: an unmatched RIGHT
    row exists once per salt replica, so right/full outer would duplicate
    it — flip the sides instead.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r} "
            "(unmatched right rows are salt-replicated; flip the sides)"
        )
    from pyspark.sql import types as T

    # Hash only hashable columns (xxhash64 rejects MAP inputs) and mix in a
    # per-row id so fully-duplicated hot rows scatter too instead of all
    # landing on one salt bucket. The salt only shapes the partitioning —
    # results are identical whatever it evaluates to.
    hashable = [
        f.name for f in left.schema.fields if not isinstance(f.dataType, T.MapType)
    ]
    salted_left = left.withColumn(
        "__salt__",
        F.pmod(
            F.xxhash64(*hashable, F.monotonically_increasing_id()),
            F.lit(salt),
        ).cast("int"),
    )
    salted_right = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(salted_right, [on, "__salt__"], how)
    return out.drop("__salt__")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column | None,
    left_point: str,
    right_lo: str,
    right_hi: str,
    *,
    closed: str = "both",
) -> DataFrame:
    """Join left points into right intervals: ``lo <op> point <op> hi``.

    With equi-keys present, Catalyst plans a hash/sort-merge join on the keys
    and evaluates the range predicate as a post-join filter — the scalable
    path. Pure interval joins (no keys) fall back to broadcast-nested-loop;
    keep the interval side broadcast-sized or bucketize the range first.
    """
    # Qualified references: unqualified F.col throws AMBIGUOUS_REFERENCE the
    # moment the other side carries a same-named column (self-joins).
    pt, lo, hi = left[left_point], right[right_lo], right[right_hi]
    lo_cmp = pt >= lo if closed in ("both", "left") else pt > lo
    hi_cmp = pt <= hi if closed in ("both", "right") else pt < hi
    pred = lo_cmp & hi_cmp
    if on is None:
        return left.join(right, pred)
    if isinstance(on, Column):
        return left.join(right, on & pred)
    keys = [on] if isinstance(on, str) else list(on)
    key_pred = None
    for k in keys:
        this = left[k] == right[k]
        key_pred = this if key_pred is None else (key_pred & this)
    # Equi-join on keys with the range predicate folded into the condition:
    # Catalyst extracts the equi part for hash/sort-merge and applies the
    # range comparison as the join residual.
    return left.join(right, key_pred & pred)
