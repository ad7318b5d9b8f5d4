"""Privacy / re-identification audits over quasi-identifier columns.

Before a corpus ships (or a table is shared across teams), the
governance question is "can a row be re-identified from the
quasi-identifiers?" — the standard audits are k-anonymity (every
equivalence class of QI values must contain ≥ k rows) and l-diversity
(every class must contain ≥ l distinct values of the sensitive column,
so membership in a small class doesn't leak the sensitive value).

Both are single grouped aggregations over the QI columns — map-side
combined, one keyed exchange, output sized by the number of violating
classes rather than rows. That shape is exactly what survives 100 TB:
the data is touched once, the report is classes-sized, and the QI
grouping key is the only shuffle. l-diversity's COUNT(DISTINCT) adds
Spark's expand+two-phase distinct partial aggregation but still one
logical pass.

NULL semantics: a NULL quasi-identifier value forms its own equivalence
class (GROUP BY keeps NULL groups — identical in Spark and DuckDB);
NULL sensitive values are excluded from the distinct count (both
engines' COUNT(DISTINCT) drops NULLs).

Reference parity: the reference frames governance checks as producer-
side validation (src/arti/statistics + threshold gates); these audits
are the privacy members of that family, expressed relationally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def k_anonymity(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int,
    *,
    violating_only: bool = True,
) -> DataFrame:
    """Equivalence-class size audit: group rows by the quasi-identifier
    columns and report classes smaller than ``k`` (the re-identifiable
    ones). ``violating_only=False`` returns every class — useful for
    picking a generalization level, but the output is then
    QI-cardinality-sized; the default report stays violation-sized.

    Returns ``(*qi_cols, class_n)``.
    """
    if not qi_cols:
        raise ValueError("k_anonymity needs at least one quasi-identifier column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("class_n"))
    if violating_only:
        classes = classes.filter(F.col("class_n") < k)
    return classes


def l_diversity(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    l_min: int,
    *,
    violating_only: bool = True,
) -> DataFrame:
    """Sensitive-value diversity audit: for each quasi-identifier
    equivalence class, count rows and distinct non-NULL values of
    ``sensitive_col``; report classes with fewer than ``l_min`` distinct
    sensitive values (the ones where class membership leaks the
    sensitive attribute even when k-anonymity holds).

    Returns ``(*qi_cols, class_n, n_sensitive)``.
    """
    if not qi_cols:
        raise ValueError("l_diversity needs at least one quasi-identifier column")
    if l_min < 1:
        raise ValueError(f"l_min must be >= 1, got {l_min}")
    classes = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_n"),
        F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
    )
    if violating_only:
        classes = classes.filter(F.col("n_sensitive") < l_min)
    return classes


def t_closeness(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007): for each
    quasi-identifier equivalence class, the earth-mover's distance
    between the class's sensitive-value distribution and the global one
    over the ordered value domain — the member of the privacy trio that
    catches what l-diversity misses (a class can hold l distinct values
    whose MIX still reveals the sensitive attribute). Classes with
    EMD > t leak; the caller picks t (0.15-0.2 is the paper's range).

    Ordered EMD = (1/(m−1)) Σ_i |Σ_{j≤i} (p_j − q_j)| over the m
    sensitive values in their sort order. Exactness: every term is kept
    in scaled integer form — ``r_scaled = C_cv·N − G_v·N_c`` (class
    count × global total minus global count × class total), widened to
    DECIMAL(38,0) so the products survive any row count — and the final
    division to a guard-grid double happens once per class, so the
    report replays identically cross-engine. NULL sensitive values are
    excluded; m = 1 (a single global value) yields EMD 0 by definition.

    Scale shape: one (QI, value) count shuffle, two summary aggregates,
    a classes × m broadcast spine (m = sensitive cardinality — the
    audit presumes an enumerable sensitive domain), and a per-class
    window over the spine. Row data crosses exactly one exchange.

    Returns ``(*qi_cols, class_n, emd_r)`` for every class.
    """
    if not qi_cols:
        raise ValueError("t_closeness needs at least one quasi-identifier column")
    from pyspark.sql import Window

    base = df.filter(F.col(sensitive_col).isNotNull())
    cells = base.groupBy(*qi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    classes = cells.groupBy(*qi_cols).agg(F.sum("__c").alias("__nc"))
    glob = cells.groupBy(sensitive_col).agg(F.sum("__c").alias("__g"))
    tot = glob.agg(
        F.sum("__g").alias("__n"), F.count(F.lit(1)).alias("__m")
    )
    spine = classes.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(tot))
    dense = spine.join(cells, [*qi_cols, sensitive_col], "left").select(
        *qi_cols,
        sensitive_col,
        "__nc",
        "__n",
        "__m",
        (
            F.coalesce(F.col("__c"), F.lit(0)).cast("decimal(38,0)")
            * F.col("__n").cast("decimal(38,0)")
            - F.col("__g").cast("decimal(38,0)")
            * F.col("__nc").cast("decimal(38,0)")
        ).alias("__r"),
    )
    w = (
        Window.partitionBy(*qi_cols)
        .orderBy(sensitive_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.withColumn("__cum", F.sum("__r").over(w))
    return (
        cum.groupBy(*qi_cols)
        .agg(
            F.first("__nc").alias("class_n"),
            F.first("__n").alias("__n"),
            F.first("__m").alias("__m"),
            F.sum(F.abs(F.col("__cum"))).alias("__emd_scaled"),
        )
        .select(
            *qi_cols,
            F.col("class_n").cast("long").alias("class_n"),
            F.when(F.col("__m") > 1,
                F.round(
                    F.col("__emd_scaled").cast("double")
                    / (
                        F.col("class_n").cast("double")
                        * F.col("__n").cast("double")
                        * (F.col("__m") - 1).cast("double")
                    ),
                    9,
                ),
            ).otherwise(F.lit(0.0)).alias("emd_r"),
        )
    )


def pseudo_dp_noisy_counts(
    df: DataFrame,
    cat_col: str,
    *,
    epsilon: float = 1.0,
    seed: int = 0,
    sensitivity: float = 1.0,
) -> DataFrame:
    """DP-STYLE (not ε-DP) noisy category counts: Laplace-shaped,
    deterministically derandomized noise added to a histogram.

    **No formal differential-privacy guarantee holds.** Two properties
    break the ε-DP inequality, stated plainly: (1) the noise draw is a
    pure function of the category name and ``seed`` — independent of the
    data — so it is DETERMINISTIC, and a deterministic mechanism cannot
    be ε-DP for any finite ε (neighboring datasets map to disjoint
    outputs); (2) the noise magnitude is BOUNDED at ``b·ln(p) ≈ 21.5·b``
    (a true Laplace tail is unbounded), so counts farther apart than the
    bound are perfectly distinguishable. What this operator gives you is
    the *replayable obfuscation* half of a DP release pipeline: noise of
    the right shape (inverse-CDF Laplace(sensitivity/ε)) whose draw
    replays exactly run-to-run and engine-to-engine, so re-running a job
    republishes the SAME noisy view instead of a second independent one
    (which, in a real DP deployment, would compose budgets). Treat the
    output as masked, not private: an adversary knowing the category
    names and seed can subtract the noise exactly. For a real ε-DP
    release, draw the noise from a secret entropy source at publication
    time — outside this engine's deterministic contract by construction.

    Mechanics: per category,
    ``u = (mix(content_key(cat), seed) + 0.5) / p`` — a deterministic
    uniform in (0,1) from the repo's cross-engine 60-bit content key and
    the sample_deterministic multiplicative mix — pushed through the
    Laplace inverse CDF ``−b·sign(u−½)·ln(1−2|u−½|)``; the +0.5 keeps u
    strictly inside (0,1) so ln's argument is never 0. The ln is snapped
    to the 9-decimal guard grid (the repo's ln convention) so both
    engines agree bit-for-bit.

    Scale shape: one map-side-combined groupBy; noise is a per-GROUP
    projection over the summary-sized result — zero extra shuffles.

    Returns ``(cat, n, noise_r, noisy_n_r)`` — ``n`` is the exact count;
    ``noisy_n_r`` is the masked value.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    if sensitivity <= 0:
        raise ValueError(f"sensitivity must be positive, got {sensitivity}")
    from artigraph_spark.operators.dedup import content_key

    p = 1000000007
    b = sensitivity / epsilon
    counts = (
        df.filter(F.col(cat_col).isNotNull())
        .groupBy(cat_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    h = (
        (content_key(F.col(cat_col)) % p) * 2654435761 + F.lit(seed) * 40503
    ) % p
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(p))
    centered = u - F.lit(0.5)
    noise = F.round(
        F.lit(-b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered)),
        9,
    )
    return counts.select(
        F.col(cat_col),
        "n",
        noise.alias("noise_r"),
        (F.col("n").cast("double") + noise).alias("noisy_n_r"),
    )


def dp_noisy_counts(*args, **kwargs) -> DataFrame:
    """Deprecated name for :func:`pseudo_dp_noisy_counts`.

    The old name overstated the guarantee — the mechanism is
    deterministic and bounded, so no formal ε-DP inequality holds (see
    the renamed function's docstring for the full statement). Kept as a
    warning alias so existing pipelines keep running while the callsite
    is updated."""
    import warnings

    warnings.warn(
        "dp_noisy_counts is renamed pseudo_dp_noisy_counts: the noise is "
        "deterministic and bounded, so no formal epsilon-DP guarantee "
        "holds — the output is masked, not private.",
        DeprecationWarning,
        stacklevel=2,
    )
    return pseudo_dp_noisy_counts(*args, **kwargs)
