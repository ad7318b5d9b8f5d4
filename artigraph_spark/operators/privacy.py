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
