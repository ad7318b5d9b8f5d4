"""Grouped-map (applyInPandas) operators — the UDTF-style escape hatch for
per-group imperative logic that genuinely can't be a window/agg expression.

Kept rare by design (UDFs are the slow path); the one shipped here computes
per-group ordered deltas so tests can prove EXACT parity with the
window-function formulation — i.e. the escape hatch is semantically safe to
swap in when a future operator needs real imperative code (model scoring,
complex sequence features).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def grouped_ordered_delta(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    *,
    out_delta: str = "delta",
    out_ordinal: str = "ordinal",
) -> DataFrame:
    """Per group (ordered by ``order``): row ordinal and difference from the
    previous row's value. Arrow-batched grouped map; one shuffle on the key
    (same cost as the window equivalent); per-row float subtraction is
    deterministic, so results exactly match the lag() formulation.
    """
    schema_fields = [df.schema[c] for c in df.columns]
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema_fields)
        + f", {out_ordinal} int, {out_delta} double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        pdf[out_ordinal] = range(1, len(pdf) + 1)
        pdf[out_delta] = pdf[value] - pdf[value].shift(1)
        return pdf

    return df.groupBy(key).applyInPandas(fn, out_schema)
