"""Deterministic, oracle-comparable aggregation helpers.

Parallel floating-point summation is order-dependent: Spark's partial
aggregation and DuckDB's vectorized aggregation associate additions
differently, so ``sum(double)`` differs in low-order bits between engines
(and between runs at different partition counts). Worse, double→DECIMAL
casts are themselves engine-specific (DuckDB's is not exactly rounded —
measured ~0.4% of values off by 1 ulp at scale 9), so decimal-sums don't
match either.

The engine's deterministic aggregates therefore use **fixed-point
power-of-two scaling**: ``floor(x · 2^k)`` — the multiply is an exponent
shift (exact in IEEE double), floor is exact, the integer sum is exact and
associative, and the final ``/ 2^k`` is again exact. Every step is
bit-identical on any IEEE-754 engine, at any partition count, at any
cluster size — which is precisely what a reproducible 100 TB pipeline
needs. Quantization is 2^-k per row (k=20 → ~1e-6), a deliberate, documented
semantic (like DuckDB's own fsum/Kahan tradeoffs, but reproducible).

All helpers are thin Column builders — they stay inside Catalyst/whole-stage
codegen; no UDFs. Integer-sum overflow bound: |x|·2^k·rows < 2^63 — for
k=20 that allows ~8.8e12 row-units (e.g. 60M rows of |x|≤1e5 per *task*
partial); raise to HUGEINT-backed oracle + DecimalType sums if a deployment
exceeds it (see ``dsum_wide``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_BITS = 20


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fxp(col: Column | str, bits: int = DEFAULT_BITS) -> Column:
    """Fixed-point representation: floor(x · 2^bits) as long."""
    return F.floor(_c(col) * F.lit(float(1 << bits))).cast("long")


def dsum(col: Column | str, bits: int = DEFAULT_BITS) -> Column:
    """Order-independent (fixed-point) sum of a double column, as double."""
    return (F.sum(fxp(col, bits)).cast("double") / F.lit(float(1 << bits))).cast("double")


def dsum_safe(col: Column | str, bits: int = DEFAULT_BITS) -> Column:
    """dsum skipping NULL/NaN values: floor(NaN) aborts the job under ANSI
    and errors DuckDB's cast, so guard the VALUE (counts stay whole-row —
    use this where n counts rows but the sum must survive dirty values)."""
    c = _c(col)
    return dsum(F.when(c.isNotNull() & ~F.isnan(c), c), bits)


def oracle_dsum_safe(expr: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB twin of dsum_safe (FILTER-guarded fixed-point sum)."""
    return oracle_dsum_filter(expr, f"{expr} IS NOT NULL AND NOT isnan({expr})", bits)


def dsum_wide(col: Column | str, bits: int = DEFAULT_BITS) -> Column:
    """Overflow-safe variant: the int64 partials are summed as DECIMAL(38,0)
    (exact, associative — integer decimals don't hit the float-cast issue).
    Use when rows·|x|·2^bits may exceed 2^63 at full scale."""
    return (
        F.sum(fxp(col, bits).cast("decimal(38,0)")).cast("double") / F.lit(float(1 << bits))
    ).cast("double")


def davg(col: Column | str, bits: int = DEFAULT_BITS) -> Column:
    """Order-independent mean, as double."""
    return (dsum(col, bits) / F.count(_c(col))).cast("double")


def dvar_samp(col: Column | str) -> Column:
    """Order-independent sample variance: (Σx² − (Σx)²/n) / (n−1), with
    fixed-point moment sums (x at 2^-20, x² at 2^-10 to bound overflow).

    Deterministic and engine-identical; the textbook formula's cancellation
    is acceptable for threshold checks — use ``F.var_samp`` when numerical
    quality beats reproducibility.
    """
    c = _c(col)
    n = F.count(c).cast("double")
    sx = dsum(c, 20)
    sx2 = dsum(c * c, 10)
    # NULL for n <= 1, matching F.var_samp (ANSI mode raises on 0-division).
    return F.when(n > 1, (sx2 - sx * sx / n) / (n - F.lit(1.0)))


def dstddev_samp(col: Column | str) -> Column:
    return F.sqrt(dvar_samp(col))


# --- DuckDB oracle fragments (bit-identical to the helpers above) ---


def oracle_fxp(expr: str, bits: int = DEFAULT_BITS) -> str:
    return f"CAST(floor(({expr}) * {float(1 << bits)!r}) AS BIGINT)"


def oracle_dsum(expr: str, bits: int = DEFAULT_BITS) -> str:
    return f"(CAST(SUM({oracle_fxp(expr, bits)}) AS DOUBLE) / {float(1 << bits)!r})"


def oracle_dsum_filter(expr: str, cond: str, bits: int = DEFAULT_BITS) -> str:
    return (
        f"(CAST(SUM({oracle_fxp(expr, bits)}) FILTER (WHERE {cond}) AS DOUBLE)"
        f" / {float(1 << bits)!r})"
    )


def oracle_davg(expr: str, bits: int = DEFAULT_BITS) -> str:
    return f"CAST({oracle_dsum(expr, bits)} / COUNT({expr}) AS DOUBLE)"


def oracle_dvar_samp(expr: str) -> str:
    sx = oracle_dsum(expr, 20)
    sx2 = oracle_dsum(f"({expr}) * ({expr})", 10)
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return (
        f"CASE WHEN {n} > 1 THEN "
        f"(({sx2}) - ({sx}) * ({sx}) / ({n})) / (({n}) - 1.0) ELSE NULL END"
    )


def oracle_dstddev_samp(expr: str) -> str:
    return f"SQRT({oracle_dvar_samp(expr)})"


def zorder_key(a, b, bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` bits of two
    non-negative integral columns — ``a``'s bit i lands at position 2i,
    ``b``'s at 2i+1. Rows sorted (or range-partitioned) by this key
    cluster multi-dimensionally, so min/max file statistics prune scans
    on EITHER column — the lakehouse layout trick (Delta/Iceberg
    OPTIMIZE ZORDER) expressed as a plain deterministic int64 column:
    ``df.repartitionByRange(N, zkey).sortWithinPartitions(zkey)`` before
    the write.

    Pure integer shifts/masks (2·bits ≤ 62 keeps everything in int64),
    identical arithmetic in any engine — a DuckDB oracle replays keys
    bit-for-bit. Values ≥ 2^bits fold (only their low bits interleave);
    pick ``bits`` to cover the column domains.
    """
    from pyspark.sql import functions as F

    if not 0 < bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(
                F.shiftrightunsigned(a.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i,
            )
        )
        terms.append(
            F.shiftleft(
                F.shiftrightunsigned(b.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


# --- Normal CDF (Abramowitz & Stegun 7.1.26 erf polynomial) ---
#
# Neither Spark nor DuckDB ships erf, so p-values ride an explicit
# polynomial both engines evaluate with the SAME sequence of IEEE-754
# double operations: t = 1/(1 + p·x), erf ≈ 1 − (((((a5·t + a4)·t + a3)·t
# + a2)·t + a1)·t)·exp(−x²), |error| ≤ 1.5e-7 — more than enough for
# audit-grade p-values. exp() is the one libm call; like the repo's ln
# convention, the FINAL CDF is snapped to the 9-decimal guard grid, so a
# sub-ulp libm disagreement cannot surface (and p-values below 1e-9
# round to 0, which any multiple-testing consumer treats identically).
_PHI_P = 0.3275911
_PHI_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def phi_approx(z: Column | str) -> Column:
    """Standard normal CDF Φ(z), deterministic across engines, rounded
    to the 9-decimal guard grid. Φ(z) = (1 + sign(z)·erf(|z|/√2)) / 2."""
    zc = _c(z).cast("double")
    x = F.abs(zc) / F.lit(math.sqrt(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_PHI_P) * x)
    a1, a2, a3, a4, a5 = _PHI_A
    poly = (
        (((F.lit(a5) * t + F.lit(a4)) * t + F.lit(a3)) * t + F.lit(a2)) * t
        + F.lit(a1)
    ) * t
    erf = F.lit(1.0) - poly * F.exp(-(x * x))
    return F.round((F.lit(1.0) + F.signum(zc) * erf) / F.lit(2.0), 9)


def oracle_phi(expr: str) -> str:
    """DuckDB twin of :func:`phi_approx` — identical op order."""
    a1, a2, a3, a4, a5 = _PHI_A
    x = f"(abs({expr}) / {math.sqrt(2.0)!r})"
    t = f"(1.0 / (1.0 + {_PHI_P!r} * {x}))"
    poly = (
        f"((((({a5!r} * {t} + {a4!r}) * {t} + {a3!r}) * {t} + {a2!r}) * {t} "
        f"+ {a1!r}) * {t})"
    )
    erf = f"(1.0 - {poly} * exp(-({x} * {x})))"
    return f"round((1.0 + sign({expr}) * {erf}) / 2.0, 9)"
