"""Scalar expression helpers: string normalization and CASE mappings.

Covers the reference's Python-side ``normalize_string`` helper
(utils/helpers.py:1-2: ``s.strip().lower()``) and the economic-indicator
CASE WHEN mapping (readme.md:368-372: series_id -> human-readable name),
both as Catalyst column expressions.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_string(c: Column | str) -> Column:
    """``lower(trim(c))`` — utils/helpers.py:1-2 as a column expression."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(col))


def case_map(c: Column | str, mapping: Mapping[str, str], default: Column | None = None) -> Column:
    """CASE WHEN c = k THEN v ... END value mapping (readme.md:368-372).

    ``default`` None -> ELSE NULL, matching an un-ELSE'd SQL CASE.
    For very large mappings prefer a broadcast join against a lookup
    DataFrame instead (same semantics, scales past expression-size limits).
    """
    col = F.col(c) if isinstance(c, str) else c
    expr: Column | None = None
    for k, v in mapping.items():
        expr = F.when(col == k, v) if expr is None else expr.when(col == k, v)
    if expr is None:
        return default if default is not None else F.lit(None).cast("string")
    return expr.otherwise(default) if default is not None else expr


# The reference's concrete indicator mapping (readme.md:368-372).
ECONOMIC_INDICATOR_NAMES = {
    "GDP": "Gross Domestic Product",
    "UNRATE": "Unemployment Rate",
    "CPIAUCSL": "Consumer Price Index",
    "FEDFUNDS": "Federal Funds Rate",
    "DGS10": "10-Year Treasury Rate",
}


def det_round(c: Column | str, n: int) -> Column:
    """Engine-independent display rounding of a DOUBLE to ``n``
    fractional digits: ``floor(x * 10^n + 0.5) / 10^n`` (half-up
    toward +inf), with NaN/NULL passed through.

    Native ``round(DOUBLE, n)`` is per-engine-divergent — Spark
    rounds the shortest decimal repr via BigDecimal HALF_UP while a
    libm-side round operates on the binary value, so doubles whose
    shortest repr shows a tie digit at position n+1 split between
    engines (4 of 4 driver-hash failures across rounds 7-8 were this
    class: bollinger, fifo, loan x2). Every op here — multiply by an
    exact power of ten, add 0.5, floor, divide — is IEEE-exact or
    correctly rounded with no libm and no decimal-repr dependence, so
    two engines evaluating this same textual formula on bit-identical
    inputs produce bit-identical outputs. :func:`det_round_sql` is
    the DuckDB twin; gate-window queries must use this pair instead
    of native round for any float output column.

    |x| >= 2^62 / 10^n passes through unchanged on BOTH engines:
    there a 10^-n quantum is already far below one ulp, so identity
    IS the correctly-rounded result, and it keeps Spark's
    floor()->BIGINT from clamping at Long.MAX where DuckDB's
    double-typed floor would not.
    """
    col = F.col(c) if isinstance(c, str) else c
    scale = F.lit(float(10**n))
    thr = F.lit(float(2**62) / float(10**n))
    passthrough = F.isnull(col) | F.isnan(col) | (F.abs(col) >= thr)
    return F.when(passthrough, col).otherwise(
        F.floor(col * scale + F.lit(0.5)) / scale
    )


def det_round_py(x: float | None, n: int) -> float | None:
    """Python-side twin of :func:`det_round` for per-key fold UDFs
    (EMA/Holt/stateful sessions): the same floor(x*10^n + 0.5)/10^n
    IEEE formula, so a Python-computed fold emission matches the
    det_round_sql oracle bit-for-bit. Built-in ``round`` is banker's
    rounding — a THIRD tie behavior that must not appear anywhere."""
    import math

    if x is None:
        return None
    x = float(x)
    if math.isnan(x) or abs(x) >= float(2**62) / float(10**n):
        return x
    scale = float(10**n)
    return math.floor(x * scale + 0.5) / scale


def det_round_sql(expr: str, n: int) -> str:
    """DuckDB-side twin of :func:`det_round`: the same textual IEEE
    formula, so both engines compute bit-identical rounded doubles.
    ``expr`` must be a DOUBLE-typed SQL expression."""
    scale = f"{float(10 ** n)!r}"
    thr = f"{float(2 ** 62) / float(10 ** n)!r}"
    return (
        f"(CASE WHEN isnan(CAST(({expr}) AS DOUBLE)) "
        f"OR abs(CAST(({expr}) AS DOUBLE)) >= {thr} THEN ({expr}) "
        f"ELSE floor(({expr}) * {scale} + 0.5) / {scale} END)"
    )


def det_micro(c: Column | str, n: int = 6) -> Column:
    """:func:`det_round` to ``n`` digits, then the SAME value as an
    exact BIGINT in 10^n-units ("micro" at the default n=6) — the
    integer-comparison form threshold sweeps use so that ``score >=
    t`` can never depend on a decimal literal's binary rounding.
    Twin: :func:`det_micro_sql`."""
    c = F.col(c) if isinstance(c, str) else c
    return F.floor(det_round(c, n) * float(10**n) + 0.5).cast("bigint")


def det_micro_sql(expr: str, n: int = 6) -> str:
    """DuckDB twin of :func:`det_micro`: identical textual formula
    over :func:`det_round_sql`, so both engines produce the same
    BIGINT micro-units from bit-identical inputs."""
    scale = f"{float(10 ** n)!r}"
    return (
        f"CAST(floor(({det_round_sql(expr, n)}) * {scale} + 0.5) AS BIGINT)"
    )


def seeded_uniform(c: Column | str, salt: str) -> Column:
    """Deterministic uniform in (0, 1) from md5(value || salt): the
    first 8 hex chars parsed as an integer, then (v + 0.5) / 16^8.
    Reproducible in any engine with md5 — the same trick the corpus
    split/sample operators use (md5_bucket), at 32-bit resolution.
    Never exactly 0 or 1, so log/inverse-CDF transforms are safe."""
    col = F.col(c) if isinstance(c, str) else c
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)).cast("binary"))
    v = F.conv(F.substring(h, 1, 8), 16, 10)
    return (v.cast("double") + F.lit(0.5)) / F.lit(float(16 ** 8))


def seeded_laplace(c: Column | str, salt: str, scale_b: float) -> Column:
    """Deterministic Laplace(0, b) noise via inverse-CDF of
    :func:`seeded_uniform`: -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|).
    Seeded noise makes a differential-privacy release REPRODUCIBLE
    (and therefore testable) — production would swap the md5 seed for
    a secret key; the mechanism and calibration are identical."""
    u = seeded_uniform(c, salt)
    centered = u - F.lit(0.5)
    return (
        -F.lit(scale_b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
