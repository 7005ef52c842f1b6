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
