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
