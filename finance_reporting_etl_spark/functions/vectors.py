"""Vector (embedding) column expressions.

Cosine/dot/norm over ``array<float>`` columns using built-in
higher-order functions (``zip_with`` + ``aggregate``) — JVM-side,
no Python round-trip, and exactly mirrored by DuckDB's
``list_dot_product`` for oracle parity. Elements are cast to double
first so both engines accumulate in float64.

For 100 TB-scale similarity search see ``operators/similarity.py``:
brute-force top-k is the correctness baseline; hyperplane-LSH
bucketing is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double_array(v: Column | str) -> Column:
    return F.transform(_c(v), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sum over elementwise products, accumulated in float64."""
    prods = F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity with zero-norm guard (NULL when either is 0)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
