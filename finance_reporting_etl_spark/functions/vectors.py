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

import numpy as np
import pandas as pd
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


def cosine_arrow():
    """Arrow-batched cosine for HIGH-VOLUME pair scoring (returns a
    pandas_udf(double)). The Catalyst ``cosine`` above runs three
    interpreted array passes per row (dot + two norms) — fine for
    oracle-sized inputs, ~10x too slow for millions of LSH candidate
    pairs. Zero-norm pairs -> SQL NULL via pandas' nullable Float64
    (a float NaN would NOT become NULL: Spark sorts NaN ABOVE every
    number, so a zero vector would outrank every true neighbor and
    pass >= threshold filters — r5 review), matching the Catalyst
    twin's nullif guard exactly.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = num / den
        out = pd.array(vals, dtype="Float64")
        out[den == 0.0] = pd.NA
        return pd.Series(out, dtype="Float64")

    return cos


def cosine_arrow_foldexact():
    """Arrow-batched cosine that is BIT-IDENTICAL to the Catalyst
    ``cosine`` above (returns a pandas_udf(double)).

    ``cosine_arrow`` sums via einsum/BLAS — pairwise/SIMD accumulation
    whose float64 result can differ from the sequential left fold by
    ~1 ulp, enough to flip an integer-micro threshold at a rounding
    boundary. This variant accumulates dot and both squared norms as
    an EXPLICIT loop over dimensions (sequential in i, vectorized over
    rows), so every partial sum is the same IEEE add in the same order
    as ``F.aggregate``'s left fold AND DuckDB's ``list_dot_product`` —
    vectorized speed with oracle-exact semantics. Use it wherever a
    high-volume pair scoring feeds an exact-compare oracle; plain
    ``cosine_arrow`` remains for score rankings that are persisted or
    re-derived from Spark's own output."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        n = ma.shape[0]
        acc = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for i in range(ma.shape[1]):
            acc = acc + ma[:, i] * mb[:, i]
            na = na + ma[:, i] * ma[:, i]
            nb = nb + mb[:, i] * mb[:, i]
        den = np.sqrt(na) * np.sqrt(nb)
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = acc / den
        out = pd.array(vals, dtype="Float64")
        out[den == 0.0] = pd.NA
        return pd.Series(out, dtype="Float64")

    return cos
