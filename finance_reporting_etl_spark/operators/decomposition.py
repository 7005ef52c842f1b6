"""Embedding decomposition: distributed PCA (covariance + projection).

The dimensionality-reduction step of an embedding pipeline (whitening,
visualization coordinates, IVF coarse quantizer preprocessing). The
split follows the standard large-scale recipe:

- **Moments are distributed**: each partition reduces its rows to one
  (count, sum[d], X'X[d*d]) partial via an Arrow-batched
  ``mapInPandas`` (BLAS matmul, zero shuffles), and only the partials
  — ``n_partitions x (1 + d + d^2)`` floats, d = 64 here — reach the
  driver. At 100 TB that is still kilobytes per partition: the classic
  bounded "model-parameter collect" class (PLANS.md), same shape as
  the k-means/IVF trainers in ``clustering.py``.
- **Eigendecomposition is driver-side** on the d x d covariance (LAPACK
  ``eigh``, microseconds for d = 64) with a deterministic sign
  convention: each eigenvector's largest-|value| element (lowest index
  on ties) is made positive, so reruns and engines agree on
  orientation.
- **Projection is declarative**: scores are ``dot(x - mean, axis)``
  via built-in ``zip_with``/``aggregate`` (JVM-side, sequential fold)
  — the exact float expression DuckDB's ``list_dot_product`` mirrors,
  which is what lets the oracle re-derive every score from the
  persisted components (the ``_persist_aux`` pattern: the fit is
  hash/partition-order sensitive, so the oracle shares its OUTPUT and
  independently recomputes everything downstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from finance_reporting_etl_spark.functions.scalars import det_round

from finance_reporting_etl_spark.functions.vectors import as_double_array, dot


def pca_fit(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 2,
) -> pd.DataFrame:
    """Fit PCA over an ``array<float>`` column; return a components
    table (comp_id, eigenvalue, explained_ratio, mean, axis) ready to
    persist for the oracle. Null and ragged vectors are dropped (the
    ``inference.py`` guard — ``np.stack`` would otherwise produce an
    object array and fail far from the cause).
    """
    schema = "n long, s array<double>, o array<double>"

    def partial(batches):
        n = 0
        s = np.zeros(dim)
        o = np.zeros((dim, dim))
        for pdf in batches:
            vecs = [
                v
                for v in pdf[vec_col].to_numpy()
                if v is not None and len(v) == dim
            ]
            if not vecs:
                continue
            m = np.stack(vecs).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            o += m.T @ m
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "o": [o.ravel().tolist()]}
        )

    # bounded collect: one (1 + d + d^2)-float row per partition
    parts = embeddings.select(vec_col).mapInPandas(partial, schema).toPandas()
    n = int(parts["n"].sum())
    if n < 2:
        raise ValueError(f"pca_fit needs >= 2 vectors, got {n}")
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    o = np.sum(np.stack(parts["o"].to_numpy()), axis=0).reshape(dim, dim)
    mu = s / n
    cov = (o - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    total_var = float(evals.sum())
    rows = []
    for rank, idx in enumerate(order):
        axis = evecs[:, idx].copy()
        # deterministic orientation: largest-|value| element positive
        pivot = int(np.argmax(np.abs(axis)))
        if axis[pivot] < 0:
            axis = -axis
        rows.append(
            {
                "comp_id": rank,
                "eigenvalue": float(evals[idx]),
                "explained_ratio": float(evals[idx] / total_var)
                if total_var > 0
                else 0.0,
                "mean": mu.tolist(),
                "axis": axis.tolist(),
            }
        )
    return pd.DataFrame(rows)


def pca_project(
    embeddings: DataFrame,
    components: DataFrame,
    id_cols: list[str],
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Melted projection scores: one row per (id, comp_id) with
    ``score = dot(x - mean, axis)`` rounded to ``scale``.

    The components side is a handful of rows and is broadcast — the
    embedding table streams map-side with NO shuffle; both engines
    evaluate the identical centered-dot-product expression tree
    (sequential left fold), so scores are bit-identical before the
    final round.
    """
    centered = F.zip_with(
        as_double_array(vec_col), F.col("mean"), lambda x, m: x - m
    )
    return (
        embeddings.join(F.broadcast(components))
        .select(
            *id_cols,
            "comp_id",
            det_round(F.col("eigenvalue"), scale).alias("eigenvalue"),
            det_round(F.col("explained_ratio"), scale).alias("explained_ratio"),
            det_round(dot(centered, F.col("axis")), scale).alias("score"),
        )
    )
