"""Arrow-batched model inference over embedding columns.

The quality-classifier / reward-model scoring stage of a training-data
pipeline: a model maps each document's embedding to a scalar score, and
the corpus is filtered or reweighted on it. At 100 TB the only viable
shape is batched columnar inference — vectors cross the JVM/Python
boundary as Arrow record batches, the model runs once per batch as a
matrix op (BLAS locally, an accelerator in production), and nothing
ever iterates per row.

``linear_scorer_weights`` defines a deterministic stand-in model (a
fixed linear probe + sigmoid) so the whole path carries a DuckDB
oracle; a real deployment swaps ``score_embeddings``'s closure for an
ONNX/torch session loaded once per executor — the Spark plumbing
(Arrow batching, closure shipping, schema) is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from finance_reporting_etl_spark.functions.scalars import det_round
from pyspark.sql.types import DoubleType


def linear_scorer_weights(dim: int) -> np.ndarray:
    """Deterministic probe weights: w_j = ((j mod 7) - 3) / 10 — a pure
    index formula both engines can re-derive (no RNG, no state)."""
    return (np.arange(dim) % 7 - 3) / 10.0


def score_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "score",
    scale: int = 6,
) -> DataFrame:
    """sigmoid(w . v) per row, computed one matrix product per Arrow
    batch. Map-side only: no shuffle, scales with scan bandwidth."""

    @F.pandas_udf(DoubleType())
    def _score(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="float64")
        # null/ragged rows score null instead of blowing up np.stack for
        # the whole batch (ADVICE r3): stack only the well-formed rows.
        arrs = [np.asarray(v, dtype=np.float64) for v in vecs]
        dim = next((a.shape[0] for a in arrs if a.ndim == 1 and a.shape[0] > 0), 0)
        if dim == 0:
            return pd.Series([np.nan] * len(arrs), dtype="float64")
        ok = np.array([a.ndim == 1 and a.shape[0] == dim for a in arrs])
        out = np.full(len(arrs), np.nan)
        if ok.any():
            mat = np.stack([a for a, k in zip(arrs, ok) if k])
            w = linear_scorer_weights(dim)
            out[ok] = np.round(1.0 / (1.0 + np.exp(-(mat @ w))), scale)
        return pd.Series(out)

    return df.withColumn(out_col, _score(F.col(vec_col)))


def embedding_outlier_flags(
    emb: DataFrame,
    dim: int,
    persist_stats=None,
    sigmas: float = 2.0,
) -> DataFrame:
    """Flag embeddings far from the corpus centroid (dist > mu +
    ``sigmas``*sigma) — the cheap first-pass filter for corrupt /
    out-of-domain vectors before they poison ANN indexes or dedup.

    ``emb`` carries (vec_id, vd: array<double>). The centroid and the
    distance-distribution scalars (mu, sigma) involve float sums whose
    order Spark does not pin; pass ``persist_stats`` (a callable
    receiving a 1-row (cen, mu, sigma) DataFrame) to persist them for
    an external oracle to re-derive distances from. Map-side only
    after the two scalar aggregates; no shuffle touches data-sized
    rows. Returns (vec_id, dist, is_outlier)."""
    cen_row = emb.select(
        F.array(*[F.avg(F.element_at("vd", i + 1)) for i in range(dim)]).alias("cen")
    ).head()
    cen = [float(c) for c in cen_row["cen"]]
    cen_col = F.array(*[F.lit(c) for c in cen])
    diff_sq = F.transform(
        F.sequence(F.lit(1), F.size("vd")),
        lambda i: (F.element_at("vd", i) - F.element_at(cen_col, i))
        * (F.element_at("vd", i) - F.element_at(cen_col, i)),
    )
    dist = F.sqrt(F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x))
    dists = emb.select("vec_id", dist.alias("dist"))
    stats = dists.agg(
        F.avg("dist").alias("mu"), F.stddev_samp("dist").alias("sigma")
    ).head()
    mu, sigma = float(stats["mu"]), float(stats["sigma"])
    if persist_stats is not None:
        persist_stats(
            emb.sparkSession.createDataFrame(
                [(cen, mu, sigma)], "cen array<double>, mu double, sigma double"
            )
        )
    return dists.select(
        "vec_id",
        det_round("dist", 6).alias("dist"),
        (F.col("dist") > F.lit(mu) + sigmas * F.lit(sigma)).alias("is_outlier"),
    )
