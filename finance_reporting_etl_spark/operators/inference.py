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
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        w = linear_scorer_weights(mat.shape[1])
        logits = mat @ w
        return pd.Series(np.round(1.0 / (1.0 + np.exp(-logits)), scale))

    return df.withColumn(out_col, _score(F.col(vec_col)))
