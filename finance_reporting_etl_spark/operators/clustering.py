"""K-means clustering over an embedding column (Lloyd's algorithm).

The missing piece between the IVF index (data-independent random cells,
`similarity.py`) and a real trained vector index: k-means centroids are
what production IVF / product-quantization indexes train on, and
cluster ids double as corpus topic buckets for mixture balancing.

Spark-first shape per iteration:
  1. assignment — Arrow-batched pandas UDF; the (k x dim) centroid
     matrix rides the UDF closure (it is tiny), each Arrow batch does
     one BLAS matmul and an argmin. Map-side only, no shuffle.
  2. update — posexplode(embedding) -> groupBy(cluster, dim) -> avg.
     One shuffle whose key space is k x dim rows regardless of input
     size (partial aggregation does the heavy lifting map-side), then a
     k x dim collect to the driver — collecting an *aggregate*, not
     data, so the driver never sees O(n).

At 100 TB the standard refinement is to run update on a deterministic
sample for the first iterations and full data for the last — the loop
below takes any DataFrame, so callers do that by passing a
`hash_split`-style sample.

Determinism: init takes the k lowest-id vectors (engine-independent),
iteration count is fixed (no data-dependent convergence test), and
centroids are rounded to 6 decimals after each update so ulp-level
shuffle-order noise in the float sums cannot flip a later assignment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from finance_reporting_etl_spark.functions.scalars import det_round

__all__ = ["kmeans", "cluster_profile"]


def _assign_expr(vec_col: str, cents: np.ndarray):
    """pandas UDF: nearest-centroid id via |x-c|^2 = |x|^2 - 2x.c + |c|^2
    (the |x|^2 term is constant per row and dropped). Ties break to the
    lowest cluster id (np.argmin)."""
    c64 = cents.astype(np.float64)
    c_norms = (c64 * c64).sum(axis=1)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        d = c_norms[None, :] - 2.0 * (m @ c64.T)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign(F.col(vec_col))


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 10,
) -> tuple[DataFrame, np.ndarray]:
    """Lloyd's k-means; returns (assignments, centroids).

    assignments: (id_col, cluster int) — each row's nearest centroid
    after the final update; centroids: the (k, dim) float64 matrix from
    that update (empty clusters keep their previous centroid). Cluster
    statistics derived from the assignment (member means, distances) are
    exactly recomputable in ANSI SQL — see ``cluster_profile``.
    """
    init_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    cents = np.round(
        np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in init_rows]), 6
    )

    assigned = None
    for _ in range(iters):
        assigned = df.select(
            F.col(id_col), F.col(vec_col), _assign_expr(vec_col, cents).alias("cluster")
        )
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_cents = cents.copy()
        by_cluster: dict[int, list[tuple[int, float]]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], []).append((r["pos"], r["m"]))
        for cl, dims in by_cluster.items():
            for pos, m in dims:
                new_cents[cl, pos] = m
        new_cents = np.round(new_cents, 6)
        converged = (new_cents == cents).all()
        cents = new_cents
        if converged:
            # exact fixpoint of the rounded update: every further
            # iteration would reproduce these centroids bit-for-bit, so
            # the final assignment is already the iters-step answer
            break

    final = df.select(
        F.col(id_col), _assign_expr(vec_col, cents).alias("cluster")
    )
    return final, cents


def cluster_profile(
    df: DataFrame,
    assignments: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster profile from (data, assignments):
    (cluster, n_members, centroid_norm, avg_dist) where centroid is the
    member mean and avg_dist the mean Euclidean distance to it — all
    derivable in ANSI SQL from the persisted assignment table, which is
    what puts the k-means result on the full oracle gate.

    The member-mean centroid is recomputed here (not taken from
    ``kmeans``) so both engines derive it from the same persisted
    assignment in double precision. Shuffles are k x dim-bounded after
    map-side partial aggregation; the centroid rejoin broadcasts
    k x dim rows.
    """
    joined = df.join(assignments, id_col).select(
        id_col,
        "cluster",
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
    )
    cent = joined.groupBy("cluster", "pos").agg(F.avg("x").alias("m"))
    sq = (
        joined.join(F.broadcast(cent), ["cluster", "pos"])
        .groupBy(id_col, "cluster")
        .agg(F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("sq"))
    )
    per_cluster = sq.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        det_round(F.avg(F.sqrt("sq")), 4).alias("avg_dist"),
    )
    norms = cent.groupBy("cluster").agg(
        det_round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 4).alias("centroid_norm")
    )
    return per_cluster.join(norms, "cluster").select(
        "cluster", "n_members", "centroid_norm", "avg_dist"
    )
