"""Partition-layout helpers for CPU-bound operators.

Spark's scan parallelism comes from input splits
(``spark.sql.files.maxPartitionBytes``): a 100 TB table arrives as
~800k partitions and needs no help. The pathological case is the other
end — a table packed into a handful of files (or one), where a
compute-heavy per-row transform (shingling + k minhashes, simhash bit
votes, vector math) runs on as many cores as there are files.

``spread`` fixes exactly that case and nothing else: it repartitions
only when the current partition count is below the cluster's default
parallelism, so at scale it is a no-op and on small/skewed-file inputs
it costs one narrow round-robin shuffle of the raw rows — always
cheaper than serializing the downstream transform onto a few cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``target`` (default: cluster
    parallelism) iff the input has fewer partitions than that. No-op on
    well-partitioned inputs, so safe to call unconditionally at the top
    of compute-heavy operators."""
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
