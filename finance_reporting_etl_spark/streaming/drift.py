"""Continuous drift monitoring: per-micro-batch bin-count folding.

The comparison period arrives as a live stream; each micro-batch
contributes its per-bin counts through ``foreachBatch`` (counts are
additive — the mergeable-sketch property with a 10-cell 'sketch'),
and the PSI table downstream reads identically to the one-shot batch
computation. foreachBatch is at-least-once, so each batch OVERWRITES
its own ``batch_id=...`` partition of the sink — a retried
micro-batch replaces rather than double-counts (ADVICE r4).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def streaming_bin_count_fold(
    spark,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    sink_dir: str,
    bin_expr,
    max_files_per_trigger: int = 1,
):
    """Start an AvailableNow stream that folds each micro-batch's
    per-bin counts (column ``n``) into a batch_id-partitioned parquet
    sink. Read the sink with ``groupBy(bin).sum(n)`` to merge."""

    def fold_bins(batch, batch_id):
        (
            batch.select(bin_expr)
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .write.mode("overwrite")
            .parquet(f"{sink_dir}/batch_id={batch_id}")
        )

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
        .writeStream.foreachBatch(fold_bins)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
