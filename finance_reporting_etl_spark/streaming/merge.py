"""Streaming incremental upsert via ``foreachBatch`` (§2.8 x O5).

``foreachBatch`` is the Structured Streaming escape hatch for sinks
Spark has no native connector for — each micro-batch arrives as a plain
DataFrame and arbitrary batch logic runs against it. Here that logic is
the engine's own ``merge_latest`` upsert, turning an event stream into
a continuously-maintained latest-row-per-key table.

Latest-per-key is an argmin over the total order (order_col DESC,
tiebreak ASC), which is associative — merging batch-by-batch reaches
the same fixpoint as one merge over the union, for ANY batch split.
That associativity is what the oracle checks.

Scale boundary (documented, deliberate): the demo target is a plain
parquet directory, so each batch rewrites the full table (materialized
via localCheckpoint before the overwrite — you cannot lazily read and
overwrite the same path). Production swaps the body for a transactional
MERGE INTO (Delta/Iceberg) or dynamic partition overwrite touching only
the partitions present in the batch; the streaming plumbing
(checkpointing, batch boundaries, exactly-once-per-batch) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from finance_reporting_etl_spark.operators.incremental import merge_latest


def streaming_merge_upsert(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    target_dir: str,
    keys: list[str],
    order_col: str,
    tiebreak_col: str | None = None,
    max_files_per_trigger: int = 1,
):
    """AvailableNow file stream -> foreachBatch merge_latest upsert into
    ``target_dir``. Returns the StreamingQuery; caller awaits
    termination then reads the target parquet."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        try:
            existing = sess.read.parquet(target_dir)
        except Exception:  # first batch: no target yet
            existing = None
        combined = (
            batch_df if existing is None else existing.unionByName(batch_df)
        )
        merged = merge_latest(combined, keys, order_col, tiebreak_col)
        # materialize BEFORE overwriting the directory we just read
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
