"""Incremental loading: append + merge-on-key (SURVEY §2.10 O5).

The reference gestures at incremental loading for scale-up
(README.md:558) without implementing it. Design here: daily batches
append to a date-partitioned table; consumers read through
``merge_latest`` which collapses to the newest version per business key
— the MERGE-less pattern that works on plain Parquet at any scale
(partition-pruned reads + one window per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_latest(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep the latest row per key: row_number over (keys) ordered by
    order_col DESC (tiebreak ASC keeps the result deterministic)."""
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def append_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "append",
) -> None:
    """Partition-wise append — the hypertable-style write
    (README.md:268 create_hypertable ≙ partitionBy on the time column)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def retain(df: DataFrame, ts_col: str, horizon) -> DataFrame:
    """S12 retention window: rows at or after ``horizon``.

    The reference manages retention with an S3 lifecycle policy
    (readme.md:398-427: raw data kept 90 days, then tiered out); the
    engine-side analog is this filter for reads plus
    ``drop_expired_partitions`` for storage. The predicate pushes to the
    parquet scan, and on a time-partitioned table it prunes whole
    partitions before any file is opened.
    """
    return df.filter(F.col(ts_col) >= F.lit(horizon))


def drop_expired_partitions(
    spark, path: str, partition_col: str, horizon_value: str
) -> list[str]:
    """Partition-drop compaction for a ``partitionBy(partition_col)``
    parquet table: delete every ``col=value`` directory with
    ``value < horizon_value`` (lexicographic — correct for ISO dates and
    zero-padded keys). No data rewrite: expiry is O(#partitions) metadata
    ops, the same shape as TimescaleDB's drop_chunks / the S3 lifecycle
    rule. Uses Spark's Hadoop FileSystem so it works on HDFS/S3A paths
    as well as local ones. Returns the dropped partition values.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    prefix = f"{partition_col}="
    dropped: list[str] = []
    if not fs.exists(p):
        return dropped
    for status in fs.listStatus(p):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        if not name.startswith(prefix):
            continue
        value = name[len(prefix):]
        if value < horizon_value:
            fs.delete(status.getPath(), True)
            dropped.append(value)
    return dropped


def upsert_parquet(
    spark,
    existing_path: str,
    incoming: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Read-merge view over existing + incoming (no rewrite): union by
    name then latest-per-key. For true compaction, write the result back
    partition-by-partition during low-traffic windows."""
    existing = spark.read.parquet(existing_path)
    merged = existing.unionByName(incoming, allowMissingColumns=True)
    return merge_latest(merged, keys, order_col, tiebreak_col)
