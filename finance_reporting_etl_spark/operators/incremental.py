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
