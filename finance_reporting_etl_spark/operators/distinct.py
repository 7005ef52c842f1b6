"""Mergeable distinct-count rollups (SURVEY §2 A-tier extension; 100 TB
pattern: pre-aggregate once, re-aggregate forever).

``COUNT(DISTINCT)`` at 100 TB is a full shuffle of every distinct key per
query, and a day->month rollup of counts is simply wrong (distincts are
not additive). Both operators here build a REUSABLE per-(day, group)
sketch table — one raw scan, ever — whose rows merge associatively to any
coarser grain (month, quarter, all-time) without touching raw data again:

- :func:`bitmap_daily` / :func:`bitmap_rollup` — EXACT distinct via
  Spark's bitmap aggregates (``bitmap_construct_agg`` over
  ``bitmap_bucket_number``/``bitmap_bit_position``). A bitmap bucket covers
  32768 ids as a 4 KB binary; merging is ``bitmap_or_agg`` (bitwise OR),
  counting is ``bitmap_count``. Dense integer id spaces (user ids,
  fixed-point keys) compress ~1 bit/candidate — far smaller than a
  distinct-key shuffle, and exact, unlike HLL.
- :func:`hll_daily` / :func:`hll_rollup` — APPROXIMATE distinct via
  Datasketches HLL (``hll_sketch_agg`` / ``hll_union_agg`` /
  ``hll_sketch_estimate``). Constant ~1.5 KB per group at lgK=12
  (~1.6% stderr) regardless of cardinality or key type — the right
  trade when ids are sparse/strings or exactness isn't required.

Everything is built-in JVM aggregates: partial (map-side) combine,
one shuffle on the group keys, no UDFs, no driver collection.

Reference parity: the reference's dbt marts recompute distincts from raw
each run (mart_financial_summary.sql re-scans the staging table); this is
the incremental re-aggregation upgrade its TimescaleDB hypertable
(README.md:268 continuous aggregates) implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bitmap_daily(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Per-(day, group, bucket) exact-distinct bitmaps — the persisted
    sketch table. One scan + one shuffle on (day, groups, bucket); the
    bucket key spreads one group's id range over many rows, so a hot
    group cannot produce a hot reducer (each bucket is a fixed 4 KB).
    """
    return (
        events.select(
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            *group_cols,
            F.expr(f"bitmap_bucket_number({id_col})").alias("bucket"),
            F.expr(f"bitmap_bit_position({id_col})").alias("pos"),
        )
        .groupBy("day", *group_cols, "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )


def bitmap_rollup(
    daily: DataFrame,
    grain: Column,
    group_cols: tuple[str, ...] = ("event_type",),
    out_col: str = "n_distinct",
) -> DataFrame:
    """Merge daily bitmaps to a coarser grain and count — EXACT, and the
    raw table is never re-read. OR the per-bucket bitmaps across days,
    count bits per bucket, then sum bucket counts (buckets partition the
    id space, so bucket counts are additive)."""
    return (
        daily.groupBy(grain.alias("grain"), *group_cols, "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .select("grain", *group_cols, F.expr("bitmap_count(bm)").alias("bucket_n"))
        .groupBy("grain", *group_cols)
        .agg(F.sum("bucket_n").alias(out_col))
    )


def hll_daily(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    lg_k: int = 12,
) -> DataFrame:
    """Per-(day, group) HLL sketches: constant ~(2^lgK)/2 bytes per row
    whatever the cardinality. No bucket key needed — the sketch itself
    is the fixed-size summary, and hll_sketch_agg partials combine
    map-side before the single (day, groups) shuffle."""
    return events.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"), *group_cols).agg(
        F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("hll")
    )


def hll_rollup(
    daily: DataFrame,
    grain: Column,
    group_cols: tuple[str, ...] = ("event_type",),
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Union daily sketches to a coarser grain and estimate."""
    return daily.groupBy(grain.alias("grain"), *group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))).alias(out_col)
    )
