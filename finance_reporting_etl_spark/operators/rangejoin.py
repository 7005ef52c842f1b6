"""Bucketed range (interval) join.

Matching point rows to interval rows (``lo <= t < hi``) has no
equi-key, so Spark's naive plan is BroadcastNestedLoopJoin — a
cartesian scan that dies at scale. The classic fix (used by interval
libraries and Databricks' range-join hints alike) is to discretize
time into fixed-width buckets: each interval explodes into the
buckets it overlaps, each point maps to exactly one bucket, and the
bucket key turns the join into a shuffled EQUI-join; the precise
``lo <= t < hi`` predicate then filters the bucket-local candidates.
Shuffle volume is |points| + |intervals| * avg_span/width — tunable,
never quadratic.

(For skew-salted and bucketed shuffle-free equi-joins see
``operators/scale.py``.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    extra_eq: list[str] | None = None,
) -> DataFrame:
    """Inner-join point rows to interval rows where ``lo <= t < hi``
    (half-open), optionally also matching on ``extra_eq`` equi-columns.

    ``t``/``lo``/``hi`` must be numeric (cast timestamps with
    ``unix_micros``/``unix_seconds`` first); ``bucket_width`` is in the
    same unit and should approximate the typical interval span — wider
    buckets mean fewer exploded interval copies but more false
    candidates for the final filter.

    For outer semantics (keep unmatched points/intervals), aggregate the
    matches and LEFT JOIN them back to the preserved side on its key —
    see the ``attribution_window_join`` catalog query. A generic
    NULL-extended left mode is deliberately not offered: without a
    declared unique key, reconstructing unmatched rows from a multiset
    is ambiguous (duplicate rows would collapse).
    """
    eq = list(extra_eq or [])
    t, lo, hi = F.col(t_col), F.col(lo_col), F.col(hi_col)

    p = points.withColumn("__bucket", F.floor(t / bucket_width))
    # every bucket the interval [lo, hi) overlaps; empty intervals
    # (hi <= lo) produce no buckets and thus no matches. The upper
    # bucket is ceil(hi / w) - 1, NOT floor((hi - 1) / w): the latter
    # assumes integer-granularity values and silently drops true
    # matches for fractional hi (e.g. hi = 6.8 covers bucket 6 at
    # w = 1, but floor(5.8) = 5 would stop early — r5 review). The
    # two forms agree on integers.
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.when(
                hi > lo,
                F.sequence(
                    F.floor(lo / bucket_width),
                    F.ceil(hi / bucket_width) - 1,
                ),
            ).otherwise(F.lit(None).cast("array<long>"))
        ),
    )
    cond: Column = (t >= lo) & (t < hi)
    return p.join(iv, on=["__bucket", *eq], how="inner").where(cond).drop("__bucket")


def merge_intervals(
    iv: DataFrame,
    key_cols: list[str],
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Union overlapping intervals per key with ONE partitioned window
    pass — no interval self-join anywhere. The sweep-line
    formulation: a running max of interval ends detects gaps, a
    cumsum of gap flags numbers the merged islands. Returns one row
    per merged island: (*key_cols, grp, lo, hi)."""
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(lo_col, hi_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(lo_col, hi_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = iv.withColumn("prev_max_hi", F.max(hi_col).over(w_prev)).withColumn(
        "is_new",
        F.when(
            F.col("prev_max_hi").isNull() | (F.col(lo_col) > F.col("prev_max_hi")), 1
        ).otherwise(0),
    )
    return (
        g.withColumn("grp", F.sum("is_new").over(w_cum))
        .groupBy(*key_cols, "grp")
        .agg(F.min(lo_col).alias(lo_col), F.max(hi_col).alias(hi_col))
    )
