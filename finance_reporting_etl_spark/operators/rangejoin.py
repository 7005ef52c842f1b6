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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    extra_eq: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows where ``lo <= t < hi``
    (half-open), optionally also matching on ``extra_eq`` equi-columns.

    ``t``/``lo``/``hi`` must be numeric (cast timestamps with
    ``unix_micros``/``unix_seconds`` first); ``bucket_width`` is in the
    same unit and should approximate the typical interval span — wider
    buckets mean fewer exploded interval copies but more false
    candidates for the final filter.
    """
    eq = list(extra_eq or [])
    t, lo, hi = F.col(t_col), F.col(lo_col), F.col(hi_col)

    p = points.withColumn("__bucket", F.floor(t / bucket_width))
    # every bucket the interval [lo, hi) overlaps; empty intervals
    # (hi <= lo) produce no buckets and thus no matches
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.when(
                hi > lo,
                F.sequence(
                    F.floor(lo / bucket_width),
                    F.floor((hi - 1) / bucket_width),
                ),
            ).otherwise(F.lit(None).cast("array<long>"))
        ),
    )
    cond: Column = (t >= lo) & (t < hi)
    joined = p.join(iv, on=["__bucket", *eq], how="inner").where(cond).drop("__bucket")
    if how == "inner":
        return joined
    if how == "left":
        # left rows with no interval match come back NULL-extended;
        # implemented as inner + anti to keep the bucketed equi-join
        matched = joined
        unmatched = points.join(
            matched.select(points.columns).distinct(), on=points.columns, how="left_anti"
        )
        for c in intervals.columns:
            if c not in points.columns and c not in unmatched.columns:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(dict(intervals.dtypes)[c])
                )
        return matched.unionByName(unmatched, allowMissingColumns=True)
    raise ValueError(f"unsupported how={how!r}")
