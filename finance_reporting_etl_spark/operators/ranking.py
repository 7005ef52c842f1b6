"""Distributed exact ntile — global ranking without a global sort.

A bare ``ntile(n) OVER (ORDER BY ...)`` compiles to a single-partition
WindowExec: every row funnels through one task, which is fine on a
post-aggregation input at small SF but becomes a single-executor sort
at 100 TB. This operator computes the IDENTICAL tile assignment with a
bounded-parallelism plan:

1. ``percentile_approx`` sketches ~``buckets`` quantile edges of the
   sort value (one partial-aggregate pass, driver receives <=buckets
   scalars).
2. Rows are bucketed by those edges map-side. Ties on the value always
   land in the same bucket (edges partition on value only), so global
   order = (bucket asc, within-bucket order-by).
3. Per-bucket counts (one tiny shuffle, <=buckets rows to the driver)
   give each bucket's global row-number offset.
4. ``row_number`` windows PARTITIONED by bucket, plus the broadcast
   offset, reconstructs the exact global row number; the closed-form
   ntile formula maps it to a tile.

Driver traffic is O(buckets) scalars — never data. The skew ceiling is
the largest single bucket (~N/buckets rows, or the heaviest value tie),
the same bound a range-partitioned sort has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_ntile(
    df: DataFrame,
    n: int,
    value_col: str,
    tiebreak_cols: list[str],
    out_col: str = "tile",
    buckets: int = 64,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY value_col, *tiebreak_cols)``.

    The (value, tiebreak) key must be unique per row — the same
    precondition a deterministic ntile needs anywhere.
    """
    # Pin the input: three jobs (edges, counts, final) must see the
    # same rows, and re-deriving an expensive upstream thrice is waste.
    df = df.localCheckpoint(eager=True)

    qs = [i / buckets for i in range(1, buckets)]
    edges_row = df.agg(
        F.percentile_approx(value_col, qs, 10_000).alias("edges")
    ).head()
    edges = sorted(set(edges_row["edges"] or []))

    bucket: Column = F.lit(0)
    for e in edges:
        bucket = bucket + F.when(F.col(value_col) > F.lit(e), 1).otherwise(0)
    dfb = df.withColumn("__bucket", bucket)

    counts = {
        r["__bucket"]: r["cnt"]
        for r in dfb.groupBy("__bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "__bucket INT, __offset BIGINT")

    w = Window.partitionBy("__bucket").orderBy(value_col, *tiebreak_cols)
    rn = (F.row_number().over(w) + F.col("__offset")).alias("__rn")

    # ntile(n) over N rows: the first N%n tiles hold ceil(N/n) rows,
    # the rest floor(N/n). q == 0 (N < n) degenerates to tile = rn.
    q, r = divmod(total, n)
    ranked = dfb.join(F.broadcast(off_df), "__bucket").withColumn("__rn", rn)
    if q == 0:
        tile = F.col("__rn")
    else:
        head = r * (q + 1)
        tile = F.when(
            F.col("__rn") <= head,
            (F.floor((F.col("__rn") - 1) / (q + 1)) + 1),
        ).otherwise(r + F.floor((F.col("__rn") - head - 1) / q) + 1)
    return ranked.withColumn(out_col, tile.cast("int")).drop(
        "__bucket", "__offset", "__rn"
    )
