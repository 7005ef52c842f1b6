"""Sketch-based approximate aggregation (BASELINE extension X4).

Count-Min Sketch over a token stream: a depth x width counter grid
where each key increments one cell per row (col = hash_d(key) mod
width) and a point estimate is the MIN over its depth cells — always
an overestimate, never an under (collisions only add). The sketch is
the scale story: its size is FIXED (depth*width cells) no matter how
many tokens stream through, the cell grid is a plain groupBy (map-side
partial combine, one shuffle bounded by depth*width live groups), and
two sketches over disjoint data merge by cell-wise addition — the
property that lets 1000 executors sketch 100 TB independently and
combine at the end.

Public construction (Cormode & Muthukrishnan 2005). Engine-native
hashing (xxhash64) follows the repo's persisted-intermediate oracle
pattern: the (token, d, col) placement table is persisted and every
downstream decision — cell counts, min-estimates, thresholding — is
re-derived in ANSI SQL by the DuckDB oracle from that table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from finance_reporting_etl_spark.functions.scalars import det_round


def cms_placements(
    keys: DataFrame, key_col: str = "token", depth: int = 4, width: int = 64
) -> DataFrame:
    """(key, d, col) hash placements for each DISTINCT key — the
    engine-hashed stage (narrow: vocab x depth rows, persistable)."""
    return (
        keys.select(key_col)
        .distinct()
        .select(key_col, F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"))
        .withColumn(
            "col", F.pmod(F.xxhash64(F.col(key_col), F.col("d")), F.lit(width)).cast("int")
        )
    )


def cms_cell_counts(
    key_counts: DataFrame, placements: DataFrame, key_col: str = "token"
) -> DataFrame:
    """The sketch itself: (d, col, cell_cnt). Built from per-key counts
    (equivalent to streaming increments, fewer rows shuffled); at most
    depth*width rows regardless of corpus size."""
    return (
        key_counts.join(placements, key_col)
        .groupBy("d", "col")
        .agg(F.sum("cnt").alias("cell_cnt"))
    )


def cms_estimates(
    placements: DataFrame, sketch: DataFrame, key_col: str = "token"
) -> DataFrame:
    """Point estimates: est(key) = min over d of its cell count. The
    sketch is tiny (depth*width rows) and broadcasts. LEFT join +
    coalesce-0: a probed key whose cell holds no sketch row means that
    cell counted NOTHING — the true CMS estimate is 0, and an inner
    join would instead take the min over only collided cells (a wrong
    positive) or drop the key entirely (review)."""
    return (
        placements.join(F.broadcast(sketch), ["d", "col"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce("cell_cnt", F.lit(0).cast("long"))).alias(
                "est_count"
            )
        )
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketch: mergeable quantiles
# ---------------------------------------------------------------------------
#
# percentile() buffers every value per group (OOM on a hot group at
# 100 TB) and percentile_approx's internal sketch is not exposed for
# re-aggregation. A fixed-bin histogram IS: per-(day, group) bin counts
# are additive, so daily sketches sum to any coarser grain and
# quantiles interpolate from the merged counts — one raw scan ever,
# constant nbins-bounded state per group, and (with a power-of-two bin
# width) bit-identical bin assignment in any engine, so the whole path
# is hard-verifiable against SQL. Estimate error is <= one bin width.


def value_histogram(
    events: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    width: float = 4.0,
    nbins: int = 256,
) -> DataFrame:
    """Per-(day, group, bin) counts. ``width`` MUST be a power of two:
    value/width is then an EXACT float64 operation, so bin boundaries
    cannot drift between engines (the reason this sketch is fully
    oracle-verifiable where t-digest could not be). Out-of-range values
    clamp into the edge bins; NULL values are excluded — greatest/least
    skip NULLs, so an unfiltered NULL would silently land in bin 0 and
    skew every downstream quantile (review)."""
    b = F.floor(F.col(value_col) / F.lit(width))
    bin_ = F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1)).cast("int")
    return (
        events.filter(F.col(value_col).isNotNull()).select(
            F.date_trunc("day", F.col(ts_col)).alias("day"), *group_cols, bin_.alias("bin")
        )
        .groupBy("day", *group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_rollup(daily: DataFrame, grain, group_cols: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Merge daily histograms to a coarser grain: plain additive sum."""
    return daily.groupBy(grain.alias("grain"), *group_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def histogram_quantiles(
    merged: DataFrame,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_cols: tuple[str, ...] = ("event_type",),
    width: float = 4.0,
    scale: int = 4,
) -> DataFrame:
    """Interpolated quantiles from merged bin counts: for each p, the
    unique bin whose cumulative count first reaches p*total, linearly
    interpolated inside the bin. One partitioned window (cumsum over
    <=nbins rows per group) + a tiny literal cross join — no value
    buffering anywhere."""
    from pyspark.sql import Window

    spark = merged.sparkSession
    keys = ["grain", *group_cols]
    w = Window.partitionBy(*keys).orderBy("bin")
    cum = merged.select(
        *keys,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*keys)).alias("total"),
    )
    pdf = spark.createDataFrame([(float(p),) for p in ps], "p double")
    t = F.col("p") * F.col("total")
    # p = 0 has t = 0: (cum - cnt) < 0 never holds, so the strict form
    # would silently emit NO row for the minimum — the first bin
    # qualifies via the equality arm (review)
    return (
        cum.crossJoin(F.broadcast(pdf))
        .filter(
            (F.col("cum") >= t)
            & (
                ((F.col("cum") - F.col("cnt")) < t)
                | ((t == 0) & ((F.col("cum") - F.col("cnt")) == 0))
            )
        )
        .select(
            *keys,
            "p",
            det_round(
                F.col("bin") * F.lit(width)
                + F.lit(width) * (t - (F.col("cum") - F.col("cnt"))) / F.col("cnt"),
                scale,
            ).alias("est"),
        )
    )
