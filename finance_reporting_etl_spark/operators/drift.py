"""Distribution-drift monitoring (PSI) shared by the batch and
streaming catalog queries.

Population Stability Index per fixed-width bin: contribution
``(p - q) * ln(p / q)`` with 1e-6 share clipping — the standard drift
alarm for features and model scores (sum the contributions; > 0.2
means act). The per-bin table is emitted instead of the summed scalar
so every number is either an exact count or a closed-form float both
engines evaluate identically — the cross-engine float-SUM trap
(PLANS.md #10) never appears. Bin counts are integers and mergeable
(a 10-cell 'sketch'), which is what lets the streaming form fold
per-micro-batch counts and still hash-match the one-shot batch
computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_bin(col: str = "value", width: float = 50.0, n_bins: int = 10):
    """Fixed-width binning expression: floor(value / width), capped at
    the last bin."""
    return F.least(
        F.floor(F.col(col) / F.lit(width)).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")


def psi_bin_table(j: DataFrame) -> DataFrame:
    """Final PSI projection over a frame with (bin, n_a, n_b, __tot_a,
    __tot_b): shares and per-bin PSI contribution, 6dp — the exact
    expression tree both catalog drift queries and their DuckDB
    oracles evaluate."""
    pa = F.greatest(F.col("n_a").cast("double") / F.col("__tot_a"), F.lit(0.000001))
    pb = F.greatest(F.col("n_b").cast("double") / F.col("__tot_b"), F.lit(0.000001))
    return j.select(
        "bin",
        "n_a",
        "n_b",
        F.round(F.col("n_a").cast("double") / F.col("__tot_a"), 6).alias("share_a"),
        F.round(F.col("n_b").cast("double") / F.col("__tot_b"), 6).alias("share_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_contrib"),
    )


def psi_from_counts(a_counts: DataFrame, b_counts: DataFrame) -> DataFrame:
    """PSI table from two per-bin count frames (bin, n_a) and
    (bin, n_b): full-outer align the bins (a bin empty on one side is
    a 0-count, clipped to the 1e-6 share floor), broadcast the two
    scalar totals, project the PSI columns."""
    j = a_counts.join(b_counts, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    t = j.agg(
        F.sum("n_a").cast("double").alias("__tot_a"),
        F.sum("n_b").cast("double").alias("__tot_b"),
    )
    return psi_bin_table(j.crossJoin(F.broadcast(t)))


def ks_two_sample(
    df: DataFrame,
    key_col: str,
    value_cents_col: str,
    group_col: str,
    scale: int = 6,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per key:
    max_v |F1(v) - F2(v)| between the rows of the two groups in
    ``group_col`` (values 1 and 2). Distribution-free drift detection
    on the raw values — the binned PSI's complement (PSI needs a bin
    design; KS does not, and catches shape changes PSI's coarse bins
    blur).

    Exactness: per (key, value) counts are integers, the ECDFs are
    cumulative-integer / total ratios, and both engines compare the
    identical doubles — the value axis sorts within a key partition
    only (bounded by a key's distinct values; values never leave
    their key's partition). Keys missing either group are dropped.
    Returns (key, n1, n2, ks_stat)."""
    # NULL values carry no ECDF mass and must not enter the cumulative
    # axis at all: Spark windows sort NULLS FIRST, DuckDB NULLS LAST,
    # so an unfiltered NULL group would shift every a1/a2 on one
    # engine only (r5 review)
    counts = (
        df.filter(F.col(value_cents_col).isNotNull())
        .groupBy(key_col, value_cents_col)
        .agg(
            F.sum((F.col(group_col) == 1).cast("long")).alias("c1"),
            F.sum((F.col(group_col) == 2).cast("long")).alias("c2"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(value_cents_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(key_col)
    d = (
        counts.withColumn("a1", F.sum("c1").over(w))
        .withColumn("a2", F.sum("c2").over(w))
        .withColumn("n1", F.sum("c1").over(tot))
        .withColumn("n2", F.sum("c2").over(tot))
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
    )
    gap = F.abs(
        F.col("a1") / F.col("n1").cast("double")
        - F.col("a2") / F.col("n2").cast("double")
    )
    return (
        d.withColumn("gap", gap)
        .groupBy(key_col, "n1", "n2")
        .agg(F.round(F.max("gap"), scale).alias("ks_stat"))
    )
