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
from finance_reporting_etl_spark.functions.scalars import det_round


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
        det_round(F.col("n_a").cast("double") / F.col("__tot_a"), 6).alias("share_a"),
        det_round(F.col("n_b").cast("double") / F.col("__tot_b"), 6).alias("share_b"),
        det_round((pa - pb) * F.log(pa / pb), 6).alias("psi_contrib"),
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
        .agg(det_round(F.max("gap"), scale).alias("ks_stat"))
    )


def mann_whitney_u(
    df: DataFrame,
    key_col: str,
    value_cents_col: str,
    group_col: str,
) -> DataFrame:
    """Exact Mann-Whitney U rank-sum test per key between the rows of
    groups 1 and 2 in ``group_col`` — the nonparametric complement of
    the Welch t (no normality assumption; detects median/stochastic-
    dominance shifts the t-test misses on skewed revenue data).

    Exactness discipline: ranks are never materialized per row. Per
    (key, value) integer counts give each tie-group's midrank in
    DOUBLED integer units (2*offset + cnt + 1 — doubling clears the
    half), so the rank sum R2 = sum(c1 * that) and the tie-correction
    term S3 = sum(cnt^3 - cnt) are EXACT integer aggregates in any
    accumulation order. u2 = 2*U1 = R2 - n1*(n1+1) stays integer;
    only the final z is float — one closed-form expression over those
    integers, textually identical in both engines. The tie factor
    (n+1)n(n-1) - S3 is summed in DECIMAL(38,0) (n^3 passes BIGINT
    near n ~ 2e6). All-tied keys (tie factor 0) emit NULL z. Value
    sorting stays inside each key's partition (the ks_two_sample
    shape); NULL values are excluded for the same NULLS FIRST/LAST
    reason. Returns (key, n1, n2, u2, z).
    """
    counts = (
        df.filter(F.col(value_cents_col).isNotNull())
        .groupBy(key_col, value_cents_col)
        .agg(
            F.sum((F.col(group_col) == 1).cast("long")).alias("c1"),
            F.sum((F.col(group_col) == 2).cast("long")).alias("c2"),
        )
        .withColumn("cnt", F.col("c1") + F.col("c2"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(value_cents_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = counts.withColumn("off", F.sum("cnt").over(w) - F.col("cnt"))
    g = (
        d.groupBy(key_col)
        .agg(
            F.sum("c1").cast("bigint").alias("n1"),
            F.sum("c2").cast("bigint").alias("n2"),
            F.sum(
                F.col("c1") * (2 * F.col("off") + F.col("cnt") + 1)
            )
            .cast("bigint")
            .alias("r2"),
            F.sum(
                (
                    F.col("cnt").cast("decimal(38,0)")
                    * F.col("cnt")
                    * F.col("cnt")
                    - F.col("cnt")
                )
            ).alias("s3"),
        )
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
    )
    n = F.col("n1") + F.col("n2")
    tf = (
        (n + 1).cast("decimal(38,0)") * n * (n - 1) - F.col("s3")
    )
    u2 = F.col("r2") - F.col("n1") * (F.col("n1") + 1)
    z = (
        (u2.cast("double") - F.col("n1").cast("double") * F.col("n2"))
        / F.nullif(
            F.lit(2.0)
            * F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                * tf.cast("double")
                / (F.lit(12.0) * n * (n - 1))
            ),
            F.lit(0.0),
        )
    )
    return g.select(
        key_col,
        "n1",
        "n2",
        u2.cast("bigint").alias("u2"),
        det_round(z, 6).alias("z"),
    )


def emd_1d(
    df: DataFrame,
    key_col: str,
    value_cents_col: str,
    group_col: str,
    scale: int = 6,
) -> DataFrame:
    """Exact 1-D earth-mover (Wasserstein-1) distance per key between
    groups 1 and 2: the integral of |F1 - F2| over the value axis —
    the MAGNITUDE-aware drift metric (KS says the ECDFs separate; EMD
    says how much mass moved how far, in value units).

    Closed form on a sorted axis: sum over consecutive distinct
    values of |F1(v) - F2(v)| * (v_next - v). Kept exact as the
    integer numerator |a1*n2 - a2*n1| * gap summed in DECIMAL(38,0)
    (order-free), divided once by n1*n2*100 into display dollars.
    Same per-key partitioned cumulative shape as ks_two_sample; NULL
    values excluded identically. The final double conversion is exact
    below 2^53 (gate scales); at larger SF emit the decimal numerator
    instead. Returns (key, n1, n2, emd).
    """
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
    lw = Window.partitionBy(key_col).orderBy(value_cents_col)
    tot = Window.partitionBy(key_col)
    d = (
        counts.withColumn("a1", F.sum("c1").over(w))
        .withColumn("a2", F.sum("c2").over(w))
        .withColumn("n1", F.sum("c1").over(tot))
        .withColumn("n2", F.sum("c2").over(tot))
        .withColumn(
            "gap",
            F.lead(value_cents_col).over(lw) - F.col(value_cents_col),
        )
        .filter((F.col("n1") > 0) & (F.col("n2") > 0) & F.col("gap").isNotNull())
    )
    num = F.abs(
        F.col("a1").cast("decimal(38,0)") * F.col("n2")
        - F.col("a2").cast("decimal(38,0)") * F.col("n1")
    ) * F.col("gap")
    return (
        d.withColumn("num", num)
        .groupBy(key_col, "n1", "n2")
        .agg(
            det_round(
                F.sum("num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2"))
                / F.lit(100.0),
                scale,
            ).alias("emd")
        )
    )
