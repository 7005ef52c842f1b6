"""Distributed resampling: the Poisson bootstrap.

The classical bootstrap draws n rows WITH replacement per replicate —
a global sample that cannot be computed row-locally, so it does not
distribute. The Poisson bootstrap (Chamandy et al., "Estimating
Uncertainty for Massive Data Streams", Google 2012) replaces the
multinomial row counts with independent Poisson(1) draws: each row
decides its own weight in every replicate with no coordination, which
makes the whole procedure one narrow map over the data followed by a
B-group aggregation — the only shuffle is B rows wide. That is THE
bootstrap shape that survives 100 TB.

Determinism AND hash economy: one md5 digest is 32 hex chars = eight
independent 16-bit uniforms, so each row needs only B/8 digests for B
replicates (a digest per replicate measured ~16x slower end-to-end:
md5 dominates the 64x-exploded map). Replicate b reads chunk ``b % 8``
of digest ``md5(key || ':' || b//8 || ':' || salt)``; the 16-bit value
is mapped through the integer-thresholded Poisson(1) inverse CDF.
Integer compares only — both engines (and every run) produce the
identical weight table, so replicate means are hash-exact (weighted
sums stay in BIGINT cents).

Poisson(1) CDF thresholds at 16-bit resolution (round(65536 * P(X<=k))):
  24109, 48219, 60273, 64292, 65296, 65497  ->  weights 0..5, else 6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finance_reporting_etl_spark.partitioning import spread

# round(65536 * CDF) of Poisson(1) for k = 0..5; v >= last -> weight 6
POISSON1_CUTOFFS_16BIT = (24109, 48219, 60273, 64292, 65296, 65497)

_HEX = "0123456789abcdef"


def _weight_from_v(v: Column) -> Column:
    w = F.lit(6)
    for k in range(len(POISSON1_CUTOFFS_16BIT) - 1, -1, -1):
        w = F.when(v < POISSON1_CUTOFFS_16BIT[k], F.lit(k)).otherwise(w)
    return w.cast("bigint")


def poisson_bootstrap_means(
    df: DataFrame,
    key_col: str,
    value_cents_col: str,
    n_replicates: int = 64,
    salt: str = "boot",
) -> DataFrame:
    """Per-replicate weighted means of ``value_cents_col`` (BIGINT
    cents) under deterministic Poisson(1) resampling weights keyed on
    ``key_col``. Returns (b, n_eff, mean_value) with mean_value in
    currency units — an exact BIGINT/BIGINT double, identical across
    engines. Both explode stages are map-side (no shuffle until the
    B-row aggregation); md5 runs on the x(B/8) frame, only substring
    arithmetic on the xB frame."""
    if n_replicates % 8:
        raise ValueError("n_replicates must be a multiple of 8 (8 draws/digest)")
    g = F.explode(F.sequence(F.lit(0), F.lit(n_replicates // 8 - 1))).alias("g")
    # spread BEFORE the explode: a few-file input would otherwise run
    # the xB hash/weight map on as many cores as there are files
    rows = spread(df).select(F.col(key_col), F.col(value_cents_col), g)
    h = F.md5(
        F.concat_ws(
            ":", F.col(key_col).cast("string"), F.col("g").cast("string"), F.lit(salt)
        )
    )
    c = F.explode(F.sequence(F.lit(0), F.lit(7))).alias("c")
    rows = rows.withColumn("__h", h).select(
        F.col(value_cents_col), "g", "__h", c
    )
    # 16-bit uniform from hex chars 4c+1..4c+4 of the digest
    v = F.lit(0)
    for i in range(1, 5):
        ch = F.col("__h").substr(F.col("c") * 4 + F.lit(i), F.lit(1))
        v = v * 16 + (F.instr(F.lit(_HEX), ch) - 1)
    return (
        rows.withColumn("__w", _weight_from_v(v))
        .withColumn("b", F.col("g") * 8 + F.col("c"))
        .groupBy("b")
        .agg(
            F.sum("__w").alias("n_eff"),
            (
                F.sum(F.col("__w") * F.col(value_cents_col))
                / F.nullif(F.sum("__w"), F.lit(0))
                / 100.0
            ).alias("mean_value"),
        )
    )


def bootstrap_weight_sql(
    key_sql: str, g_sql: str, c_sql: str, salt: str = "boot"
) -> str:
    """DuckDB twin of the per-(row, replicate) weight above, over
    arbitrary key/digest-group/chunk expressions — emitted beside the
    Spark thresholds so both engines share one cutoff table and one
    digest layout."""
    h = f"md5({key_sql} || ':' || CAST({g_sql} AS VARCHAR) || ':{salt}')"
    digits = [
        f"(instr('{_HEX}', substr({h}, ({c_sql}) * 4 + {i}, 1)) - 1)"
        for i in range(1, 5)
    ]
    v = f"((({digits[0]} * 16 + {digits[1]}) * 16 + {digits[2]}) * 16 + {digits[3]})"
    cases = " ".join(
        f"WHEN {v} < {c} THEN {k}" for k, c in enumerate(POISSON1_CUTOFFS_16BIT)
    )
    return f"CAST(CASE {cases} ELSE 6 END AS BIGINT)"
