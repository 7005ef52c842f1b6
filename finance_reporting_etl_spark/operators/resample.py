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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from finance_reporting_etl_spark.functions.scalars import det_round

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


def pps_systematic_sample(
    df: DataFrame,
    key_col: str,
    weight_cents_col: str,
    n: int,
    salt: str = "pps",
    buckets: int = 64,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: lay every
    row's integer weight end-to-end on a [0, W) axis in md5-shuffled
    key order, then take the n grid points p_k = W*(2k+1)/(2n) — each
    row is drawn with probability (multiplicity expectation) n*w/W,
    heavy rows can be hit multiple times, and the whole draw is a pure
    function of (keys, weights, salt). This is the survey/mixture
    sampler that beats Poisson sampling on variance (fixed sample
    size) and beats sorting-by-random-uniform on determinism.

    Everything is exact BIGINT: hits for a row spanning [lo, hi) =
    f(hi) - f(lo) with f(x) = clamp(ceil((2nx - W) / 2W), 0, n),
    ceilings via floor-div identities — no float anywhere, so engines
    agree bit-for-bit. Requires W * 2n < 2^63 (at 2^63/W grid
    density the axis itself should be rescaled). The cumulative axis
    comes from distributed_cumsum over (md5-bucket, md5, key) — the
    bucket int preserves md5 lexicographic order (hex prefix order ==
    numeric order), so NO single-partition window exists at any size.
    Returns rows with hits >= 1: key, weight, hits, incl_prob.
    """
    from finance_reporting_etl_spark.operators.corpus import md5_bucket
    from finance_reporting_etl_spark.operators.ranking import (
        distributed_cumsum,
    )

    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    d = (
        df.filter(F.col(weight_cents_col) > 0)
        .withColumn("__h", h)
        .withColumn("__b", md5_bucket(key_col, buckets=256, salt=salt))
    )
    c = distributed_cumsum(
        d, weight_cents_col, "__b", ["__h", key_col],
        out_col="__hi", buckets=buckets,
    )
    wtot = c.groupBy().agg(F.sum(weight_cents_col).cast("bigint").alias("__w"))

    # hits = f(hi) - f(lo) with f(x) = clamp(ceil((2n*x - W) / 2W), 0, n).
    # ceil must be exact integer arithmetic, and Spark's `div` TRUNCATES
    # toward zero (not floor), so the -((-a) div b) identity silently
    # computes floor for positive a (caught by the brute-force test).
    # Branchless exact form instead: m = pmod(a, b); floor = (a-m) div b
    # (exact division); ceil = floor + (m != 0).
    def f_at(x_sql: str) -> F.Column:
        a = f"({2 * int(n)} * {x_sql} - __w)"
        b = "(2 * __w)"
        m = f"pmod({a}, {b})"
        ceil = f"(({a} - {m}) div {b}) + CASE WHEN {m} <> 0 THEN 1 ELSE 0 END"
        return F.greatest(
            F.lit(0).cast("bigint"),
            F.least(F.lit(int(n)).cast("bigint"), F.expr(ceil).cast("bigint")),
        )

    out = (
        c.join(F.broadcast(wtot))
        .withColumn("__lo", F.col("__hi") - F.col(weight_cents_col))
        .withColumn("__fhi", f_at("__hi"))
        .withColumn("__flo", f_at("__lo"))
        .withColumn("hits", (F.col("__fhi") - F.col("__flo")).cast("bigint"))
        .filter(F.col("hits") >= 1)
    )
    return out.select(
        key_col,
        F.col(weight_cents_col).alias("weight_cents"),
        "hits",
        det_round(
            F.least(
                F.lit(1.0),
                F.lit(float(n)) * F.col(weight_cents_col) / F.col("__w"),
            ),
            6,
        ).alias("incl_prob"),
    )


def weighted_ares_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str
) -> DataFrame:
    """Weighted reservoir sample without replacement (Efraimidis-
    Spirakis A-Res) with DETERMINISTIC md5 uniforms — the third leg of
    the sampling family: stratified_reservoir gives uniform fixed-k,
    pps_systematic gives fixed-k proportional inclusion, A-Res gives
    the sequential/mergeable weighted draw (each item's key is an
    independent exponential race, so any prefix of the sorted keys is
    a valid sample — the property that makes it streamable and
    union-able across shards).

    key_i = -ln(u_i)/w_i with u_i = (hexval_12(md5(id||salt)) + 0.5)
    / 16^12: the 48-bit value is float-exact, u is a per-row closed
    form, and ln comes from libm identically in both engines — so the
    k smallest keys (tie-break id) are bit-stable. Selection is
    orderBy().limit(k): Spark plans TakeOrdered (per-partition top-k
    + driver merge of k*partitions rows), never a global sort; the
    post-limit rank window is k-bounded. Weights must be positive.
    """
    from finance_reporting_etl_spark.operators.membership import _hex_val

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    u = (_hex_val(h, 1, 12).cast("double") + F.lit(0.5)) / F.lit(
        float(16**12)
    )
    keyed = df.filter(F.col(weight_col) > 0).withColumn(
        "__key", -F.log(u) / F.col(weight_col).cast("double")
    )
    top = keyed.orderBy(F.col("__key").asc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("__key").asc(), F.col(id_col).asc())
    return top.select(
        F.row_number().over(w).cast("int").alias("draw_rank"),
        F.col(id_col),
        F.col(weight_col),
    )


def ares_oracle_sql(
    src_sql: str, id_col: str, weight_col: str, k: int, salt: str
) -> str:
    """DuckDB twin of :func:`weighted_ares_sample`: identical digest
    slice, identical closed-form key, same (key, id) order and LIMIT.
    ``src_sql`` must yield (id_col, weight_col)."""
    from finance_reporting_etl_spark.operators.membership import _hex_val_sql

    h = f"md5(CAST({id_col} AS VARCHAR) || '{salt}')"
    v = _hex_val_sql(h, 1, 12)
    u = f"((CAST({v} AS DOUBLE) + 0.5) / {float(16**12)!r})"
    return f"""
    WITH src AS ({src_sql}),
    keyed AS (
        SELECT {id_col}, {weight_col},
               -ln({u}) / CAST({weight_col} AS DOUBLE) AS key
        FROM src WHERE {weight_col} > 0
    ), top AS (
        SELECT * FROM keyed ORDER BY key, {id_col} LIMIT {k}
    )
    SELECT CAST(row_number() OVER (ORDER BY key, {id_col}) AS INT)
               AS draw_rank,
           {id_col}, {weight_col}
    FROM top
    """
