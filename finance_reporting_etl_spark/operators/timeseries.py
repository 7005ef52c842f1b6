"""Per-key sequential time-series operators (grouped-map applyInPandas).

Exponential moving average is a RECURSIVE scan — s_t = a*x_t +
(1-a)*s_{t-1} — which no window aggregate can express (the closed-form
weighted-sum rewrite needs (1-a)^-rank factors that overflow float64 on
long series). This is the textbook case for ``applyInPandas``: Spark
shuffles each key's rows to one task, the fold runs vectorized-ish in
pandas per group, and the output is a plain DataFrame. One shuffle on
the key, group-at-a-time memory — the same cost envelope as any
per-key window, valid at 100 TB because a single key's history fits a
task (the precondition every per-key sequential model shares).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from finance_reporting_etl_spark.functions.scalars import det_round, det_round_py


def ema_last_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    scale: int = 6,
) -> DataFrame:
    """(key, n_events, ema_final): left-fold EMA over each key's rows in
    ``order_cols`` order, seeded with the first value — byte-for-byte
    the same float64 operation sequence as a ``list_reduce`` fold, so
    an independent engine reproduces it exactly.

    The fold arrives as a sort-collected array per key (JVM-side
    ``array_sort(collect_list(struct(*order, value)))`` — valid
    because ``order_cols`` are unique per row, making struct order ==
    the stable column sort) and ONE Arrow-batched scalar pandas_udf
    folds thousands of keys per batch. Rewritten from one
    ``applyInPandas`` call per group in round 5: per-group call
    overhead dominated at ~30k keys (measured 3.35 s -> see PLANS.md);
    the float64 operation sequence per key is unchanged, so results
    are bit-identical.
    """
    import numpy as np

    ordered = df.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    *[F.col(c) for c in order_cols], F.col(value_col).alias("__v")
                )
            )
        ).alias("__s")
    )

    @F.pandas_udf("double")
    def _fold(series: pd.Series) -> pd.Series:
        out = []
        for xs in series:
            arr = np.asarray([r["__v"] for r in xs], dtype=np.float64)
            s = arr[0]
            for x in arr[1:]:
                s = alpha * x + (1.0 - alpha) * s
            out.append(det_round_py(float(s), scale))
        return pd.Series(out, dtype="float64")

    return ordered.select(
        key_col,
        F.size("__s").cast("long").alias("n_events"),
        _fold(F.col("__s")).alias("ema_final"),
    )


def clamped_balance_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    delta_col: str,
    floor: int = 0,
) -> DataFrame:
    """(key, n_events, final_balance): running balance with a floor —
    b_t = max(floor, b_{t-1} + delta_t) — folded over each key's rows
    in ``order_cols`` order.

    The clamp recurrence LOOKS inexpressible as a window aggregate,
    but integer max-clamp folds have a closed form (the max-prefix-gap
    identity; the same algebra behind maximum-subarray): with prefix
    sums p_k over the deltas (p_0 = 0, the unclamped start),

        b_n = floor + p_n - min(floor, min_{1<=k<=n} p_k).

    So the whole operator is two chained window passes over ONE
    key-partitioned sort (running sum, then running min — same window
    spec, one exchange) plus a last-row filter: pure JVM whole-stage
    codegen, zero Python, exact integers. Round-5 rework; the
    grouped-map fold it replaced paid one Arrow call per key
    (measured 2.9 s -> ~0.9 s at sf0.1; see PLANS.md)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = df.select(
        key_col,
        *order_cols,
        F.sum(F.col(delta_col).cast("long")).over(w).alias("__p"),
    ).withColumn("__minp", F.min("__p").over(w))
    wo = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    last = (
        p.withColumn("__rn", F.row_number().over(wo))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(key_col)))
        .filter(F.col("__rn") == 1)
    )
    return last.select(
        key_col,
        F.col("__n").cast("long").alias("n_events"),
        (
            F.lit(floor)
            + F.col("__p")
            - F.least(F.col("__minp"), F.lit(floor).cast("long"))
        )
        .cast("long")
        .alias("final_balance"),
    )


def holt_forecast_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    gamma: float,
    scale: int = 6,
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per key —
    the TWO-state recursive scan (level and trend update from each
    other), one step beyond the EMA's single state:

        l_t = a * x_t + (1 - a) * (l + b)
        b_t = g * (l_t - l) + (1 - g) * b        (seed: l = x_0, b = 0)

    Same applyInPandas envelope and exactness contract as the EMA:
    the fold's float64 operation SEQUENCE is fixed (b_t recomputes
    l_t's expression, matching a struct-accumulator ``list_reduce``
    step for step), so an independent engine reproduces the doubles
    bit-for-bit. Returns (key, n_obs, level, trend, forecast_1,
    forecast_7) — forecasts are level + h * trend."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        xs = pdf[value_col].astype("float64").to_numpy()
        l, b = xs[0], 0.0
        for x in xs[1:]:
            l_new = alpha * x + (1.0 - alpha) * (l + b)
            b = gamma * (l_new - l) + (1.0 - gamma) * b
            l = l_new
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_obs": [len(xs)],
                "level": [det_round_py(float(l), scale)],
                "trend": [det_round_py(float(b), scale)],
                "forecast_1": [det_round_py(float(l + b), scale)],
                "forecast_7": [det_round_py(float(l + 7.0 * b), scale)],
            }
        )

    out_schema = (
        f"{key_col} string, n_obs long, level double, trend double, "
        "forecast_1 double, forecast_7 double"
    )
    return df.groupBy(key_col).applyInPandas(fold, schema=out_schema)


def linear_interpolate_daily(
    observed: DataFrame,
    spine_from: DataFrame,
    key_cols: list[str],
    day_col: str = "day",
    value_col: str = "value",
    scale: int = 4,
    integer_units: bool = False,
) -> DataFrame:
    """Linear interpolation of missing daily readings: a calendar
    spine per key (keys and date bounds taken from ``spine_from``,
    which may be wider than the observed set) left-joins the observed
    points, two IGNORE-NULLS window scans find each gap's bracketing
    neighbors, and the fill is time-weighted between them. Boundary
    gaps (no neighbor on one side) stay NULL with
    ``was_interpolated = false`` — the flag marks rows a fill actually
    LANDED on, not every hole (round-5 review: a coverage audit
    summing the flag must not count unfilled boundary rows). A series
    never leaves its partition — the same partitioned-window scale
    shape as the rolling z-score detector. Returns
    (*key_cols, day, filled_value, was_interpolated)."""
    bounds = spine_from.agg(
        F.min(day_col).alias("d0"), F.max(day_col).alias("d1")
    )
    spine = (
        spine_from.select(*key_cols)
        .distinct()
        .crossJoin(
            F.broadcast(
                bounds.select(
                    F.explode(
                        F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
                    ).alias(day_col)
                )
            )
        )
    )
    j = spine.join(observed, [*key_cols, day_col], "left").select(
        *key_cols,
        day_col,
        value_col,
        F.when(F.col(value_col).isNotNull(), F.col(day_col)).alias("day_known"),
    )
    wp = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    n = j.select(
        *key_cols,
        day_col,
        value_col,
        F.last(value_col, ignorenulls=True).over(wp).alias("prev_v"),
        F.last("day_known", ignorenulls=True).over(wp).alias("prev_d"),
        F.first(value_col, ignorenulls=True).over(wf).alias("next_v"),
        F.first("day_known", ignorenulls=True).over(wf).alias("next_d"),
    )
    if integer_units:
        # exact-integer fill: values are integer units; the
        # time-weighted fill is one truncating integer division
        # (Spark div == DuckDB // — both truncate), so every emitted
        # unit is order-free exact at any SF (r8 hardening: the float
        # fill diverged from the oracle at sf0.1)
        interp_u = F.expr(
            f"prev_v + ((next_v - prev_v) * datediff({day_col}, prev_d))"
            " div datediff(next_d, prev_d)"
        )
        return n.select(
            *key_cols,
            day_col,
            F.when(F.col(value_col).isNotNull(), F.col(value_col))
            .otherwise(
                F.when(
                    F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
                    interp_u,
                )
            )
            .cast("bigint")
            .alias("filled_units"),
            (
                F.col(value_col).isNull()
                & F.col("prev_v").isNotNull()
                & F.col("next_v").isNotNull()
            ).alias("was_interpolated"),
        )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        F.datediff(day_col, "prev_d") / F.datediff("next_d", "prev_d")
    )
    return n.select(
        *key_cols,
        day_col,
        det_round(
            F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
                F.when(
                    F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), interp
                )
            ),
            scale,
        ).alias("filled_value"),
        (
            F.col(value_col).isNull()
            & F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
        ).alias("was_interpolated"),
    )


def rolling_pearson(
    paired: DataFrame,
    day_col: str = "day",
    x_col: str = "x",
    y_col: str = "y",
    window_rows: int = 14,
    out_col: str = "corr14",
) -> DataFrame:
    """Trailing Pearson correlation between two aligned integer series
    (one row per day with both values). All five rolling moments are
    integer sums — exact in any order — and the Pearson formula is
    assembled from them in identical double math, so a SQL oracle
    hash-matches. The ordered window runs over the DAYS-sized table
    (bounded — one row per calendar day); warm-up rows
    (n < window_rows) are dropped. Int64 headroom: cents^2 x window
    stays far under 2^63 until trillion-cent days."""
    win = Window.orderBy(day_col).rowsBetween(-(window_rows - 1), Window.currentRow)
    w = paired.select(
        day_col,
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum(x_col).over(win).alias("sx"),
        F.sum(y_col).over(win).alias("sy"),
        F.sum(F.col(x_col) * F.col(x_col)).over(win).alias("sxx"),
        F.sum(F.col(y_col) * F.col(y_col)).over(win).alias("syy"),
        F.sum(F.col(x_col) * F.col(y_col)).over(win).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return w.filter(F.col("n") == window_rows).select(
        day_col, det_round(num / F.nullif(dx * dy, F.lit(0.0)), 6).alias(out_col)
    )


def time_weighted_daily_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    scale: int = 6,
) -> DataFrame:
    """TWAP-style daily average: each observation holds its value until
    the next one (or until midnight for the day's last), and the
    average weights each value by its holding time — the finance
    convention for irregularly-sampled series, where a plain mean
    over-weights bursts. NULL-valued observations carry the previous
    value forward (they are excluded before the lead window, so they
    contribute neither weight nor count). Weights are exact integer
    MICROseconds, values
    integer cents, so the two sums are exact in any aggregation order
    and the single final division is IEEE-identical cross-engine
    (PLANS.md #10 recipe). Int64 headroom holds at ANY event count:
    holding times telescope, so a (key, day) group's weight sum is at
    most one day of microseconds (8.64e10) and the weighted sum at
    most max_cents * 8.64e10 — orders of magnitude under 2^63. One
    partitioned lead window per (key, day) — a series-day never
    leaves its partition. Returns (*key_cols, day, n_obs, twap)."""
    day = F.to_date(F.date_trunc("day", ts_col))
    w = Window.partitionBy(*key_cols, "day").orderBy(ts_col, tiebreak_col)
    # NULL-valued observations are dropped BEFORE the lead window, so
    # the previous value's holding time extends through them
    # (carry-forward) instead of silently biasing the average toward
    # zero by leaking their seconds into the denominator (r5 review)
    b = df.filter(F.col(value_col).isNotNull()).withColumn("day", day).withColumn(
        "__next",
        F.coalesce(
            F.lead(ts_col).over(w),
            (F.col("day") + F.expr("INTERVAL 1 DAY")).cast("timestamp"),
        ),
    )
    # microseconds, not unix_timestamp: that truncates sub-second
    # components and silently disagrees with fractional-epoch engines
    secs = (F.unix_micros("__next") - F.unix_micros(F.col(ts_col))).cast("bigint")
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    g = b.groupBy(*key_cols, "day").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(cents * secs).alias("__wsum"),
        F.sum(secs).alias("__tsecs"),
    )
    return g.select(
        *key_cols,
        "day",
        "n_obs",
        det_round(
            F.col("__wsum").cast("double")
            / 100.0
            / F.nullif(F.col("__tsecs").cast("double"), F.lit(0.0)),
            scale,
        ).alias("twap"),
    )


def max_drawdown_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_cents_col: str,
    scale: int = 6,
) -> DataFrame:
    """Per key: the deepest peak-to-trough decline of an integer-cent
    level series, as (key, max_drawdown, trough row's order value,
    trough_value, peak_value).

    Running peak is a window max; drawdown_t = 1 - v_t / peak_t is an
    exact integer ratio rounded to ``scale`` — so the argmax row is
    selected on identical (rounded dd DESC, order ASC) keys in any
    engine. Two window passes over one key-partitioned sort, then a
    row_number filter; no global sort, no state.

    Rows BEFORE the key's running peak turns positive are excluded
    (a non-positive peak makes the ratio meaningless: peak=0 divides
    to NaN — which would WIN the dd DESC argmax, since Spark sorts
    NaN above every double — and a negative peak flips the sign, so
    a rising series would report a positive drawdown; r5 review).
    Keys whose peak never turns positive produce no row. The peak
    itself is computed over ALL rows, so a mid-series loss day still
    measures its decline from the earlier positive peak."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = df.select(
        key_col,
        order_col,
        F.col(value_cents_col).alias("__v"),
    ).withColumn("__peak", F.max("__v").over(w))
    d = d.filter(F.col("__peak") > 0).withColumn(
        "dd",
        det_round(
            F.lit(1.0) - F.col("__v") / F.col("__peak").cast("double"), scale
        ),
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.col("dd").desc(), F.col(order_col)
    )
    return (
        d.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            key_col,
            F.col("dd").alias("max_drawdown"),
            F.col(order_col).alias("trough_at"),
            F.col("__v").alias("trough_value_cents"),
            F.col("__peak").alias("peak_value_cents"),
        )
    )


def cusum_points_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    delta_cents_col: str,
) -> DataFrame:
    """Row-level one-sided CUSUM s_t = max(0, s_{t-1} + delta_t) over
    each key's rows in ``order_cols`` order, as an added ``cusum_cents``
    column (callers pass delta = x - k with the drift allowance k
    already subtracted, and filter s > h for alarms).

    The max-clamp recurrence has the same closed form
    :func:`clamped_balance_per_key` uses — with prefix sums p_t,
    s_t = p_t - min(0, min_{j<=t} p_j) — but evaluated at EVERY row,
    not just the last: two chained window aggregates over one
    key-partitioned sort, pure whole-stage codegen, exact integers."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col(delta_cents_col).cast("long")).over(w)
    d = df.withColumn("__p", p).withColumn("__minp", F.min("__p").over(w))
    return d.withColumn(
        "cusum_cents",
        F.col("__p") - F.least(F.lit(0).cast("long"), F.col("__minp")),
    ).drop("__p", "__minp")


def ohlc_bars(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_cents_col: str,
) -> DataFrame:
    """Open/high/low/close bars per key group: one hash aggregation,
    no window — open/close ride ``min_by``/``max_by`` on the unique
    (ts, tiebreak) event key, so there is no per-group sort and no
    tie ambiguity. All values integer cents. Returns key_cols +
    (open_cents, high_cents, low_cents, close_cents, n_ticks)."""
    k = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return df.groupBy(*key_cols).agg(
        F.min_by(value_cents_col, k).alias("open_cents"),
        F.max(value_cents_col).alias("high_cents"),
        F.min(value_cents_col).alias("low_cents"),
        F.max_by(value_cents_col, k).alias("close_cents"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def lead_lag_best_corr(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    cents_col: str,
    max_lag: int = 3,
    min_days: int = 10,
) -> DataFrame:
    """For every unordered series pair, the lag in [-max_lag, max_lag]
    maximizing Pearson correlation between a_t and b_{t-lag} — the
    which-indicator-leads scan.

    The b side is exploded over the (2*max_lag + 1)-row lag spine and
    day-shifted, then equi-joined on (day, a < b); all five Pearson
    moments are integer sums (exact in any order). Int64 headroom: the
    binding term is n * sxx ~ n^2 * x^2, which overflows BIGINT around
    x ~ 2.4e8 cents (~$2.5M) per day at n=150 overlapping days —
    pre-scale to whole currency units (or coarser) beyond that; ANSI
    mode turns the overflow into a loud ARITHMETIC_OVERFLOW, never a
    silent wrap (r5 review corrected an overstated headroom claim
    here). The best row per pair is picked on (rounded corr DESC,
    lag ASC) — fully deterministic.
    Degenerate overlaps (constant series -> zero variance) and
    overlaps under ``min_days`` are excluded on both engines."""
    a = daily.select(
        F.col(key_col).alias("ka"), F.col(day_col).alias("day"),
        F.col(cents_col).alias("x"),
    )
    b = (
        daily.select(
            F.col(key_col).alias("kb"), F.col(day_col).alias("bday"),
            F.col(cents_col).alias("y"),
        )
        .withColumn("lag", F.explode(F.sequence(F.lit(-max_lag), F.lit(max_lag))))
        .withColumn("day", F.date_add("bday", F.col("lag")))
    )
    g = (
        a.join(b, ["day"])
        .filter(F.col("ka") < F.col("kb"))
        .groupBy("ka", "kb", "lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
        .filter(F.col("n") >= min_days)
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    scored = g.select(
        F.col("ka").alias("series_a"),
        F.col("kb").alias("series_b"),
        "lag",
        F.col("n").alias("n_days"),
        det_round(num / F.nullif(dx * dy, F.lit(0.0)), 6).alias("corr"),
    ).filter(F.col("corr").isNotNull())
    pick = Window.partitionBy("series_a", "series_b").orderBy(
        F.col("corr").desc(), F.col("lag")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def series_volatility(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    cents_col: str,
    trading_days: int = 252,
) -> DataFrame:
    """Per-series daily log-return stats: (key, n_rets, mean_logret,
    vol_daily, vol_annual). Log returns ln(c_t / c_{t-1}) are rounded
    to 6dp at the ROW level — ln is within-1-ulp, not correctly
    rounded, so engines may differ in the last bit; rounding first
    makes every downstream sum combine identical doubles (the ctfidf
    precedent). Variance is assembled from moment sums (not a builtin
    stddev, whose accumulation algorithm is engine-specific); only
    positive-value days return (a non-positive level has no log
    return), and keys need >= 2 returns for a sample sd."""
    w = Window.partitionBy(key_col).orderBy(day_col)
    d = daily.filter(F.col(cents_col) > 0).withColumn(
        "__prev", F.lag(cents_col).over(w)
    )
    r = d.filter(F.col("__prev") > 0).withColumn(
        "__lr",
        det_round(F.log(F.col(cents_col) / F.col("__prev").cast("double")), 6),
    )
    g = r.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_rets"),
        F.sum("__lr").alias("__s1"),
        F.sum(F.col("__lr") * F.col("__lr")).alias("__s2"),
    ).filter(F.col("n_rets") >= 2)
    var = (F.col("n_rets") * F.col("__s2") - F.col("__s1") * F.col("__s1")) / (
        F.col("n_rets") * (F.col("n_rets") - 1)
    )
    vol = F.sqrt(F.greatest(var, F.lit(0.0)))
    return g.select(
        key_col,
        "n_rets",
        det_round(F.col("__s1") / F.col("n_rets"), 6).alias("mean_logret"),
        det_round(vol, 6).alias("vol_daily"),
        det_round(vol * math.sqrt(trading_days), 6).alias("vol_annual"),
    )


def bollinger_bands(
    d: DataFrame,
    key_col: str,
    order_col: str,
    cents_col: str,
    n: int = 20,
    k: int = 2,
) -> DataFrame:
    """Bollinger bands over an integer-cents series: n-row rolling mean
    +/- k sample standard deviations, with breach flags — the
    mean-reversion trigger on every trading dashboard.

    The rolling first/second moments stay EXACT: the window sums run
    over DECIMAL(38,0) (cents^2 reaches ~1e19 at large SF and would
    overflow BIGINT; a decimal sum is exact at any scale and both
    engines' sliding-window rollups of integers are exact, so the
    add/remove float-rounding divergence between Spark's incremental
    frames and DuckDB's segment trees never appears).

    The breach flags — the query's actual SIGNAL — never touch float
    at all: c > mean + k*sd is algebraically (n*c - S > 0) AND
    (n*c - S)^2 * (n-1) > k^2 * n * (n*Q - S^2), an exact DECIMAL
    integer inequality (and symmetrically for the lower band), so the
    flag bits are hash-stable across engines at any scale. sma/sd are
    emitted as display floats rounded to 2 dp — magnitude-aware for a
    cents series (the r7 driver gate showed that rounding a 1e7-cent
    sd to 6 dp sits below double-ulp resolution of the decimal->double
    cast and is structurally unstable; 2 dp is ~1e6 ulps wide). Only
    rows with a full n-day history are emitted.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(n - 1), 0)
    )
    c = F.col(cents_col).cast("decimal(38,0)")
    rolled = d.select(
        key_col,
        order_col,
        F.col(cents_col),
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum(c).over(w).alias("s_win"),
        F.sum(c * c).over(w).alias("q_win"),
    ).filter(F.col("n_win") == n)
    mean = F.col("s_win").cast("double") / F.lit(n)
    var = (
        F.lit(n) * F.col("q_win") - F.col("s_win") * F.col("s_win")
    ).cast("double") / F.lit(float(n * (n - 1)))
    std = F.sqrt(var)
    # exact-integer band test in DECIMAL: dev = n*c - S,
    # dev^2*(n-1) <> k^2*n*(n*Q - S^2), sign of dev picks the side
    dev = F.lit(n) * F.col(cents_col).cast("decimal(38,0)") - F.col("s_win")
    disc = F.lit(k * k * n) * (
        F.lit(n) * F.col("q_win") - F.col("s_win") * F.col("s_win")
    )
    breach = (dev * dev * F.lit(n - 1)) > disc
    return rolled.select(
        key_col,
        order_col,
        F.col(cents_col),
        det_round(mean, 2).alias("sma"),
        det_round(std, 2).alias("sd"),
        ((dev > 0) & breach).cast("int").alias("above_upper"),
        ((dev < 0) & breach).cast("int").alias("below_lower"),
    )


def rsi_cutler(
    d: DataFrame,
    key_col: str,
    order_col: str,
    cents_col: str,
    n: int = 14,
) -> DataFrame:
    """Cutler's RSI (SMA-smoothed, non-recursive) over an integer-cents
    series: RSI = 100 * sum(gains) / (sum(gains) + sum(losses)) over
    the trailing n diffs — algebraically identical to
    100 - 100/(1+RS) but ONE exact integer ratio, no intermediate
    averages. Wilder's EMA variant is recursive (see
    ema_last_per_key); Cutler's is the window-function form. Rows need
    n complete diffs; an all-flat window (no gains, no losses) emits
    NULL rather than the 0/0 division.
    """
    wl = Window.partitionBy(key_col).orderBy(order_col)
    diffed = d.select(
        key_col,
        order_col,
        (F.col(cents_col) - F.lag(cents_col, 1).over(wl)).alias("diff"),
    ).filter(F.col("diff").isNotNull())
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(n - 1), 0)
    )
    rolled = diffed.select(
        key_col,
        order_col,
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum(F.greatest(F.col("diff"), F.lit(0))).over(w).alias("gain"),
        F.sum(F.greatest(-F.col("diff"), F.lit(0))).over(w).alias("loss"),
    ).filter(F.col("n_win") == n)
    return rolled.select(
        key_col,
        order_col,
        F.col("gain").cast("bigint").alias("gain_cents"),
        F.col("loss").cast("bigint").alias("loss_cents"),
        det_round(
            F.lit(100.0)
            * F.col("gain")
            / F.nullif((F.col("gain") + F.col("loss")).cast("double"), F.lit(0.0)),
            6,
        ).alias("rsi"),
    )


def sma_crossover(
    d: DataFrame,
    key_col: str,
    order_col: str,
    cents_col: str,
    fast: int = 20,
    slow: int = 50,
) -> DataFrame:
    """Golden-cross / death-cross detector over an integer-cents
    series: the fast (n=``fast``) and slow (n=``slow``) simple moving
    averages, whether the fast one currently rides above the slow one,
    and the crossover event (+1 the day fast crosses above, -1 the day
    it crosses below, 0 otherwise) — the trend-following entry/exit
    signal on every trading dashboard.

    The comparison never touches float: SMA_f > SMA_s is
    algebraically S_f * slow > S_s * fast over the exact DECIMAL(38,0)
    window sums, so the regime bit (and therefore the crossover event,
    its lagged difference) is hash-stable across engines at any scale.
    The displayed SMAs are 2-dp floats (magnitude-aware for a cents
    series — the bollinger_bands lesson). Rows need a full ``slow``
    history; events need the previous row too, so the first emitted
    row per key has crossover = 0 by definition (no prior regime).
    """
    if not (0 < fast < slow):
        raise ValueError(f"need 0 < fast < slow, got {fast}, {slow}")
    c = F.col(cents_col).cast("decimal(38,0)")
    wf = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(-(fast - 1), 0)
    ws = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(-(slow - 1), 0)
    rolled = d.select(
        key_col,
        order_col,
        F.count(F.lit(1)).over(ws).alias("n_win"),
        F.sum(c).over(wf).alias("sf"),
        F.sum(c).over(ws).alias("ss"),
    ).filter(F.col("n_win") == slow)
    above = (F.col("sf") * F.lit(slow) > F.col("ss") * F.lit(fast)).cast("int")
    wl = Window.partitionBy(key_col).orderBy(order_col)
    flagged = rolled.select(
        key_col,
        order_col,
        det_round(F.col("sf").cast("double") / F.lit(fast), 2).alias("sma_fast"),
        det_round(F.col("ss").cast("double") / F.lit(slow), 2).alias("sma_slow"),
        above.alias("fast_above"),
    )
    prev = F.lag("fast_above").over(wl)
    return flagged.withColumn(
        "crossover",
        F.coalesce(F.col("fast_above") - prev, F.lit(0)).cast("int"),
    )


def stochastic_k(
    d: DataFrame,
    key_col: str,
    order_col: str,
    cents_col: str,
    n: int = 14,
    hi_ppm: int = 800_000,
    lo_ppm: int = 200_000,
) -> DataFrame:
    """Stochastic oscillator %K over an integer-cents series, in exact
    integer parts-per-million: k_ppm = (c - min_n) * 1e6 div
    (max_n - min_n) with the trailing-n rolling extrema — where the
    close sits inside its recent range, the overbought/oversold
    oscillator. Every emitted value is exact INTEGER arithmetic
    (rolling min/max of integers are exact in any engine; the ppm
    ratio is one truncating integer division — Spark ``div`` == DuckDB
    ``//`` on non-negative operands), so rows are hash-stable.
    A flat window (max == min) emits NULL k_ppm and 0 flags rather
    than 0/0. Rows need a full n-row history.
    """
    w = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(-(n - 1), 0)
    rolled = d.select(
        key_col,
        order_col,
        F.col(cents_col),
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.min(cents_col).over(w).alias("mn"),
        F.max(cents_col).over(w).alias("mx"),
    ).filter(F.col("n_win") == n)
    k_ppm = F.expr(
        f"(({cents_col} - mn) * 1000000) div nullif(mx - mn, 0)"
    ).cast("bigint")
    return rolled.select(
        key_col,
        order_col,
        F.col(cents_col),
        k_ppm.alias("k_ppm"),
        F.coalesce((k_ppm >= hi_ppm).cast("int"), F.lit(0)).alias("overbought"),
        F.coalesce((k_ppm <= lo_ppm).cast("int"), F.lit(0)).alias("oversold"),
    )


def on_balance_volume(
    d: DataFrame,
    key_col: str,
    order_col: str,
    cents_col: str,
    volume_col: str,
) -> DataFrame:
    """On-balance volume per key: the running total of signed volume,
    +volume on an up-move of the price series, -volume on a down-move,
    0 on flat — volume-flow confirmation of a price trend. All
    INTEGER: sign(diff) is exact, the cumulative sum is a BIGINT
    prefix sum over the key-partitioned window (keys here are the
    bounded series domain; the data-sized variant would ride
    distributed_cumsum), so every row is hash-stable across engines.
    The first row per key (no diff) anchors the series with signed
    volume 0.
    """
    wl = Window.partitionBy(key_col).orderBy(order_col)
    wc = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    diffed = d.select(
        key_col,
        order_col,
        F.col(volume_col),
        (F.col(cents_col) - F.lag(cents_col).over(wl)).alias("__diff"),
    )
    signed = diffed.withColumn(
        "signed_volume",
        (
            F.when(F.col("__diff") > 0, F.col(volume_col))
            .when(F.col("__diff") < 0, -F.col(volume_col))
            .otherwise(F.lit(0))
        ).cast("bigint"),
    )
    return signed.select(
        key_col,
        order_col,
        "signed_volume",
        F.sum("signed_volume").over(wc).cast("bigint").alias("obv"),
    )


def seasonal_decompose_dow(
    daily: DataFrame,
    group_cols: list[str],
    day_col: str,
    cents_col: str,
) -> DataFrame:
    """Additive seasonal decomposition of a daily integer-cents series:
    value = trend + seasonal + residual, with a centered 7-row moving
    average as trend and a day-of-week mean of the detrended series as
    the seasonal component (the classical-decomposition recipe, the
    hand-rolled core of STL).

    Cross-engine float discipline: the 7-row trend sum and the
    seasonal numerator ``7*sum(cents) - sum(trend_sum)`` stay exact
    BIGINT through every unordered aggregation — the only float steps
    are closed-form per-row divisions, so both engines agree
    bit-for-bit. Interior rows only (full 7-row windows); the window
    is ROWS-based, so a day absent from the input contributes no
    row rather than a zero (document gaps upstream if they matter).
    Windows and aggregations are group-partitioned — nothing global.

    Returns (group_cols..., day, dow, value, trend, seasonal, resid)
    in dollars, rounded.
    """
    w7 = (
        Window.partitionBy(*group_cols)
        .orderBy(day_col)
        .rowsBetween(-3, 3)
    )
    d = (
        daily.withColumn("__s7", F.sum(cents_col).over(w7).cast("bigint"))
        .withColumn("__n7", F.count(F.lit(1)).over(w7))
        .filter(F.col("__n7") == 7)
        .withColumn("__dow", F.dayofweek(F.col(day_col)).cast("int"))
    )
    seas = d.groupBy(*group_cols, "__dow").agg(
        (
            F.lit(7) * F.sum(cents_col).cast("bigint")
            - F.sum("__s7").cast("bigint")
        ).alias("__num"),
        (F.lit(7) * F.count(F.lit(1))).cast("bigint").alias("__den"),
    )
    out = d.join(F.broadcast(seas), [*group_cols, "__dow"])
    return out.select(
        *group_cols,
        F.col(day_col),
        F.col("__dow").alias("dow"),
        det_round(F.col(cents_col) / 100.0, 2).alias("value"),
        det_round(F.col("__s7") / 700.0, 6).alias("trend"),
        det_round(F.col("__num") / F.col("__den") / 100.0, 6).alias("seasonal"),
        det_round(
            (
                F.col(cents_col)
                - F.col("__s7") / 7.0
                - F.col("__num") / F.col("__den")
            )
            / 100.0,
            6,
        ).alias("resid"),
    )


def ppm_returns(
    daily: DataFrame,
    key_cols: list[str],
    order_col: str,
    cents_col: str,
    out_col: str = "r_ppm",
) -> DataFrame:
    """Day-over-day relative change in EXACT parts-per-million per key:
    r = floor((c_t - c_prev) * 1e6 / c_prev) as BIGINT, via the
    pmod/floor-div identity (Spark's ``div`` truncates toward zero;
    with negative diffs truncation and floor diverge — the signed
    proration lesson, PLANS.md #34). An integer return basis lets
    downstream regressions keep their moment sums exact instead of
    accumulating unordered float error across engines.

    First row per key (no predecessor) is dropped; requires positive
    cents. The lag window partitions per key and the series is
    calendar-bounded (days), so no data-sized sort exists. Overflow
    bound: |diff| * 1e6 must fit BIGINT — daily swing < ~9.2e12 cents.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    d = daily.withColumn("__prev", F.lag(F.col(cents_col)).over(w)).filter(
        F.col("__prev") > 0
    )
    d = d.withColumn(
        "__num", (F.col(cents_col) - F.col("__prev")) * F.lit(1000000).cast("bigint")
    )
    d = d.withColumn("__rem", F.pmod(F.col("__num"), F.col("__prev")))
    return (
        d.withColumn(
            out_col, F.expr("(__num - __rem) div __prev").cast("bigint")
        )
        .drop("__num", "__rem", "__prev")
    )


def changepoint_mean_shift(
    daily: DataFrame, key_cols: list[str], order_col: str, cents_col: str
) -> DataFrame:
    """One binary-segmentation step: the split point k* per key that
    maximizes the scaled mean-shift statistic |n*S_k - k*S_n| over an
    integer-cents series — the changepoint detector behind regime-break
    monitoring (CUSUM flags drift; this LOCATES the break).

    |n*S_k - k*S_n| = n*k*(n-k)/... times the between-segment mean gap;
    maximizing it is equivalent to maximizing the (unnormalized) CUSUM
    deviation, and the statistic stays EXACT BIGINT end-to-end, so the
    argmax (tie-break: earliest day) is bit-stable across engines —
    no float enters until the two segment means at the very end.

    Windows partition per key over a calendar-bounded day series (the
    documented bounded class). Emits one row per key with >= 2 days.
    Overflow bound: n_days * |cents prefix| must fit BIGINT.
    """
    wk = Window.partitionBy(*key_cols)
    wo = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = daily.select(
        *key_cols, order_col, F.col(cents_col).cast("bigint").alias("__c")
    )
    d = (
        d.withColumn("__n", F.count(F.lit(1)).over(wk))
        .withColumn("__tot", F.sum("__c").over(wk))
        .withColumn(
            "__k",
            F.row_number().over(Window.partitionBy(*key_cols).orderBy(order_col)),
        )
        .withColumn("__pre", F.sum("__c").over(wo))
        .filter(F.col("__k") < F.col("__n"))
        .withColumn(
            "__d",
            F.abs(F.col("__n") * F.col("__pre") - F.col("__k") * F.col("__tot")),
        )
    )
    pick = Window.partitionBy(*key_cols).orderBy(
        F.col("__d").desc(), F.col(order_col)
    )
    d = d.withColumn("__r", F.row_number().over(pick)).filter(F.col("__r") == 1)
    mean_b = F.col("__pre").cast("double") / F.col("__k") / F.lit(100.0)
    mean_a = (
        (F.col("__tot") - F.col("__pre")).cast("double")
        / (F.col("__n") - F.col("__k"))
        / F.lit(100.0)
    )
    return d.select(
        *key_cols,
        F.col(order_col).alias("change_point"),
        F.col("__k").cast("bigint").alias("n_before"),
        (F.col("__n") - F.col("__k")).cast("bigint").alias("n_after"),
        det_round(mean_b, 2).alias("mean_before"),
        det_round(mean_a, 2).alias("mean_after"),
        det_round(mean_a - mean_b, 2).alias("mean_shift"),
    )


def seasonal_naive_backtest(
    daily: DataFrame,
    key_cols: list[str],
    order_col: str,
    cents_col: str,
    season: int = 7,
) -> DataFrame:
    """Backtest the seasonal-naive forecast (f_t = value_{t-season})
    per key: the baseline every real forecast must beat, and the
    missing EVALUATION leg of the forecasting family (holt/seasonal
    decompose produce forecasts; this scores one).

    All error aggregates are exact: e_t is an integer diff, |e| and
    e^2 sum in BIGINT/DECIMAL(38,0), and the reported MAE / RMSE /
    WAPE are single closed-form floats on those sums. WAPE
    (sum|e| / sum actual) deliberately replaces MAPE: a per-row
    ratio average would be an unordered float SUM across engines,
    while WAPE is a ratio of two exact integers. Lag window is per
    key over the calendar-bounded day series.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    d = daily.withColumn("__f", F.lag(F.col(cents_col), season).over(w)).filter(
        F.col("__f").isNotNull()
    )
    e = (F.col(cents_col) - F.col("__f")).cast("bigint")
    d = d.withColumn("__ae", F.abs(e)).withColumn(
        "__se", (e.cast("decimal(38,0)") * e.cast("decimal(38,0)"))
    )
    return d.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        det_round(
            F.sum("__ae").cast("double") / F.count(F.lit(1)).cast("double") / 100.0,
            2,
        ).alias("mae"),
        det_round(
            F.sqrt(
                F.sum("__se").cast("double") / F.count(F.lit(1)).cast("double")
            )
            / 100.0,
            2,
        ).alias("rmse"),
        det_round(
            F.sum("__ae").cast("double")
            / F.nullif(F.sum(F.abs(F.col(cents_col))).cast("double"), F.lit(0.0)),
            6,
        ).alias("wape"),
    )


def split_conformal_coverage(
    d: DataFrame,
    key_cols: list[str],
    order_col: str,
    cents_col: str,
    season: int = 7,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal prediction-interval calibration for the
    seasonal-naive forecaster, per key: does the distribution-free
    interval |y - y_hat| <= q_hat actually cover (1 - alpha) of unseen
    points? The honest-uncertainty companion to
    seasonal_naive_backtest's point metrics.

    Split conformal (Vovk; Lei et al. 2018): residuals r_t = c_t -
    c_{t-season} split chronologically in half; q_hat is the
    ceil((1-alpha)(m+1))-th order statistic of |r| on the calibration
    half (capped at the max — finite-sample correctness), coverage is
    the eval-half share with |r| <= q_hat. EVERYTHING is integer:
    residuals are exact diffs, the order statistic is a row_number
    pick inside the key's partition (bounded per-key domain, the
    ks_two_sample shape), coverage is an int/int display ratio.
    Returns (key..., n_eval, q_hat_cents, coverage, target).
    """
    wl = Window.partitionBy(*key_cols).orderBy(order_col)
    r = (
        d.select(
            *key_cols,
            order_col,
            (F.col(cents_col) - F.lag(cents_col, season).over(wl)).alias("r"),
        )
        .filter(F.col("r").isNotNull())
        .withColumn("rn", F.row_number().over(wl))
        .withColumn("n_tot", F.count(F.lit(1)).over(Window.partitionBy(*key_cols)))
        .withColumn("m", F.expr("n_tot div 2"))
        .withColumn("is_cal", (F.col("rn") <= F.col("m")).cast("int"))
    )
    wa = Window.partitionBy(*key_cols).orderBy(F.abs(F.col("r")), F.col(order_col))
    cal = r.filter(F.col("is_cal") == 1).withColumn(
        "arn", F.row_number().over(wa)
    )
    k = F.least(
        F.ceil(F.lit(1.0 - alpha) * (F.col("m") + 1)).cast("bigint"), F.col("m")
    )
    qhat = cal.filter(F.col("arn") == k).select(
        *key_cols, F.abs(F.col("r")).cast("bigint").alias("q_hat_cents")
    )
    ev = r.filter(F.col("is_cal") == 0)
    cov = (
        ev.join(qhat, key_cols)
        .groupBy(*key_cols, "q_hat_cents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum((F.abs(F.col("r")) <= F.col("q_hat_cents")).cast("int"))
            .cast("bigint")
            .alias("n_cover"),
        )
    )
    return cov.select(
        *key_cols,
        (F.col("n_eval")).alias("n_eval"),
        "q_hat_cents",
        det_round(
            F.col("n_cover").cast("double") / F.col("n_eval"), 6
        ).alias("coverage"),
        F.lit(round(1.0 - alpha, 6)).alias("target"),
    )
