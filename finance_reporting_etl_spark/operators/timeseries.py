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

import pandas as pd

from pyspark.sql import DataFrame


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
    an independent engine reproduces it exactly."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        xs = pdf[value_col].astype("float64").to_numpy()
        s = xs[0]
        for x in xs[1:]:
            s = alpha * x + (1.0 - alpha) * s
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(xs)],
                "ema_final": [round(float(s), scale)],
            }
        )

    out_schema = f"{key_col} long, n_events long, ema_final double"
    return df.groupBy(key_col).applyInPandas(fold, schema=out_schema)


def clamped_balance_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    delta_col: str,
    floor: int = 0,
) -> DataFrame:
    """(key, n_events, final_balance): running balance with a floor —
    b_t = max(floor, b_{t-1} + delta_t) — folded over each key's rows
    in ``order_cols`` order. The clamp makes this recursive (the max
    depends on the previous partial result), so like the EMA it is
    inexpressible as a window aggregate; unlike the EMA the deltas are
    integers, so the fold is EXACT in any engine. Same applyInPandas
    envelope: one shuffle on the key, one group per task."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        b = 0
        for d in pdf[delta_col].astype("int64").to_numpy():
            b = max(floor, b + int(d))
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(pdf)],
                "final_balance": [b],
            }
        )

    out_schema = f"{key_col} long, n_events long, final_balance long"
    return df.groupBy(key_col).applyInPandas(fold, schema=out_schema)


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
                "level": [round(float(l), scale)],
                "trend": [round(float(b), scale)],
                "forecast_1": [round(float(l + b), scale)],
                "forecast_7": [round(float(l + 7.0 * b), scale)],
            }
        )

    out_schema = (
        f"{key_col} string, n_obs long, level double, trend double, "
        "forecast_1 double, forecast_7 double"
    )
    return df.groupBy(key_col).applyInPandas(fold, schema=out_schema)
