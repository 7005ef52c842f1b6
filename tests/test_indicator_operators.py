"""Trading-indicator operators (operators/timeseries.py additions)
against hand-computed references: Bollinger moments vs two-pass
mean/std, RSI vs the textbook 100 - 100/(1+RS) form, and the
degenerate all-flat window."""

from __future__ import annotations

import math

import pytest

from finance_reporting_etl_spark.operators.timeseries import (
    bollinger_bands,
    rsi_cutler,
)


def _mk(spark, vals, key="s"):
    rows = [(key, i, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "series string, day int, cents long")


def test_bollinger_matches_two_pass_moments(spark):
    vals = [100, 120, 90, 130, 110, 95, 160, 140, 105, 125]
    d = _mk(spark, vals)
    out = {r.day: r for r in bollinger_bands(d, "series", "day", "cents", n=5, k=2).collect()}
    # first full window ends at index 4
    assert sorted(out) == [4, 5, 6, 7, 8, 9]
    for end in out:
        win = vals[end - 4 : end + 1]
        m = sum(win) / 5
        sd = math.sqrt(sum((v - m) ** 2 for v in win) / 4)
        assert out[end].sma == pytest.approx(round(m, 2), abs=1e-9)
        assert out[end].sd == pytest.approx(round(sd, 2), abs=1e-9)
        assert out[end].above_upper == int(vals[end] > m + 2 * sd)
        assert out[end].below_lower == int(vals[end] < m - 2 * sd)


def test_bollinger_flags_an_injected_spike(spark):
    # the current row is part of its own window, so a lone spike in an
    # n-point window peaks at z = (n-1)/sqrt(n); with n=5 that is
    # 4/sqrt(5) = 1.79 — below k=2 by construction, so the breach test
    # uses k=1 (and the flat-window row pins sd == 0 exactly)
    vals = [100] * 9 + [100000]
    d = _mk(spark, vals)
    out = {r.day: r for r in bollinger_bands(d, "series", "day", "cents", n=5, k=1).collect()}
    assert out[8].above_upper == 0 and out[8].sd == 0.0
    assert out[9].above_upper == 1


def test_rsi_matches_textbook_form(spark):
    vals = [100, 105, 103, 108, 104, 110, 109, 115]  # 7 diffs
    d = _mk(spark, vals)
    out = {r.day: r for r in rsi_cutler(d, "series", "day", "cents", n=3).collect()}
    diffs = [b - a for a, b in zip(vals, vals[1:])]
    # windows of 3 diffs end at value index >= 3
    for day, r in out.items():
        win = diffs[day - 3 : day]
        g = sum(x for x in win if x > 0)
        l = -sum(x for x in win if x < 0)
        assert r.gain_cents == g and r.loss_cents == l
        rs = g / l
        textbook = 100 - 100 / (1 + rs)
        assert r.rsi == pytest.approx(round(textbook, 6), abs=1e-6)


def test_rsi_flat_window_is_null_and_all_gain_is_100(spark):
    vals = [100, 100, 100, 100, 101, 102, 103]
    d = _mk(spark, vals)
    out = {r.day: r for r in rsi_cutler(d, "series", "day", "cents", n=3).collect()}
    assert out[3].rsi is None                 # 0 gain, 0 loss
    assert out[6].rsi == 100.0                # gains only


def test_rsi_and_bollinger_are_per_key(spark):
    rows = [("a", i, 100 + i) for i in range(6)] + [
        ("b", i, 200 - i) for i in range(6)
    ]
    d = spark.createDataFrame(rows, "series string, day int, cents long")
    rsi = rsi_cutler(d, "series", "day", "cents", n=3).collect()
    assert {r.series for r in rsi} == {"a", "b"}
    assert all(r.rsi == 100.0 for r in rsi if r.series == "a")
    assert all(r.rsi == 0.0 for r in rsi if r.series == "b")


def test_ppm_returns_floor_semantics_on_negative_diffs(spark):
    from finance_reporting_etl_spark.operators.timeseries import ppm_returns

    # 3 -> 1: floor(-2e6/3) = -666667 (truncation would give -666666);
    # 1 -> 3: floor(2e6/1) = 2000000. First row has no predecessor.
    rows = [("k", 1, 3), ("k", 2, 1), ("k", 3, 3)]
    df = spark.createDataFrame(rows, "k string, day int, c long")
    got = {r.day: r.r_ppm for r in ppm_returns(df, ["k"], "day", "c").collect()}
    assert got == {2: -666667, 3: 2000000}


def test_changepoint_finds_injected_level_break(spark):
    from finance_reporting_etl_spark.operators.timeseries import (
        changepoint_mean_shift,
    )

    # 1000-cent regime for 4 days, then 5000-cent regime for 3 days:
    # the argmax split must land after day 4, with means 10.0 / 50.0.
    rows = [("k", d, 1000) for d in range(1, 5)]
    rows += [("k", d, 5000) for d in range(5, 8)]
    # second key: brute-force the argmax over all splits by hand
    vals = [120, 80, 410, 390, 400, 95]
    rows += [("j", d, v) for d, v in enumerate(vals, 1)]
    df = spark.createDataFrame(rows, "k string, day int, c long")
    got = {r.k: r for r in changepoint_mean_shift(df, ["k"], "day", "c").collect()}
    k = got["k"]
    assert (k.change_point, k.n_before, k.n_after) == (4, 4, 3)
    assert (k.mean_before, k.mean_after, k.mean_shift) == (10.0, 50.0, 40.0)
    n, tot = len(vals), sum(vals)
    pre = 0
    best = None
    for kk, v in enumerate(vals[:-1], 1):
        pre += v
        d_stat = abs(n * pre - kk * tot)
        if best is None or d_stat > best[0]:
            best = (d_stat, kk)
    j = got["j"]
    assert j.change_point == best[1]
    assert j.mean_shift == pytest.approx(
        round(
            (tot - sum(vals[: best[1]])) / (n - best[1]) / 100
            - sum(vals[: best[1]]) / best[1] / 100,
            2,
        )
    )


def test_seasonal_naive_backtest_hand_computed(spark):
    from finance_reporting_etl_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    # 10 days, season 3: eval days 4..10 with f_t = c_{t-3}
    cents = [100, 200, 300, 130, 260, 270, 160, 220, 330, 190]
    rows = [("k", d + 1, c) for d, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "k string, day int, c long")
    got = seasonal_naive_backtest(df, ["k"], "day", "c", season=3).collect()[0]
    errs = [cents[i] - cents[i - 3] for i in range(3, 10)]
    n = len(errs)
    mae = round(sum(abs(e) for e in errs) / n / 100.0, 2)
    rmse = round((sum(e * e for e in errs) / n) ** 0.5 / 100.0, 2)
    wape = round(
        sum(abs(e) for e in errs) / sum(abs(c) for c in cents[3:]), 6
    )
    assert (got.n_eval, got.mae, got.rmse, got.wape) == (n, mae, rmse, wape)
