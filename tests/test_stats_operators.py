"""Statistical operators (operators/stats.py) against literal
references computed independently in Python — AUC vs the O(n^2)
pairwise definition, Spearman vs hand-averaged ranks, chi-square vs
the textbook formula, Welch vs two-pass moments, ACF vs the numpy
definition, Kaplan-Meier vs a hand-walked product — so the doubled-
rank / n-scaled-centering / exp-sum-log shortcuts in the distributed
forms are pinned to the definitions they claim to equal."""

from __future__ import annotations

import math

import pytest

from finance_reporting_etl_spark.operators import stats


def _pairwise_auc(pairs):
    """O(n^2) definition: P(score_pos > score_neg) + 0.5*ties."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_matches_pairwise_definition_with_ties(spark):
    rows = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 0), (0.7, 1),
        (0.7, 0), (0.5, 0), (0.5, 1), (0.3, 0), (0.1, 0),
    ]
    df = spark.createDataFrame(rows, "score double, y int")
    got = stats.mann_whitney_auc(df, "score", "y").collect()[0]
    assert got.n_pos == 4 and got.n_neg == 6
    assert got.auc == pytest.approx(round(_pairwise_auc(rows), 6), abs=1e-9)


def test_auc_perfect_and_reversed(spark):
    perfect = [(1.0, 1), (0.9, 1), (0.2, 0), (0.1, 0)]
    df = spark.createDataFrame(perfect, "score double, y int")
    assert stats.mann_whitney_auc(df, "score", "y").collect()[0].auc == 1.0
    flipped = [(s, 1 - y) for s, y in perfect]
    df2 = spark.createDataFrame(flipped, "score double, y int")
    assert stats.mann_whitney_auc(df2, "score", "y").collect()[0].auc == 0.0


def test_spearman_matches_hand_averaged_ranks(spark):
    # x strictly increasing, y = x reversed with one tie pair in y
    rows = [(1, 10), (2, 8), (3, 8), (4, 5), (5, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = stats.doubled_avg_rank(df, "x", "rx2")
    r = stats.doubled_avg_rank(r, "y", "ry2")
    got = stats.spearman_from_doubled_ranks(r, "rx2", "ry2").collect()[0]
    # hand ranks: x -> 1,2,3,4,5 ; y -> 5, 3.5, 3.5, 2, 1
    xs, ys = [1, 2, 3, 4, 5], [5, 3.5, 3.5, 2, 1]
    n = 5
    sx, sy = sum(xs), sum(ys)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    den = math.sqrt(
        (n * sum(a * a for a in xs) - sx * sx)
        * (n * sum(b * b for b in ys) - sy * sy)
    )
    assert got.spearman_rho == pytest.approx(round(num / den, 6), abs=1e-9)


def test_doubled_rank_is_twice_average_rank(spark):
    df = spark.createDataFrame(
        [(10,), (20,), (20,), (20,), (30,)], "v long"
    )
    got = sorted(
        r.r2 for r in stats.doubled_avg_rank(df, "v", "r2").collect()
    )
    # avg ranks: 1, 3, 3, 3, 5 -> doubled 2, 6, 6, 6, 10
    assert got == [2, 6, 6, 6, 10]


def test_chi_square_cells_sum_to_textbook_statistic(spark):
    # 2x2 with known chi2: rows a/b, cols x/y
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 20 + [("b", "y")] * 40
    )
    df = spark.createDataFrame(rows, "r string, c string")
    cells = stats.chi_square_cells(df, "r", "c").collect()
    assert len(cells) == 4
    chi2 = sum(c.chi2_contrib for c in cells)
    # textbook: E_ax = E_ay = 40*50/100 = 20, E_bx = E_by = 60*50/100 = 30
    want = (10 * 10) / 20 + (10 * 10) / 20 + (10 * 10) / 30 + (10 * 10) / 30
    assert chi2 == pytest.approx(want, abs=1e-5)
    e = {(c.r, c.c): c.expected for c in cells}
    assert e[("a", "x")] == 20.0 and e[("b", "y")] == 30.0


def test_welch_t_matches_two_pass_moments(spark):
    a = [100, 200, 300, 400, 500]          # cents
    b = [150, 150, 160, 170]
    rows = [("g1", v) for v in a] + [("g2", v) for v in b]
    df = spark.createDataFrame(rows, "g string, cents long")
    got = stats.welch_t_from_cents(df, "g", "cents", "g1", "g2").collect()[0]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((v - ma) ** 2 for v in a) / (len(a) - 1)
    vb = sum((v - mb) ** 2 for v in b) / (len(b) - 1)
    se2a, se2b = va / len(a), vb / len(b)
    t = (ma - mb) / math.sqrt(se2a + se2b)
    dfw = (se2a + se2b) ** 2 / (
        se2a**2 / (len(a) - 1) + se2b**2 / (len(b) - 1)
    )
    assert got.t_stat == pytest.approx(round(t, 6), abs=1e-6)
    assert got.df_welch == pytest.approx(round(dfw, 6), abs=1e-6)
    assert got.mean_a == pytest.approx(ma / 100, abs=1e-9)


def test_acf_matches_numpy_definition(spark):
    import numpy as np

    x = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [(i, v) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "t int, cents long")
    got = {r.lag: r.acf for r in stats.acf_table(df, "t", "cents", 3).collect()}
    arr = np.array(x, dtype=float)
    y = arr - arr.mean()
    den = float((y * y).sum())
    for k in (1, 2, 3):
        want = float((y[k:] * y[:-k]).sum()) / den
        assert got[k] == pytest.approx(round(want, 6), abs=1e-9)


def test_acf_lag_counts(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(10)], "t int, cents long"
    )
    out = {r.lag: r for r in stats.acf_table(df, "t", "cents", 2).collect()}
    assert out[1].n_terms == 9 and out[2].n_terms == 8
    assert out[1].n_days == 10


def test_kaplan_meier_hand_walked_curve(spark):
    # durations: events at t=2 (2 of them), t=5; censored at t=3, t=7
    rows = [(2, 1), (2, 1), (3, 0), (5, 1), (7, 0)]
    df = spark.createDataFrame(rows, "dur long, evt int")
    got = {r.dur: r for r in stats.kaplan_meier(df, "dur", "evt").collect()}
    # t=2: n_risk=5, d=2 -> S = 3/5 = 0.6
    # t=5: n_risk=2 (censor at 3 removed), d=1 -> S = 0.6 * 1/2 = 0.3
    assert set(got) == {2, 5}
    assert got[2].n_risk == 5 and got[2].d == 2
    assert got[2].survival == pytest.approx(0.6, abs=1e-9)
    assert got[5].n_risk == 2 and got[5].d == 1
    assert got[5].survival == pytest.approx(0.3, abs=1e-9)


def test_kaplan_meier_everyone_exits_last_event(spark):
    # last event time empties the risk set: survival pinned to 0.0,
    # no ln(0) ever evaluated
    rows = [(1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(rows, "dur long, evt int")
    got = {r.dur: r for r in stats.kaplan_meier(df, "dur", "evt").collect()}
    assert got[1].survival == pytest.approx(2 / 3, abs=1e-6)
    assert got[2].n_risk == 2 and got[2].d == 2
    assert got[2].survival == 0.0


def test_auc_single_class_is_null_not_nan(spark):
    """n_pos = 0 (or n_neg = 0) has no defined AUC: both engines must
    emit NULL (ADVICE r5 — Spark NaN vs DuckDB NULL divergence)."""
    df = spark.createDataFrame([(0.4, 0), (0.9, 0)], "score double, y int")
    r = stats.mann_whitney_auc(df, "score", "y").collect()[0]
    assert r.n_pos == 0 and r.auc is None
    df2 = spark.createDataFrame([(0.4, 1), (0.9, 1)], "score double, y int")
    r2 = stats.mann_whitney_auc(df2, "score", "y").collect()[0]
    assert r2.n_neg == 0 and r2.auc is None


def test_welch_t_degenerate_groups_null_not_nan(spark):
    """n = 1 in either group (no sample variance) and zero-variance
    pairs must yield NULL t/df, matching DuckDB's div-by-zero NULL."""
    df = spark.createDataFrame(
        [("a", 100), ("a", 200), ("b", 150)], "g string, cents long"
    )
    r = stats.welch_t_from_cents(df, "g", "cents", "a", "b").collect()[0]
    assert r.n_b == 1 and r.t_stat is None and r.df_welch is None
    # both groups constant -> zero pooled variance -> NULL, not +-Inf
    df2 = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 50), ("b", 50)],
        "g string, cents long",
    )
    r2 = stats.welch_t_from_cents(df2, "g", "cents", "a", "b").collect()[0]
    assert r2.t_stat is None and r2.df_welch is None


def _sprt_reference(stream, p0, p1, alpha=0.05, beta=0.05):
    """Literal Wald walk: scan observations in order, stop at the
    first LLR outside (log(beta/(1-alpha)), log((1-beta)/alpha))."""
    l1 = math.log(p1 / p0)
    l0 = math.log((1 - p1) / (1 - p0))
    hi = math.log((1 - beta) / alpha)
    lo = math.log(beta / (1 - alpha))
    conv = 0
    llr = 0.0
    for t, x in enumerate(stream, 1):
        conv += x
        llr = conv * l1 + (t - conv) * l0
        if llr >= hi:
            return t, conv, llr, "accept_h1"
        if llr <= lo:
            return t, conv, llr, "accept_h0"
    return len(stream), conv, llr, "continue"


def test_sprt_matches_literal_wald_walk(spark):
    # arm A: heavy successes -> accept_h1 early; arm B: all failures
    # -> accept_h0; exercised against the scanned reference.
    a_stream = [1, 1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1]
    b_stream = [0] * 12
    rows = [("A", i + 1, i + 1, x) for i, x in enumerate(a_stream)]
    rows += [("B", i + 1, 100 + i, x) for i, x in enumerate(b_stream)]
    df = spark.createDataFrame(rows, "arm string, t_us long, tb long, conv int")
    got = {
        r.arm: r
        for r in stats.sprt_decision(
            df, "arm", "t_us", "tb", "conv", ["A", "B"], p0=0.3, p1=0.7
        ).collect()
    }
    for arm, stream in (("A", a_stream), ("B", b_stream)):
        t, conv, llr, dec = _sprt_reference(stream, 0.3, 0.7)
        assert got[arm].n_obs == t, arm
        assert got[arm].n_conv == conv, arm
        assert got[arm].decision == dec, arm
        assert got[arm].llr == pytest.approx(round(llr, 6), abs=1e-9)


def test_sprt_continue_when_no_crossing(spark):
    # alternate successes/failures with symmetric hypotheses: LLR
    # oscillates near 0 and never leaves Wald's band.
    rows = [("A", i + 1, i, i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "arm string, t_us long, tb long, conv int")
    got = stats.sprt_decision(
        df, "arm", "t_us", "tb", "conv", ["A"], p0=0.4, p1=0.6
    ).collect()[0]
    assert got.decision == "continue" and got.n_obs == 10 and got.n_conv == 5


def test_ols_recovers_exact_line_and_guards_degenerate(spark):
    # y = 2x + 3 exactly -> beta 2, alpha 3, r2 1; a zero-variance-x
    # key must emit NULLs (nullif guard), never NaN.
    line = [("k", x, 2 * x + 3) for x in range(-5, 6)]
    flat = [("z", 7, y) for y in (1, 2, 3)]
    df = spark.createDataFrame(line + flat, "k string, x long, y long")
    got = {r.k: r for r in stats.ols_beta_alpha_r2(df, ["k"], "x", "y").collect()}
    assert got["k"].beta == pytest.approx(2.0)
    assert got["k"].alpha == pytest.approx(3.0)
    assert got["k"].r2 == pytest.approx(1.0)
    assert got["z"].beta is None and got["z"].alpha is None and got["z"].r2 is None


def test_ols_matches_numpy_polyfit(spark):
    import numpy as np

    xs = [3, 14, 15, 92, 65, 35, 89, 79, 32, 38]
    ys = [27, 18, 28, 18, 28, 45, 90, 45, 23, 53]
    df = spark.createDataFrame(
        [("k", x, y) for x, y in zip(xs, ys)], "k string, x long, y long"
    )
    got = stats.ols_beta_alpha_r2(df, ["k"], "x", "y").collect()[0]
    beta, alpha = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
    r = np.corrcoef(xs, ys)[0, 1]
    assert got.beta == pytest.approx(beta, abs=1e-6)
    assert got.alpha == pytest.approx(alpha, abs=1e-6)
    assert got.r2 == pytest.approx(r * r, abs=1e-6)


def test_mahalanobis_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    xs = rng.randint(100, 10000, 60)
    ys = rng.randint(0, 24, 60)
    xs[7], ys[7] = 90000, 23  # inject an outlier
    rows = [("g", int(a), int(b)) for a, b in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = stats.mahalanobis2_outliers(df, ["g"], "x", "y").collect()[0]

    X = np.column_stack([xs, ys]).astype(float)
    mu = X.mean(axis=0)
    cov = np.cov(X.T, bias=True)
    inv = np.linalg.inv(cov)
    d2 = np.einsum("ij,jk,ik->i", X - mu, inv, X - mu)
    exp = int((d2 > 13.815510557964274).sum())
    assert got.n_events == 60
    assert got.n_outliers == exp >= 1


def test_mahalanobis_singular_cov_flags_nothing(spark):
    rows = [("g", x, 5) for x in range(20)]  # constant y -> det == 0
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = stats.mahalanobis2_outliers(df, ["g"], "x", "y").collect()[0]
    assert got.n_outliers == 0


def test_kendall_tau_matches_scipy_formula(spark):
    """Pin tau-b to the O(n^2) textbook computation with ties."""
    xs = [3, 5, 5, 7, 2, 9, 5, 1, 7, 4]
    ys = [1, 4, 4, 9, 2, 8, 3, 1, 9, 4]
    rows = [(i, x, y) for i, (x, y) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(rows, "o int, x long, y long")
    got = stats.kendall_tau_b(df, "o", "x", "y").collect()[0]
    C = D = tx = ty = txy = 0
    n = len(xs)
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = xs[i] - xs[j], ys[i] - ys[j]
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
            elif dx == 0 and dy == 0:
                txy += 1
            elif dx == 0:
                tx += 1
            else:
                ty += 1
    n0 = n * (n - 1) // 2
    tau = (C - D) / math.sqrt((n0 - tx - txy) * (n0 - ty - txy))
    assert got.n_pairs == n0
    assert (got.concordant, got.discordant) == (C, D)
    assert got.tau_b == pytest.approx(round(tau, 6), abs=1e-9)


def test_kendall_tau_perfect_and_reversed(spark):
    rows = [(i, i, i * 2) for i in range(8)]
    df = spark.createDataFrame(rows, "o int, x long, y long")
    assert stats.kendall_tau_b(df, "o", "x", "y").collect()[0].tau_b == 1.0
    rows = [(i, i, -3 * i) for i in range(8)]
    df = spark.createDataFrame(rows, "o int, x long, y long")
    assert stats.kendall_tau_b(df, "o", "x", "y").collect()[0].tau_b == -1.0
