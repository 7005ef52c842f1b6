"""Round-8 operators against hand-computed references: SMA crossover
regime/events, stochastic %K integer ppm, on-balance volume, HIFO lot
matching (cost-descending consumption), containment prefix filtering,
and the trial-balance double-entry invariant."""

from __future__ import annotations

import pytest

from finance_reporting_etl_spark.operators.timeseries import (
    on_balance_volume,
    sma_crossover,
    stochastic_k,
)


def _mk(spark, vals, key="s"):
    rows = [(key, i, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "series string, day int, cents long")


def test_sma_crossover_detects_golden_and_death_cross(spark):
    # fast=2, slow=3: construct a series where the fast SMA crosses
    # above then back below the slow SMA; verify against brute force.
    vals = [100, 100, 100, 200, 300, 100, 50, 50]
    d = _mk(spark, vals)
    out = {
        r.day: r
        for r in sma_crossover(d, "series", "day", "cents", fast=2, slow=3).collect()
    }
    assert sorted(out) == [2, 3, 4, 5, 6, 7]
    prev_above = None
    for day in sorted(out):
        win_f = vals[day - 1 : day + 1]
        win_s = vals[day - 2 : day + 1]
        sf, ss = sum(win_f), sum(win_s)
        above = int(sf * 3 > ss * 2)
        r = out[day]
        assert r.fast_above == above
        assert r.sma_fast == pytest.approx(round(sf / 2, 2))
        assert r.sma_slow == pytest.approx(round(ss / 3, 2))
        want_x = 0 if prev_above is None else above - prev_above
        assert r.crossover == want_x, day
        prev_above = above
    # the construction really exercised both events
    xs = [out[d].crossover for d in sorted(out)]
    assert 1 in xs and -1 in xs


def test_stochastic_k_exact_ppm_and_flat_window(spark):
    vals = [100, 200, 150, 100, 100, 100]
    d = _mk(spark, vals)
    out = {
        r.day: r
        for r in stochastic_k(d, "series", "day", "cents", n=3).collect()
    }
    assert sorted(out) == [2, 3, 4, 5]
    for day in [2, 3, 4]:
        win = vals[day - 2 : day + 1]
        mn, mx = min(win), max(win)
        want = (vals[day] - mn) * 1_000_000 // (mx - mn)
        assert out[day].k_ppm == want
    # flat window: NULL k, zero flags (not 0/0)
    assert out[5].k_ppm is None
    assert out[5].overbought == 0 and out[5].oversold == 0
    # boundary flags
    assert out[3].oversold == 1  # k = 0
    assert out[2].k_ppm == 500_000


def test_on_balance_volume_hand_computed(spark):
    rows = [("s", i, c, v) for i, (c, v) in enumerate(
        [(100, 10), (120, 5), (120, 7), (90, 3), (95, 2)]
    )]
    d = spark.createDataFrame(rows, "series string, day int, cents long, vol long")
    out = {r.day: r for r in on_balance_volume(d, "series", "day", "cents", "vol").collect()}
    # diffs: None, +20, 0, -30, +5 -> signed: 0, +5, 0, -3, +2
    assert [out[i].signed_volume for i in range(5)] == [0, 5, 0, -3, 2]
    assert [out[i].obv for i in range(5)] == [0, 5, 5, 2, 4]


def test_hifo_consumes_highest_cost_lot_first(spark):
    from finance_reporting_etl_spark.operators.allocation import fifo_match

    # two lots: day1 qty 10 @ 1c/unit (total 10), day2 qty 10 @ 5c/unit
    # (total 50); one sale of qty 10 @ 3c/unit (total 30).
    # FIFO matches the day-1 (cheap) lot: pnl = 30 - 10 = +20.
    # HIFO matches the day-2 (expensive) lot: pnl = 30 - 50 = -20.
    buys = spark.createDataFrame(
        [("k", 1, 1, 10, 10), ("k", 2, 2, 10, 50)],
        "k string, d int, tb int, qty long, total long",
    )
    sells = spark.createDataFrame(
        [("k", 3, 3, 10, 30)], "k string, d int, tb int, qty long, total long"
    )
    fifo = fifo_match(buys, sells, ["k"], ["d", "tb"], "qty", "total").collect()
    assert len(fifo) == 1 and fifo[0].b_total == 10
    from pyspark.sql import functions as F

    hbuys = buys.withColumn("negu", -(F.col("total").cast("double") / F.col("qty")))
    hifo = fifo_match(
        hbuys, sells.withColumn("negu", F.lit(0.0)),
        ["k"], ["d", "tb"], "qty", "total", buy_order_cols=["negu", "tb"],
    ).collect()
    assert len(hifo) == 1 and hifo[0].b_total == 50


def test_containment_catches_subset_doc_jaccard_misses(spark):
    from finance_reporting_etl_spark.operators.dedup import (
        containment_prefix_filter_pairs,
        jaccard_prefix_filter_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    big = small + " " + " ".join(f"extra{i}" for i in range(40))
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, other)], "doc_id long, text string"
    )
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in containment_prefix_filter_pairs(df, threshold=0.9).collect()
    }
    # small fully contained in big (containment 1.0, directional);
    # big is NOT contained in small; other matches nothing
    assert cont == {(1, 2): 1.0}
    jac = jaccard_prefix_filter_pairs(df, threshold=0.6).collect()
    assert jac == []  # jaccard(small, big) = 10/50 = 0.2 — diluted away


def test_trial_balance_debits_equal_credits(spark, duck):
    from finance_reporting_etl_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = CATALOG["trial_balance_monthly"].fn(spark, SF_SMOKE).collect()
    assert sum(r.debit_cents for r in out) == sum(r.credit_cents for r in out)
    # AR nets to gross orders minus returns; revenue is all credit
    rev = [r for r in out if r.account == "revenue"]
    assert all(r.debit_cents == 0 for r in rev)
    ret = [r for r in out if r.account == "sales_returns"]
    assert all(r.credit_cents == 0 for r in ret)


def test_mann_whitney_u_matches_scipy_formula_by_hand(spark):
    from finance_reporting_etl_spark.operators.drift import mann_whitney_u

    # group 1: [1, 2, 2, 5]; group 2: [2, 3, 3, 7, 8]
    g1 = [1, 2, 2, 5]
    g2 = [2, 3, 3, 7, 8]
    rows = [("k", v, 1) for v in g1] + [("k", v, 2) for v in g2]
    df = spark.createDataFrame(rows, "k string, v long, g int")
    out = mann_whitney_u(df, "k", "v", "g").collect()[0]
    # midranks: value 1 -> 1; 2,2,2 -> 3; 3,3 -> 5.5; 5 -> 7; 7 -> 8; 8 -> 9
    r1 = 1 + 3 + 3 + 7          # rank sum of group 1 = 14
    u1 = r1 - len(g1) * (len(g1) + 1) / 2   # = 4
    assert out.n1 == 4 and out.n2 == 5
    assert out.u2 == int(2 * u1)
    # z with tie correction, textbook form
    import math

    n1, n2 = 4, 5
    n = n1 + n2
    s3 = (3**3 - 3) + (2**3 - 2)            # tie groups of size 3 and 2
    var = n1 * n2 * ((n + 1) * n * (n - 1) - s3) / (12 * n * (n - 1))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    assert out.z == pytest.approx(round(z, 6), abs=1e-6)


def test_mann_whitney_all_tied_emits_null_z(spark):
    from finance_reporting_etl_spark.operators.drift import mann_whitney_u

    rows = [("k", 5, 1)] * 3 + [("k", 5, 2)] * 4
    df = spark.createDataFrame(rows, "k string, v long, g int")
    out = mann_whitney_u(df, "k", "v", "g").collect()[0]
    assert out.z is None


def test_emd_1d_hand_computed(spark):
    from finance_reporting_etl_spark.operators.drift import emd_1d

    # group 1 all at 100 cents, group 2 all at 300 cents:
    # EMD = |100 - 300| cents = 2.0 dollars exactly
    rows = [("k", 100, 1)] * 3 + [("k", 300, 2)] * 5
    df = spark.createDataFrame(rows, "k string, v long, g int")
    out = emd_1d(df, "k", "v", "g").collect()[0]
    assert (out.n1, out.n2, out.emd) == (3, 5, 2.0)
    # shifting half of group 2's mass to 100 halves the distance
    rows2 = [("k", 100, 1)] * 2 + [("k", 100, 2), ("k", 300, 2)]
    out2 = emd_1d(spark.createDataFrame(rows2, "k string, v long, g int"),
                  "k", "v", "g").collect()[0]
    assert out2.emd == 1.0


def test_mv_incremental_refresh_conserves_and_prunes(spark):
    from finance_reporting_etl_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = CATALOG["mv_incremental_refresh"].fn(spark, SF_SMOKE).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_delta_rows > 0          # only touched groups emitted
        assert r.old_cents + r.delta_cents == r.new_cents


def test_split_conformal_coverage_hand_computed(spark):
    from finance_reporting_etl_spark.operators.timeseries import (
        split_conformal_coverage,
    )

    # season=1 residuals are successive diffs; 13 values -> 12
    # residuals, m = 6 cal / 6 eval. Construct diffs directly.
    diffs = [1, -2, 3, -4, 5, -6,     # calibration half, |r| sorted: 1..6
             2, -3, 7, -1, 4, -9]     # eval half
    vals = [100]
    for d in diffs:
        vals.append(vals[-1] + d)
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, day int, cents long")
    out = split_conformal_coverage(
        df, ["k"], "day", "cents", season=1, alpha=0.1
    ).collect()[0]
    # k = min(ceil(0.9*7), 6) = min(7, 6) = 6 -> q_hat = 6
    assert out.q_hat_cents == 6
    assert out.n_eval == 6
    # eval |r| = [2,3,7,1,4,9]: 4 of 6 are <= 6
    assert out.coverage == pytest.approx(round(4 / 6, 6))
    assert out.target == 0.9


def test_matryoshka_recall_is_one_when_tail_is_constant(spark):
    from finance_reporting_etl_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = CATALOG["matryoshka_truncation_recall"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 10
    for r in out:
        assert 0 <= r.n_overlap <= 10
        assert r.recall_at_10 == pytest.approx(round(r.n_overlap / 10.0, 6))


def test_return_rate_parity_max_segment_has_di_1e6(spark):
    from finance_reporting_etl_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = CATALOG["return_rate_parity_segments"].fn(spark, SF_SMOKE).collect()
    assert max(r.di_vs_max_ppm for r in out) == 1_000_000
    for r in out:
        assert r.rate_ppm == r.n_returned * 1_000_000 // r.n_lines


def test_scd2_pit_join_assigns_state_at_purchase_time(spark):
    from finance_reporting_etl_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = {r.state: r for r in
           CATALOG["scd2_point_in_time_join"].fn(spark, SF_SMOKE).collect()}
    # every purchase lands in exactly one state bucket (or 'none')
    from finance_reporting_etl_spark.tables import load_tables
    from pyspark.sql import functions as F

    ev = load_tables(spark, SF_SMOKE, ("events",))["events"]
    n_pur = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).count()
    assert sum(r.n_purchases for r in out.values()) == n_pur
    assert "purchase" not in out  # history excludes purchase states


def test_safety_stock_quantile_is_exact_order_statistic(spark):
    from finance_reporting_etl_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    rows = CATALOG["safety_stock_quantile"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 25  # one row per brand
    import math

    for r in rows:
        assert r.safety_stock_qty == r.q95_daily_qty - r.total_qty // r.n_days


def test_reciprocal_rank_fusion_hand_computed(spark):
    from finance_reporting_etl_spark.operators.similarity import (
        reciprocal_rank_fusion,
    )

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, neighbor_id long, rank int",
    )
    out = {r.neighbor_id: r for r in reciprocal_rank_fusion(a, b, k0=60, topk=10).collect()}
    assert out[11].rrf_score == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert out[10].rrf_score == pytest.approx(round(1 / 61, 6))
    assert out[13].rrf_score == pytest.approx(round(1 / 62, 6))
    assert out[12].rrf_score == pytest.approx(round(1 / 63, 6))
    # doc in both lists outranks either single-list doc at these ranks
    assert out[11].rank == 1


def test_next_event_predictor_is_leakage_free_majority(spark):
    from finance_reporting_etl_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = CATALOG["next_event_prediction_accuracy"].fn(spark, SF_SMOKE).collect()
    assert out, "no eval transitions"
    for r in out:
        assert 0 <= r.n_correct <= r.n_eval
        assert r.accuracy == pytest.approx(round(r.n_correct / r.n_eval, 6))


def test_script_mix_counts_sum_consistently(spark):
    from finance_reporting_etl_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = CATALOG["script_mix_stats"].fn(spark, SF_SMOKE).collect()
    for r in out:
        assert 0 <= r.latin_ppm <= 1_000_000
        assert 0 <= r.nonascii_ppm <= 1_000_000
        assert 0 <= r.mixed_script_docs <= r.n_docs
    # the synthetic fixture is ASCII-token templates for every lang
    # label, so non-ASCII mass must be (near-)zero and latin+digit
    # cannot exceed the whole
    for r in out:
        assert r.latin_ppm + r.digit_ppm <= 1_000_000
        assert r.nonascii_ppm <= 1_000_000 - r.latin_ppm


def test_l_diversity_flags_low_diversity_groups(spark):
    from finance_reporting_etl_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = CATALOG["l_diversity_audit"].fn(spark, SF_SMOKE).collect()
    for r in out:
        assert 1 <= r.l_distinct <= 3
        assert r.l_violation == int(r.l_distinct < 3)
