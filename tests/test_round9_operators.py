"""Round-9 operator tests: det_round cross-engine exactness, day-count
accrual, minhash estimate-vs-exact QA, n-gram novelty, and invariants
for the new finance/ops queries — each against a literal Python
reference or a conservation law, the repo's standing test model
(SURVEY.md §5)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from finance_reporting_etl_spark.functions.scalars import det_round, det_round_sql
from tests.conftest import SF_SMOKE


def test_det_round_bit_identical_across_engines(spark):
    """The round-9 exactness primitive: the Column form and the SQL
    twin must produce BIT-IDENTICAL doubles on adversarial values —
    repr-tie doubles (the r7/r8 driver-failure class), near-boundary,
    huge (Long-overflow guard), NaN, NULL, negatives."""
    vals = [
        0.1234565, -0.1234565, 2.5e-7, -5e-7, 0.9999995,
        86.0670115, 1234567.891234565, 1e14 + 0.123, 9.2e12,
        -9.2e12, 4.6e12, float("nan"), None,
    ]
    vals += [(1234567 * k % 999983) / 7919.0 for k in range(500)]
    for n in (2, 4, 6):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i int, x double"
        )
        got = {r.i: r.y for r in df.select("i", det_round("x", n).alias("y")).collect()}
        con = duckdb.connect()
        arr = ",".join(
            "NULL" if v is None
            else "'NaN'::DOUBLE" if isinstance(v, float) and math.isnan(v)
            else repr(v)
            for v in vals
        )
        want = dict(
            con.execute(
                f"SELECT i, {det_round_sql('x', n)} AS y FROM "
                f"(SELECT UNNEST(range({len(vals)})) i, UNNEST([{arr}]) x)"
            ).fetchall()
        )
        con.close()
        for i, v in enumerate(vals):
            g, w = got[i], want[i]
            if g is None or (isinstance(g, float) and math.isnan(g)):
                assert w is None or math.isnan(w), (n, v, g, w)
            else:
                assert g == w, (n, v, g, w)  # bitwise, no tolerance


def test_det_round_matches_decimal_half_up_off_ties(spark):
    """Away from float-tie artifacts det_round is plain half-up
    display rounding — spot-check against Python Decimal."""
    from decimal import ROUND_HALF_UP, Decimal

    vals = [1.25, 2.675, 0.1, 17.7777777, 123.456789, 0.000001]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, x double")
    got = {r.i: r.y for r in df.select("i", det_round("x", 2).alias("y")).collect()}
    for i, v in enumerate(vals):
        # reference rounds the SHORTEST REPR like a human reading the
        # printed value; binary ties may legitimately differ by 0.01
        ref = float(Decimal(repr(v)).quantize(Decimal("0.01"), ROUND_HALF_UP))
        assert abs(got[i] - ref) <= 0.01 + 1e-12


def test_accrual_day_count_matches_python_reference(spark):
    from finance_reporting_etl_spark.operators.allocation import (
        accrual_schedule_day_count,
    )

    loans = [(1, 1_000_00), (2, 123_457), (3, 999_999_99)]
    periods = [("p1", 31), ("p2", 30), ("p3", 28)]
    apr_ppm = 80_000
    df = spark.createDataFrame(loans, "k long, p long")
    out = accrual_schedule_day_count(df, "k", "p", apr_ppm, periods).collect()
    assert len(out) == len(loans) * len(periods)
    ref = {
        (k, lbl): (
            (p * apr_ppm * days) // 360_000_000,
            (p * apr_ppm * 30) // 360_000_000,
        )
        for (k, p) in loans
        for (lbl, days) in periods
    }
    for r in out:
        act, d30 = ref[(r.k, r.period)]
        assert r.accrual_act360_cents == act
        assert r.accrual_30360_cents == d30
        assert r.basis_diff_cents == act - d30
    # convention invariant: longer actual period accrues no less
    for r in out:
        if r.days_act >= 30:
            assert r.basis_diff_cents >= 0
        else:
            assert r.basis_diff_cents <= 0


def test_accrual_day_count_validates_inputs(spark):
    from finance_reporting_etl_spark.operators.allocation import (
        accrual_schedule_day_count,
    )

    df = spark.createDataFrame([(1, 100)], "k long, p long")
    with pytest.raises(ValueError):
        accrual_schedule_day_count(df, "k", "p", 80_000, [])
    with pytest.raises(ValueError):
        accrual_schedule_day_count(df, "k", "p", 0, [("p", 30)])


def test_minhash_estimate_vs_exact_reference(spark):
    """On a tiny corpus with a planted near-duplicate: the pair is
    found, the estimate equals matches/32 exactly, the exact Jaccard
    equals the set computation, and identical docs score est=1."""
    from finance_reporting_etl_spark.operators.dedup import (
        minhash_estimate_vs_exact,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, base),
        (2, base),                      # exact duplicate of 1
        (3, base + " with a tail"),     # near-duplicate
        (4, "completely different words entirely unrelated content here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text", num_hashes=32, shingle_n=3)
    out = {(r.id_a, r.id_b): r for r in minhash_estimate_vs_exact(sigs).collect()}
    assert (1, 2) in out
    dup = out[(1, 2)]
    assert dup.n_matches == 32 and dup.est_jaccard == 1.0
    assert dup.exact_jaccard == 1.0 and dup.abs_err == 0.0
    for r in out.values():
        assert r.est_jaccard == r.n_matches / 32.0  # exact rational
        assert r.exact_jaccard == r.n_inter / r.n_union
        assert abs(r.abs_err - abs(r.est_jaccard - r.exact_jaccard)) == 0.0
        assert 0.0 <= r.est_jaccard <= 1.0 and 0.0 < r.exact_jaccard <= 1.0


def test_ngram_novelty_matches_python_reference(spark):
    from finance_reporting_etl_spark.operators.corpus import ngram_novelty

    docs = [
        (1, "a b c d e"),            # grams: abcd, bcde — all novel
        (2, "a b c d"),              # gram abcd first seen in doc 1
        (3, "x y z w a b c d"),      # mix of novel and repeated
        (4, "too short"),            # no 4-gram -> absent
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in ngram_novelty(df, "doc_id", "text", 4).collect()}

    def grams(t):
        toks = t.split()
        return {" ".join(toks[i : i + 4]) for i in range(len(toks) - 3)}

    first = {}
    for did, t in docs:
        for g in sorted(grams(t)):
            first.setdefault(g, did)
    assert 4 not in got
    for did, t in docs:
        gs = grams(t)
        if not gs:
            continue
        novel = sum(1 for g in gs if first[g] == did)
        assert got[did].n_grams == len(gs)
        assert got[did].n_novel == novel
        assert got[did].novelty_ppm == (novel * 1_000_000) // len(gs)


def test_ar_aging_buckets_conserves_open_ar(spark):
    """Bucketed cents must sum exactly to the unbucketed open-AR total
    (no order lost or double-counted by the CASE ranges)."""
    from finance_reporting_etl_spark.queries import CATALOG

    out = CATALOG["ar_aging_buckets"].fn(spark, SF_SMOKE)
    got = out.agg(
        F.sum("ar_cents").alias("cents"), F.sum("n_orders").alias("n")
    ).collect()[0]
    from finance_reporting_etl_spark.tables import _read_parquet

    o = _read_parquet(spark, f"{SF_SMOKE}/orders.parquet").filter(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_orderdate").cast("date") <= F.lit("1998-08-01").cast("date"))
    )
    want = o.agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert got.cents == want.cents and got.n == want.n
    buckets = {r.bucket for r in out.select("bucket").distinct().collect()}
    assert buckets <= {"0-30", "31-60", "61-90", "90+"}


def test_order_fulfillment_quantiles_invariants(spark):
    """p50 <= p90, both are members of the month's exact lag multiset,
    and n_orders matches the join cardinality."""
    from finance_reporting_etl_spark.queries import CATALOG

    rows = CATALOG["order_fulfillment_quantiles"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.p50_lag_days is not None and r.p90_lag_days is not None
        assert r.p50_lag_days <= r.p90_lag_days
        assert r.n_orders >= 1


def test_entropy_daily_bounds(spark):
    """0 <= H <= ln(n_types); normalized entropy in [0, 1] (NULL only
    for single-type days)."""
    from finance_reporting_etl_spark.queries import CATALOG

    rows = CATALOG["event_type_entropy_daily"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.entropy <= math.log(r.n_types) + 1e-9
        if r.n_types == 1:
            assert r.entropy_norm is None
        else:
            assert -1e-9 <= r.entropy_norm <= 1.0 + 1e-9


def test_dup_cluster_histogram_conserves_docs(spark):
    from finance_reporting_etl_spark.queries import CATALOG
    from finance_reporting_etl_spark.tables import _read_parquet

    out = CATALOG["dup_cluster_size_histogram"].fn(spark, SF_SMOKE)
    total = out.agg(F.sum("n_docs").alias("d")).collect()[0].d
    n_docs = _read_parquet(spark, f"{SF_SMOKE}/documents.parquet").count()
    assert total == n_docs
    for r in out.collect():
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert 0 <= r.doc_share_ppm <= 1_000_000


def test_fx_gain_loss_conservation(spark):
    """fx_gain_cents must equal settled - booked on every row, and a
    nation whose book and settle months share a rate bucket nets 0."""
    from finance_reporting_etl_spark.queries import CATALOG

    rows = CATALOG["fx_gain_loss_realized"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.fx_gain_cents == r.settled_base_cents - r.booked_base_cents
        assert r.n_orders >= 1


def test_streaming_ar_aging_equals_batch(spark):
    """The micro-batch fold must reproduce ar_aging_buckets exactly —
    additive integer partials are boundary-free."""
    from finance_reporting_etl_spark.queries import CATALOG

    got = {
        (r.segment, r.bucket): (r.n_orders, r.ar_cents)
        for r in CATALOG["streaming_ar_aging"].fn(spark, SF_SMOKE).collect()
    }
    want = {
        (r.segment, r.bucket): (r.n_orders, r.ar_cents)
        for r in CATALOG["ar_aging_buckets"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_lsh_band_sweep_monotone_recall(spark):
    """More bands (fewer rows per band) must never LOWER candidate
    volume, and per-config verified <= candidates; pooled recall of
    the finest config dominates the coarsest."""
    from finance_reporting_etl_spark.operators.dedup import (
        lsh_band_sweep,
        minhash_signatures,
    )

    base = "one two three four five six seven eight nine ten"
    docs = [(i, base + f" tail{i % 3}") for i in range(1, 13)]
    docs += [(100, "totally different content with no overlap whatsoever")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text", 32, 3)
    out = {
        r.config: r
        for r in lsh_band_sweep(
            sigs, [("16x2", 16), ("8x4", 8), ("4x8", 4)], 32
        ).collect()
    }
    assert set(out) == {"16x2", "8x4", "4x8"}
    for r in out.values():
        assert 0 <= r.n_verified <= r.n_candidates
        assert 0 <= r.recall_ppm <= 1_000_000
        assert 0 <= r.precision_ppm <= 1_000_000
    assert out["16x2"].n_candidates >= out["4x8"].n_candidates
    assert out["16x2"].recall_ppm >= out["4x8"].recall_ppm


def test_gross_to_net_identity(spark):
    from finance_reporting_etl_spark.queries import CATALOG

    rows = CATALOG["gross_to_net_waterfall"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.net_cents == r.gross_cents - r.discount_cents - r.returns_cents
        assert r.discount_cents >= 0 and r.returns_cents >= 0


def test_dso_monthly_bounds(spark):
    from finance_reporting_etl_spark.queries import CATALOG

    rows = CATALOG["dso_monthly"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.open_ar_cents <= r.sales_cents
        assert 28 <= r.days_in_month <= 31
        # DSO can't exceed the month length when AR <= sales
        assert 0 <= r.dso_centi_days <= r.days_in_month * 100


def test_streaming_entropy_equals_batch(spark):
    """Micro-batch count folding must reproduce the batch entropy
    exactly — counts are additive, entropy is computed post-merge."""
    from finance_reporting_etl_spark.queries import CATALOG

    got = sorted(
        map(str, CATALOG["streaming_entropy_monitor"].fn(spark, SF_SMOKE).collect())
    )
    want = sorted(
        map(str, CATALOG["event_type_entropy_daily"].fn(spark, SF_SMOKE).collect())
    )
    assert got == want
