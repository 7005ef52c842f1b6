"""Every SQL-expressible catalog query must match its DuckDB oracle.

This is a local replica of the driver's t2 correctness gate, run at
sf0.001 for speed (the driver runs sf0.01).
"""

from __future__ import annotations

import re

import pytest

from finance_reporting_etl_spark.queries import CATALOG
from tests.conftest import SF_SMOKE
from tests.oracle_util import assert_matches_oracle
from tests.plan_allowlist import SP_ALLOW

ORACLE_QUERIES = sorted(name for name, e in CATALOG.items() if e.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, e in CATALOG.items() if e.oracle is None)


def _strip_int_cast_rounds(plan: str) -> str:
    """Drop every scale-0 round site — ``F.round(x)`` prints as
    ``round(x, 0)`` in executed plans. Round-to-integer is cross-engine
    safe: a double equal to n.5 is exactly representable (0.5 is a
    power of two), so there is no repr-vs-binary tie ambiguity, and
    both Spark's BigDecimal HALF_UP and libm round ties away from
    zero. Only SCALED rounds (n >= 1) carry the per-engine divergence
    this ban exists for. Balanced-paren parse — the expr can nest
    arbitrarily deep (cents conversions over discount products)."""
    out = []
    i = 0
    while True:
        m = re.search(r"\bround\(", plan[i:])
        if not m:
            out.append(plan[i:])
            break
        start = i + m.start()
        k = i + m.end()
        depth = 1
        while depth and k < len(plan):
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        inner = plan[i + m.end() : k - 1]
        out.append(plan[i:start])
        if re.search(r",\s*0\s*$", inner):
            out.append("ROUND0")
        else:
            out.append(plan[start:k])
        i = k
    return "".join(out)


def _has_scaled_sql_round(sql: str) -> bool:
    """True if the SQL text contains a two-arg round(expr, n) — the
    per-engine-divergent float display round (VERDICT r8 task 3)."""
    for m in re.finditer(r"\bround\(", sql):
        depth, k = 1, m.end()
        while depth and k < len(sql):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        inner = sql[m.end() : k - 1]
        depth, parts = 0, [""]
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("")
            else:
                parts[-1] += ch
        if len(parts) == 2 and re.fullmatch(r"\s*\d+\s*", parts[1]):
            return True
    return False


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    entry = CATALOG[name]
    df = entry.fn(spark, SF_SMOKE)
    # catalog-wide structural invariants: no unconstrained cross join
    # and no row-at-a-time Python UDF may EVER appear in a catalog
    # plan (Arrow-batched Python — ArrowEvalPython / mapInPandas — is
    # the only allowed Python surface). Broadcast-nested-loop joins on
    # bounded sides are legitimate and not flagged.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    # SinglePartition budget: every site must be consciously
    # whitelisted via the audited allowlist (bounded classes only —
    # scalar aggs, post-limit rank windows, calendar/bucket spines).
    # A new query that sneaks in a global window/sort fails HERE at
    # sf0.001 instead of costing a bench round (r6 verdict task 8).
    sp = plan.count("SinglePartition")
    assert sp <= SP_ALLOW.get(name, 0), (
        f"{name}: {sp} SinglePartition site(s), budget "
        f"{SP_ALLOW.get(name, 0)} — if bounded-by-construction, "
        "regenerate tests/plan_allowlist.py via tools/plan_audit.py "
        "and document the class in PLANS.md"
    )
    # Gate-window round ban (VERDICT r8 task 3): a query entering the
    # driver's current or next window must not emit an engine-rounded
    # double — native round(DOUBLE, n) is per-engine-divergent (4/4
    # driver-hash failures in r7/r8 were this class). Both sides must
    # use det_round / det_round_sql (functions/scalars.py) instead.
    if name in GATE_ROUND_BAN:
        from pyspark.sql.types import DoubleType, FloatType

        emits_float = any(
            isinstance(f.dataType, (DoubleType, FloatType))
            for f in df.schema.fields
        )
        if emits_float:
            residual = _strip_int_cast_rounds(plan)
            assert not re.search(r"\bround\(", residual), (
                f"{name}: engine round() on a float-emitting plan inside "
                "the gate window — use det_round (functions/scalars.py)"
            )
            assert not _has_scaled_sql_round(entry.oracle), (
                f"{name}: two-arg round() in the oracle SQL inside the "
                "gate window — use det_round_sql (functions/scalars.py)"
            )
    assert_matches_oracle(df, duck, entry.oracle)


# The incoming driver-gate window (the first 50 catalog entries — what
# the driver will hash at sf0.01 THIS round) plus _GATE_NEXT (what it
# will hash NEXT round, including every new query added this round —
# VERDICT r7 task 8 requires additions to pass this gate before the
# driver sees them).
from finance_reporting_etl_spark.queries import _GATE_NEXT  # noqa: E402

GATE_WINDOW = [
    n
    for n in list(CATALOG)[:50] + list(_GATE_NEXT)
    if CATALOG[n].oracle is not None
]
# Names under the engine-round ban: the ENTIRE catalog. Round 9 first
# banned the gate windows, then finished the full-catalog det_round
# migration (zero scaled F.round sites, zero two-arg oracle rounds
# repo-wide), so the ban is now global — any new query emitting an
# engine-rounded float fails here at sf0.001 before any gate sees it.
GATE_ROUND_BAN = set(CATALOG)


@pytest.mark.slow
@pytest.mark.parametrize("name", GATE_WINDOW)
def test_gate_window_exact_oracle_sf0_01(spark, duck_oracle, name):
    """Run the incoming gate window at the DRIVER'S scale (sf0.01) with
    the float re-rounding DISABLED (exact compare), so sub-ulp engine
    drift is a local test failure instead of a driver-gate failure.
    Two of the three r7 CORRECTNESS failures reproduce only here
    (VERDICT r7 task 5): the sf0.001 rounded compare cannot see them."""
    from tests.conftest import SF_ORACLE

    entry = CATALOG[name]
    assert_matches_oracle(
        entry.fn(spark, SF_ORACLE), duck_oracle, entry.oracle, exact_floats=True
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    entry = CATALOG[name]
    df = entry.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    # deterministic: run twice, same rows
    a = sorted(map(str, df.collect()))
    b = sorted(map(str, entry.fn(spark, SF_SMOKE).collect()))
    assert a == b


def test_entry_smoke(spark):
    import __spark_entry__ as ep

    df = ep.entry(spark)
    assert df.count() > 0
    names = set(ep.queries())
    oracles = set(ep.oracle_sql())
    assert oracles <= names


def test_oracle_compare_is_dtype_strict(spark, duck):
    """An uncast DuckDB integer sum (HUGEINT -> float64 in pandas) must
    fail the local compare even though the values are numerically equal
    — the driver's value hash is type-sensitive (VERDICT r3 'What's
    wrong' #3)."""
    sdf = spark.range(1, 4).selectExpr("CAST(sum(id) AS BIGINT) AS s")
    with pytest.raises(AssertionError, match="dtype-class mismatch"):
        assert_matches_oracle(sdf, duck, "SELECT sum(x) AS s FROM (VALUES (1),(2),(3)) t(x)")
    # and the cast form passes
    assert_matches_oracle(sdf, duck, "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1),(2),(3)) t(x)")


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must exist in the catalog — a typo
    here would crash the driver's per-round bench run."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in CATALOG]
    assert not missing, missing
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_bench_stdout_line_fits_driver_tail():
    """The driver records only the last 2000 chars of bench output and
    parses the final line as JSON; rounds 4-5 lost all bench numbers to
    an over-long line ("parsed": null). The compact line must stay under
    2000 chars for ANY headline-count timing dict and still round-trip."""
    import json

    import bench

    timings = {n: 123.456 for n in bench.HEADLINE}
    line = bench.compact_line(timings, 0.1)
    assert len(line) + 1 <= 2000, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == round(sum(timings.values()), 3)
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert 0 < len(parsed["queries"]) <= len(bench.HEADLINE)
