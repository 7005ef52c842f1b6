"""dbt-test analogs (SURVEY §5.3, FIXTURES.md §C): not-null keys,
uniqueness, accepted values — the assertions `dbt test` would have run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finance_reporting_etl_spark.sources.schemas import ACCEPTED_REPORT_TYPES
from finance_reporting_etl_spark.tables import load_tables


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    return load_tables(spark, sf_dir)


@pytest.mark.parametrize(
    "table,col",
    [
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("customer", "c_custkey"),
        ("events", "event_id"),
        ("events", "ts"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ],
)
def test_not_null(t, table, col):
    assert t[table].filter(F.col(col).isNull()).count() == 0


@pytest.mark.parametrize(
    "table,cols",
    [
        ("orders", ["o_orderkey"]),
        # NOTE: (l_orderkey, l_linenumber) is NOT unique in the driver's
        # synthetic lineitem (verified: 1161 dup keys at sf0.001), unlike
        # real TPC-H — so it is deliberately absent here.
        ("events", ["event_id"]),
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
    ],
)
def test_uniqueness(t, table, cols):
    df = t[table]
    assert df.groupBy(*cols).count().filter("count > 1").count() == 0


def test_accepted_values(t):
    # fixture analog of report_type ∈ {...} (README.md:227)
    vals = {r[0] for r in t["events"].select("event_type").distinct().collect()}
    assert vals <= {"view", "click", "purchase", "signup", "error"}
    flags = {r[0] for r in t["lineitem"].select("l_returnflag").distinct().collect()}
    assert flags <= {"A", "N", "R"}
    assert set(ACCEPTED_REPORT_TYPES) == {"income_statement", "balance_sheet", "cash_flow"}
