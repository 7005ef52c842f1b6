"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with
an ANSI-SQL oracle string DuckDB runs over the same parquet. Aliases are
kept identical on both sides (the driver's compare sorts columns by name
and hashes values). Computed float aggregates are rounded identically on
both sides to absorb summation-order noise.

Entries whose semantics are not SQL-expressible (MinHash-LSH banding,
hyperplane-LSH ANN) carry ``oracle=None`` -> rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_reporting_etl_spark.functions.kpis import ratio
from finance_reporting_etl_spark.functions.scalars import case_map, normalize_string
from finance_reporting_etl_spark.plans.models import registry
from finance_reporting_etl_spark.tables import _read_parquet, load_tables


@dataclass
class CatalogEntry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ref: str  # SURVEY.md §2 operator ids this query covers


CATALOG: dict[str, CatalogEntry] = {}


def query(name: str, oracle: str | None, survey_ref: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = CatalogEntry(fn, oracle, survey_ref)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _read_parquet(spark, f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# M0 — the reference's committed model chain (stg -> mart), SURVEY §7.1
# ---------------------------------------------------------------------------


@query(
    "mart_financial_summary",
    """
    SELECT CAST(date_trunc('year', CAST(ts AS DATE)) AS TIMESTAMP) AS year,
           round(avg(value), 6) AS avg_gdp
    FROM events
    GROUP BY 1
    """,
    "S10,P1,P2,A1,A2 (stg_financial_data.sql + mart_financial_summary.sql)",
)
def q_mart_financial_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    sources = load_tables(spark, sf_dir, ("events",))
    built = registry.run(spark, sources, select=["mart_financial_summary"])
    return built["mart_financial_summary"]


@query(
    "mart_financial_kpis",
    """
    WITH inc AS (
        SELECT user_id AS symbol,
               date_trunc('month', ts) AS fiscal_date,
               round(sum(value), 6)        AS total_revenue,
               round(sum(value * 0.2), 6)  AS net_income,
               count(*)                    AS n_reports
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ), bal AS (
        SELECT user_id AS symbol,
               date_trunc('month', ts) AS fiscal_date,
               round(sum(value), 6)        AS total_assets,
               round(sum(value * 0.6), 6)  AS total_liabilities,
               round(sum(value * 0.4), 6)  AS total_equity
        FROM events
        WHERE event_type = 'click'
        GROUP BY 1, 2
    )
    SELECT symbol, fiscal_date,
           total_revenue, net_income, total_assets, total_liabilities, total_equity,
           round(net_income / nullif(total_revenue, 0), 4)   AS profit_margin,
           round(net_income / nullif(total_assets, 0), 4)    AS return_on_assets,
           round(net_income / nullif(total_equity, 0), 4)    AS return_on_equity,
           round(total_assets / nullif(total_liabilities, 0), 4) AS asset_liability_ratio
    FROM inc LEFT JOIN bal USING (symbol, fiscal_date)
    """,
    "J1,J2,P3,P5,P6,A1 (README.md:425-495 financial_kpis)",
)
def q_mart_financial_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    sources = load_tables(spark, sf_dir, ("events",))
    built = registry.run(spark, sources, select=["mart_financial_kpis"])
    return built["mart_financial_kpis"]


# ---------------------------------------------------------------------------
# M1 — core relational parity (filters, literals, CASE, normalize, pivot)
# ---------------------------------------------------------------------------


@query(
    "filter_eq_projection",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
    "P1,P3 (README.md:435 WHERE report_type = ...)",
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


@query(
    "literal_columns",
    """
    SELECT o_orderkey, 'AAPL' AS symbol, 'income_statement' AS report_type
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
    "P4 (README.md:349-350 df['symbol'] = company)",
)
def q_literal_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.lit("AAPL").alias("symbol"),
        F.lit("income_statement").alias("report_type"),
    )


@query(
    "case_value_mapping",
    """
    SELECT event_id,
           CASE WHEN event_type = 'view'     THEN 'Page View'
                WHEN event_type = 'click'    THEN 'Click Through'
                WHEN event_type = 'purchase' THEN 'Purchase Order'
                WHEN event_type = 'signup'   THEN 'Account Signup'
                WHEN event_type = 'error'    THEN 'Error Event'
           END AS event_name
    FROM events
    """,
    "P7 (readme.md:368-372 series_id -> indicator name)",
)
def q_case_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    mapping = {
        "view": "Page View",
        "click": "Click Through",
        "purchase": "Purchase Order",
        "signup": "Account Signup",
        "error": "Error Event",
    }
    return events.select("event_id", case_map("event_type", mapping).alias("event_name"))


@query(
    "string_normalize",
    """
    SELECT p_partkey, lower(trim(p_name)) AS p_name_norm, lower(trim(p_brand)) AS p_brand_norm
    FROM part
    """,
    "P8 (utils/helpers.py:1-2 normalize_string)",
)
def q_string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        normalize_string("p_name").alias("p_name_norm"),
        normalize_string("p_brand").alias("p_brand_norm"),
    )


@query(
    "cast_text_to_numeric",
    """
    SELECT event_id, TRY_CAST(props AS DOUBLE) AS props_num,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    "P2 (stg_financial_data.sql:7 value::numeric; A3 '.' -> NULL)",
)
def q_cast_text_to_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        # ANSI-safe TEXT -> numeric: malformed input -> NULL (A3: '.' -> NULL)
        F.col("props").try_cast("double").alias("props_num"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


@query(
    "pivot_by_report_type",
    """
    SELECT user_id,
           CAST(ts AS DATE) AS day,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 6) AS view_total,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 6) AS click_total,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase_total
    FROM events
    GROUP BY 1, 2
    """,
    "J2,A3 (README.md:425-465 pivot-by-type, idiomatic form)",
)
def q_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("user_id"), F.col("ts").cast("date").alias("day"))
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(F.round(F.sum("value"), 6))
        .withColumnsRenamed(
            {"view": "view_total", "click": "click_total", "purchase": "purchase_total"}
        )
    )


# ---------------------------------------------------------------------------
# Dimension joins / lookup mapping via broadcast (P7 alternative, J1 family)
# ---------------------------------------------------------------------------


@query(
    "lookup_join_broadcast",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    "P7-as-join,J1 (lookup mapping as broadcast join)",
)
def q_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )
