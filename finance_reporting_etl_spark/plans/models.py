"""The reference's model DAG, re-expressed over the driver fixtures.

Reference chain (committed code):
  raw.financial_data  --stg_financial_data.sql-->  staging view (select +
  ``value::numeric`` cast)  --mart_financial_summary.sql-->  yearly AVG mart
  (``DATE_TRUNC('year', observation_date)``, ``AVG(value)``, ``GROUP BY 1``).

README-embedded chain (README.md:425-495): raw_financial_data split by
``report_type`` into income/balance CTEs, LEFT JOIN on
``(symbol, fiscal_date)``, KPI ratios with NULLIF guards.

Fixture mapping (FIXTURES.md §B): ``events`` plays the raw table —
ts ≙ observation_date, value ≙ value, event_type ≙ series_id/report_type,
user_id ≙ symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finance_reporting_etl_spark.functions.kpis import ratio
from finance_reporting_etl_spark.functions.scalars import normalize_string
from finance_reporting_etl_spark.plans.registry import ModelContext, ModelRegistry

registry = ModelRegistry()


@registry.model("stg_financial_data", materialized="view", description="stg_financial_data.sql:1-8 analog")
def stg_financial_data(ctx: ModelContext) -> DataFrame:
    """SELECT series_id, observation_date, value::numeric FROM raw (cited:
    reference dbt_project/models/staging/stg_financial_data.sql:4-8)."""
    raw = ctx.ref("events")
    return raw.select(
        normalize_string("event_type").alias("series_id"),
        F.col("ts").cast("date").alias("observation_date"),
        # raw 'value' arrives as TEXT in the reference (sql/init_db.sql:4)
        # and is cast in staging (stg_financial_data.sql:7). The fixture is
        # already double; the string round-trip cast is exercised in
        # sources.json_source / tests instead of here to keep the mart
        # numerically exact.
        F.col("value").cast("double").alias("value"),
    )


@registry.model("mart_financial_summary", materialized="table", description="mart_financial_summary.sql:1-8 analog")
def mart_financial_summary(ctx: ModelContext) -> DataFrame:
    """SELECT DATE_TRUNC('year', observation_date) AS year,
    AVG(value) AS avg_gdp FROM {{ ref('stg_financial_data') }} GROUP BY 1
    (reference dbt_project/models/marts/mart_financial_summary.sql:4-8)."""
    stg = ctx.ref("stg_financial_data")
    return (
        stg.groupBy(F.date_trunc("year", F.col("observation_date").cast("timestamp")).alias("year"))
        .agg(F.round(F.avg("value"), 6).alias("avg_gdp"))
    )


@registry.model("stg_income_statement", materialized="view", description="README.md:425-437 income CTE analog")
def stg_income_statement(ctx: ModelContext) -> DataFrame:
    """Filtered-CTE pattern: WHERE report_type = 'income_statement'
    (README.md:435). 'purchase' events play income rows; per-(symbol,
    fiscal month) totals play revenue/net income."""
    raw = ctx.ref("events")
    return (
        raw.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.col("user_id").alias("symbol"),
            F.date_trunc("month", "ts").alias("fiscal_date"),
        )
        .agg(
            F.round(F.sum("value"), 6).alias("total_revenue"),
            F.round(F.sum(F.col("value") * F.lit(0.2)), 6).alias("net_income"),
            F.count(F.lit(1)).alias("n_reports"),
        )
    )


@registry.model("stg_balance_sheet", materialized="view", description="README.md:439-449 balance CTE analog")
def stg_balance_sheet(ctx: ModelContext) -> DataFrame:
    """WHERE report_type = 'balance_sheet' (README.md:447); 'click' events
    play balance rows, totals play assets/liabilities."""
    raw = ctx.ref("events")
    return (
        raw.filter(F.col("event_type") == "click")
        .groupBy(
            F.col("user_id").alias("symbol"),
            F.date_trunc("month", "ts").alias("fiscal_date"),
        )
        .agg(
            F.round(F.sum("value"), 6).alias("total_assets"),
            F.round(F.sum(F.col("value") * F.lit(0.6)), 6).alias("total_liabilities"),
            F.round(F.sum(F.col("value") * F.lit(0.4)), 6).alias("total_equity"),
        )
    )


@registry.model("mart_financial_kpis", materialized="table", description="README.md:461-495 financial_kpis analog")
def mart_financial_kpis(ctx: ModelContext) -> DataFrame:
    """income LEFT JOIN balance ON (symbol, fiscal_date) + NULLIF-guarded
    KPI ratios (README.md:461-465, 487-493). Spark picks the join strategy;
    both sides are pre-aggregated so AQE will broadcast the smaller."""
    inc = ctx.ref("stg_income_statement")
    bal = ctx.ref("stg_balance_sheet")
    joined = inc.join(bal, ["symbol", "fiscal_date"], "left")
    return joined.select(
        "symbol",
        "fiscal_date",
        "total_revenue",
        "net_income",
        "total_assets",
        "total_liabilities",
        "total_equity",
        ratio("net_income", "total_revenue").alias("profit_margin"),
        ratio("net_income", "total_assets").alias("return_on_assets"),
        ratio("net_income", "total_equity").alias("return_on_equity"),
        ratio("total_assets", "total_liabilities").alias("asset_liability_ratio"),
    )
