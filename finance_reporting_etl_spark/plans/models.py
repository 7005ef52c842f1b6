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
from finance_reporting_etl_spark.functions.scalars import det_round

from finance_reporting_etl_spark.functions.kpis import ratio
from finance_reporting_etl_spark.functions.scalars import (
    ECONOMIC_INDICATOR_NAMES,
    case_map,
    normalize_string,
)
from finance_reporting_etl_spark.plans.registry import ModelContext, ModelRegistry

registry = ModelRegistry()

# Fixture bijection: the five event types play the five FRED series the
# reference's Cookbook ingests (readme.md:355-374). Keeps stg_fred_data
# fully populated so the indicator-name CASE maps every row.
EVENT_TYPE_TO_SERIES = {
    "click": "GDP",
    "error": "UNRATE",
    "purchase": "CPIAUCSL",
    "signup": "FEDFUNDS",
    "view": "DGS10",
}


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
        .agg(det_round(F.avg("value"), 6).alias("avg_gdp"))
    )


@registry.model("stg_income_statement", materialized="view", description="README.md:425-437 income CTE analog")
def stg_income_statement(ctx: ModelContext) -> DataFrame:
    """Filtered-CTE pattern: WHERE report_type = 'income_statement'
    (README.md:435). 'purchase' events play income rows; per-(symbol,
    fiscal month) totals play the income-statement line items the
    reference selects (README.md:426-433: total_revenue, gross_profit,
    operating_income, net_income, currency)."""
    raw = ctx.ref("events")
    return (
        raw.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.col("user_id").alias("symbol"),
            F.date_trunc("month", "ts").alias("fiscal_date"),
        )
        .agg(
            det_round(F.sum("value"), 6).alias("total_revenue"),
            det_round(F.sum(F.col("value") * F.lit(0.5)), 6).alias("gross_profit"),
            det_round(F.sum(F.col("value") * F.lit(0.3)), 6).alias("operating_income"),
            det_round(F.sum(F.col("value") * F.lit(0.2)), 6).alias("net_income"),
            F.count(F.lit(1)).alias("n_reports"),
        )
        .withColumn("currency", F.lit("USD"))
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
            det_round(F.sum("value"), 6).alias("total_assets"),
            det_round(F.sum(F.col("value") * F.lit(0.6)), 6).alias("total_liabilities"),
            det_round(F.sum(F.col("value") * F.lit(0.4)), 6).alias("total_equity"),
        )
    )


@registry.model("stg_cash_flow", materialized="view", description="README.md:227,339-340 cash_flow report type analog")
def stg_cash_flow(ctx: ModelContext) -> DataFrame:
    """The third declared report type (README.md:227: report_types =
    [... 'cash_flow'], fan-out at :339-340). 'view' events play cash-flow
    rows; totals play operating cash flow / capex, free cash flow is the
    standard derived line (OCF - CapEx)."""
    raw = ctx.ref("events")
    return (
        raw.filter(F.col("event_type") == "view")
        .groupBy(
            F.col("user_id").alias("symbol"),
            F.date_trunc("month", "ts").alias("fiscal_date"),
        )
        .agg(
            det_round(F.sum(F.col("value") * F.lit(0.9)), 6).alias("operating_cash_flow"),
            det_round(F.sum(F.col("value") * F.lit(0.35)), 6).alias("capital_expenditure"),
        )
        # difference of two already-rounded float64s: exact IEEE op,
        # reproduced identically by the SQL oracle
        .withColumn(
            "free_cash_flow", F.col("operating_cash_flow") - F.col("capital_expenditure")
        )
    )


@registry.model(
    "mart_financial_kpis",
    materialized="table",
    description="README.md:461-495 financial_kpis analog (full macro set)",
    partition_cols=("fiscal_date",),
)
def mart_financial_kpis(ctx: ModelContext) -> DataFrame:
    """income LEFT JOIN balance LEFT JOIN cash_flow ON (symbol,
    fiscal_date) + the reference's full NULLIF-guarded KPI macro set
    (README.md:487-493: gross/operating/net profit margins, ROA, ROE,
    asset_to_liability_ratio) plus the cash-flow-derived FCF margin.
    Spark picks the join strategy; all sides are pre-aggregated so AQE
    broadcasts the smaller ones."""
    inc = ctx.ref("stg_income_statement")
    bal = ctx.ref("stg_balance_sheet")
    cf = ctx.ref("stg_cash_flow")
    joined = inc.join(bal, ["symbol", "fiscal_date"], "left").join(
        cf, ["symbol", "fiscal_date"], "left"
    )
    return joined.select(
        "symbol",
        "fiscal_date",
        "currency",
        "total_revenue",
        "gross_profit",
        "operating_income",
        "net_income",
        "total_assets",
        "total_liabilities",
        "total_equity",
        "operating_cash_flow",
        "capital_expenditure",
        "free_cash_flow",
        ratio("gross_profit", "total_revenue").alias("gross_profit_margin"),
        ratio("operating_income", "total_revenue").alias("operating_profit_margin"),
        ratio("net_income", "total_revenue").alias("net_profit_margin"),
        ratio("net_income", "total_assets").alias("return_on_assets"),
        ratio("net_income", "total_equity").alias("return_on_equity"),
        ratio("total_assets", "total_liabilities").alias("asset_to_liability_ratio"),
        ratio("free_cash_flow", "total_revenue").alias("fcf_margin"),
    )


@registry.model("stg_fred_data", materialized="view", description="readme.md:355-360 stg_fred_data analog")
def stg_fred_data(ctx: ModelContext) -> DataFrame:
    """FRED staging rows (date, series_id, value); event types map
    bijectively onto the Cookbook's series ids so every downstream CASE
    arm is exercised."""
    raw = ctx.ref("events")
    return raw.select(
        F.col("ts").cast("date").alias("date"),
        case_map("event_type", EVENT_TYPE_TO_SERIES).alias("series_id"),
        F.col("value").alias("value"),
    )


@registry.model(
    "economic_indicators",
    materialized="table",
    description="readme.md:355-374 economic_indicators mart analog",
    partition_cols=("series_id",),
)
def economic_indicators(ctx: ModelContext) -> DataFrame:
    """The Cookbook's example mart verbatim: date, series_id, value,
    CASE-mapped indicator_name (readme.md:361-374)."""
    fred = ctx.ref("stg_fred_data")
    return fred.select(
        "date",
        "series_id",
        "value",
        case_map("series_id", ECONOMIC_INDICATOR_NAMES).alias("indicator_name"),
    )


@registry.model("mart_indicator_stats", materialized="table", description="per-indicator aggregate over economic_indicators")
def mart_indicator_stats(ctx: ModelContext) -> DataFrame:
    """Per-indicator summary the dashboards read: observation count and
    value stats per series."""
    ind = ctx.ref("economic_indicators")
    return (
        ind.groupBy("series_id", "indicator_name")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            det_round(F.avg("value"), 6).alias("avg_value"),
            det_round(F.min("value"), 6).alias("min_value"),
            det_round(F.max("value"), 6).alias("max_value"),
        )
    )
