"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with
an ANSI-SQL oracle string DuckDB runs over the same parquet. Aliases are
kept identical on both sides (the driver's compare sorts columns by name
and hashes values). Computed float aggregates are rounded identically on
both sides to absorb summation-order noise.

Every entry carries a full oracle. Queries whose candidate stage relies
on engine-native hashing (minhash/simhash/LSH buckets/IVF cells) use the
persisted-intermediate pattern (see ``_persist_aux``): both engines read
the same parquet index, so the oracle hard-verifies all downstream
joins/dedup/verify/ranking while pytest covers hash determinism+recall.
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


# Persisted-intermediate oracle pattern: queries whose candidate stage
# depends on engine-native hashing (xxhash64 minhash/simhash, seeded-numpy
# hyperplanes / centroids) persist that intermediate as a parquet table at
# a fixed path; the DuckDB oracle reads the SAME table and independently
# re-derives every downstream decision — banding/bucket joins, pair dedup,
# hamming/Jaccard/cosine verify, top-k ranking. The hash computation
# itself is covered by pytest determinism + recall tests; everything after
# it is hard-verified against an independent engine.
# SPARK_GRAFT_RUN_ID isolates concurrent runs (e.g. gate and bench in
# parallel): both the writer and the f-string oracle SQL bake the same
# per-process value at import, so Spark and DuckDB always read one run's
# index. Unset (the default), the path is stable across processes.
import os as _os  # noqa: E402

_AUX_DIR = "/root/repo/spark-warehouse/oracle_aux" + (
    f"/{_os.environ['SPARK_GRAFT_RUN_ID']}" if _os.environ.get("SPARK_GRAFT_RUN_ID") else ""
)


def _persist_aux(spark: SparkSession, df: DataFrame, name: str) -> DataFrame:
    """Write an oracle-shared intermediate and reread it, so Spark and
    DuckDB derive their answers from bit-identical inputs."""
    path = f"{_AUX_DIR}/{name}"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


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
               'USD'                       AS currency,
               round(sum(value), 6)        AS total_revenue,
               round(sum(value * 0.5), 6)  AS gross_profit,
               round(sum(value * 0.3), 6)  AS operating_income,
               round(sum(value * 0.2), 6)  AS net_income
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
    ), cf AS (
        SELECT user_id AS symbol,
               date_trunc('month', ts) AS fiscal_date,
               round(sum(value * 0.9), 6)  AS operating_cash_flow,
               round(sum(value * 0.35), 6) AS capital_expenditure
        FROM events
        WHERE event_type = 'view'
        GROUP BY 1, 2
    )
    SELECT symbol, fiscal_date, currency,
           total_revenue, gross_profit, operating_income, net_income,
           total_assets, total_liabilities, total_equity,
           operating_cash_flow, capital_expenditure,
           operating_cash_flow - capital_expenditure AS free_cash_flow,
           round(gross_profit / nullif(total_revenue, 0), 4)     AS gross_profit_margin,
           round(operating_income / nullif(total_revenue, 0), 4) AS operating_profit_margin,
           round(net_income / nullif(total_revenue, 0), 4)       AS net_profit_margin,
           round(net_income / nullif(total_assets, 0), 4)        AS return_on_assets,
           round(net_income / nullif(total_equity, 0), 4)        AS return_on_equity,
           round(total_assets / nullif(total_liabilities, 0), 4) AS asset_to_liability_ratio,
           round((operating_cash_flow - capital_expenditure) / nullif(total_revenue, 0), 4)
               AS fcf_margin
    FROM inc LEFT JOIN bal USING (symbol, fiscal_date)
             LEFT JOIN cf  USING (symbol, fiscal_date)
    """,
    "J1,J2,P3,P5,P6,A1 (README.md:425-495 financial_kpis, full macro set + cash_flow leg)",
)
def q_mart_financial_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    sources = load_tables(spark, sf_dir, ("events",))
    built = registry.run(spark, sources, select=["mart_financial_kpis"])
    return built["mart_financial_kpis"]


_SERIES_CASE = """
           CASE WHEN event_type = 'click'    THEN 'GDP'
                WHEN event_type = 'error'    THEN 'UNRATE'
                WHEN event_type = 'purchase' THEN 'CPIAUCSL'
                WHEN event_type = 'signup'   THEN 'FEDFUNDS'
                WHEN event_type = 'view'     THEN 'DGS10'
           END"""

_INDICATOR_CASE = """
           CASE WHEN series_id = 'GDP'      THEN 'Gross Domestic Product'
                WHEN series_id = 'UNRATE'   THEN 'Unemployment Rate'
                WHEN series_id = 'CPIAUCSL' THEN 'Consumer Price Index'
                WHEN series_id = 'FEDFUNDS' THEN 'Federal Funds Rate'
                WHEN series_id = 'DGS10'    THEN '10-Year Treasury Rate'
           END"""


@query(
    "economic_indicators",
    f"""
    WITH fred AS (
        SELECT CAST(ts AS DATE) AS date, {_SERIES_CASE} AS series_id, value
        FROM events
    )
    SELECT date, series_id, value, {_INDICATOR_CASE} AS indicator_name
    FROM fred
    """,
    "P7,O3 (readme.md:355-374 economic_indicators mart, built by the registry)",
)
def q_economic_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    sources = load_tables(spark, sf_dir, ("events",))
    built = registry.run(spark, sources, select=["economic_indicators"])
    return built["economic_indicators"]


@query(
    "indicator_stats",
    f"""
    WITH fred AS (
        SELECT CAST(ts AS DATE) AS date, {_SERIES_CASE} AS series_id, value
        FROM events
    ), ind AS (
        SELECT date, series_id, value, {_INDICATOR_CASE} AS indicator_name
        FROM fred
    )
    SELECT series_id, indicator_name,
           count(*) AS n_obs,
           round(avg(value), 6) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM ind
    GROUP BY 1, 2
    """,
    "A1,P7,O3 (per-indicator aggregate over the economic_indicators mart)",
)
def q_indicator_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    sources = load_tables(spark, sf_dir, ("events",))
    built = registry.run(spark, sources, select=["mart_indicator_stats"])
    return built["mart_indicator_stats"]


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


# ---------------------------------------------------------------------------
# Aggregates & windows: rollups, sessionization, trend KPIs, TPC-H-ish bench
# ---------------------------------------------------------------------------


@query(
    "hourly_event_rollup",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    "S9,A1,streaming-batch (hypertable rollup, README.md:268)",
)
def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.streaming.rollup import time_bucket_rollup

    return time_bucket_rollup(_t(spark, sf_dir, "events"), "1 hour")


@query(
    "sessionize_events",
    """
    WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess
        FROM o
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM s
    GROUP BY user_id, sess
    """,
    "streaming session windows (batch session_window)",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.streaming.rollup import sessionize

    return sessionize(_t(spark, sf_dir, "events"), "30 minutes")


@query(
    "monthly_trend_mom",
    """
    WITH m AS (
        SELECT event_type AS series_id,
               date_trunc('month', ts) AS month,
               round(avg(value), 6) AS avg_value
        FROM events GROUP BY 1, 2
    )
    SELECT series_id, month, avg_value,
           round(avg_value - lag(avg_value) OVER (PARTITION BY series_id ORDER BY month), 6)
               AS mom_change
    FROM m
    """,
    "[X] window trend KPI (SURVEY §2.5: lag over partitioned time order)",
)
def q_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = _t(spark, sf_dir, "events")
    m = events.groupBy(
        F.col("event_type").alias("series_id"),
        F.date_trunc("month", "ts").alias("month"),
    ).agg(F.round(F.avg("value"), 6).alias("avg_value"))
    w = Window.partitionBy("series_id").orderBy("month")
    return m.select(
        "series_id",
        "month",
        "avg_value",
        F.round(F.col("avg_value") - F.lag("avg_value").over(w), 6).alias("mom_change"),
    )


@query(
    "merge_latest_per_key",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM (
        SELECT event_id, ts, user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id ASC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    "O5 incremental merge: latest row per business key (README.md:558)",
)
def q_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.incremental import merge_latest

    events = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    return merge_latest(events, ["user_id", "event_type"], "ts", "event_id")


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "A1,P1,P3 bench headliner (TPC-H Q1 shape)",
)
def q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_top_orders",
    """
    SELECT o_orderkey, revenue, o_orderdate, o_orderpriority, rnk
    FROM (
        SELECT l.l_orderkey AS o_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               o.o_orderdate, o.o_orderpriority,
               row_number() OVER (
                   ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) DESC,
                            l.l_orderkey ASC) AS rnk
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ) WHERE rnk <= 20
    """,
    "J1,A1 bench (TPC-H Q3 shape, deterministic top-k)",
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("l_orderkey").alias("o_orderkey"), "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    # Distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition top-20, driver merge) — never a single-partition
    # global window over the full aggregate. The rank window then runs
    # on 20 rows only.
    top = agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(20)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "o_orderkey", "revenue", "o_orderdate", "o_orderpriority", "rnk"
    )


@query(
    "regional_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    "J1,A1 bench (TPC-H Q5 shape, broadcast dims)",
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# [X] extensions: text analysis, dedup, similarity search, multimodal
# ---------------------------------------------------------------------------

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


@query(
    "text_stats",
    """
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+'))                          AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))    AS n_tokens_bpe,
           length(text)                                                         AS n_chars_calc,
           round(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                         t -> length(t)))
                 / nullif(len(string_split_regex(trim(text), '\\s+')), 0), 4)   AS avg_token_len,
           round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                 / nullif(length(text), 0), 4)                                  AS punct_ratio,
           round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 / nullif(length(text), 0), 4)                                  AS digit_ratio
    FROM documents
    """,
    "X4 text analysis: token/char stats",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.functions import text as TX

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").cast("long").alias("n_tokens"),
        TX.bpe_ish_token_count("text").cast("long").alias("n_tokens_bpe"),
        TX.char_count("text").cast("long").alias("n_chars_calc"),
        TX.avg_token_length("text").alias("avg_token_len"),
        TX.punct_ratio("text").alias("punct_ratio"),
        TX.digit_ratio("text").alias("digit_ratio"),
    )


def _lang_oracle() -> str:
    from finance_reporting_etl_spark.functions.text import LANG_MARKERS

    hit_exprs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        hit_exprs.append(
            f"len(list_filter({_TOKS}, t -> list_contains([{lst}], t))) AS h_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN h_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
    WITH h AS (SELECT doc_id, lang, {', '.join(hit_exprs)} FROM documents)
    SELECT doc_id, lang, {case} AS lang_guess FROM h
    """


@query("language_id", _lang_oracle(), "X4 text analysis: n-gram/marker language ID")
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.functions.text import language_guess

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", language_guess("text").alias("lang_guess"))


@query(
    "quality_scores",
    """
    SELECT doc_id,
           round(greatest(0.0,
               least(length(text) / 500.0, 1.0)
               * (1.0 - least(
                     round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                           / nullif(length(text), 0), 6)
                   + round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                           / nullif(length(text), 0), 6),
                   1.0))), 4) AS quality
    FROM documents
    """,
    "X4 text analysis: heuristic quality score",
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.functions.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


@query(
    "doc_fingerprints",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    "X4 text analysis: content fingerprint (md5 of normalized text)",
)
def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.functions.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


@query(
    "dedup_exact",
    """
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (
                   PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    "X1 exact dedup (deterministic survivor)",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id", "lang", "source", "n_chars")


@query(
    "ngram_jaccard_pairs",
    f"""
    WITH t AS (
        SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks,
               len(list_distinct({_TOKS})) AS n_toks
        FROM documents
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.toks, b.toks))
                     / nullif(CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 0),
                     4) AS jaccard
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         AND b.n_toks >= ceil(a.n_toks * 0.5) AND a.n_toks >= ceil(b.n_toks * 0.5)
    )
    SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
    """,
    "X2 n-gram Jaccard near-dup (blocked exact verify)",
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs(docs, block_cols=("lang", "source"), threshold=0.5)


@query(
    "dedup_clusters",
    f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks,
               len(list_distinct({_TOKS})) AS n_toks
        FROM documents
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.toks, b.toks))
                     / nullif(CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 0),
                     4) AS jaccard
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         AND b.n_toks >= ceil(a.n_toks * 0.5) AND a.n_toks >= ceil(b.n_toks * 0.5)
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs WHERE jaccard >= 0.5
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs WHERE jaccard >= 0.5
    ), reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src
    )
    SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
    """,
    "X1/X2 near-dup clustering: connected components (min-label propagation vs recursive closure)",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup grouping: Jaccard edges -> connected
    components -> cluster_id = min doc_id (the canonical survivor).
    The iterative Spark propagation must agree with DuckDB's recursive
    transitive closure on every node."""
    from finance_reporting_etl_spark.operators.dedup import jaccard_pairs, near_dup_clusters

    docs = _t(spark, sf_dir, "documents")
    edges = jaccard_pairs(docs, block_cols=("lang", "source"), threshold=0.5).select(
        "id_a", "id_b"
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    return near_dup_clusters(edges, nodes).select(F.col("id").alias("doc_id"), "cluster_id")


@query(
    "minhash_lsh_near_dup",
    f"""
    WITH t AS (SELECT * FROM '{_AUX_DIR}/minhash_index/*.parquet'),
    bandrows AS (
        SELECT id, u.band_idx AS band_idx, u.band_hash AS band_hash
        FROM (SELECT id, unnest(bands) AS u FROM t)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bandrows a JOIN bandrows b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
    ),
    s AS (SELECT id, sh FROM t),
    scored AS (
        SELECT c.id_a, c.id_b,
               round(CAST(len(list_distinct(list_intersect(sa.sh, sb.sh))) AS DOUBLE)
                     / nullif(len(list_distinct(list_concat(sa.sh, sb.sh))), 0), 4) AS jaccard
        FROM cand c JOIN s sa ON sa.id = c.id_a JOIN s sb ON sb.id = c.id_b
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
    """,
    "X2 MinHash-LSH near-dup (shingle -> minhash -> band -> verify; persisted-index oracle)",
)
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.dedup import (
        minhash_index,
        minhash_pairs_from_bands,
    )

    docs = _t(spark, sf_dir, "documents")
    idx = _persist_aux(spark, minhash_index(docs), "minhash_index")
    bands = idx.select("id", F.explode("bands").alias("u")).select(
        "id", F.col("u.band_idx").alias("band_idx"), F.col("u.band_hash").alias("band_hash")
    )
    sigs = idx.select("id", "sh")
    return minhash_pairs_from_bands(bands, sigs, threshold=0.5)


@query(
    "simhash_near_dup",
    # brute-force all-pairs hamming over the persisted signatures — equal
    # to the pigeonhole-blocked Spark plan because 4-chunk blocking is
    # EXACT for hamming <= 3
    f"""
    WITH s AS (SELECT * FROM '{_AUX_DIR}/simhash_sigs/*.parquet')
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM s a JOIN s b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "X2 SimHash near-dup (bit-vote fingerprint, pigeonhole blocking; persisted-sig oracle)",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.dedup import simhash, simhash_pairs_from_sigs

    docs = _t(spark, sf_dir, "documents")
    sigs = _persist_aux(spark, simhash(docs), "simhash_sigs")
    out = simhash_pairs_from_sigs(sigs, max_hamming=3)
    return out.withColumn("hamming", F.col("hamming").cast("int"))


@query(
    "similarity_topk",
    """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
    ), c AS (
        SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               round(list_dot_product(qv, cv)
                     / nullif(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)), 0),
                     6) AS score
        FROM c, q
        WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, score, rank FROM (
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
    "X3 similarity search: brute-force cosine top-k",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = brute_force_topk(emb, [0, 1, 2, 3, 4], k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


@query(
    "ann_lsh_topk",
    f"""
    WITH b AS (SELECT * FROM '{_AUX_DIR}/ann_lsh_buckets/*.parquet'),
    q AS (SELECT id AS query_id, tbl, bucket FROM b WHERE id IN (0, 1, 2, 3, 4)),
    cand AS (
        SELECT DISTINCT q.query_id, c.id AS neighbor_id
        FROM b c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket
        WHERE c.id <> q.query_id
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (
        SELECT cand.query_id, cand.neighbor_id,
               round(list_dot_product(qe.v, ce.v)
                     / nullif(sqrt(list_dot_product(qe.v, qe.v))
                              * sqrt(list_dot_product(ce.v, ce.v)), 0), 6) AS score
        FROM cand JOIN e qe ON qe.vec_id = cand.query_id
                  JOIN e ce ON ce.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id) AS rank
    FROM s
    QUALIFY rank <= 10
    """,
    "X3 similarity search: hyperplane-LSH ANN (scale path; persisted-index oracle)",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.similarity import (
        hyperplane_buckets,
        topk_from_buckets,
    )

    emb = _t(spark, sf_dir, "embeddings")
    buckets = _persist_aux(
        spark, hyperplane_buckets(emb, n_planes=4, n_tables=8), "ann_lsh_buckets"
    )
    out = topk_from_buckets(buckets, emb, [0, 1, 2, 3, 4], k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


@query(
    "multimodal_bundle",
    """
    SELECT d.doc_id, d.lang, d.n_chars, len(e.embedding) AS dim, e.label
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    "X5 multimodal: typed struct bundle (flat projection for oracle)",
)
def q_multimodal_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.multimodal import bundle_document

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    b = bundle_document(docs, emb)
    return b.select(
        "doc_id",
        F.col("document.lang").alias("lang"),
        F.col("document.n_chars").alias("n_chars"),
        F.size("vector.embedding").cast("long").alias("dim"),
        F.col("vector.label").alias("label"),
    )


@query(
    "media_feature_extract",
    # Full oracle: the stub extractor is a byte histogram (utf-8 of the
    # text head) folded to 8 dims, exact in float64 — DuckDB re-derives
    # the bytes via hex() + strpos nibble lookup and reproduces every
    # feature bit-for-bit. Exploded to scalar rows (the driver's
    # canonicalizer can't sort/hash array cells).
    """
    WITH m AS (
        SELECT doc_id,
               ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
               hex(encode(substring(coalesce(text, ''), 1, 64))) AS h
        FROM documents
    ), b AS (
        SELECT doc_id, media_type,
               list_transform(range(length(h) // 2), i ->
                 CAST((strpos('0123456789ABCDEF', substring(h, CAST(2*i+1 AS INT), 1)) - 1) * 16
                      + strpos('0123456789ABCDEF', substring(h, CAST(2*i+2 AS INT), 1)) - 1 AS DOUBLE)) AS bs
        FROM m
    ), f AS (
        SELECT doc_id, media_type,
               list_transform(range(8), d ->
                 coalesce(list_sum(list_transform(range(len(bs)), i ->
                   CASE WHEN i % 8 = d THEN bs[CAST(i + 1 AS INT)] ELSE 0.0 END)), 0.0)) AS feats
        FROM b
    )
    SELECT doc_id, media_type, CAST(d AS INT) AS dim_idx,
           feats[CAST(d + 1 AS INT)]
             / (CASE WHEN coalesce(list_sum(feats), 0.0) = 0.0 THEN 1.0
                     ELSE list_sum(feats) END) AS feature
    FROM f CROSS JOIN generate_series(0, 7) AS t(d)
    """,
    "X5 multimodal: binary payload -> feature vector via mapInPandas",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.multimodal import (
        attach_fake_media,
        extract_features,
    )

    docs = _t(spark, sf_dir, "documents")
    feats = extract_features(attach_fake_media(docs))
    # scalar rows for the driver's canonicalizer; the array-typed
    # operator output stays the library API
    return feats.select(
        "doc_id", "media_type", F.posexplode("features").alias("dim_idx", "feature")
    )


@query(
    "rolling_hash_fingerprints",
    """
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                       string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ''),
                       ch -> CAST(ascii(ch) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 2147483647) AS rhash
    FROM documents
    """,
    "X4 text analysis: polynomial rolling-hash fingerprint",
)
def q_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.functions.text import rolling_hash

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash("text").alias("rhash"))


@query(
    "embedding_cosine_dups",
    """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0),
                 6) AS score
    FROM e a JOIN e b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
                / nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0),
                6) >= 0.4
    """,
    "X2 embedding-cosine near-dup (blocked exact)",
)
def q_embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.dedup import embedding_cosine_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(emb, threshold=0.4, block_col="label")


@query(
    "lsh_embedding_cosine_dups",
    f"""
    WITH bk AS (SELECT * FROM '{_AUX_DIR}/lshdup_buckets/*.parquet'),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bk a JOIN bk b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
        SELECT cand.id_a, cand.id_b,
               round(list_dot_product(ea.v, eb.v)
                     / nullif(sqrt(list_dot_product(ea.v, ea.v))
                              * sqrt(list_dot_product(eb.v, eb.v)), 0), 6) AS score
        FROM cand JOIN e ea ON ea.vec_id = cand.id_a
                  JOIN e eb ON eb.vec_id = cand.id_b
    )
    SELECT id_a, id_b, score FROM scored WHERE score >= 0.4
    """,
    "X2 embedding-cosine near-dup at scale (LSH candidates -> exact verify; persisted-index oracle)",
)
def q_lsh_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.dedup import lsh_cosine_pairs_from_buckets
    from finance_reporting_etl_spark.operators.similarity import hyperplane_buckets

    emb = _t(spark, sf_dir, "embeddings")
    # 8 planes = 256 buckets/table: measured candidate selectivity ~3% of
    # the pair space at bench scale (4 planes passed ~40% — no pruning);
    # 8 tables keep recall ~0.93 for close (cosine~0.9) duplicates.
    # n_planes is THE scale knob: grow it with log2(n) to hold bucket
    # occupancy constant.
    buckets = _persist_aux(spark, hyperplane_buckets(emb, n_planes=8), "lshdup_buckets")
    return lsh_cosine_pairs_from_buckets(buckets, emb, threshold=0.4)


@query(
    "ann_ivf_topk",
    f"""
    WITH ix AS (SELECT * FROM '{_AUX_DIR}/ivf_index/*.parquet'),
    pr AS (SELECT * FROM '{_AUX_DIR}/ivf_probes/*.parquet'),
    cand AS (
        SELECT pr.query_id, ix.id AS neighbor_id
        FROM ix JOIN pr USING (cell)
        WHERE ix.id <> pr.query_id
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (
        SELECT cand.query_id, cand.neighbor_id,
               round(list_dot_product(qe.v, ce.v)
                     / nullif(sqrt(list_dot_product(qe.v, qe.v))
                              * sqrt(list_dot_product(ce.v, ce.v)), 0), 6) AS score
        FROM cand JOIN e qe ON qe.vec_id = cand.query_id
                  JOIN e ce ON ce.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id) AS rank
    FROM s
    QUALIFY rank <= 10
    """,
    "X3 similarity search at scale: IVF-flat ANN (Arrow-vectorized quantizer; persisted-index oracle)",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.similarity import (
        ivf_index,
        ivf_probes,
        ivf_topk_from_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    index = _persist_aux(spark, ivf_index(emb), "ivf_index")
    probes = _persist_aux(spark, ivf_probes(emb, [0, 1, 2, 3, 4]), "ivf_probes")
    out = ivf_topk_from_index(index, probes, emb, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


@query(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    "J1,A1 multi-join breadth (TPC-H Q5 shape: fact-fact join + dim broadcasts)",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join: orders/lineitem shuffle on their join keys;
    supplier/nation/region (and at fixture scale customer) broadcast.
    The c_nationkey = s_nationkey constraint rides the supplier join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "q6_revenue_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "P3,A1 pushdown breadth (TPC-H Q6 shape: range predicates to the scan)",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates push to the parquet scan (PushedFilters);
    single global aggregate with map-side partial combine."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_item_revenue",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "J1,A1 top-k join-agg (TPC-H Q10 shape: lost-revenue per customer)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-line revenue per customer, top 20 — TakeOrderedAndProject
    keeps the top-k distributed (no global sort)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q14_promo_revenue_share",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / nullif(sum(l.l_extendedprice * (1 - l.l_discount)), 0), 6) AS promo_share_pct,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01'
    """,
    "J1,A1,P7 conditional-aggregate ratio (TPC-H Q14 shape: promo revenue share)",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part dim broadcasts; the CASE folds into the partial aggregate so
    one scan feeds both numerator and denominator."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo) / F.nullif(F.sum(rev), F.lit(0.0)), 6
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q19_bracketed_discount_revenue",
    """
    SELECT p.p_brand,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size <= 5)
       OR (p.p_brand = 'Brand#13' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size <= 10)
       OR (p.p_brand = 'Brand#21' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size <= 15)
    GROUP BY 1
    """,
    "J1,P3 disjunctive multi-bracket predicate (TPC-H Q19 shape)",
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-conjunctions predicate evaluated after the broadcast join
    (references both sides); per-side conjuncts Catalyst can split
    (brand/size on part, quantity bounds on lineitem) still push down."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & q.between(1, 11) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#13") & q.between(10, 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#21") & q.between(20, 30) & (F.col("p_size") <= 15))
    )
    return (
        j.filter(cond)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1
    ) t
    GROUP BY 1
    ORDER BY n_customers DESC, c_count DESC
    """,
    "J1,A1 outer-join double aggregation (TPC-H Q13 shape: order-count histogram)",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers-per-order-count histogram. The left outer join keeps
    zero-order customers (count(o_orderkey) ignores the null rows); the
    second aggregate is tiny (#distinct counts), so the only real shuffle
    is the first groupBy on c_custkey."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 4) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    "A1,J1 argmax-of-aggregate (TPC-H Q15 shape: top revenue supplier)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue. The max is a 1-row aggregate
    broadcast back against the per-supplier revenue — no global window,
    no single-partition sort. Each engine compares its own sums to its
    own max, so summation-order float drift can't flip the filter."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("suppkey"))
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH brand_lines AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
    ), thresh AS (
        SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_thresh
        FROM brand_lines GROUP BY 1
    )
    SELECT round(sum(b.l_extendedprice) / 7.0, 4) AS avg_yearly,
           count(*) AS n_lines
    FROM brand_lines b JOIN thresh t ON b.l_partkey = t.t_partkey
    WHERE b.l_quantity < t.qty_thresh
    """,
    "A1,J1 per-group-threshold correlated aggregate (TPC-H Q17 shape)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from small-quantity lines vs each part's own average.
    The per-part avg is a grouped aggregate joined back (the decorrelated
    form Catalyst would produce for the scalar subquery); its output is
    |parts in brand| rows, so the join-back broadcasts. Quantities are
    small integers, so 0.2*avg is exact in both engines — the threshold
    comparison can't drift."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    brand_lines = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).drop(
        "p_partkey"
    )
    thresh = brand_lines.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        brand_lines.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q18_large_volume_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    "A1,J1 having + semi-join back (TPC-H Q18 shape: large-volume orders)",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 150, with customer detail.
    The HAVING aggregate runs once on lineitem and semi-joins orders
    (left_semi keeps the probe side narrow); quantities are integral so
    the >150 cut is exact in both engines. Top-k by totalprice stays
    distributed (TakeOrderedAndProject)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "__bk"),
        F.col("o_orderkey") == F.col("__bk"),
        "left_semi",
    )
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@query(
    "q22_idle_rich_customers",
    """
    WITH ab AS (SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_mktsegment, count(*) AS numcust,
           round(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c, ab
    WHERE c.c_acctbal > ab.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-07-01')
    GROUP BY 1
    ORDER BY 1
    """,
    "A1,J1 scalar-subquery filter + anti-join (TPC-H Q22 shape: lapsed rich customers)",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no recent orders, by segment.
    The global average is a 1-row broadcast (no scalar-subquery
    recompute per row); NOT EXISTS is a shuffle anti-join on custkey with
    the date predicate pushed below it into the orders scan."""
    c = _t(spark, sf_dir, "customer")
    ab = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("__avg_bal"))
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-07-01")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(ab), F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "order_price_quantiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90_price,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price
    FROM orders
    GROUP BY 1
    """,
    "A1 exact quantiles per group (percentile == quantile_cont, linear interpolation)",
)
def q_order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (not approx_percentile): both engines use linear
    interpolation between closest ranks, so values hash-match. At 100 TB
    exact percentile sorts within groups — swap to approx_percentile
    (t-digest) when a bounded-error estimate is acceptable."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


@query(
    "price_quantiles_distributed",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders
    GROUP BY 1
    """,
    "A1 exact per-group quantiles at scale: window closest-ranks, no per-group value buffering",
)
def q_price_quantiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-safe twin of ``order_price_quantiles``: Spark's
    ``percentile`` aggregate buffers every group value in memory (a hot
    group OOMs at 100 TB); ``exact_group_quantiles`` gets the identical
    interpolated result from group-partitioned windows — closest-rank
    rows + ``lower + frac*(upper-lower)``, the same formula both
    engines' exact quantile uses, so values hash-match."""
    from finance_reporting_etl_spark.operators.ranking import exact_group_quantiles

    o = _t(spark, sf_dir, "orders")
    return exact_group_quantiles(
        o, ["o_orderpriority"], "o_totalprice", {"median_price": 0.5, "p90_price": 0.9}
    )


# ---------------------------------------------------------------------------
# A-tier breadth: multi-dim aggregates, distinct aggs, set ops, windows.
# Not declared by the reference (SURVEY §2.4/§2.6 note their absence) but
# one-liners in Spark; included so the engine covers the standard
# warehouse surface a Metabase-style consumer (entry point 3) would issue.
# ---------------------------------------------------------------------------


@query(
    "regional_rollup",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    "A-tier: ROLLUP hierarchy totals (region -> nation -> grand total)",
)
def q_regional_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
        )
    )


@query(
    "distinct_daily_users",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_event_types,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    """,
    "A-tier: COUNT(DISTINCT) per group (exact; approx_count_distinct is the scale path)",
)
def q_distinct_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct("event_type").alias("n_event_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "customer_segments_setops",
    """
    WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
         open_ AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT 'both' AS segment, count(*) AS n FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM open_)
    UNION ALL
    SELECT 'finished_only' AS segment, count(*) AS n FROM (SELECT custkey FROM buyers EXCEPT SELECT custkey FROM open_)
    UNION ALL
    SELECT 'open_only' AS segment, count(*) AS n FROM (SELECT custkey FROM open_ EXCEPT SELECT custkey FROM buyers)
    """,
    "A-tier set ops: INTERSECT / EXCEPT / UNION ALL over order-status segments",
)
def q_customer_segments_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    buyers = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey")).distinct()
    open_ = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey")).distinct()
    both = buyers.intersect(open_).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("segment"), "n"
    )
    fin = buyers.exceptAll(open_).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("finished_only").alias("segment"), "n"
    )
    op = open_.exceptAll(buyers).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("open_only").alias("segment"), "n"
    )
    return both.unionByName(fin).unionByName(op)


@query(
    "retention_filter",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
    """,
    "S12 (readme.md:398-427 lifecycle/retention: engine-side window filter)",
)
def q_retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime

    from finance_reporting_etl_spark.operators.incremental import retain

    events = _t(spark, sf_dir, "events")
    return retain(events, "ts", datetime(2024, 1, 8)).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@query(
    "cumulative_monthly_revenue",
    """
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               round(sum(o_totalprice), 4) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           round(sum(revenue) OVER (ORDER BY month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_revenue
    FROM m
    """,
    "§2.5-adjacent: running-total window (trend KPI tier)",
)
def q_cumulative_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")).agg(
        F.round(F.sum("o_totalprice"), 4).alias("revenue")
    )
    # global window is safe here: input cardinality = number of months
    # (bounded by calendar time, not data volume), post-aggregation
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return m.select("month", "revenue", F.round(F.sum("revenue").over(w), 4).alias("cum_revenue"))


@query(
    "streaming_hourly_rollup",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "§2.8 upgrade: Structured Streaming Trigger.AvailableNow rollup == batch oracle",
)
def q_streaming_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the AvailableNow file-stream rollup to completion and returns
    the materialized result — the streaming plan must reproduce the
    batch/DuckDB answer exactly (watermark drops nothing in a bounded
    replay). Replay plumbing: streaming.staging.run_file_stream."""
    import uuid

    from finance_reporting_etl_spark.streaming.rollup import streaming_rollup
    from finance_reporting_etl_spark.streaming.staging import run_file_stream

    events = _t(spark, sf_dir, "events")
    name = f"rollup_stream_{uuid.uuid4().hex[:8]}"
    return run_file_stream(
        spark,
        lambda src: events.write.mode("overwrite").parquet(src),
        lambda src, schema, tmp: streaming_rollup(
            spark, src, schema, checkpoint_dir=f"{tmp}/ckpt", output_table=name
        ),
        lambda tmp: spark.table(name),
        prefix="stream_rollup_",
        label="streaming_hourly_rollup",
    )


@query(
    "streaming_dedup_events",
    """
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
    "§2.8 streaming exact dedup: dropDuplicatesWithinWatermark over an at-least-once replay == DISTINCT",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replays events duplicated 2x (simulating at-least-once delivery)
    through a streaming dedup on event_id; the survivor set must equal
    the original table exactly. Watermark (90d) exceeds the replay span
    (30d) so no duplicate escapes state eviction in the bounded demo."""
    import uuid

    from finance_reporting_etl_spark.streaming.dedup import streaming_dedup
    from finance_reporting_etl_spark.streaming.staging import run_file_stream

    events = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    name = f"dedup_stream_{uuid.uuid4().hex[:8]}"
    return run_file_stream(
        spark,
        lambda src: events.unionAll(events).write.mode("overwrite").parquet(src),
        lambda src, schema, tmp: streaming_dedup(
            spark, src, schema, checkpoint_dir=f"{tmp}/ckpt", output_table=name
        ),
        lambda tmp: spark.table(name),
        prefix="stream_dedup_",
        label="streaming_dedup_events",
    )


@query(
    "stateful_user_totals",
    """
    SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
    "§2.8 applyInPandasWithState: per-key GroupState running totals across micro-batches == batch GROUP BY",
)
def q_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streams events in 4 single-file micro-batches through a custom
    applyInPandasWithState operator that keeps (count, sum, seq) per user
    in GroupState; the last emission per user (max_by upd_seq) must equal
    the batch aggregate. Exercises cross-batch state persistence — the
    sequence numbers prove multiple batches actually ran."""
    import uuid

    from finance_reporting_etl_spark.streaming.stateful import stateful_running_totals
    from finance_reporting_etl_spark.streaming.staging import run_file_stream

    events = _t(spark, sf_dir, "events").select("user_id", "value")
    name = f"stateful_stream_{uuid.uuid4().hex[:8]}"
    return run_file_stream(
        spark,
        lambda src: events.repartition(4).write.mode("overwrite").parquet(src),
        lambda src, schema, tmp: stateful_running_totals(
            spark, src, schema, checkpoint_dir=f"{tmp}/ckpt", output_table=name
        ),
        lambda tmp: spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max_by("n_events", "upd_seq").alias("n_events"),
            F.round(F.max_by("total_value", "upd_seq"), 4).alias("total_value"),
        ),
        prefix="stateful_totals_",
        label="stateful_user_totals",
    )


@query(
    "rolling_7day_revenue",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE)) AS dnum,
               round(sum(value), 4) AS daily_value
        FROM events
        GROUP BY 1, 2, 3
    )
    SELECT event_type, day, daily_value,
           round(sum(daily_value) OVER (
               PARTITION BY event_type ORDER BY dnum
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rolling_7d
    FROM daily
    """,
    "§2.5 range-frame window: 7-day rolling sum per event type (gap-aware, not row-based)",
)
def q_rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling value per event type using a RANGE frame over day
    number — unlike a rowsBetween(-6, 0) frame this stays correct when a
    type has gap days. Partitioned by event_type, ordered within
    partition: no global window, and the pre-aggregation to daily grain
    bounds window input at #days x #types."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
        )
        .agg(F.round(F.sum("value"), 4).alias("daily_value"))
        .withColumn("dnum", F.datediff("day", F.lit("1970-01-01")))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dnum")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "daily_value",
        F.round(F.sum("daily_value").over(w), 4).alias("rolling_7d"),
    )


@query(
    "customer_spend_deciles",
    """
    WITH spend AS (
        SELECT c.c_custkey, round(sum(o.o_totalprice), 4) AS total_spend
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1
    )
    SELECT ntile(10) OVER (ORDER BY total_spend, c_custkey) AS decile,
           c_custkey, total_spend
    FROM spend
    """,
    "§2.5 ntile decile ranking over aggregated spend (deterministic tiebreak)",
)
def q_customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend deciles via ``distributed_ntile`` — exact ntile
    semantics (the oracle's global-window form) computed with
    percentile-sketch bucketing + per-bucket windows + broadcast
    offsets, so no data-sized single-partition sort exists at any
    scale. The (rounded spend, custkey) sort key is unique, making the
    tiling deterministic on both engines."""
    from finance_reporting_etl_spark.operators.ranking import distributed_ntile

    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("total_spend"))
    )
    tiled = distributed_ntile(spend, 10, "total_spend", ["c_custkey"], out_col="decile")
    return tiled.select("decile", "c_custkey", "total_spend")


@query(
    "corpus_clean",
    """
    WITH scored AS (
        SELECT doc_id, lang, source,
               round(greatest(0.0,
                   least(length(text) / 500.0, 1.0)
                   * (1.0 - least(
                         round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                               / nullif(length(text), 0), 6)
                       + round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                               / nullif(length(text), 0), 6),
                       1.0))), 4) AS quality,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    ), deduped AS (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM scored
        WHERE quality >= 0.3
    )
    SELECT doc_id, lang, source, quality FROM deduped WHERE rn = 1
    """,
    "X1+X4 end-to-end training-data cleaning: quality gate -> exact dedup",
)
def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline: score -> filter -> dedup.
    Each stage is the already-verified operator; the composition stays
    one Catalyst plan (filter pushes below the dedup window)."""
    from finance_reporting_etl_spark.functions.text import quality_score
    from finance_reporting_etl_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    scored = docs.withColumn("quality", quality_score("text")).filter(F.col("quality") >= 0.3)
    return exact_dedup(scored, "text", "doc_id").select("doc_id", "lang", "source", "quality")


@query(
    "corpus_stats",
    """
    SELECT lang,
           count(*) AS n_docs,
           round(avg(len(string_split_regex(trim(text), '\\s+'))), 4) AS avg_tokens,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(quantile_cont(length(text), 0.5), 4) AS p50_chars,
           round(quantile_cont(length(text), 0.9), 4) AS p90_chars
    FROM documents
    GROUP BY lang
    """,
    "X4 corpus profiling: per-language counts + exact percentiles",
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(token_count("text")), 4).alias("avg_tokens"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.round(F.percentile(F.length("text"), F.lit(0.5)), 4).alias("p50_chars"),
        F.round(F.percentile(F.length("text"), F.lit(0.9)), 4).alias("p90_chars"),
    )


def _b256(salt: str) -> str:
    """DuckDB twin of operators.corpus.md5_bucket(id, salt=salt): bucket in
    [0, 256) from the first two hex chars of md5(doc_id || salt). Distinct
    salts per operation keep split/sample/decontaminate independent."""
    h = f"md5(CAST(doc_id AS VARCHAR) || '{salt}')"
    return (
        f"CAST((instr('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16"
        f" + (instr('0123456789abcdef', substr({h}, 2, 1)) - 1) AS DOUBLE)"
    )


@query(
    "corpus_hash_split",
    f"""
    SELECT doc_id, lang, source,
           CASE WHEN b < 0.8 * 256.0 THEN 'train'
                WHEN b < (0.8 + 0.1) * 256.0 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, lang, source, {_b256("split")} AS b FROM documents)
    """,
    "X-pipeline deterministic train/val/test split (salted md5-bucket, engine-portable)",
)
def q_corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free 80/10/10 split as a pure function of doc_id — stable
    across runs, partitionings, and engines (DuckDB derives the identical
    assignment from the same md5 buckets, so every row is hash-verified)."""
    from finance_reporting_etl_spark.operators.corpus import hash_split

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})


@query(
    "corpus_mixture_sample",
    f"""
    SELECT doc_id, lang, source
    FROM (SELECT doc_id, lang, source, {_b256("sample")} AS b FROM documents)
    WHERE b < CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5 WHEN 'es' THEN 0.5
                        WHEN 'fr' THEN 0.5 WHEN 'zh' THEN 0.25 ELSE 0.0 END * 256.0
    """,
    "X-pipeline mixture re-weighting: deterministic salted per-language downsample",
)
def q_corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture step: keep all English, half de/es/fr, a quarter
    zh — reproducible independent of executor count (md5 buckets, not
    rand()), so dataset versions are exactly re-materializable."""
    from finance_reporting_etl_spark.operators.corpus import stratified_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_sample(
        docs, "doc_id", "lang",
        {"en": 1.0, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.25},
    )


@query(
    "corpus_chunking",
    """
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ), s AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - 16, 1), 48)) AS start
        FROM t
    )
    SELECT doc_id,
           CAST((start - 1) / 48 AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, start, start + 63), ' ') AS chunk,
           CAST(len(list_slice(toks, start, start + 63)) AS INT) AS n_tokens
    FROM s
    """,
    "X-pipeline overlapping token-window chunking (64-token windows, 16 overlap)",
)
def q_corpus_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window preparation: explode each document into 64-token
    windows overlapping by 16. Map-side only (split -> sequence ->
    explode -> slice), so chunking feeds the next pipeline stage at scan
    speed at any scale."""
    from finance_reporting_etl_spark.operators.corpus import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=64, overlap=16)


@query(
    "ingest_fred_observations",
    """
    SELECT CAST(d AS DATE) AS observation_date,
           v AS value_raw,
           TRY_CAST(v AS DOUBLE) AS value
    FROM (VALUES ('2023-01-01', '26500.0'),
                 ('2023-04-01', '.'),
                 ('2023-07-01', '27000.5'),
                 ('2023-10-01', '27600.25')) AS t(d, v)
    """,
    "S1-S3,P2 ingest chain: REST payload -> JSON parse -> flatten -> typed cast ('.' -> NULL)",
)
def q_ingest_fred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's committed ingest path (fetch_data.py:4-17) end to
    end on the canned payload: payloads_to_df -> flatten_observations.
    sf_dir is unused — the source is the API payload, not a fixture."""
    from finance_reporting_etl_spark.pipeline import CANNED_FRED_PAYLOAD
    from finance_reporting_etl_spark.sources.json_source import flatten_observations
    from finance_reporting_etl_spark.sources.rest import payloads_to_df

    return flatten_observations(payloads_to_df(spark, [CANNED_FRED_PAYLOAD]))


@query(
    "asof_latest_view_before_purchase",
    """
    SELECT p.user_id, p.event_id, p.ts, p.value,
           v.ts AS ts_r, v.event_id AS event_id_r, v.value AS value_r
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    "custom operator: as-of (point-in-time) join, DuckDB ASOF JOIN oracle",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id", "value")
    return asof_join(
        purchases, views, ["user_id"], right_cols=["event_id", "value"], tiebreak="event_id"
    )


@query(
    "video_frame_sample",
    """
    WITH media AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
               (n_chars % 480 + 1) * 100 AS duration_ms,
               CAST(n_chars % 640 AS INT) AS width,
               CAST(n_chars % 480 AS INT) AS height
        FROM documents
    )
    , frames AS (
        SELECT doc_id, width, height,
               unnest(generate_series(0,
                   greatest(CAST(least(ceil(duration_ms / 1000.0), 16) AS INT) - 1, 0))) AS f
        FROM media WHERE media_type = 'video'
    )
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           CAST(f * 1000 AS BIGINT) AS frame_ts_ms,
           width, height
    FROM frames
    """,
    "X5 multimodal: video frame sampling (explode plumbing, decode stubbed)",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finance_reporting_etl_spark.operators.multimodal import attach_fake_media, frame_sample

    docs = _t(spark, sf_dir, "documents")
    # frame_payload (the decode stub) is all-NULL binary — engines
    # normalize NULL blobs differently, so the oracle compares the
    # deterministic columns
    return frame_sample(attach_fake_media(docs), fps=1.0, max_frames=16).drop("frame_payload")


@query(
    "media_decode_features",
    """
    WITH d AS (
        SELECT doc_id,
               CAST(8 + doc_id % 9 AS INT) AS width,
               CAST(8 + doc_id % 7 AS INT) AS height
        FROM documents
    ), grid AS (
        SELECT doc_id, width, height, gx.x AS x, gy.y AS y
        FROM d,
             LATERAL (SELECT unnest(generate_series(0, width - 1)) AS x) gx,
             LATERAL (SELECT unnest(generate_series(0, height - 1)) AS y) gy
    )
    SELECT doc_id, width, height,
           CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
           CAST(sum((doc_id * 31 + x * 7 + y * 13 + 101) % 256) AS BIGINT) AS sum_g,
           CAST(sum((doc_id * 31 + x * 7 + y * 13 + 202) % 256) AS BIGINT) AS sum_b
    FROM grid
    GROUP BY 1, 2, 3
    """,
    "X5 multimodal: REAL media decode (genuine PNG bytes -> zlib inflate -> unfilter -> pixel stats)",
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode, end to end: each doc gets a genuine PNG
    (signature/IHDR/IDAT/CRC, real DEFLATE) of a deterministic synthetic
    image, and the decode stage parses + inflates + unfilters the actual
    bytes inside Arrow-batched ``mapInPandas`` (PIL when installed,
    stdlib zlib otherwise — multimodal.py). The DuckDB oracle re-derives
    every channel sum from the pixel formula alone, so a hash match
    proves the encode->deflate->decode loop round-trips bit-exactly.
    Scale shape: encode and decode are both map-side batch stages with
    no shuffle; blob width is bounded by maxPartitionBytes."""
    from finance_reporting_etl_spark.operators.multimodal import (
        attach_synthetic_png,
        decode_media_features,
    )

    docs = _t(spark, sf_dir, "documents")
    return decode_media_features(attach_synthetic_png(docs))


@query(
    "lm_quality_scores",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), uni AS (
        SELECT u.w AS w, count(*) AS c1
        FROM (SELECT unnest(t) AS w FROM toks) u GROUP BY 1
    ), v AS (SELECT count(*) AS vocab FROM uni),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
    ), c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2)
    SELECT doc_id,
           round(avg(ln((c2.c2 + 0.5) / (uni.c1 + 0.5 * v.vocab))), 6) AS lm_score
    FROM bg JOIN c2 USING (w1, w2) JOIN uni ON uni.w = bg.w1 CROSS JOIN v
    GROUP BY 1
    """,
    "X4 LM-perplexity quality filter: add-k bigram log-likelihood, LM trained distributively on the corpus",
)
def q_lm_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering without an external model: a
    bigram LM with add-0.5 smoothing is built FROM the corpus (unigram/
    bigram count tables via groupBy — vocabulary-sized, never
    corpus-sized) and every document is scored by its mean bigram
    log-likelihood through shuffle equi-joins on the token keys. The
    oracle rebuilds the identical LM and scores in SQL."""
    from finance_reporting_etl_spark.operators.corpus import bigram_lm_scores

    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_scores(docs)


@query(
    "media_resize_decode",
    """
    WITH d AS (
        SELECT doc_id,
               8 + doc_id % 9 AS w,
               8 + doc_id % 7 AS h
        FROM documents
    ), grid AS (
        SELECT doc_id, (gx.x * w) // 6 AS sx, (gy.y * h) // 5 AS sy
        FROM d,
             LATERAL (SELECT unnest(generate_series(0, 5)) AS x) gx,
             LATERAL (SELECT unnest(generate_series(0, 4)) AS y) gy
    )
    SELECT doc_id, CAST(6 AS INT) AS width, CAST(5 AS INT) AS height,
           CAST(sum((doc_id * 31 + sx * 7 + sy * 13) % 256) AS BIGINT) AS sum_r,
           CAST(sum((doc_id * 31 + sx * 7 + sy * 13 + 101) % 256) AS BIGINT) AS sum_g,
           CAST(sum((doc_id * 31 + sx * 7 + sy * 13 + 202) % 256) AS BIGINT) AS sum_b
    FROM grid
    GROUP BY 1
    """,
    "X5 multimodal: REAL resize (decode -> NN resample -> re-encode -> decode again)",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real resize, proven through two decode passes: genuine PNGs are
    decoded, nearest-neighbor resampled to 6x5 (explicit floor index
    mapping), re-encoded as PNG, and the RESIZED payloads are decoded
    AGAIN by the feature stage. The oracle re-derives every resampled
    pixel from the formula + the same index mapping, so a hash match
    proves decode, resample, AND the re-encoded PNG's validity at once.
    All stages are map-side Arrow batches — no shuffle anywhere."""
    from finance_reporting_etl_spark.operators.multimodal import (
        attach_synthetic_png,
        decode_media_features,
        resize_png,
    )

    docs = _t(spark, sf_dir, "documents")
    return decode_media_features(resize_png(attach_synthetic_png(docs), 6, 5))


@query(
    "q4_order_priority_semi",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    "J-tier: LEFT SEMI join (correlated EXISTS; TPC-H Q4 shape)",
)
def q4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "customers_without_orders_anti",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    "J-tier: LEFT ANTI join (NOT EXISTS); urgent-order predicate keeps the result non-vacuous at every fixture scale",
)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent order, per market segment. The filter on
    the anti side pushes into the orders scan; at sf0.01 every customer
    has SOME order, so the plain no-orders form returned 0 rows — a
    vacuously-passing oracle (found by the zero-row catalog audit)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "repetition_metrics",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id, toks,
               CASE WHEN len(toks) >= 2
                    THEN list_transform(generate_series(1, len(toks)-1),
                                        i -> array_to_string(toks[i:i+1], ' '))
                    ELSE [] END AS grams
        FROM t
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           round(len(list_distinct(toks)) / nullif(CAST(len(toks) AS DOUBLE), 0), 4)
               AS type_token_ratio,
           round(list_max(list_transform(list_distinct(grams),
                                         x -> len(list_filter(grams, y -> y = x))))
                 / nullif(CAST(len(grams) AS DOUBLE), 0), 4) AS top_bigram_fraction
    FROM g
    """,
    "X4 Gopher-style repetition filters: type/token ratio + top-bigram fraction",
)
def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals for corpus quality filtering.
    Uses the distributed explode+groupBy formulation (see
    operators.corpus.repetition_profile) — the pure-expression variant
    re-evaluates the gram subtree per lambda element and measured 235s
    at sf0.1 vs ~1s for this shape."""
    from finance_reporting_etl_spark.operators.corpus import repetition_profile

    docs = _t(spark, sf_dir, "documents")
    return repetition_profile(docs, "doc_id", "text", n=2).withColumnRenamed(
        "top_2gram_fraction", "top_bigram_fraction"
    )


@query(
    "pii_redaction",
    """
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com at 10.0.' || CAST(doc_id % 200 AS VARCHAR)
                    || '.' || CAST(doc_id % 250 AS VARCHAR)
                    || ' call +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS text
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ips,
           len(regexp_extract_all(text, '\\+?[0-9][0-9()\\- ]{7,}[0-9]')) AS n_phones,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
             '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
    "X4 PII redaction: typed regex scrub (email/IP/phone) + per-type counts",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass over the corpus. The fixture corpus carries no
    real PII, so the query plants one deterministic email/IP/phone per
    document (identically in the oracle) to prove the patterns fire;
    counts are computed on the raw text, redaction applies the patterns
    in declared order. Map-side regexp chain — no shuffle."""
    from finance_reporting_etl_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(" call +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        tx.pii_count("text", "email").alias("n_emails"),
        tx.pii_count("text", "ipv4").alias("n_ips"),
        tx.pii_count("text", "phone").alias("n_phones"),
        tx.redact_pii("text").alias("redacted"),
    )


@query(
    "corpus_vocabulary",
    f"""
    SELECT token, count(*) AS n_occurrences
    FROM (SELECT unnest({_TOKS}) AS token FROM documents)
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 100
    """,
    "X4 vocabulary build: corpus-wide top-k token frequencies (TakeOrderedAndProject)",
)
def q_corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus tokens. Shuffle carries one row per distinct token
    (map-side combine); top-k avoids any global sort."""
    from finance_reporting_etl_spark.operators.corpus import vocabulary

    return vocabulary(_t(spark, sf_dir, "documents"), "text", k=100)


@query(
    "decontaminate_4gram",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks, {_b256("decon")} AS b FROM documents),
    grams AS (
        SELECT doc_id, b,
               unnest(list_transform(generate_series(1, len(toks)-3),
                                     i -> array_to_string(toks[i:i+3], ' '))) AS gram
        FROM t WHERE len(toks) >= 4
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE b < 13),
    train_grams AS (SELECT DISTINCT doc_id, gram FROM grams WHERE b >= 13)
    SELECT g.doc_id, count(*) AS n_contaminated_grams
    FROM train_grams g JOIN bench USING (gram)
    GROUP BY g.doc_id
    """,
    "X-pipeline benchmark decontamination: 4-gram overlap vs held-out md5-bucket split",
)
def q_decontaminate_4gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flags training documents sharing any 4-token gram with the
    held-out ~5% benchmark bucket (salted md5 bucket < 13 — the same
    deterministic split machinery as corpus_hash_split, with its own
    salt so the bench bucket is independent of split/sample cutoffs).
    Benchmark grams broadcast; the corpus side stays map-side until the
    per-doc count."""
    from finance_reporting_etl_spark.operators.corpus import md5_bucket, ngram_decontaminate

    docs = _t(spark, sf_dir, "documents")
    b = md5_bucket("doc_id", salt="decon")
    return ngram_decontaminate(
        docs.filter(b >= 13), docs.filter(b < 13), n=4
    )


@query(
    "q7_nation_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
        OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    "TPC-H Q7 shape: bidirectional nation-pair volume, nation dim joined twice",
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 analog: revenue flowing between a nation pair per ship year.
    The nation dimension joins twice under different aliases (supplier
    side, customer side) — both broadcast; the disjunctive pair filter
    lands after both so Catalyst can push each equality into its own
    dim scan. Fact-fact joins shuffle on orderkey/custkey only."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@query(
    "q8_market_share",
    """
    WITH all_sales AS (
        SELECT year(o.o_orderdate) AS order_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = cn.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    )
    SELECT order_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM all_sales
    GROUP BY order_year
    """,
    "TPC-H Q8 shape: market share = ratio of conditional sum over 8-table join",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 analog: NATION_3's share of PROMO-part volume sold into
    EUROPE per order year. Ratio-of-conditional-aggregates computed in
    one pass (no self-join); all dims broadcast, facts shuffle once."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("cn_rkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q12_late_shipment_priority",
    """
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY THEN 'late'
                WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY THEN 'slow'
                ELSE 'fast' END AS ship_speed,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    "TPC-H Q12 shape: CASE-bucketed join agg with conditional priority counts (adapted: lateness from shipdate-orderdate; fixture has no commit/receipt dates)",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analog on the fixture schema: lineitems bucketed by shipping
    delay, counting high- vs low-priority order lines per bucket. One
    fact-fact shuffle join, CASE work entirely map-side."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ship, ordered = F.col("l_shipdate"), F.col("o_orderdate")
    speed = (
        F.when(ship > ordered + F.expr("INTERVAL 90 DAYS"), "late")
        .when(ship > ordered + F.expr("INTERVAL 30 DAYS"), "slow")
        .otherwise("fast")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q21_waiting_supplier",
    """
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
    "TPC-H Q21 shape: semi + anti self-joins — sole late supplier in multi-supplier finished orders (adapted lateness: shipdate > orderdate + 60d)",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 analog: suppliers who were the *only* late shipper in a
    multi-supplier finished order. The lineitem self-joins are keyed on
    l_orderkey (uniform), expressed as left_semi / left_anti so Spark
    never materializes the pair blowup; supplier dim broadcasts."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    sole_late = (
        late.join(
            l2,
            (F.col("l2_orderkey") == F.col("l_orderkey"))
            & (F.col("l2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3_orderkey") == F.col("l_orderkey"))
            & (F.col("l3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "kmeans_cluster_profile",
    f"""
    WITH a AS (SELECT * FROM '{_AUX_DIR}/kmeans_assign/*.parquet'),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    j AS (
        SELECT a.cluster, e.vec_id, p.pos, e.v[p.pos] AS x
        FROM a JOIN e USING (vec_id)
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) p
    ),
    cent AS (SELECT cluster, pos, avg(x) AS m FROM j GROUP BY 1, 2),
    sq AS (
        SELECT j.cluster, j.vec_id, sum((j.x - c.m) * (j.x - c.m)) AS sq
        FROM j JOIN cent c ON c.cluster = j.cluster AND c.pos = j.pos
        GROUP BY 1, 2
    ),
    per AS (SELECT cluster, count(*) AS n_members,
                   round(avg(sqrt(sq)), 4) AS avg_dist
            FROM sq GROUP BY 1),
    norms AS (SELECT cluster, round(sqrt(sum(m * m)), 4) AS centroid_norm
              FROM cent GROUP BY 1)
    SELECT cluster, n_members, centroid_norm, avg_dist
    FROM per JOIN norms USING (cluster)
    """,
    "X3 trained vector clustering: k-means (Lloyd's) with persisted-assignment oracle",
)
def q_kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs 5 Lloyd iterations (k=8, deterministic lowest-id init) over
    the embeddings table, persists the final assignment, and profiles
    each cluster. Five is deliberate: measured on the fixture, centroid
    movement collapses to ~1e-2 after the FIRST update and plateaus —
    doubling the iteration budget doubles the job count for no
    measurable clustering change. The oracle re-derives member means, centroid norms and
    mean member->centroid distance from the SAME assignment table in
    double precision — verifying the update step exactly; the argmin
    assignment step itself is covered by pytest (blob recovery,
    determinism, monotone inertia). Oracle hardcodes dim=64 (fixture).
    """
    from finance_reporting_etl_spark.operators.clustering import (
        cluster_profile,
        kmeans,
    )

    emb = _t(spark, sf_dir, "embeddings")
    assignments, _ = kmeans(emb, k=8, iters=5)
    aux = _persist_aux(spark, assignments, "kmeans_assign")
    return cluster_profile(emb, aux)


@query(
    "tfidf_top_terms",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf,
           row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
    "X4 TF-IDF keyword extraction: top-5 terms per document (smoothed idf)",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction via TF-IDF — the two-level
    (doc,term)/(term) aggregation plus vocabulary broadcast-back shape.
    Both engines rank on the rounded score with a term tiebreak, making
    the top-5 cut deterministic cross-engine."""
    from finance_reporting_etl_spark.operators.corpus import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


@query(
    "chunk_dedup_occurrences",
    """
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ), s AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - 16, 1), 48)) AS start
        FROM t
    ), chunks AS (
        SELECT doc_id, CAST((start - 1) / 48 AS INT) AS chunk_idx,
               md5(array_to_string(list_slice(toks, start, start + 63), ' ')) AS fp
        FROM s
    ), w AS (
        SELECT doc_id, chunk_idx,
               row_number()  OVER (PARTITION BY fp ORDER BY doc_id, chunk_idx) AS rn,
               first_value(doc_id)    OVER (PARTITION BY fp ORDER BY doc_id, chunk_idx) AS surv_doc,
               first_value(chunk_idx) OVER (PARTITION BY fp ORDER BY doc_id, chunk_idx) AS surv_idx
        FROM chunks
    )
    SELECT doc_id, chunk_idx, surv_doc, surv_idx FROM w WHERE rn > 1
    """,
    "X1/X-pipeline chunk-level exact dedup (substring-dedup approximation, Lee et al. shape)",
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated 64-token chunks across the corpus with their canonical
    survivor — the boilerplate/repeated-passage scrub. One uniform
    md5-fingerprint shuffle over the chunk explosion."""
    from finance_reporting_etl_spark.operators.corpus import chunk_dedup

    return chunk_dedup(_t(spark, sf_dir, "documents"))


@query(
    "streaming_merge_upsert",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
    "§2.8 x O5 foreachBatch incremental upsert: batch-by-batch merge_latest fixpoint == one-shot merge",
)
def q_streaming_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streams events in 4 single-file micro-batches through a
    foreachBatch merge_latest upsert; because latest-per-key is an
    associative argmin, the incrementally-maintained target must equal
    the one-shot batch merge regardless of the batch split."""
    from finance_reporting_etl_spark.streaming.merge import streaming_merge_upsert
    from finance_reporting_etl_spark.streaming.staging import run_file_stream

    events = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return run_file_stream(
        spark,
        lambda src: events.repartition(4).write.mode("overwrite").parquet(src),
        lambda src, schema, tmp: streaming_merge_upsert(
            spark, src, schema,
            checkpoint_dir=f"{tmp}/ckpt", target_dir=f"{tmp}/target",
            keys=["user_id"], order_col="ts", tiebreak_col="event_id",
        ),
        lambda tmp: spark.read.parquet(f"{tmp}/target"),
        prefix="stream_merge_",
        label="streaming_merge_upsert",
    )


@query(
    "keyword_search_topk",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    postings AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term IN ('window', 'join', 'merge') GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT p.doc_id,
               count(DISTINCT p.term) AS nt,
               round(sum(p.tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0)), 6) AS score
        FROM postings p JOIN dfreq d USING (term) CROSS JOIN n
        GROUP BY p.doc_id
    )
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rank
    FROM scored WHERE nt = 3
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    "X4 conjunctive keyword search: AND-semantics postings + TF-IDF ranking, top-10",
)
def q_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents containing ALL of {window, join, merge}, ranked
    by summed smoothed TF-IDF with a doc_id tiebreak (deterministic
    cross-engine: both rank on the rounded score)."""
    from finance_reporting_etl_spark.operators.corpus import keyword_search

    return keyword_search(
        _t(spark, sf_dir, "documents"), ["window", "join", "merge"], k=10
    )


@query(
    "event_funnel",
    """
    WITH s AS (
        SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id, min(e.ts) AS t_view
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'view' AND e.ts > s.t_signup
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, count(t_signup) AS n_users FROM s
    UNION ALL SELECT 'view_after_signup', count(*) FROM v
    UNION ALL SELECT 'purchase_after_view', count(*) FROM p
    """,
    "A-tier sequential funnel: strict-order signup -> view -> purchase stage counts",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: each stage's timestamp must follow the
    user's previous-stage first-hit. Three per-user aggregations joined
    on user_id (uniform key, co-partitioned after the first shuffle —
    AQE reuses the exchange); stage counts union at the end."""
    ev = _t(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s.agg(F.count("t_signup").alias("n_users")).select(
            F.lit("signup").alias("stage"), "n_users"
        )
        .unionAll(
            v.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("view_after_signup").alias("stage"), "n_users"
            )
        )
        .unionAll(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("purchase_after_view").alias("stage"), "n_users"
            )
        )
    )


@query(
    "cohort_retention",
    """
    WITH first_seen AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT) AS week_offset,
           count(*) AS n_active
    FROM activity a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
    "A-tier cohort retention: first-seen week x activity-week grid",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix. Two aggregations over events plus
    a user-keyed join; (user, week) pairs are distinct-ed map-side
    first, so the join input is bounded by users x weeks."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "sql_api_mart_summary",
    """
    SELECT CAST(date_trunc('year', CAST(ts AS DATE)) AS TIMESTAMP) AS year,
           round(avg(value), 6) AS avg_gdp
    FROM events
    GROUP BY 1
    """,
    "S10,S11,A1,A2 via the spark.sql STRING path (the reference's native dbt-SQL interface)",
)
def q_sql_api_mart_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The committed stg -> mart chain executed as literal SQL strings
    through spark.sql over temp views — proving a reference user can
    paste dbt-style SQL (stg_financial_data.sql:4-8,
    mart_financial_summary.sql:4-8 shapes) unchanged modulo dialect.
    Catalyst compiles this to the identical plan as the DataFrame form
    (same pushdown/partial-agg properties)."""
    events = _t(spark, sf_dir, "events")
    events.createOrReplaceTempView("raw_financial_sql")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW stg_financial_sql AS
        SELECT ts, CAST(value AS DOUBLE) AS value
        FROM raw_financial_sql
        """
    )
    return spark.sql(
        """
        SELECT date_trunc('year', CAST(ts AS DATE)) AS year,
               round(avg(value), 6) AS avg_gdp
        FROM stg_financial_sql
        GROUP BY 1
        """
    )


@query(
    "table_diff_reconciliation",
    """
    WITH a AS (SELECT event_id, event_type FROM events),
    b AS (
        SELECT event_id, event_type FROM events WHERE event_type <> 'error'
        UNION ALL
        SELECT event_id, event_type FROM events WHERE event_type = 'signup'
    ),
    ca AS (SELECT event_id, event_type, count(*) AS na FROM a GROUP BY 1, 2),
    cb AS (SELECT event_id, event_type, count(*) AS nb FROM b GROUP BY 1, 2),
    j AS (
        SELECT coalesce(ca.event_id, cb.event_id) AS event_id,
               coalesce(ca.event_type, cb.event_type) AS event_type,
               coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        FROM ca FULL OUTER JOIN cb USING (event_id, event_type)
        WHERE coalesce(na, 0) <> coalesce(nb, 0)
    )
    SELECT 'a_only' AS side, event_id, event_type, na - nb AS n_copies FROM j WHERE na > nb
    UNION ALL
    SELECT 'b_only' AS side, event_id, event_type, nb - na AS n_copies FROM j WHERE nb > na
    """,
    "O-tier migration validation: multiset table diff (full-outer count compare)",
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation diff against a deterministically perturbed copy
    (errors dropped, signups doubled): a_only must be exactly the error
    rows, b_only the duplicated signups — the empty-diff check a user
    runs when migrating off the reference."""
    from finance_reporting_etl_spark.operators.incremental import table_diff

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    b = ev.filter(F.col("event_type") != "error").unionAll(
        ev.filter(F.col("event_type") == "signup")
    )
    return table_diff(ev, b)


@query(
    "scd2_user_state_history",
    """
    WITH o AS (
        SELECT user_id, event_type, ts,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev,
               lag(ts)         OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events
    ),
    starts AS (
        SELECT user_id, event_type, ts FROM o
        WHERE prev_ts IS NULL OR NOT (event_type IS NOT DISTINCT FROM prev)
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
    FROM starts
    """,
    "O5/§2.5 SCD2 history builder: change-collapsed validity intervals via lag/lead",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history of each user's event_type state:
    consecutive unchanged observations collapse, each surviving change
    opens an interval closed by the next change (NULL = current). One
    window shuffle on user_id; (user_id, ts) is unique in the fixture so
    the ordering is total."""
    from finance_reporting_etl_spark.operators.incremental import scd2_intervals

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return scd2_intervals(ev, ["user_id"], "ts", ["event_type"])


@query(
    "event_type_week_cube",
    """
    SELECT event_type, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY CUBE (event_type, CAST(date_trunc('week', ts) AS TIMESTAMP))
    """,
    "A-tier CUBE: all grouping-set combinations of (event_type, week)",
)
def q_event_type_week_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (event_type, week): detail, both one-way rollups,
    and the grand total in a single pass — Spark expands grouping sets
    inside one partial+final aggregate, no multi-scan union."""
    ev = _t(spark, sf_dir, "events")
    # week stays TIMESTAMP on both sides: a DATE week arrives as pandas
    # object dtype (None) vs DuckDB datetime64 (NaT) and the NULL rows
    # the CUBE emits would canonicalize differently
    return ev.cube(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@query(
    "daily_revenue_gapfilled",
    """
    WITH bounds AS (
        SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
               CAST(max(date_trunc('day', ts)) AS DATE) AS d1
        FROM events WHERE event_type = 'purchase'
    ),
    spine AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds
    ),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4) AS revenue
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT s.day, coalesce(d.revenue, 0.0) AS revenue,
           CASE WHEN d.day IS NULL THEN 1 ELSE 0 END AS was_gap
    FROM spine s LEFT JOIN daily d USING (day)
    """,
    "A/§2.5-tier calendar densification: F.sequence date spine + left join gap fill",
)
def q_daily_revenue_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free daily revenue series: a generated date spine (sequence
    over the observed min/max day, exploded) left-joins the daily
    aggregate, filling missing days with zero. The spine is calendar-
    bounded (#days rows) so the join broadcasts it; the fact side
    aggregates before joining."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.round(F.sum("value"), 4).alias("revenue"),
        # presence marker: was_gap must reflect "no day row" (the
        # oracle's d.day IS NULL), not "revenue IS NULL" — a day whose
        # purchases all carry NULL value has SUM=NULL but is present
        F.lit(1).alias("present"),
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    return (
        F.broadcast(spine)
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.when(F.col("present").isNull(), 1).otherwise(0).alias("was_gap"),
        )
    )


def _statements_oracle() -> str:
    """VALUES oracle for the canned statements fan-out, generated from
    the same deterministic fixture the Spark side fetches — one long row
    per (symbol, report_type, fiscal_date, metric)."""
    from finance_reporting_etl_spark.pipeline import (
        STATEMENT_COMPANIES,
        STATEMENT_METRICS,
        STATEMENT_REPORT_TYPES,
        STATEMENT_YEARS,
        canned_statement_value,
    )
    from finance_reporting_etl_spark.sources.json_source import _snake

    rows = ",\n           ".join(
        f"('{s}', '{rt}', DATE '{y}-12-31', 'USD', '{_snake(m)}', "
        f"CAST({canned_statement_value(s, rt, m, y)} AS DOUBLE))"
        for s in STATEMENT_COMPANIES
        for rt in STATEMENT_REPORT_TYPES
        for y in STATEMENT_YEARS
        for m in STATEMENT_METRICS[rt]
    )
    return f"""
    SELECT * FROM (VALUES {rows})
    AS t(symbol, report_type, fiscal_date, currency, metric, value)
    """


@query(
    "ingest_statements",
    _statements_oracle(),
    "S2+S3+S4 fan-out ingest: companies x report_types -> flatten -> long rows",
)
def q_ingest_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Alpha Vantage leg end to end (README.md:327-361): driver-side
    fan-out fetch over companies x report_types (rate-limited in real
    deployments; canned fixture here), JSON parse, per-report flatten
    with literal symbol/report_type, then unpivot to the long
    (metric, value) shape raw_financial_data stores. sf_dir is unused —
    the source is the API. At 100 TB the fetch stages JSON shards and
    spark.read.json scans them distributed; everything from flatten on
    is the same Catalyst plan."""
    from finance_reporting_etl_spark.pipeline import (
        STATEMENT_COMPANIES,
        STATEMENT_REPORT_TYPES,
        canned_statement_fetch,
    )
    from finance_reporting_etl_spark.sources.json_source import flatten_annual_reports
    from finance_reporting_etl_spark.sources.rest import fetch_statements, payloads_to_df

    triples = fetch_statements(
        canned_statement_fetch,
        "https://www.alphavantage.co/query",
        STATEMENT_COMPANIES,
        STATEMENT_REPORT_TYPES,
    )
    legs = []
    for symbol, rt, payload in triples:
        flat = flatten_annual_reports(payloads_to_df(spark, [payload]), symbol, rt)
        metrics = [
            c for c in flat.columns if c not in ("symbol", "report_type", "fiscal_date", "currency")
        ]
        stack = ", ".join(f"'{m}', CAST({m} AS DOUBLE)" for m in metrics)
        legs.append(
            flat.selectExpr(
                "symbol",
                "report_type",
                "fiscal_date",
                "currency",
                f"stack({len(metrics)}, {stack}) AS (metric, value)",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


@query(
    "attribution_window_join",
    """
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'view'
    ), matched AS (
        SELECT p.event_id, p.user_id,
               count(v.ts) AS n_views_1h,
               round(coalesce(sum(v.value), 0), 4) AS view_value_1h
        FROM purchases p
        LEFT JOIN views v
          ON v.user_id = p.user_id
         AND v.ts >= p.ts - INTERVAL 1 HOUR
         AND v.ts < p.ts
        GROUP BY 1, 2
    )
    SELECT * FROM matched
    """,
    "custom operator: bucketed range join (attribution window), J-tier extension",
)
def q_attribution_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: views by the same user in the preceding hour, via
    ``range_join`` — intervals discretized into 1h buckets turn the
    inequality into a shuffled equi-join on (bucket, user_id); the
    exact [ts-1h, ts) predicate prunes bucket-local candidates. The
    zero-view purchases rejoin through a broadcast-friendly aggregate
    left join, so no nested-loop plan exists anywhere at any scale."""
    from finance_reporting_etl_spark.operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("p_lo_src"),
    ).select(
        "event_id",
        "user_id",
        (F.col("p_lo_src") - hour_us).alias("lo"),
        F.col("p_lo_src").alias("hi"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.unix_micros("ts").alias("t"), "value"
    )
    hits = range_join(
        views, purchases, "t", "lo", "hi", bucket_width=hour_us, extra_eq=["user_id"]
    )
    agg = hits.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_views_1h"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 4).alias("view_value_1h"),
    )
    base = purchases.select("event_id", "user_id")
    return (
        base.join(agg.select("event_id", "n_views_1h", "view_value_1h"), "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_views_1h", F.lit(0)).alias("n_views_1h"),
            F.round(F.coalesce("view_value_1h", F.lit(0.0)), 4).alias("view_value_1h"),
        )
    )


@query(
    "skew_salted_event_rollup",
    """
    WITH dim AS (
        SELECT DISTINCT event_type, upper(event_type) AS category FROM events
    )
    SELECT d.category,
           count(*) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY 1
    """,
    "custom operator: skew-salted equi-join (5 hot keys spread over 16 tasks)",
)
def q_skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events has ~5 distinct event_type values — the worst-case skew
    for a shuffled equi-join (5 tasks do all the work). ``salted_join``
    spreads each hot key over 16 salt values; the result is provably
    identical to the plain join, only the task histogram changes. At
    100 TB this is the difference between a straggler task holding 20%
    of the table and uniform utilization."""
    from finance_reporting_etl_spark.operators.scale import salted_join

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    dim = ev.select("event_type").distinct().withColumn(
        "category", F.upper("event_type")
    )
    joined = salted_join(ev, dim, ["event_type"], n_salts=16)
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def _md5_key(salt: str) -> str:
    return f"md5(CAST(doc_id AS VARCHAR) || '{salt}')"


@query(
    "corpus_shuffle_shard",
    f"""
    SELECT doc_id, shard, shuffle_key,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY shuffle_key, doc_id) AS BIGINT)
               AS position
    FROM (SELECT doc_id,
                 CAST({_b256("shuffle")} AS INT) % 16 AS shard,
                 {_md5_key("shuffle")} AS shuffle_key
          FROM documents)
    """,
    "X-pipeline deterministic global shuffle + sharding (training order)",
)
def q_corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible random training order: salted-md5 shard + in-shard
    rank. Both engines derive the identical (shard, position) for every
    doc from ids alone; the rank window partitions by shard, so no
    global sort exists at any scale."""
    from finance_reporting_etl_spark.operators.corpus import shuffle_shard

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shard(docs, "doc_id", shards=16).select(
        "doc_id", F.col("shard").cast("int").alias("shard"), "shuffle_key", "position"
    )


@query(
    "sequence_packing",
    f"""
    WITH toks AS (
        SELECT doc_id,
               CAST({_b256("pack")} AS INT) % 16 AS shard,
               {_md5_key("pack")} AS k,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT shard, doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY k, doc_id
                                               ROWS UNBOUNDED PRECEDING) - n_tokens)
                          / 512.0) AS BIGINT) AS pack_id
        FROM toks
    )
    SELECT shard, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY 1, 2
    """,
    "X-pipeline sequence packing: fixed-token-budget packs in shuffle order",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing (512/pack) of the shuffled corpus: per-pack
    doc count and token totals. The prefix-sum pack assignment is the
    parallel form of next-fit (overflow bounded by one doc); windows
    partition by shard, so packing scales with the corpus."""
    from finance_reporting_etl_spark.operators.corpus import pack_sequences

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    packed = pack_sequences(docs, "doc_id", "text", budget=512, shards=16)
    return packed.groupBy(F.col("shard").cast("int").alias("shard"), "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


@query(
    "semantic_dedup",
    f"""
    WITH a AS (SELECT * FROM '{_AUX_DIR}/semdedup_assign/*.parquet'),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dropped AS (
        SELECT DISTINCT hi.vec_id
        FROM a lo JOIN a hi ON lo.cluster = hi.cluster AND lo.vec_id < hi.vec_id
        JOIN e el ON el.vec_id = lo.vec_id
        JOIN e eh ON eh.vec_id = hi.vec_id
        WHERE round(list_dot_product(el.v, eh.v)
                    / nullif(sqrt(list_dot_product(el.v, el.v))
                             * sqrt(list_dot_product(eh.v, eh.v)), 0), 6) >= 0.4
    )
    SELECT a.vec_id, a.cluster,
           CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dropped
    FROM a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """,
    "X2/X3 SemDeDup-style semantic dedup: k-means partition -> within-cluster cosine prune",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup a la SemDeDup: k-means splits
    the corpus into clusters, then cosine near-dup pruning runs ONLY
    within clusters — the clustering bounds the pair space to
    ~(n/k)^2 per cluster instead of n^2, which is the whole trick that
    makes embedding dedup feasible at 100 TB (k grows with n). Survivor
    rule: a vector is dropped iff a lower-id vector in its cluster has
    cosine >= 0.4 — deterministic, and re-derived independently by the
    oracle from the persisted assignment table."""
    from finance_reporting_etl_spark.operators.clustering import kmeans
    from finance_reporting_etl_spark.operators.dedup import embedding_cosine_pairs

    emb = _t(spark, sf_dir, "embeddings")
    assign, _ = kmeans(emb, k=16, iters=3)
    assign = _persist_aux(spark, assign.select("vec_id", "cluster"), "semdedup_assign")
    clustered = emb.join(assign, "vec_id")
    pairs = embedding_cosine_pairs(clustered, threshold=0.4, block_col="cluster")
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return assign.join(dropped.withColumn("__d", F.lit(1)), "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.when(F.col("__d").isNull(), 0).otherwise(1).alias("is_dropped"),
    )


@query(
    "embedding_inference_scores",
    """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
        SELECT vec_id, label,
               round(1.0 / (1.0 + exp(-list_dot_product(
                   v,
                   list_transform(range(0, len(v)), j -> ((j % 7) - 3) / 10.0)
               ))), 6) AS score
        FROM e
    )
    SELECT vec_id, label, score FROM scored WHERE score >= 0.5
    """,
    "X-pipeline batched model inference: Arrow-batch linear probe + sigmoid filter",
)
def q_embedding_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier scoring: sigmoid(w . v) per document, one
    BLAS matmul per Arrow batch (the batched-inference pattern a real
    reward/quality model plugs into), then the keep-filter. The
    stand-in model's weights are an index formula, so DuckDB re-derives
    every score bit-for-bit at round-6."""
    from finance_reporting_etl_spark.operators.inference import score_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    return score_embeddings(emb).filter(F.col("score") >= 0.5).select(
        "vec_id", "label", "score"
    )


@query(
    "streaming_sessionize_events",
    """
    WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess
        FROM o
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM s
    GROUP BY user_id, sess
    """,
    "§2.8 TRUE streaming session windows: cross-micro-batch session merge == batch gap sessions",
)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows computed by a real multi-micro-batch stream: the
    source is split into 4 files processed one per trigger, so sessions
    open in one micro-batch and merge with later arrivals through the
    session-state store. The final result must equal the batch
    gap-sessionization (the DuckDB window-SQL twin) exactly."""
    import uuid

    from finance_reporting_etl_spark.streaming.rollup import streaming_sessionize
    from finance_reporting_etl_spark.streaming.staging import run_file_stream

    events = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    name = f"sess_stream_{uuid.uuid4().hex[:8]}"
    return run_file_stream(
        spark,
        lambda src: events.repartition(4).write.mode("overwrite").parquet(src),
        lambda src, schema, tmp: streaming_sessionize(
            spark, src, schema, checkpoint_dir=f"{tmp}/ckpt", output_table=name
        ),
        lambda tmp: spark.table(name),
        prefix="stream_sess_",
        label="streaming_sessionize_events",
    )


@query(
    "streaming_watermark_late_drop",
    """
    WITH pre AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-21'),
         b1 AS (SELECT * FROM pre WHERE event_id % 7 >= 2),
         spacer AS (SELECT * FROM pre WHERE event_id % 7 = 1),
         late AS (SELECT * FROM pre WHERE event_id % 7 = 0),
         wm1 AS (SELECT max(ts) - INTERVAL 7 DAY AS w FROM b1),
         wmf AS (SELECT max(ts) - INTERVAL 7 DAY AS w FROM events),
         accepted AS (
           SELECT * FROM b1
           UNION ALL SELECT * FROM spacer
           UNION ALL
           SELECT late.* FROM late
           WHERE date_trunc('day', ts) + INTERVAL 1 DAY > (SELECT w FROM wm1)
           UNION ALL
           SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-21'
         )
    SELECT date_trunc('day', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM accepted
    GROUP BY 1, 2
    HAVING date_trunc('day', ts) + INTERVAL 1 DAY <= (SELECT w FROM wmf)
    """,
    "§2.8 watermark late-data proof: beyond-horizon rows dropped, in-horizon stragglers merged, append emission",
)
def q_streaming_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, proven end to end on a real multi-batch
    stream (append mode, parquet sink — the scale-safe shape):

    Arrival order is staged as four single-file micro-batches: (1) the
    on-time base (days 1-20 except stragglers), (2) a spacer batch — by
    its end the watermark (max base event time - 7 days) has evicted
    and emitted every closed window, (3) the stragglers, spanning the
    full 20 days: rows whose daily window was already evicted are
    DROPPED (numRowsDroppedByWatermark > 0), rows within the horizon
    MERGE into their still-open windows, (4) the day-21+ tail, which
    advances the watermark so the merged windows actually emit.

    The oracle re-derives the exact accepted set from the same split
    rule: drop iff window_end <= max(base ts) - 7d; emit iff
    window_end <= max(all ts) - 7d. A hash match therefore pins all
    three behaviors — late drop, straggler merge, and append-mode
    emit-once — to Spark's executed semantics.
    """
    from finance_reporting_etl_spark.streaming.rollup import streaming_rollup_to_files
    from finance_reporting_etl_spark.streaming.staging import (
        run_file_stream,
        stage_microbatches,
    )

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    cut = "2024-01-21"
    pre = ev.filter(F.col("ts") < cut)
    batches = [
        pre.filter(F.col("event_id") % 7 >= 2),  # on-time base
        pre.filter(F.col("event_id") % 7 == 1),  # spacer: lets eviction land
        pre.filter(F.col("event_id") % 7 == 0),  # stragglers: drop + merge
        ev.filter(F.col("ts") >= cut),  # tail: advances the watermark
    ]
    return run_file_stream(
        spark,
        lambda src: stage_microbatches(batches, src),
        lambda src, schema, tmp: streaming_rollup_to_files(
            spark, src, schema,
            checkpoint_dir=f"{tmp}/ckpt", output_dir=f"{tmp}/out",
            bucket="1 day", watermark="7 days", max_files_per_trigger=1,
        ),
        lambda tmp: spark.read.parquet(f"{tmp}/out"),
        prefix="stream_wm_",
        label="streaming_watermark_late_drop",
    )


@query(
    "stateful_session_timeout",
    """
    WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess FROM o
    ), g AS (
        SELECT user_id, sess,
               min(ts) AS session_start, max(ts) AS last_ts,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS total_value
        FROM s GROUP BY user_id, sess
    ), sess AS (
        SELECT *, max(sess) OVER (PARTITION BY user_id) AS last_sess FROM g
    ), wmf AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
    SELECT user_id, session_start, last_ts + INTERVAL 30 MINUTE AS session_end,
           n_events, total_value
    FROM sess
    WHERE NOT (sess = last_sess AND last_ts + INTERVAL 30 MINUTE > (SELECT w FROM wmf))
    """,
    "§2.8 custom stateful operator with EventTimeTimeout: sessions close on watermark expiry, emit exactly once",
)
def q_stateful_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization as a CUSTOM ``applyInPandasWithState``
    operator with ``GroupStateTimeout.EventTimeTimeout``: closed
    sessions emit mid-batch, open tails live in GroupState with a
    timeout at (last activity + gap) and emit exactly once when the
    watermark expires them — the state-TTL machinery `session_window`
    hides, here explicit and testable. Four chronologically disjoint
    micro-batches force sessions to span batch boundaries. The oracle
    is batch gap-sessionization minus the per-user final session when
    the stream's closing watermark (max ts - 10 min) left it open."""
    import uuid

    from finance_reporting_etl_spark.streaming.stateful import stateful_session_timeout
    from finance_reporting_etl_spark.streaming.staging import (
        run_file_stream,
        stage_microbatches,
    )

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    cuts = ["2024-01-08", "2024-01-16", "2024-01-24"]
    batches = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter((F.col("ts") >= cuts[1]) & (F.col("ts") < cuts[2])),
        ev.filter(F.col("ts") >= cuts[2]),
    ]
    name = f"ttl_sessions_{uuid.uuid4().hex[:8]}"
    return run_file_stream(
        spark,
        lambda src: stage_microbatches(batches, src),
        lambda src, schema, tmp: stateful_session_timeout(
            spark, src, schema, checkpoint_dir=f"{tmp}/ckpt", output_table=name
        ),
        lambda tmp: spark.table(name),
        prefix="stream_ttl_",
        label="stateful_session_timeout",
    )


@query(
    "ingest_pages_datasource",
    """
    SELECT series_id,
           CAST(d AS DATE) AS observation_date,
           v AS value_raw,
           TRY_CAST(v AS DOUBLE) AS value,
           page
    FROM (VALUES
        ('GDP', '2020-01-01', '21481.367', 0),
        ('GDP', '2020-04-01', '19477.444', 0),
        ('GDP', '2020-07-01', '.',         0),
        ('GDP', '2020-10-01', '21494.731', 1),
        ('GDP', '2021-01-01', '22313.85',  1),
        ('GDP', '2021-04-01', '23046.934', 1),
        ('GDP', '2021-07-01', '23550.42',  2),
        ('GDP', '2021-10-01', '.',         2),
        ('GDP', '2022-01-01', '24740.48',  2),
        ('GDP', '2022-04-01', '25248.476', 3),
        ('GDP', '2022-07-01', '25723.941', 3),
        ('GDP', '2022-10-01', '26137.992', 3)
    ) AS t(series_id, d, v, page)
    """,
    "S1-S3 via the Spark 4 Python Data Source API: partition-per-page executor-side parse (engine-native form of README.md:327-369's driver loop)",
)
def q_ingest_pages_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom ``DataSource`` ingest: staged REST pages become
    InputPartitions, executors parse their page and emit typed rows —
    the declared schema means a malformed page fails one task, not the
    load. sf_dir is unused; the source is the staged page dir."""
    from finance_reporting_etl_spark.sources.python_datasource import (
        register,
        stage_canned_pages,
    )

    pages_dir = stage_canned_pages(f"{_AUX_DIR}/fred_pages")
    register(spark)
    return spark.read.format("fred_pages").option("path", pages_dir).load()


@query(
    "variant_event_payloads",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 6) AS total_value,
           CAST(max(len(CAST(event_type AS VARCHAR)) + 2) AS INT) AS max_tag_len
    FROM events
    GROUP BY event_type
    """,
    "S3 modernized: Spark 4 VARIANT semi-structured ingest — parse_json -> variant_get typed extraction, no schema inference pass",
)
def q_variant_event_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload ingest on the VARIANT type (Spark 4):
    raw JSON event payloads are parsed once into VARIANT (binary,
    shredded — no driver schema-inference scan, unlike
    ``spark.read.json``) and fields come out via ``variant_get`` path
    expressions with per-field types, including a nested array element.
    The JSON text here is built from the events fixture so the oracle
    can re-derive the result from the base columns — proving the
    JSON -> VARIANT -> typed-column roundtrip is lossless (bigint,
    string, double, array<string> all survive bit-exactly).

    At scale this is the raw-zone pattern: keep payloads as VARIANT,
    extract typed columns at query time with pushdown-friendly paths,
    never re-infer schema over 100 TB of JSON text."""
    ev = _t(spark, sf_dir, "events")
    payload = F.to_json(
        F.struct(
            F.col("user_id").alias("user"),
            F.col("event_type").alias("type"),
            F.struct(
                F.col("value").alias("value"),
                F.array(F.lit("t0"), F.concat(F.col("event_type"), F.lit("_x"))).alias(
                    "tags"
                ),
            ).alias("props"),
        )
    )
    v = ev.select(F.parse_json(payload).alias("v"))
    extracted = v.select(
        F.variant_get("v", "$.user", "bigint").alias("user_id"),
        F.variant_get("v", "$.type", "string").alias("event_type"),
        F.variant_get("v", "$.props.value", "double").alias("value"),
        F.variant_get("v", "$.props.tags[1]", "string").alias("tag1"),
    )
    return extracted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.max(F.length("tag1")).alias("max_tag_len"),
    )


@query(
    "ann_ivfpq_topk",
    f"""
    WITH ix AS (SELECT * FROM '{_AUX_DIR}/pq_index/*.parquet'),
    pr AS (SELECT * FROM '{_AUX_DIR}/ivfpq_probes/*.parquet'),
    lut AS (SELECT * FROM '{_AUX_DIR}/pq_luts/*.parquet'),
    adc AS (
        SELECT pr.query_id, ix.id AS neighbor_id,
               round(sum(lut.d2), 6) AS adc_dist
        FROM ix
        JOIN pr USING (cell)
        JOIN lut ON lut.query_id = pr.query_id
               AND lut.m = ix.m AND lut.code = ix.code
        WHERE ix.id <> pr.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_dist,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist, neighbor_id) AS rank
    FROM adc
    QUALIFY rank <= 10
    """,
    "X3 similarity search at scale: IVF-PQ ANN (product quantization + asymmetric-distance LUT scoring; persisted-index oracle)",
)
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the memory-bound scale path for ANN. The IVF stage prunes
    candidates to nprobe cells; PQ replaces each 64-float vector (512 bytes) with 16
    one-byte codes (sample-trained codebooks, driver-side Lloyd — same
    bounded-collect budget as the k-means centroid loop), and scoring
    sums per-subspace lookup-table distances (ADC) with a broadcast
    join — at query time no vector data is read at all. Every
    downstream decision (cell join, LUT join, sum, rank) is re-derived
    by the oracle from the persisted codes/cells/probes/LUT tables;
    codebook training and encode are covered by pytest recall tests."""
    from finance_reporting_etl_spark.operators.similarity import (
        ivf_probes,
        ivfpq_topk_from_tables,
        pq_index,
        pq_query_luts,
        pq_train_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(emb)
    qids = [0, 1, 2, 3, 4]
    index = _persist_aux(spark, pq_index(emb, books), "pq_index")
    probes = _persist_aux(spark, ivf_probes(emb, qids), "ivfpq_probes")
    luts = _persist_aux(
        spark,
        spark.createDataFrame(
            pq_query_luts(emb, qids, books), "query_id long, m int, code int, d2 double"
        ),
        "pq_luts",
    )
    return ivfpq_topk_from_tables(index, probes, luts, k=10).withColumn(
        "rank", F.col("rank").cast("long")
    )


@query(
    "heavy_hitters_cms",
    f"""
    WITH cells AS (SELECT * FROM '{_AUX_DIR}/cms_placements/*.parquet'),
    tc AS (
        SELECT token, CAST(count(*) AS BIGINT) AS exact_count
        FROM (SELECT unnest({_TOKS}) AS token FROM documents)
        GROUP BY token
    ),
    cellcnt AS (
        SELECT d, col, sum(exact_count) AS cell_cnt
        FROM tc JOIN cells USING (token) GROUP BY d, col
    ),
    est AS (
        SELECT token, CAST(min(cell_cnt) AS BIGINT) AS est_count
        FROM cells JOIN cellcnt USING (d, col) GROUP BY token
    ),
    tot AS (SELECT sum(exact_count) AS t FROM tc)
    SELECT e.token, e.est_count, tc.exact_count
    FROM est e JOIN tc USING (token), tot
    WHERE e.est_count >= tot.t / 50.0
    """,
    "X4 heavy hitters via Count-Min Sketch: fixed-size mergeable counter grid, min-estimate thresholding (persisted-placement oracle)",
)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens whose CMS estimate clears 2% of the stream. The sketch is
    depth*width cells FOREVER — the memory story that exact counting
    can't give at 100 TB vocabulary sizes — and cell-wise addition
    merges per-executor sketches. exact_count rides along to expose the
    one-sided error (est >= exact, always). The 4x64 grid is sized so
    collisions actually occur at fixture scale, exercising the min."""
    from finance_reporting_etl_spark.functions.text import whitespace_tokens
    from finance_reporting_etl_spark.operators.sketches import (
        cms_cell_counts,
        cms_estimates,
        cms_placements,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("token")
    )
    tc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    cells = _persist_aux(spark, cms_placements(tc), "cms_placements")
    sketch = cms_cell_counts(tc, cells)
    est = cms_estimates(cells, sketch)
    total = tc.agg(F.sum("cnt").alias("t"))
    return (
        est.join(tc, "token")
        .crossJoin(F.broadcast(total))
        .filter(F.col("est_count") >= F.col("t") / 50.0)
        .select("token", "est_count", F.col("cnt").alias("exact_count"))
    )


@query(
    "event_grouping_sets",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(dow AS VARCHAR), 'ALL') AS dow,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM (SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow, value FROM events)
    GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow), ())
    """,
    "§2.6 GROUPING SETS: explicit multi-granularity aggregate (beyond CUBE/ROLLUP — arbitrary set list, one shuffle)",
)
def q_event_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping-set list in ONE aggregation pass: Spark
    expands the sets with an internal Expand node (each input row fans
    out once per set, partial-agg combines map-side) — versus four
    separate groupBys, four shuffles. The neither-column-is-ever-NULL
    fixture makes coalesce subtotal labeling unambiguous."""
    # DuckDB dayofweek is Sunday=0, Spark's is Sunday=1 — shift to match
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow"), "value"
    )
    return (
        ev.groupingSets(
            [["event_type", "dow"], ["event_type"], ["dow"], []],
            "event_type",
            "dow",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias("dow"),
            "n_events",
            "total_value",
        )
    )


@query(
    "lineitem_unpivot_metrics",
    """
    SELECT metric,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(val), 6) AS avg_val,
           round(min(val), 6) AS min_val,
           round(max(val), 6) AS max_val
    FROM (
        SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY metric
    """,
    "§2.6 UNPIVOT/melt: wide measures -> long (metric, value) without N scans",
)
def q_lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unpivot`` melts the four measure columns into (metric, val)
    rows in ONE scan (an Expand node, like grouping sets) — the oracle's
    UNION ALL form would scan lineitem four times. The inverse of the
    pivot queries; rounds trip with pivot_by_report_type's shape."""
    li = _t(spark, sf_dir, "lineitem")
    metrics = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    long = li.unpivot([], metrics, "metric", "val")
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("val"), 6).alias("avg_val"),
        F.round(F.min("val"), 6).alias("min_val"),
        F.round(F.max("val"), 6).alias("max_val"),
    )


@query(
    "corpus_upsample_epochs",
    f"""
    WITH w AS (
        SELECT * FROM (VALUES ('en', 2, 128), ('de', 1, 0), ('es', 1, 128),
                              ('fr', 0, 128), ('zh', 0, 64)) t(lang, base, thresh)
    ),
    n AS (
        SELECT doc_id, d.lang,
               base + CASE WHEN {_b256("upsample")} < thresh THEN 1 ELSE 0 END AS n_copies
        FROM documents d JOIN w USING (lang)
    )
    SELECT doc_id, lang, CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy_idx
    FROM n WHERE n_copies > 0
    """,
    "X-pipeline epoch-weighted mixture upsampling: deterministic replication (en x2.5, es x1.5, de x1, fr x0.5, zh x0.25)",
)
def q_corpus_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch mixture construction: languages replicate by weight
    (floor + salted-md5 fractional coin), the w>1 complement of
    mixture_sample's w<1 downsampling. Map-side explode, no shuffle —
    composes directly with corpus_shuffle_shard for training order."""
    from finance_reporting_etl_spark.operators.corpus import upsample_mixture

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = upsample_mixture(
        docs,
        {"en": (2, 128), "de": (1, 0), "es": (1, 128), "fr": (0, 128), "zh": (0, 64)},
    )
    return out.select("doc_id", "lang", F.col("copy_idx").cast("int").alias("copy_idx"))


@query(
    "quality_percentile_filter",
    """
    WITH r AS (
        SELECT doc_id, lang, n_chars,
               round(percent_rank() OVER (PARTITION BY lang
                                          ORDER BY n_chars, doc_id), 6) AS pr
        FROM documents
    )
    SELECT doc_id, lang, n_chars, pr FROM r WHERE pr >= 0.5
    """,
    "X4 per-domain quality calibration: rank-normalize a quality proxy within language, keep the top half (percent_rank window)",
)
def q_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality thresholds don't transfer across domains — a length/LM
    score cut that keeps 50% of English keeps 5% of code. Rank-
    normalizing WITHIN the domain (percent_rank over the lang
    partition) makes 'top half of each language' mean exactly that.
    One window shuffle partitioned by lang; deterministic (n_chars,
    doc_id) tie-break."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        docs.select(
            "doc_id", "lang", "n_chars", F.round(F.percent_rank().over(w), 6).alias("pr")
        )
        .filter(F.col("pr") >= 0.5)
    )


@query(
    "stratified_reservoir_sample",
    f"""
    WITH r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY {_md5_key("reservoir")}, doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS INT) AS sample_rank FROM r WHERE rn <= 20
    """,
    "X-pipeline stratified exact-k sample: min(k, n) docs per stratum in deterministic salted-hash order (WindowGroupLimit, no global sort)",
)
def q_stratified_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly min(20, n) documents per language, chosen by salted-md5
    order — the deterministic distributed equivalent of per-stratum
    reservoir sampling (every doc equally likely under the hash, result
    reproducible from ids alone, unlike rand()-based sampleBy which is
    seed- AND partitioning-dependent). The rank<=k predicate pushes
    into WindowGroupLimit, so each task retains k rows per stratum
    before the window shuffle — eval-set construction that behaves at
    100 TB."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("reservoir")))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 20)
        .select("doc_id", "lang", F.col("sample_rank").cast("int").alias("sample_rank"))
    )


@query(
    "profile_documents_table",
    """
    SELECT 'doc_id' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(doc_id) AS BIGINT) AS n_non_null,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_val,
           CAST(max(doc_id) AS VARCHAR) AS max_val
    FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(lang), count(DISTINCT lang),
           CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
    UNION ALL
    SELECT 'source', count(*), count(source), count(DISTINCT source),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
    UNION ALL
    SELECT 'n_chars', count(*), count(n_chars), count(DISTINCT n_chars),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
    """,
    "O-tier data-quality profiling: per-column null/distinct/min/max summary in one pass",
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table — the ingest-time QA
    gate every warehouse load runs. ONE aggregation pass computes all
    columns' stats together (the oracle's UNION ALL form re-scans per
    column); count(DISTINCT a), count(DISTINCT b) in one agg expand
    like grouping sets, still a single scan. Values stringify so one
    narrow schema profiles any table."""
    docs = _t(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) AS (column_name, n_rows, n_non_null, n_distinct, min_val, max_val)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', {c}__rows, {c}__nn, {c}__nd, {c}__min, {c}__max"
                    for c in cols
                ),
            )
        )
    )
    return stacked


@query(
    "streaming_heavy_hitters",
    f"""
    WITH cells AS (SELECT * FROM '{_AUX_DIR}/cms_placements_stream/*.parquet'),
    tc AS (
        SELECT token, CAST(count(*) AS BIGINT) AS exact_count
        FROM (SELECT unnest({_TOKS}) AS token FROM documents)
        GROUP BY token
    ),
    cellcnt AS (
        SELECT d, col, sum(exact_count) AS cell_cnt
        FROM tc JOIN cells USING (token) GROUP BY d, col
    ),
    est AS (
        SELECT token, CAST(min(cell_cnt) AS BIGINT) AS est_count
        FROM cells JOIN cellcnt USING (d, col) GROUP BY token
    ),
    tot AS (SELECT sum(exact_count) AS t FROM tc)
    SELECT e.token, e.est_count, tc.exact_count
    FROM est e JOIN tc USING (token), tot
    WHERE e.est_count >= tot.t / 50.0
    """,
    "§2.8 x X4 streaming sketch maintenance: CMS folded cell-wise across micro-batches must equal the one-shot batch sketch",
)
def q_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents corpus replayed as three disjoint micro-batches,
    each folding its token counts into the persisted depth x width grid
    by cell-wise addition (foreachBatch). Because sketch merge is
    associative+commutative, the streamed grid must equal the one-shot
    batch sketch — which is exactly what the oracle independently
    rebuilds from the full corpus. Unlike row-state streaming, the
    maintained state never grows: constant rewrite cost per batch at
    any corpus size."""
    from finance_reporting_etl_spark.functions.text import whitespace_tokens
    from finance_reporting_etl_spark.operators.sketches import (
        cms_estimates,
        cms_placements,
    )
    from finance_reporting_etl_spark.streaming.merge import streaming_cms_maintain
    from finance_reporting_etl_spark.streaming.staging import (
        run_file_stream,
        stage_microbatches,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks_expr = F.explode(whitespace_tokens(F.lower(F.col("text"))))
    tc = docs.select(toks_expr.alias("token")).groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cells = _persist_aux(spark, cms_placements(tc), "cms_placements_stream")

    sketch = run_file_stream(
        spark,
        lambda src: stage_microbatches(
            [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)], src
        ),
        lambda src, schema, tmp: streaming_cms_maintain(
            spark, src, schema,
            checkpoint_dir=f"{tmp}/ckpt", sketch_dir=f"{tmp}/sketch",
            placements=cells, token_expr=toks_expr,
        ),
        lambda tmp: spark.read.parquet(f"{tmp}/sketch"),
        prefix="stream_cms_",
        label="streaming_heavy_hitters",
    )
    est = cms_estimates(cells, sketch)
    total = tc.agg(F.sum("cnt").alias("t"))
    return (
        est.join(tc, "token")
        .crossJoin(F.broadcast(total))
        .filter(F.col("est_count") >= F.col("t") / 50.0)
        .select("token", "est_count", F.col("cnt").alias("exact_count"))
    )


@query(
    "label_time_to_next_purchase",
    """
    WITH p AS (
        SELECT user_id, ts, min(event_id) AS next_event_id
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT v.user_id, v.event_id, v.ts,
           p.ts AS ts_r, p.next_event_id AS next_event_id_r,
           epoch_us(p.ts) - epoch_us(v.ts) AS usecs_to_purchase
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN p ON v.user_id = p.user_id AND p.ts > v.ts
    """,
    "custom operator: FORWARD strict as-of join — time-to-next-event label generation (DuckDB forward ASOF oracle)",
)
def q_label_time_to_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-label generation: every view gets the timestamp of the
    user's NEXT purchase (strictly after) and the exact gap — the
    supervised target for time-to-conversion models. Forward as-of is
    the same one-shuffle union+window as the backward operator, scanned
    in reverse; purchases pre-collapse to one row per (user, ts) so
    equal-instant payloads are deterministic in both engines."""
    from finance_reporting_etl_spark.operators.asof import asof_join_forward

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "event_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("next_event_id"))
    )
    out = asof_join_forward(
        views, purchases, ["user_id"], right_cols=["next_event_id"]
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        "ts_r",
        "next_event_id_r",
        (F.unix_micros("ts_r") - F.unix_micros("ts")).alias("usecs_to_purchase"),
    )


@query(
    "rolling_7day_distinct_users",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    cover AS (
        SELECT user_id, CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                                    INTERVAL 1 DAY)) AS DATE) AS day
        FROM ud
    )
    SELECT d.day, CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users_7d
    FROM cover c JOIN days d USING (day)
    GROUP BY d.day
    """,
    "§2.5 rolling distinct: trailing-7-day unique users per day — explode-to-covered-days form (COUNT(DISTINCT) OVER RANGE is inexpressible as a window)",
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day unique users for every active day. No engine can
    run COUNT(DISTINCT) over a RANGE window; the scale shape is: dedup
    to (user, day) grain (one shuffle, rows collapse to actives), fan
    each pair out to the <=7 days it covers (map-side explode), dedup +
    count per covered day. Work scales with actives x 7, never with raw
    events; a 90-day window at 100 TB just changes the constant."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = ud.select("day").distinct()
    cover = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    return (
        cover.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
    )


@query(
    "per_lang_token_length_regression",
    f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(regr_slope(n_toks, n_chars), 6) AS slope,
           round(regr_intercept(n_toks, n_chars), 6) AS intercept,
           round(regr_r2(n_toks, n_chars), 6) AS r2
    FROM (SELECT lang, CAST(n_chars AS DOUBLE) AS n_chars,
                 CAST(len({_TOKS}) AS DOUBLE) AS n_toks
          FROM documents)
    GROUP BY lang
    """,
    "A-tier per-group model fit: OLS token-count ~ char-count per language via regr_* aggregates (tokens-per-char varies by language)",
)
def q_per_lang_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-group OLS with the built-in regr_* aggregate
    family — one shuffle carrying five partial moments per group, the
    textbook map-side-combinable fit (vs collecting per-group data to a
    driver). Tokens-per-character is a real per-language signal (CJK
    text packs more tokens per char than Latin-script text)."""
    from finance_reporting_etl_spark.functions.text import whitespace_tokens

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(whitespace_tokens(F.lower(F.col("text")))).cast("double").alias("n_toks"),
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.regr_slope("n_toks", "n_chars"), 6).alias("slope"),
        F.round(F.regr_intercept("n_toks", "n_chars"), 6).alias("intercept"),
        F.round(F.regr_r2("n_toks", "n_chars"), 6).alias("r2"),
    )


@query(
    "mixture_rebalance_to_target",
    f"""
    WITH tgt AS (
        SELECT * FROM (VALUES ('en', 0.40), ('de', 0.15), ('es', 0.15),
                              ('fr', 0.15), ('zh', 0.15)) t(lang, target_share)
    ),
    cur AS (
        SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS chars FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(chars) AS t FROM cur),
    w AS (
        SELECT c.lang, tgt.target_share,
               c.chars / tot.t AS before_share,
               tgt.target_share / (c.chars / tot.t) AS wt
        FROM cur c JOIN tgt USING (lang), tot
    ),
    wq AS (
        SELECT lang, target_share, before_share,
               CAST(floor(wt) AS BIGINT) AS base,
               CAST(floor((wt - floor(wt)) * 256 + 0.5) AS BIGINT) AS thresh
        FROM w
    ),
    per_doc AS (
        SELECT d.lang, wq.target_share, wq.before_share,
               d.n_chars * (wq.base + CASE WHEN {_b256("rebalance")} < wq.thresh
                                           THEN 1 ELSE 0 END) AS eff_chars
        FROM documents d JOIN wq USING (lang)
    ),
    after_tot AS (SELECT sum(eff_chars) AS t FROM per_doc)
    SELECT p.lang,
           round(any_value(p.before_share), 6) AS before_share,
           any_value(p.target_share) AS target_share,
           round(sum(p.eff_chars) / any_value(a.t), 6) AS after_share
    FROM per_doc p, after_tot a
    GROUP BY p.lang
    """,
    "X-pipeline mixture rebalancing: solve per-domain weights toward a target token distribution, apply deterministic replication, report achieved shares",
)
def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma/DataComp-style mixture solving, entirely IN-PLAN: measured
    char share per language -> weight = target/current -> quantized
    (floor + 256-grain md5 coin) replication -> achieved share. No
    driver arithmetic: the weight table is a 5-row aggregate joined
    back broadcast, so the same query rebalances a 100 TB corpus. The
    achieved share converges on the target up to the 1/256 coin
    granularity and per-doc integer replication. Operator:
    operators.corpus.mixture_rebalance_to_targets."""
    from finance_reporting_etl_spark.operators.corpus import (
        mixture_rebalance_to_targets,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    tgt = spark.createDataFrame(
        [("en", 0.40), ("de", 0.15), ("es", 0.15), ("fr", 0.15), ("zh", 0.15)],
        "lang string, target_share double",
    )
    return mixture_rebalance_to_targets(docs, tgt)


@query(
    "length_bucketed_batching",
    f"""
    WITH d AS (
        SELECT doc_id, n_chars,
               CAST({_b256("batchshard")} AS INT) % 8 AS shard,
               {_md5_key("batcharrival")} AS arrival
        FROM documents
    ),
    arr AS (
        SELECT shard, n_chars,
               CAST(floor((row_number() OVER (PARTITION BY shard
                                              ORDER BY arrival, doc_id) - 1) / 32)
                    AS BIGINT) AS batch_id
        FROM d
    ),
    srt AS (
        SELECT shard, n_chars,
               CAST(floor((row_number() OVER (PARTITION BY shard
                                              ORDER BY n_chars, doc_id) - 1) / 32)
                    AS BIGINT) AS batch_id
        FROM d
    ),
    wa AS (
        SELECT shard, CAST(sum(mx - n_chars) AS BIGINT) AS waste FROM (
            SELECT shard, n_chars, max(n_chars) OVER (PARTITION BY shard, batch_id) AS mx
            FROM arr) GROUP BY shard
    ),
    ws AS (
        SELECT shard, CAST(sum(mx - n_chars) AS BIGINT) AS waste FROM (
            SELECT shard, n_chars, max(n_chars) OVER (PARTITION BY shard, batch_id) AS mx
            FROM srt) GROUP BY shard
    )
    SELECT wa.shard, wa.waste AS padding_arrival, ws.waste AS padding_sorted
    FROM wa JOIN ws USING (shard)
    """,
    "X-pipeline length-bucketed batching: per-shard sorted batches vs arrival batches, padding waste accounted exactly",
)
def q_length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference/training batches pad every sequence to the batch max;
    batching in length order instead of arrival order is the classic
    padding-FLOPs eliminator. This computes both assignments (batches
    of 32 per shard, deterministic salted-hash arrival order) and the
    exact padding chars each wastes. All windows partition by shard —
    the sort is per-shard, never global, so the plan is the one you'd
    run at 100 TB."""
    from pyspark.sql import Window

    from finance_reporting_etl_spark.operators.corpus import md5_bucket

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    d = docs.select(
        "doc_id",
        "n_chars",
        (md5_bucket("doc_id", salt="batchshard") % 8).cast("int").alias("shard"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("batcharrival"))).alias(
            "arrival"
        ),
    )

    def waste(order_cols: list) -> DataFrame:
        wo = Window.partitionBy("shard").orderBy(*order_cols)
        batched = d.withColumn(
            "batch_id", F.floor((F.row_number().over(wo) - 1) / 32)
        )
        wb = Window.partitionBy("shard", "batch_id")
        return (
            batched.withColumn("mx", F.max("n_chars").over(wb))
            .groupBy("shard")
            .agg(F.sum(F.col("mx") - F.col("n_chars")).alias("waste"))
        )

    wa = waste(["arrival", "doc_id"]).withColumnRenamed("waste", "padding_arrival")
    ws = waste(["n_chars", "doc_id"]).withColumnRenamed("waste", "padding_sorted")
    return wa.join(ws, "shard")


@query(
    "user_value_ema",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                             (acc, x) -> 0.2 * x + 0.8 * acc), 6) AS ema_final
    FROM events
    GROUP BY user_id
    """,
    "custom per-key sequential operator: recursive EMA via grouped-map applyInPandas (inexpressible as a window aggregate)",
)
def q_user_value_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of event values — a
    RECURSIVE scan (s_t depends on s_{t-1}) that no window function
    expresses and whose closed-form rewrite overflows on long series.
    Grouped-map ``applyInPandas`` is the engine-native answer: one
    shuffle on user_id, a float64 left-fold per group. The oracle runs
    the IDENTICAL fold as a DuckDB list_reduce lambda — same seed, same
    order, same operation sequence, so the doubles match bit-for-bit."""
    from finance_reporting_etl_spark.operators.timeseries import ema_last_per_key

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return ema_last_per_key(
        ev, "user_id", ["ts", "event_id"], "value", alpha=0.2
    )


@query(
    "rollup_cascade_monthly",
    """
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "S9/A1 rollup cascade: month derived from day derived from hour — additive aggregates re-aggregate losslessly (oracle computes month from raw)",
)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse rollup-cascade pattern: hourly aggregates are the
    only pass over raw data; daily re-aggregates hourly, monthly
    re-aggregates daily. At 100 TB this is the difference between one
    raw scan per granularity and one raw scan TOTAL — valid for any
    additive aggregate (sum/count; avg must ride as sum+count). The
    oracle aggregates month straight from raw events, so the hash
    proves the two-level re-aggregation loses nothing."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    daily = hourly.groupBy(
        F.date_trunc("day", "hour").alias("day"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    return (
        daily.groupBy(
            F.date_trunc("month", "day").cast("date").alias("month"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("v"), 4).alias("total_value"),
        )
    )


@query(
    "bitmap_distinct_rollup",
    """
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events
    GROUP BY 1, 2
    """,
    "A-tier mergeable EXACT distinct: daily bitmap sketches OR-merged to month (oracle counts distinct from raw — proves the merge is lossless)",
)
def q_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct users per event type — computed by merging a
    per-(day, type, bucket) bitmap table, NOT by re-scanning raw events.
    COUNT(DISTINCT) is not additive, so naive rollup cascades are wrong;
    bitwise-OR of bitmaps IS associative, so the daily sketch table (one
    raw scan, ever) answers any coarser grain exactly. All built-in JVM
    aggregates; the bucket key (32768 ids / 4 KB bitmap per bucket)
    spreads hot groups across reducers."""
    from finance_reporting_etl_spark.operators.distinct import bitmap_daily, bitmap_rollup

    daily = bitmap_daily(_t(spark, sf_dir, "events"))
    return bitmap_rollup(
        daily, F.date_trunc("month", F.col("day")).cast("date")
    ).withColumnRenamed("grain", "month")


@query(
    "hll_distinct_rollup",
    f"""
    WITH est AS (SELECT * FROM '{_AUX_DIR}/hll_monthly_est/*.parquet'),
    exact AS (
        SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
               event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
        FROM events
        GROUP BY 1, 2
    )
    SELECT e.month, e.event_type, e.n_distinct_est, x.n_distinct_exact,
           CAST(abs(CAST(e.n_distinct_est AS DOUBLE) - x.n_distinct_exact)
                / x.n_distinct_exact <= 0.05 AS BOOLEAN) AS within_5pct
    FROM est e JOIN exact x USING (month, event_type)
    """,
    "A-tier mergeable APPROX distinct: daily Datasketches-HLL union-merged to month, estimate vs exact with error bound",
)
def q_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same rollup as ``bitmap_distinct_rollup`` with constant-size HLL
    sketches (~1.5 KB/group at lgK=12, any cardinality or key type) —
    the right trade for sparse/string keys where bitmaps blow up. The
    monthly estimates are persisted (oracle-shared); the oracle
    recomputes the exact counts from raw and re-derives the <=5% error
    flag, so a hash match pins both the merge plumbing and the accuracy
    claim. pytest additionally asserts every flag is true."""
    from finance_reporting_etl_spark.operators.distinct import hll_daily, hll_rollup

    ev = _t(spark, sf_dir, "events")
    daily = hll_daily(ev)
    monthly = hll_rollup(
        daily, F.date_trunc("month", F.col("day")).cast("date")
    ).withColumnRenamed("grain", "month")
    est = _persist_aux(spark, monthly, "hll_monthly_est")
    exact = ev.groupBy(
        F.date_trunc("month", "ts").cast("date").alias("month"), "event_type"
    ).agg(F.count_distinct("user_id").alias("n_distinct_exact"))
    return est.join(exact, ["month", "event_type"]).select(
        "month",
        "event_type",
        "n_distinct_est",
        "n_distinct_exact",
        (
            F.abs(F.col("n_distinct_est").cast("double") - F.col("n_distinct_exact"))
            / F.col("n_distinct_exact")
            <= 0.05
        ).alias("within_5pct"),
    )



def _run_staged_interval_join(spark, sf_dir, how):
    """Thin binding over ``streaming.joins.replay_interval_join`` (the
    chronological staging + replay lifecycle lives there)."""
    from finance_reporting_etl_spark.streaming.joins import replay_interval_join

    return replay_interval_join(spark, _t(spark, sf_dir, "events"), how)


@query(
    "streaming_view_purchase_join",
    """
    SELECT v.user_id AS user_id, v.ts AS view_ts, p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = v.user_id
     AND p.ts > v.ts
     AND p.ts <= v.ts + INTERVAL 1 DAY
    """,
    "§2.8 stream-stream interval join: two watermarked file streams, equality key + event-time range, bounded state, append sink",
)
def q_streaming_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous form of ``attribution_window_join``: a views
    stream joined to a purchases stream on user within (view_ts,
    view_ts + 1 day], replayed as two chronological micro-batches per
    side (maxFilesPerTrigger=1). The 2-day watermark on both sides
    bounds join state — a buffered view is evicted once the global
    watermark passes view_ts + 1 day, and chronological arrival
    guarantees every such view already saw all its matching purchases,
    so the bounded replay equals the batch join bit-for-bit (the
    oracle). Inner-join matches emit as soon as both rows arrive;
    the watermark governs eviction only."""
    return _run_staged_interval_join(spark, sf_dir, "inner")


# ---------------------------------------------------------------------------
# Shared co-purchase pair table (VERDICT r4 #6). Five graph queries
# (PageRank, weighted PageRank, BFS, triangles, clustering coefficient)
# previously each rebuilt ~the same lineitem self-join — roughly half of
# PageRank's wall time. One persisted (src, dst, n_lines, n_orders)
# table now feeds all of them: unweighted edges are its keys, weights
# are n_orders, the BFS repeat-graph is n_lines >= 2, the undirected
# form is src < dst. Both engines read the SAME parquet (oracle_aux
# pattern), so results are bit-identical to the inline builds. Cached
# once per (process, fixture dir); in production this is the persisted
# edge table a graph workload would maintain anyway.
# ---------------------------------------------------------------------------

_COPURCHASE_CACHE: dict = {}


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed co-purchase pairs with multiplicity: one row per
    ordered part pair sharing >=1 order, with the line-combination
    count and the distinct co-order count. Symmetric by construction
    ((x,y) present iff (y,x) is)."""
    if _COPURCHASE_CACHE.get("sf") != sf_dir:
        li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        a, b = li.alias("a"), li.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") != F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
            )
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.count_distinct("a.l_orderkey").alias("n_orders"),
            )
        )
        _persist_aux(spark, pairs, "copurchase_pairs")
        _COPURCHASE_CACHE["sf"] = sf_dir
    return spark.read.parquet(f"{_AUX_DIR}/copurchase_pairs")


def _copurchase_edges_sql() -> str:
    return f"""
        SELECT src, dst FROM '{_AUX_DIR}/copurchase_pairs/*.parquet'
    """


def _pagerank_oracle() -> str:
    from finance_reporting_etl_spark.operators.graph import pagerank_oracle_sql

    return pagerank_oracle_sql(_copurchase_edges_sql(), damping=0.85, iters=8)


@query(
    "part_copurchase_pagerank",
    _pagerank_oracle(),
    "X-tier iterative graph: PageRank power iteration as join+agg per round (oracle = same iteration unrolled as chained CTEs)",
)
def q_part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (distinct part pairs
    sharing an order — symmetric by construction, so no dangling-node
    term). 8 fixed iterations, damping 0.85, ranks scaled to mean 1.0
    and rounded to 6dp on both sides (summation order differs between
    engines; the iteration is contractive so 1e-15-level noise does not
    amplify). The oracle unrolls the identical iteration as pr0..pr8
    CTEs in DuckDB — a full value-hash over every node's rank.

    Edges come from the shared persisted co-purchase pair table
    (:func:`_copurchase_pairs`), whose keys ARE the distinct pair set;
    both engines read the same parquet."""
    edges = _copurchase_pairs(spark, sf_dir).select("src", "dst")
    from finance_reporting_etl_spark.operators.graph import pagerank

    return pagerank(edges, damping=0.85, iters=8).select(
        "id", F.round("rank", 6).alias("rank")
    )


@query(
    "rolling_zscore_anomalies",
    """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(value), 4) AS value
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, day, value,
               avg(value)         OVER win AS mu,
               stddev_samp(value) OVER win AS sigma,
               count(*)           OVER win AS n_prior
        FROM daily
        WINDOW win AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, value,
           CASE WHEN n_prior >= 7 AND sigma > 0
                THEN round((value - mu) / sigma, 4) END AS zscore,
           CAST(n_prior >= 7 AND sigma > 0
                AND abs((value - mu) / sigma) > 2.5 AS BOOLEAN) AS is_anomaly
    FROM w
    """,
    "§2.5 windowed anomaly detection: trailing 14-day z-score per series, warm-up + zero-variance guards",
)
def q_rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series outlier flags from a TRAILING window (14 prior days,
    current row excluded — the detector never sees the value it
    scores). Warm-up rows (<7 priors) and zero-variance windows emit
    NULL score / false flag instead of dividing by zero. One window
    over (series, day) — partitioned by series, so no global sort, and
    a series' history never leaves its partition at any scale."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("value"))
    win = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-14, -1)
    )
    w = daily.select(
        "event_type",
        "day",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sigma"),
        F.count(F.lit(1)).over(win).alias("n_prior"),
    )
    ok = (F.col("n_prior") >= 7) & (F.col("sigma") > 0)
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return w.select(
        "event_type",
        "day",
        "value",
        F.when(ok, F.round(z, 4)).alias("zscore"),
        (ok & (F.abs(z) > 2.5)).alias("is_anomaly"),
    )


@query(
    "indicator_linear_interpolation",
    """
    WITH daily AS (
        -- integer-scaled exact mean (values are 2dp): immune to
        -- aggregation-order rounding ties
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               round(sum(CAST(round(value * 100) AS BIGINT))
                     / (100.0 * count(*)), 4) AS value
        FROM events GROUP BY 1, 2
    ),
    observed AS (  -- simulated sensor dropout: day-of-month % 3 = 0 missing
        SELECT * FROM daily WHERE extract(day FROM day) % 3 <> 0
    ),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    spine AS (
        SELECT t.event_type, s.day
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
                    FROM bounds) s
    ),
    j AS (
        SELECT s.event_type, s.day, o.value,
               CASE WHEN o.value IS NOT NULL THEN s.day END AS day_known
        FROM spine s LEFT JOIN observed o USING (event_type, day)
    ),
    n AS (
        SELECT event_type, day, value,
               last_value(value IGNORE NULLS) OVER wp AS prev_v,
               last_value(day_known IGNORE NULLS) OVER wp AS prev_d,
               first_value(value IGNORE NULLS) OVER wf AS next_v,
               first_value(day_known IGNORE NULLS) OVER wf AS next_d
        FROM j
        WINDOW wp AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day,
           round(CASE
               WHEN value IS NOT NULL THEN value
               WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                   prev_v + (next_v - prev_v)
                   * (day - prev_d) / (next_d - prev_d)
               END, 4) AS filled_value,
           CAST(value IS NULL AS BOOLEAN) AS was_interpolated
    FROM n
    """,
    "§2.5 time-weighted linear interpolation over a gap-filled spine (IGNORE NULLS neighbor scan, boundary gaps stay NULL)",
)
def q_indicator_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing daily readings: a calendar spine
    per series left-joins the observed points (a deterministic
    day-of-month dropout simulates sensor gaps), then two IGNORE-NULLS
    window scans find each gap's bracketing neighbors and the fill is
    time-weighted between them. Boundary gaps (no neighbor on one
    side) stay NULL. Same partitioned-window scale shape as the
    z-score detector: a series never leaves its partition. Operator:
    operators.timeseries.linear_interpolate_daily."""
    from finance_reporting_etl_spark.operators.timeseries import (
        linear_interpolate_daily,
    )

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.round(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            / (100.0 * F.count(F.lit(1))),
            4,
        ).alias("value")
    )
    # deterministic day-of-month dropout simulates sensor gaps
    observed = daily.filter(F.dayofmonth("day") % 3 != 0)
    return linear_interpolate_daily(observed, daily, ["event_type"])


@query(
    "random_projection_topk",
    f"""
    WITH m AS (SELECT * FROM '{_AUX_DIR}/rp_matrix/*.parquet'),
    e AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               unnest(embedding) AS v
        FROM embeddings
    ),
    p AS (
        SELECT e.vec_id, m.j, sum(CAST(e.v AS DOUBLE) * m.w) AS p
        FROM e JOIN m ON m.i = e.i
        GROUP BY 1, 2
    ),
    nrm AS (SELECT vec_id, sqrt(sum(p * p)) AS nr FROM p GROUP BY 1),
    pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.p * b.p) AS dp
        FROM p a JOIN p b ON a.j = b.j AND a.vec_id <> b.vec_id
        WHERE a.vec_id IN (0, 1, 2, 3, 4, 5, 6, 7, 8, 9)
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               round(dp / nullif(na.nr * nb.nr, 0), 4) AS score
        FROM pairs
        JOIN nrm na ON na.vec_id = query_id
        JOIN nrm nb ON nb.vec_id = neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
    """,
    "X3 JL random-projection ANN: Arrow matmul 64->32 dims, exact top-k in projected space (oracle recomputes the projection from the shared matrix)",
)
def q_random_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss reduction as an ANN pre-step: a shared
    Rademacher matrix (persisted; +-0.25 entries are exact in float64,
    so both engines derive bit-identical products) projects 64-dim
    float vectors to 32 doubles via one BLAS matmul per Arrow batch,
    then exact cosine top-5 runs in the reduced space. At 100 TB the
    projected table is the queryable artifact — narrower scans and
    2x cheaper distance math, with the JL distortion bound (pairwise
    cosine preserved to ~1/sqrt(d_out)) and top-50 containment pinned
    by pytest. The oracle
    independently recomputes projection, norms, scores, and ranking
    from the persisted matrix."""
    import numpy as np

    from finance_reporting_etl_spark.operators.similarity import (
        project_vectors,
        rademacher_matrix,
        random_projection_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    mat = rademacher_matrix(64, 32)
    long = [
        (int(i), int(j), float(mat[i, j])) for i in range(64) for j in range(32)
    ]
    _persist_aux(
        spark, spark.createDataFrame(long, "i int, j int, w double"), "rp_matrix"
    )
    projected = project_vectors(emb, mat)
    return random_projection_topk(projected, list(range(10)), k=5)


@query(
    "histogram_quantile_rollup",
    """
    WITH d AS (
        SELECT CAST(date_trunc('month', ts) AS DATE) AS grain, event_type,
               CAST(least(greatest(floor(value / 4.0), 0), 255) AS INT) AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2, 3
    ),
    cum AS (
        SELECT grain, event_type, bin, cnt,
               sum(cnt) OVER (PARTITION BY grain, event_type ORDER BY bin) AS cum,
               sum(cnt) OVER (PARTITION BY grain, event_type) AS total
        FROM d
    )
    SELECT grain, event_type, p,
           round(bin * 4.0 + 4.0 * (p * total - (cum - cnt)) / cnt, 4) AS est
    FROM cum CROSS JOIN (VALUES (0.5), (0.9), (0.99)) pp(p)
    WHERE cum >= p * total AND cum - cnt < p * total
    """,
    "A-tier mergeable quantile sketch: daily fixed-bin histograms summed to month, interpolated p50/p90/p99 (oracle builds the month histogram from raw — merge proven lossless)",
)
def q_histogram_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly p50/p90/p99 of event value from a per-(day, type, bin)
    histogram table — the mergeable alternative to ``percentile``
    (which buffers every value per group: a hot group at 100 TB is an
    OOM) and ``percentile_approx`` (whose sketch can't be re-merged
    across grains). Bin width 4 = a power of two, so value/width is
    exact float64 and the oracle's month-from-raw histogram is
    bit-identical to Spark's month-from-daily merge; pytest bounds the
    p50/p90 estimates against the exact percentile by one bin width
    (in sparse tails — p99 of a few-hundred-row group — ANY estimator
    wobbles by the local order-statistic gap, so only the hash, not a
    tight error bound, is asserted there)."""
    from finance_reporting_etl_spark.operators.sketches import (
        histogram_quantiles,
        histogram_rollup,
        value_histogram,
    )

    daily = value_histogram(_t(spark, sf_dir, "events"))
    monthly = histogram_rollup(daily, F.date_trunc("month", F.col("day")).cast("date"))
    return histogram_quantiles(monthly)


@query(
    "cdc_changelog_apply",
    """
    WITH c AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               value
        FROM events
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id) AS rn
        FROM c
    )
    SELECT user_id, ts AS updated_at, round(value, 6) AS value
    FROM r WHERE rn = 1 AND op = 'U'
    """,
    "§2.8 x O5 CDC changelog apply: upsert/DELETE stream folded via foreachBatch with tombstone retention, compacted on read",
)
def q_cdc_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC semantics on top of the streaming upsert fold: the changelog
    carries op U (upsert) / D (delete — here, 'error' events kill the
    user's row). The maintained state keeps the latest row per key
    INCLUDING tombstones — that is what keeps the fold associative (a
    delete must shadow older upserts arriving in later replayed
    batches) — and reads compact by filtering op = 'D'. The oracle
    computes the same final state from the full changelog in one shot;
    equality proves tombstone shadowing across every batch boundary."""
    from finance_reporting_etl_spark.streaming.merge import streaming_merge_upsert
    from finance_reporting_etl_spark.streaming.staging import run_file_stream

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
    )
    return run_file_stream(
        spark,
        lambda src: changelog.repartition(4).write.mode("overwrite").parquet(src),
        lambda src, schema, tmp: streaming_merge_upsert(
            spark, src, schema,
            checkpoint_dir=f"{tmp}/ckpt", target_dir=f"{tmp}/target",
            keys=["user_id"], order_col="ts", tiebreak_col="event_id",
        ),
        lambda tmp: spark.read.parquet(f"{tmp}/target")
        .filter(F.col("op") != "D")
        .select(
            "user_id",
            F.col("ts").alias("updated_at"),
            F.round("value", 6).alias("value"),
        ),
        prefix="cdc_",
        label="cdc_changelog_apply",
    )


_QUALITY_SQL = """round(greatest(0.0,
                   least(length(text) / 500.0, 1.0)
                   * (1.0 - least(
                         round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                               / nullif(length(text), 0), 6)
                       + round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                               / nullif(length(text), 0), 6),
                       1.0))), 4)"""


@query(
    "corpus_training_pipeline",
    f"""
    WITH scored AS (
        SELECT doc_id, lang, text, {_QUALITY_SQL} AS quality,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    ),
    deduped AS (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM scored WHERE quality >= 0.3
    ),
    surv AS (
        SELECT doc_id, lang, text, quality, {_b256("decon")} AS bdecon
        FROM deduped WHERE rn = 1
    ),
    t AS (SELECT doc_id, bdecon, {_TOKS} AS toks FROM surv),
    grams AS (
        SELECT doc_id, bdecon,
               unnest(list_transform(generate_series(1, len(toks)-3),
                                     i -> array_to_string(toks[i:i+3], ' '))) AS gram
        FROM t WHERE len(toks) >= 4
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE bdecon < 13),
    contaminated AS (
        SELECT DISTINCT doc_id FROM grams
        WHERE bdecon >= 13 AND gram IN (SELECT gram FROM bench)
    ),
    clean AS (
        SELECT s.*, len({_TOKS}) AS n_toks FROM surv s
        WHERE bdecon >= 13
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    sp AS (
        SELECT *, CASE WHEN {_b256("split")} < 0.8 * 256.0 THEN 'train'
                       WHEN {_b256("split")} < 0.9 * 256.0 THEN 'val'
                       ELSE 'test' END AS split
        FROM clean
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           round(sum(CAST(round(quality * 10000) AS BIGINT))
                 / (10000.0 * count(*)), 6) AS avg_quality
    FROM sp GROUP BY 1, 2
    """,
    "X-pipeline flagship composition: quality gate -> exact dedup -> 4-gram decontamination -> leak-free split -> per-split stats, one Catalyst plan",
)
def q_corpus_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data pipeline, composed entirely from
    already-oracle-verified operators: quality-score and gate (>= 0.3),
    deterministic exact dedup, benchmark holdout (salted md5 bucket)
    with 4-gram decontamination of the training side, leak-free
    80/10/10 hash split, and per-(split, lang) document/token/quality
    stats. Every stage is a narrow Catalyst transform — the only
    data-sized shuffles are the dedup fingerprint window, the gram
    join (benchmark side broadcast), and the final stats groupBy; the
    full chain is ONE lazily-planned DAG, so Catalyst pushes the
    quality filter beneath everything and prunes text as soon as grams
    and token counts are extracted."""
    from finance_reporting_etl_spark.functions.text import quality_score, token_count
    from finance_reporting_etl_spark.operators.corpus import (
        hash_split,
        md5_bucket,
        ngram_decontaminate,
    )
    from finance_reporting_etl_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    scored = docs.withColumn("quality", quality_score("text")).filter(
        F.col("quality") >= 0.3
    )
    surv = exact_dedup(scored, "text", "doc_id")
    b = md5_bucket("doc_id", salt="decon")
    train, bench = surv.filter(b >= 13), surv.filter(b < 13)
    contaminated = ngram_decontaminate(train, bench, n=4).select("doc_id")
    clean = train.join(contaminated, "doc_id", "left_anti").withColumn(
        "n_toks", token_count(F.lower(F.col("text")))
    )
    sp = hash_split(clean, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return sp.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        # integer-scaled exact mean: quality is 4dp-rounded, so the
        # x10000 sum is an exact integer in ANY aggregation order —
        # a float avg() near a rounding tie flips with partial-agg
        # order (observed run-to-run at sf0.001)
        F.round(
            F.sum(F.round(F.col("quality") * 10000).cast("long"))
            / (10000.0 * F.count(F.lit(1))),
            6,
        ).alias("avg_quality"),
    )


@query(
    "entity_resolution_blocked",
    """
    WITH corrupted AS (
        SELECT c_custkey AS query_id,
               concat(substr(c_name, 1, 9 + (c_custkey % 4)),
                      substr(c_name, 11 + (c_custkey % 4), 18)) AS q_name
        FROM customer
    ),
    qk AS (
        SELECT query_id, q_name, 'tail' AS blk, right(q_name, 4) AS key FROM corrupted
    ),
    rk AS (
        SELECT c_custkey AS ref_id, c_name AS r_name, 'tail' AS blk,
               right(c_name, 4) AS key FROM customer
    ),
    cand AS (
        SELECT DISTINCT q.query_id, q.q_name, r.ref_id, r.r_name
        FROM qk q JOIN rk r ON q.blk = r.blk AND q.key = r.key
    ),
    scored AS (
        SELECT query_id, ref_id, levenshtein(q_name, r_name) AS distance
        FROM cand
    ),
    ranked AS (
        SELECT query_id, ref_id AS matched_id, distance,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY distance, ref_id) AS rn
        FROM scored WHERE distance <= 2
    )
    SELECT query_id, matched_id, distance,
           CAST(query_id = matched_id AS BOOLEAN) AS correct
    FROM ranked WHERE rn = 1
    """,
    "X-tier entity resolution: recall-complete multi-key blocking + Levenshtein verify + deterministic winner (no all-pairs join)",
)
def q_entity_resolution_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-record linkage at join scale: every customer name gets one
    char deleted (position 10 + key%4, inside the zero-padding region
    — a deterministic typo), then the corrupted names are resolved
    against the clean table WITHOUT a cross join. The blocking key is
    the LAST 4 characters — the high-entropy end of a zero-padded id,
    so buckets stay tiny (~n/10^4 per side) — and it is
    recall-complete for this corruption class (a deletion left of the
    last 4 chars never changes them), so the true match is always a
    candidate; Levenshtein <= 2 verifies, min (distance, id) resolves.
    Blocking-key choice is the whole scale game: a low-entropy window
    (e.g. chars 10-13, constant "0000" across a zero-padded id space)
    funnels EVERY record into one bucket and re-creates the n^2 join
    — measured 500x slower at sf0.1 before this key was fixed. pytest
    pins blocking recall: every query resolves at distance 1, and
    accuracy is re-derived identically by both engines."""
    from finance_reporting_etl_spark.operators.dedup import blocked_entity_resolution

    cust = _t(spark, sf_dir, "customer")
    corrupted = cust.select(
        F.col("c_custkey").alias("query_id"),
        F.expr(
            "concat(substr(c_name, 1, 9 + (c_custkey % 4)),"
            " substr(c_name, 11 + (c_custkey % 4), 18))"
        ).alias("q_name"),
    )
    reference = cust.select(
        F.col("c_custkey").alias("ref_id"), F.col("c_name").alias("r_name")
    )
    blocks = [
        ("tail", lambda c: c.substr(F.length(c) - 3, F.lit(4))),
    ]
    resolved = blocked_entity_resolution(
        corrupted, reference, blocks, q_name="q_name", r_name="r_name"
    )
    return resolved.select(
        "query_id",
        "matched_id",
        "distance",
        (F.col("query_id") == F.col("matched_id")).alias("correct"),
    )


@query(
    "event_transition_matrix",
    """
    WITH s AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type AS cur, next_type AS nxt,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) / sum(count(*)) OVER (PARTITION BY event_type), 6) AS p
    FROM s WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    "§2.5 sequence modeling: first-order Markov transition matrix over per-user event streams (lead window + conditional frequencies)",
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next event type | current) estimated from each user's
    time-ordered stream — the sequence-statistics building block for
    behavioral models and multi-touch attribution. One user-partitioned
    lead() window (a user's history never crosses partitions) and one
    25-cell aggregate; the normalizing window runs over the 5x5 result,
    not the data."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = s.groupBy(
        F.col("event_type").alias("cur"), F.col("next_type").alias("nxt")
    ).agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("cur")
    return counts.select(
        "cur", "nxt", "n", F.round(F.col("n") / F.sum("n").over(wn), 6).alias("p")
    )


@query(
    "copurchase_association_rules",
    f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM baskets),
    item AS (SELECT l_partkey, count(*) AS n_item FROM baskets GROUP BY 1),
    pairs AS (
        SELECT src AS item_a, dst AS item_b, n_orders AS n_ab
        FROM '{_AUX_DIR}/copurchase_pairs/*.parquet' WHERE src < dst
    )
    SELECT item_a, item_b, CAST(n_ab AS BIGINT) AS n_ab,
           round(n_ab / n.n_orders, 6) AS support,
           round(n_ab / ia.n_item, 6) AS conf_a_to_b,
           round(n_ab / ib.n_item, 6) AS conf_b_to_a,
           round(n_ab * n.n_orders / (ia.n_item * ib.n_item), 4) AS lift
    FROM pairs
    JOIN item ia ON ia.l_partkey = item_a
    JOIN item ib ON ib.l_partkey = item_b
    CROSS JOIN n
    WHERE n_ab >= 2
    """,
    "A/X-tier market-basket association rules: pair support / directional confidence / lift over order baskets (ordered pair join bounds the pair space)",
)
def q_copurchase_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: support, both directional
    confidences, and lift for every part pair co-occurring in >= 2
    orders. Pair supports come from the shared persisted pair table
    (n_orders there IS the distinct co-order count, so the basket
    self-join is never re-run); item counts are a cheap group-by that
    broadcasts back onto the pair table."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = float(
        baskets.select(F.count_distinct("l_orderkey")).collect()[0][0]
    )
    item = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    pairs = (
        _copurchase_pairs(spark, sf_dir)
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("item_a"),
            F.col("dst").alias("item_b"),
            F.col("n_orders").alias("n_ab"),
        )
        .filter(F.col("n_ab") >= 2)
    )
    ia = F.broadcast(item.select(F.col("l_partkey").alias("item_a"), F.col("n_item").alias("na")))
    ib = F.broadcast(item.select(F.col("l_partkey").alias("item_b"), F.col("n_item").alias("nb")))
    return (
        pairs.join(ia, "item_a")
        .join(ib, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(F.col("n_ab") / F.lit(n_orders), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("na"), 6).alias("conf_a_to_b"),
            F.round(F.col("n_ab") / F.col("nb"), 6).alias("conf_b_to_a"),
            # single division of integer-exact operands: bitwise equal
            # across engines, so the 4dp rounding can't straddle a tie
            F.round(
                F.col("n_ab") * F.lit(n_orders) / (F.col("na") * F.col("nb")), 4
            ).alias("lift"),
        )
    )


@query(
    "streaming_left_outer_interval_join",
    """
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    wm AS (
        SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM p))
               - INTERVAL 2 DAY AS w
    ),
    inner_part AS (
        SELECT v.user_id AS user_id, v.ts AS view_ts, p.ts AS purchase_ts
        FROM v JOIN p ON p.user_id = v.user_id
         AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 DAY
    ),
    unmatched AS (
        SELECT v.user_id, v.ts AS view_ts, CAST(NULL AS TIMESTAMP) AS purchase_ts
        FROM v
        WHERE NOT EXISTS (
            SELECT 1 FROM p WHERE p.user_id = v.user_id
              AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 DAY
        )
        AND v.ts + INTERVAL 1 DAY < (SELECT w FROM wm)
    )
    SELECT * FROM inner_part UNION ALL SELECT * FROM unmatched
    """,
    "§2.8 stream-stream LEFT OUTER interval join: inner matches emit on arrival, NULL pads emit only at watermark expiry, open-window rows emit nothing",
)
def q_streaming_left_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The outer-join watermark contract, proven end to end: a
    NULL-padded row may only emit once the global watermark (min of
    both streams' max event time, minus the 2-day delay) passes
    view_ts + 1 day — earlier emission could be contradicted by a
    late purchase. Left rows whose join window is still open when the
    bounded replay drains emit NOTHING (they would wait forever on a
    real stream). The oracle encodes exactly that asymmetry: all inner
    matches, plus null pads only for unmatched views with
    view_ts + 1 day < watermark."""
    return _run_staged_interval_join(spark, sf_dir, "leftOuter")


_TRIANGLE_CTES = f"""
    e AS (
        SELECT src AS x, dst AS y
        FROM '{_AUX_DIR}/copurchase_pairs/*.parquet' WHERE src < dst
    ),
    deg AS (
        SELECT id, count(*) AS deg FROM (
            SELECT x AS id FROM e UNION ALL SELECT y FROM e
        ) GROUP BY 1
    ),
    oriented AS (
        SELECT CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND e.x < e.y)
                    THEN e.x ELSE e.y END AS src,
               CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND e.x < e.y)
                    THEN e.y ELSE e.x END AS dst
        FROM e JOIN deg dx ON dx.id = e.x JOIN deg dy ON dy.id = e.y
    ),
    wedges AS (
        SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
        FROM oriented w1 JOIN oriented w2 ON w1.src = w2.src AND w1.dst < w2.dst
    ),
    closing AS (
        SELECT least(src, dst) AS v, greatest(src, dst) AS w FROM oriented
    ),
    tri AS (SELECT u, v, w FROM wedges JOIN closing USING (v, w)),
    tri_counts AS (
        SELECT id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
            SELECT u AS id FROM tri
            UNION ALL SELECT v FROM tri
            UNION ALL SELECT w FROM tri
        ) GROUP BY 1
    )
"""


@query(
    "copurchase_clustering_coefficient",
    f"""
    WITH {_TRIANGLE_CTES}
    SELECT d.id,
           d.deg AS degree,
           coalesce(t.n_triangles, 0) AS n_triangles,
           round(coalesce(t.n_triangles, 0)
                 / nullif(d.deg * (d.deg - 1) / 2.0, 0), 6) AS clustering_coeff
    FROM deg d LEFT JOIN tri_counts t ON t.id = d.id
    """,
    "X-tier graph: local clustering coefficient = triangles / C(degree,2) per node (composes triangle counting + degrees)",
)
def q_copurchase_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watts-Strogatz local clustering per part: how close each node's
    neighborhood is to a clique — the standard cohesion metric next to
    raw triangle counts (community detection, anomalous-hub screening).
    Composes the oriented triangle counts with the degree table; the
    ratio normalizes by C(deg, 2) possible neighbor pairs. Isolated-
    edge nodes (deg 1) get NULL, triangle-free nodes 0. Undirected
    edges ride the shared persisted pair table (src < dst half)."""
    edges = (
        _copurchase_pairs(spark, sf_dir)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    from finance_reporting_etl_spark.operators.graph import triangle_counts

    deg = (
        edges.select(F.col("id_a").alias("id"))
        .unionAll(edges.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(edges)
    return deg.join(tri, "id", "left").select(
        "id",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        F.round(
            F.coalesce("n_triangles", F.lit(0))
            / F.nullif(F.col("degree") * (F.col("degree") - 1) / 2.0, F.lit(0)),
            6,
        ).alias("clustering_coeff"),
    )


@query(
    "copurchase_triangle_counts",
    f"""
    WITH e AS (
        SELECT src AS x, dst AS y
        FROM '{_AUX_DIR}/copurchase_pairs/*.parquet' WHERE src < dst
    ),
    deg AS (
        SELECT id, count(*) AS deg FROM (
            SELECT x AS id FROM e UNION ALL SELECT y FROM e
        ) GROUP BY 1
    ),
    oriented AS (
        SELECT CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND e.x < e.y)
                    THEN e.x ELSE e.y END AS src,
               CASE WHEN dx.deg < dy.deg OR (dx.deg = dy.deg AND e.x < e.y)
                    THEN e.y ELSE e.x END AS dst
        FROM e JOIN deg dx ON dx.id = e.x JOIN deg dy ON dy.id = e.y
    ),
    wedges AS (
        SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
        FROM oriented w1 JOIN oriented w2 ON w1.src = w2.src AND w1.dst < w2.dst
    ),
    closing AS (
        SELECT least(src, dst) AS v, greatest(src, dst) AS w FROM oriented
    ),
    tri AS (SELECT u, v, w FROM wedges JOIN closing USING (v, w))
    SELECT id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT u AS id FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri
    ) GROUP BY 1
    """,
    "X-tier graph: per-node triangle counts via degree-ordered orientation (wedge space sum d_out^2, hub-proof — no d^2 blowup)",
)
def q_copurchase_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation per part in the co-purchase graph — the
    local-clustering building block. Degree-ordered orientation makes
    every node's out-degree O(sqrt(m)) regardless of hubs, so the
    wedge self-join is bounded by sum d_out^2, not sum d^2; each
    triangle is generated exactly once (at its rank-minimum corner)
    and credited to all three corners. Pure equi-joins end to end.
    Undirected edges ride the shared persisted pair table (src < dst
    half)."""
    edges = (
        _copurchase_pairs(spark, sf_dir)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    from finance_reporting_etl_spark.operators.graph import triangle_counts

    return triangle_counts(edges)


@query(
    "dbt_schema_tests",
    """
    SELECT 'customer' AS table_name, 'c_custkey' AS column_name, 'unique' AS test_name,
           CAST(coalesce((SELECT sum(n) FROM (SELECT count(*) AS n FROM customer GROUP BY c_custkey HAVING count(*) > 1)), 0) AS BIGINT) AS n_failures
    UNION ALL
    SELECT 'customer', 'c_custkey', 'not_null',
           CAST(count_if(c_custkey IS NULL) AS BIGINT) FROM customer
    UNION ALL
    SELECT 'orders', 'o_orderkey', 'unique',
           CAST(coalesce((SELECT sum(n) FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)), 0) AS BIGINT)
    UNION ALL
    SELECT 'orders', 'o_custkey', 'relationships',
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
    UNION ALL
    SELECT 'orders', 'o_orderstatus', 'accepted_values',
           CAST(count_if(o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F')) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem', 'l_orderkey', 'relationships',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_orderkey IS NOT NULL
                   AND l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem', 'l_returnflag', 'accepted_values',
           CAST(count_if(l_returnflag IS NULL OR l_returnflag NOT IN ('A', 'N', 'R')) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events', 'event_id', 'unique',
           CAST(coalesce((SELECT sum(n) FROM (SELECT count(*) AS n FROM events GROUP BY event_id HAVING count(*) > 1)), 0) AS BIGINT)
    UNION ALL
    SELECT 'events', 'user_id', 'not_null',
           CAST(count_if(user_id IS NULL) AS BIGINT) FROM events
    UNION ALL
    SELECT 'documents', 'lang', 'accepted_values',
           CAST(count_if(lang IS NULL OR lang NOT IN ('en', 'de', 'es', 'fr', 'zh')) AS BIGINT)
    FROM documents
    """,
    "O-tier dbt-test analog: unique / not_null / relationships / accepted_values compiled to aggregates + broadcast anti-joins",
)
def q_dbt_schema_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dbt ``tests:`` surface (schema tests evaluated
    after every `dbt run`): a declarative suite over the star schema —
    key uniqueness, not-null, referential integrity (orders->customer,
    lineitem->orders via broadcast LEFT ANTI joins), and domain checks.
    The `o_orderstatus IN ('O','F')` test is deliberately stricter than
    the data (status 'P' exists) so a NONZERO failure count flows
    through the report — proving failures are counted, not just that
    clean tables pass. Failure COUNTS, not failing rows, keep the
    report driver-safe at any scale."""
    from finance_reporting_etl_spark.plans.schema_tests import SchemaTest, TestSuite

    tables = {
        n: _t(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "events", "documents")
    }
    suite = TestSuite(
        [
            SchemaTest("customer", "c_custkey", "unique"),
            SchemaTest("customer", "c_custkey", "not_null"),
            SchemaTest("orders", "o_orderkey", "unique"),
            SchemaTest(
                "orders", "o_custkey", "relationships",
                to_table="customer", to_column="c_custkey",
            ),
            SchemaTest("orders", "o_orderstatus", "accepted_values", values=["O", "F"]),
            SchemaTest(
                "lineitem", "l_orderkey", "relationships",
                to_table="orders", to_column="o_orderkey",
            ),
            SchemaTest(
                "lineitem", "l_returnflag", "accepted_values", values=["A", "N", "R"]
            ),
            SchemaTest("events", "event_id", "unique"),
            SchemaTest("events", "user_id", "not_null"),
            SchemaTest(
                "documents", "lang", "accepted_values",
                values=["en", "de", "es", "fr", "zh"],
            ),
        ]
    )
    return suite.run(tables)


@query(
    "dedup_incremental_batch",
    f"""
    WITH ix AS (SELECT * FROM '{_AUX_DIR}/incr_fp_index/*.parquet'),
    raw_batch AS (
        -- genuinely new docs
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        -- corpus resubmissions, re-cased/padded (normalization-equal)
        SELECT doc_id + 100000, upper(text) || '  '
        FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 0
        UNION ALL
        -- within-batch duplicates of the new docs
        SELECT doc_id + 200000, text
        FROM documents WHERE doc_id % 5 = 0 AND doc_id % 3 = 0
    ),
    batch AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM raw_batch
    ),
    w AS (
        SELECT b.doc_id, b.fp, ix.owner_id,
               min(b.doc_id) OVER (PARTITION BY b.fp) AS first_in_batch
        FROM batch b LEFT JOIN ix ON ix.fp = b.fp
    )
    SELECT doc_id,
           CASE WHEN owner_id IS NOT NULL THEN 'dup_of_corpus'
                WHEN doc_id > first_in_batch THEN 'dup_in_batch'
                ELSE 'new' END AS status,
           CASE WHEN owner_id IS NOT NULL THEN owner_id
                WHEN doc_id > first_in_batch THEN first_in_batch END AS dup_of
    FROM w
    """,
    "X1 incremental corpus ingestion: new batch deduped against the PERSISTED fingerprint index — the corpus itself is never rescanned",
)
def q_dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape of exact dedup at 100 TB: the corpus'
    fingerprint index (fp -> owning doc) is a maintained artifact, and
    each incoming batch joins against the INDEX — a table of one
    narrow row per distinct document — instead of rescanning corpus
    text. Batch rows are classified new / dup_of_corpus /
    dup_in_batch (lowest batch id wins within the batch, corpus
    ownership wins over batch ties), with the duplicate target
    reported. The index is oracle-shared; DuckDB re-derives every
    classification. Accepted rows' fingerprints would then be appended
    to the index — the maintenance step ``exact_dedup`` does in one
    shot for a static corpus (operators/dedup.py:34). Operator:
    operators.dedup.incremental_dedup_classify."""
    from finance_reporting_etl_spark.functions.text import fingerprint
    from finance_reporting_etl_spark.operators.dedup import (
        incremental_dedup_classify,
    )

    docs = _t(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 5 != 0)
    # the incoming batch mixes genuinely new docs, corpus resubmissions
    # (re-cased/whitespace-padded — normalization-equal), and
    # within-batch duplicates, so every classification path executes
    batch = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
        .unionByName(
            docs.filter((F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 7 == 0)).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(F.upper("text"), F.lit("  ")).alias("text"),
            )
        )
        .unionByName(
            docs.filter((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 3 == 0)).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
    )
    index = _persist_aux(
        spark,
        existing.select(fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("owner_id")),
        "incr_fp_index",
    )
    b = batch.select("doc_id", fingerprint("text").alias("fp"))
    return incremental_dedup_classify(b, index)


def _copurchase_weighted_edges_sql() -> str:
    return f"""
        SELECT src, dst, CAST(n_orders AS DOUBLE) AS w
        FROM '{_AUX_DIR}/copurchase_pairs/*.parquet'
    """


def _pagerank_weighted_oracle() -> str:
    from finance_reporting_etl_spark.operators.graph import pagerank_weighted_oracle_sql

    return pagerank_weighted_oracle_sql(
        _copurchase_weighted_edges_sql(), damping=0.85, iters=8
    )


@query(
    "part_copurchase_pagerank_weighted",
    _pagerank_weighted_oracle(),
    "X-tier weighted PageRank: contributions proportional to co-order counts (oracle = unrolled weighted iteration)",
)
def q_part_copurchase_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase PageRank where an edge's pull scales with HOW OFTEN
    the pair was co-ordered (contrib = rank * w / weighted-out-degree)
    — the form link-graph quality weighting actually uses (a domain
    linked 1000x should pull harder than a one-off). Same
    broadcast-rank loop as the unweighted operator; weighted degrees
    ride the cached edges. Unweighted PageRank is the w=1 special
    case, so the two queries' rank orderings diverging is itself
    evidence the weights flow through (they do — co-order counts are
    skewed). Edges ride the shared persisted pair table
    (:func:`_copurchase_pairs`): w = distinct co-order count."""
    edges = _copurchase_pairs(spark, sf_dir).select(
        "src", "dst", F.col("n_orders").cast("double").alias("w")
    )
    from finance_reporting_etl_spark.operators.graph import pagerank_weighted

    return pagerank_weighted(edges, damping=0.85, iters=8).select(
        "id", F.round("rank", 6).alias("rank")
    )


def _copurchase_repeat_edges_sql() -> str:
    # co-purchase pairs seen in >= 2 order lines: a much sparser graph
    # than the raw co-purchase clique union (threshold prunes the
    # one-off pairs), so BFS frontiers stay meaningful for several hops
    return f"""
        SELECT src, dst FROM '{_AUX_DIR}/copurchase_pairs/*.parquet'
        WHERE n_lines >= 2
    """


def _bfs_oracle() -> str:
    from finance_reporting_etl_spark.operators.graph import bfs_oracle_sql

    return bfs_oracle_sql(
        _copurchase_repeat_edges_sql(),
        "SELECT DISTINCT src AS id FROM edges WHERE src % 97 = 0",
        max_hops=4,
    )


@query(
    "copurchase_bfs_distances",
    _bfs_oracle(),
    "X-tier iterative graph: multi-source BFS / reachability (frontier expansion, anti-join settles; oracle = unrolled min-agg CTEs)",
)
def q_copurchase_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop count from seed parts (partkey % 97 == 0) over the
    repeat-co-purchase graph (pairs co-ordered >= 2 times), capped at 4
    hops — the 'how far is every item from a curated seed set' shape
    (catalog expansion, contamination blast-radius). Frontier BFS: each
    round touches only edges incident to the newest frontier; settled
    nodes are anti-joined away, so per-round work shrinks as the search
    saturates. Integer arithmetic end-to-end — the unrolled oracle
    hash-matches every (node, distance) pair exactly. Edges ride the
    shared persisted pair table filtered to n_lines >= 2."""
    from finance_reporting_etl_spark.operators.graph import bfs_distances

    edges = (
        _copurchase_pairs(spark, sf_dir)
        .filter(F.col("n_lines") >= 2)
        .select("src", "dst")
    )
    sources = edges.select("src").distinct().filter(F.col("src") % 97 == 0)
    return bfs_distances(edges, sources, max_hops=4)


@query(
    "span_dedup_rewrite",
    """
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ), c AS (
        SELECT doc_id, CAST(g AS INT) AS chunk_idx,
               array_to_string(list_slice(toks, g * 32 + 1, g * 32 + 32), ' ')
                   AS chunk_text
        FROM t, unnest(generate_series(0, (len(toks) + 31) // 32 - 1)) AS u(g)
    ), w AS (
        SELECT doc_id, chunk_idx, chunk_text,
               row_number() OVER (PARTITION BY md5(chunk_text)
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM c
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
                        FILTER (WHERE rn = 1), '') AS clean_text
    FROM w GROUP BY doc_id
    """,
    "X1/X-pipeline span-level dedup WITH document rewrite: global keep-first over 32-token spans, docs reassembled in span order (Lee-et-al exact-substring scrub, rewrite stage)",
)
def q_span_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rewrite half of substring dedup: `chunk_dedup_occurrences`
    FINDS repeated spans; this removes every later occurrence of a
    repeated 32-token span (keep-first by (doc_id, span order)) and
    reassembles each document's surviving spans into cleaned text — the
    pass that actually scrubs boilerplate out of a training corpus.

    Two uniform shuffles: one on the span fingerprint (md5 — no skew)
    for the global keep-first window, one on doc_id to reassemble.
    Reassembly sorts span structs INSIDE the row (array_sort of
    (idx, text) structs) instead of a per-doc ordered window — order
    restored without a third exchange. At 100 TB both keys are
    fine-grained and uniform; nothing buffers more than one document.
    Operator: operators.dedup.span_dedup_rewrite."""
    from finance_reporting_etl_spark.operators.dedup import span_dedup_rewrite

    return span_dedup_rewrite(_t(spark, sf_dir, "documents"), span_tokens=32)


@query(
    "winsorized_value_stats",
    """
    WITH b AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS cnt
        FROM events
    ), bounds AS (
        SELECT event_type,
               min(CASE WHEN rn = greatest(CAST(ceil(cnt * 0.01) AS BIGINT), 1)
                        THEN value END) AS lo_cut,
               min(CASE WHEN rn = greatest(CAST(ceil(cnt * 0.99) AS BIGINT), 1)
                        THEN value END) AS hi_cut
        FROM b GROUP BY event_type
    ), c AS (
        SELECT b.event_type, lo_cut, hi_cut,
               CAST(round(value * 100) AS BIGINT) AS rawi,
               CAST(round(least(greatest(value, lo_cut), hi_cut) * 100) AS BIGINT)
                   AS wini
        FROM b JOIN bounds USING (event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           min(lo_cut) AS lo_cut,
           min(hi_cut) AS hi_cut,
           round(CAST(sum(rawi) AS DOUBLE) / 100.0 / count(*), 6) AS mean_raw,
           round(CAST(sum(wini) AS DOUBLE) / 100.0 / count(*), 6) AS mean_winsor,
           round(sqrt(greatest(
               (CAST(sum(wini * wini) AS DOUBLE)
                - CAST(sum(wini) AS DOUBLE) * CAST(sum(wini) AS DOUBLE) / count(*))
               / 10000.0 / (count(*) - 1), 0.0)), 6) AS sd_winsor
    FROM c GROUP BY event_type
    """,
    "A-tier robust stats: nearest-rank winsorization (p01/p99 clip) + integer-scaled exact moments — outlier-robust per-group mean/sd",
)
def q_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust per-type value stats: clip at the exact
    nearest-rank p01/p99 ORDER STATISTICS (real data values, so the
    clipped column keeps the fixture's 2-decimal grid), then compute
    mean/sd over integer-scaled cents — sums are exact integers in any
    partial-aggregation order, the single float division at the end is
    IEEE-identical across engines (the PLANS.md #10 tie-proofing
    recipe applied to second moments). The rank pass is a group-
    partitioned window (spills, never buffers a group); bounds are a
    groups-sized broadcast join back. Operator:
    operators.ranking.winsorized_group_stats."""
    from finance_reporting_etl_spark.operators.ranking import (
        winsorized_group_stats,
    )

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return winsorized_group_stats(ev, "event_type", "value", "event_id")


@query(
    "bm25_search_topk",
    f"""
    WITH lens AS (SELECT doc_id, len({_TOKS}) AS dl FROM documents),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
              FROM lens),
    toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    postings AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term IN ('vector', 'merge', 'stream') GROUP BY 1, 2
    ),
    p2 AS (SELECT p.doc_id, p.term, p.tf, l.dl
           FROM postings p JOIN lens l USING (doc_id)),
    dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
    scored AS (
        SELECT p.doc_id,
               round(sum(
                   ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * p.tf * (1.2 + 1.0)
                   / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl))
               ), 6) AS score
        FROM p2 p JOIN dfreq d USING (term) CROSS JOIN stats s
        GROUP BY p.doc_id
    )
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rank
    FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """,
    "X4 BM25 ranked search (disjunctive): saturating tf + doc-length normalization over the same inverted-index shape as keyword_search_topk",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for {vector, merge, stream} under Okapi BM25
    (k1=1.2, b=0.75) — OR semantics, so it also exercises the
    partial-match ranking path `keyword_search_topk`'s conjunctive
    filter never reaches. Doc length and tf aggregate in ONE postings
    pass; (N, avgdl) is a 1-row broadcast."""
    from finance_reporting_etl_spark.operators.corpus import bm25_search

    return bm25_search(
        _t(spark, sf_dir, "documents"), ["vector", "merge", "stream"], k=10
    )


@query(
    "streaming_sliding_window_counts",
    """
    SELECT time_bucket(INTERVAL '2 hours', ts) - INTERVAL 2 HOUR * k
               AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events, unnest(generate_series(0, 2)) AS u(k)
    GROUP BY 1, 2
    """,
    "§2.8 sliding event-time windows (6h window / 2h slide) on a watermarked stream == per-event 3-window expansion in SQL",
)
def q_streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour windows sliding every 2 hours over the event stream: each
    event is expanded map-side into its 3 covering windows (no
    self-join), streaming state holds horizon/slide open windows per
    group and the watermark closes each exactly once. The oracle does
    the same expansion explicitly (bucket - 2h*k for k in 0..2). Epoch
    alignment agrees between engines: Spark windows align to the Unix
    epoch, DuckDB time_bucket to 2000-01-03, and their offset is a
    whole multiple of the 2h slide."""
    import uuid

    from finance_reporting_etl_spark.streaming.rollup import streaming_rollup
    from finance_reporting_etl_spark.streaming.staging import run_file_stream

    events = _t(spark, sf_dir, "events")
    name = f"slide_stream_{uuid.uuid4().hex[:8]}"
    return run_file_stream(
        spark,
        lambda src: events.write.mode("overwrite").parquet(src),
        lambda src, schema, tmp: streaming_rollup(
            spark, src, schema, checkpoint_dir=f"{tmp}/ckpt", output_table=name,
            bucket="6 hours", slide="2 hours", watermark="12 hours",
        ),
        lambda tmp: spark.table(name),
        prefix="stream_slide_",
        label="streaming_sliding_window_counts",
    )


@query(
    "asof_cogroup_pandas",
    """
    SELECT p.user_id, p.event_id, p.ts, p.value,
           v.ts AS ts_r, v.event_id AS event_id_r, v.value AS value_r
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    "§2.9 cogrouped-map applyInPandas: per-key pandas as-of merge == the window-form asof_join == DuckDB ASOF JOIN",
)
def q_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of contract as `asof_latest_view_before_purchase`
    (identical oracle), executed through the cogroup surface: both
    sides hash-partition by user, each user's purchases and views meet
    in one Arrow-batched pandas call doing a vectorized searchsorted.
    Having both implementations verified against one oracle pins their
    equivalence; the window form stays the production default (one
    shuffle, JVM-side — see operators/asof.py docstrings)."""
    from finance_reporting_etl_spark.operators.asof import asof_join_cogroup

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join_cogroup(
        purchases,
        views,
        ["user_id"],
        right_cols=["event_id", "value"],
        tiebreak="event_id",
    )


@query(
    "target_encode_brand",
    """
    WITH lab AS (
        SELECT p.p_brand,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), stats AS (
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos
        FROM lab GROUP BY 1
    ), g AS (
        SELECT CAST(sum(y) AS DOUBLE) / count(*) AS prior FROM lab
    )
    SELECT p_brand, n, pos,
           round(CAST(pos AS DOUBLE) / n, 6) AS raw_rate,
           round((pos + 20.0 * prior) / (n + 20.0), 6) AS encoded
    FROM stats CROSS JOIN g
    """,
    "X-pipeline categorical target encoding: additive-smoothed per-category event rate (shrinks rare categories toward the global prior)",
)
def q_target_encode_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of part brand by return rate:
    encoded = (pos + alpha * prior) / (n + alpha), alpha=20 — the
    leakage-averse categorical feature for tabular models (rare brands
    shrink toward the global prior instead of memorizing noise).
    Labels come from a broadcast dim join (part is the small side);
    counts are exact integers (any partial-agg order), the prior and
    the encoding are single float divisions, so the oracle hash-matches
    bit-for-bit. The 1-row prior attaches via broadcast cross join."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lab = li.join(
        F.broadcast(pt), li.l_partkey == pt.p_partkey
    ).select(
        "p_brand", (F.col("l_returnflag") == "R").cast("int").alias("y")
    )
    stats = lab.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    g = lab.agg((F.sum("y").cast("double") / F.count(F.lit(1))).alias("prior"))
    return stats.crossJoin(F.broadcast(g)).select(
        "p_brand",
        "n",
        "pos",
        F.round(F.col("pos").cast("double") / F.col("n"), 6).alias("raw_rate"),
        F.round(
            (F.col("pos") + 20.0 * F.col("prior")) / (F.col("n") + 20.0), 6
        ).alias("encoded"),
    )


@query(
    "streaming_static_dim_join",
    """
    SELECT c.c_mktsegment AS segment, e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 6) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    "§2.8 stream-static join: micro-batched event stream enriched by a broadcast dimension, then aggregated == batch join",
)
def q_streaming_static_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The enrich-then-aggregate streaming shape: each micro-batch of
    the event stream joins to a STATIC customer dimension (broadcast —
    re-planned per batch, no stream-stream state) before a running
    segment x type aggregate. This is the standard 100 TB layout for
    dims that change slowly: keep the dim as a table, let every batch
    broadcast-join it, reserve stateful stream-stream joins for two
    genuinely unbounded sides. Replayed as 4 chronologically-unordered
    micro-batches (maxFilesPerTrigger=1); complete-mode aggregate ==
    the batch join bit-for-bit. Operator:
    streaming.joins.streaming_static_dim_rollup."""
    import uuid

    from finance_reporting_etl_spark.streaming.joins import (
        streaming_static_dim_rollup,
    )
    from finance_reporting_etl_spark.streaming.staging import run_file_stream

    events = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    name = f"dimjoin_stream_{uuid.uuid4().hex[:8]}"
    return run_file_stream(
        spark,
        lambda src: events.repartition(4).write.mode("overwrite").parquet(src),
        lambda src, schema, tmp: streaming_static_dim_rollup(
            spark, src, schema, dim,
            checkpoint_dir=f"{tmp}/ckpt", output_table=name,
        ),
        lambda tmp: spark.table(name),
        prefix="stream_dim_",
        label="streaming_static_dim_join",
    )


@query(
    "k_anonymity_suppress",
    """
    WITH g AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(count(*) AS BIGINT) AS grp_n
        FROM customer GROUP BY 1, 2
    )
    SELECT c.c_custkey,
           CASE WHEN g.grp_n >= 10 THEN c.c_mktsegment END AS segment_anon,
           CASE WHEN g.grp_n >= 10 THEN c.c_nationkey END AS nation_anon,
           g.grp_n < 10 AS suppressed,
           g.grp_n
    FROM customer c
    JOIN g ON c.c_mktsegment = g.c_mktsegment
          AND c.c_nationkey = g.c_nationkey
    """,
    "O-tier data governance: k-anonymity suppression (k=10) over quasi-identifiers — rare (segment, nation) combos nulled before export",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-export anonymization: any (market segment, nation) combo
    shared by fewer than k=10 customers is suppressed (both
    quasi-identifiers nulled) so no exported row is re-identifiable to
    a group smaller than k. Group sizes come from one aggregate whose
    result is bounded by the QI domain (segments x nations), broadcast
    back onto the row stream — a map-side decision at any scale."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    g = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("grp_n")
    )
    ok = F.col("grp_n") >= 10
    return c.join(F.broadcast(g), ["c_mktsegment", "c_nationkey"]).select(
        "c_custkey",
        F.when(ok, F.col("c_mktsegment")).alias("segment_anon"),
        F.when(ok, F.col("c_nationkey")).alias("nation_anon"),
        (F.col("grp_n") < 10).alias("suppressed"),
        "grp_n",
    )


@query(
    "embedding_int8_quantize",
    """
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        FROM embeddings
    ), m AS (
        SELECT vec_id, vd,
               127.0 / list_max(list_transform(vd, x -> abs(x))) AS scale
        FROM v
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           round(list_max(list_transform(
               vd, x -> abs(x - round(x * scale) / scale))), 6) AS max_abs_err,
           CAST(len(list_filter(
               vd, x -> abs(round(x * scale)) = 127.0)) AS INT) AS n_sat
    FROM m
    """,
    "X3 vector infra: per-vector symmetric int8 scalar quantization (4x memory cut) with exact reconstruction-error audit — element-wise, no aggregation order anywhere",
)
def q_embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    scale = 127 / max|x|, codes = round(x * scale) — the 4x memory/IO
    cut before ANN serving, with the reconstruction-error audit
    (max |x - code/scale|, saturated-code count) computed in the same
    pass. Everything is element-wise double math inside array
    transforms (whole-stage codegen, map-side, zero shuffles), and no
    float SUM exists anywhere, so the oracle hash-matches without any
    summation-order defense."""
    vd = F.transform("embedding", lambda x: x.cast("double"))
    df = _t(spark, sf_dir, "embeddings").select("vec_id", vd.alias("vd"))
    scale = F.lit(127.0) / F.array_max(F.transform("vd", F.abs))
    df = df.withColumn("scale", scale)
    err = F.array_max(
        F.transform(
            "vd",
            lambda x: F.abs(x - F.round(x * F.col("scale")) / F.col("scale")),
        )
    )
    n_sat = F.size(
        F.filter(
            "vd", lambda x: F.abs(F.round(x * F.col("scale"))) == 127.0
        )
    )
    return df.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round(err, 6).alias("max_abs_err"),
        n_sat.alias("n_sat"),
    )


@query(
    "abc_customer_classification",
    """
    WITH r AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM orders GROUP BY 1
    ), t AS (
        SELECT CAST(sum(rev_cents) AS DOUBLE) AS tot FROM r
    ), c AS (
        SELECT o_custkey, rev_cents,
               CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum
        FROM r
    )
    SELECT o_custkey, rev_cents,
           round(CAST(cum AS DOUBLE) / (SELECT tot FROM t), 6) AS cum_share,
           CASE WHEN CAST(cum AS DOUBLE) / (SELECT tot FROM t) <= 0.80 THEN 'A'
                WHEN CAST(cum AS DOUBLE) / (SELECT tot FROM t) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
    "A-tier Pareto/ABC analysis: exact global revenue prefix sum with NO single-partition window (distributed_cumsum — the ntile bucket/offset recipe generalized to running totals)",
)
def q_abc_customer_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic ABC: rank customers by lifetime revenue, classify by
    cumulative revenue share (A <= 80%, B <= 95%, C rest). The naive
    form is `sum() OVER (ORDER BY rev DESC)` — a SinglePartition
    exchange, the same 100x-scale killer the deciles query had.
    `distributed_cumsum` computes the identical exact prefix sum via
    sketch-bucketed ranges + broadcast bucket offsets + per-bucket
    windows. Revenue is integer cents so every partial sum is exact;
    the share is one double division both engines compute
    identically."""
    from finance_reporting_etl_spark.operators.ranking import distributed_cumsum

    r = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev_cents"
            )
        )
    )
    tot = r.agg(F.sum("rev_cents").cast("double").alias("__tot"))
    c = distributed_cumsum(
        r.withColumn("__negrev", -F.col("rev_cents")),
        sum_col="rev_cents",
        key_col="__negrev",
        tiebreak_cols=["o_custkey"],
        out_col="cum",
    )
    share = F.col("cum").cast("double") / F.col("__tot")
    return c.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        "rev_cents",
        F.round(share, 6).alias("cum_share"),
        F.when(share <= 0.80, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "business_days_to_ship",
    """
    WITH b AS (
        SELECT o.o_orderpriority,
               (5 * (date_diff('day', DATE '1970-01-05', l.l_shipdate) // 7)
                + least(date_diff('day', DATE '1970-01-05', l.l_shipdate) % 7, 5))
               -
               (5 * (date_diff('day', DATE '1970-01-05', o.o_orderdate) // 7)
                + least(date_diff('day', DATE '1970-01-05', o.o_orderdate) % 7, 5))
                   AS bd
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(bd) AS DOUBLE) / count(*), 6) AS avg_business_days,
           CAST(max(bd) AS BIGINT) AS max_business_days
    FROM b GROUP BY 1
    """,
    "§2.7 calendar arithmetic: business-day (weekday) distance via closed-form weekday counting — no calendar dimension table needed",
)
def q_business_days_to_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average WEEKDAYS from order to ship per priority. Weekday
    distance uses the closed form f(d) = 5*(days/7) + min(days%7, 5)
    anchored on a Monday (1970-01-05), so bd = f(ship) - f(order) —
    pure integer column math instead of exploding a calendar spine or
    joining a date dimension (which at 100 TB is a pointless broadcast
    per row). Integer sums + one final division keep the oracle
    hash-exact."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )

    def f(col: str):
        days = f"datediff({col}, DATE'1970-01-05')"
        return f"(5 * ({days} div 7) + least({days} % 7, 5))"

    bd = F.expr(f"{f('l_shipdate')} - {f('o_orderdate')}").alias("bd")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select("o_orderpriority", bd)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("bd").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_business_days"
        ),
        F.max("bd").cast("bigint").alias("max_business_days"),
    )


@query(
    "event_trigram_paths",
    """
    WITH s AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), p AS (
        SELECT e1 || '>' || e2 || '>' || e3 AS path FROM s WHERE e3 IS NOT NULL
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n,
           row_number() OVER (ORDER BY count(*) DESC, path) AS rank
    FROM p GROUP BY path ORDER BY n DESC, path LIMIT 10
    """,
    "§2.5 sequential pattern mining: top event trigrams per user journey (double lead window -> count; the 3-step extension of the transition matrix)",
)
def q_event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step user journeys (A>B>C): two stacked `lead`s
    over the per-user time order, then a plain count — the cheap
    sequential-pattern mine that answers 'what do users actually do
    next' without a sequence-mining library. One user-partitioned
    window + one uniform path shuffle; top-10 via
    TakeOrderedAndProject, rank assigned over the surviving <=10
    rows."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
    )
    counts = s.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), "path").limit(10)
    wr = Window.orderBy(F.desc("n"), "path")
    return top.select("path", "n", F.row_number().over(wr).cast("long").alias("rank"))


@query(
    "corpus_token_budget_select",
    f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tok,
               round(CAST(len(list_distinct(toks)) AS DOUBLE)
                     / greatest(len(toks), 1), 6) AS ttr
        FROM d
    ), t AS (
        SELECT CAST(sum(n_tok) AS BIGINT) // 2 AS budget FROM s
    ), c AS (
        SELECT doc_id, n_tok, ttr,
               CAST(sum(n_tok) OVER (ORDER BY ttr DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_tokens
        FROM s
    )
    SELECT doc_id, n_tok, ttr, cum_tokens
    FROM c WHERE cum_tokens <= (SELECT budget FROM t)
    """,
    "X-pipeline token-budget curation: best-first (type-token-ratio) selection until a 50% token budget — distributed_cumsum applied to corpus building",
)
def q_corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Fill the training budget with the best data first': rank
    documents by type-token ratio (vocabulary diversity — the cheap
    repetition-quality proxy), take documents in quality order until
    the cumulative token count hits 50% of the corpus. The cutoff
    needs an exact GLOBAL running total in quality order — at corpus
    scale that is `distributed_cumsum` (bucketed prefix sum, no
    single-partition window), with integer token counts so the
    cumulative is exact in any partial order. The budget scalar is a
    1-row broadcast."""
    from finance_reporting_etl_spark.operators.ranking import distributed_cumsum

    toks = F.split(F.trim(F.lower("text")), r"\s+")
    s = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("ttr"),
    )
    budget = s.agg((F.sum("n_tok") / F.lit(2)).cast("bigint").alias("__budget"))
    c = distributed_cumsum(
        s.withColumn("__negttr", -F.col("ttr")),
        sum_col="n_tok",
        key_col="__negttr",
        tiebreak_cols=["doc_id"],
        out_col="cum_tokens",
    )
    return (
        c.crossJoin(F.broadcast(budget))
        .filter(F.col("cum_tokens") <= F.col("__budget"))
        .select("doc_id", "n_tok", "ttr", "cum_tokens")
    )


@query(
    "session_bounce_rate",
    """
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess
        FROM o
    ), sessions AS (
        SELECT user_id, sess,
               CAST(date_trunc('day', min(ts)) AS DATE) AS day,
               count(*) AS n_events
        FROM s GROUP BY user_id, sess
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS bounce_rate
    FROM sessions GROUP BY day
    """,
    "§2.5/§2.8 product analytics: daily bounce rate (share of single-event gap-sessions) composed from session_window",
)
def q_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of sessions that end after one event, per day of session
    start — the engagement KPI every product dashboard carries.
    Sessions come from the native `session_window` aggregate (30-min
    gap); the oracle independently rebuilds the same sessions with the
    lag/cumsum island method, so the two formulations are pinned
    equal. Counts are exact; the rate is one division."""
    ev = _t(spark, sf_dir, "events")
    sessions = ev.groupBy(
        F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    day = F.col("w.start").cast("date").alias("day")
    bounce = (F.col("n_events") == 1).cast("int")
    return (
        sessions.select(day, "n_events")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(bounce).cast("bigint").alias("n_bounce"),
            F.round(
                F.sum(bounce).cast("double") / F.count(F.lit(1)), 6
            ).alias("bounce_rate"),
        )
    )


@query(
    "decision_stump_train",
    """
    WITH x AS (
        SELECT 'quantity' AS feature, CAST(l_quantity AS DOUBLE) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
        UNION ALL
        SELECT 'discount', CAST(l_discount AS DOUBLE),
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        FROM lineitem
    ), g AS (
        SELECT feature, v, CAST(count(*) AS BIGINT) AS n_v,
               CAST(sum(y) AS BIGINT) AS pos_v
        FROM x GROUP BY 1, 2
    ), c AS (
        SELECT feature, v,
               CAST(sum(n_v) OVER w AS BIGINT) AS nl,
               CAST(sum(pos_v) OVER w AS BIGINT) AS posl,
               CAST(sum(n_v) OVER (PARTITION BY feature) AS BIGINT) AS n,
               CAST(sum(pos_v) OVER (PARTITION BY feature) AS BIGINT) AS pos
        FROM g
        WINDOW w AS (PARTITION BY feature ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), s AS (
        SELECT feature, v AS thr, nl, posl, n - nl AS nr, pos - posl AS posr,
               n, pos
        FROM c WHERE nl < n
    ), sc AS (
        SELECT feature, thr, nl AS n_left, nr AS n_right,
               round(
                   (1.0 - (CAST(pos AS DOUBLE) / n) * (CAST(pos AS DOUBLE) / n)
                        - (CAST(n - pos AS DOUBLE) / n) * (CAST(n - pos AS DOUBLE) / n))
                   - (CAST(nl AS DOUBLE) / n
                      * (1.0 - (CAST(posl AS DOUBLE) / nl) * (CAST(posl AS DOUBLE) / nl)
                             - (CAST(nl - posl AS DOUBLE) / nl) * (CAST(nl - posl AS DOUBLE) / nl))
                      + CAST(nr AS DOUBLE) / n
                      * (1.0 - (CAST(posr AS DOUBLE) / nr) * (CAST(posr AS DOUBLE) / nr)
                             - (CAST(nr - posr AS DOUBLE) / nr) * (CAST(nr - posr AS DOUBLE) / nr))),
               6) AS gini_gain
        FROM s
    )
    SELECT feature, thr, n_left, n_right, gini_gain,
           row_number() OVER (ORDER BY gini_gain DESC, feature, thr) AS rank
    FROM sc ORDER BY gini_gain DESC, feature, thr LIMIT 10
    """,
    "X-tier distributed ML training: depth-1 decision tree (best Gini split) — candidate evaluation via prefix sums over per-value counts, never a per-threshold rescan",
)
def q_decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trains a decision stump (is this line item a return?) over two
    features and reports the 10 best splits by Gini gain. The scalable
    trick: candidate thresholds never rescan the data — per-value
    class counts (one aggregate) turn into every threshold's
    left/right counts via a prefix sum ordered by value, so cost is
    O(data) + O(distinct values), the same structure real tree
    learners (LightGBM histograms) use. Counts are exact integers;
    the Gini expressions are identical double math on both engines;
    argmax is deterministic via (gain, feature, thr) ordering. The
    candidate evaluation lives in operators/ml.py and is shared with
    `decision_tree_depth2`."""
    from pyspark.sql import Window

    from finance_reporting_etl_spark.operators.ml import (
        melt_features,
        stump_candidates,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_quantity",
        "l_discount",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    sc = stump_candidates(
        melt_features(li, {"quantity": "l_quantity", "discount": "l_discount"}, "y")
    )
    top = sc.orderBy(F.desc("gini_gain"), "feature", "thr").limit(10)
    wr = Window.orderBy(F.desc("gini_gain"), "feature", "thr")
    return top.select(
        "feature",
        "thr",
        "n_left",
        "n_right",
        "gini_gain",
        F.row_number().over(wr).cast("long").alias("rank"),
    )


@query(
    "join_key_skew_profile",
    """
    WITH k AS (
        SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1
    ), t AS (
        SELECT CAST(sum(n) AS DOUBLE) AS tot,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM k
    )
    SELECT key, n,
           round(CAST(n AS DOUBLE) / (SELECT tot FROM t), 6) AS share,
           round(CAST(n AS DOUBLE) * (SELECT n_keys FROM t)
                 / (SELECT tot FROM t), 6) AS skew_factor,
           row_number() OVER (ORDER BY n DESC, key) AS rank
    FROM k ORDER BY n DESC, key LIMIT 20
    """,
    "O-tier skew diagnostics: top-20 join keys by row share + skew factor (n/avg) — the pre-join audit that decides salting vs AQE",
)
def q_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit you run BEFORE a big join: per-key row counts, share
    of the table, and skew factor (count / mean count). Keys with
    skew_factor in the hundreds want salting (operators/scale.py) or
    AQE skew-split; everything here is one map-side-combined aggregate
    plus a 1-row scalar broadcast, with TakeOrderedAndProject doing
    the top-20."""
    from pyspark.sql import Window

    k = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = k.agg(
        F.sum("n").cast("double").alias("__tot"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    top = (
        k.crossJoin(F.broadcast(t))
        .select(
            "key",
            "n",
            F.round(F.col("n").cast("double") / F.col("__tot"), 6).alias("share"),
            F.round(
                F.col("n").cast("double") * F.col("__n_keys") / F.col("__tot"), 6
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(20)
    )
    wr = Window.orderBy(F.desc("n"), "key")
    return top.select(
        "key", "n", "share", "skew_factor",
        F.row_number().over(wr).cast("long").alias("rank"),
    )


@query(
    "rolling_correlation_series",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'view')
        GROUP BY 1, 2
    ), p AS (
        SELECT a.day, a.cents AS x, b.cents AS y
        FROM (SELECT day, cents FROM d WHERE event_type = 'purchase') a
        JOIN (SELECT day, cents FROM d WHERE event_type = 'view') b USING (day)
    ), w AS (
        SELECT day,
               CAST(count(*)   OVER win AS BIGINT) AS n,
               CAST(sum(x)     OVER win AS BIGINT) AS sx,
               CAST(sum(y)     OVER win AS BIGINT) AS sy,
               CAST(sum(x * x) OVER win AS BIGINT) AS sxx,
               CAST(sum(y * y) OVER win AS BIGINT) AS syy,
               CAST(sum(x * y) OVER win AS BIGINT) AS sxy
        FROM p
        WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0), 6)
               AS corr14
    FROM w WHERE n = 14
    """,
    "§2.5 time-series analytics: 14-day rolling Pearson correlation between two revenue series — integer-cent moments make every window sum exact",
)
def q_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 14-day correlation between daily purchase and view
    revenue (do the series move together this fortnight?). All five
    rolling moments are integer-cent sums — exact in any order — and
    the Pearson formula is assembled from them in identical double
    math, so the oracle hash-matches. The ordered window runs over
    the DAYS-sized daily table (bounded — one row per calendar day),
    not the event stream; warm-up rows (n < 14) are dropped. Int64
    headroom: cents^2 x 14 days stays far under 2^63 at any fixture
    SF; switch moments to whole currency units before trillion-cent
    days. Operator: operators.timeseries.rolling_pearson."""
    from finance_reporting_etl_spark.operators.timeseries import rolling_pearson

    d = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    )
    a = d.filter(F.col("event_type") == "purchase").select(
        "day", F.col("cents").alias("x")
    )
    b = d.filter(F.col("event_type") == "view").select(
        "day", F.col("cents").alias("y")
    )
    return rolling_pearson(a.join(b, "day"), window_rows=14)


@query(
    "ab_test_conversion_lift",
    """
    WITH u AS (
        SELECT user_id,
               CASE WHEN CAST((instr('0123456789abcdef',
                                     substr(md5(CAST(user_id AS VARCHAR) || 'ab1'), 1, 1)) - 1) * 16
                         + (instr('0123456789abcdef',
                                  substr(md5(CAST(user_id AS VARCHAR) || 'ab1'), 2, 1)) - 1)
                         AS BIGINT) % 2 = 0
                    THEN 'A' ELSE 'B' END AS arm,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY 1
    )
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS rate,
           round((CAST(sum(converted) AS DOUBLE) / count(*)
                  + 1.9208 / count(*)
                  - 1.96 * sqrt((CAST(sum(converted) AS DOUBLE) / count(*))
                                * (1.0 - CAST(sum(converted) AS DOUBLE) / count(*))
                                / count(*)
                                + 0.9604 / count(*) / count(*)))
                 / (1.0 + 3.8416 / count(*)), 6) AS wilson_lo,
           round((CAST(sum(converted) AS DOUBLE) / count(*)
                  + 1.9208 / count(*)
                  + 1.96 * sqrt((CAST(sum(converted) AS DOUBLE) / count(*))
                                * (1.0 - CAST(sum(converted) AS DOUBLE) / count(*))
                                / count(*)
                                + 0.9604 / count(*) / count(*)))
                 / (1.0 + 3.8416 / count(*)), 6) AS wilson_hi
    FROM u GROUP BY arm
    """,
    "A-tier experimentation analytics: deterministic md5 arm assignment + per-arm conversion rate with Wilson 95% interval (exact counts, closed-form floats)",
)
def q_ab_test_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B readout: users hash deterministically into arms (salted
    md5 — the same engine-portable bucketing as the corpus split, so
    assignment is reproducible anywhere), conversion = user ever
    purchased, and each arm reports rate with a Wilson 95% interval
    (the interval that stays sane at small n / extreme rates, unlike
    the normal approximation). Counts are exact; every float is a
    closed-form expression on those counts, evaluated identically by
    both engines. One groupBy(user) + one groups-sized aggregate."""
    from finance_reporting_etl_spark.operators.corpus import md5_bucket

    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    ).select(
        F.when(md5_bucket("user_id", 256, salt="ab1") % 2 == 0, "A")
        .otherwise("B")
        .alias("arm"),
        "converted",
    )
    n = F.count(F.lit(1))
    conv = F.sum("converted").cast("double")
    rate = conv / n
    z2_half = F.lit(1.9208) / n  # z^2/2 with z = 1.96
    margin = F.lit(1.96) * F.sqrt(
        rate * (F.lit(1.0) - rate) / n + F.lit(0.9604) / n / n  # z^2/4/n^2
    )
    denom = F.lit(1.0) + F.lit(3.8416) / n  # 1 + z^2/n
    return u.groupBy("arm").agg(
        n.alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(rate, 6).alias("rate"),
        F.round((rate + z2_half - margin) / denom, 6).alias("wilson_lo"),
        F.round((rate + z2_half + margin) / denom, 6).alias("wilson_hi"),
    )


@query(
    "trading_day_rollup",
    """
    SELECT CAST(CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York'
                     AS TIMESTAMP) AS DATE) AS trading_day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2
    """,
    "§2.7 time-zone semantics: exchange-local (America/New_York) trading-day rollup — DST-correct wall-clock bucketing of a UTC event stream",
)
def q_trading_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup on the EXCHANGE's calendar, not UTC's: a 23:30 New
    York trade belongs to that NY day even though UTC has already
    rolled over. `from_utc_timestamp(ts, 'America/New_York')` applies
    the real tzdata rules (including DST transitions), and both
    engines share the same tz database, so the oracle hash-matches
    across the spring-forward/fall-back boundaries. Sums are integer
    cents — exact in any order."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.from_utc_timestamp("ts", "America/New_York")
            .cast("date")
            .alias("trading_day"),
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("c"),
        )
        .groupBy("trading_day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("c").alias("cents"),
        )
    )


@query(
    "dow_seasonality_index",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1
    ), k AS (
        SELECT CAST(dayofweek(day) + 1 AS INT) AS dow,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM d GROUP BY 1
    ), t AS (
        SELECT CAST(sum(cents) AS DOUBLE) / sum(n_days) AS overall_daily FROM k
    )
    SELECT dow, n_days,
           round(CAST(cents AS DOUBLE) / n_days / 100.0, 6) AS avg_daily_revenue,
           round((CAST(cents AS DOUBLE) / n_days) / (SELECT overall_daily FROM t),
                 6) AS seasonality_index
    FROM k
    """,
    "§2.5/§2.7 seasonality profile: day-of-week revenue index (dow mean / overall mean) — exact integer cents, single divisions",
)
def q_dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality: each day-of-week's average daily revenue as
    a multiple of the overall daily average (index 1.0 = typical day)
    — the profile that feeds staffing/capacity models and anomaly
    baselines. Daily totals are integer cents (exact in any order);
    both ratios are single double divisions both engines evaluate
    identically. Day-of-week numbering is pinned to Spark's dayofweek
    (1=Sunday..7=Saturday); DuckDB's 0-based dayofweek is shifted +1
    in the oracle to match."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    k = d.groupBy(F.dayofweek("day").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("cents").alias("cents")
    )
    t = k.agg(
        (F.sum("cents").cast("double") / F.sum("n_days")).alias("__overall")
    )
    per_day = F.col("cents").cast("double") / F.col("n_days")
    return k.crossJoin(F.broadcast(t)).select(
        "dow",
        "n_days",
        F.round(per_day / 100.0, 6).alias("avg_daily_revenue"),
        F.round(per_day / F.col("__overall"), 6).alias("seasonality_index"),
    )


@query(
    "seed_sla_attainment",
    """
    WITH sla AS (
        SELECT * FROM (VALUES
            ('1-URGENT', 5), ('2-HIGH', 7), ('3-MEDIUM', 10),
            ('4-NOT SPECIFIED', 14), ('5-LOW', 21)
        ) AS v(o_orderpriority, sla_business_days)
    ), b AS (
        SELECT o.o_orderpriority, s.sla_business_days,
               (5 * (date_diff('day', DATE '1970-01-05', l.l_shipdate) // 7)
                + least(date_diff('day', DATE '1970-01-05', l.l_shipdate) % 7, 5))
               -
               (5 * (date_diff('day', DATE '1970-01-05', o.o_orderdate) // 7)
                + least(date_diff('day', DATE '1970-01-05', o.o_orderdate) % 7, 5))
                   AS bd
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN sla s ON o.o_orderpriority = s.o_orderpriority
    )
    SELECT o_orderpriority, sla_business_days,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN bd <= sla_business_days THEN 1 ELSE 0 END)
                AS BIGINT) AS n_met,
           round(CAST(sum(CASE WHEN bd <= sla_business_days THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS attainment
    FROM b GROUP BY 1, 2
    """,
    "S-tier dbt-seed analog: literal in-code dimension (priority -> SLA days) broadcast-joined to facts; SLA attainment via business-day distance",
)
def q_seed_sla_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt 'seed' parity: small hand-maintained dimensions live as
    literal rows in code (versioned with the models), get broadcast
    onto the fact stream, and never touch external storage. Here the
    seed maps order priority to an SLA in business days; attainment =
    share of line items shipped within SLA using the closed-form
    weekday distance from `business_days_to_ship`. Counts exact,
    one division."""
    sla = spark.createDataFrame(
        [
            ("1-URGENT", 5),
            ("2-HIGH", 7),
            ("3-MEDIUM", 10),
            ("4-NOT SPECIFIED", 14),
            ("5-LOW", 21),
        ],
        "o_orderpriority string, sla_business_days int",
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )

    def f(col: str):
        days = f"datediff({col}, DATE'1970-01-05')"
        return f"(5 * ({days} div 7) + least({days} % 7, 5))"

    bd = F.expr(f"{f('l_shipdate')} - {f('o_orderdate')}").alias("bd")
    b = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sla), "o_orderpriority")
        .select("o_orderpriority", "sla_business_days", bd)
    )
    met = (F.col("bd") <= F.col("sla_business_days")).cast("int")
    return b.groupBy("o_orderpriority", "sla_business_days").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(met).cast("bigint").alias("n_met"),
        F.round(F.sum(met).cast("double") / F.count(F.lit(1)), 6).alias(
            "attainment"
        ),
    )


@query(
    "capped_user_balance",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list(CAST(round(value * 100) AS BIGINT)
                        * CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END
                        ORDER BY ts, event_id)),
               (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x)) AS BIGINT)
               AS final_balance
    FROM events
    GROUP BY user_id
    """,
    "custom per-key recursive fold #2: floor-clamped running balance (exact integer fold via grouped-map applyInPandas == DuckDB list_reduce)",
)
def q_capped_user_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit-style running balance per user: purchases add cents,
    every other event spends them, and the balance can never go below
    zero — b_t = max(0, b_{t-1} + delta_t). The clamp makes each step
    depend on the previous PARTIAL result, so no window aggregate or
    prefix sum expresses it; the grouped-map fold is the engine-native
    answer (one shuffle on user_id). Deltas are integer cents, so the
    fold is exact — the oracle replays the identical fold with
    list_reduce, seeded by a prepended 0 so one-event groups follow
    the same clamp path."""
    from finance_reporting_etl_spark.operators.timeseries import (
        clamped_balance_per_key,
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (
            F.round(F.col("value") * 100).cast("bigint")
            * F.when(F.col("event_type") == "purchase", 1).otherwise(-1)
        ).alias("delta"),
    )
    return clamped_balance_per_key(ev, "user_id", ["ts", "event_id"], "delta")


@query(
    "embedding_outlier_flags",
    f"""
    WITH st AS (SELECT * FROM '{_AUX_DIR}/emb_outlier_stats/*.parquet'),
    v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        FROM embeddings
    ), d AS (
        SELECT v.vec_id,
               sqrt(list_reduce(
                   list_prepend(0.0, list_transform(
                       generate_series(1, len(vd)),
                       i -> (vd[i] - st.cen[i]) * (vd[i] - st.cen[i]))),
                   (acc, x) -> acc + x)) AS dist,
               st.mu AS mu, st.sigma AS sigma
        FROM v CROSS JOIN st
    )
    SELECT vec_id, round(dist, 6) AS dist,
           dist > mu + 2.0 * sigma AS is_outlier
    FROM d
    """,
    "X3 embedding quality: distance-to-centroid outlier flags (persisted-stats oracle re-derives every distance + flag; centroid/mu/sigma determinism pinned by pytest)",
)
def q_embedding_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flags embeddings far from the corpus centroid (dist > mu + 2
    sigma) — the cheap first-pass filter for corrupt / out-of-domain
    vectors before they poison ANN indexes or dedup. The centroid and
    the distance-distribution scalars (mu, sigma) involve float sums
    whose order Spark does not pin, so they are persisted once via the
    aux-table pattern; every per-vector DISTANCE and FLAG is then
    re-derived independently by the oracle with an identical
    left-fold, and hash-compared. Map-side only after the two scalar
    aggregates; no shuffle touches data-sized rows. Operator:
    operators.inference.embedding_outlier_flags."""
    from finance_reporting_etl_spark.operators.inference import (
        embedding_outlier_flags,
    )

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vd")
    )
    return embedding_outlier_flags(
        emb, 64, persist_stats=lambda df: _persist_aux(spark, df, "emb_outlier_stats")
    )


@query(
    "revenue_bridge_mom",
    """
    WITH m AS (
        SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), w AS (
        SELECT event_type, month, n, cents,
               lag(n)     OVER win AS n0,
               lag(cents) OVER win AS cents0
        FROM m WINDOW win AS (PARTITION BY event_type ORDER BY month)
    )
    SELECT event_type, month,
           round(CAST(cents - cents0 AS DOUBLE) / 100.0, 6) AS delta_revenue,
           round((n - n0) * (CAST(cents0 AS DOUBLE) / n0) / 100.0, 6)
               AS volume_effect,
           round(n * (CAST(cents AS DOUBLE) / n - CAST(cents0 AS DOUBLE) / n0)
                 / 100.0, 6) AS value_effect
    FROM w WHERE n0 IS NOT NULL
    """,
    "A-tier finance bridge: month-over-month revenue decomposed into volume x value effects (delta = volume + value exactly, by construction)",
)
def q_revenue_bridge_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reporting 'waterfall': how much of each month's revenue
    change came from MORE events (volume effect, at last month's
    average ticket) vs BIGGER events (value effect, on this month's
    volume). Defined so volume + value == delta exactly:
    (n1-n0)*a0 + n1*(a1-a0) = n1*a1 - n0*a0. Monthly totals are
    integer cents; the effects are identical double expressions, and
    the lag window is partitioned by series — nothing global."""
    from pyspark.sql import Window

    m = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("month", "ts").cast("date").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
    )
    win = Window.partitionBy("event_type").orderBy("month")
    w = m.withColumn("n0", F.lag("n").over(win)).withColumn(
        "cents0", F.lag("cents").over(win)
    )
    a0 = F.col("cents0").cast("double") / F.col("n0")
    a1 = F.col("cents").cast("double") / F.col("n")
    return w.filter(F.col("n0").isNotNull()).select(
        "event_type",
        "month",
        F.round((F.col("cents") - F.col("cents0")).cast("double") / 100.0, 6).alias(
            "delta_revenue"
        ),
        F.round((F.col("n") - F.col("n0")) * a0 / 100.0, 6).alias("volume_effect"),
        F.round(F.col("n") * (a1 - a0) / 100.0, 6).alias("value_effect"),
    )


@query(
    "interval_union_coverage",
    """
    WITH iv AS (
        SELECT user_id, ts AS lo, ts + INTERVAL 30 MINUTE AS hi FROM events
    ), o AS (
        SELECT user_id, lo, hi,
               max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max_hi
        FROM iv
    ), g AS (
        SELECT user_id, lo, hi,
               CASE WHEN prev_max_hi IS NULL OR lo > prev_max_hi
                    THEN 1 ELSE 0 END AS is_new
        FROM o
    ), s AS (
        SELECT user_id, lo, hi,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY lo, hi
                                 ROWS UNBOUNDED PRECEDING) AS grp
        FROM g
    ), merged AS (
        SELECT user_id, grp, min(lo) AS lo, max(hi) AS hi
        FROM s GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(date_diff('second', lo, hi)) AS BIGINT) AS covered_seconds
    FROM merged GROUP BY user_id
    """,
    "§2.5 interval algebra: per-key union of overlapping intervals (sweep-line via running max + island grouping) — total covered time, no self-join",
)
def q_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total distinct time each user was 'active' when every event
    opens a 30-minute activity window: overlapping windows must merge
    before summing (naive sum double-counts overlaps). The sweep-line
    formulation — running max of interval ends detects gaps, a cumsum
    of gap flags numbers the merged islands — is one partitioned
    window pass, no interval self-join anywhere. Second-granularity
    integer durations keep the oracle exact. Operator:
    operators.rangejoin.merge_intervals."""
    from finance_reporting_etl_spark.operators.rangejoin import merge_intervals

    iv = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
    )
    merged = merge_intervals(iv, ["user_id"])
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(
            (F.unix_timestamp("hi") - F.unix_timestamp("lo")).cast("bigint")
        ).alias("covered_seconds"),
    )


@query(
    "cohort_ltv_curve",
    """
    WITH first_seen AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY 1
    ), sizes AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
        FROM first_seen GROUP BY 1
    ), rev AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              CAST(date_trunc('week', e.ts) AS DATE)) // 7
                    AS BIGINT) AS week_index,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events e
        JOIN first_seen f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    ), cum AS (
        SELECT cohort_week, week_index,
               CAST(sum(cents) OVER (PARTITION BY cohort_week ORDER BY week_index
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_cents
        FROM rev
    )
    SELECT c.cohort_week, c.week_index, s.cohort_users,
           round(CAST(c.cum_cents AS DOUBLE) / s.cohort_users / 100.0, 6)
               AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort_week)
    """,
    "§2.5 cohort LTV curves: cumulative purchase revenue per cohort user by weeks-since-first-seen (cohort-partitioned running total)",
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value curves: for each signup cohort (first-seen
    week), cumulative purchase revenue per cohort member at each week
    of age — the retention economics readout behind payback-period
    decisions. The running total partitions by cohort (never global),
    revenue is integer cents, cohort sizes broadcast; the only float
    is the final per-user division."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", "ts").cast("date"), F.col("cohort_week")
                )
                / 7
            )
            .cast("bigint")
            .alias("week_index"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_cents", F.sum("cents").over(w))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_index",
        "cohort_users",
        F.round(
            F.col("cum_cents").cast("double") / F.col("cohort_users") / 100.0, 6
        ).alias("ltv_per_user"),
    )


@query(
    "open_orders_backlog_daily",
    """
    WITH cl AS (
        SELECT l_orderkey, max(l_shipdate) AS close_day
        FROM lineitem GROUP BY 1
    ), d AS (
        SELECT o.o_orderdate AS day, 1 AS delta
        FROM orders o JOIN cl ON o.o_orderkey = cl.l_orderkey
        UNION ALL
        SELECT cl.close_day, -1
        FROM orders o JOIN cl ON o.o_orderkey = cl.l_orderkey
    ), g AS (
        SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM d GROUP BY 1
    )
    SELECT day,
           CAST(sum(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS open_orders
    FROM g
    """,
    "§2.5 sweep-line backlog: daily count of open orders (+1 at order date, -1 at final ship) — event deltas + running sum over the bounded day spine",
)
def q_open_orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational backlog: how many orders are open (placed, not yet
    fully shipped) on each calendar day. The sweep-line encoding —
    +1 on the order date, -1 on the last ship date, running-sum the
    per-day deltas — turns an interval-overlap count into one
    aggregate plus a window over the DAYS-sized spine (bounded by the
    calendar, not the data; the deltas aggregate map-side before any
    window sees them). Exact integers end to end."""
    from pyspark.sql import Window

    cl = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("close_day"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = o.join(cl, o.o_orderkey == cl.l_orderkey)
    d = j.select(F.col("o_orderdate").alias("day"), F.lit(1).alias("delta")).unionAll(
        j.select(F.col("close_day").alias("day"), F.lit(-1).alias("delta"))
    )
    g = d.groupBy("day").agg(F.sum("delta").cast("bigint").alias("delta"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return g.select("day", F.sum("delta").over(w).cast("bigint").alias("open_orders"))


def _stump_sql(src: str) -> str:
    """DuckDB twin of operators.ml.stump_candidates over a melted
    (feature, v, y) relation ``src``: every candidate split with its
    Gini gain, identical expression tree to the Spark side."""
    return f"""
    SELECT feature, thr, nl AS n_left, nr AS n_right,
           round(
               (1.0 - (CAST(pos AS DOUBLE) / n) * (CAST(pos AS DOUBLE) / n)
                    - (CAST(n - pos AS DOUBLE) / n) * (CAST(n - pos AS DOUBLE) / n))
               - (CAST(nl AS DOUBLE) / n
                  * (1.0 - (CAST(posl AS DOUBLE) / nl) * (CAST(posl AS DOUBLE) / nl)
                         - (CAST(nl - posl AS DOUBLE) / nl) * (CAST(nl - posl AS DOUBLE) / nl))
                  + CAST(nr AS DOUBLE) / n
                  * (1.0 - (CAST(posr AS DOUBLE) / nr) * (CAST(posr AS DOUBLE) / nr)
                         - (CAST(nr - posr AS DOUBLE) / nr) * (CAST(nr - posr AS DOUBLE) / nr))),
           6) AS gini_gain
    FROM (
        SELECT feature, v AS thr, nl, posl, n - nl AS nr, pos - posl AS posr,
               n, pos
        FROM (
            SELECT feature, v,
                   CAST(sum(n_v) OVER w AS BIGINT) AS nl,
                   CAST(sum(pos_v) OVER w AS BIGINT) AS posl,
                   CAST(sum(n_v) OVER (PARTITION BY feature) AS BIGINT) AS n,
                   CAST(sum(pos_v) OVER (PARTITION BY feature) AS BIGINT) AS pos
            FROM (SELECT feature, v, CAST(count(*) AS BIGINT) AS n_v,
                         CAST(sum(y) AS BIGINT) AS pos_v
                  FROM {src} GROUP BY 1, 2)
            WINDOW w AS (PARTITION BY feature ORDER BY v
                         ROWS UNBOUNDED PRECEDING)
        ) WHERE nl < n
    )"""


def _tree_oracle() -> str:
    melt = (
        "SELECT 'quantity' AS feature, q AS v, y FROM {src} "
        "UNION ALL SELECT 'discount', d, y FROM {src}"
    )
    return f"""
    WITH base AS (
        SELECT CAST(l_quantity AS DOUBLE) AS q,
               CAST(l_discount AS DOUBLE) AS d,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),
    mroot AS ({melt.format(src="base")}),
    root AS (
        SELECT * FROM ({_stump_sql("mroot")})
        QUALIFY row_number() OVER (ORDER BY gini_gain DESC, feature, thr) = 1
    ),
    lb AS (
        SELECT b.* FROM base b CROSS JOIN root r
        WHERE (CASE WHEN r.feature = 'quantity' THEN b.q ELSE b.d END) <= r.thr
    ),
    rb AS (
        SELECT b.* FROM base b CROSS JOIN root r
        WHERE (CASE WHEN r.feature = 'quantity' THEN b.q ELSE b.d END) > r.thr
    ),
    ml_ AS ({melt.format(src="lb")}),
    lbest AS (
        SELECT * FROM ({_stump_sql("ml_")})
        QUALIFY row_number() OVER (ORDER BY gini_gain DESC, feature, thr) = 1
    ),
    mr_ AS ({melt.format(src="rb")}),
    rbest AS (
        SELECT * FROM ({_stump_sql("mr_")})
        QUALIFY row_number() OVER (ORDER BY gini_gain DESC, feature, thr) = 1
    )
    SELECT 'root' AS node, feature, thr, n_left, n_right, gini_gain FROM root
    UNION ALL
    SELECT 'L', feature, thr, n_left, n_right, gini_gain FROM lbest
    UNION ALL
    SELECT 'R', feature, thr, n_left, n_right, gini_gain FROM rbest
    """


@query(
    "decision_tree_depth2",
    _tree_oracle(),
    "X-tier iterative ML training: depth-2 Gini tree — root split, then best split per leaf; the oracle RE-LEARNS the whole tree from scratch in SQL (per-level prefix-sum evaluation, deterministic argmax)",
)
def q_decision_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One level deeper than the stump: learn the root split, then the
    best split inside each child — the smallest real 'iterative
    training' loop (each level's input depends on the previous
    level's learned parameters). Per level it is the same
    O(data) + O(distinct-values) prefix-sum evaluation; the learned
    root (1 row) is the only driver traffic. The oracle does not
    check stored parameters — it RE-LEARNS the tree end-to-end in
    SQL, so a mismatch anywhere in the training path (counts, gains,
    argmax, leaf routing) fails the hash."""
    from finance_reporting_etl_spark.operators.ml import train_depth2_tree

    li = _t(spark, sf_dir, "lineitem").select(
        "l_quantity",
        "l_discount",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    return train_depth2_tree(
        li, {"quantity": "l_quantity", "discount": "l_discount"}, "y"
    )


@query(
    "inference_score_calibration",
    """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    scored AS (
        SELECT label,
               round(1.0 / (1.0 + exp(-list_dot_product(
                   v,
                   list_transform(range(0, len(v)), j -> ((j % 7) - 3) / 10.0)
               ))), 6) AS score
        FROM e
    ), b AS (
        SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin,
               CAST(round(score * 1000000) AS BIGINT) AS s_micro,
               CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
        FROM scored
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           round(CAST(sum(s_micro) AS DOUBLE) / 1000000.0 / count(*), 6)
               AS mean_conf,
           round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate
    FROM b GROUP BY 1
    """,
    "X-pipeline model monitoring: reliability table (confidence bins vs realized positive rate) for the linear-probe scores — micro-int-scaled exact mean confidence",
)
def q_inference_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the quality classifier calibrated? Scores bucket into ten
    equal-width confidence bins; each bin reports mean predicted
    confidence vs the realized positive rate (one-vs-rest on label 0)
    — the reliability diagram behind every model-monitoring dashboard.
    Scores are the round-6 deterministic linear-probe outputs (same
    expression the inference oracle re-derives), so scaling them by
    1e6 gives exact integer confidence sums; rates are single
    divisions. One map-side pass + a 10-row aggregate."""
    from finance_reporting_etl_spark.operators.inference import score_embeddings

    scored = score_embeddings(_t(spark, sf_dir, "embeddings"))
    b = scored.select(
        F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9)).alias("bin"),
        F.round(F.col("score") * 1_000_000).cast("bigint").alias("s_micro"),
        (F.col("label") == 0).cast("int").alias("y"),
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.round(
            F.sum("s_micro").cast("double") / 1_000_000.0 / F.count(F.lit(1)), 6
        ).alias("mean_conf"),
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("pos_rate"),
    )


def _stump_full_sql(src: str) -> str:
    """DuckDB stump candidates KEEPING leaf class counts (the SQL twin
    of operators.ml.best_stump_full before its argmax)."""
    return f"""
    SELECT feature, thr, nl, posl, nr, posr,
           round(
               (1.0 - (CAST(pos AS DOUBLE) / n) * (CAST(pos AS DOUBLE) / n)
                    - (CAST(n - pos AS DOUBLE) / n) * (CAST(n - pos AS DOUBLE) / n))
               - (CAST(nl AS DOUBLE) / n
                  * (1.0 - (CAST(posl AS DOUBLE) / nl) * (CAST(posl AS DOUBLE) / nl)
                         - (CAST(nl - posl AS DOUBLE) / nl) * (CAST(nl - posl AS DOUBLE) / nl))
                  + CAST(nr AS DOUBLE) / n
                  * (1.0 - (CAST(posr AS DOUBLE) / nr) * (CAST(posr AS DOUBLE) / nr)
                         - (CAST(nr - posr AS DOUBLE) / nr) * (CAST(nr - posr AS DOUBLE) / nr))),
           6) AS gini_gain
    FROM (
        SELECT feature, v AS thr, nl, posl, n - nl AS nr, pos - posl AS posr,
               n, pos
        FROM (
            SELECT feature, v,
                   CAST(sum(n_v) OVER w AS BIGINT) AS nl,
                   CAST(sum(pos_v) OVER w AS BIGINT) AS posl,
                   CAST(sum(n_v) OVER (PARTITION BY feature) AS BIGINT) AS n,
                   CAST(sum(pos_v) OVER (PARTITION BY feature) AS BIGINT) AS pos
            FROM (SELECT feature, v, CAST(count(*) AS BIGINT) AS n_v,
                         CAST(sum(y) AS BIGINT) AS pos_v
                  FROM {src} GROUP BY 1, 2)
            WINDOW w AS (PARTITION BY feature ORDER BY v
                         ROWS UNBOUNDED PRECEDING)
        ) WHERE nl < n
    )"""


def _bagging_oracle() -> str:
    b256 = (
        "CAST((instr('0123456789abcdef', substr(md5(CAST(l_orderkey AS VARCHAR)"
        " || '-' || CAST(l_linenumber AS VARCHAR) || 'bag'), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substr(md5(CAST(l_orderkey AS VARCHAR)"
        " || '-' || CAST(l_linenumber AS VARCHAR) || 'bag'), 2, 1)) - 1)"
        " AS BIGINT)"
    )
    melt = (
        "SELECT 'quantity' AS feature, q AS v, y FROM {src} "
        "UNION ALL SELECT 'discount', d, y FROM {src}"
    )
    parts = [
        f"""WITH base AS (
        SELECT CAST(l_quantity AS DOUBLE) AS q,
               CAST(l_discount AS DOUBLE) AS d,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               {b256} % 3 AS fold
        FROM lineitem
    )"""
    ]
    for k in range(3):
        parts.append(f"f{k} AS (SELECT * FROM base WHERE fold = {k})")
        parts.append(f"m{k}_ AS ({melt.format(src=f'f{k}')})")
        parts.append(
            f"""b{k} AS (
            SELECT * FROM ({_stump_full_sql(f'm{k}_')})
            QUALIFY row_number() OVER (ORDER BY gini_gain DESC, feature, thr) = 1
        )"""
        )
    pred = lambda k: (  # noqa: E731
        f"CASE WHEN (CASE WHEN s{k}.feature = 'quantity' THEN b.q ELSE b.d END)"
        f" <= s{k}.thr"
        f" THEN CASE WHEN 2 * s{k}.posl > s{k}.nl THEN 1 ELSE 0 END"
        f" ELSE CASE WHEN 2 * s{k}.posr > s{k}.nr THEN 1 ELSE 0 END END"
    )
    parts.append(
        f"""ev AS (
        SELECT b.y, {pred(0)} AS p0, {pred(1)} AS p1, {pred(2)} AS p2
        FROM base b CROSS JOIN b0 s0 CROSS JOIN b1 s1 CROSS JOIN b2 s2
    )"""
    )
    selects = []
    for k in range(3):
        selects.append(
            f"""SELECT 'model_{k}' AS model,
               (SELECT feature FROM b{k}) AS feature,
               (SELECT thr FROM b{k}) AS thr,
               (SELECT CAST(count(*) AS BIGINT) FROM f{k}) AS n_train,
               round(CAST(sum(CASE WHEN p{k} = y THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS accuracy
        FROM ev"""
        )
    selects.append(
        """SELECT 'ensemble' AS model,
               CAST(NULL AS VARCHAR) AS feature,
               CAST(NULL AS DOUBLE) AS thr,
               (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_train,
               round(CAST(sum(CASE WHEN (CASE WHEN p0 + p1 + p2 >= 2
                                              THEN 1 ELSE 0 END) = y
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS accuracy
        FROM ev"""
    )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@query(
    "stump_bagging_eval",
    _bagging_oracle(),
    "X-tier ensemble: 3 stumps bagged on disjoint md5 folds + majority-vote evaluation over all rows — the oracle re-trains every member AND re-scores every row in SQL",
)
def q_stump_bagging_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bagged-stump ensemble: rows hash into 3 disjoint folds (salted
    md5 — reproducible anywhere), each fold trains a stump whose
    leaves predict their majority class, and the 2-of-3 vote is scored
    against every row alongside each member. Training reuses the
    prefix-sum evaluator; scoring is pure column CASE logic on the 3
    collected parameter rows (model params are the ONLY driver
    traffic). Accuracies are exact-count divisions. The oracle
    re-learns all three members and re-votes every row — the whole
    ensemble lifecycle is hash-verified. All three members train in
    ONE pass (`best_stumps_by_fold`: everything partitions by
    (fold, feature)) — measured ~3x over training them sequentially
    at sf0.1, and the shuffle count no longer grows with ensemble
    size. Operator: operators.ml.bagged_stump_ensemble_eval."""
    from finance_reporting_etl_spark.operators.corpus import md5_bucket
    from finance_reporting_etl_spark.operators.ml import bagged_stump_ensemble_eval

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("lq"),
        F.col("l_discount").alias("ld"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (
            md5_bucket(
                F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")),
                256,
                salt="bag",
            )
            % 3
        ).alias("fold"),
    )
    return bagged_stump_ensemble_eval(
        li, {"quantity": "lq", "discount": "ld"}, n_folds=3
    )


@query(
    "gini_revenue_concentration",
    """
    WITH r AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ), rk AS (
        SELECT cents,
               CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT)
                   AS i
        FROM r
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(cents) AS DOUBLE) / 100.0, 6) AS total_revenue,
           round(CAST(2 * sum(i * cents) AS DOUBLE)
                 / (count(*) * CAST(sum(cents) AS DOUBLE))
                 - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini
    FROM rk
    """,
    "A-tier inequality metric: Gini coefficient of customer revenue via the rank formula — exact integer rank-weighted sums, one scalar output",
)
def q_gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is revenue across customers? The rank form of
    the Gini coefficient, G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n with
    x sorted ascending — every sum is an exact integer (ranks x
    cents fit int64 with orders of headroom), so the only floats are
    two final divisions. Ranks come from the distributed_cumsum
    machinery (counting 1s in value order) — no SinglePartition
    window touches the customer-sized table; the rank-weighted sums
    then aggregate map-side."""
    from finance_reporting_etl_spark.operators.ranking import distributed_cumsum

    r = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
        .withColumn("__one", F.lit(1).cast("bigint"))
    )
    rk = distributed_cumsum(
        r, sum_col="__one", key_col="cents", tiebreak_cols=["o_custkey"], out_col="i"
    )
    n = F.count(F.lit(1))
    tot = F.sum("cents")
    return rk.agg(
        n.alias("n_customers"),
        F.round(tot.cast("double") / 100.0, 6).alias("total_revenue"),
        F.round(
            (2 * F.sum(F.col("i") * F.col("cents"))).cast("double")
            / (n * tot.cast("double"))
            - (n + F.lit(1)).cast("double") / n,
            6,
        ).alias("gini"),
    )


@query(
    "value_drift_psi_bins",
    """
    WITH b AS (
        SELECT least(CAST(floor(value / 50.0) AS INT), 9) AS bin,
               CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                    THEN 1 ELSE 0 END AS in_a
        FROM events
    ), t AS (
        SELECT CAST(sum(in_a) AS DOUBLE) AS tot_a,
               CAST(sum(1 - in_a) AS DOUBLE) AS tot_b
        FROM b
    ), g AS (
        SELECT bin,
               CAST(sum(in_a) AS BIGINT) AS n_a,
               CAST(sum(1 - in_a) AS BIGINT) AS n_b
        FROM b GROUP BY 1
    )
    SELECT bin, n_a, n_b,
           round(CAST(n_a AS DOUBLE) / (SELECT tot_a FROM t), 6) AS share_a,
           round(CAST(n_b AS DOUBLE) / (SELECT tot_b FROM t), 6) AS share_b,
           round(
               (greatest(CAST(n_a AS DOUBLE) / (SELECT tot_a FROM t), 0.000001)
                - greatest(CAST(n_b AS DOUBLE) / (SELECT tot_b FROM t), 0.000001))
               * ln(greatest(CAST(n_a AS DOUBLE) / (SELECT tot_a FROM t), 0.000001)
                    / greatest(CAST(n_b AS DOUBLE) / (SELECT tot_b FROM t), 0.000001)),
           6) AS psi_contrib
    FROM g
    """,
    "X-pipeline distribution-drift monitoring: per-bin Population Stability Index contributions (period A vs B), epsilon-clipped shares — exact counts, closed-form floats",
)
def q_value_drift_psi_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the value distribution shift between the first and second
    half of the month? Per fixed-width bin: both periods' shares and
    the PSI contribution (p-q)*ln(p/q) with 1e-6 share clipping — the
    standard drift alarm for features and model scores (sum the
    contributions; > 0.2 means act). The per-bin table is emitted
    instead of the summed scalar so every number is either an exact
    count or a closed-form float both engines evaluate identically —
    the cross-engine float-SUM trap (PLANS.md #10) never appears.
    Operator: operators.drift.psi_bin_table (shared with the
    streaming twin — one PSI expression tree, two arrival modes)."""
    from finance_reporting_etl_spark.operators.drift import psi_bin_table, value_bin

    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        value_bin(),
        F.when(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"), 1)
        .otherwise(0)
        .alias("in_a"),
    )
    t = b.agg(
        F.sum("in_a").cast("double").alias("__tot_a"),
        F.sum(1 - F.col("in_a")).cast("double").alias("__tot_b"),
    )
    g = b.groupBy("bin").agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("n_b"),
    )
    return psi_bin_table(g.crossJoin(F.broadcast(t)))


@query(
    "rfm_segmentation",
    """
    WITH p AS (
        SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'
    ), g AS (SELECT CAST(max(ts) AS DATE) AS gmax FROM p),
    u AS (
        SELECT user_id,
               CAST(date_diff('day', CAST(max(ts) AS DATE),
                              (SELECT gmax FROM g)) AS BIGINT) AS r_days,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(c) AS BIGINT) AS cents
        FROM p GROUP BY 1
    )
    SELECT user_id, r_days, freq, cents,
           CAST(ntile(5) OVER (ORDER BY -r_days, user_id) AS INT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY freq, user_id) AS INT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY cents, user_id) AS INT) AS m_score,
           CAST(ntile(5) OVER (ORDER BY -r_days, user_id) AS VARCHAR)
           || CAST(ntile(5) OVER (ORDER BY freq, user_id) AS VARCHAR)
           || CAST(ntile(5) OVER (ORDER BY cents, user_id) AS VARCHAR)
               AS segment
    FROM u
    """,
    "A-tier CRM segmentation: RFM quintile scores (recency/frequency/monetary) via three exact distributed ntiles — no single-partition sort anywhere",
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CRM classic: every purchasing user scored 1-5 on Recency
    (days since last purchase, recent = 5), Frequency, and Monetary
    value, quintiles exact. Each score is a GLOBAL ntile over the
    user table — the textbook SinglePartition trap — computed here
    with three `distributed_ntile` passes (sketch-bucketed ranges +
    broadcast offsets), so the plan survives a user table of any
    size — and all three metrics score in ONE pass
    (`distributed_ntile_melted`: the metric id rides the partition
    key, so one sketch job + one offset round + one window pass cover
    R, F and M together). At k=3 metrics the cost matches three
    sequential ntile calls (the pivot-back join offsets the saved
    driver barriers); the win grows with metric count, since the job
    count stays constant while the sequential form pays per metric.
    Integer metrics make every quintile boundary deterministic
    (user_id tiebreak). Operator:
    operators.ranking.multi_metric_ntile_scores."""
    from finance_reporting_etl_spark.operators.ranking import (
        multi_metric_ntile_scores,
    )

    p = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.round(F.col("value") * 100).cast("bigint").alias("c"))
    )
    gmax = p.agg(F.max("ts").cast("date").alias("__gmax"))
    u = (
        p.groupBy("user_id")
        .agg(
            F.max("ts").cast("date").alias("__last"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("c").alias("cents"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.datediff("__gmax", "__last").cast("bigint").alias("r_days"),
            "freq",
            "cents",
        )
        .withColumn("__negr", -F.col("r_days"))
    )
    wide = multi_metric_ntile_scores(
        u, {"r": "__negr", "f": "freq", "m": "cents"}, 5, ["user_id"]
    )
    scored = u.join(wide, "user_id")
    return scored.select(
        "user_id",
        "r_days",
        "freq",
        "cents",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


@query(
    "finance_daily_pipeline",
    """
    WITH gated AS (
        SELECT * FROM events WHERE value > 0 AND value <= 500
    ), d AS (
        SELECT CAST(CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE
                         'America/New_York' AS TIMESTAMP) AS DATE)
                   AS trading_day,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM gated GROUP BY 1, 2
    ), k AS (
        SELECT event_type,
               CAST(dayofweek(trading_day) + 1 AS INT) AS dow,
               CAST(sum(cents) AS BIGINT) AS cents,
               CAST(count(*) AS BIGINT) AS n_days
        FROM d GROUP BY 1, 2
    )
    SELECT d.trading_day, d.event_type, d.n_events,
           round(CAST(d.cents AS DOUBLE) / 100.0, 6) AS revenue,
           CAST(dayofweek(d.trading_day) + 1 AS INT) AS dow,
           round(CAST(d.cents AS DOUBLE)
                 / (CAST(k.cents AS DOUBLE) / k.n_days), 6)
               AS seasonality_ratio,
           CAST(d.cents AS DOUBLE)
               / (CAST(k.cents AS DOUBLE) / k.n_days) > 1.5 AS is_high
    FROM d JOIN k
      ON d.event_type = k.event_type
     AND CAST(dayofweek(d.trading_day) + 1 AS INT) = k.dow
    """,
    "O-tier composed finance pipeline: quality gate -> NY trading-day mart -> DOW seasonality baseline -> anomaly flag, ONE Catalyst plan (the finance-side twin of corpus_training_pipeline)",
)
def q_finance_daily_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily reporting chain as one declarative plan: gate bad
    rows (value bounds), roll up to exchange-local trading days
    (DST-correct), derive each series' day-of-week baseline FROM the
    same gated data, and flag days running >1.5x their weekday norm.
    Catalyst sees the whole chain — the gate pushes into the scan,
    the daily table is scanned once and re-aggregated for the
    baseline (ReuseExchange), the baseline joins back as a bounded
    broadcast. Integer cents throughout; the ratio is one division
    computed identically by the oracle."""
    ev = _t(spark, sf_dir, "events")
    gated = ev.filter((F.col("value") > 0) & (F.col("value") <= 500))
    d = (
        gated.groupBy(
            F.from_utc_timestamp("ts", "America/New_York")
            .cast("date")
            .alias("trading_day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
    )
    k = (
        d.groupBy("event_type", F.dayofweek("trading_day").alias("dow"))
        .agg(
            F.sum("cents").alias("kcents"), F.count(F.lit(1)).alias("n_days")
        )
    )
    j = d.join(
        F.broadcast(k),
        (d.event_type == k.event_type) & (F.dayofweek(d.trading_day) == k.dow),
    ).drop(k.event_type)
    baseline = F.col("kcents").cast("double") / F.col("n_days")
    ratio = F.col("cents").cast("double") / baseline
    return j.select(
        "trading_day",
        "event_type",
        "n_events",
        F.round(F.col("cents").cast("double") / 100.0, 6).alias("revenue"),
        F.dayofweek("trading_day").alias("dow"),
        F.round(ratio, 6).alias("seasonality_ratio"),
        (ratio > 1.5).alias("is_high"),
    )


@query(
    "streaming_value_drift_psi",
    """
    WITH b AS (
        SELECT least(CAST(floor(value / 50.0) AS INT), 9) AS bin,
               CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                    THEN 1 ELSE 0 END AS in_a
        FROM events
    ), t AS (
        SELECT CAST(sum(in_a) AS DOUBLE) AS tot_a,
               CAST(sum(1 - in_a) AS DOUBLE) AS tot_b
        FROM b
    ), g AS (
        SELECT bin,
               CAST(sum(in_a) AS BIGINT) AS n_a,
               CAST(sum(1 - in_a) AS BIGINT) AS n_b
        FROM b GROUP BY 1
    )
    SELECT bin, n_a, n_b,
           round(CAST(n_a AS DOUBLE) / (SELECT tot_a FROM t), 6) AS share_a,
           round(CAST(n_b AS DOUBLE) / (SELECT tot_b FROM t), 6) AS share_b,
           round(
               (greatest(CAST(n_a AS DOUBLE) / (SELECT tot_a FROM t), 0.000001)
                - greatest(CAST(n_b AS DOUBLE) / (SELECT tot_b FROM t), 0.000001))
               * ln(greatest(CAST(n_a AS DOUBLE) / (SELECT tot_a FROM t), 0.000001)
                    / greatest(CAST(n_b AS DOUBLE) / (SELECT tot_b FROM t), 0.000001)),
           6) AS psi_contrib
    FROM g
    """,
    "§2.8 x X-pipe continuous drift monitoring: period-B bin counts folded across micro-batches via foreachBatch == the one-shot batch PSI (same oracle as value_drift_psi_bins)",
)
def q_streaming_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONTINUOUS form of `value_drift_psi_bins`: the comparison
    period arrives as a live stream, each micro-batch contributes its
    per-bin counts through foreachBatch (counts are additive — the
    mergeable-sketch property with a 10-cell 'sketch'), and the PSI
    table reads identically to the one-shot batch computation (the
    shared oracle proves it). Replayed as 3 micro-batches; reference
    (period-A) counts stay a static table. State per batch: 10 rows.
    Operators: streaming.drift.streaming_bin_count_fold +
    operators.drift.psi_from_counts."""
    from finance_reporting_etl_spark.operators.drift import psi_from_counts, value_bin
    from finance_reporting_etl_spark.streaming.drift import streaming_bin_count_fold
    from finance_reporting_etl_spark.streaming.staging import run_file_stream

    ev = _t(spark, sf_dir, "events")
    mid = F.lit("2024-01-15 00:00:00").cast("timestamp")
    a_counts = (
        ev.filter(F.col("ts") < mid)
        .select(value_bin())
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_a"))
    )
    b_counts = run_file_stream(
        spark,
        lambda src: ev.filter(F.col("ts") >= mid)
        .select("ts", "value")
        .repartition(3)
        .write.parquet(src),
        lambda src, schema, tmp: streaming_bin_count_fold(
            spark, src, schema,
            checkpoint_dir=f"{tmp}/ckpt", sink_dir=f"{tmp}/sink",
            bin_expr=value_bin(),
        ),
        lambda tmp: spark.read.parquet(f"{tmp}/sink")
        .groupBy("bin")
        .agg(F.sum("n").cast("bigint").alias("n_b")),
        prefix="stream_psi_",
        label="streaming_value_drift_psi",
    )
    return psi_from_counts(a_counts, b_counts)


@query(
    "collocation_pmi_top",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    nt AS (SELECT CAST(sum(len(toks)) AS DOUBLE) AS n_toks FROM t),
    uni AS (
        SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest(toks) AS term FROM t
        ) GROUP BY 1
    ),
    pairs AS (
        SELECT toks[i] AS l, toks[i + d] AS r
        FROM t, (VALUES (1), (2)) AS dd(d),
             unnest(generate_series(1, len(toks) - d)) AS u(i)
    ),
    np AS (SELECT CAST(count(*) AS DOUBLE) AS n_pairs FROM pairs),
    pc AS (
        SELECT l, r, CAST(count(*) AS BIGINT) AS n_lr
        FROM pairs GROUP BY 1, 2 HAVING count(*) >= 10
    ),
    scored AS (
        SELECT pc.l, pc.r, pc.n_lr,
               round(ln((CAST(pc.n_lr AS DOUBLE) / (SELECT n_pairs FROM np))
                        / ((CAST(a.n AS DOUBLE) / (SELECT n_toks FROM nt))
                           * (CAST(b.n AS DOUBLE) / (SELECT n_toks FROM nt)))),
               6) AS pmi
        FROM pc
        JOIN uni a ON pc.l = a.term
        JOIN uni b ON pc.r = b.term
    )
    SELECT l, r, n_lr, pmi,
           row_number() OVER (ORDER BY pmi DESC, l, r) AS rank
    FROM scored ORDER BY pmi DESC, l, r LIMIT 20
    """,
    "X4 collocation mining: top-20 ordered token pairs (distance <= 2) by pointwise mutual information — exact co-occurrence counts, closed-form PMI, min-support 10",
)
def q_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which token pairs co-occur far more than chance? PMI over
    ordered pairs within distance 2, min support 10 — the collocation
    extractor behind phrase detection and tokenizer-merge candidates.
    Pairs generate MAP-SIDE from each document's token array (indexed
    sequence explode — no self-join anywhere); unigram and pair
    counts are exact; PMI is one closed-form expression on those
    counts with the two corpus scalars broadcast. Top-20 via
    TakeOrderedAndProject. Operator: operators.corpus.pmi_collocations."""
    from finance_reporting_etl_spark.operators.corpus import pmi_collocations

    return pmi_collocations(
        _t(spark, sf_dir, "documents"), max_dist=2, min_support=10, k=20
    )


@query(
    "debounce_events",
    """
    WITH o AS (
        SELECT event_id, user_id, event_type, ts, value,
               lag(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT event_id, user_id, event_type, ts, value
    FROM o
    WHERE prev_ts IS NULL OR ts - prev_ts >= INTERVAL 5 SECOND
    """,
    "X1/§2.5 telemetry debounce: drop events within 5s of the previous same-(user, type) event — burst suppression via one partitioned lag, no self-join",
)
def q_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-click / retry suppression: an event is kept only if at
    least 5 seconds passed since the previous event of the same
    (user, type) — the standard telemetry debounce that exact dedup
    cannot express (the duplicates have distinct ids and near-equal,
    not equal, timestamps). One lag over a (user, type)-partitioned
    window; chained bursts collapse toward their first event per
    surviving gap. Timestamps compare at microsecond precision in
    both engines, so the keep-set hash-matches exactly."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    o = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    ).withColumn("prev_ts", F.lag("ts").over(w))
    # integer-microsecond compare — a double-seconds subtraction would
    # lose ~4e-7 s near the epoch and could flip an exactly-5s gap
    keep = F.col("prev_ts").isNull() | (
        F.unix_micros("ts") - F.unix_micros("prev_ts") >= 5_000_000
    )
    return o.filter(keep).drop("prev_ts")


@query(
    "holt_trend_forecast",
    """
    WITH RECURSIVE d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS rn,
               CAST(cents AS DOUBLE) / 100.0 AS x
        FROM d
    ), nn AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs
        FROM seq GROUP BY 1
    ), st AS (
        SELECT event_type, rn, x AS l, CAST(0.0 AS DOUBLE) AS b
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, q.rn,
               0.3 * q.x + 0.7 * (s.l + s.b),
               0.1 * ((0.3 * q.x + 0.7 * (s.l + s.b)) - s.l) + 0.9 * s.b
        FROM st s JOIN seq q
          ON q.event_type = s.event_type AND q.rn = s.rn + 1
    )
    SELECT st.event_type, nn.n_obs,
           round(st.l, 6) AS level,
           round(st.b, 6) AS trend,
           round(st.l + st.b, 6) AS forecast_1,
           round(st.l + 7.0 * st.b, 6) AS forecast_7
    FROM st JOIN nn ON st.event_type = nn.event_type AND st.rn = nn.n_obs
    """,
    "custom per-key recursive scan #3: Holt double-exponential smoothing (two coupled states) == DuckDB RECURSIVE CTE stepping the identical update, bit-for-bit",
)
def q_holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend-aware forecast per revenue series: Holt's method carries
    TWO coupled recursive states (level + trend), so it is doubly
    inexpressible as a window aggregate; the grouped-map fold runs
    the identical float64 operation sequence as the oracle's
    RECURSIVE CTE step (the trend recomputes the level expression,
    matching step for step), making the smoothed states and the
    1-day / 7-day forecasts hash-exact. A struct-accumulator
    list_reduce oracle was rejected: DuckDB evaluates the result
    struct's fields sequentially against a mutating accumulator, so
    the second field reads the first field's NEW value — recursive
    CTE rows are immutable per step. alpha=0.3, gamma=0.1; daily
    inputs are exact cents / 100."""
    from finance_reporting_etl_spark.operators.timeseries import (
        holt_forecast_per_key,
    )

    d = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
        .select(
            "event_type",
            "day",
            (F.col("cents").cast("double") / 100.0).alias("x"),
        )
    )
    return holt_forecast_per_key(
        d, "event_type", ["day"], "x", alpha=0.3, gamma=0.1
    )


# ---------------------------------------------------------------------------
# Gate-window ordering.
#
# The driver's correctness gate runs the FIRST 50 catalog entries in dict
# insertion order. Rounds 1-2 hard-verified the 50 entries listed second
# below (green rows in CORRECTNESS_r01/r02.json); the 36 listed first were
# registered later and have only the local pytest oracle replica so far.
# Rotating them into the gate window gives every entry a driver-verified
# row within two consecutive rounds; the previously-proven entries keep
# their standing evidence. Definition order above is unchanged — only the
# exported dict order moves.
# ---------------------------------------------------------------------------

# Round-5 gate window (driver verifies the first 50 catalog entries):
# the first 50 of the 78 catalog entries that have NEVER held a driver
# gate slot (VERDICT r4 "Next round" #1), in catalog-registration order
# (oldest additions first). Every entry here is local-oracle-verified at
# sf0.001 and sf0.01. The remaining 28 never-gated entries are pinned in
# _GATE_NEXT immediately after the window so the round-6 rotation is a
# mechanical swap (_GATE_FIRST <- _GATE_NEXT + re-gates); jointly the
# r5+r6 windows cover all 78 (VERDICT r4 #2).
_GATE_FIRST = [
    "lm_quality_scores",
    "media_resize_decode",
    "ingest_pages_datasource",
    "variant_event_payloads",
    "ann_ivfpq_topk",
    "heavy_hitters_cms",
    "event_grouping_sets",
    "lineitem_unpivot_metrics",
    "corpus_upsample_epochs",
    "quality_percentile_filter",
    "stratified_reservoir_sample",
    "profile_documents_table",
    "streaming_heavy_hitters",
    "label_time_to_next_purchase",
    "rolling_7day_distinct_users",
    "per_lang_token_length_regression",
    "mixture_rebalance_to_target",
    "length_bucketed_batching",
    "user_value_ema",
    "rollup_cascade_monthly",
    "bitmap_distinct_rollup",
    "hll_distinct_rollup",
    "streaming_view_purchase_join",
    "part_copurchase_pagerank",
    "rolling_zscore_anomalies",
    "indicator_linear_interpolation",
    "random_projection_topk",
    "histogram_quantile_rollup",
    "cdc_changelog_apply",
    "corpus_training_pipeline",
    "entity_resolution_blocked",
    "event_transition_matrix",
    "copurchase_association_rules",
    "streaming_left_outer_interval_join",
    "copurchase_clustering_coefficient",
    "copurchase_triangle_counts",
    "dbt_schema_tests",
    "dedup_incremental_batch",
    "part_copurchase_pagerank_weighted",
    "copurchase_bfs_distances",
    "span_dedup_rewrite",
    "winsorized_value_stats",
    "bm25_search_topk",
    "streaming_sliding_window_counts",
    "asof_cogroup_pandas",
    "target_encode_brand",
    "streaming_static_dim_join",
    "k_anonymity_suppress",
    "embedding_int8_quantize",
    "abc_customer_classification",
]

# The 28 never-gated entries that did not fit the 50-slot r5 window.
# Pinned directly after the window in catalog order so (a) the round-6
# rotation starts from this list and (b) tests can assert the two-round
# coverage plan instead of relying on a hand-maintained comment.
_GATE_NEXT = [
    "business_days_to_ship",
    "event_trigram_paths",
    "corpus_token_budget_select",
    "session_bounce_rate",
    "decision_stump_train",
    "join_key_skew_profile",
    "rolling_correlation_series",
    "ab_test_conversion_lift",
    "trading_day_rollup",
    "dow_seasonality_index",
    "seed_sla_attainment",
    "capped_user_balance",
    "embedding_outlier_flags",
    "revenue_bridge_mom",
    "interval_union_coverage",
    "cohort_ltv_curve",
    "open_orders_backlog_daily",
    "decision_tree_depth2",
    "inference_score_calibration",
    "stump_bagging_eval",
    "gini_revenue_concentration",
    "value_drift_psi_bins",
    "rfm_segmentation",
    "finance_daily_pipeline",
    "streaming_value_drift_psi",
    "collocation_pmi_top",
    "debounce_events",
    "holt_trend_forecast",
]

assert set(_GATE_FIRST) <= set(CATALOG), sorted(set(_GATE_FIRST) - set(CATALOG))
assert set(_GATE_NEXT) <= set(CATALOG), sorted(set(_GATE_NEXT) - set(CATALOG))
assert not set(_GATE_FIRST) & set(_GATE_NEXT)
_GATE_ORDERED = _GATE_FIRST + _GATE_NEXT
CATALOG = {
    **{n: CATALOG[n] for n in _GATE_ORDERED},
    **{n: e for n, e in CATALOG.items() if n not in _GATE_ORDERED},
}
