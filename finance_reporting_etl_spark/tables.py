"""Test-fixture table loading and view registration.

The driver's synthetic tables (TESTDATA.md) stand in for the reference's
domain tables (FIXTURES.md §B): ``events`` plays ``raw.financial_data``
(ts ≙ observation_date, value ≙ value, event_type ≙ series_id), the
TPC-H-ish star schema provides join/aggregate fixtures, and
``documents``/``embeddings`` back the LLM-pipeline extension operators.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates TIMESTAMP(NANOS) columns.

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` those columns arrive as long
    nanoseconds and are converted here to microsecond timestamps (Spark's
    native precision). Column detection comes from the parquet footer, so
    this is a cheap driver-side metadata read, not a data pass.

    ``session.get_spark`` sets the legacy conf at build time (the
    documented home for it); the ensure-set below only covers sessions
    this package didn't build (e.g. the correctness driver's), and is
    skipped when already configured so repeated reads don't churn conf.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) must read as session-tz
    # (UTC) timestamps, not TIMESTAMP_NTZ — event-time ops (withWatermark)
    # reject NTZ, and the oracle compares wall-clock values either way.
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    # startswith: tz-aware nanos print as "timestamp[ns, tz=UTC]" — an
    # exact match would leave such columns as raw nanosecond longs
    # downstream (r5 review)
    ns_cols = [
        f.name
        for f in pq.read_schema(path)
        if str(f.type).startswith("timestamp[ns")
    ]
    for c in ns_cols:
        # integer division — ns values (~1.7e18) overflow double precision,
        # so a float divide would corrupt the microsecond value
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load each parquet fixture as a DataFrame keyed by table name."""
    return {name: _read_parquet(spark, f"{sf_dir}/{name}.parquet") for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load fixtures and register each as a temp view for spark.sql use."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
