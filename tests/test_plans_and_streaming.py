"""Model registry semantics (ref/materialization/cycles) and the
Structured Streaming AvailableNow rollup vs its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finance_reporting_etl_spark.plans.registry import ModelRegistry
from finance_reporting_etl_spark.streaming.rollup import streaming_rollup, time_bucket_rollup
from finance_reporting_etl_spark.tables import _read_parquet


def test_registry_ref_order_and_materialization(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model("stg_a", materialized="view")
    def stg_a(ctx):
        return ctx.ref("src").withColumn("v2", F.col("v") * 2)

    @reg.model("mart_b", materialized="table")
    def mart_b(ctx):
        return ctx.ref("stg_a").groupBy().agg(F.sum("v2").alias("total"))

    src = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    out = reg.run(spark, {"src": src}, warehouse_dir=str(tmp_path))
    assert out["mart_b"].first().total == 12
    # mart persisted and re-registered: spark.sql reads the parquet-backed table
    assert spark.sql("SELECT total FROM mart_b").first().total == 12
    assert (tmp_path / "mart_b").exists()
    # view stays queryable too (Metabase read-path parity, SURVEY §3 EP3)
    assert spark.sql("SELECT sum(v2) s FROM stg_a").first().s == 12


def test_registry_cycle_detection(spark):
    reg = ModelRegistry()

    @reg.model("a")
    def a(ctx):
        return ctx.ref("b")

    @reg.model("b")
    def b(ctx):
        return ctx.ref("a")

    with pytest.raises(ValueError, match="cycle"):
        reg.run(spark, {})


def test_registry_unknown_ref(spark):
    reg = ModelRegistry()

    @reg.model("a")
    def a(ctx):
        return ctx.ref("nope")

    with pytest.raises(KeyError):
        reg.run(spark, {})


def test_streaming_rollup_matches_batch(spark, sf_dir, tmp_path):
    events = _read_parquet(spark, f"{sf_dir}/events.parquet")
    # stage as micro-batch-friendly parquet (ns ts already converted)
    src = str(tmp_path / "stream_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = streaming_rollup(
        spark,
        src,
        schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_table="rollup_stream_test",
        bucket="1 hour",
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    stream_out = spark.table("rollup_stream_test")
    batch_out = time_bucket_rollup(events, "1 hour").select(
        "window_start", "event_type", "n_events", "total_value"
    )
    a = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch_out.collect()}
    assert a == b
