"""Streaming/batch equivalence under true multi-micro-batch replay.

The registry's streaming queries run single-batch (one fixture file); these
tests split the fixture into time-ordered files and replay with
maxFilesPerTrigger=1, so keyed state genuinely crosses micro-batch
boundaries and event-time timers fire on watermark progress."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.operators.stateful_batch import (
    BOUNCE_TIMEOUT_S,
    SESSION_GAP_S,
    bounce_events,
    daily_first_visit,
)
from flink_real_time_data_warehouse_spark.sources.streams import replay_splits, stream_dir
from flink_real_time_data_warehouse_spark.streaming.pipelines import (
    interval_join_stream,
    log_split,
    run_to_memory,
)
from flink_real_time_data_warehouse_spark.streaming.router import RouteConfig, route_micro_batch
from flink_real_time_data_warehouse_spark.streaming.state import bounce_stream, uv_dedup_stream
from flink_real_time_data_warehouse_spark.tables import table

from .conftest import TEST_SF_DIR

N_SPLITS = 6


@pytest.fixture(scope="module")
def event_splits(spark):
    with tempfile.TemporaryDirectory(prefix="ev_splits_") as d:
        yield replay_splits(spark, TEST_SF_DIR, "events", N_SPLITS, d)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_uv_dedup_multibatch(spark, event_splits):
    schema = spark.read.parquet(event_splits).schema
    stream = stream_dir(spark, event_splits, schema, max_files_per_trigger=1)
    got = run_to_memory(uv_dedup_stream(stream), spark)
    want = daily_first_visit(table(spark, TEST_SF_DIR, "events")).select(
        "user_id", "visit_day", "first_ts"
    )
    assert _rows(got, got.columns) == _rows(want, got.columns)


def test_bounce_multibatch(spark, event_splits):
    schema = spark.read.parquet(event_splits).schema
    stream = stream_dir(spark, event_splits, schema, max_files_per_trigger=1).withWatermark(
        "ts", "1 second"
    )
    got = run_to_memory(bounce_stream(stream, SESSION_GAP_S, BOUNCE_TIMEOUT_S), spark)

    ev = table(spark, TEST_SF_DIR, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0].timestamp()
    batch = bounce_events(ev).select("event_id", "user_id", "ts")
    # streaming can only emit timer-based bounces the final watermark passed
    want = batch.where(
        F.col("ts").cast("double") + BOUNCE_TIMEOUT_S <= F.lit(max_ts - 1.0)
    )
    assert _rows(got, ["event_id", "user_id"]) == _rows(want, ["event_id", "user_id"])


def test_stream_stream_interval_join(spark, event_splits):
    """J1-shaped stream-stream join: purchases join clicks of the same user
    within [0, 1h] — streaming result equals the batch join."""
    schema = spark.read.parquet(event_splits).schema
    ev = stream_dir(spark, event_splits, schema, max_files_per_trigger=2)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    joined = interval_join_stream(
        purchases, clicks,
        keys=F.col("p_user") == F.col("c_user"),
        left_ts="p_ts", right_ts="c_ts",
        lower="INTERVAL 0 SECOND", upper="INTERVAL 1 HOUR",
        left_watermark="1 second", right_watermark="1 second",
    )
    got = run_to_memory(joined, spark)

    b = table(spark, TEST_SF_DIR, "events")
    bp = b.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    bc = b.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    want = bp.join(
        bc,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    assert _rows(got, ["p_id", "c_id"]) == _rows(want, ["p_id", "c_id"])


def test_log_split_partitions(spark):
    ev = table(spark, TEST_SF_DIR, "events")
    parts = log_split(ev)
    total = sum(p.count() for p in parts.values())
    assert total == ev.count()
    assert parts["error"].where(F.col("err_code").isNull()).count() == 0


def test_router_dynamic_sinks(spark, tmp_path):
    """R2/R3: micro-batch routed per config entry into dynamically created
    sink tables, with config-driven column pruning."""
    orders = table(spark, TEST_SF_DIR, "orders")
    envelope = orders.select(
        F.lit("order_info").alias("source_table"),
        F.when(F.col("o_orderkey") % 3 == 0, "update").otherwise("insert").alias("op"),
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_totalprice").alias("total_amount"),
    )
    configs = [
        RouteConfig("order_info", "insert", "dwd_order_info", ("id", "user_id", "total_amount")),
        RouteConfig("order_info", "update", "dim_order_info", ("id", "total_amount")),
    ]
    written = route_micro_batch(envelope, configs, str(tmp_path))
    assert set(written) == {"dwd_order_info", "dim_order_info"}

    inserts = spark.read.parquet(str(tmp_path / "dwd_order_info"))
    updates = spark.read.parquet(str(tmp_path / "dim_order_info"))
    assert inserts.columns == ["id", "user_id", "total_amount"]
    assert updates.columns == ["id", "total_amount"]
    n = orders.count()
    assert updates.count() == orders.where(F.col("o_orderkey") % 3 == 0).count()
    assert inserts.count() + updates.count() == n
