"""End-to-end BaseDBApp path (SURVEY §3.2): CDC envelope -> parse/normalize
-> delete filter -> config-driven routing -> fact sink + dim store MERGE."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.sources.cdc import parse_cdc, simulate_cdc_batch
from flink_real_time_data_warehouse_spark.sources.dim_store import DimStore
from flink_real_time_data_warehouse_spark.streaming.router import RouteConfig, route_micro_batch
from flink_real_time_data_warehouse_spark.tables import table

from .conftest import TEST_SF_DIR


def test_cdc_envelope_normalization(spark):
    env = simulate_cdc_batch(spark, TEST_SF_DIR)
    ops = {r["type"] for r in env.select("type").distinct().collect()}
    assert ops == {"insert", "update", "delete"}  # create was renamed
    deletes = env.where(F.col("type") == "delete")
    assert deletes.where(F.size(F.col("after")) > 0).count() == 0
    assert deletes.where(F.size(F.col("before")) == 0).count() == 0


def test_cdc_route_to_facts_and_dims(spark, tmp_path):
    env = simulate_cdc_batch(spark, TEST_SF_DIR)
    # BaseDBApp.java:50-58 — drop deletes before routing
    live = env.where(F.col("type") != "delete")
    flat = live.select(
        F.col("tableName").alias("source_table"),
        F.col("type").alias("op"),
        F.col("after")["id"].cast("long").alias("id"),
        F.col("after")["user_id"].cast("long").alias("user_id"),
        F.col("after")["total_amount"].cast("double").alias("total_amount"),
        F.col("after")["order_status"].alias("order_status"),
    )
    configs = [
        RouteConfig("order_info", "insert", "dwd_order_info", ("id", "user_id", "total_amount")),
        RouteConfig("order_info", "update", "dim_order_info", ("id", "order_status")),
    ]
    route_micro_batch(flat, configs, str(tmp_path / "sinks"))

    # dim side continues into the MERGE store (DimSinkFunction analog)
    store = DimStore(spark, str(tmp_path / "dims"))
    dim_updates = spark.read.parquet(str(tmp_path / "sinks" / "dim_order_info"))
    store.upsert("order_info", dim_updates)

    orders = table(spark, TEST_SF_DIR, "orders")
    n_total = orders.count()
    n_del = orders.where(F.col("o_orderkey") % 10 == 0).count()
    n_upd = orders.where(F.col("o_orderkey") % 10 == 1).count()
    facts = spark.read.parquet(str(tmp_path / "sinks" / "dwd_order_info"))
    assert facts.count() == n_total - n_del - n_upd
    assert store.snapshot("order_info").count() == n_upd
    # second upsert of the same keys must not duplicate (MERGE, not append)
    store.upsert("order_info", dim_updates)
    assert store.snapshot("order_info").count() == n_upd
