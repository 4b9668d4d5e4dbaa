"""End-to-end BaseDBApp path (SURVEY §3.2): CDC envelope -> parse/normalize
-> delete filter -> config-driven routing -> fact sink + dim store MERGE."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.sources.cdc import (
    cdc_initial_load,
    parse_cdc,
    simulate_cdc_batch,
)
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
    # dim entry declares its sink type + MERGE key in config — the router
    # drives the DimSinkFunction path itself (TableProcess.sinkType/sinkPk)
    configs = [
        RouteConfig("order_info", "insert", "dwd_order_info", ("id", "user_id", "total_amount")),
        RouteConfig(
            "order_info", "update", "dim_order_info", ("id", "order_status"),
            sink_type="dim", sink_pk="id",
        ),
    ]
    store = DimStore(spark, str(tmp_path / "dims"))
    route_micro_batch(flat, configs, str(tmp_path / "sinks"), epoch_id=0, dim_store=store)

    orders = table(spark, TEST_SF_DIR, "orders")
    n_total = orders.count()
    n_del = orders.where(F.col("o_orderkey") % 10 == 0).count()
    n_upd = orders.where(F.col("o_orderkey") % 10 == 1).count()
    facts = spark.read.parquet(str(tmp_path / "sinks" / "dwd_order_info"))
    assert facts.count() == n_total - n_del - n_upd
    assert store.snapshot("dim_order_info").count() == n_upd

    # replaying the same epoch (failed-batch retry) must not duplicate:
    # table sink skips via the commit marker, dim MERGE converges
    route_micro_batch(flat, configs, str(tmp_path / "sinks"), epoch_id=0, dim_store=store)
    assert spark.read.parquet(str(tmp_path / "sinks" / "dwd_order_info")).count() == facts.count()
    assert store.snapshot("dim_order_info").count() == n_upd

    # a NEW epoch of the same rows does append (at-least-once without
    # dedup is the caller's contract violation, not the router's)
    route_micro_batch(flat, configs[:1], str(tmp_path / "sinks"), epoch_id=1)
    assert (
        spark.read.parquet(str(tmp_path / "sinks" / "dwd_order_info")).count()
        == 2 * facts.count()
    )


def test_apply_cdc_changes_seq_guard_blocks_stale_writes(spark, tmp_path):
    """Replaying an OLDER log segment after a newer one must be a no-op:
    the per-key seq guard (WHEN MATCHED AND src.seq >= tgt.seq) drops
    stale upserts and stale deletes instead of regressing the key."""
    from flink_real_time_data_warehouse_spark.sources.cdc import apply_cdc_changes

    store = DimStore(spark, str(tmp_path / "dims"))
    fresh = spark.createDataFrame([(1, "v1-new", 20, "insert"), (2, "v2", 21, "insert")],
                                  "id long, val string, seq long, op string")
    apply_cdc_changes(store, "t", fresh)
    # stale update of key 1, stale delete of key 2 (both seq < stored seq)
    stale = spark.createDataFrame([(1, "v1-old", 10, "update"), (2, "v2", 11, "delete")],
                                  "id long, val string, seq long, op string")
    apply_cdc_changes(store, "t", stale)
    state = {r["id"]: (r["val"], r["seq"]) for r in store.snapshot("t").collect()}
    assert state == {1: ("v1-new", 20), 2: ("v2", 21)}
    # a genuinely newer change still applies
    newer = spark.createDataFrame([(1, "v1-newer", 30, "update"), (2, "v2", 31, "delete")],
                                  "id long, val string, seq long, op string")
    apply_cdc_changes(store, "t", newer)
    state = {r["id"]: r["val"] for r in store.snapshot("t").collect()}
    assert state == {1: "v1-newer"}


def test_idempotent_append_crash_retry_with_fewer_parts(spark, tmp_path):
    """Crash-retry must converge even when the retry plans FEWER parts than
    the crashed attempt promoted: the rollback sweep removes the orphaned
    higher-indexed epoch files before re-promoting (a retry that merely
    overwrote lower-indexed names would leave silent duplicates)."""
    import os

    from flink_real_time_data_warehouse_spark.streaming.router import _idempotent_append

    sink = str(tmp_path / "sink")
    df = spark.range(100).withColumnRenamed("id", "v")

    # Attempt 1 at parallelism 8: promote all parts, then crash BEFORE the
    # marker lands (simulated by deleting it).
    _idempotent_append(df.repartition(8), sink, epoch_id=7)
    os.remove(os.path.join(sink, "_epoch_7_done"))
    promoted = [f for f in os.listdir(sink) if f.startswith("epoch00000007-")]
    assert len(promoted) == 8

    # Retry at parallelism 2 (fewer staging parts than attempt 1 promoted).
    _idempotent_append(df.repartition(2), sink, epoch_id=7)
    files = sorted(f for f in os.listdir(sink) if f.startswith("epoch00000007-"))
    assert len(files) == 2, f"orphaned parts from the crashed attempt: {files}"
    assert spark.read.parquet(sink).count() == 100
    assert os.path.exists(os.path.join(sink, "_epoch_7_done"))

    # A third replay after commit is a no-op (marker short-circuit).
    _idempotent_append(df.repartition(5), sink, epoch_id=7)
    assert spark.read.parquet(sink).count() == 100


def test_idempotent_append_interleaved_epoch_replays(spark, tmp_path):
    """Replays interleaved across epochs (checkpoint rollback: epoch 1
    replayed AFTER epoch 2 committed, then epoch 2 again) must leave
    exactly one copy of every epoch's rows."""
    from flink_real_time_data_warehouse_spark.streaming.router import _idempotent_append

    sink = str(tmp_path / "sink")
    e1 = spark.range(0, 50).withColumnRenamed("id", "v")
    e2 = spark.range(50, 80).withColumnRenamed("id", "v")
    _idempotent_append(e1, sink, epoch_id=1)
    _idempotent_append(e2, sink, epoch_id=2)
    # restart from an older checkpoint: epoch 1 then 2 replay in order
    _idempotent_append(e1, sink, epoch_id=1)
    _idempotent_append(e2, sink, epoch_id=2)
    got = sorted(r["v"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(80))


def test_idempotent_append_sweeps_stale_tmp_markers(spark, tmp_path):
    """A crash between writing `<marker>.tmp.<pid>` and its os.replace
    leaves the tmp file behind; the retry's rollback pass must sweep it
    (otherwise they accumulate forever across crash cycles)."""
    import os

    from flink_real_time_data_warehouse_spark.streaming.router import _idempotent_append

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    with open(os.path.join(sink, "_epoch_7_done.tmp.99999"), "w"):
        pass
    _idempotent_append(spark.range(10).withColumnRenamed("id", "v"), sink, epoch_id=7)
    leftovers = [f for f in os.listdir(sink) if ".tmp." in f]
    assert leftovers == []
    assert os.path.exists(os.path.join(sink, "_epoch_7_done"))
    assert spark.read.parquet(sink).count() == 10


def test_router_lock_refuses_second_live_writer(tmp_path):
    import pytest

    from flink_real_time_data_warehouse_spark.streaming.router import RouterLock, SinkLockError

    sink = str(tmp_path / "sinks")
    a = RouterLock(sink).acquire()
    with pytest.raises(SinkLockError, match="live router"):
        RouterLock(sink).acquire()
    a.check()  # still the owner
    a.release()
    b = RouterLock(sink).acquire()  # free after release
    b.release()


def test_router_lock_steals_stale_and_fences(tmp_path):
    """A lock owned by a dead pid is stale: the next router steals it. The
    fenced-out original then fails check() instead of writing on."""
    import json
    import os
    import subprocess
    import sys

    import pytest

    from flink_real_time_data_warehouse_spark.streaming.router import RouterLock, SinkLockError

    sink = str(tmp_path / "sinks")
    os.makedirs(sink)
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()  # reaped: the pid is dead (and not recycled within the test)
    stale = RouterLock(sink)
    stale.token = "stale-token"
    with open(stale.path, "w") as f:
        f.write(json.dumps({"pid": proc.pid, "token": stale.token}))

    b = RouterLock(sink).acquire()  # steals: owner pid is dead
    b.check()
    with pytest.raises(SinkLockError, match="lost ownership"):
        stale.check()  # the presumed-dead router is fenced out
    b.release()


def test_start_router_lock_lifecycle(spark, tmp_path):
    """start_router refuses a concurrently-owned sink fast, and releases
    the lock when the query terminates so a sequential restart works."""
    import os

    import pandas as pd
    import pytest

    from flink_real_time_data_warehouse_spark.streaming.router import (
        RouterLock,
        SinkLockError,
        start_router,
    )

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame(
        {"source_table": ["order_info"] * 4, "op": ["insert"] * 4,
         "id": [1, 2, 3, 4], "total_amount": [10.0, 20.0, 30.0, 40.0]}
    ).to_parquet(str(src / "b0.parquet"))
    schema = "source_table STRING, op STRING, id LONG, total_amount DOUBLE"
    configs = [RouteConfig("order_info", "insert", "dwd_order_info", ("id", "total_amount"))]
    sinks = str(tmp_path / "sinks")

    def make_stream():
        return spark.readStream.format("parquet").schema(schema).load(str(src))

    held = RouterLock(sinks).acquire()  # another live router owns the sink
    with pytest.raises(SinkLockError, match="live router"):
        start_router(make_stream(), lambda: configs, sinks, str(tmp_path / "ckpt0"))
    held.release()

    h = start_router(make_stream(), lambda: configs, sinks, str(tmp_path / "ckpt1"))
    h.awaitTermination()
    assert not os.path.exists(os.path.join(sinks, RouterLock.FILENAME))  # released
    assert spark.read.parquet(os.path.join(sinks, "dwd_order_info")).count() == 4
    # sequential restart (new checkpoint -> epoch replays) re-acquires fine
    h2 = start_router(make_stream(), lambda: configs, sinks, str(tmp_path / "ckpt2"))
    h2.awaitTermination()
    assert not os.path.exists(os.path.join(sinks, RouterLock.FILENAME))


def _envelope(op: str, _id: int, val: str, seq: int) -> str:
    import json

    payload = {"id": str(_id), "val": val, "seq": str(seq)}
    return json.dumps(
        {
            "database": "gmall",
            "tableName": "order_info",
            "before": payload if op == "delete" else {},
            "after": {} if op == "delete" else payload,
            "type": op,
        }
    )


def test_cdc_initial_snapshot_then_tail(spark, tmp_path):
    """S2 StartupOptions.initial: backfill the existing binlog, then tail —
    changes landing DURING the backfill are neither lost nor applied twice."""
    binlog = tmp_path / "binlog"
    binlog.mkdir()
    (binlog / "f1.jsonl").write_text(
        "\n".join(_envelope("create", i, f"v{i}", 10 + i) for i in range(1, 6))
    )
    (binlog / "f2.jsonl").write_text(
        "\n".join([_envelope("update", 2, "v2b", 20), _envelope("delete", 3, "v3", 21)])
    )

    def project(parsed):
        side = F.when(F.col("type") == "delete", F.col("before")).otherwise(F.col("after"))
        return parsed.select(
            side["id"].cast("long").alias("id"),
            side["val"].alias("val"),
            side["seq"].cast("long").alias("seq"),
            F.col("type").alias("op"),
        )

    def during_backfill():
        # concurrent writer: lands between snapshot apply and tail start
        (binlog / "f3.jsonl").write_text(
            "\n".join([_envelope("create", 6, "v6", 30), _envelope("update", 1, "v1b", 31)])
        )

    store = DimStore(spark, str(tmp_path / "dims"))
    boundary = cdc_initial_load(
        spark, str(binlog), project, store, "order_info",
        checkpoint=str(tmp_path / "ckpt"),
        on_snapshot_applied=during_backfill,
    )
    assert boundary is not None

    snap = {r["id"]: r["val"] for r in store.snapshot("order_info").collect()}
    # exactly-once in effect: 3 deleted, 1+2 updated, 6 inserted mid-backfill
    assert snap == {1: "v1b", 2: "v2b", 4: "v4", 5: "v5", 6: "v6"}
    assert store.snapshot("order_info").count() == 5  # no duplicate rows
