"""TxLog as a streaming SOURCE (storage/txlog_source.py): follow-the-log
micro-batches over the manifest range, typed CDF replay, backlog pacing,
checkpoint-resumed incrementality, and the exactness guard rails
(rewrites and truncated ranges fail the stream, never silently skip)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.storage import TxLog
from flink_real_time_data_warehouse_spark.storage.txlog_source import (
    register_txlog_source,
)


def _run_available_now(src_df, work: str, name: str, ckpt: str):
    q = (
        src_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _kv_table(spark, tmp_path, rows_per_commit=((0, 5), (5, 8))) -> TxLog:
    log = TxLog(str(tmp_path / "t"))
    for lo, hi in rows_per_commit:
        log.append(
            spark.createDataFrame(
                [(k, k * 10) for k in range(lo, hi)], "k long, v long"
            ).coalesce(1),
            stats_cols=["k"],
        )
    return log


def test_source_serves_history_then_resumes_incrementally(tmp_path, spark):
    """Full history on first start; a checkpoint-resumed restart serves
    ONLY commits that landed since (the follow-the-log contract). The
    sink is foreachBatch — the memory sink can't recover a checkpoint."""
    log = _kv_table(spark, tmp_path)
    register_txlog_source(spark)
    ck = str(tmp_path / "w" / "ck")

    def run_once() -> list:
        seen: list = []
        src = spark.readStream.format("txlog").option("path", log.path).load()
        q = (
            src.writeStream.foreachBatch(
                lambda df, _e: seen.extend(
                    (r["k"], r["_commit_version"]) for r in df.collect()
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(seen)

    assert run_once() == [(k, k // 5) for k in range(8)]
    # two more commits land; the SAME checkpoint resumes past them only
    log.append(
        spark.createDataFrame([(100, 1)], "k long, v long").coalesce(1),
        stats_cols=["k"],
    )
    log.append(
        spark.createDataFrame([(200, 2)], "k long, v long").coalesce(1),
        stats_cols=["k"],
    )
    assert run_once() == [(100, 2), (200, 3)]


def test_source_cdf_mode_types_changes(tmp_path, spark):
    """cdf=true serves appends as 'insert' and apply_cdc commits from
    their typed sidecar — upsert payload, delete as key + NULL."""
    log = _kv_table(spark, tmp_path)
    ch = spark.createDataFrame(
        [(1, -1, "u"), (3, None, "d")], "k long, v long, op string"
    )
    log.apply_cdc(spark, ch, "k")
    register_txlog_source(spark)
    src = (
        spark.readStream.format("txlog")
        .option("path", log.path)
        .option("cdf", "true")
        .load()
    )
    _run_available_now(src, str(tmp_path / "w"), "cdf_out", "ck")
    rows = {
        (r["k"], r["_change_type"]): (r["v"], r["_commit_version"])
        for r in spark.sql("select * from cdf_out").collect()
    }
    assert rows[(1, "upsert")] == (-1, 2)
    assert rows[(3, "delete")] == (None, 2)
    assert rows[(0, "insert")] == (0, 0) and len(rows) == 8 + 2
    # non-cdf mode refuses the cdc commit instead of serving it wrong
    src_plain = spark.readStream.format("txlog").option("path", log.path).load()
    q = (
        src_plain.writeStream.format("memory")
        .queryName("plain_out")
        .option("checkpointLocation", str(tmp_path / "w" / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="cdc"):
        q.awaitTermination()


def test_source_paces_backlog_into_bounded_batches(tmp_path, spark):
    """max_versions_per_batch bounds each trigger (maxFilesPerTrigger
    analog): a 4-commit backlog replays as ceil(4/2)=2 non-empty batches.
    (Spark runs Python sources' availableNow as a single batch, so the
    pacing path needs a running trigger to observe.)"""
    log = _kv_table(spark, tmp_path, rows_per_commit=((0, 2), (2, 4), (4, 6), (6, 8)))
    register_txlog_source(spark)
    src = (
        spark.readStream.format("txlog")
        .option("path", log.path)
        .option("max_versions_per_batch", "2")
        .load()
    )
    q = (
        src.writeStream.format("memory")
        .queryName("paced")
        .option("checkpointLocation", str(tmp_path / "w" / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 40
        batches: list = []
        while time.time() < deadline:
            batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if sum(p["numInputRows"] for p in batches) >= 8:
                break
            time.sleep(0.3)
        assert sorted(
            r["k"] for r in spark.sql("select k from paced").collect()
        ) == list(range(8))
        assert len(batches) == 2
        assert all(p["numInputRows"] == 4 for p in batches)  # 2 commits x 2 rows
    finally:
        q.stop()


def test_source_follows_live_appends(tmp_path, spark):
    """A continuously-running stream picks up commits that land AFTER it
    started — the table-as-topic behavior (ProductStatsApp.java:61-77's
    topic chaining, storage edition)."""
    log = _kv_table(spark, tmp_path, rows_per_commit=((0, 1),))
    register_txlog_source(spark)
    src = spark.readStream.format("txlog").option("path", log.path).load()
    q = (
        src.writeStream.format("memory")
        .queryName("live")
        .option("checkpointLocation", str(tmp_path / "w" / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        log.append(
            spark.createDataFrame([(50, 5)], "k long, v long").coalesce(1),
            stats_cols=["k"],
        )
        deadline = time.time() + 30
        while time.time() < deadline:
            got = sorted(r["k"] for r in spark.sql("select k from live").collect())
            if got == [0, 50]:
                break
            time.sleep(0.3)
        assert got == [0, 50]
    finally:
        q.stop()


def test_source_raises_on_rewrite_and_truncation(tmp_path, spark):
    """Exactness guards: a physical rewrite commit (merge) in range fails
    the stream; so does a range whose manifests were truncated."""
    log = _kv_table(spark, tmp_path)
    log.merge(spark, spark.createDataFrame([(1, -1)], "k long, v long"), "k")
    register_txlog_source(spark)
    src = spark.readStream.format("txlog").option("path", log.path).load()
    q = (
        src.writeStream.format("memory")
        .queryName("rw_out")
        .option("checkpointLocation", str(tmp_path / "w" / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="merge"):
        q.awaitTermination()
    # truncation: fold + truncate, then ask for history from -1
    log2 = _kv_table(spark, tmp_path / "t2")
    log2.checkpoint()
    log2.truncate_log()
    src2 = spark.readStream.format("txlog").option("path", log2.path).load()
    q2 = (
        src2.writeStream.format("memory")
        .queryName("tr_out")
        .option("checkpointLocation", str(tmp_path / "w" / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="truncated"):
        q2.awaitTermination()


def test_source_skips_metadata_only_and_reattaches_partitions(tmp_path, spark):
    """Constraint commits stream zero rows; Hive-partitioned appends
    re-attach the partition column from the manifest, typed."""
    log = TxLog(str(tmp_path / "t"))
    log.append(
        spark.createDataFrame(
            [("a", 1), ("b", 2)], "p string, k long"
        ).repartition(2, "p"),
        partition_by="p",
        stats_cols=["k"],
    )
    log.add_constraint("pos", "k > 0")  # metadata-only commit mid-stream
    log.append(
        spark.createDataFrame([("c", 3)], "p string, k long").coalesce(1),
        partition_by="p",
        stats_cols=["k"],
    )
    register_txlog_source(spark)
    src = spark.readStream.format("txlog").option("path", log.path).load()
    _run_available_now(src, str(tmp_path / "w"), "parts_out", "ck")
    got = {
        r["p"]: (r["k"], r["_commit_version"])
        for r in spark.sql("select * from parts_out").collect()
    }
    assert got == {"a": (1, 0), "b": (2, 0), "c": (3, 2)}


def test_source_replay_is_deterministic(tmp_path, spark):
    """Two independent full replays produce identical rows — the property
    that makes a checkpoint-recovered batch byte-identical."""
    log = _kv_table(spark, tmp_path)
    log.apply_cdc(
        spark,
        spark.createDataFrame([(1, -1, "u")], "k long, v long, op string"),
        "k",
    )
    register_txlog_source(spark)
    outs = []
    for ck in ("ck1", "ck2"):
        src = (
            spark.readStream.format("txlog")
            .option("path", log.path)
            .option("cdf", "true")
            .load()
        )
        _run_available_now(src, str(tmp_path / "w"), f"det_{ck}", ck)
        outs.append(
            sorted(
                map(tuple, spark.sql(f"select * from det_{ck}").collect())
            )
        )
    assert outs[0] == outs[1] and len(outs[0]) == 9


def test_source_pacing_floor_survives_restart(tmp_path, spark):
    """Paced restarts never regress or stall: availableNow runs as a
    single paced batch, so a 4-commit backlog with step 2 drains over two
    checkpoint-resumed runs — the second run resumes ABOVE the first
    run's committed offset (the persisted pacing floor; without it the
    post-restart latestOffset would re-derive a lower offset and the
    engine would stall or re-serve committed versions)."""
    log = _kv_table(spark, tmp_path, rows_per_commit=((0, 2), (2, 4), (4, 6), (6, 8)))
    register_txlog_source(spark)
    ck = str(tmp_path / "w" / "ck")
    seen: list = []

    def run_once():
        src = (
            spark.readStream.format("txlog")
            .option("path", log.path)
            .option("max_versions_per_batch", "2")
            .load()
        )
        q = (
            src.writeStream.foreachBatch(
                lambda df, _e: seen.append(sorted(r["k"] for r in df.collect()))
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert seen == [[0, 1, 2, 3]]  # paced: first 2 of 4 commits
    assert os.path.exists(os.path.join(log.path, "_source", "default.json"))
    run_once()
    assert seen == [[0, 1, 2, 3], [4, 5, 6, 7]]  # resumed above the floor


def test_source_null_fills_pre_evolution_files(tmp_path, spark):
    """Additive schema evolution: commits written BEFORE a column existed
    stream back with that column null-filled (the source schema is the
    table's LATEST committed schema), newer commits carry the value."""
    log = TxLog(str(tmp_path / "t"))
    log.append(
        spark.createDataFrame([(1,)], "k long").coalesce(1), stats_cols=["k"]
    )
    log.append(
        spark.createDataFrame([(2, "x")], "k long, extra string").coalesce(1),
        stats_cols=["k"],
    )
    register_txlog_source(spark)
    src = spark.readStream.format("txlog").option("path", log.path).load()
    assert "extra" in src.columns
    _run_available_now(src, str(tmp_path / "w"), "evo_out", "ck")
    got = {
        r["k"]: (r["extra"], r["_commit_version"])
        for r in spark.sql("select * from evo_out").collect()
    }
    assert got == {1: (None, 0), 2: ("x", 1)}


def test_source_skip_change_commits_and_starting_timestamp(tmp_path, spark):
    """Delta-parity options: skip_change_commits serves inserts only and
    silently passes over a merge commit (instead of failing the stream);
    starting_timestamp resolves to a version floor against manifest ts."""
    log = _kv_table(spark, tmp_path)  # v0: k 0-4, v1: k 5-7
    log.merge(spark, spark.createDataFrame([(1, -1)], "k long, v long"), "k")  # v2
    log.append(
        spark.createDataFrame([(50, 5)], "k long, v long").coalesce(1),
        stats_cols=["k"],
    )  # v3
    register_txlog_source(spark)
    src = (
        spark.readStream.format("txlog")
        .option("path", log.path)
        .option("skip_change_commits", "true")
        .load()
    )
    _run_available_now(src, str(tmp_path / "w"), "skip_out", "ck")
    got = sorted(r["k"] for r in spark.sql("select k from skip_out").collect())
    # v2's rewrite is skipped: only the append commits' rows stream
    assert got == list(range(8)) + [50]
    # starting_timestamp after v3's manifest ts: nothing historical served
    import json as _json
    import os as _os

    last_ts = max(
        _json.load(open(_os.path.join(log.log_path, f)))["ts"]
        for f in _os.listdir(log.log_path)
        if f.endswith(".json") and not f.endswith("checkpoint.json")
    )
    src2 = (
        spark.readStream.format("txlog")
        .option("path", log.path)
        .option("starting_timestamp", str(last_ts + 1))
        .load()
    )
    _run_available_now(src2, str(tmp_path / "w"), "ts_out", "ck2")
    assert spark.sql("select count(*) c from ts_out").first()["c"] == 0
    # ... and a timestamp before v3's ts serves exactly v3
    src3 = (
        spark.readStream.format("txlog")
        .option("path", log.path)
        .option("starting_timestamp", str(last_ts))
        .option("skip_change_commits", "true")
        .load()
    )
    _run_available_now(src3, str(tmp_path / "w"), "ts3_out", "ck3")
    assert sorted(r["k"] for r in spark.sql("select k from ts3_out").collect()) == [50]


def test_source_event_time_watermark_window_agg(tmp_path, spark):
    """Event-time semantics compose through the Python source: a TIMESTAMP
    column survives the Arrow hand-off, a watermarked tumbling window agg in
    append mode runs over it, and the watermark persists in the checkpoint
    across a restart (the Python micro-batch API falls back to single-batch
    execution under availableNow, so finalization happens on the NEXT run's
    batch, whose starting watermark is the previous run's final one)."""
    from datetime import datetime

    rows1 = [(k, datetime(2024, 1, 1, 0, 0, k)) for k in range(0, 50, 10)]
    rows2 = [(k, datetime(2024, 1, 1, 0, 2, k % 60)) for k in range(100, 160, 10)]
    rows3 = [(k, datetime(2024, 1, 1, 0, 4, 0)) for k in (200,)]
    log = TxLog(str(tmp_path / "t"))
    for rows in (rows1, rows2):
        log.append(
            spark.createDataFrame(rows, "k long, ts timestamp").coalesce(1),
            stats_cols=["k"],
        )
    register_txlog_source(spark)
    ck = str(tmp_path / "w" / "ck")
    seen: list = []

    def run_once(name: str):
        src = spark.readStream.format("txlog").option("path", log.path).load()
        assert dict(src.dtypes)["ts"] == "timestamp"
        agg = (
            src.withWatermark("ts", "10 seconds")
            .groupBy(F.window("ts", "1 minute").alias("win"))
            .agg(F.count("*").alias("ct"))
            .select(F.col("win.start").cast("string").alias("stt"), "ct")
        )
        q = (
            agg.writeStream.foreachBatch(
                lambda df, _e: seen.extend(
                    (r["stt"], r["ct"]) for r in df.collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once("wm1")
    # a new commit lands; the restarted stream opens with the persisted
    # watermark 00:02:50 - 10s = 00:02:40 and finalizes minute 0 (window
    # end 00:01:00 <= wm); minute 2's end 00:03:00 is still open
    log.append(
        spark.createDataFrame(rows3, "k long, ts timestamp").coalesce(1),
        stats_cols=["k"],
    )
    run_once("wm2")
    assert ("2024-01-01 00:00:00", 5) in seen
    starts = [s for s, _ in seen]
    assert starts.count("2024-01-01 00:00:00") == 1  # finalized exactly once
    assert "2024-01-01 00:02:00" not in starts  # still open
    assert "2024-01-01 00:04:00" not in starts

def test_source_byte_pacing_splits_one_commit_across_triggers(tmp_path, spark):
    """max_bytes_per_batch (Delta's maxBytesPerTrigger, r7 verdict task
    7): ONE commit whose files exceed the budget splits across triggers
    at FILE granularity via the (version, index) sub-version offset —
    each availableNow run drains exactly one more file, the persisted
    pacing floor keeps restarts monotone (no re-serving, no skipping),
    and the union of all paced batches is the complete commit."""
    log = TxLog(str(tmp_path / "t"))
    log.append(
        spark.createDataFrame([(k, k) for k in range(8)], "k long, v long")
        .repartition(4),
        stats_cols=["k"],
    )
    import pyarrow.parquet as pq

    n_files = len(log.state().files)
    n_nonempty = sum(
        1 for n in log.state().files
        if pq.read_metadata(os.path.join(log.data_path, n)).num_rows > 0
    )
    assert n_nonempty > 1  # the premise: one commit, several data files
    register_txlog_source(spark)
    ck = str(tmp_path / "w" / "ck")
    seen: list = []

    def run_once():
        src = (
            spark.readStream.format("txlog")
            .option("path", log.path)
            .option("max_bytes_per_batch", "1")  # < any file: 1 file/trigger
            .load()
        )
        q = (
            src.writeStream.foreachBatch(
                lambda df, _e: seen.append(sorted(r["k"] for r in df.collect()))
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for _ in range(n_files + 2):  # extra runs must come back empty
        run_once()
    got = [b for b in seen if b]
    assert len(got) == n_nonempty, f"expected {n_nonempty} paced batches: {seen}"
    assert sorted(k for b in got for k in b) == list(range(8))
    floor = json.loads(
        open(os.path.join(log.path, "_source", "default.json")).read()
    )
    assert (floor["version"], floor["index"]) == (0, -1), "floor = fully served"


def test_source_byte_pacing_spans_versions_and_respects_version_cap(tmp_path, spark):
    """Byte pacing composes with max_versions_per_batch: a byte budget
    wide enough for the whole backlog still stops at the version cap,
    and restarts resume exactly above the committed floor."""
    log = _kv_table(
        spark, tmp_path, rows_per_commit=((0, 2), (2, 4), (4, 6), (6, 8))
    )
    register_txlog_source(spark)
    ck = str(tmp_path / "w" / "ckc")
    seen: list = []

    def run_once():
        src = (
            spark.readStream.format("txlog")
            .option("path", log.path)
            .option("max_versions_per_batch", "2")
            .option("max_bytes_per_batch", str(1 << 30))
            .option("pacing_id", "combo")
            .load()
        )
        q = (
            src.writeStream.foreachBatch(
                lambda df, _e: seen.append(sorted(r["k"] for r in df.collect()))
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert seen == [[0, 1, 2, 3]]  # version cap bites despite the byte room
    run_once()
    assert seen == [[0, 1, 2, 3], [4, 5, 6, 7]]


def test_batch_reader_snapshot_time_travel_and_dv(tmp_path, spark):
    """spark.read.format('txlog') — the batch half of the data source
    (Delta tables are batch-readable alongside their stream): current
    snapshot drops DV-erased rows, version_as_of time-travels, partition
    values re-attach, a rename resolves through the mapping, and every
    row carries _commit_version = the snapshot version served."""
    log = TxLog(str(tmp_path / "t"))
    log.append(
        spark.createDataFrame(
            [(k, "a" if k % 2 == 0 else "b") for k in range(10)],
            "k long, p string",
        ).repartition(1),
        partition_by="p",
        stats_cols=["k"],
    )
    v1 = log.state().version
    log.delete_to_dv(spark, "k", 3, 5)
    log.rename_column("k", "key")
    register_txlog_source(spark)
    df = spark.read.format("txlog").option("path", log.path).load()
    rows = sorted((r["key"], r["p"]) for r in df.collect())
    assert rows == [(k, "a" if k % 2 == 0 else "b") for k in (0, 1, 2, 6, 7, 8, 9)]
    assert {r["_commit_version"] for r in df.collect()} == {log.state().version}
    tt = (
        spark.read.format("txlog")
        .option("path", log.path)
        .option("version_as_of", str(v1))
        .load()
    )
    assert sorted(r["k"] for r in tt.collect()) == list(range(10))
    assert "key" not in tt.columns  # pre-rename schema served as-of v1


def test_batch_writer_append_overwrite_stats_and_refusals(tmp_path, spark):
    """df.write.format('txlog') — the write leg of the data source: each
    task stages one parquet, the driver commit is one transactional
    append (overwrite => replace); stats_cols records footer [min,max]
    that file-level DELETE classification then uses; contract-bearing
    tables (identity here) are refused with the staged files cleaned."""
    register_txlog_source(spark)
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, k * 10) for k in range(20)], "k long, v long"
    ).repartitionByRange(3, "k")  # contiguous per-file key ranges
    df.write.format("txlog").option("path", path).option(
        "stats_cols", "k"
    ).mode("append").save()
    log = TxLog(path)
    st = log.state()
    assert st.version == 0 and len(st.files) == 3
    assert all("k" in s for s in st.stats.values()), "footer stats missing"
    # the writer's stats drive file-level pruning: a bare-range delete
    # covering one file's whole range drops it as pure metadata
    lows = sorted(s["k"][0] for s in st.stats.values())
    before = set(st.files)
    log.delete(spark, "k", 0, lows[1] - 1)  # exactly file 1's range
    dropped = before - set(log.state().files)
    assert dropped and log.history()[0]["n_added"] == 0, (
        "bare-range delete must be metadata-only against writer stats"
    )
    # overwrite => replace; roundtrip through the batch reader
    df.where("k >= 15").write.format("txlog").option("path", path).mode(
        "overwrite"
    ).save()
    got = spark.read.format("txlog").option("path", path).load()
    assert sorted(r["k"] for r in got.collect()) == [15, 16, 17, 18, 19]
    # identity table refused, staged files cleaned
    p2 = str(tmp_path / "t2")
    TxLog(p2).add_identity_column("sid")
    with pytest.raises(Exception, match="IDENTITY"):
        df.write.format("txlog").option("path", p2).mode("append").save()
    data2 = os.path.join(p2, "data")
    assert not os.path.isdir(data2) or os.listdir(data2) == []


def test_stream_writer_exactly_once_ledger(tmp_path, spark):
    """writeStream.format('txlog'): each micro-batch commits once under
    (app_id, batchId); checkpoint restarts and fresh-checkpoint replays
    are swallowed by the ledger; app_id is required; two sinks with
    distinct app_ids share one table without collisions."""
    register_txlog_source(spark)
    src = _kv_table(spark, tmp_path)
    sink_path = str(tmp_path / "sink")

    def run(ck: str, app: str) -> None:
        q = (
            spark.readStream.format("txlog")
            .option("path", src.path)
            .load()
            .drop("_commit_version")
            .writeStream.format("txlog")
            .option("path", sink_path)
            .option("app_id", app)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ck1", "a")
    sink = TxLog(sink_path)
    assert sorted(r["k"] for r in sink.snapshot(spark).collect()) == list(range(8))
    v = sink.state().version
    run("ck1", "a")  # restart: nothing new
    run("ck_fresh", "a")  # fresh checkpoint: ledger-swallowed
    assert sink.state().version == v
    # a second app_id is its own ledger lane: its epoch 0 COMMITS
    run("ck2", "b")
    assert sink.snapshot(spark).count() == 16
    assert sink.state().apps["txlog_sink:a"] == 0
    assert sink.state().apps["txlog_sink:b"] == 0
    # app_id is mandatory
    with pytest.raises(Exception, match="app_id"):
        q = (
            spark.readStream.format("txlog")
            .option("path", src.path)
            .load()
            .writeStream.format("txlog")
            .option("path", str(tmp_path / "sink2"))
            .option("checkpointLocation", str(tmp_path / "ck3"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
