"""Multi-writer transaction log (storage/txlog.py): commit arbitration,
snapshot isolation, idempotent epoch commits, checkpoint truncation,
vacuum. The commit layer is pure filesystem logic, so the race tests run
many concurrent writers through the REAL protocol (staged pyarrow files +
atomic link claims); Spark is used where DataFrames enter or leave."""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flink_real_time_data_warehouse_spark.storage import TxConflictError, TxLog


def _stage_rows(log: TxLog, ids: list[int]) -> list[str]:
    """Stage one parquet file holding `ids` (bypassing Spark for speed)."""
    name = f"t-{ids[0]}-{os.urandom(4).hex}.parquet"
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), os.path.join(log.data_path, name))
    return [name]


_SCHEMA_JSON = '{"fields":[{"metadata":{},"name":"id","nullable":true,"type":"long"}],"type":"struct"}'


def test_concurrent_appends_all_commit_exactly_once(tmp_path):
    """W writers x C commits racing on one table: every commit wins a
    distinct version, the final state contains every row exactly once."""
    log = TxLog(str(tmp_path / "t"))
    W, C = 8, 5

    def writer(w: int) -> list[int]:
        versions = []
        for c in range(C):
            ids = [w * 1000 + c]
            versions.append(
                log.commit_files(_stage_rows(log, ids), schema_json=_SCHEMA_JSON)
            )
        return versions

    with ThreadPoolExecutor(max_workers=W) as ex:
        all_versions = [v for vs in ex.map(writer, range(W)) for v in vs]

    assert sorted(all_versions) == list(range(W * C)), "each commit wins a distinct version"
    st = log.state()
    assert st.version == W * C - 1
    assert len(st.files) == W * C
    # every staged row is in exactly one committed file
    ids = []
    for n in st.files:
        ids.extend(pq.read_table(os.path.join(log.data_path, n)).column("id").to_pylist())
    assert sorted(ids) == sorted(w * 1000 + c for w in range(W) for c in range(C))


def test_replace_conflicts_with_concurrent_commit(tmp_path):
    """Serializable REPLACE: deriving from v0, a concurrent append moves
    the table to v1, so the replace must fail AND clean its staged file."""
    log = TxLog(str(tmp_path / "t"))
    log.commit_files(_stage_rows(log, [1]), schema_json=_SCHEMA_JSON)  # v0
    base = log.state().version
    staged = _stage_rows(log, [99])
    log.commit_files(_stage_rows(log, [2]), schema_json=_SCHEMA_JSON)  # concurrent v1
    with pytest.raises(TxConflictError):
        log.commit_files(
            staged, op="replace", schema_json=_SCHEMA_JSON, expected_version=base
        )
    assert not os.path.exists(os.path.join(log.data_path, staged[0])), "staged file cleaned"
    # retry from the new state succeeds and drops the old files
    staged2 = _stage_rows(log, [99])
    v = log.commit_files(
        staged2, op="replace", schema_json=_SCHEMA_JSON, expected_version=log.state().version
    )
    st = log.state()
    assert st.version == v and list(st.files) == staged2


def test_epoch_commit_idempotent_under_replay(tmp_path):
    """(app_id, app_version) replay: the second commit of the same epoch is
    skipped, its staged file is deleted, and rows are not duplicated —
    the foreachBatch txnAppId/txnVersion contract."""
    log = TxLog(str(tmp_path / "t"))
    v1 = log.commit_files(
        _stage_rows(log, [1]), schema_json=_SCHEMA_JSON, app_id="ing", app_version=0
    )
    replay = _stage_rows(log, [1])
    v2 = log.commit_files(replay, schema_json=_SCHEMA_JSON, app_id="ing", app_version=0)
    assert v2 == v1, "replayed epoch returns current version, commits nothing"
    assert len(log.state().files) == 1
    assert not os.path.exists(os.path.join(log.data_path, replay[0]))
    # a LATER epoch still commits
    v3 = log.commit_files(
        _stage_rows(log, [2]), schema_json=_SCHEMA_JSON, app_id="ing", app_version=1
    )
    assert v3 == v1 + 1 and log.state().apps["ing"] == 1


def test_crash_artifacts_invisible(tmp_path):
    """A crash mid-stage (data file, no manifest) or mid-claim (tmp
    manifest, never linked) must be invisible to state/snapshot."""
    log = TxLog(str(tmp_path / "t"))
    log.commit_files(_stage_rows(log, [1]), schema_json=_SCHEMA_JSON)
    _stage_rows(log, [666])  # staged, never committed
    with open(os.path.join(log.log_path, ".tmp-crashed"), "w") as f:
        f.write(json.dumps({"op": "append", "adds": ["ghost.parquet"]}))
    st = log.state()
    assert st.version == 0 and len(st.files) == 1
    # vacuum(0) collects the orphan, leaves the committed file
    assert log.vacuum(grace_seconds=0.0) == 1
    assert len(os.listdir(log.data_path)) == 1


def test_checkpoint_truncation_and_snapshot(tmp_path, spark):
    """After checkpoint() + truncate_log(), old manifests are GONE yet
    state and snapshot reads are unchanged; commits after the checkpoint
    replay on top of it."""
    log = TxLog(str(tmp_path / "t"))
    df = spark.range(0, 10).selectExpr("id")
    log.append(df)
    log.append(spark.range(10, 20).selectExpr("id"))
    cp_v = log.checkpoint()
    assert log.truncate_log() == cp_v + 1  # manifests 0..cp_v removed
    log.append(spark.range(20, 25).selectExpr("id"))
    st = log.state()
    assert st.version == cp_v + 1
    got = sorted(r["id"] for r in log.snapshot(spark).collect())
    assert got == list(range(25))


def test_snapshot_isolation(tmp_path, spark):
    """A snapshot taken at version v keeps reading v's files even after
    later commits (files are immutable; the listing is fixed once)."""
    log = TxLog(str(tmp_path / "t"))
    log.append(spark.range(0, 5).selectExpr("id"))
    snap = log.snapshot(spark)
    log.append(spark.range(5, 9).selectExpr("id"))
    assert sorted(r["id"] for r in snap.collect()) == list(range(5))
    assert sorted(r["id"] for r in log.snapshot(spark).collect()) == list(range(9))


def test_append_idempotent_via_dataframe_api(tmp_path, spark):
    """DataFrame-level epoch append: replaying (app, epoch) is a no-op and
    the snapshot holds one copy."""
    log = TxLog(str(tmp_path / "t"))
    df = spark.range(0, 7).selectExpr("id")
    v1 = log.append(df, app_id="sink", app_version=3)
    v2 = log.append(df, app_id="sink", app_version=3)
    assert v1 == v2 == 0
    assert sorted(r["id"] for r in log.snapshot(spark).collect()) == list(range(7))


def test_two_concurrent_streaming_sinks_one_table(tmp_path, spark):
    """THE multi-writer payoff: two Structured Streaming sinks (distinct
    app_ids, disjoint slices) run CONCURRENTLY into one TxLog table — the
    situation RouterLock exists to refuse for the marker sink. Both
    succeed, commits interleave via the version-claim protocol, and the
    final snapshot holds every row exactly once."""
    from flink_real_time_data_warehouse_spark.sources.streams import (
        stream_dir,
        write_epoch_files,
    )
    from flink_real_time_data_warehouse_spark.streaming.ingest import start_txlog_sink

    base = str(tmp_path)
    df = spark.range(0, 60).selectExpr("id")
    a = df.where("id % 2 = 0")
    b = df.where("id % 2 = 1")
    sa = write_epoch_files(a, "id", 3, f"{base}/sa", f"{base}/wa")
    sb = write_epoch_files(b, "id", 3, f"{base}/sb", f"{base}/wb")
    log = TxLog(f"{base}/table")
    qa = start_txlog_sink(
        stream_dir(spark, sa, "id long", max_files_per_trigger=1),
        log, f"{base}/cka", app_id="sink-a",
    )
    qb = start_txlog_sink(
        stream_dir(spark, sb, "id long", max_files_per_trigger=1),
        log, f"{base}/ckb", app_id="sink-b",
    )
    qa.awaitTermination()
    qb.awaitTermination()
    st = log.state()
    assert st.apps == {"sink-a": 2, "sink-b": 2}, st.apps
    assert st.version == 5, "six interleaved commits, each a distinct version"
    got = sorted(r["id"] for r in log.snapshot(spark).collect())
    assert got == list(range(60))


def test_merge_upsert_semantics(tmp_path, spark):
    """Type-1 MERGE through the log: updates win on key equality, new keys
    insert, untouched keys survive; each merge is one REPLACE version."""
    log = TxLog(str(tmp_path / "t"))
    log.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    v = log.merge(spark, spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), "k")
    got = {r["k"]: r["v"] for r in log.snapshot(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"} and v == 1


def test_concurrent_merges_serialize_without_lock(tmp_path, spark):
    """Lock-free OCC: four mergers race on one table (disjoint keys). The
    REPLACE conflicts force losers to re-derive and retry; every update
    must land exactly once."""
    log = TxLog(str(tmp_path / "t"))
    log.append(spark.createDataFrame([(0, -1)], "k long, v long"))

    def do_merge(w: int) -> int:
        df = spark.createDataFrame([(100 + w, w)], "k long, v long")
        return log.merge(spark, df, "k", max_retries=30)

    with ThreadPoolExecutor(max_workers=4) as ex:
        versions = list(ex.map(do_merge, range(4)))
    assert sorted(versions) == [1, 2, 3, 4], "each merge serialized to its own version"
    got = {r["k"]: r["v"] for r in log.snapshot(spark).collect()}
    assert got == {0: -1, 100: 0, 101: 1, 102: 2, 103: 3}


def test_optimize_disjoint_file_conflict_rule(tmp_path):
    """Delta's OPTIMIZE conflict semantics at the commit layer: removing
    live files succeeds even after an interleaved append (disjoint files
    never conflict); removing a file that is no longer live conflicts."""
    log = TxLog(str(tmp_path / "t"))
    f1 = _stage_rows(log, [1]); log.commit_files(f1, schema_json=_SCHEMA_JSON)
    f2 = _stage_rows(log, [2]); log.commit_files(f2, schema_json=_SCHEMA_JSON)
    f3 = _stage_rows(log, [3]); log.commit_files(f3, schema_json=_SCHEMA_JSON)  # interleaved append
    packed = _stage_rows(log, [1, 2])
    v = log.commit_files(packed, op="optimize", schema_json=_SCHEMA_JSON, removes=f1 + f2)
    st = log.state()
    assert v == 3 and sorted(st.files) == sorted(packed + f3)
    # f1 is gone now: a second remover of it must conflict and clean up
    ghost = _stage_rows(log, [9])
    with pytest.raises(TxConflictError):
        log.commit_files(ghost, op="optimize", schema_json=_SCHEMA_JSON, removes=f1)
    assert not os.path.exists(os.path.join(log.data_path, ghost[0]))


def test_optimize_packs_files_rows_unchanged(tmp_path, spark):
    """End-to-end OPTIMIZE: six single-file appends bin-pack to <=2 files,
    rows unchanged; vacuum collects the replaced files; a later append
    still works."""
    log = TxLog(str(tmp_path / "t"))
    for i in range(6):
        log.append(spark.createDataFrame([(i,)], "id long").coalesce(1))
    assert len(log.state().files) == 6
    v = log.optimize(spark, max_files=2)
    st = log.state()
    assert v == 6 and len(st.files) <= 2
    assert sorted(r["id"] for r in log.snapshot(spark).collect()) == list(range(6))
    assert log.vacuum(grace_seconds=0.0) == 6, "six replaced small files collected"
    log.append(spark.createDataFrame([(6,)], "id long"))
    assert sorted(r["id"] for r in log.snapshot(spark).collect()) == list(range(7))


def test_stats_based_file_skipping(tmp_path, spark):
    """Manifest-level data skipping: appends committed with stats_cols
    record [min,max] per file from the parquet footers; a pruned snapshot
    lists ONLY intersecting files (checked via inputFiles), survives
    checkpoint/truncate, and files without stats are conservatively kept."""
    log = TxLog(str(tmp_path / "t"))
    for lo in (0, 100, 200):
        log.append(
            spark.range(lo, lo + 50).selectExpr("id").coalesce(1), stats_cols=["id"]
        )
    log.append(spark.createDataFrame([(999,)], "id long").coalesce(1))  # NO stats: always kept
    full = log.snapshot(spark)
    assert len(full.inputFiles()) == 4
    pruned = log.snapshot(spark, prune=("id", 110, 120))
    assert len(pruned.inputFiles()) == 2, "one matching stats file + the stats-less file"
    got = sorted(r["id"] for r in pruned.where("id BETWEEN 110 AND 120").collect())
    assert got == list(range(110, 121))
    # stats survive checkpoint + log truncation
    log.checkpoint()
    log.truncate_log()
    assert len(log.snapshot(spark, prune=("id", 0, 10)).inputFiles()) == 2
    # disjoint range: only the stats-less file remains
    assert len(log.snapshot(spark, prune=("id", 500, 600)).inputFiles()) == 1
