"""SignatureIndex (persisted incremental-dedup index) + within-batch dedup.

Covers the 100 TB ingest contract: the index side of every probe comes
from storage (append-only digest/band tables, atomic batch markers), and
sequential ingest batches through the stored index accept/reject exactly
like the derive-in-query form over the equivalent grown corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.datapipe.dedup import (
    incremental_dedup,
    incremental_dedup_indexed,
)
from flink_real_time_data_warehouse_spark.datapipe.signature_index import SignatureIndex
from flink_real_time_data_warehouse_spark.tables import table

from .conftest import TEST_SF_DIR


def _verdicts(df) -> dict[int, str]:
    return {r["doc"]: r["verdict"] for r in df.collect()}


def test_within_batch_dedup_min_id_keeper(spark):
    docs = spark.createDataFrame(
        [
            (1, "the standing index document with several tokens inside"),
            (4, "a brand new document that repeats itself across the batch"),
            (8, "a brand new document that repeats itself across the batch"),
            (12, "the standing index document with several tokens inside"),
        ],
        "doc_id long, text string",
    )
    index = docs.where(F.col("doc_id") == 1)
    new = docs.where(F.col("doc_id") > 1)

    # default: new-vs-index only — same-batch copies both keep
    v = _verdicts(incremental_dedup(index, new, "doc_id", "text"))
    assert v == {4: "keep", 8: "keep", 12: "exact"}

    # within_batch: the min-id copy keeps, the later copy is exact
    v = _verdicts(incremental_dedup(index, new, "doc_id", "text", within_batch=True))
    assert v == {4: "keep", 8: "exact", 12: "exact"}


def test_empty_index_probe(spark, tmp_path):
    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    assert idx.is_empty()
    new = spark.createDataFrame(
        [(1, "some document with enough tokens to shingle")],
        "doc_id long, text string",
    )
    v = _verdicts(incremental_dedup_indexed(idx, new, "doc_id", "text"))
    assert v == {1: "keep"}


def test_append_is_atomic_per_batch(spark, tmp_path):
    """Both probe tables land in ONE TxLog commit per batch: a crash can
    never expose digests without bands. Staged-but-uncommitted data files
    are invisible to every probe; replaying the committed label is a
    no-op (the log's app high-water mark)."""
    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    docs = spark.createDataFrame(
        [(1, "first indexed document with plenty of tokens to work with")],
        "doc_id long, text string",
    )
    v_before = idx.log.state().version
    n = idx.append(docs, "doc_id", "text")
    st = idx.log.state()
    assert st.version == v_before + 1, "digests+bands committed as ONE version"
    tbls = {pv["tbl"] for pv in st.parts.values()}
    assert tbls == {"digests", "bands"}
    assert idx.committed_batches() == [n]
    # crash mid-append = staged files, no manifest: invisible to probes
    idx.log._stage(
        idx._unified(docs.selectExpr("doc_id + 1 AS doc_id", "text"), "doc_id", "text", "9"),
        None, ["tbl", "batch"],
    )
    assert idx.committed_batches() == [n]
    assert idx.digests().count() == 1
    # replaying the committed label converges to exactly one copy
    n2 = idx.append(docs, "doc_id", "text", batch_no=n)
    assert n2 == n
    assert idx.digests().count() == 1


def test_compaction_preserves_probes(spark, tmp_path):
    """compact() must merge all batches into one with identical probe
    results — the small-file fix for per-epoch appends."""
    docs = table(spark, TEST_SF_DIR, "documents")
    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    for m in range(1, 4):  # three appends -> three committed batches
        idx.append(docs.where(F.col("doc_id") % 4 == m), "doc_id", "text")
    new = docs.where(F.col("doc_id") % 4 == 0)
    before = _verdicts(incremental_dedup_indexed(idx, new, "doc_id", "text"))
    n_dig, n_band = idx.digests().count(), idx.bands().count()

    lbl = idx.compact()
    assert idx.committed_batches() == [lbl]
    assert (idx.digests().count(), idx.bands().count()) == (n_dig, n_band)
    assert _verdicts(incremental_dedup_indexed(idx, new, "doc_id", "text")) == before
    # idempotent on a single batch
    assert idx.compact() == lbl


def test_indexed_probe_never_scans_corpus_text(spark, tmp_path):
    """The 100 TB contract in plan form: incremental_dedup_indexed must
    read the stored digest/band tables, NEVER the index documents' source
    file (the derive-in-query form rescans it; the indexed form may not)."""
    corpus_path = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(
        [(1, "an indexed corpus document with a healthy number of tokens")],
        "doc_id long, text string",
    ).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    idx.append(corpus, "doc_id", "text")
    new = spark.createDataFrame(
        [(2, "a new incoming document that shares nothing with the corpus")],
        "doc_id long, text string",
    )
    plan_files = incremental_dedup_indexed(
        idx, new, "doc_id", "text", within_batch=True
    ).inputFiles()
    assert plan_files, "expected file-backed inputs"
    assert not any("corpus.parquet" in f for f in plan_files)
    assert any("/sig/" in f or "sig" + os.sep in f for f in plan_files)
    # the derived form, by contrast, does rescan the corpus source
    drv_files = incremental_dedup(corpus, new, "doc_id", "text").inputFiles()
    assert any("corpus.parquet" in f for f in drv_files)


def test_sequential_ingest_matches_derived(spark, tmp_path):
    """Two sequential ingest batches through the STORED index must
    accept/reject identically to the derive-in-query form probing the
    equivalently-grown corpus (the CORRECTNESS oracle only covers one
    batch; this is the index-growth step it can't express)."""
    docs = table(spark, TEST_SF_DIR, "documents")
    index0 = docs.where(F.col("doc_id") % 4 != 0)
    batch1 = docs.where(F.col("doc_id") % 8 == 0)
    batch2 = docs.where(F.col("doc_id") % 8 == 4)

    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    idx.append(index0, "doc_id", "text")

    v1_idx = incremental_dedup_indexed(idx, batch1, "doc_id", "text", within_batch=True)
    v1_drv = incremental_dedup(index0, batch1, "doc_id", "text", within_batch=True)
    assert _verdicts(v1_idx) == _verdicts(v1_drv)

    # accept batch1's keepers into the index, then ingest batch2
    kept1 = batch1.join(
        v1_idx.where(F.col("verdict") == "keep").select(F.col("doc").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    idx.append(kept1, "doc_id", "text")
    index1 = index0.unionByName(kept1)

    v2_idx = incremental_dedup_indexed(idx, batch2, "doc_id", "text", within_batch=True)
    v2_drv = incremental_dedup(index1, batch2, "doc_id", "text", within_batch=True)
    got, want = _verdicts(v2_idx), _verdicts(v2_drv)
    assert got == want
    assert len(got) == batch2.count()
    # the fixture must actually exercise a duplicate verdict, not just keeps
    assert "keep" in got.values()
    assert {"exact", "near"} & set(got.values())


def test_append_refuses_second_live_writer(spark, tmp_path):
    """append()/compact() run under the router's single-writer lock: while
    another LIVE writer owns the index dir, a mutation raises SinkLockError
    instead of interleaving batch writes; after release (or owner death)
    the same mutation succeeds. Mirrors
    test_router_lock_refuses_second_live_writer."""
    import pytest

    from flink_real_time_data_warehouse_spark.streaming.router import (
        RouterLock,
        SinkLockError,
    )

    docs = table(spark, TEST_SF_DIR, "documents").limit(20)
    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    held = RouterLock(idx.base_dir).acquire()  # a live concurrent writer
    with pytest.raises(SinkLockError, match="live router"):
        idx.append(docs, "doc_id", "text")
    assert idx.is_empty()  # the refused append wrote nothing
    with pytest.raises(SinkLockError, match="live router"):
        idx.compact()
    held.release()
    idx.append(docs, "doc_id", "text")
    assert not idx.is_empty()
    # the lock is released after each mutation, not held by the instance
    import os

    assert not os.path.exists(os.path.join(idx.base_dir, RouterLock.FILENAME))


def test_hint_broadcast_gate_keeps_verdicts(spark, tmp_path):
    """hint_broadcast=False (the oversized-batch fallback) must
    produce identical verdicts via the shuffled self-join path, and the
    optimized plan must carry no within-batch broadcast hint."""
    docs = table(spark, TEST_SF_DIR, "documents")
    new = docs.where(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    idx.append(docs.where(F.col("doc_id") % 4 != 0), "doc_id", "text")

    hinted = incremental_dedup_indexed(idx, new, "doc_id", "text", within_batch=True)
    shuffled = incremental_dedup_indexed(
        idx, new, "doc_id", "text", within_batch=True, hint_broadcast=False
    )
    assert _verdicts(hinted) == _verdicts(shuffled)
    opt_h = hinted._jdf.queryExecution().optimizedPlan().toString()
    opt_s = shuffled._jdf.queryExecution().optimizedPlan().toString()
    assert opt_s.count("strategy=broadcast") < opt_h.count("strategy=broadcast")


def test_explicit_label_appends_race_lock_free(spark, tmp_path):
    """Explicit-label appends are multi-writer-safe WITHOUT the advisory
    lock: concurrent distinct labels both commit; concurrent racers on
    the SAME label resolve to exactly one copy (the log's OCC claim +
    app high-water mark)."""
    from concurrent.futures import ThreadPoolExecutor

    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    d1 = spark.createDataFrame(
        [(1, "first raced document body with plenty of distinct tokens")],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [(2, "second raced document body sharing no shingles with the first")],
        "doc_id long, text string",
    )

    with ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(idx.append, d1, "doc_id", "text", "ea")
        f2 = ex.submit(idx.append, d2, "doc_id", "text", "eb")
        assert {f1.result(), f2.result()} == {"ea", "eb"}
    assert sorted(idx.committed_batches()) == ["ea", "eb"]
    assert idx.digests().count() == 2

    # same-label race: exactly one copy survives
    with ThreadPoolExecutor(max_workers=2) as ex:
        futs = [ex.submit(idx.append, d1, "doc_id", "text", "ec") for _ in range(2)]
        assert [f.result() for f in futs] == ["ec", "ec"]
    assert idx.digests().count() == 3
    assert idx.digests().where(F.col("doc") == 1).count() == 2  # ea + ec, once each


def test_prefix_index_epoch_replay_and_verdicts(spark, tmp_path):
    """PrefixIndex (incremental ExactSubstr, r8 verdict task 8): epoch
    labels commit exactly once (a replayed label appends nothing), seeds
    pin at snapshot time, and a batch containing a 12-token verbatim copy
    of an indexed document reads 'dup_substring' while novel text keeps."""
    from flink_real_time_data_warehouse_spark.datapipe.dedup import (
        incremental_substring_verdicts,
    )
    from flink_real_time_data_warehouse_spark.datapipe.signature_index import (
        PrefixIndex,
    )

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    novel = "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
    idx = PrefixIndex(spark, str(tmp_path / "pidx"))
    first = spark.createDataFrame([(1, base)], "doc_id long, text string")
    idx.append(first, "doc_id", "text", batch_no="e0")
    n_seeds = idx.seeds().count()
    assert n_seeds == 1  # 12 tokens -> exactly one window
    idx.append(first, "doc_id", "text", batch_no="e0")  # replay: no growth
    assert idx.seeds().count() == n_seeds

    batch = spark.createDataFrame(
        [(10, "prefix words then " + base + " and a tail"), (11, novel)],
        "doc_id long, text string",
    )
    v = {
        r["doc"]: (r["n_dup_positions"], r["verdict"])
        for r in incremental_substring_verdicts(
            idx.seeds(), batch, "doc_id", "text"
        ).collect()
    }
    assert v[10] == (1, "dup_substring")
    assert v[11] == (0, "keep")
    # short docs have no windows: always keep
    short = spark.createDataFrame([(12, "too short")], "doc_id long, text string")
    r = incremental_substring_verdicts(idx.seeds(), short, "doc_id", "text").first()
    assert (r["n_dup_positions"], r["verdict"]) == (0, "keep")
    # within-batch: the min-id copy keeps, the later copy flags
    twins = spark.createDataFrame(
        [(20, base), (21, base)], "doc_id long, text string"
    )
    empty_idx = PrefixIndex(spark, str(tmp_path / "pidx2"))
    v2 = {
        r["doc"]: r["verdict"]
        for r in incremental_substring_verdicts(
            empty_idx.seeds(), twins, "doc_id", "text"
        ).collect()
    }
    assert v2 == {20: "keep", 21: "dup_substring"}
