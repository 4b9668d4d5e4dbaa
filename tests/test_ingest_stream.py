"""Streaming ingest funnel e2e (streaming/ingest.start_ingest).

Hand-built corpus so every path is pinned: cross-epoch dedup through the
growing SignatureIndex, the quality gate, within-epoch min-id keeping,
and the quality-rejected-duplicate case where sequential semantics
legitimately diverge from the single-pass batch query.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.datapipe.signature_index import SignatureIndex
from flink_real_time_data_warehouse_spark.storage import TxLog
from flink_real_time_data_warehouse_spark.streaming.ingest import start_ingest


def _accepted(spark, accepted_dir):
    """Committed snapshot of the TxLog-backed accepted sink."""
    return TxLog(accepted_dir).snapshot(spark)

# Four quality-passing documents with DISJOINT shingle sets (near-dup
# probes must not fire across distinct docs — a shared sentence template
# would legitimately LSH-collide).
GOOD = {
    "seed": (
        "the ancient lighthouse keeper is watching over a stormy harbor "
        "as waves crash against granite cliffs below the northern point"
    ),
    "alpha": (
        "a curious squirrel is gathering acorns near the old oak tree "
        "while children play in the warm afternoon sun by the fence"
    ),
    "beta": (
        "the midnight train is rolling through empty valleys and sleeping "
        "towns carrying a heavy cargo of coal and seasoned timber"
    ),
    "gamma": (
        "a gentle rain is falling on the terracotta rooftops while tired "
        "merchants close their market stalls in the fading evening light"
    ),
}
LOW_Q = "tiny{}"  # < 10 tokens: fails the length band, score < 2


def _write_epochs(spark, d, epochs):
    os.makedirs(d)
    base = time.time() - 100
    for i, rows in enumerate(epochs):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"b{i}"))
        for f in os.listdir(os.path.join(d, f"b{i}")):
            os.utime(os.path.join(d, f"b{i}", f), (base + i * 10, base + i * 10))


def _stream(spark, d):
    return (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "2")  # one committed part + _SUCCESS sibling dir
        .load(d + "/b*")
    )


def test_streaming_ingest_funnel(spark, tmp_path):
    epochs = [
        # epoch 0: dup-of-index rejected; good novel accepted; low quality
        # rejected; within-epoch copy of the good doc rejected (min-id keeps)
        [
            (10, GOOD["seed"]),  # exact copy of the seeded index doc
            (11, GOOD["alpha"]),
            (12, LOW_Q.format(1)),
            (13, GOOD["alpha"]),
        ],
        # epoch 1: copy of an epoch-0 ACCEPTED doc must now be rejected via
        # the grown index; a fresh doc accepts; a copy of the quality-
        # rejected doc 12 is novel to the index (12 was never appended) and
        # passes dedup — but still fails quality
        [
            (20, GOOD["alpha"]),
            (21, GOOD["beta"]),
            (22, LOW_Q.format(1)),
        ],
        # epoch 2: copy of epoch-1's accepted doc rejected; fresh accepted
        [
            (30, GOOD["beta"]),
            (31, GOOD["gamma"]),
        ],
    ]
    src = str(tmp_path / "src")
    _write_epochs(spark, src, epochs)

    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    idx.append(
        spark.createDataFrame([(1, GOOD["seed"])], "doc_id long, text string"),
        "doc_id",
        "text",
    )
    accepted_dir = str(tmp_path / "accepted")
    q = start_ingest(_stream(spark, src), idx, accepted_dir, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = sorted(r["doc_id"] for r in _accepted(spark, accepted_dir).collect())
    assert got == [11, 21, 31]

    # the index grew by exactly the accepted docs: seed batch + one labeled
    # epoch batch per trigger, and its digests are seed + accepted
    labels = idx.committed_batches()
    assert labels[0] == "0" and all(lb.startswith("e") for lb in labels[1:])
    assert idx.digests().count() == 1 + 3

    # epoch replay (crash-retry): re-running an already-committed epoch's
    # work must change nothing — the TxLog skips the (app_id, epoch)
    # commit, the index append marker-skips
    replay = spark.createDataFrame([(11, GOOD["alpha"])], "doc_id long, text string")
    TxLog(accepted_dir).append(replay, app_id="ingest", app_version=0)
    idx.append(replay, "doc_id", "text", batch_no="e0")
    assert sorted(r["doc_id"] for r in _accepted(spark, accepted_dir).collect()) == got
    assert idx.digests().count() == 1 + 3


def test_streaming_ingest_with_auto_compaction(spark, tmp_path):
    """compact_every must not change any accept/reject outcome, and the
    index ends compacted (bounded batch count) with the same digests."""
    epochs = [
        [(10, GOOD["seed"]), (11, GOOD["alpha"])],
        [(20, GOOD["alpha"]), (21, GOOD["beta"])],
        [(30, GOOD["beta"]), (31, GOOD["gamma"])],
    ]
    src = str(tmp_path / "src")
    _write_epochs(spark, src, epochs)
    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    idx.append(
        spark.createDataFrame([(1, GOOD["seed"])], "doc_id long, text string"),
        "doc_id",
        "text",
    )
    accepted_dir = str(tmp_path / "accepted")
    q = start_ingest(
        _stream(spark, src), idx, accepted_dir, str(tmp_path / "ckpt"), compact_every=2
    )
    q.awaitTermination()
    got = sorted(r["doc_id"] for r in _accepted(spark, accepted_dir).collect())
    assert got == [11, 21, 31]
    assert len(idx.committed_batches()) <= 2  # compacted mid-stream
    assert idx.digests().select("doc").distinct().count() == 1 + 3


def test_streaming_ingest_matches_batch_loop(spark, tmp_path):
    """The streaming funnel must equal a pure-batch sequential reference
    applying the same per-epoch logic (dedup-indexed + gate + append) —
    the invariant the rows-only registry entry rests on."""
    from flink_real_time_data_warehouse_spark.datapipe.dedup import (
        incremental_dedup_indexed,
    )
    from flink_real_time_data_warehouse_spark.datapipe.quality import text_quality
    from flink_real_time_data_warehouse_spark.tables import table

    from .conftest import TEST_SF_DIR

    docs = table(spark, TEST_SF_DIR, "documents")
    new = docs.where(F.col("doc_id") % 4 == 0).select("doc_id", "text")
    index_docs = docs.where(F.col("doc_id") % 4 != 0)
    bounds = new.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    cut = [bounds[0] + (bounds[1] - bounds[0]) * k // 3 for k in (1, 2)]
    batches = [
        new.where(F.col("doc_id") <= cut[0]),
        new.where((F.col("doc_id") > cut[0]) & (F.col("doc_id") <= cut[1])),
        new.where(F.col("doc_id") > cut[1]),
    ]

    # batch-loop reference over its own index copy
    ref_idx = SignatureIndex(spark, str(tmp_path / "ref_sig"))
    ref_idx.append(index_docs, "doc_id", "text")
    ref_accepted = []
    for b in batches:
        v = incremental_dedup_indexed(ref_idx, b, "doc_id", "text", within_batch=True)
        qy = text_quality(b, "doc_id", "text").select(
            F.col("doc_id").alias("doc"), "quality_score"
        )
        ok = (
            v.join(qy, "doc")
            .where((F.col("verdict") == "keep") & (F.col("quality_score") >= 2))
            .select(F.col("doc").alias("doc_id"))
        )
        acc = b.join(ok, "doc_id", "left_semi")
        ref_accepted.extend(r["doc_id"] for r in acc.select("doc_id").collect())
        ref_idx.append(acc, "doc_id", "text")

    # streaming run over the same epoch split
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 100
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"b{i}"))
        for f in os.listdir(os.path.join(src, f"b{i}")):
            os.utime(os.path.join(src, f"b{i}", f), (base + i * 10, base + i * 10))
    st_idx = SignatureIndex(spark, str(tmp_path / "st_sig"))
    st_idx.append(index_docs, "doc_id", "text")
    accepted_dir = str(tmp_path / "accepted")
    q = start_ingest(_stream(spark, src), st_idx, accepted_dir, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = sorted(r["doc_id"] for r in _accepted(spark, accepted_dir).collect())
    assert got == sorted(ref_accepted)
    assert len(got) > 0


def test_replay_after_compaction_is_skipped(spark, tmp_path):
    """Pins the round-6 compaction/replay upgrade: the TxLog's per-label
    app high-water marks SURVIVE compaction, so an epoch replayed from an
    OLD checkpoint after compact() is skipped outright — no duplicate
    digest/band rows (the marker protocol re-appended here; its wart is
    gone), and verdicts are unchanged."""
    from flink_real_time_data_warehouse_spark.datapipe.dedup import (
        incremental_dedup_indexed,
    )

    epochs = [
        [(10, GOOD["seed"]), (11, GOOD["alpha"])],
        [(20, GOOD["alpha"]), (21, GOOD["beta"])],
    ]
    src = str(tmp_path / "src")
    _write_epochs(spark, src, epochs)
    idx = SignatureIndex(spark, str(tmp_path / "sig"))
    idx.append(
        spark.createDataFrame([(1, GOOD["seed"])], "doc_id long, text string"),
        "doc_id",
        "text",
    )
    accepted_dir = str(tmp_path / "accepted")
    q = start_ingest(_stream(spark, src), idx, accepted_dir, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert sorted(
        r["doc_id"] for r in _accepted(spark, accepted_dir).collect()
    ) == [11, 21]

    lbl = idx.compact()  # folds seed + e0 + e1 into one batch
    assert idx.committed_batches() == [lbl]
    n_rows = idx.digests().count()

    probe = spark.createDataFrame(
        [(40, GOOD["alpha"]), (41, GOOD["gamma"])], "doc_id long, text string"
    )
    verdicts_before = {
        r["doc"]: r["verdict"]
        for r in incremental_dedup_indexed(idx, probe, "doc_id", "text").collect()
    }
    assert verdicts_before == {40: "exact", 41: "keep"}

    # replay epoch 0 from an old checkpoint: the label's high-water mark
    # survived the compaction, so the append is SKIPPED — zero new rows
    replay = spark.createDataFrame([(11, GOOD["alpha"])], "doc_id long, text string")
    assert idx.append(replay, "doc_id", "text", batch_no="e0") == "e0"
    assert idx.digests().count() == n_rows
    assert idx.digests().where(F.col("doc") == 11).count() == 1
    verdicts_after = {
        r["doc"]: r["verdict"]
        for r in incremental_dedup_indexed(idx, probe, "doc_id", "text").collect()
    }
    assert verdicts_after == verdicts_before
    assert idx.committed_batches() == [lbl], "replay committed no new batch"


def test_vector_ingest_replay_idempotent(spark, tmp_path):
    """The vector funnel (start_vector_ingest) carries the same dual-
    idempotent-commit contract as the text funnel: replaying a committed
    epoch's work changes neither the accepted sink nor the IvfIndex, and
    the index grew by exactly the accepted vectors."""
    from flink_real_time_data_warehouse_spark.datapipe.ivf_index import IvfIndex
    from flink_real_time_data_warehouse_spark.streaming.ingest import (
        start_vector_ingest,
    )
    from flink_real_time_data_warehouse_spark.tables import table

    from .conftest import TEST_SF_DIR

    emb = table(spark, TEST_SF_DIR, "embeddings")
    new = emb.where(F.col("vec_id") % 4 == 0).select("vec_id", "embedding")
    corpus = emb.where(F.col("vec_id") % 4 != 0)
    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    idx.build(corpus)

    from flink_real_time_data_warehouse_spark.sources.streams import write_epoch_files

    src = write_epoch_files(new, "vec_id", 2, str(tmp_path / "src"), str(tmp_path))
    stream = (
        spark.readStream.format("parquet")
        .schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    accepted_dir = str(tmp_path / "accepted")
    q = start_vector_ingest(stream, idx, accepted_dir, str(tmp_path / "ckpt"), 0.45)
    q.awaitTermination()

    got = sorted(r["vec_id"] for r in _accepted(spark, accepted_dir).collect())
    assert 0 < len(got) < new.count()  # some rejections, some accepts
    # index grew by exactly the accepted vectors, under epoch labels
    labels = idx.committed_batches()
    assert labels[0] == "0" and sorted(labels[1:]) == ["e0", "e1"]
    assert idx.lists().count() == corpus.count() + len(got)

    # epoch replay: the TxLog skips (app_id, epoch), the index marker-skips
    replay = new.limit(3)
    TxLog(accepted_dir).append(replay, app_id="vec-ingest", app_version=0)
    idx.append(replay, batch_no="e0")
    assert sorted(
        r["vec_id"] for r in _accepted(spark, accepted_dir).collect()
    ) == got
    assert idx.lists().count() == corpus.count() + len(got)


def test_ingest_funnel_default_and_shared_txlog_sinks_agree(spark, tmp_path):
    """The funnel's accepted set is sink-independent: the default
    per-funnel TxLog table (rooted at accepted_dir) and an explicitly
    shared sink_log table receive exactly the same accepted rows, and
    each log records one epoch-keyed commit per micro-batch."""
    epochs = [
        [(10, GOOD["seed"]), (11, GOOD["alpha"]), (12, LOW_Q.format(1))],
        [(20, GOOD["alpha"]), (21, GOOD["beta"])],
    ]
    src = str(tmp_path / "src")
    _write_epochs(spark, src, epochs)

    def seed(idx):
        idx.append(
            spark.createDataFrame([(1, GOOD["seed"])], "doc_id long, text string"),
            "doc_id",
            "text",
        )
        return idx

    # default backend: TxLog table rooted at accepted_dir
    m_idx = seed(SignatureIndex(spark, str(tmp_path / "m_sig")))
    m_dir = str(tmp_path / "m_acc")
    start_ingest(_stream(spark, src), m_idx, m_dir, str(tmp_path / "m_ckpt")).awaitTermination()
    default = sorted(r["doc_id"] for r in _accepted(spark, m_dir).collect())

    # shared-table backend — one file per trigger so each epoch is its own commit
    t_idx = seed(SignatureIndex(spark, str(tmp_path / "t_sig")))
    log = TxLog(str(tmp_path / "table"))
    one_per = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .load(src + "/b*")
    )
    start_ingest(
        one_per, t_idx, "ignored", str(tmp_path / "t_ckpt"), sink_log=log
    ).awaitTermination()
    txlog = sorted(r["doc_id"] for r in log.snapshot(spark).collect())

    assert txlog == default == [11, 21]
    assert log.state().apps == {"ingest": 1}, "one epoch-keyed commit per micro-batch"


def test_classifier_eval_stream_replay_idempotent(spark, tmp_path):
    """Crash-retry worst case for the per-epoch confusion sink: the
    entire stream replays from a FRESH checkpoint against the same
    TxLog — every epoch commit must be idempotently skipped, leaving
    exactly one row per epoch with the same sums."""
    import os

    from flink_real_time_data_warehouse_spark.datapipe.classifier import (
        train_quality_classifier,
    )
    from flink_real_time_data_warehouse_spark.sources.streams import (
        stream_dir,
        write_epoch_files,
    )
    from flink_real_time_data_warehouse_spark.streaming.ingest import (
        start_classifier_eval,
    )
    from flink_real_time_data_warehouse_spark.tables import table

    from .conftest import TEST_SF_DIR

    docs = table(spark, TEST_SF_DIR, "documents").select("doc_id", "text", "lang")
    new = docs.where(F.col("doc_id") % 4 == 0)
    model = train_quality_classifier(
        docs.where(F.col("doc_id") % 4 != 0), F.col("lang") == "en"
    )
    work = str(tmp_path)
    splits = write_epoch_files(new, "doc_id", 3, os.path.join(work, "splits"), work)
    schema = "doc_id long, text string, lang string"
    eval_dir = os.path.join(work, "eval")
    q = start_classifier_eval(
        stream_dir(spark, splits, schema, max_files_per_trigger=1),
        model, eval_dir, os.path.join(work, "ckpt1"),
    )
    q.awaitTermination()
    first = sorted(
        (r.asDict() for r in TxLog(eval_dir).snapshot(spark).collect()),
        key=lambda r: r["epoch"],
    )
    assert [r["epoch"] for r in first] == [1, 2, 3]
    assert sum(r["n_docs"] for r in first) == new.count()
    for r in first:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_docs"]

    q2 = start_classifier_eval(
        stream_dir(spark, splits, schema, max_files_per_trigger=1),
        model, eval_dir, os.path.join(work, "ckpt2"),
    )
    q2.awaitTermination()
    second = sorted(
        (r.asDict() for r in TxLog(eval_dir).snapshot(spark).collect()),
        key=lambda r: r["epoch"],
    )
    assert second == first
