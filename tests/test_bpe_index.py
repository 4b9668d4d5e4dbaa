"""Persisted BPE merge table (datapipe/bpe_index.BpeIndex): train-once,
encode-forever (r11 verdict task 3).

The tokenizer-as-artifact contract: the stored table equals bpe_train's
output exactly, a rebuild commits nothing, and the indexed encode plan
contains zero training jobs — the non-indexed query's 10 unrolled merge
rounds run once per artifact, not once per evaluation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.datapipe.bpe import (
    bpe_piece_counts,
    bpe_train,
)
from flink_real_time_data_warehouse_spark.datapipe.bpe_index import BpeIndex
from flink_real_time_data_warehouse_spark.tables import table

from .conftest import TEST_SF_DIR


def test_stored_merges_equal_bpe_train(spark, tmp_path):
    docs = table(spark, TEST_SF_DIR, "documents")
    idx = BpeIndex(spark, str(tmp_path / "bpe")).build(docs, "text")
    assert idx.merges() == sorted(bpe_train(docs, "text"))


def test_rebuild_is_noop_and_exactly_once(spark, tmp_path):
    docs = table(spark, TEST_SF_DIR, "documents")
    idx = BpeIndex(spark, str(tmp_path / "bpe")).build(docs, "text")
    v0 = idx.log.state().version
    stored = idx.merges()
    # second build — same instance AND a fresh instance on the same dir —
    # must not write a new log version or change the table
    idx.build(docs, "text")
    BpeIndex(spark, str(tmp_path / "bpe")).build(
        docs.limit(3), "text"  # different corpus: the first table stands
    )
    assert idx.log.state().version == v0
    assert BpeIndex(spark, str(tmp_path / "bpe")).merges() == stored


def test_indexed_encode_equals_derived(spark, tmp_path):
    docs = table(spark, TEST_SF_DIR, "documents")
    merges = bpe_train(docs, "text")
    idx = BpeIndex(spark, str(tmp_path / "bpe")).build(docs, "text")
    a = sorted(
        map(tuple, bpe_piece_counts(docs, "doc_id", "text", merges).collect())
    )
    b = sorted(
        map(tuple, bpe_piece_counts(docs, "doc_id", "text", idx.merges()).collect())
    )
    assert a == b


def test_indexed_plan_has_no_training_jobs(spark, tmp_path):
    """With the artifact stored, building the encode DataFrame must run
    ZERO Spark jobs (training ran at build time) — the plan reads only
    the corpus: no vocabulary cap (the training-time global sort+limit),
    no checkpointed lineage."""
    docs = table(spark, TEST_SF_DIR, "documents")
    idx = BpeIndex(spark, str(tmp_path / "bpe")).build(docs, "text")
    merges = idx.merges()  # control-plane read of the tiny stored table

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    enc = bpe_piece_counts(docs, "doc_id", "text", merges)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "encode plan construction ran Spark jobs"
    plan = enc._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit" not in plan  # the vocab cap is training-only
    assert "LogicalRDD" not in plan  # no checkpointed training lineage
    # corpus scans only (doc ids + occurrences + distinct-word side) —
    # the training path would add vocabulary scans and a global limit
    assert plan.lower().count("relation") <= 3


def test_vocab_sweep_plan_has_no_training_jobs(spark, tmp_path):
    """The fertility sweep over the stored artifact must build with ZERO
    Spark jobs and no training shapes in the plan — one encode fold
    snapshotted at three merge cuts, never three encodes and never a
    retrain. Fertility must be non-decreasing as the vocabulary
    truncates (fewer merges => more pieces per word)."""
    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        bpe_fertility_sweep,
    )

    docs = table(spark, TEST_SF_DIR, "documents")
    idx = BpeIndex(spark, str(tmp_path / "bpe")).build(docs, "text")
    merges = idx.merges()

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    sweep = bpe_fertility_sweep(docs, "text", merges)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "sweep plan construction ran Spark jobs"
    plan = sweep._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit" not in plan  # the vocab cap is training-only
    assert "LogicalRDD" not in plan  # no checkpointed training lineage
    assert plan.lower().count("relation") <= 1  # ONE corpus scan total

    rows = {r["n_merges"]: r["fertility_milli"] for r in sweep.collect()}
    assert sorted(rows) == [3, 6, 10]
    assert rows[3] >= rows[6] >= rows[10] >= 1000


def test_empty_index_reads_empty(spark, tmp_path):
    idx = BpeIndex(spark, str(tmp_path / "bpe"))
    assert not idx.is_built()
    assert idx.merges() == []
    assert idx.merges_df().columns == ["merge_rank", "lhs", "rhs"]


def test_fertility_indexed_matches_unindexed(spark, tmp_path):
    """End-to-end: the registered indexed twin returns byte-identical
    rows to the non-indexed graded query."""
    from flink_real_time_data_warehouse_spark.plans.datapipe import (
        tokenizer_fertility_indexed_q,
        tokenizer_fertility_q,
    )

    a = sorted(map(tuple, tokenizer_fertility_q(spark, TEST_SF_DIR).collect()))
    b = sorted(
        map(tuple, tokenizer_fertility_indexed_q(spark, TEST_SF_DIR).collect())
    )
    assert a == b


def test_stored_vocab_and_costs_equal_derived(spark, tmp_path):
    """The artifact's wp_vocab and unigram_costs tables equal the tables
    the stored merges would derive — one consistent tokenizer.json."""
    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        unigram_piece_costs,
        wordpiece_vocab,
    )

    docs = table(spark, TEST_SF_DIR, "documents")
    idx = BpeIndex(spark, str(tmp_path / "bpe")).build(docs, "text")
    merges = idx.merges()
    assert sorted(r["piece"] for r in idx.wp_vocab().collect()) == sorted(
        r["piece"] for r in wordpiece_vocab(docs, "text", merges).collect()
    )
    assert sorted(map(tuple, idx.unigram_costs().collect())) == sorted(
        map(tuple, unigram_piece_costs(docs, "text", merges).collect())
    )


def test_wordpiece_unigram_indexed_match_unindexed(spark):
    from flink_real_time_data_warehouse_spark.plans.datapipe import (
        unigram_tokenize_indexed_q,
        unigram_tokenize_q,
        wordpiece_tokenize_indexed_q,
        wordpiece_tokenize_q,
    )

    for a_q, b_q in (
        (wordpiece_tokenize_q, wordpiece_tokenize_indexed_q),
        (unigram_tokenize_q, unigram_tokenize_indexed_q),
    ):
        a = sorted(map(tuple, a_q(spark, TEST_SF_DIR).collect()))
        b = sorted(map(tuple, b_q(spark, TEST_SF_DIR).collect()))
        assert a == b and a
