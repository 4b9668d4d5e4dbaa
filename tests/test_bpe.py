"""BPE merge-pair training + tokenization (datapipe/bpe.py): greedy
non-overlapping merges, deterministic tie-breaks, vocabulary-capped
training, per-doc piece counts — hand-computed on a toy corpus."""

from __future__ import annotations

from flink_real_time_data_warehouse_spark.datapipe.bpe import (
    bpe_piece_counts,
    bpe_train,
)


def test_bpe_train_greedy_merges_hand_computed(spark):
    # word freqs: aaab x3, ab x2
    docs = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "aaab ab")], "doc_id long, text string"
    )
    merges = bpe_train(docs, "text", n_merges=3)
    # r1: pair counts aa=6 (two per 'aaab'), ab=5 -> (a,a)
    # r2: aaab=[aa,a,b]: (aa,a)=3, (a,b)=3+2=5 -> (a,b)
    # r3: aaab=[aa,ab], ab=[ab]: (aa,ab)=3 alone -> (aa,ab)
    assert merges == [(1, "a", "a"), (2, "a", "b"), (3, "aa", "ab")]


def test_bpe_greedy_is_non_overlapping(spark):
    # 'aaaa' + (a,a): greedy left pass -> [aa, aa]; 'aaa' -> [aa, a]
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaa")], "doc_id long, text string"
    )
    merges = bpe_train(docs, "text", n_merges=1)
    assert merges == [(1, "a", "a")]
    counts = bpe_piece_counts(docs, "doc_id", "text", merges).collect()
    # aaaa -> 2 pieces (x2), aaa -> 2 pieces ([aa, a])
    assert [(r["doc_id"], r["word_ct"], r["bpe_ct"]) for r in counts] == [
        (1, 3, 6)
    ]


def test_bpe_piece_counts_zero_fill_and_consistency(spark):
    docs = spark.createDataFrame(
        [(1, "aaab ab"), (2, ""), (3, "zz")], "doc_id long, text string"
    )
    merges = bpe_train(docs, "text", n_merges=3)
    rows = {
        r["doc_id"]: (r["word_ct"], r["bpe_ct"])
        for r in bpe_piece_counts(docs, "doc_id", "text", merges).collect()
    }
    assert rows[2] == (0, 0), "empty doc zero-fills"
    for doc_id, (wc, bc) in rows.items():
        assert bc >= wc, f"doc {doc_id}: every word is at least one piece"
    assert len(rows) == 3
