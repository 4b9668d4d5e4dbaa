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


def test_wordpiece_munch_hand_computed(spark):
    """Greedy maximal munch over an explicit merge table: vocab from
    'aaab aaab aaab ab' with merges [(a,a),(a,b)] is {aa, ab, a(?), b(?)}
    — whatever symbols survive; encoding must take the LONGEST piece at
    each cursor and collapse any word with an unmatched char to one
    [UNK]."""
    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        bpe_train,
        wordpiece_piece_counts,
        wordpiece_vocab,
    )

    train = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "aaab ab")], "doc_id long, text string"
    )
    merges = bpe_train(train, "text", n_merges=2)
    assert merges == [(1, "a", "a"), (2, "a", "b")]
    vocab = {r["piece"] for r in wordpiece_vocab(train, "text", merges).collect()}
    # aaab -> [aa, ab] and ab -> [ab] after both merges: surviving symbols
    assert vocab == {"aa", "ab"}
    # encode a doc against that vocab:
    #  aaab   -> aa + ab = 2 pieces
    #  aab    -> aa + b? 'b' alone not in vocab -> UNK (1 piece)
    #  abab   -> ab + ab = 2
    #  aaabab -> aa + ab + ab = 3 (munch prefers aa over a at cursor 1)
    #  zz     -> UNK
    docs = spark.createDataFrame(
        [(10, "aaab aab abab aaabab zz"), (11, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["word_ct"], r["wp_ct"], r["unk_ct"])
        for r in wordpiece_piece_counts(
            docs, "doc_id", "text", merges,
            vocab=wordpiece_vocab(train, "text", merges),
        ).collect()
    }
    assert out[10] == (5, 2 + 1 + 2 + 3 + 1, 2)
    assert out[11] == (0, 0, 0)


def test_wordpiece_piece_cap_respected(spark):
    """A vocabulary piece can never exceed WP_MAX_PIECE_CHARS, and words
    longer than the cap still encode (by multiple pieces), never by a
    single over-long match."""
    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        WP_MAX_PIECE_CHARS,
        bpe_train,
        wordpiece_piece_counts,
    )

    long_word = "ab" * WP_MAX_PIECE_CHARS  # 32 chars, above the 16 cap
    train = spark.createDataFrame(
        [(1, "ab ab ab " + long_word)], "doc_id long, text string"
    )
    merges = bpe_train(train, "text", n_merges=2)
    docs = spark.createDataFrame([(1, long_word)], "doc_id long, text string")
    from flink_real_time_data_warehouse_spark.datapipe.bpe import wordpiece_vocab

    row = wordpiece_piece_counts(
        docs, "doc_id", "text", merges,
        vocab=wordpiece_vocab(train, "text", merges),
    ).first()
    # whatever the merges, the 32-char word needs >= ceil(32/16) pieces
    assert row["word_ct"] == 1
    assert row["unk_ct"] == 0
    assert row["wp_ct"] >= 2


def test_unigram_viterbi_minimizes_cost_not_greed(spark):
    """Viterbi picks the MINIMUM-cost path even when maximal munch would
    grab a longer prefix: with costs {abc:100, ab:10, cd:10, d:5000},
    'abcd' must encode as ab+cd (cost 20), not abc+d (cost 5100)."""
    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        unigram_piece_counts,
    )

    costs = spark.createDataFrame(
        [("abc", 100), ("ab", 10), ("cd", 10), ("d", 5000)],
        "piece string, cost long",
    )
    docs = spark.createDataFrame(
        [(1, "abcd abc zz"), (2, "")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["word_ct"], r["up_ct"], r["unk_ct"])
        for r in unigram_piece_counts(docs, "doc_id", "text", [], costs=costs).collect()
    }
    # abcd -> ab+cd (2), abc -> abc (1), zz -> UNK (1 piece)
    assert out[1] == (3, 2 + 1 + 1, 1)
    assert out[2] == (0, 0, 0)


def test_unigram_word_cap_and_tiebreak(spark):
    """Words over UNIGRAM_MAX_WORD_CHARS skip the DP and become one
    [UNK]; at equal total cost the combined integer prefers FEWER pieces
    (ab once beats a+b twice when 2*cost(a..)=cost(ab))."""
    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        UNIGRAM_MAX_WORD_CHARS,
        unigram_piece_counts,
    )

    costs = spark.createDataFrame(
        [("a", 10), ("b", 10), ("ab", 20)], "piece string, cost long"
    )
    long_word = "a" * (UNIGRAM_MAX_WORD_CHARS + 1)
    docs = spark.createDataFrame(
        [(1, "ab"), (2, long_word)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["word_ct"], r["up_ct"], r["unk_ct"])
        for r in unigram_piece_counts(docs, "doc_id", "text", [], costs=costs).collect()
    }
    assert out[1] == (1, 1, 0)  # ab as ONE piece: 20*2048+1 < 20*2048+2
    assert out[2] == (1, 1, 1)  # over the cap -> [UNK], no DP


def test_unigram_em_changes_a_segmentation(spark):
    """Pinned EM-effect fixture (Kudo 2018 §3 — one hard-EM iteration
    must be able to MOVE a segmentation, not just renumber costs): the
    BPE decomposition of 'abc' under merges [(a,b),(b,c)] is [ab, c],
    but the seed unigram costs make the Viterbi path [a, bc] — so the
    E-step shifts weight from {ab, c} onto {a, bc}, and under the
    re-estimated costs the word 'ab' flips from the single piece [ab]
    to [a, b]: per-doc piece count 5 -> 10. Both encodings pinned."""
    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        unigram_em_refine,
        unigram_piece_costs,
        unigram_piece_counts,
        unigram_viterbi_segments,
    )

    words = [("abc", 30), ("bc", 60), ("ab", 5), ("a", 60), ("b", 40), ("c", 2)]
    docs = spark.createDataFrame(
        [(i, " ".join([w] * n)) for i, (w, n) in enumerate(words)],
        "doc_id long, text string",
    )
    merges = [(1, "a", "b"), (2, "b", "c")]
    seed = unigram_piece_costs(docs, "text", merges)
    em = unigram_em_refine(docs, "text", merges)
    seg_seed = {
        r["w"]: list(r["ps"])
        for r in unigram_viterbi_segments(
            docs.selectExpr("explode(split(text, ' ')) AS w").distinct(), seed
        ).collect()
    }
    assert seg_seed["abc"] == ["a", "bc"]  # Viterbi beats BPE's [ab, c]
    assert seg_seed["ab"] == ["ab"]
    cnt = lambda costs: {
        r["doc_id"]: r["up_ct"]
        for r in unigram_piece_counts(
            docs, "doc_id", "text", merges, costs=costs
        ).collect()
    }
    c_seed, c_em = cnt(seed), cnt(em)
    assert c_seed[2] == 5  # 'ab' x5 as ONE piece each under the seed model
    assert c_em[2] == 10  # ...and TWO pieces [a, b] after the EM step
    assert c_seed[0] == c_em[0] == 60  # 'abc' x30 stays two pieces


def test_bytelevel_bpe_no_unk_and_lossless_roundtrip(spark):
    """The byte-level variant's two defining properties, on deliberately
    hostile input (emoji, CJK, accents, control-ish punctuation, digits):
    (1) NO UNK — every word encodes into >= 1 piece, every piece is made
    only of table stand-in characters; (2) LOSSLESS — inverting the
    byte->unicode table over the concatenated pieces reproduces each
    word's exact UTF-8 bytes."""
    from pyspark.sql import functions as SF

    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        BYTE_UNICODE_INV,
        apply_merge,
        bpe_train,
        byte_symbols,
        bytelevel_decode,
        tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello world hello"),
            (2, "héllo wörld 你好 世界 🙂🙂 mixed123"),
            (3, "a b --dashes-- 'quotes' ☃snowman"),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", symbols=byte_symbols)
    syms = byte_symbols(SF.col("w"))
    for _r, left, right in sorted(merges):
        syms = apply_merge(syms, left, right)
    rows = (
        docs.select(SF.explode(tokens(SF.col("text"))).alias("w"))
        .distinct()
        .select("w", syms.alias("pieces"))
        .collect()
    )
    assert rows
    for r in rows:
        assert len(r["pieces"]) >= 1, r["w"]  # no UNK, ever
        for piece in r["pieces"]:
            assert all(c in BYTE_UNICODE_INV for c in piece), (r["w"], piece)
        assert bytelevel_decode(r["pieces"]) == r["w"].encode("utf-8"), r["w"]


def test_bytelevel_bpe_stats_zero_fill_and_fingerprint(spark):
    """Per-doc stats: byte_ct counts UTF-8 bytes (multi-byte chars count
    each byte), piece_ct <= byte_ct, tokenless docs zero-fill with the
    empty-stream fingerprint, and equal documents share enc_fp."""
    import hashlib

    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        bpe_train,
        byte_symbols,
        bytelevel_piece_stats,
    )

    docs = spark.createDataFrame(
        [(1, "héllo ab"), (2, ""), (3, "héllo ab")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", symbols=byte_symbols)
    rows = {
        r["doc_id"]: r
        for r in bytelevel_piece_stats(docs, "doc_id", "text", merges).collect()
    }
    assert (rows[1]["word_ct"], rows[1]["byte_ct"]) == (2, 8)  # é is 2 bytes
    assert 1 <= rows[1]["piece_ct"] <= rows[1]["byte_ct"]
    assert rows[2]["word_ct"] == 0 and rows[2]["byte_ct"] == 0
    assert rows[2]["enc_fp"] == hashlib.md5(b"").hexdigest()
    assert rows[1]["enc_fp"] == rows[3]["enc_fp"] != rows[2]["enc_fp"]


def test_tokenizer_fertility_consistency(spark):
    """Fertility rolls up exactly the per-doc piece counts: per-language
    totals equal the sum of bpe_tokenize's rows joined to lang, fertility
    is always >= 1000 milli (a word is at least one piece), and a
    language's fertility is the integer ratio of its own totals."""
    from flink_real_time_data_warehouse_spark.queries import registry
    from flink_real_time_data_warehouse_spark.tables import table

    from .conftest import TEST_SF_DIR

    per_doc = registry()["bpe_tokenize"].spark(spark, TEST_SF_DIR).collect()
    langs = {
        r["doc_id"]: r["lang"]
        for r in table(spark, TEST_SF_DIR, "documents").select("doc_id", "lang").collect()
    }
    want: dict[str, list[int]] = {}
    for r in per_doc:
        acc = want.setdefault(langs[r["doc_id"]], [0, 0])
        acc[0] += r["word_ct"]
        acc[1] += r["bpe_ct"]
    got = registry()["tokenizer_fertility"].spark(spark, TEST_SF_DIR).collect()
    assert {r["lang"] for r in got} == set(want)
    for r in got:
        w, p = want[r["lang"]]
        assert (r["word_ct"], r["piece_ct"]) == (w, p), r["lang"]
        assert r["fertility_milli"] == p * 1000 // w
        assert r["fertility_milli"] >= 1000
