"""Property-based tests (hypothesis) for the cross-engine determinism
invariants the oracle methodology rests on."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.datapipe.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingles_from_tokens,
    tokens,
)
from flink_real_time_data_warehouse_spark.functions.money import cents, sql_cents

money_floats = st.floats(min_value=0.0, max_value=1e9, allow_nan=False, allow_infinity=False)


@settings(max_examples=8, deadline=None)
@given(st.lists(money_floats, min_size=1, max_size=64))
def test_cents_matches_duckdb_bitwise(spark_global, values):
    """floor(x*100+0.5) as BIGINT must agree between Spark and DuckDB for
    any non-negative double — the foundation of every money oracle."""
    spark = spark_global
    sp = (
        spark.createDataFrame([Row(x=float(v)) for v in values])
        .select(cents(F.col("x")).alias("c"))
        .toPandas()["c"]
        .tolist()
    )
    con = duckdb.connect()
    du = [
        con.sql(f"SELECT {sql_cents('CAST(? AS DOUBLE)')}", params=[float(v)]).fetchone()[0]
        for v in values
    ]
    assert sp == du


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="abc ", min_size=0, max_size=40), min_size=1, max_size=16))
def test_shingle_count_invariant(spark_global, texts):
    """|shingles(t)| == 0 if tokens < 3 else <= tokens-2 (distinct)."""
    spark = spark_global
    df = spark.createDataFrame([Row(t=s) for s in texts])
    rows = df.select(
        F.size(tokens(F.col("t"))).alias("n"),
        F.size(shingles_from_tokens(tokens(F.col("t")))).alias("s"),
    ).collect()
    for r in rows:
        if r["n"] < 3:
            assert r["s"] == 0
        else:
            assert 1 <= r["s"] <= r["n"] - 2


def test_minhash_identical_docs_always_collide(spark_global):
    """Jaccard-1 pairs must survive LSH banding (P[collide] = 1)."""
    spark = spark_global
    text = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=text), Row(doc_id=2, text=text),
         Row(doc_id=3, text="completely different words in this one here that never overlap at all")]
    )
    pairs = lsh_candidate_pairs(minhash_signatures(docs, "doc_id", "text")).collect()
    assert (1, 2) in {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert all({r["doc_a"], r["doc_b"]} != {1, 3} for r in pairs)


def test_ngram_jaccard_hot_shingle_cap(spark_global):
    """The doc-frequency cap must drop boilerplate-only pairs (shingles
    shared by > cap docs are stop-shingles) while genuine near-dups keep
    their pairs; cap=None recovers the exact uncapped semantics."""
    from flink_real_time_data_warehouse_spark.datapipe.dedup import ngram_jaccard_pairs

    spark = spark_global
    rows = [
        # 8 docs that only share a boilerplate prefix (3 shared shingles,
        # jaccard 3/5 = 0.6 pairwise when uncapped)
        *[Row(doc_id=i, text=f"common boiler plate words here uniq{i}") for i in range(1, 9)],
        # one genuine identical pair, shingle df = 2
        Row(doc_id=101, text="alpha beta gamma delta epsilon"),
        Row(doc_id=102, text="alpha beta gamma delta epsilon"),
    ]
    docs = spark.createDataFrame(rows)
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5, doc_freq_cap=4).collect()
    }
    assert capped == {(101, 102)}, capped
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5, doc_freq_cap=None).collect()
    }
    assert (101, 102) in uncapped
    assert len(uncapped) == 1 + 28  # the pair + C(8,2) boilerplate pairs


def test_minhash_hot_bucket_cap_bounds_candidates(spark_global):
    """A boilerplate bucket holding most of the corpus must not explode the
    candidate join: with the cap on, every band bucket of the 40 identical
    docs is saturated and dropped, so they contribute ZERO candidate pairs,
    while an unsaturated genuine pair survives; cap=None recovers the exact
    uncapped semantics (C(40,2) + 1 pairs)."""
    spark = spark_global
    giant = "exactly the same boilerplate text repeated across the whole corpus"
    rows = [
        *[Row(doc_id=i, text=giant) for i in range(1, 41)],
        Row(doc_id=101, text="alpha beta gamma delta epsilon zeta eta theta"),
        Row(doc_id=102, text="alpha beta gamma delta epsilon zeta eta theta"),
    ]
    sig = minhash_signatures(spark.createDataFrame(rows), "doc_id", "text")
    capped = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sig, bucket_cap=10).collect()}
    assert capped == {(101, 102)}, capped
    uncapped = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sig).collect()}
    assert (101, 102) in uncapped
    assert len(uncapped) == 1 + 40 * 39 // 2


def test_sign_lsh_hot_bucket_cap_bounds_candidates(spark_global):
    """Same guard on the embedding path: a near-constant region saturating
    one sign bucket contributes no candidate pairs when capped; a small
    genuine pair with opposite signs (different buckets) survives."""
    from flink_real_time_data_warehouse_spark.datapipe.similarity import (
        sign_lsh_near_dup_pairs,
    )

    spark = spark_global
    up = [1.0] * 64
    down = [-1.0] * 64
    rows = [
        *[Row(vec_id=i, embedding=up) for i in range(1, 41)],
        Row(vec_id=101, embedding=down),
        Row(vec_id=102, embedding=[-1.0] * 63 + [-0.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = {
        (r["ia"], r["ib"])
        for r in sign_lsh_near_dup_pairs(emb, 0.45, bucket_cap=10).collect()
    }
    assert capped == {(101, 102)}, capped
    uncapped = {
        (r["ia"], r["ib"]) for r in sign_lsh_near_dup_pairs(emb, 0.45).collect()
    }
    assert (101, 102) in uncapped
    assert len(uncapped) == 1 + 40 * 39 // 2


def test_semantic_dedup_keeps_edge_examples(spark_global):
    """SemDeDup keep rule: of each within-cluster similar pair, the member
    NEARER its centroid is dropped (edge examples preserve diversity) and
    pairs are only ever compared inside their own cluster."""
    from flink_real_time_data_warehouse_spark.datapipe.similarity import semantic_dedup

    spark = spark_global
    c0 = [1.0] * 32 + [0.0] * 32
    c1 = [0.0] * 32 + [1.0] * 32
    rows = [
        Row(vec_id=0, embedding=c0),  # centroid 0, cs=1.0
        Row(vec_id=1, embedding=c1),  # centroid 1, cs=1.0
        Row(vec_id=10, embedding=[1.0] * 32 + [0.1] * 32),  # cluster 0, central
        Row(vec_id=11, embedding=[1.0] * 32 + [0.2] * 32),  # cluster 0, edge
        Row(vec_id=20, embedding=[0.1] * 32 + [1.0] * 32),  # cluster 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: (r["cid"], r["verdict"])
        for r in semantic_dedup(emb, 0.99, k=2).collect()
    }
    # sims: (0,10)=.9951 (10,11)=.9954 (1,20)=.9951 all >= .99; (0,11)=.981 < .99.
    # Each pair drops its more-central member: 0 (cs 1.0 > 10's), 10
    # (cs .9951 > 11's .981), 1 (cs 1.0 > 20's). Edge members 11 and 20 survive.
    assert out == {
        0: (0, "drop"),
        10: (0, "drop"),
        11: (0, "keep"),
        1: (1, "drop"),
        20: (1, "keep"),
    }, out


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="ab 一二三四", min_size=0, max_size=20), min_size=1, max_size=8))
def test_mixed_tokens_matches_duckdb(spark_global, texts):
    """F9 tokenizer: latin-word + CJK-bigram segmentation must agree with
    the DuckDB formulation for arbitrary mixed text (the invariant
    keyword_stats_cjk's oracle rests on)."""
    from flink_real_time_data_warehouse_spark.functions.tokenize import mixed_tokens

    spark = spark_global
    df = spark.createDataFrame([Row(i=i, t=s) for i, s in enumerate(texts)])
    sp = {r["i"]: r["w"] for r in df.select("i", mixed_tokens(F.col("t")).alias("w")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        got = con.execute(
            """
            SELECT list_concat(
              regexp_extract_all(lower(?), '[a-z0-9]+'),
              flatten(list_transform(regexp_extract_all(?, '[一-鿿]+'),
                r -> CASE WHEN length(r) = 1 THEN [r]
                          ELSE list_transform(range(1, length(r)),
                                              i -> substr(r, CAST(i AS INTEGER), 2))
                     END)))
            """,
            [t, t],
        ).fetchone()[0]
        assert sp[i] == got


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="ab 实时数据仓库流处理引擎学习机器今天鑫", min_size=0, max_size=16), min_size=1, max_size=6))
def test_dict_tokens_matches_python_fmm(spark_global, texts):
    """F9 dictionary tokenizer: the Arrow-batched UDF must agree with the
    pure-python forward-maximum-matching reference on arbitrary mixed text
    (the invariant keyword_stats_dict's recursive-CTE oracle replays —
    alphabet includes in-lexicon words, their prefixes, and an OOV char)."""
    import re

    from flink_real_time_data_warehouse_spark.functions.cjk_lexicon import fmm_segment
    from flink_real_time_data_warehouse_spark.functions.tokenize import dict_tokens

    spark = spark_global
    df = spark.createDataFrame([Row(i=i, t=s) for i, s in enumerate(texts)])
    seg = dict_tokens()
    got = {r["i"]: r["w"] for r in df.select("i", seg(F.col("t")).alias("w")).collect()}
    for i, t in enumerate(texts):
        want = re.findall(r"[a-z0-9]+", t.lower())
        for run in re.findall("[一-鿿]+", t):
            want.extend(fmm_segment(run))
        assert got[i] == want, (t, got[i], want)


def test_fmm_vs_bmm_divergence_pinned():
    """Overlap ambiguity is FMM's documented failure mode: these fixtures
    (now in the graded CJK_PHRASES) make greedy forward matching and
    backward matching genuinely disagree. The engine ships FMM (mirrored
    by the recursive-CTE oracle); this test pins BOTH outputs so the
    greedy choice is a recorded decision, not an accident. IK smart mode
    (reference KeywordUtil.java:14-34) arbitrates exactly these."""
    from flink_real_time_data_warehouse_spark.functions.cjk_lexicon import (
        bmm_segment,
        fmm_segment,
    )

    cases = {
        # run: (FMM — shipped, BMM — the foil)
        "研究生命起源": (["研究生", "命", "起源"], ["研究", "生命", "起源"]),
        "发展中国家": (["发展", "中国", "家"], ["发展", "中", "国家"]),
        "中国人工智能": (["中国人", "工", "智能"], ["中国", "人工", "智能"]),
        "结合成分子": (["结合", "成分", "子"], ["结", "合成", "分子"]),
    }
    for run, (fwd, bwd) in cases.items():
        assert fmm_segment(run) == fwd, run
        assert bmm_segment(run) == bwd, run
        assert fwd != bwd  # each case is a real divergence
        # a multi-char word the pre-ambiguity lexicon missed comes out whole
    assert "研究生" in fmm_segment("研究生命起源")


def test_vendored_lexicon_changes_segmentation():
    """Each lexicon growth tier must materially change segmentation — the
    graded fixture phrases where a bigger dictionary produces different
    (better) words, proving each tranche is load-bearing, not cosmetic:
    seed core -> r5 vendored list -> r6 growth slices. Also pins that
    AMBIGUITY_EXCLUDED keeps the excluded compounds out."""
    from flink_real_time_data_warehouse_spark.functions.cjk_lexicon import (
        AMBIGUITY_EXCLUDED,
        SEED_WORDS,
        VENDORED_WORDS,
        VENDORED_WORDS_CORE,
        WORDS,
        fmm_segment,
    )

    assert len(VENDORED_WORDS_CORE) >= 1000
    assert len(VENDORED_WORDS) >= 5 * len(VENDORED_WORDS_CORE), (
        "round-6 growth slice missing: the full lexicon should dwarf the r5 core"
    )
    assert not (WORDS & AMBIGUITY_EXCLUDED)

    def fmm_with(lexicon, run):
        out, pos, n = [], 0, len(run)
        mx = max(map(len, lexicon))
        while pos < n:
            for length in range(min(mx, n - pos), 1, -1):
                if run[pos : pos + length] in lexicon:
                    out.append(run[pos : pos + length])
                    pos += length
                    break
            else:
                out.append(run[pos])
                pos += 1
        return out

    core = (SEED_WORDS | VENDORED_WORDS_CORE) - AMBIGUITY_EXCLUDED

    # fixture 1 (r6): the grown dict's 自然语言 out-lengthens the r5
    # core's 自然|语言 — three dictionary tiers, three segmentations.
    assert fmm_segment("自然语言理解技术") == ["自然语言", "理解", "技术"]
    assert fmm_with(core, "自然语言理解技术") == ["自然", "语言", "理解", "技术"]
    assert fmm_with(SEED_WORDS, "自然语言理解技术") == list("自然语言理解技术")
    # fixture 2 (r6): 网络安全 out-lengthens the r5 core's 网络|安全,
    # which itself out-lengthened seed's 计算|机 single chars.
    assert fmm_segment("计算机网络安全技术") == ["计算机", "网络安全", "技术"]
    assert fmm_with(core, "计算机网络安全技术") == ["计算机", "网络", "安全", "技术"]
    assert fmm_with(SEED_WORDS, "计算机网络安全技术") == [
        "计算", "机", "网络", "安", "全", "技", "术",
    ]
    # round-8 fixtures (EXT24-28 growth tranche, graded via CJK_PHRASES):
    # the r8 words must CHANGE segmentation vs the full pre-r8 dict.
    from flink_real_time_data_warehouse_spark.functions.cjk_lexicon import (
        WORDS_PRE_R8,
    )

    # fixture 3 (r8): 歌剧院 out-lengthens pre-r8's 歌剧|院.
    assert fmm_segment("歌剧院交响乐演出") == ["歌剧院", "交响乐", "演出"]
    assert fmm_with(WORDS_PRE_R8, "歌剧院交响乐演出") == [
        "歌剧", "院", "交响乐", "演出",
    ]
    # fixture 4 (r8): 鱼竿 and 浮漂 assemble from three pre-r8 singles.
    assert fmm_segment("垂钓鱼竿浮漂") == ["垂钓", "鱼竿", "浮漂"]
    assert fmm_with(WORDS_PRE_R8, "垂钓鱼竿浮漂") == [
        "垂钓", "鱼", "竿", "浮", "漂",
    ]
    # the tranche is real growth, not shuffling
    assert len(WORDS) - len(WORDS_PRE_R8) >= 2000


@settings(max_examples=10, deadline=None)
@given(st.text(alphabet="研究生命起源发展中国家人工智能结合成分子实时数据仓库鑫", min_size=0, max_size=24))
def test_fmm_bmm_segmentations_reconstruct(run):
    """Both matchers must produce a lossless cover of the input (order-
    preserving concatenation identity) for arbitrary ambiguous text —
    divergence is allowed, dropping or duplicating characters is not."""
    from flink_real_time_data_warehouse_spark.functions.cjk_lexicon import (
        bmm_segment,
        fmm_segment,
    )

    assert "".join(fmm_segment(run)) == run
    assert "".join(bmm_segment(run)) == run


@settings(max_examples=4, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", min_size=1, max_size=30), min_size=2, max_size=10))
def test_simhash_banding_lossless(spark_global, texts):
    """Pigeonhole banding must return EXACTLY the Hamming<=3 pairs — the
    chunk equi-join is an optimization, never a filter."""
    from flink_real_time_data_warehouse_spark.datapipe.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    spark = spark_global
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup_pairs(df, "doc_id", "text", 3).collect()
    }
    sig = {
        r["doc"]: (r["sig_hi"], r["sig_lo"])
        for r in simhash_signatures(df, "doc_id", "text").collect()
    }
    brute = set()
    for a in sig:
        for b in sig:
            if a < b:
                d = bin(sig[a][0] ^ sig[b][0]).count("1") + bin(sig[a][1] ^ sig[b][1]).count("1")
                if d <= 3:
                    brute.add((a, b, d))
    assert got == brute


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(alphabet="abc ", min_size=0, max_size=30), min_size=1, max_size=10))
def test_repetition_stats_invariants(spark_global, texts):
    """Structural invariants of the repetition metrics for arbitrary text:
    counts bounded by token counts, fractions in (0, 1], undefined exactly
    when the denominator is empty (incl. zero-token documents)."""
    from flink_real_time_data_warehouse_spark.datapipe.curation import repetition_stats

    spark = spark_global
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    for r in repetition_stats(df, "doc_id", "text").collect():
        n = r["n_tokens"]
        assert 0 <= r["top_token_ct"] <= n
        assert 0 <= r["top_bigram_ct"] <= max(0, n - 1)
        if n == 0:
            assert r["distinct_frac"] is None and r["top_token_frac"] is None
        else:
            assert 0 < r["distinct_frac"] <= 1
            assert 0 < r["top_token_frac"] <= 1
        if n <= 1:
            assert r["top_bigram_frac"] is None
        else:
            assert 0 < r["top_bigram_frac"] <= 1


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50, unique=True))
def test_train_split_matches_duckdb_buckets(spark_global, ids):
    """The md5 hash-bucket must agree between Spark and the DuckDB hex-parse
    formulation for arbitrary ids — the invariant train_split's oracle
    rests on."""
    from flink_real_time_data_warehouse_spark.datapipe.curation import hash_bucket

    spark = spark_global
    df = spark.createDataFrame([Row(doc_id=i) for i in ids])
    sp = {r["doc_id"]: r["b"] for r in df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()}
    con = duckdb.connect()
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    for i in ids:
        got = con.execute(
            f"SELECT ({terms}) % 100 FROM (SELECT md5('split:' || CAST(? AS VARCHAR)) AS h)",
            [i],
        ).fetchone()[0]
        assert sp[i] == got


word = st.text(alphabet="abcdefg", min_size=1, max_size=5)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.lists(word, min_size=1, max_size=12), min_size=1, max_size=10))
def test_lm_surprisal_matches_exact_model(spark_global, docs):
    """bits_per_token must equal the pure-Python unigram bit-surprisal
    model (floor-log2 via bit_length) for arbitrary corpora; identical
    docs score identically."""
    from flink_real_time_data_warehouse_spark.datapipe.quality import lm_surprisal

    spark = spark_global
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(docs)]
    )
    got = {
        r["doc_id"]: (r["surprisal_bits"], r["token_ct"])
        for r in lm_surprisal(df, "doc_id", "text").collect()
    }

    from collections import Counter

    toks = [w for ws in docs for w in ws]
    cnt = Counter(toks)
    total = len(toks)
    for i, ws in enumerate(docs):
        bits = sum(total.bit_length() - cnt[w].bit_length() for w in ws)
        assert got[i] == (bits, len(ws)), (i, got[i], bits)


def test_cube_sales_marginals_consistent(spark_global):
    """CUBE output must be internally consistent: the grand total equals
    the sum of the per-status margin rows, which equals the sum of the
    detail rows."""
    from flink_real_time_data_warehouse_spark.queries import registry

    from .conftest import TEST_SF_DIR

    rows = registry()["cube_sales"].spark(spark_global, TEST_SF_DIR).collect()
    detail = [r for r in rows if r["gid"] == 0]
    status_margin = [r for r in rows if r["gid"] == 1]  # priority rolled up
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    assert grand[0]["order_ct"] == sum(r["order_ct"] for r in detail)
    assert grand[0]["order_ct"] == sum(r["order_ct"] for r in status_margin)
    assert abs(grand[0]["total_amount"] - sum(r["total_amount"] for r in detail)) < 1e-6


def test_moving_avg_window_semantics(spark_global):
    """The RANGE frame must cover at most 7 calendar days and exactly the
    days present in [d-6, d]; ma7 equals the mean of those days' gmv."""
    from flink_real_time_data_warehouse_spark.queries import registry

    from .conftest import TEST_SF_DIR

    rows = registry()["moving_avg_gmv"].spark(spark_global, TEST_SF_DIR).collect()
    from datetime import date

    by_day = {date.fromisoformat(r["dt"]): r for r in rows}
    for d, r in by_day.items():
        window = [
            by_day[x]["gmv"]
            for x in by_day
            if 0 <= (d - x).days <= 6
        ]
        assert r["days_in_window"] == len(window)
        assert 1 <= r["days_in_window"] <= 7
        assert abs(r["ma7"] - sum(window) / len(window)) < 1e-6


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(alphabet="abc d", min_size=6, max_size=40), min_size=1, max_size=8))
def test_minhash_projection_equals_agg_form(spark_global, texts):
    """The zero-shuffle staged-projection signature
    (minhash_signature_frame, the streaming form) must equal the
    explode+groupBy form (minhash_signatures, the batch form) for every
    doc with shingles — the invariant dedup_minhash_stream's oracle rests
    on. (Regression guard: F.transform binds 2-arg lambdas as
    (element, index), which silently corrupts loop-variable-default
    closures.)"""
    from flink_real_time_data_warehouse_spark.datapipe.dedup import (
        NUM_HASHES,
        minhash_signature_frame,
        minhash_signatures,
    )

    spark = spark_global
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    proj = {
        r["doc"]: tuple(r[f"sig_{i}"] for i in range(NUM_HASHES))
        for r in minhash_signature_frame(df, "doc_id", "text").collect()
    }
    agg = {
        r["doc"]: tuple(r[f"sig_{i}"] for i in range(NUM_HASHES))
        for r in minhash_signatures(df, "doc_id", "text").collect()
    }
    assert proj == agg


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # user
            st.integers(min_value=0, max_value=50),  # ts seconds
            st.sampled_from(["a", "b", "c"]),        # status
        ),
        min_size=1,
        max_size=25,
    )
)
def test_scd2_intervals_partition_timeline(spark_global, changes):
    """SCD2 invariants for arbitrary change streams: per key, intervals
    are non-overlapping, chain exactly (each valid_to = next valid_from),
    exactly one open interval per key, and consecutive intervals always
    differ in status."""
    from datetime import datetime, timedelta

    from flink_real_time_data_warehouse_spark.operators.scd import scd2_history

    spark = spark_global
    base = datetime(2024, 1, 1)
    rows = [
        Row(user_id=u, status=s, ts=base + timedelta(seconds=t), event_id=i)
        for i, (u, t, s) in enumerate(changes)
    ]
    out = scd2_history(
        spark.createDataFrame(rows), ["user_id"], "ts", ["status"], "event_id"
    ).collect()

    far_future = datetime(9999, 1, 1)
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for u, ivs in by_user.items():
        # zero-length intervals (same-ts changes) sort before the row that
        # supersedes them at the same valid_from
        ivs.sort(key=lambda r: (r.valid_from, r.valid_to or far_future))
        opens = [r for r in ivs if r.valid_to is None]
        assert len(opens) == 1 and ivs[-1].valid_to is None
        assert all(bool(r.is_current) == (r.valid_to is None) for r in ivs)
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # chained: no gap, no overlap
            if a.valid_from != a.valid_to:
                # non-degenerate neighbors must differ (duplicate-suppressed)
                assert a.status != b.status


def test_lexicon_tranches_14_15_change_segmentation():
    """The continuation-session growth slices are load-bearing, not
    cosmetic: tranche 14's 天气预报 out-lengthens the pre-14 dict's
    天气|预|报, and tranche 15's 小提琴曲 out-lengthens 小提|琴|曲 —
    three dictionary tiers, three different segmentations (the same
    proof shape the earlier tranches carry)."""
    import re

    from flink_real_time_data_warehouse_spark.functions import cjk_lexicon_data as data
    from flink_real_time_data_warehouse_spark.functions.cjk_lexicon import (
        AMBIGUITY_EXCLUDED,
        SEED_WORDS,
        VENDORED_WORDS_CORE,
        fmm_segment,
    )

    word_re = re.compile(r"^[一-鿿]{2,4}$")

    def tranche(*names):
        return {
            w
            for n in names
            for w in getattr(data, n).split()
            if word_re.match(w)
        }

    pre14 = (
        SEED_WORDS
        | VENDORED_WORDS_CORE
        | tranche(*[f"VENDORED_WORDS_TEXT_EXT{i}" for i in range(2, 14)])
    ) - AMBIGUITY_EXCLUDED
    pre15 = pre14 | tranche("VENDORED_WORDS_TEXT_EXT14")

    def fmm_with(lex, run):
        out, pos, n = [], 0, len(run)
        mx = max(map(len, lex))
        while pos < n:
            for length in range(min(mx, n - pos), 1, -1):
                if run[pos : pos + length] in lex:
                    out.append(run[pos : pos + length])
                    pos += length
                    break
            else:
                out.append(run[pos])
                pos += 1
        return out

    assert fmm_with(pre14, "天气预报准确") == ["天气", "预", "报", "准确"]
    assert fmm_with(pre15, "天气预报准确") == ["天气预报", "准确"]
    assert fmm_segment("天气预报准确") == ["天气预报", "准确"]
    assert fmm_with(pre15, "演奏小提琴曲") == ["演奏", "小提", "琴", "曲"]
    assert fmm_segment("演奏小提琴曲") == ["演奏", "小提琴曲"]


# ---------------------------------------------------------------------------
# TxLog model-based test: random verb sequences vs a dict model
# ---------------------------------------------------------------------------

_txlog_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 7)),
        st.tuples(st.just("merge"), st.integers(0, 39)),
        st.tuples(st.just("delete"), st.integers(0, 39)),
        st.tuples(st.just("dvdel"), st.integers(0, 39)),
        st.tuples(st.just("cdc"), st.integers(0, 39)),
        st.tuples(st.just("update"), st.integers(0, 39)),
        st.tuples(st.just("rename"), st.integers(0, 1)),
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=6, deadline=None)
@given(ops=_txlog_ops, use_identity=st.booleans())
def test_txlog_verbs_match_dict_model(
    spark_global, tmp_path_factory, ops, use_identity
):
    """MODEL-BASED check of the whole verb set: any sequence of
    append / merge (type-1 upsert) / range delete / DV delete / apply_cdc
    / range update / column rename must leave the table equal to the same
    sequence applied to a plain dict — the executable spec of the commit
    protocol's read-modify-write semantics (file-level pruning, deletion
    vectors, column mapping, OCC, stats bookkeeping are all invisible to
    it, which is exactly the point). The rename verb TOGGLES the value
    column's logical name mid-sequence, so every later verb must keep
    working through the mapping (and the rename-back collapses it).

    The IDENTITY toggle (r7 verdict task 4) registers a surrogate-key
    column before the sequence: the dict model is blind to it, but after
    ANY verb mix the allocated ids must be non-null, table-wide unique,
    on the (start, step) lattice, and bounded by the committed
    watermark — the invariants that hold iff every write path allocates
    atomically and none rewinds the mark."""
    from flink_real_time_data_warehouse_spark.storage import TxLog

    spark = spark_global
    log = TxLog(str(tmp_path_factory.mktemp("txmodel") / "t"))
    if use_identity:
        log.add_identity_column("sid", start=7, step=3)
    model: dict[int, int] = {}
    vcol = "v"  # current logical name of the value column
    # append is a MULTISET add, not an upsert: its keys live in their own
    # space (2000+) so the dict model stays valid — merge/delete/cdc share
    # the low key space and exercise the read-modify-write interplay.
    next_base = 2000
    for i, (op, arg) in enumerate(ops):
        if op == "append":
            lo = next_base
            next_base += 10
            rows = [(k, k * 100 + i) for k in range(lo, lo + 5 + arg % 3)]
            log.append(
                spark.createDataFrame(rows, f"k long, {vcol} long").coalesce(1),
                stats_cols=["k"],
            )
            model.update({k: v for k, v in rows})
        elif op == "merge":
            rows = [(arg + d, -(i * 100 + d)) for d in range(3)]
            log.merge(
                spark, spark.createDataFrame(rows, f"k long, {vcol} long"), "k"
            )
            model.update({k: v for k, v in rows})
        elif op == "delete":
            log.delete(spark, "k", arg, arg + 4)
            model = {k: v for k, v in model.items() if not arg <= k <= arg + 4}
        elif op == "dvdel":
            # deletion-vector delete: same logical spec as delete, zero
            # rewrites physically — the model can't tell, which is the point
            log.delete_to_dv(spark, "k", arg, arg + 4)
            model = {k: v for k, v in model.items() if not arg <= k <= arg + 4}
        elif op == "update":
            # guard on SCHEMA, not version: with the identity toggle, v0
            # is the registration property commit and carries no schema
            if log.state().schema_json is not None:
                log.update(spark, "k", arg, arg + 4, {vcol: f"{vcol} + 1000000"})
            model = {
                k: (v + 1000000 if arg <= k <= arg + 4 else v)
                for k, v in model.items()
            }
        elif op == "rename":
            if log.state().schema_json is not None:
                new = "val" if vcol == "v" else "v"
                log.rename_column(vcol, new)
                vcol = new
        else:  # cdc: one upsert, one delete, one insert
            ch = [
                (arg, -1, "u"),
                (arg + 1, None, "d"),
                (1000 + i, i, "i"),
            ]
            log.apply_cdc(
                spark,
                spark.createDataFrame(ch, f"k long, {vcol} long, op string"),
                "k",
            )
            model[arg] = -1
            model.pop(arg + 1, None)
            model[1000 + i] = i
    if log.state().schema_json is None:
        # every op was a no-op on a schema-less table (e.g. a lone
        # disjoint delete, or a rename before any data commit): no
        # schema exists and snapshot() rightly raises (with identity,
        # v0 is the registration property commit, still schema-less)
        assert model == {}
        return
    rows = log.snapshot(spark).collect()
    got = {r["k"]: r[vcol] for r in rows}
    assert got == model
    if use_identity and rows:
        sids = [r["sid"] for r in rows]
        assert all(s is not None for s in sids)
        assert len(set(sids)) == len(sids), "surrogate ids must stay unique"
        assert all((s - 7) % 3 == 0 and s >= 7 for s in sids)
        high = log.identity_columns()["sid"]["high"]
        assert high is not None and max(sids) <= high


def test_band_clusters_exact_cap_bound(spark_global):
    """The hot-cluster guard's bound is EXACT: after banding, no (cid,
    sub) group exceeds the cap, even when every row lands in one cluster
    — the guarantee a hash-mod split cannot give (r6 verdict task 6)."""
    from pyspark.sql import functions as F

    from flink_real_time_data_warehouse_spark.datapipe.similarity import band_clusters

    spark = spark_global
    # one pathological cluster of 97 members + a small one of 3
    m = spark.createDataFrame(
        [(i, 0 if i < 97 else 1) for i in range(100)], "vec_id long, cid long"
    )
    banded = band_clusters(m, cap=10, cluster_col="cid", order_col="vec_id")
    sizes = banded.groupBy("cid", "sub").count().collect()
    assert max(r["count"] for r in sizes) <= 10
    # 97 members -> bands of 10,10,...,7; deterministic band ids 0..9
    assert sorted(r["sub"] for r in sizes if r["cid"] == 0) == list(range(10))
    # banding is a pure function of (cid, order col): re-run is identical
    again = band_clusters(m, cap=10, cluster_col="cid", order_col="vec_id")
    assert sorted(map(tuple, banded.collect())) == sorted(map(tuple, again.collect()))


def test_semantic_dedup_cap_only_widens_keeps(spark_global):
    """The cap's recall contract: band-straddling pairs are the ONLY
    comparisons skipped, so capped keeps ⊇ uncapped keeps and every
    capped drop is also an uncapped drop — on a corpus engineered so one
    giant cluster of near-duplicates must split into many bands."""
    from flink_real_time_data_warehouse_spark.datapipe.similarity import semantic_dedup

    spark = spark_global
    base = [1.0] * 32 + [0.0] * 32
    other = [0.0] * 32 + [1.0] * 32
    rows = [Row(vec_id=0, embedding=base), Row(vec_id=1, embedding=other)]
    # 60 near-dup members of cluster 0 (tiny deterministic perturbations)
    rows += [
        Row(vec_id=10 + i, embedding=[1.0] * 32 + [0.001 * (i % 7)] * 32)
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = {
        r["vec_id"]: r["verdict"]
        for r in semantic_dedup(emb, 0.99, k=2).collect()
    }
    capped = {
        r["vec_id"]: r["verdict"]
        for r in semantic_dedup(emb, 0.99, k=2, cluster_cap=8).collect()
    }
    assert set(capped) == set(uncapped)  # same corpus coverage
    keeps_un = {v for v, verdict in uncapped.items() if verdict == "keep"}
    keeps_cap = {v for v, verdict in capped.items() if verdict == "keep"}
    assert keeps_un <= keeps_cap  # cap can only widen the keep set
    assert len(keeps_cap) > len(keeps_un)  # and here it provably does


def test_smart_mode_resolves_divergences_by_rule():
    """IK-smart-mode arbitration (cjk_lexicon.smart_segment, r6 verdict
    task 5): every pinned FMM-vs-BMM divergence is resolved by the
    comparison heuristic — not by a per-case pin — and the rule that
    fires is itself asserted (fewer single-char fragments for the two
    over-eaten compounds, the BMM default for the true ties). Agreement
    cases pass through untouched."""
    from flink_real_time_data_warehouse_spark.functions.cjk_lexicon import (
        bmm_segment,
        fmm_segment,
        smart_segment,
    )

    # rule 3 (fewer singles) picks BMM — the linguistically-right splits
    for run, want in {
        "研究生命起源": ["研究", "生命", "起源"],
        "中国人工智能": ["中国", "人工", "智能"],
    }.items():
        f, b = fmm_segment(run), bmm_segment(run)
        assert len(f) == len(b)  # word counts tie ...
        assert sum(len(w) == 1 for w in b) < sum(len(w) == 1 for w in f)
        assert smart_segment(run) == b == want  # ... singles decide
    # rule 4 (tie -> BMM) for the genuinely balanced cases
    for run in ("发展中国家", "结合成分子"):
        f, b = fmm_segment(run), bmm_segment(run)
        assert len(f) == len(b)
        assert sum(len(w) == 1 for w in f) == sum(len(w) == 1 for w in b)
        assert smart_segment(run) == b
    # rule 2 (fewer words wins) both directions
    assert smart_segment("实时数据仓库") == ["实时", "数据仓库"]  # f == b
    # agreement needs no arbitration and singles never degrade coverage
    for run in ("今天天气", "数据管道质量检测", "鑫"):
        assert "".join(smart_segment(run)) == run


def test_r7_lexicon_tranches_change_segmentation():
    """Round-7 tranches (EXT18-EXT23, ≥2,000 net-new entries: medicine,
    law, idioms, literary verbs/adjectives, cuisine, culture, 3-char
    compounds) are load-bearing: on the fixture phrases — two of them now
    in the graded CJK_PHRASES — the pre-r7 lexicon fragments into single
    characters where the grown dictionary produces the real compound."""
    import re

    from flink_real_time_data_warehouse_spark.functions import cjk_lexicon_data as d
    from flink_real_time_data_warehouse_spark.functions.cjk_lexicon import (
        AMBIGUITY_EXCLUDED,
        SEED_WORDS,
        VENDORED_WORDS_CORE,
        fmm_segment,
        smart_segment,
    )

    word_re = re.compile(r"^[一-鿿]{2,4}$")
    r7 = tuple(f"VENDORED_WORDS_TEXT_EXT{i}" for i in range(18, 24))
    new = {
        w for n in r7 for w in getattr(d, n).split() if word_re.match(w)
    }
    pre = (
        SEED_WORDS
        | VENDORED_WORDS_CORE
        | {
            w
            for n in dir(d)
            if n.startswith("VENDORED_WORDS_TEXT_EXT") and n not in r7
            for w in getattr(d, n).split()
            if word_re.match(w)
        }
    ) - AMBIGUITY_EXCLUDED
    assert len(new - pre) >= 2000  # the r6 verdict's tranche floor

    def fmm_with(lexicon, run):
        out, pos, n = [], 0, len(run)
        mx = max(map(len, lexicon))
        while pos < n:
            for length in range(min(mx, n - pos), 1, -1):
                if run[pos : pos + length] in lexicon:
                    out.append(run[pos : pos + length])
                    pos += length
                    break
            else:
                out.append(run[pos])
                pos += 1
        return out

    # fixture 1 (graded via CJK_PHRASES): 领头羊 assembles from singles
    assert fmm_with(pre, "公司领头羊") == ["公司", "领", "头", "羊"]
    assert fmm_segment("公司领头羊") == ["公司", "领头羊"]
    # fixture 2 (graded via CJK_PHRASES): 心电图 assembles from singles
    assert fmm_with(pre, "医院心电图检查") == ["医院", "心", "电", "图", "检查"]
    assert fmm_segment("医院心电图检查") == ["医院", "心电图", "检查"]
    # idiom tranche: a 4-char chengyu comes out whole
    assert fmm_with(pre, "龙马精神") == ["龙", "马", "精神"]
    assert fmm_segment("龙马精神") == ["龙马精神"]
    # smart mode agrees on the new compounds (no spurious arbitration)
    assert smart_segment("公司领头羊") == ["公司", "领头羊"]
    assert smart_segment("医院心电图检查") == ["医院", "心电图", "检查"]


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=24), min_size=1, max_size=6))
def test_uniform_cost_viterbi_lower_bounds_greedy_munch(spark_global, texts):
    """One word per doc, SAME piece inventory, UNIFORM costs. Per word:
    (a) if greedy munch succeeds, that segmentation is feasible for
    Viterbi too, so Viterbi succeeds with AT MOST as many pieces (it
    minimizes piece count under uniform costs); (b) if Viterbi says UNK
    the word is unreachable by ANY segmentation, so munch is UNK too.
    The converse of (b) is false by design — greedy can dead-end on
    reachable words — which is exactly why both tokenizers exist."""
    from flink_real_time_data_warehouse_spark.datapipe.bpe import (
        bpe_train,
        unigram_piece_counts,
        wordpiece_piece_counts,
        wordpiece_vocab,
    )

    spark = spark_global
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs, "text", n_merges=3)
    vocab = wordpiece_vocab(docs, "text", merges)
    costs = vocab.select("piece", F.lit(7).cast("long").alias("cost"))
    wp = {
        r["doc_id"]: r
        for r in wordpiece_piece_counts(
            docs, "doc_id", "text", merges, vocab=vocab
        ).collect()
    }
    ug = {
        r["doc_id"]: r
        for r in unigram_piece_counts(
            docs, "doc_id", "text", merges, costs=costs
        ).collect()
    }
    assert wp.keys() == ug.keys()
    for d in wp:
        assert wp[d]["word_ct"] == ug[d]["word_ct"] == 1
        if wp[d]["unk_ct"] == 0:
            assert ug[d]["unk_ct"] == 0, d
            assert ug[d]["up_ct"] <= wp[d]["wp_ct"], d
        if ug[d]["unk_ct"] == 1:
            assert wp[d]["unk_ct"] == 1, d


# --- URL canonicalization properties (round-10 continuation) ---

_url_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "Http"])
_url_host = st.from_regex(r"[A-Za-z0-9]{1,8}(\.[A-Za-z0-9]{1,8}){0,3}", fullmatch=True)
_url_port = st.sampled_from(["", ":80", ":443", ":8080", ":65535"])
_url_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,6}){0,3}", fullmatch=True)
_url_query = st.lists(
    st.from_regex(r"(utm_[a-z]{1,6}|[a-z]{1,6})=[A-Za-z0-9]{0,5}", fullmatch=True),
    min_size=0, max_size=4,
).map(lambda ps: "&".join(ps))
_url_frag = st.sampled_from(["", "#x", "#frag"])


@settings(max_examples=25, deadline=None)
@given(_url_scheme, _url_host, _url_port, _url_path, _url_query, _url_frag)
def test_url_canonicalization_idempotent(spark, scheme, host, port, path, query, frag):
    """canonicalize(canonicalize(u)) == canonicalize(u): the canonical
    form must be a fixed point — a second pass that changes anything
    means a rule half-applied (the classic normalizer defect class).
    Also: the canonical URL never carries a fragment or a tracking
    param, and its host is lowercase."""
    from flink_real_time_data_warehouse_spark.datapipe.urls import canonicalize_urls

    url = f"{scheme}://{host}{port}{path}"
    if query:
        url += "?" + query
    url += frag
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    # one plan for url_canonical + host (a separate .first() per column
    # re-plans the whole canonicalizer expression tree)
    row = canonicalize_urls(df, "url").select("url_canonical", "host").first()
    first, host_out = row[0], row[1]
    df2 = spark.createDataFrame([(1, first)], "doc_id long, url string")
    second = canonicalize_urls(df2, "url").select("url_canonical").first()[0]
    assert second == first, (url, first, second)
    assert "#" not in first and "utm_" not in first
    assert host_out == host_out.lower()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.from_regex(r"[a-z]{1,8}", fullmatch=True), min_size=1, max_size=30))
def test_markdown_extract_inverts_on_random_tokens(spark, toks):
    """The markdown twin must invert EXACTLY for any token list — the
    graded query only proves it for the fixture corpus."""
    from flink_real_time_data_warehouse_spark.datapipe.curation import markdown_extract

    text = " ".join(toks)
    df = spark.createDataFrame([(11, text)], "doc_id long, text string")
    row = markdown_extract(df, "doc_id", "text").first()
    assert row["extracted_text"] == text
    assert row["text_len"] == len(text)
