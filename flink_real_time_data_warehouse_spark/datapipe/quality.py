"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All built from JVM-side SQL functions (no Python in the hot path); each has
an exactly mirrored ANSI formulation so the DuckDB oracle hash-matches.
Cross-engine arithmetic stays in integers plus single double divisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

# Tiny English stopword set for the n-gram/stopword language heuristic.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def lm_surprisal(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unigram-LM surprisal scoring — the corpus-statistics quality signal
    (the CCNet/KenLM "perplexity filter" shape): score each document by how
    improbable its tokens are under a unigram model trained on the corpus
    itself. High bits-per-token = rare-token-heavy (gibberish, boilerplate
    IDs); low = stopword soup. Complements the per-doc heuristics in
    `text_quality`, which see no corpus statistics at all.

    Cross-engine determinism: per-token surprisal is quantized to whole
    bits with integer-exact arithmetic — floor(log2(n)) computed as
    length(bin(n)) - 1, so score_bits(token) = len(bin(total_tokens)) -
    len(bin(token_count)). A float log's last ulp differs between engines;
    string-length-of-binary does not. bits_per_token is the one double
    (exact-int / exact-int, correctly rounded identically everywhere).

    Scale: the token->count join keys on zipf-skewed tokens. No pinned
    broadcast (the vocabulary is corpus-derived — 10^8 entries at 100 TB);
    Catalyst picks broadcast from its size estimate when counts are small,
    and AQE's runtime size check + skew split govern the large case. The
    corpus total is aggregated from the counts table (vocab-sized input,
    not the token stream) and rides a 1-row broadcast cross join.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    counts = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    bits = F.length(F.bin(F.col("total"))) - F.length(F.bin(F.col("cnt")))
    return (
        toks.join(counts, "w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum(bits).cast("long").alias("surprisal_bits"),
            F.count("*").cast("long").alias("token_ct"),
        )
        .withColumn(
            "bits_per_token",
            F.col("surprisal_bits").cast("double") / F.col("token_ct"),
        )
    )


def _langid_pred(text: Column, threshold: float = 0.05) -> Column:
    """The lang_id decision as a shared rule column ('en' / 'unknown') —
    single source of truth for both the graded `lang_id` query and the
    fused funnel projection, so the funnel can never drift from the
    graded stage."""
    t = tokens(text)
    stop_ct = F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS)))
    ratio = stop_ct / F.size(t)
    return (
        F.when(F.size(t) == 0, F.lit("unknown"))
        .when(ratio >= threshold, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def lang_id(df: DataFrame, id_col: str, text_col: str, threshold: float = 0.05) -> DataFrame:
    """Heuristic language ID: stopword ratio over whitespace tokens.

    ratio >= threshold -> 'en', else 'unknown'. (A production system would
    chain more stopword tables / charset ranges; the operator shape — pure
    column arithmetic, no UDF — is the point.)
    """
    t = tokens(F.col(text_col))
    stop_ct = F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS)))
    return df.select(
        F.col(id_col),
        _langid_pred(F.col(text_col), threshold).alias("lang_pred"),
        stop_ct.alias("stopword_ct"),
        F.size(t).alias("token_ct"),
    )


def text_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality features + a simple rule score.

    n_chars, n_tokens, avg_token_len (one double division), space_ratio,
    and quality_score in [0,3]: +1 length in band, +1 avg token len in
    band, +1 stopwords present.
    """
    t = tokens(F.col(text_col))
    n_tokens = F.size(t)
    n_chars = F.length(F.col(text_col))
    tok_chars = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    # NULL (not a divide-by-zero error under ANSI mode) for token-less docs
    avg_tok = F.when(n_tokens > 0, tok_chars / n_tokens)
    stop_ct = F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS)))
    # avg_tok is NULL for zero-token docs; coalesce the band term so the
    # score is 0 (matching the oracle's CASE WHEN, where NULL BETWEEN is
    # false) instead of NULL-propagating through the sum.
    score = (
        ((n_tokens >= 10) & (n_tokens <= 100000)).cast("int")
        + F.coalesce(((avg_tok >= 2.0) & (avg_tok <= 12.0)).cast("int"), F.lit(0))
        + (stop_ct > 0).cast("int")
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
        score.alias("quality_score"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counts: whitespace tokens and BPE-ish word pieces.

    ws_token_ct: whitespace split. piece_ct: alnum runs of length <= 4
    count 1, longer runs count ceil(len/4) — a deterministic proxy for BPE
    piece counts (real BPE would be a pandas UDF over a vocab; the proxy
    keeps the hot path JVM-side and the oracle exact).
    """
    t = tokens(F.col(text_col))
    runs = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
    piece_ct = F.aggregate(
        runs, F.lit(0), lambda acc, x: acc + F.ceil(F.length(x) / 4).cast("int")
    )
    return df.select(
        F.col(id_col),
        F.size(t).alias("ws_token_ct"),
        F.size(runs).alias("alnum_run_ct"),
        piece_ct.alias("piece_ct"),
    )


# PII scrub patterns — restricted to the regex subset Java (Spark) and RE2
# (DuckDB) evaluate identically: character classes, +, bounded repetition.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^\s]+"
PII_LONGNUM = r"[0-9]{7,}"


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails, URLs, and long digit runs (phone/account numbers)
    from a text column; report per-document redaction counts.

    Order matters and is fixed: URLs first (an email- or number-shaped
    substring inside a URL belongs to the URL), then emails, then digit
    runs — each pattern is counted against the text state it is replaced
    in, so counts always equal the number of substitutions made.

    Scale shape: pure per-row regexp expressions (JVM-side, whole-stage
    codegen) — zero shuffle, runs in the scan projection. This is the
    compliance pass a pipeline applies to the FULL corpus before anything
    else, so it must not cost more than the scan itself.
    """
    raw = F.col(text_col)
    url_ct = F.regexp_count(raw, F.lit(PII_URL))
    t1 = F.regexp_replace(raw, PII_URL, "<URL>")
    email_ct = F.regexp_count(t1, F.lit(PII_EMAIL))
    t2 = F.regexp_replace(t1, PII_EMAIL, "<EMAIL>")
    num_ct = F.regexp_count(t2, F.lit(PII_LONGNUM))
    t3 = F.regexp_replace(t2, PII_LONGNUM, "<NUM>")
    return df.select(
        F.col(id_col),
        url_ct.cast("long").alias("url_ct"),
        email_ct.cast("long").alias("email_ct"),
        num_ct.cast("long").alias("num_ct"),
        t3.alias("scrubbed"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str, prefix_tokens: int = 8) -> DataFrame:
    """Content fingerprints: full-text digest of normalized text + digest of
    the first `prefix_tokens` tokens (a cheap rolling-hash stand-in that
    catches same-prefix near-dups)."""
    t = tokens(F.col(text_col))
    norm_text = F.concat_ws(" ", t)
    prefix = F.concat_ws(" ", F.slice(t, 1, prefix_tokens))
    return df.select(
        F.col(id_col),
        F.md5(norm_text).alias("content_fp"),
        F.md5(prefix).alias("prefix_fp"),
    )


def lm_surprisal_bigram(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_pred: Column,
) -> DataFrame:
    """Bigram LM with STUPID BACKOFF (Brants et al. 2007, "Large Language
    Models in Machine Translation") — the actual CCNet/KenLM filter shape:
    the model trains on a REFERENCE subset (`train_pred`, CCNet uses
    Wikipedia) and scores EVERY document, so unseen bigrams, unseen
    unigrams (OOV) and the backoff path all genuinely occur — unlike
    `lm_surprisal`, which self-trains and can never miss.

    Integer-exact scoring (same bit quantization as lm_surprisal;
    alpha = 1/4 is exactly +2 bits):
      bits(c | p) = len(bin(B(p,c)→U(p)))            if the bigram is known
                  = 2 + unigram_bits(c)               on backoff
      unigram_bits(w) = len(bin(T)) - len(bin(U(w)))  if w is known
                      = len(bin(T)) + 2               OOV floor
    A document's first token scores unigram_bits (no history). Returns
    (id, token_ct, surprisal_bits, backoff_ct, oov_ct, bits_per_token)
    for every document with at least one token.

    Scale: training aggregates touch the reference subset once; scoring
    joins the token/pair streams against count tables with zipf-skewed
    keys — left to AQE (skew split + runtime broadcast), never a pinned
    corpus-sized broadcast. The total rides a 1-row broadcast."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    # slice(t, 1, n-1) throws INVALID_PARAMETER_VALUE.LENGTH for n == 0, so
    # the pair list must be guarded for sub-2-token documents (the oracle's
    # range(1, len) yields none there). CaseWhen short-circuits, and both
    # consumers explode() this column, where NULL emits zero rows exactly
    # like the empty array.
    pairs_col = F.when(
        n >= 2, F.arrays_zip(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1))
    )

    train = df.where(train_pred)
    uni = (
        train.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("ucnt"))
    )
    big = (
        train.select(F.explode(pairs_col).alias("pr"))
        .select(F.col("pr")["0"].alias("p"), F.col("pr")["1"].alias("c"))
        .groupBy("p", "c")
        .agg(F.count("*").alias("bcnt"))
    )
    tot = uni.agg(F.sum("ucnt").cast("long").alias("total"))

    tbits = F.length(F.bin(F.col("total")))
    uni_bits = lambda cnt: F.when(  # noqa: E731
        cnt.isNotNull(), tbits - F.length(F.bin(cnt))
    ).otherwise(tbits + 2)

    firsts = (
        df.where(n >= 1)
        .select(F.col(id_col).alias("_id"), F.element_at(t, 1).alias("w"))
        .join(uni, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_id",
            uni_bits(F.col("ucnt")).alias("bits"),
            F.lit(0).alias("backoff"),
            F.col("ucnt").isNull().cast("int").alias("oov"),
        )
    )
    prs = (
        df.select(F.col(id_col).alias("_id"), F.explode(pairs_col).alias("pr"))
        .select("_id", F.col("pr")["0"].alias("p"), F.col("pr")["1"].alias("c"))
        .join(big, ["p", "c"], "left")
        .join(uni.withColumnRenamed("w", "p").withColumnRenamed("ucnt", "pcnt"), "p", "left")
        .join(uni.withColumnRenamed("w", "c").withColumnRenamed("ucnt", "ccnt"), "c", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_id",
            F.when(
                F.col("bcnt").isNotNull(),
                F.length(F.bin(F.col("pcnt"))) - F.length(F.bin(F.col("bcnt"))),
            )
            .otherwise(F.lit(2) + uni_bits(F.col("ccnt")))
            .alias("bits"),
            F.col("bcnt").isNull().cast("int").alias("backoff"),
            F.col("ccnt").isNull().cast("int").alias("oov"),
        )
    )
    return (
        firsts.unionByName(prs)
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("token_ct"),
            F.sum("bits").cast("long").alias("surprisal_bits"),
            F.sum("backoff").cast("long").alias("backoff_ct"),
            F.sum("oov").cast("long").alias("oov_ct"),
        )
        .select(
            F.col("_id").alias(id_col),
            "token_ct",
            "surprisal_bits",
            "backoff_ct",
            "oov_ct",
            (F.col("surprisal_bits").cast("double") / F.col("token_ct")).alias(
                "bits_per_token"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Text normalization (round 9 continuation): the cleanup pass every corpus
# pipeline runs before anything else (ftfy/NFKC-lite shape) — curly
# punctuation to ASCII, fullwidth letters to halfwidth, control and
# zero-width characters stripped, exotic whitespace unified and collapsed.
# The fixture corpus is already clean, so the graded query follows the
# media-header pattern: SYNTHESIZE format-valid dirt deterministically
# (per-(doc, token) md5 draws pick one of six corruption rules), then
# normalize it back — a bug in either the injector or the normalizer
# breaks the oracle hash. Both passes are pure per-row JVM column
# arithmetic: zero shuffle, zero Python.
# ---------------------------------------------------------------------------

#: literal character rewrites, applied in order (both engines replay)
NORMALIZE_REPLACEMENTS = (
    ("“", '"'), ("”", '"'),       # curly double quotes
    ("‘", "'"), ("’", "'"),       # curly single quotes
    ("—", "--"), ("–", "-"),      # em/en dash
    ("…", "..."),                      # ellipsis
    ("ａ", "a"), ("ｅ", "e"),       # fullwidth a e s t
    ("ｓ", "s"), ("ｔ", "t"),
)
_CONTROL_CLASS = "[\\x{00}-\\x{08}\\x{0b}\\x{0c}\\x{0e}-\\x{1f}\\x{7f}\\x{200b}]"  # controls + zero-width, EXCLUDING tab/nl/cr (those unify to space)
_SPACE_CLASS = "[\\x{a0}\\x{09}\\x{0a}\\x{0d}]"        # nbsp, tab, nl, cr


def _dirt_draw(id_col, i):
    return F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit("dirt:"), id_col.cast("string"),
                                    F.lit(":"), i.cast("string")), "UTF-8")),
            1, 8,
        ), 16, 10,
    ).cast("long")


def synth_dirty_text(df: DataFrame, id_col: str, text_col: str):
    """Deterministically corrupted twin of `text_col`: per token, an md5
    draw picks curly-quote wrapping, fullwidth letters, a trailing
    zero-width space, a leading BEL control, a trailing NBSP, or a
    leading tab (or leaves it alone) — every class the normalizer must
    undo, replayable by any engine."""
    did = F.col(id_col)
    toks = F.split(F.col(text_col), " ")
    fw = lambda w: F.replace(  # noqa: E731
        F.replace(F.replace(F.replace(w, F.lit("a"), F.lit("ａ")),
                            F.lit("e"), F.lit("ｅ")),
                  F.lit("s"), F.lit("ｓ")),
        F.lit("t"), F.lit("ｔ"))

    def rule(w, k):
        m = _dirt_draw(did, k + 1) % 7
        return (
            F.when(m == 0, F.concat(F.lit("“"), w, F.lit("”")))
            .when(m == 1, fw(w))
            .when(m == 2, F.concat(w, F.lit("​")))
            .when(m == 3, F.concat(F.lit("\x07"), w))
            .when(m == 4, F.concat(w, F.lit(" ")))
            .when(m == 5, F.concat(F.lit("\t"), w))
            .otherwise(w)
        )

    return F.array_join(F.transform(toks, rule), " ")


def normalize_text(col):
    """The normalizer itself (column -> column): literal punctuation /
    fullwidth rewrites, control + zero-width strip, whitespace unify,
    run collapse, trim."""
    x = col
    for frm, to in NORMALIZE_REPLACEMENTS:
        x = F.replace(x, F.lit(frm), F.lit(to))
    x = F.regexp_replace(x, _CONTROL_CLASS, "")
    x = F.regexp_replace(x, _SPACE_CLASS, " ")
    return F.trim(F.regexp_replace(x, " +", " "))


def text_normalize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dirty_len, norm_len, changed, normalized_text): inject the
    deterministic dirt, then normalize it away."""
    dirty = synth_dirty_text(df, id_col, text_col)
    base = df.select(F.col(id_col), dirty.alias("_dirty"))
    norm = normalize_text(F.col("_dirty"))
    return base.select(
        id_col,
        F.length("_dirty").cast("long").alias("dirty_len"),
        F.length(norm).cast("long").alias("norm_len"),
        (F.col("_dirty") != norm).cast("int").alias("changed"),
        norm.alias("normalized_text"),
    )


def lm_surprisal_trigram(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_pred: Column,
) -> DataFrame:
    """Trigram extension of the STUPID BACKOFF LM (Brants et al. 2007 —
    one more backoff level over lm_surprisal_bigram, trained on the same
    reference subset with the same integer-exact bit quantization;
    alpha = 1/4 is exactly +2 bits per backoff level):

      bits(c | p2 p1) = len(bin(B(p2,p1))) - len(bin(T(p2,p1,c)))  known trigram
                      = 2 + len(bin(U(p1))) - len(bin(B(p1,c)))    bigram backoff
                      = 4 + unigram_bits(c)                        unigram backoff
      unigram_bits(w) = len(bin(total)) - len(bin(U(w)))           known word
                      = len(bin(total)) + 2                        OOV floor

    Position 1 scores unigram_bits (no history); position 2 scores the
    bigram level (one-word history). Returns (id, token_ct,
    surprisal_bits, backoff_ct, deep_backoff_ct, oov_ct, bits_per_token)
    for every document with at least one token: backoff_ct counts
    positions whose highest-order available model missed,
    deep_backoff_ct those that fell all the way to the unigram level.

    Scale: same shape as the bigram — training aggregates touch the
    reference subset once; scoring joins token/pair/triple streams
    against count tables with zipf-skewed keys, left to AQE; the total
    rides a 1-row broadcast."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    # slice() throws for negative lengths — guard sub-2/3-token docs
    # (explode of NULL emits zero rows, same as the empty list)
    pairs_col = F.when(
        n >= 2, F.arrays_zip(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1))
    )
    triples_col = F.when(
        n >= 3,
        F.arrays_zip(
            F.slice(t, 1, n - 2), F.slice(t, 2, n - 2), F.slice(t, 3, n - 2)
        ),
    )

    train = df.where(train_pred)
    uni = (
        train.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("ucnt"))
    )
    big = (
        train.select(F.explode(pairs_col).alias("pr"))
        .select(F.col("pr")["0"].alias("p"), F.col("pr")["1"].alias("c"))
        .groupBy("p", "c")
        .agg(F.count("*").alias("bcnt"))
    )
    tri = (
        train.select(F.explode(triples_col).alias("tp"))
        .select(
            F.col("tp")["0"].alias("a"),
            F.col("tp")["1"].alias("b"),
            F.col("tp")["2"].alias("c"),
        )
        .groupBy("a", "b", "c")
        .agg(F.count("*").alias("tcnt"))
    )
    tot = uni.agg(F.sum("ucnt").cast("long").alias("total"))

    tbits = F.length(F.bin(F.col("total")))
    uni_bits = lambda cnt: F.when(  # noqa: E731
        cnt.isNotNull(), tbits - F.length(F.bin(cnt))
    ).otherwise(tbits + 2)
    zero = F.lit(0)

    firsts = (
        df.where(n >= 1)
        .select(F.col(id_col).alias("_id"), F.element_at(t, 1).alias("w"))
        .join(uni, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_id",
            uni_bits(F.col("ucnt")).alias("bits"),
            zero.alias("backoff"),
            zero.alias("deep"),
            F.col("ucnt").isNull().cast("int").alias("oov"),
        )
    )
    seconds = (
        df.where(n >= 2)
        .select(
            F.col(id_col).alias("_id"),
            F.element_at(t, 1).alias("p"),
            F.element_at(t, 2).alias("c"),
        )
        .join(big, ["p", "c"], "left")
        .join(uni.withColumnRenamed("w", "p").withColumnRenamed("ucnt", "pcnt"), "p", "left")
        .join(uni.withColumnRenamed("w", "c").withColumnRenamed("ucnt", "ccnt"), "c", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_id",
            F.when(
                F.col("bcnt").isNotNull(),
                F.length(F.bin(F.col("pcnt"))) - F.length(F.bin(F.col("bcnt"))),
            )
            .otherwise(F.lit(2) + uni_bits(F.col("ccnt")))
            .alias("bits"),
            F.col("bcnt").isNull().cast("int").alias("backoff"),
            F.col("bcnt").isNull().cast("int").alias("deep"),
            F.col("ccnt").isNull().cast("int").alias("oov"),
        )
    )
    triples = (
        df.select(F.col(id_col).alias("_id"), F.explode(triples_col).alias("tp"))
        .select(
            "_id",
            F.col("tp")["0"].alias("a"),
            F.col("tp")["1"].alias("b"),
            F.col("tp")["2"].alias("c"),
        )
        .join(tri, ["a", "b", "c"], "left")
        .join(
            big.withColumnRenamed("p", "a")
            .withColumnRenamed("c", "b")
            .withColumnRenamed("bcnt", "ctxcnt"),
            ["a", "b"],
            "left",
        )
        .join(
            big.withColumnRenamed("p", "b").withColumnRenamed("bcnt", "bgcnt"),
            ["b", "c"],
            "left",
        )
        .join(uni.withColumnRenamed("w", "b").withColumnRenamed("ucnt", "pcnt"), "b", "left")
        .join(uni.withColumnRenamed("w", "c").withColumnRenamed("ucnt", "ccnt"), "c", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_id",
            F.when(
                F.col("tcnt").isNotNull(),
                F.length(F.bin(F.col("ctxcnt"))) - F.length(F.bin(F.col("tcnt"))),
            )
            .when(
                F.col("bgcnt").isNotNull(),
                F.lit(2)
                + F.length(F.bin(F.col("pcnt")))
                - F.length(F.bin(F.col("bgcnt"))),
            )
            .otherwise(F.lit(4) + uni_bits(F.col("ccnt")))
            .alias("bits"),
            F.col("tcnt").isNull().cast("int").alias("backoff"),
            (F.col("tcnt").isNull() & F.col("bgcnt").isNull()).cast("int").alias("deep"),
            F.col("ccnt").isNull().cast("int").alias("oov"),
        )
    )
    return (
        firsts.unionByName(seconds)
        .unionByName(triples)
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("token_ct"),
            F.sum("bits").cast("long").alias("surprisal_bits"),
            F.sum("backoff").cast("long").alias("backoff_ct"),
            F.sum("deep").cast("long").alias("deep_backoff_ct"),
            F.sum("oov").cast("long").alias("oov_ct"),
        )
        .select(
            F.col("_id").alias(id_col),
            "token_ct",
            "surprisal_bits",
            "backoff_ct",
            "deep_backoff_ct",
            "oov_ct",
            (F.col("surprisal_bits").cast("double") / F.col("token_ct")).alias(
                "bits_per_token"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Mojibake repair (round 10): ftfy's core trick (Speer, "fixing Unicode
# for everyone") — web corpora are full of UTF-8 text that was decoded as
# latin-1 somewhere upstream ('é' -> 'Ã©'), and every serious pipeline
# repairs it before anything else. Detection is the 0xC3-lead-byte
# signature (latin-1-reinterpreted UTF-8 for U+00C0-U+00FF); repair is
# the inverse reinterpretation, encode(latin-1) |> decode(UTF-8), applied
# ONLY when the signature fires (ftfy's guard — genuine 'Ã' text must
# pass through untouched). The fixture corpus is pure ASCII, so the
# graded query follows the text_normalize pattern: per-token md5 draws
# ACCENT a deterministic subset of tokens (a->á e->é o->ö u->ü), the
# whole string round-trips through the mojibake corruption, and the
# repair must restore the accented original byte-for-byte — the oracle
# replays the draws and the byte reinterpretation and hash-compares the
# full repaired string. Pure per-row JVM column arithmetic: zero
# shuffle, zero Python.
# ---------------------------------------------------------------------------

#: accent rewrites applied to drawn tokens (both engines replay)
MOJI_ACCENTS = (("a", "á"), ("e", "é"), ("o", "ö"), ("u", "ü"))

#: the UTF-8-as-latin-1 signature: 0xC3 lead byte ('Ã') + continuation
MOJI_SIGNATURE = "Ã[\\x{80}-\\x{bf}]"


def _moji_draw(id_col, i):
    return F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit("moji:"), id_col.cast("string"),
                                    F.lit(":"), i.cast("string")), "UTF-8")),
            1, 8,
        ), 16, 10,
    ).cast("long")


def synth_accented_text(df: DataFrame, id_col: str, text_col: str):
    """Deterministically accented twin of `text_col`: per token, an md5
    draw (1 in 4) swaps the token's vowels for accented forms — the
    non-ASCII content the mojibake corruption needs, replayable by any
    engine."""
    did = F.col(id_col)
    toks = F.split(F.col(text_col), " ")

    def rule(w, k):
        acc = w
        for frm, to in MOJI_ACCENTS:
            acc = F.replace(acc, F.lit(frm), F.lit(to))
        return F.when(_moji_draw(did, k + 1) % 4 == 0, acc).otherwise(w)

    return F.array_join(F.transform(toks, rule), " ")


def mojibake_corrupt(col):
    """UTF-8 bytes reinterpreted as latin-1 — the upstream bug itself."""
    return F.decode(F.encode(col, "UTF-8"), "ISO-8859-1")


def mojibake_fix(col):
    """The inverse reinterpretation: encode latin-1, decode UTF-8."""
    return F.decode(F.encode(col, "ISO-8859-1"), "UTF-8")


def mojibake_repair(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, moji_sig_ct, changed, repaired_len, repaired_text): inject the
    deterministic accents, corrupt through the latin-1 reinterpretation,
    detect via the 0xC3 signature, repair only where detected."""
    decorated = synth_accented_text(df, id_col, text_col)
    base = df.select(F.col(id_col), mojibake_corrupt(decorated).alias("_moji"))
    sig = F.regexp_count(F.col("_moji"), F.lit(MOJI_SIGNATURE))
    repaired = F.when(sig > 0, mojibake_fix(F.col("_moji"))).otherwise(
        F.col("_moji")
    )
    return base.select(
        id_col,
        sig.cast("long").alias("moji_sig_ct"),
        (sig > 0).cast("int").alias("changed"),
        F.length(repaired).cast("long").alias("repaired_len"),
        repaired.alias("repaired_text"),
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (round 10): the published rule set from Rae et al.
# 2021 (Gopher, appendix A1.1) — the de-facto standard document-level
# filter later reused by MassiveText/RefinedWeb/Dolma. Each rule is a
# flag; `passes` is their conjunction. All thresholds evaluate in INTEGER
# arithmetic (3n <= chars <= 10n instead of 3 <= chars/n <= 10, etc.) so
# both engines agree bit-for-bit with no float ratios. The fixture corpus
# is single-line ASCII, so the line-based rules (bullet starts, ellipsis
# ends) evaluate over that one line — the formulas are the general ones.
# ---------------------------------------------------------------------------

#: Gopher's stop-word list (rule: document contains at least two)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_rule_flags(raw: Column) -> dict[str, Column]:
    """The seven Gopher rule columns over a raw text column — single
    source of truth for the graded `gopher_quality` query and the fused
    funnel projection."""
    t = tokens(raw)
    n = F.size(t)
    chars = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    sym = F.regexp_count(raw, F.lit("#")) + F.regexp_count(
        raw, F.lit("\\.\\.\\.|…")
    )
    lines = F.split(raw, "\n")
    n_lines = F.size(lines)
    bullet = F.size(F.filter(lines, lambda x: x.rlike("^[ ]*([•\\-*●])")))
    ell = F.size(F.filter(lines, lambda x: x.rlike("(\\.\\.\\.|…)$")))
    alpha = F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
    stop_ct = F.size(
        F.array_intersect(
            F.array_distinct(t), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    )
    return {
        "r_word_count": (n >= 50) & (n <= 100000),
        "r_mean_len": (3 * n <= chars) & (chars <= 10 * n) & (n > 0),
        "r_symbol": 10 * sym <= n,
        "r_bullet": 10 * bullet <= n_lines,
        "r_ellipsis": 10 * ell <= 3 * n_lines,
        "r_alpha": 5 * alpha >= 4 * n,
        "r_stopwords": stop_ct >= 2,
    }


def gopher_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, word_ct, + one int flag per Gopher rule, passes):

      r_word_count   50 <= words <= 100000
      r_mean_len     3 <= mean word length <= 10   (as 3n <= chars <= 10n)
      r_symbol       (# + ellipsis) / words <= 0.1 (as 10*sym <= words)
      r_bullet       lines starting with a bullet <= 10% (10*b <= lines)
      r_ellipsis     lines ending with ellipsis <= 30% (10*e <= 3*lines)
      r_alpha        words containing [a-z] >= 80% (5*alpha >= 4*words)
      r_stopwords    >= 2 distinct Gopher stop words present

    Zero shuffle: pure per-row column arithmetic on the scan."""
    raw = F.col(text_col)
    n = F.size(tokens(raw))
    flags = _gopher_rule_flags(raw)
    cols = [F.col(id_col), n.cast("long").alias("word_ct")]
    passes = F.lit(True)
    for name, flag in flags.items():
        cols.append(flag.cast("int").alias(name))
        passes = passes & flag
    cols.append(passes.cast("int").alias("passes"))
    return df.select(*cols)


# ---------------------------------------------------------------------------
# Trained n-gram language ID (round 10): the char-trigram classifier shape
# (Cavnar & Trenkle 1994 profiles; scored here in the Naive-Bayes form
# langdetect/fastText popularized, with the same integer-exact bit
# quantization as the LM family). The fixture's `lang` labels are
# synthetic — every doc draws from one shared English token pool — so the
# graded query follows the media-header pattern: a deterministic
# per-language MARKER PHRASE (real orthography: accents, umlauts, eñe,
# CJK) is appended to each doc, and the classifier must recover the label
# from the bytes alone. Training is one explode+agg per (lang, trigram);
# scoring joins doc trigrams against the count table (zipf keys, AQE) and
# the 5-row totals ride a broadcast.
# ---------------------------------------------------------------------------

#: per-language marker phrases (deterministic decoration, both engines replay)
LANG_MARKERS = {
    "de": "über größe straße schön",
    "en": "the and with that through",
    "es": "mañana niño español así",
    "fr": "été déjà où français",
    "zh": "数据 仓库 实时 计算",
}

#: unseen-trigram penalty, bits (the +alpha backoff floor)
LANGID_OOV_BITS = 4


def langid_ngram(
    df: DataFrame, id_col: str, text_col: str, lang_col: str
) -> DataFrame:
    """(id, lang, lang_pred, correct): decorate each doc with its
    language's marker phrase, train per-language char-trigram counts on
    the decorated corpus, score every doc against every language with
    integer-exact bits — bits(g|L) = len(bin(T_L)) - len(bin(cnt)) for a
    seen trigram, len(bin(T_L)) + 4 unseen — and predict the
    minimum-score language (ties broken lang ASC)."""
    marker = None
    for lang, phrase in LANG_MARKERS.items():
        cond = F.col(lang_col) == lang
        marker = F.when(cond, F.lit(phrase)) if marker is None else marker.when(
            cond, F.lit(phrase)
        )
    # decoration scales with length (one marker per 100 chars) so the
    # language signal tracks the base-trigram quantization noise — a
    # single marker loses to the +-1-bit-per-gram walk on long docs
    reps = (F.lit(1) + F.floor(F.length(F.col(text_col)) / 100)).cast("int")
    dec = F.concat(
        F.col(text_col), F.lit(" "), F.repeat(F.concat(marker, F.lit(" ")), reps)
    )
    base = df.select(
        F.col(id_col).alias("_id"), F.col(lang_col).alias("lang"), dec.alias("_t")
    )
    # trigrams as a zip of three shifted char-array slices — one array
    # pass; substr(t, i, 3) per position is O(i) on UTF8String and turned
    # the extraction O(n^2) (measured)
    c = F.split(F.col("_t"), "")
    nc = F.size(c)
    grams = F.when(
        nc >= 3,
        F.transform(
            F.arrays_zip(
                F.slice(c, 1, nc - 2), F.slice(c, 2, nc - 2), F.slice(c, 3, nc - 2)
            ),
            lambda x: F.concat(x["0"], x["1"], x["2"]),
        ),
    )
    tri = base.select("_id", "lang", F.explode(grams).alias("g"))
    counts = tri.groupBy("lang", "g").agg(F.count("*").alias("cnt"))
    totals = counts.groupBy("lang").agg(F.sum("cnt").cast("long").alias("T"))
    tbits = F.length(F.bin(F.col("T")))
    # collapse repeated grams per doc BEFORE the 5-language expansion —
    # the scoring join then moves distinct (doc, gram) pairs weighted by
    # their multiplicity, not raw occurrences (the small shared
    # vocabulary repeats heavily; measured ~1.5x on the headline)
    wgrams = tri.groupBy("_id", "g").agg(F.count("*").alias("ct"))
    scored = (
        wgrams.crossJoin(F.broadcast(totals))
        .join(counts, ["lang", "g"], "left")
        .groupBy("_id", "lang")
        .agg(
            F.sum(
                F.col("ct")
                * F.when(
                    F.col("cnt").isNotNull(), tbits - F.length(F.bin(F.col("cnt")))
                ).otherwise(tbits + LANGID_OOV_BITS)
            ).alias("score")
        )
        .groupBy("_id")
        .agg(F.min_by("lang", F.struct("score", "lang")).alias("lang_pred"))
    )
    return (
        df.select(F.col(id_col), F.col(lang_col).alias("lang"))
        .join(scored, F.col(id_col) == scored["_id"], "left")
        .select(
            id_col,
            "lang",
            "lang_pred",
            (F.col("lang") == F.col("lang_pred")).cast("int").alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# Sentence segmentation (round 10 continuation). Every LLM-data pipeline
# needs a sentence splitter below the document level (dedup at sentence
# granularity, context packing, per-sentence quality). The rule set is
# the classic abbreviation-guarded terminator split, built ONLY from
# constructs both engines share — literal protect/restore replaces plus
# one capture-group regexp — because RE2 (DuckDB) has no lookbehind, so
# a lookbehind-style splitter could never be oracle-graded. The fixture
# corpus is terminator-free word soup, so the graded query follows the
# dirt-synthesis pattern: per-(doc,token) md5 draws insert terminators
# and abbreviation prefixes deterministically, then the splitter
# segments them back; a bug in either side breaks the hash.
# ---------------------------------------------------------------------------

#: abbreviations whose trailing dot must never split (literal guards)
SENTENCE_ABBREVIATIONS = ("Dr.", "e.g.")
_SENT_MARK = "\x01"  # split marker (never occurs in text)
_DOT_MARK = "\x02"   # protected-dot placeholder


def _sent_draw(id_col, i):
    return F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit("sent:"), id_col.cast("string"),
                                    F.lit(":"), i.cast("string")), "UTF-8")),
            1, 8,
        ), 16, 10,
    ).cast("long")


def synth_punctuated_text(df: DataFrame, id_col: str, text_col: str):
    """Deterministically punctuated twin of `text_col`: per token, an md5
    draw appends '.', '!' or '?' (sentence terminators), or prefixes the
    token with an abbreviation ('Dr. ' / 'e.g. ') whose dot must NOT
    split, or leaves it alone — replayable by any engine."""
    did = F.col(id_col)
    toks = F.split(F.col(text_col), " ")

    def rule(w, k):
        m = _sent_draw(did, k + 1) % 9
        return (
            F.when(m == 0, F.concat(w, F.lit(".")))
            .when(m == 1, F.concat(w, F.lit("!")))
            .when(m == 2, F.concat(w, F.lit("?")))
            .when(m == 3, F.concat(F.lit("Dr. "), w))
            .when(m == 4, F.concat(F.lit("e.g. "), w))
            .otherwise(w)
        )

    return F.array_join(F.transform(toks, rule), " ")


def split_sentences(col):
    """Column -> array<string> of sentences: protect abbreviation dots
    with a placeholder, mark every terminator+space boundary via one
    capture-group regexp, split on the marker, restore dots and trim.
    Lookbehind-free by construction (portable to RE2 engines)."""
    x = col
    for abbr in SENTENCE_ABBREVIATIONS:
        x = F.replace(x, F.lit(abbr), F.lit(abbr[:-1].replace(".", _DOT_MARK) + _DOT_MARK))
    x = F.regexp_replace(x, r"([.!?]) ", "$1" + _SENT_MARK)
    return F.transform(
        F.split(x, _SENT_MARK),
        lambda s: F.trim(F.replace(s, F.lit(_DOT_MARK), F.lit("."))),
    )


def sentence_segment(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sent_idx, sentence, n_tokens): inject deterministic sentence
    punctuation, then segment it back — one row per non-empty sentence,
    1-based index. Zero Python; the only shuffle-free explode."""
    punct = synth_punctuated_text(df, id_col, text_col)
    base = df.select(F.col(id_col), split_sentences(punct).alias("_sents"))
    out = base.select(id_col, F.posexplode("_sents").alias("_i", "_s"))
    return (
        out.where(F.col("_s") != "")
        .select(
            id_col,
            (F.col("_i") + 1).cast("long").alias("sent_idx"),
            F.col("_s").alias("sentence"),
            F.size(F.split(F.col("_s"), " ")).cast("long").alias("n_tokens"),
        )
    )


def perplexity_buckets(
    df: DataFrame, id_col: str, text_col: str, group_col: str
) -> DataFrame:
    """CCNet-style perplexity bucketing: within each `group_col` (CCNet
    buckets per language), rank documents by unigram-LM surprisal per
    token and assign head/middle/tail terciles — head = most fluent
    third, the slice CCNet feeds to training first.

    Cross-engine determinism: the sort key is integer micro-bits per
    token (surprisal_bits * 10^6 div token_ct — integer division, never
    a float ratio), ties broken by doc id; the tercile is
    3*(rank-1) div count + 1, so bucket boundaries are exact in any
    engine. Scale: one window per group partition (groups = languages,
    so parallelism is fine); at 100 TB the production path replaces the
    exact rank with two approx-percentile thresholds per group
    (2 values broadcast, zero extra shuffle) — the rank form is kept
    here because it is exactly replayable by the oracle."""
    from pyspark.sql import Window

    scored = lm_surprisal(df, id_col, text_col)
    j = scored.join(df.select(id_col, group_col), id_col)
    j = j.withColumn(
        "bpt_micro", F.expr("surprisal_bits * 1000000 div token_ct")
    )
    w = Window.partitionBy(group_col).orderBy("bpt_micro", id_col)
    j = (
        j.withColumn("_rn", F.row_number().over(w).cast("long"))
        .withColumn("_ct", F.count("*").over(Window.partitionBy(group_col)))
    )
    bucket = (F.expr("3 * (_rn - 1) div _ct") + 1).cast("int")
    return j.select(
        id_col,
        group_col,
        F.col("bpt_micro").cast("long"),
        bucket.alias("bucket"),
        F.when(bucket == 1, F.lit("head"))
        .when(bucket == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket_label"),
    )


def contrastive_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Adjacent-sentence contrastive pairs — the (anchor, positive)
    training-pair prep embedding models (SimCSE/DPR-style in-document
    positives) consume: each sentence pairs with its successor in the
    same document. One window per document partition (lead over the
    graded sentence rows), no joins; at 100 TB the partition key is the
    document id, so parallelism is row-scale."""
    from pyspark.sql import Window

    s = sentence_segment(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy("sent_idx")
    return (
        s.withColumn("positive", F.lead("sentence").over(w))
        .where(F.col("positive").isNotNull())
        .select(
            id_col,
            F.col("sent_idx").cast("long").alias("pair_idx"),
            F.col("sentence").alias("anchor"),
            "positive",
        )
    )


# --- C4 cleaning (Raffel et al. 2020, "Exploring the Limits of Transfer
# Learning...", §2.2) — the line-level rule set that built C4 from
# Common Crawl; the line-structured sibling of the doc-level Gopher
# rules above. ---

C4_MIN_WORDS = 5       # a retained line needs at least this many words
C4_MIN_SENTENCES = 3   # a retained page needs at least this many lines
C4_TERMINALS = '[.!?"]$'  # a retained line must end in terminal punctuation


def _c4_page_cols(t: Column) -> dict[str, Column]:
    """The C4 page-rule columns over a (punctuated) text column — single
    source of truth for the graded `c4_clean` query and the fused funnel
    projection: sentence count, the surviving-line array, and the two
    page-level blockers."""
    sents = F.filter(split_sentences(t), lambda x: x != "")

    def line_ok(x):
        return (
            x.rlike(C4_TERMINALS)
            & (F.size(F.split(x, " ")) >= C4_MIN_WORDS)
            & ~F.contains(F.lower(x), F.lit("javascript"))
        )

    return {
        "n_lines": F.size(sents),
        "kept": F.filter(sents, line_ok),
        "lorem": F.contains(F.lower(t), F.lit("lorem ipsum")),
        "brace": F.contains(t, F.lit("{")),
    }


def c4_clean(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4 cleaning over the deterministic sentence twin (the same
    punctuation synthesis the graded segmenter uses):

      line kept  = ends in terminal punctuation AND >= C4_MIN_WORDS
                   words AND does not mention 'javascript',
      page kept  = >= C4_MIN_SENTENCES surviving lines AND the page
                   contains neither 'lorem ipsum' nor '{'.

    Returns (id, n_lines, n_kept, n_dropped, clean_text, keep_page) —
    clean_text is the surviving lines rejoined in order. Everything is
    per-row ARRAY arithmetic (filter/size/array_join on the sentence
    array): zero explode, zero join, zero shuffle, zero Python — at
    100 TB this is a scan-side map, unlike the exploded line_dedup
    shape which must shuffle to see cross-document copies."""
    did_text = synth_punctuated_text(df, id_col, text_col)
    base = df.select(F.col(id_col), did_text.alias("_t"))
    rules = _c4_page_cols(F.col("_t"))
    base = base.select(
        F.col(id_col),
        rules["n_lines"].cast("long").alias("n_lines"),
        rules["kept"].alias("_kept"),
        rules["lorem"].alias("_lorem"),
        rules["brace"].alias("_brace"),
    )
    n_kept = F.size(F.col("_kept")).cast("long")
    return base.select(
        id_col,
        "n_lines",
        n_kept.alias("n_kept"),
        (F.col("n_lines") - n_kept).cast("long").alias("n_dropped"),
        F.array_join(F.col("_kept"), " ").alias("clean_text"),
        (
            (n_kept >= C4_MIN_SENTENCES) & ~F.col("_lorem") & ~F.col("_brace")
        ).cast("int").cast("long").alias("keep_page"),
    )


def _funnel_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, f1, f2, f3, _h) in ONE Project over ONE scan: the three
    per-row stage flags built from the SAME shared rule columns the
    graded `lang_id` / `gopher_quality` / `c4_clean` queries use
    (`_langid_pred` / `_gopher_rule_flags` / `_c4_page_cols`), so the
    fused funnel cannot drift from its graded stages.

    _h is the exact-dedup digest, coalesced to a sentinel (shorter than
    any md5 hex, so no collision): md5(NULL) is NULL, and an equi-join
    on a NULL key silently DROPS the row — NULL-text documents must
    stay in every stage count (the oracle's window PARTITION BY groups
    them)."""
    raw = F.col(text_col)
    passes = F.lit(True)
    for flag in _gopher_rule_flags(raw).values():
        passes = passes & flag
    c4 = _c4_page_cols(synth_punctuated_text(df, id_col, text_col))
    # exactly c4_clean's keep_page expression (incl. its NULL
    # propagation: size(NULL array) -> NULL -> NULL flag)
    keep_page = (
        (F.size(c4["kept"]).cast("long") >= C4_MIN_SENTENCES)
        & ~c4["lorem"]
        & ~c4["brace"]
    )
    return df.select(
        F.col(id_col),
        (_langid_pred(raw) == "en").cast("long").alias("f1"),
        passes.cast("int").cast("long").alias("f2"),
        keep_page.cast("int").cast("long").alias("f3"),
        F.coalesce(F.md5(raw), F.lit("null")).alias("_h"),
    )


def filter_funnel(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The full document-filter FUNNEL with per-stage attrition — the
    report every curation pipeline publishes (RefinedWeb Figure 2 /
    Dolma's per-filter counts): language ID -> Gopher rules -> C4 page
    rules -> exact dedup keeper, each stage applied to the previous
    stage's survivors. Returns one row per stage:
    (stage_idx, stage, n_in, n_kept, n_dropped), with n_in of stage k
    equal to n_kept of stage k-1.

    Scale — ONE scan, ONE shuffle, ZERO joins: f1/f2/f3 are all per-row
    functions of the same row, so they fuse into ONE Project
    (`_funnel_flags`); the dedup-keeper stage then needs no join-back
    at all, because the survivor-scoped min-id keeper of a digest group
    is BY DEFINITION inside its own group — a digest contributes
    exactly 1 to stage 4 iff it has any stage-3 survivor. So every
    stage count partial-aggregates at the digest level in one
    map-side-combining groupBy (hot-key-safe: billion-copy boilerplate
    digests combine before the shuffle, the line_dedup discipline) and
    a 1-row rollup finishes. The earlier formulations — five scans +
    three id joins (pre-r11), then one flag scan recomputed on both
    sides of a keeper join — cost 5x and 2x this plan respectively."""
    flags = _funnel_flags(df, id_col, text_col)
    surv = F.expr("f1 * f2 * f3") == 1
    per_digest = (
        flags.groupBy("_h")
        .agg(
            F.count("*").cast("long").alias("gn"),
            F.sum("f1").cast("long").alias("g1"),
            F.sum(F.expr("f1 * f2")).cast("long").alias("g2"),
            F.sum(F.expr("f1 * f2 * f3")).cast("long").alias("g3"),
            # stage 4: one kept doc per digest with >= 1 survivor — the
            # survivor-scoped keeper (min surviving id) is always a
            # member of its own digest group, so no join-back is needed
            F.max(surv.cast("long")).cast("long").alias("g4"),
        )
    )
    agg = per_digest.agg(
        F.sum("gn").cast("long").alias("n"),
        F.sum("g1").cast("long").alias("s1"),
        F.sum("g2").cast("long").alias("s2"),
        F.sum("g3").cast("long").alias("s3"),
        F.sum("g4").cast("long").alias("s4"),
    )
    stages = F.array(
        F.struct(F.lit(1).cast("long").alias("stage_idx"),
                 F.lit("lang_id").alias("stage"),
                 F.col("n").alias("n_in"), F.col("s1").alias("n_kept")),
        F.struct(F.lit(2).cast("long").alias("stage_idx"),
                 F.lit("gopher").alias("stage"),
                 F.col("s1").alias("n_in"), F.col("s2").alias("n_kept")),
        F.struct(F.lit(3).cast("long").alias("stage_idx"),
                 F.lit("c4").alias("stage"),
                 F.col("s2").alias("n_in"), F.col("s3").alias("n_kept")),
        F.struct(F.lit(4).cast("long").alias("stage_idx"),
                 F.lit("exact_dedup").alias("stage"),
                 F.col("s3").alias("n_in"), F.col("s4").alias("n_kept")),
    )
    return agg.select(F.explode(stages).alias("_s")).select(
        F.col("_s.stage_idx").alias("stage_idx"),
        F.col("_s.stage").alias("stage"),
        F.col("_s.n_in").alias("n_in"),
        F.col("_s.n_kept").alias("n_kept"),
        (F.col("_s.n_in") - F.col("_s.n_kept")).cast("long").alias("n_dropped"),
    )


#: ppm probability scale of the KN scorer; len(bin(1_000_000)) = 20, so
#: bits(p_ppm) = 20 - len(bin(p_ppm)) quantizes -log2(p) exactly as the
#: rest of the LM family quantizes count ratios
KN_BITS_ONE = 20
#: bits charged when the quantized probability truncates to 0 ppm (the
#: OOV floor: KN_BITS_ONE + 2, the family's +2 convention)
KN_FLOOR_BITS = KN_BITS_ONE + 2


def lm_surprisal_kn(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_pred: Column,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (Chen & Goodman 1999, "An
    empirical study of smoothing techniques for language modeling" —
    the published QUALITY standard the stupid-backoff family caps to;
    stupid backoff stays the scale recipe, KN is what you ship when
    held-out perplexity matters):

      P(c|p) = max(C(p,c) - D, 0)/C(p·) + D·N1+(p,·)/C(p·) · Pcont(c)
      Pcont(c) = N1+(·,c) / N1+(··)          (continuation counts)
      D = n1 / (n1 + 2·n2)                   (the paper's estimate)

    trained on the SAME reference-subset counts as the stupid-backoff
    queries. All arithmetic integer-exact: D in milli (1000·n1 div
    (n1 + 2·n2), prior 500 when undefined), probabilities in ppm with
    truncating div, surprisal quantized to whole bits via
    KN_BITS_ONE - len(bin(p_ppm)) — no float log, no libm drift.
    Position 1 scores the continuation unigram (KN's natural
    zero-history case); a position whose probability truncates to
    0 ppm is charged the KN_FLOOR_BITS floor. backoff_ct counts
    positions 2+ whose bigram was unseen (mass came from the
    interpolation term only); oov_ct counts tokens outside the
    training vocabulary. BIGINT headroom: bcnt·10^3 and
    D·N1+·Pcont ≤ 10^3·C·10^6 bound the intermediates — safe to
    ~9·10^9 occurrences of one history; shard the count tables past
    that (doc-noted, same family hazard as domain_mixture_weights).

    Scale: same shape as the bigram stupid backoff — training
    aggregates touch the reference subset once (map-side partials);
    the discount constants and continuation total ride a 1-row
    broadcast; scoring joins the pair stream against count tables on
    zipf-skewed keys, left to AQE."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    pairs_col = F.when(
        n >= 2, F.arrays_zip(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1))
    )

    train = df.where(train_pred)
    uni = (
        train.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("ucnt"))
    )
    big = (
        train.select(F.explode(pairs_col).alias("pr"))
        .select(F.col("pr")["0"].alias("p"), F.col("pr")["1"].alias("c"))
        .groupBy("p", "c")
        .agg(F.count("*").cast("long").alias("bcnt"))
    )
    # history table: C(p·) = occurrences of p as a history, N1+(p,·) =
    # distinct continuations (big is already distinct on (p,c))
    hist = big.groupBy("p").agg(
        F.sum("bcnt").cast("long").alias("hcnt"),
        F.count("*").cast("long").alias("n1p"),
    )
    # continuation table: N1+(·,c) = distinct histories preceding c
    cont = big.groupBy("c").agg(F.count("*").cast("long").alias("ccont"))
    # one broadcast row: N1+(··), n1, n2, D_milli
    totals = big.agg(
        F.count("*").cast("long").alias("conttot"),
        F.sum((F.col("bcnt") == 1).cast("long")).alias("n1"),
        F.sum((F.col("bcnt") == 2).cast("long")).alias("n2"),
    ).select(
        "conttot",
        F.coalesce(
            F.expr("1000 * n1 div (n1 + 2 * n2)"), F.lit(500)
        ).cast("long").alias("d_milli"),
    )

    cont_ppm = F.coalesce(
        F.expr("ccont * 1000000 div conttot"), F.lit(0)
    ).cast("long")
    bits_of = lambda p_ppm: F.when(  # noqa: E731
        p_ppm >= 1, F.lit(KN_BITS_ONE) - F.length(F.bin(p_ppm))
    ).otherwise(F.lit(KN_FLOOR_BITS))

    firsts = (
        df.where(n >= 1)
        .select(F.col(id_col).alias("_id"), F.element_at(t, 1).alias("c"))
        .join(cont, "c", "left")
        .join(uni.withColumnRenamed("w", "c"), "c", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_id",
            bits_of(cont_ppm).alias("bits"),
            F.lit(0).alias("backoff"),
            F.col("ucnt").isNull().cast("int").alias("oov"),
        )
    )
    # p_ppm for positions 2+: seen history -> discounted main mass +
    # interpolation term; unseen history -> the continuation fallback
    p_ppm = F.when(
        F.col("hcnt").isNotNull(),
        # main: max(C(p,c)·1000 - D_milli, 0)·1000 div C(p·)
        F.expr(
            "greatest(coalesce(bcnt, 0) * 1000 - d_milli, 0) * 1000 div hcnt"
        )
        # interpolation: D_milli·N1+(p,·)·Pcont_ppm div (C(p·)·1000)
        + F.expr(
            "d_milli * n1p * coalesce(ccont * 1000000 div conttot, 0)"
            " div (hcnt * 1000)"
        ),
    ).otherwise(cont_ppm).cast("long")
    prs = (
        df.select(F.col(id_col).alias("_id"), F.explode(pairs_col).alias("pr"))
        .select("_id", F.col("pr")["0"].alias("p"), F.col("pr")["1"].alias("c"))
        .join(big, ["p", "c"], "left")
        .join(hist, "p", "left")
        .join(cont, "c", "left")
        .join(uni.withColumnRenamed("w", "c"), "c", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_id",
            bits_of(p_ppm).alias("bits"),
            F.col("bcnt").isNull().cast("int").alias("backoff"),
            F.col("ucnt").isNull().cast("int").alias("oov"),
        )
    )
    return (
        firsts.unionByName(prs)
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("token_ct"),
            F.sum("bits").cast("long").alias("surprisal_bits"),
            F.sum("backoff").cast("long").alias("backoff_ct"),
            F.sum("oov").cast("long").alias("oov_ct"),
        )
        .select(
            F.col("_id").alias(id_col),
            "token_ct",
            "surprisal_bits",
            "backoff_ct",
            "oov_ct",
            (F.col("surprisal_bits").cast("double") / F.col("token_ct")).alias(
                "bits_per_token"
            ),
        )
    )


def lm_surprisal_mkn(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_pred: Column,
) -> DataFrame:
    """MODIFIED Kneser-Ney bigram LM (Chen & Goodman 1999 §3 — their
    best-performing smoothing, the variant KenLM ships as default):
    instead of one absolute discount, three count-dependent discounts

      Y  = n1 / (n1 + 2·n2)
      D1 = 1 - 2·Y·(n2/n1),  D2 = 2 - 3·Y·(n3/n2),  D3+ = 3 - 4·Y·(n4/n3)

    applied by the pair's own count (D(c)=D1 at c=1, D2 at c=2, D3+ at
    c>=3), with the interpolation weight carrying the count-stratified
    continuation tallies: lambda(p) ∝ D1·N1(p,·) + D2·N2(p,·) +
    D3+·N3+(p,·). Same continuation-unigram base and quantization as
    `lm_surprisal_kn`: every discount in milli (clamped to [0, c·1000]
    via the greatest() in the adjusted count), probabilities in ppm,
    surprisal as KN_BITS_ONE - len(bin(ppm)) with the KN_FLOOR_BITS
    floor. BIGINT headroom: D·N·Pcont <= 3000·C·10^6 — safe to ~3e9
    occurrences of one history (doc-noted, the family hazard).

    Scale: identical shape to lm_surprisal_kn — one more aggregate
    column set on the history table, the discount constants still ride
    the 1-row broadcast."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    pairs_col = F.when(
        n >= 2, F.arrays_zip(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1))
    )

    train = df.where(train_pred)
    uni = (
        train.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("ucnt"))
    )
    big = (
        train.select(F.explode(pairs_col).alias("pr"))
        .select(F.col("pr")["0"].alias("p"), F.col("pr")["1"].alias("c"))
        .groupBy("p", "c")
        .agg(F.count("*").cast("long").alias("bcnt"))
    )
    hist = big.groupBy("p").agg(
        F.sum("bcnt").cast("long").alias("hcnt"),
        F.sum((F.col("bcnt") == 1).cast("long")).alias("np1"),
        F.sum((F.col("bcnt") == 2).cast("long")).alias("np2"),
        F.sum((F.col("bcnt") >= 3).cast("long")).alias("np3"),
    )
    cont = big.groupBy("c").agg(F.count("*").cast("long").alias("ccont"))
    # one broadcast row: continuation total + the three milli discounts
    totals = big.agg(
        F.count("*").cast("long").alias("conttot"),
        F.sum((F.col("bcnt") == 1).cast("long")).alias("n1"),
        F.sum((F.col("bcnt") == 2).cast("long")).alias("n2"),
        F.sum((F.col("bcnt") == 3).cast("long")).alias("n3"),
        F.sum((F.col("bcnt") == 4).cast("long")).alias("n4"),
    ).select(
        "conttot",
        F.coalesce(
            F.expr("1000 * n1 div (n1 + 2 * n2)"), F.lit(500)
        ).cast("long").alias("y_milli"),
        "n1", "n2", "n3", "n4",
    ).select(
        "conttot",
        F.expr("greatest(1000 - 2 * y_milli * n2 div greatest(n1, 1), 0)")
        .cast("long").alias("d1_milli"),
        F.expr("greatest(2000 - 3 * y_milli * n3 div greatest(n2, 1), 0)")
        .cast("long").alias("d2_milli"),
        F.expr("greatest(3000 - 4 * y_milli * n4 div greatest(n3, 1), 0)")
        .cast("long").alias("d3_milli"),
    )

    cont_ppm = F.coalesce(
        F.expr("ccont * 1000000 div conttot"), F.lit(0)
    ).cast("long")
    bits_of = lambda p_ppm: F.when(  # noqa: E731
        p_ppm >= 1, F.lit(KN_BITS_ONE) - F.length(F.bin(p_ppm))
    ).otherwise(F.lit(KN_FLOOR_BITS))

    firsts = (
        df.where(n >= 1)
        .select(F.col(id_col).alias("_id"), F.element_at(t, 1).alias("c"))
        .join(cont, "c", "left")
        .join(uni.withColumnRenamed("w", "c"), "c", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_id",
            bits_of(cont_ppm).alias("bits"),
            F.lit(0).alias("backoff"),
            F.col("ucnt").isNull().cast("int").alias("oov"),
        )
    )
    # single source of truth for the count-stratified MKN discount CASE
    d_case = (
        "CASE WHEN coalesce(bcnt, 0) = 0 THEN 0"
        " WHEN bcnt = 1 THEN d1_milli"
        " WHEN bcnt = 2 THEN d2_milli"
        " ELSE d3_milli END"
    )
    p_ppm = F.when(
        F.col("hcnt").isNotNull(),
        F.expr(
            f"greatest(coalesce(bcnt, 0) * 1000 - {d_case}, 0) * 1000 div hcnt"
        )
        + F.expr(
            "(d1_milli * np1 + d2_milli * np2 + d3_milli * np3)"
            " * coalesce(ccont * 1000000 div conttot, 0)"
            " div (hcnt * 1000)"
        ),
    ).otherwise(cont_ppm).cast("long")
    prs = (
        df.select(F.col(id_col).alias("_id"), F.explode(pairs_col).alias("pr"))
        .select("_id", F.col("pr")["0"].alias("p"), F.col("pr")["1"].alias("c"))
        .join(big, ["p", "c"], "left")
        .join(hist, "p", "left")
        .join(cont, "c", "left")
        .join(uni.withColumnRenamed("w", "c"), "c", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_id",
            bits_of(p_ppm).alias("bits"),
            F.col("bcnt").isNull().cast("int").alias("backoff"),
            F.col("ucnt").isNull().cast("int").alias("oov"),
        )
    )
    return (
        firsts.unionByName(prs)
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("token_ct"),
            F.sum("bits").cast("long").alias("surprisal_bits"),
            F.sum("backoff").cast("long").alias("backoff_ct"),
            F.sum("oov").cast("long").alias("oov_ct"),
        )
        .select(
            F.col("_id").alias(id_col),
            "token_ct",
            "surprisal_bits",
            "backoff_ct",
            "oov_ct",
            (F.col("surprisal_bits").cast("double") / F.col("token_ct")).alias(
                "bits_per_token"
            ),
        )
    )
