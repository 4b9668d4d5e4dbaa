"""BPE merge-pair training and tokenization (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
byte-pair-encoding vocabulary induction every training-data stack ships).

The pipeline already COUNTS tokens with a BPE-ish proxy (quality.py
token_count); this trains an actual merge table from the corpus and
tokenizes with it (r7 verdict task 6). Spark-first shape:

- the training state is the WORD VOCABULARY (distinct words x frequency),
  never the corpus: one explode+agg builds it, and every merge round is
  one tiny explode+agg over <= `vocab_cap` rows plus a JVM-side rewrite
  (aggregate fold) — 2 small jobs per round, zero Python in the data path;
- the corpus caps into the vocabulary deterministically (top `vocab_cap`
  words by (freq DESC, word ASC) — the documented sample every published
  BPE trainer applies at scale);
- pair selection is DETERMINISTIC: max count, ties broken (left ASC,
  right ASC) on binary string order — any engine replays it;
- one merge round applies its pair GREEDY LEFT-TO-RIGHT, one pass (the
  classic non-overlapping rule: "aaa" + (a,a) -> [aa, a]); tokenization
  applies the learned merges once each, in rank order (a deterministic
  single-pass-per-rank variant of exhaustive BPE encoding — documented
  divergence, replayed exactly by the DuckDB oracle).

At 100 TB the corpus scan happens ONCE (word counting); everything after
is O(vocab) per round — the reason BPE training is cheap at any corpus
size once re-expressed over the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

BPE_MERGES = 10  # fixed iteration count (graded setting)
BPE_VOCAB_CAP = 2000  # top words by (freq DESC, word ASC)
BPE_MAX_WORD_CHARS = 16  # longer words are noise at training time


def word_symbols(w: Column) -> Column:
    """Character-symbol array of a word (regexp '.', so both engines
    drop embedded newlines identically)."""
    return F.regexp_extract_all(w, F.lit("."), 0)


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """One greedy left-to-right pass merging adjacent (left, right) into
    left||right — a JVM-side aggregate fold, no UDF. Non-overlapping by
    construction: a just-merged symbol (left||right) never equals
    `left`, so "aaa" + (a,a) -> [aa, a], the classic BPE rule."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_vocab(
    df: DataFrame,
    text_col: str,
    vocab_cap: int = BPE_VOCAB_CAP,
    max_word: int = BPE_MAX_WORD_CHARS,
    symbols=word_symbols,
) -> DataFrame:
    """(word, freq, syms): the capped training vocabulary. `symbols`
    picks the base alphabet — characters (default) or bytes (the GPT-2
    byte-level variant's byte_symbols)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .where(F.length("w") <= max_word)
        .orderBy(F.col("freq").desc(), F.col("w"))
        .limit(vocab_cap)
        .select("w", "freq", symbols(F.col("w")).alias("syms"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = BPE_MERGES,
    vocab_cap: int = BPE_VOCAB_CAP,
    max_word: int = BPE_MAX_WORD_CHARS,
    symbols=word_symbols,
) -> list[tuple[int, str, str]]:
    """Learn `n_merges` merge pairs; returns [(rank, left, right), ...].

    Per round: ONE explode+agg over the vocabulary for weighted pair
    counts, argmax as a single-row `min(struct(-c, l, r))` aggregate —
    value-identical to `ORDER BY c DESC, l, r LIMIT 1` (struct ordering
    is lexicographic and -c ascending IS c descending) but a map-side
    partial aggregate instead of a global sort (guide §2.3) — then the
    greedy rewrite. The rewrite chain is lineage-cut every
    `_CKPT_EVERY` rounds rather than every round: the training loop is
    many tiny driver-sequenced jobs over a <= vocab_cap-row frame, so
    per-round checkpoints were pure scheduling overhead, while a
    bounded apply_merge chain re-evaluates at most _CKPT_EVERY cheap
    array folds per row. Stops early if no pair remains. `symbols`
    picks the base alphabet (chars or the byte-level table).

    _CKPT_EVERY trades scheduling overhead against re-evaluated fold
    passes AND codegen depth (ADVICE r13): within a window, round k's
    aggregation replays all k pending folds, so fold work grows
    ~quadratically across the window (sum 1..8 ≈ 36 passes per 8 rounds
    vs 8 with per-round checkpoints — still cheap because each fold is
    an in-memory array rewrite over <= vocab_cap rows), and deeply
    nested aggregate lambdas approach whole-stage-codegen size limits.
    Keep the constant small; re-measure before raising it."""
    _CKPT_EVERY = 8
    vocab = word_vocab(df, text_col, vocab_cap, max_word, symbols).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str]] = []
    pending = 0
    for rank in range(1, n_merges + 1):
        n = F.size("syms")
        zipped = F.arrays_zip(
            F.slice("syms", 1, n - 1), F.slice("syms", 2, n - 1)
        )
        top = (
            vocab.where(n >= 2)
            .select(F.explode(zipped).alias("p"), "freq")
            .select(
                F.col("p")["0"].alias("l"),
                F.col("p")["1"].alias("r"),
                "freq",
            )
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("c"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("l"), F.col("r")
                    )
                ).alias("m")
            )
            .first()["m"]
        )
        if top is None:
            break
        merges.append((rank, top["l"], top["r"]))
        vocab = vocab.withColumn(
            "syms", apply_merge(F.col("syms"), top["l"], top["r"])
        )
        pending += 1
        if pending >= _CKPT_EVERY and rank < n_merges:
            vocab = vocab.localCheckpoint(eager=True)
            pending = 0
    return merges


def bpe_piece_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str]],
) -> DataFrame:
    """Per-document BPE statistics with a learned merge table:
    (id, word_ct, bpe_ct) — whitespace words and the pieces they encode
    to after applying the merges in rank order (one greedy pass each).
    The fold runs over DISTINCT words only (the same word never encodes
    twice), then joins back to occurrences — O(vocab) Python-free
    encoding however large the corpus."""
    occ = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    syms = word_symbols(F.col("w"))
    for _rank, left, right in sorted(merges):
        syms = apply_merge(syms, left, right)
    pieces = occ.select("w").distinct().select(
        "w", F.size(syms).alias("_pieces")
    )
    agg = (
        occ.join(pieces, "w")
        .groupBy("_id")
        .agg(
            F.count("*").alias("word_ct"),
            F.sum("_pieces").alias("bpe_ct"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(agg, df[id_col] == agg["_id"], "left")
        .select(
            id_col,
            F.coalesce("word_ct", F.lit(0)).cast("long").alias("word_ct"),
            F.coalesce("bpe_ct", F.lit(0)).cast("long").alias("bpe_ct"),
        )
    )


#: merge-count truncations the vocab-size sweep evaluates (vocab size =
#: base alphabet + n_merges, so truncating the RANK-ORDERED merge table
#: is BPE's native vocab-size knob — the property that makes one stored
#: artifact serve every smaller vocabulary)
FERTILITY_SWEEP_CUTS = (3, 6, 10)


def bpe_fertility_sweep(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[int, str, str]],
    cuts: tuple[int, ...] = FERTILITY_SWEEP_CUTS,
) -> DataFrame:
    """(n_merges, word_ct, piece_ct, fertility_milli): corpus fertility
    at each merge-count truncation — the standard tokenizer-selection
    table (encode the same corpus at several vocabulary sizes, pick the
    knee of the fertility curve).

    ONE encode pass serves every truncation: BPE applies merges in rank
    order, so the piece count at cut k is just the symbol-array length
    AFTER merge k — the fold snapshots `size(syms)` at each cut instead
    of re-encoding per vocabulary. Work stays O(DISTINCT words) like
    every encode in this module; the 3-row report is one aggregate plus
    an in-plan unpivot."""
    occ = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    dw = occ.groupBy("w").agg(F.count("*").alias("_n"))
    syms = word_symbols(F.col("w"))
    ms = sorted(merges)
    lens: dict[int, Column] = {}
    applied = 0
    for cut in sorted(cuts):
        for rank, left, right in ms:
            if applied < rank <= cut:
                syms = apply_merge(syms, left, right)
        applied = cut
        lens[cut] = F.size(syms).cast("long")
    snap = dw.select(
        "_n", *[lens[c].alias(f"_l{c}") for c in sorted(cuts)]
    )
    agg = snap.agg(
        F.sum("_n").cast("long").alias("word_ct"),
        *[
            F.sum(F.col(f"_l{c}") * F.col("_n")).cast("long").alias(f"_p{c}")
            for c in sorted(cuts)
        ],
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(int(c)).cast("long").alias("n_merges"),
                F.col(f"_p{c}").alias("piece_ct"),
            )
            for c in sorted(cuts)
        ]
    )
    return agg.select("word_ct", F.explode(stages).alias("_s")).select(
        F.col("_s.n_merges").alias("n_merges"),
        F.col("word_ct"),
        F.col("_s.piece_ct").cast("long").alias("piece_ct"),
        F.expr("_s.piece_ct * 1000 div word_ct").cast("long")
        .alias("fertility_milli"),
    )


# ---------------------------------------------------------------------------
# WordPiece encoding over the BPE-trained vocabulary (round 9). BERT's
# tokenizer (Devlin et al. 2018; the greedy variant formalized in Song et
# al. 2021, "Fast WordPiece Tokenization") ENCODES differently from BPE:
# instead of replaying merges, it takes the LONGEST vocabulary piece
# matching at the cursor (maximal munch) and maps the whole word to a
# single [UNK] when any position matches nothing. The "##" continuation
# marker is omitted (pieces match raw at any offset — documented
# simplification; the vocab carries no ## entries to distinguish).
#
# Spark-first shape — the encode is THREE set operations, no per-row
# Python and no unbounded unroll:
#   1. distinct words explode into every (start, len<=piece-cap)
#      substring — O(16 * chars) rows over DISTINCT words only (Heaps'
#      law bounds that at any corpus size);
#   2. one BROADCAST join against the piece vocabulary, then max(len)
#      per (word, start): greedy munch only ever consults the longest
#      match at a cursor;
#   3. a per-word aggregate fold over character positions walks the
#      cursor through the match map — O(word length) with O(1) lookups.
# ---------------------------------------------------------------------------

WP_MAX_PIECE_CHARS = BPE_MAX_WORD_CHARS  # longest vocab piece considered


def wordpiece_vocab(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[int, str, str]],
    vocab_cap: int = BPE_VOCAB_CAP,
    max_word: int = BPE_MAX_WORD_CHARS,
) -> DataFrame:
    """The piece vocabulary a BPE training run induces: every symbol
    surviving in the capped word vocabulary after the merge table is
    applied in rank order (single characters that were never merged away
    plus each merge's output). One column, `piece`."""
    vocab = word_vocab(df, text_col, vocab_cap, max_word)
    syms = F.col("syms")
    for _rank, left, right in sorted(merges):
        syms = apply_merge(syms, left, right)
    return vocab.select(F.explode(syms).alias("piece")).distinct()


def wordpiece_piece_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str]],
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(id, word_ct, wp_ct, unk_ct): whitespace words per document, the
    WordPiece pieces they encode to under greedy maximal munch, and how
    many words fell to [UNK] (counted as ONE piece each, BERT's rule).

    `vocab` is the TRAINING corpus's piece table (wordpiece_vocab); it
    defaults to deriving one from `df` itself, which is only right when
    the encode corpus IS the training corpus — pass it explicitly when
    they differ, or the vocabulary silently tracks the wrong corpus."""
    occ = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    dw = occ.select("w").distinct()
    if vocab is None:
        vocab = wordpiece_vocab(df, text_col, merges)
    subs = word_substrings(dw)
    best = (
        subs.join(F.broadcast(vocab), "piece")
        .groupBy("w", "start")
        .agg(F.max("plen").alias("mlen"))
    )
    munch = best.groupBy("w").agg(
        F.map_from_entries(F.collect_list(F.struct("start", "mlen"))).alias("m")
    )

    def _step(acc, i):
        mlen = F.try_element_at(F.col("m"), acc["pos"])
        advanced = F.struct(
            (acc["pos"] + mlen).alias("pos"),
            (acc["pieces"] + 1).alias("pieces"),
            F.lit(False).alias("unk"),
        )
        failed = F.struct(
            acc["pos"].alias("pos"),
            acc["pieces"].alias("pieces"),
            F.lit(True).alias("unk"),
        )
        return F.when((i != acc["pos"]) | acc["unk"], acc).otherwise(
            F.when(mlen.isNotNull(), advanced).otherwise(failed)
        )

    state = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.struct(
            F.lit(1).cast("int").alias("pos"),
            F.lit(0).cast("int").alias("pieces"),
            F.lit(False).alias("unk"),
        ),
        _step,
    )
    enc = (
        dw.join(munch, "w", "left")
        .select("w", state.alias("s"))
        .select(
            "w",
            F.when(F.col("s")["unk"], F.lit(1))
            .otherwise(F.col("s")["pieces"])
            .alias("_pieces"),
            F.col("s")["unk"].cast("int").alias("_unk"),
        )
    )
    agg = (
        occ.join(enc, "w")
        .groupBy("_id")
        .agg(
            F.count("*").alias("word_ct"),
            F.sum("_pieces").alias("wp_ct"),
            F.sum("_unk").alias("unk_ct"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(agg, df[id_col] == agg["_id"], "left")
        .select(
            id_col,
            F.coalesce("word_ct", F.lit(0)).cast("long").alias("word_ct"),
            F.coalesce("wp_ct", F.lit(0)).cast("long").alias("wp_ct"),
            F.coalesce("unk_ct", F.lit(0)).cast("long").alias("unk_ct"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenization (Kudo 2018, "Subword Regularization" — the
# SentencePiece unigram model; the third standard subword algorithm next
# to BPE and WordPiece). Viterbi decoding: segment each word into the
# piece sequence of MINIMUM total surprisal under a unigram piece model.
# The piece inventory and its probabilities both derive deterministically
# from the graded BPE training run (piece weight = frequency-weighted
# count of the surviving symbol across the trained vocabulary), then ONE
# EM iteration refines them (unigram_em_refine below): the E-step
# Viterbi-segments the training vocabulary under the seed costs (hard /
# Viterbi EM — the argmax posterior stands in for Kudo's
# forward-backward expectations, the remaining documented divergence),
# the M-step re-estimates integer milli-bit costs from the
# frequency-weighted piece counts, and pieces the E-step never chooses
# leave the inventory (the paper's pruning). The DECODER is the real
# algorithm.
#
# Determinism across engines: piece costs are INTEGER milli-bits
# (floor(1000 * ln(T/w) / ln2) with ln2 as a shared literal), and the DP
# minimizes the single integer 2048*cost + pieces — lexicographic
# (total surprisal, piece count), so float comparisons never decide a
# path. Words longer than UNIGRAM_MAX_WORD_CHARS skip the DP and map to
# [UNK] (the max_input_chars_per_word cap HF tokenizers apply); an
# unreachable word end is [UNK] too, one piece, like WordPiece.
# ---------------------------------------------------------------------------

UNIGRAM_MAX_WORD_CHARS = 64
UNIGRAM_INF = 1 << 62
LN2 = 0.6931471805599453


def word_substrings(dw: DataFrame, max_piece: int = WP_MAX_PIECE_CHARS) -> DataFrame:
    """(w, start, plen, piece): every candidate substring of each
    distinct word up to the piece cap — the shared inverted-index shape
    both WordPiece munch and unigram Viterbi match against."""
    return (
        dw.select("w", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("start"))
        .select(
            "w",
            "start",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece), F.length("w") - F.col("start") + 1),
                )
            ).alias("plen"),
        )
        .select(
            "w", "start", "plen",
            F.col("w").substr(F.col("start"), F.col("plen")).alias("piece"),
        )
    )


def unigram_piece_costs(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[int, str, str]],
    vocab_cap: int = BPE_VOCAB_CAP,
    max_word: int = BPE_MAX_WORD_CHARS,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(piece, cost): integer milli-bit surprisal per piece. Weight =
    sum over the trained vocabulary of word-frequency x symbol count;
    cost = floor(1000 * ln(T / w) / ln 2). The total rides along as a
    broadcast 1-row frame — no driver-side collect. `vocab` lets a
    caller that already materialized `word_vocab(df, ...)` share it
    (the EM refinement needs the same frame twice)."""
    if vocab is None:
        vocab = word_vocab(df, text_col, vocab_cap, max_word)
    syms = F.col("syms")
    for _rank, left, right in sorted(merges):
        syms = apply_merge(syms, left, right)
    pw = (
        vocab.select(F.explode(syms).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("w"))
    )
    tot = pw.agg(F.sum("w").alias("t"))
    return pw.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.floor(
            F.lit(1000.0)
            * F.log(F.col("t").cast("double") / F.col("w"))
            / F.lit(LN2)
        )
        .cast("long")
        .alias("cost"),
    )


def unigram_viterbi_segments(words: DataFrame, costs: DataFrame) -> DataFrame:
    """(w, ps): the Viterbi piece sequence of each reachable word under
    `costs` — the forward DP of `unigram_piece_counts` kept as a FULL
    cost array plus a backtrace fold. Unreachable (or over-cap) words
    drop out. Ties in the backtrace break to the LONGEST piece achieving
    the optimal combined value (deterministic; the oracle replays it).

    Plan discipline: the dp array is emitted through an
    explode(array(...)) Generate barrier before the backtrace references
    it O(length) times — without the barrier CollapseProject would
    inline the whole forward fold into every element_at (the
    [[catalyst-hof-inlining]] trap, measured on the audio walk)."""
    dwu = words.where(F.length("w") <= UNIGRAM_MAX_WORD_CHARS)
    mends = word_substrings(dwu).join(F.broadcast(costs), "piece").select(
        "w",
        (F.col("start") + F.col("plen") - 1).alias("endp"),
        "plen",
        "cost",
    )
    dpmap = (
        mends.groupBy("w", "endp")
        .agg(F.collect_list(F.struct("plen", "cost")).alias("opts"))
        .groupBy("w")
        .agg(F.map_from_entries(F.collect_list(F.struct("endp", "opts"))).alias("m"))
    )

    def _step(acc, j):
        opts = F.try_element_at(F.col("m"), j)
        cands = F.filter(
            F.transform(
                opts,
                lambda o: F.when(
                    F.element_at(acc, (j - o["plen"] + 1).cast("int"))
                    < UNIGRAM_INF,
                    F.element_at(acc, (j - o["plen"] + 1).cast("int"))
                    + o["cost"] * 2048
                    + 1,
                ),
            ),
            lambda x: x.isNotNull(),
        )
        new = (
            F.when(F.size(cands) > 0, F.array_min(cands))
            .otherwise(F.lit(UNIGRAM_INF))
            .cast("long")
        )
        return F.concat(acc, F.array(new))

    dp_full = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.array(F.lit(0).cast("long")),
        _step,
    )
    staged = dwu.join(dpmap, "w").select(
        "w", "m", F.explode(F.array(dp_full)).alias("_dp")
    )

    def _back(acc, _):
        pos = acc["pos"]
        dpv = F.element_at(F.col("_dp"), (pos + 1).cast("int"))
        pl = F.array_max(
            F.filter(
                F.transform(
                    F.try_element_at(F.col("m"), pos.cast("long")),
                    lambda o: F.when(
                        F.element_at(
                            F.col("_dp"), (pos - o["plen"] + 1).cast("int")
                        )
                        + o["cost"] * 2048
                        + 1
                        == dpv,
                        o["plen"],
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        )
        return F.when(pos <= 0, acc).otherwise(
            F.struct(
                (pos - pl).cast("long").alias("pos"),
                F.concat(
                    acc["ps"],
                    F.array(
                        F.col("w").substr(
                            (pos - pl + 1).cast("int"), pl.cast("int")
                        )
                    ),
                ).alias("ps"),
            )
        )

    back = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.struct(
            F.length("w").cast("long").alias("pos"),
            F.array().cast("array<string>").alias("ps"),
        ),
        _back,
        lambda acc: F.reverse(acc["ps"]),  # backtrace built end-to-start
    )
    return (
        staged.where(
            F.element_at(F.col("_dp"), (F.length("w") + 1).cast("int"))
            < UNIGRAM_INF
        )
        .select("w", back.alias("ps"))
    )


def unigram_em_refine(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[int, str, str]],
    vocab_cap: int = BPE_VOCAB_CAP,
    max_word: int = BPE_MAX_WORD_CHARS,
) -> DataFrame:
    """(piece, cost): ONE EM iteration over the seed unigram model
    (Kudo 2018 §3's iterative estimation, hard-EM variant — the
    module-header divergence note): E-step = Viterbi-segment the capped
    training vocabulary under `unigram_piece_costs`; M-step = piece
    weight is the frequency-weighted count of the piece across those
    segmentations, re-normalized into the same integer milli-bit costs.
    Pieces the E-step never chooses get NO row — they leave the
    inventory, the paper's pruning step.

    Scale: the E-step runs over <= vocab_cap DISTINCT words (the same
    corpus view the seed weights derive from), so the whole refinement
    is O(vocab) work after the one corpus scan word_vocab already does
    — iterations are cheap at any corpus size. The vocabulary frame is
    materialized ONCE (localCheckpoint) and shared by the seed-cost
    derivation and the E-step, instead of re-running the corpus
    scan+agg+top-k per use."""
    vocab_full = word_vocab(df, text_col, vocab_cap, max_word)
    if not vocab_full.isStreaming:
        vocab_full = vocab_full.localCheckpoint(eager=True)
    seed = unigram_piece_costs(
        df, text_col, merges, vocab_cap, max_word, vocab=vocab_full
    )
    vocab = vocab_full.select(F.col("w"), "freq")
    seg = unigram_viterbi_segments(vocab.select("w"), seed)
    pw = (
        seg.join(vocab, "w")
        .select(F.explode("ps").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("w"))
    )
    tot = pw.agg(F.sum("w").alias("t"))
    return pw.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.floor(
            F.lit(1000.0)
            * F.log(F.col("t").cast("double") / F.col("w"))
            / F.lit(LN2)
        )
        .cast("long")
        .alias("cost"),
    )


def unigram_piece_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str]],
    costs: DataFrame | None = None,
) -> DataFrame:
    """(id, word_ct, up_ct, unk_ct): Viterbi piece counts per document.

    Shape: matches = substring explode x BROADCAST cost table; per word
    an O(length) aggregate fold carries the DP cost array (combined
    integer 2048*cost + k, so array_min is the lexicographic argmin);
    encode work is bounded by DISTINCT words. `costs` defaults to
    deriving the EM-REFINED model from `df` itself — seed costs plus
    one `unigram_em_refine` iteration (right only when encode corpus =
    training corpus — same contract as wordpiece_piece_counts)."""
    occ = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    dw = occ.select("w").distinct()
    if costs is None:
        costs = unigram_em_refine(df, text_col, merges)
    dwu = dw.where(F.length("w") <= UNIGRAM_MAX_WORD_CHARS)
    mends = word_substrings(dwu).join(F.broadcast(costs), "piece").select(
        "w",
        (F.col("start") + F.col("plen") - 1).alias("endp"),
        "plen",
        "cost",
    )
    dpmap = (
        mends.groupBy("w", "endp")
        .agg(F.collect_list(F.struct("plen", "cost")).alias("opts"))
        .groupBy("w")
        .agg(F.map_from_entries(F.collect_list(F.struct("endp", "opts"))).alias("m"))
    )

    def _step(acc, j):
        opts = F.try_element_at(F.col("m"), j)
        cands = F.filter(
            F.transform(
                opts,
                lambda o: F.when(
                    F.element_at(acc, (j - o["plen"] + 1).cast("int"))
                    < UNIGRAM_INF,
                    F.element_at(acc, (j - o["plen"] + 1).cast("int"))
                    + o["cost"] * 2048
                    + 1,
                ),
            ),
            lambda x: x.isNotNull(),
        )
        new = (
            F.when(F.size(cands) > 0, F.array_min(cands))
            .otherwise(F.lit(UNIGRAM_INF))
            .cast("long")
        )
        return F.concat(acc, F.array(new))

    combined = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.array(F.lit(0).cast("long")),
        _step,
        lambda acc: F.element_at(acc, (F.length("w") + 1).cast("int")),
    )
    dp = dwu.join(dpmap, "w", "left").select("w", combined.alias("c"))
    is_unk = F.col("c").isNull() | (F.col("c") >= UNIGRAM_INF)
    enc = dw.join(dp, "w", "left").select(
        "w",
        F.when(is_unk, F.lit(1)).otherwise(F.col("c") % 2048).alias("_pieces"),
        is_unk.cast("int").alias("_unk"),
    )
    agg = (
        occ.join(enc, "w")
        .groupBy("_id")
        .agg(
            F.count("*").alias("word_ct"),
            F.sum("_pieces").alias("up_ct"),
            F.sum("_unk").alias("unk_ct"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(agg, df[id_col] == agg["_id"], "left")
        .select(
            id_col,
            F.coalesce("word_ct", F.lit(0)).cast("long").alias("word_ct"),
            F.coalesce("up_ct", F.lit(0)).cast("long").alias("up_ct"),
            F.coalesce("unk_ct", F.lit(0)).cast("long").alias("unk_ct"),
        )
    )


# ---------------------------------------------------------------------------
# Byte-level BPE (round 10): the GPT-2 tokenizer shape (Radford et al.
# 2019, "Language Models are Unsupervised Multitask Learners" §2.2).
# Completes the tokenizer family with the NO-UNK property the other three
# lack — WordPiece/Unigram emit a whole-word [UNK] on unmatched positions,
# but here every UTF-8 byte has a base symbol (a printable stand-in
# character from the standard 256-entry byte-to-unicode table), so ANY
# input encodes and the encoding is LOSSLESS (invert the table, concat).
# Merges train on the same corpus/vocab-cap/merge-count settings as the
# char-level bpe_train, just over the byte alphabet; encode is the same
# single-pass-per-rank merge replay. Whitespace pre-tokenization via
# tokens() (lowercase, space-split) — GPT-2's leading-space Ġ convention
# is subsumed by the split (documented simplification).
# ---------------------------------------------------------------------------


def _bytes_to_unicode_lut() -> str:
    """The standard GPT-2 byte->unicode table as a 256-char string
    (lut[b] = stand-in char for byte b): printable latin bytes map to
    themselves, the rest to U+0100.. in order — every stand-in is a
    single printable BMP char, so string ops see clean symbols."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    keep_set = set(keep)
    out, n = [], 0
    for b in range(256):
        if b in keep_set:
            out.append(chr(b))
        else:
            out.append(chr(256 + n))
            n += 1
    return "".join(out)


BYTE_UNICODE_LUT = _bytes_to_unicode_lut()
#: inverse table for the decode path / losslessness tests
BYTE_UNICODE_INV = {c: b for b, c in enumerate(BYTE_UNICODE_LUT)}


def byte_symbols(w: Column) -> Column:
    """Byte-level symbol array of a word: each UTF-8 byte maps through
    the 256-char LUT (symbol = lut[byte]) — pure JVM (hex the bytes,
    index the LUT literal per hex pair), no UDF. Total by construction:
    no byte can miss, the no-UNK property."""
    b = F.encode(w, "UTF-8")
    h = F.hex(b)
    lut = F.lit(BYTE_UNICODE_LUT)
    return F.transform(
        F.sequence(F.lit(1).cast("long"), F.octet_length(b).cast("long")),
        lambda i: lut.substr(
            (
                F.conv(h.substr((i * 2 - 1).cast("int"), F.lit(2)), 16, 10)
                + 1
            ).cast("int"),
            F.lit(1),
        ),
    )


def bytelevel_decode(pieces: list[str]) -> bytes:
    """Invert the byte-level encoding: concat pieces, map each stand-in
    char back to its byte. Raises KeyError on a char outside the table —
    impossible for genuine encoder output (losslessness tests rely on
    this)."""
    return bytes(BYTE_UNICODE_INV[c] for c in "".join(pieces))


def bytelevel_piece_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str]],
) -> DataFrame:
    """Per-document byte-level BPE statistics + full-stream fingerprint:
    (id, word_ct, byte_ct, piece_ct, enc_fp) where enc_fp is the md5 of
    the document's complete encoding (each word's pieces joined by
    spaces, words in document order — base symbols never contain a space,
    byte 0x20 maps to a stand-in, so the join is unambiguous and the
    hash pins every piece boundary).

    Same scale shape as bpe_piece_counts: the merge-replay fold runs
    over DISTINCT words only (Heaps' law bounds that at any corpus
    size), then joins back to positioned occurrences; the per-doc
    ordered reassembly is one aggregate (array_sort over (pos, enc)
    structs), no window, no global sort."""
    occ = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w"),
    )
    syms = byte_symbols(F.col("w"))
    for _rank, left, right in sorted(merges):
        syms = apply_merge(syms, left, right)
    wenc = (
        occ.select("w")
        .distinct()
        .withColumn("_syms", syms)  # staged: referenced twice below
        .select(
            "w",
            F.size("_syms").alias("_pieces"),
            F.array_join("_syms", " ").alias("_enc"),
            F.octet_length(F.encode(F.col("w"), "UTF-8")).cast("long").alias("_bytes"),
        )
    )
    agg = (
        occ.join(wenc, "w")
        .groupBy("_id")
        .agg(
            F.count("*").alias("_word_ct"),
            F.sum("_bytes").alias("_byte_ct"),
            F.sum("_pieces").alias("_piece_ct"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_enc"))),
                    lambda x: x["_enc"],
                ),
                " ",
            ).alias("_encdoc"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(agg, df[id_col] == agg["_id"], "left")
        .select(
            id_col,
            F.coalesce("_word_ct", F.lit(0)).cast("long").alias("word_ct"),
            F.coalesce("_byte_ct", F.lit(0)).cast("long").alias("byte_ct"),
            F.coalesce("_piece_ct", F.lit(0)).cast("long").alias("piece_ct"),
            F.md5(F.coalesce("_encdoc", F.lit(""))).alias("enc_fp"),
        )
    )
