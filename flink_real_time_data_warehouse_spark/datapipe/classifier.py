"""Learned quality classifier (the CCNet/fastText-shaped gap in the
quality family, r8 verdict task 6): a hashed-feature linear scorer with
FIXED-POINT integer weights, trained in ONE aggregation pass and scored
in a ZERO-SHUFFLE projection.

Shape, not library: CCNet scores web text with a fastText model trained
to recognize a high-quality corpus (Wenzek et al. 2020, public); fastText
itself is a bag-of-(hashed-)words linear model (Joulin et al. 2016,
public). Both reduce to: hash each token into B buckets, learn one weight
per bucket from labeled examples, score a document as the sum of its
tokens' weights. That whole shape is expressible in DataFrame algebra:

- TRAIN: explode distinct tokens -> hash to bucket -> groupBy(bucket)
  counting (positives, total). ONE shuffle, and the shuffle moves only
  B-bounded partial aggregates (map-side combine), never the corpus.
  The weight is integer fixed-point — w = (SCALE*(pos+1)) // (tot+2),
  a Laplace-smoothed P(positive | bucket) in [0, SCALE] — so an
  SQL oracle replays training bit-for-bit (no float log-odds drift).
- MODEL: B weights, each <= SCALE, packed 3 hex chars per bucket into
  ONE string — a bounded O(B) artifact (3 KiB at B=1024) that ships to
  executors as a plan literal, exactly how a broadcast model should.
  Collecting it to the driver is control-plane: the model size is fixed
  by B, independent of corpus size.
- SCORE: per row, transform(array_distinct(tokens), t -> weight) and
  aggregate-sum — a single whole-stage-codegen Project with NO join, NO
  exchange, NO Python (plan-tested). At 100 TB the scoring pass is the
  hot path, and it is embarrassingly parallel by construction.

Tokenization is the lower/[^a-z]+ split both engines share; the bucket
hash is md5-prefix — portable to the DuckDB oracle like the rest of the
datapipe family. Complements the rule-based text_quality heuristics
(datapipe/quality.py). Reference analog: the keyword/classifier UDF
surface (KeywordUtil.java) — a learned scorer the warehouse would run at
ingest next to the rule-based one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1024
SCALE = 1000  # fixed-point: weights live in [0, SCALE]
_W_HEX = 3  # hex chars per packed weight (SCALE <= 0xfff)


def tokens(text: Column) -> Column:
    """Distinct lowercase alpha tokens — the [^a-z]+ split both engines
    evaluate identically (non-Latin text yields an empty list and a NULL
    score downstream, the honest answer for an a-z feature space)."""
    return F.array_distinct(
        F.filter(F.split(F.lower(text), "[^a-z]+"), lambda x: x != "")
    )


def bucket(tok: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Feature hash: first 16 bits of md5, mod B (matches the oracle's
    _hex4(md5(tok)) % B)."""
    return (
        F.conv(F.substring(F.md5(F.encode(tok, "UTF-8")), 1, 4), 16, 10)
        .cast("long")
        % n_buckets
    )


def train_quality_classifier(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> str:
    """One-pass training: per-bucket (positives, total) counts -> Laplace
    fixed-point weight, returned as the packed hex-string model. The
    collect is O(B) — the trained model, not data."""
    # a NULL predicate result (e.g. lang IS NULL under `lang == 'en'`)
    # is a NEGATIVE label, not a crash: unguarded, sum("label") goes
    # NULL for any bucket containing such a row and the int() below
    # raised TypeError.
    feats = docs.select(
        F.when(label, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("label"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("label", bucket(F.col("tok"), n_buckets).alias("b"))
    rows = (
        feats.groupBy("b")
        .agg(F.sum("label").alias("pos"), F.count("*").alias("tot"))
        .collect()
    )
    weights = {int(r["b"]): (SCALE * (int(r["pos"]) + 1)) // (int(r["tot"]) + 2) for r in rows}
    default = SCALE // 2  # pos=0, tot=0 -> SCALE*1//2: the uninformed prior
    return "".join(format(weights.get(b, default), f"0{_W_HEX}x") for b in range(n_buckets))


def score_with_model(
    docs: DataFrame,
    model_hex: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Zero-shuffle scoring: one Project computing, per document,
    score = sum of packed weights of its distinct tokens, n_feats, the
    integer mean (milli-probability), and the >0.5 prediction."""
    if len(model_hex) != n_buckets * _W_HEX:
        raise ValueError(
            f"model must pack {n_buckets} weights x {_W_HEX} hex chars, "
            f"got {len(model_hex)} chars"
        )
    model = F.lit(model_hex)

    def weight_of(tok: Column) -> Column:
        pos = (bucket(tok, n_buckets) * _W_HEX + 1).cast("int")
        return F.conv(F.substring(model, pos, _W_HEX), 16, 10).cast("long")

    toks = tokens(F.col(text_col))
    score = F.aggregate(
        F.transform(toks, weight_of), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n_feats = F.size(toks).cast("long")
    avg = F.when(n_feats > 0, F.floor(score / n_feats).cast("long"))
    return docs.select(
        F.col(id_col),
        score.alias("score"),
        n_feats.alias("n_feats"),
        avg.alias("avg_milli"),
        F.when(n_feats > 0, (avg > SCALE // 2).cast("int")).alias("pred_positive"),
    )
