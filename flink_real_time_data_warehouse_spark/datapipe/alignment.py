"""Image-text alignment gating over WebDataset samples (r11 verdict
task 5 — the CLIP-filter role every multimodal pipeline runs; public:
Schuhmann et al. 2021, LAION-400M: pairs below a fixed CLIP-similarity
threshold are dropped before training).

`webdataset_samples` assembles shard members into training samples;
this gates each assembled image+caption pair on the cosine similarity
of the two modalities' embeddings and reports per-shard attrition the
way `filter_funnel` reports per-stage attrition:

  samples -> pairable (has BOTH an image and a caption member)
          -> aligned  (quantized cosine >= threshold)

Determinism: embeddings quantize to exact fixed-point longs
(`similarity.quantized`) before any arithmetic, so the integer dot
products are bit-identical across engines and the final cosine is one
IEEE double division/sqrt over identical integers — the established
`decontaminate_semantic` discipline for engine-reproducible float
gates.

Scale: sample assembly is the same map-side-combining groupBy as
`webdataset_samples` (members of one sample are contiguous in their
shard); the two embedding lookups broadcast (model-produced embeddings
ride with the sample in a real pipeline — the join here only simulates
that locality); SCORING is a pure projection — zero shuffle, zero
Python, one WholeStageCodegen stage (plan-tested); attrition is one
map-side-combinable rollup per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import qcosine, quantized

#: fixed alignment gate (cosine of quantized embeddings)
ALIGN_THRESHOLD = 0.05
#: pairing-rule multipliers (arbitrary coprime-ish constants; the oracle
#: replays them, any engine reproduces the same image/text assignment)
_IMG_MUL, _TXT_MUL, _TXT_OFF = 2, 5, 1


def webdataset_pairable_samples(members: DataFrame) -> DataFrame:
    """One row per assembled sample: (asset_id, sample_key, sample_no,
    has_img, has_txt). A sample is pairable when it carries BOTH an
    image member and a caption member (WebDataset same-basename
    convention: .jpg + .txt)."""
    return members.groupBy("asset_id", "sample_key").agg(
        F.floor(F.min("member_idx") / 2).cast("long").alias("sample_no"),
        F.max((F.col("ext") == "jpg").cast("int")).alias("has_img"),
        F.max((F.col("ext") == "txt").cast("int")).alias("has_txt"),
    )


def scored_samples(
    members: DataFrame, emb: DataFrame, threshold: float = ALIGN_THRESHOLD
) -> DataFrame:
    """One row per assembled sample with its gate flags: (asset_id,
    sample_key, pairable, aligned) — pairable = carries both modalities,
    aligned = pairable AND quantized cosine >= threshold.

    Each pairable sample's image/text embeddings are the deterministic
    rows img = (asset*2 + s) % N and txt = (asset*5 + 3s + 1) % N of the
    embeddings table (simulating the model-scored pair; N = table size
    rides along as a broadcast 1-row frame, no driver collect)."""
    samples = webdataset_pairable_samples(members)
    n = emb.agg(F.count("*").alias("_n"))
    keyed = samples.crossJoin(F.broadcast(n)).select(
        "asset_id",
        "sample_key",
        "has_img",
        "has_txt",
        ((F.col("has_img") == 1) & (F.col("has_txt") == 1)).alias("_pairable"),
        F.pmod(
            F.col("asset_id") * _IMG_MUL + F.col("sample_no"), F.col("_n")
        ).alias("_img_id"),
        F.pmod(
            F.col("asset_id") * _TXT_MUL + 3 * F.col("sample_no") + _TXT_OFF,
            F.col("_n"),
        ).alias("_txt_id"),
    )
    qe = emb.select(
        F.col("vec_id"), quantized(F.col("embedding")).alias("_q")
    )
    iq = qe.select(F.col("vec_id").alias("_img_id"), F.col("_q").alias("_qi"))
    tq = qe.select(F.col("vec_id").alias("_txt_id"), F.col("_q").alias("_qt"))
    return (
        keyed.join(F.broadcast(iq), "_img_id", "left")
        .join(F.broadcast(tq), "_txt_id", "left")
        .select(
            "asset_id",
            "sample_key",
            F.col("_pairable").cast("int").alias("pairable"),
            F.when(
                F.col("_pairable")
                & (qcosine(F.col("_qi"), F.col("_qt")) >= F.lit(threshold)),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("aligned"),
        )
    )


def sample_alignment_gate(
    members: DataFrame, emb: DataFrame, threshold: float = ALIGN_THRESHOLD
) -> DataFrame:
    """Per-shard attrition of the alignment gate: (asset_id, n_samples,
    n_pairable, n_aligned, aligned_ppm).

    aligned_ppm = n_aligned * 1e6 div n_pairable (0 when a shard has no
    pairable sample — e.g. single-member shards carry an image but no
    caption)."""
    scored = scored_samples(members, emb, threshold).select(
        "asset_id",
        F.col("pairable").alias("_p"),
        F.col("aligned").alias("_a"),
    )
    return scored.groupBy("asset_id").agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum("_p").cast("long").alias("n_pairable"),
        F.sum("_a").cast("long").alias("n_aligned"),
        F.when(
            F.sum("_p") > 0,
            F.expr("sum(_a) * 1000000 div sum(_p)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("aligned_ppm"),
    )


def multimodal_curation_funnel(
    members: DataFrame,
    emb: DataFrame,
    keepers: DataFrame,
    caption_flags: DataFrame,
    threshold: float = ALIGN_THRESHOLD,
) -> DataFrame:
    """The multimodal curation pipeline's per-stage attrition report —
    `filter_funnel`'s row shape applied to image-text samples (the
    LAION-style composition: assemble -> pair -> CLIP-gate -> image
    near-dup dedup -> caption quality): (stage_idx, stage, n_in,
    n_kept, n_dropped) with n_in of stage k = n_kept of stage k-1.

      1. pairable        : sample carries both an image and a caption
                           member
      2. alignment       : quantized cosine of the pair >= threshold
      3. image_dedup     : the sample's asset is its dHash near-dup
                           cluster's keeper (one exemplar per cluster)
      4. caption_quality : the sample's caption passes the text-side
                           quality gate (the Gopher rule conjunction —
                           LAION drops short/degenerate captions the
                           same post-alignment way)

    `keepers` is (asset_id, is_keeper) — image_phash_clusters' verdict;
    `caption_flags` is (asset_id, cap_ok) — the text gate's verdict on
    the sample's caption source. Scale: the scored frame is the
    zero-shuffle gate projection; the keeper and caption flags join by
    asset key; all four stage counts reduce in ONE aggregate (map-side
    partials), then a 4-row explode — no per-stage rescans."""
    s = scored_samples(members, emb, threshold)
    j = (
        s.join(keepers, "asset_id", "left")
        .join(caption_flags, "asset_id", "left")
        .select(
            F.col("pairable").alias("_p"),
            F.col("aligned").alias("_a"),
            (
                F.col("aligned") * F.coalesce(F.col("is_keeper"), F.lit(0))
            ).alias("_k"),
            (
                F.col("aligned")
                * F.coalesce(F.col("is_keeper"), F.lit(0))
                * F.coalesce(F.col("cap_ok"), F.lit(0))
            ).alias("_q"),
        )
    )
    agg = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_p").cast("long").alias("s1"),
        F.sum("_a").cast("long").alias("s2"),
        F.sum("_k").cast("long").alias("s3"),
        F.sum("_q").cast("long").alias("s4"),
    )
    stages = F.array(
        F.struct(
            F.lit(1).cast("long").alias("stage_idx"),
            F.lit("pairable").alias("stage"),
            F.col("n").alias("n_in"),
            F.col("s1").alias("n_kept"),
        ),
        F.struct(
            F.lit(2).cast("long").alias("stage_idx"),
            F.lit("alignment").alias("stage"),
            F.col("s1").alias("n_in"),
            F.col("s2").alias("n_kept"),
        ),
        F.struct(
            F.lit(3).cast("long").alias("stage_idx"),
            F.lit("image_dedup").alias("stage"),
            F.col("s2").alias("n_in"),
            F.col("s3").alias("n_kept"),
        ),
        F.struct(
            F.lit(4).cast("long").alias("stage_idx"),
            F.lit("caption_quality").alias("stage"),
            F.col("s3").alias("n_in"),
            F.col("s4").alias("n_kept"),
        ),
    )
    return agg.select(F.explode(stages).alias("_s")).select(
        F.col("_s.stage_idx").alias("stage_idx"),
        F.col("_s.stage").alias("stage"),
        F.col("_s.n_in").alias("n_in"),
        F.col("_s.n_kept").alias("n_kept"),
        (F.col("_s.n_in") - F.col("_s.n_kept")).cast("long").alias("n_dropped"),
    )
