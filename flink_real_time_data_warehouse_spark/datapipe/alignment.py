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


def sample_alignment_gate(
    members: DataFrame, emb: DataFrame, threshold: float = ALIGN_THRESHOLD
) -> DataFrame:
    """Per-shard attrition of the alignment gate: (asset_id, n_samples,
    n_pairable, n_aligned, aligned_ppm).

    Each pairable sample's image/text embeddings are the deterministic
    rows img = (asset*2 + s) % N and txt = (asset*5 + 3s + 1) % N of the
    embeddings table (simulating the model-scored pair; N = table size
    rides along as a broadcast 1-row frame, no driver collect).
    aligned_ppm = n_aligned * 1e6 div n_pairable (0 when a shard has no
    pairable sample — e.g. single-member shards carry an image but no
    caption)."""
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
    scored = (
        keyed.join(F.broadcast(iq), "_img_id", "left")
        .join(F.broadcast(tq), "_txt_id", "left")
        .select(
            "asset_id",
            F.col("_pairable").cast("int").alias("_p"),
            F.when(
                F.col("_pairable")
                & (qcosine(F.col("_qi"), F.col("_qt")) >= F.lit(threshold)),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("_a"),
        )
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
