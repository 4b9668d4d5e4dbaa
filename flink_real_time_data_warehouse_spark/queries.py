"""Query registry: every implemented operator/query from SURVEY.md §2.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI SQL for the DuckDB oracle (or ``None`` for ops whose
semantics aren't batch-SQL-expressible — those get a rows-only check).

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver sorts columns by name and hashes
values). Aggregated money flows through DECIMAL(18,2) on both sides so sums
are exact and order-independent — never hash a float sum.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One graded query: Spark plan + DuckDB oracle + provenance."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, None => rows-only check
    doc: str = ""  # reference citation / semantics note


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a Spark query callable to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query {name!r}")
        _REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


# The external verify harness grades at most 50 queries per run, taken in
# registry order. Names listed here are emitted FIRST (in this order) so the
# least-recently-graded part of the surface gets a fresh correctness row each
# round; everything else follows in registration order. Queries not yet
# registered are ignored, so new entries can be pre-listed safely.
_GRADE_FIRST: list[str] = [
    # Round 12 rotation (r11 verdict task 1; generated from
    # `python scripts/verify_driver.py --staleness`).
    # Slots 1-5: the five round-11 registrations with no driver row yet
    # (all judge-verified green in the r11 verdict session).
    "mrr_self_retrieval", "webdataset_samples", "lm_surprisal_mkn",
    "domain_pagerank", "classifier_select_topk",
    # Next: this round's new registrations (never graded). The *_tws
    # names register only where a protobuf runtime exists — absent here
    # they are safely skipped and the stale block below fills the window.
    "bpe_tokenize_indexed", "tokenizer_fertility_indexed",
    "wordpiece_tokenize_indexed", "unigram_tokenize_indexed",
    "image_phash_dedup", "image_phash_clusters", "image_phash_sig_stream",
    "image_decontaminate", "audio_fp_dedup", "sample_alignment_gate",
    "multimodal_curation_funnel",
    "bounce_stream_tws", "uv_stream_tws", "new_user_tws",
    # Remaining slots: the r7-stale block in staleness-report order
    # (49 names; the window caps at 50 so the tail spills to r13 —
    # regenerate with `verify_driver.py --staleness` next round).
    "dedup_clusters", "dedup_simhash", "ann_topk", "ann_ivf_topk",
    "ann_ivf_indexed_topk", "embedding_cosine_pairs",
    "embedding_clusters", "dedup_incremental_indexed", "ingest_pipeline",
    "ingest_pipeline_indexed", "lang_id", "pii_scrub", "text_quality",
    "lm_surprisal", "token_count", "vocab_topk", "tfidf_search",
    "doc_fingerprint", "train_split", "kmeans_centroids",
    "mixture_sample", "source_quota_sample", "cluster_balanced_sample",
    "chunk_documents", "token_budget_sample", "decontaminate",
    "repetition_stats", "pack_sequences", "corpus_profile",
    "curation_pipeline", "multimodal_decode", "frame_sample",
    "audio_chunks", "keyword_stats_cjk", "visitor_stats_sliding",
    "uv_daily", "new_user_fix", "bounce_events", "order_wide",
    "payment_wide", "scd2_user_status", "serving_product_revenue",
    "promo_revenue_share", "late_shipment_priority", "market_share",
    "priority_shipping_counts", "brand_supplier_counts",
    "product_type_profit", "discounted_brand_revenue", "excess_shippers",
]


def registry() -> dict[str, Query]:
    """All registered queries (imports the plan modules on first use).

    Ordered with :data:`_GRADE_FIRST` names first so a grading harness that
    caps the number of queries per run still rotates coverage across the
    whole surface.
    """
    from .plans import datapipe, gmall, sql_api, tpch  # noqa: F401  (registration side effect)
    from .streaming import stream_queries  # noqa: F401

    first = {n: _REGISTRY[n] for n in _GRADE_FIRST if n in _REGISTRY}
    rest = {n: q for n, q in _REGISTRY.items() if n not in first}
    return {**first, **rest}
