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
    # Round 11 rotation (r10 verdict task 1; generated from
    # `python scripts/verify_driver.py --staleness` — the report's first
    # 50 names, plus this round's new registrations).
    # Slots 1-45: the 45 round-10 registrations with no driver row yet
    # (all judge-rerun green at sf0.01 in the r10 verdict session).
    "tokenizer_fertility", "bytelevel_bpe_tokenize", "sentence_segment",
    "line_dedup", "perplexity_buckets", "mojibake_repair", "gopher_quality",
    "langid_ngram", "content_defined_chunks", "lm_surprisal_trigram",
    "multimodal_dimensions_mp4", "multimodal_dimensions_tiff",
    "multimodal_dimensions_webp", "compression_frame_info",
    "tfrecord_varint_decode", "flac_stream_info", "parquet_footer_info",
    "ogg_page_info", "ebml_track_info", "avro_header_info",
    "html_extract", "sft_format", "contrastive_pairs", "warc_records",
    "url_canonicalize", "domain_stats", "c4_clean",
    "domain_mixture_weights", "dedup_editdist", "safetensors_header_info",
    "dedup_url", "markdown_extract", "decontaminate_bloom",
    "zip_central_dir", "bm25_topk", "domain_blocklist_filter",
    "filter_funnel", "matryoshka_recall", "ann_recall_eval",
    "lsh_recall_eval", "classifier_eval", "dedup_exact_stream_builtin",
    "line_dedup_stream", "dedup_url_stream", "warc_records_stream",
    # Slots 46-50: this round's new registrations (never graded;
    # bounce_stream_tws / uv_stream_tws register only where a protobuf
    # runtime exists — absent here, the names are safely skipped and the
    # overflow names below fill the window). 45 + 6 new = 51 > the
    # 50-query window, so the LAST new name (mrr_self_retrieval) is
    # expected to miss r11 and lead the r12 pre-list — driver-sim
    # verified green this round either way.
    "tar_members", "rrf_fusion_topk", "classifier_eval_stream",
    "lm_surprisal_kn", "tar_members_stream", "mrr_self_retrieval",
    "webdataset_samples", "lm_surprisal_mkn", "domain_pagerank",
    "classifier_select_topk",
    "bounce_stream_tws", "uv_stream_tws",
    # Overflow fill (stalest r7-rowed rows, staleness-report order), in
    # case a gated name above does not register in this container.
    "dedup_clusters", "dedup_simhash", "ann_topk", "ann_ivf_topk",
    "ann_ivf_indexed_topk", "embedding_cosine_pairs",
    # r12 rotation note (from the staleness report): lead with
    # mrr_self_retrieval, webdataset_samples, lm_surprisal_mkn,
    # domain_pagerank, classifier_select_topk, and any other round-11
    # registrations that miss
    # the r11 window, then the
    # remaining r7-rowed block in report order (embedding_clusters,
    # dedup_incremental_indexed, ingest_pipeline, ingest_pipeline_indexed,
    # lang_id, pii_scrub, text_quality, lm_surprisal, token_count,
    # vocab_topk, tfidf_search, doc_fingerprint, train_split,
    # kmeans_centroids, mixture_sample, source_quota_sample,
    # cluster_balanced_sample, chunk_documents, token_budget_sample,
    # decontaminate, repetition_stats, pack_sequences, corpus_profile,
    # curation_pipeline, multimodal_decode, frame_sample, audio_chunks,
    # keyword_stats_cjk, visitor_stats_sliding, uv_daily, new_user_fix,
    # bounce_events, order_wide, payment_wide, scd2_user_status,
    # serving_product_revenue, promo_revenue_share,
    # late_shipment_priority, market_share, priority_shipping_counts,
    # brand_supplier_counts, product_type_profit,
    # discounted_brand_revenue, excess_shippers), then r8's block as
    # space allows — regenerate with `verify_driver.py --staleness`.
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
