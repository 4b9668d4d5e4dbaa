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
    # Round 10 rotation (r9 verdict task 1, exactly as pre-listed).
    # Slots 1-42: ALL 42 remaining r6-rowed names — the stalest driver
    # rows in the registry after r9. Grouped: txlog verb/read family,
    # then the TPC-H-shaped analytics block, then the quality/curation
    # family, then the two streaming siblings.
    "txlog_partitioned_read", "txlog_clustered_read",
    "txlog_schema_evolution", "txlog_multi_partition_read",
    "txlog_change_feed", "txlog_incremental_sync", "txlog_delete_read",
    "txlog_zorder_read", "txlog_bloom_point_read", "txlog_cdc_stream",
    "txlog_cdf_feed",
    "top_parts_per_nation", "dormant_customers", "order_value_quantiles",
    "running_gmv", "local_supplier_volume", "cube_sales", "status_pivot",
    "customer_spend_quartiles", "urgent_part_suppliers", "moving_avg_gmv",
    "skew_salted_sales", "waiting_supplier", "small_qty_revenue_shaped",
    "order_count_distribution", "untapped_customers", "large_volume_orders",
    "grouping_sets_sales", "order_value_quantiles_approx", "volume_shipping",
    "top_revenue_supplier", "min_cost_supplier", "trailing_30d_spend",
    "shipping_priority", "revenue_delta", "returned_item_losers",
    "knn_label_noise", "source_overlap_matrix", "embedding_outliers",
    "source_quality_profile", "doc_novelty",
    "fulfillment_stats_stream",
    # Slots 43-50: the 8 registrations with no driver row yet (all
    # judge-verified green at sf0.01 in the r9 verdict session).
    "ingest_classifier_gate", "wordpiece_tokenize", "unigram_tokenize",
    "lm_surprisal_bigram", "span_corrupt", "fim_transform",
    "text_normalize", "multimodal_dimensions_av",
    # r11 rotation note: lead with this round's new registrations (no
    # driver row yet; each driver-sim verified green before its commit
    # this round): multimodal_dimensions_mp4, multimodal_dimensions_tiff,
    # multimodal_dimensions_webp, compression_frame_info,
    # bytelevel_bpe_tokenize, dedup_exact_stream_builtin,
    # lm_surprisal_trigram, mojibake_repair, gopher_quality,
    # langid_ngram, content_defined_chunks, tfrecord_varint_decode (and
    # bounce_stream_tws where the protobuf runtime exists), plus the
    # r10 continuation-session names: flac_stream_info,
    # parquet_footer_info, ogg_page_info, ebml_track_info,
    # avro_header_info, sentence_segment, line_dedup, line_dedup_stream,
    # perplexity_buckets, html_extract, sft_format, contrastive_pairs,
    # tokenizer_fertility, warc_records, url_canonicalize, domain_stats,
    # c4_clean, domain_mixture_weights, dedup_editdist,
    # safetensors_header_info, dedup_url, markdown_extract,
    # decontaminate_bloom, zip_central_dir, dedup_url_stream, bm25_topk,
    # warc_records_stream, domain_blocklist_filter, filter_funnel,
    # matryoshka_recall, ann_recall_eval, lsh_recall_eval,
    # classifier_eval —
    # then the stalest r7-rowed block
    # (new_user_fix, uv_daily, bounce_events, order_wide, payment_wide,
    # dup_spans, the r7 TPC-H/curation names), then r8's block as space
    # allows.
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
