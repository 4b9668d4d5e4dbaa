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
    # Round 7 rotation (r6 verdict task 1). Slots 1-8: the 8 registered
    # queries that have NEVER received a driver correctness row (they
    # overflowed r6's window; judge-verified green in the r6 session —
    # these get their FIRST driver rows here).
    "promo_revenue_share", "late_shipment_priority", "market_share",
    "priority_shipping_counts", "brand_supplier_counts",
    "product_type_profit", "discounted_brand_revenue", "excess_shippers",
    # Slots 9-50: 42 of the 47 queries whose freshest driver row is r4
    # (3 rounds stale after this one). The 5 deferred r4 names —
    # visitor_stats, product_stats, events_union_stats, keyword_stats,
    # session_stats — are the gmall batch plans whose streaming twins
    # (visitor_stats_stream r5, product_stats_stream r6,
    # events_union_stats_stream r5, keyword_stats_stream r5,
    # session_stats via visitor pipeline tests) exercise the same plan
    # bodies and carry fresher rows; they lead r8's window below.
    "lang_id", "text_quality", "lm_surprisal", "pii_scrub", "token_count",
    "vocab_topk", "tfidf_search", "doc_fingerprint",
    "train_split", "mixture_sample", "source_quota_sample",
    "token_budget_sample", "decontaminate", "repetition_stats",
    "pack_sequences", "chunk_documents", "corpus_profile",
    "cluster_balanced_sample",
    "scd2_user_status", "serving_product_revenue",
    "new_user_fix", "uv_daily", "bounce_events", "order_wide",
    "payment_wide", "visitor_stats_sliding",
    "kmeans_centroids", "keyword_stats_cjk", "curation_pipeline",
    "ingest_pipeline", "ingest_pipeline_indexed",
    "dedup_incremental_indexed", "ann_ivf_indexed_topk", "ann_topk",
    "ann_ivf_topk", "embedding_cosine_pairs", "embedding_clusters",
    "dedup_clusters", "dedup_simhash", "multimodal_decode", "frame_sample",
    "audio_chunks",
    # --- 50-slot window ends here. ---
    # r8 rotation note: lead with the 5 deferred r4 gmall batch plans,
    # then the round-7 additions (no driver row yet), then the r5-rowed
    # block — keeping every query's freshest row at most ~2 rounds old.
    "visitor_stats", "product_stats", "events_union_stats",
    "keyword_stats", "session_stats",
    # New in round 7 (registered below as they land; ignored until then).
    "txlog_source_stream", "cdc_route_materialized",
    "semantic_dedup_capped", "keyword_stats_smart", "txlog_dv_delete_read",
    "dwd_chain_stream", "dedup_canonical", "unimax_sample",
    "decontaminate_semantic", "txlog_restore_read", "dedup_containment",
    "txlog_update_read", "txlog_clone_read", "txlog_rename_read",
    "dsir_select", "train_split_leakage_free", "txlog_cdf_full_feed",
    "txlog_generated_partition_read", "txlog_merge_into_read",
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
