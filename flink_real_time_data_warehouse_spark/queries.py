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
    # Round 14 rotation (r13 verdict task 2): lead with the operators the
    # r13 optimization round REWROTE that the driver has never re-graded
    # (verdict's named list — kmeans/ann/image/audio/line_dedup/unigram/
    # funnel/matryoshka/ingest), then the r8-stale block from
    # `verify_driver.py --staleness` (keeps the no-older-than-r9
    # contract), then the paths THIS round's optimizations touch (self-
    # norm staging, tar checksum, seed materialization, stream-partition
    # sizing) so any plan-rewrite drift surfaces in CORRECTNESS_r14.
    "kmeans_centroids",
    "ann_ivf_topk",
    "ann_ivf_indexed_topk",
    "ann_ivf_quantized_topk",
    "ann_ivf_pq_topk",
    "ann_pq_topk",
    "knn_label_noise",
    "embedding_outliers",
    "embedding_clusters",
    "audio_fp_dedup",
    "image_phash_dedup",
    "image_phash_clusters",
    "image_phash_sig_stream",
    "image_decontaminate",
    "line_dedup",
    "unigram_tokenize",
    "unigram_tokenize_indexed",
    "curation_pipeline",
    "multimodal_curation_funnel",
    "matryoshka_recall",
    "ingest_pipeline_stream",
    # r8-stale block (staleness report, oldest first)
    "sql_province_stats",
    "small_qty_revenue",
    "nation_revenue_share",
    "q1_pricing_summary",
    "txlog_snapshot_read",
    "txlog_pruned_read",
    "txlog_restore_read",
    "txlog_dv_delete_read",
    "txlog_update_read",
    "txlog_clone_read",
    "txlog_rename_read",
    "txlog_cdf_full_feed",
    "txlog_generated_partition_read",
    "txlog_merge_into_read",
    "txlog_identity_read",
    "txlog_source_stream",
    "cdc_route_materialized",
    "dwd_chain_stream",
    # r14-touched paths
    "tar_members",
    "tar_members_stream",
    "webdataset_samples",
    "sample_alignment_gate",
    "dedup_substring_incremental",
    "ann_ingest_stream",
    "ann_topk",
    "ann_sign_lsh_topk",
    "rrf_fusion_topk",
    # (embedding_cosine_pairs shares sign_lsh_near_dup_pairs with
    # embedding_clusters above — one grade covers the rewritten path)
    "abandoned_orders_stream",
    "product_stats_stream",
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
