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
    # Round 9 rotation (r8 verdict task 2, exactly as pre-listed).
    # Slots 1-25: the 25 deferred r5-rowed names (streaming twins of the
    # batch plans graded r7/r8, the dict-FMM segmentation pair, the ANN
    # quantized variants, the incremental-dedup/ingest family, the txlog
    # stream sink) — the stalest rows in the registry after r8.
    "visitor_stats_stream", "uv_stream", "new_user_stream", "bounce_stream",
    "session_stats_stream", "visitor_stats_sliding_stream",
    "keyword_stats_stream", "dedup_exact_stream", "dedup_minhash_stream",
    "province_stats_stream", "events_union_stats_stream",
    "product_stats_stream", "order_wide_stream", "payment_wide_stream",
    "keyword_stats_dict", "product_stats_stream_approx", "dedup_incremental",
    "visitor_stats_cumulate", "ingest_pipeline_stream",
    "keyword_stats_dict_stream", "ann_sign_lsh_topk", "ann_quantized_topk",
    "ann_ivf_quantized_topk", "ann_ingest_stream", "txlog_stream_sink",
    # Slots 26-36: the 11 round-8 additions, never driver-graded (all
    # oracle-green in both the r8 builder session and the judge's own
    # full-suite run).
    "dedup_exact_substring", "bpe_train", "bpe_tokenize",
    "txlog_identity_merge_read", "txlog_merge_evolve_read",
    "dedup_substring_scrub", "txlog_batch_source_read", "ann_pq_topk",
    "txlog_write_format_read", "txlog_stream_format_chain",
    "txlog_convert_read",
    # Slots 37-42: the 6 round-9 additions (verdict tasks 3-8; each
    # driver-sim verified green before its commit this session).
    "txlog_vacuum_read", "datetime_funcs_cst", "multimodal_dimensions",
    "quality_classifier_score", "ann_ivf_pq_topk",
    "dedup_substring_incremental",
    # Slots 43-50: 8 of the 67 r6-rowed names, chosen for surface
    # diversity (TPC-H rollup/window, txlog verbs incl. the three bench
    # drift-watch queries, trained SemDeDup, the fulfillment-band
    # streaming sibling); the rest of the r6 block leads r10.
    "rollup_sales", "top_customers", "txlog_merge_read",
    "txlog_time_travel", "txlog_cdc_apply", "txlog_scd2_read",
    "semantic_dedup_trained", "abandoned_orders_stream",
    # r10 rotation note: lead with the remaining 59 r6-rowed names
    # (stalest first: the txlog read/verb family, the TPC-H shaped
    # analytics block, the quality/curation family, fulfillment_stats_
    # stream + cdc_stream), then the r9 registration that missed this
    # window: ingest_classifier_gate (driver-sim verified green in the
    # r9 session; no driver row yet), plus the three r9 continuation-
    # session additions (all driver-sim verified green, no driver row
    # yet): multimodal_dimensions_av, wordpiece_tokenize,
    # unigram_tokenize, lm_surprisal_bigram, span_corrupt,
    # fim_transform, text_normalize.
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
