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
    # Round 8 rotation (r7 verdict task 2). Slots 1-5: the 5 gmall batch
    # plans whose freshest driver row is r4 (deferred from r7 because
    # their streaming twins carried fresher rows; now the stalest names).
    "visitor_stats", "product_stats", "events_union_stats",
    "keyword_stats", "session_stats",
    # Slots 6-25: the 20 round-7 additions that have NEVER received a
    # driver correctness row (19 judge-verified green in the r7 session;
    # txlog_identity_read's oracle CAST fixed this round — all 20
    # driver-sim re-verified before this commit).
    "txlog_source_stream", "cdc_route_materialized",
    "semantic_dedup_capped", "keyword_stats_smart", "txlog_dv_delete_read",
    "dwd_chain_stream", "dedup_canonical", "unimax_sample",
    "decontaminate_semantic", "txlog_restore_read", "dedup_containment",
    "txlog_update_read", "txlog_clone_read", "txlog_rename_read",
    "dsir_select", "train_split_leakage_free", "txlog_cdf_full_feed",
    "txlog_generated_partition_read", "txlog_merge_into_read",
    "txlog_identity_read",
    # Slots 26-50: 25 of the 50 r5-rowed names (3 rounds stale after this
    # one). Chosen for surface diversity — SQL API, CDC, as-of joins,
    # serving, the dedup/minhash family, txlog reads; the 25 deferred
    # names (mostly streaming twins of batch plans graded r7, plus the
    # ANN quantized variants) lead r9's window below.
    "province_stats", "q1_pricing_summary", "nation_revenue_share",
    "small_qty_revenue", "datetime_funcs", "dirty_split", "json_props",
    "sql_chained_stats", "sql_province_stats", "cdc_route",
    "asof_click_attribution", "purchase_status_asof", "serving_gmv",
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_capped",
    "dedup_minhash_verified", "dedup_ngram_jaccard", "dedup_simhash_pairs",
    "dup_spans", "semantic_dedup", "embedding_quantize",
    "embedding_cosine_pairs_capped", "txlog_pruned_read",
    "txlog_snapshot_read",
    # --- 50-slot window ends here. ---
    # r9 rotation note: lead with the 25 deferred r5 names —
    # keyword_stats_dict(+_stream), keyword_stats_stream,
    # visitor_stats_stream, visitor_stats_cumulate,
    # visitor_stats_sliding_stream, province_stats_stream,
    # product_stats_stream(+_approx), events_union_stats_stream,
    # session_stats_stream, order_wide_stream, payment_wide_stream,
    # new_user_stream, uv_stream, bounce_stream, dedup_exact_stream,
    # dedup_minhash_stream, ingest_pipeline_stream, ann_ingest_stream,
    # ann_sign_lsh_topk, ann_quantized_topk, ann_ivf_quantized_topk,
    # dedup_incremental, txlog_stream_sink — then the ELEVEN round-8
    # additions below (every one driver-sim verified green this session,
    # none has a driver row yet), then fill from the r6 block.
    # New in round 8 (registered below as they land; ignored until then).
    "dedup_exact_substring", "bpe_train", "bpe_tokenize",
    "txlog_identity_merge_read", "txlog_merge_evolve_read",
    "dedup_substring_scrub", "txlog_batch_source_read", "ann_pq_topk",
    "txlog_write_format_read", "txlog_stream_format_chain",
    "txlog_convert_read",
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
