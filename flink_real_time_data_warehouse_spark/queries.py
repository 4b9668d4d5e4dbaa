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
    # Round 5 rotation. First: the three queries with no (or a stale-r3)
    # driver row — the r4 verdict's standing top item.
    "ann_sign_lsh_topk", "ann_quantized_topk", "dedup_incremental",
    # New or plan-changed in round 5 (pre-listed; unregistered names are
    # ignored until implemented): quantized IVF probe, streaming vector
    # ingest, hot-bucket-capped LSH variants, the upgraded
    # ingest_pipeline_stream oracle, and the two dictionary-segmentation
    # queries whose vendored lexicon grew this round.
    "ann_ivf_quantized_topk", "ann_ingest_stream",
    "dedup_minhash_capped", "embedding_cosine_pairs_capped",
    "semantic_dedup", "small_qty_revenue", "nation_revenue_share",
    "txlog_snapshot_read", "txlog_stream_sink", "txlog_pruned_read",
    "ingest_pipeline_stream", "keyword_stats_dict",
    "keyword_stats_dict_stream",
    # Freshest driver row is r3 — regrade, least-stable families first
    # (streaming twins, gmall apps, datapipe) so that what falls past the
    # 50-query window is the most stable TPC-H block (regraded first in
    # r6). With the thirteen round-5 entries above registered, the window
    # covers through q1_pricing_summary; the 13 r3-rowed TPC-H queries
    # from rollup_sales on sit at exactly 2 rounds stale and lead r6.
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_minhash_verified", "dup_spans", "dedup_simhash_pairs",
    "embedding_quantize", "province_stats", "visitor_stats_cumulate",
    "cdc_route", "dirty_split", "purchase_status_asof", "json_props",
    "asof_click_attribution", "datetime_funcs", "serving_gmv",
    "sql_chained_stats", "sql_province_stats",
    "visitor_stats_stream", "uv_stream", "new_user_stream", "bounce_stream",
    "session_stats_stream", "visitor_stats_sliding_stream",
    "keyword_stats_stream", "dedup_exact_stream", "dedup_minhash_stream",
    "province_stats_stream", "events_union_stats_stream",
    "product_stats_stream", "product_stats_stream_approx",
    "order_wide_stream", "payment_wide_stream",
    "q1_pricing_summary", "rollup_sales", "top_customers",
    "top_parts_per_nation", "dormant_customers", "order_value_quantiles",
    "running_gmv", "local_supplier_volume", "cube_sales", "status_pivot",
    "customer_spend_quartiles", "urgent_part_suppliers", "moving_avg_gmv",
    "skew_salted_sales",
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
