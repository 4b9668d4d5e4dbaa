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
    # Round 13 rotation (r12 verdict task 2; generated from
    # `python scripts/verify_driver.py --staleness` at the r13 open).
    # Slots 1-2: the two r13 registrations with no driver row yet
    # (both verified green against the oracle this session); then the
    # full r7-stale block (16 names) and the oldest r8 block. After this
    # window grades, no query's last driver row is older than r8.
    "tokenizer_vocab_sweep_indexed",
    "alignment_gate_stream",
    "visitor_stats_sliding",
    "uv_daily",
    "new_user_fix",
    "bounce_events",
    "order_wide",
    "payment_wide",
    "scd2_user_status",
    "serving_product_revenue",
    "promo_revenue_share",
    "late_shipment_priority",
    "market_share",
    "priority_shipping_counts",
    "brand_supplier_counts",
    "product_type_profit",
    "discounted_brand_revenue",
    "excess_shippers",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_capped",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_verified",
    "dup_spans",
    "dedup_simhash_pairs",
    "dedup_canonical",
    "decontaminate_semantic",
    "embedding_cosine_pairs_capped",
    "semantic_dedup",
    "semantic_dedup_capped",
    "embedding_quantize",
    "unimax_sample",
    "dsir_select",
    "train_split_leakage_free",
    "province_stats",
    "visitor_stats",
    "product_stats",
    "events_union_stats",
    "keyword_stats",
    "keyword_stats_smart",
    "session_stats",
    "cdc_route",
    "dirty_split",
    "purchase_status_asof",
    "json_props",
    "asof_click_attribution",
    "datetime_funcs",
    "serving_gmv",
    "sql_chained_stats",
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
