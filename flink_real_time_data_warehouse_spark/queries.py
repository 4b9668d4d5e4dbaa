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


def registry() -> dict[str, Query]:
    """All registered queries (imports the plan modules on first use)."""
    from .plans import datapipe, gmall, sql_api, tpch  # noqa: F401  (registration side effect)
    from .streaming import stream_queries  # noqa: F401

    return dict(_REGISTRY)
