"""Catalog over the driver-generated test tables (see TESTDATA.md).

TPC-H-ish star schema (`region nation customer supplier part orders lineitem`)
plus an `events` behavior stream and `documents`/`embeddings` for the
training-data operators. These stand in for the reference's Kafka topics /
Phoenix dims / ClickHouse sinks (SURVEY.md §1.1): facts ~ orders/lineitem/events,
dims ~ region/nation/customer/supplier/part.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in star joins
# (the Spark-native replacement for the reference's async Phoenix lookup +
# Redis cache, app/function/DimAsyncFunction.java:17-71 / utils/DimUtil.java).
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=None)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) (footer-only read)."""
    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema if str(f.type) in ("timestamp[ns]", "timestamp[ns, tz=UTC]")
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; columnar parquet scan, so Catalyst prunes
    columns and pushes filters into the scan for free.

    TIMESTAMP(NANOS) columns (unsupported by Spark's vectorized reader) are
    read as long via `nanosAsLong` and truncated to microseconds with integer
    division — the same ns->us truncation DuckDB applies, so oracle parity
    holds. The conversion is a per-row projection; pushdown on other columns
    is unaffected.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in _nanos_ts_columns(path):
        # Explicit LTZ cast: timestamp_micros() returns NTZ on some Spark
        # builds, and NTZ columns are rejected by withWatermark. With the
        # session pinned to UTC the wall-clock values (and oracle parity)
        # are identical either way.
        df = df.withColumn(
            c, F.expr(f"timestamp_micros(`{c}` div 1000)").cast("timestamp_ltz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so plans can use spark.sql."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
