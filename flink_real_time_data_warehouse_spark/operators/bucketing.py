"""Bucketed storage for co-located joins (100 TB path).

Fact-to-fact joins (orders ⋈ lineitem at every SF) shuffle both sides on
the join key. At 100 TB that shuffle dominates; writing both tables
bucketed by the key lets every future join run with ZERO exchange — the
scan is already hash-distributed. This is the Spark-native equivalent of
"co-partitioned topics" the reference gets implicitly from keyed Kafka
partitioning between its apps.

Uses the session catalog (saveAsTable) because bucketing metadata lives in
the metastore; path-based parquet cannot record bucket spec.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_key: str, n_buckets: int = 32,
    sort_key: str | None = None,
) -> None:
    """Persist df bucketed (and optionally sorted) by the join key.

    Idempotent: drops the catalog entry and any orphaned managed location
    first (a fresh in-memory metastore doesn't know about dirs a previous
    session left in the warehouse)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-style partitioned layout (dt=.../ dirs). At 100 TB, time/tenant
    partitioning is what turns full scans into partition-pruned scans —
    a filter on the partition column shows up as PartitionFilters in the
    scan and skips whole directories, before any row is read."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
