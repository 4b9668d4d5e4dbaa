"""CDC envelope source (SURVEY §2.1 S2/S3).

Spark has no built-in MySQL binlog source, so CDC arrives as a stream of
Debezium-style envelope records (exactly what the reference's
CustomerDeserialization.java:30-90 produces into Kafka):

    {database, tableName, before: {...}, after: {...}, type}

with the op normalization `create`->`insert` (:74-79) and read→filtered.

- cdc_schema / parse_cdc: envelope StructType + from_json normalization for
  a string stream (Kafka value or file lines).
- simulate_cdc_batch: fixture generator — derives a deterministic envelope
  stream from the `orders` table (inserts/updates/deletes by key mod) for
  tests and the end-to-end demo; `StartupOptions.initial` ≡ running the
  same generator as a batch backfill first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType


def cdc_schema() -> StructType:
    return StructType(
        [
            StructField("database", StringType()),
            StructField("tableName", StringType()),
            StructField("before", MapType(StringType(), StringType())),
            StructField("after", MapType(StringType(), StringType())),
            StructField("type", StringType()),
        ]
    )


def parse_cdc(raw: DataFrame, raw_col: str = "value") -> DataFrame:
    """Parse envelope JSON strings; normalize op names; drop read events.

    Works identically on batch and streaming input."""
    parsed = raw.select(F.from_json(F.col(raw_col), cdc_schema()).alias("e")).select("e.*")
    op = F.when(F.col("type") == "create", "insert").otherwise(F.col("type"))
    return parsed.withColumn("type", op).where(F.col("type") != "read")


def simulate_cdc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic envelope rows derived from `orders`: key%10==0 ->
    delete (before set), %10==1 -> update, else insert. All values strings,
    like the reference's all-varchar dim columns."""
    from ..tables import table

    orders = table(spark, sf_dir, "orders")
    payload = F.create_map(
        F.lit("id"), F.col("o_orderkey").cast("string"),
        F.lit("user_id"), F.col("o_custkey").cast("string"),
        F.lit("total_amount"), F.col("o_totalprice").cast("string"),
        F.lit("order_status"), F.col("o_orderstatus"),
    )
    op = (
        F.when(F.col("o_orderkey") % 10 == 0, "delete")
        .when(F.col("o_orderkey") % 10 == 1, "update")
        .otherwise("create")  # parse_cdc normalizes create -> insert
    )
    return parse_cdc(
        orders.select(
            F.to_json(
                F.struct(
                    F.lit("gmall").alias("database"),
                    F.lit("order_info").alias("tableName"),
                    F.when(op == "delete", payload).otherwise(
                        F.create_map().cast("map<string,string>")
                    ).alias("before"),
                    F.when(op != "delete", payload).otherwise(
                        F.create_map().cast("map<string,string>")
                    ).alias("after"),
                    op.alias("type"),
                )
            ).alias("value")
        )
    )
