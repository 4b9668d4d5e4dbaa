"""Kafka source/sink wrappers (S1/K1/K2 in SURVEY.md §2).

The reference's MyKafkaUtil (utils/MyKafkaUtil.java:19-57) builds consumers/
producers per topic, including a dynamic-topic exactly-once producer
(:29-43) used by BaseDBApp. In Spark both are one-liners: the Kafka batch/
streaming connector handles consumer groups, offsets, and a per-row `topic`
column for dynamic routing.

NOTE: the spark-sql-kafka connector jar is not present in this container,
so these wrappers are exercised only for plan construction in tests; the
file-based sources in sources/streams.py are the tested path. On a real
cluster, add `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Subscribe to topics; value decoded to string like the reference's
    SimpleStringSchema consumer (MyKafkaUtil.java:52-56)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            "topic", "partition", "offset", "timestamp",
        )
    )


def kafka_sink(df: DataFrame, brokers: str, topic: str | None, checkpoint: str):
    """Fixed-topic (K1) or dynamic per-row-topic (K2) producer.

    For K2 (BaseDBApp.java:98-107), leave `topic=None` and provide a
    `topic` column in df — the built-in sink routes per record, replacing
    the reference's custom KafkaSerializationSchema (MyKafkaUtil.java:29-43).
    """
    out = df
    if "value" not in df.columns:
        out = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer
