"""Config-driven dynamic routing (SURVEY §2.3 R2/R3).

The reference routes CDC records per config-table entry — broadcast state
keyed `sourceTable-operateType`, facts to per-record Kafka topics, dims to
Phoenix tables created on the fly (BaseDBApp.java:76-107,
TableProcessFunction.java:42-165). Spark-first replacement:

- the config is a small DataFrame re-read at every micro-batch (the
  broadcast-state maintenance of R3 becomes "fresh snapshot per trigger");
- a foreachBatch harness partitions the micro-batch by (source_table, op),
  prunes to each entry's sink_columns, and appends to the entry's sink
  table — parquet dirs here, Kafka topics / Delta tables in production.
  Sink tables are created on first write (the dynamic CREATE TABLE of
  TableProcessFunction.checkTable:70-127 is implicit in the first append).

The routing loop is per *config entry*, not per record — each iteration is
one declarative filter+project+append that Catalyst optimizes; with N
config entries the micro-batch is scanned at most N times (cacheable once
if N is large).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RouteConfig:
    """One row of the reference's `table_process` config
    (bean/TableProcess.java:12-27)."""

    source_table: str
    operate_type: str  # insert | update | delete
    sink_table: str
    sink_columns: tuple[str, ...]  # the csv list of TableProcessFunction.filterColumn
    sink_type: str = "table"  # table (parquet/Delta) | kafka


def route_micro_batch(
    batch: DataFrame,
    configs: list[RouteConfig],
    base_dir: str,
    table_col: str = "source_table",
    op_col: str = "op",
) -> list[str]:
    """Route one micro-batch per the config list; returns sink tables written.

    Mirrors TableProcessFunction.processElement:130-165: records whose
    (source_table, op) has no config entry are dropped (logged there,
    dropped here).
    """
    if len(configs) > 2:
        batch = batch.persist()
    written = []
    try:
        for cfg in configs:
            sub = batch.where(
                (F.col(table_col) == cfg.source_table) & (F.col(op_col) == cfg.operate_type)
            ).select(*cfg.sink_columns)
            path = os.path.join(base_dir, cfg.sink_table)
            sub.write.mode("append").parquet(path)
            written.append(cfg.sink_table)
    finally:
        if len(configs) > 2:
            batch.unpersist()
    return written


def start_router(
    stream: DataFrame,
    config_provider,
    base_dir: str,
    checkpoint: str,
):
    """Attach the router to a streaming DataFrame.

    `config_provider()` is called every micro-batch — the Spark analog of
    the reference's broadcast-state updates (R3): config changes take
    effect on the next trigger without restarting the query.
    """

    def on_batch(batch: DataFrame, _epoch: int) -> None:
        route_micro_batch(batch, list(config_provider()), base_dir)

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
