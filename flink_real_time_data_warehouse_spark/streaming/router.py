"""Config-driven dynamic routing (SURVEY §2.3 R2/R3).

The reference routes CDC records per config-table entry — broadcast state
keyed `sourceTable-operateType`, facts to per-record Kafka topics, dims to
Phoenix tables created on the fly (BaseDBApp.java:76-107,
TableProcessFunction.java:42-165). Spark-first replacement:

- the config is a small DataFrame re-read at every micro-batch (the
  broadcast-state maintenance of R3 becomes "fresh snapshot per trigger");
- a foreachBatch harness partitions the micro-batch by (source_table, op),
  prunes to each entry's sink_columns, and writes to the entry's sink:
  `table` sinks append parquet (Kafka topics / Delta tables in
  production), `dim` sinks MERGE into a keyed DimStore on the config's
  sink_pk — the DimSinkFunction.java:17-89 upsert path, driven by the
  router itself rather than wired by the caller. Sink tables are created
  on first write (the dynamic CREATE TABLE of
  TableProcessFunction.checkTable:70-127 is implicit).

Exactly-once: a retried micro-batch must not re-append. Table sinks write
through a staging dir and move files to deterministic epoch-prefixed
names, committing with an `_epoch_<id>_done` marker — a replay of the same
epoch either skips (marker present) or overwrites the same file names, so
the sink converges to exactly-once. (This is a minimal hand-rolled version
of what a transactional table format provides; at 100 TB use Delta/Iceberg
and this becomes `df.write.option("txnAppId", ...).option("txnVersion",
epoch)`.) Dim sinks are idempotent by construction: replaying a MERGE of
the same updates yields the same keyed state.

The routing loop is per *config entry*, not per record — each iteration is
one declarative filter+project+write that Catalyst optimizes; with N
config entries the micro-batch is scanned at most N times (cached once
when N is large).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.dim_store import DimStore


@dataclass(frozen=True)
class RouteConfig:
    """One row of the reference's `table_process` config
    (bean/TableProcess.java:12-27 — sinkType/sinkTable/sinkColumns/sinkPk/
    sinkExtend all carried)."""

    source_table: str
    operate_type: str  # insert | update | delete
    sink_table: str
    sink_columns: tuple[str, ...]  # the csv list of TableProcessFunction.filterColumn
    sink_type: str = "table"  # table (parquet/Delta) | dim (keyed MERGE) | kafka
    sink_pk: str = "id"  # dim MERGE key (TableProcessFunction.checkTable pk)
    sink_extend: str = ""  # passthrough DDL extras (SALT_BUCKETS etc. in Phoenix)


def _idempotent_append(df: DataFrame, path: str, epoch_id: int | None) -> None:
    """Append `df` under `path` such that replaying the same epoch cannot
    duplicate rows (deterministic file names + commit marker).

    Crash-retry safety: an uncommitted epoch (no marker) is rolled back
    FIRST — every existing ``epoch{id}-*.parquet`` is removed before the
    retry promotes its own parts. Without that sweep, a retry that plans
    fewer staging parts than the crashed attempt promoted would overwrite
    only the lower-indexed names and leave the orphaned higher-indexed
    parts behind as silent duplicates. The marker itself commits via
    tempfile + os.replace so a torn marker write can never mark a partial
    epoch as done.

    Scope (single-writer): this protocol assumes one router (one driver)
    per sink directory on a filesystem shared with the driver — the
    hand-rolled analog of a transactional table format's commit. Two
    CONCURRENT writers to the same sink can interleave rollback/promote
    and corrupt each other; at 100 TB use Delta/Iceberg, where this whole
    function becomes `df.write.option("txnAppId", ...).option(
    "txnVersion", epoch)`. Sequential replays (crash -> restart, any
    number of times, any parallelism) converge to exactly-once.
    """
    if epoch_id is None:  # non-streaming callers: plain append
        df.write.mode("append").parquet(path)
        return
    marker = os.path.join(path, f"_epoch_{epoch_id}_done")
    if os.path.exists(marker):
        return
    prefix = f"epoch{epoch_id:08d}-"
    staging = f"{path}_staging_epoch_{epoch_id}"
    df.write.mode("overwrite").parquet(staging)
    os.makedirs(path, exist_ok=True)
    # Roll back any partially-promoted files from a crashed earlier attempt
    # of this same (uncommitted) epoch before promoting the retry's parts.
    for stale in os.listdir(path):
        if stale.startswith(prefix) and stale.endswith(".parquet"):
            os.remove(os.path.join(path, stale))
    parts = sorted(f for f in os.listdir(staging) if f.endswith(".parquet"))
    for i, p in enumerate(parts):
        os.replace(
            os.path.join(staging, p),
            os.path.join(path, f"{prefix}{i:05d}.parquet"),
        )
    shutil.rmtree(staging, ignore_errors=True)
    tmp_marker = f"{marker}.tmp.{os.getpid()}"
    with open(tmp_marker, "w"):
        pass
    os.replace(tmp_marker, marker)


def route_micro_batch(
    batch: DataFrame,
    configs: list[RouteConfig],
    base_dir: str,
    table_col: str = "source_table",
    op_col: str = "op",
    epoch_id: int | None = None,
    dim_store: DimStore | None = None,
) -> list[str]:
    """Route one micro-batch per the config list; returns sink tables written.

    Mirrors TableProcessFunction.processElement:130-165: records whose
    (source_table, op) has no config entry are dropped (logged there,
    dropped here). `dim`-typed entries MERGE into `dim_store` keyed by the
    entry's sink_pk (created on demand under base_dir/_dims).
    """
    if len(configs) > 2:
        batch = batch.persist()
    written = []
    try:
        for cfg in configs:
            sub = batch.where(
                (F.col(table_col) == cfg.source_table) & (F.col(op_col) == cfg.operate_type)
            ).select(*cfg.sink_columns)
            if cfg.sink_type == "dim":
                store = dim_store or DimStore(batch.sparkSession, os.path.join(base_dir, "_dims"))
                store.upsert(cfg.sink_table, sub, key=cfg.sink_pk)
            else:
                _idempotent_append(sub, os.path.join(base_dir, cfg.sink_table), epoch_id)
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
    dim_store: DimStore | None = None,
):
    """Attach the router to a streaming DataFrame.

    `config_provider()` is called every micro-batch — the Spark analog of
    the reference's broadcast-state updates (R3): config changes take
    effect on the next trigger without restarting the query. The epoch id
    Spark hands foreachBatch keys the idempotent commit of table sinks.
    """

    def on_batch(batch: DataFrame, epoch: int) -> None:
        route_micro_batch(
            batch, list(config_provider()), base_dir, epoch_id=epoch, dim_store=dim_store
        )

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
