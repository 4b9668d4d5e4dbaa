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

import json
import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.dim_store import DimStore


class SinkLockError(RuntimeError):
    """Raised when a second concurrent router targets an owned sink dir,
    or when a fenced-out router attempts to keep writing."""


class RouterLock:
    """Single-writer enforcement for a router sink tree.

    The `_idempotent_append` commit protocol is only exactly-once under ONE
    live writer per sink directory (two concurrent writers can interleave
    rollback/promote). This lock turns that documented contract into an
    enforced one: an owner file (`_router_lock`, JSON `{pid, token}`)
    is created with O_EXCL before the first epoch; a second router finds it,
    sees a live owner pid, and REFUSES fast instead of silently
    interleaving. A lock whose owner pid is dead (crashed router) is stale
    and is stolen atomically (tempfile + os.replace), so crash -> restart
    needs no manual cleanup.

    Fencing: `check()` re-reads the file and raises unless it still holds
    this instance's token — called by the router before every epoch, so a
    router wrongly presumed dead (e.g. paused, its lock stolen) fails its
    next write instead of corrupting the new owner's epochs. Same
    pid-liveness + fence-token design as HDFS lease recovery / Delta's
    commit owners, scoped to the single-host filesystems this hand-rolled
    sink supports (the pid check is per-host; a distributed deployment
    uses a real transactional table format instead — PARITY §2.3 R2).
    """

    FILENAME = "_router_lock"

    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        self.path = os.path.join(base_dir, self.FILENAME)
        self.token = f"{os.getpid()}-{uuid.uuid4().hex}"

    @staticmethod
    def _pid_alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists, owned by someone else
        return True

    def _read_owner(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.loads(f.read())
        except (FileNotFoundError, json.JSONDecodeError):
            return None  # gone, or torn write from a crashed owner => stale

    def acquire(self) -> "RouterLock":
        """Take ownership, or raise SinkLockError if a LIVE owner holds it.

        The whole read-owner/decide/steal sequence runs under an OS-level
        flock on a sidecar guard file: without it, two processes that both
        observe a dead owner both "win" the steal (each os.replace
        succeeds) and run concurrently — the exact corruption the lock
        exists to prevent. flock serializes acquirers on one host (the
        documented scope of this hand-rolled sink) and auto-releases if an
        acquirer dies mid-decision."""
        import fcntl

        os.makedirs(self.base_dir, exist_ok=True)
        payload = json.dumps({"pid": os.getpid(), "token": self.token})
        guard = os.open(self.path + ".guard", os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(guard, fcntl.LOCK_EX)
            owner = self._read_owner()
            if owner is not None and self._pid_alive(int(owner.get("pid", -1))):
                if owner.get("token") == self.token:
                    return self  # re-acquire by the current owner: no-op
                raise SinkLockError(
                    f"sink {self.base_dir!r} is owned by a live router "
                    f"(pid {owner['pid']}); refusing a second concurrent writer"
                )
            # free, or stale (owner crashed): take it atomically
            fd, tmp = tempfile.mkstemp(dir=self.base_dir, prefix="_lock_")
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            os.replace(tmp, self.path)
            return self
        finally:
            fcntl.flock(guard, fcntl.LOCK_UN)
            os.close(guard)

    def check(self) -> None:
        """Fence: raise unless this instance still owns the sink."""
        owner = self._read_owner()
        if owner is None or owner.get("token") != self.token:
            raise SinkLockError(
                f"router lost ownership of sink {self.base_dir!r} "
                "(lock stolen after presumed death); refusing to write"
            )

    def release(self) -> None:
        owner = self._read_owner()
        if owner is not None and owner.get("token") == self.token:
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass


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
    # of this same (uncommitted) epoch before promoting the retry's parts —
    # including orphaned `<marker>.tmp.<pid>` files from a crash between
    # writing the tmp marker and its os.replace (harmless to readers, which
    # skip underscore files, but they'd otherwise accumulate forever).
    marker_tmp_prefix = f"{os.path.basename(marker)}.tmp."
    for stale in os.listdir(path):
        if (stale.startswith(prefix) and stale.endswith(".parquet")) or stale.startswith(
            marker_tmp_prefix
        ):
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

    Single-writer enforcement: acquires the sink tree's :class:`RouterLock`
    before starting (a second concurrent router raises
    :class:`SinkLockError` immediately) and fences every epoch with
    ``lock.check()``. Returns a :class:`RouterHandle` proxying the
    StreamingQuery; `awaitTermination`/`stop` release the lock. A crashed
    router's lock is stale (dead pid) and the restart steals it.
    """
    lock = RouterLock(base_dir).acquire()

    def on_batch(batch: DataFrame, epoch: int) -> None:
        lock.check()  # fence: refuse to write epochs after losing ownership
        route_micro_batch(
            batch, list(config_provider()), base_dir, epoch_id=epoch, dim_store=dim_store
        )

    try:
        query = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
    except Exception:
        lock.release()
        raise
    return RouterHandle(query, lock)


class RouterHandle:
    """StreamingQuery proxy that releases the sink's RouterLock when the
    query finishes (awaitTermination) or is stopped."""

    def __init__(self, query, lock: RouterLock):
        self.query = query
        self.lock = lock

    def awaitTermination(self, timeout: float | None = None):  # noqa: N802 (Spark API casing)
        try:
            return self.query.awaitTermination(timeout) if timeout is not None \
                else self.query.awaitTermination()
        finally:
            if not self.query.isActive:
                self.lock.release()

    def stop(self) -> None:
        try:
            self.query.stop()
        finally:
            self.lock.release()

    def __getattr__(self, name):
        return getattr(self.query, name)
