"""Batch WRITE for the txlog data source — ``df.write.format("txlog")``.

The third leg of the Python Data Source trifecta (stream read / batch
read / batch write): each task streams its Arrow record batches into ONE
staged parquet under ``<table>/data`` (invisible until a manifest names
it — exactly :meth:`TxLog._stage`'s contract), and the driver commit is
ONE transactional append (or replace, for ``mode("overwrite")``) naming
every task's file. A failed job aborts by deleting the staged files;
nothing half-written is ever visible — the same all-or-nothing story as
the API write paths, now behind Spark's own writer interface.

Options: ``path`` (table root, required), ``stats_cols`` (comma list:
record per-file [min, max] footer stats for data skipping — no data
re-scan, footers only).

Scope (documented, refused loudly): this is the RAW ingest path for
plain tables. Tables carrying identity columns, generated columns,
CHECK constraints, or a column mapping need the table to transform or
validate rows at write time, which a sink that has already written its
files cannot do — those tables use :meth:`TxLog.append` /
:meth:`TxLog.overwrite`, which run the full contract. Delta draws the
same line between its transactional writer and raw file ingestion
(CONVERT/manifest imports).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _TxLogCommit(WriterCommitMessage):
    names: list[str] = field(default_factory=list)


class TxLogBatchWriter(DataSourceArrowWriter):
    """Executor write + driver commit for ``format("txlog")``."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self._path = options["path"]
        self._overwrite = overwrite
        self._schema = schema
        sc = options.get("stats_cols")
        self._stats_cols = (
            [c.strip() for c in sc.split(",") if c.strip()] if sc else None
        )

    # -- executor side ---------------------------------------------------
    def write(self, iterator) -> _TxLogCommit:
        import pyarrow.parquet as pq

        data = os.path.join(self._path, "data")
        os.makedirs(data, exist_ok=True)
        writer = None
        name = None
        try:
            for batch in iterator:
                if writer is None:
                    name = f"w-{uuid.uuid4().hex}.parquet"
                    writer = pq.ParquetWriter(
                        os.path.join(data, name), batch.schema
                    )
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
        # empty task -> no file (a zero-row parquet would still replay
        # fine, but staging nothing keeps the manifest minimal)
        return _TxLogCommit([name] if name is not None else [])

    # -- driver side -------------------------------------------------------
    def _refuse_contract_tables(self, log) -> None:
        st = log.state()
        if st.cmap:
            raise ValueError(
                "format('txlog') write: table has a column mapping "
                "(renamed/dropped columns); use TxLog.append, which stages "
                "under physical names"
            )
        props = st.props
        from .txlog import TxLog

        if TxLog._identity_specs(props):
            raise ValueError(
                "format('txlog') write: table has GENERATED ALWAYS AS "
                "IDENTITY columns; use TxLog.append, which allocates them"
            )
        if any(k.startswith(TxLog._GENERATED_PREFIX) for k in props):
            raise ValueError(
                "format('txlog') write: table has generated columns; use "
                "TxLog.append, which computes/validates them"
            )
        if log.constraints():
            raise ValueError(
                "format('txlog') write: table has CHECK constraints; use "
                "TxLog.append, which validates rows before staging"
            )

    def commit(self, messages) -> None:
        from .txlog import TxLog, _footer_minmax

        log = TxLog(self._path)
        names = [n for m in messages if m is not None for n in m.names]
        try:
            self._refuse_contract_tables(log)
        except ValueError:
            self._delete(log, names)
            raise
        stats: dict = {}
        for n in names:
            dest = os.path.join(log.data_path, n)
            fs = {"__bytes": os.path.getsize(dest)}
            if self._stats_cols:
                fs.update(_footer_minmax(dest, self._stats_cols) or {})
            stats[n] = fs
        schema_json = self._schema.json()
        if self._overwrite:
            log.commit_files(
                names, "replace", schema_json,
                expected_version=log.state().version, stats=stats,
            )
        else:
            log.commit_files(names, "append", schema_json, stats=stats)

    def abort(self, messages) -> None:
        from .txlog import TxLog

        log = TxLog(self._path)
        self._delete(
            log, [n for m in messages if m is not None for n in m.names]
        )

    @staticmethod
    def _delete(log, names: list[str]) -> None:
        for n in names:
            try:
                os.remove(os.path.join(log.data_path, n))
            except FileNotFoundError:
                pass


class TxLogStreamWriter(TxLogBatchWriter, DataSourceStreamArrowWriter):
    """STREAMING sink — ``df.writeStream.format("txlog")``, the fourth
    and final leg of the data source (stream read / batch read / batch
    write / stream write). Every micro-batch commits EXACTLY ONCE: the
    manifest carries ``(app_id, batchId)`` in the app high-water ledger,
    so a crash-replayed epoch is SKIPPED by the commit layer itself —
    the same idempotent-epoch contract the foreachBatch sinks keep, now
    native to Spark's writer interface (and the storage analog of the
    reference's transactional Kafka producer, MyKafkaUtil.java:29-43).

    Options: ``path`` (required), ``app_id`` (sink identity in the
    ledger; REQUIRED so two independent streams into one table never
    collide — same rule as streaming/ingest), ``stats_cols``. Output
    mode: append only (a storage log is an append ledger; updates flow
    through the table verbs). Same contract-table refusals as the batch
    writer."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        if overwrite:
            # complete/truncating output modes would silently degrade to
            # append-only (duplicating rows every trigger) — refuse loud,
            # mirroring the other contract refusals (ADVICE r8)
            raise ValueError(
                "format('txlog') streaming sink is append-only: "
                "truncating output modes (complete) are not supported"
            )
        super().__init__(schema, options, overwrite=False)
        app = options.get("app_id")
        if not app:
            raise ValueError(
                "format('txlog') streaming sink requires option('app_id', "
                "...): the exactly-once epoch ledger is keyed by it"
            )
        self._app_id = f"txlog_sink:{app}"

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        from .txlog import TxLog, _footer_minmax

        log = TxLog(self._path)
        names = [n for m in messages if m is not None for n in m.names]
        try:
            self._refuse_contract_tables(log)
        except ValueError:
            self._delete(log, names)
            raise
        stats: dict = {}
        for n in names:
            dest = os.path.join(log.data_path, n)
            fs = {"__bytes": os.path.getsize(dest)}
            if self._stats_cols:
                fs.update(_footer_minmax(dest, self._stats_cols) or {})
            stats[n] = fs
        # (app_id, batchId) makes the commit idempotent: a replayed epoch
        # is skipped inside commit_files and ITS staged files deleted
        if log.state().apps.get(self._app_id, -1) >= batchId:
            self._delete(log, names)  # replay: this attempt's staging
            return
        log.commit_files(
            names, "append", self._schema.json(),
            app_id=self._app_id, app_version=batchId, stats=stats,
        )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        from .txlog import TxLog

        log = TxLog(self._path)
        self._delete(
            log, [n for m in messages if m is not None for n in m.names]
        )
