"""TxLog as a STREAMING SOURCE — ``spark.readStream.format("txlog")``.

Delta tables are not just sinks: downstream apps ``readStream`` them and
receive each committed version as a micro-batch (Delta's streaming source,
public docs). This is that follow-the-log source for :class:`TxLog`
tables, built on PySpark 4's Python Data Source API
(``pyspark.sql.datasource`` — the public plugin point for pure-Python
sources), replacing the reference's topic-linked app chaining where one
Flink job's Kafka sink topic is the next job's source
(ProductStatsApp.java:61-77 reading the dwd topics): here the TABLE is
the topic and the manifest log is the offset ledger.

Semantics mirror :meth:`TxLog.changes` exactly:

- OFFSET = table version. ``initialOffset`` is the ``from_version``
  option (default -1: serve the table's full history first); each
  trigger serves the commits in ``(start, end]``.
- APPEND commits stream their added files, tagged ``_commit_version``
  (and ``_change_type='insert'`` in cdf mode).
- CDC commits (``apply_cdc``) stream their typed CHANGE-DATA-FEED
  sidecar files in ``cdf=true`` mode — upserts with payload, deletes as
  key + NULL payload; without cdf they raise, as does any physical
  rewrite commit (replace/merge/optimize/delete/scd2): the log records
  no logical row changes for those, and silently skipping them would
  make the stream wrong, not late.
- Metadata-only commits (constraint registration) are skipped.

Exactly-once: offsets are checkpointed by Structured Streaming, and
``partitions(start, end)`` is a pure function of the immutable manifest
range, so a crash-replayed batch re-reads byte-identical input — the
source side of the idempotent-epoch contract the TxLog SINKS already
keep. ``latestOffset`` advances at most ``max_versions_per_batch``
versions per trigger (Delta's maxFilesPerTrigger analog) and at most
``max_bytes_per_batch`` data bytes (Delta's maxBytesPerTrigger — a soft
cap: always at least one file, so one huge commit SPLITS ACROSS
TRIGGERS at file granularity via a (version, file-index) offset instead
of producing one unbounded micro-batch — the 100 TB backlog-replay
knob). File sizes come from the manifest's per-file ``__bytes`` stat
(recorded at stage time), so pacing plans from manifest JSON alone.

Scale shape: planning reads ONLY manifests (KB of JSON per commit — no
file listing, no data I/O on the driver); each data/sidecar file becomes
one input partition read by pyarrow in the Python workers, so a batch's
parallelism equals its file count and a 1000-executor cluster fans out
naturally. Plain tuples never materialize — workers yield Arrow record
batches straight from the parquet reader.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructType

FORMAT_NAME = "txlog"


@dataclass
class _FilesPartition(InputPartition):
    """One data/sidecar file of one commit (value=file index for repr)."""

    paths: list[str] = field(default_factory=list)
    commit_version: int = 0
    change_type: str | None = None  # None => file already carries the column
    part_values: dict = field(default_factory=dict)  # Hive partition literals
    schema_json: str = ""  # target Spark schema (source output order/types)
    cmap: dict = field(default_factory=dict)  # logical -> physical col names
    dv_path: str | None = None  # deletion-vector sidecar (batch reads)


def _arrow_target_schema(spark_schema: StructType) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def _read_files_partition(partition: _FilesPartition):
    """Executor-side (shared by the stream and batch readers): parquet ->
    Arrow batches aligned to the source schema (missing columns
    null-filled, partition literals attached, types cast, deletion-vector
    positions dropped) — no row-at-a-time Python, no pandas round trip."""
    target = _arrow_target_schema(
        StructType.fromJson(json.loads(partition.schema_json))
    )
    for path in partition.paths:
        tbl = pq.read_table(path)
        if partition.dv_path is not None:
            # the sidecar records (file, pos): drop this file's deleted
            # row positions with one boolean-mask filter (numpy, no loop)
            import numpy as np

            side = pq.read_table(partition.dv_path, columns=["file", "pos"])
            fname = os.path.basename(path)
            keep = np.ones(tbl.num_rows, dtype=bool)
            files = side.column("file").to_numpy(zero_copy_only=False)
            poss = side.column("pos").to_numpy(zero_copy_only=False)
            keep[poss[files == fname].astype(int)] = False
            tbl = tbl.filter(pa.array(keep))
        n = tbl.num_rows
        cols = []
        for f in target:
            # data files carry stable PHYSICAL names (column mapping);
            # CDF sidecars are staged under LOGICAL names — try the
            # physical name first, then the logical fallback.
            phys = partition.cmap.get(f.name, f.name)
            if f.name == "_commit_version":
                col = pa.array([partition.commit_version] * n, pa.int64())
            elif f.name == "_change_type" and "_change_type" not in tbl.column_names:
                col = pa.array([partition.change_type] * n, pa.string())
            elif phys in tbl.column_names:
                col = tbl.column(phys).cast(f.type)
            elif f.name in tbl.column_names:
                col = tbl.column(f.name).cast(f.type)
            elif f.name in partition.part_values:
                col = pa.array([partition.part_values[f.name]] * n).cast(f.type)
            else:
                col = pa.nulls(n, f.type)  # schema evolution: older file
            cols.append(col)
        out = pa.table(cols, schema=target)
        yield from out.to_batches(max_chunksize=1 << 16)


class _TxLogStreamReader(DataSourceStreamReader):
    """Driver-side planner: versions -> file partitions. Runs no data I/O."""

    def __init__(self, schema: StructType, options: dict):
        from .txlog import TxLog

        self._path = options["path"]
        self._cdf = str(options.get("cdf", "false")).lower() == "true"
        self._skip_changes = (
            str(options.get("skip_change_commits", "false")).lower() == "true"
        )
        self._from = int(options.get("from_version", -1))
        ts = options.get("starting_timestamp")
        if ts is not None:
            # Delta's startingTimestamp: serve commits whose manifest ts
            # is >= the given epoch seconds — resolved ONCE at reader
            # construction to a version floor (the log is ordered by ts).
            log = TxLog(self._path)
            manifests, _ = log._list_log()
            floor_v = manifests[-1] if manifests else -1
            for v in manifests:
                m = log.store.read(log._manifest_name(v))
                if m.get("ts", 0) >= float(ts):
                    floor_v = v - 1
                    break
            self._from = max(self._from, floor_v)
        self._step = int(options.get("max_versions_per_batch", 0)) or None
        self._max_bytes = int(options.get("max_bytes_per_batch", 0)) or None
        self._pacing_id = str(options.get("pacing_id", "default"))
        self._schema = schema
        self._log = TxLog(self._path)
        # Column mapping resolved ONCE at stream start (like the schema):
        # physical names are stable across renames, so the start-time map
        # stays valid for every file the stream will ever serve; rename
        # commits themselves are metadata-only and skip.
        self._cmap = dict(self._log.state().cmap)
        # Admission-control floor: the newest version this reader has
        # offered or planned. The Python source API calls latestOffset()
        # BEFORE initialOffset() and never passes the checkpointed start
        # in, so a paced offset computed from a too-low floor would
        # REGRESS below a committed batch after a restart — and the
        # engine treats any offset != committed as new data, re-serving
        # committed versions (duplicates). The floor therefore persists
        # across restarts: commit(end) records it in a small JSON under
        # <table>/_source/, and latestOffset never offers below it. A
        # shared/stale floor can only weaken pacing (bigger batch), never
        # skip or re-serve data — partitions() always serves exactly the
        # (start, end] the engine asks for.
        self._last: tuple[int, int] | None = self._read_floor()

    @property
    def _floor_path(self) -> str:
        return os.path.join(self._path, "_source", f"{self._pacing_id}.json")

    # Offsets are (version, index): index == -1 means the version is fully
    # served; index i >= 0 means only its first i unit files are. The
    # sub-version index is what lets max_bytes_per_batch SPLIT one huge
    # commit across triggers (Delta's (reservoirVersion, index) offsets).
    @staticmethod
    def _parse(off: dict) -> tuple[int, int]:
        return int(off["version"]), int(off.get("index", -1))

    @staticmethod
    def _okey(off: tuple[int, int]):
        v, i = off
        return (v, float("inf") if i < 0 else i)

    def _read_floor(self) -> tuple[int, int] | None:
        try:
            with open(self._floor_path) as f:
                d = json.load(f)
                return int(d["version"]), int(d.get("index", -1))
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def _units(self, v: int) -> tuple[dict, list[str]]:
        """Manifest of version v plus its served unit-file list: cdf
        sidecars in cdf mode, data files for appends, [] otherwise
        (metadata-only commits; rewrites raise in partitions(), where
        they are actually served — pacing just passes over them)."""
        m = self._log.store.read(self._log._manifest_name(v))
        if self._cdf and m.get("cdf"):
            return m, list(m["cdf"])
        if m["op"] in ("append", "convert"):
            return m, list(m["adds"])
        return m, []

    def _unit_bytes(self, m: dict, name: str) -> int:
        b = (m.get("stats") or {}).get(name, {}).get("__bytes")
        if b is not None:
            return int(b)
        try:  # pre-__bytes manifests: one driver-side stat, never data I/O
            return os.path.getsize(os.path.join(self._log.data_path, name))
        except OSError:
            return 0

    def initialOffset(self) -> dict:
        if self._last is None:
            self._last = (self._from, -1)
        return {"version": self._from, "index": -1}

    def latestOffset(self) -> dict:
        head = self._log.state().version
        floor = self._last if self._last is not None else (self._from, -1)
        fv, fi = floor
        vcap = head if self._step is None else min(head, fv + self._step)
        off = (vcap, -1)
        if self._max_bytes is not None and self._okey(off) > self._okey(floor):
            # Byte pacing (Delta's maxBytesPerTrigger, soft cap): admit
            # unit files in log order until the budget is spent — always
            # at least one, so progress is guaranteed and a single file
            # larger than the budget still serves alone.
            tot, served_any = 0, False
            off = floor
            v = fv if fi >= 0 else fv + 1
            start_i = fi if fi >= 0 else 0
            while v <= vcap:
                try:
                    m, units = self._units(v)
                except FileNotFoundError:
                    off = (vcap, -1)  # truncated: partitions() raises
                    break
                i, over = start_i, False
                while i < len(units):
                    b = self._unit_bytes(m, units[i])
                    if served_any and tot + b > self._max_bytes:
                        over = True
                        break
                    tot += b
                    served_any = True
                    i += 1
                if over:
                    off = (v, i)  # stop BEFORE unit i of version v
                    break
                off = (v, -1)
                if tot >= self._max_bytes:
                    break
                v += 1
                start_i = 0
        if self._last is None or self._okey(off) > self._okey(self._last):
            self._last = off
        return {"version": off[0], "index": off[1]}

    def reportLatestOffset(self) -> dict:
        return self.latestOffset()

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from .txlog import TxConflictError, TxVersionTruncatedError

        sv, si = self._parse(start)
        ev, ei = self._parse(end)
        if self._last is None or self._okey((ev, ei)) > self._okey(self._last):
            self._last = (ev, ei)
        if self._step is not None or self._max_bytes is not None:
            # By the time the engine plans partitions, `end` is durable in
            # the checkpoint's offset WAL — the exact floor a restarted
            # reader must not pace below. Persisted HERE (not in commit():
            # the engine commits sources on the NEXT trigger, which a
            # single-batch availableNow run never has).
            self._write_floor((ev, ei))
        manifests, _ = self._log._list_log()
        have = set(manifests)
        out: list[InputPartition] = []
        data = self._log.data_path
        sj = self._schema.json()
        first_v = sv if si >= 0 else sv + 1
        for v in range(first_v, ev + 1):
            if v == ev and ei == 0:
                continue  # end offset stops BEFORE this version's first file
            if v not in have:
                raise TxVersionTruncatedError(
                    f"txlog stream needs manifest v{v} of {self._path!r}, but "
                    "it was truncated — restart the stream from a snapshot"
                )
            m = self._log.store.read(self._log._manifest_name(v))
            if self._cdf and m.get("cdf"):
                # Any commit with typed CDF sidecars serves them (cdc
                # always; update/delete/merge when the table property
                # enableChangeDataFeed is set). Sidecars are staged under
                # the LOGICAL names current at commit time — for a
                # later-renamed column that IS its stable physical name,
                # so pass the cmap: read() probes the physical name first
                # (resolves pre-rename sidecars) and falls back to the
                # logical name (post-rename sidecars). ADVICE r7: an
                # empty cmap here null-filled the renamed column for
                # change rows staged before the rename.
                units = list(m["cdf"])
                mk = lambda n: _FilesPartition(  # noqa: E731
                    [os.path.join(data, n)], v, None, {}, sj, self._cmap
                )
            elif m["op"] not in ("append", "convert"):
                if not m["adds"] and not m.get("removes") and not m.get("dvs"):
                    continue  # metadata-only commit: no logical row changes
                if self._skip_changes:
                    # Delta's skipChangeCommits: serve INSERTS only and
                    # silently pass over rewrite commits (merge/delete/
                    # optimize/...) — the documented opt-in that trades
                    # update visibility for stream liveness.
                    continue
                raise TxConflictError(
                    f"v{v} is a {m['op']} commit (file rewrite, not inserts); "
                    "a txlog stream cannot reconstruct it — restart from a "
                    "snapshot (or opt in with skip_change_commits=true)"
                )
            else:
                units = list(m["adds"])
                parts = m.get("parts") or {}
                mk = lambda n, _p=parts: _FilesPartition(  # noqa: E731
                    [os.path.join(data, n)], v,
                    "insert" if self._cdf else None, _p.get(n) or {}, sj,
                    self._cmap,
                )
            lo_i = si if (v == sv and si >= 0) else 0
            hi_i = ei if (v == ev and ei >= 0) else len(units)
            out.extend(mk(n) for n in units[lo_i:hi_i])
        return out

    def read(self, partition: _FilesPartition):
        return _read_files_partition(partition)

    def _write_floor(self, off: tuple[int, int]) -> None:
        prev = self._read_floor()
        if prev is None or self._okey(off) > self._okey(prev):
            os.makedirs(os.path.dirname(self._floor_path), exist_ok=True)
            tmp = f"{self._floor_path}.tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump({"version": off[0], "index": off[1]}, f)
            os.replace(tmp, self._floor_path)

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class _TxLogBatchReader(DataSourceReader):
    """BATCH read of a txlog table — ``spark.read.format("txlog")``, the
    way a Delta table is batch-readable alongside its streaming source.
    Planning is manifest-only (one partition per committed file, DV
    sidecar attached for executor-side position filtering); rows come
    back under the LOGICAL schema (column mapping applied, schema-
    evolved files null-filled, partition values re-attached) with
    ``_commit_version`` = the snapshot version served (constant per
    read — the batch analog of the stream's per-commit tag).
    ``version_as_of`` time-travels, exactly :meth:`TxLog.snapshot`."""

    def __init__(self, schema: StructType, options: dict):
        from .txlog import TxLog

        self._log = TxLog(options["path"])
        self._schema = schema
        v = options.get("version_as_of")
        self._version = int(v) if v is not None else None

    def partitions(self) -> list[InputPartition]:
        st = self._log.state(self._version)
        data = self._log.data_path
        sj = self._schema.json()
        ver = st.version if self._version is None else self._version
        return [
            _FilesPartition(
                [os.path.join(data, n)], ver, None,
                st.parts.get(n) or {}, sj, dict(st.cmap),
                os.path.join(data, st.dvs[n]) if n in st.dvs else None,
            )
            for n in st.files
        ] or [_FilesPartition([], ver, None, {}, sj, {})]

    def read(self, partition: _FilesPartition):
        return _read_files_partition(partition)


class TxLogDataSource(DataSource):
    """``format("txlog")`` — register once per session with
    :func:`register_txlog_source`. Options: ``path`` (table root,
    required), ``cdf`` (serve apply_cdc commits from their typed sidecar,
    default false), ``from_version`` (exclusive start, default -1),
    ``starting_timestamp`` (epoch seconds; serve commits with manifest
    ts >= it — Delta's startingTimestamp, resolved against the
    still-listed manifests), ``skip_change_commits`` (silently pass over
    rewrite commits instead of failing the stream — Delta's
    skipChangeCommits opt-in), ``max_versions_per_batch`` (backlog
    pacing at version granularity, default unbounded),
    ``max_bytes_per_batch`` (Delta's maxBytesPerTrigger: soft byte cap
    per micro-batch, splits a single huge commit across triggers at
    file granularity, default unbounded)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        from .txlog import TxLog

        v = self.options.get("version_as_of")
        st = TxLog(self.options["path"]).state(
            int(v) if v is not None else None
        )
        if st.schema_json is None:
            raise ValueError(
                f"txlog table {self.options['path']!r} has no commits yet"
            )
        schema = StructType.fromJson(json.loads(st.schema_json))
        schema = schema.add("_commit_version", LongType())
        if str(self.options.get("cdf", "false")).lower() == "true":
            schema = schema.add("_change_type", StringType())
        return schema

    def streamReader(self, schema: StructType) -> _TxLogStreamReader:
        return _TxLogStreamReader(schema, dict(self.options))

    def reader(self, schema: StructType) -> _TxLogBatchReader:
        return _TxLogBatchReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool):
        from .txlog_writer import TxLogBatchWriter

        return TxLogBatchWriter(schema, dict(self.options), overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        from .txlog_writer import TxLogStreamWriter

        return TxLogStreamWriter(schema, dict(self.options), overwrite)


def register_txlog_source(spark) -> None:
    """Idempotently register ``format("txlog")`` on the session."""
    spark.dataSource.register(TxLogDataSource)
