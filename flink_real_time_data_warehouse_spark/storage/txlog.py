"""Optimistic-concurrency transaction log for parquet tables — MULTI-writer
arbitration, the layer the hand-rolled single-writer sinks (RouterLock +
epoch markers, `streaming/router.py`) explicitly scope out.

This is the Delta Lake commit protocol (Armbrust et al., "Delta Lake:
High-Performance ACID Table Storage over Cloud Object Stores", VLDB 2020 —
public paper) re-implemented on a POSIX directory, replacing the
reference's transactional stores (Phoenix upserts / ClickHouse
ReplacingMergeTree dedup) with a table format every engine can read:

- A table = immutable data files + an ordered log of JSON manifests
  ``_txlog/<10-digit version>.json``. Readers never see a data file that
  is not named by a committed manifest.
- Writers STAGE uniquely-named parquet files under ``data/`` first —
  invisible until committed, so a crash mid-stage leaves only orphans
  (collected by :meth:`vacuum`).
- Commit = atomically CLAIMING the next log version. The manifest content
  is written to a temp file and published with ``os.link(tmp, final)`` —
  link(2) both fails with EEXIST if the version is taken (exactly one
  winner per version) AND makes the fully-written content appear
  atomically, so a torn/partial manifest is impossible by construction
  (the O_EXCL-create-then-write alternative can crash between create and
  write, leaving a poisoned empty manifest).
- A loser re-reads the log and RETRIES at the next version. Blind appends
  conflict with nothing, so append retries always succeed; REPLACE
  (overwrite) validates that the table version it read is still current
  and raises :class:`TxConflictError` otherwise — serializable semantics,
  the caller re-derives its output from the new state and tries again.
- Readers take a SNAPSHOT: one log listing resolves to a fixed file list;
  commits that land afterwards are invisible (snapshot isolation), and
  since data files are immutable a held snapshot stays readable until
  vacuumed.
- Streaming exactly-once: a commit may carry ``(app_id, app_version)``;
  if the table already holds a version >= for that app the commit is
  SKIPPED and its staged files deleted — the ``txnAppId``/``txnVersion``
  idempotence contract a foreachBatch sink needs under crash-retry.
- ``checkpoint()`` folds the manifest chain into one
  ``<v>.checkpoint.json``; readers start from the newest checkpoint, so
  manifests at or below it can be deleted (log truncation) without
  affecting any state derived at or after it.

Arbitration primitive scope: atomic link/EEXIST is correct on local POSIX
and HDFS-like filesystems — the environments this repo's sinks target. On
S3 the same protocol swaps the claim step for a conditional PUT or a
commit coordinator (Delta's LogStore abstraction does exactly this); the
manifest/snapshot/idempotence logic above is unchanged.

Scale shape: commits move METADATA only (a few KB of JSON per commit, one
listing per snapshot) — data-file bytes never rewrite on append; state
reconstruction cost is bounded by checkpoint interval, not table age.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class TxConflictError(RuntimeError):
    """A REPLACE lost to a concurrent commit (or retries were exhausted):
    the state the writer derived its output from is no longer current."""


_V_DIGITS = 10


def _footer_minmax(path: str, cols: list[str]) -> dict:
    """[min, max] per requested column from parquet row-group footers —
    metadata only, no data read. Columns without usable stats are omitted
    (readers keep such files, which is always safe)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {}
    for col in cols:
        if col not in idx:
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if ok and lo is not None and not isinstance(lo, bytes):
            out[col] = [lo, hi]
    return out


@dataclass(frozen=True)
class _State:
    version: int  # -1 => empty table, no commits yet
    files: tuple[str, ...]  # data file names (relative to data/), committed
    apps: dict  # app_id -> highest committed app_version
    schema_json: str | None  # schema of the latest commit
    stats: dict  # file name -> {col: [min, max]} (only files committed with stats)


class TxLog:
    """One transactional parquet table rooted at ``path``."""

    LOG_DIR = "_txlog"
    DATA_DIR = "data"

    def __init__(self, path: str):
        self.path = path
        self.log_path = os.path.join(path, self.LOG_DIR)
        self.data_path = os.path.join(path, self.DATA_DIR)
        os.makedirs(self.log_path, exist_ok=True)
        os.makedirs(self.data_path, exist_ok=True)

    # -- log reading ---------------------------------------------------

    def _manifest_file(self, version: int) -> str:
        return os.path.join(self.log_path, f"{version:0{_V_DIGITS}d}.json")

    def _list_log(self) -> tuple[list[int], list[int]]:
        """(sorted manifest versions, sorted checkpoint versions)."""
        manifests, checkpoints = [], []
        for name in os.listdir(self.log_path):
            if name.endswith(".checkpoint.json"):
                checkpoints.append(int(name.split(".")[0]))
            elif name.endswith(".json") and not name.startswith("."):
                manifests.append(int(name.split(".")[0]))
        return sorted(manifests), sorted(checkpoints)

    def state(self, at_version: int | None = None) -> _State:
        """Reconstruct table state from the newest checkpoint <= target,
        then replay later manifests. One directory listing; no data I/O."""
        manifests, checkpoints = self._list_log()
        if at_version is not None:
            manifests = [v for v in manifests if v <= at_version]
            checkpoints = [v for v in checkpoints if v <= at_version]
        files: list[str] = []
        apps: dict = {}
        stats: dict = {}
        schema_json: str | None = None
        version = -1
        start = 0
        if checkpoints:
            cp_v = checkpoints[-1]
            with open(os.path.join(self.log_path, f"{cp_v:0{_V_DIGITS}d}.checkpoint.json")) as f:
                cp = json.load(f)
            files = list(cp["files"])
            apps = dict(cp["apps"])
            stats = dict(cp.get("stats", {}))
            schema_json = cp.get("schema_json")
            version = cp_v
            start = cp_v + 1
        for v in manifests:
            if v < start:
                continue
            with open(self._manifest_file(v)) as f:
                m = json.load(f)
            if m["op"] == "replace":
                files = []
                stats = {}
            removed = set(m.get("removes", []))
            files = [n for n in files if n not in removed]
            for r in removed:
                stats.pop(r, None)
            files.extend(m["adds"])
            stats.update(m.get("stats") or {})
            if m.get("app_id") is not None:
                apps[m["app_id"]] = max(apps.get(m["app_id"], -1), m["app_version"])
            if m.get("schema_json"):
                schema_json = m["schema_json"]
            version = v
        return _State(version, tuple(files), apps, schema_json, stats)

    # -- commit --------------------------------------------------------

    def _publish(self, version: int, manifest: dict) -> bool:
        """Atomically claim `version` with fully-written content. True if
        this writer won the version, False if someone else did."""
        tmp = os.path.join(self.log_path, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._manifest_file(version))
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def commit_files(
        self,
        adds: list[str],
        op: str = "append",
        schema_json: str | None = None,
        app_id: str | None = None,
        app_version: int | None = None,
        expected_version: int | None = None,
        removes: list[str] | None = None,
        stats: dict | None = None,
        max_retries: int = 100,
    ) -> int:
        """Commit already-staged data files. Returns the committed (or, for
        an idempotent skip, the current) table version.

        `op="append"` conflicts with nothing and retries until it wins a
        version. `op="replace"` additionally requires the table version to
        still be `expected_version` at the moment it wins; a concurrent
        commit in between raises :class:`TxConflictError` (staged files
        are cleaned up).
        """
        for _ in range(max_retries):
            st = self.state()
            if (
                app_id is not None
                and app_version is not None
                and st.apps.get(app_id, -1) >= app_version
            ):
                # Replayed epoch (crash-retry): already committed once;
                # drop this attempt's staged files and report current state.
                self._delete_staged(adds)
                return st.version
            if op == "replace" and expected_version is not None and st.version != expected_version:
                self._delete_staged(adds)
                raise TxConflictError(
                    f"replace derived from v{expected_version} but table is at v{st.version}"
                )
            if removes is not None:
                # Disjoint-file conflict rule (Delta's OPTIMIZE semantics):
                # this commit only conflicts if some file it wants to
                # remove is no longer live (a concurrent commit removed or
                # replaced it); concurrent APPENDS land disjoint files and
                # never conflict, so compaction runs alongside ingestion.
                missing = set(removes) - set(st.files)
                if missing:
                    self._delete_staged(adds)
                    raise TxConflictError(
                        f"files to remove are no longer live: {sorted(missing)[:3]}..."
                    )
            manifest = {
                "op": op,
                "adds": adds,
                "removes": list(removes or []),
                "stats": stats or {},
                "schema_json": schema_json,
                "app_id": app_id,
                "app_version": app_version,
                "ts": time.time(),
            }
            if self._publish(st.version + 1, manifest):
                return st.version + 1
            # lost the race: someone committed st.version+1 first — re-read
            # state (idempotence/conflict re-checked against it) and retry
        self._delete_staged(adds)
        raise TxConflictError(f"commit lost {max_retries} consecutive version races")

    def _delete_staged(self, names: list[str]) -> None:
        for n in names:
            try:
                os.remove(os.path.join(self.data_path, n))
            except FileNotFoundError:
                pass

    # -- DataFrame API -------------------------------------------------

    def _stage(
        self, df: DataFrame, stats_cols: list[str] | None = None
    ) -> tuple[list[str], str, dict]:
        """Write df's parts as uniquely-named files under data/ (invisible
        until a manifest names them). With `stats_cols`, per-file [min,max]
        of those columns is read from the parquet FOOTERS just written (no
        data re-scan) and recorded in the manifest — the table-format
        data-skipping statistics. Returns (names, schema_json, stats)."""
        prefix = uuid.uuid4().hex
        tmp = os.path.join(self.path, f"_staging-{prefix}")
        df.write.mode("overwrite").parquet(tmp)
        names, stats = [], {}
        for name in sorted(os.listdir(tmp)):
            if name.endswith(".parquet"):
                staged = f"{prefix}-{name}"
                dest = os.path.join(self.data_path, staged)
                os.replace(os.path.join(tmp, name), dest)
                names.append(staged)
                if stats_cols:
                    fs = _footer_minmax(dest, stats_cols)
                    if fs:
                        stats[staged] = fs
        shutil.rmtree(tmp, ignore_errors=True)
        return names, df.schema.json(), stats

    def append(
        self,
        df: DataFrame,
        app_id: str | None = None,
        app_version: int | None = None,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Transactional append; with (app_id, app_version) it is an
        idempotent streaming-epoch commit (replays skip). `stats_cols`
        records per-file [min,max] footer stats for data skipping."""
        # Idempotence fast path: skip the stage write entirely on replay.
        if app_id is not None and app_version is not None:
            if self.state().apps.get(app_id, -1) >= app_version:
                return self.state().version
        names, schema_json, stats = self._stage(df, stats_cols)
        return self.commit_files(
            names, "append", schema_json, app_id=app_id, app_version=app_version,
            stats=stats,
        )

    def overwrite(
        self,
        df: DataFrame,
        expected_version: int | None = None,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Replace the table contents, serializably: if `expected_version`
        is given (the version the caller derived `df` from), any concurrent
        commit in between fails this replace with TxConflictError."""
        if expected_version is None:
            expected_version = self.state().version
        names, schema_json, stats = self._stage(df, stats_cols)
        return self.commit_files(
            names, "replace", schema_json, expected_version=expected_version,
            stats=stats,
        )

    def snapshot(
        self,
        spark: SparkSession,
        version: int | None = None,
        prune: tuple | None = None,
    ) -> DataFrame:
        """The table as of `version` (default: now). One log listing fixes
        the file list; later commits are invisible to the returned frame.

        `prune=(col, lo, hi)` applies MANIFEST-LEVEL data skipping: files
        whose recorded [min,max] for `col` cannot intersect [lo, hi] are
        dropped from the listing before Spark ever sees them — at 100 TB
        this (not the parquet footer check, which still requires opening
        every file) is what bounds a selective query's task count. Files
        committed without stats are conservatively kept; the caller still
        applies the row-level filter."""
        st = self.state(version)
        files = list(st.files)
        if prune is not None and files:
            col, lo, hi = prune
            kept = []
            for n in files:
                mm = st.stats.get(n, {}).get(col)
                if mm is None or (mm[0] <= hi and mm[1] >= lo):
                    kept.append(n)
            files = kept
        if not files:
            if st.schema_json is None:
                raise ValueError(f"txlog table {self.path!r} has no commits")
            return spark.createDataFrame([], StructType.fromJson(json.loads(st.schema_json)))
        paths = [os.path.join(self.data_path, n) for n in files]
        return spark.read.parquet(*paths)

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str,
        max_retries: int = 10,
    ) -> int:
        """Type-1 upsert (MERGE) as lock-free OCC read-modify-write: read
        the snapshot at version v, fold `updates` in (update rows win on
        key equality; caller supplies one row per key), and REPLACE with
        ``expected_version=v``. A concurrent commit fails the replace and
        the merge RE-DERIVES from the fresh state and retries — so
        concurrent mergers serialize without any lock, the multi-writer
        counterpart of DimStore's single-writer MERGE
        (sources/dim_store.py; reference DimSinkFunction.java:17-89)."""
        for _ in range(max_retries):
            st = self.state()
            if not st.files:
                merged = updates
            else:
                base = self.snapshot(spark, version=st.version)
                merged = base.join(
                    updates.select(key).distinct(), key, "left_anti"
                ).unionByName(updates)
            try:
                return self.overwrite(merged, expected_version=st.version)
            except TxConflictError:
                continue
        raise TxConflictError(f"merge lost {max_retries} consecutive OCC races")

    # -- maintenance ---------------------------------------------------

    def optimize(
        self,
        spark: SparkSession,
        max_files: int = 8,
        max_retries: int = 10,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Bin-pack the table's committed files into at most `max_files`
        (the small-files fix for per-epoch streaming appends). Runs under
        the DISJOINT-FILE conflict rule: concurrent appends land new files
        and never conflict with this commit; only a concurrent removal of
        the same files (another optimize/replace) does, in which case the
        compaction re-derives from fresh state and retries. Returns the
        committed version (or current version if nothing to do)."""
        for _ in range(max_retries):
            st = self.state()
            if len(st.files) <= max_files:
                return st.version
            victims = list(st.files)
            packed = (
                self.snapshot(spark, version=st.version)
                .coalesce(max_files)
            )
            names, schema_json, stats = self._stage(packed, stats_cols)
            try:
                return self.commit_files(
                    names, op="optimize", schema_json=schema_json, removes=victims,
                    stats=stats,
                )
            except TxConflictError:
                continue  # another remover won; re-derive and retry
        raise TxConflictError(f"optimize lost {max_retries} consecutive OCC races")

    def checkpoint(self) -> int:
        """Fold the log into `<v>.checkpoint.json`. Manifests <= v can then
        be deleted (truncate_log). Deterministic content per version, so a
        concurrent duplicate checkpoint is harmless (os.replace, same
        bytes)."""
        st = self.state()
        if st.version < 0:
            return st.version
        cp = {
            "files": list(st.files),
            "apps": st.apps,
            "stats": st.stats,
            "schema_json": st.schema_json,
        }
        tmp = os.path.join(self.log_path, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(cp, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(
            tmp, os.path.join(self.log_path, f"{st.version:0{_V_DIGITS}d}.checkpoint.json")
        )
        return st.version

    def truncate_log(self) -> int:
        """Delete manifests covered by the newest checkpoint. Returns the
        number removed."""
        manifests, checkpoints = self._list_log()
        if not checkpoints:
            return 0
        cp_v = checkpoints[-1]
        n = 0
        for v in manifests:
            if v <= cp_v:
                try:
                    os.remove(self._manifest_file(v))
                    n += 1
                except FileNotFoundError:
                    pass
        return n

    def vacuum(self, grace_seconds: float = 24 * 3600.0) -> int:
        """Delete data files no committed manifest references (crash
        orphans, replaced files) older than `grace_seconds` — the grace
        window protects in-flight stages and held snapshots, exactly
        Delta's VACUUM contract. Returns the number removed."""
        live = set(self.state().files)
        now = time.time()
        n = 0
        for name in os.listdir(self.data_path):
            if name in live:
                continue
            p = os.path.join(self.data_path, name)
            try:
                if now - os.path.getmtime(p) >= grace_seconds:
                    os.remove(p)
                    n += 1
            except FileNotFoundError:
                pass
        return n
