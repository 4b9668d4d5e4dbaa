"""Persisted signature index for incremental dedup (the stored side of
`incremental_dedup_indexed`).

A continuously-growing corpus must not recompute its own digests and
MinHash bands on every ingest — at 100 TB that is a full-corpus text scan
per batch. This index persists exactly the two probe tables the
incremental path needs:

- ``digests``: (doc, h)           — md5 content digest per accepted doc
- ``bands``  : (doc, band_id, band_hash) — MinHash LSH bucket keys

Layout: append-only batch directories (``digests/batch=N/``,
``bands/batch=N/``) committed by ONE atomic marker ``_batch_N_done`` at
the index root covering BOTH tables — a crash between the two table
writes leaves no marker, so readers never see a digest batch without its
bands (or vice versa). Retrying an append reuses the batch number and
overwrites the orphaned uncommitted directories, converging exactly-once
(the same tempfile+os.replace marker protocol as the router's epoch
commits, streaming/router.py).

Scale shape: append cost is O(batch) — one signature pass over the new
docs, never a rewrite of history (unlike a DimStore MERGE, which rewrites
the snapshot). Reads list the committed batch dirs and hand Spark the
path list, so partition pruning still applies per batch dir. Probe tables
carry ~40 bytes/doc — the index for a 10^10-doc corpus is ~hundreds of
GB, scanned only by digest/bucket semi-joins that reduce map-side.

Single-writer: batch numbering assumes one appender (the ingest driver).
That contract is ENFORCED, not just documented: every mutation
(append/compact) runs under the router's pid-liveness + fence-token lock
(`streaming/router.RouterLock`) held for the operation's duration — a
second live concurrent writer raises SinkLockError instead of
interleaving batch writes; a crashed writer's stale lock is stolen on
the next mutation. Distributed multi-writer arbitration still needs a
transactional table format, same scope note as DimStore/router
(PARITY §2.3 R2).
"""

from __future__ import annotations

import os
import re
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import band_rows, minhash_signatures

_MARKER_RE = re.compile(r"^_batch_([A-Za-z0-9]+)_done$")


@contextmanager
def index_write_lock(base_dir: str):
    """Single-writer fence for one index mutation: acquire the router's
    lock (pid-liveness check, atomic stale-steal) for the duration of an
    append/compact. Shared by SignatureIndex and IvfIndex."""
    from ..streaming.router import RouterLock

    lock = RouterLock(base_dir).acquire()
    try:
        yield lock
    finally:
        lock.release()


def _label_key(label: str):
    # auto-numbered labels sort numerically first, named labels (e.g. the
    # streaming path's "e<epoch>") after, lexicographically
    return (0, int(label), "") if label.isdigit() else (1, 0, label)


class SignatureIndex:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # -- commit bookkeeping -------------------------------------------------
    def committed_batches(self) -> list[str]:
        """Committed batch labels: auto-numbered appends get "0", "1", ...;
        callers may pass their own labels (the streaming ingest uses
        "e<epoch>" so epoch commits can never collide with seed batches)."""
        out = []
        for f in os.listdir(self.base_dir):
            m = _MARKER_RE.match(f)
            if m:
                out.append(m.group(1))
        return sorted(out, key=_label_key)

    def is_empty(self) -> bool:
        return not self.committed_batches()

    def _table_paths(self, table: str) -> list[str]:
        return [
            os.path.join(self.base_dir, table, f"batch={n}")
            for n in self.committed_batches()
        ]

    # -- append (one signature pass over the NEW docs only) -----------------
    def append(
        self, docs: DataFrame, id_col: str, text_col: str, batch_no: int | str | None = None
    ) -> str:
        """Add a batch of accepted documents to the index; returns the
        committed batch label. Crash-retry safe: an uncommitted batch has
        no marker, and the retry overwrites its directories.

        Pass ``batch_no`` (e.g. ``f"e{epoch}"`` from foreachBatch) to make
        replays idempotent: a batch whose marker is already committed is
        skipped outright, so a streaming ingest that retries an epoch
        cannot grow the index twice. The label must be stable across query
        restarts — derive it from the epoch id only. (Duplicate index rows
        would be HARMLESS to correctness — every probe is a semi join —
        but they'd inflate the stored tables forever.)"""
        with index_write_lock(self.base_dir):
            committed = self.committed_batches()
            if batch_no is None:
                ints = [int(b) for b in committed if b.isdigit()]
                n = str(max(ints) + 1) if ints else "0"
            else:
                n = str(batch_no)
                if not n.isalnum():
                    raise ValueError(f"batch label must be alphanumeric, got {n!r}")
                if n in committed:
                    return n  # epoch replay: already committed, exactly-once
            dig = docs.select(
                F.col(id_col).alias("doc"), F.md5(F.col(text_col)).alias("h")
            )
            bands = band_rows(minhash_signatures(docs, id_col, text_col))
            dig.write.mode("overwrite").parquet(
                os.path.join(self.base_dir, "digests", f"batch={n}")
            )
            bands.write.mode("overwrite").parquet(
                os.path.join(self.base_dir, "bands", f"batch={n}")
            )
            marker = os.path.join(self.base_dir, f"_batch_{n}_done")
            fd, tmp = tempfile.mkstemp(dir=self.base_dir, prefix="_marker_")
            os.close(fd)
            os.replace(tmp, marker)
            return n

    # -- compaction ---------------------------------------------------------
    def compact(self) -> str | None:
        """Merge every committed batch into one — the small-file fix a
        long-running ingest needs (per-epoch appends leave one directory
        per trigger; readers pay per-file open cost forever otherwise).

        Protocol: write the merged tables under the next auto label,
        commit its marker, then remove the old markers. Every step is
        crash-safe: an orphaned merged dir (no marker) is overwritten by
        the retry; a crash mid-removal leaves some batches doubly visible,
        which is HARMLESS to the semi-join probes (duplicate rows cannot
        change a semi join) and is cleaned by the next compact. Same
        single-writer scope as append, enforced by the same lock.
        """
        with index_write_lock(self.base_dir):
            committed = self.committed_batches()
            if len(committed) <= 1:
                return committed[0] if committed else None
            ints = [int(b) for b in committed if b.isdigit()]
            n = str(max(ints) + 1) if ints else "0"
            self.digests().write.mode("overwrite").parquet(
                os.path.join(self.base_dir, "digests", f"batch={n}")
            )
            self.bands().write.mode("overwrite").parquet(
                os.path.join(self.base_dir, "bands", f"batch={n}")
            )
            marker = os.path.join(self.base_dir, f"_batch_{n}_done")
            fd, tmp = tempfile.mkstemp(dir=self.base_dir, prefix="_marker_")
            os.close(fd)
            os.replace(tmp, marker)
            import shutil

            for old in committed:
                os.remove(os.path.join(self.base_dir, f"_batch_{old}_done"))
                for t in ("digests", "bands"):  # decommitted data dirs: best-effort sweep
                    shutil.rmtree(
                        os.path.join(self.base_dir, t, f"batch={old}"), ignore_errors=True
                    )
            return n

    # -- probe tables (the only thing an ingest ever reads) -----------------
    def _read(self, table: str, schema: str) -> DataFrame:
        paths = self._table_paths(table)
        if not paths:
            # empty index: typed empty frame (schema only matters here —
            # committed batches carry their own parquet schema)
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*paths)

    def digests(self) -> DataFrame:
        return self._read("digests", "doc long, h string")

    def bands(self) -> DataFrame:
        return self._read("bands", "doc long, band_id int, band_hash string")
