"""Persisted IVF index for embedding similarity search (the stored side
of `similarity.ivf_topk`).

A 100 TB ANN deployment builds its coarse quantizer ONCE, then appends
vectors to the inverted lists forever and serves queries from storage —
it never re-derives centroids or re-assigns the corpus per query. This
class persists exactly those two tables:

- ``centroids``: (cid, cv) — frozen at build time
- ``lists``    : (neighbor_id, nv, nv_c8: array<tinyint>, nv_n8),
  PARTITIONED BY cid (``lists/batch=N/cid=K/``) — the inverted lists,
  appended per accepted vector batch. Each row carries BOTH the float
  vector (exact re-rank store) and its int8 code + code norm
  (`similarity.with_int8_code` convention, persisted as genuine
  array<tinyint> — 1/4 the bytes of float32). cid-as-partition-column
  is the physical meaning of "inverted list": a probe joining on cid
  against a broadcast probe set dynamically PRUNES the unprobed lists'
  files — the scan touches nprobe/K of the corpus, instead of reading
  everything and discarding rows in the join.

Layout and commit protocol mirror `signature_index.SignatureIndex`:
append-only ``lists/batch=<label>/`` directories committed by atomic
``_batch_<label>_done`` markers (epoch-stable labels make streaming
appends replay-idempotent); centroids commit once under ``_built``.
Append cost is O(batch): one broadcast of K tiny centroids against the
new vectors and a map-side-combinable argmax — history is never
rewritten, the corpus is never rescanned.

Query cost: nprobe·|C|/K candidate rows per query, joined on the list id
(equi-join — the bucket-join discipline of every approximate path here).
`topk` ranks on the stored floats (IVF-Flat); `topk_quantized` is the
two-stage production path: the candidate scan reads ONLY the code and
norm columns (Parquet column pruning — the 4× byte cut is what a 100 TB
scan is bound by), then the exact float column is point-joined for the
|Q|·cand survivors (plan-tested: the stage-1 scan never reads ``nv``).
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .signature_index import index_write_lock
from .similarity import (
    INT8_CAND,
    IVF_K,
    IVF_NPROBE,
    PQ_CAND,
    _with_int8,
    assign_top1,
    assign_topn,
    cosine,
    dot,
    dot8,
    norm,
    ivf_probe_topk,
    pq_encode,
    quantized,
    qdot,
    with_int8_code,
)

# Broadcast gate for streaming vector probes: |batch|·nprobe probe rows
# each carrying a full d-dim float vector cross the wire when the hint is
# on — at d=768 and nprobe=2 this cap is ~2.4 GB of vectors. Size to the
# deployment's broadcast budget; past it, start_vector_ingest drops the
# hint and lets Spark plan the joins.
PROBE_BROADCAST_MAX_ROWS = 500_000

_MARKER_RE = re.compile(r"^_batch_([A-Za-z0-9]+)_done$")
_FOLDED_RE = re.compile(r"^_batch_([A-Za-z0-9]+)_folded$")


class IvfIndex:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # -- commit bookkeeping -------------------------------------------------
    def _commit_marker(self, name: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.base_dir, prefix="_marker_")
        os.close(fd)
        os.replace(tmp, os.path.join(self.base_dir, name))

    def is_built(self) -> bool:
        return os.path.exists(os.path.join(self.base_dir, "_built"))

    def committed_batches(self) -> list[str]:
        out = []
        for f in os.listdir(self.base_dir):
            m = _MARKER_RE.match(f)
            if m:
                out.append(m.group(1))
        return sorted(out, key=lambda lb: (0, int(lb), "") if lb.isdigit() else (1, 0, lb))

    def _folded_labels(self) -> set[str]:
        """Labels folded away by compact(): their `_done` marker became a
        `_folded` tombstone, so a replayed epoch with that label is still
        SKIPPED (the marker-protocol fix mirroring SignatureIndex's TxLog
        app high-water marks — without tombstones, a replay from an old
        checkpoint after compaction re-appended its rows)."""
        out = set()
        for f in os.listdir(self.base_dir):
            m = _FOLDED_RE.match(f)
            if m:
                out.add(m.group(1))
        return out

    # -- build / append -----------------------------------------------------
    def build(
        self,
        corpus: DataFrame,
        n_centroids: int = IVF_K,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        centroids: DataFrame | None = None,
        pq_books: DataFrame | None = None,
    ) -> None:
        """Freeze the coarse quantizer and assign the build corpus.

        Default centroids are the deterministic first-k init (matching
        `ivf_topk`, so results are oracle-comparable); pass a
        `kmeans_centroids`-trained frame as ``centroids`` for the
        production quantizer — every downstream plan is unchanged.

        ``pq_books`` ((sub, cid, cq) from `similarity.pq_codebooks`)
        upgrades the layout to FAISS's IVFPQ: the books freeze alongside
        the coarse quantizer and every list row additionally stores the
        vector's m PQ code ids (``nv_pq``), so `topk_pq` can ADC-scan the
        probed lists reading codes only. Books must freeze at build time
        — codes appended later have to come from the same codebooks or
        ADC sums would mix incompatible codeword spaces.
        """
        cents = centroids
        if cents is None:
            cents = corpus.where(F.col(id_col) < n_centroids).select(
                F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
            )
        # ONE lock scope around guard + centroid commit + corpus append:
        # checking is_built outside the lock (or releasing between the two
        # writes) would let two concurrent build() calls both pass the
        # guard and double-store the corpus.
        with index_write_lock(self.base_dir):
            if self.is_built():
                raise RuntimeError(
                    f"IVF index at {self.base_dir!r} is already built"
                )
            cents.write.mode("overwrite").parquet(
                os.path.join(self.base_dir, "centroids")
            )
            if pq_books is not None:
                pq_books.write.mode("overwrite").parquet(
                    os.path.join(self.base_dir, "pq_books")
                )
                self._commit_marker("_pq_built")
            self._commit_marker("_built")
            self._append_locked(corpus, id_col, vec_col, batch_no=None)

    def append(
        self,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        batch_no: int | str | None = None,
    ) -> str:
        """Assign a batch of NEW vectors to the frozen centroids and append
        the inverted-list rows — O(batch), history untouched. Labeled
        appends (``batch_no``) marker-skip replays, like SignatureIndex.

        Rows persist the float vector AND its int8 code (+ code norm),
        codes as real array<tinyint>; quantization is pure column
        arithmetic riding the same single pass as the assignment."""
        if not self.is_built():
            raise RuntimeError("build() the index before appending")
        with index_write_lock(self.base_dir):
            return self._append_locked(vectors, id_col, vec_col, batch_no)

    def _append_locked(
        self,
        vectors: DataFrame,
        id_col: str,
        vec_col: str,
        batch_no: int | str | None,
    ) -> str:
        """append() body; caller holds the write lock (build() reuses this
        inside its own single lock scope — the lock is not reentrant)."""
        committed = self.committed_batches()
        folded = self._folded_labels()
        if batch_no is None:
            # never reuse a folded label: its tombstone would swallow the
            # new append as a "replay"
            ints = [int(b) for b in set(committed) | folded if b.isdigit()]
            n = str(max(ints) + 1) if ints else "0"
        else:
            n = str(batch_no)
            if not n.isalnum():
                raise ValueError(f"batch label must be alphanumeric, got {n!r}")
            if n in committed or n in folded:
                return n  # epoch replay (possibly of a folded batch): committed once
        inv = assign_top1(
            vectors, self.centroids(), id_col, vec_col, "neighbor_id"
        ).withColumnRenamed("_v", "nv")
        inv = with_int8_code(inv, "nv", "nv").withColumn(
            "nv_c8", F.transform("nv_c8", lambda x: x.cast("tinyint"))
        )
        if self.has_pq():
            # IVFPQ rows also carry the m PQ code ids, encoded against
            # the FROZEN books in the same append pass — array<int>,
            # ~m bytes/vector, the 16x-compressed ADC scan column
            books = self.pq_books()
            m, width = self._pq_shape()
            codes = pq_encode(
                vectors, books, m=m, dim=m * width, id_col=id_col, vec_col=vec_col
            )
            arr = (
                codes.groupBy("vid")
                .agg(F.array_sort(F.collect_list(F.struct("sub", "cid"))).alias("sc"))
                .select(
                    "vid",
                    F.transform("sc", lambda x: x["cid"].cast("int")).alias("nv_pq"),
                )
            )
            inv = inv.join(arr, inv["neighbor_id"] == arr["vid"]).drop("vid")
        inv.write.mode("overwrite").partitionBy("cid").parquet(
            os.path.join(self.base_dir, "lists", f"batch={n}")
        )
        self._commit_marker(f"_batch_{n}_done")
        return n

    # -- compaction ---------------------------------------------------------
    def compact(self) -> str | None:
        """Merge every committed list batch into one (small-file fix for
        long-running appends) — same crash-safe protocol as
        SignatureIndex.compact: merged dir first, its marker, then
        decommit the old batches (doubly-visible rows during a crash
        window are harmless: `ivf_probe_topk` folds duplicate candidate
        rows before ranking, and the next compact removes them). Each
        folded label leaves a `_folded` TOMBSTONE (atomic rename of its
        done marker), so an epoch replayed from an old checkpoint after
        the compaction is still skipped — exactly-once index growth, the
        same guarantee SignatureIndex now gets from TxLog high-water
        marks. Single-writer scope, enforced by the same lock as append."""
        import shutil

        with index_write_lock(self.base_dir):
            committed = self.committed_batches()
            if len(committed) <= 1:
                return committed[0] if committed else None
            ints = [
                int(b) for b in set(committed) | self._folded_labels() if b.isdigit()
            ]
            n = str(max(ints) + 1) if ints else "0"
            self.lists().write.mode("overwrite").partitionBy("cid").parquet(
                os.path.join(self.base_dir, "lists", f"batch={n}")
            )
            self._commit_marker(f"_batch_{n}_done")
            for old in committed:
                os.replace(
                    os.path.join(self.base_dir, f"_batch_{old}_done"),
                    os.path.join(self.base_dir, f"_batch_{old}_folded"),
                )
                shutil.rmtree(
                    os.path.join(self.base_dir, "lists", f"batch={old}"),
                    ignore_errors=True,
                )
            return n

    # -- stored tables ------------------------------------------------------
    def centroids(self) -> DataFrame:
        if not self.is_built():
            raise RuntimeError("IVF index not built")
        return self.spark.read.parquet(os.path.join(self.base_dir, "centroids"))

    def has_pq(self) -> bool:
        return os.path.exists(os.path.join(self.base_dir, "_pq_built"))

    def pq_books(self) -> DataFrame:
        if not self.has_pq():
            raise RuntimeError("IVF index has no PQ codebooks")
        return self.spark.read.parquet(os.path.join(self.base_dir, "pq_books"))

    def _pq_shape(self) -> tuple[int, int]:
        """(m subspaces, subvector width) from the stored books — one
        O(m*k)-row control-plane aggregate, no metadata sidecar."""
        r = self.pq_books().agg(
            (F.max("sub") + 1).alias("m"), F.max(F.size("cq")).alias("w")
        ).first()
        return int(r["m"]), int(r["w"])

    def lists(self) -> DataFrame:
        """Union of the committed list batches. Each batch dir is read
        under its own basePath so the cid= partition dirs resolve per
        batch (a single multi-path read trips Spark's conflicting-
        directory check). Post-compaction this is ONE partitioned scan —
        the case where a probe's broadcast cid join dynamically prunes
        unprobed lists; pre-compaction unions prune per-scan at best,
        one more reason compact() exists."""
        from functools import reduce

        paths = [
            os.path.join(self.base_dir, "lists", f"batch={n}")
            for n in self.committed_batches()
        ]
        if not paths:
            raise RuntimeError("IVF index has no committed list batches")
        dfs = [self.spark.read.option("basePath", p).parquet(p) for p in paths]
        return reduce(lambda a, b: a.unionByName(b), dfs)

    # -- search -------------------------------------------------------------
    def topk(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int = IVF_NPROBE,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Approximate top-k from STORAGE: queries rank against the stored
        centroids (broadcast) and probe the stored inverted lists — the
        corpus source is never scanned (plan-tested)."""
        probes = assign_topn(
            queries, self.centroids(), nprobe, id_col, vec_col, "query_id"
        ).withColumnRenamed("_v", "qv")
        return ivf_probe_topk(probes, self.lists(), k)

    def near_verdicts(
        self,
        batch: DataFrame,
        threshold: float,
        nprobe: int = IVF_NPROBE,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        within_batch: bool = True,
        broadcast_probes: bool = True,
    ) -> DataFrame:
        """Near-duplicate verdict per incoming vector — the embedding twin
        of `dedup._incremental_verdicts`: 'near' if any stored vector in
        the batch vector's nprobe probed lists has cosine >= threshold
        (or, with ``within_batch``, a SMALLER-id vector of the same batch
        whose top-1 list is probed — the min-id keeper rule), else 'keep'.

        Probe direction mirrors the text index: the stored lists are
        scanned once and joined against a BROADCAST of the batch's probes
        — output bounded by candidates, the index never shuffled, and the
        broadcast cid join enables dynamic partition pruning of the
        cid-partitioned lists. The probe rows carry full float vectors
        (|batch|·nprobe of them), so callers gate the hint on batch size
        (``broadcast_probes=False`` — start_vector_ingest counts each
        trigger against PROBE_BROADCAST_MAX_ROWS) and oversized batches
        degrade to Spark-planned joins instead of dying at the broadcast
        limit. Returns (vec, verdict)."""
        hint = F.broadcast if broadcast_probes else (lambda df: df)
        # Per-side self-norms staged below the candidate joins (guide
        # §1.2): a stored vector's sqrt-dot evaluates once per scanned
        # list row and a probe's once per probe row, so each candidate
        # costs ONE dot; dot/(_nq*_nn) is the identical float
        # composition cosine() expands to — bit-identical verdicts.
        probes = assign_topn(
            batch, self.centroids(), nprobe, id_col, vec_col, "vid"
        ).withColumn("_nq", norm(F.col("_v")))
        lists = self.lists().select(
            "neighbor_id", "cid", "nv", norm(F.col("nv")).alias("_nn")
        )
        near = (
            lists.join(hint(probes), "cid")
            .where(
                dot(F.col("_v"), F.col("nv")) / (F.col("_nq") * F.col("_nn"))
                >= threshold
            )
            .select("vid")
        )
        if within_batch:
            b1 = assign_top1(batch, self.centroids(), id_col, vec_col, "vid2")
            batch_near = (
                probes.join(
                    hint(
                        b1.withColumnRenamed("_v", "bv").withColumn(
                            "_nb", norm(F.col("bv"))
                        )
                    ),
                    "cid",
                )
                .where(
                    (F.col("vid2") < F.col("vid"))
                    & (
                        dot(F.col("_v"), F.col("bv"))
                        / (F.col("_nq") * F.col("_nb"))
                        >= threshold
                    )
                )
                .select("vid")
            )
            near = near.union(batch_near)
        near = near.distinct().withColumn("is_near", F.lit(1))
        return (
            batch.select(F.col(id_col).alias("vec"))
            .join(hint(near.withColumnRenamed("vid", "vec")), "vec", "left")
            .select(
                "vec",
                F.when(F.col("is_near") == 1, "near")
                .otherwise("keep")
                .alias("verdict"),
            )
        )

    def topk_pq(
        self,
        queries: DataFrame,
        k: int,
        cand: int = PQ_CAND,
        nprobe: int = IVF_NPROBE,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """IVF-PQ search — FAISS's production layout (Jegou et al. 2011
        §V + the IVFADC system design), composing the r8 ADC scan with
        the partition-pruned list probe:

        1. queries rank against the stored coarse centroids (broadcast)
           -> nprobe probed lists each;
        2. ONE per-query lookup table: the query's quantized subvectors
           against the FROZEN stored codebooks — m x k partial integer
           dots, |Q|*nprobe*m*k broadcast rows total;
        3. stage-1 scan reads ONLY (neighbor_id, cid, nv_pq) from the
           probed lists — the cid partition column prunes unprobed
           lists' FILES (dynamic partition pruning, plan-tested), and
           the bytes that do move are the 16x-compressed codes, never
           floats (plan-tested column pruning);
        4. ADC: posexplode the m codes, broadcast-join the (probe x LUT)
           rows on (cid, sub, code), fold duplicate batch rows by
           max(pd) per (query, neighbor, sub), sum partials — exact
           integer arithmetic, deterministic candidate set;
        5. exact float cosine re-ranks the top `cand` survivors via a
           (cid, neighbor_id) point join against the stored ``nv`` —
           DPP again: the float column is read only for probed lists.

        Returns (query_id, neighbor_id, rank)."""
        m, width = self._pq_shape()
        books = self.pq_books().withColumnRenamed("cid", "ccid")
        probes = assign_topn(
            queries, self.centroids(), nprobe, id_col, vec_col, "qid"
        ).select("qid", "cid")
        qemb = queries.select(
            F.col(id_col).alias("qid"), quantized(F.col(vec_col)).alias("q")
        )
        qex = qemb.select(
            "qid",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("sub"),
                            F.slice("q", s * width + 1, width).alias("sq"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("x"),
        ).select("qid", F.col("x.sub").alias("sub"), F.col("x.sq").alias("sq"))
        lut = qex.join(F.broadcast(books), "sub").select(
            "qid", "sub", "ccid", qdot(F.col("sq"), F.col("cq")).alias("pd")
        )
        probe_lut = probes.join(lut, "qid")  # |Q|*nprobe*m*k rows — tiny
        codes = self.lists().select(
            "neighbor_id", "cid", F.posexplode("nv_pq").alias("sub", "code")
        )
        scored = (
            codes.join(
                F.broadcast(probe_lut),
                (codes["cid"] == probe_lut["cid"])
                & (codes["sub"] == probe_lut["sub"])
                & (codes["code"] == probe_lut["ccid"])
                & (codes["neighbor_id"] != probe_lut["qid"]),
            )
            .select("qid", "neighbor_id", codes["cid"], codes["sub"], "pd")
            # fold a compaction-window duplicate row (same vector visible
            # in two batches: identical codes, identical pd) BEFORE the
            # sum, or it would double-count; the second agg's keys are a
            # prefix of the first's partitioning — no extra exchange
            .groupBy("qid", "neighbor_id", "cid", "sub")
            .agg(F.max("pd").alias("pd"))
            .groupBy("qid", "neighbor_id", "cid")
            .agg(F.sum("pd").alias("a"))
        )
        wc = Window.partitionBy("qid").orderBy(
            F.col("a").desc(), F.col("neighbor_id").asc()
        )
        cands = (
            scored.withColumn("crank", F.row_number().over(wc))
            .where(F.col("crank") <= cand)
            .select(F.col("qid").alias("query_id"), "neighbor_id", "cid")
        )
        qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        nv = self.lists().select("neighbor_id", "cid", "nv")
        rer = (
            nv.join(F.broadcast(cands), ["cid", "neighbor_id"])
            .join(F.broadcast(qv), "query_id")
            .select(
                "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("sim")
            )
            .groupBy("query_id", "neighbor_id")
            .agg(F.max("sim").alias("sim"))
        )
        wk = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            rer.withColumn("rank", F.row_number().over(wk))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank")
        )

    def topk_quantized(
        self,
        queries: DataFrame,
        k: int,
        cand: int = INT8_CAND,
        nprobe: int = IVF_NPROBE,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Two-stage ANN from STORAGE (the `quantized_topk` shape over the
        persisted lists): stage 1 scores the probed lists on the STORED
        int8 codes — the scan reads only (neighbor_id, cid, nv_c8, nv_n8),
        Parquet-pruning the float column, so the bytes moved are ~1/4 of
        an IVF-Flat probe — and keeps the top ``cand`` per query; stage 2
        re-ranks only those survivors with the exact float cosine,
        point-joining the stored ``nv`` column. Query codes quantize on
        the fly with the identical convention, so stored and derived codes
        agree bit-for-bit and the candidate set is oracle-reproducible.

        Both stages fold duplicate (query, neighbor) rows before ranking
        (a vector visible in two batches during a compaction crash window
        scores identically; max() is just the fold), like `ivf_probe_topk`.
        """
        # Query codes are computed ONCE per query and joined onto the
        # nprobe probe rows (computing them after assign_topn would run
        # the floor/scale transform nprobe times per query).
        q8 = _with_int8(queries, "query_id", id_col, vec_col)
        probes = (
            assign_topn(queries, self.centroids(), nprobe, id_col, vec_col, "query_id")
            .select("query_id", "cid")
            .join(q8, "query_id")
        )
        codes = self.lists().select(
            "neighbor_id",
            "cid",
            F.transform("nv_c8", lambda x: x.cast("long")).alias("n_c8"),
            "nv_n8",
        )
        scored = (
            codes.join(F.broadcast(probes), "cid")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                "cid",
                (
                    dot8("query_id_c8", "n_c8").cast("double")
                    / (F.col("query_id_n8") * F.col("nv_n8"))
                ).alias("approx"),
            )
            .groupBy("query_id", "neighbor_id")
            .agg(F.max("approx").alias("approx"), F.max("cid").alias("cid"))
        )
        wc = F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("approx").desc(), F.col("neighbor_id").asc()
            )
        )
        cands = (
            scored.withColumn("crank", wc)
            .where(F.col("crank") <= cand)
            .select("query_id", "neighbor_id", "cid")
        )
        qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        # The re-rank joins on (cid, neighbor_id): cid is the lists'
        # PARTITION column, so the broadcast join dynamically prunes the
        # float-column scan to the probed lists — the survivors' point
        # read the docstring promises, not a second full-corpus pass.
        nv = self.lists().select("neighbor_id", "cid", "nv")
        rer = (
            nv.join(F.broadcast(cands), ["cid", "neighbor_id"])
            .join(F.broadcast(qv), "query_id")
            .select(
                "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("sim")
            )
            .groupBy("query_id", "neighbor_id")
            .agg(F.max("sim").alias("sim"))
        )
        wk = F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("sim").desc(), F.col("neighbor_id").asc()
            )
        )
        return (
            rer.withColumn("rank", wk)
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank")
        )
