"""Similarity search over embedding columns (array<float>).

Three ANN paths on the cost/recall dial:
- cosine_topk: brute-force exact top-k — the baseline. Dot products run
  JVM-side via higher-order functions (zip_with + aggregate), queries are
  broadcast, so the corpus is scanned once with no shuffle; the only
  shuffle is the final per-query top-k (tiny). O(|Q|·|C|·d).
- ivf_topk: coarse-quantized inverted lists, nprobe lists per query —
  O(|Q|·nprobe·|C|/K·d); persisted form in `ivf_index.IvfIndex`.
- sign_lsh_topk: sign-bit band LSH — candidates share any band bucket
  (OR over bands = multi-probe), exact rank within candidates;
  O(|Q|·n_bands·|C|/2^n_bits·d).

Determinism: dot products accumulate left-to-right in doubles via
F.aggregate — a fixed association order, reproducible across runs and
partitionings. The oracle compares *ranks* (not raw floats), so engine-
internal float differences of ~1e-7 can't flip the result unless two
similarities tie to within that — not the case for real embeddings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self excluded).

    Returns (query_id, neighbor_id, rank) with rank 1..k, ties broken by
    neighbor_id so output is fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("_nq"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("_nn"),
    )
    # Self-norms staged ONCE PER SIDE below the join (guide §1.2): the
    # projections sit under the join, so each row's sqrt-dot evaluates
    # once per ROW instead of once per PAIR, and the pair condition is a
    # single dot. dot/( _nq * _nn ) is the identical float composition
    # cosine() expands to — bit-identical sims.
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("_nq") * F.col("_nn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


IVF_K = 8  # coarse-quantizer lists
IVF_NPROBE = 2  # lists probed per query


def _cents_row(
    cents: DataFrame, cid_col: str = "cid", vec_col: str = "cv", self_term=None
) -> DataFrame:
    """ONE-row frame holding every centroid as an array of (cid, cv, nc)
    structs, for broadcast into a per-row argmax/rank projection
    (`best_centroid` / `topn_centroids`). `nc` is the centroid's
    PRECOMPUTED self-term (`self_term(cv)` — sqrt-norm for double
    cosine, long self-dot for fixed-point cosine), evaluated once per
    centroid here (k rows) instead of once per (row, centroid) in the
    argmax — with the row's own self-term staged the same way, each
    similarity costs ONE dot product instead of three (guide §1.2 step
    2, per-task work). Collect order is irrelevant: both consumers
    impose a total order over (sim, cid)."""
    nc = (self_term if self_term is not None else norm)(F.col(vec_col))
    return cents.agg(
        F.collect_list(
            F.struct(
                F.col(cid_col).alias("cid"),
                F.col(vec_col).alias("cv"),
                nc.alias("nc"),
            )
        ).alias("_cents")
    )


def fsim_pre(vec: Column, nv: Column, c: Column) -> Column:
    """Double cosine with both self-norms precomputed: numerically
    IDENTICAL to `cosine(vec, cv)` = dot/(norm(vec)*norm(cv)) — nv and
    c['nc'] hold exactly those norm() values, computed once instead of
    per pair."""
    return dot(vec, c["cv"]) / (nv * c["nc"])


def qsim_pre(vec: Column, nv: Column, c: Column) -> Column:
    """Exact-fixed-point cosine with both self-dots precomputed (longs):
    IDENTICAL to `qcosine` — same cast-then-multiply-inside-sqrt."""
    return qdot(vec, c["cv"]) / F.sqrt(
        nv.cast("double") * c["nc"].cast("double")
    )


def _let1(bind: Column, body) -> Column:
    """Let-binding via a single-element transform: `bind` becomes a
    LAMBDA VARIABLE, which Catalyst evaluates exactly once and cannot
    inline into the body's (possibly many) references — the same
    discipline as the audio/tar walks. body: lambda var -> Column."""
    return F.element_at(F.transform(F.array(bind), body), 1)


def best_centroid(vec: Column, nv: Column, sim3) -> Column:
    """argmax over the broadcast `_cents` array as a PURE PROJECTION
    (guide §2.4, remove shuffles outright): the old shape — crossJoin the
    K broadcast centroids, then groupBy(id).max(struct) — re-exchanged
    the whole corpus (vector payload riding the struct) just to undo the
    K-way row multiplication it had itself introduced. Same similarity
    values, same (sim desc, cid asc) tie-break — struct comparison orders
    by (s, neg_cid), and Spark's array_max uses the same NaN-greatest
    ordering as the aggregate max — zero exchange.

    `nv` is the row's self-term expression (see `_cents_row`); it is
    let-bound (`_let1`) so it evaluates once per ROW, not once per
    centroid. sim3: (vec, nv, cent_struct) -> sim.

    Returns struct(s, neg_cid, cid); read fields off it."""
    return _let1(
        nv,
        lambda nvv: F.array_max(
            F.transform(
                F.col("_cents"),
                lambda c: F.struct(
                    sim3(vec, nvv, c).alias("s"),
                    (-c["cid"]).alias("neg_cid"),
                    c["cid"].alias("cid"),
                ),
            )
        ),
    )


def topn_centroids(vec: Column, nv: Column, n: int, sim3) -> Column:
    """The n nearest centroids of the broadcast `_cents` array as a
    sorted array of structs — the projection form of the per-query probe
    ranking (rank<=n window). reverse(array_sort) of struct(s, neg_cid,
    cid) yields exactly the window's (sim desc, cid asc) order, including
    NaN-first (array_sort places NaN greatest-last ascending; reversed =
    first, matching a desc window). Explode the result to recover rows.
    `nv`/`sim3`: see `best_centroid`."""
    return _let1(
        nv,
        lambda nvv: F.slice(
            F.reverse(
                F.array_sort(
                    F.transform(
                        F.col("_cents"),
                        lambda c: F.struct(
                            sim3(vec, nvv, c).alias("s"),
                            (-c["cid"]).alias("neg_cid"),
                            c["cid"].alias("cid"),
                        ),
                    )
                )
            ),
            1,
            n,
        ),
    )


def assign_top1(
    df: DataFrame, cents: DataFrame, id_col: str, vec_col: str, out_id: str
) -> DataFrame:
    """Nearest-centroid assignment as a zero-shuffle projection over the
    broadcast centroid array (see `best_centroid`; previously a
    crossJoin + groupBy(id).max(struct), which exchanged the corpus with
    its vectors once per call)."""
    carr = _cents_row(cents, self_term=norm)
    return df.crossJoin(F.broadcast(carr)).select(
        F.col(id_col).alias(out_id),
        best_centroid(F.col(vec_col), norm(F.col(vec_col)), fsim_pre)["cid"].alias("cid"),
        F.col(vec_col).alias("_v"),
    )


def assign_topn(
    df: DataFrame, cents: DataFrame, n: int, id_col: str, vec_col: str, out_id: str
) -> DataFrame:
    """Query-side probe list as a zero-shuffle sorted-slice projection +
    explode (see `topn_centroids`; previously a row_number window, which
    exchanged the query set)."""
    carr = _cents_row(cents, self_term=norm)
    return (
        df.crossJoin(F.broadcast(carr))
        .select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias("_v"),
            F.explode(
                topn_centroids(F.col(vec_col), norm(F.col(vec_col)), n, fsim_pre)
            ).alias("_t"),
        )
        .select(out_id, F.col("_t.cid").alias("cid"), "_v")
    )


def ivf_probe_topk(probes: DataFrame, inv: DataFrame, k: int) -> DataFrame:
    """Rank the probed inverted-list candidates: exact cosine within the
    lists each query probes. probes: (query_id, cid, qv); inv:
    (neighbor_id, cid, nv). The candidate join is an equi-join on the
    list id — the same bucket-join discipline as the LSH paths.

    The pre-window aggregate folds duplicate (query, neighbor) candidate
    rows (a vector stored in two index batches, or a compaction crash
    window's doubly-visible batch) — a row_number top-k would otherwise
    emit the same neighbor at two ranks. Map-side combine keeps the extra
    exchange cheap; sims for duplicates are identical, max() is just the
    fold."""
    # Per-side self-norms staged below the candidate join (guide §1.2):
    # a stored vector's norm evaluates once per scanned list row, a
    # query's once per probe row, and each candidate pair costs ONE dot.
    # Identical float composition to cosine() — bit-identical sims.
    p2 = probes.withColumn("_nq", norm(F.col("qv")))
    i2 = inv.withColumn("_nn", norm(F.col("nv")))
    scored = (
        p2.join(i2, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("nv")) / (F.col("_nq") * F.col("_nn"))).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into inverted
    lists, probe the nprobe nearest lists per query, exact-rank inside.

    Centroids are the first n_centroids corpus vectors — the k-means init
    step without iterations, chosen because it is deterministic and
    oracle-expressible; `kmeans_centroids` below is the offline trainer
    (swap its output in here), and the plan below is unchanged either way
    (centroids are a broadcast literal). 100 TB shape: assignment =
    broadcast of the K tiny centroids as one array row + a zero-shuffle
    argmax projection (`best_centroid` — the corpus is never exchanged); per-query search cost
    drops from |C| to nprobe·|C|/K. The persisted form of this index —
    build once, append forever, probe storage — is
    `datapipe/ivf_index.IvfIndex`.
    """
    cents = corpus.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    inv = assign_top1(corpus, cents, id_col, vec_col, "neighbor_id").withColumnRenamed(
        "_v", "nv"
    )
    probes = assign_topn(queries, cents, nprobe, id_col, vec_col, "query_id").withColumnRenamed(
        "_v", "qv"
    )
    return ivf_probe_topk(probes, inv, k)


QUANT = 1_000_000  # fixed-point resolution for cross-engine-exact geometry


def quantized(vec: Column) -> Column:
    """float32 components -> exact fixed-point longs (floor(x * 1e6)).

    Every downstream dot product is then exact integer arithmetic (partials
    stay far below 2^53), so cosine values — one double division over exact
    shared inputs — are bit-identical across engines. floor, not round:
    round's half-way rule differs between engines; floor does not.
    """
    return F.transform(vec, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def qdot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def qself(a: Column) -> Column:
    """The fixed-point self-dot (long) — the precomputable half of
    `qcosine`, staged per row/centroid for `qsim_pre`."""
    return qdot(a, a)


def qcosine(a: Column, b: Column) -> Column:
    return qdot(a, b) / F.sqrt(qdot(a, a).cast("double") * qdot(b, b).cast("double"))


def int8_quant_stats(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column, graded via
    integer checksums.

    Storing/shipping float32 embeddings is 4x the bytes a 100 TB ANN
    index needs; the standard fix is per-vector symmetric int8: scale =
    127 / max|x_i|, q_i = floor(x_i * scale) in [-127, 127]. floor (not
    round) keeps the codes bit-identical across engines — half-way rules
    differ, floor does not (same convention as `quantized` above). All
    arithmetic runs in doubles after an exact float32 widening, so every
    engine computes the same codes.

    Output per vector: n_dims plus integer checksums of the code vector
    (sum, |sum|, nonzero count) — robustly hash-comparable where raw
    float arrays are not, and any quantization bug moves at least one of
    them. Zero vectors quantize to all-zero codes (scale floor guard).

    Scale: pure per-row column arithmetic in whole-stage codegen — no
    shuffle, no UDF; the quantized form feeds `qdot`-style integer ANN.
    """
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).cast("long").alias("n_dims"),
        xd.alias("_xd"),
        F.greatest(
            F.array_max(F.transform(xd, lambda x: F.abs(x))), F.lit(1e-30)
        ).alias("_maxabs"),
    )
    q = F.transform(
        F.col("_xd"), lambda x: F.floor(x * (F.lit(127.0) / F.col("_maxabs"))).cast("long")
    )
    zero = F.lit(0).cast("long")
    return staged.select(
        id_col,
        "n_dims",
        F.aggregate(q, zero, lambda a, x: a + x).alias("q_sum"),
        F.aggregate(q, zero, lambda a, x: a + F.abs(x)).alias("q_abs_sum"),
        F.size(F.filter(q, lambda x: x != 0)).cast("long").alias("q_nonzero"),
    )


INT8_CAND = 20  # candidates kept per query by the int8 scan (>> k)


def with_int8_code(df: DataFrame, vec_col: str, prefix: str) -> DataFrame:
    """Append ``<prefix>_c8`` (int8 code vector) and ``<prefix>_n8`` (its
    L2 norm) to ``df``, keeping every existing column — the same
    floor/scale convention as `int8_quant_stats`, so a STORED code column
    (`ivf_index.IvfIndex.append` persists exactly this) and the on-the-fly
    form agree bit-for-bit. The norm is computed once per row here, NOT
    per pair in the scoring join."""
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.withColumns(
        {
            "_xd": xd,
            "_m": F.greatest(
                F.array_max(F.transform(xd, lambda x: F.abs(x))), F.lit(1e-30)
            ),
        }
    )
    codes = F.transform(
        F.col("_xd"), lambda x: F.floor(x * (F.lit(127.0) / F.col("_m"))).cast("long")
    )
    staged = staged.withColumn(f"{prefix}_c8", codes).drop("_xd", "_m")
    zero = F.lit(0).cast("long")
    n8 = F.sqrt(
        F.aggregate(
            F.zip_with(f"{prefix}_c8", f"{prefix}_c8", lambda x, y: x * y),
            zero,
            lambda a, x: a + x,
        ).cast("double")
    )
    return staged.withColumn(f"{prefix}_n8", n8)


def dot8(a_col: str, b_col: str) -> Column:
    """Exact integer dot product of two long code vectors (partials stay
    far below 2^53 for int8 codes at any realistic dimensionality)."""
    return F.aggregate(
        F.zip_with(a_col, b_col, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _with_int8(df: DataFrame, out_id: str, id_col: str, vec_col: str) -> DataFrame:
    """Project (id, int8 code vector, int8 L2 norm) for one side of the
    quantized candidate scan."""
    return with_int8_code(
        df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("_vec")),
        "_vec",
        out_id,
    ).drop("_vec")


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    cand: int = INT8_CAND,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: int8 candidate scan + exact re-rank — the production
    recipe `int8_quant_stats` exists for. Stage 1 scores the WHOLE corpus
    per query on int8 codes (4x fewer bytes than float32 — at 100 TB the
    scan is storage-bandwidth-bound, so the code column IS the speedup)
    and keeps the top ``cand`` per query; stage 2 re-ranks only those
    candidates with the exact float cosine.

    Candidate scoring is exact integer arithmetic (code dot products stay
    below 2^53) with one double division — bit-identical across engines,
    so the candidate SET itself is deterministic and the oracle can
    replicate it. Only code vectors cross the stage-1 shuffle; float
    embeddings are joined back for the ``|Q|·cand`` survivors only.

    Returns (query_id, neighbor_id, rank) like `cosine_topk`.
    """
    q = _with_int8(queries, "query_id", id_col, vec_col)
    c = _with_int8(corpus, "neighbor_id", id_col, vec_col)
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (
            dot8("query_id_c8", "neighbor_id_c8").cast("double")
            / (F.col("query_id_n8") * F.col("neighbor_id_n8"))
        ).alias("approx"),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    cands = (
        scored.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= cand)
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    rer = (
        cv.join(F.broadcast(cands), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means over the embedding corpus — the offline centroid
    trainer for the IVF index (ivf_topk's docstring promises one; this is
    it). Deterministic init (first k vectors), fixed iteration count.

    Returns (cid, n_members, centroid: array<double>) for the final
    assignment; a cluster that loses all members drops out (standard
    empty-cluster behavior, deterministic here).

    Cross-engine exactness: all geometry runs on fixed-point longs
    (quantized components, exact integer dots, centroid components
    floor(sum/count)), so an unrolled SQL formulation reproduces every
    assignment and centroid bit-for-bit — no float-accumulation drift.

    Scale shape per iteration: one broadcast of the k tiny centroids
    (as one array row) against the corpus scan, argmax as a ZERO-shuffle
    projection (`best_centroid`), then ONE hash aggregation computing all
    `dim` component sums together (map-side combined, k output rows).
    The corpus is never exchanged at all — the only shuffle per
    iteration carries k combined rows. Iteration count is a constant
    (2-10), so the lineage stays shallow; a production trainer runs this
    on a sample anyway.
    """
    emb = corpus.select(F.col(id_col).alias("vid"), quantized(F.col(vec_col)).alias("q"))
    cents = emb.where(F.col("vid") < k).select(F.col("vid").alias("cid"), F.col("q").alias("cq"))
    sums = None
    for _ in range(iters):
        # assignment = zero-shuffle argmax projection (best_centroid);
        # the only exchange per iteration is the k-row component-sum
        # aggregate below, map-side combined.
        carr = _cents_row(cents, "cid", "cq", self_term=qself)
        best = emb.crossJoin(F.broadcast(carr)).select(
            best_centroid(F.col("q"), qself(F.col("q")), qsim_pre)["cid"].alias("cid"), "q"
        )
        sums = best.groupBy("cid").agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dim)],
        )
        cents = sums.select(
            "cid",
            F.array(
                *[F.floor(F.col(f"s{i}") / F.col("n")).cast("long") for i in range(dim)]
            ).alias("cq"),
        )
    return sums.select(
        "cid",
        F.col("n").cast("long").alias("n_members"),
        F.array(
            *[(F.floor(F.col(f"s{i}") / F.col("n")) / F.lit(float(QUANT))) for i in range(dim)]
        ).alias("centroid"),
        # the same centroids in fixed-point (the internal geometry), so
        # consumers that compare against quantized corpora (semantic_dedup
        # trained mode) stay bit-exact without a lossy double round-trip
        F.array(
            *[F.floor(F.col(f"s{i}") / F.col("n")).cast("long") for i in range(dim)]
        ).alias("cq"),
    )


def cluster_assignments(
    corpus: DataFrame, k: int = IVF_K, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid assignment of every vector (deterministic first-k
    init — the c0 step of `kmeans_centroids`; swap trained centroids in
    without changing the plan). Returns (id, cid).

    Exact fixed-point geometry (quantized/qcosine) so assignments are
    bit-identical across engines. Scale shape: broadcast of the k tiny
    centroids (one array row) against one corpus scan, argmax as a
    zero-shuffle projection (`best_centroid`) — the corpus is never
    exchanged.
    """
    emb = corpus.select(F.col(id_col), quantized(F.col(vec_col)).alias("q"))
    cents = emb.where(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"), F.col("q").alias("cq")
    )
    carr = _cents_row(cents, "cid", "cq", self_term=qself)
    return emb.crossJoin(F.broadcast(carr)).select(
        id_col, best_centroid(F.col("q"), qself(F.col("q")), qsim_pre)["cid"].alias("cid")
    )


SEMDEDUP_MIN_K = 8  # floor for the adaptive cluster count
SEMDEDUP_RATIO = 250  # adaptive k = max(MIN_K, n // RATIO) -> cost O(RATIO * n)


def band_clusters(
    m: DataFrame, cap: int, cluster_col: str = "cid", order_col: str = "vec_id"
) -> DataFrame:
    """HOT-CLUSTER GUARD for the cluster-scoped pair family — the k-means
    counterpart of `dedup.drop_hot_buckets` (r6 verdict task 6): adds a
    ``sub`` band column splitting every cluster into contiguous
    id-ordered bands of AT MOST `cap` members (row_number banding — an
    exact bound, unlike a hash mod, which can collide arbitrarily). Pair
    formation then keys on (cluster, sub), so one pathological cluster
    costs O(|cluster| * cap) instead of O(|cluster|^2) — the explicit
    ceiling AQE's skew handling only approximates. Deterministic (the
    order column is a unique id) and window-expressible, so oracles
    replay the exact same banding. The documented trade: pairs that
    straddle a band are not compared — same recall contract as the LSH
    paths' bucket cap."""
    w = Window.partitionBy(cluster_col).orderBy(order_col)
    return m.withColumn(
        "sub",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(cap)).cast("long"),
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float,
    k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    cluster_cap: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup.

    The published recipe for de-duplicating web-scale corpora by MEANING
    rather than text overlap: k-means the embeddings, then compare pairs
    only WITHIN each cluster — semantically-duplicate pairs land in the
    same cluster, so the all-pairs O(n^2) never runs. Of each similar
    pair the paper KEEPS the member with the LOWER centroid similarity
    (edge examples preserve diversity; the near-centroid copy is the
    redundant one). Verdict per vector: drop iff some same-cluster
    neighbor with cosine >= threshold is further from the centroid (tie
    on centroid similarity -> the smaller id is kept).

    All geometry is exact fixed-point (`quantized`/`qcosine`): integer
    dot products plus one double division, so assignments, pair
    similarities, and the centroid-sim comparisons are bit-identical
    across engines and the DuckDB oracle reproduces the verdicts.

    Scale shape: one broadcast-k zero-shuffle assignment projection
    (`best_centroid`), then ONE shuffle by cid for the within-cluster self-join —
    O(sum |cluster|^2) comparisons, which is n^2/k for balanced clusters;
    the paper's guard is k itself (scale k with the corpus — 50k clusters
    for LAION — and the per-cluster work stays bounded). With k=None
    (default) that guidance is built in: k = max(8, n // SEMDEDUP_RATIO)
    computed IN-PLAN (a 1-row count broadcast, no driver action), making
    the pair cost O(SEMDEDUP_RATIO * n) — linear — at any corpus size.
    `cluster_cap` adds the EXPLICIT guard for a pathological hot cluster
    (otherwise AQE skew-join territory): members band into id-ordered
    groups of at most `cluster_cap` via :func:`band_clusters` and pairs
    form within a band only, bounding any one cluster's cost at
    O(|cluster| * cap) — with the documented recall trade that
    band-straddling pairs go uncompared.

    `centroids` (cid, cq: array<long> fixed-point) swaps TRAINED cluster
    centers in for the first-k init without touching the plan — cluster
    quality is what determines SemDeDup's recall, so production runs pass
    `kmeans_centroids(...)` output here (its `cq` column is this exact
    encoding). `k` is ignored when centroids are given.

    Returns (id, cid, verdict) with verdict in {'keep', 'drop'}.
    """
    emb = corpus.select(F.col(id_col), quantized(F.col(vec_col)).alias("q"))
    if centroids is not None:
        cents = centroids.select("cid", "cq")
    elif k is None:
        k_col = F.greatest(
            F.lit(SEMDEDUP_MIN_K), F.floor(F.col("_n") / SEMDEDUP_RATIO)
        )
        cents = (
            emb.crossJoin(F.broadcast(emb.agg(F.count("*").alias("_n"))))
            .where(F.col(id_col) < k_col)
            .select(F.col(id_col).alias("cid"), F.col("q").alias("cq"))
        )
    else:
        cents = emb.where(F.col(id_col) < k).select(
            F.col(id_col).alias("cid"), F.col("q").alias("cq")
        )
    # Assignment = zero-shuffle argmax projection over the broadcast
    # centroid array (best_centroid); the cluster-scoped pair join below
    # is then the ONLY shuffle. Per-member self-norm precomputed ONCE
    # (|members| dot products), so the pair condition below runs a single
    # qdot per candidate pair instead of three — identical arithmetic to
    # qcosine (exact long dots, double casts before the product).
    carr = _cents_row(cents, "cid", "cq", self_term=qself)
    # Materialize the argmax STRUCT, then extract fields: two field
    # reads off a plain alias inline (re-evaluate) the interpreted
    # argmax per field via CollapseProject, and a Generate barrier was
    # measured far slower (HOF generator drops the stage out of
    # codegen). Checkpointing at the struct level evaluates the argmax
    # exactly ONCE per row, and the post-checkpoint field reads are
    # free physical-column accesses. The checkpoint also materializes
    # the assignment for the pair self-join below: the zero-shuffle
    # argmax leaves no Exchange for the planner to share between the
    # two join sides, so an un-checkpointed plan would run the full
    # interpreted assignment once PER SIDE.
    m = emb.crossJoin(F.broadcast(carr)).select(
        id_col, "q", best_centroid(F.col("q"), qself(F.col("q")), qsim_pre).alias("_b")
    )
    if not m.isStreaming:
        m = m.localCheckpoint(eager=True)
    m = m.select(
        id_col,
        F.col("_b.cid").alias("cid"),
        F.col("_b.s").alias("cs"),
        "q",
    ).withColumn("nq", qdot(F.col("q"), F.col("q")).cast("double"))
    if cluster_cap is not None:
        m = band_clusters(m, cluster_cap, "cid", id_col)
        # the banding window would otherwise re-run once per join side
        if not m.isStreaming:
            m = m.localCheckpoint(eager=True)
    x = m.select(
        F.col(id_col).alias("ia"),
        F.col("cid").alias("cida"),
        F.col("cs").alias("csa"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
        *([F.col("sub").alias("suba")] if cluster_cap is not None else []),
    )
    y = m.select(
        F.col(id_col).alias("ib"),
        "cid",
        F.col("cs").alias("csb"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
        *(["sub"] if cluster_cap is not None else []),
    )
    # One right-outer cluster self-join carries the whole keep rule, so the
    # assignment subtree is evaluated exactly twice (the two join sides) —
    # never a third verdict pass. A member v DROPS iff some same-cluster
    # u with cosine >= threshold sits further from the centroid (or ties
    # with a smaller id): u's survival makes the more-central v the
    # redundant copy. Pairwise-equivalent to "drop the higher-centroid-sim
    # member of each similar pair", which is the oracle's CASE.
    beats = (
        (F.col("cida") == F.col("cid"))
        & (F.col("ia") != F.col("ib"))
        & (qdot(F.col("qa"), F.col("qb")) / F.sqrt(F.col("na") * F.col("nb")) >= threshold)
        & (
            (F.col("csa") < F.col("csb"))
            | ((F.col("csa") == F.col("csb")) & (F.col("ia") < F.col("ib")))
        )
    )
    if cluster_cap is not None:
        beats = (F.col("suba") == F.col("sub")) & beats
    return (
        x.join(y, beats, "right_outer")
        .groupBy("ib", "cid")
        .agg(F.max(F.col("ia").isNotNull().cast("int")).alias("_l"))
        .select(
            F.col("ib").alias(id_col),
            "cid",
            F.when(F.col("_l") == 1, F.lit("drop")).otherwise(F.lit("keep")).alias("verdict"),
        )
    )


KNN_NOISE_K = 10  # neighbors voting on each vector's label


def knn_label_noise(
    corpus: DataFrame,
    k_clusters: int = 8,
    k_neighbors: int = KNN_NOISE_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    cluster_cap: int | None = None,
) -> DataFrame:
    """Cluster-scoped kNN label-noise detection — mislabeled-sample mining
    for a labeled training corpus (the confident-learning family of
    curation checks): each vector's `k_neighbors` nearest same-cluster
    neighbors vote on its label; a majority disagreeing with the stored
    label flags the sample as probable noise.

    Scale shape is SemDeDup's: one broadcast-k zero-shuffle assignment
    projection, ONE shuffle by cid for the within-cluster neighbor join (O(n^2/k) pairs,
    never all-pairs), then one window rank per vector; `cluster_cap`
    bounds a pathological hot cluster via :func:`band_clusters` (votes
    then come from the vector's own id-band — the same recall trade as
    semantic_dedup's cap). Exact fixed-point
    geometry (`quantized`/`qdot`) keeps every similarity, rank, and vote
    bit-identical across engines, so the DuckDB oracle reproduces every
    verdict. Tie-breaks are total orders: neighbor rank (sim DESC, id
    ASC), vote winner (count DESC, label ASC).

    Returns (id, label, voted_label, is_noise: int).
    """
    from pyspark.sql import Window

    emb = corpus.select(
        F.col(id_col), F.col(label_col), quantized(F.col(vec_col)).alias("q")
    )
    cents = emb.where(F.col(id_col) < k_clusters).select(
        F.col(id_col).alias("cid"), F.col("q").alias("cq")
    )
    carr = _cents_row(cents, "cid", "cq", self_term=qself)
    m = (
        emb.crossJoin(F.broadcast(carr))
        .select(
            id_col,
            best_centroid(F.col("q"), qself(F.col("q")), qsim_pre)["cid"].alias("cid"),
            "q",
            F.col(label_col).alias("lbl"),
        )
        .withColumn("nq", qdot(F.col("q"), F.col("q")).cast("double"))
    )
    if cluster_cap is not None:
        m = band_clusters(m, cluster_cap, "cid", id_col)
    # Materialize the assignment once — same reasoning as semantic_dedup:
    # the zero-shuffle argmax leaves no Exchange for the planner to share
    # between the two pair-join sides, so an un-checkpointed m would run
    # the interpreted assignment once per side.
    if not m.isStreaming:
        m = m.localCheckpoint(eager=True)
    x = m.select(
        F.col(id_col).alias("ia"), F.col("cid").alias("cida"),
        F.col("q").alias("qa"), F.col("nq").alias("na"), F.col("lbl").alias("la"),
        *([F.col("sub").alias("suba")] if cluster_cap is not None else []),
    )
    y = m.select(
        F.col(id_col).alias("ib"), "cid",
        F.col("q").alias("qb"), F.col("nq").alias("nb"), F.col("lbl").alias("lb"),
        *(["sub"] if cluster_cap is not None else []),
    )
    cond = (F.col("cida") == F.col("cid")) & (F.col("ia") != F.col("ib"))
    if cluster_cap is not None:
        cond = (F.col("suba") == F.col("sub")) & cond
    pairs = x.join(y, cond).select(
        "ia", "la", "ib", "lb",
        (qdot(F.col("qa"), F.col("qb")) / F.sqrt(F.col("na") * F.col("nb"))).alias("sim"),
    )
    w_rank = Window.partitionBy("ia").orderBy(F.col("sim").desc(), F.col("ib").asc())
    nearest = pairs.withColumn("rk", F.row_number().over(w_rank)).where(
        F.col("rk") <= k_neighbors
    )
    votes = nearest.groupBy("ia", "la", "lb").agg(F.count("*").alias("n_votes"))
    w_win = Window.partitionBy("ia").orderBy(F.col("n_votes").desc(), F.col("lb").asc())
    winner = votes.withColumn("vr", F.row_number().over(w_win)).where(F.col("vr") == 1)
    return winner.select(
        F.col("ia").alias(id_col),
        F.col("la").alias(label_col),
        F.col("lb").alias("voted_label"),
        (F.col("lb") != F.col("la")).cast("int").alias("is_noise"),
    )


OUTLIER_TAIL_PCT = 5  # bottom percent of centroid similarity flagged per cluster


def embedding_outliers(
    corpus: DataFrame,
    k_clusters: int = 8,
    tail_pct: int = OUTLIER_TAIL_PCT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-tail outlier mining: vectors in the bottom `tail_pct`% of
    centroid similarity WITHIN their cluster are flagged as probable
    out-of-distribution samples (mislabeled modality, garbage encodes,
    adversarial inserts) — the embedding-space cousin of text quality
    scoring, used to quarantine the weird tail before training.

    Rank-based by design: the verdict depends only on each vector's RANK
    of (exact fixed-point) centroid similarity inside its cluster, never
    on float aggregates like mean/std whose accumulation order differs
    between engines — so the oracle reproduces every flag bit-for-bit.
    Tail size = ceil(tail_pct% of cluster size), ties broken by id.

    Scale shape: one broadcast-k zero-shuffle assignment projection
    (`best_centroid`), one cid-partitioned window over n rows. No pairwise work at
    all — this is the cheapest of the embedding curation passes.

    Returns (id, cid, sim_rank, cluster_n, is_outlier: int).
    """
    from pyspark.sql import Window

    emb = corpus.select(F.col(id_col), quantized(F.col(vec_col)).alias("q"))
    cents = emb.where(F.col(id_col) < k_clusters).select(
        F.col(id_col).alias("cid"), F.col("q").alias("cq")
    )
    carr = _cents_row(cents, "cid", "cq", self_term=qself)
    m = (
        emb.crossJoin(F.broadcast(carr))
        # (The two field reads inline the argmax twice; a Generate
        # barrier was measured 7x SLOWER than the double eval — the
        # HOF generator drops the stage out of codegen — so the double
        # eval stays; k is small and the argmax is cheap next to it.)
        .select(id_col, best_centroid(F.col("q"), qself(F.col("q")), qsim_pre).alias("_b"))
        .select(id_col, F.col("_b.cid").alias("cid"), F.col("_b.s").alias("cs"))
    )
    w_rank = Window.partitionBy("cid").orderBy(F.col("cs").asc(), F.col(id_col).asc())
    w_all = Window.partitionBy("cid")
    return (
        m.withColumn("sim_rank", F.row_number().over(w_rank).cast("long"))
        .withColumn("cluster_n", F.count("*").over(w_all).cast("long"))
        .select(
            id_col, "cid", "sim_rank", "cluster_n",
            (
                F.col("sim_rank") <= F.ceil(F.col("cluster_n") * tail_pct / 100.0)
            ).cast("int").alias("is_outlier"),
        )
    )


SIGN_BITS = 6  # bucket bits per band -> 2^6 buckets per band
SIGN_BANDS = 4  # OR over 4 disjoint coordinate slices


def sign_lsh_bands(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = SIGN_BITS,
    n_bands: int = SIGN_BANDS,
) -> DataFrame:
    """(vid, band_id, bucket) rows: band b's bucket is the integer formed by
    the sign bits of coordinates [b*n_bits, (b+1)*n_bits).

    Coordinate-sign bucketing IS random-hyperplane LSH with axis-aligned
    planes — for cosine similarity, P(sign agrees) = 1 - angle/pi per
    coordinate, so same-bucket probability rises steeply with similarity.
    Two deliberate properties for the engine:
    - the bucket involves NO floating arithmetic (raw stored-float sign
      compare), so any engine computes bit-identical buckets — an oracle
      can grade it, where a hyperplane dot-product's sign could flip on
      ~1e-16 rounding differences;
    - the explode is map-side (n_bands small rows per vector) and the
      candidate join keys on (band_id, bucket) — per-bucket work only,
      never an all-pairs comparison.
    Recall/cost dial: more bits per band = smaller buckets = cheaper and
    lower recall; more bands = higher recall, linearly more candidates.
    """
    bands = []
    for b in range(n_bands):
        bits = [
            F.when(F.element_at(F.col(vec_col), b * n_bits + k + 1) >= 0, F.lit(1 << k))
            .otherwise(F.lit(0))
            for k in range(n_bits)
        ]
        bucket = bits[0]
        for x in bits[1:]:
            bucket = bucket + x
        bands.append(F.struct(F.lit(b).alias("band_id"), bucket.alias("bucket")))
    return df.select(F.col(id_col).alias("vid"), F.explode(F.array(*bands)).alias("b")).select(
        "vid", F.col("b.band_id").alias("band_id"), F.col("b.bucket").alias("bucket")
    )


SIGN_BUCKET_CAP = 12  # graded capped-variant cut; production would run O(100s)


def sign_lsh_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = SIGN_BITS,
    n_bands: int = SIGN_BANDS,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs at scale: LSH candidates, exact verify.

    candidates = pairs sharing any band bucket (shuffle keyed by
    (band_id, bucket)); verify = exact double cosine on candidates only.
    Cost is sum over buckets of |bucket|² instead of n² — the classic
    LSH-then-verify layout (same shape as dedup.lsh_candidate_pairs for
    MinHash). ``bucket_cap`` drops buckets larger than the cap before the
    self-join (`dedup.drop_hot_buckets` — a near-constant embedding region
    saturating one bucket would cost O(|bucket|²); members still pair via
    their other bands); ``None`` keeps exact uncapped semantics. Returns
    (ia, ib, sim_q) with sim quantized to 1e-4 so the value is
    hash-comparable across engines.
    """
    from .dedup import drop_hot_buckets

    bands = sign_lsh_bands(emb, id_col, vec_col, n_bits, n_bands)
    if bucket_cap is not None:
        bands = drop_hot_buckets(bands, ["band_id", "bucket"], bucket_cap)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("ia"), F.col("b.vid").alias("ib"))
        .distinct()
    )
    # Per-side self-norms staged below the verify join (guide §1.2): one
    # sqrt-dot per corpus row per side instead of per candidate pair;
    # dot/(na*nb) is the exact float composition cosine() expands to.
    va = emb.select(
        F.col(id_col).alias("ia"), F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("_na"),
    )
    vb = emb.select(
        F.col(id_col).alias("ib"), F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    return (
        cand.join(va, "ia")
        .join(vb, "ib")
        .select(
            "ia", "ib",
            (dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
        .select("ia", "ib", F.floor(F.col("sim") * 10000).cast("long").alias("sim_q"))
    )


def sign_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = SIGN_BITS,
    n_bands: int = SIGN_BANDS,
) -> DataFrame:
    """Approximate top-k via sign-bit band LSH: candidates = corpus
    vectors sharing ANY band bucket with the query (OR over n_bands
    probes — banding IS the multi-probe), exact cosine rank within the
    candidate set.

    The third point on the ANN cost/recall dial: brute force (cosine_topk,
    exact), IVF (ivf_topk, nprobe lists), sign-LSH (this — recall rises
    with n_bands, cost per query ≈ n_bands·|C|/2^n_bits). Buckets are raw
    float sign compares (sign_lsh_bands), so an oracle reproduces them
    bit-identically — the reason this variant is gradeable where
    hyperplane-dot bucketing is not. The candidate join keys on
    (band_id, bucket); the distinct() IS required here (a pair sharing
    two bands would otherwise rank twice), bounded by candidates, never
    the corpus.
    """
    qb = sign_lsh_bands(queries, id_col, vec_col, n_bits, n_bands).select(
        F.col("vid").alias("query_id"), "band_id", "bucket"
    )
    cb = sign_lsh_bands(corpus, id_col, vec_col, n_bits, n_bands).select(
        F.col("vid").alias("neighbor_id"), "band_id", "bucket"
    )
    cand = (
        qb.join(cb, ["band_id", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("_nq"),
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        norm(F.col(vec_col)).alias("_nn"),
    )
    # Self-norms once per row per side (guide §1.2) — one dot per
    # candidate pair, bit-identical sims (same composition as cosine()).
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("nv")) / (F.col("_nq") * F.col("_nn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EMBEDDING-SPACE benchmark decontamination — the semantic companion
    of `curation.decontaminate` (n-gram overlap): a corpus item whose
    embedding sits within `threshold` cosine of ANY held-out benchmark
    item is flagged as probable eval leakage even when the wording
    differs (paraphrased benchmark questions are the documented failure
    mode of string-overlap decontamination — see the GPT-3/PaLM
    contamination appendices).

    Scale shape: benchmarks are tiny (≪1 GB) — the benchmark side
    broadcasts as one array row, the corpus scans ONCE, and the per-item
    max similarity is a pure array_max projection — the corpus is never
    shuffled at all. Exact fixed-point geometry (`quantized`/`qcosine`)
    keeps every similarity bit-identical across engines.

    Returns (id, max_bench_sim, contaminated: int)."""
    c = corpus.select(F.col(id_col), quantized(F.col(vec_col)).alias("q"))
    # All benchmark vectors in ONE broadcast array row; the per-item max
    # similarity is then a pure projection (array_max shares the
    # aggregate max's NaN-greatest ordering) — the corpus is never
    # exchanged at all, not even as combined rows.
    barr = benchmark.agg(
        F.collect_list(quantized(F.col(vec_col))).alias("_bench")
    )
    sim = F.array_max(
        F.transform(F.col("_bench"), lambda bq: qcosine(F.col("q"), bq))
    )
    return c.crossJoin(F.broadcast(barr)).select(
        id_col,
        sim.alias("max_bench_sim"),
        (sim >= threshold).cast("int").alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011, "Product Quantization for
# Nearest Neighbor Search" — the canonical compressed-domain ANN method)
# ---------------------------------------------------------------------------
PQ_SUBS = 4  # subspaces (dim 64 -> 16-dim subvectors)
PQ_K = 8  # codewords per subspace
PQ_ITERS = 2  # Lloyd iterations per subspace (fixed, like kmeans_centroids)
PQ_CAND = 20  # ADC candidates kept per query before the exact re-rank


def _lloyd_q(emb: DataFrame, k: int, iters: int, dim: int) -> DataFrame:
    """Fixed-point Lloyd over a pre-quantized (vid, q) frame — the inner
    loop of `kmeans_centroids`, reusable per PQ subspace. Deterministic
    first-k init, cosine assignment with lowest-cid tie-break, floor'd
    integer centroid means. Returns (cid, cq)."""
    cents = emb.where(F.col("vid") < k).select(
        F.col("vid").alias("cid"), F.col("q").alias("cq")
    )
    for _ in range(iters):
        carr = _cents_row(cents, "cid", "cq", self_term=qself)
        best = emb.crossJoin(F.broadcast(carr)).select(
            best_centroid(F.col("q"), qself(F.col("q")), qsim_pre)["cid"].alias("cid"), "q"
        )
        sums = best.groupBy("cid").agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dim)],
        )
        cents = sums.select(
            "cid",
            F.array(
                *[F.floor(F.col(f"s{i}") / F.col("n")).cast("long") for i in range(dim)]
            ).alias("cq"),
        )
    return cents


def pq_codebooks(
    corpus: DataFrame,
    m: int = PQ_SUBS,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace PQ codebooks: the embedding splits into `m`
    (dim/m)-wide subvectors and each subspace trains its own fixed-point
    Lloyd codebook of `k` codewords — m independent tiny trainers, each
    the exact `kmeans_centroids` loop. Returns (sub, cid, cq)."""
    width = dim // m
    books = None
    for s in range(m):
        emb = corpus.select(
            F.col(id_col).alias("vid"),
            F.slice(quantized(F.col(vec_col)), s * width + 1, width).alias("q"),
        )
        b = _lloyd_q(emb, k, iters, width).select(
            F.lit(s).alias("sub"), "cid", "cq"
        )
        books = b if books is None else books.unionByName(b)
    return books


def pq_encode(
    corpus: DataFrame,
    books: DataFrame,
    m: int = PQ_SUBS,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes in exploded form (vid, sub, cid): per subspace, the
    nearest codeword under the SAME fixed-point cosine + lowest-cid
    tie-break as the trainer. m longs per vector — the 16x-compressed
    representation the ADC scan reads instead of float32 embeddings."""
    width = dim // m
    emb = corpus.select(
        F.col(id_col).alias("vid"), quantized(F.col(vec_col)).alias("q")
    )
    ex = emb.select(
        "vid",
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
    ).select("vid", F.col("x.sub").alias("sub"), F.col("x.sq").alias("sq"))
    # Per-subspace codebooks grouped into one array row per sub (m tiny
    # rows, broadcast); the nearest-codeword pick is then the zero-shuffle
    # argmax projection (best_centroid) instead of a groupBy(vid, sub)
    # exchange of every exploded subvector.
    barr = books.groupBy("sub").agg(
        F.collect_list(
            F.struct(
                F.col("cid").alias("cid"),
                F.col("cq").alias("cv"),
                qself(F.col("cq")).alias("nc"),
            )
        ).alias("_cents")
    )
    return ex.join(F.broadcast(barr), "sub").select(
        "vid", "sub",
        best_centroid(F.col("sq"), qself(F.col("sq")), qsim_pre)["cid"].alias("cid"),
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    m: int = PQ_SUBS,
    cand: int = PQ_CAND,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN with ASYMMETRIC DISTANCE COMPUTATION + exact re-rank:

    1. train per-subspace codebooks, encode the corpus to m longs/vector;
    2. per query, ONE tiny lookup table (m x k partial integer dots of
       the query subvector against every codeword — sums of subspace
       dots equal the dot against the reconstructed vector, the IP-ADC
       identity);
    3. the candidate scan touches ONLY the code column: broadcast-join
       codes to the LUT on (sub, cid) and sum m partials per (query,
       vector) — O(n*m) adds per query instead of O(n*dim) multiplies,
       over a 16x smaller scan: the published PQ trade;
    4. exact float cosine re-ranks the top `cand` survivors per query
       (same discipline as `quantized_topk`).

    Everything before the re-rank is exact integer arithmetic with
    deterministic tie-breaks, so the candidate set — not just the final
    ranks — is engine-reproducible and oracle-replayable.
    Returns (query_id, neighbor_id, rank)."""
    width = dim // m
    books = pq_codebooks(corpus, m, PQ_K, PQ_ITERS, dim, id_col, vec_col)
    books = books.localCheckpoint(eager=True)  # 2 Lloyd iters x m subspaces
    codes = pq_encode(corpus, books, m, dim, id_col, vec_col)
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
        "qid", "sub", "cid", qdot(F.col("sq"), F.col("cq")).alias("pd")
    )
    approx = (
        codes.join(F.broadcast(lut), ["sub", "cid"])
        .where(F.col("vid") != F.col("qid"))
        .groupBy("qid", "vid")
        .agg(F.sum("pd").alias("a"))
    )
    wc = Window.partitionBy("qid").orderBy(F.col("a").desc(), F.col("vid").asc())
    cands = (
        approx.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= cand)
        .select(F.col("qid").alias("query_id"), F.col("vid").alias("neighbor_id"))
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    rer = (
        cv.join(F.broadcast(cands), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


#: truncation prefixes evaluated by matryoshka_recall (the full dim is
#: the reference ranking, not an output row)
MATRYOSHKA_DIMS = (32, 16)


def overlap_recall(
    truth: DataFrame,
    cand: DataFrame,
    queries: DataFrame,
    k: int,
    extra_cols: list = (),
) -> DataFrame:
    """Per-query top-k overlap recall, shared by every retrieval
    evaluation (matryoshka_recall, ann_recall_eval): |truth ∩ cand| per
    query over (query_id, neighbor_id) pair sets, with zero-overlap
    queries kept via a left join back to the query list. One rounding
    convention lives here — integer percent, truncating div — so the
    evaluations can never drift from each other."""
    hits = (
        truth.join(cand, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return queries.join(hits, "query_id", "left").select(
        "query_id",
        *extra_cols,
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        F.expr(f"coalesce(n_overlap, 0) * 100 div {k}").cast("long")
        .alias("recall_pct"),
    )


def matryoshka_recall(
    emb: DataFrame,
    k: int,
    query_max: int,
    dims: tuple[int, ...] = MATRYOSHKA_DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka truncation evaluation (Kusupati et al. 2022): how much
    of the FULL-dimension top-k survives when the index stores only the
    first d dimensions — the retrieval-quality-vs-storage curve that
    decides a truncation. For each query and each prefix length d:
    n_overlap = |topk_full ∩ topk_d|, recall_pct = overlap*100 div k.

    Scale: ONE brute-force cross join scores every prefix length in a
    single pass over each (query, corpus-vector) pair, as SIBLING
    COLUMNS on one row — never as exploded rows, so the rank exchange
    carries O(pairs) rows, not O(dims·pairs). All per-dim rankings are
    row_number windows over the SAME partition key (query_id): Catalyst
    plans one Exchange and a per-dim in-partition Sort+Window chain on
    top of it. Overlap then needs NO self-join at all — a pair is a hit
    for dim d iff rank_full<=k AND rank_d<=k, so the k full-dim
    survivors per query fold into a conditional-sum aggregate and an
    in-plan unpivot emits one row per (query, dim). Ranks (not raw
    floats) cross the engine boundary, the float-rounding-proof oracle
    discipline of the ANN family. The plan stays side-effect free:
    building it runs no Spark jobs."""
    queries = emb.where(F.col(id_col) < query_max)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("sim_full"),
        *[
            cosine(
                F.slice(F.col("qv"), 1, d), F.slice(F.col("cv"), 1, d)
            ).alias(f"sim_{d}")
            for d in dims
        ],
    )

    def rank_over(sim: str) -> Column:
        return F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col(sim).desc(), F.col("neighbor_id").asc()
            )
        )

    ranked = scored.select(
        "query_id",
        rank_over("sim_full").alias("rank_full"),
        *[rank_over(f"sim_{d}").alias(f"rank_{d}") for d in dims],
    )
    # Only full-dim top-k rows can contribute to any overlap count.
    agg = (
        ranked.where(F.col("rank_full") <= k)
        .groupBy("query_id")
        .agg(
            *[
                F.sum((F.col(f"rank_{d}") <= k).cast("long"))
                .cast("long")
                .alias(f"ov_{d}")
                for d in dims
            ]
        )
    )
    per_dim = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(d)).cast("long").alias("dim"),
                    F.col(f"ov_{d}").alias("n_overlap"),
                )
                for d in dims
            ]
        )
    )
    return agg.select("query_id", per_dim.alias("_ds")).select(
        "query_id",
        F.col("_ds.dim").alias("dim"),
        F.col("_ds.n_overlap").cast("long").alias("n_overlap"),
        F.expr(f"_ds.n_overlap * 100 div {k}").cast("long").alias("recall_pct"),
    )
