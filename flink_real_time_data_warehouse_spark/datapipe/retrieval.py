"""Sparse retrieval (BM25) over the corpus — the data-selection /
retrieval-for-curation slot: scoring documents against a reference
query set is how pipelines mine domain-relevant data (BM25-select),
build hard negatives for embedding training, and sanity-check dedup
(a near-dup pair should retrieve each other).

Integer quantization is what makes it oracle-gradeable: classical BM25
needs ln() (not correctly rounded across libm implementations — the
same reason lm_surprisal uses bit-lengths), so idf is quantized to
``len(bin(N div df))`` bits and the tf saturation runs in milli/ppm
integer arithmetic with explicit div — every score is a BIGINT that any
engine reproduces exactly.

Scale: postings are pruned by a BROADCAST semi-join against the query
term set before anything else flows — document frequency, length join
and scoring all run on query-term postings only, never the full term
space. Corpus-wide aggregates (doc lengths, totals) are one hash agg
each; top-k per query plans as WindowGroupLimit, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: BM25 k1 and b in milli units (1.2 / 0.75)
BM25_K1_MILLI = 1200
BM25_B_MILLI = 750
#: results per query
BM25_TOPK = 10
#: query docs: doc_id % BM25_QUERY_MOD == 1
BM25_QUERY_MOD = 100
#: query = the doc's first BM25_QUERY_TERMS distinct tokens
BM25_QUERY_TERMS = 8


def bm25_topk(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Top-BM25_TOPK corpus documents per query, integer-exact:

      idf_bits(t)  = len(bin(N div df(t)))
      ratio_milli  = len(d) * 1e6 div avg_milli      (len/avg in milli)
      inner_milli  = (1000 - b) + b * ratio_milli div 1000
      denom_milli  = tf * 1000 + k1 * inner_milli div 1000
      tfn_ppm      = tf * (k1 + 1000) * 1e6 div denom_milli
      score        = sum over query terms of idf_bits * tfn_ppm

    Queries are the first BM25_QUERY_TERMS distinct tokens of each doc
    with id % BM25_QUERY_MOD == 1 (a query retrieves its own source doc
    near the top — a built-in sanity property). Returns
    (query_id, rank, doc_id, score)."""
    from .dedup import tokens

    base = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_t")
    )
    postings = (
        base.select("doc", F.explode("_t").alias("term"))
        .groupBy("doc", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    doclen = base.select(
        "doc", F.size("_t").cast("long").alias("dl")
    )
    totals = doclen.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    ).select(
        "n_docs",
        F.expr("total_tokens * 1000 div n_docs").cast("long").alias("avg_milli"),
    )
    qterms = (
        base.where(F.col("doc") % BM25_QUERY_MOD == 1)
        .select(
            F.col("doc").alias("query_id"),
            F.explode(
                F.array_distinct(F.slice("_t", 1, BM25_QUERY_TERMS))
            ).alias("term"),
        )
        .distinct()
    )
    rel = postings.join(F.broadcast(qterms), "term")
    dfreq = rel.select("term", "doc").distinct().groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    scored = (
        rel.join(F.broadcast(dfreq), "term")
        .join(doclen, "doc")
        .crossJoin(F.broadcast(totals))
        .withColumn("idf_bits", F.length(F.bin(F.expr("n_docs div df"))).cast("long"))
        .withColumn("ratio_milli", F.expr("dl * 1000000 div avg_milli"))
        .withColumn(
            "inner_milli",
            F.expr(
                f"(1000 - {BM25_B_MILLI}) + {BM25_B_MILLI} * ratio_milli div 1000"
            ),
        )
        .withColumn(
            "denom_milli",
            F.expr(f"tf * 1000 + {BM25_K1_MILLI} * inner_milli div 1000"),
        )
        .withColumn(
            "tfn_ppm",
            F.expr(f"tf * {BM25_K1_MILLI + 1000} * 1000000 div denom_milli"),
        )
        .groupBy("query_id", "doc")
        .agg(F.sum(F.expr("idf_bits * tfn_ppm")).cast("long").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= BM25_TOPK)
        .select("query_id", "rank", F.col("doc").alias("doc_id"), "score")
    )


# --- reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009:
# "Reciprocal Rank Fusion outperforms Condorcet and individual Rank
# Learning Methods") — the standard hybrid-retrieval combiner: fuse a
# sparse (BM25) and a dense (embedding ANN) ranking without score
# calibration, since only RANKS cross system boundaries. ---

#: the RRF smoothing constant k (the paper's value)
RRF_K = 60
#: fused results per query
RRF_TOPK = 10


def rrf_fuse(
    rankings: list[DataFrame], k: int = RRF_K, topk: int = RRF_TOPK
) -> DataFrame:
    """Fuse rank lists — each (query_id, doc_id, rank) — by RRF with
    integer-quantized contributions: contrib = 1e6 div (k + rank), so
    every fused score is a BIGINT both engines reproduce exactly (the
    paper's 1/(k+r) floats would drift in the last ulp when summed in
    different orders). Fused order: rrf_ppm DESC, doc_id ASC; top
    `topk` per query survive. n_systems counts the lists that voted
    for the pair.

    Scale: a union of k-rows-per-query lists (tiny relative to the
    corpus) -> one hash agg with map-side partials -> per-query
    row_number that plans as WindowGroupLimit. No join against the
    corpus at all — fusion touches only the candidate lists."""
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    scored = None
    for r in rankings:
        c = r.select(
            "query_id",
            "doc_id",
            F.expr(f"{1_000_000} div ({k} + rank)").cast("long").alias("_c"),
        )
        scored = c if scored is None else scored.unionByName(c)
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("_c").cast("long").alias("rrf_ppm"),
        F.count("*").cast("long").alias("n_systems"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_ppm").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .where(F.col("fused_rank") <= topk)
        .select("query_id", "fused_rank", "doc_id", "rrf_ppm", "n_systems")
    )
