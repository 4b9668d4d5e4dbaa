"""Persisted IVF index (datapipe/ivf_index.IvfIndex): build/append/probe.

The 100 TB ANN contract: build the quantizer once, append vectors O(batch)
forever, serve queries from the stored tables without rescanning the
corpus — and stay result-identical to the derive-in-query ivf_topk.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.datapipe.ivf_index import IvfIndex
from flink_real_time_data_warehouse_spark.datapipe.similarity import ivf_topk
from flink_real_time_data_warehouse_spark.tables import table

from .conftest import TEST_SF_DIR


def _rows(df):
    return sorted(map(tuple, df.select("query_id", "neighbor_id", "rank").collect()))


def test_indexed_topk_equals_derived(spark, tmp_path):
    emb = table(spark, TEST_SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    idx.build(emb)
    assert _rows(idx.topk(queries, k=5)) == _rows(ivf_topk(queries, emb, k=5))


def test_append_extends_lists_like_rebuild(spark, tmp_path):
    """Appending new vectors must equal deriving over the grown corpus
    with the same (frozen, first-k) centroids — the vectors land in the
    right lists without touching history. The build half is an id PREFIX
    so the union's first-k centroids equal the build's frozen ones and
    the derived form is directly comparable."""
    emb = table(spark, TEST_SF_DIR, "embeddings")
    cut = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).collect()[0][0]
    first = emb.where(F.col("vec_id") <= cut)
    rest = emb.where(F.col("vec_id") > cut)
    queries = emb.where(F.col("vec_id") < 20)

    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    idx.build(first)
    idx.append(rest)
    assert _rows(idx.topk(queries, k=5)) == _rows(ivf_topk(queries, emb, k=5))
    assert idx.lists().count() == emb.count()
    # labeled replay is idempotent
    n_before = idx.lists().count()
    idx.append(rest, batch_no=idx.committed_batches()[-1])
    assert idx.lists().count() == n_before


def test_probe_never_scans_corpus_source(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus.parquet")
    emb = table(spark, TEST_SF_DIR, "embeddings").limit(50)
    emb.write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    idx.build(corpus)
    queries = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in corpus.limit(3).collect()],
        "vec_id long, embedding array<float>",
    )
    files = idx.topk(queries, k=5).inputFiles()
    assert files and not any("corpus.parquet" in f for f in files)
    assert any("ivf" in f for f in files)


def test_compaction_preserves_topk(spark, tmp_path):
    emb = table(spark, TEST_SF_DIR, "embeddings")
    cut = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).collect()[0][0]
    queries = emb.where(F.col("vec_id") < 20)
    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    idx.build(emb.where(F.col("vec_id") <= cut))
    idx.append(emb.where(F.col("vec_id") > cut))
    before = _rows(idx.topk(queries, k=5))
    n = idx.lists().count()

    lbl = idx.compact()
    assert idx.committed_batches() == [lbl]
    assert idx.lists().count() == n
    assert _rows(idx.topk(queries, k=5)) == before
    # a doubly-visible batch (compaction crash window) must not corrupt
    # the top-k: the probe folds duplicate candidates before ranking
    idx.append(emb.where(F.col("vec_id") > cut), batch_no="dup")
    assert _rows(idx.topk(queries, k=5)) == before


def test_build_and_append_guards(spark, tmp_path):
    emb = table(spark, TEST_SF_DIR, "embeddings").limit(20)
    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    with pytest.raises(RuntimeError, match="build"):
        idx.append(emb)
    idx.build(emb)
    with pytest.raises(RuntimeError, match="already built"):
        idx.build(emb)
    # crash between list write and marker: batch invisible, retry converges
    lb = idx.append(emb.limit(5), batch_no="e7")
    os.remove(os.path.join(str(tmp_path / "ivf"), f"_batch_{lb}_done"))
    assert lb not in idx.committed_batches()
    assert idx.append(emb.limit(5), batch_no="e7") == "e7"
    assert idx.committed_batches().count("e7") == 1
