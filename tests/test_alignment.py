"""Image-text alignment gate (datapipe/alignment.py): attrition
semantics, pairability rules, Python recompute parity, and the
zero-shuffle scoring plan contract.
"""

from __future__ import annotations

import math

import pytest

from flink_real_time_data_warehouse_spark.datapipe.alignment import (
    ALIGN_THRESHOLD,
    sample_alignment_gate,
)
from flink_real_time_data_warehouse_spark.datapipe.multimodal import (
    parse_tar_members,
    synth_tar_payloads,
)
from flink_real_time_data_warehouse_spark.tables import table

from .conftest import TEST_SF_DIR


def _gate(spark):
    docs = table(spark, TEST_SF_DIR, "documents").select("doc_id")
    members = parse_tar_members(synth_tar_payloads(docs))
    emb = table(spark, TEST_SF_DIR, "embeddings")
    return sample_alignment_gate(members, emb)


@pytest.fixture(scope="module")
def gate_rows(spark):
    """One materialization of the gate shared by the row-level tests:
    each _gate().collect() re-plans the full tar-walk expression tree,
    which dominates these tests' runtime (planning, not data)."""
    return _gate(spark).collect()


def test_attrition_is_monotone(gate_rows):
    rows = gate_rows
    assert rows
    for r in rows:
        assert r["n_aligned"] <= r["n_pairable"] <= r["n_samples"]
        if r["n_pairable"]:
            assert (
                r["aligned_ppm"]
                == r["n_aligned"] * 1_000_000 // r["n_pairable"]
            )
        else:
            assert r["aligned_ppm"] == 0


def test_single_member_shards_are_unpairable(gate_rows):
    """Shards with one member carry a jpg but no caption — they count as
    samples yet never reach scoring (the funnel's first attrition)."""
    for r in gate_rows:
        if r["asset_id"] % 3 == 0:
            assert r["n_samples"] == 1
            assert r["n_pairable"] == 0 and r["n_aligned"] == 0


def test_python_recompute_parity(spark, gate_rows):
    """Per-shard aligned counts match a from-scratch Python replay of the
    pairing rule + quantized cosine gate."""
    emb = {
        r["vec_id"]: [math.floor(float(x) * 1_000_000) for x in r["embedding"]]
        for r in table(spark, TEST_SF_DIR, "embeddings").collect()
    }
    n = len(emb)

    def qcos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a)
        nb = sum(y * y for y in b)
        return dot / math.sqrt(float(na) * float(nb))

    expect: dict[int, int] = {}
    docs = [
        r["doc_id"]
        for r in table(spark, TEST_SF_DIR, "documents").select("doc_id").collect()
    ]
    for d in docs:
        n_members = 1 + d % 3
        aligned = 0
        # sample 0 is pairable iff members 0 (jpg) and 1 (txt) both exist
        if n_members >= 2:
            img = emb[(d * 2) % n]
            txt = emb[(d * 5 + 1) % n]
            aligned = int(qcos(img, txt) >= ALIGN_THRESHOLD)
        expect[d] = aligned
    got = {r["asset_id"]: r["n_aligned"] for r in gate_rows}
    assert got == expect


def test_scoring_plan_is_zero_shuffle(spark):
    """Exactly two shuffle exchanges end-to-end (sample assembly agg +
    final per-shard rollup); the embedding lookups broadcast and the
    score itself is a projection — no extra exchange, no sort-merge
    join, no cartesian product."""
    plan = _gate(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_curation_funnel_chains_and_matches_parts(spark, gate_rows):
    """Stage chaining (n_in of k = n_kept of k-1) and agreement with the
    independently-computed parts: stage-2 kept = the gate's total
    aligned; stage-3 kept <= stage-2 kept."""
    from flink_real_time_data_warehouse_spark.datapipe.alignment import (
        multimodal_curation_funnel,
    )
    from flink_real_time_data_warehouse_spark.datapipe.image_dedup import (
        image_phash_clusters,
    )
    from pyspark.sql import functions as F

    docs = table(spark, TEST_SF_DIR, "documents")
    members = parse_tar_members(synth_tar_payloads(docs.select("doc_id")))
    emb = table(spark, TEST_SF_DIR, "embeddings")
    keepers = image_phash_clusters(docs).select(
        F.col("doc_id").alias("asset_id"), "is_keeper"
    )
    from flink_real_time_data_warehouse_spark.datapipe.quality import (
        gopher_quality,
    )

    captions = gopher_quality(docs, "doc_id", "text").select(
        F.col("doc_id").alias("asset_id"), F.col("passes").alias("cap_ok")
    )
    rows = {
        r["stage_idx"]: r
        for r in multimodal_curation_funnel(
            members, emb, keepers, captions
        ).collect()
    }
    assert [rows[i]["stage"] for i in (1, 2, 3, 4)] == [
        "pairable",
        "alignment",
        "image_dedup",
        "caption_quality",
    ]
    for k in (2, 3, 4):
        assert rows[k]["n_in"] == rows[k - 1]["n_kept"]
    for r in rows.values():
        assert r["n_dropped"] == r["n_in"] - r["n_kept"] >= 0
    gate = sum(r["n_aligned"] for r in gate_rows)  # same rows, no re-plan
    assert rows[2]["n_kept"] == gate
