"""Round-14 optimization plan-discipline pins.

Three traps this round's rewrites rely on, each pinned so a future Spark
or repo change that silently re-inlines work fails here first:

- `_let1` self-terms (similarity.py): lambda variables are never inlined
  by CollapseProject, so the argmax's per-row self-dot evaluates once per
  ROW. No engine contract guarantees that; pin the plan shape.
- per-side self-norm staging (cosine_topk & friends): the norms live in
  projections BELOW the candidate join, one per side, never recomputed
  per pair.
- `_byte_sum` counting form (multimodal.py): exact byte-sum equivalence
  with a Python reference on edge shapes (empty, NULs, all-0xFF, odd
  lengths).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.tables import table

from .conftest import TEST_SF_DIR


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_argmax_self_term_stays_let_bound(spark):
    """The nearest-centroid argmax evaluates the row's self-dot ONCE per
    row: it is bound as a single-element-transform lambda variable, which
    CollapseProject cannot inline into the per-centroid lambda. If a
    future optimizer change re-inlines it, the row-side self-aggregate
    subtree appears once PER CENTROID in the optimized plan instead of
    once per row — this pin catches that (ADVICE r13)."""
    from flink_real_time_data_warehouse_spark.datapipe.similarity import (
        assign_top1,
    )

    emb = table(spark, TEST_SF_DIR, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    plan = optimized_of(assign_top1(emb, cents, "vec_id", "embedding", "vid"))
    # Row-side self-dot: zip_with of the SAME corpus attribute with
    # itself (zip_with(embedding#n, embedding#n, ...)). Exactly one per
    # row — it sits inside transform(array(<self-term>), ...) as the
    # lambda binding. The per-centroid sim dots pair the attribute with
    # a lambda variable's field (zip_with(embedding#n, lambda x.cv)), so
    # they never match this pattern; an inlined self-term would.
    import re

    # Expected exactly 2 self-dots in the whole plan: the row side's
    # (bound once per row) and the centroid side's (once per centroid in
    # the _cents_row aggregate). Any re-inlining raises the count.
    n_self = len(re.findall(r"zip_with\((\w+#\d+), \1,", plan))
    assert n_self == 2, f"self-terms evaluated {n_self}x (expected 2):\n{plan[:4000]}"


def test_cosine_topk_norms_stage_below_the_join(spark):
    """cosine_topk computes each side's self-norm once per ROW in a
    projection under the candidate join (r14: one dot per pair instead
    of three). Pin: the staged norm columns exist, and the pair-level
    sim projection contains no SQRT (a re-inlined norm would put the
    sqrt back above the join, once per pair)."""
    from flink_real_time_data_warehouse_spark.datapipe.similarity import (
        cosine_topk,
    )

    emb = table(spark, TEST_SF_DIR, "embeddings")
    plan = optimized_of(cosine_topk(emb.where(F.col("vec_id") < 5), emb, k=3))
    assert "_nq" in plan and "_nn" in plan, plan[:4000]
    for line in plan.splitlines():
        if " AS sim" in line:
            assert "SQRT" not in line, f"norm recomputed per pair:\n{line}"


def test_byte_sum_counting_form_is_exact(spark):
    """_byte_sum (tar checksum inner loop) must equal the plain Python
    byte sum on adversarial shapes: empty, embedded NULs, all-0xFF,
    every-digit coverage, and a 512-byte header-like block."""
    from flink_real_time_data_warehouse_spark.datapipe.multimodal import (
        _byte_sum,
    )

    cases = [
        b"",
        b"\x00" * 64,
        b"\xff" * 64,
        bytes(range(256)),
        b"ustar\x0000" * 37,
        b"\x01\x10\x9a\xaf\x05",
    ]
    df = spark.createDataFrame(
        [(i, bytearray(c)) for i, c in enumerate(cases)], "i long, b binary"
    )
    got = {r["i"]: r["s"] for r in df.select("i", _byte_sum(F.col("b")).alias("s")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == sum(c), (i, got[i], sum(c))
    # NULL propagates (the walk's absent-member branches rely on it)
    nulldf = spark.createDataFrame([(1,)], "i long").select(
        _byte_sum(F.lit(None).cast("binary")).alias("s")
    )
    assert nulldf.first()["s"] is None
