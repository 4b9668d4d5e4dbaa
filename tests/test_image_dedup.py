"""Image dHash near-dup dedup (datapipe/image_dedup.py): honest header
walk, Python-twin parity, lossless pigeonhole banding, hot-bucket cap,
and the no-cartesian plan contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.datapipe.dedup import (
    hamming_near_dup_pairs,
)
from flink_real_time_data_warehouse_spark.datapipe.image_dedup import (
    DHASH_MAX_DISTANCE,
    dhash64_py,
    dhash_signatures,
    image_phash_pairs,
    synth_pgm_payloads,
)
from flink_real_time_data_warehouse_spark.tables import table

from .conftest import TEST_SF_DIR


def _docs(spark, n=None):
    d = table(spark, TEST_SF_DIR, "documents")
    return d.limit(n) if n else d


def test_python_twin_parity_sweep(spark):
    """Every synthesized payload: the JVM column walk and the Python
    byte walk produce the same 64-bit fingerprint."""
    pay = synth_pgm_payloads(_docs(spark))
    jvm = {
        r["doc"]: (r["sig_hi"], r["sig_lo"])
        for r in dhash_signatures(pay).collect()
    }
    rows = pay.collect()
    assert len(jvm) == len(rows) > 0
    for r in rows:
        assert dhash64_py(bytes(r["payload"])) == jvm[r["doc_id"]]


def test_banding_is_lossless_at_radius(spark):
    """Banded pairs == brute-force all-pairs filter at Hamming <= 3 (the
    pigeonhole guarantee)."""
    sig = dhash_signatures(synth_pgm_payloads(_docs(spark, 80)))
    banded = sorted(
        map(tuple, hamming_near_dup_pairs(sig, DHASH_MAX_DISTANCE).collect())
    )
    a = sig.select(
        F.col("doc").alias("doc_a"),
        F.col("sig_hi").alias("ha"),
        F.col("sig_lo").alias("la"),
    )
    b = sig.select(
        F.col("doc").alias("doc_b"),
        F.col("sig_hi").alias("hb"),
        F.col("sig_lo").alias("lb"),
    )
    ham = (
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
    ).cast("long")
    brute = sorted(
        map(
            tuple,
            a.crossJoin(b)
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", ham.alias("hamming"))
            .where(F.col("hamming") <= DHASH_MAX_DISTANCE)
            .collect(),
        )
    )
    assert banded == brute and len(banded) > 0


def test_group_variants_are_found(spark):
    """Variants of the same base image (doc_id div 4) sit within <= 2
    bits of the base and must appear as pairs."""
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_phash_pairs(_docs(spark, 40)).collect()
    }
    for base in (0, 4, 8):
        for v in (1, 2, 3):
            assert (base, base + v) in pairs
            assert pairs[(base, base + v)] <= 2


def test_hot_bucket_cap_drops_saturated_chunks(spark):
    """With an aggressive cap every chunk bucket larger than the cap is
    dropped before the self-join: output is a subset of the uncapped
    pairs, and each surviving pair still respects the radius."""
    docs = _docs(spark, 80)
    full = set(
        (r["doc_a"], r["doc_b"]) for r in image_phash_pairs(docs).collect()
    )
    capped = [
        ((r["doc_a"], r["doc_b"]), r["hamming"])
        for r in image_phash_pairs(docs, bucket_cap=2).collect()
    ]
    assert set(k for k, _ in capped) <= full
    assert all(h <= DHASH_MAX_DISTANCE for _, h in capped)
    assert len(capped) < len(full)  # the cap genuinely bit


def test_plan_is_banded_not_cartesian(spark):
    """The pair search must plan as an equi-join on the chunk key —
    never a cartesian/broadcast-nested-loop product."""
    plan = (
        image_phash_pairs(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corrupt_header_rows_drop_out(spark):
    """A payload whose magic / dims / length fail the walk produces no
    signature row (and never a wrong one)."""
    pay = synth_pgm_payloads(_docs(spark, 12))
    bad_magic = pay.withColumn(
        "payload",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.encode(F.lit("P6"), "UTF-8"), F.col("payload").substr(F.lit(3), F.lit(1000))),
        ).otherwise(F.col("payload")),
    )
    sigs = dhash_signatures(bad_magic)
    kept = [r["doc"] for r in sigs.collect()]
    assert all(d % 3 != 0 for d in kept) and kept
    truncated = pay.withColumn(
        "payload", F.col("payload").substr(F.lit(1), F.lit(20))
    )
    assert dhash_signatures(truncated).count() == 0


def test_clusters_are_transitive_and_keeper_is_min(spark):
    """A~B and B~C must land in one cluster even when A!~C directly;
    keeper = min id per cluster; singletons keep themselves."""
    from flink_real_time_data_warehouse_spark.datapipe.image_dedup import (
        image_phash_clusters,
    )

    docs = _docs(spark, 60)
    rows = {r["doc_id"]: r for r in image_phash_clusters(docs).collect()}
    assert len(rows) == 60  # every doc appears
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in image_phash_pairs(docs).collect()
    }
    # every paired doc shares its partner's cluster (transitivity base)
    for a, b in pairs:
        assert rows[a]["cluster_id"] == rows[b]["cluster_id"]
    # keeper is the min id of its cluster, exactly one per cluster
    by_cluster: dict[int, list[int]] = {}
    for d, r in rows.items():
        by_cluster.setdefault(r["cluster_id"], []).append(d)
    for cid, members in by_cluster.items():
        assert cid == min(members)
        keepers = [d for d in members if rows[d]["is_keeper"] == 1]
        assert keepers == [cid]


def test_decontaminate_flags_bench_variants(spark):
    """Benchmark images are group bases (doc_id % 16 == 0); their three
    same-group variants sit within <= 2 bits and MUST be flagged, while
    the flag is exact overall: it equals a brute-force Python check over
    the twin fingerprints."""
    from flink_real_time_data_warehouse_spark.datapipe.image_dedup import (
        IMG_BENCH_MOD,
        image_decontaminate,
    )

    docs = _docs(spark, 96)
    got = {
        r["doc_id"]: (r["n_bench_hits"], r["contaminated"])
        for r in image_decontaminate(
            docs.where(F.col("doc_id") % IMG_BENCH_MOD != 0),
            docs.where(F.col("doc_id") % IMG_BENCH_MOD == 0),
        ).collect()
    }
    # exact recompute from the Python twin
    pay = {r["doc_id"]: bytes(r["payload"]) for r in synth_pgm_payloads(docs).collect()}
    sig = {d: dhash64_py(p) for d, p in pay.items()}

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    bench = [d for d in sig if d % IMG_BENCH_MOD == 0]
    for d, (hits, flag) in got.items():
        want = sum(1 for b in bench if ham(sig[d], sig[b]) <= DHASH_MAX_DISTANCE)
        assert hits == want and flag == int(want > 0), d
    # bench bases' variants are contaminated by construction
    for b in bench:
        for v in (1, 2, 3):
            if b + v in got:
                assert got[b + v][1] == 1
