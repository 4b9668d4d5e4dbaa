"""Audio fingerprint dedup (datapipe/audio_dedup.py): stdlib-wave
cross-check, Python-twin parity, corrupt-header rejection, group
recovery, and the no-cartesian plan contract.
"""

from __future__ import annotations

import io
import wave

from pyspark.sql import functions as F

from flink_real_time_data_warehouse_spark.datapipe.audio_dedup import (
    AFP_FRAME_SIZE,
    AFP_FRAMES,
    audio_fingerprints,
    audio_fp64_py,
    audio_fp_pairs,
    synth_pcm_payloads,
)
from flink_real_time_data_warehouse_spark.tables import table

from .conftest import TEST_SF_DIR


def _docs(spark, n=None):
    d = table(spark, TEST_SF_DIR, "documents")
    return d.limit(n) if n else d


def test_payloads_read_by_stdlib_wave(spark):
    """Every synthesized payload is a real WAV the independent stdlib
    reader accepts, with the advertised mono/8-bit/frame-count layout."""
    for r in synth_pcm_payloads(_docs(spark, 12)).collect():
        w = wave.open(io.BytesIO(bytes(r["payload"])))
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 1
        assert w.getnframes() == AFP_FRAMES * AFP_FRAME_SIZE


def test_python_twin_parity_sweep(spark):
    pay = synth_pcm_payloads(_docs(spark))
    jvm = {
        r["doc"]: (r["sig_hi"], r["sig_lo"])
        for r in audio_fingerprints(pay).collect()
    }
    rows = pay.collect()
    assert len(jvm) == len(rows) > 0
    for r in rows:
        assert audio_fp64_py(bytes(r["payload"])) == jvm[r["doc_id"]]


def test_group_variants_recovered(spark):
    """Variants bump one frame -> <= 2 flipped comparisons; every
    in-group pair must appear within the Hamming <= 3 search."""
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in audio_fp_pairs(_docs(spark, 40)).collect()
    }
    for base in (0, 4, 8):
        for v in (1, 2, 3):
            assert (base, base + v) in pairs
            assert pairs[(base, base + v)] <= 2


def test_corrupt_header_rows_drop_out(spark):
    pay = synth_pcm_payloads(_docs(spark, 12))
    bad = pay.withColumn(
        "payload",
        F.when(
            F.col("doc_id") % 3 == 0,
            # flip the RIFF magic's first byte
            F.concat(
                F.encode(F.lit("X"), "UTF-8"),
                F.col("payload").substr(F.lit(2), F.lit(100000)),
            ),
        ).otherwise(F.col("payload")),
    )
    kept = [r["doc"] for r in audio_fingerprints(bad).collect()]
    assert kept and all(d % 3 != 0 for d in kept)
    truncated = pay.withColumn(
        "payload", F.col("payload").substr(F.lit(1), F.lit(60))
    )
    assert audio_fingerprints(truncated).count() == 0


def test_plan_is_banded_not_cartesian(spark):
    plan = (
        audio_fp_pairs(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
