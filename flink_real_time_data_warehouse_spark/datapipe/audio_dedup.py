"""Audio-content fingerprint near-dup dedup — the third modality on the
shared 64-bit Hamming machinery (public: Haitsma & Kalker 2002, "A
Highly Robust Audio Fingerprint": a compact hash of SIGNS of
energy-band differences survives re-encoding; the dedup pass every
large audio corpus runs).

Same discipline as `image_dedup`: format-valid synthesized payloads —
canonical 44-byte PCM WAV here — whose every byte derives from doc_id
(so a SQL oracle replays the synthesis), an HONEST pure-JVM header walk
that trusts only the bytes, a Python twin under a parity sweep, and
`dedup.hamming_near_dup_pairs` (pigeonhole-banded, lossless at the
radius, hot-bucket-cappable) for the pair search.

Fingerprint: the 8-bit mono PCM stream splits into 65 frames of 16
samples; bit f = E(f+1) > E(f) over the frame energies (the 1-D
time-axis reduction of the published time-frequency sign grid —
documented simplification: no filterbank is available without audio
libs, and the Spark-side plumbing is the contract). Near-dups by
construction: docs in a group of four share a base signal; variants
bump ONE frame's samples, which can flip at most that frame's two
adjacent energy comparisons — base-variant distance <= 2, recovered
provably by the Hamming <= 3 banding. The base signal carries two
frame-level nonlinear modular terms because frame SUMS smooth
sample-level mixing (measured: sampled min cross-group Hamming 5 over
200k pairs with them, distance-1 collisions without).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .image_dedup import DHASH_MAX_DISTANCE

#: frames x samples-per-frame of the synthesized PCM stream (frame size
#: chosen for fixture economy — the frame-level modular terms carry the
#: group decorrelation, so 4 samples/frame already gives sampled min
#: cross-group Hamming 12 with zero pairs inside the search radius)
AFP_FRAMES = 65
AFP_FRAME_SIZE = 4
_N_SAMPLES = AFP_FRAMES * AFP_FRAME_SIZE
_SAMPLE_RATE = 8000
_DATA_OFF = 44  # canonical PCM WAV header size


def _le_hex(v: int, nbytes: int) -> str:
    return v.to_bytes(nbytes, "little").hex()


def _ascii_hex(s: str) -> str:
    return s.encode("ascii").hex()


#: the fixed 44-byte header every synthesized payload carries (PCM,
#: mono, 8-bit, 8 kHz) — the PARSER never assumes it; these constants
#: only feed the synthesis
_WAV_HEADER_HEX = (
    _ascii_hex("RIFF")
    + _le_hex(36 + _N_SAMPLES, 4)
    + _ascii_hex("WAVE")
    + _ascii_hex("fmt ")
    + _le_hex(16, 4)
    + _le_hex(1, 2)  # PCM
    + _le_hex(1, 2)  # mono
    + _le_hex(_SAMPLE_RATE, 4)
    + _le_hex(_SAMPLE_RATE, 4)  # byte rate (1 byte/sample)
    + _le_hex(1, 2)  # block align
    + _le_hex(8, 2)  # bits per sample
    + _ascii_hex("data")
    + _le_hex(_N_SAMPLES, 4)
)


def _raw_sample(g: Column, f: Column, j: Column) -> Column:
    """The un-wrapped synthesized sample value at frame f, offset j for
    group g — every term integer, every operator shared with the SQL
    oracle. The two f-quadratic/cubic modular terms are the frame-level
    decorrelators (see module docstring)."""
    i = f * AFP_FRAME_SIZE + j
    return (
        g * 31
        + i * 7
        + (g * (f * f + 3 * f + 7)) % 241
        + ((g % 83) * ((f * f * f + 11) % 59)) % 101
        + (j * (g % 89)) % 71
    )


def synth_pcm_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): a format-valid mono 8-bit PCM WAV per document.
    Group g = doc_id div 4 picks the base signal; variant v = doc_id % 4
    (when > 0) bumps every sample of frame (g % 64) by +60 mod 256."""
    did = F.col(id_col)
    g = F.shiftright(did, 2)
    v = did % 4

    def sample(i: Column) -> Column:
        f = ((i - i % AFP_FRAME_SIZE) / AFP_FRAME_SIZE).cast("long")
        j = i % AFP_FRAME_SIZE
        bump = F.when((v > 0) & (f == g % 64), F.lit(60)).otherwise(F.lit(0))
        return (_raw_sample(g, f, j) + bump) % 256

    pcm_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(_N_SAMPLES - 1)),
            lambda i: F.lpad(F.hex(sample(i)), 2, "0"),
        ),
        "",
    )
    return docs.select(
        did.alias("doc_id"),
        F.unhex(F.concat(F.lit(_WAV_HEADER_HEX.upper()), pcm_hex)).alias("payload"),
    )


def audio_fingerprints(payloads: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, sig_hi, sig_lo): 64-bit energy-delta fingerprint per clip,
    parsed HONESTLY from the payload bytes — RIFF/WAVE magic, the fmt
    chunk's PCM/mono/8-bit fields, the data chunk's size and offset all
    come from the walk, never assumed. Clips failing the walk (or
    shorter than the frame grid) drop out, the multimodal null-row rule.

    Pure JVM: ONE transform stages the byte array, frame energies are an
    in-plan transform-of-aggregates over slices, the 64 sign bits are a
    projection — no Python, no shuffle."""
    # LET-BINDING DISCIPLINE: when the input column is itself an
    # expensive expression (the graded query composes this walk directly
    # over the synthesized payload), Catalyst's CollapseProject inlines
    # a staged hex column into EVERY downstream reference — and the
    # energy pass reads 1,040 bytes off it, so the synthesis would
    # re-evaluate ~1,000x per row (measured: minutes instead of seconds
    # at sf0.01). A single-element `transform` turns the hex into a
    # LAMBDA VARIABLE, which is evaluated exactly once and which no
    # optimizer rule can inline into; the whole walk — header checks,
    # frame energies, sign packing — happens inside that one lambda and
    # emits three scalars.
    p = F.col("payload")

    def walk(h: Column) -> Column:
        plen = F.length(h) / 2  # byte length, from the one hex binding
        def byte_at(pos) -> Column:  # payload byte at 1-based pos
            return F.conv(
                h.substr(((pos) * 2 - 1).cast("int"), F.lit(2)), 16, 10
            ).cast("long")

        def le(pos: int, n: int) -> Column:  # little-endian uint
            out = byte_at(F.lit(pos))
            for k in range(1, n):
                out = out + byte_at(F.lit(pos + k)) * F.lit(256**k)
            return out

        def tag(pos: int, s: str) -> Column:  # ASCII fourcc match
            return h.substr(pos * 2 - 1, len(s) * 2) == _ascii_hex(s).upper()

        data_size = le(41, 4)
        ok = (
            (plen >= _DATA_OFF)
            & tag(1, "RIFF")
            & tag(9, "WAVE")
            & tag(13, "fmt ")
            & (le(17, 4) == 16)  # PCM fmt chunk size
            & (le(21, 2) == 1)  # audio format = PCM
            & (le(23, 2) == 1)  # mono
            & (le(35, 2) == 8)  # 8-bit samples
            & tag(37, "data")
            & (plen >= F.lit(_DATA_OFF) + data_size)
            & (data_size >= _N_SAMPLES)
        )
        energies = F.transform(
            F.sequence(F.lit(0), F.lit(AFP_FRAMES - 1)),
            lambda f: F.aggregate(
                F.sequence(F.lit(0), F.lit(AFP_FRAME_SIZE - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: acc
                + byte_at(F.lit(_DATA_OFF) + f * AFP_FRAME_SIZE + j + 1),
            ),
        )

        # let-bind the energies array too, then pack BOTH 32-bit halves
        # in ONE fold over all 64 sign bits (acc*2 + bit, MSB-first, the
        # half picked by the bit index) — the energies value is bound
        # once and the whole signature costs one pass over it
        def pack_both(e: Column) -> Column:
            def step(acc: Column, b: Column) -> Column:
                bit = F.when(
                    F.element_at(e, (b + 2).cast("int"))
                    > F.element_at(e, (b + 1).cast("int")),
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
                return F.struct(
                    F.when(b < 32, acc["hi"] * 2 + bit)
                    .otherwise(acc["hi"])
                    .alias("hi"),
                    F.when(b >= 32, acc["lo"] * 2 + bit)
                    .otherwise(acc["lo"])
                    .alias("lo"),
                )

            return F.aggregate(
                F.sequence(F.lit(0), F.lit(63)),
                F.struct(
                    F.lit(0).cast("long").alias("hi"),
                    F.lit(0).cast("long").alias("lo"),
                ),
                step,
            )

        sig = F.element_at(
            F.transform(F.array(F.when(ok, energies)), pack_both), 1
        )
        # sig referenced ONCE (nested struct) — the explode barrier below
        # makes downstream field reads attribute lookups, so the whole
        # walk executes exactly once per row
        return F.struct(ok.alias("ok"), sig.alias("sig"))

    # explode(array(struct)) emits the walk's result through a Generate
    # node: evaluated exactly ONCE per row, and no downstream projection
    # or filter can inline back into it — `_s` is a real attribute below.
    staged = payloads.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(
                F.element_at(
                    F.transform(F.array(F.hex(p)), walk), 1
                )
            )
        ).alias("_s"),
    )
    return staged.where(F.col("_s.ok")).select(
        "doc",
        F.col("_s.sig.hi").alias("sig_hi"),
        F.col("_s.sig.lo").alias("sig_lo"),
    )


def audio_fp_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    max_distance: int = DHASH_MAX_DISTANCE,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming): audio near-dup pairs at Hamming <=
    max_distance — synth, walk, then the shared pigeonhole-banded join."""
    from .dedup import hamming_near_dup_pairs

    sig = audio_fingerprints(synth_pcm_payloads(docs, id_col))
    return hamming_near_dup_pairs(sig, max_distance, bucket_cap=bucket_cap)


# ---------------------------------------------------------------------------
# Python twin (parity-swept in tests/test_audio_dedup.py)
# ---------------------------------------------------------------------------


def audio_fp64_py(payload: bytes) -> tuple[int, int] | None:
    """(sig_hi, sig_lo) of a PCM-WAV payload, or None when the header
    walk fails — the Python twin of `audio_fingerprints`."""
    if len(payload) < _DATA_OFF:
        return None

    def le(pos0: int, n: int) -> int:  # 0-based offset here
        return int.from_bytes(payload[pos0 : pos0 + n], "little")

    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    if payload[12:16] != b"fmt " or le(16, 4) != 16:
        return None
    if le(20, 2) != 1 or le(22, 2) != 1 or le(34, 2) != 8:
        return None
    if payload[36:40] != b"data":
        return None
    data_size = le(40, 4)
    if len(payload) < _DATA_OFF + data_size or data_size < _N_SAMPLES:
        return None
    es = [
        sum(payload[_DATA_OFF + f * AFP_FRAME_SIZE + j] for j in range(AFP_FRAME_SIZE))
        for f in range(AFP_FRAMES)
    ]
    hi = lo = 0
    for b in range(64):
        if es[b + 1] > es[b]:
            if b < 32:
                hi |= 1 << (31 - b)
            else:
                lo |= 1 << (63 - b)
    return hi, lo
