"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

The decode kernels (real JPEG/PNG/audio codecs) are STUBBED — the container
has no imaging/audio libraries — but everything Spark-side is real and
tested: the schema contract, the mapInPandas batch shape, partition-size
control, and a deterministic fake decoder so downstream operators (resize,
frame-sample, feature-extract) have stable inputs to exercise.

At 100 TB: binary payloads dominate row size, so the operators
repartition by byte budget (not row count) before the Arrow transfer, and
metadata-only transforms never touch the binary column (column pruning
keeps it out of the scan entirely).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Contract for a multimodal asset row: payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("byte_len", LongType(), True),
        StructField("meta_json", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("feat_hash", StringType(), True),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Fixture adapter: wrap document text bytes as fake media payloads so
    the binary plumbing has real data to move."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("byte_len"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta_json"),
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image decode — requires an imaging library not present here."""
    raise NotImplementedError("image codec not available in this environment")


def fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in decoder: derives (width, height, n_frames,
    feat_hash) purely from the payload digest, so tests are stable and the
    full Spark pipeline (schema, batching, partitioning) is exercised."""
    h = hashlib.md5(payload or b"").hexdigest()
    width = 64 + int(h[:4], 16) % 1024
    height = 64 + int(h[4:8], 16) % 1024
    n_frames = 1 + int(h[8:12], 16) % 32
    return width, height, n_frames, h


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame_hash", StringType(), False),
    ]
)

CHUNK_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
        StructField("chunk_hash", StringType(), False),
    ]
)

FAKE_FPS = 10  # fake decoder: every video frame covers 100 ms
FAKE_MS_PER_BYTE = 2  # fake decoder: audio duration = byte_len * 2 ms


def sample_frames(assets: DataFrame, every_k: int = 4, n_partitions: int | None = None) -> DataFrame:
    """Video frame sampling: one output row per k-th frame of each video
    asset — the expansion step before per-frame feature extraction.

    A real deployment decodes frames from the payload inside the batch
    loop; here the frame count and per-frame digest come from the
    deterministic fake decoder (n_frames = fake_decode(payload), frame_hash
    = md5(digest ':' idx)) so the expansion plumbing — row blowup inside
    Arrow batches, typed output schema, byte-budget partitioning — is fully
    real and the result is engine-checkable.

    Scale shape: filter to media_type='video' BEFORE the Python transfer
    (column pruning drops the payload for non-video rows at the scan), and
    the blowup happens inside the Python worker — the shuffle moves one row
    per asset, not per frame.
    """
    sized = _sized_by_bytes(assets.where(F.col("media_type") == "video"), n_partitions)
    out_cols = [f.name for f in FRAME_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                h = hashlib.md5(bytes(payload) if payload is not None else b"").hexdigest()
                n_frames = 1 + int(h[8:12], 16) % 32
                for idx in range(0, n_frames, every_k):
                    out.append(
                        {
                            "asset_id": aid,
                            "frame_idx": idx,
                            "ts_ms": idx * (1000 // FAKE_FPS),
                            "frame_hash": hashlib.md5(f"{h}:{idx}".encode()).hexdigest(),
                        }
                    )
            yield _pd.DataFrame(out, columns=out_cols)

    return sized.mapInPandas(run, FRAME_SCHEMA)


def chunk_audio(assets: DataFrame, chunk_ms: int = 1000, n_partitions: int | None = None) -> DataFrame:
    """Audio chunking: split each audio asset into fixed-duration windows —
    the segmentation step before transcription/feature extraction.

    Duration comes from the fake decoder (byte_len × 2 ms); a real codec
    replaces that one line. The last chunk is clipped to the asset's end.
    Same scale shape as sample_frames: pre-filter to audio, expand inside
    the Python worker.
    """
    sized = _sized_by_bytes(assets.where(F.col("media_type") == "audio"), n_partitions)
    out_cols = [f.name for f in CHUNK_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                h = hashlib.md5(raw).hexdigest()
                duration_ms = len(raw) * FAKE_MS_PER_BYTE
                n_chunks = (duration_ms + chunk_ms - 1) // chunk_ms
                for idx in range(n_chunks):
                    start = idx * chunk_ms
                    out.append(
                        {
                            "asset_id": aid,
                            "chunk_idx": idx,
                            "start_ms": start,
                            "end_ms": min(start + chunk_ms, duration_ms),
                            "chunk_hash": hashlib.md5(f"{h}:{idx}".encode()).hexdigest(),
                        }
                    )
            yield _pd.DataFrame(out, columns=out_cols)

    return sized.mapInPandas(run, CHUNK_SCHEMA)


def _sized_by_bytes(
    assets: DataFrame, n_partitions: int | None, byte_budget_mb: int = 64
) -> DataFrame:
    """Shared byte-budget repartition before an Arrow transfer (see
    decode_assets for the rationale: file-level statistics, never a data
    pass)."""
    if n_partitions is None:
        est_bytes = _input_file_bytes(assets) * 4
        if est_bytes == 0 and "byte_len" in assets.columns:
            # File-level sizing failed (e.g. a source the filesystem layer
            # couldn't stat, or a non-file plan). Silently treating that as
            # 0 would collapse arbitrarily large inputs into ONE partition —
            # the exact OOM this sizing exists to prevent — so pay for one
            # aggregate over the metadata column instead.
            row = assets.agg(F.coalesce(F.sum("byte_len"), F.lit(0)).alias("b")).collect()[0]
            est_bytes = int(row["b"]) * 4
        n_partitions = max(1, est_bytes // (byte_budget_mb * 1024 * 1024) + 1)
    return assets.repartition(n_partitions, "asset_id")


def _input_file_bytes(df: DataFrame) -> int:
    """Total on-disk bytes of the DataFrame's input files — plan metadata
    only (file listing / filesystem stat), never a Spark job over the data.

    Local paths stat via the OS; any other scheme (s3://, hdfs://, ...)
    goes through the Hadoop FileSystem API, so remote inputs are sized
    correctly rather than silently counted as 0.
    """
    from urllib.parse import urlparse

    total = 0
    for uri in df.inputFiles():
        parsed = urlparse(uri)
        if parsed.scheme in ("", "file"):
            try:
                total += os.path.getsize(parsed.path)
            except OSError:
                pass
            continue
        try:
            spark = df.sparkSession
            jpath = spark._jvm.org.apache.hadoop.fs.Path(uri)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            total += fs.getFileStatus(jpath).getLen()
        except Exception:  # noqa: BLE001 — unreachable FS: let the caller's fallback size it
            pass
    return total


def decode_assets(
    assets: DataFrame, byte_budget_mb: int = 64, n_partitions: int | None = None
) -> DataFrame:
    """Decode/feature-extract assets via Arrow-batched mapInPandas.

    Partitions are re-sized by payload bytes before the Python transfer so
    an Arrow batch never blows executor memory on large media. The byte
    estimate comes from file-level statistics (input file sizes × a 4×
    decompression allowance), NOT from an aggregate over the data — sizing
    must never cost an extra full pass over a 100 TB table. Callers that
    know better (e.g. post-filter selectivity) pass `n_partitions`. Uses
    the fake decoder; swap `fake_decode` for a real codec in production.
    """
    sized = _sized_by_bytes(assets, n_partitions, byte_budget_mb)

    out_cols = [f.name for f in DECODED_SCHEMA.fields]

    # NOTE: `run` must stay fully self-contained (imports inside, no
    # module-level references) — Spark pickles it to Python workers that do
    # not have this package on sys.path when the driver runs from elsewhere.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        import struct

        def _hdr(b):
            # header-level DIMENSION parse (PNG IHDR / BMP / GIF — the
            # three containers that carry width×height at fixed offsets;
            # WAV is dimensionless so its stream params stay on the
            # parse_media_headers path). Mirrors parse_header_py, kept
            # inline: Spark pickles this closure to workers without the
            # package on sys.path.
            if b[:8] == bytes.fromhex("89504E470D0A1A0A") and len(b) >= 24:
                return struct.unpack(">II", b[16:24])
            if (b[:2] == b"BM" and len(b) >= 26
                    and struct.unpack("<I", b[14:18])[0] == 40):
                return struct.unpack("<ii", b[18:26])
            if b[:6] in (b"GIF89a", b"GIF87a") and len(b) >= 10:
                return struct.unpack("<HH", b[6:10])
            return None

        for pdf in batches:
            out = []
            for aid, mtype, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                h = hashlib.md5(raw).hexdigest()
                wh = _hdr(raw)
                if wh is not None:
                    width, height = int(wh[0]), int(wh[1])
                else:  # unknown container: deterministic fake dims
                    width = 64 + int(h[:4], 16) % 1024
                    height = 64 + int(h[4:8], 16) % 1024
                n_frames = 1 + int(h[8:12], 16) % 32
                out.append(
                    {
                        "asset_id": aid,
                        "media_type": mtype,
                        "width": width,
                        "height": height,
                        "n_frames": n_frames if mtype == "video" else 1,
                        "feat_hash": h,
                    }
                )
            yield _pd.DataFrame(out, columns=out_cols)

    return sized.mapInPandas(run, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Header-level media parsing (r8 verdict task 5): the decode CONTRACT made
# real without codec libraries. PNG IHDR, BMP BITMAPINFOHEADER and WAV
# RIFF/fmt headers carry their dimensions at fixed byte offsets, so both
# the synthesis of format-valid payloads and the parse back out are pure
# JVM column arithmetic — substring on the binary column, hex, conv —
# inside whole-stage codegen, with ZERO Python in the plan. At 100 TB this
# is the shape that matters: dimension extraction reads a bounded prefix
# of each payload and never crosses into a Python worker.
# ---------------------------------------------------------------------------


def _be_enc(col, n: int):
    """Integer column -> n-byte big-endian binary (JVM-side)."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 2 * n, "0"))


def _le_enc(col, n: int):
    """Integer column -> n-byte little-endian binary: pad the hex, then
    swap byte pairs (hex chars 2i..2i+1) into reverse order."""
    h = F.lpad(F.hex(col.cast("long")), 2 * n, "0")
    pairs = [F.substring(h, 2 * i + 1, 2) for i in reversed(range(n))]
    return F.unhex(F.concat(*pairs))


def _be_int(bin_col, pos: int, n: int):
    """n bytes at 1-indexed `pos` of a binary column -> big-endian long."""
    return F.conv(F.hex(F.substring(bin_col, pos, n)), 16, 10).cast("long")


def _le_int(bin_col, pos: int, n: int):
    """n bytes at 1-indexed `pos` -> little-endian long (pair-swapped hex)."""
    h = F.hex(F.substring(bin_col, pos, n))
    pairs = [F.substring(h, 2 * i + 1, 2) for i in reversed(range(n))]
    return F.conv(F.concat(*pairs), 16, 10).cast("long")


#: magic prefixes, hex form
_PNG_SIG = "89504E470D0A1A0A"


def _lit_bin(hex_str: str):
    return F.unhex(F.lit(hex_str))


def _ascii_hex(s: str) -> str:
    return "".join(format(ord(c), "02X") for c in s)


def synth_media_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid media headers synthesized per document, dimensions a
    deterministic function of doc_id (so an oracle can replay them):
    doc_id%4==0 -> PNG (sig + IHDR chunk), ==1 -> BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER), ==2 -> WAV (RIFF + fmt + empty data chunk),
    ==3 -> GIF (GIF89a logical-screen descriptor). The
    payload bytes are REAL headers a stock decoder would accept (PNG CRC
    left zeroed — checksum, not structure); the parse path below trusts
    only the bytes, never these formulas."""
    did = F.col("doc_id")
    width = (F.lit(16) + did % 1009).cast("long")
    height = (F.lit(16) + (did * 7) % 997).cast("long")
    rate = (F.lit(8000) + (did % 8) * 4000).cast("long")
    chans = (F.lit(1) + did % 2).cast("long")
    bits = F.lit(16).cast("long")

    png = F.concat(
        _lit_bin(_PNG_SIG),
        _be_enc(F.lit(13), 4),              # IHDR length
        _lit_bin(_ascii_hex("IHDR")),
        _be_enc(width, 4), _be_enc(height, 4),
        _lit_bin("0806000000"),             # depth 8, RGBA, std flags
        _lit_bin("00000000"),               # CRC (zeroed)
    )
    bmp = F.concat(
        _lit_bin(_ascii_hex("BM")),
        _le_enc(F.lit(54), 4),              # file size (header only)
        _lit_bin("00000000"),               # reserved
        _le_enc(F.lit(54), 4),              # pixel-data offset
        _le_enc(F.lit(40), 4),              # BITMAPINFOHEADER size
        _le_enc(width, 4), _le_enc(height, 4),
        _le_enc(F.lit(1), 2),               # planes
        _le_enc(F.lit(24), 2),              # bpp
        _lit_bin("00" * 24),                # compression..palette fields
    )
    wav = F.concat(
        _lit_bin(_ascii_hex("RIFF")),
        _le_enc(F.lit(36), 4),              # chunk size (no samples)
        _lit_bin(_ascii_hex("WAVE")),
        _lit_bin(_ascii_hex("fmt ")),
        _le_enc(F.lit(16), 4),              # fmt subchunk size
        _le_enc(F.lit(1), 2),               # PCM
        _le_enc(chans, 2),
        _le_enc(rate, 4),
        _le_enc(rate * chans * (bits / F.lit(8)).cast("long"), 4),  # byte rate
        _le_enc(chans * (bits / F.lit(8)).cast("long"), 2),         # block align
        _le_enc(bits, 2),
        _lit_bin(_ascii_hex("data")),
        _le_enc(F.lit(0), 4),
    )
    gif = F.concat(
        _lit_bin(_ascii_hex("GIF89a")),
        _le_enc(width, 2), _le_enc(height, 2),   # logical screen w/h (u16)
        _lit_bin("000000"),                      # packed, bg index, aspect
        _lit_bin("3B"),                          # trailer
    )
    kind = (did % 4).cast("int")
    return docs.select(
        did.alias("asset_id"),
        F.when(kind == 0, png)
        .when(kind == 1, bmp)
        .when(kind == 2, wav)
        .otherwise(gif)
        .alias("payload"),
    )


def parse_media_headers(assets: DataFrame) -> DataFrame:
    """Dimension extraction from the binary column, trusting ONLY the
    bytes: container detected from the magic prefix, then width/height
    (PNG big-endian at IHDR offsets 17/21; BMP little-endian at
    BITMAPINFOHEADER offsets 19/23; GIF little-endian u16 at
    logical-screen offsets 7/9) or channels/sample-rate/bits (WAV fmt
    chunk offsets 23/25/35) decoded with substring+hex+conv — all inside
    whole-stage codegen, no UDF, no mapInPandas (plan-tested). Unknown
    magic -> container NULL, every field NULL."""
    p = F.col("payload")
    is_png = F.hex(F.substring(p, 1, 8)) == _PNG_SIG
    # BM alone can occur in text bytes; require the BITMAPINFOHEADER
    # size field (offset 14, LE u32 == 40) like real sniffer code does
    is_bmp = (F.hex(F.substring(p, 1, 2)) == _ascii_hex("BM")) & (
        _le_int(p, 15, 4) == 40
    )
    is_wav = (F.hex(F.substring(p, 1, 4)) == _ascii_hex("RIFF")) & (
        F.hex(F.substring(p, 9, 4)) == _ascii_hex("WAVE")
    )
    is_gif = (F.hex(F.substring(p, 1, 6)) == _ascii_hex("GIF89a")) | (
        F.hex(F.substring(p, 1, 6)) == _ascii_hex("GIF87a")
    )
    container = (
        F.when(is_png, F.lit("png"))
        .when(is_bmp, F.lit("bmp"))
        .when(is_wav, F.lit("wav"))
        .when(is_gif, F.lit("gif"))
    )
    width = (
        F.when(is_png, _be_int(p, 17, 4))
        .when(is_bmp, _le_int(p, 19, 4))
        .when(is_gif, _le_int(p, 7, 2))
    )
    height = (
        F.when(is_png, _be_int(p, 21, 4))
        .when(is_bmp, _le_int(p, 23, 4))
        .when(is_gif, _le_int(p, 9, 2))
    )
    channels = F.when(is_wav, _le_int(p, 23, 2))
    rate = F.when(is_wav, _le_int(p, 25, 4))
    bits = F.when(is_wav, _le_int(p, 35, 2))
    return assets.select(
        "asset_id",
        container.alias("container"),
        width.alias("width"),
        height.alias("height"),
        rate.alias("sample_rate"),
        channels.alias("channels"),
        bits.alias("bits_per_sample"),
    )


def parse_header_py(payload: bytes) -> dict | None:
    """The same header contract for the PYTHON decode path (decode_assets'
    mapInPandas): struct-unpack the fixed offsets. Returns None for
    unknown magic so callers can fall back to the deterministic fake."""
    import struct

    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] == bytes.fromhex(_PNG_SIG) and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return {"container": "png", "width": w, "height": h}
    if (b[:2] == b"BM" and len(b) >= 26
            and struct.unpack("<I", b[14:18])[0] == 40):
        w, h = struct.unpack("<ii", b[18:26])
        return {"container": "bmp", "width": w, "height": h}
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 36:
        chans, rate = struct.unpack("<HI", b[22:28])
        bits = struct.unpack("<H", b[34:36])[0]
        return {"container": "wav", "channels": chans, "sample_rate": rate,
                "bits_per_sample": bits}
    if b[:6] in (b"GIF89a", b"GIF87a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return {"container": "gif", "width": w, "height": h}
    return None


# ---------------------------------------------------------------------------
# Variable-offset containers (round 9): JPEG and MP3. Unlike PNG/BMP/WAV/GIF
# the interesting fields do NOT sit at fixed offsets — JPEG dimensions live
# in an SOF segment behind a chain of length-prefixed segments (APP0, COM,
# ...), and the first MPEG audio frame sits behind an ID3v2 tag whose length
# is a 4x7-bit "syncsafe" integer. Both walks are still pure JVM column
# arithmetic: a BOUNDED marker walk unrolled into nested CASE expressions
# (positions are Columns, read via Column.substr(pos, len)), so the plan
# stays inside whole-stage codegen with zero Python — the property that
# matters at 100 TB, where header sniffing runs on every ingested asset.
# Reference counterpart: the reference treats media as opaque payload
# strings; this extends the r8 header-decode contract to the two most
# common real-world containers.
# ---------------------------------------------------------------------------

#: segments the JPEG walk will skip before giving up (SOI + APP0 + COM +
#: slack; real files front-load APPn/COM before SOF)
JPEG_WALK_SEGMENTS = 5

#: MPEG1 Layer III bitrate table, kbps, indexed 1..14 (0=free, 15=bad)
MP3_BITRATES = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]

#: MPEG1 sample-rate table, indexed 0..2 (3=reserved)
MP3_RATES = [44100, 48000, 32000]


def _be_int_at(p, pos, n: int):
    """n bytes of binary col `p` at Column position `pos` (1-indexed) ->
    big-endian long. Column.substr accepts Column args, so the offset can
    be data-dependent while staying JVM-side. try_cast: a corrupted size
    field can push a walk position past int32, and an ANSI cast would
    crash the whole job — NULL position -> NULL read -> no match, the
    same rejection the Python twins produce."""
    return F.conv(
        F.hex(p.substr(pos.try_cast("int"), F.lit(n))), 16, 10
    ).cast("long")


def synth_av_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid JPEG/MP3 byte payloads per document, every field a
    deterministic function of doc_id so a SQL oracle can replay them.

    doc_id%2==0 -> JPEG: SOI + APP0/JFIF + a COM segment whose length
    VARIES with doc_id (so the SOF offset is not constant and the parser
    must genuinely walk the segment chain) + SOF0 with height/width.
    doc_id%2==1 -> MP3: ID3v2.3 tag with a variable syncsafe payload size
    (0..299, exercising the two-low-bytes encoding) + one MPEG1 Layer III
    frame header carrying bitrate/sample-rate/channel-mode."""
    did = F.col("doc_id")
    width = (F.lit(32) + did % 2021).cast("long")
    height = (F.lit(32) + (did * 11) % 1013).cast("long")
    com_len = (F.lit(1) + did % 7).cast("long")          # COM payload bytes
    jpeg = F.concat(
        _lit_bin("FFD8"),                                 # SOI
        _lit_bin("FFE00010"),                             # APP0, len 16
        _lit_bin(_ascii_hex("JFIF")), _lit_bin("00"),
        _lit_bin("010200000100010000"),                   # JFIF v1.2 body
        _lit_bin("FFFE"),                                 # COM marker
        _be_enc(com_len + 2, 2),                          # COM length
        F.unhex(F.lit("41" * 8).substr(F.lit(1), (com_len * 2).cast("int"))),
        _lit_bin("FFC00011"),                             # SOF0, len 17
        _lit_bin("08"),                                   # precision
        _be_enc(height, 2), _be_enc(width, 2),
        _lit_bin("03" "012200" "021101" "031101"),        # 3 components
    )
    tag_len = (did % 300).cast("long")                    # ID3 payload bytes
    br_idx = (F.lit(1) + did % 14).cast("long")
    sr_idx = (did % 3).cast("long")
    mode = (did % 4).cast("long")
    mp3 = F.concat(
        _lit_bin(_ascii_hex("ID3")), _lit_bin("030000"),  # v2.3, flags 0
        _lit_bin("0000"),                                 # syncsafe hi bytes
        _be_enc(F.shiftright(tag_len, 7).bitwiseAND(F.lit(127)), 1),
        _be_enc(tag_len.bitwiseAND(F.lit(127)), 1),
        F.unhex(F.lit("00" * 300).substr(F.lit(1), (tag_len * 2).cast("int"))),
        _lit_bin("FFFB"),                                 # sync+MPEG1+LayerIII
        _be_enc(br_idx * 16 + sr_idx * 4, 1),
        _be_enc(mode * 64, 1),
        _lit_bin("00000000"),                             # frame data stub
    )
    return docs.select(
        did.alias("asset_id"),
        F.when(did % 2 == 0, jpeg).otherwise(mp3).alias("payload"),
    )


def parse_av_headers(assets: DataFrame) -> DataFrame:
    """Dimension/stream-parameter extraction for JPEG and MP3, trusting
    ONLY the bytes (the synthesis formulas never appear here).

    JPEG: magic FFD8, then the segment walk — from byte 3 (after SOI),
    each step reads the 2-byte marker and advances by 2 + segment-length,
    UNCONDITIONALLY (every segment, SOF included, carries a length field,
    so marching past SOF is well-defined; reads past the payload end
    decode to 0 and the chain parks). Unconditional advance bounds
    expression growth at 2x per step — a conditional stop tripled per
    step and blew janino's 64 KB codegen method limit. coalesce picks
    the FIRST step whose marker is SOF0/1/2, exactly the walk's stop
    rule; height/width are big-endian u16 at SOF+5/SOF+7. A payload
    whose walk finds no SOF parses as NULL (strict sniffer — lookalike
    bytes don't get a container).
    MP3: an ID3v2 tag is skipped via the syncsafe length
    (b7<<21|b8<<14|b9<<7|b10, each byte masked to 7 bits); the frame
    header must carry the 11-bit sync, MPEG1 version bits and Layer III
    bits or everything is NULL. Bitrate/sample-rate decoded from the
    standard tables; channels = 1 only for mono mode (3).

    STRUCTURE NOTE: the parse is a chain of narrow projections, each
    materializing a value (segment positions, markers, frame bytes) that
    later stages reference MORE THAN ONCE. CollapseProject deliberately
    refuses to inline multiply-referenced non-cheap aliases, so every
    byte read compiles exactly once — a single flat expression here
    (tried first) duplicated the substr/hex/conv trees combinatorially
    and overran janino's 64 KB method limit, dropping the whole stage to
    the interpreter. The staged form stays one WholeStageCodegen."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    # JPEG segment chain: one position column per step, marker read once.
    df = df.withColumn("_c0", F.lit(3).cast("long"))
    for i in range(1, JPEG_WALK_SEGMENTS):
        prev = F.col(f"_c{i - 1}")
        df = df.withColumn(f"_c{i}", prev + 2 + _be_int_at(p, prev + 2, 2))
    for i in range(JPEG_WALK_SEGMENTS):
        df = df.withColumn(f"_m{i}", _be_int_at(p, F.col(f"_c{i}"), 2))
    sof = F.coalesce(
        *[
            F.when(
                (F.col(f"_m{i}") >= 0xFFC0) & (F.col(f"_m{i}") <= 0xFFC2),
                F.col(f"_c{i}"),
            )
            for i in range(JPEG_WALK_SEGMENTS)
        ]
    )
    df = df.withColumn(
        "_sof", F.when(F.hex(p.substr(1, 2)) == "FFD8", sof)
    )
    # MP3: ID3v2 skip, then the four frame-header bytes, each read once.
    byte_at = lambda pos: _be_int_at(p, pos, 1)  # noqa: E731
    syncsafe = (
        F.shiftleft(byte_at(F.lit(7).cast("long")).bitwiseAND(F.lit(127)), 21)
        + F.shiftleft(byte_at(F.lit(8).cast("long")).bitwiseAND(F.lit(127)), 14)
        + F.shiftleft(byte_at(F.lit(9).cast("long")).bitwiseAND(F.lit(127)), 7)
        + byte_at(F.lit(10).cast("long")).bitwiseAND(F.lit(127))
    )
    has_id3 = F.hex(p.substr(1, 3)) == _ascii_hex("ID3")
    df = df.withColumn(
        "_fpos", F.when(has_id3, syncsafe + 11).otherwise(F.lit(1).cast("long"))
    )
    fpos = F.col("_fpos")
    for off in range(4):
        df = df.withColumn(f"_b{off + 1}", byte_at(fpos + off))
    b1, b2, b3, b4 = (F.col(f"_b{i}") for i in (1, 2, 3, 4))
    sync_ok = (b1 == 0xFF) & (b2.bitwiseAND(F.lit(0xE0)) == 0xE0)
    is_mpeg1 = F.shiftright(b2, 3).bitwiseAND(F.lit(3)) == 3
    is_layer3 = F.shiftright(b2, 1).bitwiseAND(F.lit(3)) == 1
    df = df.withColumn("_br_idx", F.shiftright(b3, 4))
    df = df.withColumn("_sr_idx", F.shiftright(b3, 2).bitwiseAND(F.lit(3)))
    br_idx, sr_idx = F.col("_br_idx"), F.col("_sr_idx")
    # Reserved table slots (bitrate index 0 = "free", 15 = "bad"; sample-
    # rate index 3 = "reserved") reject the whole frame — same strict
    # contract as parse_av_header_py, which returns None for them.
    idx_ok = (br_idx != 0) & (br_idx != 15) & (sr_idx != 3)
    df = df.withColumn("_frame_ok", sync_ok & is_mpeg1 & is_layer3 & idx_ok)
    mode = F.shiftright(b4, 6)
    bitrate = F.when(br_idx == 0, F.lit(None).cast("long"))
    for i in range(1, 15):
        bitrate = bitrate.when(br_idx == i, F.lit(MP3_BITRATES[i]).cast("long"))
    rate = F.when(sr_idx == 0, F.lit(MP3_RATES[0]).cast("long"))
    for i in (1, 2):
        rate = rate.when(sr_idx == i, F.lit(MP3_RATES[i]).cast("long"))
    channels = F.when(mode == 3, F.lit(1)).otherwise(F.lit(2)).cast("long")

    sof = F.col("_sof")
    # dims live at SOF+5..SOF+8: a payload truncated inside them rejects
    # (the Python twin's pos+9 > len guard), not "jpeg with NULL dims"
    jpeg_found = sof.isNotNull() & (sof + 8 <= F.octet_length(p))
    mp3_found = sof.isNull() & F.col("_frame_ok")
    container = F.when(jpeg_found, F.lit("jpeg")).when(mp3_found, F.lit("mp3"))
    return df.select(
        "asset_id",
        container.alias("container"),
        F.when(jpeg_found, _be_int_at(p, sof + 7, 2)).alias("width"),
        F.when(jpeg_found, _be_int_at(p, sof + 5, 2)).alias("height"),
        F.when(mp3_found, rate).alias("sample_rate"),
        F.when(mp3_found, channels).alias("channels"),
        F.when(mp3_found, bitrate).alias("bitrate_kbps"),
    )


def parse_av_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_av_headers (same strict contract),
    for the mapInPandas decode route and for boundary tests."""
    import struct

    if payload is None:
        return None
    b = bytes(payload)
    if b[:2] == b"\xff\xd8":
        pos = 2  # 0-indexed
        for _ in range(JPEG_WALK_SEGMENTS):
            if pos + 4 > len(b):
                return None
            marker = struct.unpack(">H", b[pos:pos + 2])[0]
            if 0xFFC0 <= marker <= 0xFFC2:
                if pos + 9 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[pos + 5:pos + 9])
                return {"container": "jpeg", "width": w, "height": h}
            pos += 2 + struct.unpack(">H", b[pos + 2:pos + 4])[0]
        return None
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21 | (b[7] & 0x7F) << 14
                | (b[8] & 0x7F) << 7 | (b[9] & 0x7F))
        pos = 10 + size
    if pos + 4 > len(b):
        return None
    b1, b2, b3, b4 = b[pos:pos + 4]
    if not (b1 == 0xFF and (b2 & 0xE0) == 0xE0
            and (b2 >> 3) & 3 == 3 and (b2 >> 1) & 3 == 1):
        return None
    br_idx, sr_idx, mode = b3 >> 4, (b3 >> 2) & 3, b4 >> 6
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    return {"container": "mp3", "sample_rate": MP3_RATES[sr_idx],
            "channels": 1 if mode == 3 else 2,
            "bitrate_kbps": MP3_BITRATES[br_idx]}


# ---------------------------------------------------------------------------
# Nested containers (round 10): MP4 / ISO-BMFF. The capstone variable-offset
# shape — unlike JPEG's flat segment chain, ISO-BMFF is a TREE of
# length-prefixed boxes ([u32 size][4cc type][payload]), and the interesting
# fields sit two levels down: moov/mvhd carries timescale+duration,
# moov/trak/tkhd carries the 16.16-fixed width/height. The walk is three
# bounded box scans (top level -> moov children -> trak children), each an
# unrolled chain of staged projections exactly like the JPEG walk, so the
# whole parse stays one WholeStageCodegen stage with zero Python.
# Reference counterpart: the reference treats media as opaque payload
# strings (app/GmallLoggerApplication ingest path); this extends the
# r8/r9 header-decode contract to the dominant real-world video container.
# ---------------------------------------------------------------------------

#: top-level boxes the walk will scan (ftyp + free + moov + mdat layout)
MP4_TOP_STEPS = 4
#: moov children scanned (udta + mvhd + free + trak + slack)
MP4_MOOV_STEPS = 5
#: trak children scanned (edts + tkhd + slack)
MP4_TRAK_STEPS = 3

#: unity transform matrix, 36 bytes (mvhd and tkhd share it)
_MP4_UNITY_MATRIX = (
    "00010000" "00000000" "00000000"
    "00000000" "00010000" "00000000"
    "00000000" "00000000" "40000000"
)


def _fourcc_at(p, pos):
    """4 bytes of binary col `p` at Column position `pos` (1-indexed) as a
    hex string, for 4cc comparisons. try_cast for the same overflow-
    rejection as _be_int_at."""
    return F.hex(p.substr(pos.try_cast("int"), F.lit(4)))


def synth_mp4_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid ISO-BMFF payloads per document, every field and every
    box size a deterministic function of doc_id so a SQL oracle can replay
    them. Layout (all boxes real, sizes honest):

      ftyp (16 + 4k bytes, k = doc_id%3 compatible brands)
      free (8 + doc_id%19)                       <- shifts moov
      moov
        udta (8 + doc_id%17)                     <- shifts mvhd
        mvhd (108, v0: timescale + duration)
        free (8 + doc_id%13)                     <- shifts trak
        trak
          edts (8 + doc_id%11)                   <- shifts tkhd
          tkhd (92, v0: width/height 16.16 fixed)
      mdat (8 + doc_id%9)                        <- moov is not last

    Four independent filler sizes make every interesting offset data-
    dependent at every nesting level: a parser that hard-codes any offset
    breaks the oracle hash. The parse path below trusts only the bytes."""
    did = F.col("doc_id")
    w = (F.lit(16) + did % 1200).cast("long")
    h = (F.lit(16) + (did * 13) % 900).cast("long")
    ts = F.element_at(
        F.array(F.lit(600), F.lit(1000), F.lit(90000)),
        (did % 3 + 1).cast("int"),
    ).cast("long")
    dur = (F.lit(1) + did % 100000).cast("long")
    k = (did % 3).cast("long")
    f1 = (did % 19).cast("long")
    f2 = (did % 17).cast("long")
    f3 = (did % 13).cast("long")
    f4 = (did % 11).cast("long")
    m = (did % 9).cast("long")

    def pad(nbytes, maxn: int):
        return F.unhex(F.lit("00" * maxn).substr(F.lit(1), (nbytes * 2).cast("int")))

    def box(fourcc: str, size, *body):
        return F.concat(_be_enc(size, 4), _lit_bin(_ascii_hex(fourcc)), *body)

    ftyp = box(
        "ftyp", F.lit(16) + k * 4,
        _lit_bin(_ascii_hex("isom")), _lit_bin("00000000"),
        F.unhex(F.lit(_ascii_hex("mp42") * 2).substr(F.lit(1), (k * 8).cast("int"))),
    )
    mvhd = box(
        "mvhd", F.lit(108),
        _lit_bin("00000000"),                      # version 0, flags
        _be_enc(did % 65536, 4),                   # creation time
        _be_enc((did * 3) % 65536, 4),             # modification time
        _be_enc(ts, 4), _be_enc(dur, 4),
        _lit_bin("00010000"), _lit_bin("0100"),    # rate 1.0, volume 1.0
        _lit_bin("00" * 10),                       # reserved
        _lit_bin(_MP4_UNITY_MATRIX),
        _lit_bin("00" * 24),                       # pre_defined
        _be_enc(F.lit(2), 4),                      # next_track_ID
    )
    tkhd = box(
        "tkhd", F.lit(92),
        _lit_bin("00000007"),                      # version 0, flags enabled
        _be_enc(did % 65536, 4),                   # creation time
        _be_enc((did * 3) % 65536, 4),             # modification time
        _be_enc(F.lit(1), 4),                      # track_ID
        _lit_bin("00000000"),                      # reserved
        _be_enc(dur, 4),
        _lit_bin("00" * 8),                        # reserved
        _lit_bin("00" * 8),                        # layer/alt/volume/reserved
        _lit_bin(_MP4_UNITY_MATRIX),
        _be_enc(F.shiftleft(w, 16), 4),            # width, 16.16 fixed
        _be_enc(F.shiftleft(h, 16), 4),            # height, 16.16 fixed
    )
    edts = box("edts", F.lit(8) + f4, pad(f4, 10))
    trak_sz = F.lit(8) + (F.lit(8) + f4) + F.lit(92)
    trak = box("trak", trak_sz, edts, tkhd)
    udta = box("udta", F.lit(8) + f2, pad(f2, 16))
    free_in = box("free", F.lit(8) + f3, pad(f3, 12))
    moov_sz = F.lit(8) + (F.lit(8) + f2) + F.lit(108) + (F.lit(8) + f3) + trak_sz
    moov = box("moov", moov_sz, udta, mvhd, free_in, trak)
    free_top = box("free", F.lit(8) + f1, pad(f1, 18))
    mdat = box("mdat", F.lit(8) + m, pad(m, 8))
    return docs.select(
        did.alias("asset_id"),
        F.concat(ftyp, free_top, moov, mdat).alias("payload"),
    )


def parse_mp4_headers(assets: DataFrame) -> DataFrame:
    """ISO-BMFF metadata extraction trusting ONLY the bytes (the synthesis
    formulas never appear here). Sniff: bytes 5-8 == 'ftyp' and at least
    the 16-byte minimal ftyp present. Then three bounded box walks:

      top level      -> first 'moov' box
      moov children  -> first 'mvhd' (v0; timescale at +20, duration at
                        +24) and first 'trak'
      trak children  -> first 'tkhd' (v0; width/height 16.16 fixed at
                        +84/+88, integer part reported)

    Every walk advances UNCONDITIONALLY by the box's u32 size (reads past
    the payload decode to 0 and the chain parks; a zero size re-tests the
    same box, bounded by the unroll) — the same 2x-per-step growth
    discipline as the JPEG walk. A match requires the 4cc, the full box
    header inside the PARENT's extent, the box size covering every field
    read, and version 0 — so truncated or foreign bytes never leak a
    field. No mvhd or no tkhd -> container NULL (strict sniffer).
    Returns (asset_id, container, width, height, timescale, duration_ms)
    with duration_ms = floor(duration * 1000 / timescale).

    STRUCTURE NOTE: staged withColumn projections, one per box position /
    type read, for the same reason as parse_av_headers — CollapseProject
    keeps multiply-referenced non-cheap aliases, so every byte read
    compiles once and the whole parse stays ONE WholeStageCodegen stage
    (plan-tested)."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    n = F.col("_n")
    ftyp_ok = (n >= 16) & (_fourcc_at(p, F.lit(5)) == F.lit(_ascii_hex("ftyp")))

    # top-level walk: positions + 4cc per step
    df = df.withColumn("_t0", F.lit(1).cast("long"))
    for i in range(1, MP4_TOP_STEPS):
        prev = F.col(f"_t{i - 1}")
        df = df.withColumn(f"_t{i}", prev + _be_int_at(p, prev, 4))
    for i in range(MP4_TOP_STEPS):
        df = df.withColumn(f"_tc{i}", _fourcc_at(p, F.col(f"_t{i}") + 4))
    moov = F.coalesce(
        *[
            F.when(
                (F.col(f"_tc{i}") == F.lit(_ascii_hex("moov")))
                & (F.col(f"_t{i}") + 8 <= n + 1),
                F.col(f"_t{i}"),
            )
            for i in range(MP4_TOP_STEPS)
        ]
    )
    df = df.withColumn("_mv", F.when(ftyp_ok, moov))
    df = df.withColumn("_mvend", F.col("_mv") + _be_int_at(p, F.col("_mv"), 4))
    mvend = F.col("_mvend")

    # moov children walk
    df = df.withColumn("_d0", F.col("_mv") + 8)
    for i in range(1, MP4_MOOV_STEPS):
        prev = F.col(f"_d{i - 1}")
        df = df.withColumn(f"_d{i}", prev + _be_int_at(p, prev, 4))
    for i in range(MP4_MOOV_STEPS):
        df = df.withColumn(f"_dc{i}", _fourcc_at(p, F.col(f"_d{i}") + 4))
        df = df.withColumn(f"_ds{i}", _be_int_at(p, F.col(f"_d{i}"), 4))

    def _child(fourcc: str, min_size: int, steps: int, pos_pfx: str,
               cc_pfx: str, sz_pfx: str, end_col):
        return F.coalesce(
            *[
                F.when(
                    (F.col(f"{cc_pfx}{i}") == F.lit(_ascii_hex(fourcc)))
                    & (F.col(f"{pos_pfx}{i}") + min_size <= end_col)
                    & (F.col(f"{pos_pfx}{i}") + min_size <= n + 1)
                    & (F.col(f"{sz_pfx}{i}") >= min_size)
                    & (_be_int_at(p, F.col(f"{pos_pfx}{i}") + 8, 1) == 0),
                    F.col(f"{pos_pfx}{i}"),
                )
                for i in range(steps)
            ]
        )

    # mvhd v0: fields end at +27 -> min_size 28; tkhd v0: height ends at
    # +91 -> min_size 92. trak is a pure container: header-only check,
    # no version byte (the all-boxes condition would wrongly read its
    # first child's size field), so it gets its own matcher.
    df = df.withColumn(
        "_mvhd", _child("mvhd", 28, MP4_MOOV_STEPS, "_d", "_dc", "_ds", mvend)
    )
    trak = F.coalesce(
        *[
            F.when(
                (F.col(f"_dc{i}") == F.lit(_ascii_hex("trak")))
                & (F.col(f"_d{i}") + 8 <= mvend)
                & (F.col(f"_d{i}") + 8 <= n + 1),
                F.col(f"_d{i}"),
            )
            for i in range(MP4_MOOV_STEPS)
        ]
    )
    df = df.withColumn("_tk", trak)
    df = df.withColumn("_tkend", F.col("_tk") + _be_int_at(p, F.col("_tk"), 4))

    # trak children walk
    df = df.withColumn("_e0", F.col("_tk") + 8)
    for i in range(1, MP4_TRAK_STEPS):
        prev = F.col(f"_e{i - 1}")
        df = df.withColumn(f"_e{i}", prev + _be_int_at(p, prev, 4))
    for i in range(MP4_TRAK_STEPS):
        df = df.withColumn(f"_ec{i}", _fourcc_at(p, F.col(f"_e{i}") + 4))
        df = df.withColumn(f"_es{i}", _be_int_at(p, F.col(f"_e{i}"), 4))
    df = df.withColumn(
        "_tkhd",
        _child("tkhd", 92, MP4_TRAK_STEPS, "_e", "_ec", "_es", F.col("_tkend")),
    )

    mvhd, tkhd = F.col("_mvhd"), F.col("_tkhd")
    found = mvhd.isNotNull() & tkhd.isNotNull()
    ts = _be_int_at(p, mvhd + 20, 4)
    dur = _be_int_at(p, mvhd + 24, 4)
    return df.select(
        "asset_id",
        F.when(found, F.lit("mp4")).alias("container"),
        F.when(found, F.shiftright(_be_int_at(p, tkhd + 84, 4), 16)).alias("width"),
        F.when(found, F.shiftright(_be_int_at(p, tkhd + 88, 4), 16)).alias("height"),
        F.when(found, ts).alias("timescale"),
        F.when(found & (ts > 0), F.floor(dur * 1000 / ts).cast("long")).alias(
            "duration_ms"
        ),
    )


def parse_mp4_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_mp4_headers (same strict contract),
    for the mapInPandas decode route and for boundary tests."""
    import struct

    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n < 16 or b[4:8] != b"ftyp":
        return None

    def u32(o: int) -> int:
        chunk = b[o:o + 4]
        return struct.unpack(">I", chunk)[0] if len(chunk) == 4 else (
            int.from_bytes(chunk, "big") if chunk else 0
        )

    def walk(start: int, steps: int):
        pos, out = start, []
        for _ in range(steps):
            out.append(pos)
            pos += u32(pos)
        return out

    def find(cands, fourcc: bytes, min_size: int, end: int, versioned: bool):
        for c in cands:
            if (b[c + 4:c + 8] == fourcc and c + min_size <= end
                    and c + min_size <= n
                    and (not versioned or (u32(c) >= min_size and b[c + 8] == 0))):
                return c
        return None

    moov = find(walk(0, MP4_TOP_STEPS), b"moov", 8, n, versioned=False)
    if moov is None:
        return None
    mvend = moov + u32(moov)
    kids = walk(moov + 8, MP4_MOOV_STEPS)
    mvhd = find(kids, b"mvhd", 28, mvend, versioned=True)
    trak = find(kids, b"trak", 8, mvend, versioned=False)
    if mvhd is None or trak is None:
        return None
    tkhd = find(
        walk(trak + 8, MP4_TRAK_STEPS), b"tkhd", 92, trak + u32(trak),
        versioned=True,
    )
    if tkhd is None:
        return None
    ts, dur = u32(mvhd + 20), u32(mvhd + 24)
    return {
        "container": "mp4",
        "width": u32(tkhd + 84) >> 16,
        "height": u32(tkhd + 88) >> 16,
        "timescale": ts,
        "duration_ms": dur * 1000 // ts if ts > 0 else None,
    }


# ---------------------------------------------------------------------------
# Self-describing byte order (round 10): TIFF/EXIF. A decode shape none of
# the seven other containers has — the file's FIRST TWO BYTES ('II' or 'MM')
# select the endianness for EVERY subsequent integer, so each u16/u32 read
# is itself a per-row conditional. Fields live in a tag directory (IFD): a
# u16 entry count then 12-byte entries sorted by tag, each carrying
# (tag, type, count, value); SHORT values sit in the value field's first
# two bytes, LONG in all four. Width=256, Height=257, Orientation=274.
# ---------------------------------------------------------------------------

#: IFD entries the scan will examine (synth emits 4-6 + slack)
TIFF_IFD_ENTRIES = 7


def _le_int_at(p, pos, n: int):
    """n bytes of binary col `p` at Column position `pos` (1-indexed) ->
    little-endian long (pair-swapped hex, the Column-position twin of
    _le_int). try_cast for the same overflow-rejection as _be_int_at."""
    h = F.hex(p.substr(pos.try_cast("int"), F.lit(n)))
    pairs = [F.substring(h, 2 * i + 1, 2) for i in reversed(range(n))]
    return F.conv(F.concat(*pairs), 16, 10).cast("long")


def synth_tiff_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid TIFF headers per document, every field a deterministic
    function of doc_id so a SQL oracle can replay them. Both byte orders
    ship (doc_id%2==0 -> 'II' little-endian, ==1 -> 'MM' big-endian) and
    the IFD itself moves (a doc_id%23-byte gap precedes it, exercised via
    the header's IFD-offset u32). The directory holds 4-6 entries sorted
    by tag — NewSubfileType (present iff doc_id%5<2) and SamplesPerPixel
    (iff doc_id%7<4) shift the positions of the graded tags — and the
    width/height entries flip between SHORT and LONG storage
    (doc_id%4<2 / doc_id%3<2), so the parser must honor the type field,
    not just the tag. The parse path below trusts only the bytes."""
    did = F.col("doc_id")
    le = did % 2 == 0
    w = (F.lit(16) + did % 4000).cast("long")
    h = (F.lit(16) + (did * 11) % 3000).cast("long")
    orient = (F.lit(1) + did % 8).cast("long")
    g = (did % 23).cast("long")
    has_254 = did % 5 < 2
    has_277 = did % 7 < 4
    w_short = did % 4 < 2
    h_short = did % 3 < 2

    def enc2(v):
        return F.when(le, _le_enc(v, 2)).otherwise(_be_enc(v, 2))

    def enc4(v):
        return F.when(le, _le_enc(v, 4)).otherwise(_be_enc(v, 4))

    def entry(tag: int, is_short, val):
        # count is always 1; SHORT packs into the value field's first
        # two bytes (file byte order), LONG fills all four
        return F.concat(
            enc2(F.lit(tag)),
            enc2(F.when(is_short, F.lit(3)).otherwise(F.lit(4))),
            enc4(F.lit(1)),
            F.when(is_short, F.concat(enc2(val), _lit_bin("0000"))).otherwise(
                enc4(val)
            ),
        )

    def opt(cond, body):
        return F.when(cond, body).otherwise(F.unhex(F.lit("")))

    t, f = F.lit(True), F.lit(False)
    cnt = (
        F.lit(4) + has_254.cast("long") + has_277.cast("long")
    ).cast("long")
    ifd = F.concat(
        enc2(cnt),
        opt(has_254, entry(254, f, F.lit(0))),            # NewSubfileType, LONG
        entry(256, w_short, w),                           # ImageWidth
        entry(257, h_short, h),                           # ImageLength
        entry(258, t, F.lit(8)),                          # BitsPerSample
        entry(274, t, orient),                            # Orientation
        opt(has_277, entry(277, t, F.lit(3))),            # SamplesPerPixel
        enc4(F.lit(0)),                                   # next IFD: none
    )
    header = F.concat(
        F.when(le, _lit_bin(_ascii_hex("II"))).otherwise(_lit_bin(_ascii_hex("MM"))),
        enc2(F.lit(42)),
        enc4(F.lit(8) + g),
    )
    pad = F.unhex(F.lit("00" * 22).substr(F.lit(1), (g * 2).cast("int")))
    return docs.select(
        did.alias("asset_id"),
        F.concat(header, pad, ifd).alias("payload"),
    )


def parse_tiff_headers(assets: DataFrame) -> DataFrame:
    """TIFF tag-directory extraction trusting ONLY the bytes. Sniff:
    byte order 'II' or 'MM' and the magic u16 42 read IN THAT ORDER; then
    the u32 IFD offset is followed, the entry count read, and up to
    TIFF_IFD_ENTRIES 12-byte entries scanned for ImageWidth(256),
    ImageLength(257) and Orientation(274). A tag matches only if its
    entry index is under the directory's count, the full entry lies
    inside the payload, its count field is 1, and its type is SHORT(3)
    or LONG(4) — the value then decodes per the type (SHORT from the
    value field's first two bytes) in the file's byte order. Missing
    width or height -> container NULL (strict sniffer).

    Every integer read is endianness-conditional on the staged '_le'
    flag — the self-describing-byte-order property this container class
    exists to exercise. Same staging discipline as the other walks:
    one WholeStageCodegen stage, zero Python, zero shuffle
    (plan-tested)."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    n = F.col("_n")
    df = df.withColumn("_le", F.hex(p.substr(1, 2)) == F.lit(_ascii_hex("II")))
    le = F.col("_le")
    order_ok = le | (F.hex(p.substr(1, 2)) == F.lit(_ascii_hex("MM")))

    def u16(pos):
        return F.when(le, _le_int_at(p, pos, 2)).otherwise(_be_int_at(p, pos, 2))

    def u32(pos):
        return F.when(le, _le_int_at(p, pos, 4)).otherwise(_be_int_at(p, pos, 4))

    hdr_ok = order_ok & (n >= 8) & (u16(F.lit(3)) == 42)
    df = df.withColumn("_ifd", F.when(hdr_ok, u32(F.lit(5)) + 1))
    ifd = F.col("_ifd")
    df = df.withColumn("_cnt", u16(ifd))
    cnt = F.col("_cnt")
    for i in range(TIFF_IFD_ENTRIES):
        df = df.withColumn(f"_e{i}", ifd + 2 + 12 * i)
    for i in range(TIFF_IFD_ENTRIES):
        e = F.col(f"_e{i}")
        df = df.withColumn(f"_tag{i}", u16(e))
        df = df.withColumn(f"_ty{i}", u16(e + 2))
        df = df.withColumn(f"_ct{i}", u32(e + 4))
        df = df.withColumn(
            f"_v{i}",
            F.when(F.col(f"_ty{i}") == 3, u16(e + 8)).when(
                F.col(f"_ty{i}") == 4, u32(e + 8)
            ),
        )

    def tag_val(tag: int):
        return F.coalesce(
            *[
                F.when(
                    (F.lit(i) < cnt)
                    & (F.col(f"_e{i}") + 12 <= n + 1)
                    & (F.col(f"_tag{i}") == tag)
                    & (F.col(f"_ct{i}") == 1)
                    & F.col(f"_ty{i}").isin(3, 4),
                    F.col(f"_v{i}"),
                )
                for i in range(TIFF_IFD_ENTRIES)
            ]
        )

    width, height, orient = tag_val(256), tag_val(257), tag_val(274)
    found = width.isNotNull() & height.isNotNull()
    return df.select(
        "asset_id",
        F.when(found, F.lit("tiff")).alias("container"),
        F.when(found, F.when(le, F.lit("II")).otherwise(F.lit("MM"))).alias(
            "byte_order"
        ),
        F.when(found, width).alias("width"),
        F.when(found, height).alias("height"),
        F.when(found, orient).alias("orientation"),
    )


def parse_tiff_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_tiff_headers (same strict contract),
    for the mapInPandas decode route and for boundary tests."""
    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n < 8 or b[:2] not in (b"II", b"MM"):
        return None
    endian = "little" if b[:2] == b"II" else "big"

    def u(o: int, width: int) -> int:
        return int.from_bytes(b[o:o + width], endian) if o + width <= n else (
            int.from_bytes(b[o:], endian) if o < n else 0
        )

    if u(2, 2) != 42:
        return None
    ifd = u(4, 4)
    cnt = u(ifd, 2)
    vals: dict[int, int] = {}
    for i in range(TIFF_IFD_ENTRIES):
        e = ifd + 2 + 12 * i
        if i >= cnt or e + 12 > n:
            continue
        tag, ty, ct = u(e, 2), u(e + 2, 2), u(e + 4, 4)
        if ct != 1 or ty not in (3, 4):
            continue
        if tag in (256, 257, 274) and tag not in vals:
            vals[tag] = u(e + 8, 2 if ty == 3 else 4)
    if 256 not in vals or 257 not in vals:
        return None
    return {
        "container": "tiff",
        "byte_order": b[:2].decode(),
        "width": vals[256],
        "height": vals[257],
        "orientation": vals.get(274),
    }


# ---------------------------------------------------------------------------
# Bit-packed fields (round 10): WebP. A RIFF container whose three
# sub-formats each encode dimensions differently — VP8 (lossy): 14-bit
# dims behind a 3-byte frame tag + the 9D 01 2A sync code; VP8L
# (lossless): width-1 and height-1 packed as TWO 14-BIT BITFIELDS inside
# one little-endian u32 (the sub-byte decode shape none of the other
# containers has); VP8X (extended): 24-bit minus-one dims. One parser
# dispatches on the chunk fourcc and must honor each packing.
# ---------------------------------------------------------------------------


def synth_webp_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid WebP payloads per document (doc_id%3 picks the
    sub-format: 0 -> VP8 lossy, 1 -> VP8L lossless, 2 -> VP8X extended),
    dimensions deterministic functions of doc_id so a SQL oracle can
    replay them. Sizes and sync/signature bytes are honest; the parse
    path below trusts only the bytes."""
    did = F.col("doc_id")
    w = (F.lit(1) + did % 4000).cast("long")
    h = (F.lit(1) + (did * 7) % 3000).cast("long")
    vp8_payload = F.concat(
        _lit_bin("000000"),                       # frame tag (keyframe)
        _lit_bin("9D012A"),                       # sync code
        _le_enc(w, 2), _le_enc(h, 2),             # 14-bit dims, scale 0
    )
    vp8l_bits = (w - 1) + F.shiftleft(h - 1, 14)  # two 14-bit fields
    vp8l_payload = F.concat(_lit_bin("2F"), _le_enc(vp8l_bits, 4))
    vp8x_payload = F.concat(
        _lit_bin("00"), _lit_bin("000000"),       # flags + reserved
        _le_enc(w - 1, 3), _le_enc(h - 1, 3),     # 24-bit minus-one dims
    )
    kind = (did % 3).cast("int")
    chunk = (
        F.when(kind == 0, F.concat(_lit_bin(_ascii_hex("VP8 ")),
                                   _le_enc(F.lit(10), 4), vp8_payload))
        .when(kind == 1, F.concat(_lit_bin(_ascii_hex("VP8L")),
                                  _le_enc(F.lit(5), 4), vp8l_payload))
        .otherwise(F.concat(_lit_bin(_ascii_hex("VP8X")),
                            _le_enc(F.lit(10), 4), vp8x_payload))
    )
    riff_size = F.lit(4 + 8) + F.when(kind == 1, F.lit(5)).otherwise(F.lit(10))
    return docs.select(
        did.alias("asset_id"),
        F.concat(
            _lit_bin(_ascii_hex("RIFF")), _le_enc(riff_size, 4),
            _lit_bin(_ascii_hex("WEBP")), chunk,
        ).alias("payload"),
    )


def parse_webp_headers(assets: DataFrame) -> DataFrame:
    """WebP dimension extraction trusting ONLY the bytes: RIFF....WEBP
    sniff, then dispatch on the first chunk's fourcc —

      VP8  : sync 9D 01 2A at payload+3, then u16le & 0x3FFF dims
      VP8L : 0x2F signature, then (u32le & 0x3FFF) + 1 and
             ((u32le >> 14) & 0x3FFF) + 1 — sub-byte bitfields
      VP8X : u24le + 1 dims after flags/reserved

    Bad sync/signature or an unknown fourcc -> everything NULL (strict
    sniffer). Fixed offsets, pure JVM bit arithmetic, zero Python, one
    codegen stage (plan-tested)."""
    p = F.col("payload")
    n = F.octet_length(p).cast("long")
    is_riff = (F.hex(p.substr(1, 4)) == _ascii_hex("RIFF")) & (
        F.hex(p.substr(9, 4)) == _ascii_hex("WEBP")
    )
    cc = F.hex(p.substr(13, 4))
    # each sub-format requires its dimension fields fully present —
    # truncated chunks reject rather than decoding partial bytes
    vp8_ok = is_riff & (cc == _ascii_hex("VP8 ")) & (
        F.hex(p.substr(24, 3)) == "9D012A"
    ) & (n >= 30)
    vp8l_ok = is_riff & (cc == _ascii_hex("VP8L")) & (
        F.hex(p.substr(21, 1)) == "2F"
    ) & (n >= 25)
    vp8x_ok = is_riff & (cc == _ascii_hex("VP8X")) & (n >= 30)
    lbits = _le_int(p, 22, 4)
    fmt = (
        F.when(vp8_ok, F.lit("vp8"))
        .when(vp8l_ok, F.lit("vp8l"))
        .when(vp8x_ok, F.lit("vp8x"))
    )
    width = (
        F.when(vp8_ok, _le_int(p, 27, 2).bitwiseAND(F.lit(0x3FFF)))
        .when(vp8l_ok, lbits.bitwiseAND(F.lit(0x3FFF)) + 1)
        .when(vp8x_ok, _le_int(p, 25, 3) + 1)
    )
    height = (
        F.when(vp8_ok, _le_int(p, 29, 2).bitwiseAND(F.lit(0x3FFF)))
        .when(vp8l_ok, F.shiftright(lbits, 14).bitwiseAND(F.lit(0x3FFF)) + 1)
        .when(vp8x_ok, _le_int(p, 28, 3) + 1)
    )
    return assets.select(
        "asset_id",
        F.when(fmt.isNotNull(), F.lit("webp")).alias("container"),
        fmt.alias("format"),
        width.alias("width"),
        height.alias("height"),
    )


def parse_webp_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_webp_headers (same strict contract),
    for the mapInPandas decode route and for boundary tests."""
    import struct

    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 21 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None

    def le(o: int, n: int) -> int:
        chunk = b[o:o + n]
        return int.from_bytes(chunk, "little") if chunk else 0

    cc = b[12:16]
    if cc == b"VP8 " and b[23:26] == b"\x9d\x01\x2a" and len(b) >= 30:
        return {"container": "webp", "format": "vp8",
                "width": le(26, 2) & 0x3FFF, "height": le(28, 2) & 0x3FFF}
    if cc == b"VP8L" and b[20:21] == b"\x2f" and len(b) >= 25:
        bits = le(21, 4)
        return {"container": "webp", "format": "vp8l",
                "width": (bits & 0x3FFF) + 1,
                "height": ((bits >> 14) & 0x3FFF) + 1}
    if cc == b"VP8X" and len(b) >= 30:
        return {"container": "webp", "format": "vp8x",
                "width": le(24, 3) + 1, "height": le(27, 3) + 1}
    return None


# ---------------------------------------------------------------------------
# Descriptor-driven layouts (round 10): compression frame headers. Corpus
# shards ship gzip/zstd-compressed; manifest builders read frame headers
# without decompressing. zstd (RFC 8878 §3.1.1) is the interesting shape:
# ONE descriptor byte decides which later fields exist and how wide they
# are — window descriptor present only without Single_Segment, dictionary
# ID 0/1/2/4 bytes by DID flag, frame content size 0/1/2/4/8 bytes by FCS
# flag (+256 bias in the 2-byte form) — so every field offset AND width
# is data-dependent, with no chain to walk. gzip (RFC 1952) is the fixed
# sibling (mtime/OS at constant offsets).
# ---------------------------------------------------------------------------

ZSTD_MAGIC = "28B52FFD"  # hex of the little-endian magic 0xFD2FB528


def synth_compression_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid compression frame headers per document: odd doc_id ->
    a zstd frame header with every descriptor combination exercised
    (k = (doc_id-1)/2 drives FCS flag k%4, Single_Segment k%5<2,
    checksum k%7<3, DID flag (k/4)%4), even doc_id -> a gzip member
    header (mtime/OS from m = doc_id/2). All field widths and the +256
    two-byte content-size bias are per RFC; the parse path below trusts
    only the bytes."""
    did = F.col("doc_id")
    k = ((did - 1) / 2).cast("long")
    fcs_flag = (k % 4).cast("long")
    ss = (k % 5 < 2).cast("long")
    cksum = (k % 7 < 3).cast("long")
    dflag = ((k / 4).cast("long") % 4).cast("long")
    fhd = F.shiftleft(fcs_flag, 6) + F.shiftleft(ss, 5) + F.shiftleft(cksum, 2) + dflag
    wd = (k % 256).cast("long")
    dict_id = F.when(dflag == 1, k % 256).when(dflag == 2, k % 65536).when(
        dflag == 3, k % 2147483648
    )
    cs = (
        F.when((fcs_flag == 0) & (ss == 1), k % 256)
        .when(fcs_flag == 1, 256 + k % 65536)
        .when(fcs_flag == 2, k % 2147483648)
        .when(fcs_flag == 3, k % (1 << 40))
    )
    empty = F.unhex(F.lit(""))
    zstd = F.concat(
        _lit_bin(ZSTD_MAGIC),
        _be_enc(fhd, 1),
        F.when(ss == 0, _le_enc(wd, 1)).otherwise(empty),
        F.when(dflag == 1, _le_enc(dict_id, 1))
        .when(dflag == 2, _le_enc(dict_id, 2))
        .when(dflag == 3, _le_enc(dict_id, 4))
        .otherwise(empty),
        F.when((fcs_flag == 0) & (ss == 1), _le_enc(cs, 1))
        .when(fcs_flag == 1, _le_enc(cs - 256, 2))
        .when(fcs_flag == 2, _le_enc(cs, 4))
        .when(fcs_flag == 3, _le_enc(cs, 8))
        .otherwise(empty),
        _lit_bin("00" * 3),  # first block header stub
    )
    m = (did / 2).cast("long")
    gzip = F.concat(
        _lit_bin("1F8B08"),                 # magic + CM=deflate
        _lit_bin("00"),                     # FLG
        _le_enc(m % 2147483648, 4),         # MTIME
        _lit_bin("00"),                     # XFL
        _be_enc(m % 14, 1),                 # OS
        _lit_bin("00" * 4),                 # deflate stream stub
    )
    return docs.select(
        did.alias("asset_id"),
        F.when(did % 2 == 1, zstd).otherwise(gzip).alias("payload"),
    )


def parse_compression_headers(assets: DataFrame) -> DataFrame:
    """Frame-header extraction trusting ONLY the bytes. zstd: magic, then
    the descriptor byte routes every later read — window descriptor only
    without Single_Segment (window = 2^(10+wd>>3) + (that/8)*(wd&7); with
    Single_Segment the window IS the content size), dictionary ID 0/1/2/4
    bytes, content size 0/1/2/4/8 bytes with the +256 two-byte bias. A
    set reserved bit (bit 3) rejects the frame per RFC 8878. gzip: magic
    1F 8B 08, then mtime u32le at 5 and OS at 10. Everything else ->
    NULL. Pure JVM column arithmetic, one codegen stage, zero Python,
    zero shuffle (plan-tested)."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_fhd", _be_int_at(p, F.lit(5), 1))
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    fhd, n = F.col("_fhd"), F.col("_n")
    fcs_flag = F.shiftright(fhd, 6)
    ss = F.shiftright(fhd, 5).bitwiseAND(F.lit(1))
    cksum = F.shiftright(fhd, 2).bitwiseAND(F.lit(1))
    dflag = fhd.bitwiseAND(F.lit(3))
    did_size = F.element_at(
        F.array(F.lit(0), F.lit(1), F.lit(2), F.lit(4)), (dflag + 1).cast("int")
    )
    # per-descriptor declared header length: magic(4) + fhd(1) + window
    # descriptor (absent under Single_Segment) + dict ID + content size
    # (flag 0 stores 1 byte only under Single_Segment)
    fcs_size = F.when(fcs_flag == 0, ss).otherwise(
        F.element_at(F.array(F.lit(0), F.lit(2), F.lit(4), F.lit(8)),
                     (fcs_flag + 1).cast("int"))
    )
    needed = F.lit(5) + (1 - ss) + did_size + fcs_size
    # a frame TRUNCATED before its declared fields rejects — same strict
    # contract as the other containers (and as the Python twin)
    is_zstd = (
        (F.hex(p.substr(1, 4)) == ZSTD_MAGIC)
        & (F.shiftright(fhd, 3).bitwiseAND(F.lit(1)) == 0)  # reserved bit
        & (n >= needed)
    )
    is_gzip = (F.hex(p.substr(1, 3)) == "1F8B08") & (n >= 10)
    df = df.withColumn("_dpos", F.lit(6).cast("long") + F.when(ss == 0, 1).otherwise(0))
    dpos = F.col("_dpos")
    df = df.withColumn("_fpos", dpos + did_size)
    fpos = F.col("_fpos")
    dict_id = (
        F.when(dflag == 1, _le_int_at(p, dpos, 1))
        .when(dflag == 2, _le_int_at(p, dpos, 2))
        .when(dflag == 3, _le_int_at(p, dpos, 4))
    )
    content_size = (
        F.when((fcs_flag == 0) & (ss == 1), _le_int_at(p, fpos, 1))
        .when(fcs_flag == 1, _le_int_at(p, fpos, 2) + 256)
        .when(fcs_flag == 2, _le_int_at(p, fpos, 4))
        .when(fcs_flag == 3, _le_int_at(p, fpos, 8))
    )
    wd = _be_int_at(p, F.lit(6), 1)
    # 2^(10 + wd>>3): shiftleft needs a literal count, but pow is exact
    # for powers of two up to 2^62 (max exponent here is 41)
    wbase = F.pow(F.lit(2.0), (F.lit(10) + F.shiftright(wd, 3)).cast("double")).cast(
        "long"
    )
    window = F.when(ss == 1, content_size).otherwise(
        wbase + (wbase / 8).cast("long") * wd.bitwiseAND(F.lit(7))
    )
    return df.select(
        "asset_id",
        F.when(is_zstd, F.lit("zstd")).when(is_gzip, F.lit("gzip")).alias("container"),
        F.when(is_zstd, cksum).alias("checksum_flag"),
        F.when(is_zstd, dict_id).alias("dict_id"),
        F.when(is_zstd, content_size).alias("content_size"),
        F.when(is_zstd, window).alias("window_size"),
        F.when(is_gzip, _le_int_at(p, F.lit(5), 4)).alias("mtime"),
        F.when(is_gzip, _be_int_at(p, F.lit(10), 1)).alias("os_id"),
    )


def parse_compression_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_compression_headers (same strict
    contract), for boundary tests."""
    if payload is None:
        return None
    b = bytes(payload)

    def le(o: int, n: int) -> int:
        return int.from_bytes(b[o:o + n], "little")

    if len(b) >= 5 and b[:4] == bytes.fromhex(ZSTD_MAGIC):
        fhd = b[4]
        if (fhd >> 3) & 1:  # reserved bit set
            return None
        fcs_flag, ss = fhd >> 6, (fhd >> 5) & 1
        cksum, dflag = (fhd >> 2) & 1, fhd & 3
        fcs_width = ss if fcs_flag == 0 else [0, 2, 4, 8][fcs_flag]
        if len(b) < 5 + (1 - ss) + [0, 1, 2, 4][dflag] + fcs_width:
            return None  # truncated before the declared fields
        pos = 5
        wd = None
        if not ss:
            wd = b[pos]
            pos += 1
        did_size = [0, 1, 2, 4][dflag]
        dict_id = le(pos, did_size) if did_size else None
        pos += did_size
        fcs_size = (1 if ss else 0) if fcs_flag == 0 else [0, 2, 4, 8][fcs_flag]
        content_size = None
        if fcs_size:
            content_size = le(pos, fcs_size) + (256 if fcs_flag == 1 else 0)
        if ss:
            window = content_size
        else:
            base = 1 << (10 + (wd >> 3))
            window = base + (base // 8) * (wd & 7)
        return {"container": "zstd", "checksum_flag": cksum,
                "dict_id": dict_id, "content_size": content_size,
                "window_size": window}
    if len(b) >= 10 and b[:3] == b"\x1f\x8b\x08":
        return {"container": "gzip", "mtime": le(4, 4), "os_id": b[9]}
    return None


# ---------------------------------------------------------------------------
# Self-terminating varint chains (round 10): TFRecord-framed protobuf wire
# format — what a training pipeline actually reads off disk. The framing
# is fixed (u64le payload length + 4-byte masked-CRC slots, zeroed here —
# crc32c is a table-driven kernel with no cross-engine SQL form,
# documented stub); the MESSAGE is the interesting shape: every field
# starts with a varint key (field<<3 | wire-type) and varint values are
# SELF-TERMINATING byte chains (continuation bit 0x80), so each stride of
# the field walk depends on the bytes just decoded — a seventh decode
# shape after fixed offsets, segment chains, box trees, endianness
# switches, bit packs, and descriptor layouts.
# ---------------------------------------------------------------------------

#: max varint bytes the reader unrolls (values < 2^28)
VARINT_MAX_BYTES = 4
#: fields the message walk scans (the synth emits exactly 4 top-level)
PB_FIELD_STEPS = 4


def _varint_val_at(p, pos):
    """Decode a (<= VARINT_MAX_BYTES-byte) varint at Column position
    `pos`: little-endian base-128 groups, continuation bit 0x80."""
    bs = [_be_int_at(p, pos + k, 1) for k in range(VARINT_MAX_BYTES)]
    val = F.lit(None).cast("long")
    acc = F.lit(0).cast("long")
    expr = None
    for k in range(VARINT_MAX_BYTES):
        acc = acc + F.shiftleft(bs[k].bitwiseAND(F.lit(127)), 7 * k)
        cond = bs[k] < 128
        expr = F.when(cond, acc) if expr is None else expr.when(cond, acc)
        acc = acc  # groups accumulate across the chain
    return expr.otherwise(val)


def _varint_width_at(p, pos):
    """Byte width of the varint at `pos` (NULL if it never terminates
    within VARINT_MAX_BYTES — a truncated or oversized chain rejects)."""
    bs = [_be_int_at(p, pos + k, 1) for k in range(VARINT_MAX_BYTES)]
    expr = None
    for k in range(VARINT_MAX_BYTES):
        cond = bs[k] < 128
        lit = F.lit(k + 1).cast("long")
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    return expr.otherwise(F.lit(None).cast("long"))


def _varint_read_staged(df, p, pos, pfx, active=None,
                        max_bytes: int = VARINT_MAX_BYTES):
    """Stage one varint read as materialized columns: the
    VARINT_MAX_BYTES raw bytes land in `{pfx}b{k}`, then width
    (`{pfx}w`) and value (`{pfx}v`) are CASE chains over those column
    REFS. `_varint_width_at` + `_varint_val_at` at the same position
    expand every byte read twice (and each byte ~3× inside the chains);
    a walk with several reads per entry overruns janino's 64 KB method
    limit on that duplication alone. Here each byte compiles once —
    CollapseProject keeps multiply-referenced non-cheap aliases.
    `active` gates the read (NULL bytes → NULL width/value, matching
    `F.when(active, _varint_*_at(...))`)."""
    for k in range(max_bytes):
        b = _be_int_at(p, pos + k, 1)
        df = df.withColumn(
            f"{pfx}b{k}", F.when(active, b) if active is not None else b
        )
    bs = [F.col(f"{pfx}b{k}") for k in range(max_bytes)]
    acc = F.lit(0).cast("long")
    wexpr, vexpr = None, None
    for k in range(max_bytes):
        acc = acc + F.shiftleft(bs[k].bitwiseAND(F.lit(127)), 7 * k)
        cond = bs[k] < 128
        wlit = F.lit(k + 1).cast("long")
        wexpr = F.when(cond, wlit) if wexpr is None else wexpr.when(cond, wlit)
        vexpr = F.when(cond, acc) if vexpr is None else vexpr.when(cond, acc)
    df = df.withColumn(f"{pfx}w", wexpr.otherwise(F.lit(None).cast("long")))
    df = df.withColumn(f"{pfx}v", vexpr.otherwise(F.lit(None).cast("long")))
    return df


def _varint_enc(v, max_bytes: int = VARINT_MAX_BYTES):
    """Column -> varint bytes (synthesis side)."""
    groups = [
        F.shiftright(v, 7 * k).bitwiseAND(F.lit(127)) for k in range(max_bytes)
    ]
    out = _be_enc(groups[0], 1)
    for k in range(1, max_bytes):
        bound = 1 << (7 * k)
        prev = F.concat(
            *[_be_enc(groups[j] + 128, 1) for j in range(k)], _be_enc(groups[k], 1)
        )
        out = F.when(v >= bound, prev).otherwise(out)
    return out


def synth_tfrecord_payloads(docs: DataFrame) -> DataFrame:
    """One TFRecord frame per document wrapping a 4-field protobuf-wire
    message, every value a deterministic function of doc_id:

      field 1 varint  record_id = doc_id
      field 2 bytes   name = 'x' * (1 + doc_id%9)
      field 3 varint  flags = doc_id % 300          (multi-byte varints)
      field 4 message inner: f1 varint width = 16 + doc_id%70000,
                             f2 varint height = 16 + (doc_id*13)%50000

    FIELD ORDER ALTERNATES with doc_id parity (wire format permits any
    order), so the parser must genuinely walk keys, never assume
    offsets. CRC slots are zeroed (documented stub). The parse path
    below trusts only the bytes."""
    did = F.col("doc_id")
    rid, flags = did.cast("long"), (did % 300).cast("long")
    w = (F.lit(16) + did % 70000).cast("long")
    h = (F.lit(16) + (did * 13) % 50000).cast("long")
    name_len = (F.lit(1) + did % 9).cast("long")
    name = F.unhex(F.lit("78" * 9).substr(F.lit(1), (name_len * 2).cast("int")))
    # Staged columns (the avro-entries lesson, applied for THROUGHPUT
    # here): inner is referenced twice by f4 (length + bytes), each
    # field appears in both parity branches of msg, and msg twice in
    # the frame (length prefix + bytes) — inline, the varint encoders
    # re-expanded 4-8x into one ~120 KB Project expression that cost
    # ~0.5 ms/row; staged, every encoder compiles and evaluates once.
    staged = docs.select(
        did.alias("asset_id"),
        F.concat(_lit_bin("08"), _varint_enc(rid)).alias("_f1"),
        F.concat(_lit_bin("12"), _varint_enc(name_len, 1), name).alias("_f2"),
        F.concat(_lit_bin("18"), _varint_enc(flags)).alias("_f3"),
        F.concat(
            _lit_bin("08"), _varint_enc(w), _lit_bin("10"), _varint_enc(h)
        ).alias("_inner"),
    )
    did2 = F.col("asset_id")
    f1, f2, f3 = F.col("_f1"), F.col("_f2"), F.col("_f3")
    inner = F.col("_inner")
    f4 = F.concat(
        _lit_bin("22"), _varint_enc(F.octet_length(inner).cast("long"), 1), inner
    )
    staged = staged.select(
        "asset_id",
        F.when(did2 % 2 == 0, F.concat(f1, f2, f3, f4))
        .otherwise(F.concat(f3, f1, f4, f2))
        .alias("_msg"),
    )
    msg = F.col("_msg")
    frame = F.concat(
        _le_enc(F.octet_length(msg).cast("long"), 8),  # length
        _lit_bin("00000000"),                          # masked len-CRC (stub)
        msg,
        _lit_bin("00000000"),                          # masked data-CRC (stub)
    )
    return staged.select("asset_id", frame.alias("payload"))


def parse_tfrecord_headers(assets: DataFrame) -> DataFrame:
    """TFRecord + wire-format extraction trusting ONLY the bytes: the
    u64le length must exactly account for the frame (12 + len + 4 =
    total), then the message walk reads PB_FIELD_STEPS fields — at each
    step the key varint dispatches on wire type (0 varint, 2
    length-delimited), the stride is the just-decoded widths, and the
    target fields capture via first-match coalesce. The nested field-4
    message walks its two inner varints the same way. A key with an
    unexpected field/wire pair, a varint that never terminates, or a
    walk that does not land exactly at the message end rejects the
    record (strict). Returns (asset_id, record_id, name_len, flags,
    width, height).

    Same staging discipline as the other walks: one WholeStageCodegen
    stage, zero Python, zero shuffle (plan-tested)."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    df = df.withColumn("_len", _le_int(p, 1, 8))
    n, mlen = F.col("_n"), F.col("_len")
    frame_ok = (n >= 17) & (n == mlen + 16)
    msg_start = F.lit(13).cast("long")  # 1-indexed: after length + CRC slot
    msg_end = msg_start + mlen          # exclusive

    # top-level walk: stage position, key, and the advance per step
    df = df.withColumn("_q0", msg_start)
    for i in range(PB_FIELD_STEPS):
        q = F.col(f"_q{i}")
        df = df.withColumn(f"_k{i}", _be_int_at(p, q, 1))
        key = F.col(f"_k{i}")
        wire = key.bitwiseAND(F.lit(7))
        df = df.withColumn(f"_vw{i}", _varint_width_at(p, q + 1))
        df = df.withColumn(f"_vv{i}", _varint_val_at(p, q + 1))
        vw, vv = F.col(f"_vw{i}"), F.col(f"_vv{i}")
        # stride: key byte + (varint | 1-byte len varint + payload)
        df = df.withColumn(
            f"_adv{i}",
            F.when(wire == 0, 1 + vw).when(wire == 2, 1 + vw + vv),
        )
        df = df.withColumn(f"_q{i + 1}", q + F.col(f"_adv{i}"))

    def field_val(key_byte: int):
        return F.coalesce(
            *[
                F.when(F.col(f"_k{i}") == key_byte, F.col(f"_vv{i}"))
                for i in range(PB_FIELD_STEPS)
            ]
        )

    def field_pos(key_byte: int):
        return F.coalesce(
            *[
                F.when(F.col(f"_k{i}") == key_byte, F.col(f"_q{i}"))
                for i in range(PB_FIELD_STEPS)
            ]
        )

    # strict: every step's key must be one of the four expected, the walk
    # must land exactly on the message end, every stride defined
    known = F.lit(True)
    for i in range(PB_FIELD_STEPS):
        known = known & F.col(f"_k{i}").isin(0x08, 0x12, 0x18, 0x22) & F.col(
            f"_adv{i}"
        ).isNotNull()
    walk_ok = frame_ok & known & (F.col(f"_q{PB_FIELD_STEPS}") == msg_end)

    rid = field_val(0x08)
    name_len = field_val(0x12)  # wire 2: _vv is the length varint
    flags = field_val(0x18)
    # nested message: inner payload starts after key + 1-byte len varint
    df = df.withColumn("_ipos", field_pos(0x22) + 2)
    df = df.withColumn("_ilen", field_val(0x22))
    ipos, ilen = F.col("_ipos"), F.col("_ilen")
    df = df.withColumn("_iwv", _varint_width_at(p, ipos + 1))
    inner_w = F.when(_be_int_at(p, ipos, 1) == 0x08, _varint_val_at(p, ipos + 1))
    df = df.withColumn("_w", inner_w)
    hpos = ipos + 1 + F.col("_iwv")
    df = df.withColumn("_hw", _varint_width_at(p, hpos + 1))
    inner_h = F.when(_be_int_at(p, hpos, 1) == 0x10, _varint_val_at(p, hpos + 1))
    df = df.withColumn("_h", inner_h)
    inner_ok = (
        F.col("_w").isNotNull()
        & F.col("_h").isNotNull()
        & (hpos + 1 + F.col("_hw") == ipos + ilen)  # inner walk lands on end
    )
    ok = walk_ok & rid.isNotNull() & name_len.isNotNull() & flags.isNotNull() & inner_ok
    return df.select(
        "asset_id",
        F.when(ok, rid).alias("record_id"),
        F.when(ok, name_len).alias("name_len"),
        F.when(ok, flags).alias("flags"),
        F.when(ok, F.col("_w")).alias("width"),
        F.when(ok, F.col("_h")).alias("height"),
    )


def parse_tfrecord_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_tfrecord_headers (same strict
    contract), for boundary tests."""
    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n < 17:
        return None
    mlen = int.from_bytes(b[:8], "little")
    if n != mlen + 16:
        return None

    def varint(o: int):
        val, width = 0, None
        for k in range(VARINT_MAX_BYTES):
            if o + k >= n:
                return None, None
            byte = b[o + k]
            val |= (byte & 127) << (7 * k)
            if byte < 128:
                width = k + 1
                return val, width
        return None, None

    pos, end = 12, 12 + mlen
    vals: dict[int, int] = {}
    poss: dict[int, int] = {}
    for _ in range(PB_FIELD_STEPS):
        if pos >= n:
            return None
        key = b[pos]
        if key not in (0x08, 0x12, 0x18, 0x22):
            return None
        vv, vw = varint(pos + 1)
        if vw is None:
            return None
        if key not in vals:
            vals[key], poss[key] = vv, pos
        wire = key & 7
        pos += 1 + vw + (vv if wire == 2 else 0)
    if pos != end or set(vals) != {0x08, 0x12, 0x18, 0x22}:
        return None
    ipos, ilen = poss[0x22] + 2, vals[0x22]
    if ipos >= n or b[ipos] != 0x08:
        return None
    w, ww = varint(ipos + 1)
    if ww is None:
        return None
    hpos = ipos + 1 + ww
    if hpos >= n or b[hpos] != 0x10:
        return None
    h, hw = varint(hpos + 1)
    if hw is None or hpos + 1 + hw != ipos + ilen:
        return None
    return {"record_id": vals[0x08], "name_len": vals[0x12],
            "flags": vals[0x18], "width": w, "height": h}


# ---------------------------------------------------------------------------
# Bit-packed cross-byte layouts (round 10 continuation): FLAC STREAMINFO.
# Every container above keeps its fields byte-aligned; FLAC's mandatory
# first metadata block packs sample_rate(20) | channels-1(3) | bps-1(5) |
# total_samples(36) into ONE big-endian 64-bit group, so every field
# boundary falls mid-byte and the 36-bit sample count straddles the
# signed-long-unsafe top half. The decode reads the group as two u32
# halves (a full u64 conv().cast("long") would wrap for payloads with
# the high bit set) and shifts fields out — the audio sibling of WebP's
# VP8L sub-byte dims, at 3x the field count. Layout: RFC 9639 §8.2.
# ---------------------------------------------------------------------------


def synth_flac_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid 42-byte FLAC prefixes (fLaC magic + STREAMINFO
    metadata block), every field a deterministic function of doc_id so a
    SQL oracle can replay them:

      min_block  = 16 + doc_id % 4080          (spec floor 16)
      max_block  = min_block + (doc_id*3) % 1000
      min_frame  = (doc_id * 37)  % 2^24
      max_frame  = min_frame + (doc_id * 11) % 100000, capped to 24 bits
      rate       = 8000 + (doc_id * 131) % 640000   (20-bit field)
      channels   = 1 + doc_id % 8                   (stored minus one)
      bps        = 4 + (doc_id * 5) % 29            (stored minus one)
      samples    = (doc_id * 100003) % 2^36         (36-bit field)

    The last-metadata-block flag alternates with doc_id parity (both are
    valid). MD5 slot is md5(doc_id) — present and honest-length, ignored
    by the parse path, which trusts only the bytes."""
    did = F.col("doc_id")
    min_block = (F.lit(16) + did % 4080).cast("long")
    max_block = (min_block + (did * 3) % 1000).cast("long")
    min_frame = ((did * 37) % (1 << 24)).cast("long")
    max_frame = F.least(
        min_frame + (did * 11) % 100000, F.lit((1 << 24) - 1)
    ).cast("long")
    rate = (F.lit(8000) + (did * 131) % 640000).cast("long")
    channels = (F.lit(1) + did % 8).cast("long")
    bps = (F.lit(4) + (did * 5) % 29).cast("long")
    samples = ((did * 100003) % (1 << 36)).cast("long")
    hi = (
        F.shiftleft(rate, 12)
        + F.shiftleft(channels - 1, 9)
        + F.shiftleft(bps - 1, 4)
        + F.shiftright(samples, 32)
    )
    lo = samples.bitwiseAND(F.lit((1 << 32) - 1))
    hdr = F.when(did % 2 == 1, _lit_bin("80")).otherwise(_lit_bin("00"))
    return docs.select(
        did.alias("asset_id"),
        F.concat(
            _lit_bin(_ascii_hex("fLaC")),
            hdr,                       # last-block flag | type 0 (STREAMINFO)
            _be_enc(F.lit(34), 3),     # block length
            _be_enc(min_block, 2), _be_enc(max_block, 2),
            _be_enc(min_frame, 3), _be_enc(max_frame, 3),
            _be_enc(hi, 4), _be_enc(lo, 4),
            F.unhex(F.md5(did.cast("string"))),  # 16-byte MD5 slot
        ).alias("payload"),
    )


def parse_flac_headers(assets: DataFrame) -> DataFrame:
    """FLAC STREAMINFO extraction trusting ONLY the bytes: fLaC sniff,
    first metadata block must be type 0 (either last-block flag) with
    the spec-fixed length 34 and all 34 bytes present, then the 64-bit
    packed group is read as two u32 halves and bit-shifted apart:

      sample_rate      = hi >> 12        (20 bits; 0 is invalid -> reject)
      channels         = ((hi >> 9) & 7) + 1
      bits_per_sample  = ((hi >> 4) & 31) + 1
      total_samples    = ((hi & 15) << 32) | lo   (36 bits)

    A min block size below the spec floor of 16 also rejects. Fixed
    offsets, pure JVM bit arithmetic, zero Python, one codegen stage
    (plan-tested)."""
    p = F.col("payload")
    n = F.octet_length(p).cast("long")
    hi, lo = _be_int(p, 19, 4), _be_int(p, 23, 4)
    min_block = _be_int(p, 9, 2)
    rate = F.shiftright(hi, 12)
    ok = (
        (n >= 42)
        & (F.hex(p.substr(1, 4)) == _ascii_hex("fLaC"))
        & (_be_int(p, 5, 1).bitwiseAND(F.lit(0x7F)) == 0)
        & (_be_int(p, 6, 3) == 34)
        & (min_block >= 16)
        & (rate != 0)
    )
    def _f(col):
        return F.when(ok, col)
    return assets.select(
        "asset_id",
        _f(F.lit("flac")).alias("container"),
        _f(rate).alias("sample_rate"),
        _f(F.shiftright(hi, 9).bitwiseAND(F.lit(7)) + 1).alias("channels"),
        _f(F.shiftright(hi, 4).bitwiseAND(F.lit(31)) + 1).alias("bits_per_sample"),
        _f(F.shiftleft(hi.bitwiseAND(F.lit(15)), 32) + lo).alias("total_samples"),
        _f(min_block).alias("min_block_size"),
        _f(_be_int(p, 11, 2)).alias("max_block_size"),
    )


def parse_flac_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_flac_headers (same strict contract),
    for the mapInPandas decode route and for boundary/parity tests."""
    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 42 or b[:4] != b"fLaC":
        return None
    if b[4] & 0x7F or int.from_bytes(b[5:8], "big") != 34:
        return None
    min_block = int.from_bytes(b[8:10], "big")
    hi = int.from_bytes(b[18:22], "big")
    lo = int.from_bytes(b[22:26], "big")
    rate = hi >> 12
    if min_block < 16 or rate == 0:
        return None
    return {
        "container": "flac",
        "sample_rate": rate,
        "channels": ((hi >> 9) & 7) + 1,
        "bits_per_sample": ((hi >> 4) & 31) + 1,
        "total_samples": ((hi & 15) << 32) | lo,
        "min_block_size": min_block,
        "max_block_size": int.from_bytes(b[10:12], "big"),
    }


# ---------------------------------------------------------------------------
# Tail-anchored layouts + signed varints (round 10 continuation): the
# Parquet footer. Every container above is parsed head-first; Parquet's
# metadata lives at the END — PAR1 magic at both edges, a u32le footer
# length at n-7, and the footer START computed backwards from it — and
# its thrift-compact struct encodes integers as ZIGZAG varints (sign bit
# folded into bit 0), the signed sibling of TFRecord's plain base-128
# chains. The walk decodes a FileMetaData subset: field 1 version (i32),
# field 3 num_rows (i64) — field-id DELTAS in the header nibble, so
# skipping field 2 (schema) is what the wire genuinely permits — and
# field 6 created_by (length-prefixed binary), then requires the stop
# byte to land exactly on the footer end. Layout: Apache Parquet
# format/Thrift compact protocol specs (public).
# ---------------------------------------------------------------------------


def _zigzag_dec(raw):
    """Zigzag-decode a non-negative varint value column: bit 0 is the
    sign, remaining bits the magnitude — (raw >>> 1) ^ -(raw & 1)."""
    return F.shiftrightunsigned(raw, 1).bitwiseXOR(
        F.lit(0) - raw.bitwiseAND(F.lit(1))
    )


def _zigzag_enc(v):
    """Zigzag-encode a long column (synthesis side): (v << 1) ^ (v >> 63)
    with an arithmetic right shift."""
    return F.shiftleft(v, 1).bitwiseXOR(F.shiftright(v, 63))


def synth_parquet_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid Parquet file skeletons per document: PAR1 magic, a
    deterministic junk data section (1 + doc_id%50 bytes of 0x44), a
    thrift-compact FileMetaData subset, the u32le footer length, and the
    trailing PAR1. Field values replayable by a SQL oracle:

      version    = 1 + doc_id % 3              (field 1, i32 zigzag)
      num_rows   = (doc_id * 997) % 10^8       (field 3, i64 zigzag,
                                                exercises 1-4 byte chains)
      created_by = 'engine-' || doc_id % 100   (field 6, length-prefixed)

    The parse path below trusts only the bytes."""
    did = F.col("doc_id")
    version = (F.lit(1) + did % 3).cast("long")
    num_rows = ((did * 997) % 100000000).cast("long")
    cb = F.encode(
        F.concat(F.lit("engine-"), (did % 100).cast("string")), "UTF-8"
    )
    footer = F.concat(
        _lit_bin("15"), _varint_enc(_zigzag_enc(version)),
        _lit_bin("26"), _varint_enc(_zigzag_enc(num_rows)),
        _lit_bin("38"), _varint_enc(F.octet_length(cb).cast("long"), 1), cb,
        _lit_bin("00"),  # stop
    )
    dlen = (F.lit(1) + did % 50).cast("int")
    data = F.unhex(F.lit("44" * 50).substr(F.lit(1), dlen * 2))
    return docs.select(
        did.alias("asset_id"),
        F.concat(
            _lit_bin(_ascii_hex("PAR1")), data, footer,
            _le_enc(F.octet_length(footer).cast("long"), 4),
            _lit_bin(_ascii_hex("PAR1")),
        ).alias("payload"),
    )


def parse_parquet_footers(assets: DataFrame) -> DataFrame:
    """Parquet footer extraction trusting ONLY the bytes: PAR1 at both
    edges, footer length u32le at n-7, footer start n-7-len computed
    BACKWARDS, then a thrift-compact walk — 0x15 (field 1, i32) zigzag
    version, 0x26 (delta 2 -> field 3, i64) zigzag num_rows, 0x38
    (delta 3 -> field 6, binary) varint-length created_by — that must
    consume the footer exactly to its stop byte. A wrong field header,
    a varint that never terminates, a created_by running past the
    footer, or a stop byte off the footer end rejects. Data-dependent
    positions stay JVM-side via Column.substr; zero Python, one codegen
    stage (plan-tested).

    Same staging discipline as the other data-dependent walks: each
    position/width is a named column computed once — inlining them would
    compound every later expression with every earlier varint decode and
    blow past the janino codegen budget."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    n = F.col("_n")
    df = df.withColumn("_flen", _le_int_at(p, n - 7, 4))
    df = df.withColumn("_fpos", n - 7 - F.col("_flen"))
    flen, fpos = F.col("_flen"), F.col("_fpos")
    df = df.withColumn("_vw", _varint_width_at(p, fpos + 1))
    df = df.withColumn("_vraw", _varint_val_at(p, fpos + 1))
    df = df.withColumn("_p2", fpos + 1 + F.col("_vw"))
    p2 = F.col("_p2")
    df = df.withColumn("_nw", _varint_width_at(p, p2 + 1))
    df = df.withColumn("_nraw", _varint_val_at(p, p2 + 1))
    df = df.withColumn("_p3", p2 + 1 + F.col("_nw"))
    p3 = F.col("_p3")
    df = df.withColumn("_cblw", _varint_width_at(p, p3 + 1))
    df = df.withColumn("_cbl", _varint_val_at(p, p3 + 1))
    cbl = F.col("_cbl")
    df = df.withColumn(
        "_cb",
        p.substr((p3 + 1 + F.col("_cblw")).try_cast("int"), cbl.try_cast("int")),
    )
    df = df.withColumn("_p4", p3 + 1 + F.col("_cblw") + cbl)
    p4, cb, vraw, nraw = F.col("_p4"), F.col("_cb"), F.col("_vraw"), F.col("_nraw")
    ok = (
        (n >= 13)
        & (F.hex(p.substr(1, 4)) == _ascii_hex("PAR1"))
        & (F.hex(p.substr((n - 3).try_cast("int"), F.lit(4))) == _ascii_hex("PAR1"))
        & (flen >= 4)
        & (fpos >= 5)
        & (_be_int_at(p, fpos, 1) == 0x15)
        & (_be_int_at(p, p2, 1) == 0x26)
        & (_be_int_at(p, p3, 1) == 0x38)
        & (F.octet_length(cb).cast("long") == cbl)
        & F.is_valid_utf8(cb)  # non-UTF-8 created_by rejects in BOTH paths
        & (_be_int_at(p, p4, 1) == 0)
        & (p4 == fpos + flen - 1)
    )
    def _f(col):
        return F.when(ok, col)
    return df.select(
        "asset_id",
        _f(F.lit("parquet")).alias("container"),
        _f(_zigzag_dec(vraw)).alias("version"),
        _f(_zigzag_dec(nraw)).alias("num_rows"),
        _f(F.decode(cb, "UTF-8")).alias("created_by"),
        _f(flen).alias("footer_len"),
        _f(n - 12 - flen).alias("data_len"),
    )


def parse_parquet_footer_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_parquet_footers (same strict
    contract), for boundary/parity tests."""
    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n < 13 or b[:4] != b"PAR1" or b[n - 4:] != b"PAR1":
        return None
    flen = int.from_bytes(b[n - 8:n - 4], "little")
    fpos = n - 8 - flen  # 0-indexed footer start
    if flen < 4 or fpos < 4:
        return None

    def varint(pos: int):
        val, w = 0, 0
        while w < VARINT_MAX_BYTES:
            if pos + w >= n:
                return None, None
            byte = b[pos + w]
            val += (byte & 127) << (7 * w)
            w += 1
            if byte < 128:
                return val, w
        return None, None

    def zigzag(raw: int) -> int:
        return (raw >> 1) ^ -(raw & 1)

    if b[fpos] != 0x15:
        return None
    vraw, vw = varint(fpos + 1)
    if vw is None:
        return None
    p2 = fpos + 1 + vw
    if p2 >= n or b[p2] != 0x26:
        return None
    nraw, nw = varint(p2 + 1)
    if nw is None:
        return None
    p3 = p2 + 1 + nw
    if p3 >= n or b[p3] != 0x38:
        return None
    cbl, cblw = varint(p3 + 1)
    if cblw is None:
        return None
    cb = b[p3 + 1 + cblw:p3 + 1 + cblw + cbl]
    p4 = p3 + 1 + cblw + cbl
    if len(cb) != cbl or p4 >= n or b[p4] != 0 or p4 != fpos + flen - 1:
        return None
    try:
        created_by = cb.decode("utf-8")  # strict, like the JVM path
    except UnicodeDecodeError:
        return None
    return {
        "container": "parquet",
        "version": zigzag(vraw),
        "num_rows": zigzag(nraw),
        "created_by": created_by,
        "footer_len": flen,
        "data_len": n - 12 - flen,
    }


# ---------------------------------------------------------------------------
# Table-driven layouts (round 10 continuation): the Ogg page header. The
# shape no other container here has is a VARIABLE-LENGTH TABLE REDUCE:
# byte 27 gives the segment count N, bytes 28..27+N are one-byte lacing
# values, and the page body length is their SUM — computed JVM-side with
# a higher-order aggregate over sequence(1, N), not a fixed chain of
# reads. The first packet is the codec identification header (OpusHead /
# \x01vorbis), dispatched at the data-dependent offset 28+N. Layout:
# RFC 3533 (Ogg), RFC 7845 (Opus-in-Ogg), Vorbis I spec (all public).
# ---------------------------------------------------------------------------


def synth_ogg_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid single-page Ogg streams per document (doc_id parity
    picks the codec: even -> Opus, odd -> Vorbis), every field a
    deterministic function of doc_id:

      channels   = 1 + doc_id % 8
      rate       = 8000 + (doc_id*7) % 40000 (opus input rate)
                   8000 + (doc_id*11) % 40000 (vorbis)
      preskip    = doc_id % 4000 (opus only)
      granule    = (doc_id * 100003) % 2^48
      serial     = (doc_id * 2654435761) % 2^32
      page_seq   = doc_id % 1000
      segments   = 1 + doc_id % 3 (id packet + 0-2 junk packets of
                   10 + doc_id % 200 bytes each — so the lacing table
                   genuinely varies in length and content)

    CRC slot zeroed (no cross-engine SQL form — same documented stub as
    TFRecord). The parse path below trusts only the bytes."""
    did = F.col("doc_id")
    ch = (F.lit(1) + did % 8).cast("long")
    preskip = (did % 4000).cast("long")
    opus_rate = (F.lit(8000) + (did * 7) % 40000).cast("long")
    vorbis_rate = (F.lit(8000) + (did * 11) % 40000).cast("long")
    opus_id = F.concat(
        _lit_bin(_ascii_hex("OpusHead")), _lit_bin("01"),  # version 1
        _be_enc(ch, 1), _le_enc(preskip, 2), _le_enc(opus_rate, 4),
        _lit_bin("0000"),  # output gain
        _lit_bin("00"),    # channel mapping family
    )  # 19 bytes
    vorbis_id = F.concat(
        _lit_bin("01"), _lit_bin(_ascii_hex("vorbis")),
        _le_enc(F.lit(0), 4),              # vorbis version 0
        _be_enc(ch, 1), _le_enc(vorbis_rate, 4),
        _le_enc(F.lit(0), 4), _le_enc(F.lit(128000), 4), _le_enc(F.lit(0), 4),
        _lit_bin("B8"), _lit_bin("01"),    # blocksizes, framing
    )  # 30 bytes
    is_opus = did % 2 == 0
    id_pkt = F.when(is_opus, opus_id).otherwise(vorbis_id)
    id_len = F.when(is_opus, F.lit(19)).otherwise(F.lit(30)).cast("long")
    njunk = (did % 3).cast("long")
    jl = (F.lit(10) + did % 200).cast("long")
    lacing = F.concat(
        _be_enc(id_len, 1),
        F.when(njunk == 0, _lit_bin(""))
        .when(njunk == 1, _be_enc(jl, 1))
        .otherwise(F.concat(_be_enc(jl, 1), _be_enc(jl, 1))),
    )
    junk = F.unhex(F.lit("4A" * 418).substr(F.lit(1), (njunk * jl * 2).cast("int")))
    granule = ((did * 100003) % (1 << 48)).cast("long")
    serial = ((did * 2654435761) % (1 << 32)).cast("long")
    return docs.select(
        did.alias("asset_id"),
        F.concat(
            _lit_bin(_ascii_hex("OggS")), _lit_bin("00"),  # version 0
            _lit_bin("02"),                                # BOS page
            _le_enc(granule.bitwiseAND(F.lit((1 << 32) - 1)), 4),
            _le_enc(F.shiftright(granule, 32), 4),
            _le_enc(serial, 4),
            _le_enc((did % 1000).cast("long"), 4),
            _lit_bin("00000000"),                          # CRC stub
            _be_enc(F.lit(1) + did % 3, 1),                # segment count
            lacing, id_pkt, junk,
        ).alias("payload"),
    )


def parse_ogg_headers(assets: DataFrame) -> DataFrame:
    """Ogg page + codec-id extraction trusting ONLY the bytes: OggS
    sniff, version must be 0, segment count N at byte 27, body length =
    SUM of the N lacing bytes (higher-order aggregate over a
    data-dependent-length table), and the payload must end exactly at
    27 + N + sum. The first packet at offset 28+N dispatches on codec
    magic — OpusHead (version byte must be 1) or \\x01vorbis (version
    u32le must be 0); anything else rejects. The 64-bit granule is read
    as two u32le halves (signed-cast hazard). Zero Python, zero shuffle
    (plan-tested)."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    df = df.withColumn("_nseg", _be_int(p, 27, 1))
    n, nseg = F.col("_n"), F.col("_nseg")
    seq = F.sequence(F.lit(1), F.when(nseg >= 1, nseg).cast("int"))
    df = df.withColumn(
        "_body",
        F.aggregate(
            seq,
            F.lit(0).cast("long"),
            lambda acc, i: acc + _be_int_at(p, F.lit(27) + i, 1),
        ),
    )
    df = df.withColumn("_q", F.lit(28) + nseg)
    body, q = F.col("_body"), F.col("_q")
    page_ok = (
        (n >= 28)
        & (F.hex(p.substr(1, 4)) == _ascii_hex("OggS"))
        & (_be_int(p, 5, 1) == 0)                 # stream structure version
        & (nseg >= 1)
        & (n == F.lit(27) + nseg + body)          # lacing sum accounts exactly
    )
    df = df.withColumn(
        "_opus",
        page_ok
        & (F.hex(p.substr(q.try_cast("int"), F.lit(8))) == _ascii_hex("OpusHead"))
        & (_be_int_at(p, q + 8, 1) == 1)
        & (body >= 19),
    )
    df = df.withColumn(
        "_vorbis",
        page_ok
        & (F.hex(p.substr(q.try_cast("int"), F.lit(7))) == "01" + _ascii_hex("vorbis"))
        & (_le_int_at(p, q + 7, 4) == 0)
        & (body >= 30),
    )
    is_opus, is_vorbis = F.col("_opus"), F.col("_vorbis")
    codec = F.when(is_opus, F.lit("opus")).when(is_vorbis, F.lit("vorbis"))
    ok = is_opus | is_vorbis
    granule = _le_int(p, 7, 4) + F.shiftleft(_le_int(p, 11, 4), 32)
    def _f(col):
        return F.when(ok, col)
    return df.select(
        "asset_id",
        _f(F.lit("ogg")).alias("container"),
        codec.alias("codec"),
        _f(
            F.when(is_opus, _be_int_at(p, q + 9, 1)).otherwise(
                _be_int_at(p, q + 11, 1)
            )
        ).alias("channels"),
        _f(_le_int_at(p, q + 12, 4)).alias("sample_rate"),  # same offset both codecs
        F.when(is_opus, _le_int_at(p, q + 10, 2)).alias("preskip"),
        _f(granule).alias("granule"),
        _f(_le_int(p, 15, 4)).alias("serial"),
        _f(_le_int(p, 19, 4)).alias("page_seq"),
        _f(nseg).alias("n_segments"),
        _f(body).alias("body_len"),
    )


def parse_ogg_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_ogg_headers (same strict contract),
    for boundary/parity tests."""
    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n < 28 or b[:4] != b"OggS" or b[4] != 0:
        return None
    nseg = b[26]
    if nseg < 1 or n < 27 + nseg:
        return None
    body = sum(b[27:27 + nseg])
    if n != 27 + nseg + body:
        return None
    q = 27 + nseg  # 0-indexed first-packet offset
    out = {
        "container": "ogg",
        "granule": int.from_bytes(b[6:14], "little"),
        "serial": int.from_bytes(b[14:18], "little"),
        "page_seq": int.from_bytes(b[18:22], "little"),
        "n_segments": nseg,
        "body_len": body,
    }
    if body >= 19 and b[q:q + 8] == b"OpusHead" and b[q + 8] == 1:
        out.update(
            codec="opus",
            channels=b[q + 9],
            preskip=int.from_bytes(b[q + 10:q + 12], "little"),
            sample_rate=int.from_bytes(b[q + 12:q + 16], "little"),
        )
        return out
    if (
        body >= 30
        and b[q:q + 7] == b"\x01vorbis"
        and int.from_bytes(b[q + 7:q + 11], "little") == 0
    ):
        out.update(
            codec="vorbis",
            channels=b[q + 11],
            preskip=None,
            sample_rate=int.from_bytes(b[q + 12:q + 16], "little"),
        )
        return out
    return None


# ---------------------------------------------------------------------------
# Length-prefix-in-first-byte varints (round 10 continuation): EBML /
# Matroska. The fourth varint class in the family — TFRecord's chains
# are continuation-bit little-endian, thrift's add a zigzag sign fold,
# EBML's encode the TOTAL WIDTH in the leading-zero count of the first
# byte (1xxxxxxx = 1 byte, 01xxxxxx = 2, ...), big-endian, marker bit
# stripped from the value. Element = fixed ID + size vint + payload;
# the walk here descends EBML-header > DocType/Version and Segment >
# Info > TimestampScale plus Tracks > TrackEntry > Video > PixelWidth/
# Height — four nesting levels whose sizes are all vints, with element
# ORDER alternating inside the header and the video element (EBML
# permits any order), so the parser must dispatch on IDs, never assume
# offsets. Layout: RFC 8794 (EBML) + the public Matroska element
# registry. EBML uints are minimal-width big-endian (1..4 bytes here),
# read with a width taken from the size vint — width itself is data.
# ---------------------------------------------------------------------------


def _ebml_vint_width_at(p, pos):
    """EBML vint width from the leading-zero count of the first byte
    (capped at 4 here; 0x00 first byte -> NULL = reject)."""
    b0 = _be_int_at(p, pos, 1)
    return (
        F.when(b0 >= 128, F.lit(1))
        .when(b0 >= 64, F.lit(2))
        .when(b0 >= 32, F.lit(3))
        .when(b0 >= 16, F.lit(4))
        .cast("long")
    )


def _ebml_vint_val_at(p, pos):
    """EBML vint value at `pos`: marker bit stripped, remaining bits +
    following bytes big-endian."""
    b0 = _be_int_at(p, pos, 1)
    return (
        F.when(b0 >= 128, b0 - 128)
        .when(b0 >= 64, (b0 - 64) * 256 + _be_int_at(p, pos + 1, 1))
        .when(b0 >= 32, (b0 - 32) * 65536 + _be_int_at(p, pos + 1, 2))
        .when(b0 >= 16, (b0 - 16) * 16777216 + _be_int_at(p, pos + 1, 3))
        .cast("long")
    )


def _ebml_uint_at(p, pos, ln):
    """EBML unsigned integer of data-dependent byte length `ln` (1..4)."""
    return (
        F.when(ln == 1, _be_int_at(p, pos, 1))
        .when(ln == 2, _be_int_at(p, pos, 2))
        .when(ln == 3, _be_int_at(p, pos, 3))
        .when(ln == 4, _be_int_at(p, pos, 4))
        .cast("long")
    )


def _ebml_vint_enc(v, wide):
    """Synthesis-side size vint: 1-byte (0x80|v) or — EBML permits
    non-minimal encodings — forced 2-byte (0x4000|v) when `wide`."""
    return F.when(wide, _be_enc(v + 0x4000, 2)).otherwise(_be_enc(v + 0x80, 1))


def synth_ebml_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid Matroska skeletons per document, every field and
    every element size a deterministic function of doc_id:

      doc_type       = 'matroska' (even) / 'webm' (odd)   <- varies sizes
      ebml_version   = 1
      timestamp_scale= 100 + (doc_id*7) % 16000000   (1-3 byte uint)
      pixel_width    = 16 + doc_id % 4000            (1-2 byte uint)
      pixel_height   = 16 + (doc_id*13) % 3000       (1-2 byte uint)

    Size vints of the EBML header / Info / Segment elements flip between
    minimal 1-byte and non-minimal 2-byte forms on doc_id residues
    (legal per RFC 8794 — a parser assuming minimal widths breaks);
    element order inside the header and the video element alternates
    with parity. The parse path below trusts only the bytes."""
    did = F.col("doc_id")
    is_mk = did % 2 == 0
    dtl = F.when(is_mk, F.lit(8)).otherwise(F.lit(4)).cast("long")
    dt = F.when(is_mk, _lit_bin(_ascii_hex("matroska"))).otherwise(
        _lit_bin(_ascii_hex("webm"))
    )
    ts = (F.lit(100) + (did * 7) % 16000000).cast("long")
    tsl = F.when(ts < 256, F.lit(1)).when(ts < 65536, F.lit(2)).otherwise(F.lit(3)).cast("long")
    w = (F.lit(16) + did % 4000).cast("long")
    h = (F.lit(16) + (did * 13) % 3000).cast("long")
    wl = F.when(w < 256, F.lit(1)).otherwise(F.lit(2)).cast("long")
    hl = F.when(h < 256, F.lit(1)).otherwise(F.lit(2)).cast("long")

    def uint_enc(v, ln):
        return F.when(ln == 1, _be_enc(v, 1)).when(ln == 2, _be_enc(v, 2)).otherwise(_be_enc(v, 3))

    ver_el = F.concat(_lit_bin("4286"), _lit_bin("81"), _lit_bin("01"))
    dt_el = F.concat(_lit_bin("4282"), _ebml_vint_enc(dtl, F.lit(False)), dt)
    hdr_payload = F.when(is_mk, F.concat(ver_el, dt_el)).otherwise(
        F.concat(dt_el, ver_el)
    )
    hdr_sz = F.lit(4) + 3 + dtl
    header = F.concat(
        _lit_bin("1A45DFA3"), _ebml_vint_enc(hdr_sz, did % 4 >= 2), hdr_payload
    )
    ts_el = F.concat(_lit_bin("2AD7B1"), _ebml_vint_enc(tsl, F.lit(False)),
                     uint_enc(ts, tsl))
    info_sz = F.lit(4) + tsl
    info = F.concat(_lit_bin("1549A966"), _ebml_vint_enc(info_sz, did % 3 == 0),
                    ts_el)
    pw_el = F.concat(_lit_bin("B0"), _ebml_vint_enc(wl, F.lit(False)), uint_enc(w, wl))
    ph_el = F.concat(_lit_bin("BA"), _ebml_vint_enc(hl, F.lit(False)), uint_enc(h, hl))
    vid_payload = F.when(is_mk, F.concat(pw_el, ph_el)).otherwise(
        F.concat(ph_el, pw_el)
    )
    vid_sz = F.lit(4) + wl + hl
    video = F.concat(_lit_bin("E0"), _ebml_vint_enc(vid_sz, F.lit(False)), vid_payload)
    te_sz = vid_sz + 2
    te = F.concat(_lit_bin("AE"), _ebml_vint_enc(te_sz, F.lit(False)), video)
    trk_sz = te_sz + 2
    tracks = F.concat(_lit_bin("1654AE6B"), _ebml_vint_enc(trk_sz, F.lit(False)), te)
    info_w = F.when(did % 3 == 0, F.lit(2)).otherwise(F.lit(1)).cast("long")
    seg_sz = (F.lit(4) + info_w + info_sz) + (F.lit(5) + trk_sz)
    segment = F.concat(_lit_bin("18538067"), _ebml_vint_enc(seg_sz, did % 2 == 1),
                       info, tracks)
    return docs.select(
        did.alias("asset_id"), F.concat(header, segment).alias("payload")
    )


def parse_ebml_headers(assets: DataFrame) -> DataFrame:
    """Matroska metadata extraction trusting ONLY the bytes: EBML-header
    ID sniff, size vints decoded by leading-zero width everywhere
    (minimal and non-minimal forms both legal), a 2-step dispatching
    walk over the header sub-elements (order-free per RFC 8794), then
    Segment > Info > TimestampScale and Segment > Tracks > TrackEntry >
    Video > PixelWidth/Height with a 2-step order-free walk inside
    Video. Unknown IDs, a vint first byte of 0x00/width > 4, or any
    element not landing exactly on its parent's end reject. Staged
    projections (the established walk discipline), zero Python, zero
    shuffle (plan-tested)."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    n = F.col("_n")
    df = df.withColumn("_hw", _ebml_vint_width_at(p, F.lit(5)))
    df = df.withColumn("_hv", _ebml_vint_val_at(p, F.lit(5)))
    hw, hv = F.col("_hw"), F.col("_hv")
    df = df.withColumn("_hp", F.lit(5) + hw)          # header payload start
    hp = F.col("_hp")
    # order-free 2-step walk over the header payload (2-byte IDs)
    df = df.withColumn("_q0", hp)
    for i in range(2):
        q = F.col(f"_q{i}")
        df = df.withColumn(f"_id{i}", F.hex(p.substr(q.try_cast("int"), F.lit(2))))
        df = df.withColumn(f"_sw{i}", _ebml_vint_width_at(p, q + 2))
        df = df.withColumn(f"_sv{i}", _ebml_vint_val_at(p, q + 2))
        df = df.withColumn(f"_vp{i}", q + 2 + F.col(f"_sw{i}"))
        df = df.withColumn(f"_q{i+1}", F.col(f"_vp{i}") + F.col(f"_sv{i}"))

    def hdr_field(el_id: str):
        return F.coalesce(
            *[
                F.when(F.col(f"_id{i}") == el_id,
                       F.struct(F.col(f"_vp{i}").alias("p"),
                                F.col(f"_sv{i}").alias("l")))
                for i in range(2)
            ]
        )

    df = df.withColumn("_verf", hdr_field("4286"))
    df = df.withColumn("_dtf", hdr_field("4282"))
    hdr_known = (
        F.col("_id0").isin("4286", "4282")
        & F.col("_id1").isin("4286", "4282")
        & (F.col("_id0") != F.col("_id1"))
        & (F.col("_q2") == hp + hv)   # walk lands exactly on header end
    )
    df = df.withColumn("_sp", hp + hv)                # Segment element start
    sp = F.col("_sp")
    df = df.withColumn("_gw", _ebml_vint_width_at(p, sp + 4))
    df = df.withColumn("_gv", _ebml_vint_val_at(p, sp + 4))
    df = df.withColumn("_ip", sp + 4 + F.col("_gw"))  # Info element start
    ip = F.col("_ip")
    df = df.withColumn("_iw", _ebml_vint_width_at(p, ip + 4))
    df = df.withColumn("_iv", _ebml_vint_val_at(p, ip + 4))
    df = df.withColumn("_tsp", ip + 4 + F.col("_iw"))  # TimestampScale el
    tsp = F.col("_tsp")
    df = df.withColumn("_tsw", _ebml_vint_width_at(p, tsp + 3))
    df = df.withColumn("_tsl", _ebml_vint_val_at(p, tsp + 3))
    df = df.withColumn("_tp", ip + 4 + F.col("_iw") + F.col("_iv"))  # Tracks
    tp = F.col("_tp")
    df = df.withColumn("_kw", _ebml_vint_width_at(p, tp + 4))
    df = df.withColumn("_kv", _ebml_vint_val_at(p, tp + 4))
    df = df.withColumn("_tep", tp + 4 + F.col("_kw"))  # TrackEntry el
    tep = F.col("_tep")
    df = df.withColumn("_tew", _ebml_vint_width_at(p, tep + 1))
    df = df.withColumn("_tev", _ebml_vint_val_at(p, tep + 1))
    df = df.withColumn("_vdp", tep + 1 + F.col("_tew"))  # Video el
    vdp = F.col("_vdp")
    df = df.withColumn("_vw", _ebml_vint_width_at(p, vdp + 1))
    df = df.withColumn("_vv", _ebml_vint_val_at(p, vdp + 1))
    df = df.withColumn("_vb", vdp + 1 + F.col("_vw"))  # video payload start
    # order-free 2-step walk inside Video (1-byte IDs)
    df = df.withColumn("_r0", F.col("_vb"))
    for i in range(2):
        r = F.col(f"_r{i}")
        df = df.withColumn(f"_vid{i}", F.hex(p.substr(r.try_cast("int"), F.lit(1))))
        df = df.withColumn(f"_vsw{i}", _ebml_vint_width_at(p, r + 1))
        df = df.withColumn(f"_vsv{i}", _ebml_vint_val_at(p, r + 1))
        df = df.withColumn(f"_vvp{i}", r + 1 + F.col(f"_vsw{i}"))
        df = df.withColumn(f"_r{i+1}", F.col(f"_vvp{i}") + F.col(f"_vsv{i}"))

    def vid_field(el_id: str):
        return F.coalesce(
            *[
                F.when(F.col(f"_vid{i}") == el_id,
                       _ebml_uint_at(p, F.col(f"_vvp{i}"), F.col(f"_vsv{i}")))
                for i in range(2)
            ]
        )

    vid_known = (
        F.col("_vid0").isin("B0", "BA")
        & F.col("_vid1").isin("B0", "BA")
        & (F.col("_vid0") != F.col("_vid1"))
        & (F.col("_r2") == F.col("_vb") + F.col("_vv"))  # lands on video end
    )
    verf, dtf = F.col("_verf"), F.col("_dtf")
    dt_bytes = p.substr(dtf["p"].try_cast("int"), dtf["l"].try_cast("int"))
    ok = (
        (n >= 12)
        & (F.hex(p.substr(1, 4)) == "1A45DFA3")
        & hdr_known
        & verf.isNotNull() & dtf.isNotNull()
        & (F.octet_length(dt_bytes).cast("long") == dtf["l"])
        & F.is_valid_utf8(dt_bytes)
        & (F.hex(p.substr(sp.try_cast("int"), F.lit(4))) == "18538067")
        & (F.hex(p.substr(ip.try_cast("int"), F.lit(4))) == "1549A966")
        & (F.hex(p.substr(tsp.try_cast("int"), F.lit(3))) == "2AD7B1")
        & (F.hex(p.substr(tp.try_cast("int"), F.lit(4))) == "1654AE6B")
        & (F.hex(p.substr(tep.try_cast("int"), F.lit(1))) == "AE")
        & (F.hex(p.substr(vdp.try_cast("int"), F.lit(1))) == "E0")
        & vid_known
        # every nesting level must account exactly
        & (tsp + 3 + F.col("_tsw") + F.col("_tsl") == ip + 4 + F.col("_iw") + F.col("_iv"))
        & (F.col("_vb") + F.col("_vv") == tep + 1 + F.col("_tew") + F.col("_tev"))
        & (tep + 1 + F.col("_tew") + F.col("_tev") == tp + 4 + F.col("_kw") + F.col("_kv"))
        & (tp + 4 + F.col("_kw") + F.col("_kv") == sp + 4 + F.col("_gw") + F.col("_gv"))
        & (n == sp + 3 + F.col("_gw") + F.col("_gv"))
    )
    def _f(col):
        return F.when(ok, col)
    return df.select(
        "asset_id",
        _f(F.lit("ebml")).alias("container"),
        _f(F.decode(dt_bytes, "UTF-8")).alias("doc_type"),
        _f(_ebml_uint_at(p, verf["p"], verf["l"])).alias("ebml_version"),
        _f(_ebml_uint_at(p, tsp + 3 + F.col("_tsw"), F.col("_tsl"))).alias(
            "timestamp_scale"
        ),
        _f(vid_field("B0")).alias("pixel_width"),
        _f(vid_field("BA")).alias("pixel_height"),
    )


def parse_ebml_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_ebml_headers (same strict contract),
    for boundary/parity tests."""
    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n < 12 or b[:4] != bytes.fromhex("1A45DFA3"):
        return None

    def vint(pos: int):
        if pos >= n:
            return None, None
        b0 = b[pos]
        if b0 >= 128:
            wd = 1
        elif b0 >= 64:
            wd = 2
        elif b0 >= 32:
            wd = 3
        elif b0 >= 16:
            wd = 4
        else:
            return None, None
        if pos + wd > n:
            return None, None
        mask = b0 - (1 << (8 - wd))
        return int.from_bytes(bytes([mask]) + b[pos + 1:pos + wd], "big"), wd

    def uint(pos: int, ln: int):
        if ln < 1 or ln > 4 or pos + ln > n:
            return None
        return int.from_bytes(b[pos:pos + ln], "big")

    hv, hw = vint(4)
    if hw is None:
        return None
    hp = 4 + hw
    fields = {}
    q = hp
    for _ in range(2):
        eid = b[q:q + 2].hex().upper()
        if eid not in ("4286", "4282") or eid in fields:
            return None
        sv, sw = vint(q + 2)
        if sw is None:
            return None
        fields[eid] = (q + 2 + sw, sv)
        q = q + 2 + sw + sv
    if q != hp + hv:
        return None
    vp, vl = fields["4286"]
    dp, dl = fields["4282"]
    dt = b[dp:dp + dl]
    if len(dt) != dl:
        return None
    try:
        doc_type = dt.decode("utf-8")
    except UnicodeDecodeError:
        return None
    sp = hp + hv  # 0-indexed Segment start
    if b[sp:sp + 4] != bytes.fromhex("18538067"):
        return None
    gv, gw = vint(sp + 4)
    if gw is None:
        return None
    ip = sp + 4 + gw
    if b[ip:ip + 4] != bytes.fromhex("1549A966"):
        return None
    iv, iw = vint(ip + 4)
    if iw is None:
        return None
    tsp = ip + 4 + iw
    if b[tsp:tsp + 3] != bytes.fromhex("2AD7B1"):
        return None
    tsl, tsw = vint(tsp + 3)
    if tsw is None or tsp + 3 + tsw + tsl != ip + 4 + iw + iv:
        return None
    scale = uint(tsp + 3 + tsw, tsl)
    tp = ip + 4 + iw + iv
    if b[tp:tp + 4] != bytes.fromhex("1654AE6B"):
        return None
    kv, kw = vint(tp + 4)
    if kw is None:
        return None
    tep = tp + 4 + kw
    if b[tep:tep + 1] != b"\xae":
        return None
    tev, tew = vint(tep + 1)
    if tew is None:
        return None
    vdp = tep + 1 + tew
    if b[vdp:vdp + 1] != b"\xe0":
        return None
    vv, vw_ = vint(vdp + 1)
    if vw_ is None:
        return None
    vb = vdp + 1 + vw_
    vfields = {}
    r = vb
    for _ in range(2):
        eid = b[r:r + 1].hex().upper()
        if eid not in ("B0", "BA") or eid in vfields:
            return None
        sv, sw = vint(r + 1)
        if sw is None:
            return None
        vfields[eid] = uint(r + 1 + sw, sv)
        r = r + 1 + sw + sv
    if r != vb + vv or vb + vv != tep + 1 + tew + tev:
        return None
    if tep + 1 + tew + tev != tp + 4 + kw + kv:
        return None
    if tp + 4 + kw + kv != sp + 4 + gw + gv:
        return None
    if n != sp + 4 + gw + gv:
        return None
    if scale is None or vfields["B0"] is None or vfields["BA"] is None:
        return None
    ver = uint(vp, vl)
    if ver is None:
        return None
    return {
        "container": "ebml",
        "doc_type": doc_type,
        "ebml_version": ver,
        "timestamp_scale": scale,
        "pixel_width": vfields["B0"],
        "pixel_height": vfields["BA"],
    }


# ---------------------------------------------------------------------------
# Varint-strided map walks (round 10 continuation): the Avro Object
# Container File header. The file metadata is a MAP whose entry count is
# itself a zigzag varint and whose keys/values are zigzag-length-
# prefixed strings — so the walk is a BOUNDED UNROLLED LOOP whose step
# count AND every stride are data (TFRecord walks fixed field counts;
# Ogg reduces a byte table; this chains N string reads where N is
# decoded first), terminated by a count-0 byte and a 16-byte sync
# marker that must land exactly at the payload end. Layout: Apache Avro
# spec §Object Container Files (public).
# ---------------------------------------------------------------------------

AVRO_MAX_META = 3  # synthesis emits 1-3 entries; the walk unrolls this many
#: varint unroll bound for OCF header string lengths (values < 2^21)
AVRO_VARINT_BYTES = 3


def synth_avro_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid Avro OCF headers per document, replayable by a SQL
    oracle:

      n_meta = 1 + doc_id % 3 entries, in rotating order:
        avro.codec  = null / deflate / snappy by doc_id % 3   (always)
        avro.schema = {"type":"record","name":"r<doc_id%100>"} (n>=2)
        user.tag    = 't' * (1 + doc_id % 200)                 (n>=3;
                      long enough to force 2-byte zigzag varints)
      sync = md5(doc_id) (16 honest bytes)

    The parse path below trusts only the bytes."""
    did = F.col("doc_id")
    n_meta = (F.lit(1) + did % 3).cast("long")

    def zz_str(s_col):
        ln = F.octet_length(s_col).cast("long")
        return F.concat(_varint_enc(F.shiftleft(ln, 1)), s_col)

    codec = F.element_at(
        F.array(F.lit("null"), F.lit("deflate"), F.lit("snappy")),
        (did % 3 + 1).cast("int"),
    )
    schema = F.concat(
        F.lit('{"type":"record","name":"r'), (did % 100).cast("string"), F.lit('"}')
    )
    tag = F.lit("t" * 200).substr(F.lit(1), (F.lit(1) + did % 200).cast("int"))
    # Entry byte strings are staged columns: each appears in 2-3 CASE
    # branches of `entries`, and inlining re-expands its two varint
    # encoders per branch — enough, fused with the parse walk, to push
    # the single codegen stage past janino's 64 KB method limit.
    staged = docs.select(
        did.alias("asset_id"),
        F.concat(zz_str(F.encode(F.lit("avro.codec"), "UTF-8")),
                 zz_str(F.encode(codec, "UTF-8"))).alias("_e_codec"),
        F.concat(zz_str(F.encode(F.lit("avro.schema"), "UTF-8")),
                 zz_str(F.encode(schema, "UTF-8"))).alias("_e_schema"),
        F.concat(zz_str(F.encode(F.lit("user.tag"), "UTF-8")),
                 zz_str(F.encode(tag, "UTF-8"))).alias("_e_tag"),
    )
    did2 = F.col("asset_id")
    n_meta2 = (F.lit(1) + did2 % 3).cast("long")
    e_codec, e_schema, e_tag = (
        F.col("_e_codec"), F.col("_e_schema"), F.col("_e_tag")
    )
    entries = (
        F.when(n_meta2 == 1, e_codec)
        .when(n_meta2 == 2, F.when(did2 % 2 == 0, F.concat(e_codec, e_schema))
              .otherwise(F.concat(e_schema, e_codec)))
        .otherwise(F.when(did2 % 2 == 0, F.concat(e_codec, e_schema, e_tag))
                   .otherwise(F.concat(e_tag, e_schema, e_codec)))
    )
    return staged.select(
        "asset_id",
        F.concat(
            _lit_bin(_ascii_hex("Obj") + "01"),
            _varint_enc(F.shiftleft(n_meta2, 1)),  # zigzag block count
            entries,
            _lit_bin("00"),                        # map terminator
            F.unhex(F.md5(did2.cast("string"))),   # sync marker
        ).alias("payload"),
    )


def parse_avro_headers(assets: DataFrame) -> DataFrame:
    """Avro OCF header extraction trusting ONLY the bytes: Obj\\x01
    sniff, zigzag-varint map count (1..AVRO_MAX_META here), then a
    bounded unrolled walk over N key/value string pairs — each stride is
    key-varint + key + value-varint + value, all data — dispatching
    captures on the key bytes; the 0x00 terminator and the 16-byte sync
    marker must land exactly at the payload end. Unknown or repeated
    keys, a missing avro.codec, non-UTF-8 strings, or a count outside
    the unroll bound reject. Staged projections, zero Python, zero
    shuffle (plan-tested)."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    n = F.col("_n")
    # Header-metadata strings are bounded (schema JSON + tag < 2^13
    # bytes; zigzag doubles that — still < 2^14), so 3-byte varint
    # unrolls suffice; a 4th byte per read pushed the fused stage past
    # janino's 64 KB method limit (deep Project chains compile into ONE
    # method — locals can't cross split-method boundaries).
    df = _varint_read_staged(df, p, F.lit(5), "_c", max_bytes=AVRO_VARINT_BYTES)
    df = df.withColumn("_cnt", _zigzag_dec(F.col("_cv")))
    cnt = F.col("_cnt")
    df = df.withColumn("_q0", F.lit(5) + F.col("_cw"))
    for i in range(AVRO_MAX_META):
        q = F.col(f"_q{i}")
        active = cnt > i
        df = _varint_read_staged(
            df, p, q, f"_k{i}", active=active, max_bytes=AVRO_VARINT_BYTES
        )
        df = df.withColumn(f"_kl{i}", _zigzag_dec(F.col(f"_k{i}v")))
        kw, kl = F.col(f"_k{i}w"), F.col(f"_kl{i}")
        df = df.withColumn(
            f"_key{i}",
            F.when(active, p.substr((q + kw).try_cast("int"), kl.try_cast("int"))),
        )
        df = df.withColumn(f"_vq{i}", q + kw + kl)
        vq = F.col(f"_vq{i}")
        df = _varint_read_staged(
            df, p, vq, f"_v{i}", active=active, max_bytes=AVRO_VARINT_BYTES
        )
        df = df.withColumn(f"_vl{i}", _zigzag_dec(F.col(f"_v{i}v")))
        vw, vl = F.col(f"_v{i}w"), F.col(f"_vl{i}")
        df = df.withColumn(
            f"_val{i}",
            F.when(active, p.substr((vq + vw).try_cast("int"), vl.try_cast("int"))),
        )
        df = df.withColumn(f"_q{i+1}", F.when(active, vq + vw + vl).otherwise(q))

    # hex(key_i) feeds the known-key check, every distinct-key pair and
    # every by-key dispatch below — materialized once per entry, or the
    # substr/hex tree re-expands at each of its ~10 uses and the single
    # codegen stage overruns janino's 64 KB method limit (same staging
    # rule as parse_av_headers' STRUCTURE NOTE).
    for i in range(AVRO_MAX_META):
        df = df.withColumn(f"_keyhex{i}", F.hex(F.col(f"_key{i}")))

    def by_key(key: str):
        kh = _ascii_hex(key)
        return F.coalesce(
            *[
                F.when(F.col(f"_keyhex{i}") == kh, F.col(f"_val{i}"))
                for i in range(AVRO_MAX_META)
            ]
        )

    entries_ok = F.lit(True)
    for i in range(AVRO_MAX_META):
        active = cnt > i
        entries_ok = entries_ok & (
            ~active
            | (
                F.col(f"_keyhex{i}").isin(
                    _ascii_hex("avro.codec"),
                    _ascii_hex("avro.schema"),
                    _ascii_hex("user.tag"),
                )
                & (F.octet_length(F.col(f"_key{i}")).cast("long") == F.col(f"_kl{i}"))
                & (F.octet_length(F.col(f"_val{i}")).cast("long") == F.col(f"_vl{i}"))
                & F.is_valid_utf8(F.col(f"_val{i}"))
            )
        )
    distinct_keys = F.lit(True)
    for i in range(AVRO_MAX_META):
        for j in range(i + 1, AVRO_MAX_META):
            distinct_keys = distinct_keys & (
                ~((cnt > i) & (cnt > j))
                | (F.col(f"_keyhex{i}") != F.col(f"_keyhex{j}"))
            )
    qend = F.col(f"_q{AVRO_MAX_META}")
    # Same rule for the dispatched values and the validity gate: each is
    # referenced by several output columns, so they must be aliases.
    df = df.withColumn("_codec_val", by_key("avro.codec"))
    df = df.withColumn("_schema_val", by_key("avro.schema"))
    df = df.withColumn(
        "_ok",
        (n >= 23)
        & (F.hex(p.substr(1, 4)) == _ascii_hex("Obj") + "01")
        & (cnt >= 1) & (cnt <= AVRO_MAX_META)
        & entries_ok
        & distinct_keys
        & (_be_int_at(p, qend, 1) == 0)          # map terminator
        & (n == qend + 16)                       # sync lands exactly at end
        & F.col("_codec_val").isNotNull(),
    )
    ok = F.col("_ok")
    def _f(col):
        return F.when(ok, col)
    return df.select(
        "asset_id",
        _f(F.lit("avro")).alias("container"),
        _f(F.decode(F.col("_codec_val"), "UTF-8")).alias("codec"),
        F.when(ok & F.col("_schema_val").isNotNull(),
               F.octet_length(F.col("_schema_val")).cast("long")).alias("schema_len"),
        _f(cnt).alias("n_meta"),
        _f(F.hex(p.substr((qend + 1).try_cast("int"), F.lit(16)))).alias("sync_hex"),
    )


def parse_avro_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_avro_headers (same strict
    contract, including the AVRO_VARINT_BYTES unroll bound — a 4-byte
    varint chain rejects in BOTH paths), for boundary/parity tests."""
    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n < 23 or b[:4] != b"Obj\x01":
        return None

    def varint(pos: int):
        val, w = 0, 0
        while w < AVRO_VARINT_BYTES:
            if pos + w >= n:
                return None, None
            byte = b[pos + w]
            val += (byte & 127) << (7 * w)
            w += 1
            if byte < 128:
                return val, w
        return None, None

    def zigzag(raw: int) -> int:
        return (raw >> 1) ^ -(raw & 1)

    craw, cw = varint(4)
    if cw is None:
        return None
    cnt = zigzag(craw)
    if cnt < 1 or cnt > AVRO_MAX_META:
        return None
    q = 4 + cw
    known = {b"avro.codec", b"avro.schema", b"user.tag"}
    seen: dict[bytes, bytes] = {}
    for _ in range(cnt):
        klraw, kw = varint(q)
        if kw is None:
            return None
        kl = zigzag(klraw)
        if kl < 0:
            return None
        key = b[q + kw:q + kw + kl]
        if len(key) != kl or key not in known or key in seen:
            return None
        vq = q + kw + kl
        vlraw, vw = varint(vq)
        if vw is None:
            return None
        vl = zigzag(vlraw)
        if vl < 0:
            return None
        val = b[vq + vw:vq + vw + vl]
        if len(val) != vl:
            return None
        try:
            val.decode("utf-8")
        except UnicodeDecodeError:
            return None
        seen[key] = val
        q = vq + vw + vl
    if q >= n or b[q] != 0 or n != q + 17:
        return None
    if b"avro.codec" not in seen:
        return None
    schema = seen.get(b"avro.schema")
    return {
        "container": "avro",
        "codec": seen[b"avro.codec"].decode("utf-8"),
        "schema_len": len(schema) if schema is not None else None,
        "n_meta": cnt,
        "sync_hex": b[q + 1:q + 17].hex().upper(),
    }


# ---------------------------------------------------------------------------
# safetensors — the tensor-checkpoint container of the HF ecosystem, i.e.
# what an ML data lake actually stores next to its training shards. An
# eighth decode shape: LENGTH-PREFIXED JSON — a u64-LE frame length, then
# a JSON map whose KEYS are data (tensor names), parsed with the engine's
# native JSON machinery (from_json to a typed map) instead of positional
# byte arithmetic; every prior family reads fixed positions, this one
# hands a variable region to a recursive parser and validates around it.
# ---------------------------------------------------------------------------

#: tensor entries the synthesis emits (1..SAFETENSORS_MAX_TENSORS)
SAFETENSORS_MAX_TENSORS = 3

_ST_SCHEMA = (
    "map<string,struct<dtype:string,shape:array<bigint>,"
    "data_offsets:array<bigint>>>"
)


def synth_safetensors_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid safetensors headers per document, replayable by a
    SQL oracle:

      n_tensors = 1 + doc_id % 3, entry k (0-based):
        dtype        = ('F32','F16','I8')[(doc_id+k) % 3]  (4/2/1 bytes)
        shape        = [1 + (doc_id*3+k) % 8, 1 + (doc_id*5+2k) % 16]
        data_offsets = cumulative [start, end) in dtype-sized bytes
      '__metadata__' entry appended when doc_id % 2 = 0; one space of
      spec-legal padding after the JSON when doc_id % 4 = 0 (the header
      length INCLUDES padding). Payload = u64-LE(header_len) || JSON."""
    did = F.col("doc_id")
    n_t = (F.lit(1) + did % 3).cast("long")

    nbytes = []
    entries = []
    for k in range(SAFETENSORS_MAX_TENSORS):
        dt = F.element_at(
            F.array(F.lit("F32"), F.lit("F16"), F.lit("I8")),
            ((did + k) % 3 + 1).cast("int"),
        )
        esz = F.element_at(
            F.array(F.lit(4), F.lit(2), F.lit(1)), ((did + k) % 3 + 1).cast("int")
        ).cast("long")
        a = (F.lit(1) + (did * 3 + k) % 8).cast("long")
        b = (F.lit(1) + (did * 5 + 2 * k) % 16).cast("long")
        nbytes.append(a * b * esz)
        start = sum(nbytes[:k], F.lit(0).cast("long"))
        end = start + nbytes[k]
        entries.append(
            F.concat(
                F.lit(f'"t{k}":{{"dtype":"'), dt,
                F.lit('","shape":['), a.cast("string"), F.lit(","),
                b.cast("string"),
                F.lit('],"data_offsets":['), start.cast("string"),
                F.lit(","), end.cast("string"), F.lit("]}"),
            )
        )
    body = (
        F.when(n_t == 1, entries[0])
        .when(n_t == 2, F.concat_ws(",", entries[0], entries[1]))
        .otherwise(F.concat_ws(",", *entries))
    )
    js = F.concat(
        F.lit("{"), body,
        F.when(did % 2 == 0, F.lit(',"__metadata__":{"format":"pt"}')).otherwise(
            F.lit("")
        ),
        F.lit("}"),
        F.when(did % 4 == 0, F.lit(" ")).otherwise(F.lit("")),
    )
    staged = docs.select(did.alias("asset_id"), F.encode(js, "UTF-8").alias("_js"))
    return staged.select(
        "asset_id",
        F.concat(
            _le_enc(F.octet_length(F.col("_js")).cast("long"), 8), F.col("_js")
        ).alias("payload"),
    )


def parse_safetensors_headers(assets: DataFrame) -> DataFrame:
    """safetensors header extraction trusting ONLY the bytes: u64-LE
    frame length must land exactly at payload end, the frame must be
    valid UTF-8 JSON parsing to the tensor-map schema, every tensor
    entry (keys other than '__metadata__') must carry dtype, a nonempty
    shape and a 2-element data_offsets, and at least one tensor must
    exist — else every field is NULL. Returns (asset_id, container,
    header_len, n_tensors, total_params, data_end, has_metadata).
    The JSON region is parsed by the engine's native from_json (a
    recursive parser, not positional arithmetic); all tensor math is
    higher-order array folds. Zero Python, zero shuffle (plan-tested)."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    df = df.withColumn("_hlen", _le_int_at(p, F.lit(1), 8))
    hlen = F.col("_hlen")
    df = df.withColumn("_jsb", p.substr(F.lit(9), hlen.try_cast("int")))
    # decode THROWS on malformed UTF-8 (Spark 4 MALFORMED_CHARACTER_CODING);
    # the CASE gate short-circuits it to NULL for invalid frames, which is
    # also the twin's strict-decode verdict.
    df = df.withColumn(
        "_js",
        F.when(F.is_valid_utf8(F.col("_jsb")), F.decode(F.col("_jsb"), "UTF-8")),
    )
    df = df.withColumn("_m", F.from_json(F.col("_js"), _ST_SCHEMA))
    m = F.col("_m")
    df = df.withColumn(
        "_t", F.map_filter(m, lambda k, v: k != "__metadata__")
    )
    t = F.col("_t")
    # every element of shape/data_offsets must be non-null: from_json
    # nulls individual elements it can't coerce (e.g. a JSON null or
    # float inside the array) while leaving the array length intact —
    # without the element check the JVM would emit a half-populated row
    # where the twin rejects.
    entries_ok = F.forall(
        F.map_values(t),
        lambda v: v["dtype"].isNotNull()
        & (F.size(v["shape"]) >= 1)
        & F.forall(v["shape"], lambda x: x.isNotNull())
        & (F.size(v["data_offsets"]) == 2)
        & F.forall(v["data_offsets"], lambda x: x.isNotNull()),
    )
    df = df.withColumn(
        "_ok",
        (F.col("_n") == hlen + 8)
        & F.is_valid_utf8(F.col("_jsb"))
        & m.isNotNull()
        & (F.size(t) >= 1)
        & entries_ok,
    )
    ok = F.col("_ok")

    def _f(col):
        return F.when(ok, col)

    total_params = F.aggregate(
        F.map_values(t),
        F.lit(0).cast("long"),
        lambda acc, v: acc
        + F.aggregate(v["shape"], F.lit(1).cast("long"), lambda x, y: x * y),
    )
    data_end = F.array_max(
        F.transform(F.map_values(t), lambda v: F.element_at(v["data_offsets"], 2))
    )
    return df.select(
        "asset_id",
        _f(F.lit("safetensors")).alias("container"),
        _f(hlen).alias("header_len"),
        _f(F.size(t).cast("long")).alias("n_tensors"),
        _f(total_params).alias("total_params"),
        _f(data_end).alias("data_end"),
        _f(
            F.array_contains(F.map_keys(m), "__metadata__").cast("int").cast("long")
        ).alias("has_metadata"),
    )


def parse_safetensors_header_py(payload: bytes) -> dict | None:
    """The Python-path twin of parse_safetensors_headers (same strict
    contract), for boundary/parity tests."""
    import json

    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n < 8:
        return None
    hlen = int.from_bytes(b[:8], "little")
    if n != hlen + 8:
        return None
    try:
        js = b[8:].decode("utf-8")
        m = json.loads(js)
    except (UnicodeDecodeError, json.JSONDecodeError):
        return None
    if not isinstance(m, dict):
        return None
    tensors = {k: v for k, v in m.items() if k != "__metadata__"}
    if not tensors:
        return None
    total_params, data_end = 0, None
    for v in tensors.values():
        if not isinstance(v, dict):
            return None
        shape = v.get("shape")
        offs = v.get("data_offsets")
        dt = v.get("dtype")
        if not isinstance(dt, str) or not isinstance(shape, list) or not shape:
            return None
        if not isinstance(offs, list) or len(offs) != 2:
            return None
        # bool is an int subclass in Python: JSON true/false must reject
        # exactly like from_json (which nulls them against array<bigint>)
        prod = 1
        for x in shape:
            if not isinstance(x, int) or isinstance(x, bool):
                return None
            prod *= x
        total_params += prod
        if not all(isinstance(x, int) and not isinstance(x, bool) for x in offs):
            return None
        data_end = offs[1] if data_end is None else max(data_end, offs[1])
    return {
        "container": "safetensors",
        "header_len": hlen,
        "n_tensors": len(tensors),
        "total_params": total_params,
        "data_end": data_end,
        "has_metadata": "__metadata__" in m,
    }


# ---------------------------------------------------------------------------
# ZIP central directory — how zipped corpora are listed without reading
# the members. A ninth decode shape: BACKWARD DISCOVERY — the End Of
# Central Directory record sits at a variable distance from the END of
# the file (trailing comment), so the walk first scans backward from the
# tail, then jumps to the central directory offset it names and walks
# forward with per-entry variable strides (name/extra/comment lengths).
# Every prior family starts at byte 0.
# ---------------------------------------------------------------------------

#: central-directory entries the synthesis emits (1..ZIP_MAX_ENTRIES)
ZIP_MAX_ENTRIES = 3
#: EOCD comment lengths the backward scan tries (0..ZIP_MAX_COMMENT;
#: the spec allows 64 KiB — same bounded-unroll discipline as the other
#: walks, documented)
ZIP_MAX_COMMENT = 6


def synth_zip_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid ZIP tails per document (the local-file section is
    opaque filler — the reader never touches it), replayable by a SQL
    oracle:

      n_files = 1 + doc_id % 3, entry k (0-based):
        name    = 'n' * (1 + (doc_id+k) % 4) || k
        method  = 0 (stored) if (doc_id+k) % 2 = 0 else 8 (deflated)
        usize   = 100 + (doc_id*11 + k*17) % 900
        csize   = usize if stored else 40 + (usize * 3 div 5)
        comment = 'e' * ((doc_id+k) % 3);  extra empty
        offset  = sum over previous entries of (30 + name_len + csize)
      EOCD comment = 'c' * (doc_id % 7)."""
    did = F.col("doc_id")
    n_f = (F.lit(1) + did % 3).cast("long")

    fnlens, csizes, entries = [], [], []
    for k in range(ZIP_MAX_ENTRIES):
        namelen = (F.lit(1) + (did + k) % 4).cast("int")
        name = F.concat(F.lit("n" * 4).substr(F.lit(1), namelen), F.lit(str(k)))
        fnlen = (namelen + 1).cast("long")
        method = F.when((did + k) % 2 == 0, F.lit(0)).otherwise(F.lit(8)).cast("long")
        usize = (F.lit(100) + (did * 11 + k * 17) % 900).cast("long")
        # floor((usize*3)/5) is exact here (values < 2^53) and keeps the
        # usize formula a single source of truth
        csize = F.when(method == 0, usize).otherwise(
            F.lit(40) + F.floor(usize * 3 / F.lit(5)).cast("long")
        ).cast("long")
        crc = F.conv(
            F.substring(F.md5(F.encode(F.concat(F.lit("crc:"), did.cast("string"),
                                                F.lit(f":{k}")), "UTF-8")), 1, 8),
            16, 10,
        ).cast("long")
        cmlen = ((did + k) % 3).cast("long")
        comment = F.lit("e" * 2).substr(F.lit(1), cmlen.cast("int"))
        offset = sum(
            (F.lit(30) + fnlens[j] + csizes[j] for j in range(k)),
            F.lit(0).cast("long"),
        )
        fnlens.append(fnlen)
        csizes.append(csize)
        entries.append(
            F.concat(
                _lit_bin("504B0102"),       # central-dir entry signature
                _le_enc(F.lit(20), 2),      # version made by
                _le_enc(F.lit(20), 2),      # version needed
                _le_enc(F.lit(0), 2),       # flags
                _le_enc(method, 2),
                _le_enc(F.lit(0), 2),       # mod time
                _le_enc(F.lit(0), 2),       # mod date
                _le_enc(crc, 4),
                _le_enc(csize, 4),
                _le_enc(usize, 4),
                _le_enc(fnlen, 2),
                _le_enc(F.lit(0), 2),       # extra len
                _le_enc(cmlen, 2),
                _le_enc(F.lit(0), 2),       # disk number start
                _le_enc(F.lit(0), 2),       # internal attrs
                _le_enc(F.lit(0), 4),       # external attrs
                _le_enc(offset, 4),
                F.encode(name, "UTF-8"),
                F.encode(comment, "UTF-8"),
            ).alias(f"_e{k}")
        )

    cd_off = sum(
        (
            F.when(n_f > k, F.lit(30) + fnlens[k] + csizes[k]).otherwise(F.lit(0))
            for k in range(ZIP_MAX_ENTRIES)
        ),
        F.lit(0).cast("long"),
    )
    staged = docs.select(
        did.alias("asset_id"), n_f.alias("_nf"), cd_off.alias("_cdoff"), *entries
    )
    nf, cdo = F.col("_nf"), F.col("_cdoff")
    cd = (
        F.when(nf == 1, F.col("_e0"))
        .when(nf == 2, F.concat(F.col("_e0"), F.col("_e1")))
        .otherwise(F.concat(F.col("_e0"), F.col("_e1"), F.col("_e2")))
    )
    staged = staged.select(
        "asset_id", "_nf", "_cdoff", cd.alias("_cd")
    )
    did2 = F.col("asset_id")
    eocd_comment = F.lit("c" * ZIP_MAX_COMMENT).substr(
        F.lit(1), (did2 % 7).cast("int")
    )
    filler = F.repeat(F.lit("L"), F.col("_cdoff").cast("int"))
    return staged.select(
        "asset_id",
        F.concat(
            F.encode(filler, "UTF-8"),
            F.col("_cd"),
            _lit_bin("504B0506"),                    # EOCD signature
            _le_enc(F.lit(0), 2),                    # this disk
            _le_enc(F.lit(0), 2),                    # cd start disk
            _le_enc(F.col("_nf"), 2),                # entries this disk
            _le_enc(F.col("_nf"), 2),                # entries total
            _le_enc(F.octet_length(F.col("_cd")).cast("long"), 4),  # cd size
            _le_enc(F.col("_cdoff"), 4),             # cd offset
            _le_enc((did2 % 7).cast("long"), 2),     # comment len
            F.encode(eocd_comment, "UTF-8"),
        ).alias("payload"),
    )


def parse_zip_central_dir(assets: DataFrame) -> DataFrame:
    """ZIP listing trusting ONLY the bytes: the EOCD is found by trying
    each comment length 0..ZIP_MAX_COMMENT backward from the tail
    (SMALLEST first = rightmost EOCD) and must carry zeroed disk fields,
    matching entry counts (1..ZIP_MAX_ENTRIES) and a comment length that
    lands the record exactly at payload end; the central directory walk
    then starts at the EOCD's offset, checks each entry signature,
    advances by the per-entry variable stride (46 + name + extra +
    comment), requires method stored/deflated, and must land exactly at
    the EOCD start with cd_size consistent. Rejections emit no rows.
    Emits one row per member: (asset_id, file_idx, name, method, csize,
    usize, local_offset, n_files). Bounded unrolls, staged projections,
    zero Python, zero shuffle before the member explode (plan-tested)."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    n = F.col("_n")

    # Backward EOCD discovery: smallest comment length whose candidate
    # position carries the signature.
    # each candidate position must be gated >= 1: Spark substr treats a
    # NEGATIVE position as from-the-END, which could false-match sig
    # bytes sitting in the tail of a short payload — the Python twin's
    # pos >= 0 guard would reject the same probe (twin-parity hazard).
    eocd_cand = F.coalesce(
        *[
            F.when(
                (n - 21 - c >= 1)
                & (
                    F.hex(p.substr((n - 21 - c).try_cast("int"), F.lit(4)))
                    == "504B0506"
                ),
                F.lit(c).cast("long"),
            )
            for c in range(ZIP_MAX_COMMENT + 1)
        ]
    )
    df = df.withColumn("_clen", eocd_cand)
    clen = F.col("_clen")
    df = df.withColumn("_eocd", n - 21 - clen)
    eocd = F.col("_eocd")
    df = df.withColumn("_cnt", _le_int_at(p, eocd + 10, 2))
    df = df.withColumn("_cdsz", _le_int_at(p, eocd + 12, 4))
    df = df.withColumn("_cdoff", _le_int_at(p, eocd + 16, 4))
    cnt, cdsz, cdoff = F.col("_cnt"), F.col("_cdsz"), F.col("_cdoff")
    eocd_ok = (
        (n >= 22)
        & clen.isNotNull()
        & (_le_int_at(p, eocd + 4, 2) == 0)          # this disk
        & (_le_int_at(p, eocd + 6, 2) == 0)          # cd start disk
        & (_le_int_at(p, eocd + 8, 2) == cnt)        # per-disk count
        & (cnt >= 1) & (cnt <= ZIP_MAX_ENTRIES)
        & (_le_int_at(p, eocd + 20, 2) == clen)      # comment len field
        & (cdoff + cdsz == eocd - 1)                 # cd abuts the EOCD
    )
    df = df.withColumn("_q0", cdoff + 1)
    for k in range(ZIP_MAX_ENTRIES):
        q = F.col(f"_q{k}")
        active = cnt > k
        df = df.withColumn(
            f"_sig{k}", F.when(active, F.hex(p.substr(q.try_cast("int"), F.lit(4))))
        )
        df = df.withColumn(f"_m{k}", F.when(active, _le_int_at(p, q + 10, 2)))
        df = df.withColumn(f"_cs{k}", F.when(active, _le_int_at(p, q + 20, 4)))
        df = df.withColumn(f"_us{k}", F.when(active, _le_int_at(p, q + 24, 4)))
        df = df.withColumn(f"_fl{k}", F.when(active, _le_int_at(p, q + 28, 2)))
        df = df.withColumn(f"_xl{k}", F.when(active, _le_int_at(p, q + 30, 2)))
        df = df.withColumn(f"_cl{k}", F.when(active, _le_int_at(p, q + 32, 2)))
        df = df.withColumn(f"_off{k}", F.when(active, _le_int_at(p, q + 42, 4)))
        df = df.withColumn(
            f"_nmb{k}",
            F.when(active, p.substr((q + 46).try_cast("int"),
                                    F.col(f"_fl{k}").try_cast("int"))),
        )
        df = df.withColumn(
            f"_ok{k}",
            ~active
            | (
                (F.col(f"_sig{k}") == "504B0102")
                & F.col(f"_m{k}").isin(0, 8)
                & (F.octet_length(F.col(f"_nmb{k}")).cast("long")
                   == F.col(f"_fl{k}"))
                & F.is_valid_utf8(F.col(f"_nmb{k}"))
            ),
        )
        df = df.withColumn(
            f"_q{k + 1}",
            F.when(
                active & F.col(f"_ok{k}"),
                q + 46 + F.col(f"_fl{k}") + F.col(f"_xl{k}") + F.col(f"_cl{k}"),
            ).otherwise(q),
        )

    walk_ok = F.lit(True)
    for k in range(ZIP_MAX_ENTRIES):
        walk_ok = walk_ok & F.col(f"_ok{k}")
    df = df.withColumn(
        "_doc_ok",
        eocd_ok & walk_ok & (F.col(f"_q{ZIP_MAX_ENTRIES}") == eocd),
    )
    members = F.array(
        *[
            F.when(
                F.col("_doc_ok") & (cnt > k),
                F.struct(
                    F.lit(k).cast("long").alias("file_idx"),
                    F.decode(F.col(f"_nmb{k}"), "UTF-8").alias("name"),
                    F.when(F.col(f"_m{k}") == 0, F.lit("stored"))
                    .otherwise(F.lit("deflated")).alias("method"),
                    F.col(f"_cs{k}").alias("csize"),
                    F.col(f"_us{k}").alias("usize"),
                    F.col(f"_off{k}").alias("local_offset"),
                ),
            )
            for k in range(ZIP_MAX_ENTRIES)
        ]
    )
    return df.select(
        "asset_id", F.when(F.col("_doc_ok"), cnt).alias("n_files"),
        F.explode(F.array_compact(members)).alias("_m"),
    ).select(
        "asset_id",
        F.col("_m.file_idx").alias("file_idx"),
        F.col("_m.name").alias("name"),
        F.col("_m.method").alias("method"),
        F.col("_m.csize").alias("csize"),
        F.col("_m.usize").alias("usize"),
        F.col("_m.local_offset").alias("local_offset"),
        "n_files",
    )


def parse_zip_central_dir_py(payload: bytes) -> list[dict] | None:
    """The Python-path twin of parse_zip_central_dir (same strict
    contract, including the bounded comment scan and entry unroll), for
    boundary/parity tests."""
    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)
    if n < 22:
        return None
    clen = None
    for c in range(ZIP_MAX_COMMENT + 1):
        pos = n - 22 - c
        if pos >= 0 and b[pos:pos + 4] == b"PK\x05\x06":
            clen = c
            break
    if clen is None:
        return None
    e = n - 22 - clen

    def le(pos: int, w: int) -> int:
        return int.from_bytes(b[pos:pos + w], "little")

    cnt = le(e + 10, 2)
    cdsz, cdoff = le(e + 12, 4), le(e + 16, 4)
    if le(e + 4, 2) != 0 or le(e + 6, 2) != 0 or le(e + 8, 2) != cnt:
        return None
    if not (1 <= cnt <= ZIP_MAX_ENTRIES) or le(e + 20, 2) != clen:
        return None
    if cdoff + cdsz != e:
        return None
    q = cdoff
    out: list[dict] = []
    for k in range(cnt):
        if b[q:q + 4] != b"PK\x01\x02":
            return None
        m = le(q + 10, 2)
        if m not in (0, 8):
            return None
        fl, xl, cl = le(q + 28, 2), le(q + 30, 2), le(q + 32, 2)
        nm = b[q + 46:q + 46 + fl]
        if len(nm) != fl:
            return None
        try:
            name = nm.decode("utf-8")
        except UnicodeDecodeError:
            return None
        out.append({
            "file_idx": k,
            "name": name,
            "method": "stored" if m == 0 else "deflated",
            "csize": le(q + 20, 4),
            "usize": le(q + 24, 4),
            "local_offset": le(q + 42, 4),
        })
        q += 46 + fl + xl + cl
    if q != e:
        return None
    for r in out:
        r["n_files"] = cnt
    return out


# ---------------------------------------------------------------------------
# tar member walk (WebDataset shards) — WebDataset, the de-facto sharded
# container for large-scale image-text training data, is plain POSIX
# ustar tarballs: samples are groups of same-basename members
# (000017.jpg + 000017.txt + 000017.json). Listing a shard without
# reading the payloads is the ingest index step of every WebDataset
# pipeline. A NEW decode class the first twelve formats lack: fixed
# 512-byte BLOCK framing with OCTAL-TEXT numeric fields (not binary
# integers), a header CHECKSUM defined as the byte sum of the header
# with its own checksum field read as eight spaces, and
# pad-to-block-boundary stride arithmetic (data occupies
# ceil(size/512) blocks). Reference semantics: POSIX.1-1988 ustar;
# WebDataset sharding convention per Aizman et al. 2019 ("High
# Performance I/O For Large Scale Deep Learning").
# ---------------------------------------------------------------------------

#: members per synthesized shard (1..TAR_MAX_MEMBERS); the parser's
#: bounded unroll — same documented discipline as the other walks
TAR_MAX_MEMBERS = 3
#: fixed non-name header tail, bytes 157..511: linkname (100 NUL) +
#: magic "ustar\0" + version "00" + uname/gname (32 NUL each) +
#: devmajor/devminor (8 NUL each) + prefix (155 NUL) + pad (12 NUL)
_TAR_TAIL_HEX = (
    "00" * 100 + "757374617200" + "3030" + "00" * 32 + "00" * 32
    + "00" * 8 + "00" * 8 + "00" * 155 + "00" * 12
)
#: byte sum of the fixed region AFTER the checksum field (typeflag '0'
#: + "ustar\0" + "00"): 0x30 + (0x75+0x73+0x74+0x61+0x72) + (0x30+0x30)
_TAR_TAIL_SUM = 0x30 + 0x75 + 0x73 + 0x74 + 0x61 + 0x72 + 0x30 + 0x30


#: hex digits with nonzero value ('0' contributes nothing to a digit sum)
_HEX_DIGITS = "123456789ABCDEF"


def _digit_sum(s):
    """Sum of hex-digit VALUES over a hex-digit string column: digit d
    occurs len(s) - len(replace(s, d)) times, so the sum is
    120*len(s) - sum_d d*len(replace(s, d)) — 16 plain string scans, no
    per-character iteration. `s` must be a lambda variable or attribute
    (each scan references it), never an inline expensive expression."""
    total = F.lit(120) * F.length(s)
    for d, ch in enumerate(_HEX_DIGITS, start=1):
        total = total - F.lit(d) * F.length(F.replace(s, F.lit(ch)))
    return total


def _byte_sum(bin_col):
    """Byte-value sum of a binary column — pure JVM, no Python, exact
    integer. Counting form (guide §1.2, per-task work): over the hex
    image, sum_bytes = 16*digitsum(hi digits) + digitsum(lo digits)
    = 15*digitsum(hi) + digitsum(all); digit sums come from
    per-digit-value occurrence counts (`_digit_sum`), and the hi-digit
    string is one regexp pass keeping the first char of each pair. This
    replaces the r13 regexp_extract_all('(..)') + aggregate(conv) pair
    walk, whose per-element lambda ran INTERPRETED conv/cast for every
    byte (r14 A/B: tar_members 7.9 -> 6.6 s, whole query, same-window
    min-of-reps); the counting form is a fixed 18 string scans per call
    regardless of length.

    Let-binding discipline (audio_dedup.py): hex() and the hi-digit
    string each stage as a single-element-transform LAMBDA VARIABLE, so
    an expensive `bin_col` (the synthesis side passes a whole header
    concat) is hexed once and each string scans off the binding — no
    optimizer rule can inline a lambda variable into its references.

    A plain index-walk variant (aggregate over a byte-offset sequence
    with hx.substr(i*2+1, 2)) was measured at 4.3x SLOWER in r13 than
    even the pair walk: without the binding, the lambda re-evaluates
    the embedded hex() per element — the same trap, pinned here so it
    is not retried."""

    def let1(bind, body):
        return F.element_at(F.transform(F.array(bind), body), 1)

    return let1(
        F.hex(bin_col),
        lambda hx: let1(
            F.regexp_replace(hx, F.lit("(.)."), F.lit("$1")),
            lambda hi: (F.lit(15) * _digit_sum(hi) + _digit_sum(hx)).cast("long"),
        ),
    )


def _zeros(n_col):
    """n zero bytes, n a Column (JVM-side)."""
    return F.unhex(F.repeat(F.lit("00"), n_col.cast("int")))


def synth_tar_payloads(docs: DataFrame) -> DataFrame:
    """Format-valid ustar shards per document, every field a
    deterministic function of doc_id so a SQL oracle can replay the
    parsed output:

      n_members = 1 + doc_id % 3, member k (0-based):
        ext  = ('jpg','txt','json')[k]
        name = 'shard' || doc_id || '/sample' || (k div 2) || '.' || ext
        size = (doc_id*13 + k*29) % 1500   (0..3 data blocks)
      (members 0 and 1 share the basename 'sample0' — the WebDataset
      pairing convention, an image and its caption — so the sample
      assembly over this synthesis is a real grouping, not 1:1)
      mode 0000644, uid/gid 0000000, mtime 0, typeflag '0'; data is
      'D' * size NUL-padded to the block boundary; the archive ends
      with the two POSIX zero blocks. The checksum is computed the
      spec's way: byte sum of the 512-byte header with the checksum
      field read as eight ASCII spaces, stored as six octal digits +
      NUL + space."""
    did = F.col("doc_id")
    n_m = (F.lit(1) + did % 3).cast("long")

    blocks = []
    for k in range(TAR_MAX_MEMBERS):
        ext = ("jpg", "txt", "json")[k]
        name = F.concat(
            F.lit("shard"), did.cast("string"),
            F.lit(f"/sample{k // 2}.{ext}"),
        )
        size = ((did * 13 + k * 29) % 1500).cast("long")
        part1 = F.concat(
            F.encode(name, "UTF-8"),
            _zeros(F.lit(100) - F.length(name)),            # name -> 100
            F.encode(F.lit("0000644"), "UTF-8"), _lit_bin("00"),   # mode
            F.encode(F.lit("0000000"), "UTF-8"), _lit_bin("00"),   # uid
            F.encode(F.lit("0000000"), "UTF-8"), _lit_bin("00"),   # gid
            F.encode(F.lpad(F.conv(size, 10, 8), 11, "0"), "UTF-8"),
            _lit_bin("00"),                                 # size, octal
            F.encode(F.lit("00000000000"), "UTF-8"), _lit_bin("00"),  # mtime
        )
        chksum = _byte_sum(part1) + F.lit(8 * 0x20) + F.lit(_TAR_TAIL_SUM)
        header = F.concat(
            part1,
            F.encode(F.lpad(F.conv(chksum, 10, 8), 6, "0"), "UTF-8"),
            _lit_bin("0020"),                               # chksum: \0 + space
            F.encode(F.lit("0"), "UTF-8"),                  # typeflag
            _lit_bin(_TAR_TAIL_HEX),
        )
        n_blocks = F.floor((size + 511) / 512).cast("long")
        data = F.concat(
            F.encode(F.repeat(F.lit("D"), size.cast("int")), "UTF-8"),
            _zeros(n_blocks * 512 - size),
        )
        blocks.append(
            F.when(n_m > k, F.concat(header, data)).otherwise(_lit_bin(""))
        )
    return docs.select(
        did.alias("asset_id"),
        F.concat(*blocks, _lit_bin("00" * 1024)).alias("payload"),
    )


def parse_tar_members(assets: DataFrame) -> DataFrame:
    """WebDataset shard listing trusting ONLY the bytes: each header
    block must carry the ustar magic + version, typeflag '0', pure
    octal-text mode/uid/gid/size/mtime fields (checked on the HEX image
    so corrupt bytes never reach a UTF-8 decode), a NUL-terminated
    NUL-padded UTF-8 name, and a checksum that equals the byte sum of
    the header with its checksum field read as eight spaces; the walk
    advances 512 + 512*ceil(size/512) and must land exactly on the two
    all-zero POSIX trailer blocks. Any violation rejects the whole
    shard (no rows). Emits one row per member: (asset_id, member_idx,
    name, sample_key, ext, size, n_blocks, data_offset, n_members) —
    sample_key/ext are the WebDataset pairing split (basename before
    the last dot groups the members of one training sample).

    Scale shape: bounded unroll over TAR_MAX_MEMBERS, staged
    projections, zero Python, zero shuffle before the member explode
    (plan-tested); the checksum byte-sums are higher-order array
    aggregates over hex pairs — JVM-side, per-row."""
    p = F.col("payload")
    df = assets.select("asset_id", "payload")
    df = df.withColumn("_n", F.octet_length(p).cast("long"))
    n = F.col("_n")

    oct_field = "^(3[0-7]){7}00$"            # 7 octal digits + NUL
    oct11 = "^(3[0-7]){11}00$"               # 11 octal digits + NUL
    oct_chk = "^(3[0-7]){6}0020$"            # 6 octal digits + NUL + space

    df = df.withColumn("_q0", F.lit(1).cast("long"))
    df = df.withColumn("_live0", F.lit(True))
    for k in range(TAR_MAX_MEMBERS):
        q, live = F.col(f"_q{k}"), F.col(f"_live{k}")
        present = (
            live & (q + 511 <= n)
            & (p.substr(q.try_cast("int"), F.lit(1)) != _lit_bin("00"))
        )
        df = df.withColumn(f"_pr{k}", present)
        present = F.col(f"_pr{k}")
        nm_bin = p.substr(q.try_cast("int"), F.lit(100))
        df = df.withColumn(
            f"_nm{k}",
            F.when(
                present & F.is_valid_utf8(nm_bin),
                F.substring_index(F.decode(nm_bin, "UTF-8"), "\x00", 1),
            ),
        )
        fields_ok = (
            F.when(present, F.hex(p.substr((q + 100).try_cast("int"), F.lit(8))))
            .otherwise(F.lit("")).rlike(oct_field)                     # mode
            & F.hex(p.substr((q + 108).try_cast("int"), F.lit(8))).rlike(oct_field)   # uid
            & F.hex(p.substr((q + 116).try_cast("int"), F.lit(8))).rlike(oct_field)   # gid
            & F.hex(p.substr((q + 124).try_cast("int"), F.lit(12))).rlike(oct11)      # size
            & F.hex(p.substr((q + 136).try_cast("int"), F.lit(12))).rlike(oct11)      # mtime
            & F.hex(p.substr((q + 148).try_cast("int"), F.lit(8))).rlike(oct_chk)     # chksum
        )
        df = df.withColumn(
            f"_fok{k}", F.when(present, fields_ok).otherwise(F.lit(False))
        )
        df = df.withColumn(
            f"_sz{k}",
            F.when(
                F.col(f"_fok{k}"),
                F.conv(F.decode(p.substr((q + 124).try_cast("int"), F.lit(11)),
                                "UTF-8"), 8, 10).cast("long"),
            ),
        )
        df = df.withColumn(
            f"_ck{k}",
            F.when(
                F.col(f"_fok{k}"),
                F.conv(F.decode(p.substr((q + 148).try_cast("int"), F.lit(6)),
                                "UTF-8"), 8, 10).cast("long"),
            ),
        )
        # byte sum with the checksum field (bytes q+148..q+155) read as
        # eight spaces — the spec's self-referential definition
        calc = F.when(
            F.col(f"_fok{k}"),
            _byte_sum(p.substr(q.try_cast("int"), F.lit(148)))
            + F.lit(8 * 0x20)
            + _byte_sum(p.substr((q + 156).try_cast("int"), F.lit(356))),
        )
        nm = F.col(f"_nm{k}")
        ok = ~present | (
            F.col(f"_fok{k}")
            & nm.isNotNull() & (F.length(nm) >= 1)
            # NUL-padding strictness: name then NULs only, nothing else
            & F.when(
                present & F.is_valid_utf8(nm_bin),
                F.decode(p.substr(q.try_cast("int"), F.lit(100)), "UTF-8"),
            ).rlike("^[^\x00]+\x00*$")
            & (F.hex(p.substr((q + 156).try_cast("int"), F.lit(1))) == "30")  # typeflag '0'
            & (F.hex(p.substr((q + 257).try_cast("int"), F.lit(6))) == "757374617200")
            & (F.hex(p.substr((q + 263).try_cast("int"), F.lit(2))) == "3030")
            # reject a used ustar prefix field (paths > 100 bytes) rather
            # than silently truncating the member path — WebDataset shard
            # paths fit the name field by convention
            & F.hex(p.substr((q + 345).try_cast("int"), F.lit(155))).rlike("^0*$")
            & (F.col(f"_ck{k}") == calc)
        )
        df = df.withColumn(f"_ok{k}", ok)
        nb = F.floor((F.col(f"_sz{k}") + 511) / 512).cast("long")
        df = df.withColumn(f"_nb{k}", F.when(F.col(f"_fok{k}"), nb))
        df = df.withColumn(
            f"_q{k + 1}",
            F.when(present & F.col(f"_ok{k}"),
                   q + 512 + F.col(f"_nb{k}") * 512).otherwise(q),
        )
        df = df.withColumn(f"_live{k + 1}", present & F.col(f"_ok{k}"))

    walk_ok = F.lit(True)
    for k in range(TAR_MAX_MEMBERS):
        walk_ok = walk_ok & F.col(f"_ok{k}")
    cnt = sum(
        (F.col(f"_pr{k}").cast("long") for k in range(TAR_MAX_MEMBERS)),
        F.lit(0).cast("long"),
    )
    df = df.withColumn("_cnt", cnt)
    qe = F.col(f"_q{TAR_MAX_MEMBERS}")
    # POSIX end-of-archive: at least TWO zero blocks, then padding to the
    # writer's blocking factor (GNU/stdlib tar pad to 20 blocks = 10240
    # bytes) — so the rule is >= 1024 zero bytes to EOF with the total a
    # 512 multiple, NOT exactly 1024 (the exactly-two-blocks form
    # rejected every real-world tarball; caught by the reverse-direction
    # stdlib-writer parity test)
    trailer_ok = (
        (n - qe + 1 >= 1024)
        & (n % 512 == 0)
        & F.hex(p.substr(qe.try_cast("int"), (n - qe + 1).try_cast("int")))
        .rlike("^0*$")
    )
    df = df.withColumn(
        "_doc_ok", walk_ok & (F.col("_cnt") >= 1) & trailer_ok
    )

    members = F.array(
        *[
            F.when(
                F.col("_doc_ok") & F.col(f"_pr{k}"),
                F.struct(
                    F.lit(k).cast("long").alias("member_idx"),
                    F.col(f"_nm{k}").alias("name"),
                    F.col(f"_sz{k}").alias("size"),
                    F.col(f"_nb{k}").alias("n_blocks"),
                    (F.col(f"_q{k}") - 1 + 512).alias("data_offset"),
                ),
            )
            for k in range(TAR_MAX_MEMBERS)
        ]
    )
    out = df.select(
        "asset_id",
        F.when(F.col("_doc_ok"), F.col("_cnt")).alias("n_members"),
        F.explode(F.array_compact(members)).alias("_m"),
    )
    name = F.col("_m.name")
    has_dot = F.contains(name, F.lit("."))
    ext = F.when(has_dot, F.substring_index(name, ".", -1)).otherwise(F.lit(""))
    return out.select(
        "asset_id",
        F.col("_m.member_idx").alias("member_idx"),
        name.alias("name"),
        F.when(
            has_dot,
            name.substr(F.lit(1), (F.length(name) - F.length(ext) - 1).cast("int")),
        ).otherwise(name).alias("sample_key"),
        ext.alias("ext"),
        F.col("_m.size").alias("size"),
        F.col("_m.n_blocks").alias("n_blocks"),
        F.col("_m.data_offset").alias("data_offset"),
        "n_members",
    )


def parse_tar_members_py(payload: bytes) -> list[dict] | None:
    """The Python-path twin of parse_tar_members (same strict contract,
    bounded unroll, terminator and trailer checks), for boundary/parity
    tests. Never raises."""
    import re

    if payload is None:
        return None
    b = bytes(payload)
    n = len(b)

    def octal(raw: bytes, digits: int, tail: bytes) -> int | None:
        if len(raw) != digits + len(tail) or raw[digits:] != tail:
            return None
        if not all(0x30 <= c <= 0x37 for c in raw[:digits]):
            return None
        return int(raw[:digits].decode("ascii"), 8)

    q = 0
    live = True
    members: list[dict] = []
    for k in range(TAR_MAX_MEMBERS):
        present = live and (q + 512 <= n) and b[q] != 0
        if not present:
            live = False
            continue
        hdr = b[q:q + 512]
        try:
            dec = hdr[:100].decode("utf-8")
        except UnicodeDecodeError:
            return None
        if not re.fullmatch("[^\x00]+\x00*", dec):
            return None
        name = dec.split("\x00", 1)[0]
        for off in (100, 108, 116):
            if octal(hdr[off:off + 8], 7, b"\x00") is None:
                return None
        size = octal(hdr[124:136], 11, b"\x00")
        if size is None or octal(hdr[136:148], 11, b"\x00") is None:
            return None
        ck = octal(hdr[148:156], 6, b"\x00 ")
        if ck is None:
            return None
        if hdr[156:157] != b"0":
            return None
        if hdr[257:263] != b"ustar\x00" or hdr[263:265] != b"00":
            return None
        if any(hdr[345:500]):  # used prefix field: reject, don't truncate
            return None
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if ck != calc:
            return None
        n_blocks = (size + 511) // 512
        if "." in name:
            key, _, ext = name.rpartition(".")
        else:
            key, ext = name, ""
        members.append({
            "member_idx": k,
            "name": name,
            "sample_key": key,
            "ext": ext,
            "size": size,
            "n_blocks": n_blocks,
            "data_offset": q + 512,
        })
        q += 512 + n_blocks * 512
        live = True
    if not members:
        return None
    # >= two zero blocks to EOF, total a 512 multiple (writers pad the
    # archive to their blocking factor past the two POSIX zero blocks)
    if n - q < 1024 or n % 512 != 0 or any(b[q:]):
        return None
    for r in members:
        r["n_members"] = len(members)
    return members
