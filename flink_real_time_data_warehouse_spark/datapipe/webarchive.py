"""WARC (Web ARChive, ISO 28500) record walk — the container Common
Crawl ships, i.e. the actual on-disk input of a web-scale pretraining
pipeline (CCNet, RefinedWeb, Dolma all start from WARC).

Decode shape: TEXT-PROTOCOL FRAMING. Every prior container family in
`datapipe.multimodal` is binary (fixed offsets, varints, box trees, bit
packs); a WARC member is a CRLF-delimited named-field header block plus
a `Content-Length`-framed opaque body, records concatenated — so record
k+1's offset is data decoded from record k (the framing arithmetic of
TFRecord with the field syntax of HTTP). The walk is a bounded unroll
over WARC_MAX_RECORDS members, pure JVM column arithmetic, zero Python,
zero shuffle (plan-tested); strictness mirrors the binary family: a
record missing a mandatory header, a duplicated header, a bad version
line, or a final position that does not land EXACTLY at payload end
rejects the whole member chain.

Reference parity note: the reference warehouse ingests framed streams
(Kafka envelopes, `utils/MyKafkaUtil.java`) and routes on parsed fields;
this module is the same ingest-side contract applied to the archive
container a data-curation user starts from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bounded unroll of the member walk (synthesis emits 1-3 records)
WARC_MAX_RECORDS = 3
#: a record's version line + header block must fit in this window; the
#: blank-line search and every header regex run inside it, bounding the
#: per-record scan cost regardless of payload size (the body is jumped
#: over via Content-Length, never scanned).
WARC_HDR_WINDOW = 256

_TYPES = ("response", "request", "metadata")


def synth_warc_payloads(docs: DataFrame) -> DataFrame:
    """One WARC member chain per document, every field a deterministic
    function of doc_id so a SQL oracle can replay it:

      n_records            = 1 + doc_id % 3
      record k (0-based):
        WARC-Type          = ('response','request','metadata')[(doc_id+k) % 3]
        WARC-Target-URI    = http://site<doc_id % 97>.example/p<k>
        WARC-Record-ID     = <urn:md5:md5(doc_id || ':' || k)>
        Content-Length     = 10 + (doc_id*7 + 13*k) % 120   (body: that
                             many 'b' bytes — opaque, jumped over)
      header ORDER alternates with (doc_id + k) parity (Type,ID,URI,CL
      vs CL,URI,ID,Type) so a parser assuming field positions breaks.

    Layout per record: ``WARC/1.0\\r\\n<headers>\\r\\n<body>\\r\\n\\r\\n``.
    The parse path below trusts only the characters."""
    did = F.col("doc_id")
    n_rec = (F.lit(1) + did % 3).cast("long")

    rec_cols = []
    for k in range(WARC_MAX_RECORDS):
        rtype = F.element_at(
            F.array(*[F.lit(t) for t in _TYPES]),
            ((did + k) % 3 + 1).cast("int"),
        )
        uri = F.concat(
            F.lit("http://site"), (did % 97).cast("string"),
            F.lit(".example/p"), F.lit(str(k)),
        )
        rid = F.md5(F.concat(did.cast("string"), F.lit(f":{k}")))
        clen = (F.lit(10) + (did * 7 + 13 * k) % 120).cast("long")
        body = F.lit("b" * 130).substr(F.lit(1), clen.cast("int"))
        h_type = F.concat(F.lit("WARC-Type: "), rtype, F.lit("\r\n"))
        h_rid = F.concat(F.lit("WARC-Record-ID: <urn:md5:"), rid, F.lit(">\r\n"))
        h_uri = F.concat(F.lit("WARC-Target-URI: "), uri, F.lit("\r\n"))
        h_cl = F.concat(F.lit("Content-Length: "), clen.cast("string"), F.lit("\r\n"))
        hdrs = F.when(
            (did + k) % 2 == 0, F.concat(h_type, h_rid, h_uri, h_cl)
        ).otherwise(F.concat(h_cl, h_uri, h_rid, h_type))
        rec_cols.append(
            F.concat(F.lit("WARC/1.0\r\n"), hdrs, F.lit("\r\n"),
                     body, F.lit("\r\n\r\n")).alias(f"_r{k}")
        )

    # Records are staged columns: each appears in 2 CASE branches of the
    # chain concat below, and inlining would re-expand the whole record
    # build per branch (the avro entries lesson — janino 64 KB).
    staged = docs.select(did.alias("doc_id"), n_rec.alias("_nr"), *rec_cols)
    nr = F.col("_nr")
    chain = (
        F.when(nr == 1, F.col("_r0"))
        .when(nr == 2, F.concat(F.col("_r0"), F.col("_r1")))
        .otherwise(F.concat(F.col("_r0"), F.col("_r1"), F.col("_r2")))
    )
    return staged.select("doc_id", chain.alias("payload"))


def _count_occurrences(haystack, needle: str):
    """Occurrence count of a literal substring, as column arithmetic."""
    return (
        (F.length(haystack) - F.length(F.replace(haystack, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def parse_warc_records(payloads: DataFrame) -> DataFrame:
    """WARC member walk trusting ONLY the characters: at each step the
    version line must read ``WARC/1.0\\r\\n``, the blank line must occur
    inside WARC_HDR_WINDOW, the four mandatory headers must each appear
    EXACTLY once in the header block, Content-Length must be digits, and
    the framing jump (header block + CRLF CRLF + body + CRLF CRLF) must
    chain so the final position lands exactly one past payload end with
    at least one record consumed — otherwise the whole chain rejects and
    the document emits no rows. Emits one row per record:
    (doc_id, rec_idx, warc_type, target_uri, rec_id, content_length,
    n_records). Bounded unroll (WARC_MAX_RECORDS); staged projections,
    zero Python, zero shuffle, one codegen stage (plan-tested)."""
    p = F.col("payload")
    df = payloads.select("doc_id", "payload")
    df = df.withColumn("_n", F.length(p).cast("long"))
    n = F.col("_n")
    df = df.withColumn("_p0", F.lit(1).cast("long"))

    for k in range(WARC_MAX_RECORDS):
        pos = F.col(f"_p{k}")
        active = pos <= n
        df = df.withColumn(
            f"_w{k}",
            F.when(active, p.substr(pos.try_cast("int"), F.lit(WARC_HDR_WINDOW))),
        )
        w = F.col(f"_w{k}")
        # relative position (1-based, within the window) of the blank
        # line terminating the header block; 0 = not found.
        df = df.withColumn(f"_rel{k}", F.instr(w, "\r\n\r\n").cast("long"))
        rel = F.col(f"_rel{k}")
        # header block INCLUDING the version line and the final \r of
        # the last header line, so every field line ends with \r.
        df = df.withColumn(
            f"_hb{k}", w.substr(F.lit(1), (rel + 1).try_cast("int"))
        )
        hb = F.col(f"_hb{k}")
        df = df.withColumn(
            f"_ty{k}", F.regexp_extract(hb, r"WARC-Type: ([^\r]+)\r", 1)
        )
        df = df.withColumn(
            f"_uri{k}", F.regexp_extract(hb, r"WARC-Target-URI: ([^\r]+)\r", 1)
        )
        df = df.withColumn(
            f"_rid{k}",
            F.regexp_extract(hb, r"WARC-Record-ID: <urn:md5:([0-9a-f]{32})>\r", 1),
        )
        df = df.withColumn(
            f"_cls{k}", F.regexp_extract(hb, r"Content-Length: ([0-9]+)\r", 1)
        )
        # try_cast: a Content-Length whose digits overflow BIGINT must
        # REJECT the record (NULL -> ok=false), not throw under ANSI
        # mode and kill the scan — the twin returns None for the same
        # payload.
        df = df.withColumn(
            f"_cl{k}",
            F.when(F.col(f"_cls{k}") != "", F.col(f"_cls{k}")).try_cast("long"),
        )
        cl = F.col(f"_cl{k}")
        df = df.withColumn(
            f"_ok{k}",
            active
            & (w.substr(1, 10) == "WARC/1.0\r\n")
            & (rel > 0)
            & (F.col(f"_ty{k}") != "")
            & (F.col(f"_uri{k}") != "")
            & (F.col(f"_rid{k}") != "")
            & cl.isNotNull()
            & (_count_occurrences(hb, "WARC-Type: ") == 1)
            & (_count_occurrences(hb, "WARC-Target-URI: ") == 1)
            & (_count_occurrences(hb, "WARC-Record-ID: ") == 1)
            & (_count_occurrences(hb, "Content-Length: ") == 1),
        )
        ok = F.col(f"_ok{k}")
        # jump: pos-1 bytes before + (rel-1) header bytes + blank CRLF
        # CRLF (4) + body (cl) + record terminator CRLF CRLF (4).
        df = df.withColumn(
            f"_p{k + 1}",
            F.when(active & ok, pos + rel - 1 + 4 + cl + 4).otherwise(pos),
        )

    every_active_ok = F.lit(True)
    n_records = F.lit(0).cast("long")
    for k in range(WARC_MAX_RECORDS):
        active = F.col(f"_p{k}") <= n
        every_active_ok = every_active_ok & (~active | F.col(f"_ok{k}"))
        n_records = n_records + active.cast("long")
    df = df.withColumn(
        "_doc_ok",
        (n >= 10)
        & every_active_ok
        & (F.col(f"_p{WARC_MAX_RECORDS}") == n + 1),
    )
    df = df.withColumn("_nrec", F.when(F.col("_doc_ok"), n_records))

    recs = F.array(
        *[
            F.when(
                F.col("_doc_ok") & (F.col(f"_p{k}") <= n),
                F.struct(
                    F.lit(k).cast("long").alias("rec_idx"),
                    F.col(f"_ty{k}").alias("warc_type"),
                    F.col(f"_uri{k}").alias("target_uri"),
                    F.col(f"_rid{k}").alias("rec_id"),
                    F.col(f"_cl{k}").alias("content_length"),
                ),
            )
            for k in range(WARC_MAX_RECORDS)
        ]
    )
    return df.select(
        "doc_id", F.col("_nrec").alias("n_records"),
        F.explode(F.array_compact(recs)).alias("_rec"),
    ).select(
        "doc_id",
        F.col("_rec.rec_idx").alias("rec_idx"),
        F.col("_rec.warc_type").alias("warc_type"),
        F.col("_rec.target_uri").alias("target_uri"),
        F.col("_rec.rec_id").alias("rec_id"),
        F.col("_rec.content_length").alias("content_length"),
        "n_records",
    )


def parse_warc_records_py(payload: str) -> list[dict] | None:
    """The Python-path twin of parse_warc_records (same strict contract,
    including the WARC_HDR_WINDOW bound and the WARC_MAX_RECORDS unroll),
    for boundary/parity tests. Returns the record list, or None when the
    chain rejects."""
    import re

    if payload is None:
        return None
    s = str(payload)
    n = len(s)
    if n < 10:
        return None
    pos = 0  # 0-based here; the column walk is 1-based
    out: list[dict] = []
    for k in range(WARC_MAX_RECORDS):
        if pos >= n:
            break
        w = s[pos:pos + WARC_HDR_WINDOW]
        if w[:10] != "WARC/1.0\r\n":
            return None
        rel = w.find("\r\n\r\n")
        if rel < 0:
            return None
        hb = w[:rel + 2]
        ty = re.search(r"WARC-Type: ([^\r]+)\r", hb)
        uri = re.search(r"WARC-Target-URI: ([^\r]+)\r", hb)
        rid = re.search(r"WARC-Record-ID: <urn:md5:([0-9a-f]{32})>\r", hb)
        cls = re.search(r"Content-Length: ([0-9]+)\r", hb)
        if not (ty and uri and rid and cls):
            return None
        for needle in ("WARC-Type: ", "WARC-Target-URI: ",
                       "WARC-Record-ID: ", "Content-Length: "):
            if hb.count(needle) != 1:
                return None
        cl = int(cls.group(1))
        out.append({
            "rec_idx": k,
            "warc_type": ty.group(1),
            "target_uri": uri.group(1),
            "rec_id": rid.group(1),
            "content_length": cl,
        })
        pos = pos + rel + 4 + cl + 4
    if pos != n or not out:
        return None
    for r in out:
        r["n_records"] = len(out)
    return out
