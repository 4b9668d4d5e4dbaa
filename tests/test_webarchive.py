"""WARC member-walk tests: twin parity under truncation/corruption,
hand-built strictness cases, and synthesis round-trip."""

from flink_real_time_data_warehouse_spark.datapipe.webarchive import (
    parse_warc_records,
    parse_warc_records_py,
    synth_warc_payloads,
)


def _jvm_rows(spark, payloads):
    df = spark.createDataFrame(payloads, "doc_id long, payload string")
    out = {}
    for r in parse_warc_records(df).collect():
        out.setdefault(r["doc_id"], []).append(r.asDict())
    for rows in out.values():
        rows.sort(key=lambda r: r["rec_idx"])
    return out


def test_warc_round_trip(spark):
    """Synthesized chains parse back to the formula values for 1-, 2-
    and 3-record parities."""
    docs = spark.createDataFrame([(d,) for d in (6, 7, 8, 97, 193)], "doc_id long")
    rows = _jvm_rows(
        spark,
        [(r["doc_id"], r["payload"]) for r in synth_warc_payloads(docs).collect()],
    )
    for d in (6, 7, 8, 97, 193):
        n = 1 + d % 3
        got = rows[d]
        assert len(got) == n
        for k, rec in enumerate(got):
            assert rec["rec_idx"] == k
            assert rec["n_records"] == n
            assert rec["warc_type"] == ("response", "request", "metadata")[(d + k) % 3]
            assert rec["target_uri"] == f"http://site{d % 97}.example/p{k}"
            assert rec["content_length"] == 10 + (d * 7 + 13 * k) % 120


def test_warc_twins_agree_under_truncation_and_corruption(spark):
    """Every stride-sampled prefix truncation and single-char corruption
    of valid chains produces the SAME verdict from the column walk and
    the Python twin — both reject, or both decode identical records."""
    docs = spark.createDataFrame([(7,), (8,), (13,)], "doc_id long")
    goods = [r["payload"] for r in synth_warc_payloads(docs).collect()]
    probes = []
    for g in goods:
        probes.extend(g[:cut] for cut in range(2, len(g), 7))
        probes.extend(
            g[:off] + chr(ord(g[off]) ^ 0x1F) + g[off + 1:]
            for off in range(0, len(g), 11)
        )
    jvm = _jvm_rows(spark, list(enumerate(probes)))
    for i, s in enumerate(probes):
        py = parse_warc_records_py(s)  # must never raise
        if py is None:
            assert i not in jvm, (i, jvm.get(i))
        else:
            got = [
                {k: v for k, v in r.items() if k != "doc_id"} for r in jvm.get(i, [])
            ]
            assert got == py, (i, got, py)


def test_warc_strictness_hand_built(spark):
    """The strict contract, case by case, in both paths."""
    good = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:md5:" + "ab" * 16 + ">\r\n"
        "WARC-Target-URI: http://x.example/\r\n"
        "Content-Length: 4\r\n"
        "\r\n"
        "body\r\n\r\n"
    )
    assert parse_warc_records_py(good) is not None

    bads = [
        good.replace("WARC/1.0", "WARC/1.1"),                # version
        good.replace("WARC-Type: response\r\n", ""),         # missing header
        good.replace("Content-Length: 4", "Content-Length: x4"),
        good.replace("Content-Length: 4", "Content-Length: 5"),  # bad landing
        good + "x",                                          # trailing garbage
        good.replace(
            "WARC-Type: response\r\n",
            "WARC-Type: response\r\nWARC-Type: request\r\n",
        ),                                                   # duplicated header
        good.replace("<urn:md5:" + "ab" * 16 + ">", "<urn:md5:zz>"),
    ]
    payloads = [(0, good)] + [(i + 1, b) for i, b in enumerate(bads)]
    jvm = _jvm_rows(spark, payloads)
    assert 0 in jvm and len(jvm[0]) == 1
    rec = jvm[0][0]
    assert rec["warc_type"] == "response"
    assert rec["content_length"] == 4
    assert rec["n_records"] == 1
    for i, b in enumerate(bads):
        assert parse_warc_records_py(b) is None, i
        assert (i + 1) not in jvm, i


# --- ZIP central directory (same multi-record twin-parity treatment) ---

from flink_real_time_data_warehouse_spark.datapipe.multimodal import (
    parse_zip_central_dir,
    parse_zip_central_dir_py,
    synth_zip_payloads,
)


def _zip_jvm_rows(spark, payloads):
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    df = df.withColumnRenamed("doc_id", "asset_id")
    out = {}
    for r in parse_zip_central_dir(df).collect():
        out.setdefault(r["asset_id"], []).append(r.asDict())
    for rows in out.values():
        rows.sort(key=lambda r: r["file_idx"])
    return out


def test_zip_round_trip(spark):
    docs = spark.createDataFrame([(d,) for d in (6, 7, 8, 21, 98)], "doc_id long")
    pay = [(r["asset_id"], bytearray(r["payload"]))
           for r in synth_zip_payloads(docs).collect()]
    rows = _zip_jvm_rows(spark, pay)
    for d in (6, 7, 8, 21, 98):
        n = 1 + d % 3
        got = rows[d]
        assert len(got) == n
        off = 0
        for k, rec in enumerate(got):
            fnlen = 2 + (d + k) % 4
            usize = 100 + (d * 11 + k * 17) % 900
            stored = (d + k) % 2 == 0
            csize = usize if stored else 40 + usize * 3 // 5
            assert rec["name"] == "n" * (1 + (d + k) % 4) + str(k)
            assert rec["method"] == ("stored" if stored else "deflated")
            assert rec["usize"] == usize and rec["csize"] == csize
            assert rec["local_offset"] == off
            assert rec["n_files"] == n
            off += 30 + fnlen + csize


def test_zip_twins_agree_under_truncation_and_corruption(spark):
    docs = spark.createDataFrame([(7,), (8,), (13,)], "doc_id long")
    goods = [bytes(r["payload"]) for r in synth_zip_payloads(docs).collect()]
    probes = []
    for g in goods:
        probes.extend(g[:cut] for cut in range(2, len(g), 101))
        probes.extend(
            g[:off] + bytes([g[off] ^ 0x5A]) + g[off + 1:]
            for off in range(max(0, len(g) - 160), len(g), 7)
        )
    jvm = _zip_jvm_rows(spark, [(i, bytearray(s)) for i, s in enumerate(probes)])
    for i, s in enumerate(probes):
        py = parse_zip_central_dir_py(s)  # must never raise
        if py is None:
            assert i not in jvm, (i, jvm.get(i))
        else:
            got = [{k: v for k, v in r.items() if k != "asset_id"}
                   for r in jvm.get(i, [])]
            assert got == py, (i, got, py)


def test_zip_negative_position_guard(spark):
    """A short payload whose TAIL carries the EOCD signature must not
    false-match through Spark's from-the-end semantics for negative
    substr positions: both paths reject."""
    probes = [
        b"\x00" * 18 + b"PK\x05\x06",          # n=22, sig only at the tail
        b"PK\x05\x06" + b"\x00" * 14 + b"PK\x05\x06",  # n=22, sig both ends
        b"\x00" * 2 + b"PK\x05\x06",           # n=6 < 22
    ]
    jvm = _zip_jvm_rows(spark, [(i, bytearray(s)) for i, s in enumerate(probes)])
    for i, s in enumerate(probes):
        assert parse_zip_central_dir_py(s) is None, i
        assert i not in jvm, (i, jvm.get(i))


def test_warc_overflowing_content_length_rejects(spark):
    """A Content-Length whose digits overflow BIGINT must reject the
    chain in both paths — not throw under ANSI mode (the try_cast
    regression the round-10 review caught)."""
    bad = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:md5:" + "ab" * 16 + ">\r\n"
        "WARC-Target-URI: http://x.example/\r\n"
        "Content-Length: 99999999999999999999\r\n"
        "\r\nbody\r\n\r\n"
    )
    assert parse_warc_records_py(bad) is None
    assert _jvm_rows(spark, [(1, bad)]) == {}
