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


# --- tar member walk / WebDataset shards (same twin-parity treatment) ---

from flink_real_time_data_warehouse_spark.datapipe.multimodal import (
    parse_tar_members,
    parse_tar_members_py,
    synth_tar_payloads,
)


def _tar_jvm_rows(spark, payloads):
    df = spark.createDataFrame(payloads, "asset_id long, payload binary")
    out = {}
    for r in parse_tar_members(df).collect():
        out.setdefault(r["asset_id"], []).append(r.asDict())
    for rows in out.values():
        rows.sort(key=lambda r: r["member_idx"])
    return out


def test_tar_round_trip_and_stdlib_agreement(spark):
    """Synthesized shards parse back to the synthesis formulas AND are
    REAL tar: the stdlib tarfile reader (an independent implementation)
    must list the same members with the same sizes and data offsets."""
    import io
    import tarfile

    ids = (0, 1, 2, 6, 7, 21, 98)
    docs = spark.createDataFrame([(d,) for d in ids], "doc_id long")
    pay = [(r["asset_id"], bytes(r["payload"]))
           for r in synth_tar_payloads(docs).collect()]
    rows = _tar_jvm_rows(spark, [(a, bytearray(b)) for a, b in pay])
    for d, b in pay:
        n = 1 + d % 3
        got = rows[d]
        assert len(got) == n
        tf = tarfile.open(fileobj=io.BytesIO(b))
        std = tf.getmembers()
        assert [m.name for m in std] == [r["name"] for r in got]
        off = 512
        for k, rec in enumerate(got):
            size = (d * 13 + k * 29) % 1500
            ext = ("jpg", "txt", "json")[k]
            assert rec["name"] == f"shard{d}/sample{k // 2}.{ext}"
            assert rec["sample_key"] == f"shard{d}/sample{k // 2}"
            assert rec["ext"] == ext
            assert rec["size"] == size == std[k].size
            assert rec["n_blocks"] == (size + 511) // 512
            assert rec["data_offset"] == off == std[k].offset_data
            assert rec["n_members"] == n
            off += 512 + ((size + 511) // 512) * 512


def test_tar_twins_agree_under_truncation_and_corruption(spark):
    """Every truncation and every single-byte corruption of a valid
    shard must produce the same verdict from the JVM walk and the
    Python twin — either both reject (no rows / None) or both emit the
    identical member list. Corruptions sweep the header region (where
    checksum, octal-field and magic violations live) and the trailer."""
    docs = spark.createDataFrame([(7,), (8,), (13,)], "doc_id long")
    goods = [bytes(r["payload"]) for r in synth_tar_payloads(docs).collect()]
    probes = []
    for g in goods:
        probes.extend(g[:cut] for cut in range(0, len(g), 479))
        # header of member 0 (bytes 0..511) densely, later headers and
        # the trailer sparsely
        probes.extend(
            g[:off] + bytes([g[off] ^ 0x5A]) + g[off + 1:]
            for off in range(0, min(512, len(g)), 11)
        )
        probes.extend(
            g[:off] + bytes([g[off] ^ 0x5A]) + g[off + 1:]
            for off in range(512, len(g), 257)
        )
    jvm = _tar_jvm_rows(spark, [(i, bytearray(s)) for i, s in enumerate(probes)])
    n_accept = 0
    for i, s in enumerate(probes):
        py = parse_tar_members_py(s)  # must never raise
        if py is None:
            assert i not in jvm, (i, jvm.get(i))
        else:
            n_accept += 1
            got = [{k: v for k, v in r.items() if k != "asset_id"}
                   for r in jvm.get(i, [])]
            assert got == py, (i, got, py)
    # data-byte corruptions inside a member's payload survive (tar has
    # no data checksum) — the sweep must exercise BOTH verdicts
    assert n_accept > 0


def test_tar_checksum_is_load_bearing(spark):
    """Flipping one DATA-adjacent header byte that the walk otherwise
    never validates (a uname byte, NUL -> 'x') must flip the checksum
    and reject — proving the checksum covers the whole header, not just
    the fields the parser reads."""
    docs = spark.createDataFrame([(6,)], "doc_id long")
    g = bytes(synth_tar_payloads(docs).collect()[0]["payload"])
    bad = g[:265] + b"x" + g[266:]  # uname[0] inside member-0 header
    assert parse_tar_members_py(g) is not None
    assert parse_tar_members_py(bad) is None
    jvm = _tar_jvm_rows(spark, [(0, bytearray(bad))])
    assert 0 not in jvm


def test_tar_parses_stdlib_written_shards(spark):
    """REVERSE-direction parity: shards written by the INDEPENDENT
    stdlib tarfile writer (USTAR format, real mtimes, archive padded to
    the 10240-byte blocking factor — the layout every real WebDataset
    shard has) must parse identically in the JVM walk and the Python
    twin, matching tarfile's own member list. This test caught a real
    bug: the original exactly-two-zero-blocks trailer rule rejected
    every blocking-factor-padded (i.e. real-world) tarball."""
    import io
    import tarfile

    def shard(members):
        buf = io.BytesIO()
        tf = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
        for name, size in members:
            info = tarfile.TarInfo(name)
            info.size = size
            info.mtime = 1700000000
            tf.addfile(info, io.BytesIO(b"D" * size))
        tf.close()
        return buf.getvalue()

    shards = [
        shard([("shard0/000001.jpg", 700), ("shard0/000001.txt", 41)]),
        shard([("a.bin", 0)]),                      # zero-byte member
        shard([("x/y.jpg", 511), ("x/y.json", 512), ("x/z.jpg", 513)]),
    ]
    jvm = _tar_jvm_rows(spark, [(i, bytearray(s)) for i, s in enumerate(shards)])
    for i, s in enumerate(shards):
        py = parse_tar_members_py(s)
        assert py is not None, i
        std = tarfile.open(fileobj=io.BytesIO(s)).getmembers()
        assert [r["name"] for r in py] == [m.name for m in std]
        assert [r["size"] for r in py] == [m.size for m in std]
        assert [r["data_offset"] for r in py] == [m.offset_data for m in std]
        got = [{k: v for k, v in r.items() if k != "asset_id"}
               for r in jvm.get(i, [])]
        assert got == py, (i, got, py)

    # a member whose path needs the ustar PREFIX field must reject whole
    # (no silent truncation to the 100-byte name field) in both paths
    deep = shard([("p" * 90 + "/" + "q" * 60 + ".jpg", 10)])
    assert parse_tar_members_py(deep) is None
    assert 0 not in _tar_jvm_rows(spark, [(0, bytearray(deep))])


def test_reverse_direction_stdlib_writers_zip_gzip_wav(spark):
    """Reverse-direction parity for the formats with an INDEPENDENT
    stdlib writer (the tar test's discipline, applied family-wide):
    archives produced by zipfile, gzip and wave must parse in BOTH
    paths, agree with each other, and match the writer's own metadata.
    The parquet footer is deliberately excluded: its contract is a
    documented thrift SUBSET (version/num_rows/created_by skeleton),
    not full FileMetaData."""
    import gzip
    import io
    import wave
    import zipfile

    from flink_real_time_data_warehouse_spark.datapipe.multimodal import (
        parse_compression_header_py,
        parse_compression_headers,
        parse_header_py,
        parse_media_headers,
    )

    # --- ZIP: two deflated members via zipfile ---
    zb = io.BytesIO()
    with zipfile.ZipFile(zb, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", "hello world " * 20)
        z.writestr("b.bin", "x" * 100)
    zpy = parse_zip_central_dir_py(zb.getvalue())
    assert [r["name"] for r in zpy] == ["a.txt", "b.bin"]
    assert [r["usize"] for r in zpy] == [240, 100]
    assert all(r["method"] == "deflated" for r in zpy)
    zj = _zip_jvm_rows(spark, [(0, bytearray(zb.getvalue()))])
    assert [{k: v for k, v in r.items() if k != "asset_id"}
            for r in zj[0]] == zpy

    # --- gzip: stdlib-compressed frame, pinned mtime ---
    gb = io.BytesIO()
    with gzip.GzipFile(fileobj=gb, mode="wb", mtime=1700000000) as g:
        g.write(b"some text payload" * 10)
    gpy = parse_compression_header_py(gb.getvalue())
    assert gpy == {"container": "gzip", "mtime": 1700000000, "os_id": 255}
    df = spark.createDataFrame(
        [(0, bytearray(gb.getvalue()))], "asset_id long, payload binary"
    )
    [gj] = parse_compression_headers(df).collect()
    assert gj["container"] == "gzip" and gj["mtime"] == 1700000000

    # --- WAV: stdlib wave writer ---
    wb = io.BytesIO()
    w = wave.open(wb, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(44100)
    w.writeframes(b"\x00\x01" * 400)
    w.close()
    wpy = parse_header_py(wb.getvalue())
    assert wpy == {"container": "wav", "channels": 2,
                   "sample_rate": 44100, "bits_per_sample": 16}
    df = spark.createDataFrame(
        [(0, bytearray(wb.getvalue()))], "asset_id long, payload binary"
    )
    [wj] = parse_media_headers(df).collect()
    assert (wj["container"], wj["channels"], wj["sample_rate"],
            wj["bits_per_sample"]) == ("wav", 2, 44100, 16)
