"""Source/sink unit tests: archive members, rotation, ingest, sinks."""

from __future__ import annotations

import zlib

import pytest

from pyspark.sql import functions as F

from commoncrawl_crawler_spark.sources import archive, ingest, sinks


def _docs(spark, n=20):
    return spark.createDataFrame(
        [(str(i), f"payload-{i}".encode()) for i in range(n)],
        "key string, payload binary",
    )


def test_archive_roundtrip_preserves_bytes(spark, tmp_path):
    path = str(tmp_path / "arc")
    archive.write_archive(_docs(spark), path)
    back = archive.read_archive(spark, path).collect()
    got = {r["key"]: bytes(r["payload"]) for r in back}
    assert got == {str(i): f"payload-{i}".encode() for i in range(20)}


def test_archive_member_offsets_seekable(spark, tmp_path):
    """Offsets must allow point reads without scanning siblings --
    the ARC property (arcFileOffset metadata, protocol.jr)."""
    path = str(tmp_path / "arc")
    archive.write_archive(_docs(spark, 5).coalesce(1), path)
    rows = archive.read_archive(spark, path).collect()
    for r in rows:
        with open(r["archive_path"].removeprefix("file:"), "rb") as f:
            f.seek(r["member_offset"])
            # one-member decompress (gzip.read() would concatenate
            # every following member into the result)
            d = zlib.decompressobj(wbits=31)
            data = d.decompress(f.read())
        assert data.split(b"\n", 1)[1] == bytes(r["payload"])


def test_archive_rotation_caps_file_size(spark, tmp_path):
    path = str(tmp_path / "arc")
    n_files = archive.write_archive(
        _docs(spark, 50).coalesce(1), path, rotate_bytes=200
    )
    assert n_files > 1  # tiny cap forces rotation


def test_rank_list_skips_junk(spark, tmp_path):
    p = tmp_path / "ranks.tsv"
    p.write_text("# comment\n1\texample.com\nnot-a-rank\tx\n2\tfoo.org\n")
    rows = ingest.read_rank_list(spark, str(p)).orderBy("rank").collect()
    assert [(r["rank"], r["domain"]) for r in rows] == [
        (1, "example.com"),
        (2, "foo.org"),
    ]


def test_failure_log_regex_extract(spark, tmp_path):
    p = tmp_path / "dns.log"
    p.write_text(
        "ERROR example.com 2024-03-01T10:00:00 NXDOMAIN\n"
        "garbage line\n"
        "WARN foo.org 2024-03-02T11:30:00 timeout after 5s\n"
    )
    rows = ingest.read_failure_log(spark, str(p)).orderBy("domain").collect()
    assert len(rows) == 2
    assert rows[0]["level"] == "ERROR" and rows[0]["message"] == "NXDOMAIN"
    assert rows[1]["ts"].month == 3 and rows[1]["ts"].day == 2


def test_multi_sink_columns_pruned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, score long"
    )
    sinks.write_multi_sink(
        df,
        {
            "names": (["id", "name"], str(tmp_path / "names")),
            "scores": (["id", "score"], str(tmp_path / "scores")),
        },
    )
    names = spark.read.parquet(str(tmp_path / "names"))
    assert names.columns == ["id", "name"]
    assert names.count() == 2


def test_timeseries_tail_prunes_to_latest_days(spark, tmp_path, sf_smoke):
    from commoncrawl_crawler_spark.sources import load_table

    ev = load_table(spark, "events", sf_smoke).select("event_id", "ts")
    sinks.write_timeseries(ev, str(tmp_path / "log"), mode="overwrite")
    tail = sinks.read_timeseries_tail(spark, str(tmp_path / "log"), days=2)
    days = {r[0] for r in tail.select(F.to_date("ts")).distinct().collect()}
    assert len(days) == 2


def test_timeseries_tail_ignores_null_day_partition(spark, tmp_path):
    """A null-ts row writes day=__HIVE_DEFAULT_PARTITION__; the tail
    listing must skip it (it sorts after every real date and matches
    nothing in the date-typed filter) so days=1 still returns the
    latest REAL day."""
    from pyspark.sql import Row
    from commoncrawl_crawler_spark.sources import sinks

    df = spark.createDataFrame(
        [
            Row(key="a", ts="2024-01-01 10:00:00", value=1),
            Row(key="b", ts="2024-01-02 10:00:00", value=2),
            Row(key="c", ts=None, value=3),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "ts_log")
    sinks.write_timeseries(df, path)
    got = sinks.read_timeseries_tail(spark, path, days=1).collect()
    assert [r.key for r in got] == ["b"]
    got2 = sinks.read_timeseries_tail(spark, path, days=2).collect()
    assert sorted(r.key for r in got2) == ["a", "b"]


def test_write_archive_failed_job_leaves_no_visible_archives(spark, tmp_path):
    """One invalid key anywhere must leave ZERO reader-visible .ccarc
    files -- the commit is a driver-side rename after every partition
    succeeded (a consumer globbing *.ccarc must never see a partial
    corpus from a failed job)."""
    import glob
    from pyspark.sql import Row

    bad = spark.createDataFrame(
        [Row(key=f"k{i}", payload=bytes([i])) for i in range(50)]
        + [Row(key="has space", payload=b"x")]
    ).repartition(4)
    path = str(tmp_path / "atomic")
    with pytest.raises(Exception, match="whitespace"):
        archive.write_archive(bad, path)
    assert glob.glob(f"{path}/*.ccarc") == []
    # a successful write commits and leaves no temps behind
    good = spark.createDataFrame(
        [Row(key=f"k{i}", payload=bytes([i])) for i in range(50)]
    ).repartition(4)
    n = archive.write_archive(good, path)
    assert n >= 1
    assert glob.glob(f"{path}/*.ccarc.tmp") == []
    assert len(glob.glob(f"{path}/*.ccarc")) == n


# --- real ARC v1 compatibility (util/ArcFileWriter.java:850-885,
# ArcFileReader.java:514-800) ---


def _golden_arc_file(tmp_path):
    """Hand-assemble an ARC v1 file byte-for-byte per the reference
    writer's layout: filedesc member with the IA LX extra field, then
    records gzip(metaline + headers + CRLF + content + LF)."""
    import gzip as _gzip
    import io as _io

    def gz(b):
        buf = _io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(b)
        return buf.getvalue()

    lines23 = (
        "\n1 0 CommonCrawl\n"
        "URL IP-address Archive-date Content-type Archive-length\n"
    )
    filedesc = (
        f"filedesc://golden.arc.gz 0.0.0.0 20080401120000 text/plain "
        f"{len(lines23)}{lines23}\n"
    ).encode()
    fd = bytearray(gz(filedesc))
    fd[3], fd[9] = 4, 3
    fd = bytes(fd[:10]) + archive.ARC_GZIP_EXTRA_FIELD + bytes(fd[10:])

    hdr1 = b"Content-Type: text/html\r\nx-commoncrawl-Signature: abc\r\n\r\n"
    body1 = b"<html>hello</html>"
    meta1 = (
        f"http://example.com/a 1.2.3.4 20080401120500 text/html "
        f"{len(hdr1) + len(body1)}\n"
    ).encode()
    rec1 = gz(meta1 + hdr1 + body1 + b"\n")

    # header pathologies: colon-less line, colon-at-end line, bad ts14
    hdr2 = b"HTTP/1.1 200 OK\r\nX-Empty:\r\nServer: nginx\r\n\r\n"
    body2 = b"payload\nwith\nnewlines\n"
    meta2 = (
        f"http://ex.org/b 5.6.7.8 notatimestamp no-type "
        f"{len(hdr2) + len(body2)}\n"
    ).encode()
    rec2 = gz(meta2 + hdr2 + body2 + b"\n")

    p = tmp_path / "golden.arc.gz"
    p.write_bytes(fd + rec1 + rec2)
    return str(tmp_path), len(fd), len(fd) + len(rec1)


def test_arc_v1_golden_member_parse(spark, tmp_path):
    d, off1, off2 = _golden_arc_file(tmp_path)
    rows = (
        archive.read_arc_v1(spark, d).orderBy("member_offset").collect()
    )
    assert len(rows) == 2  # filedesc member skipped
    r1, r2 = rows
    assert r1["url"] == "http://example.com/a"
    assert r1["ip"] == "1.2.3.4"
    assert r1["archive_date"] == "20080401120500"
    # 2008-04-01T12:05:00Z
    assert r1["fetch_epoch_ms"] == 1207051500000
    assert r1["mime"] == "text/html"
    assert bytes(r1["payload"]) == b"<html>hello</html>"
    assert r1["member_offset"] == off1
    hdrs = {h["key"]: h["value"] for h in r1["headers"]}
    # after-colon remainder kept verbatim (leading space included)
    assert hdrs["Content-Type"] == " text/html"
    assert hdrs["x-commoncrawl-Signature"] == " abc"

    assert r2["fetch_epoch_ms"] == 0  # invalid TIMESTAMP14 -> epoch 0
    assert r2["member_offset"] == off2
    # payload with embedded newlines survives via record_length
    assert bytes(r2["payload"]) == b"payload\nwith\nnewlines\n"
    items = list(r2["headers"])
    # colon-less status line -> value-only item; colon-at-end too
    assert items[0]["key"] is None and items[0]["value"] == "HTTP/1.1 200 OK"
    assert items[1]["key"] is None and items[1]["value"] == "X-Empty:"
    assert items[2]["key"] == "Server" and items[2]["value"] == " nginx"


def test_arc_v1_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "arcv1")
    df = spark.createDataFrame(
        [
            (
                f"http://site{i}.com/p",
                f"10.0.0.{i}",
                f"200804011205{i:02d}",
                "text/html",
                f"content-{i}".encode(),
                [("x-doc", str(i))],
            )
            for i in range(25)
        ],
        "url string, ip string, ts14 string, mime string, "
        "payload binary, headers array<struct<key:string,value:string>>",
    )
    n = archive.write_arc_v1(df, path)
    assert n >= 1
    back = archive.read_arc_v1(spark, path).collect()
    assert len(back) == 25
    by_url = {r["url"]: r for r in back}
    for i in range(25):
        r = by_url[f"http://site{i}.com/p"]
        assert bytes(r["payload"]) == f"content-{i}".encode()
        assert r["ip"] == f"10.0.0.{i}"
        assert r["archive_date"] == f"200804011205{i:02d}"
        hdrs = {h["key"]: h["value"] for h in r["headers"]}
        assert hdrs["x-doc"] == f" {i}"  # written "k: v", read verbatim


def test_arc_v1_rotation_writes_filedesc_per_file(spark, tmp_path):
    import zlib as _zlib

    path = str(tmp_path / "arcv1")
    df = spark.createDataFrame(
        [
            (f"http://s/{i}", "1.1.1.1", "20080401000000", "text/plain",
             bytes(200))
            for i in range(30)
        ],
        "url string, ip string, ts14 string, mime string, payload binary",
    ).coalesce(1)
    n = archive.write_arc_v1(df, path, rotate_bytes=600)
    assert n > 1
    import os as _os

    for fname in _os.listdir(path):
        with open(_os.path.join(path, fname), "rb") as f:
            blob = f.read()
        d = _zlib.decompressobj(wbits=31)
        first = d.decompress(blob)
        assert first.startswith(b"filedesc://" + fname.encode())


def test_arc_v1_rejects_whitespace_metaline_fields(spark, tmp_path):
    path = str(tmp_path / "arcv1")
    df = spark.createDataFrame(
        [("http://a b.com/", "1.1.1.1", "20080401000000", "text/plain", b"x")],
        "url string, ip string, ts14 string, mime string, payload binary",
    )
    with pytest.raises(Exception, match="whitespace"):
        archive.write_arc_v1(df, path)
    import os as _os

    assert not [f for f in _os.listdir(path) if f.endswith(".arc.gz")]


def test_arc_v1_streaming_reader_matches_batch(spark, tmp_path):
    """read_arc_v1_stream (StreamingArcFileReader analog) drained with
    availableNow must yield exactly the batch reader's rows, and a
    SECOND archive landing later is picked up incrementally (file-
    source exactly-once tracking)."""
    path = str(tmp_path / "arcs")
    df1 = spark.createDataFrame(
        [(f"http://a/{i}", "1.1.1.1", "20080401000000", "text/plain",
          f"p{i}".encode()) for i in range(5)],
        "url string, ip string, ts14 string, mime string, payload binary",
    ).coalesce(1)
    archive.write_arc_v1(df1, path)

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def drain():
        # parquet sink: supports checkpoint recovery (memory does not),
        # so the second drain resumes file-source tracking exactly-once
        q = (
            archive.read_arc_v1_stream(spark, path)
            .select("url", "payload")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["url"]: bytes(r["payload"])
            for r in spark.read.parquet(sink).collect()
        }

    got1 = drain()
    batch = {
        r["url"]: bytes(r["payload"])
        for r in archive.read_arc_v1(spark, path).collect()
    }
    assert got1 == batch and len(got1) == 5

    # second archive arrives; only its rows are new in the next drain
    df2 = spark.createDataFrame(
        [("http://b/0", "2.2.2.2", "20080401000001", "text/plain", b"new")],
        "url string, ip string, ts14 string, mime string, payload binary",
    ).coalesce(1)
    import os as _os

    # distinct writer partition index not guaranteed: rename to a
    # unique file so the new archive does not collide with the first
    tmp2 = str(tmp_path / "arcs2")
    archive.write_arc_v1(df2, tmp2)
    src = [f for f in _os.listdir(tmp2) if f.endswith(".arc.gz")][0]
    _os.rename(_os.path.join(tmp2, src), _os.path.join(path, "late-" + src))

    got2 = drain()  # cumulative sink: old rows + exactly the new file
    assert got2 == {**got1, "http://b/0": b"new"}
    # exactly-once: 6 physical rows in the sink, no reprocessing dupes
    assert spark.read.parquet(sink).count() == 6


# --- WARC 1.0 (ISO 28500, the post-2013 CommonCrawl format) ---


def test_warc_golden_member_parse(spark, tmp_path):
    """Hand-assembled WARC bytes in the exact CommonCrawl layout:
    warcinfo + response members, block lengths via Content-Length
    (blocks may themselves contain CRLFCRLF -- the HTTP payload)."""
    import gzip as _gzip
    import io as _io

    def gz(b):
        buf = _io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(b)
        return buf.getvalue()

    info_block = b"software: test-crawler 1.0\r\nformat: WARC File Format 1.0\r\n"
    info = gz(
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:aaa>\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(info_block)}\r\n\r\n".encode()
        + info_block
        + b"\r\n\r\n"
    )
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html>x</html>"
    )
    resp = gz(
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:bbb>\r\n"
        b"WARC-Date: 2024-01-01T00:00:05Z\r\n"
        b"WARC-Target-URI: http://example.com/\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
    )
    (tmp_path / "golden.warc.gz").write_bytes(info + resp)
    rows = archive.read_warc(spark, str(tmp_path)).orderBy("member_offset").collect()
    assert [r["warc_type"] for r in rows] == ["warcinfo", "response"]
    r = rows[1]
    assert r["target_uri"] == "http://example.com/"
    assert r["content_length"] == len(http)
    # the block is byte-exact INCLUDING its embedded CRLFCRLF
    assert bytes(r["block"]) == http
    assert r["member_offset"] == len(info)
    # member_length is the compressed gzip-member size: the ranged-GET
    # pointer contract [offset, offset+length) covers each member exactly
    assert rows[0]["member_length"] == len(info)
    assert r["member_length"] == len(resp)
    assert rows[0]["target_uri"] is None  # warcinfo has no URI


def test_warc_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "warcs")
    df = spark.createDataFrame(
        [
            (
                "response",
                f"<urn:uuid:{i}>",
                f"http://s{i}.com/",
                f"2024-01-01T00:00:{i:02d}Z",
                "application/http; msgtype=response",
                f"block-{i}\r\n\r\nwith-crlfs".encode(),
            )
            for i in range(20)
        ],
        "warc_type string, record_id string, target_uri string, "
        "warc_date string, content_type string, block binary",
    )
    n = archive.write_warc(df, path)
    assert n >= 1
    back = archive.read_warc(spark, path).collect()
    assert len(back) == 20
    by_id = {r["record_id"]: r for r in back}
    for i in range(20):
        r = by_id[f"<urn:uuid:{i}>"]
        assert bytes(r["block"]) == f"block-{i}\r\n\r\nwith-crlfs".encode()
        assert r["content_length"] == len(bytes(r["block"]))
        assert r["warc_date"] == f"2024-01-01T00:00:{i:02d}Z"


def test_warc_rejects_bad_members(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="WARC"):
        archive._parse_warc_member(b"NOTWARC/1.0\r\n\r\n\r\n")
    with _pytest.raises(ValueError, match="Content-Length"):
        archive._parse_warc_member(
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n"
        )


def test_warc_http_responses_binary_body_lossless(spark, tmp_path):
    """The ISO-8859-1 split must return EXACT body bytes even for
    binary payloads containing CRLFCRLF and non-UTF-8 bytes, and
    non-response / terminator-less records are filtered out."""
    path = str(tmp_path / "w")
    body = bytes(range(256)) + b"\r\n\r\n" + bytes(range(255, -1, -1))
    http = b"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n" + body
    rows = [
        ("response", "<urn:uuid:1>", "http://a/", "2024-01-01T00:00:00Z",
         "application/http; msgtype=response", http),
        # request record: filtered
        ("request", "<urn:uuid:2>", "http://a/", "2024-01-01T00:00:00Z",
         "application/http; msgtype=request", b"GET / HTTP/1.1\r\n\r\n"),
        # response with NO header terminator: filtered, not crashed
        ("response", "<urn:uuid:3>", "http://b/", "2024-01-01T00:00:00Z",
         "application/http; msgtype=response", b"HTTP/1.1 200 OK"),
    ]
    df = spark.createDataFrame(
        rows,
        "warc_type string, record_id string, target_uri string, "
        "warc_date string, content_type string, block binary",
    )
    archive.write_warc(df, path)
    out = archive.warc_http_responses(archive.read_warc(spark, path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["status_code"] == 200
    assert r["http_content_type"] == "application/octet-stream"
    assert bytes(r["body"]) == body  # byte-exact through latin-1


def test_archive_writers_reject_header_injection_and_null_required(spark, tmp_path):
    """CR/LF in header fields would forge the terminator (silent
    payload corruption / unreadable Content-Length); NULL required
    WARC headers would round-trip as the string 'None'. Both raise."""
    arc = spark.createDataFrame(
        [("http://a/", "1.1.1.1", "20080401000000", "text/plain", b"x",
          [("evil", "v\r\n\r\ninjected")])],
        "url string, ip string, ts14 string, mime string, payload binary, "
        "headers array<struct<key:string,value:string>>",
    )
    with pytest.raises(Exception, match="CR/LF"):
        archive.write_arc_v1(arc, str(tmp_path / "a"))

    warc_null = spark.createDataFrame(
        [(None, "<urn:uuid:1>", "http://a/", "2024-01-01T00:00:00Z",
          "text/plain", b"x")],
        "warc_type string, record_id string, target_uri string, "
        "warc_date string, content_type string, block binary",
    )
    with pytest.raises(Exception, match="mandatory header"):
        archive.write_warc(warc_null, str(tmp_path / "w"))

    warc_inj = spark.createDataFrame(
        [("response", "<urn:uuid:1>", "http://a/",
          "2024-01-01T00:00:00Z\r\nContent-Length: 0", "text/plain", b"x")],
        "warc_type string, record_id string, target_uri string, "
        "warc_date string, content_type string, block binary",
    )
    with pytest.raises(Exception, match="CR/LF"):
        archive.write_warc(warc_inj, str(tmp_path / "w2"))


def test_point_seek_member_read_all_formats(spark, tmp_path):
    """read_member_at must recover exactly the member at an offset
    reported by the distributed reader, for all three formats,
    without scanning siblings."""
    # WARC
    wpath = str(tmp_path / "w")
    archive.write_warc(
        spark.createDataFrame(
            [("response", f"<urn:uuid:{i}>", f"http://s/{i}",
              "2024-01-01T00:00:00Z", "text/plain", f"b{i}".encode())
             for i in range(5)],
            "warc_type string, record_id string, target_uri string, "
            "warc_date string, content_type string, block binary",
        ).coalesce(1),
        wpath,
    )
    rows = archive.read_warc(spark, wpath).collect()
    for r in rows:
        got = archive.read_member_at(
            r["archive_path"].removeprefix("file:"),
            r["member_offset"],
            kind="warc",
        )
        assert got[2] == r["target_uri"] and got[7] == bytes(r["block"])

    # ARC v1 (offset past the filedesc member)
    apath = str(tmp_path / "a")
    archive.write_arc_v1(
        spark.createDataFrame(
            [(f"http://s/{i}", "1.1.1.1", "20080401000000", "text/plain",
              f"p{i}".encode()) for i in range(3)],
            "url string, ip string, ts14 string, mime string, payload binary",
        ).coalesce(1),
        apath,
    )
    for r in archive.read_arc_v1(spark, apath).collect():
        got = archive.read_member_at(
            r["archive_path"].removeprefix("file:"),
            r["member_offset"],
            kind="arc",
        )
        assert got[0] == r["url"] and got[7] == bytes(r["payload"])


def test_sitemap_parse_kinds_entities_and_edge_cases(spark):
    from commoncrawl_crawler_spark.sources import xmlsource

    content = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc> https://h.com/maps/a.xml </loc>"
        "<lastmod>2024-03-05T10:00:00+00:00</lastmod></sitemap>"
        "</sitemapindex>"
        "<urlset>"
        # entity-escaped query + no-double-decode of &amp;lt;
        "<url><loc>https://h.com/p?x=1&amp;y=2&amp;lt;</loc>"
        "<lastmod>2024-01-02</lastmod><changefreq>WEEKLY</changefreq>"
        "<priority>0.8</priority></url>"
        # loc missing -> dropped
        "<url><lastmod>2024-01-03</lastmod></url>"
        # minimal: only loc; optional fields NULL
        "<url><loc>https://h.com/bare</loc></url>"
        # unparseable lastmod -> NULL, junk priority -> NULL
        "<url><loc>https://h.com/junk</loc><lastmod>soon</lastmod>"
        "<priority>high</priority></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("h.com", content)], "host string, content string")
    rows = {r.loc: r for r in xmlsource.parse_sitemap(df).collect()}
    assert len(rows) == 4  # the loc-less record is gone
    idx = rows["https://h.com/maps/a.xml"]
    assert idx.kind == "sitemap"
    assert str(idx.lastmod) == "2024-03-05"  # datetime prefix-parsed
    p = rows["https://h.com/p?x=1&y=2&lt;"]  # unescaped exactly once
    assert p.kind == "url"
    assert p.changefreq == "weekly"
    assert p.priority_micro == 800000
    assert str(p.lastmod) == "2024-01-02"
    bare = rows["https://h.com/bare"]
    assert (bare.lastmod, bare.changefreq, bare.priority_micro) == (
        None, None, None,
    )
    junk = rows["https://h.com/junk"]
    assert junk.lastmod is None and junk.priority_micro is None


def test_read_jsonl_explicit_schema_tolerates_malformed_lines(spark, tmp_path):
    from commoncrawl_crawler_spark.sources import ingest

    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"event_id":"1","meta":{"user":"7","etype":"click"},"value":"1.5"}\n'
        "this is not json\n"
        '{"event_id":"2","meta":{"user":"8","etype":"view"},"value":"2.25"}\n'
    )
    rows = ingest.read_jsonl(spark, str(p)).orderBy("event_id").collect()
    good = [r for r in rows if r["event_id"] is not None]
    assert [(r["event_id"], r["meta"]["user"], r["value"]) for r in good] == [
        ("1", "7", "1.5"),
        ("2", "8", "2.25"),
    ]
    # PERMISSIVE mode: the malformed line nulls out, never aborts
    assert len(rows) - len(good) <= 1


def _http_response_records(spark, pages):
    """(id, html) pages -> WARC response rows whose blocks are real
    HTTP messages, the wet/wat derivation input."""
    rows = [
        (
            "response",
            f"<urn:uuid:{i}>",
            f"http://h{i}.com/p",
            f"2024-04-01T00:00:{i:02d}Z",
            "application/http; msgtype=response",
            (
                "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
            ).encode(),
        )
        for i, html in pages
    ]
    return spark.createDataFrame(
        rows,
        "warc_type string, record_id string, target_uri string, "
        "warc_date string, content_type string, block binary",
    )


def test_wet_records_text_extraction_and_refers_to(spark, tmp_path):
    pages = [
        (0, "<html><head><title>T0</title><script>var x = 'hidden';"
            "</script></head><body><p>Hello  world</p>"
            "<style>p { color: red }</style>"
            "a &amp;&amp; b &lt;tag&gt; &quot;q&#39;</body></html>"),
        (1, "<html><body></body></html>"),  # no visible text: dropped
        (2, "<html><body>plain</body></html>"),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "wet")
    archive.write_warc(_http_response_records(spark, pages), src)
    archive.write_warc(archive.wet_records(archive.read_warc(spark, src)), out)
    back = {
        r["target_uri"]: r
        for r in archive.read_warc(spark, out).collect()
    }
    assert set(back) == {"http://h0.com/p", "http://h2.com/p"}
    r0 = back["http://h0.com/p"]
    assert r0["warc_type"] == "conversion"
    assert r0["content_type"] == "text/plain"
    # script/style subtrees dropped, entities decoded (&amp; last),
    # whitespace collapsed, title text kept
    assert bytes(r0["block"]).decode() == "T0 Hello world a && b <tag> \"q'"
    hdrs = {h["key"]: h["value"] for h in r0["headers"]}
    assert hdrs["WARC-Refers-To"] == "<urn:uuid:0>"
    assert r0["record_id"] == "<urn:uuid:wet-0>"
    assert bytes(back["http://h2.com/p"]["block"]).decode() == "plain"


def test_wat_records_envelope_fields(spark, tmp_path):
    from pyspark.sql import functions as F

    pages = [
        (0, '<html><head><title>WatDoc</title></head><body>'
            '<a href="http://x.com/1">one</a>'
            '<iframe src="http://f.com/fr"></iframe></body></html>'),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "wat")
    archive.write_warc(_http_response_records(spark, pages), src)
    archive.write_warc(archive.wat_records(archive.read_warc(spark, src)), out)
    rows = archive.read_warc(spark, out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["warc_type"] == "metadata"
    assert r["content_type"] == "application/json"
    assert r["record_id"] == "<urn:uuid:wat-0>"
    hdrs = {h["key"]: h["value"] for h in r["headers"]}
    assert hdrs["WARC-Refers-To"] == "<urn:uuid:0>"
    import json as _json

    # Container points byte-exactly at the SOURCE record: reading
    # [Offset, Offset+Deflate-Length) of Filename yields the original
    # response (the published WAT Container contract)
    cont = _json.loads(bytes(r["block"]).decode())["Container"]
    assert cont["Compressed"] is True
    src_rec = archive.read_warc(spark, src).collect()[0]
    assert cont["Filename"] == src_rec["archive_path"].split("/")[-1]
    assert int(cont["Offset"]) == src_rec["member_offset"]
    assert (
        int(cont["Gzip-Metadata"]["Deflate-Length"])
        == src_rec["member_length"]
    )
    import glob as _glob

    src_file = [
        p for p in _glob.glob(f"{src}/*.warc.gz")
        if p.endswith(cont["Filename"])
    ][0]
    wt, _, uri, *_ = archive.read_member_at(
        src_file, int(cont["Offset"]), "warc",
        length=int(cont["Gzip-Metadata"]["Deflate-Length"]),
    )
    assert (wt, uri) == ("response", "http://h0.com/p")

    env = _json.loads(bytes(r["block"]).decode())["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == "http://h0.com/p"
    assert env["WARC-Header-Metadata"]["WARC-Record-ID"] == "<urn:uuid:0>"
    pm = env["Payload-Metadata"]["HTTP-Response-Metadata"]
    assert pm["Response-Message"]["Status"] == 200
    assert pm["Content-Type"] == "text/html"
    assert pm["HTML-Metadata"]["Head"]["Title"] == "WatDoc"
    links = pm["HTML-Metadata"]["Links"]
    assert links == [
        {"url": "http://x.com/1", "path": "A@/href", "text": "one"},
        {"url": "http://f.com/fr", "path": "IFRAME@/src", "text": ""},
    ]
    # the JSON block parses back into the typed struct with the
    # published schema (what a WAT consumer does)
    parsed = (
        archive.read_warc(spark, out)
        .select(
            F.from_json(
                F.decode("block", "UTF-8"), archive.WAT_ENVELOPE_SCHEMA
            ).alias("e")
        )
        .collect()[0]["e"]
    )
    assert parsed["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"
    ]["Response-Message"]["Status"] == 200


def test_html_text_expr_matches_sql_mirror(spark):
    """The WET extraction must stay expressible in the oracle's ANSI
    SQL -- pin the exact output for a corpus of edge cases."""
    from pyspark.sql import functions as F

    from commoncrawl_crawler_spark.functions.html import html_text_expr

    cases = [
        ("<b>x</b>", "x"),
        ("a<br>b", "a b"),
        ("<script>1<2</script>ok", "ok"),
        ("<SCRIPT a=b>x</SCRIPT >y", "y"),
        ("&amp;lt;", "&lt;"),  # double-escape survives (&amp; last)
        ("  lots\t of\n space  ", "lots of space"),
        ("<p>no close", "no close"),
        ("", ""),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    got = [
        r["t"]
        for r in df.select(html_text_expr(F.col("html")).alias("t"))
        .collect()
    ]
    assert got == [want for _, want in cases]


def test_ccindex_table_columns_and_partitioned_layout(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    pages = [
        (0, '<html><head><title>T</title></head><body>x</body></html>'),
        (1, '<html><body>y</body></html>'),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "ccindex")
    archive.write_warc(_http_response_records(spark, pages), src)
    idx = archive.ccindex_table(
        archive.read_warc(spark, src), crawl="CC-TEST-1"
    )
    archive.write_ccindex(idx, out)
    # hive partition directories exist (crawl=, subset=)
    assert os.path.isdir(os.path.join(out, "crawl=CC-TEST-1"))
    assert os.path.isdir(
        os.path.join(out, "crawl=CC-TEST-1", "subset=warc")
    )
    rd = archive.read_ccindex(spark, out)
    rows = {r["url"]: r for r in rd.collect()}
    r = rows["http://h0.com/p"]
    assert r["url_surtkey"] == "com,h0)/p"
    assert r["url_host_name"] == "h0.com"
    assert r["url_host_reversed"] == "com.h0"
    assert r["url_host_registered_domain"] == "h0.com"
    assert r["url_host_tld"] == "com"
    assert r["url_path"] == "/p"
    assert r["fetch_status"] == 200
    assert r["content_mime_type"] == "text/html"
    assert r["warc_filename"] and r["warc_record_offset"] >= 0
    assert r["warc_record_length"] > 0
    assert r["crawl"] == "CC-TEST-1" and r["subset"] == "warc"
    # the consumer SQL path: partition filter prunes directories,
    # data filter reaches the parquet scan
    plan = (
        rd.filter(
            (F.col("crawl") == "CC-TEST-1")
            & (F.col("fetch_status") == 200)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "crawl" in plan
    import re as _re

    assert _re.search(r"PushedFilters:.*fetch_status", plan)


def test_wet_records_carry_identified_language_header(spark, tmp_path):
    pages = [
        (0, "<html><body>the quick brown fox and the lazy dog with "
            "some of that text</body></html>"),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "wet")
    archive.write_warc(_http_response_records(spark, pages), src)
    archive.write_warc(
        archive.wet_records(archive.read_warc(spark, src)), out
    )
    (r,) = archive.read_warc(spark, out).collect()
    hdrs = {h["key"]: h["value"] for h in r["headers"]}
    assert hdrs["WARC-Identified-Content-Language"] == "en"


def test_stream_ccindex_appends_only_new_archives(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            archive.ccindex_table(
                archive.read_warc_stream(spark, src), crawl="CC-T"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .partitionBy("crawl", "subset")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    archive.write_warc(
        _http_response_records(spark, [(0, "<html><body>a</body></html>")]),
        src,
    )
    drain()
    first = {r["url"] for r in archive.read_ccindex(spark, out).collect()}
    assert first == {"http://h0.com/p"}
    # a second segment lands; the next drain indexes ONLY the new file
    more = _http_response_records(
        spark, [(1, "<html><body>b</body></html>")]
    )
    import os

    # write to a subdir-free unique name set: write_warc rotates into
    # the same dir; new part files are new paths for the file source
    archive.write_warc(more, src + "_b")
    for f in os.listdir(src + "_b"):
        os.rename(os.path.join(src + "_b", f), os.path.join(src, "b_" + f))
    drain()
    rows = archive.read_ccindex(spark, out).collect()
    assert sorted(r["url"] for r in rows) == [
        "http://h0.com/p",
        "http://h1.com/p",
    ]
    # no duplicates: the first archive was not re-indexed
    assert len(rows) == 2


def test_ccindex_fetch_time_is_tz_independent(spark, tmp_path):
    """fetch_time must be the UTC wall instant under ANY session
    timezone (TIMESTAMP_NTZ discipline)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    archive.write_warc(
        _http_response_records(spark, [(7, "<html><body>x</body></html>")]),
        src,
    )
    idx = archive.ccindex_table(archive.read_warc(spark, src), crawl="C")
    assert dict(idx.dtypes)["fetch_time"] == "timestamp_ntz"
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        (r,) = idx.select("fetch_time").collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert str(r["fetch_time"]) == "2024-04-01 00:00:07"


def test_wet_records_honor_declared_charset_and_survive_lies(spark, tmp_path):
    rows = [
        # windows-1252 body with curly quotes (0x93/0x94), declared
        ("response", "<urn:uuid:0>", "http://h0.com/p", "2024-04-01T00:00:00Z",
         "application/http; msgtype=response",
         b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=windows-1252"
         b"\r\n\r\n<html><body>\x93quoted\x94</body></html>"),
        # declares utf-8 but carries malformed bytes: must not abort
        ("response", "<urn:uuid:1>", "http://h1.com/p", "2024-04-01T00:00:01Z",
         "application/http; msgtype=response",
         b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
         b"\r\n\r\n<html><body>ok\xff\xfe end</body></html>"),
        # real utf-8, no declared charset: detection ladder
        ("response", "<urn:uuid:2>", "http://h2.com/p", "2024-04-01T00:00:02Z",
         "application/http; msgtype=response",
         "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
         "<html><body>café</body></html>".encode("utf-8")),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "wet")
    archive.write_warc(
        spark.createDataFrame(
            rows,
            "warc_type string, record_id string, target_uri string, "
            "warc_date string, content_type string, block binary",
        ),
        src,
    )
    archive.write_warc(archive.wet_records(archive.read_warc(spark, src)), out)
    texts = {
        r["target_uri"]: bytes(r["block"]).decode("utf-8")
        for r in archive.read_warc(spark, out).collect()
    }
    assert texts["http://h0.com/p"] == "“quoted”"
    assert texts["http://h1.com/p"].startswith("ok")  # replaced, not crashed
    assert "end" in texts["http://h1.com/p"]
    assert texts["http://h2.com/p"] == "café"


def test_revisit_dedup_keeps_first_and_rewrites_duplicates(spark, tmp_path):
    rows = [
        # two identical payloads (b later by date), one unique, one metadata
        ("response", "<urn:uuid:b>", "http://b.com/", "2024-01-02T00:00:00Z",
         "application/http; msgtype=response", b"HTTP/1.1 200 OK\r\n\r\nSAME"),
        ("response", "<urn:uuid:a>", "http://a.com/", "2024-01-01T00:00:00Z",
         "application/http; msgtype=response", b"HTTP/1.1 200 OK\r\n\r\nSAME"),
        ("response", "<urn:uuid:c>", "http://c.com/", "2024-01-03T00:00:00Z",
         "application/http; msgtype=response", b"HTTP/1.1 200 OK\r\n\r\nDIFF"),
        # same payload as a/b but DIFFERENT response headers -- the
        # WARC payload-digest covers the payload only, so this must
        # still dedup against a
        ("response", "<urn:uuid:d>", "http://d.com/", "2024-01-04T00:00:00Z",
         "application/http; msgtype=response",
         b"HTTP/1.1 200 OK\r\nDate: Thu, 04 Jan 2024 00:00:00 GMT"
         b"\r\n\r\nSAME"),
        ("metadata", "<urn:uuid:m>", "http://a.com/", "2024-01-01T00:00:00Z",
         "application/json", b"{}"),
    ]
    df = spark.createDataFrame(
        [(t, r, u, d, c, None, b) for t, r, u, d, c, b in
         [(x[0], x[1], x[2], x[3], x[4], x[5]) for x in rows]],
        "warc_type string, record_id string, target_uri string, "
        "warc_date string, content_type string, "
        "headers array<struct<key:string,value:string>>, block binary",
    )
    out = {r["record_id"]: r for r in archive.revisit_dedup(df).collect()}
    assert out["<urn:uuid:a>"]["warc_type"] == "response"  # earliest date
    assert bytes(out["<urn:uuid:a>"]["block"]).endswith(b"SAME")
    rv = out["<urn:uuid:b>"]
    assert rv["warc_type"] == "revisit"
    assert bytes(rv["block"]) == b""
    hdrs = {h["key"]: h["value"] for h in rv["headers"]}
    assert hdrs["WARC-Refers-To"] == "<urn:uuid:a>"
    assert hdrs["WARC-Payload-Digest"].startswith("md5:")
    assert "identical-payload-digest" in hdrs["WARC-Profile"]
    assert out["<urn:uuid:c>"]["warc_type"] == "response"
    # header-differing refetch of the SAME payload: still a revisit
    rv2 = out["<urn:uuid:d>"]
    assert rv2["warc_type"] == "revisit"
    hdrs2 = {h["key"]: h["value"] for h in rv2["headers"]}
    assert hdrs2["WARC-Refers-To"] == "<urn:uuid:a>"
    assert hdrs2["WARC-Payload-Digest"] == hdrs["WARC-Payload-Digest"]
    assert out["<urn:uuid:m>"]["warc_type"] == "metadata"  # untouched


def test_dechunk_bytes_rfc9112_cases():
    """Chunk extensions, trailers, empty body, and the malformed
    framings crawl archives actually contain."""
    from commoncrawl_crawler_spark.sources.archive import dechunk_bytes

    body = (
        b"4;ext=v\r\nWiki\r\n"
        b"5\r\npedia\r\n"
        b"0\r\nX-Trailer: yes\r\n\r\n"
    )
    assert dechunk_bytes(body) == b"Wikipedia"
    assert dechunk_bytes(b"0\r\n\r\n") == b""
    # binary-safe: chunk data may contain CRLF
    assert dechunk_bytes(b"6\r\na\r\nb!!\r\n0\r\n\r\n") == b"a\r\nb!!"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad size"):
        dechunk_bytes(b"zz\r\nabcd\r\n0\r\n\r\n")
    with _pytest.raises(ValueError, match="missing chunk CRLF"):
        dechunk_bytes(b"4\r\nWikiXX0\r\n\r\n")
    with _pytest.raises(ValueError, match="truncated chunk"):
        dechunk_bytes(b"ff\r\nshort\r\n")
    with _pytest.raises(ValueError, match="unterminated trailers"):
        dechunk_bytes(b"0\r\nX-T: 1\r\n")


def test_dechunk_http_bodies_flag_gated(spark):
    """Only flagged rows run the kernel; identity rows pass through
    byte-exact even when their body LOOKS chunked."""
    from commoncrawl_crawler_spark.sources.archive import (
        dechunk_http_bodies,
    )

    looks_chunked = b"4\r\nWiki\r\n0\r\n\r\n"
    df = spark.createDataFrame(
        [
            (1, "chunked", looks_chunked),
            (2, "", looks_chunked),  # identity: keep raw bytes
            (3, "Chunked", b"3\r\nabc\r\n0\r\nT: v\r\n\r\n"),
        ],
        "id long, transfer_encoding string, body binary",
    )
    out = {r.id: r for r in dechunk_http_bodies(df).collect()}
    assert bytes(out[1].body) == b"Wiki" and out[1].was_chunked == 1
    assert bytes(out[2].body) == looks_chunked and out[2].was_chunked == 0
    assert bytes(out[3].body) == b"abc"
