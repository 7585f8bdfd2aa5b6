"""tar (ustar) and zip pack-file sources.

Format correctness is proven by STDLIB INTEROP IN BOTH DIRECTIONS:
our writers' output is readable by tarfile/zipfile, and our parsers
read tarfile/zipfile-written archives -- plus corruption rejection
(checksum, CRC, truncation)."""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest

from commoncrawl_crawler_spark.sources import packfiles as P


def test_tar_writer_readable_by_stdlib():
    blob = P.build_tar_bytes([("a/b.txt", b"x" * 700), ("c.bin", b"")])
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    names = [i.name for i in tf.getmembers()]
    assert names == ["a/b.txt", "c.bin"]
    assert tf.extractfile("a/b.txt").read() == b"x" * 700


def test_tar_parser_reads_stdlib_output_with_prefix_field():
    buf = io.BytesIO()
    longdir = "/".join(["d" * 20] * 6)  # pushes name into the prefix field
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        data = b"payload"
        info = tarfile.TarInfo(longdir + "/f.txt")
        info.size = len(data)
        w.addfile(info, io.BytesIO(data))
    got = P.parse_tar_members(buf.getvalue())
    assert got[0]["name"] == longdir + "/f.txt"
    assert got[0]["content"] == b"payload"


def test_tar_checksum_and_truncation_rejected():
    blob = bytearray(P.build_tar_bytes([("f.txt", b"hello")]))
    blob[0] ^= 0xFF  # corrupt the name -> checksum mismatch
    with pytest.raises(ValueError, match="checksum mismatch"):
        P.parse_tar_members(bytes(blob))
    good = P.build_tar_bytes([("f.txt", b"hello" * 200)])
    with pytest.raises(ValueError, match="truncated tar member"):
        P.parse_tar_members(good[:600])
    with pytest.raises(ValueError, match="end-of-archive"):
        P.parse_tar_members(good[:-1024])


def test_zip_writer_readable_by_stdlib_and_vice_versa():
    blob = P.build_zip_bytes(
        [("s.txt", b"stored bytes", 0), ("d.txt", b"deflate me " * 50, 8)]
    )
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.namelist() == ["s.txt", "d.txt"]
    assert zf.read("d.txt") == b"deflate me " * 50
    assert zf.testzip() is None  # stdlib CRC pass

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        w.writestr("x.txt", b"abc" * 100)
        w.writestr("y.txt", b"")
    got = {m["name"]: m for m in P.parse_zip_members(buf.getvalue())}
    assert got["x.txt"]["content"] == b"abc" * 100
    assert got["y.txt"]["size"] == 0


def test_zip_crc_and_garbage_rejected():
    blob = bytearray(
        P.build_zip_bytes([("f.txt", b"hello zip content", 0)])
    )
    # flip a payload byte after the local header (30 + name len)
    blob[30 + 5] ^= 0xFF
    with pytest.raises(ValueError, match="crc mismatch"):
        P.parse_zip_members(bytes(blob))
    with pytest.raises(ValueError, match="no zip end-of-central"):
        P.parse_zip_members(b"\x00" * 128)


def test_spark_member_walks_match_formula(spark, sf_smoke):
    import hashlib

    from commoncrawl_crawler_spark.sources import load_table

    docs = load_table(spark, "documents", sf_smoke).limit(5)
    tar_rows = P.tar_members(P.synthesize_tar(docs)).collect()
    zip_rows = P.zip_members(P.synthesize_zip(docs)).collect()
    assert len(tar_rows) == 15 and len(zip_rows) == 10
    for r in tar_rows + zip_rows:
        k = {"a.txt": 0, "b.txt": 1, "c.bin": 2}[r.name.rsplit("/", 1)[1]]
        content = P._member_text(r.media_id, k)
        assert r.size == len(content)
        assert r.content_md5 == hashlib.md5(content).hexdigest()
    assert {r.method for r in zip_rows} == {0, 8}


def test_m3u8_media_and_master_playlists():
    pl = P.parse_m3u8(P._m3u8_text(5))
    assert pl["ended"] and pl["target_duration"] == 4 + 5 % 3
    assert [s["uri"] for s in pl["segments"]][0] == "seg-5-0.m4s"
    master = (
        "#EXTM3U\n"
        '#EXT-X-STREAM-INF:BANDWIDTH=1280000,RESOLUTION=640x360\n'
        "low.m3u8\n"
        "#EXT-X-STREAM-INF:BANDWIDTH=2560000\n"
        "high.m3u8\n"
    )
    pl = P.parse_m3u8(master)
    assert [v["bandwidth"] for v in pl["variants"]] == [1280000, 2560000]
    assert pl["variants"][0]["resolution"] == "640x360"
    assert not pl["segments"] and not pl["ended"]


def test_m3u8_rejects_garbage():
    with pytest.raises(ValueError, match="missing #EXTM3U"):
        P.parse_m3u8("#EXT-X-VERSION:7\nseg.ts\n")
    with pytest.raises(ValueError, match="bare URI"):
        P.parse_m3u8("#EXTM3U\nseg.ts\n")


def test_tar_shard_writer_and_streaming_manifest(spark, sf_smoke, tmp_path):
    from commoncrawl_crawler_spark.sources import load_table

    docs = load_table(spark, "documents", sf_smoke).limit(10)
    n = P.write_tar_shards(docs.repartition(3, "doc_id"), str(tmp_path / "shards"))
    assert n >= 1
    import glob

    files = glob.glob(str(tmp_path / "shards" / "*.tar"))
    assert len(files) == n and not glob.glob(
        str(tmp_path / "shards" / "*.tmp")
    )
    # batch walk over the written shards equals the per-doc formula
    import tarfile

    seen = set()
    for f in files:
        with tarfile.open(f) as tf:  # stdlib reads our shards
            for m in tf.getmembers():
                seen.add(m.name)
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    assert seen == {
        f"shard/{mid}/{sfx}"
        for mid in ids
        for sfx in ("a.txt", "b.txt", "c.bin")
    }


def test_subtitles_srt_and_webvtt():
    cues = P.parse_subtitles(P._srt_text(3))
    assert cues[0]["text"] == "cue-3-0"
    vtt = (
        "WEBVTT\nKind: captions\n\n"
        "intro\n00:01.000 --> 00:02.500 align:start\nHello\nWorld\n\n"
        "00:00:03.000 --> 00:00:04.000\nBye\n"
    )
    got = P.parse_subtitles(vtt)
    assert (got[0]["start_ms"], got[0]["end_ms"]) == (1000, 2500)
    assert got[0]["text"] == "Hello\nWorld"
    with pytest.raises(ValueError, match="ends before"):
        P.parse_subtitles("1\n00:00:02,000 --> 00:00:01,000\nx\n")
    with pytest.raises(ValueError, match="expected cue timing"):
        P.parse_subtitles("not a cue\nstill not\n")


def test_m3u8_quoted_codecs_attribute_list():
    """RFC 8216 4.2: CODECS="avc1...,mp4a..." contains commas inside
    the quoted value; BANDWIDTH/RESOLUTION after it must survive."""
    master = "\n".join(
        [
            "#EXTM3U",
            '#EXT-X-STREAM-INF:BANDWIDTH=1280000,'
            'CODECS="avc1.64001f,mp4a.40.2",RESOLUTION=1280x720',
            "hi.m3u8",
            '#EXT-X-STREAM-INF:CODECS="mp4a.40.2",BANDWIDTH=640000',
            "lo.m3u8",
        ]
    )
    pl = P.parse_m3u8(master)
    assert pl["variants"] == [
        {"uri": "hi.m3u8", "bandwidth": 1280000, "resolution": "1280x720"},
        {"uri": "lo.m3u8", "bandwidth": 640000, "resolution": ""},
    ]


def test_attr_list_scan_edge_cases():
    assert P._parse_attr_list('A=1,B="x,y",C=z') == {
        "A": "1", "B": "x,y", "C": "z"
    }
    assert P._parse_attr_list('B="unterminated,oops') == {
        "B": "unterminated,oops"
    }
    assert P._parse_attr_list("") == {}


# ---- round-8: WebVTT twin -------------------------------------------


def test_webvtt_grammar_branches():
    """The VTT synthesizer exercises what SRT cannot: WEBVTT magic +
    header metadata block, named cue ids, settings after the end
    timestamp, and short MM:SS.mmm timestamps."""
    text = P._vtt_text(3)
    assert text.startswith("WEBVTT")
    assert "Kind: captions" in text
    assert "align:start" in text
    cues = P.parse_subtitles(text)
    srt_cues = P.parse_subtitles(P._srt_text(3))
    # identical cue timing/content between the two grammars
    assert cues == srt_cues


def test_webvtt_hour_form_and_bad_cue():
    import pytest as _pytest
    cues = P.parse_subtitles(
        "WEBVTT\n\n01:02:03.500 --> 01:02:04.000\nhello\n"
    )
    assert cues[0]["start_ms"] == 3723500
    with _pytest.raises(ValueError, match="ends before"):
        P.parse_subtitles(
            "WEBVTT\n\n00:10.000 --> 00:05.000\nbackwards\n"
        )
