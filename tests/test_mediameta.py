"""FLAC/Ogg/WebP/WebM metadata parsers (operators/mediameta)."""

from __future__ import annotations

import pytest

from commoncrawl_crawler_spark.operators import mediameta as M


def test_flac_roundtrip_and_corruption():
    for mid in range(10):
        i = M.parse_flac_streaminfo(M._flac_blob(mid))
        sr, ch, bps, total = M._flac_params(mid)
        assert (
            i["sample_rate"], i["channels"], i["bits_per_sample"],
            i["total_samples"],
        ) == (sr, ch, bps, total)
    blob = M._flac_blob(0)
    with pytest.raises(ValueError, match="bad magic"):
        M.parse_flac_streaminfo(b"fLaX" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        M.parse_flac_streaminfo(blob[:20])
    # STREAMINFO of the wrong length
    bad = bytearray(blob)
    bad[1:4] = (33).to_bytes(3, "big")
    with pytest.raises(ValueError):
        M.parse_flac_streaminfo(bytes(bad))


def test_flac_bit_packing_extremes():
    b = M.build_flac_streaminfo(655350, 8, 32, (1 << 36) - 1)
    i = M.parse_flac_streaminfo(b)
    assert i["sample_rate"] == 655350
    assert i["channels"] == 8
    assert i["bits_per_sample"] == 32
    assert i["total_samples"] == (1 << 36) - 1


def test_ogg_page_walk_and_lacing():
    # payload > 255 bytes exercises multi-segment lacing
    page = M.build_ogg_page(7, 0, 960, bytes(700))
    pages = M.parse_ogg_pages(page)
    assert len(pages) == 1 and len(pages[0]["payload"]) == 700
    with pytest.raises(ValueError, match="capture pattern"):
        M.parse_ogg_pages(b"XggS" + page[4:])
    with pytest.raises(ValueError, match="truncated"):
        M.parse_ogg_pages(page[:-5])


def test_ogg_id_headers():
    v = M.parse_id_header(M.parse_ogg_pages(M._ogg_blob(0))[0]["payload"])
    assert v["codec"] == "vorbis"
    o = M.parse_id_header(M.parse_ogg_pages(M._ogg_blob(1))[0]["payload"])
    assert o["codec"] == "opus" and o["preskip"] == 312
    assert M.parse_id_header(b"garbage-no-codec") is None


def test_webp_variants_and_corruption():
    for kind, w, h in [("VP8 ", 640, 480), ("VP8L", 1, 1),
                       ("VP8L", 16383, 16383), ("VP8X", 5000, 3000)]:
        d = M.parse_webp(M.build_webp(kind, w, h))
        assert (d["width"], d["height"]) == (w, h), (kind, d)
    good = M.build_webp("VP8 ", 10, 10)
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        M.parse_webp(b"RIFX" + good[4:])
    bad = bytearray(good)
    bad[12 + 8 + 3] = 0x9C  # break the VP8 start code
    with pytest.raises(ValueError, match="start code"):
        M.parse_webp(bytes(bad))


def test_ebml_vint_roundtrip():
    for v in [0, 1, 126, 127, 128, 16382, 16383, 16384, 1 << 20,
              (1 << 28) - 2]:
        enc = M._ebml_vint(v)
        got, pos = M.read_vint(enc, 0)
        assert got == v and pos == len(enc), v
    with pytest.raises(ValueError):
        M.read_vint(b"\x00\x01", 0)


def test_webm_track_walk_and_overrun():
    for mid in range(8):
        got = M.parse_webm_tracks(M._webm_blob(mid))
        want = M._webm_params(mid)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            for k, v in w.items():
                assert g[k] == v, (mid, k)
    with pytest.raises(ValueError, match="overruns|not an EBML"):
        M.parse_webm_tracks(b"\x1aEbad" + bytes(10))
    blob = bytearray(M._webm_blob(1))
    blob[-1:] = b""  # truncate: child overruns its container
    with pytest.raises(ValueError):
        M.parse_webm_tracks(bytes(blob))


def test_spark_census_ops(spark):
    docs = spark.range(9).selectExpr("id AS doc_id", "'x' AS text")
    flac = M.flac_streaminfo(M.synthesize_flac(docs)).collect()
    assert len(flac) == 9
    webm = M.webm_track_census(M.synthesize_webm(docs)).collect()
    want = sum(len(M._webm_params(m)) for m in range(9))
    assert len(webm) == want


def test_heif_roundtrip_and_rejections():
    for mid in range(9):
        brand, w, h, n = M._heif_params(mid)
        d = M.parse_heif(M._heif_blob(mid))
        assert (d["brand"], d["width"], d["height"], d["n_items"]) == (
            brand, w, h, n,
        )
    with pytest.raises(ValueError, match="missing ftyp/meta"):
        M.parse_heif(b"\x00\x00\x00\x08free")
    blob = M._heif_blob(1)
    no_ispe = blob.replace(b"ispe", b"xxxx")
    with pytest.raises(ValueError, match="no ispe"):
        M.parse_heif(no_ispe)


def test_heif_spark(spark):
    docs = spark.range(5).selectExpr("id AS doc_id", "'x' AS text")
    rows = M.heif_dimensions(M.synthesize_heif(docs)).collect()
    assert len(rows) == 5


# ---- round-8: Opus TOC census ---------------------------------------


def test_opus_toc_duration_table():
    """RFC 6716 3.1 config -> frame duration (tenths of ms)."""
    assert [M._opus_frame_dur_x10(c) for c in (0, 1, 2, 3)] == \
        [100, 200, 400, 600]  # SILK NB
    assert [M._opus_frame_dur_x10(c) for c in (12, 13, 14, 15)] == \
        [100, 200, 100, 200]  # hybrid
    assert [M._opus_frame_dur_x10(c) for c in (16, 17, 18, 19)] == \
        [25, 50, 100, 200]  # CELT


def test_opus_toc_codes_and_rejections():
    import pytest as _pytest
    # code 0: one frame
    t = M.parse_opus_toc(bytes([(19 << 3) | (1 << 2) | 0]) + b"x")
    assert (t["config"], t["stereo"], t["n_frames"]) == (19, 1, 1)
    assert t["total_dur_x10"] == 200
    # code 3 with vbr + count
    t = M.parse_opus_toc(bytes([(18 << 3) | 3, 0x80 | 4]) + b"xy")
    assert t["n_frames"] == 4 and t["vbr"] == 1
    assert t["total_dur_x10"] == 400
    with _pytest.raises(ValueError, match="empty"):
        M.parse_opus_toc(b"")
    with _pytest.raises(ValueError, match="zero frames"):
        M.parse_opus_toc(bytes([(18 << 3) | 3, 0]))
    with _pytest.raises(ValueError, match="120 ms"):
        M.parse_opus_toc(bytes([(3 << 3) | 3, 3]))  # 3 x 60 ms


def test_spark_opus_toc_stats(spark):
    docs = spark.range(8).selectExpr("id AS doc_id", "'x' AS text")
    got = {
        r["media_id"]: r.asDict()
        for r in M.opus_toc_stats(M.synthesize_opus(docs)).collect()
    }
    for mid in range(8):
        n = M._opus_params(mid)
        frames = dur = st = vbr = 0
        max_cfg = 0
        for p in range(n):
            t = M.parse_opus_toc(M._opus_packet(mid, p))
            frames += t["n_frames"]
            dur += t["total_dur_x10"]
            st += t["stereo"]
            vbr += t["vbr"]
            max_cfg = max(max_cfg, t["config"])
        r = got[mid]
        assert r["n_packets"] == n
        assert r["n_frames"] == frames
        assert r["total_dur_x10"] == dur
        assert (r["n_stereo"], r["n_vbr"], r["max_config"]) == \
            (st, vbr, max_cfg)


# ---- round-8: FLAC frame headers ------------------------------------


def test_flac_coded_numbers_agree_with_utf8():
    """The extended coded number coincides with standard UTF-8 on
    real code points -- an independent cross-check of the encoder --
    and round-trips through 36 bits."""
    for cp in (0x41, 0x3B1, 0x20AC, 0x10348):
        assert M.flac_utf8_encode(cp) == chr(cp).encode("utf-8")
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 1 << 31,
              (1 << 36) - 1):
        enc = M.flac_utf8_encode(v)
        dec, end = M.flac_utf8_decode(enc, 0)
        assert (dec, end) == (v, len(enc))


def test_flac_frame_header_crc_gates_acceptance():
    hdr = M.build_flac_frame_header(77, 0b1100, 0b1001, channels=2)
    f = M.parse_flac_frame_header(hdr, 0)
    assert (f["block_size"], f["sample_rate"], f["number"]) == (
        4096, 44100, 77,
    )
    # one flipped CRC bit -> candidate rejected, not mis-parsed
    assert M.parse_flac_frame_header(
        hdr[:-1] + bytes([hdr[-1] ^ 1]), 0
    ) is None
    # reserved blocksize code 0000 rejected
    bad = bytearray(hdr)
    bad[2] &= 0x0F
    assert M.parse_flac_frame_header(bytes(bad), 0) is None


def test_flac_frame_scan_closed_forms():
    for mid in range(15):
        n, bs_bits, sr_bits, ch_bits = M._flac_frames_params(mid)
        frames = M.scan_flac_frames(M._flac_frames_blob(mid))
        assert len(frames) == n
        assert [f["number"] for f in frames] == list(range(n))
        assert frames[0]["block_size"] == M._FLAC_BLOCKSIZE[bs_bits]
        assert frames[0]["sample_rate"] == M._FLAC_RATE[sr_bits]
        assert frames[0]["ch_bits"] == ch_bits
        assert frames[0]["channels"] == (
            ch_bits + 1 if ch_bits < 8 else 2
        )


def test_flac_stereo_decorrelation_headers_accepted():
    # libFLAC stereo output is dominated by left-side / right-side /
    # mid-side frames (ch_bits 8/9/10); all three must parse as
    # 2-channel, and the reserved codes 11-15 must still reject
    for ch_bits, name in ((8, "left-side"), (9, "right-side"),
                          (10, "mid-side")):
        hdr = M.build_flac_frame_header(
            3, 0b1100, 0b1001, ch_bits=ch_bits
        )
        f = M.parse_flac_frame_header(hdr, 0)
        assert f is not None, name
        assert (f["channels"], f["ch_bits"]) == (2, ch_bits), name
    for reserved in range(11, 16):
        hdr = M.build_flac_frame_header(
            3, 0b1100, 0b1001, ch_bits=reserved
        )
        assert M.parse_flac_frame_header(hdr, 0) is None


def test_spark_flac_frame_stats(spark):
    docs = spark.range(6).selectExpr("id AS doc_id", "'x' AS text")
    got = {
        r["media_id"]: r.asDict()
        for r in M.flac_frame_stats(
            M.synthesize_flac_frames(docs)
        ).collect()
    }
    for mid in range(6):
        n, bs_bits, sr_bits, ch_bits = M._flac_frames_params(mid)
        r = got[mid]
        assert r["n_frames"] == n
        assert r["block_size"] == M._FLAC_BLOCKSIZE[bs_bits]
        assert r["total_samples"] == n * M._FLAC_BLOCKSIZE[bs_bits]
        assert r["max_number"] == n - 1
        assert r["channels"] == (1 if ch_bits == 0 else 2)
        assert r["n_decorr_frames"] == (n if ch_bits >= 8 else 0)
