"""ADTS framing and H.264 Annex-B / SPS parsing (operators/videobits)."""

from __future__ import annotations

import pytest

from commoncrawl_crawler_spark.operators import videobits as V


def test_adts_roundtrip_all_params():
    for mid in range(20):
        frames = V.parse_adts_frames(V._adts_blob(mid))
        for fr, (plen, prof, sri, ch) in zip(frames, V._adts_params(mid)):
            assert fr["length"] == plen + 7
            assert fr["profile"] == prof
            assert fr["sample_rate"] == V.ADTS_SAMPLE_RATES[sri]
            assert fr["channels"] == ch


def test_adts_rejects_corrupt():
    blob = V._adts_blob(1)
    with pytest.raises(ValueError, match="lost ADTS sync"):
        V.parse_adts_frames(b"\x12\x34" + blob)
    with pytest.raises(ValueError, match="truncated"):
        V.parse_adts_frames(blob[:-3])
    with pytest.raises(ValueError, match="reserved sampling"):
        bad = bytearray(blob)
        bad[2] = (bad[2] & 0xC3) | (13 << 2)  # reserved index 13
        V.parse_adts_frames(bytes(bad))
    with pytest.raises(ValueError):
        V.build_adts_frame(b"x", sr_index=14)


def test_rbsp_escape_roundtrip_exhaustive_small():
    """Every 4-byte string over a 0/1/3-heavy alphabet survives the
    escape/unescape pair."""
    alpha = [0, 1, 2, 3, 0xFF]
    from itertools import product

    for tup in product(alpha, repeat=4):
        raw = bytes(tup)
        assert V.rbsp_unescape(V.rbsp_escape(raw)) == raw, raw


def test_rbsp_escape_known_vectors():
    assert V.rbsp_escape(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert V.rbsp_escape(b"\x00\x00\x03") == b"\x00\x00\x03\x03"
    assert V.rbsp_escape(b"\x00\x00\x04") == b"\x00\x00\x04"
    assert V.rbsp_unescape(b"\x00\x00\x03\x00") == b"\x00\x00\x00"


def test_exp_golomb_reader_writer_agree():
    w = V._BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 100, 255, 1000]
    for v in vals:
        w.ue(v)
    svals = [0, 1, -1, 2, -2, 17, -40]
    for v in svals:
        w.se(v)
    data = w.rbsp_trailing()
    r = V._BitReader(data)
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_sps_sizes_and_cropping():
    for wmbs, hmu, cr, cb in [(4, 3, 0, 0), (8, 5, 1, 1), (120, 68, 0, 1)]:
        sps = V.parse_sps(V.build_sps(wmbs, hmu, cr, cb))
        assert sps["width"] == wmbs * 16 - 2 * cr
        assert sps["height"] == hmu * 16 - 2 * cb
        assert sps["chroma_format_idc"] == 1
    # 1920x1080 the real-world way: 120x68 mbs with 8 bottom crop
    sps = V.parse_sps(V.build_sps(120, 68, 0, 4))
    assert (sps["width"], sps["height"]) == (1920, 1080)


def test_sps_high_profile_branch():
    """A high-profile SPS (chroma_format_idc explicit) parses through
    the extended branch."""
    w = V._BitWriter()
    w.u(100, 8)  # profile_idc High
    w.u(0, 8)
    w.u(41, 8)
    w.ue(0)  # sps_id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.u(0, 1)  # transform bypass
    w.u(0, 1)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # poc type
    w.ue(4)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(79)  # 80 mbs = 1280
    w.ue(44)  # 45 units = 720
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8
    w.u(0, 1)  # no cropping
    w.u(0, 1)  # no vui
    sps = V.parse_sps(w.rbsp_trailing())
    assert (sps["profile_idc"], sps["width"], sps["height"]) == (
        100, 1280, 720,
    )


def test_annexb_walk_and_corruption():
    blob = V._h264_blob(3)
    nals = V.parse_annexb(blob)
    assert nals[0]["nal_type"] == 7 and nals[1]["nal_type"] == 8
    with pytest.raises(ValueError, match="start code"):
        V.parse_annexb(b"\xff" + blob)
    with pytest.raises(ValueError, match="forbidden_zero_bit"):
        V.parse_annexb(b"\x00\x00\x01\x87junk")
    with pytest.raises(ValueError, match="no Annex-B start code"):
        V.parse_annexb(b"\x01\x02\x03")


def test_emulation_prevention_in_slices_survives():
    """Slice payloads deliberately contain raw 00 00 01 -- the walk
    must NOT split on escaped sequences inside a NAL."""
    for mid in range(10):
        wmbs, hmu, cr, cb, ns = V._h264_params(mid)
        nals = V.parse_annexb(V._h264_blob(mid))
        assert len(nals) == 2 + ns, mid


def test_spark_ops_match_driver(spark):
    docs = spark.range(8).selectExpr("id AS doc_id", "'x' AS text")
    adts = {
        r["media_id"]: (r["n_frames"], r["total_bytes"])
        for r in V.adts_frame_stats(V.synthesize_adts(docs)).collect()
    }
    h264 = {
        r["media_id"]: (r["n_nals"], r["width"], r["height"])
        for r in V.h264_stream_stats(V.synthesize_h264(docs)).collect()
    }
    for mid in range(8):
        frames = V.parse_adts_frames(V._adts_blob(mid))
        assert adts[mid] == (
            len(frames), sum(f["length"] for f in frames)
        )
        wmbs, hmu, cr, cb, ns = V._h264_params(mid)
        assert h264[mid] == (2 + ns, wmbs * 16 - 2 * cr, hmu * 16 - 2 * cb)


# ---- AV1 (round-7) ---------------------------------------------------


def test_leb128_roundtrip_and_limits():
    for v in [0, 1, 127, 128, 16383, 16384, 1 << 30, (1 << 56) - 1]:
        enc = V.leb128_encode(v)
        got, p = V.leb128_decode(enc, 0)
        assert (got, p) == (v, len(enc))
    with pytest.raises(ValueError, match="truncated"):
        V.leb128_decode(b"\x80\x80", 0)
    with pytest.raises(ValueError, match="8 bytes"):
        V.leb128_decode(b"\x80" * 9, 0)


def test_av1_sequence_header_dimension_widths():
    """Variable-width dimension fields: 1-bit through 16-bit sizes."""
    for w, h in [(1, 1), (2, 3), (320, 180), (1920, 1080),
                 (65536, 32768)]:
        seq = V.parse_av1_sequence_header(
            V.build_av1_sequence_header(w, h, profile=2, level=12)
        )
        assert (seq["width"], seq["height"]) == (w, h)
        assert seq["profile"] == 2 and seq["level"] == 12
    # level <= 7 omits seq_tier
    seq = V.parse_av1_sequence_header(
        V.build_av1_sequence_header(64, 64, level=5)
    )
    assert seq["level"] == 5 and seq["width"] == 64


def test_av1_obu_walk_and_corruption():
    blob = V._av1_blob(4)
    obus = V.parse_av1_obus(blob)
    assert obus[0]["obu_type"] == V.OBU_TEMPORAL_DELIMITER
    assert obus[1]["obu_type"] == V.OBU_SEQUENCE_HEADER
    with pytest.raises(ValueError, match="forbidden"):
        V.parse_av1_obus(b"\x80" + blob)
    with pytest.raises(ValueError, match="truncated OBU"):
        V.parse_av1_obus(blob[:-4])
    # header without a size field is rejected
    with pytest.raises(ValueError, match="size-field-less"):
        V.parse_av1_obus(bytes([(V.OBU_FRAME << 3)]) + b"xy")


def test_av1_spark_stats_match_params(spark):
    docs = spark.range(10).selectExpr("id AS doc_id", "'x' AS text")
    got = {
        r["media_id"]: (
            r["n_obus"], r["n_frames"], r["profile"], r["level"],
            r["width"], r["height"],
        )
        for r in V.av1_stream_stats(V.synthesize_av1(docs)).collect()
    }
    for mid in range(10):
        prof, level, w, h, nf = V._av1_params(mid)
        assert got[mid] == (2 + nf, nf, prof, level, w, h)


def test_annexb_last_nal_keeps_trailing_zeros():
    """Trailing zero bytes at end-of-stream (cabac_zero_words) belong
    to the last NAL; only zeros preceding a FOLLOWING start code are
    leading_zero_8bits and get trimmed."""
    blob = (
        V.annexb_nal(1, bytes([0x11, 0x22]))
        + b"\x00\x00"  # leading_zero_8bits of the next start code
        + V.annexb_nal(1, bytes([0x33, 0x00, 0x00]))
    )
    nals = V.parse_annexb(blob)
    assert len(nals) == 2
    # first NAL: the two zeros before the second start code trimmed
    assert nals[0]["ebsp_length"] == len(V.rbsp_escape(bytes([0x11, 0x22])))
    # last NAL: payload ends in zeros which MUST survive
    want = len(V.rbsp_escape(bytes([0x33, 0x00, 0x00])))
    assert nals[1]["ebsp_length"] == want


# ---- round-8: PPS + slice headers ----------------------------------


def test_pps_roundtrip_and_fields():
    for cab in (False, True):
        d = V.parse_pps(V.build_pps(cabac=cab, pic_init_qp=30))
        assert d["cabac"] == int(cab)
        assert d["pic_init_qp"] == 30
        assert d["num_slice_groups"] == 1
        assert d["num_ref_l0"] == 1 and d["num_ref_l1"] == 1


def test_slice_header_roundtrip_idr_and_p():
    sps = V.parse_sps(V.build_sps(8, 6))
    for idr, st, fn in ((True, 7, 0), (False, 5, 3)):
        rbsp = V.build_slice_header(
            first_mb=22, slice_type=st, frame_num=fn,
            log2_max_frame_num=sps["log2_max_frame_num"],
            idr=idr, idr_pic_id=4,
        ) + b"\x12\x34"  # opaque slice payload after the prefix
        h = V.parse_slice_header(rbsp, sps, 5 if idr else 1)
        assert h["first_mb_in_slice"] == 22
        assert h["slice_type"] == st
        assert h["frame_num"] == fn
        assert h["is_idr"] is idr
        assert h["idr_pic_id"] == (4 if idr else None)


def test_h264_slice_census_closed_form():
    import math
    for mid in range(15):
        nf, spf, gop, cab = V._h264_slices_params(mid)
        blob = V._h264_slices_blob(mid)
        nals = V.parse_annexb(blob)
        sps = pps = None
        n_pic = n_idr = 0
        for nal in nals:
            s = nal["offset"] + 1
            rb = V.rbsp_unescape(blob[s : s + nal["ebsp_length"]])
            if nal["nal_type"] == 7:
                sps = V.parse_sps(rb)
            elif nal["nal_type"] == 8:
                pps = V.parse_pps(rb)
            elif nal["nal_type"] in (1, 5):
                h = V.parse_slice_header(rb, sps, nal["nal_type"])
                if h["first_mb_in_slice"] == 0:
                    n_pic += 1
                    n_idr += int(h["is_idr"])
        assert n_pic == nf
        assert n_idr == math.ceil(nf / gop)
        assert pps["cabac"] == cab


def test_spark_h264_slice_stats(spark):
    import math
    docs = spark.range(8).selectExpr("id AS doc_id", "'x' AS text")
    got = {
        r["media_id"]: r.asDict()
        for r in V.h264_slice_stats(
            V.synthesize_h264_slices(docs)
        ).collect()
    }
    for mid in range(8):
        nf, spf, gop, cab = V._h264_slices_params(mid)
        idr = math.ceil(nf / gop)
        r = got[mid]
        assert r["n_nals"] == 2 + nf * spf
        assert r["n_pictures"] == nf
        assert r["n_idr_pictures"] == idr
        assert r["n_i_slices"] == idr * spf
        assert r["n_p_slices"] == (nf - idr) * spf
        assert r["max_frame_num"] == min(gop, nf) - 1
        assert r["cabac"] == cab


# ---- round-8: AAC raw_data_block element census ---------------------


def test_audio_specific_config_roundtrip():
    for aot, sri, ch in ((2, 4, 2), (1, 11, 1), (4, 0, 6)):
        d = V.parse_audio_specific_config(
            V.build_audio_specific_config(aot, sri, ch)
        )
        assert (d["object_type"], d["sr_index"], d["channel_config"]) \
            == (aot, sri, ch)
        assert d["frame_length"] == 1024


def test_pce_byte_alignment_is_block_relative():
    """byte_alignment() inside the PCE counts bits from the
    raw_data_block start, not the PCE start: a walk that misaligns
    reads a garbage comment length and desyncs."""
    blob = V._aac_elements_blob(4)  # has PCE in frame 0
    frames = V.parse_adts_frames(blob)
    pl = blob[frames[0]["offset"] + 7 : frames[0]["offset"]
              + frames[0]["length"]]
    c = V.parse_raw_data_block_elements(pl)
    assert c["n_pce"] == 1
    assert c["pce_channels"] in (1, 2)
    assert c["first_audio"] in (0, 1)


def test_aac_element_walk_closed_forms():
    for mid in range(20):
        nf, prof, sri, ndse, nfil, cpe = V._aac_elements_params(mid)
        blob = V._aac_elements_blob(mid)
        frames = V.parse_adts_frames(blob)
        tot_dse = tot_dseb = tot_filb = 0
        first = -1
        for fr in frames:
            pl = blob[fr["offset"] + 7 : fr["offset"] + fr["length"]]
            c = V.parse_raw_data_block_elements(pl)
            tot_dse += c["n_dse"]
            tot_dseb += c["dse_bytes"]
            tot_filb += c["fil_bytes"]
            if first < 0:
                first = c["first_audio"]
        assert tot_dse == nf * ndse
        assert tot_dseb == nf * sum(3 + (mid + d) % 5
                                    for d in range(ndse))
        assert tot_filb == nf * sum(1 + (mid + x) % 7
                                    for x in range(nfil))
        assert first == (1 if cpe else 0)


def test_spark_aac_element_stats(spark):
    docs = spark.range(8).selectExpr("id AS doc_id", "'x' AS text")
    got = {
        r["media_id"]: r.asDict()
        for r in V.aac_element_stats(
            V.synthesize_aac_elements(docs)
        ).collect()
    }
    for mid in range(8):
        nf, prof, sri, ndse, nfil, cpe = V._aac_elements_params(mid)
        r = got[mid]
        assert r["n_frames"] == nf
        assert r["object_type"] == prof + 1
        assert r["pce_channels"] == (2 if cpe else 1)
        assert r["n_dse"] == nf * ndse
        assert r["first_audio"] == cpe
