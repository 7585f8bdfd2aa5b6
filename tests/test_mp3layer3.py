"""Layer III decode chain (operators/mp3layer3)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from commoncrawl_crawler_spark.operators import container as C
from commoncrawl_crawler_spark.operators import mp3layer3 as L3
from commoncrawl_crawler_spark.operators import mpegsynth as MS


def test_count1_tables_are_complete_prefix_codes():
    """Building the decode trie raises on any prefix collision, and
    the Kraft sum being exactly 1 proves completeness -- a structural
    proof the embedded table A is a valid Huffman code."""
    for table_a in (True, False):
        L3._count1_decode_tree(table_a)  # raises on collision
    assert sum(2.0 ** -ln for ln in L3.COUNT1_A_LEN) == 1.0
    assert len(set(zip(L3.COUNT1_A_LEN, L3.COUNT1_A_COD))) == 16


def test_sfb_bounds_and_pretab_shapes():
    b = L3.SFB_LONG_44100
    assert b[0] == 0 and b[-1] == 576 and len(b) == 23
    assert all(b[i] < b[i + 1] for i in range(22))
    assert len(L3.PRETAB) == 22


def test_imdct_tdac_perfect_reconstruction():
    """Princen-Bradley TDAC: forward windowed MDCT of 50%%-overlapped
    36-sample blocks, IMDCT + overlap-add recovers the interior
    exactly (scaled by N/4 = 9) -- an INDEPENDENT mathematical check
    of the IMDCT/window pair, no encoder involved."""
    rng = np.random.RandomState(7)
    sig = rng.randn(18 * 6)
    rec = np.zeros(18 * 7)
    for g in range(5):
        X = L3.mdct18_float(sig[g * 18 : (g + 2) * 18])
        rec[g * 18 : (g + 2) * 18] += L3.imdct36_float(X)
    interior = rec[18:90] / 9.0
    assert np.max(np.abs(interior - sig[18:90])) < 1e-10


def test_q14_matrix_matches_float_form():
    w = L3.IMDCT_WIN_Q14.astype(np.float64) / (1 << 14)
    x = np.eye(18)[3]
    assert np.max(np.abs(w @ x - L3.imdct36_float(x))) < 1e-4


def test_spectral_decode_matches_sideinfo_and_content():
    """Full frame decode recovers exactly the spectra the granule
    specs describe: power-of-two magnitudes at the quad positions
    with scfsi-shared scalefactors."""
    for mid in range(12):
        blob = L3._l3_blob(mid)
        _, frames = C.parse_mpeg_audio_frames(blob)
        assert len(frames) == 1 and frames[0]["layer"] == 3
        out = L3.decode_mpeg1_layer3_frame(blob)
        scfsi = mid % 16
        for g in range(2):
            spec_g = L3._l3_granule_spec(mid, g)
            n_bigs = len(spec_g["bigs"])
            n_quads = len(spec_g["quads"])
            # beyond big-values + count1 everything is zero
            assert not out[g, 2 * n_bigs + 4 * n_quads :].any()

            def _ex2(line: int) -> int:
                sfb = 0
                while L3.SFB_LONG_44100[sfb + 1] <= line:
                    sfb += 1
                shared = g == 1 and any(
                    (scfsi >> (3 - grp)) & 1 and lo <= sfb < hi
                    for grp, (lo, hi) in enumerate(L3._SCFSI_GROUPS)
                )
                src = L3._l3_granule_spec(mid, 0) if shared \
                    else spec_g
                sf = src["scalefacs"][sfb]
                pre = L3.PRETAB[sfb] if spec_g["preflag"] else 0
                ex2 = (spec_g["global_gain"] - 210) // 2 \
                    - (spec_g["scalefac_scale"] + 1) * (sf + pre)
                assert ex2 % 2 == 0
                return ex2

            for p, (bx, by, nx, ny) in enumerate(spec_g["bigs"]):
                for line, m, neg in (
                    (2 * p, bx, nx), (2 * p + 1, by, ny),
                ):
                    assert out[g, line] == L3._requant_micro(
                        m, bool(neg), _ex2(line)
                    ), (mid, g, line)
            for q, quad in enumerate(spec_g["quads"]):
                for j in range(4):
                    line = 2 * n_bigs + 4 * q + j
                    v, sgn = quad[j], quad[4 + j]
                    if v == 0:
                        assert out[g, line] == 0
                        continue
                    x = (-1 if sgn else 1) * 2.0 ** (_ex2(line) // 2)
                    assert out[g, line] == math.floor(x * 1e6 + 0.5)


def test_integer_path_tracks_float_path():
    """The Q14/Q28 gate path against the float alias/IMDCT/polyphase
    reference: reconstruction SNR bounded by fixed-point noise, far
    above any structural error."""
    for mid in (0, 3, 7):
        blob = L3._l3_blob(mid)
        n, pcm_q = L3.decode_layer3_to_pcm_q(blob)
        spec = L3.decode_mpeg1_layer3_frame(blob).astype(np.float64)
        spec /= 1e6
        # float reference pipeline
        xr = spec.reshape(2, 32, 18).copy()
        for b in range(1, 32):
            for i in range(8):
                cs = 1.0 / math.sqrt(1 + L3.ALIAS_CI[i] ** 2)
                ca = L3.ALIAS_CI[i] * cs
                lo = xr[:, b - 1, 17 - i].copy()
                hi = xr[:, b, i].copy()
                xr[:, b - 1, 17 - i] = cs * lo - ca * hi
                xr[:, b, i] = cs * hi + ca * lo
        z = np.zeros((2, 32, 36))
        for g in range(2):
            for sb in range(32):
                z[g, sb] = L3.imdct36_float(xr[g, sb])
        sub = z[:, :, :18].copy()
        sub[1:] += z[:-1, :, 18:]
        sub[:, 1::2, 1::2] *= -1
        grid = sub.transpose(0, 2, 1).reshape(36, 32)
        pcm_f = MS.synthesis_filterbank(grid)
        err = pcm_q / 1e6 - pcm_f
        snr = 10 * math.log10(
            float(np.sum(pcm_f**2)) / max(float(np.sum(err**2)), 1e-30)
        )
        assert snr > 55.0, (mid, snr)


def test_rejection_boundaries_are_loud():
    blob = bytearray(L3._l3_blob(0))
    with pytest.raises(ValueError, match="bad sync"):
        L3.decode_mpeg1_layer3_frame(b"\x00" + bytes(blob[1:]))
    # flip layer bits to II
    l2 = bytes([blob[0], (blob[1] & ~0x06) | 0x04]) + bytes(blob[2:])
    with pytest.raises(ValueError, match="not layer III"):
        L3.decode_mpeg1_layer3_frame(l2)
    # reserved sample-rate index 3 rejected (B.8 rows now cover all
    # three real MPEG-1 rates)
    sr_res = bytes([blob[0], blob[1], blob[2] | 0x0C]) \
        + bytes(blob[3:])
    with pytest.raises(ValueError, match="reserved sample-rate"):
        L3.decode_mpeg1_layer3_frame(sr_res)
    # forbidden big-value table ids 4/14 are loud
    si = C.parse_mp3_sideinfo_mono(bytes(blob[4:21]))
    g = si["granules"][0]
    g["big_values"] = 4
    g["table_select"] = [4, 0, 0]
    patched = bytes(blob[:4]) + C.encode_mp3_sideinfo_mono(
        0, si["scfsi"], si["granules"]
    ) + bytes(blob[21:])
    with pytest.raises(ValueError, match="forbidden table"):
        L3.decode_mpeg1_layer3_frame(patched)
    # MPEG-2/2.5 LSF remains the documented boundary
    lsf = bytes([blob[0], (blob[1] & ~0x18) | 0x10]) + bytes(blob[2:])
    with pytest.raises(NotImplementedError, match="LSF"):
        L3.decode_mpeg1_layer3_frame(lsf)


def test_spark_gate_matches_driver(spark):
    docs = spark.range(6).selectExpr("id AS doc_id", "'x' AS text")
    got = {
        r["media_id"]: r.asDict()
        for r in L3.layer3_pcm_stats(
            L3.synthesize_layer3(docs)
        ).collect()
    }
    for mid in range(6):
        n, pcm = L3.decode_layer3_to_pcm_q(L3._l3_blob(mid))
        r = got[mid]
        assert r["n_frames"] == n
        assert r["n_pcm"] == pcm.size == 1152
        assert r["pcm_sum_micro"] == int(pcm.sum())
        assert r["pcm_sum_abs_micro"] == int(np.abs(pcm).sum())
        assert r["pcm_peak_micro"] == int(np.abs(pcm).max())


def test_bit_reservoir_differential_identical_pcm():
    """The same granule content packed self-contained vs with the
    bit reservoir (main_data_begin > 0, data spilled into earlier
    frames' slack) must decode to IDENTICAL PCM -- the reservoir is
    transport, not content."""
    for mid in (0, 4, 9):
        frames = [
            (
                [L3._l3_granule_spec(mid + f, 0),
                 L3._l3_granule_spec(mid + f, 1)],
                (mid + f) % 16,
            )
            for f in range(3)
        ]
        plain = b"".join(
            L3.encode_mpeg1_layer3_frame(specs, scfsi)
            for specs, scfsi in frames
        )
        res = L3.encode_layer3_stream_reservoir(frames)
        # the reservoir must actually be exercised
        _, frs = C.parse_mpeg_audio_frames(res)
        begins = [
            C.parse_mp3_sideinfo_mono(
                res[fr["offset"] + 4 : fr["offset"] + 21]
            )["main_data_begin"]
            for fr in frs
        ]
        assert begins[0] == 0 and all(b > 0 for b in begins[1:])
        n1, pcm1 = L3.decode_layer3_to_pcm_q(plain)
        n2, pcm2 = L3.decode_layer3_to_pcm_q(res)
        assert n1 == n2 == 3
        assert np.array_equal(pcm1, pcm2)


def test_reservoir_underflow_is_loud():
    """A main_data_begin reaching past the accumulated pool is a
    loud, attributable error."""
    frames = [
        ([L3._l3_granule_spec(1, 0), L3._l3_granule_spec(1, 1)], 0)
    ]
    blob = bytearray(L3.encode_layer3_stream_reservoir(frames))
    si = C.parse_mp3_sideinfo_mono(bytes(blob[4:21]))
    patched = bytes(blob[:4]) + C.encode_mp3_sideinfo_mono(
        100, si["scfsi"], si["granules"]
    ) + bytes(blob[21:])
    with pytest.raises(ValueError, match="reservoir"):
        L3.decode_layer3_stream(patched)


def test_frame_decoder_requires_self_contained():
    frames = [
        ([L3._l3_granule_spec(2, 0), L3._l3_granule_spec(2, 1)], 0),
        ([L3._l3_granule_spec(3, 0), L3._l3_granule_spec(3, 1)], 0),
    ]
    res = L3.encode_layer3_stream_reservoir(frames)
    _, frs = C.parse_mpeg_audio_frames(res)
    f1 = res[frs[1]["offset"] : frs[1]["offset"] + frs[1]["length"]]
    with pytest.raises(ValueError, match="decode_layer3_stream"):
        L3.decode_mpeg1_layer3_frame(f1)


# ---------------------------------------------------------------
# big-value region (Annex B.7 tables, mp3tables.py)
# ---------------------------------------------------------------

from commoncrawl_crawler_spark.operators import mp3tables as BT


def test_all_bigvalue_tables_complete_prefix_codes():
    for tid in sorted(BT._BASE_TABLES):
        BT.validate_table(tid)
    # ESC families alias their base codes with distinct linbits
    for tid in range(16, 24):
        assert BT.table_codes(tid) == BT.table_codes(16)
    for tid in range(24, 32):
        assert BT.table_codes(tid) == BT.table_codes(24)
    assert [BT.LINBITS[t] for t in range(16, 24)] == \
        [1, 2, 3, 4, 6, 8, 10, 13]
    assert [BT.LINBITS[t] for t in range(24, 32)] == \
        [4, 5, 6, 7, 8, 9, 11, 13]
    for tid in (4, 14):
        with pytest.raises(ValueError, match="forbidden"):
            BT.table_codes(tid)


def _bv_spec(bigs, table_select, r0=1, r1=0, gg=210 - 4 * 8):
    return {
        "global_gain": gg,
        "scalefac_compress": 0,  # slen 0/0: zero scalefactor bits
        "scalefac_scale": 0,
        "preflag": 0,
        "count1table_select": 1,
        "scalefacs": [0] * L3.N_SFB_LONG,
        "quads": [],
        "bigs": bigs,
        "table_select": table_select,
        "region0_count": r0,
        "region1_count": r1,
    }


def test_bigvalues_roundtrip_across_regions_and_esc():
    # region0 (lines 0-7): table 24 (linbits 4) incl. ESC 27 = 15+12;
    # region1 (lines 8-11): table 16 (linbits 1), direct 0..14;
    # region2 (lines 12+): table 13 (no linbits)
    bigs = [
        (27, 8, 0, 1), (0, 1, 0, 0), (8, 27, 1, 1), (1, 0, 1, 0),
        (8, 1, 0, 0), (1, 8, 1, 0),
        (8, 8, 0, 1), (1, 1, 1, 1),
    ]
    spec = _bv_spec(bigs, [24, 16, 13])
    frame = L3.encode_mpeg1_layer3_frame([spec, spec], scfsi=0)
    si = C.parse_mp3_sideinfo_mono(frame[4:21])
    assert si["granules"][0]["big_values"] == len(bigs)
    assert si["granules"][0]["table_select"] == [24, 16, 13]
    out = L3.decode_mpeg1_layer3_frame(frame)
    ex2 = 2 * (-8)  # gg = 210-32, no scalefactors
    expect = {}
    for p, (x, y, nx, ny) in enumerate(bigs):
        expect[2 * p] = L3._requant_micro(x, bool(nx), ex2)
        expect[2 * p + 1] = L3._requant_micro(y, bool(ny), ex2)
    for line in range(576):
        for g in range(2):
            assert out[g, line] == expect.get(line, 0), (g, line)
    # exactness of the cube path: 27^(4/3) = 81, 8^(4/3) = 16
    assert expect[0] == math.floor(81 * 2.0 ** -8 * 1e6 + 0.5)
    assert expect[1] == -math.floor(16 * 2.0 ** -8 * 1e6 + 0.5) or \
        expect[1] == math.floor(-16 * 2.0 ** -8 * 1e6 + 0.5)


def test_bigvalues_escape_overflow_is_loud():
    # 31 = 15 + 16 does not fit linbits-4 table 24
    spec = _bv_spec([(31, 0, 0, 0)], [24, 0, 0])
    with pytest.raises(ValueError, match="does not fit"):
        L3.encode_mpeg1_layer3_frame([spec, spec], scfsi=0)
    # value 3 does not fit table 1 (xlen 2, no linbits)
    spec = _bv_spec([(3, 0, 0, 0)], [1, 0, 0])
    with pytest.raises(ValueError, match="does not fit"):
        L3.encode_mpeg1_layer3_frame([spec, spec], scfsi=0)


def test_bigvalues_all_tables_roundtrip():
    # one pair through every real table id (values within xlen)
    for tid in list(range(1, 4)) + list(range(5, 14)) + [15] + \
            list(range(16, 32)):
        xlen, _, _ = BT.table_codes(tid)
        x = min(xlen - 1, 2)
        y = 1
        spec = _bv_spec([(x, y, 1, 0)], [tid, 0, 0])
        frame = L3.encode_mpeg1_layer3_frame([spec, spec], scfsi=0)
        out = L3.decode_mpeg1_layer3_frame(frame)
        ex2 = -16
        assert out[0, 0] == L3._requant_micro(x, True, ex2), tid
        assert out[0, 1] == L3._requant_micro(y, False, ex2), tid


def test_bigvalues_multirate_bounds():
    # same content at 44.1/48/32 kHz: band-dependent scalefactors make
    # the requant exponent follow each rate's own B.8 row
    bigs = [(8, 8, 0, 0)] * 20  # 40 lines: crosses sfb 8 boundary
    spec = _bv_spec(bigs, [13, 13, 13], r0=3, r1=2)
    spec["scalefac_compress"] = 15
    spec["scalefacs"] = [2 * (i % 3) for i in range(L3.N_SFB_LONG)]
    for sr_idx, rate in enumerate((44100, 48000, 32000)):
        frame = L3.encode_mpeg1_layer3_frame(
            [spec, spec], scfsi=0, sr_idx=sr_idx
        )
        out = L3.decode_mpeg1_layer3_frame(frame)
        bounds = L3._SFB_LONG[rate]
        for line in range(40):
            sfb = 0
            while bounds[sfb + 1] <= line:
                sfb += 1
            ex2 = -16 - 1 * (2 * (sfb % 3))
            assert out[0, line] == L3._requant_micro(
                8, False, ex2
            ), (rate, line)


def test_requant_micro_cube_exact_and_float_fallback():
    # cubes with even exponents are exact integers scaled by 2^k
    assert L3._requant_micro(8, False, -4) == \
        math.floor(16 / 4 * 1e6 + 0.5)
    assert L3._requant_micro(27, True, -8) == \
        math.floor(-81 / 16 * 1e6 + 0.5)
    assert L3._requant_micro(64, False, -10) == \
        math.floor(256 / 32 * 1e6 + 0.5)
    # non-cube falls back to the float 4/3 power, micro-rounded
    got = L3._requant_micro(5, False, -4)
    assert got == math.floor(5 ** (4.0 / 3.0) / 4 * 1e6 + 0.5)
    assert L3._requant_micro(0, False, 0) == 0


def test_bigvalues_differential_count1_only_path():
    """The count1 region's DECODED CONTENT is independent of whether
    a big-value region precedes it: decoding spec-with-bigs restricted
    to the quad lines equals the bigs-free decode shifted by 2*n_bigs
    (same scalefactors, same exponents at matching sfbs require the
    quads to sit inside one scalefactor band span on both sides)."""
    for mid in range(4):
        with_bigs = L3._l3_granule_spec(mid, 0)
        without = dict(with_bigs, bigs=[])
        n_bigs = len(with_bigs["bigs"])
        fa = L3.encode_mpeg1_layer3_frame([with_bigs, with_bigs],
                                          scfsi=0)
        fb = L3.encode_mpeg1_layer3_frame([without, without], scfsi=0)
        oa = L3.decode_mpeg1_layer3_frame(fa)
        ob = L3.decode_mpeg1_layer3_frame(fb)
        # reservoir stream of the same two frames also decodes the
        # same spectra (transport differential, now with big values)
        stream = L3.encode_layer3_stream_reservoir(
            [([with_bigs, with_bigs], 0), ([without, without], 0)]
        )
        os_ = L3.decode_layer3_stream(stream)
        assert np.array_equal(os_[:2], oa)
        assert np.array_equal(os_[2:], ob)
        # per-line: every quad value appears in both decodes at its
        # own offset with the exponent of ITS line's sfb
        bounds = L3.SFB_LONG_44100
        sf = with_bigs["scalefacs"]
        ss, pf = with_bigs["scalefac_scale"], with_bigs["preflag"]
        gg = with_bigs["global_gain"]
        for q, quad in enumerate(with_bigs["quads"]):
            for j in range(4):
                v, sgn = quad[j], quad[4 + j]
                for base, out in ((2 * n_bigs, oa), (0, ob)):
                    line = base + 4 * q + j
                    if v == 0:
                        assert out[0, line] == 0
                        continue
                    sfb = 0
                    while bounds[sfb + 1] <= line:
                        sfb += 1
                    pre = L3.PRETAB[sfb] if pf else 0
                    ex2 = (gg - 210) // 2 - (ss + 1) * (sf[sfb] + pre)
                    assert out[0, line] == L3._requant_micro(
                        1, bool(sgn), ex2
                    )


# ---------------------------------------------------------------
# short / mixed blocks (window switching)
# ---------------------------------------------------------------


def test_short_window_tdac_reconstruction():
    """IMDCT-12 + short window satisfies Princen-Bradley TDAC:
    50%-overlapped short blocks reconstruct the interior (scale
    N/4 = 3)."""
    rng = np.random.RandomState(11)
    sig = rng.randn(6 * 8)
    rec = np.zeros(6 * 9)
    for b in range(7):
        X = L3.mdct6_float(sig[b * 6 : b * 6 + 12])
        rec[b * 6 : b * 6 + 12] += L3.imdct12_float(X)
    interior = rec[6:42] / 3.0
    assert np.max(np.abs(interior - sig[6:42])) < 1e-10


def test_block_switch_window_sequence_tdac():
    """The canonical long->start->short->stop->long sequence
    reconstructs the signal exactly (Edler conditions on the spec's
    window shapes): any wrong shape in block types 1/2/3 breaks
    this."""
    rng = np.random.RandomState(5)
    sig = rng.randn(18 * 7)
    bts = [0, 1, 2, 3, 0, 0]
    rec = np.zeros(18 * 7)
    for g, bt in enumerate(bts):
        base = g * 18
        seg = sig[base : base + 36]
        if bt == 2:
            for w in range(3):
                lo = 6 + 6 * w
                piece = seg[lo : lo + 12]
                n = np.arange(12)
                win = np.sin(np.pi / 12.0 * (n + 0.5))
                c = np.cos(
                    np.pi / 24.0 * np.outer(2 * n + 7, 2 * np.arange(6) + 1)
                )
                X = (piece * win) @ c
                rec[base + lo : base + lo + 12] += \
                    L3.imdct12_float(X) * 3.0  # scale 3 -> match 9
        else:
            n = np.arange(36)
            c = np.cos(
                np.pi / 72.0 * np.outer(2 * n + 19, 2 * np.arange(18) + 1)
            )
            X = (seg * L3.long_block_window(bt)) @ c
            rec[base : base + 36] += L3.imdct36_float(X, bt)
    interior = rec[18:108] / 9.0
    assert np.max(np.abs(interior - sig[18:108])) < 1e-10


def _short_spec(mixed: int, mid: int = 0):
    """A short-block granule spec with bigs crossing the implicit
    region boundary and per-window subblock gains."""
    n_bigs = 24  # 48 lines: crosses r1 (36) into region1
    bigs = []
    for p in range(n_bigs):
        mags = [0, 1, 8, 27 if 2 * p < 36 else 8]
        bigs.append((
            mags[(mid + p) % 4], mags[(mid + 3 * p + 1) % 4],
            p % 2, (p + 1) % 2,
        ))
    quads = [(1, 0, 1, 0, 1, 0, 0, 0)] * 4
    return {
        "global_gain": 210 - 4 * 9,
        "scalefac_compress": 15,  # slen 4 / 3
        "scalefac_scale": 0,
        "preflag": 0,
        "count1table_select": 0,
        "window_switching": 1,
        "block_type": 2,
        "mixed_block": mixed,
        "subblock_gain": [0, 1, 2],
        "scalefacs": [2 * ((mid + s) % 3) for s in range(21)],
        "scalefacs_short": [
            [(mid + s + w) % 4 for w in range(3)] for s in range(12)
        ],
        "bigs": bigs,
        "table_select": [24, 16, 0],
        "quads": quads,
    }


def _expected_short_spectra(spec, bounds, sbounds):
    """Transmitted-order magnitudes -> requant + reorder, mirroring
    2.4.3.4.7/8 independently of the decoder's implementation."""
    out = np.zeros(576, dtype=np.int64)
    mags = np.zeros(576, dtype=np.int64)
    negs = np.zeros(576, dtype=bool)
    line = 0
    for x, y, nx, ny in spec["bigs"]:
        mags[line], negs[line] = x, bool(x and nx)
        mags[line + 1], negs[line + 1] = y, bool(y and ny)
        line += 2
    for quad in spec["quads"]:
        for j in range(4):
            mags[line], negs[line] = quad[j], bool(
                quad[j] and quad[4 + j]
            )
            line += 1
    gg2 = (spec["global_gain"] - 210) // 2
    ssm = spec["scalefac_scale"] + 1
    mixed = spec["mixed_block"]
    long_top = 36 if mixed else 0
    for ln in range(long_top):
        if not mags[ln]:
            continue
        sfb = 0
        while bounds[sfb + 1] <= ln:
            sfb += 1
        pre = L3.PRETAB[sfb] if spec["preflag"] else 0
        ex2 = gg2 - ssm * (spec["scalefacs"][sfb] + pre)
        out[ln] = L3._requant_micro(int(mags[ln]), bool(negs[ln]), ex2)
    sf_s = spec["scalefacs_short"] + [[0, 0, 0]]
    for s in range(3 if mixed else 0, 13):
        lo3 = 3 * sbounds[s]
        width = sbounds[s + 1] - sbounds[s]
        for w in range(3):
            ex2 = gg2 - 4 * spec["subblock_gain"][w] \
                - ssm * sf_s[s][w]
            for f in range(width):
                src = lo3 + w * width + f
                if src >= line or not mags[src]:
                    continue
                out[lo3 + 3 * f + w] = L3._requant_micro(
                    int(mags[src]), bool(negs[src]), ex2
                )
    return out


def test_short_block_roundtrip_pure_and_mixed():
    for mixed in (0, 1):
        for mid in range(3):
            spec = _short_spec(mixed, mid)
            long0 = L3._l3_granule_spec(mid, 0)
            frame = L3.encode_mpeg1_layer3_frame(
                [spec, long0], scfsi=0
            )
            si = C.parse_mp3_sideinfo_mono(frame[4:21])
            assert si["granules"][0]["block_type"] == 2
            assert si["granules"][0]["mixed_block"] == mixed
            assert si["granules"][0]["subblock_gain"] == [0, 1, 2]
            out = L3.decode_mpeg1_layer3_frame(frame)
            expect = _expected_short_spectra(
                spec, L3.SFB_LONG_44100, L3.SFB_SHORT_44100
            )
            assert np.array_equal(out[0], expect), (mixed, mid)


def test_short_block_pcm_chain_runs_and_tracks_float():
    """A stream with the full block-type sequence (long, start,
    pure-short, mixed-short, stop, long) through the integer PCM
    chain, cross-checked against an independent float hybrid."""
    specs = [
        (L3._l3_granule_spec(0, 0), _start_stop_spec(1)),
        (_short_spec(0, 1), _short_spec(1, 2)),
        (_start_stop_spec(3), L3._l3_granule_spec(1, 1)),
    ]
    frames = [(list(pair), 0) for pair in specs]
    blob = b"".join(
        L3.encode_mpeg1_layer3_frame(list(pair), scfsi=0)
        for pair in specs
    )
    spectra, binfo = L3.decode_layer3_stream_full(blob)
    assert [b["block_type"] for b in binfo] == [0, 1, 2, 2, 3, 0]
    assert [b["mixed"] for b in binfo] == [0, 0, 0, 1, 0, 0]
    n, pcm_q = L3.decode_layer3_to_pcm_q(blob)
    assert n == 3 and pcm_q.size == 3 * 1152
    # independent float hybrid
    spec_f = spectra.astype(np.float64) / 1e6
    xr = spec_f.reshape(-1, 32, 18).copy()
    for g_ix, b in enumerate(binfo):
        blim = 31 if b["block_type"] != 2 else (1 if b["mixed"] else 0)
        for bb in range(1, blim + 1):
            for i in range(8):
                cs = 1.0 / math.sqrt(1 + L3.ALIAS_CI[i] ** 2)
                ca = L3.ALIAS_CI[i] * cs
                lo = xr[g_ix, bb - 1, 17 - i]
                hi = xr[g_ix, bb, i]
                xr[g_ix, bb - 1, 17 - i] = cs * lo - ca * hi
                xr[g_ix, bb, i] = cs * hi + ca * lo
    z = np.zeros((len(binfo), 32, 36))
    for g_ix, b in enumerate(binfo):
        bt, mixed = b["block_type"], b["mixed"]
        for sb in range(32):
            if bt != 2 or (mixed and sb < 2):
                z[g_ix, sb] = L3.imdct36_float(
                    xr[g_ix, sb], 0 if bt == 2 else bt
                )
            else:
                for w in range(3):
                    z[g_ix, sb, 6 + 6 * w : 18 + 6 * w] += \
                        L3.imdct12_float(xr[g_ix, sb, w::3])
    sub = z[:, :, :18].copy()
    sub[1:] += z[:-1, :, 18:]
    sub[:, 1::2, 1::2] *= -1
    grid = sub.transpose(0, 2, 1).reshape(-1, 32)
    pcm_f = MS.synthesis_filterbank(grid)
    err = pcm_q / 1e6 - pcm_f
    snr = 10 * math.log10(
        float(np.sum(pcm_f**2)) / max(float(np.sum(err**2)), 1e-30)
    )
    assert snr > 55.0, snr


def _start_stop_spec(bt: int):
    """Block type 1 (start) / 3 (stop) granule: long grammar with the
    implicit big-value regions."""
    spec = L3._l3_granule_spec(2, 0)
    spec = dict(
        spec,
        window_switching=1,
        block_type=bt,
        mixed_block=0,
        subblock_gain=[0, 0, 0],
        table_select=[24, 16, 0],
    )
    return spec
