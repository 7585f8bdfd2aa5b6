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
            n_quads = len(spec_g["quads"])
            # beyond the count1 region everything is zero
            assert not out[g, 4 * n_quads :].any()
            for q, quad in enumerate(spec_g["quads"]):
                for j in range(4):
                    line = 4 * q + j
                    v, sgn = quad[j], quad[4 + j]
                    if v == 0:
                        assert out[g, line] == 0
                        continue
                    sfb = 0
                    while L3.SFB_LONG_44100[sfb + 1] <= line:
                        sfb += 1
                    shared = g == 1 and any(
                        (scfsi >> (3 - grp)) & 1 and lo <= sfb < hi
                        for grp, (lo, hi) in
                        enumerate(L3._SCFSI_GROUPS)
                    )
                    src = L3._l3_granule_spec(mid, 0) if shared \
                        else spec_g
                    sf = src["scalefacs"][sfb]
                    pre = L3.PRETAB[sfb] if spec_g["preflag"] else 0
                    ex2 = (spec_g["global_gain"] - 210) // 2 \
                        - (spec_g["scalefac_scale"] + 1) * (sf + pre)
                    assert ex2 % 2 == 0
                    x = (-1 if sgn else 1) * 2.0 ** (ex2 // 2)
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
    # 48 kHz Table B.8 row not embedded
    sr48 = bytes([blob[0], blob[1], (blob[2] & ~0x0C) | 0x04]) \
        + bytes(blob[3:])
    with pytest.raises(NotImplementedError, match="44100"):
        L3.decode_mpeg1_layer3_frame(sr48)
    # big_values > 0 is the documented Huffman boundary
    si = C.parse_mp3_sideinfo_mono(bytes(blob[4:21]))
    g = si["granules"][0]
    g["big_values"] = 4
    patched = bytes(blob[:4]) + C.encode_mp3_sideinfo_mono(
        0, si["scfsi"], si["granules"]
    ) + bytes(blob[21:])
    with pytest.raises(NotImplementedError, match="big-value"):
        L3.decode_mpeg1_layer3_frame(patched)


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
