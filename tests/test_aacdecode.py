"""AAC-LC codec: syntax roundtrip, codebook completeness, escape
sequences, TDAC reconstruction, named boundaries."""

from __future__ import annotations

import numpy as np
import pytest

from commoncrawl_crawler_spark.operators import aacdecode as aac
from commoncrawl_crawler_spark.operators.videobits import (
    _BitReader,
    _BitWriter,
)


def test_codebooks_complete_and_invertible():
    from fractions import Fraction

    for cb in list(range(1, 12)) + ["sf"]:
        enc = aac.ENC_BOOKS[cb]
        dec = aac.DEC_BOOKS[cb]
        assert sum(
            Fraction(1, 1 << ln) for ln, _ in enc.values()
        ) == 1
        assert len(dec) == len(enc)  # collision-free
        # every codeword decodes back through the bit reader
        for sym, (ln, code) in enc.items():
            w = _BitWriter()
            w.u(code, ln)
            w.u(0, 8)  # slack so byte packing never truncates
            data = bytearray()
            for i in range(0, len(w.bits), 8):
                b = 0
                for bit in w.bits[i : i + 8]:
                    b = (b << 1) | bit
                data.append(b)
            r = _BitReader(bytes(data))
            assert aac._read_code(r, dec) == sym


def test_alphabet_shapes_match_spec_table():
    # 13818-7 Table 7.1 structure
    assert len(aac._alphabet(1)) == 81 and len(aac._alphabet(2)) == 81
    assert len(aac._alphabet(3)) == 81
    assert len(aac._alphabet(5)) == 81
    assert len(aac._alphabet(7)) == 64
    assert len(aac._alphabet(9)) == 169
    assert len(aac._alphabet(11)) == 289
    assert aac.hcb_shape(11) == (2, 16, False)
    # sibling books assign DIFFERENT bit patterns over the same
    # alphabet (sect_cb choice is semantically meaningful)
    assert aac.ENC_BOOKS[1] != aac.ENC_BOOKS[2]


def test_blob_roundtrip_matches_closed_form():
    for mid in range(1, 24):
        frames = aac.decode_aac_lc_stream(aac._aac_lc_blob(mid))
        n_long = 2 + mid % 3
        assert len(frames) == n_long + 1
        for f, d in enumerate(frames[:n_long]):
            spec, sf, cb, msfb = aac._aac_lc_frame_spec(mid, f)
            assert d["spec_q"] == spec
            assert d["band_cb"] == cb
            assert d["max_sfb"] == msfb
            for b in range(msfb):
                if cb[b] != aac.ZERO_HCB:
                    assert d["band_sf"][b] == sf[b]
            # dequant is integer-exact by construction
            assert np.array_equal(d["spec"], np.rint(d["spec"]))
        last = frames[-1]
        spec, sfs, cbs, msfb, groups = aac._aac_lc_short_frame(mid)
        assert last["window_sequence"] == aac.EIGHT_SHORT
        assert last["groups"] == groups
        assert last["spec_q_short"] == spec
        assert last["band_cb"] == cbs
        assert np.array_equal(last["spec"], np.rint(last["spec"]))


def test_escape_sequences_roundtrip():
    """Book-11 escapes across the prefix lengths: 16, 17, 31 (n=0),
    32, 63 (n=1), 100 (n=2)."""
    for mag in (16, 17, 31, 32, 63, 100):
        spec = [0] * 1024
        spec[0] = mag
        spec[1] = -mag
        payload = aac.encode_sce(
            spec, [aac.SF_OFFSET], [aac.ESC_HCB], 1
        )
        d = aac.decode_sce(payload)
        assert d["spec_q"][0] == mag and d["spec_q"][1] == -mag


def test_sign_bits_unsigned_books():
    spec = [0] * 1024
    spec[0], spec[1], spec[2], spec[3] = 2, -2, 0, 1
    payload = aac.encode_sce(spec, [aac.SF_OFFSET], [3], 1)
    d = aac.decode_sce(payload)
    assert d["spec_q"][:4] == [2, -2, 0, 1]


def test_section_escape_runs():
    """A 33-band single-codebook section exercises the 31-unit
    sect_len escape."""
    msfb = 33
    spec = [0] * 1024
    for b in range(msfb):
        spec[aac.SWB_OFFSET_LONG[b]] = 1
    payload = aac.encode_sce(
        spec, [aac.SF_OFFSET] * msfb, [1] * msfb, msfb
    )
    d = aac.decode_sce(payload)
    assert d["band_cb"] == [1] * msfb
    assert d["spec_q"] == spec


def test_scalefactor_dpcm_chain():
    msfb = 6
    sfs = [100, 112, 96, 140, 100, 104]
    cbs = [1, 0, 5, 9, 0, 11]  # zero-book bands skip the chain
    spec = [0] * 1024
    for b in range(msfb):
        if cbs[b]:
            spec[aac.SWB_OFFSET_LONG[b]] = 1
    payload = aac.encode_sce(spec, sfs, cbs, msfb)
    d = aac.decode_sce(payload)
    assert d["global_gain"] == 100
    for b in range(msfb):
        if cbs[b]:
            assert d["band_sf"][b] == sfs[b]


def test_tdac_perfect_reconstruction():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(4096)
    w = aac.sine_window()
    frames = [
        aac.mdct_long(x[i * 1024 : i * 1024 + 2048] * w)
        for i in range(3)
    ]
    pcm = aac.synthesize_pcm(frames)
    assert np.max(np.abs(pcm[1024:2048] - x[1024:2048])) < 1e-9


def test_named_boundaries():
    """All four window sequences decode now; the remaining LC
    boundaries (pulse/tns) raise by NAME."""

    def _payload(pulse: int, tns: int) -> bytes:
        w = _BitWriter()
        w.u(0, 3)  # SCE
        w.u(0, 4)
        w.u(100, 8)  # global_gain
        w.u(0, 1)  # reserved
        w.u(aac.ONLY_LONG, 2)
        w.u(0, 1)  # shape
        w.u(0, 6)  # max_sfb = 0: no sections, no scalefactors
        w.u(0, 1)  # predictor
        w.u(pulse, 1)
        w.u(tns, 1)
        w.u(0, 1)  # gain control
        w.u(7, 3)  # END
        while len(w.bits) % 8:
            w.bits.append(0)
        out = bytearray()
        for i in range(0, len(w.bits), 8):
            b = 0
            for bit in w.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)

    aac.decode_sce(_payload(0, 0))  # clean baseline decodes
    with pytest.raises(NotImplementedError, match="pulse"):
        aac.decode_sce(_payload(1, 0))
    with pytest.raises(NotImplementedError, match="tns"):
        aac.decode_sce(_payload(0, 1))


def test_dequantize_cube_exact_and_float_path():
    spec = [0] * 8 + [0] * 1016
    spec[0], spec[1], spec[2] = 8, 27, 5  # 5 is not a cube
    out = aac.dequantize(spec, [104], 1)  # gain 2^1
    assert out[0] == 32.0 and out[1] == 162.0
    assert abs(out[2] - (5 ** (4 / 3)) * 2) < 1e-9


def test_short_window_roundtrip_grouped():
    for groups in ([1] * 8, [2, 2, 4], [3, 5], [8]):
        ng = len(groups)
        msfb = 6
        spec = [[0] * 128 for _ in range(8)]
        sfs = [[100 + 4 * ((g + b) % 4) for b in range(msfb)]
               for g in range(ng)]
        cbs = [[(0 if (g + b) % 3 == 0 else [1, 5, 9, 11][(g + b) % 4])
                for b in range(msfb)] for g in range(ng)]
        win0 = 0
        for g, glen in enumerate(groups):
            for b in range(msfb):
                if cbs[g][b] == 0:
                    continue
                mag = {1: 1, 5: 3, 9: 8, 11: 27}[cbs[g][b]]
                for j in range(glen):
                    line = aac.SWB_OFFSET_SHORT[b] + (g + b + j) % 4
                    spec[win0 + j][line] = mag if (g + j) % 2 else -mag
            win0 += glen
        payload = aac.encode_sce_short(spec, sfs, cbs, msfb, groups)
        d = aac.decode_sce(payload)
        assert d["window_sequence"] == aac.EIGHT_SHORT
        assert d["groups"] == groups
        assert d["spec_q_short"] == spec
        assert d["band_cb"] == cbs
        for g in range(ng):
            for b in range(msfb):
                if cbs[g][b]:
                    assert d["band_sf"][g][b] == sfs[g][b]


def test_short_section_escape_runs():
    """A 13-band single-codebook group section needs two 3-bit
    sect_len words (escape 7)."""
    msfb = 13
    spec = [[0] * 128 for _ in range(8)]
    for b in range(msfb):
        spec[0][aac.SWB_OFFSET_SHORT[b]] = 1
    payload = aac.encode_sce_short(
        spec, [[100] * msfb], [[1] * msfb], msfb, [8]
    )
    d = aac.decode_sce(payload)
    assert d["band_cb"] == [[1] * msfb]
    assert d["spec_q_short"] == spec


def test_start_stop_sequences_share_long_layout():
    spec = [0] * 1024
    spec[3] = 7
    for ws in (aac.LONG_START, aac.LONG_STOP):
        payload = aac.encode_sce(spec, [100], [9], 1, window_sequence=ws)
        d = aac.decode_sce(payload)
        assert d["window_sequence"] == ws
        assert d["spec_q"][3] == 7


def test_window_switching_perfect_reconstruction():
    """LONG -> START -> EIGHT_SHORT -> STOP -> LONG with matched
    analysis windows reconstructs the interior exactly (the
    Princen-Bradley condition across every splice)."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal(6 * 1024)
    seqs = [aac.ONLY_LONG, aac.LONG_START, aac.EIGHT_SHORT,
            aac.LONG_STOP, aac.ONLY_LONG]
    frames = []
    for i, ws in enumerate(seqs):
        seg = x[i * 1024 : i * 1024 + 2048]
        if ws == aac.EIGHT_SHORT:
            wsh = aac.sine_window(256)
            frames.append((ws, np.stack([
                aac._mdct(seg[448 + 128 * j : 448 + 128 * j + 256] * wsh, 256)
                for j in range(8)
            ])))
        else:
            frames.append((ws, aac._mdct(seg * aac._window_for(ws), 2048)))
    pcm = aac.synthesize_pcm(frames)
    err = np.max(np.abs(pcm[1024:4096] - x[1024:4096]))
    assert err < 1e-9, err


def test_stream_with_short_frames_decodes():
    spec = [[0] * 128 for _ in range(8)]
    spec[0][0] = 8
    spec[7][4] = -27
    blob = aac.encode_aac_lc_stream([])  # empty ok
    payload = aac.encode_sce_short(
        spec, [[104, 100]], [[9, 11]], 2, [8]
    )
    from commoncrawl_crawler_spark.operators.videobits import (
        build_adts_frame,
    )

    blob = build_adts_frame(payload, 1, 4, 1)
    frames = aac.decode_aac_lc_stream(blob)
    assert len(frames) == 1
    d = frames[0]
    assert d["spec"].shape == (8, 128)
    assert d["spec"][0][0] == 16.0 * 2  # 8^(4/3)=16, gain 2^1
    assert d["spec"][7][4] == -81.0  # 27^(4/3)=81, gain 2^0


def test_full_chain_codes_real_audio():
    """A real signal through the ENTIRE codec: MDCT analysis,
    per-band power-of-two scalefactors, 3/4-power quantization,
    book-11 bitstream encode, full syntax decode, 4/3-power dequant,
    IMDCT synthesis.  Reconstruction must track the unquantized
    render within codec-quality error (>30 dB SNR)."""
    rng = np.random.default_rng(3)
    # band-limited-ish signal: sum of a few tones + noise floor
    t = np.arange(5 * 1024)
    x = (
        np.sin(2 * np.pi * 0.013 * t)
        + 0.5 * np.sin(2 * np.pi * 0.037 * t)
        + 0.05 * rng.standard_normal(len(t))
    )
    w = aac.sine_window()
    msfb = aac.NUM_SWB_LONG
    frames_bits = []
    frames_ref = []
    for i in range(4):
        X = aac.mdct_long(x[i * 1024 : i * 1024 + 2048] * w)
        frames_ref.append(X)
        spec_q = [0] * 1024
        sfs = [aac.SF_OFFSET] * msfb
        cbs = [aac.ZERO_HCB] * msfb
        for b in range(msfb):
            lo, hi = aac.SWB_OFFSET_LONG[b], aac.SWB_OFFSET_LONG[b + 1]
            amax = float(np.max(np.abs(X[lo:hi])))
            if amax < 1e-6:
                continue
            # gain 2^k with k chosen so the largest |q| lands ~400
            k = int(np.floor(np.log2(amax) * 0.75)) - 6
            gain = 2.0 ** k
            q = [
                int(np.sign(v) * round((abs(v) / gain) ** 0.75))
                for v in X[lo:hi]
            ]
            if all(v == 0 for v in q):
                continue
            cbs[b] = aac.ESC_HCB
            sfs[b] = aac.SF_OFFSET + 4 * k
            spec_q[lo:hi] = q
        frames_bits.append((spec_q, sfs, cbs, msfb))
    blob = aac.encode_aac_lc_stream(frames_bits)
    decoded = aac.decode_aac_lc_stream(blob)
    pcm = aac.synthesize_pcm([d["spec"] for d in decoded])
    ref = aac.synthesize_pcm(frames_ref)
    seg = slice(1024, 4096)
    err = pcm[seg] - ref[seg]
    snr = 10 * np.log10(
        float(np.sum(ref[seg] ** 2)) / float(np.sum(err**2))
    )
    assert snr > 30.0, f"SNR {snr:.1f} dB"
