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
        assert len(frames) == 2 + mid % 3
        for f, d in enumerate(frames):
            spec, sf, cb, msfb = aac._aac_lc_frame_spec(mid, f)
            assert d["spec_q"] == spec
            assert d["band_cb"] == cb
            assert d["max_sfb"] == msfb
            for b in range(msfb):
                if cb[b] != aac.ZERO_HCB:
                    assert d["band_sf"][b] == sf[b]
            # dequant is integer-exact by construction
            assert np.array_equal(d["spec"], np.rint(d["spec"]))


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
    # short windows: flip window_sequence bits in a valid payload
    spec = [0] * 1024
    payload = bytearray(aac.encode_sce(spec, [100], [0], 1))
    # bits: 3 (SCE) + 4 (tag) + 8 (gain) + 1 (reserved) = 16, so
    # window_sequence occupies bits 16..17 = the top 2 bits of byte 2
    payload[2] |= 0xC0
    with pytest.raises(NotImplementedError, match="ONLY_LONG"):
        aac.decode_sce(bytes(payload))


def test_dequantize_cube_exact_and_float_path():
    spec = [0] * 8 + [0] * 1016
    spec[0], spec[1], spec[2] = 8, 27, 5  # 5 is not a cube
    out = aac.dequantize(spec, [104], 1)  # gain 2^1
    assert out[0] == 32.0 and out[1] == 162.0
    assert abs(out[2] - (5 ** (4 / 3)) * 2) < 1e-9
