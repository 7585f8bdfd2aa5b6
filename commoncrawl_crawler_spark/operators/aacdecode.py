"""AAC-LC individual_channel_stream codec (ISO/IEC 13818-7 syntax).

Completes the audio tier one layer below the raw_data_block element
census (`videobits.parse_raw_data_block_elements`): a full LC
single-channel-element decode chain --

  ADTS frame -> SCE -> ics_info (all four window sequences:
  ONLY_LONG / LONG_START / EIGHT_SHORT with 7-bit scalefactor
  grouping / LONG_STOP) -> section_data -> scale_factor_data (DPCM
  from global_gain, one chain across short-window groups) ->
  spectral_data (quads/pairs, sign bits, book-11 escape sequences,
  window-interleaved within short groups) -> inverse quantization
  |q|^(4/3) * 2^((sf-100)/4) -> TDAC filterbank (2048/256-point
  IMDCT, sine windows, START/STOP splicing, overlap-add)

WHAT IS SPEC-FAITHFUL here (13818-7 sections 6.3, 7, 8.3, 9.3):
every bit-field width and ordering in the syntax walk, the section
escape (31-unit lengths), the scalefactor DPCM chain seeded by
global_gain and skipped for ZERO_HCB bands, the codebook STRUCTURE
(dimensions / LAV / signedness per Table 7.1: books 1-2 signed
quads LAV 1, 3-4 unsigned quads LAV 2, 5-6 signed pairs LAV 4,
7-8 unsigned pairs LAV 7, 9-10 unsigned pairs LAV 12, 11 unsigned
pairs LAV 16 with escape), one sign bit per nonzero coefficient of
unsigned books, the escape sequence (N ones, a zero, then an
(N+4)-bit word, value 2^(N+4)+word), the 4/3-power dequantizer with
SF_OFFSET 100, and the long-window TDAC filterbank.

WHAT IS ENGINE-DEFINED: the Huffman CODEWORD BIT PATTERNS.  The
spec's codeword tables are empirically-designed constants that are
not derivable from first principles and are not reproducible here
with transcription confidence (unlike the Layer III Annex-B tables,
mp3tables.py, which are universally reprinted).  This module instead
CONSTRUCTS canonical Huffman codes over the exact spec alphabets
with a deterministic cost model (codes shorten as tuple magnitude
falls, the spec tables' design intent), validated complete at
import.  Consequence, stated plainly: streams produced by this
module's encoder decode bit-exactly through the full spec syntax;
externally-encoded AAC uses different bit patterns for the same
grammar, so the generic media router keeps sample decode behind its
existing named NotImplementedError and routes external AAC to the
framing/element census only.  Embedding the published tables swaps
one constant block and removes that boundary; nothing else changes.

Reference role: ParserMapper's content-processing lineage
(reference mapred/ec2/parser/ParserMapper.java:340) -- the corpus
scanner's per-document media feature extraction.
"""

from __future__ import annotations

import heapq
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .parseguard import guard
from .videobits import (
    _BitReader,
    _BitWriter,
    build_adts_frame,
    parse_adts_frames,
)

# --------------------------------------------------------------------
# Long-window scalefactor band layout (44.1/48 kHz, 1024 samples):
# 49 bands, widths multiples of 4, terminating at 1024.  Encoder,
# decoder, and the gate oracle all share this table, and the import
# check pins monotone 4-aligned offsets ending at 1024.
# --------------------------------------------------------------------
SWB_OFFSET_LONG = [
    0, 4, 8, 12, 16, 20, 24, 28, 32, 36, 40, 48, 56, 64, 72, 80, 88,
    96, 108, 120, 132, 144, 160, 176, 196, 216, 240, 264, 292, 320,
    352, 384, 416, 448, 480, 512, 544, 576, 608, 640, 672, 704, 736,
    768, 800, 832, 864, 896, 928, 1024,
]
NUM_SWB_LONG = len(SWB_OFFSET_LONG) - 1  # 49

if SWB_OFFSET_LONG[-1] != 1024 or any(
    b % 4 or a >= b
    for a, b in zip(SWB_OFFSET_LONG, SWB_OFFSET_LONG[1:])
):
    raise AssertionError("corrupt long-window band table")

# Short-window band layout (128 lines per window, 44.1/48 kHz):
# 14 bands, same provenance/validation posture as the long table.
SWB_OFFSET_SHORT = [
    0, 4, 8, 12, 16, 20, 28, 36, 44, 56, 68, 80, 96, 112, 128,
]
NUM_SWB_SHORT = len(SWB_OFFSET_SHORT) - 1  # 14

if SWB_OFFSET_SHORT[-1] != 128 or any(
    b % 4 or a >= b
    for a, b in zip(SWB_OFFSET_SHORT, SWB_OFFSET_SHORT[1:])
):
    raise AssertionError("corrupt short-window band table")

SF_OFFSET = 100  # 13818-7 9.3: gain = 2^(0.25 * (sf - SF_OFFSET))
ZERO_HCB = 0
ESC_HCB = 11
_SECT_ESC = 31  # long-window sect_len escape unit (5 bits)
_SECT_ESC_SHORT = 7  # short-window sect_len escape unit (3 bits)

ONLY_LONG = 0
LONG_START = 1
EIGHT_SHORT = 2
LONG_STOP = 3


# --------------------------------------------------------------------
# Canonical codebooks over the spec alphabets
# --------------------------------------------------------------------

def hcb_shape(cb: int) -> tuple[int, int, bool]:
    """(dims, LAV, signed) per 13818-7 Table 7.1."""
    shapes = {
        1: (4, 1, True), 2: (4, 1, True),
        3: (4, 2, False), 4: (4, 2, False),
        5: (2, 4, True), 6: (2, 4, True),
        7: (2, 7, False), 8: (2, 7, False),
        9: (2, 12, False), 10: (2, 12, False),
        11: (2, 16, False),
    }
    if cb not in shapes:
        raise ValueError(f"spectral codebook {cb} out of range")
    return shapes[cb]


def _alphabet(cb: int) -> list[tuple[int, ...]]:
    dims, lav, signed = hcb_shape(cb)
    lo = -lav if signed else 0
    syms: list[tuple[int, ...]] = [()]
    for _ in range(dims):
        syms = [s + (v,) for s in syms for v in range(lo, lav + 1)]
    return syms


def _canonical_huffman(
    symbols: list, costs: list[int], salt: int
) -> dict:
    """Deterministic Huffman code: weight falls polynomially with
    cost (so low-magnitude tuples get short codes), `salt` perturbs
    tie-breaks so sibling books (1 vs 2, ...) assign different
    codes.  Canonicalized (sorted by (length, symbol index)) so the
    code depends only on the computed lengths."""
    maxc = max(costs)
    n = len(symbols)
    heap = [
        ((maxc - c + 1) ** 3 + ((i * 2654435761 + salt) % 7), i, (i,))
        for i, c in enumerate(costs)
    ]
    heapq.heapify(heap)
    length = [0] * n
    while len(heap) > 1:
        w1, t1, m1 = heapq.heappop(heap)
        w2, t2, m2 = heapq.heappop(heap)
        for i in m1 + m2:
            length[i] += 1
        heapq.heappush(heap, (w1 + w2, min(t1, t2), m1 + m2))
    order = sorted(range(n), key=lambda i: (length[i], i))
    enc: dict = {}
    code = 0
    prev_len = length[order[0]]
    for i in order:
        code <<= length[i] - prev_len
        prev_len = length[i]
        enc[symbols[i]] = (length[i], code)
        code += 1
    # completeness: canonical assignment over Huffman lengths always
    # satisfies Kraft equality; check anyway (transcription guard)
    from fractions import Fraction

    if sum(Fraction(1, 1 << ln) for ln in length) != 1:
        raise AssertionError("codebook not a complete prefix code")
    return enc


def _build_books() -> tuple[dict, dict]:
    enc_books: dict = {}
    dec_books: dict = {}
    for cb in range(1, 12):
        syms = _alphabet(cb)
        costs = [sum(abs(v) for v in s) for s in syms]
        enc = _canonical_huffman(syms, costs, salt=cb)
        enc_books[cb] = enc
        dec_books[cb] = {lc: s for s, lc in enc.items()}
    sf_syms = list(range(-60, 61))
    sf_enc = _canonical_huffman(sf_syms, [abs(v) for v in sf_syms], 0)
    enc_books["sf"] = sf_enc
    dec_books["sf"] = {lc: s for s, lc in sf_enc.items()}
    return enc_books, dec_books


ENC_BOOKS, DEC_BOOKS = _build_books()


def _write_code(w: _BitWriter, book: dict, sym) -> None:
    ln, code = book[sym]
    w.u(code, ln)


def _read_code(r: _BitReader, book: dict):
    ln = 0
    code = 0
    while True:
        code = (code << 1) | r.u(1)
        ln += 1
        if (ln, code) in book:
            return book[(ln, code)]
        if ln > 40:
            raise ValueError("runaway spectral codeword")


# --------------------------------------------------------------------
# SCE syntax: encode
# --------------------------------------------------------------------

def encode_sce(
    spec_q: list[int],
    band_sf: list[int],
    band_cb: list[int],
    max_sfb: int,
    window_sequence: int = ONLY_LONG,
) -> bytes:
    """One raw_data_block: SCE + END, byte-aligned.  `spec_q` is the
    1024-line quantized spectrum; `band_sf`/`band_cb` give the
    scalefactor and codebook per band (< max_sfb).  LONG_START /
    LONG_STOP share the long spectral layout bit-for-bit (only the
    filterbank window differs); EIGHT_SHORT uses
    `encode_sce_short`."""
    if window_sequence not in (ONLY_LONG, LONG_START, LONG_STOP):
        raise ValueError("use encode_sce_short for EIGHT_SHORT")
    if max_sfb > NUM_SWB_LONG:
        raise ValueError(f"max_sfb {max_sfb} > {NUM_SWB_LONG}")
    w = _BitWriter()
    w.u(0, 3)  # id_syn_ele SCE
    w.u(0, 4)  # element_instance_tag
    # first transmitted scalefactor doubles as global_gain
    first_sf = next(
        (band_sf[b] for b in range(max_sfb) if band_cb[b] != ZERO_HCB),
        SF_OFFSET,
    )
    w.u(first_sf, 8)
    # ics_info (LC, long-spectrum windows)
    w.u(0, 1)  # ics_reserved_bit
    w.u(window_sequence, 2)
    w.u(0, 1)  # window_shape = sine
    w.u(max_sfb, 6)
    w.u(0, 1)  # predictor_data_present
    # section_data: runs of equal codebook
    b = 0
    while b < max_sfb:
        e = b
        while e < max_sfb and band_cb[e] == band_cb[b]:
            e += 1
        w.u(band_cb[b], 4)
        run = e - b
        while run >= _SECT_ESC:
            w.u(_SECT_ESC, 5)
            run -= _SECT_ESC
        w.u(run, 5)
        b = e
    # scale_factor_data: DPCM chain over transmitted bands
    prev = first_sf
    for b in range(max_sfb):
        if band_cb[b] == ZERO_HCB:
            continue
        delta = band_sf[b] - prev
        if not -60 <= delta <= 60:
            raise ValueError(f"scalefactor delta {delta} out of range")
        _write_code(w, ENC_BOOKS["sf"], delta)
        prev = band_sf[b]
    w.u(0, 1)  # pulse_data_present
    w.u(0, 1)  # tns_data_present
    w.u(0, 1)  # gain_control_data_present
    # spectral_data
    for b in range(max_sfb):
        cb = band_cb[b]
        if cb == ZERO_HCB:
            continue
        lo, hi = SWB_OFFSET_LONG[b], SWB_OFFSET_LONG[b + 1]
        _write_tuples(w, spec_q[lo:hi], cb)
    return _finish_rdb(w)


def _write_tuples(w: _BitWriter, vals: list, cb: int) -> None:
    """Spectral tuples of one band: codeword (+ sign bits and
    book-11 escape sequences for unsigned books)."""
    dims, lav, signed = hcb_shape(cb)
    for base in range(0, len(vals), dims):
        tup = tuple(vals[base : base + dims])
        if signed:
            if any(abs(v) > lav for v in tup):
                raise ValueError(f"value {tup} exceeds book {cb}")
            _write_code(w, ENC_BOOKS[cb], tup)
        else:
            mags = tuple(
                min(abs(v), 16) if cb == ESC_HCB else abs(v)
                for v in tup
            )
            if any(m > lav for m in mags):
                raise ValueError(f"value {tup} exceeds book {cb}")
            _write_code(w, ENC_BOOKS[cb], mags)
            for v in tup:
                if v != 0:
                    w.u(1 if v < 0 else 0, 1)
            if cb == ESC_HCB:
                for v in tup:
                    m = abs(v)
                    if m >= 16:
                        n = 0
                        while m >= (1 << (n + 5)):
                            n += 1
                        if n:
                            w.u((1 << n) - 1, n)
                        w.u(0, 1)
                        w.u(m - (1 << (n + 4)), n + 4)


def _finish_rdb(w: _BitWriter) -> bytes:
    w.u(7, 3)  # id_syn_ele END
    while len(w.bits) % 8:
        w.bits.append(0)
    out = bytearray()
    for i in range(0, len(w.bits), 8):
        byte = 0
        for bit in w.bits[i : i + 8]:
            byte = (byte << 1) | bit
        out.append(byte)
    return bytes(out)


def encode_sce_short(
    spec_q: list[list[int]],
    band_sf: list[list[int]],
    band_cb: list[list[int]],
    max_sfb: int,
    groups: list[int],
) -> bytes:
    """EIGHT_SHORT_SEQUENCE raw_data_block: `spec_q` is 8 windows x
    128 lines; `band_sf`/`band_cb` are per (group, band); `groups`
    are the window-group lengths (sum 8).  Syntax per 13818-7
    6.3.2/8.3.4: 4-bit max_sfb, 7-bit scale_factor_grouping, 3-bit
    sect_len (escape 7) per group, one scalefactor chain across
    groups, spectral tuples window-interleaved within each group's
    band."""
    if sum(groups) != 8 or any(g < 1 for g in groups):
        raise ValueError(f"bad window grouping {groups}")
    if max_sfb > NUM_SWB_SHORT:
        raise ValueError(f"max_sfb {max_sfb} > {NUM_SWB_SHORT}")
    ng = len(groups)
    w = _BitWriter()
    w.u(0, 3)  # SCE
    w.u(0, 4)
    first_sf = next(
        (
            band_sf[g][b]
            for g in range(ng)
            for b in range(max_sfb)
            if band_cb[g][b] != ZERO_HCB
        ),
        SF_OFFSET,
    )
    w.u(first_sf, 8)
    w.u(0, 1)  # ics_reserved_bit
    w.u(EIGHT_SHORT, 2)
    w.u(0, 1)  # window_shape
    w.u(max_sfb, 4)
    # scale_factor_grouping: bit w-1 set = window w grouped with w-1
    grouping = 0
    win = 0
    for g in groups:
        for j in range(g):
            if win > 0:
                grouping = (grouping << 1) | (1 if j > 0 else 0)
            win += 1
    w.u(grouping, 7)
    # section_data per group (3-bit sect_len, escape 7)
    for g in range(ng):
        b = 0
        while b < max_sfb:
            e = b
            while e < max_sfb and band_cb[g][e] == band_cb[g][b]:
                e += 1
            w.u(band_cb[g][b], 4)
            run = e - b
            while run >= _SECT_ESC_SHORT:
                w.u(_SECT_ESC_SHORT, 3)
                run -= _SECT_ESC_SHORT
            w.u(run, 3)
            b = e
    # one DPCM scalefactor chain across groups
    prev = first_sf
    for g in range(ng):
        for b in range(max_sfb):
            if band_cb[g][b] == ZERO_HCB:
                continue
            delta = band_sf[g][b] - prev
            if not -60 <= delta <= 60:
                raise ValueError(f"scalefactor delta {delta}")
            _write_code(w, ENC_BOOKS["sf"], delta)
            prev = band_sf[g][b]
    w.u(0, 1)  # pulse_data_present (forbidden for short anyway)
    w.u(0, 1)  # tns_data_present
    w.u(0, 1)  # gain_control_data_present
    # spectral_data: group-major, band-major, window-interleaved
    win0 = 0
    for g, glen in enumerate(groups):
        for b in range(max_sfb):
            cb = band_cb[g][b]
            if cb == ZERO_HCB:
                continue
            lo, hi = SWB_OFFSET_SHORT[b], SWB_OFFSET_SHORT[b + 1]
            for j in range(glen):
                _write_tuples(w, spec_q[win0 + j][lo:hi], cb)
        win0 += glen
    return _finish_rdb(w)


# --------------------------------------------------------------------
# SCE syntax: decode
# --------------------------------------------------------------------

@guard("aac-lc")
def decode_sce(payload: bytes) -> dict:
    """Decode one raw_data_block (SCE + END) produced by
    `encode_sce`: full 13818-7 LC syntax walk.  Returns quantized
    spectrum, per-band scalefactors/codebooks, global gain."""
    r = _BitReader(payload)
    if r.u(3) != 0:
        raise ValueError("raw_data_block does not start with SCE")
    r.u(4)  # element_instance_tag
    global_gain = r.u(8)
    if r.u(1):
        raise ValueError("ics_reserved_bit set")
    window_sequence = r.u(2)
    r.u(1)  # window_shape
    if window_sequence == EIGHT_SHORT:
        return _decode_sce_short(r, global_gain)
    max_sfb = r.u(6)
    if max_sfb > NUM_SWB_LONG:
        raise ValueError(f"max_sfb {max_sfb} > {NUM_SWB_LONG}")
    if r.u(1):
        raise NotImplementedError("MPEG-2 AAC predictor not in LC")
    band_cb = _read_sections(r, max_sfb, _SECT_ESC, 5)
    band_sf = [SF_OFFSET] * max_sfb
    prev = global_gain
    for b in range(max_sfb):
        if band_cb[b] == ZERO_HCB:
            continue
        prev = _next_sf(r, prev)
        band_sf[b] = prev
    _check_tool_flags(r)
    spec_q = [0] * 1024
    for b in range(max_sfb):
        cb = band_cb[b]
        if cb == ZERO_HCB:
            continue
        lo, hi = SWB_OFFSET_LONG[b], SWB_OFFSET_LONG[b + 1]
        spec_q[lo:hi] = _read_tuples(r, hi - lo, cb)
    if r.u(3) != 7:
        raise ValueError("raw_data_block not terminated by END")
    return {
        "window_sequence": window_sequence,
        "global_gain": global_gain,
        "max_sfb": max_sfb,
        "band_cb": band_cb,
        "band_sf": band_sf,
        "spec_q": spec_q,
    }


def _read_sections(
    r: _BitReader, max_sfb: int, esc: int, bits: int
) -> list[int]:
    band_cb: list[int] = []
    while len(band_cb) < max_sfb:
        cb = r.u(4)
        run = 0
        while True:
            inc = r.u(bits)
            run += inc
            if inc != esc:
                break
        if len(band_cb) + run > max_sfb:
            raise ValueError("section runs past max_sfb")
        band_cb.extend([cb] * run)
    return band_cb


def _next_sf(r: _BitReader, prev: int) -> int:
    sf = prev + _read_code(r, DEC_BOOKS["sf"])
    if not 0 <= sf <= 255:
        raise ValueError(f"scalefactor {sf} out of range")
    return sf


def _check_tool_flags(r: _BitReader) -> None:
    if r.u(1):
        raise NotImplementedError("pulse_data not decoded")
    if r.u(1):
        raise NotImplementedError("tns_data not decoded")
    if r.u(1):
        raise NotImplementedError("gain_control_data not in LC")


def _read_tuples(r: _BitReader, n: int, cb: int) -> list[int]:
    """Inverse of `_write_tuples` over an n-line band."""
    dims, lav, signed = hcb_shape(cb)
    vals: list[int] = []
    for _ in range(0, n, dims):
        tup = _read_code(r, DEC_BOOKS[cb])
        if signed:
            vals.extend(tup)
            continue
        signs = [(-1 if r.u(1) else 1) if m != 0 else 1 for m in tup]
        mags = list(tup)
        if cb == ESC_HCB:
            for i, m in enumerate(mags):
                if m == 16:
                    esc_n = 0
                    while r.u(1):
                        esc_n += 1
                        if esc_n > 24:
                            raise ValueError("runaway escape prefix")
                    mags[i] = (1 << (esc_n + 4)) + r.u(esc_n + 4)
        vals.extend(s * m for s, m in zip(signs, mags))
    return vals


def _decode_sce_short(r: _BitReader, global_gain: int) -> dict:
    """EIGHT_SHORT_SEQUENCE continuation of the ics_info walk."""
    max_sfb = r.u(4)
    if max_sfb > NUM_SWB_SHORT:
        raise ValueError(f"max_sfb {max_sfb} > {NUM_SWB_SHORT}")
    grouping = r.u(7)
    groups: list[int] = [1]
    for i in range(7):
        if (grouping >> (6 - i)) & 1:
            groups[-1] += 1
        else:
            groups.append(1)
    ng = len(groups)
    band_cb = [
        _read_sections(r, max_sfb, _SECT_ESC_SHORT, 3)
        for _ in range(ng)
    ]
    band_sf = [[SF_OFFSET] * max_sfb for _ in range(ng)]
    prev = global_gain
    for g in range(ng):
        for b in range(max_sfb):
            if band_cb[g][b] == ZERO_HCB:
                continue
            prev = _next_sf(r, prev)
            band_sf[g][b] = prev
    _check_tool_flags(r)
    spec_q = [[0] * 128 for _ in range(8)]
    win0 = 0
    for g, glen in enumerate(groups):
        for b in range(max_sfb):
            cb = band_cb[g][b]
            if cb == ZERO_HCB:
                continue
            lo, hi = SWB_OFFSET_SHORT[b], SWB_OFFSET_SHORT[b + 1]
            for j in range(glen):
                spec_q[win0 + j][lo:hi] = _read_tuples(
                    r, hi - lo, cb
                )
        win0 += glen
    if r.u(3) != 7:
        raise ValueError("raw_data_block not terminated by END")
    return {
        "window_sequence": EIGHT_SHORT,
        "global_gain": global_gain,
        "max_sfb": max_sfb,
        "groups": groups,
        "band_cb": band_cb,
        "band_sf": band_sf,
        "spec_q_short": spec_q,
    }


# --------------------------------------------------------------------
# Inverse quantization (13818-7 9.3) -- integer-exact where the
# quantized magnitude is a perfect cube and the gain exponent is
# integral, float64 otherwise
# --------------------------------------------------------------------

def _iq(q: int, e4: int) -> float:
    m = abs(q)
    cube = round(m ** (1.0 / 3.0))
    m43 = (
        float(cube**4) if cube**3 == m else float(m) ** (4.0 / 3.0)
    )
    gain = (
        float(1 << (e4 // 4)) if e4 % 4 == 0 and e4 >= 0
        else 2.0 ** (e4 / 4.0)
    )
    return (1 if q > 0 else -1) * m43 * gain


def dequantize(
    spec_q: list[int], band_sf: list[int], max_sfb: int
) -> np.ndarray:
    out = np.zeros(1024, dtype=np.float64)
    for b in range(max_sfb):
        e4 = band_sf[b] - SF_OFFSET  # gain = 2^(e4/4)
        lo, hi = SWB_OFFSET_LONG[b], SWB_OFFSET_LONG[b + 1]
        for i in range(lo, hi):
            if spec_q[i]:
                out[i] = _iq(spec_q[i], e4)
    return out


def dequantize_short(
    spec_q: list[list[int]],
    band_sf: list[list[int]],
    groups: list[int],
    max_sfb: int,
) -> np.ndarray:
    """8x128 spectra; each group's scalefactor applies to every
    window in the group (13818-7 8.3.4)."""
    out = np.zeros((8, 128), dtype=np.float64)
    win0 = 0
    for g, glen in enumerate(groups):
        for b in range(max_sfb):
            e4 = band_sf[g][b] - SF_OFFSET
            lo, hi = SWB_OFFSET_SHORT[b], SWB_OFFSET_SHORT[b + 1]
            for j in range(glen):
                for i in range(lo, hi):
                    q = spec_q[win0 + j][i]
                    if q:
                        out[win0 + j][i] = _iq(q, e4)
        win0 += glen
    return out


# --------------------------------------------------------------------
# Long-window TDAC filterbank (pytest-pinned by the perfect-
# reconstruction property, the same validation mp3layer3's IMDCT
# carries)
# --------------------------------------------------------------------

_N_LONG = 2048
_N_SHORT = 256


def sine_window(n: int = _N_LONG) -> np.ndarray:
    return np.sin(np.pi / n * (np.arange(n) + 0.5))


def _imdct(X: np.ndarray, N: int) -> np.ndarray:
    """x[n] = (2/N) * sum_k X[k] cos(2pi/N (n + n0)(k + 1/2)),
    n0 = (N/2 + 1) / 2."""
    n0 = (N / 2 + 1) / 2
    n = np.arange(N)[:, None]
    k = np.arange(N // 2)[None, :]
    C = np.cos(2 * np.pi / N * (n + n0) * (k + 0.5))
    return (2.0 / N) * (C @ np.asarray(X, dtype=np.float64))


def _mdct(x: np.ndarray, N: int) -> np.ndarray:
    """Forward transform, factor 2 per the spec convention -- the
    (2, 2/N) MDCT/IMDCT pair is what makes sine-windowed TDAC
    overlap-add reconstruct exactly."""
    n0 = (N / 2 + 1) / 2
    n = np.arange(N)[None, :]
    k = np.arange(N // 2)[:, None]
    C = np.cos(2 * np.pi / N * (n + n0) * (k + 0.5))
    return 2.0 * (C @ np.asarray(x, dtype=np.float64))


def imdct_long(X: np.ndarray) -> np.ndarray:
    return _imdct(X, _N_LONG)


def mdct_long(x: np.ndarray) -> np.ndarray:
    return _mdct(x, _N_LONG)


def _window_for(ws: int) -> np.ndarray:
    """Synthesis window of a 2048-sample frame for the long-spectrum
    sequences (13818-7 8.3.3): START/STOP splice the short sine
    half so the frame's edge matches its EIGHT_SHORT neighbour."""
    wl = sine_window(_N_LONG)
    wsh = sine_window(_N_SHORT)
    if ws == ONLY_LONG:
        return wl
    if ws == LONG_START:
        return np.concatenate(
            [wl[:1024], np.ones(448), wsh[128:], np.zeros(448)]
        )
    if ws == LONG_STOP:
        return np.concatenate(
            [np.zeros(448), wsh[:128], np.ones(448), wl[1024:]]
        )
    raise ValueError(f"no long-frame window for sequence {ws}")


def _short_frame_time(spec8: np.ndarray) -> np.ndarray:
    """EIGHT_SHORT frame contribution: 8 windowed 256-point IMDCTs
    overlap-added at offsets 448 + 128*j inside the 2048 frame."""
    wsh = sine_window(_N_SHORT)
    t = np.zeros(_N_LONG)
    for j in range(8):
        t[448 + 128 * j : 448 + 128 * j + 256] += (
            _imdct(np.asarray(spec8)[j], _N_SHORT) * wsh
        )
    return t


def synthesize_pcm(frames_spec: list) -> np.ndarray:
    """Windowed overlap-add across frames -> 1024 output samples per
    frame (first frame's left half overlaps silence).  Entries are
    either a 1024-line array (ONLY_LONG) or a (window_sequence,
    spectrum) pair, where EIGHT_SHORT takes an 8x128 matrix."""
    overlap = np.zeros(1024)
    out: list[np.ndarray] = []
    for entry in frames_spec:
        if isinstance(entry, tuple):
            ws, X = entry
        else:
            ws, X = ONLY_LONG, entry
        if ws == EIGHT_SHORT:
            t = _short_frame_time(X)
        else:
            t = imdct_long(X) * _window_for(ws)
        out.append(t[:1024] + overlap)
        overlap = t[1024:]
    return np.concatenate(out) if out else np.zeros(0)


# --------------------------------------------------------------------
# Stream level: ADTS wrap + decode
# --------------------------------------------------------------------

def encode_aac_lc_stream(
    frames: list[tuple[list[int], list[int], list[int], int]],
    sr_index: int = 4,
) -> bytes:
    """Each frame is (spec_q, band_sf, band_cb, max_sfb)."""
    out = bytearray()
    for spec_q, band_sf, band_cb, max_sfb in frames:
        payload = encode_sce(spec_q, band_sf, band_cb, max_sfb)
        out += build_adts_frame(payload, 1, sr_index, 1)
    return bytes(out)


@guard("aac-lc")
def decode_aac_lc_stream(blob: bytes) -> list[dict]:
    """ADTS walk + per-frame SCE decode + dequantized spectrum.
    Valid for streams carrying this module's codebooks (see module
    docstring); the generic media router does NOT dispatch external
    AAC here."""
    frames = parse_adts_frames(blob)
    out = []
    for fr in frames:
        payload = blob[fr["offset"] + 7 : fr["offset"] + fr["length"]]
        d = decode_sce(payload)
        if d["window_sequence"] == EIGHT_SHORT:
            d["spec"] = dequantize_short(
                d["spec_q_short"], d["band_sf"], d["groups"],
                d["max_sfb"],
            )
        else:
            d["spec"] = dequantize(
                d["spec_q"], d["band_sf"], d["max_sfb"]
            )
        out.append(d)
    return out


# --------------------------------------------------------------------
# Gate: synthesize + decode stats (closed-form content so the DuckDB
# oracle replays the decode arithmetic from doc_id alone)
# --------------------------------------------------------------------

_Q43 = [0, 1, 16, 81]  # 4/3 powers of the cube magnitudes 0,1,8,27


def _aac_lc_frame_spec(
    mid: int, f: int
) -> tuple[list[int], list[int], list[int], int]:
    max_sfb = 8 + mid % 3
    spec_q = [0] * 1024
    band_sf = [SF_OFFSET] * max_sfb
    band_cb = [ZERO_HCB] * max_sfb
    for b in range(max_sfb):
        m = (mid + f + b) % 4
        k = (mid + 2 * f + b) % 4
        band_sf[b] = SF_OFFSET + 4 * k
        if m == 0:
            continue
        qmag = [0, 1, 8, 27][m]
        if m == 1:
            band_cb[b] = 1 + (mid + b) % 4
        elif m == 2:
            band_cb[b] = 9 + (mid + b) % 2
        else:
            band_cb[b] = ESC_HCB
        lo, hi = SWB_OFFSET_LONG[b], SWB_OFFSET_LONG[b + 1]
        line = lo + (mid + f + b) % (hi - lo)
        sign = -1 if (mid + 2 * f + 3 * b) % 2 else 1
        spec_q[line] = sign * qmag
    return spec_q, band_sf, band_cb, max_sfb


_SHORT_GROUPINGS = [[1] * 8, [2, 2, 4], [4, 4], [8]]


def _aac_lc_short_frame(
    mid: int,
) -> tuple[list[list[int]], list[list[int]], list[list[int]], int,
           list[int]]:
    groups = _SHORT_GROUPINGS[mid % 4]
    ng = len(groups)
    msfb = 4 + mid % 3
    spec = [[0] * 128 for _ in range(8)]
    sfs = [[SF_OFFSET] * msfb for _ in range(ng)]
    cbs = [[ZERO_HCB] * msfb for _ in range(ng)]
    win0 = 0
    for g, glen in enumerate(groups):
        for b in range(msfb):
            m = (mid + g + b) % 4
            k = (mid + 2 * g + b) % 4
            sfs[g][b] = SF_OFFSET + 4 * k
            if m == 0:
                continue
            qmag = [0, 1, 8, 27][m]
            if m == 1:
                cbs[g][b] = 1 + (mid + b) % 4
            elif m == 2:
                cbs[g][b] = 9 + (mid + b) % 2
            else:
                cbs[g][b] = ESC_HCB
            lo, hi = SWB_OFFSET_SHORT[b], SWB_OFFSET_SHORT[b + 1]
            for j in range(glen):
                line = lo + (mid + g + b + j) % (hi - lo)
                sign = -1 if (mid + g + b + j) % 2 else 1
                spec[win0 + j][line] = sign * qmag
        win0 += glen
    return spec, sfs, cbs, msfb, groups


def _aac_lc_blob(mid: int) -> bytes:
    """2 + mid%3 long frames, then one EIGHT_SHORT frame -- the
    stream crosses the window-sequence switch every file."""
    n_long = 2 + mid % 3
    out = bytearray(
        encode_aac_lc_stream(
            [_aac_lc_frame_spec(mid, f) for f in range(n_long)]
        )
    )
    spec, sfs, cbs, msfb, groups = _aac_lc_short_frame(mid)
    out += build_adts_frame(
        encode_sce_short(spec, sfs, cbs, msfb, groups), 1, 4, 1
    )
    return bytes(out)


def synthesize_aac_lc(documents: DataFrame) -> DataFrame:
    from .multimodal import _synthesize_media

    return _synthesize_media(documents, _aac_lc_blob)


AAC_LC_STATS = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("max_sfb", IntegerType()),
        StructField("n_lines", IntegerType()),
        StructField("n_escapes", IntegerType()),
        StructField("sum_spec", LongType()),
        StructField("sum_abs", LongType()),
        StructField("max_abs", LongType()),
    ]
)


def aac_lc_decode_stats(media: DataFrame) -> DataFrame:
    """Per-file census of the DECODED spectra: every value passes
    through the full syntax walk + Huffman decode + escape decode +
    dequantizer; the synthesized content keeps dequant integer-exact
    (cube magnitudes, 4-aligned scalefactors), so the stats are
    BIGINT and the DuckDB oracle replays them closed-form."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in AAC_LC_STATS.fields}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                frames = decode_aac_lc_stream(bytes(blob))
                n_lines = n_esc = 0
                s_spec = s_abs = max_abs = 0
                msfb = 0
                for d in frames:
                    msfb = d["max_sfb"]
                    spec = np.asarray(d["spec"]).ravel()
                    nz = np.flatnonzero(spec)
                    n_lines += len(nz)
                    qflat = (
                        [q for w in d["spec_q_short"] for q in w]
                        if d["window_sequence"] == EIGHT_SHORT
                        else d["spec_q"]
                    )
                    n_esc += int(
                        sum(1 for q in qflat if abs(q) >= 16)
                    )
                    ints = np.rint(spec[nz]).astype(np.int64)
                    s_spec += int(ints.sum())
                    s_abs += int(np.abs(ints).sum())
                    if len(ints):
                        max_abs = max(
                            max_abs, int(np.abs(ints).max())
                        )
                rows["media_id"].append(mid)
                rows["n_frames"].append(len(frames))
                rows["max_sfb"].append(msfb)
                rows["n_lines"].append(n_lines)
                rows["n_escapes"].append(n_esc)
                rows["sum_spec"].append(s_spec)
                rows["sum_abs"].append(s_abs)
                rows["max_abs"].append(max_abs)
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _stats, AAC_LC_STATS
    )
