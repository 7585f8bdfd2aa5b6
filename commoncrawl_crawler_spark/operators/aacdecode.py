"""AAC-LC individual_channel_stream codec (ISO/IEC 13818-7 syntax).

Completes the audio tier one layer below the raw_data_block element
census (`videobits.parse_raw_data_block_elements`): a full LC
single-channel-element decode chain --

  ADTS frame -> SCE -> ics_info (long windows) -> section_data ->
  scale_factor_data (DPCM from global_gain) -> spectral_data
  (quads/pairs, sign bits, book-11 escape sequences) -> inverse
  quantization |q|^(4/3) * 2^((sf-100)/4) -> 2048-point IMDCT,
  sine window, overlap-add

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

SF_OFFSET = 100  # 13818-7 9.3: gain = 2^(0.25 * (sf - SF_OFFSET))
ZERO_HCB = 0
ESC_HCB = 11
_SECT_ESC = 31  # long-window sect_len escape unit (5 bits)


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
) -> bytes:
    """One raw_data_block: SCE + END, byte-aligned.  `spec_q` is the
    1024-line quantized spectrum; `band_sf`/`band_cb` give the
    scalefactor and codebook per band (< max_sfb)."""
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
    # ics_info (LC, long windows)
    w.u(0, 1)  # ics_reserved_bit
    w.u(0, 2)  # window_sequence = ONLY_LONG_SEQUENCE
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
        dims, lav, signed = hcb_shape(cb)
        lo, hi = SWB_OFFSET_LONG[b], SWB_OFFSET_LONG[b + 1]
        for base in range(lo, hi, dims):
            tup = tuple(spec_q[base : base + dims])
            if signed:
                if any(abs(v) > lav for v in tup):
                    raise ValueError(f"value {tup} exceeds book {cb}")
                _write_code(w, ENC_BOOKS[cb], tup)
            else:
                mags = tuple(min(abs(v), 16) if cb == ESC_HCB
                             else abs(v) for v in tup)
                if any(
                    m > lav for m in mags
                ):
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
                            w.u((1 << n) - 1, n) if n else None
                            w.u(0, 1)
                            w.u(m - (1 << (n + 4)), n + 4)
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
    if r.u(2) != 0:
        raise NotImplementedError(
            "window_sequence != ONLY_LONG_SEQUENCE (short/start/stop "
            "windows not decoded)"
        )
    r.u(1)  # window_shape
    max_sfb = r.u(6)
    if max_sfb > NUM_SWB_LONG:
        raise ValueError(f"max_sfb {max_sfb} > {NUM_SWB_LONG}")
    if r.u(1):
        raise NotImplementedError("MPEG-2 AAC predictor not in LC")
    band_cb: list[int] = []
    while len(band_cb) < max_sfb:
        cb = r.u(4)
        run = 0
        while True:
            inc = r.u(5)
            run += inc
            if inc != _SECT_ESC:
                break
        if len(band_cb) + run > max_sfb:
            raise ValueError("section runs past max_sfb")
        band_cb.extend([cb] * run)
    band_sf = [SF_OFFSET] * max_sfb
    prev = global_gain
    for b in range(max_sfb):
        if band_cb[b] == ZERO_HCB:
            continue
        prev += _read_code(r, DEC_BOOKS["sf"])
        if not 0 <= prev <= 255:
            raise ValueError(f"scalefactor {prev} out of range")
        band_sf[b] = prev
    if r.u(1):
        raise NotImplementedError("pulse_data not decoded")
    if r.u(1):
        raise NotImplementedError("tns_data not decoded")
    if r.u(1):
        raise NotImplementedError("gain_control_data not in LC")
    spec_q = [0] * 1024
    for b in range(max_sfb):
        cb = band_cb[b]
        if cb == ZERO_HCB:
            continue
        dims, lav, signed = hcb_shape(cb)
        lo, hi = SWB_OFFSET_LONG[b], SWB_OFFSET_LONG[b + 1]
        for base in range(lo, hi, dims):
            tup = _read_code(r, DEC_BOOKS[cb])
            if signed:
                vals = list(tup)
            else:
                signs = [
                    (-1 if r.u(1) else 1) if m != 0 else 1 for m in tup
                ]
                mags = list(tup)
                if cb == ESC_HCB:
                    for i, m in enumerate(mags):
                        if m == 16:
                            n = 0
                            while r.u(1):
                                n += 1
                                if n > 24:
                                    raise ValueError(
                                        "runaway escape prefix"
                                    )
                            mags[i] = (1 << (n + 4)) + r.u(n + 4)
                vals = [s * m for s, m in zip(signs, mags)]
            spec_q[base : base + dims] = vals
    if r.u(3) != 7:
        raise ValueError("raw_data_block not terminated by END")
    return {
        "global_gain": global_gain,
        "max_sfb": max_sfb,
        "band_cb": band_cb,
        "band_sf": band_sf,
        "spec_q": spec_q,
    }


# --------------------------------------------------------------------
# Inverse quantization (13818-7 9.3) -- integer-exact where the
# quantized magnitude is a perfect cube and the gain exponent is
# integral, float64 otherwise
# --------------------------------------------------------------------

def dequantize(
    spec_q: list[int], band_sf: list[int], max_sfb: int
) -> np.ndarray:
    out = np.zeros(1024, dtype=np.float64)
    for b in range(max_sfb):
        e4 = band_sf[b] - SF_OFFSET  # gain = 2^(e4/4)
        lo, hi = SWB_OFFSET_LONG[b], SWB_OFFSET_LONG[b + 1]
        for i in range(lo, hi):
            q = spec_q[i]
            if q == 0:
                continue
            m = abs(q)
            cube = round(m ** (1.0 / 3.0))
            m43 = (
                float(cube**4)
                if cube**3 == m
                else float(m) ** (4.0 / 3.0)
            )
            gain = (
                float(1 << (e4 // 4)) if e4 % 4 == 0 and e4 >= 0
                else 2.0 ** (e4 / 4.0)
            )
            out[i] = (1 if q > 0 else -1) * m43 * gain
    return out


# --------------------------------------------------------------------
# Long-window TDAC filterbank (pytest-pinned by the perfect-
# reconstruction property, the same validation mp3layer3's IMDCT
# carries)
# --------------------------------------------------------------------

_N_LONG = 2048


def sine_window(n: int = _N_LONG) -> np.ndarray:
    return np.sin(np.pi / n * (np.arange(n) + 0.5))


def imdct_long(X: np.ndarray) -> np.ndarray:
    """N=2048 IMDCT: x[n] = (2/N) * sum_k X[k] cos(2pi/N (n + n0)
    (k + 1/2)), n0 = (N/2 + 1) / 2."""
    N = _N_LONG
    n0 = (N / 2 + 1) / 2
    n = np.arange(N)[:, None]
    k = np.arange(N // 2)[None, :]
    C = np.cos(2 * np.pi / N * (n + n0) * (k + 0.5))
    return (2.0 / N) * (C @ np.asarray(X, dtype=np.float64))


def mdct_long(x: np.ndarray) -> np.ndarray:
    """Forward transform, factor 2 per the spec convention -- the
    (2, 2/N) MDCT/IMDCT pair is what makes sine-windowed TDAC
    overlap-add reconstruct exactly."""
    N = _N_LONG
    n0 = (N / 2 + 1) / 2
    n = np.arange(N)[None, :]
    k = np.arange(N // 2)[:, None]
    C = np.cos(2 * np.pi / N * (n + n0) * (k + 0.5))
    return 2.0 * (C @ np.asarray(x, dtype=np.float64))


def synthesize_pcm(frames_spec: list[np.ndarray]) -> np.ndarray:
    """Windowed overlap-add across frames -> 1024 output samples per
    frame (first frame's left half overlaps silence)."""
    w = sine_window()
    overlap = np.zeros(1024)
    out: list[np.ndarray] = []
    for X in frames_spec:
        t = imdct_long(X) * w
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


def _aac_lc_blob(mid: int) -> bytes:
    n_frames = 2 + mid % 3
    return encode_aac_lc_stream(
        [_aac_lc_frame_spec(mid, f) for f in range(n_frames)]
    )


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
                    spec = d["spec"]
                    nz = np.flatnonzero(spec)
                    n_lines += len(nz)
                    n_esc += int(
                        sum(
                            1
                            for q in d["spec_q"]
                            if abs(q) >= 16
                        )
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
