"""MPEG-1 Layer III (MP3) sample decode -- ISO 11172-3 2.4.3.4.

Completes the Layer III chain whose outer layers already exist in
this package: framing walk + side info (`operators/container.py`)
and the polyphase synthesis bank (`operators/mpegsynth.py`).  This
module adds the middle: scalefactor read (2.4.2.7 slen pairs +
scfsi sharing), Huffman decode of the count1 region, requantization
(2.4.3.4.7.1), alias reduction (2.4.3.4.10.1 butterflies), the
36-point IMDCT with the sine hybrid window (2.4.3.4.10.3, long
blocks), overlap-add, and frequency inversion -- feeding the
existing fixed-point polyphase bank to PCM.

HUFFMAN: the count1 quadruple tables are carried in full -- table A
is embedded and VERIFIED structurally (a complete prefix code: Kraft
sum exactly 1, trie insertion proves prefix-freeness), table B is
the spec's linear 4-bit code (hcod = 15 - v).  The big-value PAIR
tables (Annex B.7, ids 1-31 with the 16/24 ESC families and their
linbits) live in `mp3tables.py` under the same structural proof,
so big_values > 0 now decodes: region split by region0/1_count over
the Table B.8 band boundaries, per-region table_select, ESC + linbits
escape values, sign bits.  The IMDCT/window chain is property-tested
(Princen-Bradley TDAC identity against a closed-form forward MDCT).

EXACTNESS CONTRACT (the decode_layer1/layer2 discipline carried one
layer further): the gate path is exact int64 end-to-end.  Requantized
spectral values are CUBES times powers of two (m = k^3 makes the 4/3
power exactly k^4 -- the synthesizer emits magnitudes {0,1,8,27},
pins global_gain = 210 mod 4 and even scalefactors so exponents are
integers; arbitrary foreign magnitudes take the documented float
fallback, micro-rounded), quantized to micro ints;
alias butterflies and the fused IMDCT-window matrix are Q14 integer
literals applied with FLOOR division; overlap-add and frequency
inversion are integer ops; the polyphase is mpegsynth's Q28 integer
bank.  Overflow headroom: |x_micro| < 2^19 (exponent <= -2 enforced
by the synthesizer), IMDCT sums 18 terms * 2^14 -> |subband micro| <
2^23, within mpegsynth's documented 512-term int64 budget.

At 100 TB: one Arrow-batched mapInPandas kernel per file; payloads
never shuffle; per-file cost is a few small int64 matmuls.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .container import (
    _BitReaderMSB,
    _BitWriterMSB,
    _BITRATE_V1,
    _SAMPLE_RATE_V1,
    encode_mp3_sideinfo_mono,
    parse_mp3_sideinfo_mono,
    parse_mpeg_audio_frames,
)
from .mp3tables import (
    FORBIDDEN_TABLES,
    LINBITS,
    decode_tree,
    table_codes,
)
from .mpegsynth import LAYER1_PCM_STATS, synthesize_granules_q
from .multimodal import _synthesize_media

from .parseguard import guard

# ---------------------------------------------------------------
# tables (ISO 11172-3)
# ---------------------------------------------------------------

# 2.4.2.7: scalefac_compress -> (slen1, slen2)
SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]

# Table B.8 long-block scalefactor band boundaries, all three MPEG-1
# rates (22 boundaries delimit sfb 0..20 plus the unscaled top region)
SFB_LONG_44100 = [
    0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
    162, 196, 238, 288, 342, 418, 576,
]
SFB_LONG_48000 = [
    0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
    156, 190, 230, 276, 330, 384, 576,
]
SFB_LONG_32000 = [
    0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
    194, 240, 296, 364, 448, 550, 576,
]
_SFB_LONG = {
    44100: SFB_LONG_44100,
    48000: SFB_LONG_48000,
    32000: SFB_LONG_32000,
}

# Table B.8 short-block boundaries (per 192-line window), same rates
SFB_SHORT_44100 = [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136,
                   192]
SFB_SHORT_48000 = [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126,
                   192]
SFB_SHORT_32000 = [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180,
                   192]
_SFB_SHORT = {
    44100: SFB_SHORT_44100,
    48000: SFB_SHORT_48000,
    32000: SFB_SHORT_32000,
}

# Table B.6 preemphasis
PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3,
          2, 0]

# count1 region quadruple Huffman tables (Annex B.7).  Table A:
# (hlen, hcod) per quadruple index (v<<3 | w<<2 | x<<1 | y); verified
# complete + prefix-free in tests.  Table B is linear: 4 bits,
# hcod = 15 - idx.
COUNT1_A_LEN = [1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6]
COUNT1_A_COD = [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1]

# alias-reduction coefficients (2.4.3.4.10.1): ci -> cs, ca
ALIAS_CI = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
            -0.0037]
CS_Q14 = [
    round((1.0 / math.sqrt(1.0 + c * c)) * (1 << 14)) for c in ALIAS_CI
]
CA_Q14 = [
    round((c / math.sqrt(1.0 + c * c)) * (1 << 14)) for c in ALIAS_CI
]


def long_block_window(block_type: int) -> np.ndarray:
    """2.4.3.4.10.3 window shapes over 36 samples: block_type 0
    (normal sine), 1 (start: sine head, flat, short-sine decay,
    zeros), 3 (stop: zeros, short-sine attack, flat, sine tail)."""
    n = np.arange(36)
    sine = np.sin(np.pi / 36.0 * (n + 0.5))
    if block_type == 0:
        return sine
    short = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))
    w = np.zeros(36)
    if block_type == 1:
        w[:18] = sine[:18]
        w[18:24] = 1.0
        w[24:30] = short[6:]
    elif block_type == 3:
        w[6:12] = short[:6]
        w[12:18] = 1.0
        w[18:] = sine[18:]
    else:
        raise ValueError("long window for block_type 0/1/3 only")
    return w


def _imdct36_window_q14(block_type: int = 0) -> np.ndarray:
    """Fused IMDCT-36 x window matrix (2.4.3.4.10.3), Q14 integers:
    W[n][i] = round(cos(pi/72 (2n+1+18)(2i+1)) * win_bt[n] * 2^14)."""
    win = long_block_window(block_type)
    w = np.zeros((36, 18), dtype=np.int64)
    for n in range(36):
        for i in range(18):
            c = math.cos(
                math.pi / 72.0 * (2 * n + 1 + 18) * (2 * i + 1)
            )
            w[n, i] = round(c * win[n] * (1 << 14))
    return w


def _imdct12_window_q14() -> np.ndarray:
    """Fused IMDCT-12 x short-sine-window matrix (block_type 2),
    Q14: W[n][k] = round(cos(pi/24 (2n+1+6)(2k+1))
                   * sin(pi/12 (n+1/2)) * 2^14)."""
    w = np.zeros((12, 6), dtype=np.int64)
    for n in range(12):
        win = math.sin(math.pi / 12.0 * (n + 0.5))
        for k in range(6):
            c = math.cos(math.pi / 24.0 * (2 * n + 1 + 6) * (2 * k + 1))
            w[n, k] = round(c * win * (1 << 14))
    return w


IMDCT_WIN_Q14 = _imdct36_window_q14(0)
IMDCT_WIN_Q14_START = _imdct36_window_q14(1)
IMDCT_WIN_Q14_STOP = _imdct36_window_q14(3)
IMDCT12_WIN_Q14 = _imdct12_window_q14()


def imdct36_float(x: np.ndarray, block_type: int = 0) -> np.ndarray:
    """Float reference IMDCT-36 + block-type window (the structural
    form the Q14 matrices are generated from)."""
    n = np.arange(36)
    i = np.arange(18)
    c = np.cos(
        np.pi / 72.0 * np.outer(2 * n + 19, 2 * i + 1)
    )
    return (c @ x) * long_block_window(block_type)


def imdct12_float(x: np.ndarray) -> np.ndarray:
    """Float reference IMDCT-12 + short sine window (one of the
    three short-block windows)."""
    n = np.arange(12)
    k = np.arange(6)
    c = np.cos(np.pi / 24.0 * np.outer(2 * n + 7, 2 * k + 1))
    win = np.sin(np.pi / 12.0 * (n + 0.5))
    return (c @ x) * win


def mdct6_float(block: np.ndarray) -> np.ndarray:
    """Forward windowed MDCT twin of imdct12_float (12 time samples
    -> 6 coefficients), for the short-window TDAC property test."""
    n = np.arange(12)
    k = np.arange(6)
    win = np.sin(np.pi / 12.0 * (n + 0.5))
    c = np.cos(np.pi / 24.0 * np.outer(2 * n + 7, 2 * k + 1))
    return (block * win) @ c


def mdct18_float(block: np.ndarray) -> np.ndarray:
    """Forward windowed MDCT (36 time samples -> 18 coefficients),
    the analysis twin used by the TDAC property test:
    X[i] = sum_n z[n] win[n] cos(pi/72 (2n+1+18)(2i+1))."""
    n = np.arange(36)
    i = np.arange(18)
    win = np.sin(np.pi / 36.0 * (n + 0.5))
    c = np.cos(np.pi / 72.0 * np.outer(2 * n + 19, 2 * i + 1))
    return (block * win) @ c


def _count1_decode_tree(table_a: bool) -> dict:
    """Binary trie for the selected count1 table; raises on any
    prefix collision, so building it PROVES the code is valid."""
    if table_a:
        pairs = list(zip(COUNT1_A_LEN, COUNT1_A_COD))
    else:
        pairs = [(4, 15 - v) for v in range(16)]
    tree: dict = {}
    for v, (ln, code) in enumerate(pairs):
        node = tree
        for b in format(code, f"0{ln}b"):
            if "leaf" in node:
                raise ValueError(f"prefix collision at value {v}")
            node = node.setdefault(b, {})
        if node:
            raise ValueError(f"code for {v} is a prefix of another")
        node["leaf"] = v
    return tree


_TREES = {True: _count1_decode_tree(True),
          False: _count1_decode_tree(False)}

N_SFB_LONG = 21  # transmitted long-block scalefactors (sfb 0..20)
_SCFSI_GROUPS = [(0, 6), (6, 11), (11, 16), (16, 21)]


# ---------------------------------------------------------------
# encoder (synthesizer side)
# ---------------------------------------------------------------


def _write_bigvalue(bw: "_BitWriterMSB", tid: int, v: int,
                    neg: int) -> None:
    """linbits escape + sign for ONE big value (code word is written
    by the caller, once per pair)."""
    lb = LINBITS[tid]
    if lb and v >= 15:
        bw.write(v - 15, lb)
    if v:
        bw.write(1 if neg else 0, 1)


def _render_main_data(
    granule_specs: list[dict], scfsi: int
) -> tuple[list[dict], bytes]:
    """Scalefactor + big-value + count1 Huffman bits for one frame's
    two granules -> (side-info granule dicts with exact
    part2_3_length, byte-aligned main-data bytes)."""
    bw = _BitWriterMSB()
    si = []
    for g_i, g in enumerate(granule_specs):
        bits_before = len(bw.bits)
        ws = g.get("window_switching", 0)
        bt = g.get("block_type", 0) if ws else 0
        mixed = g.get("mixed_block", 0) if ws else 0
        short = ws and bt == 2
        slen1, slen2 = SLEN1[g["scalefac_compress"]], \
            SLEN2[g["scalefac_compress"]]
        if short:
            if g_i == 1 and scfsi != 0:
                raise ValueError(
                    "scfsi sharing into a short-block granule is "
                    "invalid"
                )
            sf_s = g["scalefacs_short"]  # [sfb][window], sfb 0..11
            if mixed:
                for sfb in range(8):
                    bw.write(g["scalefacs"][sfb], slen1)
            for sfb in range(3 if mixed else 0, 12):
                for w in range(3):
                    bw.write(sf_s[sfb][w],
                             slen1 if sfb < 6 else slen2)
        else:
            for sfb in range(N_SFB_LONG):
                if g_i == 1 and any(
                    (scfsi >> (3 - grp)) & 1 and lo <= sfb < hi
                    for grp, (lo, hi) in enumerate(_SCFSI_GROUPS)
                ):
                    continue  # shared with granule 0, not transmitted
                bw.write(g["scalefacs"][sfb],
                         slen1 if sfb < 11 else slen2)
        # big-value pairs (2.4.3.4.6): pairs are (x, y, neg_x, neg_y)
        # raw magnitudes; the REGION table is chosen by line position
        # against the Table B.8 bounds, mirroring the decoder; with
        # window switching the boundaries are implicit
        bigs = g.get("bigs", [])
        tsel = g.get("table_select", [0, 0, 0])
        bounds = g.get("bounds", SFB_LONG_44100)
        if ws:
            r1 = 36 if (short and not mixed) else bounds[8]
            r2 = 576
        else:
            r1 = bounds[min(g.get("region0_count", 0) + 1,
                            len(bounds) - 1)]
            r2 = bounds[min(g.get("region0_count", 0)
                            + g.get("region1_count", 0) + 2,
                            len(bounds) - 1)]
        for p, (x, y, nx, ny) in enumerate(bigs):
            line = 2 * p
            tid = tsel[0 if line < r1 else (1 if line < r2 else 2)]
            if tid == 0:
                if x or y:
                    raise ValueError(
                        "table 0 region cannot carry nonzero values"
                    )
                continue
            xlen, lens, cods = table_codes(tid)
            lb = LINBITS[tid]
            xc = min(x, 15) if lb else x
            yc = min(y, 15) if lb else y
            if xc >= xlen or yc >= xlen or (lb and (
                x - 15 >= (1 << lb) or y - 15 >= (1 << lb)
            )):
                raise ValueError(
                    f"value pair ({x},{y}) does not fit table {tid}"
                )
            idx = xc * xlen + yc
            bw.write(cods[idx], lens[idx])
            _write_bigvalue(bw, tid, x, nx)
            _write_bigvalue(bw, tid, y, ny)
        table_a = g["count1table_select"] == 0
        for quad in g["quads"]:
            v, w, x, y = quad[:4]
            idx = (v << 3) | (w << 2) | (x << 1) | y
            if table_a:
                bw.write(COUNT1_A_COD[idx], COUNT1_A_LEN[idx])
            else:
                bw.write(15 - idx, 4)
            for bit_i, val in enumerate((v, w, x, y)):
                if val:
                    bw.write(quad[4 + bit_i], 1)  # sign: 1 = negative
        si.append(
            {
                "part2_3_length": len(bw.bits) - bits_before,
                "big_values": len(g.get("bigs", [])),
                "global_gain": g["global_gain"],
                "scalefac_compress": g["scalefac_compress"],
                "window_switching": ws,
                "block_type": bt,
                "mixed_block": mixed,
                "table_select": list(g.get("table_select", [0, 0, 0])),
                "subblock_gain": list(g.get("subblock_gain",
                                            [0, 0, 0])),
                "region0_count": g.get("region0_count", 0),
                "region1_count": g.get("region1_count", 0),
                "preflag": g["preflag"],
                "scalefac_scale": g["scalefac_scale"],
                "count1table_select": g["count1table_select"],
            }
        )
    return si, bw.tobytes((len(bw.bits) + 7) // 8)


def _l3_header_bytes(br_idx: int, sr_idx: int) -> bytes:
    return bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0xC4])


def _l3_frame_length(br_idx: int, sr_idx: int) -> int:
    return 144 * _BITRATE_V1[3][br_idx] * 1000 // _SAMPLE_RATE_V1[sr_idx]


def encode_mpeg1_layer3_frame(
    granule_specs: list[dict], scfsi: int = 0, sr_idx: int = 0
) -> bytes:
    """One SELF-CONTAINED mono MPEG-1 Layer III frame
    (main_data_begin = 0).  Each granule spec: global_gain,
    scalefac_compress, scalefac_scale, preflag, count1table_select,
    scalefacs (21 ints), quads (list of (v,w,x,y,sv,sw,sx,sy)
    value/sign tuples), optionally bigs (list of (x, y, neg_x, neg_y)
    raw-magnitude pairs), table_select, region0/1_count."""
    bounds = _SFB_LONG[_SAMPLE_RATE_V1[sr_idx]]
    granule_specs = [{**g, "bounds": bounds} for g in granule_specs]
    si, main = _render_main_data(granule_specs, scfsi)
    need = 4 + 17 + len(main)
    for br_idx in range(1, 15):
        if _l3_frame_length(br_idx, sr_idx) >= need:
            break
    else:
        raise ValueError("main data exceeds the largest L3 frame")
    sideinfo = encode_mp3_sideinfo_mono(0, scfsi, si)
    return (
        _l3_header_bytes(br_idx, sr_idx)
        + sideinfo
        + main
        + bytes(_l3_frame_length(br_idx, sr_idx) - need)
    )


def encode_layer3_stream_reservoir(
    frames: list[tuple[list[dict], int]], sr_idx: int = 0
) -> bytes:
    """The SAME granule content as consecutive self-contained frames,
    packed with the BIT RESERVOIR: the main-data pool is laid out
    contiguously (frame f's data immediately after frame f-1's) and
    each frame's side info points back into earlier frames' slack
    via main_data_begin = seg_start - data_start (2.4.2.7).  One
    fixed bitrate sized to the prefix-average so the reservoir
    genuinely builds up (main_data_begin > 0 from frame 1 onward
    whenever sizes vary).

    `frames` is a list of (granule_specs, scfsi) pairs."""
    bounds = _SFB_LONG[_SAMPLE_RATE_V1[sr_idx]]
    rendered = [
        (_render_main_data(
            [{**g, "bounds": bounds} for g in specs], scfsi
        ), scfsi)
        for specs, scfsi in frames
    ]
    mains = [main for (_, main), _ in rendered]
    # segment length: enough that every prefix of main data fits in
    # the segments written so far (data may never arrive later than
    # its own frame), and that main_data_begin stays within 9 bits
    seg_len = 0
    total = 0
    for f, main in enumerate(mains, start=1):
        total += len(main)
        seg_len = max(seg_len, -(-total // f))  # ceil prefix average
    need = 4 + 17 + seg_len
    for br_idx in range(1, 15):
        if _l3_frame_length(br_idx, sr_idx) >= need:
            break
    else:
        raise ValueError("main data exceeds the largest L3 frame")
    seg_len = _l3_frame_length(br_idx, sr_idx) - 21
    pool = b"".join(mains)
    pool += bytes(len(mains) * seg_len - len(pool))  # trailing stuffing
    out = bytearray()
    data_start = 0
    for f, ((si, main), scfsi) in enumerate(rendered):
        begin = f * seg_len - data_start
        if not 0 <= begin <= 511:
            raise ValueError(
                f"main_data_begin {begin} out of 9-bit range at "
                f"frame {f} -- vary content or bitrate"
            )
        out += _l3_header_bytes(br_idx, sr_idx)
        out += encode_mp3_sideinfo_mono(begin, scfsi, si)
        out += pool[f * seg_len : (f + 1) * seg_len]
        data_start += len(main)
    return bytes(out)


# ---------------------------------------------------------------
# decoder
# ---------------------------------------------------------------


def _check_l3_header(frame: bytes) -> tuple[list[int], list[int]]:
    """Header checks shared by the frame and stream decoders;
    returns (long, short) sfb boundary tables for the frame's rate."""
    if frame[0] != 0xFF or (frame[1] & 0xE0) != 0xE0:
        raise ValueError("bad sync")
    if ((frame[1] >> 3) & 0x3) != 0b11:
        # LSF layer III has different side info (9 bytes mono, one
        # granule) and its own scalefactor grammar
        raise NotImplementedError(
            "MPEG-2/2.5 (LSF) layer III sample decode not implemented"
        )
    if ((frame[1] >> 1) & 0x3) != 0b01:
        raise ValueError("not layer III")
    sr_idx = (frame[2] >> 2) & 0x3
    if sr_idx == 3:
        raise ValueError("reserved sample-rate index")
    rate = _SAMPLE_RATE_V1[sr_idx]
    return _SFB_LONG[rate], _SFB_SHORT[rate]


@guard("mp3-layer3")
def decode_mpeg1_layer3_frame(frame: bytes) -> np.ndarray:
    """One SELF-CONTAINED mono Layer III frame -> (2, 576) int64
    micro spectral values (requantized + short-block reorder,
    pre-alias).  main_data_begin must be 0 here; reservoir streams go
    through `decode_layer3_stream`, which feeds this same granule
    decoder from the rolling main-data pool."""
    bounds, sbounds = _check_l3_header(frame)
    si = parse_mp3_sideinfo_mono(frame[4:21])
    if si["main_data_begin"] != 0:
        raise ValueError(
            "frame is not self-contained (main_data_begin > 0); "
            "use decode_layer3_stream for reservoir streams"
        )
    out, _ = _decode_granules(
        si, _BitReaderMSB(frame[21:]), bounds, sbounds
    )
    return out


def _requant_micro(m: int, neg: bool, ex2: int) -> int:
    """2.4.3.4.7.1 requantization to a micro int:
    x = sign * m^(4/3) * 2^(ex2/2), floor(x*1e6 + 0.5) with the sign
    INSIDE the floor.  Exact (and SQL-replicable) when m is a perfect
    cube (m = k^3 -> m^(4/3) = k^4) and ex2 is even; any other
    magnitude/exponent takes the documented float fallback."""
    if m == 0:
        return 0
    k = round(m ** (1.0 / 3.0))
    if k * k * k == m and ex2 % 2 == 0:
        val = float(k ** 4) * (2.0 ** (ex2 // 2))
    else:
        val = (m ** (4.0 / 3.0)) * (2.0 ** (ex2 / 2.0))
    return math.floor((-val if neg else val) * 1e6 + 0.5)


def _decode_granules(
    si: dict, br: "_BitReaderMSB", bounds: list[int],
    sbounds: list[int],
) -> tuple[np.ndarray, list[dict]]:
    """Both granules of one frame out of a positioned main-data
    reader (scalefactors + big-value/count1 Huffman + requantization
    + short-block reorder).  Returns (spectra (2,576) micro int64 in
    NATURAL line order, per-granule block info for the hybrid)."""
    out = np.zeros((2, 576), dtype=np.int64)
    binfo: list[dict] = []
    sf_prev = [0] * N_SFB_LONG
    for g_i, g in enumerate(si["granules"]):
        ws = g["window_switching"]
        bt = g["block_type"] if ws else 0
        mixed = g["mixed_block"] if ws else 0
        short = ws and bt == 2
        binfo.append({"block_type": bt, "mixed": mixed})
        start = br.pos
        slen1 = SLEN1[g["scalefac_compress"]]
        slen2 = SLEN2[g["scalefac_compress"]]
        sf = [0] * N_SFB_LONG
        sf_s = [[0] * 3 for _ in range(13)]  # short sfb 12 unscaled
        if short:
            if g_i == 1 and si["scfsi"] != 0:
                raise ValueError(
                    "scfsi sharing into a short-block granule is "
                    "invalid (2.4.2.7: scfsi applies to long blocks)"
                )
            # 2.4.2.7 short grammar: mixed transmits long sfb 0..7
            # then short sfb 3..11; pure short transmits sfb 0..11;
            # sfb-major, window-minor; slen1 below short sfb 6
            if mixed:
                for sfb in range(8):
                    sf[sfb] = br.read(slen1)
            for sfb in range(3 if mixed else 0, 12):
                for w in range(3):
                    sf_s[sfb][w] = br.read(
                        slen1 if sfb < 6 else slen2
                    )
        else:
            for sfb in range(N_SFB_LONG):
                shared = g_i == 1 and any(
                    (si["scfsi"] >> (3 - grp)) & 1 and lo <= sfb < hi
                    for grp, (lo, hi) in enumerate(_SCFSI_GROUPS)
                )
                if shared:
                    sf[sfb] = sf_prev[sfb]
                else:
                    sf[sfb] = br.read(slen1 if sfb < 11 else slen2)

        # Huffman-decoded magnitudes in TRANSMITTED line order;
        # requantization + (for short blocks) reorder happen after
        mags = np.zeros(576, dtype=np.int64)
        negs = np.zeros(576, dtype=bool)

        # ---- big-values region (2.4.3.4.6): pairs, per-region
        # table_select; with window switching the region boundaries
        # are implicit (region0 = 36 lines pure-short, else the
        # first 8 long bands; no region2)
        line = 0
        bv_lines = 2 * g["big_values"]
        if ws:
            r1 = 36 if (short and not mixed) else bounds[8]
            r2 = 576
        else:
            r1 = bounds[min(g["region0_count"] + 1, len(bounds) - 1)]
            r2 = bounds[min(
                g["region0_count"] + g["region1_count"] + 2,
                len(bounds) - 1,
            )]
        while line < bv_lines:
            tid = g["table_select"][
                0 if line < r1 else (1 if line < r2 else 2)
            ]
            if tid in FORBIDDEN_TABLES:
                raise ValueError(f"forbidden table_select {tid}")
            if tid == 0:
                line += 2
                continue
            xlen, _, _ = table_codes(tid)
            node = decode_tree(tid)
            while "leaf" not in node:
                node = node[str(br.read(1))]
            idx = node["leaf"]
            lb = LINBITS[tid]
            for m in (idx // xlen, idx % xlen):
                if lb and m == 15:
                    m += br.read(lb)
                negs[line] = bool(m) and br.read(1) == 1
                mags[line] = m
                line += 1

        # ---- count1 region: quadruples until part2_3_length runs out
        tree = _TREES[g["count1table_select"] == 0]
        while br.pos - start < g["part2_3_length"] and line <= 572:
            node = tree
            while "leaf" not in node:
                node = node[str(br.read(1))]
            idx = node["leaf"]
            for j in range(4):
                m = (idx >> (3 - j)) & 1
                negs[line] = bool(m) and br.read(1) == 1
                mags[line] = m
                line += 1

        # ---- requantization (2.4.3.4.7.1).  Exponent carried
        # DOUBLED so both scalefac_scale multipliers stay integral;
        # the synthesizer guarantees ex2 even (exact micro), odd is
        # the float fallback
        gg2 = (g["global_gain"] - 210) // 2
        ssm = g["scalefac_scale"] + 1

        def _ex2_long(line: int) -> int:
            sfb = 0
            while bounds[sfb + 1] <= line:
                sfb += 1
            pre = PRETAB[sfb] if g["preflag"] else 0
            sf_eff = sf[sfb] if sfb < N_SFB_LONG else 0
            return gg2 - ssm * (sf_eff + pre)

        long_top = (36 if mixed else 0) if short else 576
        for ln in range(min(line, long_top)):
            if mags[ln]:
                out[g_i, ln] = _requant_micro(
                    int(mags[ln]), bool(negs[ln]), _ex2_long(ln)
                )
        if short:
            # short region: per (sfb, window) subblock_gain + short
            # scalefactors, then REORDER src (band-major) -> dest
            # (frequency-interleaved 3*freq + window)
            s0 = 3 if mixed else 0
            sbg = g["subblock_gain"]
            for s in range(s0, 13):
                lo3, hi3 = 3 * sbounds[s], 3 * sbounds[s + 1]
                width = sbounds[s + 1] - sbounds[s]
                for w in range(3):
                    ex2 = gg2 - 4 * sbg[w] - ssm * sf_s[s][w]
                    for f in range(width):
                        src = lo3 + w * width + f
                        if src >= line:
                            continue
                        if not mags[src]:
                            continue
                        dest = lo3 + 3 * f + w
                        out[g_i, dest] = _requant_micro(
                            int(mags[src]), bool(negs[src]), ex2
                        )
        sf_prev = sf
    return out, binfo


@guard("mp3-layer3")
def decode_layer3_stream_full(
    blob: bytes,
) -> tuple[np.ndarray, list[dict]]:
    """Frame walk with the BIT RESERVOIR (2.4.2.7 main_data_begin):
    every frame's post-side-info bytes join a rolling main-data pool,
    and frame f's granule data begins main_data_begin bytes BEFORE
    f's own segment -- i.e. inside earlier frames' slack.  Returns
    (the (2F, 576) micro spectral grid, per-granule block info for
    the hybrid stage).  A main_data_begin reaching back past the
    accumulated pool is a loud error (a mid-stream decoder would skip
    the frame; a corpus pass wants the failure attributable)."""
    _, frames = parse_mpeg_audio_frames(blob)
    pool = bytearray()
    plan: list[tuple[dict, int, list[int], list[int]]] = []
    for fr in frames:
        if fr["layer"] != 3:
            raise ValueError("not a layer III stream")
        frame = blob[fr["offset"] : fr["offset"] + fr["length"]]
        bounds, sbounds = _check_l3_header(frame)
        si = parse_mp3_sideinfo_mono(frame[4:21])
        seg_start = len(pool)
        pool += frame[21:]
        start = seg_start - si["main_data_begin"]
        if start < 0:
            raise ValueError(
                f"main_data_begin {si['main_data_begin']} reaches "
                f"past the reservoir ({seg_start} bytes pooled)"
            )
        plan.append((si, start, bounds, sbounds))
    reader = _BitReaderMSB(bytes(pool))
    spectra = []
    binfo: list[dict] = []
    for si, start, bounds, sbounds in plan:
        reader.pos = start * 8
        sp, bi = _decode_granules(si, reader, bounds, sbounds)
        spectra.append(sp)
        binfo.extend(bi)
    if not spectra:
        return np.zeros((0, 576), dtype=np.int64), []
    return np.concatenate(spectra, axis=0), binfo


def decode_layer3_stream(blob: bytes) -> np.ndarray:
    """Spectra-only view of `decode_layer3_stream_full`."""
    return decode_layer3_stream_full(blob)[0]


def hybrid_to_subbands_q(
    spectral_micro: np.ndarray, block_info: list[dict] | None = None
) -> np.ndarray:
    """(G, 576) micro spectral grid -> (G*18, 32) micro subband
    samples: Q14 alias butterflies, fused Q14 IMDCT-window, 18-sample
    overlap-add, frequency inversion.  Exact int64 (floor-division
    fixed point) -- the SQL-replicable gate path.

    `block_info` (per granule: block_type 0/1/2/3, mixed) switches
    windows per 2.4.3.4.10: start/stop windows for types 1/3, three
    6-offset IMDCT-12 short windows for type 2 (subbands 0-1 stay
    long when mixed), and restricts alias butterflies to long
    regions (none pure-short, boundary 1 only when mixed).  None
    means all-long (the gate path, fully vectorized)."""
    s = np.asarray(spectral_micro, dtype=np.int64)
    g_total = s.shape[0]
    xr = s.reshape(g_total, 32, 18).copy()
    cs = np.asarray(CS_Q14, dtype=np.int64)
    ca = np.asarray(CA_Q14, dtype=np.int64)
    if block_info is None:
        bts = np.zeros(g_total, dtype=np.int64)
        mix = np.zeros(g_total, dtype=np.int64)
        blim = np.full(g_total, 31, dtype=np.int64)
    else:
        if len(block_info) != g_total:
            raise ValueError("block_info length != granule count")
        bts = np.array([b["block_type"] for b in block_info],
                       dtype=np.int64)
        mix = np.array([b["mixed"] for b in block_info],
                       dtype=np.int64)
        blim = np.where(bts != 2, 31, np.where(mix == 1, 1, 0))
    # alias reduction (2.4.3.4.10.1): butterflies across each LONG
    # subband boundary (pure short: none; mixed: boundary 1 only).
    # Boundary b touches xr[:, b-1, 17-i] (time 10..17) and
    # xr[:, b, i] (time 0..7) -- disjoint slices for every b -- so
    # all 31 boundaries vectorize in one step per tap; a (g, 31)
    # mask leaves out-of-limit boundaries (short blocks) unchanged.
    # (r9-opt: the 31x8 masked-index loop dominated per-blob decode
    # at ~6ms of 9.4ms; this form is the same exact int64 math.)
    bmask = np.arange(1, 32, dtype=np.int64)[None, :] <= blim[:, None]
    for i in range(8):
        lo = xr[:, :31, 17 - i]
        hi = xr[:, 1:, i]
        new_lo = (cs[i] * lo - ca[i] * hi) >> 14
        new_hi = (cs[i] * hi + ca[i] * lo) >> 14
        xr[:, :31, 17 - i] = np.where(bmask, new_lo, lo)
        xr[:, 1:, i] = np.where(bmask, new_hi, hi)
    # fused IMDCT + window, Q14, per block type
    z = np.zeros((g_total, 32, 36), dtype=np.int64)
    for bt, w_mat in ((0, IMDCT_WIN_Q14), (1, IMDCT_WIN_Q14_START),
                      (3, IMDCT_WIN_Q14_STOP)):
        m = bts == bt
        if m.any():
            z[m] = np.einsum("gsk,nk->gsn", xr[m], w_mat) >> 14
    m2 = bts == 2
    if m2.any():
        # three 12-point IMDCTs per subband, windows at 6-sample
        # offsets 6/12/18 in the 36 slot; reordered spectra
        # interleave windows at 3k + w
        xs = xr[m2].reshape(-1, 32, 6, 3)
        tmp = np.einsum("gskw,nk->gswn", xs, IMDCT12_WIN_Q14) >> 14
        zs = np.zeros((int(m2.sum()), 32, 36), dtype=np.int64)
        for w in range(3):
            zs[:, :, 6 + 6 * w : 18 + 6 * w] += tmp[:, :, w, :]
        mixed_rows = mix[m2] == 1
        if mixed_rows.any():
            zs[mixed_rows, :2] = np.einsum(
                "gsk,nk->gsn", xr[m2][mixed_rows][:, :2],
                IMDCT_WIN_Q14,
            ) >> 14
        z[m2] = zs
    # overlap-add: granule g head + granule g-1 tail
    sub = np.zeros((g_total, 32, 18), dtype=np.int64)
    sub += z[:, :, :18]
    sub[1:] += z[:-1, :, 18:]
    # frequency inversion: odd time samples of odd subbands negate
    sub[:, 1::2, 1::2] *= -1
    # (G, 32, 18) -> (G*18, 32) granule-major time steps
    return sub.transpose(0, 2, 1).reshape(g_total * 18, 32)


@guard("mp3-layer3")
def decode_layer3_to_pcm_q(blob: bytes) -> tuple[int, np.ndarray]:
    """Full chain: reservoir-aware frame walk -> spectral micro ->
    hybrid (block-type aware) -> Q28 polyphase.  Returns
    (n_frames, int64 micro PCM)."""
    spectra, binfo = decode_layer3_stream_full(blob)
    grid = hybrid_to_subbands_q(spectra, binfo)
    return spectra.shape[0] // 2, synthesize_granules_q(grid)


# ---------------------------------------------------------------
# synthesizer + gate
# ---------------------------------------------------------------


def _l3_granule_spec(mid: int, g: int) -> dict:
    """Oracle-mirrored granule content: big-value pairs with CUBE
    magnitudes {0,1,8,27} (exact 4/3 powers {0,1,16,81}) through all
    three regions -- table 24 with an ESC+linbits escape (27=15+12),
    table 16 direct, table 13 direct -- followed by count1 quads.
    global_gain is pinned to 210 mod 4 with e <= -8 so the largest
    requantized value stays inside the 2^19 micro headroom."""
    ss = (mid + g) % 2
    preflag = ss * ((mid // 2 + g) % 2)  # only with multiplier 1.0
    n_bigs = 4 + (mid + g) % 6  # 4..9 pairs = 8..18 lines
    bigs = []
    for p in range(n_bigs):
        mags = [0, 1, 8, 27 if p < 4 else 1]
        bigs.append((
            mags[(mid + 2 * g + p) % 4],
            mags[(mid + g + 3 * p) % 4],
            (mid + g + p) % 2,
            (mid + p) % 2,
        ))
    n_quads = 8 + (mid + 3 * g) % 12
    quads = []
    for q in range(n_quads):
        vals = tuple(
            (mid + 3 * g + 5 * q + 7 * j) % 2 for j in range(4)
        )
        signs = tuple((mid + q + j) % 2 for j in range(4))
        quads.append(vals + signs)
    return {
        "global_gain": 210 - 4 * (8 + (mid + g) % 4),  # e in [-11,-8]
        "scalefac_compress": 15,  # slen1=4, slen2=3
        "scalefac_scale": ss,
        "preflag": preflag,
        "count1table_select": (mid + g) % 2,
        "scalefacs": [2 * ((mid + g + sfb) % 4)
                      for sfb in range(N_SFB_LONG)],
        "bigs": bigs,
        # region0 = lines [0,8) (bounds[2]), region1 = [8,12)
        # (bounds[3]), region2 = rest -- identical boundaries at all
        # three MPEG-1 rates' B.8 rows
        "table_select": [24, 16, 13],
        "region0_count": 1,
        "region1_count": 0,
        "quads": quads,
    }


def _l3_blob(mid: int) -> bytes:
    return encode_mpeg1_layer3_frame(
        [_l3_granule_spec(mid, 0), _l3_granule_spec(mid, 1)],
        scfsi=mid % 16,
        sr_idx=0,
    )


def synthesize_layer3(documents: DataFrame) -> DataFrame:
    return _synthesize_media(documents, _l3_blob)


def layer3_pcm_stats(media: DataFrame) -> DataFrame:
    """Layer III frames -> PCM accounting via the exact integer
    pipeline (same stats row shape as the Layer I/II gates)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in LAYER1_PCM_STATS.fields}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                n_frames, pcm = decode_layer3_to_pcm_q(bytes(blob))
                rows["media_id"].append(int(mid))
                rows["n_frames"].append(n_frames)
                rows["n_pcm"].append(int(pcm.size))
                rows["pcm_sum_micro"].append(int(pcm.sum()))
                rows["pcm_sum_abs_micro"].append(
                    int(np.abs(pcm).sum())
                )
                rows["pcm_peak_micro"].append(
                    int(np.abs(pcm).max()) if pcm.size else 0
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _decode, LAYER1_PCM_STATS
    )
