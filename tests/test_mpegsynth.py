"""Polyphase synthesis/analysis filterbank (operators/mpegsynth)."""

from __future__ import annotations

import numpy as np
import pytest

from commoncrawl_crawler_spark.operators import container as C
from commoncrawl_crawler_spark.operators import mpegsynth as S


def _structural_int_synthesis(grid: np.ndarray) -> np.ndarray:
    """Independent integer reference: the literal ISO V-FIFO dataflow
    with Python ints (no unrolling, no numpy arithmetic)."""
    dq = S.SYNTH_WINDOW_Q14
    nq = np.asarray(S.SYNTH_COS_Q14).reshape(64, 32).tolist()
    v = [0] * 1024
    out = []
    for g in range(grid.shape[0]):
        v = [0] * 64 + v[:960]
        for i in range(64):
            v[i] = sum(nq[i][k] * int(grid[g, k]) for k in range(32))
        u = [0] * 512
        for i in range(8):
            for j in range(32):
                u[64 * i + j] = v[128 * i + j]
                u[64 * i + 32 + j] = v[128 * i + 96 + j]
        for j in range(32):
            acc = sum(dq[32 * i + j] * u[32 * i + j] for i in range(16))
            out.append(acc >> 28)
    return np.array(out, dtype=np.int64)


def test_unrolled_fixed_point_equals_structural_int():
    rng = np.random.default_rng(5)
    grid = rng.integers(-4_000_000, 4_000_000, size=(20, 32))
    got = S.synthesize_granules_q(grid)
    want = _structural_int_synthesis(grid)
    assert np.array_equal(got, want)


def test_zero_history_and_empty():
    assert S.synthesize_granules_q(np.zeros((0, 32), np.int64)).size == 0
    z = S.synthesize_granules_q(np.zeros((3, 32), np.int64))
    assert np.all(z == 0)


def test_roundtrip_snr_bound():
    """encode -> decode through the ISO structure with the in-repo NPR
    window reconstructs a band-limited signal at > 38 dB SNR."""
    rng = np.random.default_rng(7)
    pcm = rng.standard_normal(32 * 64)
    from numpy.fft import irfft, rfft

    p = rfft(pcm)
    p[int(len(p) * 0.9) :] = 0
    pcm = irfft(p, len(pcm))
    pcm /= np.abs(pcm).max()
    sb = S.analysis_filterbank(pcm)
    out = S.synthesis_filterbank(sb)
    lag = S.CASCADE_DELAY
    ref = pcm[: len(pcm) - lag]
    err = ref - out[lag:]
    snr = 10 * np.log10((ref**2).sum() / (err**2).sum())
    assert snr > 38.0, snr


def test_roundtrip_snr_white_noise():
    rng = np.random.default_rng(11)
    pcm = rng.standard_normal(32 * 64)
    pcm /= np.abs(pcm).max()
    sb = S.analysis_filterbank(pcm)
    out = S.synthesis_filterbank(sb)
    lag = S.CASCADE_DELAY
    ref = pcm[: len(pcm) - lag]
    err = ref - out[lag:]
    snr = 10 * np.log10((ref**2).sum() / (err**2).sum())
    assert snr > 35.0, snr


def test_cascade_delay_is_481():
    x = np.zeros(32 * 40)
    x[700] = 1.0
    y = S.synthesis_filterbank(S.analysis_filterbank(x))
    assert int(np.argmax(np.abs(y))) == 700 + S.CASCADE_DELAY


def test_window_is_pluggable():
    """Any 512-length window (e.g. the real ISO Table C.1) is accepted
    verbatim by the parametrized entry points."""
    ident = [0] * 512
    ident[16] = 1 << 14
    cf = S.synthesis_coefficients(ident)
    assert cf.shape == (16, 32, 32)
    with pytest.raises(ValueError):
        S.synthesize_granules_q(np.zeros((2, 31), np.int64))


def test_layer1_pcm_spark_matches_local(spark):
    """The Spark operator equals a driver-side replay of the same
    decode + synthesis on the same synthetic blobs."""
    import math

    docs = spark.range(12).selectExpr("id AS doc_id", "'x' AS text")
    media = C.synthesize_layer1(docs)
    got = {
        r["media_id"]: (
            r["n_frames"],
            r["n_pcm"],
            r["pcm_sum_micro"],
            r["pcm_sum_abs_micro"],
            r["pcm_peak_micro"],
        )
        for r in S.layer1_pcm_stats(media).collect()
    }
    assert len(got) == 12
    for mid in range(12):
        blob = C._layer1_blob(mid)
        _, frames = C.parse_mpeg_audio_frames(blob)
        grid = np.zeros((12 * len(frames), 32), dtype=np.int64)
        for fi, fr in enumerate(frames):
            for sb, g, s in C.decode_mpeg1_layer1_frame(
                blob[fr["offset"] : fr["offset"] + fr["length"]]
            ):
                grid[fi * 12 + g, sb] = math.floor(s * 1e6 + 0.5)
        pcm = S.synthesize_granules_q(grid)
        want = (
            len(frames),
            pcm.size,
            int(pcm.sum()),
            int(np.abs(pcm).sum()),
            int(np.abs(pcm).max()),
        )
        assert got[mid] == want, mid


def test_layer2_pcm_chain(spark):
    """Layer II frames decode all the way to PCM through the same
    fixed-point synthesis (1152 samples per frame)."""
    import math

    docs = spark.range(6).selectExpr("id AS doc_id", "'x' AS text")
    media = C.synthesize_layer2(docs)
    rows = {r["media_id"]: r for r in S.layer2_pcm_stats(media).collect()}
    assert len(rows) == 6
    for mid in range(6):
        blob = C._layer2_blob(mid)
        grid = np.zeros((36, 32), dtype=np.int64)
        for sb, g, s in C.decode_mpeg1_layer2_frame(blob):
            grid[g, sb] = math.floor(s * 1e6 + 0.5)
        pcm = S.synthesize_granules_q(grid)
        r = rows[mid]
        assert r["n_pcm"] == 1152 == pcm.size
        assert r["pcm_sum_micro"] == int(pcm.sum())
        assert r["pcm_sum_abs_micro"] == int(np.abs(pcm).sum())


# ---- round-8: ISO Table C.1 drop-in seam ----------------------------


def test_window_validator_accepts_shipped_rejects_garbage():
    import numpy as np
    snr = S.validate_synthesis_window(
        np.asarray(S.SYNTH_WINDOW_Q14, dtype=np.float64) / (1 << 14)
    )
    assert snr > 35.0
    with pytest.raises(ValueError, match="not a synthesis window"):
        S.validate_synthesis_window(np.ones(512))
    with pytest.raises(ValueError, match="512 taps"):
        S.validate_synthesis_window(np.ones(100))


def test_window_loader_roundtrip(tmp_path):
    import numpy as np
    w = np.asarray(S.SYNTH_WINDOW_Q14, dtype=np.float64) / (1 << 14)
    p = tmp_path / "window.txt"
    p.write_text("\n".join(f"{x:.9f}" for x in w))
    q14 = S.load_window_q14(str(p))
    assert len(q14) == 512
    # quantize(noquantize(q14)) is the identity here
    assert q14 == list(S.SYNTH_WINDOW_Q14)
    bad = tmp_path / "bad.txt"
    bad.write_text("1.0 " * 512)
    with pytest.raises(ValueError, match="not a synthesis window"):
        S.load_window_q14(str(bad))
