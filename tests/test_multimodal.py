"""Multimodal plumbing: schemas, determinism, frame shapes, stubs."""

from __future__ import annotations

import numpy as np
import pytest

from commoncrawl_crawler_spark.operators import multimodal
from commoncrawl_crawler_spark.sources import load_table


def _media(spark, sf):
    return multimodal.media_from_documents(load_table(spark, "documents", sf))


def test_real_codec_is_stubbed(spark, sf_smoke):
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(_media(spark, sf_smoke), codec="real")


def test_fake_codec_features_normalized_and_deterministic(spark, sf_smoke):
    decoded = multimodal.decode_media(_media(spark, sf_smoke), codec="fake16")
    rows = decoded.orderBy("media_id").limit(20).collect()
    assert all(len(r["features"]) == multimodal.N_FEATURES for r in rows)
    for r in rows:
        if r["n_bytes"] > 0:
            assert sum(r["features"]) == pytest.approx(1.0)
    # determinism: same input -> identical features
    again = decoded.orderBy("media_id").limit(20).collect()
    assert [r["features"] for r in rows] == [r["features"] for r in again]


def test_fake_codec_matches_numpy_reference(spark, sf_smoke):
    docs = load_table(spark, "documents", sf_smoke).limit(5).collect()
    decoded = {
        r["media_id"]: r["features"]
        for r in multimodal.decode_media(
            _media(spark, sf_smoke), codec="fake16"
        ).collect()
    }
    for d in docs:
        arr = np.frombuffer(d["text"].encode(), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(float)
        expect = hist / hist.sum()
        assert decoded[d["doc_id"]] == pytest.approx(list(expect))


def test_frame_sample_reassembles_content(spark, sf_smoke):
    media = _media(spark, sf_smoke).limit(3)
    originals = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    frames = multimodal.frame_sample(media, frame_bytes=64).collect()
    by_id: dict[int, list] = {}
    for f in sorted(frames, key=lambda r: (r["media_id"], r["frame_idx"])):
        by_id.setdefault(f["media_id"], []).append(bytes(f["frame"]))
    for mid, parts in by_id.items():
        assert b"".join(parts) == originals[mid]


def test_frame_sample_max_frames_cap(spark, sf_smoke):
    frames = multimodal.frame_sample(
        _media(spark, sf_smoke), frame_bytes=8, max_frames=3
    )
    import pyspark.sql.functions as F

    per_item = frames.groupBy("media_id").count()
    assert per_item.agg(F.max("count")).collect()[0][0] <= 3


def test_resize_stub_fixed_shape(spark, sf_smoke):
    thumbs = multimodal.resize_stub(
        _media(spark, sf_smoke).limit(4), width=8, height=4
    ).collect()
    assert all(len(bytes(r["thumb"])) == 32 for r in thumbs)
    assert all(r["width"] == 8 and r["height"] == 4 for r in thumbs)
