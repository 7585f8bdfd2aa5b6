"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data-pipeline tier (no reference analog -- the reference
stores raw content as `buffer` fields, protocol.jr:386 contentRaw,
and ships it through ARC files; this module is the modern
image/audio/video equivalent).

Design: media is an opaque `binary` column plus a typed metadata
struct. All heavy per-item work runs in Arrow-batched pandas
functions (`mapInPandas`) so batches move zero-copy and the Python
loop is vectorized where possible. The actual codec step is STUBBED
(`decode_media`): this container has no image/audio libraries, so
decode raises NotImplementedError unless the deterministic fake
codec is requested -- the Spark-side plumbing (schemas, batch
shapes, partitioning) is real and tested either way.

At 100 TB: binary payloads dominate shuffle size, so every operator
here is shuffle-free (narrow mapInPandas / explode); repartition
*before* attaching payloads, never after.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("content", BinaryType()),
        StructField("content_len", LongType()),
    ]
)

N_FEATURES = 16  # byte-histogram bins for the fake feature extractor


def media_from_documents(documents: DataFrame, mime: str = "fake/blob") -> DataFrame:
    """Wrap document text bytes as a media table (test harness path;
    production ingests real bytes from archives/object store)."""
    content = F.encode("text", "UTF-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(mime).alias("mime"),
        content.alias("content"),
        F.length(content).cast("long").alias("content_len"),
    )


def content_stats(media: DataFrame) -> DataFrame:
    """Cheap byte-level stats, fully JVM-side (no Python).

    Binary columns stay in Tungsten rows until a codec is genuinely
    needed -- length/digest/slice never leave the JVM.
    """
    return media.select(
        "media_id",
        "mime",
        "content_len",
        F.md5(F.col("content")).alias("content_md5"),
    ).orderBy("media_id")


def frame_sample(
    media: DataFrame, frame_bytes: int = 64, max_frames: int | None = None
) -> DataFrame:
    """Split each payload into fixed-size frames (video-sampling shape).

    Pure JVM: sequence + transform + explode -- one row per frame,
    no Python, no shuffle. `max_frames` caps per-item fan-out (the
    equivalent of sampling every Nth frame instead of all).
    """
    n_frames = F.ceil(F.col("content_len") / F.lit(frame_bytes)).cast("int")
    if max_frames is not None:
        n_frames = F.least(n_frames, F.lit(max_frames))
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    frame = F.col("content").substr(
        F.col("frame_idx") * frame_bytes + 1, F.lit(frame_bytes)
    )
    return (
        media.filter(F.col("content_len") > 0)
        .select("media_id", "content", "content_len", idx)
        .select(
            "media_id",
            "frame_idx",
            frame.alias("frame"),
            F.length(frame).cast("long").alias("frame_len"),
        )
    )


def decode_media(media: DataFrame, codec: str = "real") -> DataFrame:
    """Decode binary payloads to dense arrays.

    codec="real" is STUBBED: the container has no PIL/ffmpeg, so it
    raises immediately (wire in the real library here in production).
    codec="fake16" is the deterministic stand-in: a 16-bin byte
    histogram, normalized -- enough to exercise every downstream
    consumer (ANN, dedup, clustering) with real batch mechanics.
    """
    if codec == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; use codec='fake16' for the deterministic "
            "test codec"
        )
    if codec != "fake16":
        raise ValueError(f"unknown codec {codec!r}")

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
            StructField("n_bytes", LongType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, sizes = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(
                    np.float64
                )
                total = hist.sum()
                feats.append(hist / total if total else hist)
                ids.append(mid)
                sizes.append(len(arr))
            yield pd.DataFrame(
                {"media_id": ids, "features": feats, "n_bytes": sizes}
            )

    return media.select("media_id", "content").mapInPandas(_decode, schema)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_stub(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Thumbnail generation, deterministic fake: truncate/pad payload
    to width*height bytes (a real impl swaps the inner function for
    PIL -- the batch contract is identical)."""
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "thumb": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                b = bytes(blob)[:target]
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["thumb"].append(b.ljust(target, b"\x00"))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(_resize, RESIZE_SCHEMA)
