"""Gzip-member archive source/sink (ARC-format analog).

Reference (SURVEY.md section 2.1): ARC files are a concatenation of
independently-gzipped members, one document each, with a plain-text
header line before the payload (util/ArcFileWriter.java:77,565 writes
them with size rotation; util/ArcFileReader.java and
hadoop/io/ARCInputFormat.java:39,168-175 split + iterate them).

This engine's `ccarc` format keeps that wire shape:

    member   := gzip( header "\\n" payload )
    header   := "ccarc/1 <key> <payload-length>"
    archive  := member member ... (one file per writer partition,
                rotated at `rotate_bytes`)

Because every member is its own gzip stream, archives are
*splittable at member boundaries* and members are readable without
decompressing siblings -- the property the ARC format was designed
for.

Spark integration:
- writer: `df.rdd.mapPartitionsWithIndex` streams members to rotated
  part files; one task per partition, no driver funnel.
- reader: `spark.read.format("binaryFile")` lists + loads whole
  archives (they are size-capped by rotation), then `mapInPandas`
  walks gzip members per file, yielding (key, payload, source file,
  member offset) -- offsets support the reference's point-seek reads
  (ArcFileItem arcFileDate/Index/Offset/Size metadata fields,
  protocol.jr:165-283).
"""

from __future__ import annotations

import gzip
import io
import os
import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"ccarc/1"
DEFAULT_ROTATE_BYTES = 64 * 1024 * 1024  # size rotation like ArcFileWriter
_WS_RE = re.compile(r"\s")

READ_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("payload", BinaryType()),
        StructField("archive_path", StringType()),
        StructField("member_offset", LongType()),
    ]
)


def _member_bytes(key: str, payload: bytes) -> bytes:
    header = b"%s %s %d\n" % (MAGIC, key.encode("utf-8"), len(payload))
    buf = io.BytesIO()
    # mtime=0 -> deterministic output bytes for identical input
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(header)
        gz.write(payload)
    return buf.getvalue()


def write_archive(
    df: DataFrame,
    path: str,
    key_col: str = "key",
    payload_col: str = "payload",
    rotate_bytes: int = DEFAULT_ROTATE_BYTES,
) -> int:
    """Write (key, payload) rows as rotated gzip-member archives.

    One writer per input partition (no shuffle, no driver funnel);
    files rotate at `rotate_bytes` like ArcFileWriter.java:565.
    Returns the number of archive files written. Keys containing
    whitespace are rejected: the member header is space-delimited, so
    such a key would write an archive the reader cannot parse. The
    check runs inside the single write pass (raised from the executor,
    surfaced as the job error) -- no separate validation job
    recomputing the upstream pipeline.

    Write is job-atomic the way Hadoop's file-commit protocol is:
    each task ATTEMPT writes `.ccarc.<attempt>.tmp` files (attempt-
    unique, so a speculative or zombie attempt can never interleave
    bytes with a retry's file) and the driver renames the successful
    attempts' temps to `.ccarc` only after every partition succeeded.
    A failed job leaves NO reader-visible archives -- readers glob
    `*.ccarc` and never see temps -- and all temp files are removed on
    both success and failure.
    Local-filesystem path semantics: on a multi-node cluster point
    `path` at a shared mount, or swap the open()/rename for an
    fsspec/Hadoop filesystem handle -- the partition-writer contract
    is unchanged.
    """
    os.makedirs(path, exist_ok=True)
    rows = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    def _write_partition(idx: int, it: Iterator) -> Iterator[tuple]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        names: list[tuple] = []
        out = None
        size = 0
        rotation = 0
        for row in it:
            if _WS_RE.search(row["key"] or ""):
                raise ValueError(
                    "archive keys must not contain whitespace: "
                    f"{row['key']!r}"
                )
            member = _member_bytes(row["key"], bytes(row["payload"] or b""))
            if out is None or size + len(member) > rotate_bytes:
                if out is not None:
                    out.close()
                fname = f"part-{idx:05d}-{rotation:03d}.ccarc"
                tmp = f"{fname}.{attempt}.tmp"
                out = open(os.path.join(path, tmp), "wb")
                names.append((fname, tmp))
                rotation += 1
                size = 0
            out.write(member)
            size += len(member)
        if out is not None:
            out.close()
        yield from names

    def _sweep_temps() -> None:
        for leftover in os.listdir(path):
            if leftover.endswith(".tmp"):
                try:
                    os.remove(os.path.join(path, leftover))
                except OSError:
                    pass

    try:
        names = rows.rdd.mapPartitionsWithIndex(_write_partition).collect()
    except Exception:
        _sweep_temps()
        raise
    # every partition succeeded: commit the SUCCESSFUL attempts' temps
    # by rename (atomic per file on a POSIX/HDFS filesystem), then
    # sweep any stale temps from failed/zombie attempts
    for fname, tmp in names:
        os.replace(os.path.join(path, tmp), os.path.join(path, fname))
    _sweep_temps()
    return len(names)


def _iter_members(content: bytes) -> Iterator[tuple[int, str, bytes]]:
    """Walk gzip members in one archive: (offset, key, payload).

    zlib.decompressobj(wbits=31) stops at each member's end (unlike
    gzip.GzipFile.read(), which silently concatenates consecutive
    members) -- unused_data marks the next member's offset.
    """
    pos = 0
    while pos < len(content):
        d = zlib.decompressobj(wbits=31)
        data = d.decompress(content[pos:])
        if not d.eof:
            raise ValueError(f"truncated ccarc member at offset {pos}")
        nl = data.index(b"\n")
        magic, key, length = data[:nl].split(b" ")
        if magic != MAGIC:
            raise ValueError(f"bad ccarc member at offset {pos}")
        payload = data[nl + 1 : nl + 1 + int(length)]
        yield pos, key.decode("utf-8"), payload
        pos = len(content) - len(d.unused_data)


def read_archive(spark: SparkSession, path: str) -> DataFrame:
    """Read ccarc archives into (key, payload, archive_path, member_offset).

    binaryFile handles listing/partitioning (one task per archive --
    archives are size-rotated so tasks are balanced); member parsing
    is an Arrow-batched mapInPandas, the idiomatic slot for
    per-record imperative decode the ARCInputFormat did in Java.
    """
    files = spark.read.format("binaryFile").load(f"{path}/*.ccarc")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "key": [],
                "payload": [],
                "archive_path": [],
                "member_offset": [],
            }
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for offset, key, payload in _iter_members(bytes(content)):
                    out["key"].append(key)
                    out["payload"].append(payload)
                    out["archive_path"].append(fpath)
                    out["member_offset"].append(offset)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(_parse, READ_SCHEMA)
