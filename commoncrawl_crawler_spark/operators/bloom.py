"""Bloom-filter membership: distributed build, broadcast probe.

Reference (SURVEY.md sections 2.8, 2.10): util/URLFPBloomFilter.java
(:46-168) -- an m-bit, k-hash filter over URL fingerprints, shipped
to tasks and checkpointed by the crawl-history service
(protocol.jr:1075-1104; bloom pre-check in
service/listcrawler/CrawlHistoryManager.java:145,439-480).
StatsAggregationReducer sizes one at 2^28 elements x 10 hashes
(StatsAggregationReducer.java:44-46).

Engine-owned implementation (Spark's df.stat.bloomFilter stays on
the JVM driver and can't ship into Python workers):
- build: one `mapInPandas` pass computes a per-partition numpy bit
  array, emitted as fixed-size CHUNK shards (all-zero chunks
  skipped); shards OR-merge executor-side via a groupBy(chunk_id)
  shuffle, so the driver receives exactly one filter's worth of
  bytes (m/8) no matter how many partitions the input has. At the
  reference's 2^28-element sizing that is one ~320 MB filter on the
  driver instead of one per partition.
- probe: the packed bit array broadcasts once per executor inside an
  Arrow-batched pandas UDF; membership for a whole batch is pure
  vectorized numpy.
- hashing: k indexes derived from two splitmix64 streams via the
  standard double-hashing construction h1 + i*h2 (Kirsch &
  Mitzenmacher 2006), deterministic across processes.

Classic frontier use: drop already-seen URLs from a candidate list
without joining the multi-TB history table. False positives drop
~fpp of genuinely-new rows; false negatives never occur.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(salt)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _indexes(vals: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """[n, k] bit indexes via double hashing h1 + i*h2 (mod m)."""
    h1 = _mix(vals, 0x9E3779B97F4A7C15)
    h2 = _mix(vals, 0xC2B2AE3D27D4EB4F) | np.uint64(1)  # odd -> full cycle
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
            np.int64
        )


def optimal_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate (standard bloom
    sizing: m = -n ln p / ln^2 2, k = m/n ln 2 -- BloomCalculations
    capability)."""
    n = max(expected_items, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)  # word-align
    k = max(1, round(m / n * math.log(2)))
    return m, k


class Bloom:
    """Immutable packed bloom filter (bytes + params); picklable, so
    it broadcasts into pandas UDFs and serializes for checkpoints
    (the reference checkpoints per crawl number)."""

    def __init__(self, bits: bytes, m_bits: int, k: int):
        self.bits = bits
        self.m_bits = m_bits
        self.k = k

    def might_contain_np(self, vals: np.ndarray) -> np.ndarray:
        arr = np.frombuffer(self.bits, dtype=np.uint8)
        idx = _indexes(vals.astype(np.uint64), self.m_bits, self.k)
        return (arr[idx >> 3] & (1 << (idx & 7).astype(np.uint8))).all(axis=1)


#: shard size for the executor-side merge; 4 MiB keeps any single
#: shuffle row comfortably under frame limits at 2^28-element sizing
CHUNK_BYTES = 4 << 20


def _merged_chunk_rows(
    df: DataFrame, col: str, m_bits: int, k: int, chunk_bytes: int
) -> list:
    """Distributed bit-set + executor-side OR-merge.

    Each input partition builds its bitmap locally (vectorized, one
    Arrow pass), slices it into fixed chunks, and emits only NONZERO
    chunks. A groupBy(chunk_id) OR-merges shards on executors; the
    rows collected here total at most m_bits/8 bytes -- the driver
    never holds per-partition bitmaps."""
    n_bytes = m_bits // 8
    hashed = df.select(F.xxhash64(F.col(col)).alias("h"))

    def _partition_chunks(batches):
        arr = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            vals = pdf["h"].to_numpy(dtype=np.int64)
            if len(vals):
                idx = _indexes(vals.astype(np.uint64), m_bits, k).ravel()
                np.bitwise_or.at(arr, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        for cid in range(0, n_bytes, chunk_bytes):
            chunk = arr[cid : cid + chunk_bytes]
            if chunk.any():
                yield pd.DataFrame(
                    {"chunk_id": [cid // chunk_bytes], "bits": [chunk.tobytes()]}
                )

    def _or_chunks(key, pdf):
        acc = np.frombuffer(bytes(pdf["bits"].iloc[0]), dtype=np.uint8).copy()
        for b in pdf["bits"].iloc[1:]:
            acc |= np.frombuffer(bytes(b), dtype=np.uint8)
        return pd.DataFrame({"chunk_id": [key[0]], "bits": [acc.tobytes()]})

    shards = hashed.mapInPandas(_partition_chunks, "chunk_id int, bits binary")
    return (
        shards.groupBy("chunk_id")
        .applyInPandas(_or_chunks, "chunk_id int, bits binary")
        .collect()
    )


def build_bloom(
    df: DataFrame,
    col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    chunk_bytes: int = CHUNK_BYTES,
) -> Bloom:
    """One-pass distributed build over xxhash64(col) (the URL-FP
    analog; pass an actual fingerprint column to match reference
    semantics exactly). Merge happens executor-side per chunk; driver
    memory is bounded by one filter (m/8 bytes) at any partition
    count."""
    if expected_items is None:
        expected_items = df.count()
    m_bits, k = optimal_params(expected_items, fpp)
    n_bytes = m_bits // 8
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for row in _merged_chunk_rows(df, col, m_bits, k, chunk_bytes):
        off = row["chunk_id"] * chunk_bytes
        chunk = np.frombuffer(bytes(row["bits"]), dtype=np.uint8)
        merged[off : off + len(chunk)] |= chunk
    return Bloom(merged.tobytes(), m_bits, k)


def might_contain_udf(bloom: Bloom) -> Column:
    """Membership probe column factory: vectorized numpy per Arrow
    batch; the filter ships once per executor in the closure."""

    @pandas_udf("boolean")
    def _udf(hashes: pd.Series) -> pd.Series:
        vals = hashes.to_numpy(dtype=np.int64)
        return pd.Series(bloom.might_contain_np(vals))

    return _udf


def bloom_drop_seen(
    candidates: DataFrame, history: DataFrame, col: str, fpp: float = 0.01
) -> DataFrame:
    """Frontier dedup: drop candidates (probably) present in history.
    No join, no shuffle of candidates; ~fpp of new rows are lost to
    false positives -- the crawl-frontier tradeoff the reference made."""
    bloom = build_bloom(history, col, fpp=fpp)
    probe = might_contain_udf(bloom)
    return candidates.filter(~probe(F.xxhash64(F.col(col))))


def bloom_keep_seen(
    candidates: DataFrame, history: DataFrame, col: str, fpp: float = 0.01
) -> DataFrame:
    """Re-crawl selection: keep candidates already in history
    (superset of the true intersection by ~fpp)."""
    bloom = build_bloom(history, col, fpp=fpp)
    probe = might_contain_udf(bloom)
    return candidates.filter(probe(F.xxhash64(F.col(col))))
