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
- build: one `mapPartitions` pass computes a per-partition numpy bit
  array; partitions OR-reduce treewise on the driver -- the same
  one-pass, shuffle-free shape at any scale.
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


def build_bloom(
    df: DataFrame,
    col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> Bloom:
    """One-pass distributed build over xxhash64(col) (the URL-FP
    analog; pass an actual fingerprint column to match reference
    semantics exactly)."""
    if expected_items is None:
        expected_items = df.count()
    m_bits, k = optimal_params(expected_items, fpp)
    hashed = df.select(F.xxhash64(F.col(col)).alias("h"))

    def _partition_bits(batches):
        # Arrow-batched (no per-row Python): one bitmap per partition
        arr = np.zeros(m_bits // 8, dtype=np.uint8)
        for pdf in batches:
            vals = pdf["h"].to_numpy(dtype=np.int64)
            if len(vals):
                idx = _indexes(vals.astype(np.uint64), m_bits, k).ravel()
                np.bitwise_or.at(arr, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        yield pd.DataFrame({"bits": [arr.tobytes()]})

    parts = hashed.mapInPandas(_partition_bits, "bits binary").collect()
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for p in parts:
        merged |= np.frombuffer(bytes(p["bits"]), dtype=np.uint8)
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
    bloom = build_bloom(history, col)
    probe = might_contain_udf(bloom)
    return candidates.filter(~probe(F.xxhash64(F.col(col))))


def bloom_keep_seen(
    candidates: DataFrame, history: DataFrame, col: str, fpp: float = 0.01
) -> DataFrame:
    """Re-crawl selection: keep candidates already in history
    (superset of the true intersection by ~fpp)."""
    bloom = build_bloom(history, col)
    probe = might_contain_udf(bloom)
    return candidates.filter(probe(F.xxhash64(F.col(col))))
