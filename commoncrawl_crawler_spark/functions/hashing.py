"""Hashing / similarity-sketch scalar functions (SURVEY.md 2.8, 2.9).

Reference capabilities re-implemented from published algorithms:
- SimHash (Charikar 2002, "Similarity estimation techniques from
  rounding algorithms") -- the reference computes a 64-bit simhash
  over 4-char shingles (util/SimHash.java:52-134).
- MinHash (Broder 1997, "On the resemblance and containment of
  documents") -- the scale path for n-gram Jaccard dedupe.
- Hamming distance = popcount(xor) -- kept as a Column expression
  (`bit_count` is JVM-side; util/SimHash.java's hammingDistance).

Kernels are numpy-vectorized inside Arrow-batched pandas UDFs: the
per-row Python cost is amortized over whole record batches, the
sanctioned pattern when built-ins can't express the computation.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

SHINGLE_SIZE = 4  # 4-char shingles, matching util/SimHash.java:57


def _hash64(token: str) -> int:
    """Deterministic 64-bit hash of a token (md5-derived; stable
    across processes, unlike Python's salted hash())."""
    return int.from_bytes(
        hashlib.md5(token.encode("utf-8")).digest()[:8], "big", signed=False
    )


def simhash64(text: str | None, shingle: int = SHINGLE_SIZE) -> int | None:
    """64-bit SimHash over character shingles. Signed int64 output
    (Spark LongType)."""
    if text is None:
        return None
    if len(text) < shingle:
        shingles = [text] if text else []
    else:
        shingles = [text[i : i + shingle] for i in range(len(text) - shingle + 1)]
    if not shingles:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for s in shingles:
        h = _hash64(s)
        # bit i of h at index i (uint64-safe; h may exceed int64)
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8),
            bitorder="little",
        ).astype(np.int64)
        acc += 2 * bits - 1
    fp = 0
    for i in range(64):
        if acc[i] > 0:
            fp |= 1 << i
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def minhash_signature(
    text: str | None, num_hashes: int = 64, shingle: int = SHINGLE_SIZE
) -> list[int] | None:
    """MinHash signature via the (a*x+b) mod p universal-hash family
    over md5-derived shingle ids."""
    if text is None:
        return None
    if len(text) < shingle:
        shingles = {text} if text else set()
    else:
        shingles = {text[i : i + shingle] for i in range(len(text) - shingle + 1)}
    if not shingles:
        return [0] * num_hashes
    ids = np.array([_hash64(s) & 0x7FFFFFFFFFFFFFFF for s in shingles], dtype=np.uint64)
    rng = np.random.RandomState(42)  # fixed family; same across executors
    p = np.uint64((1 << 61) - 1)  # Mersenne prime
    a = rng.randint(1, 1 << 31, size=num_hashes).astype(np.uint64)
    b = rng.randint(0, 1 << 31, size=num_hashes).astype(np.uint64)
    # (a * x + b) mod p, broadcast [num_hashes, n_shingles]
    vals = (a[:, None] * ids[None, :] + b[:, None]) % p
    return [int(v) for v in vals.min(axis=1)]


# lazy UDF construction: pandas_udf resolves its DDL type against the
# active session, which may not exist at import time


@lru_cache(maxsize=None)
def _simhash64_udf():
    @pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(simhash64).astype("Int64")

    return _udf


def simhash64_udf(col):
    return _simhash64_udf()(col)


@lru_cache(maxsize=None)
def _minhash_udf(num_hashes: int = 64):
    @pandas_udf("array<long>")
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: minhash_signature(t, num_hashes=num_hashes))

    return _udf


def minhash_udf(col, num_hashes: int = 64):
    return _minhash_udf(num_hashes)(col)


def hamming_distance_expr(a: Column, b: Column) -> Column:
    """popcount(a XOR b) -- stays in codegen (Spark >= 3.3
    bit_count). util/SimHash.java hammingDistance capability."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_bands_expr(col: Column, n_blocks: int = 6, choose: int = 3) -> Column:
    """LSH band keys for simhash blocking (SURVEY.md 2.9).

    The reference splits the 64-bit simhash into 6 blocks and emits
    every C(6,3)=20 block-combination as a candidate key
    (deduper/Stage1Mapper.java:187-207, DeduperUtils.java:201,271):
    two hashes within hamming distance k<=3 share at least one
    combination of (6-3)=3 *matching* blocks. Returns
    array<struct<pattern:int, key:long>> to explode + groupBy.

    Pure Column implementation: shiftrightunsigned + masking, no UDF.
    Block width ~ 64/6; we use 11-bit blocks x 5 + 9-bit block 5.
    """
    from itertools import combinations

    widths = [11, 11, 11, 11, 11, 9]
    offsets = [0, 11, 22, 33, 44, 55]

    def block(i: int) -> Column:
        mask = (1 << widths[i]) - 1
        return F.shiftrightunsigned(col, offsets[i]).bitwiseAND(F.lit(mask))

    entries = []
    for pattern_idx, combo in enumerate(combinations(range(n_blocks), choose)):
        # pack the selected blocks into one long key, tagged by the
        # combination index so different patterns never collide
        key: Column = F.lit(0).cast("long")
        shift = 0
        for i in combo:
            key = key.bitwiseOR(F.shiftleft(block(i), shift))
            shift += widths[i]
        entries.append(
            F.struct(
                F.lit(pattern_idx).alias("pattern"),
                key.alias("key"),
            )
        )
    return F.array(*entries)
