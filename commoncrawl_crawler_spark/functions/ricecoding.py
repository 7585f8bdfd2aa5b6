"""Rice/Golomb coding for compressed fingerprint lists.

Reference: util/RiceCoding.java (addItem :106-137, getItems :143-170)
and its consumer util/CompressedURLFPListV2.java -- the reference
stores per-domain URL-fingerprint lists as delta-then-Rice-coded
buffers. SURVEY.md section 2.8 marked this row "unnecessary (Parquet
encodings)" -- which remains true for STORAGE -- but the codec itself
is part of the reference's operator surface (query-server buffers are
exchanged in this format), so it is implemented here bit-compatibly:

- items are >= 1; x = val - 1 splits into quotient q = x >> m coded
  UNARY as q one-bits + a zero, then the m-bit remainder MSB-first;
- bits append LSB-first within bytes (bit n lives at
  byte[n >> 3] bit (n & 7)), matching addbit/getbit exactly.

The wire blob used by the Spark operator prefixes a small header
(m, item count, bit count) so a buffer is self-describing, like the
reference's (mval, size, bitCount, bits) constructor.
"""

from __future__ import annotations

import struct

from ..operators.parseguard import guard


def rice_encode(values: list[int], m: int) -> bytes:
    """Encode positive integers; bit-compatible with
    RiceCoding.addItem. Returns header (m, size, nbits) + bit bytes."""
    if not 0 <= m <= 64:
        raise ValueError("m < 0 || m > 64")
    bits = bytearray()
    nbits = 0

    def addbit(b: int) -> None:
        nonlocal nbits
        if nbits == len(bits) * 8:
            bits.append(0)
        if b:
            bits[nbits >> 3] |= 1 << (nbits & 7)
        nbits += 1

    for val in values:
        if val < 1:
            raise ValueError("val < 1")
        x = val - 1
        q = x >> m
        r = x & ((1 << m) - 1)
        for _ in range(q):
            addbit(1)
        addbit(0)
        if m > 0:
            mask = 1 << (m - 1)
            while mask:
                addbit(1 if r & mask else 0)
                mask >>= 1
    return struct.pack("<BII", m, len(values), nbits) + bytes(bits)


@guard("rice")
def rice_decode(blob: bytes) -> list[int]:
    """Inverse of rice_encode; mirrors RiceCoding.getItems."""
    m, size, nbits = struct.unpack("<BII", blob[:9])
    bits = blob[9:]
    if len(bits) * 8 < nbits:
        raise ValueError("truncated Rice buffer")

    def getbit(n: int) -> int:
        return (bits[n >> 3] >> (n & 7)) & 1

    out = []
    cur = 0
    for _ in range(size):
        unary = 0
        while getbit(cur):
            unary += 1
            cur += 1
        cur += 1
        binary = 0
        for _j in range(m):
            binary = (binary << 1) | getbit(cur)
            cur += 1
        out.append((unary << m) + binary + 1)
    if cur > nbits:
        raise ValueError("Rice buffer bit count mismatch")
    return out


def rice_bit_length(values: list[int], m: int) -> int:
    """Closed-form encoded size: sum((val-1) >> m) + n * (1 + m) --
    the formula the SQL oracle recomputes."""
    return sum((v - 1) >> m for v in values) + len(values) * (1 + m)


def compress_fp_lists(df, group_col: str = "source", fp_col: str = "doc_id", m: int = 6):
    """Per-group delta + Rice compression of sorted fingerprint lists
    (the reference's CompressedURLFPListV2 shape: one buffer per
    domain) with an in-kernel decode-verify.

    Runs as applyInPandas over the group key -- one buffer per group,
    built where the group's rows already live. Each kernel encodes
    the sorted deltas, DECODES the buffer back, and verifies the
    roundtrip before emitting the summary row (group, n_items,
    total_bits from the real blob header, sum of decoded
    fingerprints, m) -- so a hash-matched row proves the codec
    bit-level correct under distribution, while the oracle recomputes
    n/bits/sum closed-form."""
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField("n_items", IntegerType()),
            StructField("total_bits", LongType()),
            StructField("sum_fp", LongType()),
            StructField("m", IntegerType()),
        ]
    )

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(v) for v in pdf[fp_col])
        deltas = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        blob = rice_encode(deltas, m)
        back = rice_decode(blob)
        acc, run = [], -1
        for d in back:
            run += d
            acc.append(run)
        if acc != ids:
            raise ValueError(f"Rice roundtrip mismatch for group {key!r}")
        nbits = int.from_bytes(blob[5:9], "little")
        return pd.DataFrame(
            [
                {
                    group_col: key[0],
                    "n_items": len(ids),
                    "total_bits": nbits,
                    "sum_fp": sum(ids),
                    "m": m,
                }
            ]
        )

    return (
        df.select(group_col, fp_col)
        .groupBy(group_col)
        .applyInPandas(fn, schema)
        .orderBy(group_col)
    )
