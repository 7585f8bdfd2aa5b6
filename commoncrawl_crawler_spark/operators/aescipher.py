"""Pure-Python AES (FIPS-197) for the PDF standard security handler.

Everything here is DERIVED, not transcribed: the S-box is computed
from the multiplicative inverse in GF(2^8) mod x^8+x^4+x^3+x+1
followed by the affine transform, the round constants are powers of
x in the same field, and MixColumns is polynomial multiplication mod
x^4+1.  A wrong derivation cannot hide: the tests check the FIPS-197
Appendix C known-answer vectors.

Scope: block encrypt/decrypt for AES-128/192/256, CBC mode with the
PDF padding convention (RFC 2898 / PKCS#7, 7.6.2), and a no-padding
CBC for the /UE /OE key blobs.  Throughput is irrelevant here -- the
gate encrypts ~100-byte content streams -- and the honest pure-Python
form keeps the provenance obvious.

Reference role: ParserMapper's document-processing lineage
(mapred/ec2/parser/ParserMapper.java:340) -- crawled PDFs after 2006
are overwhelmingly AES-encrypted.
"""

from __future__ import annotations


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x11B) & 0xFF if a & 0x100 else a


def _gf_mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _gf_inv(a: int) -> int:
    # a^254 in GF(2^8) (Fermat); a=0 maps to 0
    r = 1
    for _ in range(254):
        r = _gf_mul(r, a)
    return r


def _build_sbox() -> tuple[bytes, bytes]:
    sbox = bytearray(256)
    for x in range(256):
        b = _gf_inv(x)
        y = 0
        for i in range(8):
            bit = (
                (b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            y |= bit << i
        sbox[x] = y
    inv = bytearray(256)
    for x, y in enumerate(sbox):
        inv[y] = x
    return bytes(sbox), bytes(inv)


_SBOX, _INV_SBOX = _build_sbox()


# T-tables (the classic 32-bit-word formulation, DERIVED from the
# same S-box): Te fuses SubBytes+ShiftRows+MixColumns per byte,
# Td its inverse; ~30x faster per block than the byte-wise form,
# which matters because PDF R6 key derivation (Algorithm 2.B)
# CBC-encrypts thousands of blocks per document by design.
def _build_te() -> list[list[int]]:
    te0 = []
    for x in range(256):
        s = _SBOX[x]
        s2 = _xtime(s)
        s3 = s2 ^ s
        te0.append((s2 << 24) | (s << 16) | (s << 8) | s3)
    tables = [te0]
    for r in range(1, 4):
        tables.append(
            [((w >> (8 * r)) | (w << (32 - 8 * r))) & 0xFFFFFFFF
             for w in te0]
        )
    return tables


def _build_td() -> tuple[list[list[int]], list[int]]:
    # U0[x] packs InvMixColumns coefficients (14,9,13,11) of x
    u0 = []
    for x in range(256):
        u0.append(
            (_gf_mul(x, 14) << 24) | (_gf_mul(x, 9) << 16)
            | (_gf_mul(x, 13) << 8) | _gf_mul(x, 11)
        )
    td0 = [u0[_INV_SBOX[x]] for x in range(256)]
    tables = [td0]
    for r in range(1, 4):
        tables.append(
            [((w >> (8 * r)) | (w << (32 - 8 * r))) & 0xFFFFFFFF
             for w in td0]
        )
    return tables, u0


_TE = _build_te()
_TD, _U0 = _build_td()


def _expand_key(key: bytes) -> list[int]:
    """Round keys as a flat list of big-endian 32-bit words."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 128/192/256 bits")
    nr = nk + 6
    words = [
        int.from_bytes(key[4 * i : 4 * i + 4], "big")
        for i in range(nk)
    ]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (_SBOX[(t >> 24) & 255] << 24)
                | (_SBOX[(t >> 16) & 255] << 16)
                | (_SBOX[(t >> 8) & 255] << 8)
                | _SBOX[t & 255]
            )
            t ^= rcon << 24
            rcon = _xtime(rcon)
        elif nk == 8 and i % nk == 4:
            t = (
                (_SBOX[(t >> 24) & 255] << 24)
                | (_SBOX[(t >> 16) & 255] << 16)
                | (_SBOX[(t >> 8) & 255] << 8)
                | _SBOX[t & 255]
            )
        words.append(words[i - nk] ^ t)
    return words


def _inv_round_keys(words: list[int], nr: int) -> list[int]:
    """Equivalent-inverse-cipher round keys: InvMixColumns applied
    to the middle round keys (first and last stay as-is)."""
    out = list(words)
    for rnd in range(1, nr):
        for c in range(4):
            w = words[4 * rnd + c]
            out[4 * rnd + c] = (
                _U0[(w >> 24) & 255]
                ^ (((_U0[(w >> 16) & 255] >> 8)
                    | (_U0[(w >> 16) & 255] << 24)) & 0xFFFFFFFF)
                ^ (((_U0[(w >> 8) & 255] >> 16)
                    | (_U0[(w >> 8) & 255] << 16)) & 0xFFFFFFFF)
                ^ (((_U0[w & 255] >> 24)
                    | (_U0[w & 255] << 8)) & 0xFFFFFFFF)
            )
    return out


def _encrypt_block(block: bytes, words: list[int], nr: int) -> bytes:
    t0, t1, t2, t3 = _TE
    sb = _SBOX
    a0 = int.from_bytes(block[0:4], "big") ^ words[0]
    a1 = int.from_bytes(block[4:8], "big") ^ words[1]
    a2 = int.from_bytes(block[8:12], "big") ^ words[2]
    a3 = int.from_bytes(block[12:16], "big") ^ words[3]
    for rnd in range(1, nr):
        k = 4 * rnd
        b0 = (t0[a0 >> 24] ^ t1[(a1 >> 16) & 255]
              ^ t2[(a2 >> 8) & 255] ^ t3[a3 & 255] ^ words[k])
        b1 = (t0[a1 >> 24] ^ t1[(a2 >> 16) & 255]
              ^ t2[(a3 >> 8) & 255] ^ t3[a0 & 255] ^ words[k + 1])
        b2 = (t0[a2 >> 24] ^ t1[(a3 >> 16) & 255]
              ^ t2[(a0 >> 8) & 255] ^ t3[a1 & 255] ^ words[k + 2])
        b3 = (t0[a3 >> 24] ^ t1[(a0 >> 16) & 255]
              ^ t2[(a1 >> 8) & 255] ^ t3[a2 & 255] ^ words[k + 3])
        a0, a1, a2, a3 = b0, b1, b2, b3
    k = 4 * nr
    b0 = ((sb[a0 >> 24] << 24) | (sb[(a1 >> 16) & 255] << 16)
          | (sb[(a2 >> 8) & 255] << 8) | sb[a3 & 255]) ^ words[k]
    b1 = ((sb[a1 >> 24] << 24) | (sb[(a2 >> 16) & 255] << 16)
          | (sb[(a3 >> 8) & 255] << 8) | sb[a0 & 255]) ^ words[k + 1]
    b2 = ((sb[a2 >> 24] << 24) | (sb[(a3 >> 16) & 255] << 16)
          | (sb[(a0 >> 8) & 255] << 8) | sb[a1 & 255]) ^ words[k + 2]
    b3 = ((sb[a3 >> 24] << 24) | (sb[(a0 >> 16) & 255] << 16)
          | (sb[(a1 >> 8) & 255] << 8) | sb[a2 & 255]) ^ words[k + 3]
    return (
        b0.to_bytes(4, "big") + b1.to_bytes(4, "big")
        + b2.to_bytes(4, "big") + b3.to_bytes(4, "big")
    )


def _decrypt_block(block: bytes, dwords: list[int], nr: int) -> bytes:
    """Equivalent inverse cipher over `dwords`
    (see `_inv_round_keys`)."""
    t0, t1, t2, t3 = _TD
    sb = _INV_SBOX
    k = 4 * nr
    a0 = int.from_bytes(block[0:4], "big") ^ dwords[k]
    a1 = int.from_bytes(block[4:8], "big") ^ dwords[k + 1]
    a2 = int.from_bytes(block[8:12], "big") ^ dwords[k + 2]
    a3 = int.from_bytes(block[12:16], "big") ^ dwords[k + 3]
    for rnd in range(nr - 1, 0, -1):
        k = 4 * rnd
        b0 = (t0[a0 >> 24] ^ t1[(a3 >> 16) & 255]
              ^ t2[(a2 >> 8) & 255] ^ t3[a1 & 255] ^ dwords[k])
        b1 = (t0[a1 >> 24] ^ t1[(a0 >> 16) & 255]
              ^ t2[(a3 >> 8) & 255] ^ t3[a2 & 255] ^ dwords[k + 1])
        b2 = (t0[a2 >> 24] ^ t1[(a1 >> 16) & 255]
              ^ t2[(a0 >> 8) & 255] ^ t3[a3 & 255] ^ dwords[k + 2])
        b3 = (t0[a3 >> 24] ^ t1[(a2 >> 16) & 255]
              ^ t2[(a1 >> 8) & 255] ^ t3[a0 & 255] ^ dwords[k + 3])
        a0, a1, a2, a3 = b0, b1, b2, b3
    b0 = ((sb[a0 >> 24] << 24) | (sb[(a3 >> 16) & 255] << 16)
          | (sb[(a2 >> 8) & 255] << 8) | sb[a1 & 255]) ^ dwords[0]
    b1 = ((sb[a1 >> 24] << 24) | (sb[(a0 >> 16) & 255] << 16)
          | (sb[(a3 >> 8) & 255] << 8) | sb[a2 & 255]) ^ dwords[1]
    b2 = ((sb[a2 >> 24] << 24) | (sb[(a1 >> 16) & 255] << 16)
          | (sb[(a0 >> 8) & 255] << 8) | sb[a3 & 255]) ^ dwords[2]
    b3 = ((sb[a3 >> 24] << 24) | (sb[(a2 >> 16) & 255] << 16)
          | (sb[(a1 >> 8) & 255] << 8) | sb[a0 & 255]) ^ dwords[3]
    return (
        b0.to_bytes(4, "big") + b1.to_bytes(4, "big")
        + b2.to_bytes(4, "big") + b3.to_bytes(4, "big")
    )


def encrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block is 16 bytes")
    return _encrypt_block(block, _expand_key(key), len(key) // 4 + 6)


def decrypt_block(block: bytes, key: bytes) -> bytes:
    if len(block) != 16:
        raise ValueError("AES block is 16 bytes")
    nr = len(key) // 4 + 6
    return _decrypt_block(
        block, _inv_round_keys(_expand_key(key), nr), nr
    )


def cbc_encrypt(data: bytes, key: bytes, iv: bytes,
                pad: bool = True) -> bytes:
    """AES-CBC; `pad=True` applies the PKCS#7 padding PDF streams use
    (7.6.2), `pad=False` requires block-aligned input (/UE /OE)."""
    words = _expand_key(key)
    nr = len(key) // 4 + 6
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n] * n)
    elif len(data) % 16:
        raise ValueError("unpadded CBC input must be block-aligned")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, words, nr)
        out += prev
    return bytes(out)


def cbc_decrypt(data: bytes, key: bytes, iv: bytes,
                pad: bool = True) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC ciphertext must be block-aligned")
    nr = len(key) // 4 + 6
    dwords = _inv_round_keys(_expand_key(key), nr)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(
            a ^ b
            for a, b in zip(_decrypt_block(blk, dwords, nr), prev)
        )
        prev = blk
    if pad:
        if not out:
            raise ValueError("empty CBC plaintext cannot be padded")
        n = out[-1]
        if not 1 <= n <= 16 or out[-n:] != bytes([n] * n):
            raise ValueError("bad CBC padding")
        del out[-n:]
    return bytes(out)
