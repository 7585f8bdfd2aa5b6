"""PDF document parsing: object walk, page tree, text extraction.

Document tier beside the media stack: PDFs are the largest non-HTML
document class on the web, and the reference's parser family (HTML /
feeds / XML in `functions/html.py`, `sources/xmlsource.py`) had no
analog for them.  This module implements the ISO 32000-1 syntax
layer a corpus scan needs, with zero external libraries:

- **Object scanner**: `N G obj ... endobj` indirect objects, the
  dictionary/name/number/string/array token grammar (7.3), and the
  cross-reference trailer's /Root pointer (7.5.5 -- parsed when
  present, but discovery does not depend on it: crawled PDFs are
  routinely truncated, so the scanner is the source of truth and the
  trailer is verification).
- **Page tree**: /Type /Catalog -> /Pages -> /Kids recursion with a
  visited-set (malformed trees cycle), counting /Type /Page leaves
  (7.7.3).
- **Content-stream text**: BT..ET text objects, Tj and TJ show
  operators over literal strings with the escape rules of 7.3.4.2
  (\\n \\r \\t \\( \\) \\\\ and octal), ' and " shorthands, over
  UNCOMPRESSED streams plus /FlateDecode via zlib (the stdlib
  already ships the codec every real PDF uses).

- **Cross-reference streams** (7.5.8, PDF 1.5+): /Type /XRef streams
  with /W field widths, /Index subsection pairs, FlateDecode and the
  PNG Up/Sub/Average/Paeth predictors -- the post-2006 majority of
  real crawl PDFs carry their xref this way, with no `trailer`
  keyword at all (the trailer dict lives in the XRef stream dict).
- **Object streams** (7.5.7): /Type /ObjStm containers unpacked via
  /N + /First and the integer-pair header, so compressed non-stream
  objects (catalogs, page nodes) are first-class in the object map.

The object scanner is STREAM-AWARE: each object's dictionary is
isolated by a balanced `<< >>` scan (string- and comment-skipping),
and stream payloads are bounded by the dict's /Length (falling back
to an `endstream` search only when /Length is an unresolved indirect
reference), so compressed bytes that happen to contain `endobj` or
`/Filter`-shaped patterns can neither truncate an object nor leak
into dictionary lookups.

STUB boundary (documented, not faked): encryption and non-Flate
filters raise NotImplementedError with the feature named;
fonts/encoding maps are not interpreted (text extraction yields the
literal string bytes, which for the ASCII-with-standard-fonts PDFs
the fixtures model is the text itself).

At 100 TB: one Arrow-batched kernel per file, narrow stat/text rows
out -- the routing layer deciding which PDFs reach OCR/layout models.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .multimodal import _synthesize_media

from .parseguard import guard
_OBJ_HDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_NAME_RE = re.compile(rb"/([A-Za-z0-9#+.\-_]+)")
_WS = b"\x00\t\n\x0c\r "


def _parse_dict_refs(body: bytes, key: bytes) -> list[int]:
    """Object numbers of `N G R` references following /key (single ref
    or array)."""
    m = re.search(
        rb"/" + key + rb"\s*(\[(?:[^\]]*)\]|\d+\s+\d+\s+R)", body
    )
    if not m:
        return []
    return [int(n) for n in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]


def _dict_name(body: bytes, key: bytes) -> str | None:
    m = re.search(rb"/" + key + rb"\s*/([A-Za-z0-9#+.\-_]+)", body)
    return m.group(1).decode("latin-1") if m else None


def _dict_int(body: bytes, key: bytes) -> int | None:
    """Direct integer value of /key (None if absent or indirect)."""
    m = re.search(rb"/" + key + rb"\s*(\d+)(?!\s+\d+\s+R)", body)
    return int(m.group(1)) if m else None


def _dict_ints(body: bytes, key: bytes) -> list[int] | None:
    """Direct integer-array value of /key, e.g. /W [1 2 1]."""
    m = re.search(rb"/" + key + rb"\s*\[([^\]]*)\]", body)
    if not m:
        return None
    return [int(x) for x in re.findall(rb"\d+", m.group(1))]


def _skip_string(data: bytes, i: int) -> int:
    """Index just past the (...) literal string starting at `i`."""
    depth, n = 1, len(data)
    i += 1
    while i < n and depth:
        c = data[i]
        if c == 0x5C:
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
        i += 1
    return i


def _scan_dict(data: bytes, i: int) -> int:
    """Index just past the balanced `<< ... >>` starting at `i`,
    skipping strings, hex strings, and comments so a `>>` inside any
    of them cannot end the dict early."""
    if data[i : i + 2] != b"<<":
        raise ValueError("not a dictionary")
    depth, n = 1, len(data)
    i += 2
    while i < n and depth:
        c = data[i]
        if c == 0x28:  # (string)
            i = _skip_string(data, i)
        elif data[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif data[i : i + 2] == b">>":
            depth -= 1
            i += 2
        elif c == 0x3C:  # <hexstring>
            j = data.find(b">", i + 1)
            i = (j + 1) if j >= 0 else n
        elif c == 0x25:  # % comment to EOL
            j = data.find(b"\n", i)
            i = (j + 1) if j >= 0 else n
        else:
            i += 1
    if depth:
        raise ValueError("unterminated dictionary")
    return i


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        if data[i] in _WS:
            i += 1
        elif data[i] == 0x25:  # comment
            j = data.find(b"\n", i)
            i = (j + 1) if j >= 0 else n
        else:
            break
    return i


class _PdfObj:
    """One indirect object: isolated dict bytes (or the raw body for
    non-dict objects) plus the raw (still-encoded) stream payload."""

    __slots__ = ("dict", "raw_stream", "length_ref")

    def __init__(self, d: bytes, raw: bytes | None, length_ref: int | None):
        self.dict = d
        self.raw_stream = raw
        self.length_ref = length_ref


def _scan_objects(blob: bytes) -> dict[int, _PdfObj]:
    """Sequential stream-aware object scan: `N G obj` headers, a
    balanced dict scan, and stream payloads bounded by the dict's
    direct /Length -- so payload bytes are never re-scanned for
    object headers, `endobj`, or dictionary keys.  An indirect
    /Length falls back to an `endstream` search (recorded so a
    second pass can tighten it once the length object is known)."""
    objects: dict[int, _PdfObj] = {}
    pos, n = 0, len(blob)
    while True:
        m = _OBJ_HDR_RE.search(blob, pos)
        if not m:
            break
        num = int(m.group(1))
        i = _skip_ws(blob, m.end())
        dict_bytes = b""
        raw = None
        length_ref = None
        if blob[i : i + 2] == b"<<":
            dend = _scan_dict(blob, i)
            dict_bytes = blob[i:dend]
            i = _skip_ws(blob, dend)
            if blob[i : i + 6] == b"stream":
                i += 6
                if blob[i : i + 2] == b"\r\n":
                    i += 2
                elif blob[i : i + 1] == b"\n":
                    i += 1
                length = _dict_int(dict_bytes, b"Length")
                if length is not None:
                    raw = blob[i : i + length]
                    i += length
                else:
                    refs = _parse_dict_refs(dict_bytes, b"Length")
                    length_ref = refs[0] if refs else None
                    end = blob.find(b"endstream", i)
                    if end < 0:
                        raise ValueError("stream without endstream")
                    raw = blob[i:end]
                    if raw.endswith(b"\r\n"):
                        raw = raw[:-2]
                    elif raw.endswith(b"\n"):
                        raw = raw[:-1]
                    i = end
                end = blob.find(b"endstream", i)
                if end < 0:
                    raise ValueError("stream without endstream")
                i = end + len(b"endstream")
        else:
            end = blob.find(b"endobj", i)
            dict_bytes = blob[i : end if end >= 0 else n].strip()
        end = blob.find(b"endobj", i)
        pos = (end + 6) if end >= 0 else n
        objects[num] = _PdfObj(dict_bytes, raw, length_ref)
    # second pass: tighten indirect-/Length payloads now that the
    # integer objects are in hand
    for obj in objects.values():
        if obj.length_ref is not None and obj.length_ref in objects:
            try:
                want = int(objects[obj.length_ref].dict)
            except ValueError:
                continue
            if obj.raw_stream is not None and len(obj.raw_stream) > want:
                obj.raw_stream = obj.raw_stream[:want]
    return objects


def _png_unpredict(data: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Reverse PNG row predictors (RFC 2083 6.x) as used by
    /DecodeParms << /Predictor >= 10 >> on xref streams."""
    bpp = max(1, colors * bpc // 8)
    stride = columns * bpp
    out = bytearray()
    prev = bytearray(stride)
    for r in range(0, len(data), stride + 1):
        tag = data[r]
        row = bytearray(data[r + 1 : r + 1 + stride])
        if tag == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                row[i] = (row[i] + pred) & 0xFF
        elif tag != 0:
            raise ValueError(f"unknown PNG predictor tag {tag}")
        out += row
        prev = row
    return bytes(out)


def _decode_stream(dict_bytes: bytes, raw: bytes | None) -> bytes | None:
    """Apply /Filter (+ /DecodeParms predictor) to a raw payload.
    Filter lookup is restricted to the ISOLATED dict bytes, so
    payload bytes can never alias a /Filter key."""
    if raw is None:
        return None
    fil = _dict_name(dict_bytes, b"Filter")
    if fil is None:
        return raw
    if fil != "FlateDecode":
        raise NotImplementedError(
            f"PDF filter {fil} needs an external codec"
        )
    data = zlib.decompress(raw)
    pm = re.search(rb"/DecodeParms\s*<<(.*?)>>", dict_bytes, re.DOTALL)
    if pm:
        parms = pm.group(1)
        pred = _dict_int(parms, b"Predictor") or 1
        if pred >= 10:
            cols = _dict_int(parms, b"Columns") or 1
            data = _png_unpredict(data, cols)
        elif pred != 1:
            raise NotImplementedError(f"TIFF predictor {pred}")
    return data


def _stream_data(body: bytes) -> bytes | None:
    """Back-compat single-object helper: split dict/payload with the
    stream-aware rules, then decode."""
    if not body.lstrip(_WS).startswith(b"<<"):
        return None
    i = _skip_ws(body, 0)
    dend = _scan_dict(body, i)
    dict_bytes = body[i:dend]
    j = _skip_ws(body, dend)
    if body[j : j + 6] != b"stream":
        return None
    j += 6
    if body[j : j + 2] == b"\r\n":
        j += 2
    elif body[j : j + 1] == b"\n":
        j += 1
    length = _dict_int(dict_bytes, b"Length")
    if length is not None:
        raw = body[j : j + length]
    else:
        end = body.rfind(b"endstream")
        if end < 0:
            raise ValueError("stream without endstream")
        raw = body[j:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n"):
            raw = raw[:-1]
    return _decode_stream(dict_bytes, raw)


# --------------------------------------------------------------------
# Standard security handler, RC4 tier (ISO 32000-1 7.6.2/7.6.3)
# --------------------------------------------------------------------
#
# The common crawled "encrypted" PDF is owner-locked with an EMPTY
# user password: fully readable by design, the /Encrypt dict only
# gates editing.  A corpus pass must read these.  This implements the
# standard security handler, all four wire versions: /V 1-2
# (RC4-40..128, R2/R3: Algorithm 2 key, Algorithms 3-5 /O /U), /V 4
# (R4 crypt filters, /CFM /AESV2 = AES-128-CBC or /V2 = RC4), and
# /V 5 (R5/R6, AES-256: SHA-256 family key derivation, Algorithm
# 2.B hardened hash, /UE /OE key blobs, /Perms check).  RC4 is ~10
# lines of public arithmetic; MD5/SHA are hashlib; AES is the
# derived FIPS-197 implementation in `aescipher`.

import hashlib as _hashlib

from .aescipher import (
    cbc_decrypt as _aes_cbc_decrypt,
    cbc_encrypt as _aes_cbc_encrypt,
    decrypt_block as _aes_decrypt_block,
    encrypt_block as _aes_encrypt_block,
)

# the spec's fixed 32-byte password padding string (7.6.3.3)
_PDF_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(c ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + _PDF_PAD)[:32]


def _owner_key(owner_pw: bytes, n: int, r: int) -> bytes:
    h = _hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = _hashlib.md5(h[:n]).digest()
    return h[:n]


def compute_o_value(owner_pw: bytes, user_pw: bytes, n: int, r: int) -> bytes:
    """/O entry (Algorithm 3): the user password RC4-encrypted under
    the owner-password key (19 XOR-variant rounds for R3)."""
    key = _owner_key(owner_pw, n, r)
    o = _rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in key), o)
    return o


def compute_encryption_key(
    user_pw: bytes, o_value: bytes, p: int, file_id: bytes,
    n: int, r: int,
) -> bytes:
    """File encryption key (Algorithm 2)."""
    m = _hashlib.md5()
    m.update(_pad_password(user_pw))
    m.update(o_value)
    m.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    m.update(file_id)
    h = m.digest()
    if r >= 3:
        for _ in range(50):
            h = _hashlib.md5(h[:n]).digest()
    return h[:n]


def compute_u_value(key: bytes, file_id: bytes, r: int) -> bytes:
    """/U entry (Algorithm 4 for R2, Algorithm 5 for R3)."""
    if r == 2:
        return _rc4(key, _PDF_PAD)
    h = _hashlib.md5(_PDF_PAD + file_id).digest()
    u = _rc4(key, h)
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return u + bytes(16)  # R3 /U is 16 significant + 16 pad bytes


def _object_key(file_key: bytes, num: int, gen: int = 0,
                aes: bool = False) -> bytes:
    m = _hashlib.md5()
    m.update(file_key)
    m.update(num.to_bytes(3, "little"))
    m.update(gen.to_bytes(2, "little"))
    if aes:
        m.update(b"sAlT")  # 7.6.2: AES appends 73 41 6C 54
    return m.digest()[: min(len(file_key) + 5, 16)]


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash (R6): iterated
    SHA-256/384/512 selected by an AES-128-CBC round, terminating
    after >= 64 rounds when the last cipher byte <= rounds - 32."""
    k = _hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_encrypt(k1, k[:16], k[16:32], pad=False)
        digest = (_hashlib.sha256, _hashlib.sha384,
                  _hashlib.sha512)[sum(e[:16]) % 3]
        k = digest(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class _Decryptor:
    """Per-object stream decryption under an authenticated
    empty-user-password file key.  `mode` selects the wire form:
    'rc4' (per-object MD5 key), 'aesv2' (per-object MD5+sAlT key,
    IV-prefixed AES-128-CBC), 'aesv3' (the file key itself,
    IV-prefixed AES-256-CBC)."""

    def __init__(self, file_key: bytes, mode: str = "rc4"):
        self.file_key = file_key
        self.mode = mode

    def decrypt(self, num: int, data: bytes) -> bytes:
        if self.mode == "rc4":
            return _rc4(_object_key(self.file_key, num), data)
        if self.mode == "aesv2":
            key = _object_key(self.file_key, num, aes=True)
        else:
            key = self.file_key
        if len(data) < 16:
            raise ValueError("AES stream shorter than its IV")
        return _aes_cbc_decrypt(data[16:], key, data[:16])


def _hex_or_literal_id(trailer: bytes) -> bytes:
    """First element of the trailer /ID array (hex or literal)."""
    m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", trailer)
    if m:
        return bytes.fromhex(m.group(1).decode("ascii"))
    m = re.search(rb"/ID\s*\[\s*\(", trailer)
    if m:
        return _literal_strings(trailer[m.end() - 1 :])[0]
    return b""


def open_standard_security(
    enc_dict: bytes, trailer: bytes, user_pw: bytes = b""
) -> "_Decryptor":
    """Authenticate against the standard security handler and return
    a decryptor, or raise: NotImplementedError for non-Standard
    filters or an unknown /V, ValueError when the password is
    wrong.  Covers /V 1-2 (RC4), /V 4 (/CFM /AESV2 or /V2) and
    /V 5 (/CFM /AESV3, revisions 5 and 6)."""
    filt = _dict_name(enc_dict, b"Filter")
    if filt != "Standard":
        raise NotImplementedError(
            f"PDF security handler /{filt} unsupported"
        )
    v = _dict_int(enc_dict, b"V") or 0
    r = _dict_int(enc_dict, b"R") or 2
    if v not in (1, 2, 4, 5):
        raise NotImplementedError(f"PDF encryption /V {v} unknown")
    n = (_dict_int(enc_dict, b"Length") or 40) // 8
    if v in (1, 2, 4) and not 5 <= n <= 16:
        # 7.6.3.2: /Length is 40..128 bits in 8-bit increments
        raise ValueError(f"PDF encryption /Length {n * 8} out of range")
    pm = re.search(rb"/P\s+(-?\d+)", enc_dict)
    p = int(pm.group(1)) if pm else -1

    def _value_of(key: bytes) -> bytes:
        m1 = re.search(rb"/" + key + rb"\s*[(<]", enc_dict)
        if not m1:
            raise ValueError(f"encryption dict missing /{key.decode()}")
        pos = m1.end() - 1
        if enc_dict[pos] == 0x28:  # (
            return _literal_strings(enc_dict[pos:])[0]
        m2 = re.match(rb"<([0-9A-Fa-f]+)>", enc_dict[pos:])
        if not m2:
            raise ValueError(f"malformed hex string for /{key.decode()}")
        hexdigits = m2.group(1)
        if len(hexdigits) % 2:  # spec 7.3.4.3: odd count implies a 0
            hexdigits += b"0"
        return bytes.fromhex(hexdigits.decode("ascii"))

    o_value = _value_of(b"O")
    u_value = _value_of(b"U")
    if v == 5:
        # AES-256 (ISO 32000-2 7.6.4.4): /U is hash(32) + validation
        # salt(8) + key salt(8); R6 hashes with Algorithm 2.B, the
        # deprecated R5 with a single SHA-256
        if r not in (5, 6):
            raise ValueError(f"/V 5 with revision {r}")
        hashed = (
            hash_2b(user_pw, u_value[32:40]) if r == 6
            else _hashlib.sha256(user_pw + u_value[32:40]).digest()
        )
        if hashed != u_value[:32]:
            raise ValueError(
                "user password does not authenticate (U mismatch)"
            )
        ue_value = _value_of(b"UE")
        ikey = (
            hash_2b(user_pw, u_value[40:48]) if r == 6
            else _hashlib.sha256(user_pw + u_value[40:48]).digest()
        )
        file_key = _aes_cbc_decrypt(
            ue_value, ikey, bytes(16), pad=False
        )
        try:
            perms = _value_of(b"Perms")
        except ValueError:
            perms = None
        if perms is not None:
            blk = _aes_decrypt_block(perms[:16], file_key)
            if blk[9:12] != b"adb":
                raise ValueError(
                    "/Perms does not verify under the file key"
                )
        return _Decryptor(file_key, "aesv3")
    cfm = _dict_name(enc_dict, b"CFM") if v == 4 else None
    if v == 4 and cfm not in ("AESV2", "V2"):
        raise NotImplementedError(f"/V 4 crypt filter /CFM {cfm}")
    if v == 4 and cfm == "AESV2":
        n = 16
    file_id = _hex_or_literal_id(trailer)
    key = compute_encryption_key(user_pw, o_value, p, file_id, n, r)
    want_u = compute_u_value(key, file_id, r)
    got, want = u_value[:16], want_u[:16]
    if r == 2:
        got, want = u_value[:32], want_u[:32]
    if got != want:
        raise ValueError(
            "user password does not authenticate (U mismatch)"
        )
    return _Decryptor(key, "aesv2" if cfm == "AESV2" else "rc4")


@guard("pdf-objstm")
def parse_objstm(dict_bytes: bytes, data: bytes) -> dict[int, bytes]:
    """Unpack a /Type /ObjStm payload (7.5.7): /N integer pairs
    `objnum offset` relative to /First, each an embedded non-stream
    object body."""
    n = _dict_int(dict_bytes, b"N")
    first = _dict_int(dict_bytes, b"First")
    if n is None or first is None:
        raise ValueError("ObjStm missing /N or /First")
    if data is None:
        raise ValueError("ObjStm stream data undecodable")
    if n < 0 or first < 0:
        raise ValueError(f"ObjStm negative /N {n} or /First {first}")
    nums = [int(x) for x in data[:first].split()]
    if len(nums) < 2 * n:
        raise ValueError("ObjStm header shorter than /N pairs")
    out: dict[int, bytes] = {}
    for k in range(n):
        objnum, off = nums[2 * k], nums[2 * k + 1]
        end = nums[2 * k + 3] if k + 1 < n else None
        out[objnum] = data[
            first + off : (first + end) if end is not None else None
        ].strip()
    return out


@guard("pdf-xref-stream")
def parse_xref_stream(dict_bytes: bytes, data: bytes) -> dict[int, tuple]:
    """Decode a /Type /XRef stream (7.5.8): /W field widths over
    /Index subsections.  Returns {objnum: (type, f2, f3)} where type
    1 is (offset, gen) and type 2 is (container_objstm, index)."""
    w = _dict_ints(dict_bytes, b"W")
    if not w:
        raise ValueError("XRef stream missing /W")
    if data is None:
        raise ValueError("XRef stream data undecodable")
    if any(x < 0 for x in w) or sum(w) < 1:
        raise ValueError(f"XRef stream bad /W {w}")
    size = _dict_int(dict_bytes, b"Size") or 0
    index = _dict_ints(dict_bytes, b"Index") or [0, size]
    rowlen = sum(w)
    entries: dict[int, tuple] = {}
    pos = 0
    for s in range(0, len(index), 2):
        start, count = index[s], index[s + 1]
        if count < 0 or count * rowlen > len(data) - pos:
            raise ValueError("XRef /Index overruns stream data")
        for objnum in range(start, start + count):
            row = data[pos : pos + rowlen]
            if len(row) < rowlen:
                raise ValueError("XRef stream shorter than /Index")
            fields = []
            o = 0
            for width in w:
                fields.append(
                    int.from_bytes(row[o : o + width], "big")
                    if width else (1 if not fields else 0)
                )
                o += width
            entries[objnum] = tuple(fields)
            pos += rowlen
    return entries


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _literal_strings(data: bytes) -> list[bytes]:
    """All (...) literal strings with escape + nesting rules."""
    out = []
    i, n = 0, len(data)
    while i < n:
        if data[i : i + 1] != b"(":
            i += 1
            continue
        depth = 1
        i += 1
        buf = bytearray()
        while i < n and depth:
            c = data[i]
            if c == 0x5C and i + 1 < n:  # backslash
                nxt = data[i + 1]
                if nxt in _ESCAPES:
                    buf += _ESCAPES[nxt]
                    i += 2
                elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                    j = i + 1
                    oct_digits = bytearray()
                    while j < n and len(oct_digits) < 3 and 0x30 <= data[j] <= 0x37:
                        oct_digits.append(data[j])
                        j += 1
                    buf.append(int(oct_digits.decode(), 8) & 0xFF)
                    i = j
                else:
                    buf.append(nxt)
                    i += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            buf.append(c)
            i += 1
        out.append(bytes(buf))
    return out


_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def _content_tokens(data: bytes):
    """Token stream over a content stream: ('str', bytes),
    ('[', None), (']', None), ('op', bytes); numbers/names/dicts are
    skipped structurally (strings inside them never alias show
    operators)."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # comment
            j = data.find(b"\n", i)
            i = (j + 1) if j >= 0 else n
        elif c == 0x28:  # (string)
            j = _skip_string(data, i)
            yield ("str", data[i:j])
            i = j
        elif data[i : i + 2] == b"<<":
            i = _scan_dict(data, i)
        elif c == 0x3C:  # <hex string>
            j = data.find(b">", i + 1)
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j if j >= 0 else n])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("str", b"(" + bytes.fromhex(hexs.decode()) + b")")
            i = (j + 1) if j >= 0 else n
        elif c == 0x5B:
            yield ("[", None)
            i += 1
        elif c == 0x5D:
            yield ("]", None)
            i += 1
        elif c == 0x2F:  # /name
            m = _NAME_RE.match(data, i)
            i = m.end() if m else i + 1
        else:
            m = _NUM_RE.match(data, i)
            if m:
                i = m.end()
                continue
            m = _OP_RE.match(data, i)
            if m:
                yield ("op", m.group(0))
                i = m.end()
            else:
                i += 1


def extract_text_runs(content: bytes) -> list[str]:
    """Show-operator strings inside BT..ET blocks -- Tj, ', \" (whose
    string is the THIRD operand, after aw and ac), and every string
    element of a TJ array -- in stream order.  Token-level scan, so a
    literal `]` or `"` inside a string cannot derail the walk."""
    runs: list[str] = []
    in_text = False
    last_str: bytes | None = None
    arr: list[bytes] | None = None
    for kind, val in _content_tokens(content):
        if kind == "str":
            if arr is not None:
                arr.append(val)
            last_str = val
        elif kind == "[":
            arr = []
        elif kind == "]":
            pass  # keep arr until the operator consumes it
        elif kind == "op":
            if val == b"BT":
                in_text = True
            elif val == b"ET":
                in_text = False
            elif in_text and val in (b"Tj", b"'", b'"'):
                if last_str is not None:
                    for s in _literal_strings(last_str):
                        runs.append(s.decode("latin-1"))
            elif in_text and val == b"TJ" and arr is not None:
                for el in arr:
                    for s in _literal_strings(el):
                        runs.append(s.decode("latin-1"))
            # postfix grammar: every operator consumes its operands
            arr = None
            last_str = None
    return runs


@guard("pdf")
def parse_pdf(blob: bytes) -> dict:
    """Syntax-level document profile: version, object census, page
    count via the page tree, text runs from page content streams.

    Handles both xref flavors: classic `trailer` dictionaries and
    PDF 1.5 cross-reference streams (whose dict IS the trailer), and
    unpacks /ObjStm object streams so compressed catalogs/page nodes
    resolve.  n_objects counts LOGICAL document objects -- the
    /ObjStm and /XRef containers are xref plumbing, excluded so the
    same document profiles identically under either serialization."""
    m = re.match(rb"%PDF-(\d+\.\d+)", blob)
    if not m:
        raise ValueError("not a PDF: missing %PDF header")
    version = m.group(1).decode("ascii")
    scanned = _scan_objects(blob)
    xref_dicts: list[bytes] = []
    n_containers = 0
    objects: dict[int, _PdfObj] = {}
    objstm_data: list[tuple[bytes, _PdfObj, int]] = []
    for num, obj in scanned.items():
        t = _dict_name(obj.dict, b"Type")
        if t == "ObjStm":
            n_containers += 1
            objstm_data.append((obj.dict, obj, num))
        elif t == "XRef":
            n_containers += 1
            xref_dicts.append(obj.dict)
            # decode eagerly so a corrupt xref stream (bad /W,
            # truncated rows, broken predictor) is a loud error;
            # the XRef stream is NEVER encrypted (7.5.8.2)
            parse_xref_stream(
                obj.dict, _decode_stream(obj.dict, obj.raw_stream)
            )
        objects[num] = obj
    trailer_dicts: list[bytes] = []
    tr = blob.rfind(b"trailer")
    if tr >= 0:
        tend = blob.find(b">>", tr)
        trailer_dicts.append(blob[tr : tend + 2 if tend >= 0 else None])
    trailer_dicts.extend(xref_dicts)
    # standard security handler: the common crawled case is an
    # owner-locked file with an EMPTY user password -- readable by
    # design, so open it (RC4 /V 1-2; AES raises named)
    decryptor = None
    if any(b"/Encrypt" in t for t in trailer_dicts):
        enc_refs: list[int] = []
        for t in trailer_dicts:
            enc_refs.extend(_parse_dict_refs(t, b"Encrypt"))
        enc_obj = next(
            (objects[rf] for rf in enc_refs if rf in objects), None
        )
        if enc_obj is None:
            raise NotImplementedError(
                "encrypted PDF: /Encrypt dictionary unresolved"
            )
        decryptor = open_standard_security(
            enc_obj.dict, b" ".join(trailer_dicts)
        )
    for d, obj, num in objstm_data:
        raw = obj.raw_stream
        if decryptor is not None and raw is not None:
            raw = decryptor.decrypt(num, raw)
        for objnum, body in parse_objstm(
            d, _decode_stream(d, raw)
        ).items():
            # xref order of precedence: a direct (uncompressed)
            # definition seen by the scanner wins over a compressed
            # twin, matching incremental-update semantics well enough
            # for a profile pass
            objects.setdefault(objnum, _PdfObj(body, None, None))
    root_ids: list[int] = []
    for t in trailer_dicts:
        root_ids.extend(_parse_dict_refs(t, b"Root"))
    if not root_ids:
        root_ids = [
            num
            for num, o in objects.items()
            if _dict_name(o.dict, b"Type") == "Catalog"
        ]
    n_pages = 0
    page_objs: list[int] = []
    if root_ids and root_ids[0] in objects:
        stack = _parse_dict_refs(objects[root_ids[0]].dict, b"Pages")
        seen: set[int] = set()
        while stack:
            num = stack.pop()
            if num in seen or num not in objects:
                continue
            seen.add(num)
            body = objects[num].dict
            t = _dict_name(body, b"Type")
            if t == "Pages":
                stack.extend(_parse_dict_refs(body, b"Kids"))
            elif t == "Page":
                n_pages += 1
                page_objs.append(num)
    text_runs: list[str] = []
    for num in sorted(page_objs):
        for cnum in _parse_dict_refs(objects[num].dict, b"Contents"):
            if cnum in objects and objects[cnum].raw_stream is not None:
                raw = objects[cnum].raw_stream
                if decryptor is not None:
                    # decryption precedes filters (7.6.2: the stream
                    # is encrypted AFTER filtering at write time)
                    raw = decryptor.decrypt(cnum, raw)
                data = _decode_stream(objects[cnum].dict, raw)
                text_runs.extend(extract_text_runs(data))
    return {
        "version": version,
        "n_objects": len(objects) - n_containers,
        "n_pages": n_pages,
        "text": " ".join(text_runs),
    }


def build_pdf(
    pages: list[list[str]], compress: bool = False,
    version: str = "1.7",
) -> bytes:
    """Minimal valid PDF: catalog, page tree, one content stream per
    page showing the given text runs (Flate-compressed when asked)."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    content_ids = []
    for runs in pages:
        content_ids.append(add(_content_stream_body(runs, compress)))
    kids = []
    pages_id = len(objs) + len(pages) + 2  # after page objs: catalog, pages
    for cid in content_ids:
        kids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /Contents %d 0 R "
                b"/MediaBox [0 0 612 792] >>" % (pages_id, cid)
            )
        )
    catalog_id = add(b"")  # placeholder, rewritten below
    real_pages_id = add(
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % k for k in kids)
        + b"] /Count %d >>" % len(kids)
    )
    objs[catalog_id - 1] = b"<< /Type /Catalog /Pages %d 0 R >>" % real_pages_id
    out = bytearray(b"%%PDF-%s\n" % version.encode("ascii"))
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_id, xref_at)
    )
    return bytes(out)


def _content_stream_body(runs: list[str], compress: bool) -> bytes:
    ops = b"BT /F1 12 Tf 72 720 Td " + b" ".join(
        b"(" + r.encode("latin-1")
        .replace(b"\\", rb"\\")
        .replace(b"(", rb"\(")
        .replace(b")", rb"\)") + b") Tj"
        for r in runs
    ) + b" ET"
    if compress:
        z = zlib.compress(ops)
        return (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z)
            + z + b"\nendstream"
        )
    return (
        b"<< /Length %d >>\nstream\n" % len(ops) + ops + b"\nendstream"
    )


def build_pdf_encrypted(
    pages: list[list[str]],
    compress: bool = False,
    r: int = 3,
    key_bits: int = 128,
    owner_pw: bytes = b"owner",
    user_pw: bytes = b"",
    version: str = "1.4",
) -> bytes:
    """The same logical document as `build_pdf`, protected by the
    standard security handler (7.6.3): revision selects the wire
    form -- R2 = /V 1 (RC4-40), R3 = /V 2 (RC4-n), R4 = /V 4 with
    the /AESV2 crypt filter (AES-128-CBC), R6 = /V 5 /AESV3
    (AES-256, Algorithm 2.B key derivation, /UE /OE /Perms).  The
    default empty user password is the owner-locked form crawls
    actually see."""
    p = -44  # permission bits: a typical owner-locked value
    file_id = _hashlib.md5(
        repr(pages).encode() + bytes([r & 0xFF, key_bits & 0xFF])
    ).digest()
    if r == 6:
        v, n = 5, 32
        # deterministic builds: salts and the file key derive from
        # the document identity (randomness adds nothing to a
        # synthesize->parse gate)
        uvs = _hashlib.md5(file_id + b"uvs").digest()[:8]
        uks = _hashlib.md5(file_id + b"uks").digest()[:8]
        ovs = _hashlib.md5(file_id + b"ovs").digest()[:8]
        oks = _hashlib.md5(file_id + b"oks").digest()[:8]
        key = _hashlib.sha256(file_id + b"filekey").digest()
        u_val = hash_2b(user_pw, uvs) + uvs + uks
        ue_val = _aes_cbc_encrypt(
            key, hash_2b(user_pw, uks), bytes(16), pad=False
        )
        o_val = hash_2b(owner_pw, ovs, u_val) + ovs + oks
        oe_val = _aes_cbc_encrypt(
            key, hash_2b(owner_pw, oks, u_val), bytes(16), pad=False
        )
        perms_val = _aes_encrypt_block(
            (p & 0xFFFFFFFF).to_bytes(4, "little")
            + b"\xff\xff\xff\xffTadb"
            + file_id[:4],
            key,
        )
    elif r == 4:
        v, n = 4, 16
        o_val = compute_o_value(owner_pw, user_pw, n, r)
        key = compute_encryption_key(user_pw, o_val, p, file_id, n, r)
        u_val = compute_u_value(key, file_id, r)
    else:
        n = key_bits // 8 if r >= 3 else 5
        v = 2 if r >= 3 else 1
        o_val = compute_o_value(owner_pw, user_pw, n, r)
        key = compute_encryption_key(user_pw, o_val, p, file_id, n, r)
        u_val = compute_u_value(key, file_id, r)

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    def _encrypt_payload(num: int, payload: bytes) -> bytes:
        if r == 6:
            iv = _hashlib.md5(file_id + b"iv%d" % num).digest()
            return iv + _aes_cbc_encrypt(payload, key, iv)
        if r == 4:
            okey = _object_key(key, num, aes=True)
            iv = _hashlib.md5(file_id + b"iv%d" % num).digest()
            return iv + _aes_cbc_encrypt(payload, okey, iv)
        return _rc4(_object_key(key, num), payload)

    content_ids = []
    for runs in pages:
        num = len(objs) + 1
        body = _content_stream_body(runs, compress)
        i = body.index(b"stream\n") + 7
        j = body.rindex(b"\nendstream")
        enc = _encrypt_payload(num, body[i:j])
        # AES grows the payload (IV + CBC padding): rewrite /Length
        dict_part = body[:i]
        dict_part = re.sub(
            rb"/Length \d+", b"/Length %d" % len(enc), dict_part
        )
        content_ids.append(add(dict_part + enc + body[j:]))
    kids = []
    pages_id = len(objs) + len(pages) + 2
    for cid in content_ids:
        kids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /Contents %d 0 R "
                b"/MediaBox [0 0 612 792] >>" % (pages_id, cid)
            )
        )
    catalog_id = add(b"")
    real_pages_id = add(
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % k for k in kids)
        + b"] /Count %d >>" % len(kids)
    )
    objs[catalog_id - 1] = (
        b"<< /Type /Catalog /Pages %d 0 R >>" % real_pages_id
    )
    if r == 6:
        enc_id = add(
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d "
            b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> "
            b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
            b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF >>"
            % (
                p,
                o_val.hex().encode("ascii"),
                u_val.hex().encode("ascii"),
                oe_val.hex().encode("ascii"),
                ue_val.hex().encode("ascii"),
                perms_val.hex().encode("ascii"),
            )
        )
    elif r == 4:
        enc_id = add(
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d "
            b"/O <%s> /U <%s> "
            b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
            b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF >>"
            % (
                p,
                o_val.hex().encode("ascii"),
                u_val.hex().encode("ascii"),
            )
        )
    else:
        enc_id = add(
            b"<< /Filter /Standard /V %d /R %d /Length %d /P %d "
            b"/O <%s> /U <%s> >>"
            % (
                v, r, n * 8, p,
                o_val.hex().encode("ascii"),
                u_val.hex().encode("ascii"),
            )
        )
    out = bytearray(b"%%PDF-%s\n" % version.encode("ascii"))
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R /Encrypt %d 0 R "
        b"/ID [<%s> <%s>] >>\nstartxref\n%d\n%%%%EOF\n"
        % (
            len(objs) + 1, catalog_id, enc_id,
            file_id.hex().encode("ascii"),
            file_id.hex().encode("ascii"),
            xref_at,
        )
    )
    return bytes(out)


def _png_predict_up(data: bytes, columns: int) -> bytes:
    """Forward PNG Up predictor (tag 2) -- how real PDF writers
    serialize xref streams (/Predictor 12)."""
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns):
        row = data[r : r + columns]
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def build_pdf_xrefstream(
    pages: list[list[str]], compress: bool = False,
    version: str = "1.5",
) -> bytes:
    """The SAME logical document as `build_pdf`, serialized the
    post-2006 way (ISO 32000-1 7.5.7/7.5.8): catalog + page-tree
    nodes packed into a Flate-compressed /ObjStm, content streams as
    top-level stream objects (streams cannot live in an ObjStm), and
    a /Type /XRef cross-reference stream (W=[1 3 2], PNG Up
    predictor) carrying the trailer dict -- no `trailer` keyword
    anywhere."""
    n_p = len(pages)
    # numbering: contents 1..P, pages P+1..2P, catalog 2P+1,
    # pages-node 2P+2, ObjStm 2P+3, XRef 2P+4
    catalog_id, pagesnode_id = 2 * n_p + 1, 2 * n_p + 2
    objstm_id, xref_id = 2 * n_p + 3, 2 * n_p + 4
    out = bytearray(b"%%PDF-%s\n" % version.encode("ascii"))
    offsets: dict[int, int] = {}
    for i, runs in enumerate(pages, start=1):
        offsets[i] = len(out)
        out += b"%d 0 obj\n" % i
        out += _content_stream_body(runs, compress)
        out += b"\nendobj\n"
    # the compressed objects: page dicts, catalog, pages node
    packed: list[tuple[int, bytes]] = []
    for i in range(1, n_p + 1):
        packed.append((
            n_p + i,
            b"<< /Type /Page /Parent %d 0 R /Contents %d 0 R "
            b"/MediaBox [0 0 612 792] >>" % (pagesnode_id, i),
        ))
    packed.append((
        catalog_id,
        b"<< /Type /Catalog /Pages %d 0 R >>" % pagesnode_id,
    ))
    packed.append((
        pagesnode_id,
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % (n_p + i) for i in range(1, n_p + 1))
        + b"] /Count %d >>" % n_p,
    ))
    bodies = b" ".join(b for _, b in packed)
    hdr_parts, off = [], 0
    for num, b in packed:
        hdr_parts.append(b"%d %d" % (num, off))
        off += len(b) + 1  # the single joining space
    hdr = b" ".join(hdr_parts) + b"\n"
    objstm_payload = zlib.compress(hdr + bodies)
    offsets[objstm_id] = len(out)
    out += b"%d 0 obj\n" % objstm_id
    out += (
        b"<< /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n"
        % (len(packed), len(hdr), len(objstm_payload))
    )
    out += objstm_payload + b"\nendstream\nendobj\n"
    # xref stream rows, W = [1 3 2]: type, offset|objstm, gen|index
    offsets[xref_id] = len(out)
    size = xref_id + 1
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(3, "big") + (65535).to_bytes(2, "big")
    for num in range(1, size):
        if n_p < num <= pagesnode_id:  # compressed in the ObjStm
            idx = next(
                k for k, (pn, _) in enumerate(packed) if pn == num
            )
            rows += bytes([2]) + objstm_id.to_bytes(3, "big") \
                + idx.to_bytes(2, "big")
        else:
            rows += bytes([1]) + offsets[num].to_bytes(3, "big") \
                + (0).to_bytes(2, "big")
    xref_payload = zlib.compress(_png_predict_up(bytes(rows), 6))
    out += b"%d 0 obj\n" % xref_id
    out += (
        b"<< /Type /XRef /Size %d /W [1 3 2] /Root %d 0 R "
        b"/Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 6 >> /Length %d "
        b">>\nstream\n" % (size, catalog_id, len(xref_payload))
    )
    out += xref_payload + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % offsets[xref_id]
    return bytes(out)


def _pdf_params(mid: int) -> tuple[int, int, int]:
    """(n_pages, runs_per_page, compressed), oracle-mirrored."""
    return 1 + mid % 4, 1 + mid % 3, mid % 2


def _pdf_blob(mid: int) -> bytes:
    n_pages, rpp, comp = _pdf_params(mid)
    pages = [
        [f"doc-{mid} page-{p} run-{r}" for r in range(rpp)]
        for p in range(n_pages)
    ]
    return build_pdf(pages, compress=bool(comp))


def synthesize_pdf(documents: DataFrame) -> DataFrame:
    return _synthesize_media(documents, _pdf_blob)


def _pdf_enc_blob(mid: int) -> bytes:
    """The same logical document as `_pdf_blob(mid)`, owner-locked
    with an empty user password, cycling R3/RC4-128, R2/RC4-40 and
    R4/AESV2 (AES-128-CBC).  R6/AESV3 round-trips in pytest but is
    kept out of the gate: ISO 32000-2 Algorithm 2.B burns thousands
    of AES blocks per document BY DESIGN (anti-brute-force), which
    would dominate the gate's wall time without adding oracle
    signal.  The %PDF version header stays 1.4 so the profile oracle
    is encryption-form-invariant (the header is cosmetic to the
    security handler)."""
    n_pages, rpp, comp = _pdf_params(mid)
    pages = [
        [f"doc-{mid} page-{p} run-{r}" for r in range(rpp)]
        for p in range(n_pages)
    ]
    r_form, bits = [(3, 128), (2, 40), (4, 128)][mid % 3]
    return build_pdf_encrypted(
        pages,
        compress=bool(comp),
        r=r_form,
        key_bits=bits,
    )


def synthesize_pdf_encrypted(documents: DataFrame) -> DataFrame:
    return _synthesize_media(documents, _pdf_enc_blob)


def _pdf_xs_blob(mid: int) -> bytes:
    """The SAME logical document as `_pdf_blob(mid)`, serialized with
    a cross-reference stream + object streams (PDF 1.5)."""
    n_pages, rpp, comp = _pdf_params(mid)
    pages = [
        [f"doc-{mid} page-{p} run-{r}" for r in range(rpp)]
        for p in range(n_pages)
    ]
    return build_pdf_xrefstream(pages, compress=bool(comp))


def synthesize_pdf_xrefstream(documents: DataFrame) -> DataFrame:
    return _synthesize_media(documents, _pdf_xs_blob)


PDF_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("version", StringType()),
        StructField("n_objects", IntegerType()),
        StructField("n_pages", IntegerType()),
        StructField("n_chars", LongType()),
        StructField("text_head", StringType()),
    ]
)


def pdf_profile(media: DataFrame) -> DataFrame:
    """Per-file PDF routing profile: version, object/page census,
    extracted-text length and head sample."""

    def _walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = {k.name: [] for k in PDF_SCHEMA.fields}
            for mid, blob in zip(
                pdf_batch["media_id"], pdf_batch["content"]
            ):
                d = parse_pdf(bytes(blob))
                rows["media_id"].append(int(mid))
                rows["version"].append(d["version"])
                rows["n_objects"].append(d["n_objects"])
                rows["n_pages"].append(d["n_pages"])
                rows["n_chars"].append(len(d["text"]))
                rows["text_head"].append(d["text"][:64])
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _walk, PDF_SCHEMA
    )


# --------------------------------------------------------------------
# OpenType / TrueType font tables (sfnt wrapper; OpenType spec ch. 4)
# --------------------------------------------------------------------
#
# Web fonts travel beside documents; the routing profile needs the
# sfnt table directory (sfntVersion 0x00010000 / 'OTTO', big-endian
# table records), the 'head' table (unitsPerEm, bounding box,
# indexToLocFormat) and the 'name' table's family-name record
# (nameID 1, platform 3 encoding 1 UTF-16BE or platform 1 Latin-1).
# Glyph rasterization is out of scope by construction.

import struct as _struct


def build_sfnt(
    tables: list[tuple[bytes, bytes]], version: bytes = b"\x00\x01\x00\x00"
) -> bytes:
    """sfnt wrapper with correct searchRange fields and offsets."""
    n = len(tables)
    entry_selector = max(0, n.bit_length() - 1)
    search_range = (1 << entry_selector) * 16
    hdr = version + _struct.pack(
        ">HHHH", n, search_range, entry_selector, n * 16 - search_range
    )
    offset = 12 + 16 * n
    records = b""
    blobs = b""
    for tag, data in sorted(tables):
        records += tag + _struct.pack(">III", 0, offset, len(data))
        pad = (-len(data)) % 4
        blobs += data + b"\x00" * pad
        offset += len(data) + pad
    return hdr + records + blobs


def build_head_table(units_per_em: int, bbox: tuple[int, int, int, int]) -> bytes:
    return _struct.pack(
        ">IIIIHHqqhhhhHHhhh",
        0x00010000,  # version
        0,  # fontRevision
        0,  # checkSumAdjustment
        0x5F0F3CF5,  # magicNumber
        0,  # flags
        units_per_em,
        0, 0,  # created, modified
        bbox[0], bbox[1], bbox[2], bbox[3],
        0,  # macStyle
        8,  # lowestRecPPEM
        2,  # fontDirectionHint
        0,  # indexToLocFormat
        0,  # glyphDataFormat
    )


def build_name_table(family: str) -> bytes:
    s = family.encode("utf-16-be")
    # one record: platform 3 (Windows), encoding 1, language 0x409,
    # nameID 1 (family)
    hdr = _struct.pack(">HHH", 0, 1, 6 + 12)
    rec = _struct.pack(">HHHHHH", 3, 1, 0x409, 1, len(s), 0)
    return hdr + rec + s


@guard("sfnt")
def parse_sfnt(blob: bytes) -> dict:
    """Table census + head/name decode."""
    if len(blob) < 12:
        raise ValueError("truncated sfnt header")
    version = blob[:4]
    if version not in (b"\x00\x01\x00\x00", b"OTTO", b"true"):
        raise ValueError(f"not an sfnt font: version {version!r}")
    n = _struct.unpack_from(">H", blob, 4)[0]
    tables = {}
    for i in range(n):
        off = 12 + 16 * i
        if off + 16 > len(blob):
            raise ValueError("truncated table directory")
        tag = blob[off : off + 4]
        _, toff, tlen = _struct.unpack_from(">III", blob, off + 4)
        if toff + tlen > len(blob):
            raise ValueError(f"table {tag!r} overruns file")
        tables[tag.decode("latin-1")] = blob[toff : toff + tlen]
    out = {
        "flavor": "cff" if version == b"OTTO" else "truetype",
        "n_tables": n,
        "tags": sorted(tables),
        "units_per_em": 0,
        "family": "",
    }
    head = tables.get("head")
    if head is not None:
        if _struct.unpack_from(">I", head, 12)[0] != 0x5F0F3CF5:
            raise ValueError("bad head magicNumber")
        out["units_per_em"] = _struct.unpack_from(">H", head, 18)[0]
    name = tables.get("name")
    if name is not None:
        cnt, str_off = _struct.unpack_from(">HH", name, 2)[0], \
            _struct.unpack_from(">H", name, 4)[0]
        for i in range(cnt):
            rec = name[6 + 12 * i : 18 + 12 * i]
            pid, eid, _, nid, ln, off = _struct.unpack(">HHHHHH", rec)
            if nid != 1:
                continue
            raw = name[str_off + off : str_off + off + ln]
            out["family"] = (
                raw.decode("utf-16-be") if pid == 3 else
                raw.decode("latin-1")
            )
            break
    return out


# --------------------------------------------------------------------
# WOFF 1.0 wrapper (W3C WOFF File Format 1.0)
# --------------------------------------------------------------------
#
# Web fonts on real crawls travel overwhelmingly as WOFF: the sfnt
# tables above, individually zlib-compressed behind a 44-byte header
# and a 20-byte-per-table directory.  WOFF2 uses Brotli, which this
# container does not ship -- it raises a named NotImplementedError.

import zlib as _zlib



def build_woff(
    tables: list[tuple[bytes, bytes]],
    flavor: bytes = b"\x00\x01\x00\x00",
    compress: bool = True,
) -> bytes:
    """WOFF 1.0 file from (tag, data) tables: header, directory
    (orig checksum left 0 -- validators recompute), per-table zlib
    when it actually shrinks (the spec requires compLength <
    origLength for compressed tables)."""
    entries = []
    blobs = []
    offset = 44 + 20 * len(tables)
    total_sfnt = 12 + 16 * len(tables)
    for tag, data in sorted(tables):
        comp = _zlib.compress(data) if compress else data
        if len(comp) >= len(data):
            comp = data
        pad = (-len(comp)) % 4
        entries.append(
            tag + _struct.pack(">IIII", offset, len(comp), len(data), 0)
        )
        blobs.append(comp + b"\x00" * pad)
        offset += len(comp) + pad
        total_sfnt += len(data) + ((-len(data)) % 4)
    hdr = b"wOFF" + flavor + _struct.pack(
        ">IHHIHHIIIII",
        offset,  # total file length
        len(tables),
        0,  # reserved
        total_sfnt,
        1, 0,  # major/minor version
        0, 0, 0,  # metaOffset/metaLength/metaOrigLength
        0, 0,  # privOffset/privLength
    )
    return hdr + b"".join(entries) + b"".join(blobs)


@guard("woff")
def parse_woff(blob: bytes) -> dict:
    """WOFF 1.0 -> the same profile as parse_sfnt, by decompressing
    the tables and rebuilding the logical sfnt (so the head/name
    decoding path is literally shared)."""
    if blob[:4] == b"wOF2":
        raise NotImplementedError(
            "WOFF2 needs a Brotli codec, not shipped here"
        )
    if blob[:4] != b"wOFF":
        raise ValueError(f"not a WOFF file: signature {blob[:4]!r}")
    flavor = blob[4:8]
    total_len, num_tables = _struct.unpack_from(">IH", blob, 8)
    if total_len != len(blob):
        raise ValueError(
            f"WOFF length field {total_len} != file size {len(blob)}"
        )
    tables: list[tuple[bytes, bytes]] = []
    for i in range(num_tables):
        off = 44 + 20 * i
        tag = blob[off : off + 4]
        t_off, comp_len, orig_len, _ = _struct.unpack_from(
            ">IIII", blob, off + 4
        )
        if t_off + comp_len > len(blob):
            raise ValueError(f"table {tag!r} overruns file")
        raw = blob[t_off : t_off + comp_len]
        if comp_len < orig_len:
            try:
                data = _zlib.decompress(raw)
            except _zlib.error as exc:
                raise ValueError(
                    f"table {tag!r} zlib payload is corrupt: {exc}"
                ) from exc
        else:
            data = raw
        if len(data) != orig_len:
            raise ValueError(
                f"table {tag!r} decompressed to {len(data)} bytes, "
                f"directory says {orig_len}"
            )
        tables.append((tag, data))
    out = parse_sfnt(build_sfnt(tables, version=flavor))
    out["container"] = "woff"
    return out


def _woff_blob(mid: int) -> bytes:
    flavor, upm, family = _font_params(mid)
    tables = [
        (b"head", build_head_table(upm, (-100, -200, 1500, 1800))),
        (b"name", build_name_table(family)),
        (b"hhea", bytes(36)),
        (b"maxp", _struct.pack(">IH", 0x00005000, 100 + mid % 50)),
    ]
    return build_woff(
        tables,
        flavor=b"OTTO" if flavor == "cff" else b"\x00\x01\x00\x00",
        compress=mid % 2 == 0,  # exercise both stored and deflated
    )


def synthesize_woff(documents: DataFrame) -> DataFrame:
    return _synthesize_media(documents, _woff_blob)


def woff_profile(media: DataFrame) -> DataFrame:
    """Per-file WOFF web-font routing profile (same columns as
    font_profile -- the wrapper is transport)."""

    def _walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = {k.name: [] for k in FONT_SCHEMA.fields}
            for mid, blob in zip(
                pdf_batch["media_id"], pdf_batch["content"]
            ):
                d = parse_woff(bytes(blob))
                rows["media_id"].append(int(mid))
                rows["flavor"].append(d["flavor"])
                rows["n_tables"].append(d["n_tables"])
                rows["units_per_em"].append(d["units_per_em"])
                rows["family"].append(d["family"])
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _walk, FONT_SCHEMA
    )


def _font_params(mid: int) -> tuple[str, int, str]:
    flavor = "cff" if mid % 3 == 0 else "truetype"
    upm = [1000, 2048, 1024, 2000][mid % 4]
    family = f"Corpus Sans {mid % 29}"
    return flavor, upm, family


def _font_blob(mid: int) -> bytes:
    flavor, upm, family = _font_params(mid)
    tables = [
        (b"head", build_head_table(upm, (-100, -200, 1500, 1800))),
        (b"name", build_name_table(family)),
        (b"hhea", bytes(36)),
        (b"maxp", _struct.pack(">IH", 0x00005000, 100 + mid % 50)),
    ]
    return build_sfnt(
        tables, version=b"OTTO" if flavor == "cff" else b"\x00\x01\x00\x00"
    )


def synthesize_fonts(documents: DataFrame) -> DataFrame:
    return _synthesize_media(documents, _font_blob)


FONT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("flavor", StringType()),
        StructField("n_tables", IntegerType()),
        StructField("units_per_em", IntegerType()),
        StructField("family", StringType()),
    ]
)


def font_profile(media: DataFrame) -> DataFrame:
    """Per-file web-font routing profile."""

    def _walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = {k.name: [] for k in FONT_SCHEMA.fields}
            for mid, blob in zip(
                pdf_batch["media_id"], pdf_batch["content"]
            ):
                d = parse_sfnt(bytes(blob))
                rows["media_id"].append(int(mid))
                rows["flavor"].append(d["flavor"])
                rows["n_tables"].append(d["n_tables"])
                rows["units_per_em"].append(d["units_per_em"])
                rows["family"].append(d["family"])
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _walk, FONT_SCHEMA
    )
