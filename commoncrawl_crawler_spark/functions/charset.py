"""Charset detection / transcode-to-UTF-8 (SURVEY.md section 2.8).

Reference: util/CharsetUtils.java (~300 LoC) detects the encoding of
fetched bytes (Mozilla nsDetector, then ICU, :259-310) and transcodes
to UTF-8 before parsing (ParserMapper uses it on every document).

Tiered implementation (DEFAULT = all tiers):
1. BOM sniff, then strict-UTF-8 trial decode -- exact, deterministic.
2. `charset_normalizer` statistical detection, accepted ONLY for
   multi-byte families (Shift-JIS/CP932, EUC-JP, GBK/GB18030, Big5,
   EUC-KR/CP949, UTF-16/32): those have structural signatures a
   detector identifies reliably -- the reference's Mozilla/ICU
   detectors played the same role.
3. Latin-1 otherwise. Single-byte charsets are statistically
   near-indistinguishable (the detector labels French Latin-1 as
   Baltic cp1257); latin-1 is the byte-preserving deterministic
   choice, so the same 100 TB corpus transcodes identically across
   executors, releases, and detector versions.

Pass use_library=False to pin the pure ladder (tier 2 skipped).
All kernels run Arrow-batched.
"""

from __future__ import annotations

import codecs
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

try:  # detection tier; the ladder below works without it
    from charset_normalizer import from_bytes as _cn_from_bytes
except ImportError:  # pragma: no cover - environment-dependent
    _cn_from_bytes = None

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

#: detector verdicts we trust: CJK multi-byte encodings with
#: structural signatures (codecs-canonical names). Single-byte
#: detections are rejected in favor of the deterministic latin-1
#: fallback, and UTF-16/32 verdicts are NOT trusted either -- real
#: UTF-16/32 documents carry a BOM (caught by tier 1), while BOM-less
#: short Latin-1 strings routinely misdetect as utf_16_be.
_TRUSTED_DETECTIONS = frozenset(
    {
        "cp932",
        "shift_jis",
        "shift_jis_2004",
        "euc_jp",
        "gb18030",
        "gbk",
        "gb2312",
        "big5",
        "big5hkscs",
        "euc_kr",
        "cp949",
        "johab",
    }
)


def _library_detect(data: bytes) -> str | None:
    """Tier-2 detection: a multi-byte verdict from charset_normalizer,
    or None when the library is absent / unsure / says single-byte."""
    if _cn_from_bytes is None:
        return None
    best = _cn_from_bytes(bytes(data)).best()
    if best is None:
        return None
    try:
        canonical = codecs.lookup(best.encoding).name
    except LookupError:  # pragma: no cover - unknown codec name
        return None
    return best.encoding if canonical in _TRUSTED_DETECTIONS else None


def detect_charset(data: bytes | None, use_library: bool = True) -> str | None:
    """Best-guess charset name for one byte string."""
    if data is None:
        return None
    if not data:
        return "utf-8"
    for bom, name in _BOMS:
        if data.startswith(bom):
            return name
    try:
        data.decode("utf-8", errors="strict")
        return "utf-8" if any(b >= 0x80 for b in data) else "ascii"
    except UnicodeDecodeError:
        pass
    if use_library:
        detected = _library_detect(bytes(data))
        if detected is not None:
            return detected
    return "latin-1"


def to_utf8(data: bytes | None, use_library: bool = True) -> str | None:
    """Transcode bytes to a UTF-8 string via the detected charset.
    latin-1 never raises, so this is total for non-null input."""
    if data is None:
        return None
    enc = detect_charset(data, use_library=use_library) or "latin-1"
    try:
        return bytes(data).decode(enc, errors="replace")
    except (LookupError, UnicodeDecodeError):  # pragma: no cover
        return bytes(data).decode("latin-1", errors="replace")


@lru_cache(maxsize=None)
def _detect_udf():
    @pandas_udf("string")
    def _udf(blobs: pd.Series) -> pd.Series:
        return blobs.map(detect_charset)

    return _udf


def detect_charset_udf(col: Column) -> Column:
    return _detect_udf()(col)


@lru_cache(maxsize=None)
def _to_utf8_udf():
    @pandas_udf("string")
    def _udf(blobs: pd.Series) -> pd.Series:
        return blobs.map(to_utf8)

    return _udf


def to_utf8_udf(col: Column) -> Column:
    return _to_utf8_udf()(col)


def decode_http_body(data: bytes | None,
                     declared: str | None) -> str | None:
    """HTTP-body decode with the published-WET precedence: the
    Content-Type charset parameter wins when it names a codec the
    runtime knows (errors='replace', so a lying header never aborts
    a derivation job); otherwise fall through to the detection
    ladder (BOM -> strict utf-8 -> library -> latin-1). Total for
    non-null input."""
    if data is None:
        return None
    if declared:
        name = declared.strip().strip('"').strip("'").lower()
        try:
            return bytes(data).decode(name, errors="replace")
        except LookupError:
            pass
    return to_utf8(data)


@lru_cache(maxsize=None)
def _decode_http_body_udf():
    @pandas_udf("string")
    def _udf(blobs: pd.Series, declared: pd.Series) -> pd.Series:
        return pd.Series(
            [decode_http_body(b, d) for b, d in zip(blobs, declared)]
        )

    return _udf


def decode_http_body_udf(blob_col: Column, declared_col: Column) -> Column:
    """Arrow-batched declared-charset-first body decode (the WET
    derivation's one necessary Python step: Spark 4's decode() throws
    MALFORMED_CHARACTER_CODING on dirty bytes, and charset fallback
    is inherently per-row)."""
    return _decode_http_body_udf()(blob_col, declared_col)
