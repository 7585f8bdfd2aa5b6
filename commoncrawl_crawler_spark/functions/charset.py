"""Charset detection / transcode-to-UTF-8 (SURVEY.md section 2.8).

Reference: util/CharsetUtils.java (~300 LoC) detects the encoding of
fetched bytes and transcodes to UTF-8 before parsing
(ParserMapper.java uses it on every document).

Tiered implementation:
1. Deterministic heuristic ladder (DEFAULT): BOM sniff, strict-UTF-8
   trial decode, else Latin-1 (which never fails) -- the decision
   ladder browsers applied pre-HTML5. Deterministic matters more than
   clever here: a detector whose answer depends on an installed
   library's version would make the same 100 TB corpus transcode
   differently across executors or releases.
2. `charset_normalizer` statistical detection, opt-in via
   use_library=True (it also misguesses short Latin-1 strings as
   UTF-16, so it is consulted only when the ladder falls through to
   Latin-1 and the caller asked for it).

Both run inside one Arrow-batched kernel.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

try:  # production tier; absent in this container
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


def detect_charset(data: bytes | None, use_library: bool = False) -> str | None:
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
    if use_library and _cn_from_bytes is not None:
        best = _cn_from_bytes(bytes(data)).best()
        if best is not None:
            return best.encoding
    return "latin-1"


def to_utf8(data: bytes | None) -> str | None:
    """Transcode bytes to a UTF-8 string via the detected charset.
    latin-1 never raises, so this is total for non-null input."""
    if data is None:
        return None
    enc = detect_charset(data) or "latin-1"
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
