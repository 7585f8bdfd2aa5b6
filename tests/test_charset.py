"""Charset detection: heuristic ladder + library tier.

The vector table mirrors how util/CharsetUtils.java is exercised by
ParserMapper: raw fetched bytes in, (charset, utf-8 text) out. Every
vector runs BOTH with the library tier (charset_normalizer must
identify multi-byte CJK encodings well enough to recover the exact
text) and without it (monkeypatched away: the deterministic ladder
must still return a total, byte-preserving answer).
"""

from __future__ import annotations

import codecs

import pytest
from pyspark.sql import functions as F

from commoncrawl_crawler_spark.functions import charset

# (name, text, encoding, ladder_verdict_without_library)
VECTORS = [
    ("ascii", "plain ascii text, nothing fancy", "ascii", "ascii"),
    ("utf8", "mixé ünïcode — ≤ 日本語 ≥", "utf-8", "utf-8"),
    (
        "latin1",
        "Ceci est un texte français: été, à, ç, où, déjà.",
        "latin-1",
        "latin-1",
    ),
    (
        "sjis",
        "日本語のテキストです。文字化けを防ぐために十分な長さがあります。これはテストです。",
        "shift_jis",
        "latin-1",
    ),
    (
        "gbk",
        "这是一段中文文本，用于测试字符集检测。需要足够的长度才能可靠检测。谢谢。",
        "gbk",
        "latin-1",
    ),
    (
        "utf16",
        "BOM-prefixed utf-16 content with ünïcode",
        "utf-16",  # codec emits the LE BOM
        "utf-16-le",
    ),
]


@pytest.mark.parametrize("name,text,enc,ladder", VECTORS, ids=[v[0] for v in VECTORS])
def test_vectors_with_library(name, text, enc, ladder):
    if charset._cn_from_bytes is None:  # pragma: no cover
        pytest.skip("charset_normalizer not installed")
    data = text.encode(enc)
    detected = charset.detect_charset(data)
    # the exact codec name may be a superset (cp932 for shift_jis,
    # gb18030 for gbk) -- what matters is the decode recovers the text
    decoded = data.decode(detected)
    assert decoded.lstrip("﻿") == text
    assert charset.to_utf8(data).lstrip("﻿") == text


@pytest.mark.parametrize("name,text,enc,ladder", VECTORS, ids=[v[0] for v in VECTORS])
def test_vectors_without_library(name, text, enc, ladder, monkeypatch):
    # simulate the library being absent: the pure ladder must stay
    # deterministic and total (latin-1 preserves bytes 1:1 for the
    # encodings it cannot identify)
    monkeypatch.setattr(charset, "_cn_from_bytes", None)
    data = text.encode(enc)
    assert charset.detect_charset(data) == ladder
    out = charset.to_utf8(data)
    assert out is not None
    if ladder == "latin-1":
        assert out.encode("latin-1") == data  # byte-preserving fallback


def test_single_byte_detection_rejected():
    # charset_normalizer labels French Latin-1 as cp1257; the trusted
    # set must reject single-byte verdicts so transcode stays exact
    data = "été, à, ç, où, déjà -- accents français".encode("latin-1")
    assert charset.detect_charset(data) == "latin-1"
    assert charset.to_utf8(data).encode("latin-1") == data


def test_trusted_set_is_codecs_canonical():
    for name in charset._TRUSTED_DETECTIONS:
        assert codecs.lookup(name).name == name


def test_detect_ladder():
    assert charset.detect_charset(b"plain ascii") == "ascii"
    assert charset.detect_charset("héllo".encode("utf-8")) == "utf-8"
    assert charset.detect_charset(b"\xef\xbb\xbfbom") == "utf-8-sig"
    assert charset.detect_charset(b"\xff\xfea\x00") == "utf-16-le"
    # invalid UTF-8 continuation -> latin-1 fallback
    assert charset.detect_charset(b"caf\xe9") == "latin-1"
    assert charset.detect_charset(b"") == "utf-8"
    assert charset.detect_charset(None) is None


def test_to_utf8_total():
    assert charset.to_utf8("héllo".encode("utf-8")) == "héllo"
    assert charset.to_utf8(b"caf\xe9") == "café"  # latin-1 e-acute
    assert charset.to_utf8(b"") == ""


def test_udfs_roundtrip(spark):
    rows = [
        ("utf8", "héllo".encode("utf-8")),
        ("latin", b"caf\xe9"),
        ("ascii", b"plain"),
    ]
    df = spark.createDataFrame(rows, "name string, blob binary").select(
        "name",
        charset.detect_charset_udf(F.col("blob")).alias("cs"),
        charset.to_utf8_udf(F.col("blob")).alias("text"),
    )
    got = {r["name"]: (r["cs"], r["text"]) for r in df.collect()}
    assert got == {
        "utf8": ("utf-8", "héllo"),
        "latin": ("latin-1", "café"),
        "ascii": ("ascii", "plain"),
    }


# ---------------------------------------------------------------------------
# Set-Cookie parsing vs the reference's embedded Chromium vectors
# (util/HttpCookieUtils.java:330-560)
# ---------------------------------------------------------------------------


def _cookie(spark, line):
    from pyspark.sql import functions as F
    from commoncrawl_crawler_spark.functions import headers as hdr

    return (
        spark.createDataFrame([(line,)], "c string")
        .select(hdr.parse_set_cookie_expr(F.col("c")).alias("p"))
        .collect()[0]["p"]
    )


def test_cookie_reference_vectors(spark):
    p = _cookie(spark, "a=b")
    assert (p["valid"], p["name"], p["value"], p["secure"]) == (
        True, "a", "b", False,
    )
    # quoted-value cases: split-at-';'-inside-quotes (IE/Safari)
    for inp, expected in [
        ('"zzz "  ', '"zzz "'),
        ('"zz;pp" ;', '"zz'),
        ('"zzz "   "ppp" ', '"zzz "   "ppp"'),
        ('A"B', 'A"B'),
    ]:
        p = _cookie(spark, f'aBc={inp} ; path="/"  ; httponly ')
        assert p["valid"] and not p["secure"] and p["httponly"]
        assert (p["name"], p["value"], p["path"]) == ("aBc", expected, '"/"')
    # nameless + attribute case-insensitivity
    p = _cookie(spark, "BLAHHH; Path=/; sECuRe; httpONLY")
    assert (p["name"], p["value"], p["path"]) == ("", "BLAHHH", "/")
    assert p["secure"] and p["httponly"]
    p = _cookie(spark, '"BLA\\"HHH"; path=/; secure;')
    assert (p["name"], p["value"]) == ("", '"BLA\\"HHH"')
    # missing name / missing value / whitespace / multiple equals
    p = _cookie(spark, "=ABC")
    assert (p["name"], p["value"]) == ("", "ABC")
    p = _cookie(spark, "ABC=;  path = /wee")
    assert (p["name"], p["value"], p["path"]) == ("ABC", "", "/wee")
    p = _cookie(spark, "  A  = BC  ;secure;;;   httponly")
    assert (p["name"], p["value"]) == ("A", "BC")
    assert p["secure"] and p["httponly"] and p["path"] is None
    p = _cookie(spark, "  A=== BC  ;secure;;;   httponly")
    assert (p["name"], p["value"]) == ("A", "== BC")
    # trailing whitespace + expires with embedded comma
    p = _cookie(
        spark,
        "ANCUUID=zohNumRKgI0oxyhSsV3Z7D  ; "
        "expires=Sun, 18-Apr-2027 21:06:29 GMT ; path=/  ;  ",
    )
    assert p["value"] == "zohNumRKgI0oxyhSsV3Z7D"
    assert p["expires"] == "Sun, 18-Apr-2027 21:06:29 GMT"
    assert p["path"] == "/"


def test_cookie_limits_and_terminators(spark):
    # kMaxPairs = 16: 15 ';' then 'secure' is pair 16 (kept); one
    # more ';' pushes it to pair 17 (dropped)
    p = _cookie(spark, ";" * 15 + "secure")
    assert p["valid"] and p["secure"]
    p = _cookie(spark, ";" * 15 + ";secure")
    assert p["valid"] and not p["secure"]
    # kMaxCookieSize = 4096: exactly at the limit is valid, over is not
    assert _cookie(spark, "a" * 4096)["valid"]
    assert not _cookie(spark, "a" * 4097)["valid"]
    assert not _cookie(spark, "    ")["valid"]
    assert not _cookie(spark, "")["valid"]
    # CR/LF terminate the parse
    for term in ("\r", "\n"):
        p = _cookie(spark, f"AAA=BB{term}ZYX")
        assert (p["name"], p["value"]) == ("AAA", "BB")


def test_cookie_duplicate_attribute_last_wins_and_tabs(spark):
    """Reference fidelity beyond the embedded vectors: a repeated
    attribute keeps the LAST occurrence (SetupAttributes overwrites
    the index on every match), and the reference's whitespace set is
    space AND TAB."""
    p = _cookie(spark, "a=b; path=/x; path=/y")
    assert p["path"] == "/y"
    # tab-only line: the parser seeks past " \t" to end -> invalid
    assert not _cookie(spark, "\t \t")["valid"]
    # tabs trim around values and attribute names
    p = _cookie(spark, "A=B\t; \tsecure\t")
    assert (p["name"], p["value"]) == ("A", "B")
    assert p["secure"]
