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
