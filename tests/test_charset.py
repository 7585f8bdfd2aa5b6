"""Charset detection heuristic ladder."""

from __future__ import annotations

from pyspark.sql import functions as F

from commoncrawl_crawler_spark.functions import charset


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
