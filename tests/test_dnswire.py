"""RFC 1035 DNS wire-format parse: name compression, CNAME chains,
malformed-message rejection."""

from __future__ import annotations

import struct

import pytest

from commoncrawl_crawler_spark.functions import dnswire as D


def test_name_roundtrip_and_compression():
    msg = D.build_response(
        "www.example.com",
        [
            ("www.example.com", D.TYPE_CNAME, 300,
             D.encode_name("edge.cdn.net")),
            ("edge.cdn.net", D.TYPE_A, 60, bytes([1, 2, 3, 4])),
        ],
    )
    r = D.parse_response(msg)
    assert r["questions"][0]["name"] == "www.example.com"
    # first answer name arrived via a 0xC0 pointer to the question
    assert msg[12 + len(D.encode_name("www.example.com")) + 4] & 0xC0 == 0xC0
    assert r["answers"][0]["name"] == "www.example.com"
    assert r["answers"][0]["target"] == "edge.cdn.net"
    assert r["answers"][1]["address"] == 0x01020304


def test_pointer_guards_and_truncation():
    hdr = struct.pack(">HHHHHH", 1, 0x8180, 1, 0, 0, 0)
    with pytest.raises(ValueError, match="forward compression"):
        D.parse_response(hdr + b"\xc0\x0c\x00\x01\x00\x01")
    with pytest.raises(ValueError, match="truncated label"):
        D.parse_response(hdr + b"\x03ab")
    with pytest.raises(ValueError, match="reserved label"):
        D.parse_response(hdr + b"\x80x\x00" + b"\x00\x01\x00\x01")
    with pytest.raises(ValueError, match="not a response"):
        D.parse_response(struct.pack(">HHHHHH", 1, 0, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="bad label"):
        D.encode_name("a." + "b" * 64 + ".c")


def test_spark_resolutions_match_formula(spark, sf_smoke):
    from commoncrawl_crawler_spark.sources import load_table

    docs = load_table(spark, "documents", sf_smoke).limit(6)
    out = {
        r.media_id: r
        for r in D.dns_resolutions(D.synthesize_dns(docs)).collect()
    }
    for mid, r in out.items():
        qname, n_cnames, ttl = D._dns_params(mid)
        assert r.qname == qname
        assert r.cname_hops == n_cnames
        assert r.a_address == (10 << 24) | (mid % 65536)
        assert r.min_ttl == ttl
