"""PDF syntax walk and text extraction (operators/pdfdoc)."""

from __future__ import annotations

import pytest

from commoncrawl_crawler_spark.operators import pdfdoc as P


def test_roundtrip_uncompressed_and_flate():
    for comp in (False, True):
        blob = P.build_pdf([["hello world"], ["second page"]], compress=comp)
        d = P.parse_pdf(blob)
        assert d["version"] == "1.7"
        assert d["n_pages"] == 2
        assert d["text"] == "hello world second page"


def test_literal_string_escapes_and_nesting():
    assert P._literal_strings(b"(a\\(b\\)c)") == [b"a(b)c"]
    assert P._literal_strings(b"(nest(ed)ok)") == [b"nest(ed)ok"]
    assert P._literal_strings(b"(tab\\tnl\\n)") == [b"tab\tnl\n"]
    assert P._literal_strings(b"(\\101\\102)") == [b"AB"]  # octal
    assert P._literal_strings(b"(\\q)") == [b"q"]  # unknown escape


def test_tj_array_and_quote_operators():
    content = (
        b"BT [(Hel) -20 (lo)] TJ (world) Tj (x) ' ET junk (no) Tj"
    )
    assert P.extract_text_runs(content) == ["Hel", "lo", "world", "x"]


def test_rejections():
    with pytest.raises(ValueError, match="missing %PDF"):
        P.parse_pdf(b"not a pdf")
    blob = P.build_pdf([["x"]])
    enc = blob.replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(NotImplementedError, match="encrypted"):
        P.parse_pdf(enc)
    objstm = blob.replace(
        b"<< /Type /Catalog", b"<< /Type /ObjStm >>\nendobj\n"
        b"99 0 obj\n<< /Type /Catalog", 1
    )
    with pytest.raises(NotImplementedError, match="ObjStm"):
        P.parse_pdf(objstm)
    bad_filter = P.build_pdf([["x"]], compress=True).replace(
        b"/FlateDecode", b"/LZWDecode"
    )
    with pytest.raises(NotImplementedError, match="LZWDecode"):
        P.parse_pdf(bad_filter)


def test_page_tree_cycle_is_bounded():
    """A malformed /Kids cycle must terminate via the visited set."""
    blob = P.build_pdf([["a"], ["b"]])
    # point the Pages node's first kid back at the Pages node itself
    d = P.parse_pdf(blob)
    assert d["n_pages"] == 2  # sanity before mutation
    import re

    m = re.search(rb"(\d+) 0 obj\n<< /Type /Pages /Kids \[(\d+) 0 R",
                  blob)
    pages_id, first_kid = m.group(1), m.group(2)
    mutated = blob.replace(
        b"/Kids [" + first_kid + b" 0 R",
        b"/Kids [" + pages_id + b" 0 R", 1
    )
    d2 = P.parse_pdf(mutated)  # must not hang
    assert d2["n_pages"] == 1


def test_truncated_pdf_still_profiles():
    """Crawled PDFs are routinely truncated: the scanner profile
    survives a missing trailer (catalog found by /Type scan)."""
    blob = P.build_pdf([["alpha"], ["beta"]])
    cut = blob[: blob.rfind(b"xref")]
    d = P.parse_pdf(cut)
    assert d["n_pages"] == 2
    assert d["text"] == "alpha beta"


def test_spark_profile_matches_params(spark):
    docs = spark.range(8).selectExpr("id AS doc_id", "'x' AS text")
    got = {
        r["media_id"]: (r["n_pages"], r["n_objects"], r["n_chars"])
        for r in P.pdf_profile(P.synthesize_pdf(docs)).collect()
    }
    for mid in range(8):
        d = P.parse_pdf(P._pdf_blob(mid))
        assert got[mid] == (d["n_pages"], d["n_objects"], len(d["text"]))
