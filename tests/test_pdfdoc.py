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


# ---- sfnt fonts ------------------------------------------------------


def test_sfnt_roundtrip_both_flavors():
    for mid in range(12):
        flavor, upm, family = P._font_params(mid)
        d = P.parse_sfnt(P._font_blob(mid))
        assert (d["flavor"], d["units_per_em"], d["family"]) == (
            flavor, upm, family,
        )
        assert d["tags"] == ["head", "hhea", "maxp", "name"]


def test_sfnt_rejections():
    with pytest.raises(ValueError, match="not an sfnt"):
        P.parse_sfnt(b"\x00\x02\x00\x00" + bytes(20))
    blob = P._font_blob(1)
    with pytest.raises(ValueError, match="overruns"):
        P.parse_sfnt(blob[:40])
    # corrupt head magic
    bad = bytearray(blob)
    head_off = blob.find(P.build_head_table(2048, (-100, -200, 1500, 1800))[:8])
    bad[head_off + 12 : head_off + 16] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="magicNumber"):
        P.parse_sfnt(bytes(bad))


def test_sfnt_name_latin1_platform():
    name = P._struct.pack(">HHH", 0, 1, 18)
    name += P._struct.pack(">HHHHHH", 1, 0, 0, 1, 5, 0) + b"Serif"
    blob = P.build_sfnt([(b"name", name)])
    assert P.parse_sfnt(blob)["family"] == "Serif"


def test_spark_font_profile(spark):
    docs = spark.range(6).selectExpr("id AS doc_id", "'x' AS text")
    rows = P.font_profile(P.synthesize_fonts(docs)).collect()
    assert len(rows) == 6
    for r in rows:
        f, upm, fam = P._font_params(r["media_id"])
        assert (r["flavor"], r["units_per_em"], r["family"]) == (
            f, upm, fam,
        )
