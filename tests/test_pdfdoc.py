"""PDF syntax walk and text extraction (operators/pdfdoc)."""

from __future__ import annotations

import re

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
    # ObjStm is SUPPORTED now; a malformed one (no /N or /First) must
    # be a loud error, not a silent skip
    objstm = blob.replace(
        b"<< /Type /Catalog", b"<< /Type /ObjStm >>\nendobj\n"
        b"99 0 obj\n<< /Type /Catalog", 1
    )
    with pytest.raises(ValueError, match="ObjStm missing"):
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


# ---- round-8: xref streams, object streams, stream-aware scan ------


def test_xrefstream_differential_with_classic():
    """The same logical document serialized classic-xref vs
    xref-stream+ObjStm must profile IDENTICALLY (version pinned so
    only the serialization differs)."""
    for mid in range(12):
        n_pages, rpp, comp = P._pdf_params(mid)
        pages = [
            [f"doc-{mid} page-{p} run-{r}" for r in range(rpp)]
            for p in range(n_pages)
        ]
        classic = P.parse_pdf(
            P.build_pdf(pages, compress=bool(comp), version="1.7")
        )
        xs = P.parse_pdf(
            P.build_pdf_xrefstream(
                pages, compress=bool(comp), version="1.7"
            )
        )
        assert classic == xs, (mid, classic, xs)


def test_xrefstream_entries_decode():
    """parse_xref_stream recovers the typed entry table: type-1
    offsets point at real `N 0 obj` headers, type-2 entries name the
    ObjStm container and index."""
    blob = P.build_pdf_xrefstream([["a"], ["b"]])
    objs = P._scan_objects(blob)
    xref = next(
        o for o in objs.values()
        if P._dict_name(o.dict, b"Type") == "XRef"
    )
    entries = P.parse_xref_stream(
        xref.dict, P._decode_stream(xref.dict, xref.raw_stream)
    )
    # 2 pages: contents 1,2; pages 3,4; catalog 5; pagesnode 6;
    # objstm 7; xref 8
    assert entries[0][0] == 0  # free head
    for num in (1, 2, 7, 8):
        typ, off, gen = entries[num]
        assert typ == 1 and gen == 0
        assert blob[off:].startswith(b"%d 0 obj" % num)
    for num in (3, 4, 5, 6):
        typ, container, idx = entries[num]
        assert typ == 2 and container == 7
        assert idx == num - 3


def test_scanner_is_stream_aware():
    """Payload bytes that LOOK like `endobj`, an object header, or a
    /Filter key must not derail the scan: /Length bounds the payload
    and filter lookup sees only the isolated dict."""
    payload = (
        b"BT (real text) Tj ET\n"
        b"endobj\n9 0 obj\n<< /Filter /LZWDecode >>\n"  # decoys
    )
    blob = (
        b"%PDF-1.7\n"
        + (b"1 0 obj\n<< /Length %d >>\nstream\n" % len(payload))
        + payload
        + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Page /Parent 3 0 R /Contents 1 0 R >>\nendobj\n"
        b"3 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
        b"4 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n"
        b"trailer\n<< /Size 5 /Root 4 0 R >>\n"
    )
    d = P.parse_pdf(blob)
    assert d["n_objects"] == 4  # decoy `9 0 obj` is inside the payload
    assert d["n_pages"] == 1
    assert d["text"] == "real text"


def test_indirect_length_fallback():
    """An indirect /Length resolves via the second pass (endstream
    search first, then tightened to the integer object's value)."""
    payload = b"BT (it) Tj ET"
    blob = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Length 5 0 R >>\nstream\n"
        + payload
        + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Page /Parent 3 0 R /Contents 1 0 R >>\nendobj\n"
        b"3 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
        b"4 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n"
        b"5 0 obj\n%d\nendobj\n" % len(payload)
        + b"trailer\n<< /Size 6 /Root 4 0 R >>\n"
    )
    d = P.parse_pdf(blob)
    assert d["text"] == "it" and d["n_objects"] == 5


def test_text_runs_quote_operators_and_bracket_in_string():
    """' and \" show operators are extracted (\" takes the string as
    its THIRD operand) and a literal ] inside a TJ string element
    does not end the array early."""
    content = (
        b"BT (one) Tj (two) ' 3 4 (three) \" "
        b"[ (le]ft) -120 (right) ] TJ ET (outside-bt) Tj"
    )
    assert P.extract_text_runs(content) == [
        "one", "two", "three", "le]ft", "right"
    ]


def test_png_predictors_roundtrip():
    """All four PNG row filters reverse correctly (Up is what the
    builder emits; Sub/Average/Paeth appear in the wild)."""
    import zlib as _z
    raw = bytes(range(48))  # 8 rows x 6 columns
    up = P._png_predict_up(raw, 6)
    assert P._png_unpredict(up, 6) == raw
    # none-tag rows pass through
    none_tagged = b"".join(
        b"\x00" + raw[r : r + 6] for r in range(0, 48, 6)
    )
    assert P._png_unpredict(none_tagged, 6) == raw
    with pytest.raises(ValueError, match="predictor tag"):
        P._png_unpredict(b"\x09" + bytes(6), 6)


def test_corrupt_xref_stream_is_loud():
    blob = P.build_pdf_xrefstream([["a"]])
    # strip /W so the xref decode fails attributably
    bad = blob.replace(b"/W [1 3 2] ", b"")
    with pytest.raises(ValueError, match="missing /W"):
        P.parse_pdf(bad)


# ---- round-8: WOFF 1.0 ----------------------------------------------


def test_woff_roundtrip_stored_and_deflated():
    for mid in range(12):
        flavor, upm, family = P._font_params(mid)
        d = P.parse_woff(P._woff_blob(mid))
        assert (d["flavor"], d["units_per_em"], d["family"]) == (
            flavor, upm, family,
        )
        assert d["container"] == "woff"
        assert d["tags"] == ["head", "hhea", "maxp", "name"]


def test_woff_rejections():
    blob = P._woff_blob(1)
    with pytest.raises(ValueError, match="not a WOFF"):
        P.parse_woff(b"XXXX" + blob[4:])
    with pytest.raises(NotImplementedError, match="Brotli"):
        P.parse_woff(b"wOF2" + blob[4:])
    with pytest.raises(ValueError, match="length field"):
        P.parse_woff(blob + b"\x00")
    # corrupt a directory origLength so decompressed size mismatches
    import struct
    bad = bytearray(blob)
    # first directory entry: offset 44, origLength at +12
    orig = struct.unpack_from(">I", bad, 44 + 12)[0]
    struct.pack_into(">I", bad, 44 + 12, orig + 1)
    with pytest.raises(ValueError):
        P.parse_woff(bytes(bad))


def test_spark_woff_profile(spark):
    docs = spark.range(6).selectExpr("id AS doc_id", "'x' AS text")
    rows = P.woff_profile(P.synthesize_woff(docs)).collect()
    assert len(rows) == 6
    for r in rows:
        f, upm, fam = P._font_params(r["media_id"])
        assert (r["flavor"], r["units_per_em"], r["family"]) == (
            f, upm, fam,
        )


# ---- round-8: standard security handler (RC4) -----------------------


def test_encrypted_differential_with_plain():
    """Owner-locked (empty user password) R2/RC4-40 and R3/RC4-128
    builds must profile identically to the plain build except the
    /Encrypt dictionary object itself."""
    for mid in range(8):
        n_pages, rpp, comp = P._pdf_params(mid)
        pages = [
            [f"doc-{mid} page-{p} run-{r}" for r in range(rpp)]
            for p in range(n_pages)
        ]
        plain = P.parse_pdf(
            P.build_pdf(pages, compress=bool(comp), version="1.4")
        )
        # R6/AESV3 only on the first two mids: Algorithm 2.B is
        # deliberately expensive (~2 s per document)
        forms = [(2, 40), (3, 128), (4, 128)] + (
            [(6, 256)] if mid < 2 else []
        )
        for r, bits in forms:
            enc = P.parse_pdf(
                P.build_pdf_encrypted(
                    pages, compress=bool(comp), r=r, key_bits=bits
                )
            )
            assert enc["text"] == plain["text"], r
            assert enc["n_pages"] == plain["n_pages"], r
            assert enc["n_objects"] == plain["n_objects"] + 1, r


def test_encryption_authentication_and_boundaries():
    # a real (non-empty) user password must NOT authenticate empty
    blob = P.build_pdf_encrypted([["x"]], user_pw=b"secret")
    with pytest.raises(ValueError, match="does not authenticate"):
        P.parse_pdf(blob)
    # V5 with a real user password is loud too
    blob5 = P.build_pdf_encrypted([["x"]], r=6, user_pw=b"pw")
    with pytest.raises(ValueError, match="does not authenticate"):
        P.parse_pdf(blob5)
    # unknown /V and unknown /V4 crypt filter stay named boundaries
    bad_v = P.build_pdf_encrypted([["x"]]).replace(b"/V 2", b"/V 7")
    with pytest.raises(NotImplementedError, match="/V 7 unknown"):
        P.parse_pdf(bad_v)
    aes4 = P.build_pdf_encrypted([["x"]], r=4)
    with pytest.raises(NotImplementedError, match="crypt filter"):
        P.parse_pdf(aes4.replace(b"/CFM /AESV2", b"/CFM /AESX9"))
    # a tampered /Perms fails the file-key verification (R6)
    blob6 = P.build_pdf_encrypted([["x"]], r=6)
    m = re.search(rb"/Perms <([0-9a-f]{32})>", blob6)
    flipped = format(int(m.group(1), 16) ^ 1, "032x").encode()
    with pytest.raises(ValueError, match="Perms"):
        P.parse_pdf(blob6[: m.start(1)] + flipped + blob6[m.end(1):])
    # unresolvable /Encrypt ref stays a loud encrypted-PDF error
    plain = P.build_pdf([["x"]])
    dangling = plain.replace(b"/Root", b"/Encrypt 99 0 R /Root")
    with pytest.raises(NotImplementedError, match="encrypted"):
        P.parse_pdf(dangling)


def test_rc4_and_key_derivation_shapes():
    """RC4 is its own inverse; O/U values have the spec's widths; the
    R3 50-fold MD5 iteration changes the key (i.e. actually runs)."""
    key, data = b"k3y", b"payload bytes"
    assert P._rc4(key, P._rc4(key, data)) == data
    o2 = P.compute_o_value(b"ow", b"", 5, 2)
    o3 = P.compute_o_value(b"ow", b"", 16, 3)
    assert len(o2) == 32 and len(o3) == 32 and o2 != o3
    fid = bytes(range(16))
    k2 = P.compute_encryption_key(b"", o2, -44, fid, 5, 2)
    k3 = P.compute_encryption_key(b"", o2, -44, fid, 5, 3)
    assert len(k2) == 5 and len(k3) == 5 and k2 != k3
    assert len(P.compute_u_value(k3, fid, 3)) == 32
    # per-object keys differ by object number and cap at 16 bytes
    fk = bytes(16)
    assert P._object_key(fk, 1) != P._object_key(fk, 2)
    assert len(P._object_key(fk, 1)) == 16


def test_incremental_update_latest_definition_wins():
    """Incrementally-updated PDFs append replacement objects + a new
    xref section; the scanner's last-definition-wins order must
    surface the UPDATED content."""
    blob = P.build_pdf([["original text"]])
    # find the content stream object number (object 1 in build_pdf)
    update = (
        b"1 0 obj\n"
        + P._content_stream_body(["updated text"], False)
        + b"\nendobj\n"
        b"trailer\n<< /Size 5 /Root 3 0 R >>\n"
    )
    # splice the update AFTER the original %%EOF, as writers do
    d = P.parse_pdf(blob + update)
    assert d["text"] == "updated text"
    assert d["n_pages"] == 1


def test_aes_fips197_known_answers():
    """The derived AES implementation against FIPS-197 Appendix C:
    any S-box/key-schedule/MixColumns derivation error fails here."""
    from commoncrawl_crawler_spark.operators import aescipher as A

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key, want in cases:
        ct = A.encrypt_block(pt, key)
        assert ct.hex() == want
        assert A.decrypt_block(ct, key) == pt
    # CBC round trips with and without padding; bad padding is loud
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes(range(256))[:n]
        ct = A.cbc_encrypt(data, cases[2][0], iv)
        assert A.cbc_decrypt(ct, cases[2][0], iv) == data
    with pytest.raises(ValueError, match="padding"):
        A.cbc_decrypt(bytes(16), cases[2][0], iv)


def test_hash_2b_properties():
    """Algorithm 2.B: deterministic, salt- and password-sensitive,
    32-byte output, udata-sensitive (the /O path feeds U48)."""
    h1 = P.hash_2b(b"", b"saltsalt")
    assert len(h1) == 32
    assert P.hash_2b(b"", b"saltsalt") == h1
    assert P.hash_2b(b"x", b"saltsalt") != h1
    assert P.hash_2b(b"", b"SALTSALT") != h1
    assert P.hash_2b(b"", b"saltsalt", b"u" * 48) != h1
