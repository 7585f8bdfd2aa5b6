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

STUB boundary (documented, not faked): object streams (/ObjStm),
xref streams, encryption, and non-Flate filters raise
NotImplementedError with the feature named; fonts/encoding maps are
not interpreted (text extraction yields the literal string bytes,
which for the ASCII-with-standard-fonts PDFs the fixtures model is
the text itself).

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

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_NAME_RE = re.compile(rb"/([A-Za-z0-9#+.\-_]+)")


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


def _stream_data(body: bytes) -> bytes | None:
    """The stream payload of an object body (None if not a stream);
    applies /FlateDecode, rejects other filters by name."""
    m = re.search(rb"stream\r?\n", body)
    if not m:
        return None
    end = body.rfind(b"endstream")
    if end < 0:
        raise ValueError("stream without endstream")
    data = body[m.end() : end]
    if data.endswith(b"\r\n"):
        data = data[:-2]
    elif data.endswith(b"\n"):
        data = data[:-1]
    fil = _dict_name(body, b"Filter")
    if fil is None:
        return data
    if fil == "FlateDecode":
        return zlib.decompress(data)
    raise NotImplementedError(f"PDF filter {fil} needs an external codec")


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


def extract_text_runs(content: bytes) -> list[str]:
    """Show-operator strings inside BT..ET blocks: Tj, ', ", and the
    string elements of TJ arrays, in stream order."""
    runs: list[str] = []
    for bt in re.finditer(rb"BT\b(.*?)ET\b", content, re.DOTALL):
        block = bt.group(1)
        # find show operators and take the string(s) immediately
        # before them
        for m in re.finditer(
            rb"(\((?:[^()\\]|\\.)*\))\s*(Tj|')"
            rb"|(\[(?:[^\]\\]|\\.)*\])\s*TJ",
            block,
            re.DOTALL,
        ):
            src = m.group(1) if m.group(1) else m.group(3)
            for s in _literal_strings(src):
                runs.append(s.decode("latin-1"))
    return runs


def parse_pdf(blob: bytes) -> dict:
    """Syntax-level document profile: version, object census, page
    count via the page tree, text runs from page content streams."""
    m = re.match(rb"%PDF-(\d+\.\d+)", blob)
    if not m:
        raise ValueError("not a PDF: missing %PDF header")
    version = m.group(1).decode("ascii")
    if b"/Encrypt" in blob[blob.rfind(b"trailer") :]:
        raise NotImplementedError("encrypted PDF needs the crypt layer")
    objects: dict[int, bytes] = {}
    for om in _OBJ_RE.finditer(blob):
        objects[int(om.group(1))] = om.group(3)
    if any(
        _dict_name(b, b"Type") == "ObjStm" for b in objects.values()
    ):
        raise NotImplementedError("object streams (/ObjStm) unsupported")
    # catalog: via trailer /Root when present, else by /Type scan
    root_ids = []
    tr = blob.rfind(b"trailer")
    if tr >= 0:
        root_ids = _parse_dict_refs(blob[tr:], b"Root")
    if not root_ids:
        root_ids = [
            num
            for num, b in objects.items()
            if _dict_name(b, b"Type") == "Catalog"
        ]
    n_pages = 0
    page_objs: list[int] = []
    if root_ids and root_ids[0] in objects:
        stack = _parse_dict_refs(objects[root_ids[0]], b"Pages")
        seen: set[int] = set()
        while stack:
            num = stack.pop()
            if num in seen or num not in objects:
                continue
            seen.add(num)
            body = objects[num]
            t = _dict_name(body, b"Type")
            if t == "Pages":
                stack.extend(_parse_dict_refs(body, b"Kids"))
            elif t == "Page":
                n_pages += 1
                page_objs.append(num)
    text_runs: list[str] = []
    for num in sorted(page_objs):
        for cnum in _parse_dict_refs(objects[num], b"Contents"):
            if cnum in objects:
                data = _stream_data(objects[cnum])
                if data is not None:
                    text_runs.extend(extract_text_runs(data))
    return {
        "version": version,
        "n_objects": len(objects),
        "n_pages": n_pages,
        "text": " ".join(text_runs),
    }


def build_pdf(pages: list[list[str]], compress: bool = False) -> bytes:
    """Minimal valid PDF: catalog, page tree, one content stream per
    page showing the given text runs (Flate-compressed when asked)."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    content_ids = []
    for runs in pages:
        ops = b"BT /F1 12 Tf 72 720 Td " + b" ".join(
            b"(" + r.encode("latin-1")
            .replace(b"\\", rb"\\")
            .replace(b"(", rb"\(")
            .replace(b")", rb"\)") + b") Tj"
            for r in runs
        ) + b" ET"
        if compress:
            z = zlib.compress(ops)
            body = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z)
                + z + b"\nendstream"
            )
        else:
            body = (
                b"<< /Length %d >>\nstream\n" % len(ops)
                + ops + b"\nendstream"
            )
        content_ids.append(add(body))
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
    out = bytearray(b"%PDF-1.7\n")
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
