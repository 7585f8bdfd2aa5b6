"""HTTP header parsing as Column expressions (SURVEY.md section 2.8).

Reference: util/HttpHeaderInfoExtractor.java, HttpHeaderUtils.java,
HttpCacheUtils.java (~1,200 LoC of hand-rolled header handling that
feeds CrawlURLMetadata's httpResultCode/cache-control fields,
protocol.jr:165-283).

Spark-first: header blobs are `key: value` lines -- `str_to_map`
parses the whole blob JVM-side in one expression; typed getters cast
individual fields. No UDF anywhere, so header extraction stays
inside whole-stage codegen even at 100 TB scan width.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_LINE_SEP = "\r?\n"
_KV_SEP = ":\\s*"


def parse_headers_expr(col: Column) -> Column:
    """Header blob -> map<string,string> with lower-cased keys.

    Keys are case-insensitive per RFC 7230; lower-casing at parse
    time makes every downstream lookup exact.
    """
    m = F.str_to_map(col, F.lit(_LINE_SEP), F.lit(_KV_SEP))
    return F.map_from_arrays(
        F.transform(F.map_keys(m), lambda k: F.lower(F.trim(k))),
        F.map_values(m),
    )


def header_expr(col: Column, name: str) -> Column:
    """One header value (name given lower-case), NULL if absent.

    Single-field extraction is a direct case-insensitive multiline
    regexp -- one codegen'd scan of the blob, an order of magnitude
    cheaper than building the full map per field (Catalyst's
    projection collapse re-inlines a hoisted map into every consumer,
    so the map path cannot be shared across getters anyway). Use
    parse_headers_expr when a consumer genuinely needs all headers.
    """
    import re as _re

    pat = rf"(?im)^{_re.escape(name)}:[ \t]*([^\r\n]*)"
    v = F.regexp_extract(col, pat, 1)
    return F.when(v != "", F.trim(v))


def status_code_expr(status_line: Column) -> Column:
    """'HTTP/1.1 200 OK' -> 200 (CrawlURLMetadata.httpResultCode)."""
    return F.regexp_extract(status_line, r"HTTP/[\d.]+\s+(\d{3})", 1).cast("int")


def content_length_expr(col: Column) -> Column:
    return header_expr(col, "content-length").cast("long")


def content_type_expr(col: Column) -> Column:
    """Mime without charset suffix ('text/html; charset=utf-8' ->
    'text/html') -- MimeTypeFilter's normalization."""
    return F.lower(F.trim(F.split(header_expr(col, "content-type"), ";")[0]))


def max_age_expr(col: Column) -> Column:
    """Cache-Control max-age seconds (HttpCacheUtils capability)."""
    return F.regexp_extract(
        header_expr(col, "cache-control"), r"max-age=(\d+)", 1
    ).cast("long")


def http_date_expr(col: Column, name: str = "last-modified") -> Column:
    """RFC 1123 date header -> timestamp (headers are always GMT per
    RFC 7231). Spark 4's parser supports neither the E (weekday) nor
    zzz (zone) tokens, so the redundant weekday is stripped and the
    zone matched literally; the session zone must be UTC --
    session.build_session pins it."""
    datepart = F.regexp_replace(header_expr(col, name), r"^[A-Za-z]{3},\s*", "")
    return F.to_timestamp(datepart, "dd MMM yyyy HH:mm:ss 'GMT'")
