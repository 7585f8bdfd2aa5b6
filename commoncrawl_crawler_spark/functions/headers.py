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


def parse_set_cookie_expr(col: Column) -> Column:
    """Set-Cookie line -> struct(valid, name, value, path, domain,
    expires, max_age, secure, httponly) with the reference's
    Chromium-lineage ParsedCookie semantics
    (util/HttpCookieUtils.java:120-280 + embedded vectors :330-560):

    - cut at the first CR/LF/NUL terminator; >4096 chars or an
      all-whitespace line is invalid (fields null);
    - at most 16 token/value pairs; split at ';' EVEN INSIDE quoted
      values (the IE/Safari behavior the reference chose: A="B;C"
      parses as value \'"B\');
    - the name is everything before the FIRST '=' ("A=== BC" ->
      value "== BC"); a first pair with no '=' is a nameless value
      ("BLAHHH; secure" -> name '', value 'BLAHHH'), later pairs with
      no '=' are valueless attributes ('secure');
    - attribute names are case-insensitive (lowered); a repeated
      attribute keeps the LAST occurrence (SetupAttributes overwrites
      the index on every match); whitespace = space AND TAB (the
      reference's kWhitespace) trims around every token and value.

    All Column expressions. The attribute fold (an interpreted
    higher-order ``aggregate``) is evaluated ONCE per row: the final
    struct is built inside the fold's ``finish`` lambda, where the
    accumulator is a bound variable -- extracting six fields from a
    named ``folded`` column would instead inline six copies of the
    whole fold into the plan (measured 6x on 150k rows). Callers that
    flatten the struct to scalar columns should still add a generator
    barrier (``F.inline(F.array(p))``) so per-field projection prunes
    generator output instead of duplicating the expression tree.
    """
    def _wtrim(c):
        # the reference's kWhitespace is " \t"; F.trim strips spaces
        # only, so tab-padded tokens/values would diverge
        return F.btrim(c, F.lit(" \t"))

    cut = F.when(
        F.length(col) <= 4096,
        F.regexp_extract(col, "^[^\\n\\r\\x00]*", 0),
    )
    # First pair + capped attribute tail, all via anchored regex (no
    # split/higher-order ops). capped = the first 16 ';'-pairs; tail =
    # capped minus the first pair (pairs 2..16, still ';'-joined).
    p0 = F.regexp_extract(cut, "^[^;]*", 0)
    capped = F.regexp_extract(cut, "^(?:[^;]*;){0,15}[^;]*", 0)
    tail = F.regexp_replace(capped, "^[^;]*;?", "")
    has_eq0 = F.instr(p0, "=") > 0
    name = F.when(
        has_eq0, _wtrim(F.regexp_extract(p0, "^([^=]*)=", 1))
    ).otherwise(F.lit(""))
    value = F.when(
        has_eq0, _wtrim(F.regexp_replace(p0, "^[^=]*=", ""))
    ).otherwise(_wtrim(p0))

    # Attribute lookup over the tail with plain (codegen-capable)
    # regexes instead of an interpreted transform+aggregate fold
    # (measured 6-10x on 150k rows). A pair's name is everything
    # before its first '=', trimmed of space/tab, case-insensitive;
    # the LAST occurrence wins (the reference's SetupAttributes
    # overwrites the attribute index on every match) -- expressed as a
    # greedy '^.*' prefix so the regex engine anchors to the final
    # occurrence.
    def _name_pat(key):
        return "(?:^|;)[ \\t]*(?i:" + key + ")[ \\t]*"

    def _attr_value(key):
        matched = tail.rlike(_name_pat(key) + "(?:=|;|$)")
        # group 1 includes the leading '=' so a matched-but-empty
        # value ('path=') is distinguishable from a valueless
        # attribute ('path') and from no match at all
        eqv = F.regexp_extract(
            tail, "^.*" + _name_pat(key) + "(=[^;]*)?(?=;|$)", 1
        )
        return F.when(
            matched,
            F.when(eqv != "", _wtrim(F.regexp_replace(eqv, "^=", "")))
            .otherwise(F.lit("")),
        )

    def _attr_flag(key):
        return F.coalesce(
            tail.rlike(_name_pat(key) + "(?:=|;|$)"), F.lit(False)
        )

    valid = cut.isNotNull() & (_wtrim(cut) != "")
    out = F.struct(
        valid.alias("valid"),
        name.alias("name"),
        value.alias("value"),
        _attr_value("path").alias("path"),
        _attr_value("domain").alias("domain"),
        _attr_value("expires").alias("expires"),
        _attr_value("max-age").alias("max_age"),
        _attr_flag("secure").alias("secure"),
        _attr_flag("httponly").alias("httponly"),
    )
    invalid = F.struct(
        F.lit(False).alias("valid"),
        *[
            F.lit(None).cast("string").alias(c)
            for c in ("name", "value", "path", "domain", "expires", "max_age")
        ],
        F.lit(None).cast("boolean").alias("secure"),
        F.lit(None).cast("boolean").alias("httponly"),
    )
    return F.when(valid, out).otherwise(invalid)
