"""HTML parsing: link extraction, title, meta tags (SURVEY.md 2.8).

Reference: ParserMapper.java:340-733 + util/HTMLDomUtils.java +
the vendored Dapper DOM parser (~3,000 LoC) extract <a>/<frame>/
meta-refresh links, titles, and meta tags from crawled HTML.

Here: a regex-based extractor in an Arrow-batched pandas UDF. A
production deployment swaps the inner function for lxml/selectolax
(not present in this container); the regex tier is itself useful --
it is the same fidelity class as the reference's tag scanner, and
regexes compile once per executor, not per row.

Returns typed nested rows (array<struct>) -- the Spark-native shape
for one-to-many parse output (reference used multi-sink
SequenceFiles, ParserOutputFormat.java:60-96).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_HREF = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*["']?([^"'\s>]+)["']?[^>]*>(.*?)</a>""",
    re.IGNORECASE | re.DOTALL,
)
_FRAME = re.compile(
    r"""<i?frame\b[^>]*?\bsrc\s*=\s*["']?([^"'\s>]+)["']?""", re.IGNORECASE
)
_META_REFRESH = re.compile(
    r"""<meta\b[^>]*?http-equiv\s*=\s*["']?refresh["']?[^>]*?"""
    r"""content\s*=\s*["'][^"']*?url\s*=\s*([^"'\s>]+)""",
    re.IGNORECASE,
)
_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_META_TAG = re.compile(
    r"""<meta\b[^>]*?\bname\s*=\s*["']?([^"'\s>]+)["']?[^>]*?"""
    r"""\bcontent\s*=\s*["']([^"']*)["']""",
    re.IGNORECASE,
)
_TAG_STRIP = re.compile(r"<[^>]+>")

LINKS_TYPE = "array<struct<url:string,link_type:string,anchor:string>>"


def extract_links(html: str | None) -> list[tuple[str, str, str]]:
    """All links of one page: (url, link_type, anchor_text)."""
    if not html:
        return []
    out = []
    for m in _HREF.finditer(html):
        anchor = _TAG_STRIP.sub("", m.group(2)).strip()
        out.append((m.group(1), "a", anchor))
    for m in _FRAME.finditer(html):
        out.append((m.group(1), "frame", ""))
    for m in _META_REFRESH.finditer(html):
        out.append((m.group(1), "meta_refresh", ""))
    return out


def extract_title(html: str | None) -> str | None:
    if not html:
        return None
    m = _TITLE.search(html)
    return _TAG_STRIP.sub("", m.group(1)).strip() if m else None


def extract_meta_tags(html: str | None) -> dict[str, str]:
    if not html:
        return {}
    return {m.group(1).lower(): m.group(2) for m in _META_TAG.finditer(html)}


@lru_cache(maxsize=None)
def _links_udf():
    @pandas_udf(LINKS_TYPE)
    def _udf(html: pd.Series) -> pd.Series:
        return html.map(extract_links)

    return _udf


def extract_links_udf(col: Column) -> Column:
    return _links_udf()(col)


@lru_cache(maxsize=None)
def _title_udf():
    @pandas_udf("string")
    def _udf(html: pd.Series) -> pd.Series:
        return html.map(extract_title)

    return _udf


def extract_title_udf(col: Column) -> Column:
    return _title_udf()(col)


@lru_cache(maxsize=None)
def _meta_udf():
    @pandas_udf("map<string,string>")
    def _udf(html: pd.Series) -> pd.Series:
        return html.map(extract_meta_tags)

    return _udf


def extract_meta_tags_udf(col: Column) -> Column:
    return _meta_udf()(col)
