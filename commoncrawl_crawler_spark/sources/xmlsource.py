"""XML record source (Wikipedia-dump analog).

Reference (SURVEY.md section 2.1): util/WikipediaPageInputFormat.java
and util/XMLInputFormat.java split giant XML dumps on a record tag
and parse each record.

Spark-first: archives load via `binaryFile` (dump files are
size-bounded chunks in practice); an Arrow-batched `mapInPandas`
splits on the record element and extracts fields with a
non-backtracking regex -- the same fidelity class as the reference's
streaming tag scanner (it never built a DOM either). For true
multi-GB single-file dumps, pre-chunk on ingest (the reference's
input format did exactly that split step).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

PAGE_SCHEMA = StructType(
    [
        StructField("page_id", LongType()),
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("source_file", StringType()),
    ]
)

_PAGE = re.compile(r"<page>(.*?)</page>", re.DOTALL)
_ID = re.compile(r"<id>(\d+)</id>")
_TITLE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
_TEXT = re.compile(r"<text[^>]*>(.*?)</text>", re.DOTALL)


def _unescape(s: str) -> str:
    return (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&apos;", "'")
        .replace("&amp;", "&")  # last: &amp;lt; must not double-decode
    )


def parse_pages(xml: str, source: str = "") -> list[tuple]:
    out = []
    for m in _PAGE.finditer(xml):
        body = m.group(1)
        pid = _ID.search(body)
        title = _TITLE.search(body)
        text = _TEXT.search(body)
        out.append(
            (
                int(pid.group(1)) if pid else None,
                _unescape(title.group(1)) if title else None,
                _unescape(text.group(1)) if text else None,
                source,
            )
        )
    return out


def read_xml_pages(spark: SparkSession, path: str, glob: str = "*.xml") -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_pages(bytes(content).decode("utf-8"), fpath))
            yield pd.DataFrame(
                rows, columns=["page_id", "title", "text", "source_file"]
            )

    return files.mapInPandas(_parse, PAGE_SCHEMA)


def write_xml_pages(df: DataFrame, path: str) -> int:
    """Write (page_id, title, text) rows as wiki-style XML chunk files
    (one per partition) -- the roundtrip producer for tests."""
    import os

    os.makedirs(path, exist_ok=True)

    def _esc(s: str) -> str:
        return (
            s.replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&quot;")
            .replace("'", "&apos;")
        )

    def _write(idx: int, rows) -> Iterator[int]:
        n = 0
        fname = os.path.join(path, f"chunk-{idx:05d}.xml")
        buf = ["<mediawiki>"]
        for r in rows:
            if r["page_id"] is None:
                continue  # an id-less page cannot be addressed back
            # parse_pages emits None for absent tags; omit the element
            # so the roundtrip returns None again (an empty element
            # would turn None into '')
            title = (
                "<title>%s</title>" % _esc(r["title"])
                if r["title"] is not None
                else ""
            )
            text = (
                "<text>%s</text>" % _esc(r["text"])
                if r["text"] is not None
                else ""
            )
            buf.append("<page><id>%d</id>%s%s</page>" % (r["page_id"], title, text))
            n += 1
        buf.append("</mediawiki>")
        if n:
            with open(fname, "w", encoding="utf-8") as f:
                f.write("".join(buf))
            yield n

    return sum(df.rdd.mapPartitionsWithIndex(_write).collect())


def _xml_unescape_expr(col):
    """Column-expression twin of _unescape: the five predefined XML
    entities, &amp; decoded LAST so '&amp;lt;' yields the literal
    '&lt;' instead of double-decoding."""
    from pyspark.sql import functions as F

    out = col
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ]:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def parse_sitemap(
    sitemaps: DataFrame, host_col: str = "host", content_col: str = "content"
) -> DataFrame:
    """Parse sitemap.xml blobs (sitemaps.org protocol) relationally.

    The crawler discovery channel the reference leaves to its feed
    tier (ParserMapper's RSS/Atom extraction): robots.txt advertises
    sitemaps, sitemaps enumerate URLs with freshness hints -- exactly
    the inputs `crawllist.adaptive_recrawl_schedule` and the
    politeness scheduler consume. Pure Column expressions (regexp
    explode per <url>/<sitemap> record, entity unescape, W3C lastmod
    prefix-parsed to DATE, priority rounded once to integer
    micro-units), so the whole parse is one codegen'd projection --
    one 100 TB crawl holds ~100M sitemap blobs and this parses them
    with zero Python and zero shuffles.

    Returns (host, kind, loc, lastmod, changefreq, priority_micro):
    kind = 'url' for urlset entries, 'sitemap' for sitemapindex
    children (nested index files to fetch next); loc is
    entity-unescaped; records without a <loc> are dropped (the spec
    makes it mandatory); priority_micro is NULL when absent.
    """
    from pyspark.sql import functions as F

    def blocks(tag: str, kind: str) -> DataFrame:
        b = sitemaps.select(
            F.col(host_col).alias("host"),
            F.explode(
                F.expr(
                    f"regexp_extract_all({content_col},"
                    f" '(?s)<{tag}>(.*?)</{tag}>', 1)"
                )
            ).alias("b"),
        ).withColumn("kind", F.lit(kind))
        return b

    raw = blocks("url", "url").unionByName(blocks("sitemap", "sitemap"))
    loc = _xml_unescape_expr(
        F.regexp_extract(F.col("b"), r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    )
    lastmod = F.expr(
        "try_cast(substring(regexp_extract(b,"
        " '(?s)<lastmod>\\\\s*(.*?)\\\\s*</lastmod>', 1), 1, 10) AS DATE)"
    )
    changefreq = F.nullif(
        F.lower(
            F.regexp_extract(
                F.col("b"), r"(?s)<changefreq>\s*(.*?)\s*</changefreq>", 1
            )
        ),
        F.lit(""),
    )
    pr = F.expr(
        "try_cast(regexp_extract(b,"
        " '(?s)<priority>\\\\s*(.*?)\\\\s*</priority>', 1) AS DOUBLE)"
    )
    priority_micro = F.floor(pr * 1e6 + F.lit(0.5)).cast("long")
    from commoncrawl_crawler_spark.checkpointing import ckpt_lazy

    return (
        raw.select(
            "host",
            "kind",
            F.nullif(loc, F.lit("")).alias("loc"),
            lastmod.alias("lastmod"),
            changefreq.alias("changefreq"),
            priority_micro.alias("priority_micro"),
        )
        .filter(F.col("loc").isNotNull())
        # the result-ordering sort's range sampling would re-run both
        # regex extraction passes over the blobs (r9-opt)
        .transform(ckpt_lazy)
        .orderBy("host", "loc")
    )
