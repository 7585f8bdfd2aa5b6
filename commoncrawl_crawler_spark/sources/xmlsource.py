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
