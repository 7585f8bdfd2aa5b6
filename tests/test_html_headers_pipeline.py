"""HTML extractor, header expressions, and pipeline DAG semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_crawler_spark.functions import headers as hdr, html as htmlfn
from commoncrawl_crawler_spark.plans.pipeline import PipelineStep, PipelineTask

HTML = """
<html><head>
  <title> The <b>Page</b> Title </title>
  <meta name="Description" content="a test page">
  <meta http-equiv="refresh" content="5;url=http://redirect.example/next">
</head><body>
  <a href="http://a.example/1" rel="nofollow">first <i>link</i></a>
  <A HREF='http://b.example/2'>second</A>
  <iframe src="http://frame.example/f"></iframe>
</body></html>
"""


def test_extract_links_all_types():
    links = htmlfn.extract_links(HTML)
    by_type = {}
    for url, t, anchor in links:
        by_type.setdefault(t, []).append((url, anchor))
    assert ("http://a.example/1", "first link") in by_type["a"]
    assert ("http://b.example/2", "second") in by_type["a"]
    # <iframe> keeps its own type, distinct from <frame> (WAT convention)
    assert by_type["iframe"] == [("http://frame.example/f", "")]
    assert "frame" not in by_type
    assert by_type["meta_refresh"] == [("http://redirect.example/next", "")]


def test_frame_and_iframe_types_stay_distinct():
    html = (
        '<frameset><frame src="http://old.example/nav"></frameset>'
        '<iframe src="http://new.example/ad"></iframe>'
    )
    got = {(t, u) for u, t, _ in htmlfn.extract_links(html)}
    assert got == {
        ("frame", "http://old.example/nav"),
        ("iframe", "http://new.example/ad"),
    }


def test_extract_title_strips_tags():
    assert htmlfn.extract_title(HTML) == "The Page Title"
    assert htmlfn.extract_title("") is None
    assert htmlfn.extract_title("<p>no title</p>") is None


def test_extract_meta_tags_lowercases_names():
    assert htmlfn.extract_meta_tags(HTML) == {"description": "a test page"}


def test_meta_tags_udf_and_full_header_map(spark):
    df = spark.createDataFrame([(HTML,)], "html string")
    row = df.select(
        htmlfn.extract_meta_tags_udf(F.col("html")).alias("meta")
    ).collect()[0]
    assert row["meta"] == {"description": "a test page"}

    blob = "Content-Type: text/html\r\nX-Custom: v1"
    hdf = spark.createDataFrame([(blob,)], "blob string")
    m = hdf.select(hdr.parse_headers_expr(F.col("blob")).alias("h")).collect()[0][
        "h"
    ]
    assert m == {"content-type": "text/html", "x-custom": "v1"}


def test_canonicalize_expr_matches_udf_on_common_cases(spark):
    """The JVM expression tier must agree with the full-fidelity UDF
    on the common-case rules it implements (scheme/host lowering,
    fragment/default-port/session-param stripping)."""
    urls_in = [
        ("HTTP://Example.COM:80/Path?a=1#frag",),
        ("https://Host.Org:443/x?utm_source=f&b=2",),
        ("http://plain.net/path",),
    ]
    from commoncrawl_crawler_spark.functions import urls as urlfn

    df = spark.createDataFrame(urls_in, "u string").select(
        urlfn.canonicalize_url_expr(F.col("u")).alias("expr"),
        urlfn.canonicalize_url_udf(F.col("u")).alias("udf"),
    )
    for r in df.collect():
        assert r["expr"] == r["udf"], (r["expr"], r["udf"])


def test_get_or_create_reuses_active_session(spark):
    from commoncrawl_crawler_spark.session import get_or_create

    assert get_or_create(spark) is spark
    assert get_or_create(None) is spark  # active session reused


def test_header_expressions(spark):
    blob = (
        "HTTP-Status: ignored\r\n"
        "Content-Type: Application/JSON; charset=utf-8\r\n"
        "Content-Length: 1234\r\n"
        "Cache-Control: private, max-age=600\r\n"
        "Last-Modified: Tue, 02 Jan 2024 10:30:00 GMT"
    )
    df = spark.createDataFrame([(blob,)], "blob string").select(
        hdr.content_type_expr(F.col("blob")).alias("ct"),
        hdr.content_length_expr(F.col("blob")).alias("cl"),
        hdr.max_age_expr(F.col("blob")).alias("ma"),
        hdr.http_date_expr(F.col("blob")).alias("lm"),
        hdr.status_code_expr(F.lit("HTTP/1.1 404 Not Found")).alias("sc"),
    )
    row = df.collect()[0]
    assert row["ct"] == "application/json"
    assert row["cl"] == 1234
    assert row["ma"] == 600
    assert row["lm"].year == 2024 and row["lm"].hour == 10
    assert row["sc"] == 404


def test_pipeline_runs_in_dependency_order_and_skips(spark, tmp_path):
    calls = []

    def step(name, deps=()):
        def build(s, dep_outputs):
            calls.append(name)
            if deps:
                df = dep_outputs[deps[0]]
                return df.withColumn(name, F.lit(1))
            return s.range(3).toDF("id")

        return PipelineStep(name, build, deps)

    task = (
        PipelineTask(str(tmp_path))
        .add(step("c", ("b",)))  # registered out of order on purpose
        .add(step("a"))
        .add(step("b", ("a",)))
    )
    out = task.run(spark)
    assert calls == ["a", "b", "c"]  # toposorted
    assert task.last_executed == ["a", "b", "c"]
    assert set(out) == {"a", "b", "c"}
    assert out["c"].columns == ["id", "b", "c"]

    # second run: everything complete -> nothing re-executes
    calls.clear()
    task2 = (
        PipelineTask(str(tmp_path))
        .add(step("a"))
        .add(step("b", ("a",)))
        .add(step("c", ("b",)))
    )
    task2.run(spark)
    assert calls == []
    assert task2.last_executed == []


def test_pipeline_cycle_detection(spark, tmp_path):
    def noop(s, deps):
        return s.range(1)

    task = (
        PipelineTask(str(tmp_path))
        .add(PipelineStep("x", noop, ("y",)))
        .add(PipelineStep("y", noop, ("x",)))
    )
    with pytest.raises(ValueError, match="cycle"):
        task.run(spark)


# ---- RSS/ATOM feeds (ParserMapper.java:685 capability) ---------------


RSS_DOC = """<rss version="2.0"><channel><title>Blog</title>
<item><title>First</title><link>http://ex.com/1</link><guid>g1</guid>
<pubDate>Mon, 01 Jan 2024</pubDate><description>hello</description></item>
<item><title>Second</title><link>http://ex.com/2</link></item>
</channel></rss>"""

ATOM_DOC = """<feed xmlns="http://www.w3.org/2005/Atom"><title>AF</title>
<entry><title>E1</title><link rel="alternate" href="http://ex.net/a"/>
<id>idA</id><updated>2024-01-02T00:00:00Z</updated>
<author><name>alice</name></author><summary>sum</summary></entry>
<entry><title>E2</title><link rel="enclosure" href="http://ex.net/file.mp3"/>
<link href="http://ex.net/b"/><id>idB</id></entry>
</feed>"""


def test_detect_feed_type():
    assert htmlfn.detect_feed_type(RSS_DOC) == "rss"
    assert htmlfn.detect_feed_type(ATOM_DOC) == "atom"
    assert htmlfn.detect_feed_type("<html><body>x</body></html>") is None
    assert htmlfn.detect_feed_type(None) is None


def test_extract_rss_items():
    items = htmlfn.extract_feed_items(RSS_DOC)
    assert len(items) == 2
    title, url, item_id, published, author, summary = items[0]
    assert (title, url, item_id) == ("First", "http://ex.com/1", "g1")
    assert published == "Mon, 01 Jan 2024" and summary == "hello"
    assert author is None
    assert items[1][0] == "Second" and items[1][2] is None


def test_extract_atom_items():
    items = htmlfn.extract_feed_items(ATOM_DOC)
    assert len(items) == 2
    assert items[0][:3] == ("E1", "http://ex.net/a", "idA")
    assert items[0][4] == "alice" and items[0][5] == "sum"
    # rel=enclosure must not win over the (default alternate) link
    assert items[1][1] == "http://ex.net/b"


def test_feed_links_typed():
    links = htmlfn.extract_feed_links(RSS_DOC)
    assert [(u, t) for u, t, _ in links] == [
        ("http://ex.com/1", "rss_item"),
        ("http://ex.com/2", "rss_item"),
    ]
    assert links[0][2] == "First"  # anchor carries the item title
    assert htmlfn.extract_feed_links("<not-xml") == []


def test_malformed_feed_yields_empty():
    assert htmlfn.extract_feed_items("<rss><channel><item></rss>") == []
