"""Full-fidelity CrawlDB merge: golden cases ported from the
reference's CrawlDBMergingReducerTests.java (URLStateModel
updateModelGivenCrawlStatus, :405-445) -- the summary-evolution rules
over explicit multi-attempt inputs, plus the detail-record field
gating of crawlDetailRecordFromCrawlStatusRecord (:791-876).

One documented divergence: for a 2xx attempt whose content has no
links array (feeds), the reducer RETAINS the previous attempt's
extHrefs (updateLinkStatsFromHTMLContent only clears when links are
present) while the reference's own test model clears them; we follow
the reducer.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from commoncrawl_crawler_spark.operators import crawldb

STATUS_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("attempt_time", LongType()),
        StructField("disposition", StringType()),
        StructField("http_result", IntegerType()),
        StructField("server_ip", StringType()),
        StructField("content_len", IntegerType()),
        StructField("mime_type", StringType()),
        StructField("md5", StringType()),
        StructField("text_simhash", LongType()),
        StructField("parsed_as", StringType()),
        StructField("title", StringType()),
        StructField("target_url", StringType()),
        StructField("failure_reason", StringType()),
        StructField("failure_detail", StringType()),
        StructField("http_date", LongType()),
        StructField("http_last_modified", LongType()),
        StructField("etag", StringType()),
        StructField("intra_domain_links", IntegerType()),
        StructField("intra_root_links", IntegerType()),
        StructField("inter_domain_links", IntegerType()),
        StructField("ext_hrefs", ArrayType(StringType())),
    ]
)

LINK_SCHEMA = (
    "key long, is_internal boolean, type_and_rel string, http_date long"
)


def _status_row(
    key,
    t,
    disposition="SUCCESS",
    http=200,
    parsed_as="html",
    target=None,
    ext=None,
):
    return (
        key,
        t,
        disposition,
        None if disposition == "FAILURE" else http,
        "1.1.1.1",
        100,
        "text/html",
        "5d41402abc4b2a76b9719d911017c592",
        1234,
        parsed_as,
        "title",
        target,
        "FailureReason" if disposition == "FAILURE" else None,
        "FailureDetail" if disposition == "FAILURE" else None,
        t - 10,
        t - 20,
        "etag1",
        3,
        2,
        1,
        ext,
    )


def _merge(spark, status_rows, link_rows=()):
    status = spark.createDataFrame(status_rows, STATUS_SCHEMA)
    links = spark.createDataFrame(list(link_rows) or [], LINK_SCHEMA)
    return {
        r["key"]: r
        for r in crawldb.merge_crawldb_full(status, links).collect()
    }


def test_summary_evolution_success_redirect_failure(spark):
    # html 200 @100, redirect 301 @200, fetch failure @300
    rows = _merge(
        spark,
        [
            _status_row(1, 100, ext=["http://b.com/", "http://a.com/"]),
            _status_row(1, 200, http=301, parsed_as=None, target="http://r/"),
            _status_row(1, 300, disposition="FAILURE"),
        ],
    )
    cs = rows[1]["crawl_status"]
    assert cs["attempt_count"] == 3
    assert cs["latest_attempt"] == 300
    # newest NON-FAILED attempt carries http_result (the failure at 300
    # never overwrites -- CrawlDBMergingReducer.java:923)
    assert cs["http_result"] == 301
    assert cs["latest_crawl"] == 100 and cs["crawl_count"] == 1
    assert cs["parsed_as"] == "html"
    assert cs["redirect_url"] == "http://r/"
    assert cs["ext_urls"] == ["http://a.com/", "http://b.com/"]  # sorted set
    assert cs["ext_urls_truncated"] is False
    details = cs["crawl_stats"]
    assert [d["attempt_time"] for d in details] == [100, 200, 300]
    ok, redir, fail = details
    # 2xx detail: content fields present (crawlDetailRecord :817-860)
    assert ok["md5"] and ok["title"] == "title" and ok["content_len"] == 100
    assert ok["intra_domain_links"] == 3 and ok["redirect_url"] is None
    # 3xx detail: redirect_url only, no content fields (:862-876)
    assert redir["redirect_url"] == "http://r/" and redir["md5"] is None
    assert redir["server_ip"] == "1.1.1.1"  # SUCCESS disposition keeps ip
    # failure detail: fetch_failed + reason/detail, nothing else (:878-884)
    assert fail["fetch_failed"] is True
    assert fail["failure_reason"] == "FailureReason"
    assert fail["server_ip"] is None and fail["http_result"] is None


def test_redirect_then_success_keeps_redirect_url(spark):
    # 301 @100 then 200 feed @200: http_result moves to 200, but
    # redirect_url is never removed (the reducer only addProperty's)
    rows = _merge(
        spark,
        [
            _status_row(2, 100, http=301, parsed_as=None, target="http://r2/"),
            _status_row(2, 200, parsed_as="feed"),
        ],
    )
    cs = rows[2]["crawl_status"]
    assert cs["http_result"] == 200
    assert cs["redirect_url"] == "http://r2/"
    assert cs["parsed_as"] == "feed"
    assert cs["latest_crawl"] == 200 and cs["crawl_count"] == 1
    # feed content has no links array -> extHrefs retained (here: none)
    assert cs["ext_urls"] == []


def test_feed_after_html_retains_ext_urls(spark):
    rows = _merge(
        spark,
        [
            _status_row(3, 100, ext=["http://x.com/"]),
            _status_row(3, 200, parsed_as="feed", ext=None),
        ],
    )
    cs = rows[3]["crawl_status"]
    assert cs["parsed_as"] == "feed"  # summary follows newest 2xx
    assert cs["ext_urls"] == ["http://x.com/"]  # linkless 2xx keeps hrefs


def test_ext_urls_capped_and_flagged(spark):
    ext = [f"http://e{i:04d}.com/" for i in range(150)]
    rows = _merge(spark, [_status_row(4, 100, ext=ext)])
    cs = rows[4]["crawl_status"]
    assert len(cs["ext_urls"]) == crawldb.MAX_EXT_URLS
    assert cs["ext_urls"] == sorted(ext)[: crawldb.MAX_EXT_URLS]
    assert cs["ext_urls_truncated"] is True


def test_link_only_key_and_type_rel_cap(spark):
    links = [
        (5, i % 2 == 0, f"html:a:rel{i}", 1000 + i) for i in range(8)
    ]
    rows = _merge(spark, [_status_row(6, 100)], links)
    assert rows[5]["crawl_status"] is None  # link-only key: no summary
    ls = rows[5]["link_status"]
    assert ls["int_src_count"] == 4 and ls["ext_src_count"] == 4
    assert ls["earliest_date"] == 1000 and ls["latest_date"] == 1007
    assert len(ls["typeAndRels"]) == crawldb.MAX_TYPE_SAMPLES
    assert ls["typeAndRels"] == sorted(f"html:a:rel{i}" for i in range(8))[:5]
    assert rows[6]["link_status"] is None  # status-only key: no link rec


def test_flat_projection_row_count_and_alignment(spark):
    status = [
        _status_row(7, 100),
        _status_row(7, 200, disposition="FAILURE"),
    ]
    links = [(8, True, "html:a", 500)]
    flat = crawldb.merged_full_flat(
        crawldb.merge_crawldb_full(
            spark.createDataFrame(status, STATUS_SCHEMA),
            spark.createDataFrame(links, LINK_SCHEMA),
        )
    ).collect()
    # one row per attempt + one row for the link-only key
    assert [(r["key"], r["attempt_time"]) for r in flat] == [
        (7, 100),
        (7, 200),
        (8, None),
    ]
    by_key = {}
    for r in flat:
        by_key.setdefault(r["key"], []).append(r)
    assert all(r["attempt_count"] == 2 for r in by_key[7])
    assert by_key[8][0]["type_and_rels"] == "html:a"
    assert by_key[8][0]["ext_urls"] == ""  # scalarized empty, not null
