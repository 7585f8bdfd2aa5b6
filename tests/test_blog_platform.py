"""Blog-platform probe-URL rules (GenBlogPlatformUrlsStep.java port).

Hand-computed expectations for every named per-platform rule,
including the reference's quirks: the page/2-skip wordpress
pagination arithmetic, the per-MONTH (not per-page) skip_if_dupe
flag, the typepad trailing-slash normalization, the tumblr /archive
companion, and the >=2011 activity gate.
"""

from __future__ import annotations

from commoncrawl_crawler_spark.operators import crawllist


def _rows(spark, pf_rows, start=(2012, 6)):
    df = spark.createDataFrame(
        pf_rows,
        "url string, last_year_with_posts int, avg_posts_per_month double",
    )
    return sorted(
        map(
            tuple,
            crawllist.blog_platform_urls(df, *start).collect(),
        )
    )


def test_probe_dates_walk_backwards_capped_at_2000():
    d = crawllist.blog_probe_dates(2012, 6, max_months_to_probe=8)
    assert d == [(2012, 6), (2012, 5), (2012, 4), (2012, 3),
                 (2012, 2), (2012, 1), (2011, 12), (2011, 11)]
    # never probes before year 2000 even with a huge cap
    early = crawllist.blog_probe_dates(2000, 2, max_months_to_probe=99)
    assert early == [(2000, 2), (2000, 1)]


def test_other_platform_emits_home_only(spark):
    rows = _rows(spark, [("http://my.example.org/", 2012, 50.0)])
    assert rows == [
        ("http://my.example.org/", "other", "http://my.example.org/", False)
    ]


def test_wordpress_pagination_quirks(spark):
    # avg 25 -> ceil(25/10) = 3 paginations -> pages 1,2 per month:
    # page 1 = 'YYYY/MM/', page 2 = 'YYYY/MM/page/3/' (the reference
    # emits page+1 and never /page/2/)
    rows = _rows(
        spark, [("http://b.wordpress.com/", 2011, 25.0)], start=(2012, 2)
    )
    by_url = {r[2]: r for r in rows}
    assert ("http://b.wordpress.com/", "wordpress",
            "http://b.wordpress.com/", False) in rows
    assert by_url["http://b.wordpress.com/2012/02/"][3] is False  # 1st month
    assert by_url["http://b.wordpress.com/2012/01/"][3] is True
    assert "http://b.wordpress.com/2012/02/page/3/" in by_url
    assert "http://b.wordpress.com/2012/02/page/2/" not in by_url
    # 24 months x 2 pages + home
    assert len(rows) == 24 * 2 + 1


def test_wordpress_low_volume_and_dormant_emit_home_only(spark):
    # avg <= 10 -> paginations 1 -> the page loop is empty (reference
    # arithmetic); dormant (< 2011) skips the calendar entirely
    for pf in [("http://a.wordpress.com/", 2012, 8.0),
               ("http://a.wordpress.com/", 2010, 99.0)]:
        rows = _rows(spark, [pf])
        assert rows == [("http://a.wordpress.com/", "wordpress",
                         "http://a.wordpress.com/", False)]


def test_blogger_archive_calendar(spark):
    rows = _rows(
        spark, [("http://x.blogspot.com/", 2011, 1.0)], start=(2012, 1)
    )
    urls = [r[2] for r in rows]
    assert "http://x.blogspot.com/2012_01_01_archive.html" in urls
    assert "http://x.blogspot.com/2010_02_01_archive.html" in urls
    assert len(rows) == 24 + 1
    skips = {r[2]: r[3] for r in rows}
    assert skips["http://x.blogspot.com/2012_01_01_archive.html"] is False
    assert skips["http://x.blogspot.com/2011_12_01_archive.html"] is True


def test_typepad_gains_trailing_slash(spark):
    rows = _rows(
        spark, [("http://t.typepad.com/weblog", 2012, 1.0)], start=(2012, 1)
    )
    urls = [r[2] for r in rows]
    assert "http://t.typepad.com/weblog/" in urls  # slashed home
    assert "http://t.typepad.com/weblog/2012/01/index.html" in urls
    assert len(rows) == 24 + 1


def test_tumblr_home_plus_archive_no_calendar(spark):
    rows = _rows(spark, [("http://z.tumblr.com/", 2012, 99.0)])
    assert rows == [
        ("http://z.tumblr.com/", "tumblr", "http://z.tumblr.com/", False),
        ("http://z.tumblr.com/", "tumblr", "http://z.tumblr.com/archive",
         False),
    ]


def test_explicit_flags_outrank_root_domain(spark):
    df = spark.createDataFrame(
        [("http://host.example.net/", 2010, 1.0, True)],
        "url string, last_year_with_posts int, avg_posts_per_month double,"
        " is_tumblr boolean",
    )
    rows = crawllist.blog_platform_urls(df, 2012, 6).collect()
    assert {r["platform"] for r in rows} == {"tumblr"}
    assert {r["probe_url"] for r in rows} == {
        "http://host.example.net/", "http://host.example.net/archive"
    }
