"""Named crawler filters vs the reference's embedded test vectors.

PageRankBoostFilter.testFilter (PageRankBoostFilter.java:90-100),
CrawlRateOverrideFilter testInputs/main (:96-170), and the recrawl
filter's min-fold (ReCrawlTimeModifierFilter.java:104-135), expressed
over explicit URL rows.
"""

from __future__ import annotations

from commoncrawl_crawler_spark.operators import crawlfilters

URL_SCHEMA = "key long, root_domain string, domain string, path string"


def _urls(spark, rows):
    return spark.createDataFrame(rows, URL_SCHEMA)


def _by_key(df, col):
    return {r["key"]: r[col] for r in df.collect()}


def test_pagerank_boost_sums_all_matching_rules(spark):
    # the reference's own vectors: global '.*' boost 2.0 applies
    # everywhere; per-root path rules ADD on top
    rules = crawlfilters.rules_df(
        spark,
        [
            ("*", "", ".*", 2.0),
            ("google.com", "", "/foobar/.*", 1.0),
            ("twitter.com", "", "/[^/]*", 1.0),
        ],
    )
    urls = _urls(
        spark,
        [
            (1, "google.com", "www.google.com", "/foobar/zzzz"),
            (2, "twitter.com", "twitter.com", "/foobar"),
            (3, "twitter.com", "twitter.com", "/a/b"),  # path rule misses
            (4, "other.com", "other.com", "/x"),  # only global
        ],
    )
    got = _by_key(crawlfilters.pagerank_boost_filter(urls, rules), "pagerank_boost")
    assert got == {1: 3.0, 2: 3.0, 3: 2.0, 4: 2.0}


def test_pagerank_boost_domain_regex_is_full_match(spark):
    rules = crawlfilters.rules_df(
        spark, [("a.com", "www\\..*", ".*", 1.0)]
    )
    urls = _urls(
        spark,
        [
            (1, "a.com", "www.a.com", "/"),
            (2, "a.com", "xwww.a.com", "/"),  # prefix must anchor
        ],
    )
    got = _by_key(crawlfilters.pagerank_boost_filter(urls, rules), "pagerank_boost")
    assert got == {1: 1.0, 2: None}  # no match -> NoAction -> null


def test_crawl_rate_min_matching_rule_wins(spark):
    # the reference walks rules rate-ascending and stops at the first
    # match: a /p/ URL on d3.com hits both rules -> 25
    rules = crawlfilters.rules_df(
        spark,
        [
            ("d3.com", "*", "*", 50.0),
            ("d3.com", "*", "/p/.*", 25.0),
            ("yahoo.com", "shopping\\.yahoo\\.com", "*", 50.0),
        ],
    )
    urls = _urls(
        spark,
        [
            (1, "d3.com", "www.d3.com", "/p/7"),
            (2, "d3.com", "www.d3.com", "/other"),
            (3, "yahoo.com", "shopping.yahoo.com", "/x"),
            (4, "yahoo.com", "mail.yahoo.com", "/x"),  # subdomain literal
            (5, "unlisted.com", "www.unlisted.com", "/"),
        ],
    )
    got = _by_key(
        crawlfilters.crawl_rate_override_filter(urls, rules),
        "crawl_rate_override",
    )
    assert got == {1: 25, 2: 50, 3: 50, 4: None, 5: None}


def test_recrawl_time_min_fold_on_index_pages(spark):
    rules = crawlfilters.rules_df(
        spark,
        [
            ("*", "", "(^/$)|(^/index\\.[^/]*$)", 86400.0),
            ("twitter.com", "", "/[^/]*", 3600.0),
        ],
    )
    urls = _urls(
        spark,
        [
            (1, "google.com", "google.com", "/"),
            (2, "kotay.com", "kotay.com", "/index.html"),
            (3, "kotay.com", "kotay.com", "/index.php"),
            (4, "twitter.com", "twitter.com", "/foobar"),
            (5, "twitter.com", "twitter.com", "/"),  # both rules -> min
            (6, "google.com", "google.com", "/deep/page"),
        ],
    )
    got = _by_key(
        crawlfilters.recrawl_time_modifier_filter(urls, rules),
        "modified_recrawl_time",
    )
    assert got == {1: 86400, 2: 86400, 3: 86400, 4: 3600, 5: 3600, 6: None}


def test_filter_chain_composes(spark):
    urls = _urls(spark, [(1, "d3.com", "www.d3.com", "/p/7")])
    out = crawlfilters.apply_crawl_filters(
        urls,
        boost_rules=crawlfilters.rules_df(spark, [("*", "", "/p/.*", 2.0)]),
        rate_rules=crawlfilters.rules_df(spark, [("d3.com", "*", "*", 50.0)]),
        recrawl_rules=crawlfilters.rules_df(
            spark, [("d3.com", "", ".*", 3600.0)]
        ),
    ).collect()[0]
    assert out["pagerank_boost"] == 2.0
    assert out["crawl_rate_override"] == 50
    assert out["modified_recrawl_time"] == 3600
    # one row out per row in: annotation, not fan-out


def test_politeness_schedule_serializes_per_host(spark):
    """Slots are 1..n per host in priority order (nulls last), and
    offsets step by the URL's rate override (default 500ms)."""
    from pyspark.sql import Row
    from commoncrawl_crawler_spark.operators import crawllist

    urls = spark.createDataFrame(
        [
            Row(key=1, domain="a.com", pagerank_boost=2.0, crawl_rate_override=None),
            Row(key=2, domain="a.com", pagerank_boost=None, crawl_rate_override=None),
            Row(key=3, domain="a.com", pagerank_boost=5.0, crawl_rate_override=None),
            Row(key=4, domain="b.com", pagerank_boost=None, crawl_rate_override=100),
            Row(key=5, domain="b.com", pagerank_boost=None, crawl_rate_override=100),
        ]
    )
    out = {r.key: r for r in crawllist.politeness_schedule(urls).collect()}
    # a.com priority order: key 3 (5.0), key 1 (2.0), key 2 (null last)
    assert (out[3].slot, out[1].slot, out[2].slot) == (1, 2, 3)
    assert out[2].scheduled_offset_ms == 2 * 500
    # b.com: rate override 100ms steps
    assert (out[4].slot, out[5].slot) == (1, 2)
    assert out[5].scheduled_offset_ms == 100


def test_compiled_and_join_paths_agree(spark, monkeypatch):
    """The compiled-expression fast path and the broadcast-join
    fallback are the same operator: identical output on a rule set
    exercising global roots, empty-domain skips, '*' wildcards, and
    multi-rule folds."""
    rules_boost = crawlfilters.rules_df(
        spark,
        [
            ("*", "", "/p/.*", 2.0),
            ("a.com", "www\\..*", ".*", 1.5),
            # NULL regex fields: rlike(NULL pattern) is NULL in the
            # join path, so these rules never match -- the compiled
            # path must not bake a literal '^(?:None)$' pattern
            # (url 5's domain is the string 'None' to catch that)
            ("*", None, ".*", 100.0),
            ("*", "", None, 200.0),
        ],
    )
    rules_rate = crawlfilters.rules_df(
        spark,
        [("a.com", "*", "*", 50.0), ("a.com", "*", "/p/.*", 25.0)],
    )
    rules_recrawl = crawlfilters.rules_df(
        spark, [("*", "", "(^/$)", 86400.0), ("b.com", "", ".*", 3600.0)]
    )
    urls = _urls(
        spark,
        [
            (1, "a.com", "www.a.com", "/p/7"),
            (2, "a.com", "shop.a.com", "/p/9"),
            (3, "b.com", "b.com", "/"),
            (4, "c.com", "c.com", "/x"),
            (5, "n.com", "None", "None"),
        ],
    )

    def run():
        return sorted(
            crawlfilters.apply_crawl_filters(
                urls, rules_boost, rules_rate, rules_recrawl
            ).collect(),
            key=lambda r: r["key"],
        )

    compiled = run()
    monkeypatch.setattr(crawlfilters, "COMPILE_MAX_RULES", 0)
    joined = run()
    assert compiled == joined
    assert compiled[0]["pagerank_boost"] == 3.5  # both rules fold


def test_compiled_filter_chain_is_shuffle_free(spark):
    """Bounded rule tables compile to Column expressions: the whole
    three-filter chain must plan without any Exchange over the URL
    table (at 100 TB the URL side never shuffles for KB-sized rules)."""
    urls = _urls(spark, [(1, "a.com", "www.a.com", "/p/7")])
    out = crawlfilters.apply_crawl_filters(
        urls,
        boost_rules=crawlfilters.rules_df(spark, [("*", "", "/p/.*", 2.0)]),
        rate_rules=crawlfilters.rules_df(spark, [("a.com", "*", "*", 50.0)]),
        recrawl_rules=crawlfilters.rules_df(
            spark, [("a.com", "", ".*", 3600.0)]
        ),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_crawl_budget_summary_splits_planned_and_deferred(spark):
    from commoncrawl_crawler_spark.operators import crawllist

    # host a: 5 urls at 400ms -> offsets 0,400,800,1200,1600; window
    # 1000 plans 3, defers 2. host b: 2 urls, one with a 900ms
    # override -> offsets 0 and 900 (slot order: priority desc)
    rows = [
        ("a%d" % i, "a.com", float(10 - i), None) for i in range(5)
    ] + [("b0", "b.com", 5.0, 900), ("b1", "b.com", 1.0, 900)]
    urls = spark.createDataFrame(
        rows, "key string, domain string, pagerank_boost double, "
        "crawl_rate_override long"
    )
    out = {
        r.domain: r
        for r in crawllist.crawl_budget_summary(
            urls, window_ms=1000, default_interval_ms=400
        ).collect()
    }
    assert (out["a.com"].planned, out["a.com"].deferred) == (3, 2)
    assert (out["b.com"].planned, out["b.com"].deferred) == (2, 0)
    assert out["a.com"].window_ms == 1000
