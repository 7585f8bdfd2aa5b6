"""Distributed RobotRulesParser semantics vs the reference's state
machine (service/crawler/RobotRulesParser.java:171-419): stanza
precedence + earliest-tie-break, first-match-in-file-order prefix
walk, empty-rule clearing, last-crawl-delay-wins, and the allow-all /
forbid-all boundary rule sets."""

from __future__ import annotations

from commoncrawl_crawler_spark.operators import robots


def _rules(spark, blobs, agents):
    df = spark.createDataFrame(blobs, "host string, content string")
    return robots.parse_robot_rules(df, agents)


def _verdicts(spark, blobs, agents, urls):
    rules = _rules(spark, blobs, agents)
    u = spark.createDataFrame(urls, "key long, host string, path string")
    return {r["key"]: r for r in robots.robots_allowed(u, rules).collect()}


def test_stanza_precedence_and_rule_order(spark):
    blob = (
        "# comment\n"
        "User-agent: crawlerbot\n"
        "Disallow: /private/\n"
        "Allow: /private/ok\n"
        "Crawl-Delay: 2\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    out = _verdicts(
        spark,
        [("a.com", blob)],
        ["crawlerbot"],
        [
            (1, "a.com", "/private/x"),
            # first matching entry wins IN FILE ORDER (the reference
            # walks entries sequentially): /private/ fires before the
            # later Allow /private/ok can
            (2, "a.com", "/private/ok/y"),
            (3, "a.com", "/pub"),
            (4, "a.com", ""),  # empty path tests as '/'
        ],
    )
    assert [out[k]["allowed"] for k in (1, 2, 3, 4)] == [
        False,
        False,
        True,
        True,
    ]
    assert out[1]["crawl_delay_ms"] == 2000


def test_allow_before_disallow_and_clearing(spark):
    blob = (
        "User-agent: bot\n"
        "Disallow: /never/\n"
        "Disallow:\n"  # empty rule clears everything so far
        "Allow: /p/1\n"
        "Disallow: /p/\n"
    )
    out = _verdicts(
        spark,
        [("a.com", blob)],
        ["bot"],
        [
            (1, "a.com", "/never/x"),  # cleared -> allowed
            (2, "a.com", "/p/15"),  # Allow /p/1 fires first (prefix)
            (3, "a.com", "/p/7"),
        ],
    )
    assert [out[k]["allowed"] for k in (1, 2, 3)] == [True, True, False]


def test_consecutive_ua_lines_share_stanza_and_delay_last_wins(spark):
    blob = (
        "User-agent: otherbot\n"
        "User-agent: *\n"
        "Disallow: /tmp/\n"
        "Crawl-Delay: 9\n"
        "Crawl-Delay: 5\n"
    )
    rules = {
        r["host"]: r
        for r in _rules(spark, [("b.com", blob)], ["crawlerbot"]).collect()
    }
    assert rules["b.com"]["crawl_delay_ms"] == 5000
    assert rules["b.com"]["explicit_mention"] is False  # '*' matched


def test_explicit_mention_and_specific_beats_wildcard(spark):
    blob = (
        "User-agent: *\n"
        "Disallow: /\n"
        "User-agent: me\n"
        "Disallow: /only/\n"
    )
    rows = _rules(spark, [("a.com", blob)], ["me"]).collect()
    assert [(r["prefix"], r["allowed"]) for r in rows] == [("/only/", False)]
    assert rows[0]["explicit_mention"] is True


def test_no_matching_stanza_allows_everything(spark):
    out = _verdicts(
        spark,
        [("c.com", "User-agent: nobodyelse\nDisallow: /\n")],
        ["crawlerbot"],
        [(1, "c.com", "/anything")],
    )
    assert out[1]["allowed"] is True
    assert out[1]["crawl_delay_ms"] == -1


def test_forbid_all_rules_shape(spark):
    """A 403-forbidden robots fetch is the single ('', false) rule --
    the empty prefix matches every path (getForbidAllRules)."""
    from pyspark.sql import Row

    rules = spark.createDataFrame(
        [
            Row(
                host="x.com",
                rule_ord=1,
                prefix="",
                allowed=False,
                crawl_delay_ms=-1,
                explicit_mention=False,
            )
        ]
    )
    u = spark.createDataFrame(
        [(1, "x.com", "/"), (2, "x.com", "/deep/page")],
        "key long, host string, path string",
    )
    out = {r["key"]: r for r in robots.robots_allowed(u, rules).collect()}
    assert out[1]["allowed"] is False and out[2]["allowed"] is False


def test_disallow_percent_decodes_allow_does_not(spark):
    blob = (
        "User-agent: bot\n"
        "Allow: /a%20b\n"
        "Disallow: /c%20d\n"
    )
    rows = {
        r["prefix"]: r["allowed"]
        for r in _rules(spark, [("a.com", blob)], ["bot"]).collect()
    }
    # reference quirk: the Disallow branch URL-decodes, Allow doesn't
    assert rows == {"/a%20b": True, "/c d": False}
    out = _verdicts(
        spark,
        [("a.com", blob)],
        ["bot"],
        [(1, "a.com", "/c%20d/x")],  # tested path decodes before match
    )
    assert out[1]["allowed"] is False
