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


def test_unparseable_crawl_delay_resets_to_minus_one(spark):
    """RobotRulesParser.java:402-411 calls setCrawlDelay even when
    Long.parseLong throws: a non-empty bad value after a valid one
    RESETS the delay; a decimal is rejected (not truncated); an EMPTY
    value is skipped entirely (no set)."""
    cases = [
        # last non-empty line 'xx' -> reset to -1
        ("r1.com", "User-agent: *\nCrawl-Delay: 5\nCrawl-Delay: xx\n", -1),
        # '2.5' would be try_cast-truncated to 2 -- must be -1
        ("r2.com", "User-agent: *\nCrawl-Delay: 2.5\n", -1),
        # empty value is NOT a set: the earlier 5 survives
        ("r3.com", "User-agent: *\nCrawl-Delay: 5\nCrawl-Delay:\n", 5000),
        # signs pass the strict parse like Long.parseLong
        ("r4.com", "User-agent: *\nCrawl-Delay: -2\n", -2000),
        ("r5.com", "User-agent: *\nCrawl-Delay: +3\n", 3000),
        # bigint overflow throws in Java -> -1
        ("r6.com", "User-agent: *\nCrawl-Delay: 99999999999999999999\n", -1),
    ]
    rules = {
        r["host"]: r["crawl_delay_ms"]
        for r in _rules(
            spark, [(h, b) for h, b, _ in cases], ["crawlerbot"]
        ).collect()
    }
    for host, _, want in cases:
        assert rules[host] == want, host


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


# ---------------------------------------------------------------------------
# differential test: pure-Python model of the reference state machine
# (RobotRulesParser.java:297-419) vs the distributed plan, over seeded
# random blobs covering stanza/clear/delay/precedence interactions
# ---------------------------------------------------------------------------

import re as _re
from urllib.parse import unquote_plus as _unquote_plus


def _unquote(s: str) -> str:
    """Java URLDecoder semantics: an INVALID percent escape raises,
    and the caller keeps the raw string -- python's unquote_plus
    never raises and would partially decode mixed strings instead."""
    if _re.search(r"%(?![0-9A-Fa-f]{2})", s):
        raise ValueError(s)
    return _unquote_plus(s)


def _model(content: str, agents: list[str]):
    """Line-for-line port of parseRules + isAllowed semantics."""
    names = {a.lower(): i for i, a in enumerate(agents)}
    if "*" not in names:
        names["*"] = len(agents)
    n_cfg = len(agents)
    NO = float("inf")
    best = None  # (prec, rules, delay, explicit)
    best_prec = NO
    cur_rules, cur_prec, cur_delay, cur_explicit = [], NO, -1, False
    add_rules = done_agents = False
    for line in _re.split(r"[\n\r]+", content):
        h = line.find("#")
        if h >= 0:
            line = line[:h]
        line = line.strip()
        low = line.lower()
        if low.startswith("user-agent:"):
            if done_agents:
                if cur_prec < best_prec:
                    best_prec = cur_prec
                    best = (cur_rules, cur_delay, cur_explicit)
                cur_rules, cur_prec = [], NO
                cur_delay, cur_explicit = -1, False
                add_rules = False
            done_agents = False
            for tok in line[line.index(":") + 1 :].strip().split():
                t = tok.lower()
                if t in names:
                    p = names[t]
                    if t != "*" and p < n_cfg:
                        cur_explicit = True
                    if p < cur_prec and p < best_prec:
                        cur_prec = p
            if cur_prec < best_prec:
                add_rules = True
        elif low.startswith("disallow:") or low.startswith("allow:"):
            done_agents = True
            allowed = low.startswith("allow:")
            path = line[line.index(":") + 1 :].strip()
            if add_rules:
                if path == "":
                    cur_rules = []
                else:
                    if not allowed:  # only Disallow decodes
                        try:
                            path = _unquote(path)
                        except Exception:
                            pass
                    cur_rules.append((path, allowed))
        elif low.startswith("crawl-delay:"):
            done_agents = True
            if add_rules:
                v = line[line.index(":") + 1 :].strip()
                if v:
                    # the reference sets the delay even when parsing
                    # fails (RobotRulesParser.java:402-411): a
                    # non-empty unparseable value RESETS to -1. Strict
                    # Long.parseLong gate (no '2.5', no '1_0').
                    if _re.fullmatch(r"[+-]?[0-9]+", v, _re.ASCII):
                        try:
                            cur_delay = int(v) * 1000
                        except ValueError:
                            cur_delay = -1
                    else:
                        cur_delay = -1
    if cur_prec < best_prec:
        best = (cur_rules, cur_delay, cur_explicit)
    if best is None:
        return None
    return best


def _model_allowed(rules, path):
    if not path:
        path = "/"
    try:
        path = _unquote(path)
    except Exception:
        pass
    for prefix, allowed in rules:
        if path.startswith(prefix):
            return allowed
    return True


def test_differential_random_blobs(spark):
    import random

    rng = random.Random(20260814)
    toks = ["crawlerbot", "otherbot", "*", "me", "CrawlerBot"]
    paths = ["/a", "/a/b", "/p/1", "", "/x%20y", "/", "/deep/q", "/x%zz"]
    delays = ["3", "0", "-2", "xx", ""]

    def line():
        k = rng.randrange(7)
        if k <= 1:
            n = rng.randrange(1, 3)
            return "User-agent: " + " ".join(rng.choice(toks) for _ in range(n))
        if k <= 3:
            return "Disallow: " + rng.choice(paths)
        if k == 4:
            return "Allow: " + rng.choice(paths)
        if k == 5:
            return "Crawl-Delay: " + rng.choice(delays)
        return rng.choice(["# comment", "", "junk line", "Sitemap: /s.xml"])

    blobs = [
        (f"h{i}.com", "\n".join(line() for _ in range(rng.randrange(2, 14))))
        for i in range(60)
    ]
    agents = ["crawlerbot"]
    test_paths = ["/a/b/c", "/p/1", "/x y/z", "/q", "", "/x%zz/t"]
    urls = [
        (i * 10 + j, host, p)
        for i, (host, _) in enumerate(blobs)
        for j, p in enumerate(test_paths)
    ]
    got = _verdicts(spark, blobs, agents, urls)
    for i, (host, content) in enumerate(blobs):
        m = _model(content, agents)
        exp_delay = m[1] if m else -1
        for j, p in enumerate(test_paths):
            exp = _model_allowed(m[0], p) if m else True
            r = got[i * 10 + j]
            assert r["allowed"] == exp, (host, p, content)
            assert r["crawl_delay_ms"] == exp_delay, (host, content)


def test_crawl_delay_millisecond_overflow_never_crashes(spark):
    """Seconds that fit bigint but overflow when *1000 must yield -1
    under ANSI mode, not an arithmetic-overflow error (robots.txt is
    attacker-controlled input)."""
    blob = "User-agent: *\nCrawl-Delay: 9223372036854775807\n"
    rules = {
        r["host"]: r["crawl_delay_ms"]
        for r in _rules(spark, [("o.com", blob)], ["crawlerbot"]).collect()
    }
    assert rules["o.com"] == -1


def test_sitemap_extraction_is_stanza_independent(spark):
    from commoncrawl_crawler_spark.operators.robots import extract_sitemap_urls

    blobs = spark.createDataFrame(
        [
            # before any stanza, mid-stanza, odd casing, comment strip,
            # duplicate directive collapses via distinct
            (
                "a.com",
                "Sitemap: https://a.com/s1.xml\n"
                "User-agent: x\nDisallow: /\n"
                "sitemap:https://a.com/s2.xml\n"
                "SITEMAP:  https://a.com/s1.xml  # dupe\n",
            ),
            ("b.com", "User-agent: *\nDisallow: /\n"),
            # a path containing the word sitemap must NOT match
            ("c.com", "Disallow: /sitemap: fake\n"),
        ],
        "host string, content string",
    )
    out = [
        (r.host, r.sitemap_url) for r in extract_sitemap_urls(blobs).collect()
    ]
    assert out == [
        ("a.com", "https://a.com/s1.xml"),
        ("a.com", "https://a.com/s2.xml"),
    ]


# ---- RFC 9309 wildcard evaluator ----------------------------------


def _rfc_verdicts(spark, blob, urls):
    rules = _rules(spark, [("h", blob)], ["bot"])
    u = spark.createDataFrame(
        [(i, "h", p) for i, p in enumerate(urls)],
        "key long, host string, path string",
    )
    rows = robots.robots_allowed_rfc9309(u, rules).collect()
    return {urls[r.key]: r.allowed for r in rows}


def test_rfc9309_wildcards_anchors_and_specificity(spark):
    blob = (
        "User-agent: *\nDisallow: /private*\nAllow: /private/pub$\n"
        "Disallow: /*.zip$\nAllow: /\n"
    )
    got = _rfc_verdicts(
        spark,
        blob,
        [
            "/index.html",       # only Allow:/ matches
            "/private/data",     # Disallow:/private* (9) > Allow:/ (1)
            "/private/pub",      # Allow:/private/pub$ (13) wins
            "/private/pubx",     # $ anchor misses -> Disallow wins
            "/files/a.zip",      # Disallow:/*.zip$ (7) > Allow:/ (1)
            "/files/a.zip.txt",  # anchor misses -> allowed
        ],
    )
    assert got == {
        "/index.html": True,
        "/private/data": False,
        "/private/pub": True,
        "/private/pubx": False,
        "/files/a.zip": False,
        "/files/a.zip.txt": True,
    }


def test_rfc9309_tie_goes_to_allow(spark):
    blob = "User-agent: *\nDisallow: /private*\nAllow: /privat*e\n"
    # both rules are 9 octets and both match -> allow wins the tie
    got = _rfc_verdicts(spark, blob, ["/private"])
    assert got["/private"] is True


def test_rfc9309_regex_metachars_are_literal(spark):
    # ., (, ), [, ], {, }, |, +, ?, ^ and a mid-rule $ must match
    # literally, never as regex syntax
    blob = (
        "User-agent: *\nDisallow: /a.b\nDisallow: /c(d)e\n"
        "Disallow: /f[g]\nDisallow: /h+i?\nDisallow: /j$k\n"
    )
    got = _rfc_verdicts(
        spark,
        blob,
        ["/a.b", "/aXb", "/c(d)e", "/f[g]", "/h+i?", "/j$k", "/jk"],
    )
    assert got["/a.b"] is False
    assert got["/aXb"] is True  # '.' is literal, not any-char
    assert got["/c(d)e"] is False
    assert got["/f[g]"] is False
    assert got["/h+i?"] is False
    assert got["/j$k"] is False  # mid-rule $ is literal
    assert got["/jk"] is True


def test_rfc9309_default_allow_without_match(spark):
    blob = "User-agent: *\nDisallow: /only*this\n"
    got = _rfc_verdicts(spark, blob, ["/other"])
    assert got["/other"] is True
