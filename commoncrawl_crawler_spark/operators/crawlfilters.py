"""Named crawler-filter transforms (the crawl-list filter family).

Reference: service/crawler/filters/Filter.java:11-57 defines the
ACCEPT / REJECT / MODIFIED contract over (root domain, fully-qualified
domain, url path, metadata); the concrete filters re-expressed here:

- PageRankBoostFilter.java:66-124: rules (root, domain_regex,
  path_regex, boost); EVERY matching rule -- global ('*'/'.*' root)
  and per-root -- ADDS its boost to the metadata's pagerank boost.
- CrawlRateOverrideFilter.java:76-140: rules (root, subdomain_regex,
  path_regex, rate) kept rate-ASCENDING per root; the FIRST matching
  rule sets the crawl-rate override, i.e. the minimum matching rate
  wins. '*' wildcards skip the regex check.
- ReCrawlTimeModifierFilter.java:64-135: like the boost filter but
  the modified recrawl time folds with MIN over matching rules.

All regexes use Java matches() semantics = FULL match; we anchor as
'^(?:p)$'. An empty domain regex matches any domain (the reference
leaves the Pattern null).

Spark-first shape: the rule file is tiny (the reference ships it to
every crawler via the filter-cache RPC) -> broadcast it. Global rules
cross-join (broadcast nested loop over a handful of rows); per-root
rules equi-join on root_domain. One groupBy(key) folds matches, one
left join attaches the result columns -- URL payload columns never
fan out through the rule join. Regex evaluation is JVM rlike with a
per-rule pattern column (compiled per row; acceptable because the
joined (url x matching-rule) set is rule-count-bounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (root_domain, domain_regex, path_regex, value) -- the 4-field CSV
#: lines every filter in the family loads (loadFilterItem)
RULE_SCHEMA = (
    "root_domain string, domain_regex string, path_regex string, value double"
)

_GLOBAL_ROOTS = ("*", ".*")


def rules_df(spark, rules: list[tuple]) -> DataFrame:
    return spark.createDataFrame(list(rules), RULE_SCHEMA)


def _full_match(value: Column, pattern: Column) -> Column:
    """Java Pattern.matches() = entire-string match."""
    return F.regexp_like(
        value, F.concat(F.lit("^(?:"), pattern, F.lit(")$"))
    )


def _matching_pairs(
    urls: DataFrame, rules: DataFrame, key: str, wildcard_path: bool
) -> DataFrame:
    """(key, value) for every (url, rule) pair that matches.

    wildcard_path: treat '*' in domain/path regex as 'no check'
    (CrawlRateOverrideFilter); the boost/recrawl filters compile '*'
    literally like the reference does.
    """
    u = urls.select(key, "root_domain", "domain", "path")
    glob = rules.filter(F.col("root_domain").isin(*_GLOBAL_ROOTS))
    spec = rules.filter(~F.col("root_domain").isin(*_GLOBAL_ROOTS))
    paired = u.crossJoin(F.broadcast(glob.drop("root_domain"))).unionByName(
        u.join(F.broadcast(spec), "root_domain").drop("root_domain"),
        allowMissingColumns=True,
    )
    # no-check sentinels must never reach the regex compiler ('*' is
    # not a valid pattern, and Spark does not short-circuit booleans):
    # gate with when() so the rlike only evaluates on real patterns
    domain_skip = (
        F.col("domain_regex").isin("", "*")
        if wildcard_path
        else F.col("domain_regex") == ""
    )
    domain_ok = F.when(domain_skip, F.lit(True)).otherwise(
        _full_match(F.col("domain"), F.col("domain_regex"))
    )
    path_ok = _full_match(F.col("path"), F.col("path_regex"))
    if wildcard_path:
        path_ok = F.when(F.col("path_regex") == "*", F.lit(True)).otherwise(
            _full_match(F.col("path"), F.col("path_regex"))
        )
    return paired.filter(domain_ok & path_ok).select(key, "value")


#: rule tables at or under this row count compile to Column
#: expressions (the reference's filter files are KB-sized; a table
#: bigger than this signals a generated rule set -> join path)
COMPILE_MAX_RULES = 512


def _compiled_match_values(
    rules: DataFrame, wildcard_path: bool
) -> Column | None:
    """array<double> of every matching rule's value, evaluated row-wise
    as ONE Column expression (no join, no shuffle over the URL table).

    Only safe for bounded rule tables: returns None when the table
    exceeds COMPILE_MAX_RULES and the caller must fall back to the
    broadcast-join path. Each regex lands in the plan as a LITERAL
    pattern, so the JVM compiles it once per task instead of once per
    (url x rule) row as the join path's pattern-column rlike does.
    """
    rows = rules.limit(COMPILE_MAX_RULES + 1).collect()
    if len(rows) > COMPILE_MAX_RULES:
        return None
    conds = []
    for r in rows:
        root, dre, pre, val = (
            r["root_domain"],
            r["domain_regex"],
            r["path_regex"],
            r["value"],
        )
        if val is None:
            # a null-value rule contributes nothing to sum/min in the
            # join path (aggregates skip nulls) -- skip it here too
            # rather than crashing on float(None)
            continue
        if dre is None or pre is None:
            # mirror the join path's null-propagation: rlike against a
            # NULL pattern column is NULL, so the rule never matches.
            # f-string interpolation would instead bake the literal
            # pattern '^(?:None)$' (matching the string 'None').
            continue
        cond = (
            F.lit(True)
            if root in _GLOBAL_ROOTS
            else F.col("root_domain") == F.lit(root)
        )
        domain_skip = dre == "" or (wildcard_path and dre == "*")
        if not domain_skip:
            cond = cond & F.col("domain").rlike(f"^(?:{dre})$")
        if not (wildcard_path and pre == "*"):
            cond = cond & F.col("path").rlike(f"^(?:{pre})$")
        conds.append(F.when(cond, F.lit(float(val))))
    if not conds:
        return F.lit(None).cast("array<double>")
    # when() without otherwise -> null for non-matches; strip them so
    # the fold sees exactly the matching values
    return F.filter(F.array(*conds), lambda x: x.isNotNull())


def _fold_matches(
    urls: DataFrame, vals: Column, out_col: str, fold: str
) -> DataFrame:
    matched = F.size(vals) > 0
    if fold == "sum":
        agg = F.round(
            F.aggregate(vals, F.lit(0.0), lambda a, x: a + x), 6
        )
    elif fold == "min_int":
        agg = F.array_min(vals).cast("int")
    else:
        agg = F.array_min(vals).cast("long")
    return urls.withColumn(out_col, F.when(matched, agg))


def pagerank_boost_filter(
    urls: DataFrame, rules: DataFrame, key: str = "key"
) -> DataFrame:
    """+ pagerank_boost: SUM of every matching rule's boost (the
    reference += per rule); null when no rule matched (Filter_NoAction
    leaves the metadata untouched)."""
    vals = _compiled_match_values(rules, wildcard_path=False)
    if vals is not None:
        return _fold_matches(urls, vals, "pagerank_boost", "sum")
    boosts = (
        _matching_pairs(urls, rules, key, wildcard_path=False)
        .groupBy(key)
        .agg(F.round(F.sum("value"), 6).alias("pagerank_boost"))
    )
    return urls.join(boosts, key, "left")


def crawl_rate_override_filter(
    urls: DataFrame, rules: DataFrame, key: str = "key"
) -> DataFrame:
    """+ crawl_rate_override: the minimum matching rate (the reference
    walks rules rate-ascending and stops at the first match)."""
    vals = _compiled_match_values(rules, wildcard_path=True)
    if vals is not None:
        return _fold_matches(urls, vals, "crawl_rate_override", "min_int")
    rates = (
        _matching_pairs(urls, rules, key, wildcard_path=True)
        .groupBy(key)
        .agg(F.min("value").cast("int").alias("crawl_rate_override"))
    )
    return urls.join(rates, key, "left")


def recrawl_time_modifier_filter(
    urls: DataFrame, rules: DataFrame, key: str = "key"
) -> DataFrame:
    """+ modified_recrawl_time: MIN over matching rules (the reference
    folds Math.min across global and per-root matches)."""
    vals = _compiled_match_values(rules, wildcard_path=False)
    if vals is not None:
        return _fold_matches(urls, vals, "modified_recrawl_time", "min_long")
    times = (
        _matching_pairs(urls, rules, key, wildcard_path=False)
        .groupBy(key)
        .agg(F.min("value").cast("long").alias("modified_recrawl_time"))
    )
    return urls.join(times, key, "left")


def apply_crawl_filters(
    urls: DataFrame,
    boost_rules: DataFrame | None = None,
    rate_rules: DataFrame | None = None,
    recrawl_rules: DataFrame | None = None,
    key: str = "key",
) -> DataFrame:
    """Run the filter chain the way the crawl-list builder does
    (each filter annotates metadata; none of these three REJECTs)."""
    out = urls
    if boost_rules is not None:
        out = pagerank_boost_filter(out, boost_rules, key)
    if rate_rules is not None:
        out = crawl_rate_override_filter(out, rate_rules, key)
    if recrawl_rules is not None:
        out = recrawl_time_modifier_filter(out, recrawl_rules, key)
    return out
