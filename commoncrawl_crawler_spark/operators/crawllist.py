"""Crawl-list generation: per-host caps, bundles, segment packing.

Reference (SURVEY.md section 2.5):
- CrawlListKey secondary sort (mapred/pipelineV3/crawllistgen/
  CrawlListKey.java:51-66): per-domain ordering (type asc, rank desc)
  via composite-key shuffle. Here: a Window spec.
- BundleGenerator (NewGenBundlesStep.java:179,358-465): streams
  sorted per-domain URLs, caps URLs per host
  (SEGMENT_URLS_PER_HOST=200, mapred/segmenter/Segmenter.java:49),
  assigns round-robin crawler/bucket ids. Here: row_number <= cap +
  pmod bucket.
- SegmenterReducer (mapred/segmenter/SegmenterReducer.java:54): packs
  bundles into segments of 10k-500k URLs (Segmenter.java:47-48).
  Here: per-bucket row_number -> floor((rn-1)/size). Packing runs
  *within* each crawler bucket, never over a global ordering -- a
  global row_number would serialize the whole dataset through one
  window partition; per-bucket windows keep all 1000 executors busy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

URLS_PER_HOST = 200  # Segmenter.java:49
SEGMENT_MIN = 10_000  # Segmenter.java:47
SEGMENT_MAX = 500_000  # Segmenter.java:48


def per_host_cap(
    df: DataFrame,
    host_col: str,
    order_by: list[Column],
    cap: int = URLS_PER_HOST,
    rank_col: str = "host_rank",
) -> DataFrame:
    """Keep the top-`cap` rows per host under the crawl-list ordering.

    NewGenBundlesStep politeness cap: no host contributes more than
    `cap` URLs to a segment. One shuffle on host.
    """
    w = Window.partitionBy(host_col).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= cap
    )


def assign_buckets(df: DataFrame, host_col: str, n_buckets: int) -> DataFrame:
    """Stable crawler/bucket affinity: same host -> same crawler.

    The reference assigns bundles round-robin to crawler ids
    (NewGenBundlesStep.java:576-640). Numeric keys mod directly
    (oracle-replicable); string hostnames hash through md5 first --
    a bare cast-to-bigint mod would throw CAST_INVALID_INPUT under
    ANSI mode (Spark 4 default) on any real hostname. The md5-bucket
    form is the same engine-independent construction the stratified
    sampler uses, so DuckDB oracles can replay it.
    """
    if dict(df.dtypes).get(host_col) == "string":
        key = F.conv(F.substring(F.md5(F.col(host_col)), 1, 8), 16, 10).cast(
            "bigint"
        )
    else:
        key = F.col(host_col)
    return df.withColumn("bucket", F.pmod(key, F.lit(n_buckets)))


def pack_segments(
    df: DataFrame,
    order_by: list[Column],
    segment_size: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Pack each bucket's ordered rows into fixed-size segments."""
    w = Window.partitionBy(bucket_col).orderBy(*order_by)
    rn = F.row_number().over(w)
    return df.withColumn(
        "segment_id", F.floor((rn - 1) / F.lit(segment_size)).cast("int")
    )


def generate_crawl_list(
    orders: DataFrame,
    cap: int = 5,
    n_buckets: int = 8,
    segment_size: int = 250,
) -> DataFrame:
    """Full crawl-list pipeline over the orders table.

    host=o_custkey, rank=(priority asc, totalprice desc) -- the
    CrawlListKey discipline (domain, type asc, rank0 desc). Output is
    one row per kept URL with its host rank, crawler bucket, and
    segment id. Caps shrunk to fit the synthetic tables (~15
    orders/customer); the production constants are module consts.
    """
    capped = per_host_cap(
        orders,
        "o_custkey",
        [
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        ],
        cap=cap,
    )
    bucketed = assign_buckets(capped, "o_custkey", n_buckets)
    packed = pack_segments(
        bucketed,
        [
            F.col("o_custkey").asc(),
            F.col("host_rank").asc(),
            F.col("o_orderkey").asc(),
        ],
        segment_size,
    )
    return packed.select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 3).alias("o_totalprice"),
        "host_rank",
        "bucket",
        "segment_id",
    ).orderBy("o_custkey", "host_rank")


#: md5-derived 60-bit key: the cross-engine URL-hash partitioner
#: (fingerprint-shard analog of CrawlDBKey's domain-hash sharding)
_MD5_KEY = "CAST(conv(substring(md5(url),1,15),16,10) AS BIGINT)"


def partition_wikipedia_urls(
    pages: DataFrame, rank_metadata: DataFrame, n_partitions: int = 8
) -> DataFrame:
    """Wikipedia/DBPedia URL list -> sharded, rank-joined crawl input.

    PartitionWikipediaUrlsStep.java:199,268: parse the external URL
    set, canonicalize, key by URL fingerprint, shard, and reduce-side
    join per-root-domain rank metadata before crawl-list emission
    (JoinRootDomainMetadataEmitLinkKeyReducer). Here the shard id is
    an md5-derived hash mod n (deterministic in any engine), the rank
    join is a plain equi-join Catalyst can broadcast, and rows order
    rank-desc within shard (CrawlListKey discipline).

    pages: (url string); rank_metadata: (url string, rank double).
    """
    keyed = pages.select(
        "url", F.expr(f"pmod({_MD5_KEY}, {n_partitions})").alias("shard")
    ).distinct()
    return (
        keyed.join(rank_metadata, "url", "left")
        .select(
            "shard",
            "url",
            F.coalesce(F.col("rank"), F.lit(0.0)).alias("rank"),
        )
        .orderBy("shard", F.col("rank").desc(), "url")
    )


def politeness_schedule(
    urls: DataFrame,
    host_col: str = "domain",
    priority_col: str = "pagerank_boost",
    rate_col: str = "crawl_rate_override",
    key_col: str = "key",
    default_interval_ms: int = 500,
) -> DataFrame:
    """Per-host serialized fetch plan -- the crawler's politeness
    model (one connection per host, rate-limited) as a window:
    slot = fetch order within the host (priority desc, nulls last,
    key tiebreak) and scheduled_offset_ms = (slot-1) * interval,
    where interval is the URL's crawl-rate override when a filter set
    one (crawlfilters.crawl_rate_override_filter) else the default.

    Reference semantics: the crawler fetches one URL per host at a
    time and CrawlRateOverrideFilter modulates the per-host delay
    (service/crawler/filters/CrawlRateOverrideFilter.java:76-140);
    the schedule column is what its fetch queue computes implicitly.
    One shuffle on host; exact integer arithmetic, so the plan is
    reproducible on any partitioning.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.desc_nulls_last(priority_col), F.asc(key_col)
    )
    interval = F.coalesce(
        F.col(rate_col).cast("long"), F.lit(default_interval_ms).cast("long")
    )
    return (
        urls.withColumn("slot", F.row_number().over(w))
        .select(
            key_col,
            host_col,
            "slot",
            interval.alias("interval_ms"),
            ((F.col("slot") - 1) * interval).cast("long").alias(
                "scheduled_offset_ms"
            ),
        )
        .orderBy(key_col)
    )


def adaptive_recrawl_schedule(
    events: DataFrame,
    min_interval_days: int = 1,
    max_interval_days: int = 60,
    default_interval_days: int = 7,
    signature: Column | None = None,
) -> DataFrame:
    """History-driven recrawl intervals via the Cho & Garcia-Molina
    change-rate estimator (ACM TOIT 3(3) 2003, "Estimating frequency
    of change").

    The reference adjusts recrawl times only by static rule tables
    (ReCrawlTimeModifierFilter.java:64-135); the adaptive upgrade
    every production crawler runs is: estimate each URL's Poisson
    change rate from its own fetch history and recrawl at ~1/lambda.
    Model mapping (the crawldb convention, crawldb.py:45): user_id is
    the URL fingerprint, click/purchase events are fetch attempts,
    and a fetch "observed a change" when its content signature
    (`signature`, default the raw `value` column; gates pass a
    quantized digest so the history contains both changed and
    unchanged revisits) differs from the previous fetch's.

    Estimator: with n comparison intervals, X of them changed, and
    total observed span T, the bias-corrected MLE is
        lambda-hat = -ln((n - X + 0.5) / (n + 0.5)) / (T / n)
    and the recrawl interval is 1/lambda-hat, clamped to
    [min_interval_days, max_interval_days]. Engine parity: the ln
    argument is a ratio of exact integers ((2(n-X)+1)/(2n+1)), the
    whole interval is ONE double expression rounded once to integer
    micro-days via floor(x*1e6+0.5) (the repo-wide float-parity
    discipline -- bm25/tfidf/pmi notes), and the day span uses
    timestampdiff micros (NTZ-safe). Fixed verdicts skip the float
    path entirely: n = 0 -> default, X = 0 -> max (never observed
    changing; ln(1) = 0 would divide by zero).

    One shuffle on the key (the lag window and the groupBy share it).
    At 100 TB the history table is billions of rows but this is a
    linear window + aggregate -- the same shape as sessionize.
    """
    sig = signature if signature is not None else F.col("value")
    fetches = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select("user_id", "event_id", "ts", sig.alias("_sig"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cmp = (
        fetches.withColumn("_prev_v", F.lag("_sig").over(w))
        .withColumn("_prev_ts", F.lag("ts").over(w))
        .withColumn(
            "_changed",
            F.when(
                F.col("_prev_ts").isNull(), F.lit(None).cast("int")
            ).otherwise(
                (~F.col("_sig").eqNullSafe(F.col("_prev_v"))).cast("int")
            ),
        )
    )
    per_key = cmp.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("fetches"),
        F.count("_changed").alias("n_intervals"),
        F.coalesce(F.sum("_changed"), F.lit(0)).alias("changes"),
        F.min("ts").alias("_first_ts"),
        F.max("ts").alias("_last_ts"),
    )
    span_us = F.expr("timestampdiff(MICROSECOND, _first_ts, _last_ts)")
    n, x = F.col("n_intervals"), F.col("changes")
    # interval_days = (T_days / n) / -ln((2(n-X)+1)/(2n+1)), rounded
    # ONCE; T_days/n and the ratio are double ops over exact bigints
    raw_micro = F.floor(
        (
            (span_us.cast("double") / F.lit(86400.0 * 1e6) / n.cast("double"))
            / -F.log(
                (2 * (n - x) + 1).cast("double") / (2 * n + 1).cast("double")
            )
        )
        * 1e6
        + F.lit(0.5)
    ).cast("long")
    lo = F.lit(min_interval_days * 1_000_000).cast("long")
    hi = F.lit(max_interval_days * 1_000_000).cast("long")
    interval = (
        F.when(n == 0, F.lit(default_interval_days * 1_000_000).cast("long"))
        .when(x == 0, hi)
        .otherwise(F.greatest(lo, F.least(hi, raw_micro)))
    )
    return (
        per_key.withColumn("interval_days_micro", interval)
        .select(
            "user_id",
            "fetches",
            "n_intervals",
            "changes",
            "interval_days_micro",
            # next fetch due: last observed fetch + the interval.
            # interval_days_micro is days*1e6, so *86400 is EXACTLY
            # the microsecond count (bigint, max ~5.2e12)
            F.expr(
                "timestampadd(MICROSECOND, "
                "interval_days_micro * CAST(86400 AS BIGINT), _last_ts)"
            ).alias("next_due_ts"),
        )
        .orderBy("user_id")
    )


def crawl_budget_summary(
    urls: DataFrame,
    window_ms: int = 3000,
    host_col: str = "domain",
    priority_col: str = "pagerank_boost",
    rate_col: str = "crawl_rate_override",
    key_col: str = "key",
    default_interval_ms: int = 500,
) -> DataFrame:
    """Per-host crawl budget for a fetch window: how many of the
    host's scheduled URLs actually fit in `window_ms` under the
    politeness serialization, and how many defer to the next cycle.

    This is the capacity-planning query every crawl operator runs
    before kicking off a segment (the reference sizes segments
    statically, Segmenter.java:47-49; this computes the budget from
    the actual per-host rate modifiers instead). Composes
    politeness_schedule verbatim -- a URL is planned iff its
    serialized offset lands inside the window -- so the budget always
    agrees with the fetch plan the crawler will execute. One shuffle
    on host (shared with the schedule's window), then a partial-agg
    count; the composed plan's inner key sort is eliminated by
    Catalyst under the aggregate.
    """
    sched = politeness_schedule(
        urls,
        host_col=host_col,
        priority_col=priority_col,
        rate_col=rate_col,
        key_col=key_col,
        default_interval_ms=default_interval_ms,
    )
    fits = F.col("scheduled_offset_ms") < window_ms
    return (
        sched.groupBy(host_col)
        .agg(
            F.count(F.when(fits, 1)).alias("planned"),
            F.count(F.when(~fits, 1)).alias("deferred"),
        )
        .withColumn("window_ms", F.lit(window_ms).cast("long"))
        .orderBy(host_col)
    )


def blog_probe_dates(
    start_year: int, start_month: int, max_months_to_probe: int = 24
) -> list[tuple[int, int]]:
    """The reference's getProbeDates walk
    (GenBlogPlatformUrlsStep.java:118-137): (year, month) pairs
    DESCENDING from the start month, at most `max_months_to_probe`,
    never before year 2000. The start is an explicit parameter here
    (the reference reads the wall clock, getStartYearMonth) so plans
    are deterministic and testable."""
    dates: list[tuple[int, int]] = []
    for year in range(start_year, 1999, -1):
        max_month = start_month if year == start_year else 12
        for month in range(max_month, 0, -1):
            dates.append((year, month))
            if len(dates) == max_months_to_probe:
                return dates
    return dates


def blog_platform_urls(
    post_freq: DataFrame,
    start_year: int,
    start_month: int,
    max_months_to_probe: int = 24,
) -> DataFrame:
    """Blog-platform probe-URL synthesis -- the named per-platform
    rules of GenBlogPlatformUrlsStep.java:169-280,283-334, ported
    rule-for-rule:

    - platform resolution (map:283-313): explicit flags win
      (wordpress > blogger > typepad > tumblr, the if/else order);
      otherwise the url's ROOT domain is matched against
      wordpress.com / tumblr.com / blogspot.com / typepad.com;
      anything else is 'other'.
    - wordpress (emitWordPressDomain:245-280): home page, then for
      blogs with posts in >= 2011, per probe month pages
      1..paginations-1 where paginations = ceil(avgPostsPerMonth/10):
      page 1 -> '<url>YYYY/MM/', page p>=2 -> '<url>YYYY/MM/page/
      <p+1>/' (the page/2 skip is the reference's arithmetic,
      reproduced as-is). skip_if_dupe is false only for the FIRST
      probe month (probeItemIndex != 0 -- per month, not per page).
    - blogger (emitBlogspotDomain:169-187): home, then
      '<url>YYYY_MM_01_archive.html' per probe month.
    - typepad (emitTypepadDomain:218-243): the blog path gains a
      trailing '/' if missing; home, then '<url>YYYY/MM/index.html'
      per probe month.
    - tumblr (emitTumblrDomain:205-216): home plus
      'http://<host>/archive', both unconditionally; invalid URLs
      (no host) emit nothing.
    - other (emitOtherBlogPlatformDomain:200-203): home only.

    Input columns: url (the blog path, the post-frequency record's
    'url' field), last_year_with_posts int, avg_posts_per_month
    double (the record's raw 'avg' -- the reference ceil()s it on
    parse, reproduced here), and optional booleans is_wordpress /
    is_blogger / is_typepad / is_tumblr (JSON key presence in the
    reference).

    Output: (url, platform, probe_url, skip_if_dupe) -- one row per
    emitItem call. 100 TB shape: pure Column expressions, the probe
    calendar is a 24-element array LITERAL expanded per row with
    transform/flatten (no join, no UDF, no shuffle before the
    caller's own keying); downstream partition-keying rides the
    same per_host_cap / assign_buckets machinery as every other
    crawl-list source.
    """
    dates = blog_probe_dates(start_year, start_month, max_months_to_probe)

    host = F.regexp_extract(
        F.lower(F.col("url")), r"^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1
    )

    # the reference's URLUtils.extractRootDomainName (2012-era TLD
    # table) yields 'wordpress.com' for b.wordpress.com; the modern
    # PSL lists the hosting platforms as PUBLIC suffixes, so a
    # PSL-backed eTLD+1 would return the full blog host. Suffix
    # equality reproduces the reference's named comparison
    # (GenBlogPlatformUrlsStep.java:300-313) under either table.
    def _on(domain: str) -> Column:
        return (host == domain) | host.endswith("." + domain)

    flag = lambda c: (
        F.coalesce(F.col(c), F.lit(False))
        if c in post_freq.columns
        else F.lit(False)
    )
    platform = (
        F.when(flag("is_wordpress"), F.lit("wordpress"))
        .when(flag("is_blogger"), F.lit("blogger"))
        .when(flag("is_typepad"), F.lit("typepad"))
        .when(flag("is_tumblr"), F.lit("tumblr"))
        .when(_on("wordpress.com"), F.lit("wordpress"))
        .when(_on("tumblr.com"), F.lit("tumblr"))
        .when(_on("blogspot.com"), F.lit("blogger"))
        .when(_on("typepad.com"), F.lit("typepad"))
        .otherwise(F.lit("other"))
    )

    url = F.col("url")
    slashed = F.when(url.endswith("/"), url).otherwise(
        F.concat(url, F.lit("/"))
    )
    active = F.col("last_year_with_posts") >= 2011
    home = lambda u: F.array(
        F.struct(u.alias("probe_url"), F.lit(False).alias("skip_if_dupe"))
    )
    empty = F.array().cast(
        "array<struct<probe_url:string,skip_if_dupe:boolean>>"
    )

    # ONE 24-element (y, m, probe-index) literal shared by the three
    # calendar platforms; the per-date logic lives once inside a
    # transform lambda (an unrolled 24-way expression tree made
    # janino compile ~8s of codegen per session on first touch)
    dates_arr = F.array(*[
        F.struct(
            F.lit(y).alias("y"), F.lit(m).alias("m"), F.lit(i).alias("i")
        )
        for i, (y, m) in enumerate(dates)
    ])
    skip = lambda d: (d["i"] != 0).alias("skip_if_dupe")

    def _calendar(fmt: str, base) -> Column:
        return F.when(
            active,
            F.transform(
                dates_arr,
                lambda d: F.struct(
                    F.concat(
                        base, F.format_string(fmt, d["y"], d["m"])
                    ).alias("probe_url"),
                    skip(d),
                ),
            ),
        ).otherwise(empty)

    # paginations = ceil(ceil(avg)/10) in exact integer arithmetic
    # (PostFrequencyInfo parse ceil + emitWordPressDomain:257 ceil)
    pag = F.expr(
        "(CAST(ceil(avg_posts_per_month) AS BIGINT) + 9) DIV 10"
    )
    wp_month = lambda d: F.transform(
        F.sequence(F.lit(1).cast("long"), pag - 1),
        lambda p: F.struct(
            F.when(
                p == 1,
                F.concat(url, F.format_string("%04d/%02d/", d["y"], d["m"])),
            )
            .otherwise(
                F.concat(
                    url,
                    F.format_string("%04d/%02d/page/", d["y"], d["m"]),
                    (p + 1).cast("string"),
                    F.lit("/"),
                )
            )
            .alias("probe_url"),
            skip(d),
        ),
    )
    wp_probes = F.when(
        active & (pag >= 2), F.flatten(F.transform(dates_arr, wp_month))
    ).otherwise(empty)

    blogger_probes = _calendar("%04d_%02d_01_archive.html", url)
    typepad_probes = _calendar("%04d/%02d/index.html", slashed)

    tumblr_probes = F.when(
        host != "",
        F.concat(
            home(url),
            home(F.concat(F.lit("http://"), host, F.lit("/archive"))),
        ),
    ).otherwise(empty)

    probes = (
        F.when(platform == "wordpress", F.concat(home(url), wp_probes))
        .when(platform == "blogger", F.concat(home(url), blogger_probes))
        .when(platform == "typepad",
              F.concat(home(slashed), typepad_probes))
        .when(platform == "tumblr", tumblr_probes)
        .otherwise(home(url))
    )
    return (
        post_freq.select(
            "url", platform.alias("platform"), F.explode(probes).alias("_p")
        )
        .select(
            "url",
            "platform",
            F.col("_p")["probe_url"].alias("probe_url"),
            F.col("_p")["skip_if_dupe"].alias("skip_if_dupe"),
        )
    )
