"""Filter / projection operators (SURVEY.md section 2.2).

The reference fuses filters into hand-written mappers (e.g.
deduper/Stage1Mapper.java:68-182 drops robots.txt/bad-mime rows
before the shuffle). Declaratively, every predicate here is pushed by
Catalyst through projects and joins into the parquet scan
(`PushedFilters` in .explain), and only referenced columns are read
(`ReadSchema`) -- the two optimizations the reference implemented by
hand in every mapper, for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def regex_scan(documents: DataFrame, pattern: str = "^src1[0-9]$") -> DataFrame:
    """Distributed regex scan -- the reference's domain-pattern query
    (queryserver/index/DatabaseIndexV2.java:961-1028 runs
    Pattern.matches over a full index scan) and RegExFilter pipeline
    step (pipelineV3/RegExFilter.java:1-76)."""
    return documents.filter(F.col("source").rlike(pattern)).orderBy("doc_id")


def text_grep(documents: DataFrame, needle: str = "data") -> DataFrame:
    """Distributed grep: rows whose text contains a literal --
    TextBytesQuery (domainmeta/TextBytesQuery.java:41-52)."""
    return documents.filter(F.col("text").contains(needle)).select(
        "doc_id", "lang", "source", "n_chars"
    ).orderBy("doc_id")


def category_filter(
    events: DataFrame, allowed: tuple[str, ...] = ("click", "purchase")
) -> DataFrame:
    """Accept/reject by a normalized category set -- MimeTypeFilter
    shape (util/MimeTypeFilter.java, used deduper/Stage1Mapper.java:142)."""
    return events.filter(F.col("event_type").isin(*allowed)).orderBy("event_id")


def conditional_classify(customer: DataFrame) -> DataFrame:
    """Rule-based row classifier -- ClassifyDomains
    (domainmeta/crawlstats/ClassifyDomains.java:52-59) as a
    `when/otherwise` expression chain (stays in codegen)."""
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.when(F.col("c_acctbal") < 0, "delinquent")
        .when(F.col("c_acctbal") > 7500, "premium")
        .otherwise("standard")
        .alias("tier"),
    ).orderBy("c_custkey")


def projection_rekey(events: DataFrame) -> DataFrame:
    """Key<->value inversion + synthesized key -- InverseMapper usage
    (iptohost/QuantcastIPListStep.java:73) and KeyTransformer re-key
    steps (crawllistgen/ShardSubDomainMetadataStep.java:68-80).
    Synthesizes a composite partition key the way CrawlDBKey packs
    (domainHash, urlHash) (CrawlDBKey.java:84-110)."""
    return events.select(
        F.concat_ws("#", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "composite_key"
        ),
        F.col("event_id"),
        F.col("value"),
    ).orderBy("event_id")


def blocklist_filter(
    documents: DataFrame, blocked_sources: DataFrame
) -> DataFrame:
    """Pattern blocklist for generated rows -- URLFilter
    (crawllistgen/URLFilter.java:19) with the list broadcast, an
    anti-join instead of a per-row in-memory trie."""
    return documents.join(
        F.broadcast(blocked_sources),
        documents.source == blocked_sources.blocked_source,
        "left_anti",
    ).orderBy("doc_id")


def range_predicate(lineitem: DataFrame) -> DataFrame:
    """Range + equality predicate combination pushed to the scan
    (TPC-H Q6 shape) -- the filter-before-shuffle discipline of
    Stage1Mapper.java:70-87 expressed declaratively."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("2024-01-01"))
            & (F.col("l_shipdate") < F.lit("2025-01-01"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # exact decimal product/sum: order-independent, see
            # functions/numeric.py
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(15,2)")
                    * F.col("l_discount").cast("decimal(4,2)")
                ),
                3,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("matched_lines"),
        )
    )


def url_template_summary(urls: DataFrame) -> DataFrame:
    """URL template mining -- collapse volatile path segments into
    placeholders and count pages per template (the DUST insight,
    Bar-Yossef et al. 2009 "Do Not Crawl in the DUST": sites serve
    the same content under families of URLs; the crawler wants the
    FAMILY, not a million members). Hex runs (>= 8 chars) fold to
    'H' first, then digit runs to 'N', so /article/123 and
    /p/0a1b2c3d4e both collapse.

    Input: (url) with scheme://host/path shape. Output per
    (host, template): n_urls, n_distinct_urls, example_url (min) --
    the frontier-dedup rule table a crawler derives before
    scheduling.

    Scale: two regexp_replace Column exprs + ONE groupBy; the
    template cardinality is tiny compared to the url table, so the
    aggregate collapses map-side.
    """
    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    path = F.regexp_extract("url", r"^[a-z]+://[^/]+(/.*)?$", 1)
    template = F.regexp_replace(
        F.regexp_replace(path, "[0-9a-f]{8,}", "H"), "[0-9]+", "N"
    )
    return (
        urls.select(
            host.alias("host"),
            template.alias("template"),
            F.col("url"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("url").alias("n_distinct_urls"),
            F.min("url").alias("example_url"),
        )
        .orderBy("host", "template")
    )


def cidr_longest_prefix_match(
    df: DataFrame,
    blocklist: DataFrame,
    ip_col: str = "ip",
) -> DataFrame:
    """Longest-prefix CIDR match of an integer IPv4 column against a
    small blocklist -- the IP-range policy check the reference runs
    with IPAddressUtils range tables (util/IPAddressUtils.java,
    consumed by the iptohost joins).

    Scale shape: the classic LPM decomposition into per-prefix-length
    hash EQUI-joins. The blocklist's distinct prefix lengths are
    collected (bounded by construction: <= 33 values for IPv4); for
    each length L the corpus side joins on
    ``ip >> (32-L) == base >> (32-L)`` with the blocklist broadcast.
    The corpus is never range-joined (no BroadcastNestedLoopJoin over
    the big side) and never shuffled; ties resolve to the LONGEST
    matching prefix, router-style.

    Input blocklist columns: cidr_base (long, prefix-aligned),
    prefix_len (int). Output: df's columns + cidr_base/prefix_len of
    the winning block (null when unmatched).

    The corpus side is never aggregated or shuffled: one broadcast
    left join per distinct length, longest first, folded with
    coalesce -- equal-length blocks are disjoint, so the first
    non-null is the unique longest match.

    Alignment is VALIDATED, not assumed: a cidr_base with host bits
    set (e.g. 10.0.0.1/24) would silently match the mask-truncated
    range, so misaligned rows raise ValueError up front (the
    blocklist is broadcast-small, so the check is a bounded
    aggregate). Duplicate (cidr_base, prefix_len) rows are deduped
    before joining -- a repeated block must not multiply corpus rows.
    """
    ip = F.col(ip_col)
    # The blocklist is broadcast-small by contract, so collect it ONCE
    # and derive the alignment check, the distinct prefix lengths and
    # the per-length join inputs driver-side: the old shape ran three
    # separate Spark jobs (alignment probe, distinct-lengths collect,
    # then a blocklist re-scan per broadcast build) before the corpus
    # ever moved (guide 1.2: per-task work after algorithm -- these
    # were pure fixed-overhead driver round-trips).
    spark = df.sparkSession
    rows = sorted(
        {
            (int(r[0]), int(r[1]))
            for r in blocklist.select("cidr_base", "prefix_len").collect()
        }
    )
    bad = [
        (base, ln) for base, ln in rows if base % (1 << (32 - ln)) != 0
    ][:5]
    if bad:
        raise ValueError(
            "cidr_longest_prefix_match: blocklist rows are not "
            f"prefix-aligned (host bits set): {bad}"
        )
    lens = sorted({ln for _, ln in rows}, reverse=True)
    if not lens:
        return df.select(
            "*",
            F.lit(None).cast("long").alias("cidr_base"),
            F.lit(None).cast("int").alias("prefix_len"),
        )
    out = df
    for ln in lens:
        bl = spark.createDataFrame(
            [
                (base >> (32 - ln), base, ln)
                for base, pl in rows
                if pl == ln
            ],
            f"_k{ln} long, _b{ln} long, _l{ln} int",
        )
        out = out.join(
            F.broadcast(bl),
            F.shiftright(ip, 32 - ln) == F.col(f"_k{ln}"),
            "left",
        ).drop(f"_k{ln}")
    result = out.select(
        *df.columns,
        F.coalesce(*[F.col(f"_b{ln}") for ln in lens])
        .cast("long")
        .alias("cidr_base"),
        F.coalesce(*[F.col(f"_l{ln}") for ln in lens])
        .cast("int")
        .alias("prefix_len"),
    )
    return result
