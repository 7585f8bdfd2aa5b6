"""CrawlDB merge: N typed sources folded into one record per key.

Reference (SURVEY.md section 3.3): CrawlDBMergingReducer
(mapred/ec2/postprocess/crawldb/CrawlDBMergingReducer.java:62,215,
501-606) merges crawl-status + HTML/RSS/ATOM link + source-sample
records per URL. The MapReduce implementation relies on a composite
byte-comparable key (CrawlDBKey.java:84-110) whose record-type
component orders the reduce stream MERGED(10) < CRAWL_STATUS(11) <
HTML_LINK(12) < ATOM(13) < RSS(14) < SOURCE_SAMPLE(15), so the
reducer can fold statefully.

Spark-first re-expression: the type-ordered streaming fold becomes a
single `groupBy(key)` with *conditional aggregates* -- no secondary
sort, no stateful reducer, one shuffle. The semantics preserved:

- last-attempt-wins status fields (max_by over attempt time, the
  reference's latest-attempt selection, Stage1Mapper.java:118-128)
- attempt/link counters per type
- earliest/latest link dates (link_status.earliest_date/latest_date,
  CrawlDBCommon.java:9-76 JSON schema)
- capped, sorted source-sample lists (<= 100,
  CrawlDBMergingReducer.java:94)

Incremental merge (new segments + previous mergeDB output,
CrawlDBMergingReducer.java:56-58) = union the previous merged table
as one more typed source and re-aggregate; at cluster scale this is
the same plan over bucketed inputs, so the shuffle is key-aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpointing import ckpt_lazy

# record-type ordinals (CrawlDBKey.java:102-110)
TYPE_MERGED = 10
TYPE_CRAWL_STATUS = 11
TYPE_HTML_LINK = 12
TYPE_ATOM_LINK = 13
TYPE_RSS_LINK = 14
TYPE_SOURCE_SAMPLE = 15

SAMPLE_CAP = 100  # CrawlDBMergingReducer.java:94


def typed_records_from_events(events: DataFrame) -> DataFrame:
    """Model the five typed source streams over the events table.

    key=user_id stands in for the URL fingerprint; event types map to
    record types (click/purchase -> crawl-status attempts, view ->
    HTML link, signup -> RSS link, error -> source sample).
    """
    e = events.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("record_id"),
        F.col("ts"),
        F.col("value"),
        F.when(F.col("event_type").isin("click", "purchase"), TYPE_CRAWL_STATUS)
        .when(F.col("event_type") == "view", TYPE_HTML_LINK)
        .when(F.col("event_type") == "signup", TYPE_RSS_LINK)
        .otherwise(TYPE_SOURCE_SAMPLE)
        .alias("record_type"),
    )
    return e


def merge_crawldb(typed: DataFrame, sort: bool = True) -> DataFrame:
    """One merged row per key from the typed record union.

    The reference walks records in type order; here each per-type
    fold is a conditional aggregate over the same shuffle:
    - status summary: attempt_count, last_attempt_* (max_by on
      (ts, record_id) -- deterministic tiebreak)
    - link summary: counts per link type, earliest/latest link date
    - samples: sorted record_id list capped at SAMPLE_CAP

    `sort=False` skips the result-ordering orderBy for consumers that
    immediately re-shuffle by key (fold_merged's full-outer join) --
    the r9 chunk_documents(sort=False) discipline; the per-key rows
    are identical either way (r10-opt, guide 2.4).
    """
    is_status = F.col("record_type") == TYPE_CRAWL_STATUS
    is_link = F.col("record_type").isin(TYPE_HTML_LINK, TYPE_ATOM_LINK, TYPE_RSS_LINK)
    is_sample = F.col("record_type") == TYPE_SOURCE_SAMPLE

    status_key = F.when(is_status, F.struct(F.col("ts"), F.col("record_id")))
    out = (
        typed.groupBy("key")
        .agg(
            F.sum(is_status.cast("int")).alias("attempt_count"),
            F.max_by(F.when(is_status, F.col("record_id")), status_key).alias(
                "last_attempt_id"
            ),
            F.max(F.when(is_status, F.col("ts"))).alias("last_attempt_ts"),
            F.round(
                F.max_by(F.when(is_status, F.col("value")), status_key), 6
            ).alias("last_attempt_value"),
            F.sum((F.col("record_type") == TYPE_HTML_LINK).cast("int")).alias(
                "html_link_count"
            ),
            F.sum((F.col("record_type") == TYPE_RSS_LINK).cast("int")).alias(
                "rss_link_count"
            ),
            F.min(F.when(is_link, F.col("ts"))).alias("earliest_link_date"),
            F.max(F.when(is_link, F.col("ts"))).alias("latest_link_date"),
            F.concat_ws(
                ",",
                F.slice(
                    F.sort_array(
                        F.collect_list(F.when(is_sample, F.col("record_id")))
                    ),
                    1,
                    SAMPLE_CAP,
                ),
            ).alias("source_samples"),
        )
    )
    return out.orderBy("key") if sort else out


def merge_crawldb_from_events(events: DataFrame, sort: bool = True) -> DataFrame:
    return merge_crawldb(typed_records_from_events(events), sort=sort)


def incremental_merge(previous_merged: DataFrame, new_typed: DataFrame) -> DataFrame:
    """Delta-merge new typed records against a previous merged table.

    CrawlDBMergingReducer.java:56-58: the merge job consumes previous
    runs of itself plus new segment emissions. Counters re-add, the
    last-attempt winner is re-chosen by timestamp, dates min/max, and
    sample lists merge + re-cap. Expressed as: re-expand the previous
    merged row into per-type pseudo-records cheaper than storage --
    here we fold directly with a full-outer join + column merges
    (one shuffle on the merge key, broadcast-free, AQE-friendly).
    The delta-side merge skips its result-ordering sort -- the fold's
    join re-clusters by key anyway (r10-opt; rows identical).
    """
    return fold_merged(previous_merged, merge_crawldb(new_typed, sort=False))


def incremental_merge_bucketed(
    spark, previous_table: str, delta_table: str
) -> DataFrame:
    """Shuffle-free nightly merge: both inputs are tables bucketed on
    `key` with the same bucket count (sources/bucketed.py), so the
    full-outer fold joins with NO Exchange on either side -- the
    100 TB posture SCALE.md describes, where the multi-TB mergeDB
    never reshuffles. Plan-asserted in tests."""
    return fold_merged(spark.table(previous_table), spark.table(delta_table))


def fold_merged(previous_merged: DataFrame, new_merged: DataFrame) -> DataFrame:
    """Fold two merged-shape CrawlDB tables into one (the column
    merges of CrawlDBMergingReducer re-applied at the merged level)."""
    p = previous_merged.select(
        "key",
        F.col("attempt_count").alias("p_attempt_count"),
        F.col("last_attempt_id").alias("p_last_attempt_id"),
        F.col("last_attempt_ts").alias("p_last_attempt_ts"),
        F.col("last_attempt_value").alias("p_last_attempt_value"),
        F.col("html_link_count").alias("p_html_link_count"),
        F.col("rss_link_count").alias("p_rss_link_count"),
        F.col("earliest_link_date").alias("p_earliest_link_date"),
        F.col("latest_link_date").alias("p_latest_link_date"),
        F.col("source_samples").alias("p_source_samples"),
    )
    n = new_merged
    new_wins = (F.col("last_attempt_ts") > F.col("p_last_attempt_ts")) | (
        (F.col("last_attempt_ts") == F.col("p_last_attempt_ts"))
        & (F.col("last_attempt_id") >= F.col("p_last_attempt_id"))
    )

    def _merged_samples():
        both = F.concat(
            F.when(
                F.col("p_source_samples") != "",
                F.split(F.col("p_source_samples"), ","),
            ).otherwise(F.array()),
            F.when(
                F.col("source_samples") != "", F.split(F.col("source_samples"), ",")
            ).otherwise(F.array()),
        )
        longs = F.transform(both, lambda x: x.cast("long"))
        return F.concat_ws(
            ",", F.slice(F.sort_array(F.array_distinct(longs)), 1, SAMPLE_CAP)
        )

    return (
        p.join(n, "key", "full_outer")
        .select(
            "key",
            (
                F.coalesce(F.col("p_attempt_count"), F.lit(0))
                + F.coalesce(F.col("attempt_count"), F.lit(0))
            ).alias("attempt_count"),
            F.when(
                F.col("last_attempt_ts").isNull(), F.col("p_last_attempt_id")
            )
            .when(F.col("p_last_attempt_ts").isNull(), F.col("last_attempt_id"))
            .when(new_wins, F.col("last_attempt_id"))
            .otherwise(F.col("p_last_attempt_id"))
            .alias("last_attempt_id"),
            F.greatest(F.col("last_attempt_ts"), F.col("p_last_attempt_ts")).alias(
                "last_attempt_ts"
            ),
            F.when(
                F.col("last_attempt_ts").isNull(), F.col("p_last_attempt_value")
            )
            .when(F.col("p_last_attempt_ts").isNull(), F.col("last_attempt_value"))
            .when(new_wins, F.col("last_attempt_value"))
            .otherwise(F.col("p_last_attempt_value"))
            .alias("last_attempt_value"),
            (
                F.coalesce(F.col("p_html_link_count"), F.lit(0))
                + F.coalesce(F.col("html_link_count"), F.lit(0))
            ).alias("html_link_count"),
            (
                F.coalesce(F.col("p_rss_link_count"), F.lit(0))
                + F.coalesce(F.col("rss_link_count"), F.lit(0))
            ).alias("rss_link_count"),
            F.least(
                F.col("earliest_link_date"), F.col("p_earliest_link_date")
            ).alias("earliest_link_date"),
            F.greatest(
                F.col("latest_link_date"), F.col("p_latest_link_date")
            ).alias("latest_link_date"),
            _merged_samples().alias("source_samples"),
        )
        # result-ordering sort only: the range partitioner's sampling
        # job otherwise re-runs the full-outer fold (r10-opt, the
        # _share_sort discipline; identity under SPARK_GRAFT_NO_CKPT
        # so the bucketed-merge plan assertions still see the join)
        .transform(ckpt_lazy)
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# full-fidelity merged record (CrawlDBCommon JSON schema)
# ---------------------------------------------------------------------------
#
# The simplified merge above keeps the merge *discipline*; this tier
# reproduces the reference's merged-record *shape*: a nested
# per-attempt crawl_stats[] array plus the summary / link_status
# sub-records of CrawlDBCommon.java:9-76, built with the exact update
# rules of CrawlDBMergingReducer.java:791-1010 (detail-record
# construction per disposition/status class) and :906-946
# (latest-attempt-wins summary evolution). Records arrive at the
# reference reducer in attempt_time order (CrawlDBKey sorts on the
# timestamp component), so "latest attempt when processed" folds to
# max_by(attempt_time) aggregates here -- one shuffle, no stateful
# reducer. Set-valued outputs (typeAndRels, ext_urls) are canonicalized
# sorted: the reference iterates a HashSet, whose order is undefined,
# so sorted order is the deterministic representative of the same set.

MAX_TYPE_SAMPLES = 5  # CrawlDBMergingReducer.java:88
MAX_EXT_URLS = 100  # CrawlDBMergingReducer.java:94


def full_status_records_from_events(events: DataFrame) -> DataFrame:
    """Synthesize crawl-status JSON records (the reducer's
    KEY_TYPE_CRAWL_STATUS input) deterministically from events.

    Dispositions/status classes are spread by event_id residues:
    %11 -> fetch failure, else %7 -> 3xx redirect, else %5 -> 404,
    else 200 (html or feed by %3). All derived fields are pure column
    arithmetic so a SQL oracle can replay them exactly.
    """
    # The projection is generated as SQL text parsed JVM-side in two
    # selectExpr calls instead of ~2k py4j Column round trips (r9-opt
    # wave 7, guide 1.2 fixed per-query work; the wave-6 PassJoin
    # precedent). Expressions mirror the original Column tree exactly.
    base = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).selectExpr(
        "user_id",
        "event_id",
        "event_id % 11 = 0 AS _fail",
        "CASE WHEN event_id % 11 = 0 THEN CAST(NULL AS INT)"
        " WHEN event_id % 7 = 0 THEN 301"
        " WHEN event_id % 5 = 0 THEN 404 ELSE 200 END AS _http",
    ).selectExpr(
        "user_id",
        "event_id",
        "_fail",
        "_http",
        "(NOT _fail) AND _http >= 200 AND _http <= 299 AS _2xx",
        "(NOT _fail) AND _http >= 300 AND _http <= 399 AS _3xx",
    ).selectExpr(
        "*",
        # computed ONCE here (r10, per ADVICE.md): this CASE used to
        # be duplicated verbatim inside five downstream column strings
        # (mime_type, parsed_as, intra/inter link counts, ext_hrefs),
        # where an edit to one copy would silently desynchronize the
        # others; same expression, same results
        "CASE WHEN _2xx THEN CASE WHEN event_id % 3 = 0 THEN 'feed'"
        " ELSE 'html' END END AS _parsed",
    )
    return base.selectExpr(
        "user_id AS key",
        "1700000000000 + event_id AS attempt_time",
        "CASE WHEN _fail THEN 'FAILURE' ELSE 'SUCCESS' END AS disposition",
        "_http AS http_result",
        "CASE WHEN NOT _fail THEN concat_ws('.',"
        " CAST(event_id % 223 + 1 AS STRING),"
        " CAST(event_id % 256 AS STRING),"
        " CAST(event_id * 7 % 256 AS STRING),"
        " CAST(event_id * 13 % 256 AS STRING)) END AS server_ip",
        "CASE WHEN _2xx THEN CAST(event_id % 9973 AS INT) END AS content_len",
        "CASE WHEN _2xx THEN CASE WHEN _parsed = 'feed'"
        " THEN 'application/atom+xml' ELSE 'text/html' END END AS mime_type",
        "CASE WHEN _2xx THEN md5(CAST(event_id AS STRING)) END AS md5",
        "CASE WHEN _2xx THEN (event_id % 100000) * 2654435761 END"
        " AS text_simhash",
        "_parsed AS parsed_as",
        "CASE WHEN _2xx THEN concat('title-', CAST(event_id AS STRING)) END"
        " AS title",
        "CASE WHEN _3xx THEN concat('http://redirect.example.com/',"
        " CAST(event_id AS STRING)) END AS target_url",
        "CASE WHEN _fail THEN 'IOException' END AS failure_reason",
        "CASE WHEN _fail THEN concat('detail-', CAST(event_id AS STRING)) END"
        " AS failure_detail",
        "CASE WHEN NOT _fail THEN 1700000000000 + event_id - event_id % 3600"
        " END AS http_date",
        "CASE WHEN NOT _fail THEN 1700000000000 + event_id - event_id % 3600"
        " - event_id % 86400 END AS http_last_modified",
        "CASE WHEN NOT _fail THEN substring(md5(CAST(event_id AS STRING)),"
        " 1, 8) END AS etag",
        "CASE WHEN _2xx AND _parsed = 'html'"
        " THEN CAST(event_id % 10 AS INT) END AS intra_domain_links",
        "CASE WHEN _2xx AND _parsed = 'html'"
        " THEN CAST(event_id % 7 AS INT) END AS intra_root_links",
        "CASE WHEN _2xx AND _parsed = 'html'"
        " THEN CAST(event_id % 13 AS INT) END AS inter_domain_links",
        "CASE WHEN _2xx AND _parsed = 'html'"
        " THEN transform(sequence(0, CAST(event_id % 4 AS INT)),"
        " i -> concat('http://ext', CAST((event_id + i) % 50 AS STRING),"
        " '.example.com/p', CAST(i AS STRING))) END AS ext_hrefs",
    )


def full_link_records_from_events(events: DataFrame) -> DataFrame:
    """Synthesize incoming-link records (KEY_TYPE_HTML_LINK /
    KEY_TYPE_RSS_LINK input): per-link source locality, type:rel
    string, and source-header date."""
    return events.filter(F.col("event_type").isin("view", "signup")).selectExpr(
        "user_id AS key",
        "event_id % 3 = 0 AS is_internal",
        "CASE WHEN event_type = 'view' THEN CASE WHEN event_id % 2 = 0"
        " THEN 'html:a:nofollow' ELSE 'html:a' END"
        " ELSE 'rss:link' END AS type_and_rel",
        "1700000000000 + event_id - 500 AS http_date",
    )


def _crawl_detail_struct():
    """Per-attempt crawl detail struct -- the JSON object built by
    crawlDetailRecordFromCrawlStatusRecord (CrawlDBMergingReducer.java:
    791-876): attempt_time always; server_ip/http_result/date headers
    on SUCCESS; content fields on 2xx; redirect_url on 3xx;
    fetch_failed + reason/detail on failure.

    Generated as one SQL string parsed JVM-side (r9-opt wave 7): the
    _ok/_d2xx/_d3xx inputs are produced by the caller's selectExpr so
    the per-field conditions stay single-reference."""
    return F.expr(
        "struct("
        "attempt_time, "
        "CASE WHEN _ok THEN http_result END AS http_result, "
        "CASE WHEN _ok THEN server_ip END AS server_ip, "
        "CASE WHEN _ok THEN http_date END AS `date`, "
        "CASE WHEN _ok THEN http_last_modified END AS last_modified, "
        "CASE WHEN _ok THEN etag END AS etag, "
        "CASE WHEN _d2xx THEN content_len END AS content_len, "
        "CASE WHEN _d2xx THEN mime_type END AS mime_type, "
        "CASE WHEN _d2xx THEN md5 END AS md5, "
        "CASE WHEN _d2xx THEN text_simhash END AS text_simhash, "
        "CASE WHEN _d2xx THEN parsed_as END AS parsed_as, "
        "CASE WHEN _d2xx THEN title END AS title, "
        "CASE WHEN _d2xx THEN intra_domain_links END AS intra_domain_links, "
        "CASE WHEN _d2xx THEN intra_root_links END AS intra_root_links, "
        "CASE WHEN _d2xx THEN inter_domain_links END AS inter_domain_links, "
        "CASE WHEN _d3xx THEN target_url END AS redirect_url, "
        "CASE WHEN NOT _ok THEN TRUE END AS fetch_failed, "
        "CASE WHEN NOT _ok THEN failure_reason END AS failure_reason, "
        "CASE WHEN NOT _ok THEN failure_detail END AS failure_detail)"
    )


def merge_crawldb_full(
    status_records: DataFrame, link_records: DataFrame
) -> DataFrame:
    """Full-shape CrawlDB merge: one nested record per key.

    Output: (key, crawl_status struct, link_status struct) where
    crawl_status = {attempt_count, latest_attempt, http_result,
    latest_crawl, crawl_count, parsed_as, redirect_url, ext_urls,
    ext_urls_truncated, crawl_stats: array<detail struct>} and
    link_status = {int_src_count, ext_src_count, earliest_date,
    latest_date, typeAndRels: array<string>} -- the JSON layout of
    CrawlDBCommon.java:9-76 as Spark nested types.

    Summary evolution rules (CrawlDBMergingReducer.java:906-946),
    folded to aggregates because records reach the reference reducer
    in attempt_time order:
    - http_result: from the newest non-failed attempt carrying one
    - latest_crawl / crawl_count: newest / count of 2xx attempts
    - parsed_as: from the newest 2xx attempt
    - redirect_url: from the newest 3xx attempt (a later 2xx does NOT
      clear it -- the reference never removes the property)
    - ext_urls: the newest link-carrying 2xx attempt's external hrefs
      (extHrefs is only replaced when fresh content has a links
      array), sorted, capped at 100 with a truncation flag
      (flushCurrentRecord, :1055-1060)
    """
    # SQL-string expressions parsed JVM-side (r9-opt wave 7) -- the
    # same aggregates the original Column tree expressed, with the
    # shared _ok/_d2xx/_d3xx conditions computed once per row.
    detailed = status_records.selectExpr(
        "*",
        "disposition = 'SUCCESS' AS _ok",
        "disposition = 'SUCCESS' AND http_result >= 200"
        " AND http_result <= 299 AS _d2xx",
        "disposition = 'SUCCESS' AND http_result >= 300"
        " AND http_result <= 399 AS _d3xx",
    ).withColumn("detail", _crawl_detail_struct())
    summary = detailed.groupBy("key").agg(
        F.expr("count(1)").alias("attempt_count"),
        F.expr("max(attempt_time)").alias("latest_attempt"),
        F.expr(
            "max_by(CASE WHEN _ok AND http_result IS NOT NULL THEN http_result"
            " END, CASE WHEN _ok AND http_result IS NOT NULL THEN attempt_time"
            " END)"
        ).alias("http_result"),
        F.expr("max(CASE WHEN _d2xx THEN attempt_time END)").alias(
            "latest_crawl"
        ),
        F.expr("sum(CAST(_d2xx AS INT))").alias("crawl_count"),
        F.expr(
            "max_by(CASE WHEN _d2xx THEN parsed_as END,"
            " CASE WHEN _d2xx THEN attempt_time END)"
        ).alias("parsed_as"),
        F.expr(
            "max_by(CASE WHEN _d3xx THEN target_url END,"
            " CASE WHEN _d3xx THEN attempt_time END)"
        ).alias("redirect_url"),
        # newest attempt that actually carried content links: feed /
        # linkless attempts do NOT clear extHrefs in the reference
        # (updateLinkStatsFromHTMLContent only clears when a links
        # array is present), so null-href attempts are skipped
        F.expr(
            "max_by(CASE WHEN _d2xx AND ext_hrefs IS NOT NULL THEN ext_hrefs"
            " END, CASE WHEN _d2xx AND ext_hrefs IS NOT NULL THEN attempt_time"
            " END)"
        ).alias("_ext_hrefs"),
        F.expr("sort_array(collect_list(detail))").alias("crawl_stats"),
    )
    summary = summary.selectExpr(
        "key",
        "struct(attempt_count, latest_attempt, http_result, latest_crawl,"
        " crawl_count, parsed_as, redirect_url,"
        f" slice(array_sort(array_distinct(coalesce(_ext_hrefs, array()))),"
        f" 1, {MAX_EXT_URLS}) AS ext_urls,"
        f" size(array_sort(array_distinct(coalesce(_ext_hrefs, array()))))"
        f" > {MAX_EXT_URLS} AS ext_urls_truncated,"
        " crawl_stats) AS crawl_status",
    )

    linksum = link_records.groupBy("key").agg(
        F.expr("sum(CAST(is_internal AS INT))").alias("int_src_count"),
        F.expr("sum(CAST(NOT is_internal AS INT))").alias("ext_src_count"),
        F.expr("min(http_date)").alias("earliest_date"),
        F.expr("max(http_date)").alias("latest_date"),
        F.expr(
            "slice(array_sort(collect_set(type_and_rel)),"
            f" 1, {MAX_TYPE_SAMPLES})"
        ).alias("typeAndRels"),
    ).selectExpr(
        "key",
        "struct(int_src_count, ext_src_count, earliest_date, latest_date,"
        " typeAndRels) AS link_status",
    )
    return summary.join(linksum, "key", "full_outer").orderBy("key")


def merged_full_flat(merged: DataFrame) -> DataFrame:
    """Oracle-checkable projection of the nested merged record: one
    row per (key, attempt) via explode_outer (keys with only link
    records keep a row with null attempt fields); arrays rendered as
    sorted CSV strings. Scalar-only output -- the harness canonicalizer
    cannot sort array columns."""
    return (
        merged.selectExpr(
            "key",
            "crawl_status",
            "link_status",
            "explode_outer(crawl_status.crawl_stats) AS d",
        )
        .selectExpr(
            "key",
            "d.attempt_time AS attempt_time",
            "d.http_result AS detail_http_result",
            "d.server_ip AS server_ip",
            "d.`date` AS http_date",
            "d.last_modified AS last_modified",
            "d.etag AS etag",
            "d.content_len AS content_len",
            "d.mime_type AS mime_type",
            "d.md5 AS md5",
            "d.text_simhash AS text_simhash",
            "d.parsed_as AS detail_parsed_as",
            "d.title AS title",
            "d.intra_domain_links AS intra_domain_links",
            "d.intra_root_links AS intra_root_links",
            "d.inter_domain_links AS inter_domain_links",
            "d.redirect_url AS detail_redirect_url",
            "d.fetch_failed AS fetch_failed",
            "d.failure_reason AS failure_reason",
            "d.failure_detail AS failure_detail",
            "crawl_status.attempt_count AS attempt_count",
            "crawl_status.latest_attempt AS latest_attempt",
            "crawl_status.http_result AS http_result",
            "crawl_status.latest_crawl AS latest_crawl",
            "crawl_status.crawl_count AS crawl_count",
            "crawl_status.parsed_as AS parsed_as",
            "crawl_status.redirect_url AS redirect_url",
            "concat_ws(',', crawl_status.ext_urls) AS ext_urls",
            "crawl_status.ext_urls_truncated AS ext_urls_truncated",
            "link_status.int_src_count AS int_src_count",
            "link_status.ext_src_count AS ext_src_count",
            "link_status.earliest_date AS earliest_date",
            "link_status.latest_date AS latest_date",
            "concat_ws(',', link_status.typeAndRels) AS type_and_rels",
        )
        .orderBy("key", "attempt_time")
    )


# ---------------------------------------------------------------------------
# external-metadata (Blekko-style) import + merge
# ---------------------------------------------------------------------------

#: "rank=<float> rank10=<float> <status>" -- CrawlDBBlekkoMerge.java:86
#: METADATA_PATTERN
BLEKKO_METADATA_PATTERN = r"^rank=([0-9.]*)\s*rank10=([0-9.]*) *([^\s]*)"


def blekko_metadata_import(lines: DataFrame) -> DataFrame:
    """Parse external per-URL metadata lines into typed columns.

    CrawlDBBlekkoMerge.java:46,85-121 (BlekkoURLMetadataToJSONMapper):
    each line is "rank=R rank10=R10 status" keyed by URL; rows whose
    metadata doesn't match the pattern are dropped (BAD_METADATA
    counter). `crawled` mirrors the status == 'crawled' test.

    lines: (url string, metadata string). Pure regexp_extract -- stays
    in whole-stage codegen at any scale.
    """
    rank = F.regexp_extract(F.col("metadata"), BLEKKO_METADATA_PATTERN, 1)
    rank10 = F.regexp_extract(F.col("metadata"), BLEKKO_METADATA_PATTERN, 2)
    status = F.regexp_extract(F.col("metadata"), BLEKKO_METADATA_PATTERN, 3)
    return (
        lines.select(
            "url",
            rank.alias("_rank"),
            rank10.alias("_rank10"),
            status.alias("status"),
        )
        .filter(F.col("_rank") != "")
        .select(
            "url",
            F.col("_rank").cast("double").alias("rank"),
            F.col("_rank10").cast("double").alias("rank10"),
            "status",
            (F.col("status") == F.lit("crawled")).alias("crawled"),
        )
    )


def blekko_merge(crawldb: DataFrame, metadata_lines: DataFrame) -> DataFrame:
    """Merge parsed external metadata into the crawl DB by URL key
    (the 'import' op of CrawlDBBlekkoMerge: shard by key, reduce-side
    merge into the matching DB record). Left join keeps DB records
    with no metadata; rank columns arrive null there.

    crawldb: must carry a 'url' column; all its columns survive.
    """
    meta = blekko_metadata_import(metadata_lines)
    return crawldb.join(meta, "url", "left")


def crawl_snapshot_delta(
    events_a: DataFrame, events_b: DataFrame
) -> DataFrame:
    """Crawl-over-crawl delta report: which keys appeared, vanished,
    or changed between two crawl snapshots.

    Every production CrawlDB pipeline runs this after a merge -- the
    reference reports it operationally through per-segment
    CrawlDBStats counters (NewCrawlDBStatsCollector lineage); here it
    is a first-class relational diff. Per side, a key's summary is
    (fetch attempts, content signature of the LAST fetch by
    (ts, record_id)); the delta classifies each key:

      added     -- key fetched only in snapshot B
      removed   -- key fetched only in snapshot A
      changed   -- both sides, but last content signature differs
      unchanged -- both sides, same last signature

    delta_attempts = attempts_b - attempts_a rides along for crawl-
    budget tracking. The signature is the same quantized digest the
    adaptive-recrawl scheduler observes (floor(value/25)), so the two
    reports agree on what 'changed' means. One shuffle per side plus
    the full-outer key join -- AQE-friendly and bucketable at 100 TB
    exactly like incremental_merge.
    """
    def side(events, suffix):
        f = events.filter(F.col("event_type").isin("click", "purchase"))
        return f.groupBy("user_id").agg(
            F.count(F.lit(1)).alias(f"attempts_{suffix}"),
            F.max_by(
                F.floor(F.col("value") / 25),
                F.struct(F.col("ts"), F.col("event_id")),
            ).alias(f"sig_{suffix}"),
        )
    a = side(events_a, "a")
    b = side(events_b, "b")
    in_a = F.col("attempts_a").isNotNull()
    in_b = F.col("attempts_b").isNotNull()
    return (
        a.join(b, "user_id", "full_outer")
        .select(
            "user_id",
            F.when(~in_a & in_b, "added")
            .when(in_a & ~in_b, "removed")
            .when(F.col("sig_a") == F.col("sig_b"), "unchanged")
            .otherwise("changed")
            .alias("status"),
            F.coalesce("attempts_a", F.lit(0)).alias("attempts_a"),
            F.coalesce("attempts_b", F.lit(0)).alias("attempts_b"),
            (
                F.coalesce("attempts_b", F.lit(0))
                - F.coalesce("attempts_a", F.lit(0))
            ).alias("delta_attempts"),
        )
        .orderBy("user_id")
    )
