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


def merge_crawldb(typed: DataFrame) -> DataFrame:
    """One merged row per key from the typed record union.

    The reference walks records in type order; here each per-type
    fold is a conditional aggregate over the same shuffle:
    - status summary: attempt_count, last_attempt_* (max_by on
      (ts, record_id) -- deterministic tiebreak)
    - link summary: counts per link type, earliest/latest link date
    - samples: sorted record_id list capped at SAMPLE_CAP
    """
    is_status = F.col("record_type") == TYPE_CRAWL_STATUS
    is_link = F.col("record_type").isin(TYPE_HTML_LINK, TYPE_ATOM_LINK, TYPE_RSS_LINK)
    is_sample = F.col("record_type") == TYPE_SOURCE_SAMPLE

    status_key = F.when(is_status, F.struct(F.col("ts"), F.col("record_id")))
    return (
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
        .orderBy("key")
    )


def merge_crawldb_from_events(events: DataFrame) -> DataFrame:
    return merge_crawldb(typed_records_from_events(events))


def incremental_merge(previous_merged: DataFrame, new_typed: DataFrame) -> DataFrame:
    """Delta-merge new typed records against a previous merged table.

    CrawlDBMergingReducer.java:56-58: the merge job consumes previous
    runs of itself plus new segment emissions. Counters re-add, the
    last-attempt winner is re-chosen by timestamp, dates min/max, and
    sample lists merge + re-cap. Expressed as: re-expand the previous
    merged row into per-type pseudo-records cheaper than storage --
    here we fold directly with a full-outer join + column merges
    (one shuffle on the merge key, broadcast-free, AQE-friendly).
    """
    return fold_merged(previous_merged, merge_crawldb(new_typed))


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
        .orderBy("key")
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
