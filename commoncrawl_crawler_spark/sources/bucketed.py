"""Bucketed tables: shuffle-free co-partitioned joins.

Reference (SURVEY.md section 2.1): PartitionJoinInputFormat
(mapred/pipelineV3/crawllistgen/PartitionJoinInputFormat.java:1-114)
and MultiFileMergeUtils zip equal-numbered part files from N
pre-sharded directories into one split per shard -- a hand-built
co-partitioned join. The reference maintained shard discipline across
every pipeline stage to make this work (fixed 96/10000-shard layouts,
CrawlEnvironment.java:106).

Spark-first: `bucketBy` on the join key at write time records the
hash-partitioning in the catalog; joins between tables bucketed on
the same key by the same count plan with NO Exchange on either side.
That is the 100 TB CrawlDB-merge posture: bucket the mergeDB and
every delta on the URL key once, and the nightly merge never shuffles
the big table again. (Asserted in tests: the joined plan contains no
shuffle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Save as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the Sort from
    sort-merge joins (the reference's pre-sorted shard files,
    CrawlDBResortFinalJob capability).
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-key/same-count bucketed tables (shuffle-free)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
