"""Sinks: multi-output fan-out and time-partitioned append logs.

Reference (SURVEY.md section 2.1):
- ParserOutputFormat (mapred/ec2/parser/ParserOutputFormat.java:
  60-96): ONE job writes five outputs (JSON metadata, text content,
  raw content, ARC files, ARC metadata). Spark-first: cache the
  parsed DataFrame once, then issue N column-pruned writes -- each
  write re-reads the cached partitions, not the source.
- TimeSeriesDataFile (util/TimeSeriesDataFile.java:41-208):
  append-only keyed time-series log with tail reads. Spark-first:
  parquet partitioned by day; "tail" reads prune to the latest
  partitions via partition pruning (no full scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel


def write_multi_sink(df: DataFrame, sinks: dict[str, tuple[list[str], str]]) -> None:
    """Write one DataFrame to N parquet sinks in a single pass.

    sinks: {name: (columns, path)}. The input is persisted so the
    upstream job (parse, UDFs) runs once; each sink write is a
    column-pruned scan of the cached data (ParserOutputFormat's
    five-way fan-out without a custom OutputFormat).
    """
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        df.count()  # materialize once
        for _, (cols, path) in sinks.items():
            df.select(*cols).write.mode("overwrite").parquet(path)
    finally:
        df.unpersist()


def write_timeseries(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "append"
) -> None:
    """Append rows to a day-partitioned parquet log."""
    (
        df.withColumn("day", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode(mode)
        .partitionBy("day")
        .parquet(path)
    )


def read_timeseries_tail(spark: SparkSession, path: str, days: int = 1) -> DataFrame:
    """Read only the latest `days` partitions (tail read).

    Partition pruning keeps this O(tail), not O(history): the `day`
    filter is resolved against the partition index, so a year-long
    log with a 1-day tail scans one directory.
    """
    df = spark.read.parquet(path)
    # max over the partition-derived column needs only the file
    # listing (no data pages); a distinct() over all days would
    # enumerate the full history every tail read
    latest = df.select(F.max("day").alias("m")).collect()[0]["m"]
    cutoff = F.date_sub(F.lit(latest), days - 1)
    return df.filter(F.col("day") >= cutoff).drop("day")
