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
    """Read only the latest `days` *present* partitions (tail read).

    Semantics: the last `days` distinct partition days that exist in
    the log -- a gap-day log with days=3 still returns 3 partitions
    (TimeSeriesDataFile tail reads are record-count-oriented, not
    calendar-oriented). The day set comes from the partition
    *listing* (Hadoop FileSystem.listStatus on day= directories), so
    this is O(partition count) metadata work with zero data pages
    read; the subsequent isin filter partition-prunes the scan.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    all_days = sorted(
        day
        for st in fs.listStatus(jpath)
        if st.isDirectory()
        and st.getPath().getName().startswith("day=")
        # null-ts rows land in day=__HIVE_DEFAULT_PARTITION__, which
        # sorts AFTER every real date ('_' > '9') and would both eat a
        # tail slot and match nothing in the date-typed isin filter
        for day in [st.getPath().getName().split("=", 1)[1]]
        if day != "__HIVE_DEFAULT_PARTITION__"
    )
    keep = all_days[-days:] if days > 0 else []
    df = spark.read.parquet(path)
    return df.filter(F.col("day").isin(keep)).drop("day")
