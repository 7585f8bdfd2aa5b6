"""SparkSession construction tuned for the engine.

The reference hand-tuned sharding (96 query shards, 10k mergeDB shards
-- CrawlEnvironment.java:106, CrawlDBCommon.java:5) and hand-built
spill/merge machinery. On Spark those are conf knobs: AQE coalesces
and re-plans at runtime, shuffle partition counts scale with input,
and Tungsten handles external sort/spill.

At 100 TB on a real cluster the same builder applies -- only
`shuffle_partitions` (target ~128-200 MB per shuffle partition) and
executor sizing change; nothing in the engine code assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "commoncrawl_crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession with scale-appropriate defaults.

    Defaults are chosen so the SAME logical plans hold from local[32]
    test runs to a 1000-executor cluster:
      - AQE on: runtime coalescing, skew-join splitting, dynamic
        broadcast decisions (replaces the reference's hand affinity
        maps, NodeAffinityMaskBuilder.java:76).
      - Arrow on: Pandas UDF exchange is vectorized.
      - Parquet pushdown/pruning on (they default on; set explicitly
        as documentation).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP(NANOS) parquet reads natively as TIMESTAMP_NTZ on
        # Spark 4.x; sources.tables normalizes ts for any session, so
        # no legacy conf is needed here (and local tests exercise the
        # same read path an externally-built session takes).
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_or_create(spark: SparkSession | None = None) -> SparkSession:
    """Reuse an active session (e.g. driver-provided) or build one."""
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
