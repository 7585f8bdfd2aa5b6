"""Parquet table loaders.

The reference reads everything as SequenceFile `(Writable, Writable)`
pairs via JobBuilder (util/JobBuilder.java:87,165). Parquet is the
engine's universal format: columnar, predicate-pushdown- and
column-pruning-friendly (SURVEY.md section 1.4).

At cluster scale the same loaders work against `s3://...` prefixes;
nothing here assumes a local filesystem.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one named parquet table from a scale-factor directory.

    Nanosecond-precision parquet timestamps (events.ts) are read as
    long (spark.sql.legacy.parquet.nanosAsLong) and truncated to
    microsecond TimestampType here -- the same ns->us truncation
    DuckDB applies, so oracle comparisons agree.
    """
    base = sf_dir or DEFAULT_SF_DIR
    # nanosAsLong is a runtime SQL conf: set it here, not only at session
    # build, so an externally-built SparkSession (e.g. a driving harness)
    # can read TIMESTAMP(NANOS) parquet without PARQUET_TYPE_ILLEGAL.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # non-modifiable in some deployments; fall through to read
    df = spark.read.parquet(f"{base}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integer DIV: ns magnitudes (~1.7e18) exceed double's 2^53
            # mantissa, so float division would be off by ±1us
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views (for spark.sql)."""
    out = {}
    for name in names:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
