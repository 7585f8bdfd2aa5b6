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

    Nanosecond-precision parquet timestamps (events.ts) are
    normalized to microsecond TIMESTAMP_NTZ -- the same ns->us
    truncation and no-timezone semantics DuckDB applies, so oracle
    comparisons agree regardless of which SparkSession confs the
    caller set:

    - Spark 4.x default: TIMESTAMP(NANOS) parquet arrives natively
      as TIMESTAMP_NTZ (already truncated to us) -- kept as is.
    - nanosAsLong sessions: arrives as bigint ns -- integer DIV
      (ns magnitudes ~1.7e18 exceed double's 2^53 mantissa, so float
      division would be off by +-1us), then cast to NTZ.
    - Legacy LTZ sessions: cast to NTZ (exact under UTC).
    """
    base = sf_dir or DEFAULT_SF_DIR
    df = spark.read.parquet(f"{base}/{name}.parquet")
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
            )
        elif kind == "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
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
