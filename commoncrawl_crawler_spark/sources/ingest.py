"""Text-shaped ingest: rank-list CSV and pattern-extracted logs.

Reference (SURVEY.md section 2.1):
- ImportQuantcastStep (mapred/pipelineV3/domainmeta/quantcast/
  ImportQuantcastStep.java:57): whitespace-separated "rank domain"
  top-1M list -> keyed records. Here: `spark.read.csv` with an
  explicit schema (never inferSchema at scale -- it double-reads).
- DNSFailuresCollectorStep (…/crawlstats/DNSFailuresCollectorStep
  .java:183): regex-parse failure log lines. Here: `spark.read.text`
  + `regexp_extract` columns, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

RANK_LIST_SCHEMA = StructType(
    [
        StructField("rank", IntegerType()),
        StructField("domain", StringType()),
    ]
)


def read_rank_list(
    spark: SparkSession, path: str, sep: str = "\t", comment: str = "#"
) -> DataFrame:
    """Quantcast-style (rank, domain) list with junk-line tolerance."""
    df = spark.read.csv(path, schema=RANK_LIST_SCHEMA, sep=sep, comment=comment)
    return df.filter(F.col("rank").isNotNull() & F.col("domain").isNotNull())


LOG_PATTERN = r"^(\S+) (\S+) (\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}) (.*)$"


def read_failure_log(spark: SparkSession, path: str) -> DataFrame:
    """Parse '<level> <domain> <iso-ts> <message>' log lines.

    Lines that don't match yield empty-string groups and are dropped,
    mirroring the reference's skip-on-parse-failure counters.
    """
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", LOG_PATTERN, 1).alias("level"),
        F.regexp_extract("value", LOG_PATTERN, 2).alias("domain"),
        # try_to_timestamp: a digit-matching but calendar-invalid ts
        # (2024-02-30) must skip the LINE, not abort the job under
        # ANSI mode (Spark 4 default)
        F.try_to_timestamp(
            F.regexp_extract("value", LOG_PATTERN, 3),
            F.lit("yyyy-MM-dd'T'HH:mm:ss"),
        ).alias("ts"),
        F.regexp_extract("value", LOG_PATTERN, 4).alias("message"),
    )
    return parsed.filter((F.col("level") != "") & F.col("ts").isNotNull())


EVENT_JSONL_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("user", StringType()),
                    StructField("etype", StringType()),
                ]
            ),
        ),
        StructField("value", StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType = EVENT_JSONL_SCHEMA
) -> DataFrame:
    """JSON-lines ingest with an EXPLICIT schema -- the third text
    ingest shape next to the rank-list CSV and the regex log parse
    (the reference's S3 manifests and crawl-stats sidecars are
    newline-delimited JSON). Never inferSchema at scale: inference
    double-reads the input; an explicit schema makes malformed lines
    yield nulls (PERMISSIVE) instead of a second pass. String-typed
    leaves keep the read bit-faithful -- the caller casts, so a
    full-precision double survives the roundtrip unchanged.
    """
    return spark.read.schema(schema).json(path)
