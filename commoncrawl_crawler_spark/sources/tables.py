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

# Plan memo: the UNEXECUTED DataFrame (logical plan) per
# (applicationId, path). spark.read.parquet re-lists the path and
# re-reads parquet footers for schema inference on EVERY call --
# measured ~60-125 ms of driver-side work per call on this box -- and
# a 280-query x 3-pass bench issues >1500 such calls for the same ten
# immutable paths. Reusing the DataFrame object skips only that
# driver-side re-inference; it caches NO data and NO results -- every
# action on the returned frame still scans the parquet files
# (r9-opt wave 7, guide 6: file-listing/planning cost is driver-side,
# pay it once per session). Keyed by applicationId so a restarted
# session never sees plans bound to a stopped SparkContext.
#
# CONTRACT (r10, per ADVICE.md): the memo assumes the files under a
# path are IMMUTABLE for the application's lifetime -- the testdata
# contract, and the posture of the reference's versioned step outputs
# (a new crawl generation gets a NEW path). A pipeline that rewrites
# parquet under an existing path in-place must not route reads through
# load_table (or must restart the session). The memo also binds each
# plan to the SESSION that first read the path; sessions within one
# application share confs that affect these scans here (the ts
# normalization is session-independent by construction, documented
# below). Mutation is guarded by a lock for multi-threaded drivers.
_PLAN_MEMO: dict = {}
_PLAN_MEMO_LOCK = __import__("threading").Lock()


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
    path = f"{base}/{name}.parquet"
    app = spark.sparkContext.applicationId
    key = (app, path)
    with _PLAN_MEMO_LOCK:
        for k in [k for k in _PLAN_MEMO if k[0] != app]:
            del _PLAN_MEMO[k]
        hit = _PLAN_MEMO.get(key)
    if hit is not None:
        return hit
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            df = df.withColumn("ts", ntz_from_epoch_micros(F.expr("ts DIV 1000")))
        elif kind == "timestamp":
            # unix_micros extracts the instant tz-independently; the
            # NTZ wall clock is then built by exact decimal-interval
            # arithmetic (an LTZ->NTZ cast would render in the
            # caller's session timezone instead)
            df = df.withColumn("ts", ntz_from_epoch_micros(F.unix_micros("ts")))
    with _PLAN_MEMO_LOCK:
        _PLAN_MEMO[key] = df
    return df


def ntz_from_epoch_micros(micros) -> F.Column:
    """Epoch microseconds -> TIMESTAMP_NTZ at the UTC wall clock,
    independent of spark.sql.session.timeZone.

    The interval seconds argument is exact DECIMAL (no double
    rounding, no 2^53 mantissa limit), and TIMESTAMP_NTZ + interval
    is pure wall-clock arithmetic -- so the result equals DuckDB's
    naive rendering of the same epoch under ANY session timezone.
    """
    from pyspark.sql import Column

    m = micros if isinstance(micros, Column) else F.col(micros)
    secs = (m.cast("decimal(20,0)") / F.lit(1_000_000)).cast("decimal(18,6)")
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return epoch + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)


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
