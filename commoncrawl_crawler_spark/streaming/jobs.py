"""Structured Streaming jobs: windowed stats, stream dedup, sessions.

Reference (SURVEY.md section 2.10): the reference's incremental
surface is (a) crawler-stats RPC pushes appended to
TimeSeriesDataFile logs with tail-windowed queries
(service/statscollector/statscollector.jr:148,
util/TimeSeriesDataFile.java:164-208), (b) the crawl-history Bloom
service answering "seen this URL?" over a checkpointed filter
(protocol.jr:1075-1104, service/crawlhistory/). It has no watermarks
or late-data semantics -- Structured Streaming adds them.

All jobs take a streaming DataFrame and return transformed streaming
DataFrames; `run_available_now` drains whatever input exists and
terminates (the batch-parity harness). On a cluster the same code
tails an object-store prefix or Kafka topic continuously; nothing
here is local-mode-specific except the memory sink used by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


# ---- census hook ----------------------------------------------------
# Executed micro-batch plans of drained streaming queries, keyed by
# sink/checkpoint name. tools/plan_census.py reads this after running
# each stream_* gate so the zero-cartesian / allowlisted-BNLJ
# invariants cover streaming micro-batch plans, not just the memory-
# sink scan the gate returns (round-6 verdict item 8).
LAST_BATCH_PLANS: dict[str, str] = {}


def _record_batch_plan(name: str, q) -> None:
    try:
        LAST_BATCH_PLANS[name] = q._jsq.explainInternal(True)
    except Exception:
        pass  # census-only; a drained query may already be disposed


# raw-schema memo for the batch peek each stream source needs: the
# peek re-lists the path + re-reads footers per call (~0.1 s driver
# work) for immutable inputs -- the sources.tables._PLAN_MEMO
# discipline applied to the streaming tier (same immutable-input
# contract; keyed by applicationId so a restarted session re-peeks)
_SCHEMA_MEMO: dict = {}


def _peek_schema(spark: SparkSession, path: str):
    app = spark.sparkContext.applicationId
    for k in [k for k in _SCHEMA_MEMO if k[0] != app]:
        del _SCHEMA_MEMO[k]
    key = (app, path)
    if key not in _SCHEMA_MEMO:
        _SCHEMA_MEMO[key] = spark.read.parquet(path).schema
    return _SCHEMA_MEMO[key]


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table as if its rows were arriving files.

    Schema comes from a batch peek (streams require explicit
    schemas); the testdata's TIMESTAMP(NANOS) arrives as long under
    nanosAsLong and is truncated to microseconds exactly as the batch
    loader does, so streaming and batch agree row-for-row.
    """
    path = f"{sf_dir}/events.parquet"
    schema = _peek_schema(spark, path)
    # the file-stream source requires a directory: stream the parent
    # with a glob filter (a real deployment tails a prefix of files)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    kind = dict(stream.dtypes).get("ts")
    if kind in ("bigint", "timestamp"):
        from ..sources.tables import ntz_from_epoch_micros

        micros = (
            F.expr("ts DIV 1000") if kind == "bigint" else F.unix_micros("ts")
        )
        # same normalization as sources.tables.load_table, so stream
        # and batch agree row-for-row under any session timezone
        stream = stream.withColumn("ts", ntz_from_epoch_micros(micros))
    return stream


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the documents table as arriving files (same file-source
    pattern as read_events_stream; schema from a batch peek)."""
    path = f"{sf_dir}/documents.parquet"
    schema = _peek_schema(spark, path)
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def windowed_event_stats(stream: DataFrame, window: str = "1 day") -> DataFrame:
    """Tumbling-window per-type stats with a late-data watermark.

    The crawler-stats rollup (CrawlerStatsQuery.java:64,506) as a
    streaming aggregate. The 1-day watermark bounds state: windows
    older than (max event time - 1 day) finalize and evict.
    """
    # Watermarks require TIMESTAMP, but a bare NTZ->TIMESTAMP cast
    # makes window boundaries follow spark.sql.session.timeZone. Fix:
    # from_utc_timestamp(cast(ts), session_tz) cancels the offset the
    # cast introduced, yielding a UTC instant that carries the NTZ
    # wall time -- window arithmetic on it is then tz-independent, and
    # to_utc_timestamp on win.start inverts the shift so the rendered
    # day is too. (Only a DST transition exactly at midnight could
    # perturb this by one day; no tz schedules one.)
    tz = F.current_timezone()
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn(
            "ts", F.from_utc_timestamp(F.col("ts").cast("timestamp"), tz)
        )
    # day is ALWAYS the UTC rendering of the window start, so the
    # output is session-timezone-independent for BOTH input kinds:
    # for NTZ input this inverts the forward shift above (yielding the
    # NTZ wall date); for plain TIMESTAMP input the windows are
    # UTC-midnight-aligned and this renders their true UTC date (a
    # session-local rendering would move events within the tz offset
    # of midnight to a different day depending on the session)
    day = F.to_utc_timestamp(F.col("win.start"), tz)
    return (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # exact decimal sum (order-independent; functions/numeric.py)
            F.round(F.sum(F.col("value").cast("decimal(15,2)")), 3)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            day.cast("date").alias("day"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def streaming_distinct_pairs(stream: DataFrame) -> DataFrame:
    """Streaming dedup: the crawl-history 'seen?' service.

    `dropDuplicates` over the projected key set keeps exactly the
    distinct pairs; with a watermark the state store evicts old keys
    (the reference checkpointed a Bloom filter per crawl number for
    the same purpose -- bulkItemQuery/bulkUpdateHistory).
    Projecting only the key columns makes the surviving-row choice
    immaterial, so the result is deterministic.
    """
    return stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


def run_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
) -> None:
    """Drain available input into a parquet sink with a checkpoint dir
    -- the production shape: exactly-once via checkpointed offsets +
    file-commit protocol; restartable from `checkpoint`. (The
    reference's crawl-history service checkpointed per crawl number
    for the same restart guarantee.)"""
    q = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _record_batch_plan(path.rstrip("/").rsplit("/", 1)[-1], q)


def run_available_now(
    df: DataFrame,
    sink_table: str,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drain all available input through the streaming plan, then
    return the sink as a batch DataFrame (test/batch-parity path).

    `state_partitions` scopes spark.sql.shuffle.partitions around the
    drain: a streaming query pins its state-store partition count at
    the FIRST checkpoint, so this is the one place to size it. State
    tasks carry per-partition store open/commit cost every micro-batch
    -- size to key-throughput (small for these bounded gates; hundreds
    on a production firehose), independent of the batch shuffle
    default. Results are partition-count independent; pass None to
    inherit the session default. Restored after the drain (queries in
    a session run sequentially here)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(sink_table)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _record_batch_plan(sink_table, q)
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return df.sparkSession.table(sink_table)


def streaming_asof_join(
    stream: DataFrame, probe_type: str = "click", ref_type: str = "signup"
) -> DataFrame:
    """Streaming point-in-time (as-of) join: emit each probe event
    with the latest reference event at or before it for the same
    user -- the feature-store lookup as a stateful stream.

    Per-user state holds the newest reference row seen so far
    (id, value), so probes in later micro-batches join correctly
    without re-reading history. Within a batch the fold is
    vectorized: sort by (ts, ref-before-probe, event_id), forward-
    fill the reference columns, emit probe rows. References at equal
    ts sort before probes (inclusive >= semantics, matching DuckDB's
    ASOF JOIN and operators/joins.asof_join); among same-ts
    references the highest event_id wins, matching the batch gate's
    dedupe. With event-time-ordered batch arrival (the availableNow
    file-drain, any log-ordered source) results equal the batch
    as-of exactly; for out-of-order arrival the state keeps the
    NEWEST reference and probes older than it emit null rather than
    joining a future reference -- exact late-data replay needs a
    batch backfill, as with any single-pass state design.
    """
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    # ts stays NTZ end-to-end: a session-tz TimestampType here would
    # interpret the naive pandas wall times through the session zone
    # on the way back, and DST gap/overlap wall times (America/
    # New_York 02:xx in March) do not round-trip -- observed as
    # corrupted rows under non-UTC sessions
    out_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("asof_event_id", LongType()),
            StructField("asof_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("sig_id", LongType()),
            StructField("sig_value", DoubleType()),
            StructField("sig_ts_us", LongType()),
        ]
    )

    def _fn(
        key: tuple, pdfs: _It[pd.DataFrame], state: GroupState
    ) -> _It[pd.DataFrame]:
        (user_id,) = key
        df = pd.concat(list(pdfs))
        df = df[df["event_type"].isin([probe_type, ref_type])]
        df = df[["event_id", "ts", "event_type", "value"]]
        if df.empty:
            yield pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema.fields}
            )
            return
        if state.exists:
            # re-inject the stored reference as a VIRTUAL ROW at its
            # original event time: every downstream rule (ffill pick,
            # equal-ts max-id tiebreak, probes-before-it get null)
            # then follows from the one sort, instead of a separate
            # seed/guard path that can disagree with it
            prev_id, prev_val, prev_ts_us = state.get
            if prev_ts_us is None:  # legacy 2-field state: sort first
                virt_ts = df["ts"].min() - pd.Timedelta(microseconds=1)
            else:
                virt_ts = pd.Timestamp(prev_ts_us * 1000)
            df = pd.concat(
                [
                    df,
                    pd.DataFrame(
                        {
                            "event_id": [prev_id],
                            "ts": [virt_ts],
                            "event_type": [ref_type],
                            "value": [prev_val],
                        }
                    ),
                ]
            )
        df = df.assign(_probe=(df["event_type"] == probe_type).astype("int8"))
        df = df.sort_values(["ts", "_probe", "event_id"]).reset_index(drop=True)
        is_ref_s = df["_probe"].eq(0)
        is_ref = is_ref_s.to_numpy()
        # nullable Int64 (not float64 via np.where): event ids >= 2^53
        # would silently lose precision in a float round-trip
        sig_id = df["event_id"].astype("Int64").where(is_ref_s).ffill()
        sig_val = df["value"].where(is_ref_s).ffill()
        probes = df["_probe"] == 1
        out = pd.DataFrame(
            {
                "event_id": df.loc[probes, "event_id"],
                "user_id": user_id,
                "ts": df.loc[probes, "ts"],
                "asof_event_id": sig_id[probes],
                "asof_value": sig_val[probes],
            }
        )
        if is_ref.any():
            # the newest reference in sort order -- which includes the
            # virtual state row, so the state can only move forward
            # and equal-ts ties keep the max event_id
            last = np.flatnonzero(is_ref)[-1]
            state.update(
                (
                    int(df["event_id"].iloc[last]),
                    float(df["value"].iloc[last]),
                    int(df["ts"].iloc[last].value) // 1000,
                )
            )
        yield out

    return stream.groupBy("user_id").applyInPandasWithState(
        _fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: str
) -> DataFrame:
    """Stream-static inner join: every micro-batch joins against the
    CURRENT snapshot of the batch-side table (Spark re-plans the
    static side per batch, so a refreshed dimension is picked up
    without restarting the query). The streaming analog of the
    reference's crawler joining each fetched batch against its
    in-memory metadata maps.

    The dimension is hint-broadcast: a stream-static join must never
    shuffle the unbounded side on the join key -- at production rates
    the stream is the 100 TB side and the dimension is the KB-GB
    side. No watermark needed: inner stream-static joins are
    stateless (each batch joins independently; no cross-batch
    buffering)."""
    return stream.join(F.broadcast(dim), on)


def stream_stream_attribution(
    stream: DataFrame,
    window_minutes: int = 30,
    watermark: str = "10 days",
) -> DataFrame:
    """Stream-stream inner join with event-time range: every click is
    attributed to each same-user purchase within `window_minutes`
    after it -- the canonical two-unbounded-sides join (state on BOTH
    sides, bounded by the watermark + range condition, per the
    Structured Streaming join contract).

    `watermark` is the lateness SLA: state for rows older than
    max(event time) - watermark is evicted, so a purchase arriving
    later than that after its click is silently dropped -- set it to
    the pipeline's real lateness bound. The availableNow drain of a
    bounded input equals the batch range join whenever no input
    arrives later than the watermark allows (the parity test splits
    input in event-time order to honor that).
    """
    # watermarks require TIMESTAMP (not NTZ); a uniform cast shifts
    # both sides identically under any session timezone, and the
    # output carries only comparisons and the gap -- tz-invariant
    ts = F.col("ts").cast("timestamp")
    c = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            ts.alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            ts.alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        # elapsed whole seconds via integer epoch-micros: engines
        # disagree on timestamp "difference in seconds" (boundary
        # crossings vs floored elapsed); integer floor-div does not
        F.expr(
            "(unix_micros(p_ts) - unix_micros(c_ts)) DIV 1000000"
        ).alias("gap_s"),
    )


def streaming_register_sketch(stream: DataFrame) -> DataFrame:
    """Streaming HLL register build: the deterministic distinct sketch
    (operators/aggregates.distinct_sketch) as a standard streaming
    aggregation -- per-(event_type, bucket) max(rho) in complete mode.
    The state store holds at most 64 rows per group however long the
    stream runs; that bounded, mergeable register table is exactly why
    HLL is THE streaming distinct-count structure. The estimate
    finisher runs batch-side on the drained registers
    (aggregates._sketch_finish), so the streaming sketch is
    bit-identical to the batch sketch over the same rows (asserted in
    pytest and by the gate's oracle)."""
    from ..operators import aggregates

    return aggregates._sketch_registers(stream, "event_type", "user_id", 40)


def streaming_countmin_cells(
    stream: DataFrame, depth: int = 4, width: int = 512
) -> DataFrame:
    """Streaming count-min counter build over the event stream's user
    keys: the SAME md5-salted cell plan as the batch sketch
    (aggregates.cms_cells) run as a windowless streaming count in
    complete mode -- state bounded at depth*width rows however long
    the stream runs, and mergeable cell-wise with any batch sketch.
    The heavy-hitter probe runs batch-side on the drained cells
    (aggregates.cms_probe), so streaming estimates are bit-identical
    to the batch sketch over the same rows."""
    from ..operators import aggregates

    keyed = stream.select(F.col("user_id").cast("string").alias("key"))
    return aggregates.cms_cells(keyed, "key", depth=depth, width=width)


def streaming_generational_upsert(
    stream: DataFrame, base_dir: str, checkpoint: str
) -> DataFrame:
    """Incremental keyed-state maintenance as a foreachBatch sink --
    the reference's generational CrawlDB merge (each pipeline step
    reads database generation N plus a delta and writes generation
    N+1; CrawlPipelineStep promotes the step output) re-expressed as
    the standard Structured Streaming upsert pattern for stores
    without MERGE:

      for each micro-batch B: gen_{B} := fold(gen_{B-1}, agg(B))

    The per-key fold (count-sum / max-timestamp / decimal value-sum)
    is ASSOCIATIVE, so the final state is independent of micro-batch
    boundaries -- which is exactly what makes the gate deterministic
    and the sink restartable: a replayed batch id overwrites its own
    generation directory reading the PREVIOUS one, so retries are
    idempotent (the checkpoint pins offsets->batch-id, the
    generation name pins batch-id->output).

    Returns the latest generation as a batch DataFrame:
    (user_id, n_events, last_ts, sum_value).
    """
    import os

    def _latest_gen() -> tuple[int, str | None]:
        if not os.path.isdir(base_dir):
            return (-1, None)
        gens = sorted(
            int(d.split("=")[1])
            for d in os.listdir(base_dir)
            if d.startswith("gen=")
        )
        return (gens[-1], f"{base_dir}/gen={gens[-1]}") if gens else (-1, None)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("ts").alias("last_ts"),
            F.sum(F.col("value").cast("decimal(15,2)")).alias("_val"),
        )
        prev_id, prev_path = _latest_gen()
        if prev_path is not None and prev_id < batch_id:
            prev = spark.read.parquet(prev_path).select(
                "user_id",
                "n_events",
                "last_ts",
                F.col("sum_value_dec").alias("_val"),
            )
            delta = delta.unionByName(prev)
        merged = delta.groupBy("user_id").agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.max("last_ts").alias("last_ts"),
            F.sum("_val").cast("decimal(15,2)").alias("sum_value_dec"),
        )
        merged.write.mode("overwrite").parquet(f"{base_dir}/gen={batch_id}")

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _record_batch_plan("generational_upsert", q)
    _, path = _latest_gen()
    spark = stream.sparkSession
    return (
        spark.read.parquet(path)
        .select(
            "user_id",
            "n_events",
            "last_ts",
            F.round(F.col("sum_value_dec"), 3)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("user_id")
    )
