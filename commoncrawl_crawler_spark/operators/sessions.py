"""Sessionization: gap-based event sessions, batch and stateful-stream.

The reference has no session operator (SURVEY.md section 2.10: "no
watermarks, session windows, or late-data semantics exist") -- this
is part of the training-data-pipeline tier this engine adds. Gap
rule: a new session starts when the time since the user's previous
event exceeds `gap_minutes`.

Batch: lag + running sum of boundary flags -- two window passes over
one (user) shuffle, all JVM-side. Streaming: applyInPandasWithState
keeps (session count) per user in the state store; this is the
engine's custom-stateful-operator extension point
(SURVEY.md section 2.11).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user gap sessions with stable ids and per-session stats."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff is wall-clock arithmetic, defined for both
    # TIMESTAMP and TIMESTAMP_NTZ inputs -- unlike an NTZ->LTZ cast
    # plus unix_micros, it cannot shift across DST transitions in a
    # non-UTC session, so gaps match the oracle's naive arithmetic
    # under any session timezone. Both windows sort identically, so
    # lag and the cumulative sum share one shuffle.
    with_prev = events.withColumn("_prev_ts", F.lag("ts").over(w))
    is_boundary = (
        F.col("_prev_ts").isNull()
        | (F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)") > gap_us)
    ).cast("long")
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_ids = with_prev.withColumn("session_id", F.sum(is_boundary).over(wcum))
    return (
        with_ids.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal sum (order-independent; functions/numeric.py)
            F.round(F.sum(F.col("value").cast("decimal(15,2)")), 3)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        # NTZ, not session-tz TIMESTAMP: naive pandas wall times in a
        # DST gap/overlap would not round-trip through a non-UTC
        # session zone (same hardening as streaming_asof_join)
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

SESSION_STATE = StructType([StructField("sessions_emitted", LongType())])


def sessionize_stateful(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState.

    Per-user state tracks how many sessions have been assigned so
    session ids stay stable across micro-batches. Sessions (including
    the still-open one) are emitted each batch in update mode --
    downstream consumers key on (user_id, session_id) and take the
    latest row, the standard update-sink contract.

    This is the template for any custom stateful operator the
    DataFrame API can't express (the reference's extension point was
    a stateful Reducer class; here it is an Arrow-batched pandas
    function with a typed state store).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60.0

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        base = state.get[0] if state.exists else 0
        df = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        gaps = df["ts"].diff().dt.total_seconds()
        boundary = (gaps.isna()) | (gaps > gap_s)
        sess = boundary.cumsum().astype("int64") + base
        out = (
            df.assign(session_id=sess)
            .groupby("session_id")
            .agg(
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_id", "count"),
                sum_value=("value", "sum"),
            )
            .reset_index()
        )
        out.insert(0, "user_id", user_id)
        out["sum_value"] = out["sum_value"].round(3)
        state.update((base + int(sess.max()),))
        yield out

    return stream.groupBy("user_id").applyInPandasWithState(
        _fn,
        SESSION_OUTPUT,
        SESSION_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )
