"""Event-analytics operators over the events table: funnel
conversion, cohort retention, and the event-transition matrix -- the
product-analytics tier every events pipeline serves (the reference's
crawl-stats jobs are the same shape: staged counts over a timestamped
log, crawlstats/CrawlStatsCollapser-style).

All three are Column-only plans. Scale shape: funnel steps chain
user-grain aggregates (each step is one partial-agg groupBy plus a
user-grain join, input touched once per step at full grain and never
again); retention is two user-grain reductions and a distinct; the
transition matrix is one window pass partitioned by user -- the
per-user sort Spark's window already pays, never a global one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel: a user reaches step k when an event of that
    type exists STRICTLY after their earliest completion of step
    k-1 (earliest-completion semantics -- deterministic because each
    step keeps min(ts) among qualifying events).

    Output: (step_idx, step, users_reached, conversion_micro) with
    conversion relative to step 0, in step order.
    """
    base = events.select("user_id", "event_type", "ts")
    reached = (
        base.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    tiers = [reached]
    for s in steps[1:]:
        prev = tiers[-1].select("user_id", F.col("t").alias("_pt"))
        tiers.append(
            base.filter(F.col("event_type") == s)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col("_pt"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
    counts = None
    for i, (s, tier) in enumerate(zip(steps, tiers)):
        row = tier.agg(
            F.count(F.lit(1)).cast("bigint").alias("users_reached")
        ).select(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(s).alias("step"),
            "users_reached",
        )
        counts = row if counts is None else counts.unionByName(row)
    first = counts.filter(F.col("step_idx") == 0).select(
        F.col("users_reached").alias("_first")
    )
    return (
        counts.crossJoin(F.broadcast(first))
        .select(
            "step_idx",
            "step",
            "users_reached",
            F.when(
                F.col("_first") > 0,
                F.expr("users_reached * 1000000 DIV _first"),
            )
            .cast("bigint")
            .alias("conversion_micro"),
        )
        .orderBy("step_idx")
    )


def cohort_retention(
    events: DataFrame, epoch: str = "2024-01-01", max_week: int = 3
) -> DataFrame:
    """Weekly cohort retention: cohort = the week (relative to a
    fixed epoch date, so bucketing is pure integer arithmetic -- no
    engine-specific week-of-year rules) of the user's first event;
    retention at offset k = distinct users with any activity in
    cohort-week + k.

    Output: (cohort_week, week_offset, users) for offsets
    0..max_week, ordered.
    """
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("_d0")
    )
    active = events.select(
        "user_id", F.to_date("ts").alias("_d")
    ).distinct()
    j = active.join(first, "user_id").select(
        "user_id",
        F.floor(F.datediff(F.col("_d0"), F.lit(epoch)) / 7)
        .cast("int")
        .alias("cohort_week"),
        F.floor(F.datediff(F.col("_d"), F.col("_d0")) / 7)
        .cast("int")
        .alias("week_offset"),
    )
    return (
        j.filter(F.col("week_offset").between(0, max_week))
        .select("user_id", "cohort_week", "week_offset")
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("users"))
        .orderBy("cohort_week", "week_offset")
    )


def transition_matrix(events: DataFrame) -> DataFrame:
    """Per-user event-type transition counts and probabilities (the
    Markov journey model): one window pass ordered by (ts, event_id)
    within each user, then a (from, to) count with the per-source
    probability as a truncating integer micro-ratio.

    Output: (from_type, to_type, cnt, prob_micro) ordered.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wsrc = Window.partitionBy("from_type")
    return (
        counts.withColumn("_tot", F.sum("cnt").over(wsrc))
        .select(
            "from_type",
            "to_type",
            "cnt",
            F.expr("cnt * 1000000 DIV _tot").cast("bigint").alias(
                "prob_micro"
            ),
        )
        .orderBy("from_type", "to_type")
    )
