"""Data-quality operators: table profiling and declarative
constraint checks (the Deequ/Great-Expectations surface, done
Spark-first). The reference validates its stores with dedicated
passes (CrawlDB consistency checks, validity filters before merges);
here both are single-job declarative plans.

Scale shape: the profiler is ONE aggregate pass over the table --
Catalyst plans the per-column distinct counts through a single
Expand + partial aggregation, so input bytes are read once however
many columns are profiled. The constraint suite is a handful of
aggregates and one broadcast anti-join, each a one-liner to push to
100 TB (every check is a partial-aggregating count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _q(col: "F.Column") -> "F.Column":
    # micro-unit quantization for numeric min/max: engine-exact and
    # type-stable across bigint/double profile columns
    return F.floor(col.cast("double") * 1e6 + F.lit(0.5)).cast("bigint")


def profile_table(
    df: DataFrame,
    num_cols: list[str],
    str_cols: list[str],
) -> DataFrame:
    """Per-column profile: row count, null count, exact distinct
    count, and min/max (micro-unit integers for numeric columns,
    plain strings otherwise). One aggregate pass; the output is one
    row per profiled column.

    Output: (column, n, nulls, n_distinct, min_num, max_num,
    min_str, max_str) ordered by column name.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in num_cols + str_cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls__{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist__{c}"))
    for c in num_cols:
        aggs.append(F.min(_q(F.col(c))).alias(f"__min__{c}"))
        aggs.append(F.max(_q(F.col(c))).alias(f"__max__{c}"))
    # string min/max go in a SEPARATE no-key aggregate: a string-typed
    # aggregation buffer disqualifies HashAggregate, and when mixed
    # into the multi-countDistinct aggregate it forced the whole
    # Expand(x n_cols+1) pipeline through Sort + SortAggregate --
    # measured 2.1 s vs 0.x s noop on a 150k-row table at sf0.1.
    # Split out, the Expand path hash-aggregates (all-long buffers)
    # and the string pass is one cheap ungrouped partial+final agg.
    str_aggs = []
    for c in str_cols:
        str_aggs.append(F.min(F.col(c)).alias(f"__smin__{c}"))
        str_aggs.append(F.max(F.col(c)).alias(f"__smax__{c}"))
    row = df.agg(*aggs)
    if str_aggs:
        row = row.crossJoin(df.agg(*str_aggs))
    parts = []
    for c in num_cols:
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n"),
                F.col(f"__nulls__{c}").alias("nulls"),
                F.col(f"__dist__{c}").alias("n_distinct"),
                F.col(f"__min__{c}").alias("min_num"),
                F.col(f"__max__{c}").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in str_cols:
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n"),
                F.col(f"__nulls__{c}").alias("nulls"),
                F.col(f"__dist__{c}").alias("n_distinct"),
                F.lit(None).cast("bigint").alias("min_num"),
                F.lit(None).cast("bigint").alias("max_num"),
                F.col(f"__smin__{c}").alias("min_str"),
                F.col(f"__smax__{c}").alias("max_str"),
            )
        )
    return (
        row.select(F.explode(F.array(*parts)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def check_constraints(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Declarative constraint suite over the orders table: key
    uniqueness, completeness, referential integrity against customer,
    a range rule and an accepted-values rule. Each check reports its
    violation count; `passed` = zero violations.

    Output: (check, violations, passed) ordered by check name.
    """
    uniq = orders.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("c")
    ).agg(
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0)
        )
        .cast("bigint")
        .alias("violations")
    ).select(F.lit("unique_o_orderkey").alias("check"), "violations")
    complete = orders.agg(
        F.sum(F.col("o_custkey").isNull().cast("bigint"))
        .cast("bigint")
        .alias("violations")
    ).select(F.lit("non_null_o_custkey").alias("check"), "violations")
    refint = (
        orders.join(
            F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .select(
            F.lit("orders_custkey_in_customer").alias("check"), "violations"
        )
    )
    rng = orders.agg(
        F.sum((~(F.col("o_totalprice") > 0)).cast("bigint"))
        .cast("bigint")
        .alias("violations")
    ).select(F.lit("positive_o_totalprice").alias("check"), "violations")
    vals = orders.agg(
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")
        )
        .cast("bigint")
        .alias("violations")
    ).select(F.lit("o_orderstatus_in_OFP").alias("check"), "violations")
    return (
        uniq.unionByName(complete)
        .unionByName(refint)
        .unionByName(rng)
        .unionByName(vals)
        .select("check", "violations", (F.col("violations") == 0).alias("passed"))
        .orderBy("check")
    )
