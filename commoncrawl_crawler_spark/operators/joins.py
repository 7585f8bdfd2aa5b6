"""Join operators (SURVEY.md section 2.3).

The reference has exactly one generic join algorithm -- the
reduce-side tagged union join (util/JoinMapper.java:45,
util/JoinValue.java:37-52) -- plus map-side broadcast lookups
(crawlstats/StatsAggregationMapper.java:71-78) and shard-aligned
merge joins (crawllistgen/PartitionJoinInputFormat.java). Here every
one is a declarative `join` and Catalyst + AQE pick the physical
strategy (broadcast-hash vs sort-merge vs shuffled-hash), which is
the decision the reference hard-coded per job.

Scale notes:
- Dimension tables (region/nation/supplier ~ the reference's
  quantcast rank list and super-domain sets) are broadcast
  explicitly with `F.broadcast` -- no shuffle of the fact side.
- Fact-fact joins shuffle both sides on the key; AQE's skew-join
  splitting handles hot keys (the reference hand-built super-domain
  partition schemes for the same problem, PartitionUtils.java:60-85).
- Semi/anti joins never materialize payload columns of the filter
  side, and Spark plans them as broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from commoncrawl_crawler_spark.functions.numeric import PCT, dec, dsum, dsum_expr


def tagged_full_outer_join(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Reduce-side tagged union join, both sides kept.

    util/JoinMapper.java:45 tags each row with its source and the
    reducer sees all tags per key; a full-outer join expresses that
    directly -- the 'tags' become nullable column groups. Customers
    with no orders and (hypothetically) orders with no customer both
    survive.
    """
    order_stats = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_count"),
        dsum("o_totalprice").alias("total_spent"),
    )
    return (
        customer.join(
            order_stats, customer.c_custkey == order_stats.o_custkey, "full_outer"
        )
        .select(
            F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
            F.coalesce(F.col("total_spent"), F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("custkey")
    )


def broadcast_dim_join(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """Map-side hash join with small dimensions broadcast.

    The reference loaded the 1M-row quantcast rank list into every
    mapper (StatsAggregationMapper.java:71-78 'side file'); Spark's
    equivalent is an explicit broadcast hint so the 100 TB fact scan
    streams past an in-memory hash table -- zero fact-side shuffle
    until the final small aggregation.
    """
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            dsum("l_extendedprice").alias("revenue"),
        )
        .orderBy("p_brand", "s_name")
    )


def semi_join_whitelist(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Keep rows whose key exists in another table (whitelist).

    Quantcast whitelist intersection shape
    (iptohost/QuantcastWhitelistByIPReducer.java:41). `left_semi`
    reads no payload from the filter side.
    """
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).orderBy("c_custkey")


def anti_join_blocklist(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Drop rows whose key exists in another table (blocklist).

    BlockedDomainList / NonSuperSubdomainCollectorStep shape
    (crawllistgen/BlockedDomainList.java;
    crawlstats/NonSuperSubdomainCollectorStep.java:58,205).
    """
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).orderBy("c_custkey")


def multiway_join(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """N-way join chain ending in a grouped rollup (TPC-H Q5 shape).

    JoinDomainMetadataStep folds all domain-metadata outputs into one
    row via an N-way reduce-side join (crawlstats/
    JoinDomainMetadataStep.java:39,71-89). Declared as a join chain,
    Catalyst reorders and broadcasts the dimension legs; only
    orders x lineitem shuffles at scale.
    """
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum_expr(
                dec("l_extendedprice")
                * (F.lit(1) - dec("l_discount", PCT)).cast(PCT)
            ).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("r_name", "n_name")
    )


def point_lookup_join(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Bulk point-lookup: map a key list onto a big table.

    The query server's bulk URLFP -> metadata index-seek join
    (queryserver/index/DatabaseIndexV2.java:260-366). Expressed as a
    join of the probe set against the fact table; Catalyst broadcasts
    the probe side, and parquet min/max stats prune row groups the
    probe keys cannot hit.
    """
    probes = orders.filter(F.col("o_totalprice") > 350000).select("o_orderkey")
    return (
        lineitem.join(F.broadcast(probes), lineitem.l_orderkey == probes.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Point-in-time (as-of) join: for each left row, the latest right
    row with right.ts <= left.ts on the same key (inclusive).

    Spark has no native ASOF JOIN; a naive inequality join explodes to
    a range product. The scale-correct expression is the merge-union:
    tag both sides, union, ONE shuffle on the key, sort by (ts, side)
    within key, and carry the latest right payload forward with
    last(ignorenulls) over a running window. Cost is a single
    key-partitioned sort regardless of how many right rows each left
    row spans -- the same discipline as the reference's shard-merge
    joins (MultiFileMergeUtils), re-expressed as a window.

    Right rows order before left rows at equal ts (side 0 < 1), so
    ties are inclusive, matching DuckDB's `ASOF JOIN ... ON l.ts >=
    r.ts` semantics (the driver gate's oracle). The right side must be
    unique per (key, ts) for a deterministic winner -- gate wrappers
    dedupe with max-event_id per (key, ts).
    """
    from pyspark.sql import Window

    rcols = [c for c in right.columns if c not in (key, ts)]
    reserved = {"_side", "_r", "_asof"} | {f"asof_{c}" for c in rcols}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join left side must not contain reserved or "
            f"output-colliding columns {sorted(clash)}"
        )
    r2 = right.select(
        key,
        ts,
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    l2 = left.withColumn("_side", F.lit(1))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof", F.last("_r", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in rcols],
    )
    return out


def asof_join_events(events: DataFrame) -> DataFrame:
    """Gate wrapper: join every click to the user's latest signup at
    or before the click (point-in-time user state -- the classic
    feature-store lookup shape)."""
    from pyspark.sql import Window

    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    signups = (
        events.filter(F.col("event_type") == "signup")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    return (
        asof_join(clicks, signups, key="user_id", ts="ts")
        .select(
            "event_id",
            "user_id",
            "ts",
            "asof_event_id",
            "asof_value",
        )
        .orderBy("event_id")
    )


def interval_bucket_join(
    events: DataFrame, intervals: DataFrame, bucket: str = "1 day"
) -> DataFrame:
    """Range (interval containment) join, bucketized: events whose ts
    falls in [start_ts, end_ts).

    A raw inequality join is a nested-loop range product. The scale
    path buckets time: each interval explodes to the days it covers
    (bounded fan-out), events map to their day, and the join becomes
    an EQUI-join on the day bucket followed by an exact bounds filter
    -- hash-joinable, AQE-skew-splittable, and the fan-out is
    len(interval)/bucket rows instead of |events| x |intervals|.
    `intervals` needs (interval_id, start_ts, end_ts).
    """
    c_days = intervals.select(
        "interval_id",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                F.to_date("start_ts"),
                F.to_date("end_ts"),
            )
        ).alias("_day"),
    )
    e = events.withColumn("_day", F.to_date(F.col("ts")))
    # no forced broadcast: Catalyst/AQE broadcasts small interval
    # tables on its own (the gate's 20x4 rows always qualify), while a
    # large intervals table stays shuffle-hash-joinable and AQE
    # skew-splittable -- a broadcast hint would pin it driver-side
    return e.join(c_days, "_day").filter(
        (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts"))
    )


def campaign_window_stats(events: DataFrame, n_campaigns: int = 20) -> DataFrame:
    """Gate wrapper: the 20 earliest signups open 3-day campaign
    windows; aggregate the events each window contains."""
    from ..functions.numeric import dsum

    campaigns = (
        events.filter(F.col("event_type") == "signup")
        .orderBy("ts", "event_id")
        .limit(n_campaigns)
        .select(
            F.col("event_id").alias("interval_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("end_ts"),
        )
    )
    joined = interval_bucket_join(events, campaigns)
    return (
        joined.groupBy(F.col("interval_id").alias("campaign_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
        )
        .orderBy("campaign_id")
    )
