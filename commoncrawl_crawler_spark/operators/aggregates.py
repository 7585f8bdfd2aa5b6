"""Aggregation operators (SURVEY.md section 2.4).

The reference implements every aggregation as a sort-based MapReduce
reducer with an optional combiner (util/JobBuilder.java:165,
hadoop/mergeutils/SpillValueCombiner.java:33). Here each one is a
declarative `groupBy().agg()` -- Catalyst plans partial (map-side)
plus final HashAggregate automatically, which is the combiner the
reference had to hand-wire, and AQE coalesces post-shuffle partitions.

Scale notes: all aggregations here shuffle once on the grouping key.
Distinct counts offer both exact (`countDistinct`, a second shuffle)
and approximate (`approx_count_distinct`, HLL, single-pass map-side
partials) variants -- the reference used 2^28-element Bloom filters
for the same approximate-distinct trade
(crawlstats/StatsAggregationReducer.java:44-49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from commoncrawl_crawler_spark.checkpointing import ckpt_lazy
from commoncrawl_crawler_spark.functions.numeric import MONEY, PCT, dec, dsum, dsum_expr


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """Flagship grouped-aggregate scan (TPC-H Q1 shape).

    Mirrors the reference's per-group tally reducers (count / sum /
    avg per key, e.g. crawlstats/StatsAggregationReducer.java:67-119)
    on the synthetic lineitem table. One shuffle on a low-cardinality
    key; map-side partial aggregation does almost all the work, so
    this scales linearly with input bytes.
    """
    # exact decimal factors: sums are order-independent (see
    # functions/numeric.py); (1 +/- pct) recast to PCT so neither
    # engine crosses the 38-digit precision-loss threshold
    ep = dec("l_extendedprice")
    disc_mult = (F.lit(1) - dec("l_discount", PCT)).cast(PCT)
    tax_mult = (F.lit(1) + dec("l_tax", PCT)).cast(PCT)
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(ep * disc_mult).alias("sum_disc_price"),
            dsum_expr(ep * disc_mult * tax_mult).alias("sum_charge"),
            # averages derived from the deterministic rounded sums:
            # identical double inputs -> bit-identical division
            F.round(dsum("l_quantity") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(dsum("l_extendedprice") / F.count(F.lit(1)), 6).alias(
                "avg_price"
            ),
            F.round(dsum("l_discount", dt=PCT) / F.count(F.lit(1)), 6).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def stats_aggregation(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-group conditional tallies + exact distinct count.

    Shape of crawlstats/StatsAggregationMapper.java:82-158 +
    StatsAggregationReducer.java:67-119 (per root-domain: url count,
    crawled count, HTTP-200 count, distinct subdomains) recast over
    orders-per-market-segment: order count, open/filled counts via
    `sum(when(...))`, distinct customers.

    `countDistinct` is exact (two-phase shuffle); see
    `stats_aggregation_approx` for the HLL single-shuffle variant the
    reference's Bloom filter approximates.
    """
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
                "open_count"
            ),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "filled_count"
            ),
            F.countDistinct("o_custkey").alias("distinct_customers"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


def stats_aggregation_approx(orders: DataFrame) -> DataFrame:
    """Approximate-distinct variant (HLL), single shuffle.

    The scale path: the reference burned a 2^28-element, 10-hash Bloom
    filter per reducer for approximate distinct subdomains
    (StatsAggregationReducer.java:44-49); `approx_count_distinct`
    gives the same answer class with mergeable sketches and no
    second shuffle. Not oracle-hash-matched (estimator differs from
    DuckDB's) -- correctness is bounded-error, tested in pytest.
    """
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy("o_orderpriority")
    )


def group_count(df: DataFrame, key: str) -> DataFrame:
    """groupBy().count() -- DomainURLCounter shape
    (domainmeta/DomainURLCounter.java:41)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt")).orderBy(key)


def count_having(events: DataFrame) -> DataFrame:
    """Frequency count keeping groups with count > 1 (HAVING).

    TypeAndRelStatsCollector + DropUniqueEntriesReducer shape
    (crawlstats/TypeAndRelStatsCollectorStep.java:125-152): count link
    type/rel attribute frequencies, drop singletons.
    """
    return (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .orderBy("user_id", "event_type")
    )


def two_level_aggregation(events: DataFrame) -> DataFrame:
    """Monthly histogram then per-key summary.

    Blogs posts-per-month shape (blogs/postfrequency/
    AggregateStatsByMonth.java:49,119 then GroupByDomainStep.java:49):
    level 1 groups by (user, year, month); level 2 summarizes the
    monthly counts per user (min/max/avg/count). Two shuffles, the
    second over strictly fewer rows; at 100 TB the level-1 output is
    already small relative to input so the second shuffle is cheap.
    """
    monthly = events.groupBy(
        "user_id",
        F.year("ts").cast("int").alias("yr"),
        F.month("ts").cast("int").alias("mo"),
    ).agg(F.count(F.lit(1)).alias("monthly_cnt"))
    return (
        monthly.groupBy("user_id")
        .agg(
            F.min("monthly_cnt").alias("min_monthly"),
            F.max("monthly_cnt").alias("max_monthly"),
            F.round(F.avg("monthly_cnt"), 6).alias("avg_monthly"),
            F.count(F.lit(1)).alias("months_active"),
            F.sum("monthly_cnt").alias("total_events"),
        )
        .orderBy("user_id")
    )


def latest_record_per_key(events: DataFrame) -> DataFrame:
    """Last-writer-wins merge: newest event per user.

    The dedupe mapper keeps the latest crawl attempt per URL
    (deduper/Stage1Mapper.java:118-128) and the domain-stats merge is
    last-writer-wins (crawlstats/MergeNewDomainStatsStep.java:68-80).
    `max_by` over a deterministic (ts, event_id) tiebreak does it in
    one shuffle with map-side partials -- no window sort needed.
    """
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by("event_id", key).alias("last_event_id"),
            F.max_by("event_type", key).alias("last_event_type"),
            F.max_by("value", key).alias("last_value"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


def time_window_rollup(events: DataFrame) -> DataFrame:
    """Tumbling-window counter rollup (batch form).

    CrawlerStats time-series shape (statscollector/statscollector.jr:
    3-69, TimeSeriesDataFile.java:164-208): 60+ counters per
    (timestamp bucket, crawler) served by windowed reads. Expressed as
    date_trunc bucketing; the streaming twin lives in
    streaming/events.py using `window()` + watermark.
    """
    return (
        events.groupBy(
            F.to_date(F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("value").alias("sum_value"),
            F.round(dsum("value") / F.count(F.lit(1)), 6).alias("avg_value"),
            F.countDistinct("user_id").alias("distinct_users"),
        )
        .orderBy("day", "event_type")
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per group (p50/p95).

    Beyond the reference (it had only count/sum/min/max/avg); Spark's
    `percentile` and DuckDB's `quantile_cont` share the continuous
    interpolation definition, so results oracle-match after rounding.
    Exact percentiles shuffle the group's values; at 100 TB switch to
    `approx_percentile` (t-digest, map-side partials) the same way
    countDistinct degrades to approx_count_distinct.
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("event_type")
    )


def moving_daily_average(events: DataFrame, days: int = 7) -> DataFrame:
    """Per-day totals with a trailing N-day moving average.

    The time-series smoothing pass the crawler-stats UI applied
    client-side (CrawlerStatsQuery served raw points); expressed as a
    range-frame window over the daily rollup -- the rollup shrinks
    data to O(days) first, so the window cost is trivial at any scale.
    """
    from pyspark.sql import Window

    # the daily total stays an exact decimal through the window sum so
    # the moving average is order-independent too; only the two output
    # columns drop to double
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(F.sum(dec("value")), 3).alias("_day_total_dec")
    )
    w = (
        Window.orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-(days - 1) * 86400, 0)
    )
    return daily.select(
        "day",
        F.col("_day_total_dec").cast("double").alias("day_total"),
        F.round(
            F.sum("_day_total_dec").over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias(f"avg_{days}d"),
    ).orderBy("day")


def status_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP totals: (status, priority) -> status -> grand total.

    The reference computed multi-level totals with separate jobs per
    level (AggregateStatsByMonth then GroupByDomain); `rollup` emits
    every level from one shuffle with map-side partials.
    """
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# alpha_64 = 0.7213/(1 + 1.079/64) for m=64 registers, fixed in micro
# units so both engines compute the identical integer estimate.
HLL_ALPHA_E6 = 709390


def distinct_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    window_bits: int = 40,
    with_exact: bool = True,
) -> DataFrame:
    """Deterministic HyperLogLog-style distinct-count sketch, m=64
    registers (the approximate COUNT DISTINCT every 100 TB rollup
    wants: one linear pass, 64 small registers per group, no exact
    distinct shuffle). Flajolet et al. 2007 estimator, re-derived on
    md5 so the sketch -- unlike Spark's approx_count_distinct or
    DuckDB's approx sketches -- is bit-identical across engines and
    partitionings and therefore hash-gateable:

    - bucket   = first 60 md5 bits mod 64
    - rho      = leading-zero rank of the next 40-bit window + 1
                 (41 - bit_length, exact via bin() string length)
    - register = max(rho) per (group, bucket)
    - denom    = sum over all 64 registers of 2^(41-reg), empty
                 buckets contributing 2^41 -- an exact bigint
    - estimate = alpha_e6 * m^2 * 2^41 DIV denom, micro-units via
                 DECIMAL(38,0) integer division

    Scale shape: one partial-aggregating groupBy on (group, bucket)
    -- at most 64 rows per group survive the map side -- then a
    64-row-per-group rollup; nothing else shuffles. The optional
    exact countDistinct column (parity/error reporting for the gate)
    is the expensive path the sketch replaces; disable with_exact at
    real scale.

    Output: (group, buckets_present, reg_xor, denom, est_micro
    [, exact_distinct]).
    """
    regs = _sketch_registers(df, group_col, value_col, window_bits)
    out = _sketch_finish(regs, window_bits)
    if with_exact:
        exact = df.groupBy(F.col(group_col).alias("grp")).agg(
            F.countDistinct(value_col).alias("exact_distinct")
        )
        out = out.join(exact, "grp")
    return out.orderBy("grp")

def _sketch_registers(
    df: DataFrame, group_col: str, value_col: str, window_bits: int
) -> DataFrame:
    """(grp, _bucket, _reg) register rows -- the mergeable partial
    state: registers for a union of groups are the bucket-wise max."""
    m = 64
    top = window_bits + 1  # rho range 1..top; empty register = 0
    h = F.md5(F.col(value_col).cast("string"))
    rows = df.select(
        F.col(group_col).alias("grp"),
        (
            F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % m
        ).alias("_bucket"),
        (
            F.conv(F.substring(h, 16, 15), 16, 10).cast("bigint")
            % F.lit(1 << window_bits).cast("bigint")
        ).alias("_w"),
    )
    rho = F.lit(top) - F.expr("length(trim(LEADING '0' FROM bin(_w)))")
    return (
        rows.select("grp", "_bucket", rho.alias("_rho"))
        .groupBy("grp", "_bucket")
        .agg(F.max("_rho").alias("_reg"))
    )


def _sketch_finish(regs: DataFrame, window_bits: int) -> DataFrame:
    """Register rows -> (grp, buckets_present, reg_xor, denom,
    est_micro); exact-bigint denominator, DECIMAL(38,0) DIV."""
    m = 64
    unit = 1 << (window_bits + 1)
    numerator = HLL_ALPHA_E6 * m * m * unit
    sketch = regs.groupBy("grp").agg(
        F.count(F.lit(1)).cast("int").alias("buckets_present"),
        F.expr("bit_xor(_bucket * 64 + _reg)").alias("reg_xor"),
        (
            F.sum(F.expr(f"shiftright(CAST({unit} AS BIGINT), _reg)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(unit)
        ).cast("bigint").alias("denom"),
    )
    return sketch.select(
        "grp",
        "buckets_present",
        "reg_xor",
        "denom",
        F.expr(
            f"CAST('{numerator}' AS DECIMAL(38,0)) DIV denom"
        ).alias("est_micro"),
    )


def distinct_sketch_union(
    df: DataFrame,
    group_col: str,
    value_col: str,
    window_bits: int = 40,
) -> DataFrame:
    """Per-group sketches PLUS their register-level union as one
    '__all__' row -- the mergeability property that makes the sketch
    a 100 TB operator: per-shard/per-day register tables combine by
    bucket-wise max without rescanning raw data, exactly how the
    reference accumulates per-segment stats across pipeline steps.
    The '__all__' row is bit-identical to sketching the unioned raw
    input directly (max is associative), which the pytest gate
    asserts.

    Scale shape: reuses the per-group register pass (<= 64 rows per
    group survive map-side), then one <= 64-row-per-group merge --
    the raw table is scanned exactly once.
    """
    regs = _sketch_registers(df, group_col, value_col, window_bits)
    merged = (
        regs.groupBy("_bucket")
        .agg(F.max("_reg").alias("_reg"))
        .select(F.lit("__all__").alias("grp"), "_bucket", "_reg")
    )
    return _sketch_finish(
        regs.unionByName(merged), window_bits
    ).orderBy("grp")


def _cms_bucket(key, r: int, width: int) -> "F.Column":
    """Row-r counter bucket for a string key: md5-salted, so the cell
    layout is bit-identical across engines and partitionings."""
    h = F.md5(F.concat(F.lit(f"{r}|"), key))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % width


def cms_cells(
    rows: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-min counter cells (r, bucket, cnt) over a string key
    column. One explode to depth rows per occurrence, ONE
    partial-aggregating groupBy -- and because that groupBy is a
    plain windowless count, the SAME plan is a legal STREAMING
    aggregation in complete mode with state bounded at depth*width
    rows (streaming/jobs.streaming_countmin_cells wraps it)."""
    return (
        rows.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cms_bucket(F.col(key_col), r, width).alias(
                                "bucket"
                            ),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_probe(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-estimate the keys against a (drained or batch) cell
    table: estimate = min over the depth salted rows (CMS guarantees
    estimate >= true count). `keys` carries key_col plus any
    passthrough columns; the cell table is broadcast (depth*width
    rows however large the corpus)."""
    passthrough = [c for c in keys.columns if c != key_col]
    probes = keys.select(
        key_col,
        *passthrough,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_bucket(F.col(key_col), r, width).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, *passthrough, "rb.r", "rb.bucket")
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy(key_col, *passthrough)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def count_min_tokens(
    documents: DataFrame,
    depth: int = 4,
    width: int = 512,
    top_n: int = 20,
) -> DataFrame:
    """Count-min sketch over corpus tokens (Cormode-Muthukrishnan
    2005) with a heavy-hitter report: estimate = min over `depth`
    md5-salted rows of the bucket counters. Like the HLL sketch, the
    md5 derivation makes every counter -- and therefore the estimate
    -- bit-identical across engines and partitionings, so the gate
    hash-matches; and the counter table is mergeable (cell-wise sum),
    the property that lets per-shard sketches combine at 100 TB
    without rescanning.

    Scale shape: one token explode (linear) fans out to depth rows
    per occurrence, then ONE partial-aggregating groupBy collapses to
    depth*width counter cells -- the sketch is fixed-size however
    large the corpus. The report joins the top_n exact heavy hitters
    (the expensive path the sketch replaces, kept as the error
    column) against the broadcast cell table; CMS guarantees
    estimate >= exact, asserted in pytest.

    Output: (token, exact_cnt, cms_estimate) by exact count desc.
    """
    toks = documents.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("token")
    )

    # batch fast path: hash each DISTINCT token once and weight its
    # cell by the exact count, instead of 4 md5s per OCCURRENCE --
    # cell values are identical (a sum either way; vocabulary is
    # ~40x smaller than the token stream), and the streaming twin
    # keeps the occurrence-grain cms_cells plan, which a complete-
    # mode streaming aggregation requires (batch-parity pytest pins
    # the two cell tables equal)
    tok_counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    cells = (
        tok_counts.select(
            "exact_cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cms_bucket(F.col("token"), r, width).alias(
                                "bucket"
                            ),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rb"),
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    top = tok_counts.orderBy(F.desc("exact_cnt"), "token").limit(top_n)
    return cms_probe(
        cells, top, "token", depth=depth, width=width
    ).orderBy(F.desc("exact_cnt"), "token")


def quantile_histogram(
    events: DataFrame,
    value_col: str = "value",
    resolution: int = 100,
    quantiles: tuple[int, ...] = (50, 95, 99),
) -> DataFrame:
    """Mergeable histogram quantile sketch -- the way quantiles are
    actually computed at 100 TB: bucket every value at a fixed
    resolution (here centi-units), ONE partial-aggregating groupBy to
    the bounded (group, bucket) histogram, then read each quantile as
    the smallest bucket whose cumulative count reaches q% of the
    group. Error is bounded by the bucket width by construction; the
    histogram merges cell-wise across shards/days (the HLL/count-min
    property), unlike the exact sort value_percentiles pays.

    Everything is integer arithmetic past the one floor(value*res)
    quantization (cum*100 >= q*n avoids any division), so the row is
    engine- and partitioning-exact. The only window runs over the
    HISTOGRAM (<= resolution * value-range rows per group), never the
    raw values.

    Output: (event_type, n, p50_centi, p95_centi, p99_centi) --
    quantile bucket lower edges in centi-units, by event_type.
    """
    from pyspark.sql import Window

    b = events.select(
        "event_type",
        F.floor(F.col(value_col) * resolution).cast("long").alias("bucket"),
    )
    h = b.groupBy("event_type", "bucket").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cw = h.select(
        "event_type",
        "bucket",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wtot).alias("n"),
    )
    aggs = [F.max("n").cast("bigint").alias("n")]
    for q in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(q) * F.col("n"),
                    F.col("bucket"),
                )
            )
            .cast("bigint")
            .alias(f"p{q}_centi")
        )
    return cw.groupBy("event_type").agg(*aggs).orderBy("event_type")


def cube_rollup(orders: DataFrame) -> DataFrame:
    """Multi-level OLAP rollup in ONE pass: CUBE over (status,
    priority) computes the detail cells, both one-dimension margins,
    and the grand total in a single Expand + partial-aggregating
    shuffle -- the reference's crawl-stats jobs run one MapReduce per
    breakdown (StatsAggregationReducer and friends); Catalyst's
    Expand gives every breakdown for the price of one scan.

    grouping_id() disambiguates margin rows from genuine NULL keys
    (0 = detail, 1 = priority margin, 2 = status margin, 3 = total).
    Money sums use the decimal discipline (functions/numeric.py):
    decimal accumulation is order-independent, so the double result
    is partitioning-stable.
    """
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 3
            )
            .cast("double")
            .alias("sum_total"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


def kmv_source_overlap(
    documents: DataFrame, k: int = 128, pairs: int = 9
) -> DataFrame:
    """KMV (k-minimum-values) distinct sketches with SET-OPERATION
    support (Beyer et al. 2007, "On synopses for distinct-value
    estimation under multiset operations") -- the capability HLL
    lacks: two KMV sketches combine into an unbiased JACCARD estimate,
    so corpus-overlap questions ("how much does source A share with
    source B?") answer from sketches alone.

    Per source the sketch is the k smallest md5(word) values (md5 =
    the engine-shared hash, the LSH-oracle discipline). Estimators
    are exact integer arithmetic: with h_k = 1 + int(first 8 hex
    chars of the k-th smallest), D-hat = ((k-1) << 32) DIV h_k, and
    J-hat = |A-sketch ∩ B-sketch ∩ union-sketch| * 1e6 DIV k.

    Scale shape: min-k is TWO-PHASE -- a salted window (source,
    md5 % 64) ranks partial top-ks in parallel, then the <= 64k
    survivors per source take one tiny final window; no per-source
    global sort over the full vocabulary ever runs. The pair grid is
    consecutive source ids (bounded), sketches join broadcast-side.

    Output per pair: est_distinct for both sides, the sketch-based
    Jaccard, and the EXACT Jaccard (computable at gate scale) for the
    quality-report flavor of dedup_sketch_quality.
    """
    from pyspark.sql import Window

    toks = documents.select(
        "source",
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda w: w != "",
        ).alias("_t"),
    )
    n1 = F.greatest(F.size("_t") - 1, F.lit(0))
    bg_expr = F.zip_with(
        F.slice(F.col("_t"), 1, n1),
        F.slice(F.col("_t"), 2, n1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    # elements are word BIGRAMS: cross-source vocab overlap is near
    # total in web text, bigram overlap is discriminative
    # words is consumed FOUR times (the hash/sketch chain, both sides
    # of the exact-Jaccard semi-join, and the per-source sizes):
    # without a boundary Catalyst re-plans -- and the runtime
    # re-executes -- the bigram explode + distinct per reference
    # (r9-opt: the multiply-referenced-subplan discipline)
    words = toks.select(
        "source", F.explode(bg_expr).alias("word")
    ).distinct().transform(ckpt_lazy)
    hashed = words.select(
        "source", F.md5("word").alias("h")
    )
    # phase 1: salted partial min-k (64-way parallel per source)
    salt = F.pmod(F.conv(F.substring("h", 1, 4), 16, 10).cast("long"), F.lit(64))
    w1 = Window.partitionBy("source", "_salt").orderBy("h")
    partial = (
        hashed.withColumn("_salt", salt)
        .withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_r", "_salt")
    )
    # phase 2: final min-k over the bounded survivors
    w2 = Window.partitionBy("source").orderBy("h")
    # the sketch feeds est, both union-sketch sides and both
    # intersection semi-joins -- same sharing rationale as words
    # (k rows per source: tiny to materialize)
    sketch = (
        partial.withColumn("_r", F.row_number().over(w2))
        .filter(F.col("_r") <= k)
        .transform(ckpt_lazy)
    )
    # a sketch smaller than k IS the exact distinct set: estimate =
    # its size (the standard KMV small-side rule)
    est = (
        sketch.groupBy("source")
        .agg(
            F.max("_r").alias("_n_sk"),
            F.max_by("h", "_r").alias("_h_last"),
        )
        .select(
            "source",
            F.when(F.col("_n_sk") < k, F.col("_n_sk").cast("bigint"))
            .otherwise(
                F.expr(
                    f"CAST(({k - 1} * 4294967296) DIV "
                    "(CAST(conv(substring(_h_last, 1, 8), 16, 10) AS BIGINT)"
                    " + 1) AS BIGINT)"
                )
            )
            .alias("est_distinct"),
        )
    )
    sk = sketch.select("source", "h")

    src_id = lambda c: F.regexp_extract(c, r"src(\d+)", 1).cast("int")
    pair_grid = (
        sk.select("source")
        .distinct()
        .withColumn("_sid", src_id(F.col("source")))
        .filter(F.col("_sid") < pairs)
        .select(
            F.col("source").alias("source_a"),
            F.concat(F.lit("src"), (F.col("_sid") + 1).cast("string")).alias(
                "source_b"
            ),
        )
    )
    a = sk.withColumnRenamed("source", "source_a").withColumnRenamed(
        "h", "ha"
    )
    b = sk.withColumnRenamed("source", "source_b").withColumnRenamed(
        "h", "hb"
    )
    # union sketch per pair: k smallest of the two sketches' union
    pair_hashes = (
        pair_grid.join(a, "source_a")
        .select("source_a", "source_b", F.col("ha").alias("h"))
        .unionByName(
            pair_grid.join(b, "source_b").select(
                "source_a", "source_b", F.col("hb").alias("h")
            )
        )
        .distinct()
    )
    wu = Window.partitionBy("source_a", "source_b").orderBy("h")
    union_sketch = (
        pair_hashes.withColumn("_r", F.row_number().over(wu))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    union_sizes = union_sketch.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("_n_union_sk")
    )
    sa = sk.select(F.col("source").alias("_sa"), F.col("h").alias("_hsa"))
    sb = sk.select(F.col("source").alias("_sb"), F.col("h").alias("_hsb"))
    both = (
        union_sketch.join(
            sa,
            (F.col("source_a") == F.col("_sa"))
            & (F.col("h") == F.col("_hsa")),
            "left_semi",
        )
        .join(
            sb,
            (F.col("source_b") == F.col("_sb"))
            & (F.col("h") == F.col("_hsb")),
            "left_semi",
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("_n_both"))
    )
    # exact Jaccard at gate scale (words per source pair)
    wa = words.withColumnRenamed("source", "source_a")
    wb = words.select(
        F.col("source").alias("_wsb"), F.col("word").alias("_wwb")
    )
    exact = (
        pair_grid.join(wa, "source_a")
        .join(
            wb,
            (F.col("source_b") == F.col("_wsb"))
            & (F.col("word") == F.col("_wwb")),
            "left_semi",
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("_n_inter"))
    )
    sizes = words.groupBy("source").agg(F.count(F.lit(1)).alias("_n"))
    return (
        pair_grid.join(
            est.withColumnRenamed("source", "source_a").withColumnRenamed(
                "est_distinct", "est_distinct_a"
            ),
            "source_a",
        )
        .join(
            est.withColumnRenamed("source", "source_b").withColumnRenamed(
                "est_distinct", "est_distinct_b"
            ),
            "source_b",
        )
        .join(both, ["source_a", "source_b"], "left")
        .join(union_sizes, ["source_a", "source_b"])
        .join(exact, ["source_a", "source_b"], "left")
        .join(
            sizes.withColumnRenamed("source", "source_a").withColumnRenamed(
                "_n", "_na"
            ),
            "source_a",
        )
        .join(
            sizes.withColumnRenamed("source", "source_b").withColumnRenamed(
                "_n", "_nb"
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "est_distinct_a",
            "est_distinct_b",
            F.expr(
                "CAST(coalesce(_n_both, 0) * 1000000 DIV _n_union_sk"
                " AS BIGINT)"
            ).alias("est_jaccard_micro"),
            F.expr(
                "CAST(coalesce(_n_inter, 0) * 1000000 DIV "
                "(_na + _nb - coalesce(_n_inter, 0)) AS BIGINT)"
            ).alias("exact_jaccard_micro"),
        )
        .orderBy("source_a", "source_b")
    )
