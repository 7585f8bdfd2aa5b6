"""Window-function-shaped operators (SURVEY.md section 2.5, 2.6).

The reference implements these with partition + secondary-sort +
stateful reducer (CrawlListKey.java:51-66 encodes '(type asc, rank
desc)' into byte-comparable keys; NewGenBundlesStep.java streams the
sorted run). Spark's window functions declare the same semantics;
Tungsten does one shuffle per distinct partitioning and sorts within
partitions.

Scale notes: a window over PARTITION BY k is one shuffle on k plus an
in-partition sort -- same cost shape as the reference's
partitioner+comparator jobs. Unpartitioned ORDER BY windows
(global running sums) single-thread and are avoided; the segment
packer below keeps cumulative sums per-domain for that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def topk_per_group(lineitem: DataFrame, k: int = 3) -> DataFrame:
    """Top-k rows per key by rank -- the per-host URL cap
    (SEGMENT_URLS_PER_HOST=200, mapred/segmenter/Segmenter.java:49;
    cut in NewGenBundlesStep.java:358-465). row_number over a
    deterministic tiebreak, filtered to k.
    """
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        lineitem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "rn")
        .orderBy("l_orderkey", "rn")
    )


def secondary_sort_rank(orders: DataFrame) -> DataFrame:
    """Per-key ordering with a descending secondary component --
    CrawlListKey's '(domain, type asc, rank0 DESC)' discipline
    (crawllistgen/CrawlListKey.java:19-66). rank() exposes the
    position the reference encoded into the shuffle key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
    ).orderBy("o_custkey", "price_rank", "o_orderkey")


def first_row_per_key(events: DataFrame) -> DataFrame:
    """First-row-per-key dedupe -- EmitOnlyOneRedirectReducer
    (crawlstats/CrawlDBRedirectStatsCollectorStep.java:59)."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


def segment_packing(orders: DataFrame, segment_size: float = 500000.0) -> DataFrame:
    """Pack ordered rows into bounded segments via running sums --
    SegmenterReducer packs bundles into 10k-500k-URL segments
    (mapred/segmenter/SegmenterReducer.java:54, Segmenter.java:47-48).
    cumulative sum over the per-key ordered run, then
    floor(cumsum/size) assigns the segment id. Per-key windows keep
    the sort distributed (no global ORDER BY window).
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exact decimal running sum: deterministic under any partitioning,
    # and floor() at a segment boundary can't flip on float jitter.
    # The segment id divides in DECIMAL (floor of an exact quotient):
    # a bigint/bigint `/` would evaluate in double, whose 2^53
    # mantissa could flip a boundary once cents exceed ~4.5e15
    run_dec = F.sum(F.col("o_totalprice").cast("decimal(15,2)")).over(w)
    seg_cents = int(round(segment_size * 100))
    cents = (run_dec * 100).cast("decimal(20,0)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(run_dec, 3).cast("double").alias("running_total"),
        F.floor(cents / F.lit(seg_cents)).cast("int").alias("segment_id"),
    ).orderBy("o_custkey", "o_orderkey")


def round_robin_assignment(documents: DataFrame, n_buckets: int = 8) -> DataFrame:
    """Deterministic bucket assignment -- the bundle round-robin
    crawler/bucket ids (NewGenBundlesStep.java:576-640). Modulo over
    a per-partition row_number keeps assignment stable and balanced.
    """
    w = Window.partitionBy("lang").orderBy("doc_id")
    return documents.select(
        "doc_id",
        "lang",
        ((F.row_number().over(w) - 1) % n_buckets).alias("bucket"),
    ).orderBy("doc_id")


def paginate(
    df: DataFrame,
    sort_col: str,
    ascending: bool = True,
    offset: int = 0,
    page_size: int = 20,
    tiebreak: str | None = None,
) -> DataFrame:
    """Sorted pagination -- readPaginatedResults(sortOrder, offset,
    pageSize) (queryserver/index/PositionBasedSequenceFileIndex.java:
    229-264, sort spec queryserver.jr:50-62). `offset().limit()` on a
    sorted plan; Spark executes as TakeOrderedAndProject (a top-k
    heap, no global sort materialization) for small offset+limit.

    ALWAYS pass a unique `tiebreak` when sort_col can tie: each page
    is a separate job, and a distributed sort orders tied rows
    arbitrarily per run, so untied consecutive pages can duplicate
    and drop rows across the boundary. With no tiebreak given, the
    remaining *orderable* columns are appended as a deterministic
    fallback order (map-typed columns, which Spark cannot sort, are
    skipped rather than raising AnalysisException).
    """
    col = F.col(sort_col).asc() if ascending else F.col(sort_col).desc()
    if tiebreak:
        order = [col, F.col(tiebreak)]
    else:
        order = [col] + [
            F.col(f.name)
            for f in df.schema.fields
            if f.name != sort_col and _orderable(f.dataType)
        ]
    return df.orderBy(*order).offset(offset).limit(page_size)


def _orderable(dt) -> bool:
    """Spark sort keys must be orderable: maps are not, and arrays /
    structs are only as orderable as their element/field types."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def session_window_stats(events: DataFrame, gap_minutes: int = 60) -> DataFrame:
    """Per-user gap sessions via Spark's NATIVE session_window
    aggregate -- the same sessionization sessions.sessionize builds
    from lag+cumsum windows, but expressed as the built-in merging
    session aggregate Spark can also run incrementally under
    Structured Streaming state. Semantics differ from the window
    formulation in two documented ways: session_window's end is
    last_event + gap (the expiry bound), not the last event itself;
    and an event landing EXACTLY at prev + gap MERGES into the
    session (a split requires strictly more than the gap) -- pinned
    by test_session_window_boundary_merges_at_exact_gap and mirrored
    in the oracle's boundary predicate.

    Scale shape: ONE partial-aggregating shuffle on (user_id,
    session_window) -- Spark merges overlapping windows inside the
    aggregate, so there is no window-function sort pass at all; on a
    100 TB event log this is strictly cheaper than the lag+cumsum
    plan (no per-user total ordering materialized).

    Output: (user_id, session_start, session_expiry, n_events).
    """
    gap = f"{int(gap_minutes)} minutes"
    return (
        events.groupBy(
            "user_id", F.session_window("ts", gap).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_expiry"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
