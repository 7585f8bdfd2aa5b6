"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Column-name parity rule: every computed column is aliased identically
in the Spark code and the oracle SQL; double-typed aggregates are
rounded (3 decimals for sums, 6 for ratios/avgs) on BOTH sides so
cross-engine float summation order cannot flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from commoncrawl_crawler_spark.operators import aggregates
from commoncrawl_crawler_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return aggregates.pricing_summary(_t(spark, "/root/testdata/sf0.001", "lineitem"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {
        "agg_pricing_summary": lambda s, d: aggregates.pricing_summary(
            _t(s, d, "lineitem")
        ),
        "agg_stats_aggregation": lambda s, d: aggregates.stats_aggregation(
            _t(s, d, "orders"), _t(s, d, "customer")
        ),
        "agg_group_count": lambda s, d: aggregates.group_count(
            _t(s, d, "orders"), "o_orderpriority"
        ),
        "agg_count_having": lambda s, d: aggregates.count_having(_t(s, d, "events")),
        "agg_two_level": lambda s, d: aggregates.two_level_aggregation(
            _t(s, d, "events")
        ),
        "agg_latest_per_key": lambda s, d: aggregates.latest_record_per_key(
            _t(s, d, "events")
        ),
        "agg_time_window_rollup": lambda s, d: aggregates.time_window_rollup(
            _t(s, d, "events")
        ),
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (views pre-registered)."""
    return {
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 3) AS sum_qty,
                   round(sum(l_extendedprice), 3) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 3) AS sum_charge,
                   round(round(sum(l_quantity), 3) / count(*), 6) AS avg_qty,
                   round(round(sum(l_extendedprice), 3) / count(*), 6) AS avg_price,
                   round(round(sum(l_discount), 3) / count(*), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "agg_stats_aggregation": """
            SELECT c_mktsegment,
                   count(*) AS order_count,
                   sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS open_count,
                   sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS filled_count,
                   count(DISTINCT o_custkey) AS distinct_customers,
                   round(sum(o_totalprice), 3) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment
        """,
        "agg_group_count": """
            SELECT o_orderpriority, count(*) AS cnt
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "agg_count_having": """
            SELECT user_id, event_type, count(*) AS cnt
            FROM events GROUP BY user_id, event_type
            HAVING count(*) > 1
            ORDER BY user_id, event_type
        """,
        "agg_two_level": """
            WITH monthly AS (
                SELECT user_id,
                       CAST(year(ts) AS INT) AS yr,
                       CAST(month(ts) AS INT) AS mo,
                       count(*) AS monthly_cnt
                FROM events GROUP BY 1, 2, 3
            )
            SELECT user_id,
                   min(monthly_cnt) AS min_monthly,
                   max(monthly_cnt) AS max_monthly,
                   round(avg(monthly_cnt), 6) AS avg_monthly,
                   count(*) AS months_active,
                   sum(monthly_cnt) AS total_events
            FROM monthly GROUP BY user_id ORDER BY user_id
        """,
        "agg_latest_per_key": """
            SELECT user_id,
                   event_id AS last_event_id,
                   event_type AS last_event_type,
                   value AS last_value,
                   ts AS last_ts
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                ) AS rn
                FROM events
            ) WHERE rn = 1 ORDER BY user_id
        """,
        "agg_time_window_rollup": """
            SELECT CAST(ts AS DATE) AS day,
                   event_type,
                   count(*) AS cnt,
                   round(sum(value), 3) AS sum_value,
                   round(round(sum(value), 3) / count(*), 6) AS avg_value,
                   count(DISTINCT user_id) AS distinct_users
            FROM events
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
    }
