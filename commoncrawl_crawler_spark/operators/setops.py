"""Set operations (SURVEY.md section 2.7).

The reference unions heterogeneous input dirs via
JobBuilder.inputs(list) (util/JobBuilder.java:87-110), dedupes with
in-reducer HashSets/Blooms (LinkGraphDataEmitter.java:110), and does
except/intersect as blocklist/whitelist reducers. All four are
first-class relational ops here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def union_tagged(orders_a: DataFrame, orders_b: DataFrame) -> DataFrame:
    """Union of two heterogeneous sources with a provenance tag --
    the JoinMapper source-dir tag (util/JoinMapper.java:136-149).
    unionByName tolerates column-order drift between sources."""
    a = orders_a.select("o_orderkey", "o_totalprice").withColumn(
        "src", F.lit("open")
    )
    b = orders_b.select("o_orderkey", "o_totalprice").withColumn(
        "src", F.lit("filled")
    )
    return a.unionByName(b).orderBy("o_orderkey", "src")


def distinct_rows(orders: DataFrame) -> DataFrame:
    """distinct() -- HashSet/Bloom dedupe of emitted keys
    (LinkGraphDataEmitter.java:110). Spark plans partial + final
    hash aggregate, the scalable form of the reference's
    in-memory set."""
    return orders.select("o_custkey", "o_orderpriority").distinct().orderBy(
        "o_custkey", "o_orderpriority"
    )


def except_keys(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """EXCEPT -- blocklist subtraction (BlockedDomainList shape):
    customer keys minus ordering-customer keys."""
    return (
        customer.select(F.col("c_custkey").alias("custkey"))
        .exceptAll(orders.select(F.col("o_custkey").alias("custkey")).distinct())
        .orderBy("custkey")
    )


def intersect_keys(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """INTERSECT -- whitelist intersection
    (QuantcastWhitelistByIPReducer.java:41)."""
    return (
        customer.select(F.col("c_custkey").alias("custkey"))
        .intersect(orders.select(F.col("o_custkey").alias("custkey")))
        .orderBy("custkey")
    )
