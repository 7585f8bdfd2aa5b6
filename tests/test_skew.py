"""Salting actually spreads hot keys (equivalence is oracle-gated)."""

from __future__ import annotations

from pyspark.sql import functions as F

from commoncrawl_crawler_spark.operators import skew


def test_hot_key_spreads_over_salt_buckets(spark):
    # one key, 10k rows: the classic reducer-pinning shape
    hot = spark.range(10_000).select(
        F.lit("blogspot.com").alias("domain"), F.col("id")
    )
    salted = hot.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("id")), F.lit(16))
    )
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets == 16  # every bucket hit -> 16-way parallel agg


def test_salted_join_exact_row_multiplicity(spark):
    fact = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 100)], "k long, row_id long"
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    out = skew.salted_join(fact, dim, "k", "row_id", salt_buckets=4)
    assert out.count() == 101  # every fact row matched exactly once
    assert out.filter(F.col("v") == "a").count() == 100
    # dim key 3 has no fact rows -> contributes nothing
    assert out.filter(F.col("v") == "c").count() == 0


def test_salted_aggregate_multiple_metrics(spark):
    df = spark.createDataFrame(
        [("x", i * 1.0) for i in range(10)] + [("y", 5.0)],
        "k string, v double",
    )
    out = {
        r["k"]: (r["cnt"], r["total"], r["mx"])
        for r in skew.salted_aggregate(
            df,
            "k",
            "v",
            {
                "cnt": ("sum", F.count(F.lit(1))),
                "total": ("sum", F.sum("v")),
                "mx": ("max", F.max("v")),
            },
            salt_buckets=4,
        ).collect()
    }
    assert out["x"] == (10, 45.0, 9.0)
    assert out["y"] == (1, 5.0, 5.0)
