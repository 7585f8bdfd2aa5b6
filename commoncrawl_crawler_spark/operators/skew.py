"""Skew handling: salted aggregation and salted joins.

Reference (SURVEY.md section 4, skew row): super-domains (blogspot
et al.) would swamp any root-domain-keyed shuffle, so the reference
derives different partition keys for them
(mapred/pipelineV3/crawllistgen/PartitionUtils.java:60-85) and
averages their PageRank contributions separately
(PageRankUtils.java:2438-2472).

Spark gives mechanical skew-splitting via AQE (skewJoin), but two
patterns remain worth owning because they change the *logical* plan:

- salted aggregation: a hot key is spread over N salt buckets, partial
  aggregates compute per (key, salt), then a second (tiny) aggregate
  folds the partials. Identical results to a plain groupBy -- the
  associativity the reference's combiners relied on.
- salted broadcast-replicated join: the dim side replicates N times
  (one row per salt) so the skewed fact side spreads over N tasks per
  hot key. Identical results to a plain join.

Salts are deterministic (hash of a row-unique column, never rand()),
so retries and oracle comparisons see the same assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    key_col: str,
    salt_src: str,
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    aggs: {out_name: (combine_fn_name, partial_expr)} where
    combine_fn_name in {"sum", "min", "max"} tells phase 2 how to fold
    phase-1 partials (count folds as sum). Any algebraic aggregate
    decomposes this way -- the same partial/final split Catalyst does
    physically, lifted to the logical plan so ONE hot key cannot pin
    one reducer.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt_buckets)).alias("_salt")
    partial = df.groupBy(F.col(key_col), salt).agg(
        *[expr.alias(name) for name, (_, expr) in aggs.items()]
    )
    combine = {"sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(key_col).agg(
        *[combine[fn](F.col(name)).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_count_by_key(
    df: DataFrame, key_col: str, salt_src: str, salt_buckets: int = 16
) -> DataFrame:
    """Count per (low-cardinality, skewed) key without a skewed
    shuffle: partial counts per salt bucket, then a k x buckets fold."""
    return salted_aggregate(
        df,
        key_col,
        salt_src,
        {"cnt": ("sum", F.count(F.lit(1)))},
        salt_buckets,
    ).orderBy(key_col)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: fact rows salt deterministically; the dim
    side replicates once per salt value so every (key, salt) bucket
    finds its match. Output identical to fact.join(dim, key)."""
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt_buckets))
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return f.join(d, [key, "_salt"]).drop("_salt")
