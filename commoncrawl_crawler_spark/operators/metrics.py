"""Job metrics via Observation (SURVEY.md section 2.4, Counters row).

Reference: every Hadoop job increments side-channel Counters
(e.g. deduper/Stage1Mapper.java:59-65 counts candidate/bad/dropped
rows). The Spark equivalents:
- `Observation` + `df.observe(...)`: exact aggregates collected on
  the driver as a side effect of the SAME action -- no second scan,
  no accumulator double-count on task retries (observe metrics are
  task-retry safe, unlike raw accumulators).
- accumulators remain for imperative code paths (mapInPandas loops);
  prefer observe for anything expressible as an aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named metric aggregates to a DataFrame.

    Usage:
        df2, obs = observed(df, "parse",
                            rows=F.count(F.lit(1)),
                            null_urls=F.sum(F.col("url").isNull().cast("int")))
        df2.write.parquet(...)     # one action
        obs.get                    # {'rows': ..., 'null_urls': ...}
    """
    obs = Observation(name)
    aliased = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *aliased), obs
