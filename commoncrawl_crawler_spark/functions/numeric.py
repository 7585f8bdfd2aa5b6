"""Deterministic (order-independent) numeric aggregation helpers.

Floating-point summation is not associative: `sum(double)` over a
shuffled dataset gives answers whose last bits depend on partition
count and row order, so `round(sum(x), 3)` can flip at a rounding
boundary between runs -- and between Spark and an oracle engine.

The engine's parity convention (same discipline as the fixed-point
bigint PageRank in operators/graph.py) is: any value that is
hash-compared against an oracle must come from exact arithmetic.
Money-like doubles (2 fractional digits by construction) are cast to
DECIMAL before summing; the decimal sum is exact under any partition
or merge order; the final cast back to DOUBLE is one deterministic
rounding of the same exact value in every engine.

The reference keeps money/stat tallies in integer counters
(crawlstats/CrawlStatsCommon.java item counters) for the same reason.

Oracle-SQL mirror of `dsum(col)`:

    CAST(round(sum(CAST(col AS DECIMAL(15,2))), 3) AS DOUBLE)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: money-like inputs: <= 10^13 magnitude, 2 fractional digits
MONEY = "decimal(15,2)"
#: small ratios (discount/tax): < 100, 2 fractional digits
PCT = "decimal(4,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec(col: Column | str, dt: str = MONEY) -> Column:
    """Cast a money-like double column to exact decimal."""
    return _c(col).cast(dt)


def dsum(col: Column | str, round_to: int = 3, dt: str = MONEY) -> Column:
    """Order-independent sum of a money-like double column.

    Exact decimal sum, rounded (exactly, on the decimal) then cast to
    double so the output schema matches the engine's double-typed
    convention while the value is identical under any partitioning.
    """
    return F.round(F.sum(dec(col, dt)), round_to).cast("double")


def dsum_expr(expr: Column, round_to: int = 3) -> Column:
    """Like dsum but over a pre-built exact-decimal product expression.

    Caller is responsible for keeping factor precisions small enough
    that neither Spark nor the oracle engine hits decimal-overflow
    precision loss (MONEY x PCT x PCT stays well under 38 digits).
    """
    return F.round(F.sum(expr), round_to).cast("double")
