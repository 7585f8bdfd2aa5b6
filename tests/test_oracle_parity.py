"""Every queries() entry with an oracle must hash-match DuckDB at sf0.01.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .oracle_harness import compare_query

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_correct, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    res = compare_query(spark, sf_correct, QUERIES[name], ORACLES[name])
    assert res["rows_match"], res
    assert res["cols_match"], res
    assert res["values_match"], res


def test_all_queries_run_smoke(spark, sf_smoke):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_smoke)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
