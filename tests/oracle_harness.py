"""Local replica of the driver's correctness gate.

Runs each __spark_entry__.queries() entry on Spark and the matching
oracle_sql() on DuckDB over the same parquet tables, then compares
row count, column-name set, and an order-insensitive value
representation (columns sorted by name, rows sorted, floats
normalized). Used by tests/test_oracle_parity.py so parity breaks
locally before the driver sees them.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from pathlib import Path

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = Path(sf_dir) / f"{name}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["|".join(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark, sf_dir: str, query_fn, sql: str) -> dict:
    sdf = query_fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    con = duckdb_conn(sf_dir)
    res = con.execute(sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()
    con.close()

    result = {
        "spark_rows": len(spark_rows),
        "oracle_rows": len(oracle_rows),
        "rows_match": len(spark_rows) == len(oracle_rows),
        "cols_match": sorted(spark_cols) == sorted(oracle_cols),
        "spark_cols": spark_cols,
        "oracle_cols": oracle_cols,
    }
    if result["rows_match"] and result["cols_match"]:
        a = canonical_rows(spark_cols, spark_rows)
        b = canonical_rows(oracle_cols, oracle_rows)
        result["values_match"] = a == b
        if not result["values_match"]:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            result["first_diffs"] = diffs
    else:
        result["values_match"] = False
    return result
