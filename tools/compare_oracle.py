"""Local replica of the driver's Spark-vs-DuckDB correctness compare.

Runs queries()[name] on a fresh session (mimicking the driver: no
repo-session confs assumed) and oracle_sql()[name] in DuckDB over the
same parquet dir, sorts columns by name and rows by value, and prints
the first differing cells. Usage:

    python tools/compare_oracle.py sf_dir name [name ...]
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import math
import sys

import duckdb


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return repr(v)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("oracle-compare")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    for name in names:
        sdf = qs[name](spark, sf_dir)
        spark_rows = sdf.collect()
        spark_cols = sdf.columns
        ora = con.execute(oracles[name])
        ora_cols = [d[0] for d in ora.description]
        ora_rows = ora.fetchall()

        s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        o_order = sorted(range(len(ora_cols)), key=lambda i: ora_cols[i])
        s_vals = sorted(
            tuple(norm(r[i]) for i in s_order) for r in spark_rows
        )
        o_vals = sorted(tuple(norm(r[i]) for i in o_order) for r in ora_rows)

        print(f"== {name}: spark {len(s_vals)} rows, oracle {len(o_vals)} rows")
        print(f"   spark cols: {sorted(spark_cols)}")
        print(f"   ora cols:   {sorted(ora_cols)}")
        if s_vals == o_vals:
            print("   MATCH")
            continue
        ndiff = 0
        for i, (a, b) in enumerate(zip(s_vals, o_vals)):
            if a != b:
                for j, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(
                            f"   row {i} col {sorted(spark_cols)[j]}: "
                            f"spark={x} oracle={y}"
                        )
                ndiff += 1
                if ndiff >= 8:
                    break
        if len(s_vals) != len(o_vals):
            print(f"   ROW COUNT DIFF {len(s_vals)} vs {len(o_vals)}")
    spark.stop()


if __name__ == "__main__":
    main()
