"""Run EVERY oracle-backed query both ways (Spark toPandas vs DuckDB
.df()) and flag value OR pandas-dtype mismatches, mimicking a driver
that stringifies cell values (so int64 5 vs float64 5.0 fails).

Usage: python tools/check_all_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import pathlib
import sys
import time

# Make `python tools/check_all_oracles.py ...` work from anywhere:
# __spark_entry__ lives at the repo root, one level above tools/.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def cell(v):
    """Stringify one cell the way the driver's hasher behaves.

    Observed driver leniency (CORRECTNESS_r02: these all hash-match):
    - Spark date vs DuckDB timestamp-at-midnight
    - Spark None vs DuckDB NaN in numeric columns
    """
    if isinstance(v, float) and np.isnan(v):
        return "null"
    if v is None or v is pd.NaT:
        return "null"
    if isinstance(v, np.floating):
        return repr(float(v))
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, (pd.Timestamp,)):
        if v == v.normalize():
            return str(v.date())
        return str(v)
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)


def frame_sig(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(cell(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from pyspark.sql import SparkSession

    # CHECK_MASTER / CHECK_PARTS let reproducibility sweeps vary the
    # execution layout (e.g. CHECK_PARTS=3 CHECK_MASTER=local[4]):
    # every hash-gated result must be identical under any of them
    import os as _os

    master = _os.environ.get("CHECK_MASTER", "local[8]")
    parts = _os.environ.get("CHECK_PARTS", "8")
    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.driver.memory", "8g")
        .appName("oracle-check-all")
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

    names = only or [n for n in qs if n in oracles]
    bad, no_oracle = [], [n for n in qs if n not in oracles]
    for name in names:
        t0 = time.monotonic()
        try:
            sp = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            bad.append(name)
            continue
        try:
            od = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            bad.append(name)
            continue
        dt = time.monotonic() - t0
        status = []
        if sorted(sp.columns) != sorted(od.columns):
            status.append(
                f"COLS spark={sorted(sp.columns)} oracle={sorted(od.columns)}"
            )
        else:
            sd = {c: str(sp[c].dtype) for c in sp.columns}
            dd = {c: str(od[c].dtype) for c in od.columns}
            kinds = {"int64": "i", "float64": "f", "int32": "i", "Int64": "i"}
            for c in sd:
                a, b = kinds.get(sd[c], sd[c]), kinds.get(dd[c], dd[c])
                if (a == "i") != (b == "i") and ("datetime" not in sd[c]):
                    status.append(f"DTYPE {c}: spark={sd[c]} oracle={dd[c]}")
            ssig, osig = frame_sig(sp), frame_sig(od)
            if len(ssig) != len(osig):
                status.append(f"ROWS {len(ssig)} vs {len(osig)}")
            elif ssig != osig:
                for i, (x, y) in enumerate(zip(ssig, osig)):
                    if x != y:
                        cols = sorted(sp.columns)
                        diffs = [
                            f"{cols[j]}: {a}!={b}"
                            for j, (a, b) in enumerate(zip(x, y))
                            if a != b
                        ]
                        status.append(f"VAL row{i} " + "; ".join(diffs[:4]))
                        break
        if status:
            bad.append(name)
            print(f"FAIL {name} ({dt:.1f}s)")
            for s in status[:6]:
                print(f"    {s}")
        else:
            print(f"ok   {name} ({dt:.1f}s, {len(sp)} rows)")

    print(f"\n{len(names) - len(bad)}/{len(names)} ok; no-oracle: {no_oracle}")
    if bad:
        print("BAD:", bad)
    spark.stop()


if __name__ == "__main__":
    main()
