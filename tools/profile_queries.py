"""Per-query phase profiler (guide section 1: measure first).

For each named query (default: all), decompose wall time into
  build    -- Python-side DataFrame construction (plan building)
  noop     -- df.write.format('noop') (full compute, no transfer)
  collect  -- df.collect() (the bench's timed action: compute +
              row transfer to the Python driver)
and optionally dump .explain('formatted') to plans/r09/<name>_<tag>.txt.

Usage:
  PYTHONPATH=/root/repo python tools/profile_queries.py [--plans TAG]
      [--sf SF_DIR] [--passes N] [name ...]

Prints one JSON line per query to stdout (stderr carries Spark noise).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dump plans with this tag")
    ap.add_argument("--no-collect", action="store_true")
    args = ap.parse_args()

    from commoncrawl_crawler_spark.session import build_session

    spark = build_session(app_name="ccspark-profile")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args.names or sorted(qs)

    from commoncrawl_crawler_spark.sources import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, t, args.sf).count()
        except Exception:
            pass

    plans_dir = REPO / "plans" / "r09"
    if args.plans:
        plans_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        if name not in qs:
            print(json.dumps({"name": name, "err": "unknown"}))
            continue
        rec: dict = {"name": name}
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"profile:{name}:p{p}")
            t0 = time.monotonic()
            df = qs[name](spark, args.sf)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            if not args.no_collect:
                df2 = qs[name](spark, args.sf)
                t3 = time.monotonic()
                rows = len(df2.collect())
                t4 = time.monotonic()
                rec["rows"] = rows
                rec.setdefault("collect", []).append(round(t4 - t3, 3))
            rec.setdefault("build", []).append(round(t1 - t0, 3))
            rec.setdefault("noop", []).append(round(t2 - t1, 3))
        if args.plans:
            df = qs[name](spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (plans_dir / f"{name}_{args.plans}.txt").write_text(txt)
            rec["plan"] = f"plans/r09/{name}_{args.plans}.txt"
        print(json.dumps(rec), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
