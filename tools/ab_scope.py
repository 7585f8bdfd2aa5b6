"""Interleaved in-process A/B of the loopscope mechanism: for each
gate, alternate SPARK_GRAFT_LOOP_SCOPE=off / on across rounds in ONE
process so box-speed phases hit both arms equally. Reports min and
median per arm.

Usage: python tools/ab_scope.py [--sf SF] [--rounds N] name [name ...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from commoncrawl_crawler_spark.session import build_session

    spark = build_session(app_name="ab-scope")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    from commoncrawl_crawler_spark.sources import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, t, args.sf).count()
        except Exception:
            pass

    res: dict[tuple[str, str], list[float]] = {}
    # warm both arms once (unmeasured)
    for arm in ("off", "on"):
        os.environ["SPARK_GRAFT_LOOP_SCOPE"] = arm
        for name in args.names:
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
    for _r in range(args.rounds):
        for arm in ("off", "on"):
            os.environ["SPARK_GRAFT_LOOP_SCOPE"] = arm
            for name in args.names:
                spark.sparkContext.setJobDescription(f"{arm}:{name}")
                t0 = time.monotonic()
                df = qs[name](spark, args.sf)
                df.write.format("noop").mode("overwrite").save()
                res.setdefault((name, arm), []).append(
                    round(time.monotonic() - t0, 3)
                )
                gc.collect()
    os.environ.pop("SPARK_GRAFT_LOOP_SCOPE", None)
    for name in args.names:
        row = {"name": name}
        for arm in ("off", "on"):
            ts = res[(name, arm)]
            row[arm] = {
                "min": min(ts),
                "med": round(statistics.median(ts), 3),
                "all": ts,
            }
        print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
