"""A/B harness: run named gates (build + noop action) in THIS process
with optional SparkSession conf overrides, print one JSON line per
gate and a total. Run one variant per process; alternate processes
for A/B so JVM warmup and box drift cancel.

Usage:
  python tools/ab_gate.py [--sf SF_DIR] [--passes N] \
      [--conf k=v ...] [--cpus N] name [name ...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = args.cpus
    from commoncrawl_crawler_spark.session import build_session

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = build_session(app_name="ab-gate", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    from commoncrawl_crawler_spark.sources import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, t, args.sf).count()
        except Exception:
            pass

    out: dict[str, dict] = {}
    for _p in range(args.passes):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, args.sf)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            rec = out.setdefault(name, {"build": [], "noop": [], "wall": []})
            rec["build"].append(round(t1 - t0, 3))
            rec["noop"].append(round(t2 - t1, 3))
            rec["wall"].append(round(t2 - t0, 3))
            gc.collect()
    for name, rec in out.items():
        rec["min_wall"] = min(rec["wall"])
        print(json.dumps({"name": name, **rec}))
    total_min = sum(r["min_wall"] for r in out.values())
    print(json.dumps({"total_min_wall": round(total_min, 3), "conf": extra}))
    spark.stop()


if __name__ == "__main__":
    main()
