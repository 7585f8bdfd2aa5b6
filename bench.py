"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice per timing convention? No -- once, after
a warmup query primes the JVM/session; per-query time is wall-clock
from action start to `count()`-style materialization (collect of the
small result).
"""

from __future__ import annotations

import json
import os
import re
import time

from commoncrawl_crawler_spark.session import build_session


def main() -> None:
    # The result JSON must be the ONLY line on stdout. The Spark JVM is
    # a child process that inherits fd 1 and writes launcher/ivy/log
    # chatter to it, so a sys.stdout-level redirect is not enough:
    # duplicate the real stdout, then point fd 1 at stderr at the OS
    # level BEFORE the JVM starts.
    import sys

    real_stdout = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = build_session(app_name="ccspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warmup: touch every table once so JVM/classloading/parquet footer
    # reads don't land in the first measured query
    from commoncrawl_crawler_spark.sources import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, t, sf_dir).count()
        except Exception:
            pass

    times: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        df.collect()
        times[name] = round(time.monotonic() - t0, 4)

    total = round(sum(times.values()), 4)
    # Full per-query detail goes to stderr (driver logs); the stdout JSON
    # line must stay under the harness's 2000-char tail buffer or it is
    # truncated and never parsed. Compact encoding + fold the fastest
    # queries into an "other" bucket until the line fits.
    print(json.dumps({"full_queries": times}), file=sys.stderr)

    def encode(qdict: dict[str, float], folded: int, other: float) -> str:
        payload = {
            "metric": "total_query_wall_sec",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in qdict.items()},
            "sf": sf,
            "n_queries": len(times),
        }
        if folded:
            payload["queries"]["other"] = round(other, 2)
            payload["n_folded"] = folded
        return json.dumps(payload, separators=(",", ":"))

    by_time = sorted(times.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = dict(by_time)
    folded, other = 0, 0.0
    line = encode(kept, folded, other)
    while len(line) > 1800 and kept:
        name, t = by_time[len(kept) - 1]
        kept.pop(name)
        folded += 1
        other += t
        line = encode(kept, folded, other)
    os.write(real_stdout, (line + "\n").encode())
    os.close(real_stdout)
    spark.stop()


if __name__ == "__main__":
    main()
