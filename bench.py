"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Round-7 bench hygiene (round-6 verdict item 5): each query runs
SPARK_GRAFT_BENCH_PASSES times (default 3) in pass-major order (pass 1
all queries, then pass 2, ...) and the reported per-query figure is
the MEDIAN across passes -- first-touch costs (Python worker spawn,
codegen cache) land in pass 1 and box jitter is damped by the median.
A box-control row (`control_sec`) runs a fixed query-surface-
independent workload (hash-agg over a 50M range + a small shuffle)
before the passes, so round-over-round comparisons can normalize out
machine drift instead of re-litigating it.

Optimization-round measurement fix (OPTIMIZATION_r09.md, guide
section 1.4): the timed action is now the built-in NOOP SINK
(`df.write.format("noop")`), which eagerly computes every column of
every row and discards it, instead of `df.collect()`. collect() was
timing py4j row transfer to the Python driver on top of the query --
e.g. graph_link_edges (676k rows at sf0.1) computes in ~0.4s but
collect()s in ~3s, so the old numbers graded pickle bandwidth, not
the engine. The old action is preserved behind
SPARK_GRAFT_BENCH_ACTION=collect, and BENCH_OPT_r09_* files record
runs under both actions for cross-methodology comparability.
gc.collect() runs between queries (outside the timed region) so dead
py4j references from earlier queries are released promptly and
ContextCleaner can unpersist their localCheckpoint blocks.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import time

from commoncrawl_crawler_spark.session import build_session


def _control(spark) -> float:
    """Fixed box-speed probe, independent of the query surface: a
    codegen'd hash aggregate over 50M rows plus a 32-way shuffle."""
    t0 = time.monotonic()
    spark.range(50_000_000).selectExpr(
        "id % 97 AS k", "id * 2654435761 % 1000003 AS v"
    ).groupBy("k").sum("v").collect()
    return round(time.monotonic() - t0, 4)


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
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
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

    control = _control(spark)

    import gc

    action = os.environ.get("SPARK_GRAFT_BENCH_ACTION", "noop")
    samples: dict[str, list[float]] = {name: [] for name in sorted(qs)}
    for _ in range(passes):
        for name in sorted(qs):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            if action == "collect":
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.monotonic() - t0, 4))
            gc.collect()

    times = {
        name: round(statistics.median(ts), 4)
        for name, ts in samples.items()
    }
    total = round(sum(times.values()), 4)
    # Full per-query detail goes to stderr (driver logs); the stdout JSON
    # line must stay under the harness's 2000-char tail buffer or it is
    # truncated and never parsed. Compact encoding + fold the fastest
    # queries into an "other" bucket until the line fits.
    print(
        json.dumps(
            {
                "full_queries": times,
                "passes": {k: v for k, v in samples.items()},
                "control_sec": control,
            }
        ),
        file=sys.stderr,
    )

    def encode(qdict: dict[str, float], folded: int, other: float) -> str:
        payload = {
            "metric": "total_query_wall_sec",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in qdict.items()},
            "sf": sf,
            "n_queries": len(times),
            "n_passes": passes,
            "stat": "median",
            "action": action,
            "control_sec": round(control, 2),
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


