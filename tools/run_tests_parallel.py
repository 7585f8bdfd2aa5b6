"""Two-tier test running: the full suite, in parallel processes.

The suite holds 650+ Spark tests sharing one session-scoped local
JVM; serial wall time is 20-40 min (TESTRUN_NOTE_r05s5.txt). This
runner keeps the suite UNCHANGED and splits the test FILES across K
independent pytest processes -- each gets its own SparkSession (and
JVM), so there is no cross-process state to corrupt; with local[32]
and K=4 every process still sees plenty of cores.

    PYTHONPATH=/root/repo python tools/run_tests_parallel.py        # K=4
    PYTHONPATH=/root/repo python tools/run_tests_parallel.py -k 6

Files are balanced by size (a stable proxy for runtime here: the big
files are big because they hold many Spark tests). Exit code is
non-zero iff any shard failed; each shard's tail is echoed so
failures stay diagnosable. The serial invocation
(`python -m pytest tests/ -x -q`) remains the canonical gate.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def shard_files(k: int) -> list[list[str]]:
    files = sorted(
        (p for p in (REPO / "tests").glob("test_*.py")),
        key=lambda p: -p.stat().st_size,
    )
    shards: list[list[str]] = [[] for _ in range(k)]
    weights = [0] * k
    for p in files:  # greedy longest-processing-time balance
        i = weights.index(min(weights))
        shards[i].append(str(p))
        weights[i] += p.stat().st_size
    return [s for s in shards if s]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", type=int, default=4, help="process count")
    args = ap.parse_args()

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    # split the core budget across shards: K JVMs each grabbing
    # local[32] would oversubscribe a 32-core box ~Kx and crash
    # Python workers under memory/scheduler pressure (the flake
    # class recorded in round 5); build_session honors this env var
    if "SPARK_GRAFT_CPUS" not in env:
        env["SPARK_GRAFT_CPUS"] = str(max(4, (os.cpu_count() or 32) // args.k))

    t0 = time.time()
    procs = []
    for i, shard in enumerate(shard_files(args.k)):
        logf = open(f"/tmp/pytest_shard_{i}.log", "w")
        procs.append(
            (
                i,
                shard,
                logf,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", *shard],
                    stdout=logf,
                    stderr=subprocess.STDOUT,
                    cwd=REPO,
                    env=env,
                ),
            )
        )
    rc = 0
    for i, shard, logf, p in procs:
        code = p.wait()
        logf.close()
        tail = Path(logf.name).read_text().strip().splitlines()
        print(f"shard {i} ({len(shard)} files) -> exit {code}: "
              f"{tail[-1] if tail else '(no output)'}")
        if code != 0:
            rc = 1
            print("\n".join(tail[-40:]))
    print(f"total wall: {time.time() - t0:.1f}s (exit {rc})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
