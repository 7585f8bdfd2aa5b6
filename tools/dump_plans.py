"""Dump .explain("formatted") for named queries to <outdir>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <outdir> <tag> <name> [name ...]

Run from any checkout (the repo root containing __spark_entry__.py is
derived from this file's location), so before/after plans can be
produced from a git worktree of the baseline commit and the working
tree respectively.
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from commoncrawl_crawler_spark.session import build_session  # noqa: E402


def main() -> None:
    outdir = pathlib.Path(sys.argv[1])
    tag = sys.argv[2]
    names = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session()
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
