"""Physical-plan census over every gated query.

Records, per `__spark_entry__.queries()` entry, the plan features the
100 TB posture cares about: exchange (shuffle) count, join operators
by type, cartesian/nested-loop presence, and whole-stage-codegen
span count. The output (`PLANS.json`) is a reviewable artifact — a
diff between rounds shows exactly which query gained a shuffle or
lost a broadcast, before any benchmark moves.

Usage:
    PYTHONPATH=/root/repo python tools/plan_census.py \
        /root/testdata/sf0.001 [out.json]

Scope and caveats, stated precisely:
- Streaming gates (`stream_*`) are SKIPPED: their builders drain an
  availableNow query and return the memory sink, so the "plan" would
  be just the sink scan — zero visibility into the streaming join
  itself (those joins are covered by dedicated parity/plan tests in
  tests/test_plans_streaming.py). Skipped rows carry a `skipped`
  marker so absence is visible, not silent.
- A few batch builders have side effects (archive/multi-sink gates
  write scratch files while constructing the frame); the census
  tolerates that — "plan-only" refers to the RETURNED frame never
  being executed.
- `shuffle_exchanges` counts hash/range/single-partition exchanges
  only; BroadcastExchange and ReusedExchange are separate columns,
  so an SMJ→broadcast conversion shows as -1 shuffle +1 broadcast
  instead of netting out to zero.
- Under AQE the pre-execution plan is `AdaptiveSparkPlan
  isFinalPlan=false`, so codegen_spans undercounts (codegen stages
  materialize per query stage at runtime) — treat it as a floor.
- Gates that `localCheckpoint` an intermediate (the robots rule
  table) truncate lineage, so the census sees only the post-
  checkpoint half; the pre-checkpoint parse plan is pinned by its
  own operator-level test.
"""

from __future__ import annotations

import json
import re
import sys


FEATURES = {
    "shuffle_exchanges": r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
    "broadcast_exchanges": r"BroadcastExchange",
    "reused_exchanges": r"ReusedExchange",
    "broadcast_hash_joins": r"BroadcastHashJoin",
    "sort_merge_joins": r"SortMergeJoin",
    "shuffled_hash_joins": r"ShuffledHashJoin",
    "broadcast_nested_loop_joins": r"BroadcastNestedLoopJoin",
    "cartesian_products": r"CartesianProduct",
    "takeordered": r"TakeOrderedAndProject",
}


def census(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry

    out = {}
    for name, fn in entry.queries().items():
        if name.startswith("stream_"):
            out[name] = {"skipped": "streaming drain (see parity tests)"}
            continue
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            row = {
                k: len(re.findall(pat, plan)) for k, pat in FEATURES.items()
            }
            # executedPlan().toString() marks codegen stages as
            # '*(n) Op' per operator line: count distinct stage ids
            row["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
            out[name] = row
        except Exception as ex:  # pragma: no cover - census must not die
            out[name] = {"error": str(ex)[:200]}
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS.json"
    from commoncrawl_crawler_spark.session import build_session

    spark = build_session(shuffle_partitions=8)
    try:
        rows = census(spark, sf_dir)
    finally:
        spark.stop()
    counted = {
        n: r
        for n, r in rows.items()
        if "error" not in r and "skipped" not in r
    }
    totals = {
        k: sum(r.get(k, 0) for r in counted.values())
        for k in list(FEATURES) + ["codegen_spans"]
    }
    errors = [n for n, r in rows.items() if "error" in r]
    skipped = [n for n, r in rows.items() if "skipped" in r]
    doc = {
        "sf_dir": sf_dir,
        "totals": totals,
        "errors": errors,
        "skipped": skipped,
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({"totals": totals, "n": len(rows), "errors": errors}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
