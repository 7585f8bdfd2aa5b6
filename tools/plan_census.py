"""Physical-plan census over every gated query.

Records, per `__spark_entry__.queries()` entry, the plan features the
100 TB posture cares about: exchange (shuffle) count, join operators
by type, cartesian/nested-loop presence, and whole-stage-codegen
span count. The output (`PLANS.json`) is a reviewable artifact — a
diff between rounds shows exactly which query gained a shuffle or
lost a broadcast, before any benchmark moves.

The census EXECUTES each gate (collect at the census scale factor)
and reads the post-execution plan: under AQE the pre-execution string
is `isFinalPlan=false` — it re-prints shared subtrees once per
consumer and knows nothing about runtime exchange reuse, so it
overstated the iterative/graph tier by ~10x (round-4 census showed
graph_clustering_coeff at 120 "shuffles" for a query whose runtime
shape is a handful of stages over the checkpointed shared edge
table). Executed-plan rows count ShuffleQueryStage/ReusedExchange
etc. — the stages that actually ran. The pre-execution count is kept
per query as `declared_shuffle_exchanges` so both views stay
diffable.

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
- `shuffle_stages_run` / `broadcast_stages_run` are the HEADLINE
  metrics: distinct ShuffleQueryStage/BroadcastQueryStage ids in the
  final plan = stages that actually executed. The textual pattern
  counts (`shuffle_exchanges`, join operators) re-count a shared
  subtree once per reference in the printed tree — kept for
  diffability, read them as upper bounds.
- `shuffle_exchanges` counts hash/range/single-partition exchanges
  only; BroadcastExchange and ReusedExchange are separate columns,
  so an SMJ→broadcast conversion shows as -1 shuffle +1 broadcast
  instead of netting out to zero.
- `existing_rdd_scans` counts checkpoint-table scans: a shared-stage
  consumer (graph/dedup tiers) re-deriving lineage instead of
  reading the per-(session, sf) materialization would show 0 here
  and a blown-up shuffle count — tests/test_plan_quality.py asserts
  the shared-stage consumers keep >= 1.
- Iterative gates (pagerank/CC/HITS) run multiple jobs whose
  intermediate checkpoints are NOT in the final returned frame's
  plan; their census row is the final assembly only, by design — the
  loop-body shape is pinned by operator tests.
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

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
    "existing_rdd_scans": r"Scan ExistingRDD",
}


def _features(plan: str) -> dict:
    row = {k: len(re.findall(pat, plan)) for k, pat in FEATURES.items()}
    # codegen stages print as '*(n) Op' per operator line: count
    # distinct stage ids
    row["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
    # the honest runtime metric: DISTINCT query stages executed.
    # Final-plan toString re-prints a shared subtree at every point
    # it is referenced, so raw pattern counts overstate shared-lineage
    # queries ~10x; the stage ids are unique per materialized stage.
    row["shuffle_stages_run"] = len(
        set(re.findall(r"ShuffleQueryStage (\d+)", plan))
    )
    row["broadcast_stages_run"] = len(
        set(re.findall(r"BroadcastQueryStage (\d+)", plan))
    )
    return row


def _census_streaming(spark, sf_dir: str, fn) -> dict:
    """Micro-batch plan census for a stream_* gate: run the gate (the
    builder drains an availableNow query), then read the executed
    last-batch plans the drain helpers recorded
    (streaming.jobs.LAST_BATCH_PLANS) and aggregate their features.
    The returned row carries the same columns as a batch gate plus
    the number of drained queries observed, so the zero-cartesian /
    allowlisted-BNLJ invariants sweep streaming plans too."""
    from commoncrawl_crawler_spark.streaming import jobs as sj

    sj.LAST_BATCH_PLANS.clear()
    df = fn(spark, sf_dir)
    df.collect()
    plans = dict(sj.LAST_BATCH_PLANS)
    if not plans:
        return {"error": "gate drained no streaming query"}
    row = None
    for plan in plans.values():
        feats = _features(plan)
        if row is None:
            row = feats
        else:
            for k, v in feats.items():
                row[k] += v
    row["streaming_queries_drained"] = len(plans)
    row["declared_shuffle_exchanges"] = row["shuffle_exchanges"]
    # micro-batch final plans do not run AQE query stages; the
    # textual exchange count IS the per-batch stage count
    row["shuffle_stages_run"] = row["shuffle_exchanges"]
    row["broadcast_stages_run"] = row["broadcast_exchanges"]
    row["stateful_operators"] = sum(
        len(re.findall(
            r"StateStore(?:Save|Restore)|FlatMapGroupsWithState"
            r"|FlatMapGroupsInPandasWithState|TransformWithState"
            r"|SessionWindowStateStore|StreamingDeduplicate"
            r"|StreamingSymmetricHashJoin|StreamingGlobalLimit", p))
        for p in plans.values()
    )
    return row


def census(spark, sf_dir: str, execute: bool = True) -> dict:
    import __spark_entry__ as entry

    out = {}
    for name, fn in entry.queries().items():
        if name.startswith("stream_"):
            try:
                out[name] = _census_streaming(spark, sf_dir, fn)
            except Exception as ex:  # pragma: no cover
                out[name] = {"error": str(ex)[:200]}
            continue
        try:
            df = fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            declared = qe.executedPlan().toString()
            if execute:
                # collect() drives THIS QueryExecution to completion;
                # AQE finalizes in place, so re-printing now yields
                # the isFinalPlan=true plan with real stage reuse
                df.collect()
                plan = qe.executedPlan().toString()
            else:
                plan = declared
            row = _features(plan)
            row["declared_shuffle_exchanges"] = len(
                re.findall(FEATURES["shuffle_exchanges"], declared)
            )
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
        for k in list(FEATURES)
        + ["codegen_spans", "shuffle_stages_run", "broadcast_stages_run"]
    }
    errors = [n for n, r in rows.items() if "error" in r]
    skipped = [n for n, r in rows.items() if "skipped" in r]
    doc = {
        "sf_dir": sf_dir,
        "mode": "executed (final AQE plans)",
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
