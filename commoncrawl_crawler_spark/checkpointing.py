"""Lineage truncation with a scale-appropriate storage backend.

Iterative loops (PageRank, connected components, k-means, BPE merges)
and self-joined sketch tables (LSH candidate pairs) truncate lineage
so plan N does not replay rounds 1..N-1 and sketch UDFs do not run
twice.  `localCheckpoint` pins blocks in executor storage memory --
right for local/bench runs, but on a 1000-executor cluster a table
proportional to corpus size is safer on reliable storage: an executor
loss under localCheckpoint kills the job (the RDD is
non-recomputable), while `checkpoint()` to HDFS/S3 survives it.

`stable_checkpoint(df)` picks per environment: when
SPARK_GRAFT_CHECKPOINT_DIR is set (or the session already has a
checkpoint dir), it uses reliable `checkpoint()`; otherwise
`localCheckpoint()`.  Loops keep their semantics either way --
both return a DataFrame with truncated lineage.

Reference analog: the crawler persisted every intermediate generation
to HDFS between MapReduce jobs (implicit reliable checkpointing);
this module is the explicit opt-in for that durability on Spark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _reliable_dir(df: DataFrame) -> str | None:
    env = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if env:
        return env
    sc = df.sparkSession.sparkContext
    existing = sc.getCheckpointDir()
    return existing if existing else None


def stable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage; reliable when a checkpoint dir is available.

    eager=False defers materialization to the first action (used by
    loops that fold the round's fixpoint probe into the same job).
    Reliable checkpoints: `eager` maps straight through to
    `DataFrame.checkpoint(eager=...)`.
    """
    if os.environ.get("SPARK_GRAFT_NO_CKPT"):
        # plan-inspection escape: boundaries hide the algebraic plan
        # behind a Scan ExistingRDD, so plan-shape tests and full-plan
        # dumps set this to see (and assert on) the real subtree; the
        # executed bench/driver path never sets it
        return df
    target = _reliable_dir(df)
    if target is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if not sc.getCheckpointDir():
        sc.setCheckpointDir(target)
    return df.checkpoint(eager=eager)


def ckpt_eager(df: DataFrame) -> DataFrame:
    """`.transform(ckpt_eager)` drop-in for `.localCheckpoint(eager=True)`."""
    return stable_checkpoint(df, eager=True)


def ckpt_lazy(df: DataFrame) -> DataFrame:
    """`.transform(ckpt_lazy)` drop-in for `.localCheckpoint(eager=False)`."""
    return stable_checkpoint(df, eager=False)
