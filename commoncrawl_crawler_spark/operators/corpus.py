"""End-to-end training-corpus build: the composed hygiene pipeline.

One declarative plan that chains the corpus operators a pretraining
data pipeline runs in sequence -- near-dup clustering -> canonical
representative selection -> benchmark decontamination -> quality
floor -> per-source manifest. Each stage is the already-gated
operator (dedup.md5_simhash_clusters / cluster_representatives,
textstats.contamination_check, proven-parity token counting); this
module only composes them, so Catalyst sees ONE plan and can share
scans and prune columns across stages.

Scale shape: the expensive stages (LSH clustering, shingle join) are
each linear with bucket caps as documented on their operators; the
final keep-set intersections are semi/anti joins on doc_id, which AQE
broadcasts (representative and contaminated sets are far smaller than
the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import token_count_expr
from . import dedup, textstats


def corpus_build_manifest(
    documents: DataFrame,
    benchmark_mod: int = 37,
    min_tokens: int = 20,
    hamming_k: int = 3,
    contamination_n: int = 5,
    contamination_min_shared: int = 3,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Per-source manifest (docs, tokens) of the corpus that survives
    the full hygiene chain:

    1. train/benchmark split on doc_id % benchmark_mod,
    2. keep only each near-dup cluster's canonical representative --
       selected among the cluster's TRAIN members (clusters are
       labeled over the full corpus so benchmark near-dups still
       merge sets, but a benchmark doc must never be the reason a
       clean training doc is dropped),
    3. drop documents contaminated by the benchmark split
       (>= min_shared shared n-gram shingles),
    4. drop documents under the min_tokens quality floor.

    `clusters`: optionally inject the (doc_id, cluster) labeling so a
    query server reuses its cached LSH pair table.
    """
    is_bench = F.col("doc_id") % benchmark_mod == 0
    train = documents.filter(~is_bench)
    bench = documents.filter(is_bench)

    if clusters is None:
        clusters = dedup.md5_simhash_clusters(documents, hamming_k=hamming_k)
    reps = dedup.cluster_representatives(train, clusters=clusters).select(
        F.col("rep_doc_id").alias("doc_id")
    )
    contaminated = (
        textstats.contamination_check(
            train,
            bench,
            n=contamination_n,
            min_shared=contamination_min_shared,
        )
        .filter(F.col("contaminated"))
        .select("doc_id")
    )

    kept = (
        train.join(reps, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .select(
            "doc_id",
            "source",
            token_count_expr(F.col("text")).alias("tokens"),
        )
        .filter(F.col("tokens") >= min_tokens)
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("tokens").cast("long")).alias("tokens"),
        )
        .orderBy("source")
    )
