"""Two-stage simhash dedupe: planted near-dups cluster together."""

from __future__ import annotations

from pyspark.sql import functions as F

from commoncrawl_crawler_spark.operators import dedup


def test_planted_near_dups_share_cluster(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base + "zz"  # measured simhash hamming 2 (within C(6,3) k<=3)
    far = "completely different content about spark engines " * 8
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.simhash_clusters(docs, hamming_k=3).collect()
    }
    assert got[1] == got[2] == got[4] == 1  # near-dups united, min id
    assert got[3] == 3  # singleton maps to itself
    assert len(got) == 4  # every doc present exactly once


def test_clusters_cover_all_docs_at_smoke(spark, sf_smoke):
    from commoncrawl_crawler_spark.sources import load_table

    docs = load_table(spark, "documents", sf_smoke)
    clusters = dedup.simhash_clusters(docs)
    assert clusters.count() == docs.count()
    # cluster id is always the component minimum -> cluster <= doc_id
    assert clusters.filter(F.col("cluster") > F.col("doc_id")).count() == 0
