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


def test_cluster_representatives_keep_best(spark):
    """The representative is the highest-token member (doc_id break);
    singletons represent themselves with size 1."""
    from pyspark.sql import Row
    from commoncrawl_crawler_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon"),
            Row(doc_id=3, text="unrelated totally different content"),
        ]
    )
    clusters = spark.createDataFrame(
        [Row(doc_id=1, cluster=1), Row(doc_id=2, cluster=1), Row(doc_id=3, cluster=3)]
    )
    out = {
        r.cluster: (r.rep_doc_id, r.rep_tokens, r.cluster_size)
        for r in dedup.cluster_representatives(docs, clusters=clusters).collect()
    }
    assert out[1] == (2, 5, 2)  # longer member wins
    assert out[3] == (3, 4, 1)  # singleton represents itself
