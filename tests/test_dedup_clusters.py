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


def _bits(*runs):
    """BitBuilder analog (DeduperUtils.java:966-971): append (value,
    run-length) bit runs MSB-first into a signed 64-bit int."""
    v = 0
    for bit, n in runs:
        for _ in range(n):
            v = (v << 1) | bit
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def test_reference_deduper_golden_vectors(spark):
    """The reference's own SimhashMatcher/SetUnionFinder test case
    (DeduperUtils.java:968-1021): five hand-built simhash keys whose
    pairwise hamming relations force match sets {1000,1001,1002}
    (1000-1002 joined transitively through 1001 even though
    hamming(key1,key3)=6) and {1003,1004} at verify threshold <= 3,
    via C(6,3) banded blocking + union."""
    from pyspark.sql import Row
    from commoncrawl_crawler_spark.functions import hashing
    from commoncrawl_crawler_spark.operators import graph

    key1 = _bits((1, 10), (0, 1), (1, 53))
    key2 = _bits((1, 10), (0, 4), (1, 50))
    key3 = _bits((1, 10), (0, 4), (1, 47), (0, 3))
    key4 = _bits((0, 10), (1, 4), (0, 47), (1, 3))
    key5 = _bits((0, 10), (1, 4), (0, 47), (1, 1), (0, 2))

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    # the reference's seven hamming assertions, verbatim
    assert ham(key1, key2) == 3
    assert ham(key1, key3) != 3
    assert ham(key2, key3) == 3
    assert ham(key1, key4) > 3
    assert ham(key2, key4) > 3
    assert ham(key3, key4) > 3
    assert ham(key4, key5) <= 3

    sh = spark.createDataFrame(
        [
            Row(doc_id=1000, simhash=key1),
            Row(doc_id=1001, simhash=key2),
            Row(doc_id=1002, simhash=key3),
            Row(doc_id=1003, simhash=key4),
            Row(doc_id=1004, simhash=key5),
        ]
    )
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(hashing.simhash_bands_expr(F.col("simhash"))).alias("band"),
    ).select("doc_id", "simhash", "band.pattern", "band.key")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.pattern") == F.col("b.pattern"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("dst"),
            hashing.hamming_distance_expr(
                F.col("a.simhash"), F.col("b.simhash")
            ).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .select("src", "dst")
        .distinct()
    )
    comp = {
        r.node: r.comp for r in graph.connected_components(pairs).collect()
    }
    assert comp[1000] == comp[1001] == comp[1002]
    assert comp[1003] == comp[1004]
    assert comp[1000] != comp[1003]
