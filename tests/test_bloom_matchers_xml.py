"""Bloom membership, string matchers, XML source, bucketed joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from commoncrawl_crawler_spark.functions import matchers
from commoncrawl_crawler_spark.operators import bloom
from commoncrawl_crawler_spark.sources import bucketed, load_table, xmlsource


# ---- bloom -----------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    history = spark.range(0, 1000).select(F.col("id").alias("key"))
    kept = bloom.bloom_keep_seen(history, history, "key")
    assert kept.count() == 1000  # every member must pass


def test_bloom_drop_seen_fp_rate_bounded(spark):
    history = spark.range(0, 1000).select(F.col("id").alias("key"))
    new = spark.range(1000, 3000).select(F.col("id").alias("key"))
    survived = bloom.bloom_drop_seen(new, history, "key", fpp=0.01).count()
    # 2000 new keys; FP drop rate should be near 1%, assert < 5%
    assert survived >= 1900


def test_bloom_deterministic(spark):
    history = spark.range(0, 500).select(F.col("id").alias("key"))
    b1 = bloom.build_bloom(history, "key")
    b2 = bloom.build_bloom(history, "key")
    assert b1.bits == b2.bits and b1.k == b2.k


def test_bloom_merge_is_driver_memory_bounded(spark):
    # 32 input partitions must NOT mean 32 full bitmaps on the driver:
    # the executor-side word merge collects at most m/8 bytes of
    # payload total, independent of partition count, and partition
    # count must not change the result either
    history = spark.range(0, 2000).repartition(32).select(F.col("id").alias("key"))
    m_bits, k = bloom.optimal_params(2000, 0.01)
    rows = bloom._word_shards(history, "key", m_bits, k).collect()
    assert len(rows) * 8 <= m_bits // 8
    assert len({r["word_id"] for r in rows}) == len(rows)  # one row/word
    b_many = bloom.build_bloom(history, "key", expected_items=2000)
    b_one = bloom.build_bloom(history.coalesce(1), "key", expected_items=2000)
    assert b_many.bits == b_one.bits


def test_bloom_distributed_probe_equals_closure_probe(spark):
    # the word-shard join probe and the in-closure numpy probe compute
    # the SAME k bit indexes over the SAME merged bitmap, so their
    # survivor sets must be identical (including false positives)
    history = spark.range(0, 1000).select(F.col("id").alias("key"))
    new = spark.range(500, 2500).select(F.col("id").alias("key"))
    closure = {
        r["key"]
        for r in bloom.bloom_drop_seen(
            new, history, "key", distributed=False
        ).collect()
    }
    dist = {
        r["key"]
        for r in bloom.bloom_drop_seen(
            new, history, "key", distributed=True
        ).collect()
    }
    assert closure == dist
    kept = bloom.bloom_keep_seen(history, history, "key", distributed=True)
    assert kept.count() == 1000  # no false negatives on the join path


def test_bloom_auto_dispatch_by_filter_size(spark, monkeypatch):
    # above DRIVER_FILTER_MAX_BYTES the probe must auto-select the
    # word-shard join (no Bloom object built on the driver)
    history = spark.range(0, 500).select(F.col("id").alias("key"))
    new = spark.range(400, 700).select(F.col("id").alias("key"))

    def _forbid(*a, **kw):
        raise AssertionError("driver-side filter built above size ceiling")

    monkeypatch.setattr(bloom, "DRIVER_FILTER_MAX_BYTES", 0)
    monkeypatch.setattr(bloom, "build_bloom", _forbid)
    out = bloom.bloom_drop_seen(new, history, "key")  # must not raise
    assert 90 <= out.count() <= 200  # ~100 unseen keys survive


def test_bloom_fpp_forwarded(spark):
    # a looser fpp must produce a smaller filter through the public
    # drop/keep wrappers (regression: fpp was silently ignored)
    history = spark.range(0, 1000).select(F.col("id").alias("key"))
    m_tight, _ = bloom.optimal_params(1000, 0.001)
    m_loose, _ = bloom.optimal_params(1000, 0.2)
    assert m_loose < m_tight
    b = bloom.build_bloom(history, "key", fpp=0.2)
    assert len(b.bits) == m_loose // 8


# ---- matchers --------------------------------------------------------


def test_prefix_suffix_matchers(spark):
    df = spark.createDataFrame(
        [("http://a.com/x",), ("https://b.org/y",), ("ftp://c.net/z",)],
        "url string",
    )
    out = df.select(
        "url",
        matchers.matches_any_prefix(F.col("url"), ["http://", "https://"]).alias(
            "is_http"
        ),
        matchers.matches_any_suffix(F.col("url"), ["/x", "/z"]).alias("xz"),
    ).collect()
    assert [r["is_http"] for r in out] == [True, True, False]
    assert [r["xz"] for r in out] == [True, False, True]


def test_longest_prefix_match_trie_semantics(spark):
    df = spark.createDataFrame([("abcde",), ("abx",), ("zzz",)], "s string")
    out = df.select(
        matchers.longest_prefix_match(F.col("s"), ["a", "ab", "abcd"]).alias("m")
    ).collect()
    assert [r["m"] for r in out] == ["abcd", "ab", None]


def test_domain_suffix_match(spark):
    df = spark.createDataFrame(
        [("blog.example.com",), ("example.com",), ("notexample.com",)],
        "host string",
    )
    out = df.select(
        matchers.domain_suffix_match(F.col("host"), ["example.com"]).alias("m")
    ).collect()
    assert [r["m"] for r in out] == [True, True, False]


# ---- xml source ------------------------------------------------------


def test_xml_roundtrip(spark, tmp_path, sf_smoke):
    docs = (
        load_table(spark, "documents", sf_smoke)
        .limit(50)
        .select(
            F.col("doc_id").alias("page_id"),
            F.concat(F.lit("T<"), F.col("source"), F.lit(">&")).alias("title"),
            F.col("text"),
        )
    )
    n = xmlsource.write_xml_pages(docs, str(tmp_path / "xml"))
    assert n == 50
    back = xmlsource.read_xml_pages(spark, str(tmp_path / "xml"))
    got = {r["page_id"]: (r["title"], r["text"]) for r in back.collect()}
    want = {r["page_id"]: (r["title"], r["text"]) for r in docs.collect()}
    assert got == want  # escaping roundtrips, including <, >, &


# ---- bucketed join ---------------------------------------------------


def test_bucketed_join_is_shuffle_free(spark, tmp_path, sf_smoke):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, "orders", sf_smoke)
        customer = load_table(spark, "customer", sf_smoke)
        bucketed.write_bucketed(
            orders.withColumnRenamed("o_custkey", "custkey"),
            "t_orders_b",
            "custkey",
        )
        bucketed.write_bucketed(
            customer.withColumnRenamed("c_custkey", "custkey"),
            "t_customer_b",
            "custkey",
        )
        joined = bucketed.bucketed_join(spark, "t_orders_b", "t_customer_b", "custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == orders.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_incremental_merge_bucketed_is_shuffle_free(spark, tmp_path, sf_smoke):
    """The nightly CrawlDB merge posture at 100 TB: previous mergeDB
    and the delta both bucketed on key -> the full-outer fold joins
    with no Exchange, and matches the unbucketed incremental merge."""
    from commoncrawl_crawler_spark.operators import crawldb

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        events = load_table(spark, "events", sf_smoke)
        typed = crawldb.typed_records_from_events(events)
        old = typed.filter("record_id % 2 = 0")
        new = typed.filter("record_id % 2 = 1")
        prev_merged = crawldb.merge_crawldb(old)
        delta_merged = crawldb.merge_crawldb(new)
        bucketed.write_bucketed(prev_merged, "t_prev_m", "key")
        bucketed.write_bucketed(delta_merged, "t_delta_m", "key")

        folded = crawldb.incremental_merge_bucketed(spark, "t_prev_m", "t_delta_m")
        body = folded._jdf.queryExecution().executedPlan().toString()
        # the final orderBy's rangepartitioning Exchange is inherent to a
        # global sort; the join itself must not hash-shuffle either side
        assert "Exchange hashpartitioning" not in body, body[:2000]

        want = {tuple(r) for r in crawldb.incremental_merge(prev_merged, new).collect()}
        got = {tuple(r) for r in folded.collect()}
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_prev_m")
        spark.sql("DROP TABLE IF EXISTS t_delta_m")


def test_bloom_bit_row_build_equals_bitmap_build(spark, monkeypatch):
    """The no-task-bitmap (per-bit-row) build path must produce the
    exact same merged word table -- and therefore the same survivor
    set -- as the local-bitmap path."""
    history = spark.range(0, 1500).select(F.col("id").alias("key"))
    new = spark.range(1000, 3000).select(F.col("id").alias("key"))
    m_bits, k = bloom.optimal_params(1500, 0.01)
    bitmap_words = {
        (r["word_id"], r["w"])
        for r in bloom._word_shards(history, "key", m_bits, k).collect()
    }
    monkeypatch.setattr(bloom, "TASK_BITMAP_MAX_BYTES", 0)
    bitrow_words = {
        (r["word_id"], r["w"])
        for r in bloom._word_shards(history, "key", m_bits, k).collect()
    }
    assert bitmap_words == bitrow_words
    survivors = bloom.bloom_drop_seen(new, history, "key", distributed=True)
    assert 1400 <= survivors.count() <= 1500  # ~1500 new keys survive
