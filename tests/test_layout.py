"""Z-order clustering, compaction planning, CIDR longest-prefix match.

The layout operators' value is their physical shape, so these tests
assert plans (codegen'd interleave, no global window, broadcast
equi-joins) alongside the arithmetic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commoncrawl_crawler_spark.operators import filters, layout


def _morton2(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y",
            layout.zorder_key([F.col("x"), F.col("y")]).alias("z"),
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton2(x, y)


def test_zorder_key_locality_property(spark):
    """Sorting by z-key keeps both dimensions range-bounded per
    contiguous slice -- the data-skipping property: each quarter of
    the sorted 16x16 grid is exactly one 8x8 quadrant."""
    grid = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(grid, "x long, y long")
    rows = (
        df.select("x", "y", layout.zorder_key([F.col("x"), F.col("y")], bits=4).alias("z"))
        .orderBy("z")
        .collect()
    )
    quarter = rows[: len(rows) // 4]
    assert max(r.x for r in quarter) - min(r.x for r in quarter) <= 7
    assert max(r.y for r in quarter) - min(r.y for r in quarter) <= 7


def test_zorder_key_overflow_guard():
    with pytest.raises(ValueError, match="overflows"):
        layout.zorder_key([F.lit(1)] * 4, bits=16)


def test_zorder_plan_stays_in_codegen(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    plan = (
        df.select(layout.zorder_key([F.col("x"), F.col("y")]).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # "*(n)" prefixes mark WholeStageCodegen spans in toString() form
    assert "*(1) Project" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_compaction_plan_binning_and_large_files(spark):
    listing = spark.createDataFrame(
        [
            ("a", "f1", 10),
            ("a", "f2", 10),
            ("a", "f3", 10),
            ("a", "f4", 100),  # oversized: its own bin
            ("a", "f5", 10),
            ("b", "f1", 25),
        ],
        "prefix string, path string, size_bytes long",
    )
    plan = {
        (r.prefix, r.path): r.bin
        for r in layout.compaction_plan(listing, target_bytes=25).collect()
    }
    # exclusive running sums: 0,10,20,30,130 -> bins 0,0,0,1,5
    assert plan[("a", "f1")] == 0 and plan[("a", "f3")] == 0
    assert plan[("a", "f4")] == 1
    assert plan[("a", "f5")] == 5  # after the big file, a fresh bin
    assert plan[("b", "f1")] == 0  # prefixes are independent


def test_compaction_no_global_window(spark):
    listing = layout.documents_file_listing(
        spark.createDataFrame(
            [(i, "t", "en", f"src{i % 3}", 1) for i in range(30)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).select("doc_id", "text", "lang", "source", "n_chars")
    )
    plan = (
        layout.compaction_plan(listing)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Window operator must carry a partition spec
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "prefix" in line, f"unpartitioned window: {line}"


def test_cidr_longest_prefix_semantics(spark):
    blocks = spark.createDataFrame(
        [
            (0, 16),          # 0.0.0.0/16    -> [0, 65536)
            (0, 24),          # 0.0.0.0/24    -> [0, 256), nested
            (1 << 16, 24),    # 0.1.0.0/24
        ],
        "cidr_base long, prefix_len int",
    )
    df = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 1 << 16), (4, (1 << 17) + 5)],
        "id long, ip long",
    )
    got = {
        r.id: (r.cidr_base, r.prefix_len)
        for r in filters.cidr_longest_prefix_match(df, blocks).collect()
    }
    assert got[1] == (0, 24)          # nested: /24 beats /16
    assert got[2] == (0, 16)          # outside the /24, inside /16
    assert got[3] == (1 << 16, 24)
    assert got[4] == (None, None)     # unmatched


def test_cidr_plan_is_broadcast_equijoin_no_corpus_shuffle(spark):
    blocks = spark.createDataFrame(
        [(0, 16), (1 << 16, 24)], "cidr_base long, prefix_len int"
    )
    df = spark.createDataFrame([(1, 5)], "id long, ip long")
    plan = (
        filters.cidr_longest_prefix_match(df, blocks)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_consistent_hash_elasticity(spark):
    """The consistent-hashing contract: growing the worker pool by
    one moves only a minority of keys (vs ~all keys under modulo),
    assignments are deterministic, and every worker gets traffic."""
    keys = spark.createDataFrame(
        [(f"host{i}.example.com",) for i in range(400)], "host string"
    )
    a = {
        r.host: r.worker
        for r in layout.consistent_hash_assign(keys, n_workers=8).collect()
    }
    b = {
        r.host: r.worker
        for r in layout.consistent_hash_assign(keys, n_workers=9).collect()
    }
    moved = sum(1 for h in a if a[h] != b[h])
    # expectation ~ 1/9 of keys; modulo resharding would move ~ 8/9
    assert moved < 400 * 0.35, moved
    assert len(set(a.values())) == 8 and len(set(b.values())) == 9
    # deterministic across invocations
    a2 = {
        r.host: r.worker
        for r in layout.consistent_hash_assign(keys, n_workers=8).collect()
    }
    assert a == a2


def test_consistent_hash_plan_is_broadcast_only(spark):
    keys = spark.createDataFrame([("h1",)], "host string")
    plan = (
        layout.consistent_hash_assign(keys)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the non-equi successor join is a BNLJ whose BROADCAST side is
    # the bounded ring (allowlisted pattern); the corpus side must
    # never sort-merge or shuffle-hash join
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_cidr_rejects_misaligned_base(spark):
    import pytest as _pt

    from commoncrawl_crawler_spark.operators import filters

    df = spark.createDataFrame([(1, 42)], "id long, ip long")
    # 10.0.0.1/24 -- host bit set
    blocks = spark.createDataFrame(
        [((10 << 24) | 1, 24)], "cidr_base long, prefix_len int"
    )
    with _pt.raises(ValueError, match="prefix-aligned"):
        filters.cidr_longest_prefix_match(df, blocks).collect()


def test_cidr_duplicate_blocklist_rows_do_not_multiply(spark):
    from commoncrawl_crawler_spark.operators import filters

    df = spark.createDataFrame(
        [(1, (10 << 24) | 5)], "id long, ip long"
    )
    blocks = spark.createDataFrame(
        [(10 << 24, 8), (10 << 24, 8), (10 << 24, 8)],
        "cidr_base long, prefix_len int",
    )
    rows = filters.cidr_longest_prefix_match(df, blocks).collect()
    assert len(rows) == 1
    assert rows[0]["prefix_len"] == 8
