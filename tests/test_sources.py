"""Source/sink unit tests: archive members, rotation, ingest, sinks."""

from __future__ import annotations

import zlib

import pytest

from pyspark.sql import functions as F

from commoncrawl_crawler_spark.sources import archive, ingest, sinks


def _docs(spark, n=20):
    return spark.createDataFrame(
        [(str(i), f"payload-{i}".encode()) for i in range(n)],
        "key string, payload binary",
    )


def test_archive_roundtrip_preserves_bytes(spark, tmp_path):
    path = str(tmp_path / "arc")
    archive.write_archive(_docs(spark), path)
    back = archive.read_archive(spark, path).collect()
    got = {r["key"]: bytes(r["payload"]) for r in back}
    assert got == {str(i): f"payload-{i}".encode() for i in range(20)}


def test_archive_member_offsets_seekable(spark, tmp_path):
    """Offsets must allow point reads without scanning siblings --
    the ARC property (arcFileOffset metadata, protocol.jr)."""
    path = str(tmp_path / "arc")
    archive.write_archive(_docs(spark, 5).coalesce(1), path)
    rows = archive.read_archive(spark, path).collect()
    for r in rows:
        with open(r["archive_path"].removeprefix("file:"), "rb") as f:
            f.seek(r["member_offset"])
            # one-member decompress (gzip.read() would concatenate
            # every following member into the result)
            d = zlib.decompressobj(wbits=31)
            data = d.decompress(f.read())
        assert data.split(b"\n", 1)[1] == bytes(r["payload"])


def test_archive_rotation_caps_file_size(spark, tmp_path):
    path = str(tmp_path / "arc")
    n_files = archive.write_archive(
        _docs(spark, 50).coalesce(1), path, rotate_bytes=200
    )
    assert n_files > 1  # tiny cap forces rotation


def test_rank_list_skips_junk(spark, tmp_path):
    p = tmp_path / "ranks.tsv"
    p.write_text("# comment\n1\texample.com\nnot-a-rank\tx\n2\tfoo.org\n")
    rows = ingest.read_rank_list(spark, str(p)).orderBy("rank").collect()
    assert [(r["rank"], r["domain"]) for r in rows] == [
        (1, "example.com"),
        (2, "foo.org"),
    ]


def test_failure_log_regex_extract(spark, tmp_path):
    p = tmp_path / "dns.log"
    p.write_text(
        "ERROR example.com 2024-03-01T10:00:00 NXDOMAIN\n"
        "garbage line\n"
        "WARN foo.org 2024-03-02T11:30:00 timeout after 5s\n"
    )
    rows = ingest.read_failure_log(spark, str(p)).orderBy("domain").collect()
    assert len(rows) == 2
    assert rows[0]["level"] == "ERROR" and rows[0]["message"] == "NXDOMAIN"
    assert rows[1]["ts"].month == 3 and rows[1]["ts"].day == 2


def test_multi_sink_columns_pruned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, score long"
    )
    sinks.write_multi_sink(
        df,
        {
            "names": (["id", "name"], str(tmp_path / "names")),
            "scores": (["id", "score"], str(tmp_path / "scores")),
        },
    )
    names = spark.read.parquet(str(tmp_path / "names"))
    assert names.columns == ["id", "name"]
    assert names.count() == 2


def test_timeseries_tail_prunes_to_latest_days(spark, tmp_path, sf_smoke):
    from commoncrawl_crawler_spark.sources import load_table

    ev = load_table(spark, "events", sf_smoke).select("event_id", "ts")
    sinks.write_timeseries(ev, str(tmp_path / "log"), mode="overwrite")
    tail = sinks.read_timeseries_tail(spark, str(tmp_path / "log"), days=2)
    days = {r[0] for r in tail.select(F.to_date("ts")).distinct().collect()}
    assert len(days) == 2


def test_timeseries_tail_ignores_null_day_partition(spark, tmp_path):
    """A null-ts row writes day=__HIVE_DEFAULT_PARTITION__; the tail
    listing must skip it (it sorts after every real date and matches
    nothing in the date-typed filter) so days=1 still returns the
    latest REAL day."""
    from pyspark.sql import Row
    from commoncrawl_crawler_spark.sources import sinks

    df = spark.createDataFrame(
        [
            Row(key="a", ts="2024-01-01 10:00:00", value=1),
            Row(key="b", ts="2024-01-02 10:00:00", value=2),
            Row(key="c", ts=None, value=3),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "ts_log")
    sinks.write_timeseries(df, path)
    got = sinks.read_timeseries_tail(spark, path, days=1).collect()
    assert [r.key for r in got] == ["b"]
    got2 = sinks.read_timeseries_tail(spark, path, days=2).collect()
    assert sorted(r.key for r in got2) == ["a", "b"]


def test_write_archive_failed_job_leaves_no_visible_archives(spark, tmp_path):
    """One invalid key anywhere must leave ZERO reader-visible .ccarc
    files -- the commit is a driver-side rename after every partition
    succeeded (a consumer globbing *.ccarc must never see a partial
    corpus from a failed job)."""
    import glob
    from pyspark.sql import Row

    bad = spark.createDataFrame(
        [Row(key=f"k{i}", payload=bytes([i])) for i in range(50)]
        + [Row(key="has space", payload=b"x")]
    ).repartition(4)
    path = str(tmp_path / "atomic")
    with pytest.raises(Exception, match="whitespace"):
        archive.write_archive(bad, path)
    assert glob.glob(f"{path}/*.ccarc") == []
    # a successful write commits and leaves no temps behind
    good = spark.createDataFrame(
        [Row(key=f"k{i}", payload=bytes([i])) for i in range(50)]
    ).repartition(4)
    n = archive.write_archive(good, path)
    assert n >= 1
    assert glob.glob(f"{path}/*.ccarc.tmp") == []
    assert len(glob.glob(f"{path}/*.ccarc")) == n
