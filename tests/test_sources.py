"""Source/sink unit tests: archive members, rotation, ingest, sinks."""

from __future__ import annotations

import zlib

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
