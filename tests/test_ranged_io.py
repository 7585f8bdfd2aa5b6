"""Positioned-read seam (sources/ranged_io): scheme dispatch, bounded
reads, and the executor-side contract via an instrumented scheme."""

from __future__ import annotations

import os

import pytest

from commoncrawl_crawler_spark.sources import archive, ranged_io


def test_scheme_of():
    s = ranged_io.scheme_of
    assert s("/a/b.warc.gz") == ""
    assert s("relative/p.gz") == ""
    assert s("file:///a/b") == "file"
    assert s("s3://bucket/key") == "s3"
    assert s("C:\\x") == ""  # drive letter, not a scheme
    assert s("abfss://c@a.dfs.example/x") == "abfss"


def test_resolve_archive_path():
    r = ranged_io.resolve_archive_path
    assert r("x.warc.gz", "/base") == "/base/x.warc.gz"
    assert r("/abs/x.gz", "/base") == "/abs/x.gz"
    assert r("file:///abs/x.gz", "/base") == "/abs/x.gz"
    assert r("s3://b/x.gz", "/base") == "s3://b/x.gz"
    assert r("x.gz", "s3://bucket/archives") == "s3://bucket/archives/x.gz"


def test_read_range_local_and_file_uri(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(bytes(range(64)))
    assert ranged_io.read_range(str(p), 10, 4) == bytes(range(10, 14))
    assert ranged_io.read_range(f"file://{p}", 60, None) == bytes(
        range(60, 64)
    )
    # short read at EOF, not an error
    assert ranged_io.read_range(str(p), 62, 10) == bytes(range(62, 64))


def test_registered_scheme_overrides(tmp_path):
    calls = []

    def fake(path, offset, length):
        calls.append((path, offset, length))
        return b"\x00" * (length or 0)

    ranged_io.register_scheme("fake", fake)
    try:
        out = ranged_io.read_range("fake://x/y", 5, 3)
        assert out == b"\x00\x00\x00"
        assert calls == [("fake://x/y", 5, 3)]
    finally:
        ranged_io.unregister_scheme("fake")


def test_read_member_at_via_contract_scheme(spark, tmp_path):
    """Driver-side point read through a registered non-local scheme:
    the seam must request exactly [offset, offset+length)."""
    rows = [
        (
            "response",
            f"<urn:uuid:{i}>",
            f"http://example.com/{i}",
            "2024-02-01T00:00:00Z",
            "text/plain",
            b"y" * (50 + i),
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows,
        "warc_type string, record_id string, target_uri string,"
        " warc_date string, content_type string, block binary",
    )
    archive.write_warc(df, str(tmp_path))
    full = archive.read_warc(spark, str(tmp_path)).collect()
    rec = sorted(full, key=lambda r: r["member_offset"])[2]
    calls = []

    def ctr(path, offset, length):
        calls.append((path, offset, length))
        import re

        with open(re.sub("^ctr:/*", "/", path), "rb") as f:
            f.seek(offset)
            return f.read() if length is None else f.read(length)

    ranged_io.register_scheme("ctr", ctr)
    try:
        local = rec["archive_path"].replace("file:", "")
        uri = "ctr://" + local.lstrip("/")
        got = archive.read_member_at(
            uri, rec["member_offset"], "warc", rec["member_length"]
        )
        assert got[2] == rec["target_uri"]
        assert calls == [
            (uri, rec["member_offset"], rec["member_length"])
        ]
    finally:
        ranged_io.unregister_scheme("ctr")


def test_read_warc_ranges_executor_contract_scheme(spark, tmp_path):
    """THE seam contract test: read_warc_ranges against a non-local
    URI scheme, dispatched on EXECUTORS via the kernel-shipped
    extra_schemes registration, must issue exactly the planned bounded
    ranged reads and reproduce the full-scan rows."""
    rows = [
        (
            "response",
            f"<urn:uuid:{i}>",
            f"http://example.com/doc/{i}",
            "2024-02-01T00:00:00Z",
            "text/plain",
            b"z" * (60 + 9 * i),
        )
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows,
        "warc_type string, record_id string, target_uri string,"
        " warc_date string, content_type string, block binary",
    )
    wdir = tmp_path / "w"
    archive.write_warc(df, str(wdir))
    full = archive.read_warc(spark, str(wdir))
    idx = archive.cdx_index(full)
    # rewrite filenames (basenames here) onto the instrumented
    # scheme as absolute ctr:// URIs
    plan = archive.fetch_plan(
        idx.selectExpr(
            f"concat('ctr://{str(wdir).lstrip('/')}/', filename)"
            " AS filename",
            "offset",
            "length",
        ),
        merge_gap=64,
    )
    want_ranges = {
        (r["filename"], r["range_start"], r["range_end"])
        for r in plan.collect()
    }
    log = tmp_path / "ranged.log"
    logged_path = str(log)

    def read_ctr(path, offset, length):
        import re

        with open(logged_path, "a") as f:
            f.write(f"{path}\t{offset}\t{length}\n")
        with open(re.sub("^ctr:/*", "/", path), "rb") as f:
            f.seek(offset)
            return f.read() if length is None else f.read(length)

    if True:
        got = archive.read_warc_ranges(
            spark, plan, str(wdir), extra_schemes={"ctr": read_ctr}
        )
        key = lambda d: sorted(
            (r["record_id"], r["member_length"], bytes(r["block"]))
            for r in d.collect()
        )
        assert key(got) == key(full)
        logged = {
            (p, int(o), int(o) + int(ln))
            for p, o, ln in (
                line.split("\t")
                for line in log.read_text().splitlines()
            )
        }
        assert logged == want_ranges


def test_env_scheme_registration(tmp_path, monkeypatch):
    """SPARK_GRAFT_RANGED_IO resolves scheme=module:callable at first
    use (the worker-start deployment hook)."""
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello world")
    log = tmp_path / "log.txt"
    monkeypatch.setenv("RANGED_IO_LOG", str(log))
    monkeypatch.setenv(
        "SPARK_GRAFT_RANGED_IO", "ctr=tests.ranged_contract:read_ctr"
    )
    ranged_io.unregister_scheme("ctr")
    ranged_io._ENV_LOADED = False
    try:
        uri = "ctr://" + str(p).lstrip("/")
        assert ranged_io.read_range(uri, 6, 5) == b"world"
        assert log.read_text().strip() == f"{uri}\t6\t5"
    finally:
        ranged_io.unregister_scheme("ctr")
        ranged_io._ENV_LOADED = False


def test_env_scheme_malformed_entry_names_var_and_retries(
    tmp_path, monkeypatch
):
    """A malformed SPARK_GRAFT_RANGED_IO entry raises an error that
    names the env var, and does NOT latch _ENV_LOADED -- fixing the
    env and retrying registers the scheme on the next read."""
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello world")
    monkeypatch.setenv("SPARK_GRAFT_RANGED_IO", "ctr=no.such.module:fn")
    ranged_io.unregister_scheme("ctr")
    ranged_io._ENV_LOADED = False
    try:
        with pytest.raises(ValueError, match="SPARK_GRAFT_RANGED_IO"):
            ranged_io.read_range(str(p), 0, 5)
        assert ranged_io._ENV_LOADED is False  # not latched on failure
        log = tmp_path / "log.txt"
        monkeypatch.setenv("RANGED_IO_LOG", str(log))
        monkeypatch.setenv(
            "SPARK_GRAFT_RANGED_IO", "ctr=tests.ranged_contract:read_ctr"
        )
        uri = "ctr://" + str(p).lstrip("/")
        assert ranged_io.read_range(uri, 6, 5) == b"world"
    finally:
        ranged_io.unregister_scheme("ctr")
        ranged_io._ENV_LOADED = False
