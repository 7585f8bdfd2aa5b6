"""Adaptive recrawl scheduling (Cho & Garcia-Molina estimator)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from commoncrawl_crawler_spark.operators import crawllist

T0 = dt.datetime(2024, 1, 1)
DAY = dt.timedelta(days=1)


def _events(spark, rows):
    # (event_id, user_id, ts, event_type, value)
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double",
    )


def _expected_interval(n, x, span_days):
    raw = (span_days / n) / -math.log((2 * (n - x) + 1) / (2 * n + 1))
    return max(1_000_000, min(60_000_000, math.floor(raw * 1e6 + 0.5)))


def test_estimator_matches_closed_form(spark):
    rows = [
        # u1: 3 fetches over 4 days, signature changes every time
        (1, 1, T0, "click", 1.0),
        (2, 1, T0 + 2 * DAY, "click", 2.0),
        (3, 1, T0 + 4 * DAY, "purchase", 3.0),
        # u2: never changes -> max interval
        (4, 2, T0, "click", 5.0),
        (5, 2, T0 + 3 * DAY, "click", 5.0),
        (6, 2, T0 + 9 * DAY, "click", 5.0),
        # u3: single fetch -> default
        (7, 3, T0, "click", 1.0),
        # u4: mixed 1-of-2 changed over 10 days
        (8, 4, T0, "click", 1.0),
        (9, 4, T0 + 5 * DAY, "click", 1.0),
        (10, 4, T0 + 10 * DAY, "click", 9.0),
        # u5: view events only -> not a fetch, absent from output
        (11, 5, T0, "view", 1.0),
    ]
    out = {
        r.user_id: r
        for r in crawllist.adaptive_recrawl_schedule(
            _events(spark, rows)
        ).collect()
    }
    assert sorted(out) == [1, 2, 3, 4]
    u1 = out[1]
    assert (u1.fetches, u1.n_intervals, u1.changes) == (3, 2, 2)
    assert u1.interval_days_micro == _expected_interval(2, 2, 4.0)
    assert out[2].interval_days_micro == 60_000_000
    assert out[2].changes == 0
    assert out[3].interval_days_micro == 7_000_000
    assert out[3].n_intervals == 0
    u4 = out[4]
    assert (u4.n_intervals, u4.changes) == (2, 1)
    assert u4.interval_days_micro == _expected_interval(2, 1, 10.0)
    # next_due = last fetch + interval (micro-days * 86400 = micros)
    assert out[2].next_due_ts == T0 + 9 * DAY + dt.timedelta(
        microseconds=60_000_000 * 86400
    )


def test_fast_changer_clamps_to_min_interval(spark):
    rows = [
        (i, 1, T0 + i * dt.timedelta(hours=1), "click", float(i))
        for i in range(10)
    ]
    out = crawllist.adaptive_recrawl_schedule(_events(spark, rows)).collect()
    assert out[0].interval_days_micro == 1_000_000


def test_custom_signature_controls_change_detection(spark):
    rows = [
        (1, 1, T0, "click", 10.0),
        (2, 1, T0 + DAY, "click", 11.0),
        (3, 1, T0 + 2 * DAY, "click", 12.0),
    ]
    # raw value changes every fetch...
    raw = crawllist.adaptive_recrawl_schedule(_events(spark, rows)).collect()
    assert raw[0].changes == 2
    # ...but a coarse bucket signature sees no change -> max interval
    coarse = crawllist.adaptive_recrawl_schedule(
        _events(spark, rows), signature=F.floor(F.col("value") / 100)
    ).collect()
    assert coarse[0].changes == 0
    assert coarse[0].interval_days_micro == 60_000_000


def test_snapshot_delta_classifies_all_four_statuses(spark):
    from commoncrawl_crawler_spark.operators import crawldb

    a = _events(spark, [
        (1, 1, T0, "click", 10.0),          # sig bucket 0
        (2, 1, T0 + DAY, "click", 40.0),    # last sig bucket 1
        (3, 2, T0, "click", 10.0),          # removed (absent in B)
        (4, 3, T0, "click", 30.0),          # unchanged (bucket 1)
        (5, 4, T0, "view", 1.0),            # views are not fetches
    ])
    b = _events(spark, [
        (6, 1, T0 + 3 * DAY, "purchase", 80.0),   # bucket 3 -> changed
        (7, 3, T0 + 3 * DAY, "click", 26.0),      # bucket 1 -> unchanged
        (8, 5, T0 + 3 * DAY, "click", 1.0),       # added
    ])
    out = {r.user_id: r for r in crawldb.crawl_snapshot_delta(a, b).collect()}
    assert sorted(out) == [1, 2, 3, 5]  # user 4 never fetched
    assert out[1].status == "changed"
    assert (out[1].attempts_a, out[1].attempts_b, out[1].delta_attempts) == (
        2, 1, -1,
    )
    assert out[2].status == "removed"
    assert out[2].delta_attempts == -1
    assert out[3].status == "unchanged"
    assert out[5].status == "added"
    assert out[5].attempts_a == 0
