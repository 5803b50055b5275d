"""Event analytics: windowed stats, gap sessionization, JSON props —
hand-computed fixtures (oracle parity is covered by check_contract)."""

from __future__ import annotations

import datetime as dt

from ps_pagerank_spark.operators.analytics import (
    extract_props,
    sessionize,
    windowed_stats,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_windowed_stats(spark):
    df = _events(
        spark,
        [
            (0, _t(5), 1, "click", 1.5, "{}"),
            (1, _t(20), 2, "click", 2.5, "{}"),
            (2, _t(61), 1, "view", 4.0, "{}"),
        ],
    )
    got = {
        (r["window_start"].hour, r["event_type"]): (
            r["n_events"],
            r["value_sum_u"],
            r["n_users"],
        )
        for r in windowed_stats(df, window="1 hour").collect()
    }
    assert got == {(0, "click"): (2, 4000000, 2), (1, "view"): (1, 4000000, 1)}


def test_sessionize_gap(spark):
    df = _events(
        spark,
        [
            # user 1: two events 10 min apart (one session), then 40-min gap
            (0, _t(0), 1, "a", 0.0, "{}"),
            (1, _t(10), 1, "a", 0.0, "{}"),
            (2, _t(50), 1, "a", 0.0, "{}"),
            # user 2: single event
            (3, _t(0), 2, "a", 0.0, "{}"),
        ],
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start"].minute,
            r["session_end"].minute,
            r["n_events"],
        )
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {
        (1, 0): (0, 10, 2),
        (1, 1): (50, 50, 1),
        (2, 0): (0, 0, 1),
    }


def test_sessionize_boundary_not_new(spark):
    """A pause of exactly the gap does NOT open a session (strict >)."""
    df = _events(
        spark,
        [(0, _t(0), 1, "a", 0.0, "{}"), (1, _t(30), 1, "a", 0.0, "{}")],
    )
    assert sessionize(df, gap_minutes=30).count() == 1


def test_extract_props(spark):
    df = _events(
        spark,
        [
            (0, _t(0), 1, "a", 0.0, '{"k": 7}'),
            (1, _t(1), 1, "a", 0.0, '{"x": 1}'),
            (2, _t(2), 1, "a", 0.0, None),
        ],
    )
    got = {r["event_id"]: r["k"] for r in extract_props(df).collect()}
    assert got == {0: 7, 1: None, 2: None}
