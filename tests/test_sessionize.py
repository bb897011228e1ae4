"""Sessionization semantics on a hand-built fixture."""

from __future__ import annotations

from datetime import datetime, timezone

from forgettable_spark.operators.sessionize import sessionize

T0 = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)


def _at(sec):
    return datetime.fromtimestamp(T0.timestamp() + sec, tz=timezone.utc)


def test_gap_splits_sessions(spark):
    rows = [
        # user 1: two sessions (gap 3600 > 1800 between idx 1 and 2)
        (0, _at(0), 1, "view", 0.0, "{}"),
        (1, _at(100), 1, "click", 0.0, "{}"),
        (2, _at(100 + 3600), 1, "view", 0.0, "{}"),
        # user 2: one session, events exactly at the gap boundary (not >)
        (3, _at(0), 2, "view", 0.0, "{}"),
        (4, _at(1800), 2, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_us"])
        for r in sessionize(ev, gap_sec=1800).collect()
    }
    assert out[(1, 1)] == (2, 100_000_000)
    assert out[(1, 2)] == (1, 0)
    assert out[(2, 1)] == (2, 1_800_000_000)  # boundary gap keeps one session
    assert (2, 2) not in out
