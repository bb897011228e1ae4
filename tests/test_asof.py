"""as_of_join: the union-interleave window composition's contract —
most-recent-at-or-before matching, LEFT pass-through, tie handling,
NULL-timestamp behavior (the registered query's DuckDB native ASOF JOIN
twin cross-checks values; these pin the semantics on edges)."""

from __future__ import annotations

from datetime import datetime

from forgettable_spark.operators.asof import as_of_join


def _ts(s):
    return datetime(2024, 6, 1, 12, 0, s)


def test_asof_basic_left_and_ties(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(10)),   # matches right at ts 5
            (2, 10, _ts(3)),    # before any right -> NULL (LEFT)
            (3, 10, _ts(5)),    # equal ts -> inclusive match
            (4, 20, _ts(30)),   # different key, matches its own side
            (5, 30, _ts(30)),   # key with no right rows -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(5)),
            (101, 10, _ts(8)),
            (102, 20, _ts(29)),
        ],
        "click_id long, user_id long, ts timestamp",
    )
    out = {
        r["event_id"]: r["asof_click_id"]
        for r in as_of_join(left, right, on=["user_id"]).collect()
    }
    assert out == {1: 101, 2: None, 3: 100, 4: 102, 5: None}


def test_asof_null_timestamps_never_match(spark):
    left = spark.createDataFrame(
        [(1, 10, None), (2, 10, _ts(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(5)), (101, 10, None)],
        "click_id long, user_id long, ts timestamp",
    )
    rows = {r["event_id"]: r for r in as_of_join(left, right, on=["user_id"]).collect()}
    assert rows[1]["asof_click_id"] is None  # NULL left ts: unmatched
    assert rows[2]["asof_click_id"] == 100   # NULL right ts never matches
    assert len(rows) == 2  # LEFT: every left row survives


def test_asof_right_ts_ties_deterministic(spark):
    """Two right rows at the identical (key, ts): the match must be the
    deterministic struct-max payload regardless of partitioning."""
    left = spark.createDataFrame(
        [(1, 10, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(5)), (101, 10, _ts(5))],
        "click_id long, user_id long, ts timestamp",
    )
    for rdf in (right, right.repartition(7), right.coalesce(1)):
        out = as_of_join(left, rdf, on=["user_id"]).collect()
        assert out[0]["asof_click_id"] == 101  # lexicographically-largest payload
