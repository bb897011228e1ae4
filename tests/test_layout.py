"""Bucketed layout: the snapshot pipeline over a bucketed log must run
with zero exchanges — the co-located-read guarantee that matters at 100 TB.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from forgettable_spark import operators as ops
from forgettable_spark.functions.normalize import with_z_and_p
from forgettable_spark.operators.snapshot import FORGET_EVENTS_SCHEMA
from forgettable_spark.sources.layout import read_events_bucketed, save_events_bucketed

T0 = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def bucketed(spark):
    rows = [
        (f"d{i % 7}", f"b{i % 13}", 1 + i % 3, T0) for i in range(200)
    ]
    events = spark.createDataFrame(rows, FORGET_EVENTS_SCHEMA)
    save_events_bucketed(events, "forget_events_bucketed", buckets=8)
    yield read_events_bucketed(spark, "forget_events_bucketed")
    spark.sql("DROP TABLE IF EXISTS forget_events_bucketed")


def test_snapshot_over_bucketed_log_has_zero_exchanges(spark, bucketed):
    snap = ops.snapshot(bucketed)
    normalized = with_z_and_p(snap)
    normalized.collect()
    plan = normalized._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and it still computes the right thing
    z = {r["distribution"]: r["Z"] for r in normalized.collect()}
    raw = {
        r["distribution"]: r["z"]
        for r in bucketed.groupBy("distribution").agg(F.sum("n").alias("z")).collect()
    }
    assert z == raw


def test_bucketed_matches_unbucketed_results(spark, bucketed):
    direct = spark.createDataFrame(
        [(f"d{i % 7}", f"b{i % 13}", 1 + i % 3, T0) for i in range(200)],
        FORGET_EVENTS_SCHEMA,
    )
    now_us = int(T0.timestamp() * 1e6) + 2_000_000
    a = sorted(map(tuple, ops.get_dist(ops.snapshot(bucketed), now_us, rate=0.5).collect()))
    b = sorted(map(tuple, ops.get_dist(ops.snapshot(direct), now_us, rate=0.5).collect()))
    assert a == b
