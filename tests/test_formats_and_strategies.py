"""Source/sink round-trips and physical-strategy equivalence checks."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from forgettable_spark import operators as ops
from forgettable_spark.functions.normalize import with_z_and_p
from forgettable_spark.operators.snapshot import FORGET_EVENTS_SCHEMA
from forgettable_spark.sources import formats

T0 = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)

ROWS = [
    ("colors", "red", 9, T0),
    ("colors", "blue", 5, T0),
    ("animals", "cat", 3, T0),
]


@pytest.fixture()
def events(spark):
    return spark.createDataFrame(ROWS, FORGET_EVENTS_SCHEMA)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, events, fmt):
    d = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
    try:
        formats.write_events(events, d, format=fmt, mode="overwrite")
        reader = {
            "parquet": formats.read_events_parquet,
            "csv": formats.read_events_csv,
            "json": formats.read_events_json,
            "orc": formats.read_events_orc,
        }[fmt]
        back = reader(spark, d)
        assert back.schema == FORGET_EVENTS_SCHEMA or [f.name for f in back.schema.fields] == [
            "distribution",
            "bin",
            "n",
            "ts",
        ]
        got = sorted(
            (r["distribution"], r["bin"], r["n"], r["ts"].replace(tzinfo=timezone.utc))
            for r in back.collect()
        )
        assert got == sorted(ROWS)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_normalize_strategies_identical(spark, events):
    """window-Z and join-Z are physically different plans with identical
    results — including identical double p values."""
    snap = ops.snapshot(events)
    w = with_z_and_p(snap, strategy="window").select("distribution", "bin", "Z", "p")
    j = with_z_and_p(snap, strategy="join").select("distribution", "bin", "Z", "p")
    rw = sorted(map(tuple, w.collect()))
    rj = sorted(map(tuple, j.collect()))
    assert rw == rj
    # and the join plan genuinely avoids a window
    assert "Window" not in j._jdf.queryExecution().executedPlan().toString()


def test_join_strategy_broadcasts_totals(spark, events):
    snap = ops.snapshot(events)
    j = with_z_and_p(snap, strategy="join")
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_salted_join_matches_plain_join(spark):
    """Result equality with the unsalted join under skew (one hot key),
    multi-row right side, and left-outer NULL fill; unsupported join
    types rejected."""
    import pyspark.sql.functions as F

    from forgettable_spark.functions.skew import salted_join

    # 10k rows of hot key 'h', a tail of others, plus a dangling key
    fact = spark.range(0, 10500).selectExpr(
        "id AS row_id",
        "CASE WHEN id < 10000 THEN 'h' WHEN id < 10400 THEN concat('k', id % 40) "
        "ELSE 'missing' END AS key",
    )
    dim = spark.createDataFrame(
        [("h", 1), ("h", 2)] + [(f"k{i}", 10 + i) for i in range(40)],
        ["key", "val"],
    )

    for how in ("inner", "left"):
        plain = fact.join(dim, "key", how).groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), F.sum("val").alias("s")
        )
        salted = salted_join(fact, dim, "key", salts=8, how=how).groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), F.sum("val").alias("s")
        )
        a = sorted(map(tuple, plain.collect()))
        b = sorted(map(tuple, salted.collect()))
        assert a == b, f"{how} join mismatch"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(fact, dim, "key", how="full")
    with _pytest.raises(ValueError):
        salted_join(fact, dim, "key", salts=0)
    # a caller column named _salt must not be silently overwritten+dropped
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(fact.withColumn("_salt", F.lit(1)), dim, "key")
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(fact, dim.withColumn("_salt", F.lit(1)), "key")
