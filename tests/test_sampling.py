"""Stochastic (poisson) decay mode: reproducibility, partition-independence,
distributional fidelity, clamps — the SURVEY.md §5 item-3 statistical tests.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from forgettable_spark import operators as ops
from forgettable_spark.functions.sampling import poisson_inverse_cdf, _stable_uniforms
from forgettable_spark.operators.snapshot import FORGET_EVENTS_SCHEMA
from datetime import datetime, timezone

NOW = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)
NOW_US = int(NOW.timestamp()) * 1_000_000


@pytest.fixture(scope="module")
def big_snap(spark):
    """1000 bins, all with count 100 and dt = 10 s."""
    ts = datetime.fromtimestamp(NOW.timestamp() - 10, tz=timezone.utc)
    rows = [("d", f"bin{i:04d}", 100, ts) for i in range(1000)]
    return ops.snapshot(spark.createDataFrame(rows, FORGET_EVENTS_SCHEMA))


def test_poisson_inverse_cdf_quantiles():
    # u=0 → k=0 always; u→1 with λ=0 stays 0
    assert poisson_inverse_cdf(np.array([5.0]), np.array([0.0]))[0] == 0
    assert poisson_inverse_cdf(np.array([0.0]), np.array([0.999]))[0] == 0
    # median of Poisson(5) is 5
    assert poisson_inverse_cdf(np.array([5.0]), np.array([0.5]))[0] == 5
    # wipe guard: e^-19 < 1e-8
    assert poisson_inverse_cdf(np.array([19.0]), np.array([0.5]))[0] == np.iinfo(np.int64).max


def test_stable_uniforms_are_uniform_and_stable():
    import pandas as pd

    d = pd.Series(["d"] * 20000)
    b = pd.Series([f"b{i}" for i in range(20000)])
    now = np.full(20000, NOW_US, dtype=np.int64)
    u1 = _stable_uniforms(d, b, now, seed=7)
    u2 = _stable_uniforms(d, b, now, seed=7)
    assert (u1 == u2).all()
    u3 = _stable_uniforms(d, b, now, seed=8)
    assert (u1 != u3).any()
    assert abs(u1.mean() - 0.5) < 0.01 and 0.0 <= u1.min() and u1.max() < 1.0


def test_poisson_mode_reproducible_across_partitionings(big_snap):
    a = ops.decayed_state(big_snap, NOW_US, rate=0.5, mode="poisson", seed=42)
    b = ops.decayed_state(
        big_snap.repartition(17, "bin"), NOW_US, rate=0.5, mode="poisson", seed=42
    )
    ra = sorted((r["bin"], r["count"]) for r in a.collect())
    rb = sorted((r["bin"], r["count"]) for r in b.collect())
    assert ra == rb


def test_poisson_mode_matches_law_statistics(big_snap):
    """λ = rate·dt = 5: sample mean of the decay over 1000 bins ≈ 5
    (σ/√n ≈ 0.07 → ±4σ window), variance ≈ λ."""
    out = ops.decayed_state(big_snap, NOW_US, rate=0.5, mode="poisson", seed=1)
    counts = np.array([r["count"] for r in out.collect()])
    decay = 100 - counts
    assert abs(decay.mean() - 5.0) < 0.3
    assert abs(decay.var() - 5.0) < 1.0


def test_poisson_clamps(spark):
    """λ huge → wipe; prune floors at 0 and filters, non-prune floors at 1."""
    ts = datetime.fromtimestamp(NOW.timestamp() - 1000, tz=timezone.utc)
    snap = ops.snapshot(
        spark.createDataFrame([("d", "b", 50, ts)], FORGET_EVENTS_SCHEMA)
    )
    pruned = ops.decayed_state(snap, NOW_US, rate=0.5, mode="poisson", seed=3)
    assert pruned.count() == 0
    floored = ops.decayed_state(snap, NOW_US, rate=0.5, prune=False, mode="poisson", seed=3)
    assert floored.collect()[0]["count"] == 1


def test_poisson_proportional_law_statistics(big_snap):
    """pyforget law: λ_i = count·rate·dt = 100·0.005·10 = 5 — same mean
    as the linear case but driven by the count-proportional rate."""
    out = ops.decayed_state(
        big_snap, NOW_US, rate=0.005, mode="poisson", law="proportional", seed=9
    )
    counts = np.array([r["count"] for r in out.collect()])
    decay = 100 - counts
    assert abs(decay.mean() - 5.0) < 0.3
    assert abs(decay.var() - 5.0) < 1.0


def test_uniform_column_matches_python_twin(spark):
    """The JVM-side md5 uniform and the Python twin draw identical doubles
    — the contract the SQL oracle's u expression also relies on."""
    import pandas as pd
    from forgettable_spark.functions.sampling import uniform_column

    df = spark.createDataFrame(
        [("d1", f"b{i}") for i in range(50)], "distribution string, bin string"
    )
    got = (
        df.select(
            "bin",
            uniform_column(
                F.col("distribution"), F.col("bin"), F.lit(NOW_US).cast("bigint"), seed=7
            ).alias("u"),
        )
        .orderBy("bin")
        .collect()
    )
    want = _stable_uniforms(
        pd.Series(["d1"] * 50),
        pd.Series(sorted(f"b{i}" for i in range(50))),
        np.full(50, NOW_US, dtype=np.int64),
        seed=7,
    )
    assert [r["u"] for r in got] == list(want)


def test_poisson_seed_changes_draw(big_snap):
    a = ops.decayed_state(big_snap, NOW_US, rate=0.5, mode="poisson", seed=1)
    b = ops.decayed_state(big_snap, NOW_US, rate=0.5, mode="poisson", seed=2)
    ca = [r["count"] for r in a.orderBy("bin").collect()]
    cb = [r["count"] for r in b.orderBy("bin").collect()]
    assert ca != cb
