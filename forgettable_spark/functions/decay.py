"""Decay laws — the engine's core scalar transform (reference op D1).

The reference decays a bin by a Poisson draw ``k ~ Poisson(rate * dt)``
(goforget law, count-independent — ``goforget/decay.go:36-56``) or
``k ~ Poisson(count * rate * dt)`` (pyforget proportional law —
``pyforget/distribution.py:23-31``), clamped so the count floors at 0 in
prune mode or 1 otherwise (``goforget/distribution.go:153-175``).

Two engine modes:

- ``expected`` (deterministic, default): replace the draw by its
  expectation, as a pure Catalyst column expression — whole-stage-codegen
  friendly and hash-matchable against a SQL oracle. The linear law's
  wipe-threshold behavior (λ ≳ 18.4 nukes the bin, ``goforget/decay.go:
  17-19``) emerges naturally: ``count - floor(rate*dt)`` reaches the clamp
  for any idle distribution.
- ``poisson`` (stochastic, faithful): a seeded vectorized pandas UDF in
  :mod:`forgettable_spark.functions.sampling` — reproducible for a fixed
  seed and independent of partitioning, since the per-row RNG stream is
  keyed on (distribution, bin, now), never on partition/task identity.

Determinism contract with the DuckDB oracle: all time arithmetic happens
on integer epoch-microseconds (``unix_micros`` / ``epoch_us``), converted
to seconds by one IEEE-double division by 1e6 — identical bit patterns in
both engines, so ``floor`` can never disagree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: goforget ``--default-rate`` (events/sec) — goforget/forget.go:22.
GOFORGET_DEFAULT_RATE = 0.5
#: pyforget default rate — pyforget/distribution.py:23.
PYFORGET_DEFAULT_RATE = 0.02


def dt_seconds(t: Column, now_us: Column) -> Column:
    """Elapsed seconds between a timestamp column and ``now`` (epoch µs).

    DOUBLE, computed as ``(now_us - unix_micros(t)) / 1e6`` — exactly the
    oracle's ``(now_us - epoch_us(t)) / 1000000.0``.
    """
    return (now_us - F.unix_micros(t)).cast("double") / F.lit(1e6)


def expected_decay_linear(rate: float, dt_sec: Column) -> Column:
    """E[decay] under the goforget law: ``floor(rate * dt)`` (BIGINT).

    Count-independent — every bin of a distribution loses the same amount
    per elapsed interval (``goforget/decay.go:47``: ``lambda = rate*dt``).
    """
    return F.floor(F.lit(float(rate)) * dt_sec)


def expected_decay_proportional(rate: float, dt_sec: Column, count: Column) -> Column:
    """E[decay] under the pyforget law: ``floor(count * rate * dt)`` (BIGINT).

    Proportional to mass (``pyforget/distribution.py:29``:
    ``lambda_i = count_i * rate * dt``) — exponential decay in expectation.
    """
    return F.floor(count.cast("double") * F.lit(float(rate)) * dt_sec)


def decayed_count(
    count: Column,
    t: Column,
    now_us: Column,
    rate: float,
    prune: bool = True,
    law: str = "linear",
) -> Column:
    """Post-decay count (BIGINT) in deterministic ``expected`` mode.

    Clamp semantics (``goforget/distribution.go:158-164``): prune mode
    floors at 0 (the caller drops zero bins, reference ``ZREM``); non-prune
    floors at 1 so a distribution never loses support. pyforget always
    floors at 1 (``pyforget/distribution.py:60``).

    ``dt`` clamps at 0: a row timestamped after ``now`` (reader clock skew,
    or an as-of query into the past) simply hasn't decayed yet. Without the
    clamp ``floor`` of a negative λ would *add* mass (count − ⌊−x⌋ > count).
    The stochastic sampler applies the same clamp.

    Counts below 1 never decay and never get floored up: the reference
    returns decay 0 for count < 1 (``goforget/decay.go:41-43``), so a
    non-positive count in a raw event log passes through unchanged instead
    of being inflated to the floor (the stochastic sampler agrees).
    """
    dt = F.greatest(dt_seconds(t, now_us), F.lit(0.0))
    if law == "linear":
        k = expected_decay_linear(rate, dt)
    elif law == "proportional":
        k = expected_decay_proportional(rate, dt, count)
    else:
        raise ValueError(f"unknown decay law: {law!r} (want 'linear' or 'proportional')")
    floor_at = F.lit(0).cast("bigint") if prune else F.lit(1).cast("bigint")
    return (
        F.when(count < 1, count).otherwise(F.greatest(count - k, floor_at)).alias("count")
    )


def poisson_decayed_count(
    count: Column,
    t: Column,
    now_us: Column,
    rate: float,
    prune: bool = True,
    law: str = "linear",
    seed: int = 0,
    distribution: Column | None = None,
    bin: Column | None = None,
) -> Column:
    """Post-decay count in faithful stochastic mode (seeded Poisson draw).

    Thin re-export; see :func:`forgettable_spark.functions.sampling.
    poisson_decay_column` for the sampler contract.
    """
    from forgettable_spark.functions.sampling import poisson_decay_column

    return poisson_decay_column(
        count=count,
        t=t,
        now_us=now_us,
        rate=rate,
        prune=prune,
        law=law,
        seed=seed,
        distribution=distribution,
        bin=bin,
    )
