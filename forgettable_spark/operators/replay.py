"""Epoch replay: historical reconstruction of decay-at-update state.

The reference cannot answer "what did this distribution look like after
each write-back?" — its decay destroys history in place. An event-sourced
engine can: bucket increments into fixed epochs and fold the streaming
update law (decay state forward to the epoch, add the epoch's increments,
clamp) across each distribution's occupied epochs. The result is exactly
the state the Structured Streaming tier
(:mod:`forgettable_spark.streaming.forget_stream`) would hold after
consuming the same epochs as micro-batches — asserted by a cross-tier
equivalence test.

Crucially the fold is **recursion-free and row-local**: one groupBy
builds each (distribution, bin)'s epoch series as a sorted array, and a
single ``aggregate`` higher-order fold applies the stepwise law — no
iterative driver loop, no recursive join, lineage depth O(1) regardless
of epoch count. The only shuffles are the epoch aggregation and the
series collection; both cluster by distribution, so a bucketed log runs
them shuffle-free.

Note the semantic difference from decay-at-read: stepwise clamping is
path-dependent (a bin flattened to 0 in some epoch cannot owe further
decay), so replay(k epochs) ≠ one-shot decay over the total interval —
replay is the faithful twin of the reference's repeated write-backs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from forgettable_spark.functions.decay import GOFORGET_DEFAULT_RATE


def _epoch_us(ts: Column, width_sec: int) -> Column:
    """Epoch start in integer µs: exact int arithmetic, oracle twin is
    ``(epoch_us(ts) // width_us) * width_us``."""
    width_us = width_sec * 1_000_000
    return F.unix_micros(ts) - (F.unix_micros(ts) % F.lit(width_us))


def replay(
    events: DataFrame,
    epoch_sec: int = 3600,
    rate: float = GOFORGET_DEFAULT_RATE,
    prune: bool = True,
) -> DataFrame:
    """Fold the stepwise update law over per-distribution epochs.

    Returns (distribution, bin, count, t_us): the state after each
    distribution's LAST occupied epoch. ``t_us`` is that epoch's start —
    the instant the final "write-back" happened. Compose with
    ``decayed_state`` to roll the result forward to an arbitrary ``now``.

    Per step: ``count' = clamp(count - floor(rate·dt)) + epoch_incr``
    with dt the gap between consecutive occupied epochs of the
    *distribution* (bins silent in an epoch still decay — the reference
    decays whole distributions at write-back). Prune clamps at 0 (the bin
    can return on a later increment, as in streaming); non-prune floors
    at 1 once the bin has ever held mass.
    """
    ep = events.withColumn("epoch_us", _epoch_us(F.col("ts"), epoch_sec))
    bin_incr = ep.groupBy("distribution", "bin", "epoch_us").agg(F.sum("n").alias("n"))
    dist_epochs = ep.select("distribution", "epoch_us").distinct()
    bins = bin_incr.select("distribution", "bin").distinct()
    grid = bins.join(dist_epochs, "distribution")
    series = (
        grid.join(bin_incr, ["distribution", "bin", "epoch_us"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0).cast("bigint")))
        .groupBy("distribution", "bin")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("epoch_us"), F.col("n")))
            ).alias("elems")
        )
    )
    floor_at = F.lit(0).cast("bigint")

    def merge(acc: Column, e: Column) -> Column:
        dt_sec = (e["epoch_us"] - acc["epoch_us"]).cast("double") / F.lit(1e6)
        decayed = acc["n"] - F.floor(F.lit(float(rate)) * dt_sec)
        if prune:
            clamped = F.greatest(decayed, floor_at)
        else:
            # never synthesize mass: a bin that has held none stays at 0
            clamped = F.when(acc["n"] == 0, F.lit(0).cast("bigint")).otherwise(
                F.greatest(decayed, F.lit(1).cast("bigint"))
            )
        return F.struct(
            e["epoch_us"].alias("epoch_us"), (clamped + e["n"]).alias("n")
        )

    init = F.struct(
        F.element_at(F.col("elems"), 1)["epoch_us"].alias("epoch_us"),
        F.lit(0).cast("bigint").alias("n"),
    )
    folded = series.withColumn("fin", F.aggregate(F.col("elems"), init, merge))
    out = folded.select(
        "distribution",
        "bin",
        F.col("fin")["n"].alias("count"),
        F.col("fin")["epoch_us"].alias("t_us"),
    )
    if prune:
        out = out.filter(F.col("count") > 0)
    return out
