"""Snapshot compaction — the scale replacement for reference op D4.

The reference keeps stored state small by decaying it on every read and
asynchronously writing the decayed values back (read-repair,
``goforget/forget.go:247-256``, ``redis_utils.go:124-196``). An
event-sourced engine doesn't need repair — but it does need *compaction*:
left alone, the increment log grows forever and every snapshot pays to
re-aggregate history.

``compact()`` materializes the decayed, pruned, expiry-filtered state at
an instant and re-emits it as a *baseline event log*: one synthetic
increment per surviving (distribution, bin) carrying the accumulated
count. Downstream, ``baseline ∪ new increments`` is a valid event log —
the operators are agnostic to whether a row came from one ``/incr`` or a
compaction, so the cycle (compact → append → compact) is closed. This is
the batch analogue of the reference's write-back, run on a schedule
instead of per read, with the empty-write discard and TTL reaping folded
in as filters.

Concurrency: the reference used optimistic WATCH/MULTI (last-writer-wins,
``redis_utils.go:143-191``); here a compaction is a pure function of an
immutable input plus an atomic directory swap — staged write then rename,
or a Delta/Iceberg commit when a transactional table format is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forgettable_spark.functions.decay import GOFORGET_DEFAULT_RATE
from forgettable_spark.functions.expiry import DEFAULT_SIGMA
from forgettable_spark.operators.read_ops import decayed_state, live_distributions
from forgettable_spark.operators.snapshot import snapshot


def compact(
    events: DataFrame,
    now_us: int,
    rate: float = GOFORGET_DEFAULT_RATE,
    prune: bool = True,
    law: str = "linear",
    sigma: float = DEFAULT_SIGMA,
    apply_expiry: bool = True,
    mode: str = "expected",
    seed: int = 0,
) -> DataFrame:
    """Collapse an increment log into a decayed baseline log at ``now``.

    Returns a ``forget_events``-shaped DataFrame (distribution, bin, n,
    ts): one row per surviving bin with ``n = decayed count`` and
    ``ts = now`` (compaction *is* a decay write-back, so T advances —
    matching the reference, where write-back sets ``_T`` to the decay
    instant, ``redis_utils.go:174-181``).

    Expiry folds in the ``(σ+η)·η`` horizon: distributions idle past it
    are dropped entirely (the Redis TTL reaping the 3-key group).
    """
    snap = snapshot(events)
    if apply_expiry:
        # No broadcast hint: `live` is one row per live distribution, which
        # at scale can be hundreds of millions of rows — a forced broadcast
        # would OOM the driver. AQE broadcasts it when it is actually small.
        live = live_distributions(snap, now_us, rate=rate, sigma=sigma).select("distribution")
        snap = snap.join(live, "distribution", "left_semi")
    decayed = decayed_state(snap, now_us, rate=rate, prune=prune, law=law, mode=mode, seed=seed)
    return decayed.select(
        "distribution",
        "bin",
        F.col("count").alias("n"),
        F.timestamp_micros(F.lit(now_us)).alias("ts"),
    )


def write_compacted(
    events: DataFrame,
    path: str,
    now_us: int,
    rate: float = GOFORGET_DEFAULT_RATE,
    prune: bool = True,
    law: str = "linear",
    sigma: float = DEFAULT_SIGMA,
    mode: str = "expected",
    seed: int = 0,
    partitions: int | None = None,
    atomic: bool = True,
) -> None:
    """Compact and persist as parquet, hash-distributed by distribution so
    a later read of the baseline is already clustered for the snapshot
    aggregation (one fewer shuffle on the hot path).

    ``atomic=True`` stages the write to ``<path>.__staging__`` and swaps
    it in with directory renames, so a concurrent reader never sees a
    half-written directory (it may observe a brief window where ``path``
    is absent between the two renames — POSIX rename cannot exchange two
    directories atomically; retry a reader that hits ENOENT). If the swap
    fails the old baseline is restored — the optimistic-commit role the
    reference delegated to Redis WATCH/MULTI (``redis_utils.go:143-191``).

    For a baseline with **no** reader-visible window and real optimistic
    concurrency, prefer :func:`forgettable_spark.sources.txn.
    compact_to_table`: versioned manifests published by an atomic
    single-file link — the commit protocol of a transactional table
    format, minus the dependency. This rename-swap path remains for
    plain-directory deployments where readers tolerate a retry.
    """
    out = compact(events, now_us, rate, prune, law, sigma, mode=mode, seed=seed)
    if partitions is not None:
        out = out.repartition(partitions, "distribution")
    else:
        out = out.repartition("distribution")
    if not atomic:
        out.write.mode("overwrite").parquet(path)
        return

    import os
    import shutil
    import uuid

    staging = f"{path}.__staging__{uuid.uuid4().hex[:8]}"
    retired = f"{path}.__retired__{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(staging)
    try:
        if os.path.exists(path):
            os.rename(path, retired)
        try:
            os.rename(staging, path)
        except OSError:
            # Roll the old baseline back before propagating — without this
            # a failed swap would leave no data at `path` at all (the old
            # baseline stranded under the retired name, the new one deleted).
            if os.path.exists(retired) and not os.path.exists(path):
                os.rename(retired, path)
            raise
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(retired, ignore_errors=True)
