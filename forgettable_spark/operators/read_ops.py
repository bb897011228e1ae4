"""Read operators R1-R4 + D3 over a forget-table snapshot.

Every operator is a pure DataFrame transform parameterized by an explicit
evaluation instant ``now_us`` (epoch microseconds) — determinism is a
feature: the reference's wall-clock ``time.Now()`` is the one impurity in
its read path, and pinning it is what makes results oracle-checkable.

All operators accept ``rate`` / ``prune`` / ``law`` and run in
deterministic ``expected`` decay mode; stochastic mode lives in
:mod:`forgettable_spark.functions.sampling` and composes the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from forgettable_spark.functions.decay import GOFORGET_DEFAULT_RATE, decayed_count
from forgettable_spark.functions.expiry import DEFAULT_SIGMA, expiry_horizon_seconds
from forgettable_spark.functions.normalize import with_z_and_p


def _now_col(now_us: int | Column) -> Column:
    return F.lit(now_us).cast("bigint") if isinstance(now_us, int) else now_us


def _decayed_count_col(
    count: Column,
    t: Column,
    now_us: int | Column,
    rate: float,
    prune: bool,
    law: str,
    mode: str,
    seed: int,
) -> Column:
    """Post-decay count column in either decay mode (shared by every read
    operator so ``mode``/``seed`` behave identically across R1-R3)."""
    if mode == "expected":
        return decayed_count(count, t, _now_col(now_us), rate, prune, law)
    if mode == "poisson":
        from forgettable_spark.functions.sampling import poisson_decay_column

        return poisson_decay_column(count, t, _now_col(now_us), rate, prune, law, seed)
    raise ValueError(f"unknown decay mode: {mode!r} (want 'expected' or 'poisson')")


def decayed_state(
    snap: DataFrame,
    now_us: int | Column,
    rate: float = GOFORGET_DEFAULT_RATE,
    prune: bool = True,
    law: str = "linear",
    mode: str = "expected",
    seed: int = 0,
) -> DataFrame:
    """Apply decay-at-read to a snapshot → (distribution, bin, count, t).

    ``mode="expected"`` (default) is the deterministic pure-Catalyst law;
    ``mode="poisson"`` is the faithful seeded stochastic sampler (a
    vectorized pandas UDF — reproducible and partition-independent, see
    :mod:`forgettable_spark.functions.sampling`).

    In prune mode bins decayed to 0 are dropped (reference removes them at
    write-back, ``goforget/redis_utils.go:163-172``); an entire distribution
    decaying away simply yields no rows (the reference discards the write
    and lets TTL expiry reap the keys, ``redis_utils.go:158-161``).
    """
    c = _decayed_count_col(F.col("count"), F.col("t"), now_us, rate, prune, law, mode, seed)
    out = snap.withColumn("count", c)
    if prune:
        out = out.filter(F.col("count") > 0)
    return out


def get_dist(
    snap: DataFrame,
    now_us: int | Column,
    distribution: str | None = None,
    rate: float = GOFORGET_DEFAULT_RATE,
    prune: bool = True,
    law: str = "linear",
    mode: str = "expected",
    seed: int = 0,
    z_strategy: str = "window",
) -> DataFrame:
    """R1 ``/dist``: full-distribution scan + decay + normalize.

    ``z_strategy`` picks the normalization plan (``window`` or the
    skew-safe ``join`` — see :func:`forgettable_spark.functions.normalize.
    with_z_and_p`); results are identical either way.

    Returns (distribution, bin, count, Z, p) for every surviving bin.
    ``Z`` is recomputed from the decayed counts — matching the reference,
    whose ``/dist`` ignores the stored ``_Z`` and re-derives it
    (``goforget/distribution.go:96-100,132-140``).

    ``distribution=...`` filters *before* any aggregation so Catalyst
    pushes the equality predicate into the parquet scan (partition pruning
    when the log is partitioned by distribution).
    """
    if distribution is not None:
        snap = snap.filter(F.col("distribution") == distribution)
    out = decayed_state(snap, now_us, rate, prune, law, mode, seed)
    return with_z_and_p(out, strategy=z_strategy).select(
        "distribution", "bin", "count", "Z", "p"
    )


def get_field(
    snap: DataFrame,
    fields: list[str],
    now_us: int | Column,
    distribution: str | None = None,
    rate: float = GOFORGET_DEFAULT_RATE,
    prune: bool = True,
    law: str = "linear",
    mode: str = "expected",
    seed: int = 0,
    compat_partial_z: bool = False,
) -> DataFrame:
    """R2 ``/get``: point lookup of named bins with probabilities.

    Normative mode: decay the whole distribution, compute ``Z`` over the
    full decayed distribution, then select the requested bins — ``p`` is a
    true probability.

    ``compat_partial_z=True`` reproduces the reference quirk
    (``goforget/forget.go:117-160`` + ``distribution.go:56-78``): ``p`` is
    computed from the **un-decayed** counts against the stored
    whole-distribution ``Z`` *before* decay runs, while the returned
    ``count`` is post-decay — so ``p`` and ``count`` are mutually
    inconsistent, exactly as the reference returns them.
    """
    if distribution is not None:
        snap = snap.filter(F.col("distribution") == distribution)
    if compat_partial_z:
        with_p = with_z_and_p(snap)  # p from un-decayed count / un-decayed Z
        out = with_p.withColumn(
            "count",
            _decayed_count_col(F.col("count"), F.col("t"), now_us, rate, prune, law, mode, seed),
        )
        if prune:
            out = out.filter(F.col("count") > 0)
    else:
        out = with_z_and_p(decayed_state(snap, now_us, rate, prune, law, mode, seed))
    return out.filter(F.col("bin").isin(fields)).select(
        "distribution", "bin", "count", "Z", "p"
    )


def n_most_probable(
    snap: DataFrame,
    n: int = 10,
    now_us: int | Column = 0,
    distribution: str | None = None,
    rate: float = GOFORGET_DEFAULT_RATE,
    prune: bool = True,
    law: str = "linear",
    mode: str = "expected",
    seed: int = 0,
) -> DataFrame:
    """R3 ``/nmostprobable``: per-distribution top-N bins.

    Reference fidelity (SURVEY.md §2.3 item 4): selection happens on the
    **un-decayed** counts (Redis ``ZREVRANGEBYSCORE … LIMIT 0 N`` runs
    before any decay, ``goforget/redis_utils.go:211-220``), decay applies
    to the N selected rows, and pruned rows vanish from the response — so
    fewer than N rows can come back. Ties break ascending by bin name for
    a deterministic total order. ``Z``/``p`` come from the full decayed
    distribution (normative full-Z semantics).

    Plan shape: for a single distribution this is
    ``TakeOrderedAndProject``-able; for all distributions it is one window
    (``row_number`` over (distribution | count desc, bin asc)) over the
    already-collapsed snapshot — the Spark analogue of the reference's
    store-side sort+limit pushdown.
    """
    if distribution is not None:
        snap = snap.filter(F.col("distribution") == distribution)
    order = [F.col("count").desc(), F.col("bin").asc()]
    rank = F.row_number().over(Window.partitionBy("distribution").orderBy(*order))
    ranked = snap.withColumn("rank", rank)
    decayed = ranked.withColumn(
        "count_decayed",
        _decayed_count_col(F.col("count"), F.col("t"), now_us, rate, prune, law, mode, seed),
    )
    if prune:
        decayed = decayed.filter(F.col("count_decayed") > 0)
    decayed = decayed.withColumn(
        "Z", F.sum("count_decayed").over(Window.partitionBy("distribution"))
    )
    out = (
        decayed.filter(F.col("rank") <= n)
        .withColumn(
            "p",
            F.when(F.col("Z") == 0, F.lit(0.0)).otherwise(
                F.col("count_decayed").cast("double") / F.col("Z").cast("double")
            ),
        )
        .select(
            "distribution",
            "bin",
            F.col("count_decayed").alias("count"),
            "Z",
            "p",
            "rank",
        )
    )
    return out


def db_size(
    snap_or_events: DataFrame,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """R4 ``/dbsize``: number of stored distributions.

    The reference divides Redis ``DBSIZE`` by its 3-keys-per-distribution
    layout (``goforget/forget.go:168``). Here: exact ``count(distinct)``,
    or HyperLogLog++ (``approx_count_distinct``) for the 100 TB path where
    an exact distinct forces a full shuffle of distribution names.
    """
    agg = (
        F.approx_count_distinct("distribution", rsd=rsd)
        if approx
        else F.countDistinct("distribution")
    )
    return snap_or_events.agg(agg.alias("db_size"))


def live_distributions(
    snap: DataFrame,
    now_us: int | Column,
    rate: float = GOFORGET_DEFAULT_RATE,
    sigma: float = DEFAULT_SIGMA,
) -> DataFrame:
    """D3 expiry filter: distributions still inside their decay horizon.

    A distribution is live iff ``now - t <= (σ+η)·η`` with
    ``η = sqrt(max_count/rate)`` — the same horizon the reference sets as
    a Redis TTL (``goforget/redis_utils.go:184-189``). Returns
    (distribution, max_count, t, horizon_sec).

    One aggregation over the snapshot; the filter is a scalar comparison —
    no shuffle beyond the groupBy.
    """
    per_dist = snap.groupBy("distribution").agg(
        F.max("count").alias("max_count"),
        F.max("t").alias("t"),
    )
    horizon = expiry_horizon_seconds(F.col("max_count"), rate, sigma)
    age_sec = (_now_col(now_us) - F.unix_micros(F.col("t"))).cast("double") / F.lit(1e6)
    return (
        per_dist.withColumn("horizon_sec", horizon)
        .filter(age_sec <= F.col("horizon_sec"))
        .select("distribution", "max_count", "t", "horizon_sec")
    )
