"""Stochastic decay mode: seeded Poisson sampling as a vectorized pandas UDF.

Faithful to the reference sampler — inverse-CDF sequential search with the
``e^-λ < 1e-8`` wipe guard (``goforget/decay.go:12-34``) — but driven by a
*deterministic* uniform per row instead of a global RNG. The uniform comes
from a stable 64-bit hash of ``(seed, now, distribution, bin)``, which buys
three properties the reference lacks:

- **reproducible**: the same query with the same seed returns the same
  counts, run-to-run and machine-to-machine;
- **partition-independent**: results don't depend on how Spark splits or
  orders the data — mandatory for a distributed engine (a task retry or an
  AQE re-plan must not change query results);
- **still Poisson**: for a fixed (distribution, bin) the uniform is an
  arbitrary-but-fixed quantile, and across bins/instants the hash behaves
  as i.i.d. uniforms, so aggregate statistics match the reference law
  (verified in tests/test_sampling.py).

Arrow-batched and numpy-vectorized throughout — the sequential search loops
at most ``O(max_k)`` times per *batch*, not per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from forgettable_spark.functions.decay import dt_seconds

#: Reference wipe guard: pmf start e^-λ below this → treat the bin as fully
#: decayed (goforget/decay.go:17-19 returns MaxInt32).
_PMF_EPSILON = 1e-8


def _stable_uniforms(distribution: pd.Series, bin: pd.Series, now_us: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic u ∈ [0,1) per row from (seed, now, distribution, bin).

    ``pd.util.hash_pandas_object`` is a stable (process-independent) 64-bit
    hash; we fold ``seed`` and ``now`` into the key material so re-querying
    at a new instant redraws, as the reference's RNG would.
    """
    key = distribution.astype(str) + "\x1f" + bin.astype(str) + "\x1f" + pd.Series(now_us).astype(str)
    h = pd.util.hash_pandas_object(key, index=False, hash_key=f"{seed:016d}"[:16]).to_numpy()
    # top 53 bits → uniform double in [0, 1)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def poisson_inverse_cdf(lam: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Vectorized inverse-CDF sequential search, reference semantics.

    k = min { j : Σ_{i<=j} pmf(i) > u }, with the λ-too-large wipe guard:
    rows where ``e^-λ < 1e-8`` return INT64_MAX (decay everything).
    """
    lam = np.asarray(lam, dtype=np.float64)
    out = np.zeros(lam.shape, dtype=np.int64)
    p0 = np.exp(-lam)
    wipe = p0 < _PMF_EPSILON
    out[wipe] = np.iinfo(np.int64).max
    active = ~wipe & (lam > 0)
    if not active.any():
        return out
    k = np.zeros(lam.shape, dtype=np.int64)
    pmf = p0.copy()
    cdf = p0.copy()
    need = active & (cdf <= u)
    while need.any():
        k[need] += 1
        pmf[need] *= lam[need] / k[need]
        prev = cdf.copy()
        cdf[need] += pmf[need]
        # Terminate rows whose cdf can no longer advance: once pmf drops
        # below one ulp of cdf the float sum plateaus (possibly strictly
        # below the largest representable u), and without this guard a
        # row with u beyond the plateau would loop forever. Past the mode
        # pmf only shrinks, so a stalled row stays stalled — return its
        # current k (u sits in the unrepresentable far tail).
        need = need & (cdf <= u) & (cdf > prev)
    out[active] = k[active]
    return out


def make_poisson_decay_udf(rate: float, prune: bool, law: str, seed: int):
    """Build the pandas UDF ``(count, dt_sec, distribution, bin, now_us) ->
    decayed count`` closing over the decay parameters."""

    def _decay(
        count: pd.Series,
        dt_sec: pd.Series,
        distribution: pd.Series,
        bin: pd.Series,
        now_us: pd.Series,
    ) -> pd.Series:
        c = count.to_numpy(dtype=np.int64)
        dt = np.maximum(dt_sec.to_numpy(dtype=np.float64), 0.0)
        if law == "linear":
            lam = rate * dt  # goforget/decay.go:47 — count-independent
        elif law == "proportional":
            lam = c.astype(np.float64) * rate * dt  # pyforget/distribution.py:29
        else:
            raise ValueError(f"unknown decay law: {law!r}")
        u = _stable_uniforms(distribution, bin, now_us.to_numpy(), seed)
        k = poisson_inverse_cdf(lam, u)
        clamp = c if prune else np.maximum(c - 1, 0)  # goforget/distribution.go:158-164
        # count < 1 never decays (goforget/decay.go:41-43) — without this a
        # negative raw count would be *inflated* by the prune clamp.
        decay = np.where(c < 1, 0, np.minimum(k, clamp))
        return pd.Series(c - decay)

    return F.pandas_udf(_decay, LongType())


def poisson_decay_column(
    count: Column,
    t: Column,
    now_us: int | Column,
    rate: float,
    prune: bool = True,
    law: str = "linear",
    seed: int = 0,
    distribution: Column | None = None,
    bin: Column | None = None,
) -> Column:
    """Post-decay count (BIGINT) under seeded stochastic Poisson decay.

    Drop-in replacement for :func:`forgettable_spark.functions.decay.
    decayed_count`; composes with the same prune filter / normalize /
    top-N operators.
    """
    now_col = F.lit(now_us).cast("bigint") if isinstance(now_us, int) else now_us
    dist_col = distribution if distribution is not None else F.col("distribution")
    bin_col = bin if bin is not None else F.col("bin")
    udf = make_poisson_decay_udf(rate, prune, law, seed)
    return udf(count, dt_seconds(t, now_col), dist_col, bin_col, now_col)
