"""State GC: the decay-horizon expiry filter (reference op D3).

The reference gives every distribution's Redis keys a TTL sized so they
expire when the largest bin *would have* decayed to ~0 with σ-confidence
(``goforget/redis_utils.go:184-189``):

    η = sqrt(max_count / rate)            # decay horizon
    expire_seconds = (σ + η) · η          # σ = --expire-sigma, default 2

(The σ·η term is the σ-standard-deviation safety margin of the Poisson
sum: after η seconds the expected total decay is rate·η² = max_count with
stddev sqrt(rate·η²) = sqrt(max_count), so η·σ extra seconds cover σ
deviations.) In the event-sourced engine there is nothing to expire in
place; the equivalent is a *filter*: a distribution is live iff
``now - t <= (σ + η) · η``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: goforget ``--expire-sigma`` default — goforget/forget.go:25.
DEFAULT_SIGMA = 2.0


def expiry_horizon_seconds(max_count: Column, rate: float, sigma: float = DEFAULT_SIGMA) -> Column:
    """``(σ + η)·η`` with ``η = sqrt(max_count / rate)`` (DOUBLE seconds)."""
    eta = F.sqrt(max_count.cast("double") / F.lit(float(rate)))
    return (F.lit(float(sigma)) + eta) * eta
