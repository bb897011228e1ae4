"""Property-based tests (hypothesis) for the decay laws — SURVEY.md §5
item 1: monotonicity, clamps, wipe threshold, cross-tier consistency
(the streaming operator's pure-Python law must equal the batch Catalyst
expression on arbitrary inputs).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from forgettable_spark.functions.sampling import poisson_inverse_cdf
from forgettable_spark.streaming.forget_stream import _decay_counts


def model_decay(count: int, rate: float, dt: float, prune: bool, law: str) -> int:
    """Reference model of the expected-mode law (mirrors SURVEY §2.1 D1)."""
    lam = rate * dt if law == "linear" else count * rate * dt
    k = math.floor(lam)
    return max(count - k, 0 if prune else 1)


@given(
    count=st.integers(1, 10**9),
    rate=st.floats(1e-9, 10.0, allow_nan=False),
    dt=st.floats(0.0, 10**7, allow_nan=False),
    prune=st.booleans(),
    law=st.sampled_from(["linear", "proportional"]),
)
@settings(max_examples=300, deadline=None)
def test_streaming_law_matches_model(count, rate, dt, prune, law):
    got = _decay_counts([count], dt, rate, prune, law)[0]
    assert got == model_decay(count, rate, dt, prune, law)


@given(
    count=st.integers(1, 10**6),
    rate=st.floats(1e-6, 2.0, allow_nan=False),
    dt1=st.floats(0.0, 10**5, allow_nan=False),
    dt2=st.floats(0.0, 10**5, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_decay_monotone_in_dt(count, rate, dt1, dt2):
    lo, hi = sorted([dt1, dt2])
    assert model_decay(count, rate, hi, True, "linear") <= model_decay(
        count, rate, lo, True, "linear"
    )
    assert _decay_counts([count], hi, rate, True, "linear")[0] <= _decay_counts(
        [count], lo, rate, True, "linear"
    )[0]


@given(
    lam=st.floats(0.0, 50.0, allow_nan=False),
    u1=st.floats(0.0, 0.999999, allow_nan=False),
    u2=st.floats(0.0, 0.999999, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_poisson_inverse_cdf_monotone_in_u(lam, u1, u2):
    lo, hi = sorted([u1, u2])
    ks = poisson_inverse_cdf(np.array([lam, lam]), np.array([lo, hi]))
    assert ks[0] <= ks[1]


@given(lam=st.floats(18.5, 1e6, allow_nan=False), u=st.floats(0.0, 0.999999))
@settings(max_examples=100, deadline=None)
def test_wipe_guard_above_threshold(lam, u):
    """e^-λ < 1e-8 (λ ≳ 18.42) always wipes, as in goforget/decay.go:17-19."""
    assert poisson_inverse_cdf(np.array([lam]), np.array([u]))[0] == np.iinfo(np.int64).max


@given(lam=st.floats(0.001, 15.0, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_poisson_inverse_cdf_is_true_quantile(lam):
    """k(u) must satisfy CDF(k-1) <= u < CDF(k) at a few probe points."""
    from math import exp

    def cdf(k):
        p, s = exp(-lam), exp(-lam)
        for i in range(1, k + 1):
            p *= lam / i
            s += p
        return s

    for u in (0.1, 0.5, 0.9):
        k = int(poisson_inverse_cdf(np.array([lam]), np.array([u]))[0])
        assert cdf(k) > u
        if k > 0:
            assert cdf(k - 1) <= u
