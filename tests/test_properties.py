"""Property-based spot checks (SURVEY.md §5.4) over the pure-Python
formula oracle — which the Spark expressions are asserted equal to in
test_functions.py, so properties proven here transfer."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

import py_oracle as O

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
series = st.lists(finite, min_size=1, max_size=21)


@given(series)
@settings(max_examples=300, deadline=None)
def test_autocorr_roughly_bounded(xs):
    """Lag-1 autocorr of the reference formula: |num| ≤ den + slack by
    Cauchy-Schwarz on the overlapping terms (partial-sum asymmetry allows
    small excursions past ±1, bounded by the n/(n−1) factor)."""
    v = O.autocorr(xs)
    assert -2.0 <= v <= 2.0
    if len(set(xs)) == 1:
        assert v == 0.0  # constant series: den < tol → 0


@given(series, st.floats(min_value=0.5, max_value=2.0))
@settings(max_examples=200, deadline=None)
def test_autocorr_scale_invariant(xs, k):
    """Autocorrelation is invariant under positive scaling (up to float
    noise) — both num and den scale by k²."""
    a, b = O.autocorr(xs), O.autocorr([k * x for x in xs])
    assert math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)


@given(series)
@settings(max_examples=200, deadline=None)
def test_ema_bounded_by_series_extremes(xs):
    for span in (9, 21):
        out = O.ema(xs, span)
        assert len(out) == len(xs)
        lo, hi = min(xs), max(xs)
        eps = 1e-9 * max(1.0, abs(lo), abs(hi))
        assert all(lo - eps <= v <= hi + eps for v in out)


@given(st.lists(finite, min_size=2, max_size=21), st.floats(min_value=0.5, max_value=2.0))
@settings(max_examples=200, deadline=None)
def test_slope_scale_invariant(xs, k):
    """Pct-change slope is invariant under positive scaling (unless the
    tolerance guard flips: |first| < tol before or after scaling)."""
    if abs(xs[0]) < 1e-5:  # keep clear of the guard boundary
        return
    a, b = O.slope(xs), O.slope([k * x for x in xs])
    assert math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)


@given(finite, finite, finite)
@settings(max_examples=300, deadline=None)
def test_location_value_bounded_when_inside(a, h, lo):
    """CLV/OLV ∈ [-1, 1] whenever the anchor lies within [low, high]."""
    h, lo = max(h, lo), min(h, lo)
    a = max(lo, min(h, a))
    v = O.location_value(a, h, lo)
    if abs(h - lo) >= 1e-6:
        assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9
    else:
        assert v == 0.0


@given(st.lists(finite, min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_ema_converges_to_constant(xs):
    """Appending many copies of a constant drives the EMA to it."""
    tail = [42.0] * 200
    out = O.ema(xs + tail, 9)
    assert math.isclose(out[-1], 42.0, rel_tol=1e-6, abs_tol=1e-6)


@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=200),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_merge_guarantees(partitions, k):
    """The merged per-partition Misra–Gries guarantees behind
    agg_heavy_hitters_sketch, on adversarial streams and splits:
    est ≤ exact, exact − est ≤ Σ decrements, and every token with
    exact·(k+1) > n survives in the merged summary."""
    from collections import Counter

    from strategy_analyzer_exporter_spark.operators.pipeline3 import mg_summary

    exact = Counter(t for part in partitions for t in part)
    n = sum(exact.values())
    merged: dict[str, int] = {}
    bound = 0
    for part in partitions:
        counters, dec = mg_summary(iter(part), k)
        bound += dec
        for t, c in counters.items():
            merged[t] = merged.get(t, 0) + c
    for t, c in exact.items():
        est = merged.get(t, 0)
        assert est <= c
        assert c - est <= bound, (t, c, est, bound)
        if c * (k + 1) > n:
            assert t in merged, (t, c, n, k)


@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=200),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=2, max_value=16),
)
@settings(max_examples=200, deadline=None)
def test_count_min_linearity_and_no_underestimate(partitions, d, w):
    """The count-min guarantees behind agg_heavy_hitters_cms, on
    adversarial streams and splits: (1) LINEARITY — the elementwise sum
    of per-partition matrices equals the matrix of the whole stream, so
    the merged estimate is partition-invariant by construction; (2) the
    min-over-rows estimate never underestimates any token's exact
    count; (3) per-row overestimate is exactly the colliding tokens'
    mass (the oracle's bucket-sum definition)."""
    from collections import Counter

    from strategy_analyzer_exporter_spark.operators.pipeline3 import (
        cms_bucket,
        cms_matrix,
    )

    whole = cms_matrix((t for part in partitions for t in part), d, w)
    merged = [[0] * w for _ in range(d)]
    for part in partitions:
        m = cms_matrix(iter(part), d, w)
        for di in range(d):
            for wi in range(w):
                merged[di][wi] += m[di][wi]
    assert merged == whole  # linearity: split-invariant by sums
    exact = Counter(t for part in partitions for t in part)
    for t, c in exact.items():
        est = min(merged[di][cms_bucket(di, t, w)] for di in range(d))
        assert est >= c, (t, c, est)
        # est_d - exact == sum of OTHER tokens in the same bucket
        for di in range(d):
            b = cms_bucket(di, t, w)
            others = sum(
                cc for tt, cc in exact.items()
                if tt != t and cms_bucket(di, tt, w) == b
            )
            assert merged[di][b] - c == others
