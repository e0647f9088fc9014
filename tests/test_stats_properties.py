"""Property-based tests of the statistics core (hypothesis).

Invariants the reference's formulas imply (SURVEY.md §2.2 A2-A4) that must
hold for ALL valid inputs, not just the table values pinned in
tests/test_stats.py.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from random_sampling_based_approximate_mapreduce_spark.sampling import stats
from random_sampling_based_approximate_mapreduce_spark.sampling.config import SamplingConfig

conf = st.floats(min_value=0.01, max_value=0.999)
err = st.floats(min_value=1e-4, max_value=0.5)
pop = st.floats(min_value=10.0, max_value=1e12)


@given(st.floats(min_value=0.50, max_value=0.999))
def test_z_exact_ge_reference_step_table(c):
    # Within the table's domain [0.5, 0.999], the step table returns the z
    # of the largest tabulated confidence <= c, so the exact inverse-CDF z
    # is always >= the table's (equal at knots, up to the table's 3-decimal
    # rounding: 3.291 vs exact 3.29053). Below 0.5 the reference's lookup
    # falls back to its first row — no monotone relation there.
    assert stats.z_score(c) >= stats.z_score_reference(c) - 1e-3


@given(conf, err, pop)
def test_cochran_ratio_in_unit_interval(c, e, n):
    r = stats.cochran_ratio(c, e, n)
    assert 0.0 < r <= 1.0


@given(conf, st.floats(min_value=1e-4, max_value=0.4), pop)
def test_tighter_error_needs_bigger_sample(c, e, n):
    assert stats.cochran_ratio(c, e / 2, n) > stats.cochran_ratio(c, e, n)


@given(st.floats(min_value=0.05, max_value=0.9), err, pop)
def test_higher_confidence_needs_bigger_sample(c, e, n):
    assert stats.cochran_ratio(c + 0.05, e, n) >= stats.cochran_ratio(c, e, n)


@given(conf, err, st.floats(min_value=100.0, max_value=1e10))
@settings(max_examples=50)
def test_solver_and_error_estimator_are_consistent(c, e, n):
    """Sampling at the solved size must achieve the requested error:
    algebraically err(n_solved) = e * sqrt(N/(N-1)), so with the ceil the
    solver contract uses (sample_size_for), achieved <= e * 1.01 at
    N >= 100. (With floor instead, a tiny N inflates the finite-population
    term and the bound genuinely fails — the ceil is load-bearing.)"""
    sampled = stats.sample_size_for(c, e, n)
    achieved = stats.achieved_error(c, sampled, int(n))
    assert achieved <= e * math.sqrt(n / (n - 1.0)) + 1e-9


@given(conf, st.integers(min_value=1, max_value=10**9))
def test_full_sample_has_zero_error(c, n):
    assert stats.achieved_error(c, n, n) == 0.0


@given(conf, st.integers(min_value=2, max_value=10**6))
def test_error_shrinks_with_sample_size(c, n):
    total = 10**7
    assert stats.achieved_error(c, n, total) < stats.achieved_error(c, n - 1, total)


@given(st.floats(min_value=0.001, max_value=1.0), st.floats(min_value=0.0, max_value=1e9))
def test_scale_up_inverts_sampling_rate(r, v):
    assert math.isclose(stats.scale_up(v * r, r), v, rel_tol=1e-9, abs_tol=1e-9)


@given(st.floats(min_value=-5.0, max_value=5.0))
def test_config_resolution_never_yields_invalid_ratio(ratio):
    cfg = SamplingConfig(ratio=ratio)
    r = cfg.resolve()
    assert 0.0 < r <= 1.0


@given(conf, err, st.integers(min_value=1, max_value=10))
def test_config_accuracy_path_matches_cochran(c, e, bits):
    cfg = SamplingConfig(ratio=None, confidence=c, error_bound=e, input_bits=bits)
    assert cfg.resolve() == min(1.0, stats.cochran_ratio(c, e, 10.0**bits))
