"""Property-based tests (hypothesis) for the numeric kernels whose
correctness claims are algebraic — complementing the oracle/seeded suites
with randomized invariants."""

import numpy as np
from hypothesis import given, settings, strategies as st

from kats_spark.models.arima import (
    _ar_to_pacf,
    _constrain,
    _kalman_loglik,
    _pacf_to_ar,
    _unconstrain,
)


@st.composite
def stationary_arma(draw):
    p = draw(st.integers(0, 3))
    q = draw(st.integers(0, 2))
    if p + q == 0:
        p = 1
    z = np.array(
        draw(
            st.lists(
                st.floats(-2.0, 2.0, allow_nan=False, allow_infinity=False),
                min_size=p + q,
                max_size=p + q,
            )
        )
    )
    phi, theta = _constrain(z, p, q)
    return phi, theta


@settings(max_examples=60, deadline=None)
@given(stationary_arma())
def test_pacf_parameterization_always_stationary_invertible(pt):
    """Every point of the unconstrained space maps to a stationary AND
    invertible ARMA — the property the optimizer relies on."""
    phi, theta = pt
    if len(phi):
        assert np.all(np.abs(np.roots(np.r_[1.0, -phi])) < 1.0 + 1e-9)
    if len(theta):
        assert np.all(np.abs(np.roots(np.r_[1.0, theta])) < 1.0 + 1e-9)


@settings(max_examples=60, deadline=None)
@given(stationary_arma())
def test_pacf_transform_roundtrip_property(pt):
    """unconstrain(constrain(z)) round-trips through coefficient space."""
    phi, theta = pt
    z = _unconstrain(phi, theta)
    phi2, theta2 = _constrain(z, len(phi), len(theta))
    assert np.allclose(phi2, phi, atol=1e-8)
    assert np.allclose(theta2, theta, atol=1e-8)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(-0.95, 0.95, allow_nan=False), min_size=1, max_size=4
    )
)
def test_durbin_levinson_inverse_property(pacs):
    """_ar_to_pacf inverts _pacf_to_ar for any |pacf| < 1 vector."""
    pac = np.array(pacs)
    phi = _pacf_to_ar(pac)
    back = _ar_to_pacf(phi)
    assert np.allclose(back, pac, atol=1e-9)


@settings(max_examples=25, deadline=None)
@given(
    stationary_arma(),
    st.integers(0, 2**31 - 1),
)
def test_kalman_loglik_finite_and_scale_equivariant(pt, seed):
    """On white-noise data the exact likelihood is finite for every
    stationary/invertible parameter, and scaling the data by c shifts
    the loglik by exactly -n*log(c) (Gaussian scale equivariance) while
    multiplying sigma^2 by c^2."""
    phi, theta = pt
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, 200)
    ll, s2 = _kalman_loglik(x, phi, theta)
    assert np.isfinite(ll) and s2 > 0
    c = 3.0
    ll2, s22 = _kalman_loglik(c * x, phi, theta)
    assert abs(ll2 - (ll - len(x) * np.log(c))) < 1e-6
    assert abs(s22 - c * c * s2) < 1e-6 * max(1.0, s2)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(-50, 50, allow_nan=False), min_size=8, max_size=60),
    st.floats(0.05, 0.95),
    st.floats(0.05, 0.95),
    st.floats(0.8, 0.98),
)
def test_damped_holt_forecast_bounded_property(vals, a, b, ph):
    """The damped-Holt infinite-horizon forecast is bounded by
    l + phi/(1-phi)*|b| — the defining damping property."""
    from kats_spark.models.fcst import _holt_damped_fit

    y = np.array(vals)
    _, l, tr = _holt_damped_fit(y, a, b, ph)
    h = np.arange(1, 200)
    fc = l + ph * (1 - ph**h) / (1 - ph) * tr
    bound = abs(ph / (1 - ph) * tr) + 1e-9
    assert np.all(np.abs(fc - l) <= bound)
    # monotone approach to the asymptote
    diffs = np.abs((l + ph / (1 - ph) * tr) - fc)
    assert np.all(np.diff(diffs) <= 1e-9)
