"""Loess STL: seeded component recovery, robustness, and Spark wiring.

The decomposition is iterative loess (no SQL oracle), so correctness is
established against the generating process: on synthetic trend + seasonal
+ noise series the recovered components must track the true ones, the
residual variance must shrink to the noise, strengths must hit their
analytical targets, and robust mode must shrug off injected outliers.
"""

import numpy as np
import pandas as pd
import pytest

from kats_spark.operators.stl import stl_decompose, stl_decompose_np, stl_strengths


def _mk(n=288, per=12, seed=0, trend_slope=0.05, amp=4.0, noise=0.3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    trend = 10 + trend_slope * t + 2 * np.sin(2 * np.pi * t / 300)
    seas = amp * np.sin(2 * np.pi * t / per) + 1.5 * np.cos(4 * np.pi * t / per)
    eps = rng.normal(0, noise, n)
    return t, trend, seas, eps


def test_stl_recovers_components():
    t, trend, seas, eps = _mk()
    y = trend + seas + eps
    T, S, R = stl_decompose_np(y, 12)
    assert np.sqrt(np.mean((T - trend) ** 2)) < 0.15
    assert np.sqrt(np.mean((S - seas) ** 2)) < 0.25
    assert R.std() < 1.5 * eps.std()
    # components reassemble exactly
    np.testing.assert_allclose(T + S + R, y, rtol=0, atol=1e-9)
    # strengths on a strongly structured series
    vr = R.var(ddof=1)
    assert 1 - vr / np.var(T + R, ddof=1) > 0.97
    assert 1 - vr / np.var(S + R, ddof=1) > 0.97


def test_stl_noise_only_has_weak_strengths():
    rng = np.random.default_rng(1)
    y = rng.normal(0, 1, 240)
    T, S, R = stl_decompose_np(y, 12)
    vr = R.var(ddof=1)
    assert 1 - vr / np.var(S + R, ddof=1) < 0.5


def test_stl_robust_resists_outliers():
    t, trend, seas, eps = _mk(seed=3)
    y = trend + seas + eps
    y_dirty = y.copy()
    y_dirty[50] += 30
    y_dirty[150] -= 25
    mask = np.ones(len(y), bool)
    mask[[50, 150]] = False
    T_r, _, _ = stl_decompose_np(y_dirty, 12, robust=True)
    T_n, _, _ = stl_decompose_np(y_dirty, 12, robust=False)
    err_r = np.sqrt(np.mean((T_r[mask] - trend[mask]) ** 2))
    err_n = np.sqrt(np.mean((T_n[mask] - trend[mask]) ** 2))
    assert err_r < 0.2 and err_r < err_n / 2


def test_stl_seasonal_tracks_amplitude_change():
    """Unlike the phase-mean MA seasonal, STL's seasonal is time-varying:
    a series whose seasonal amplitude doubles halfway through must show a
    larger seasonal swing in the second half."""
    n, per = 480, 12
    t = np.arange(n)
    amp = np.where(t < n // 2, 2.0, 4.0)
    y = 5.0 + amp * np.sin(2 * np.pi * t / per)
    _, S, _ = stl_decompose_np(y, per, seasonal=7)
    first = np.abs(S[: n // 4]).max()  # away from the amplitude jump
    second = np.abs(S[3 * n // 4 :]).max()
    assert second > 1.6 * first


def test_stl_multiplicative_log_transform(spark):
    """model='multiplicative' log-transforms then exponentiates (the
    reference pre/post transform): components multiply back to the data."""
    n, per = 144, 12
    t = np.arange(n)
    y = (112 + 2.5 * t) * (1 + 0.25 * np.sin(2 * np.pi * t / per))
    pdf = pd.DataFrame(
        {
            "series_id": "ap",
            "time": pd.date_range("2020-01-01", periods=n, freq="MS"),
            "value": y,
        }
    )
    out = (
        stl_decompose(spark.createDataFrame(pdf), per, model="multiplicative")
        .toPandas()
        .sort_values("time")
    )
    recon = out.trend * out.seasonal * out.residual
    np.testing.assert_allclose(recon, y, rtol=1e-9)
    assert (out.seasonal.max() > 1.1) and (out.seasonal.min() < 0.9)


def test_stl_spark_matches_numpy_kernel(spark):
    t, trend, seas, eps = _mk(seed=5)
    y = trend + seas + eps
    pdf = pd.DataFrame(
        {
            "series_id": "s1",
            "time": pd.date_range("2024-01-01", periods=len(y), freq="h"),
            "value": y,
        }
    )
    got = (
        stl_decompose(spark.createDataFrame(pdf), 12)
        .toPandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    T, S, R = stl_decompose_np(y, 12)
    np.testing.assert_allclose(got.trend, T, rtol=1e-12)
    np.testing.assert_allclose(got.seasonal, S, rtol=1e-12)
    np.testing.assert_allclose(got.residual, R, rtol=1e-12)


def test_stl_strengths_and_consumers(spark):
    t, trend, seas, eps = _mk(seed=7)
    y = trend + seas + eps
    frames = []
    for sid in ("a", "b"):
        frames.append(
            pd.DataFrame(
                {
                    "series_id": sid,
                    "time": pd.date_range("2024-01-01", periods=len(y), freq="h"),
                    "value": y + (10 if sid == "b" else 0),
                }
            )
        )
    df = spark.createDataFrame(pd.concat(frames))
    st = stl_strengths(df, 12).toPandas().set_index("series_id")
    assert (st.trend_strength > 0.95).all() and (st.seasonality_strength > 0.95).all()

    # consumers accept method='stl'
    from kats_spark.operators.outlier import outlier_detect

    dirty = pd.concat(frames)
    dirty.loc[dirty.index[40], "value"] += 50.0
    od = outlier_detect(spark.createDataFrame(dirty), 12, method="stl").toPandas()
    assert od.is_outlier.sum() >= 1

    from kats_spark.models.stlf import stlf_forecast

    fc = stlf_forecast(
        df, steps=12, freq_seconds=3600, period=12, method="stl"
    ).toPandas()
    assert len(fc) == 24 and fc.fcst.notna().all()
    # forecast must carry the seasonal swing forward
    per_series_amp = fc.groupby("series_id").fcst.agg(lambda v: v.max() - v.min())
    assert (per_series_amp > 4.0).all()

    from kats_spark.models.kats_ensemble import kats_ensemble_forecast

    ens = kats_ensemble_forecast(
        df, steps=6, freq_seconds=3600, period=12, method="stl"
    ).toPandas()
    assert len(ens) == 12 and ens.fcst.notna().all()


def test_stl_rejects_short_series():
    with pytest.raises(ValueError):
        stl_decompose_np(np.arange(10.0), 12)


# ---------------------------------------------------------------------
# statsmodels-EXACT kernel (r11) — both statsmodels eras pinned by the
# reference's OWN committed expectations.
# ---------------------------------------------------------------------

# kats/tests/tsfeatures/test_tsfeatures.py:28-58 SAMPLE_INPUT_TS_BOCPD_SCALED
_BOCPD_25 = np.array([
    -0.35010234, -0.40149659, -0.1959196, -0.43233314, -0.41177544,
    -0.44650963, 0.0447223, -0.39208192, -0.22477185, -0.11754892,
    -0.45114025, 2.31030965, -0.45090788, 3.12980422, 2.55511448,
    -0.45273205, -0.45397689, -0.44716349, -0.45230305, -0.45431129,
    -0.44282053, -0.44267253, -0.11942641, -0.45190004, -0.44805678,
])


def _stl_block(T, S, R):
    """get_stl_features' three residual statistics (tsfeatures.py:766-792)."""
    ts_ = 1 - np.var(R) / np.var(T + R)
    ss_ = 1 - np.var(R) / np.var(S + R)
    ra = np.repeat(R[:, None], len(R), axis=1)
    ra[np.diag_indices(len(R))] = np.nan
    return ts_, ss_, float(np.var(np.nanvar(ra, axis=0)))


def test_stl_statsmodels_both_eras():
    """The exact port reproduces the reference's version-gated test
    expectations on its own 25-point fixture
    (kats/tests/tsfeatures/test_tsfeatures.py:156-196): statsmodels
    >=0.12 values with the DEFAULT trend window (the reference pins
    statsmodels==0.12.2), and the <0.12 values with that era's default
    trend window (smallest odd >= 1.5*period = 11) — proving the only
    STL divergence ever present was statsmodels' own version drift."""
    from kats_spark.operators.stl import stl_statsmodels_np

    # era >= 0.12 (reference's pinned runtime): default trend window 15
    ts_, ss_, spk = _stl_block(*stl_statsmodels_np(_BOCPD_25, 7))
    assert round(ts_, 6) == 0.426899
    assert round(ss_, 6) == 0.410921
    assert round(spk, 6) == 0.000661
    # era < 0.12 (the committed METALEARNING vectors): trend window 11
    ts_, ss_, spk = _stl_block(*stl_statsmodels_np(_BOCPD_25, 7, trend=11))
    assert round(ts_, 4) == 0.5364
    assert round(ss_, 4) == 0.4646
    assert round(spk, 4) == 0.0004


def test_stl_statsmodels_kernel_properties():
    """Structural invariants of the exact kernel: linear data passes
    through untouched (seasonal ~ 0), the vectorized interior fast path
    agrees with the scalar boundary path (continuity at the seams is
    implied by exactness above), seasonal jump/robust paths run, and
    the decompose DataFrame op exposes kernel='statsmodels'."""
    from kats_spark.operators.stl import stl_statsmodels_np

    lin = 1.0 + 0.25 * np.arange(40)
    T, S, R = stl_statsmodels_np(lin, 7)
    assert np.abs(S).max() < 1e-10 and np.abs(T - lin).max() < 1e-10
    # robustness iterations down-weight a gross outlier's pull on trend
    rng = np.random.default_rng(7)
    y = np.sin(np.arange(84) * 2 * np.pi / 7) + 0.05 * np.arange(84)
    y_dirty = y.copy()
    y_dirty[40] += 30.0
    T_r, _, _ = stl_statsmodels_np(y_dirty, 7, robust=True)
    T_n, _, _ = stl_statsmodels_np(y_dirty, 7, robust=False)
    tru = 0.05 * np.arange(84)
    win = slice(35, 46)
    assert np.abs(T_r[win] - tru[win]).max() < np.abs(T_n[win] - tru[win]).max()
    # jump > 1 evaluates at stride + interpolates, stays close to jump=1
    T1j, S1j, _ = stl_statsmodels_np(y, 7)
    T2j, S2j, _ = stl_statsmodels_np(
        y, 7, seasonal_jump=2, trend_jump=2, low_pass_jump=2
    )
    assert np.abs(T2j - T1j).max() < 0.05 * (np.abs(T1j).max() + 1)
    with pytest.raises(ValueError):
        stl_statsmodels_np(np.arange(10.0), 12)


def test_stl_decompose_statsmodels_kernel(spark):
    from kats_spark.operators.stl import stl_statsmodels_np

    y = np.sin(np.arange(60) * 2 * np.pi / 12) * 3 + 0.1 * np.arange(60)
    pdf = pd.DataFrame(
        {
            "series_id": "a",
            "time": pd.date_range("2024-01-01", periods=60, freq="h"),
            "value": y,
        }
    )
    out = (
        stl_decompose(spark.createDataFrame(pdf), 12, kernel="statsmodels")
        .toPandas()
        .sort_values("time")
    )
    T, S, R = stl_statsmodels_np(y, 12)
    np.testing.assert_allclose(out.trend.to_numpy(), T, rtol=0, atol=1e-9)
    np.testing.assert_allclose(out.seasonal.to_numpy(), S, rtol=0, atol=1e-9)
