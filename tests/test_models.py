"""Forecast-model accuracy tests on seeded simulations."""

import numpy as np

from kats_spark.models import ar, fcst
from kats_spark.operators import simulator, trend


def test_linear_forecast_recovers_trend(spark):
    df = simulator.simulate(
        spark, n_series=2, n_points=200, trend_slope=0.5, noise_std=0.5, seed=20
    )
    fit = trend.linear_fit(df).toPandas()
    assert np.allclose(fit.slope, 0.5, atol=0.05)
    fc = trend.linear_forecast(df, steps=10, freq_seconds=3600).toPandas()
    assert len(fc) == 20
    last = fc.groupby("series_id").fcst.max()
    assert (last > 95).all()  # ~0.5 * 209
    assert (fc.fcst_upper > fc.fcst).all() and (fc.fcst_lower < fc.fcst).all()


def test_ar2_recovers_coefficients(spark):
    df = simulator.arma_sim(
        spark, n_series=2, n_points=2000, ar=[0.6, -0.3], ma=[], noise_std=1.0, seed=21
    )
    fit = ar.ar2_fit(df).toPandas()
    assert np.allclose(fit.phi1, 0.6, atol=0.1)
    assert np.allclose(fit.phi2, -0.3, atol=0.1)


def test_ses_flat_forecast_near_level(spark):
    df = simulator.simulate(spark, n_series=1, n_points=150, noise_std=1.0, seed=22)
    fc = fcst.forecast(df, "ses", steps=5, freq_seconds=3600).toPandas()
    assert len(fc) == 5
    assert fc.fcst.std() < 1e-9  # SES forecast is flat
    assert abs(fc.fcst.iloc[0]) < 2.0  # near the zero level


def test_holt_tracks_trend(spark):
    df = simulator.simulate(
        spark, n_series=1, n_points=150, trend_slope=1.0, noise_std=0.5, seed=23
    )
    fc = fcst.forecast(df, "holt", steps=10, freq_seconds=3600).toPandas()
    diffs = fc.fcst.diff().dropna()
    assert np.allclose(diffs, 1.0, atol=0.3)


def test_holtwinters_tracks_seasonality(spark):
    df = simulator.simulate(
        spark, n_series=1, n_points=240, noise_std=0.3,
        seasonal_period=12, seasonal_magnitude=5.0, seed=24,
    )
    fc = fcst.forecast(
        df, "holtwinters", steps=12, freq_seconds=3600, period=12
    ).toPandas()
    # forecast amplitude should reflect the injected seasonality
    assert fc.fcst.max() - fc.fcst.min() > 6.0


def test_theta_between_ses_and_trend(spark):
    df = simulator.simulate(
        spark, n_series=1, n_points=200, trend_slope=0.5, noise_std=0.5, seed=25
    )
    fc = fcst.forecast(df, "theta", steps=10, freq_seconds=3600).toPandas()
    diffs = fc.fcst.diff().dropna()
    # theta(2) carries half the drift
    assert np.allclose(diffs, 0.25, atol=0.15)
