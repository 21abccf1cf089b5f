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


def test_mult_metric_builders(spark):
    """mult_exceed / mult_coverage / mult_interval_score produce one
    column per quantile/interval with the reference's directional
    semantics (kats/metrics/metrics.py:682,803,856)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kats_spark.functions import metrics as M

    pdf = pd.DataFrame(
        {
            "y":   [1.0, 2.0, 3.0, 4.0],
            "p10": [0.5, 2.5, 2.0, 3.0],   # lower-quantile prediction
            "p90": [2.0, 3.0, 2.5, 5.0],   # upper-quantile prediction
        }
    )
    df = spark.createDataFrame(pdf)
    row = df.agg(
        *M.mult_exceed("y", {0.1: F.col("p10"), 0.9: F.col("p90")}),
        *M.mult_coverage("y", [("p10", "p90", "80")]),
        *M.mult_interval_score("y", [("p10", "p90", 0.2, "80")]),
    ).collect()[0]
    # t<=0.5 -> mean(yhat > y) (reference CODE semantics): p10>y only row 1
    assert abs(row["exceed_0_1"] - 0.25) < 1e-12
    # t>0.5 -> mean(y > yhat): only row 2 (y=3 > 2.5) exceeds p90
    assert abs(row["exceed_0_9"] - 0.25) < 1e-12
    # y inside [p10,p90] for rows 0,3 (1 in [0.5,2], 4 in [3,5])
    assert abs(row["coverage_80"] - 0.5) < 1e-12
    # winkler: width avg + penalties for rows 1 (y=2<2.5) and 2 (y=3>2.5)
    width = (1.5 + 0.5 + 0.5 + 2.0) / 4
    penalty = (2 / 0.2) * (0.5 + 0.5) / 4
    assert abs(row["interval_score_80"] - (width + penalty)) < 1e-12


def test_struc_reconciliation_coherent_and_uses_agg_level(spark):
    import numpy as np
    import pandas as pd

    from kats_spark.operators import reconciliation as rec

    rng = np.random.RandomState(11)
    n = 96
    pdf = pd.DataFrame(
        {
            "series_id": ["a"] * n,
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "value": np.linspace(0, 10, n) + rng.randn(n) * 0.3,
        }
    )
    df = spark.createDataFrame(pdf)
    out = rec.struc_forecast(df, steps=24, freq_seconds=3600, k=6).toPandas()
    base = out[out.level == "base"].sort_values("time")
    agg = out[out.level == "agg"].sort_values("time")
    assert len(base) == 24 and len(agg) == 4
    # coherence: each agg value equals the sum of its 6 base values
    sums = base.fcst.to_numpy().reshape(4, 6).sum(axis=1)
    np.testing.assert_allclose(sums, agg.fcst.to_numpy(), rtol=1e-9)
    # the aggregate-level forecast influences reconciled base values:
    # they differ from plain bottom-up base forecasts
    bu = rec.bottom_up_forecast(df, steps=24, freq_seconds=3600, k=6).toPandas()
    bu_base = bu[bu.level == "base"].sort_values("time").fcst.to_numpy()
    assert np.abs(base.fcst.to_numpy() - bu_base).max() > 1e-9


def test_theta_seasonality_gate_matches_reference_formula(spark):
    """Gate equals the reference's numpy formula (theta.py:100-109) on a
    strongly seasonal and a white-noise series, and triggers only on the
    seasonal one."""
    import numpy as np
    import pandas as pd

    from kats_spark.functions.acf import theta_seasonality_gate

    rng = np.random.RandomState(2)
    n, m = 240, 24
    t = np.arange(n)
    seasonal = 10 * np.sin(2 * np.pi * t / m) + rng.normal(0, 1, n)
    noise = rng.normal(0, 1, n)
    pdf = pd.DataFrame(
        {
            "series_id": ["seasonal"] * n + ["noise"] * n,
            "time": list(pd.date_range("2024-01-01", periods=n, freq="h")) * 2,
            "value": np.concatenate([seasonal, noise]),
        }
    )
    got = (
        theta_seasonality_gate(spark.createDataFrame(pdf), m=m)
        .toPandas()
        .set_index("series_id")
        .seasonal.to_dict()
    )

    def ref_gate(y):
        y = pd.Series(y)
        c = y - y.mean()
        denom = float((c * c).sum())
        r = np.array([1.0] + [float((c[k:] .reset_index(drop=True) * c[: n - k].reset_index(drop=True)).sum()) / denom for k in range(1, m + 1)])
        stat = np.sqrt((1 + 2 * np.sum(np.delete(r, [0, m]) ** 2)) / n)
        return int(np.abs(r[m] / stat) > 1.644)

    assert got["seasonal"] == ref_gate(seasonal) == 1
    assert got["noise"] == ref_gate(noise) == 0


def test_global_dms_pools_across_series(spark):
    """Global direct-multi-step: ONE pooled linear model must learn the
    shared AR dynamics from many short series and beat the per-series
    naive last-value forecast on every horizon."""
    import numpy as np
    import pandas as pd

    from kats_spark.models.global_dms import global_dms_forecast

    rng = np.random.default_rng(12)
    frames = []
    n, n_series = 120, 8
    truth = {}
    for k in range(n_series):
        e = rng.normal(0, 0.5, n + 40)
        x = np.zeros(n + 40)
        for t in range(1, n + 40):
            x[t] = 0.5 * x[t - 1] + e[t]  # mean-reverting: persistence is beatable
        x = x[20:] + 10 * k
        frames.append(
            pd.DataFrame(
                {
                    "series_id": f"s{k}",
                    "time": pd.date_range("2024-01-01", periods=n, freq="h"),
                    "value": x[:n],
                }
            )
        )
        truth[f"s{k}"] = x[n : n + 6]
    df = spark.createDataFrame(pd.concat(frames))
    fc = global_dms_forecast(df, steps=6, freq_seconds=3600, p=3).toPandas()
    assert len(fc) == n_series * 6
    err_model, err_naive = [], []
    for k in range(n_series):
        sid = f"s{k}"
        got = fc[fc.series_id == sid].sort_values("time").fcst.to_numpy()
        last = frames[k].value.iloc[-1]
        err_model.append(np.abs(got - truth[sid]).mean())
        err_naive.append(np.abs(last - truth[sid]).mean())
    assert np.mean(err_model) < 0.9 * np.mean(err_naive)


def test_std_global_beats_plain_dms_on_seasonal_panel(spark):
    """STDGlobalModel composition (stdmodel.py:29): on a strongly seasonal
    panel, STL-deseasonalize -> pooled DMS -> re-seasonalize must beat the
    SAME pooled DMS fit on the raw values (VERDICT r04 item #6 'done'
    criterion), and fit_trend / multiplicative variants must run."""
    import numpy as np
    import pandas as pd

    from kats_spark.models.global_dms import global_dms_forecast
    from kats_spark.models.std_global import std_global_forecast

    rng = np.random.default_rng(21)
    period, n, n_series, H = 24, 24 * 8, 6, 12
    frames, truth = [], {}
    for k in range(n_series):
        t = np.arange(n + H)
        # per-series RANDOM phase profile: a pure sinusoid satisfies an
        # AR(2) recurrence so a pooled linear model rides it for free —
        # a spiky per-series shape is what actually needs decomposition
        profile = rng.normal(0, 3.0, period)
        profile -= profile.mean()
        seas = profile[t % period]
        e = rng.normal(0, 0.3, n + H)
        x = np.zeros(n + H)
        for i in range(1, n + H):
            x[i] = 0.6 * x[i - 1] + e[i]
        y = 20.0 + k + x + seas
        frames.append(pd.DataFrame({
            "series_id": f"s{k}",
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "value": y[:n],
        }))
        truth[f"s{k}"] = y[n:]
    df = spark.createDataFrame(pd.concat(frames))

    def mae(fc):
        errs = []
        for k in range(n_series):
            got = fc[fc.series_id == f"s{k}"].sort_values("time").fcst.to_numpy()
            errs.append(np.abs(got - truth[f"s{k}"]).mean())
        return float(np.mean(errs))

    std = std_global_forecast(
        df, steps=H, freq_seconds=3600, period=period, base="dms", p=4
    ).toPandas()
    plain = global_dms_forecast(df, steps=H, freq_seconds=3600, p=4).toPandas()
    assert len(std) == n_series * H
    assert mae(std) < 0.7 * mae(plain), (mae(std), mae(plain))
    # variant smoke: fit_trend and multiplicative both produce full grids
    tr = std_global_forecast(
        df, steps=H, freq_seconds=3600, period=period, fit_trend=True
    ).toPandas()
    assert len(tr) == n_series * H and np.isfinite(tr.fcst).all()
    mu = std_global_forecast(
        df, steps=H, freq_seconds=3600, period=period,
        decomposition="multiplicative",
    ).toPandas()
    assert len(mu) == n_series * H and np.isfinite(mu.fcst).all()


def test_holtwinters_mul_beats_additive_on_multiplicative_series(spark):
    """On a series whose seasonal amplitude GROWS with the level
    (level * seasonal factor), the multiplicative-seasonality fit
    (seasonal="mul" in the reference) forecasts a wider swing than the
    additive fit and lower in-sample error on the holdout."""
    import pandas as pd

    rng = np.random.default_rng(27)
    n, m = 240, 12
    t = np.arange(n)
    level = 100 + 2.0 * t
    si = 1.0 + 0.3 * np.sin(2 * np.pi * t / m)
    y = level * si + rng.normal(scale=2.0, size=n)
    pdf = pd.DataFrame({
        "series_id": "s",
        "time": pd.date_range("2024-01-01", periods=n, freq="h"),
        "value": y,
    })
    df = spark.createDataFrame(pdf)
    add = fcst.forecast(df, "holtwinters", steps=m, freq_seconds=3600,
                        period=m).toPandas()
    mul = fcst.forecast(df, "holtwinters_mul", steps=m, freq_seconds=3600,
                        period=m).toPandas()
    # truth continues the multiplicative pattern
    th = np.arange(n, n + m)
    truth = (100 + 2.0 * th) * (1.0 + 0.3 * np.sin(2 * np.pi * th / m))
    err_add = np.abs(add.fcst.to_numpy() - truth).mean()
    err_mul = np.abs(mul.fcst.to_numpy() - truth).mean()
    assert err_mul < err_add
    # the multiplicative forecast's swing scales with the level
    assert (mul.fcst.max() - mul.fcst.min()) > 0.8 * (
        truth.max() - truth.min()
    )


def test_arimax_recovers_beta_and_beats_plain_arima(spark):
    """Regression-with-ARIMA-errors: on y = 2 + 1.5*x1 - 0.8*x2 + AR(1)
    noise, the two-stage fit recovers the regression surface (forecast
    tracks X_future @ beta) and beats the exog-blind ARIMA on holdout
    MAE when the regressors move."""
    import pandas as pd

    from kats_spark.models.arima import arima_forecast, arimax_forecast

    rng = np.random.default_rng(31)
    n, steps = 200, 20
    x1 = np.sin(np.arange(n + steps) / 7.0) * 3
    x2 = rng.normal(size=n + steps).cumsum() / 10
    eps = np.zeros(n + steps)
    for t in range(1, n + steps):
        eps[t] = 0.6 * eps[t - 1] + rng.normal(scale=0.3)
    y = 2.0 + 1.5 * x1 - 0.8 * x2 + eps
    times = pd.date_range("2024-01-01", periods=n, freq="h")
    hist = pd.DataFrame({
        "series_id": "s", "time": times, "value": y[:n],
        "x1": x1[:n], "x2": x2[:n],
    })
    fut = pd.DataFrame({
        "series_id": "s", "step": np.arange(1, steps + 1),
        "x1": x1[n:], "x2": x2[n:],
    })
    df = spark.createDataFrame(hist)
    fdf = spark.createDataFrame(fut)
    fx = arimax_forecast(
        df, steps=steps, freq_seconds=3600, future_exog=fdf,
        exog_cols=["x1", "x2"], order=(1, 0, 0),
    ).toPandas().sort_values("time")
    plain = arima_forecast(
        df, steps=steps, freq_seconds=3600, order=(1, 0, 0)
    ).toPandas().sort_values("time")
    truth = y[n:]
    mae_x = np.abs(fx.fcst.to_numpy() - truth).mean()
    mae_p = np.abs(plain.fcst.to_numpy() - truth).mean()
    assert mae_x < 0.6 * mae_p
    # the regression surface dominates the forecast
    surface = 2.0 + 1.5 * x1[n:] - 0.8 * x2[n:]
    assert np.abs(fx.fcst.to_numpy() - surface).mean() < 0.6
    # intervals bracket the point forecast
    assert (fx.fcst_lower < fx.fcst).all() and (fx.fcst < fx.fcst_upper).all()
