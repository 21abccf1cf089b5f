"""Unit tests: ensembles, empirical CI, HPT grid search, reconciliation,
anomaly postprocessing."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from kats_spark.models import fcst as fcst_mod
from kats_spark.operators import (
    backtest,
    empirical_ci,
    ensemble,
    hpt,
    postprocess,
    reconciliation,
    simulator,
    trend,
)


def _trending(spark, n=120, slope=0.5, seed=61):
    rng = np.random.RandomState(seed)
    vals = slope * np.arange(n) + rng.randn(n) * 0.5
    pdf = pd.DataFrame(
        {
            "series_id": "s",
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "value": vals,
        }
    )
    return spark.createDataFrame(pdf)


def test_median_ensemble_of_identical_models_is_identity(spark):
    df = _trending(spark)
    fc = trend.linear_forecast(df, steps=12, freq_seconds=3600)
    out = ensemble.median_ensemble([fc, fc, fc]).toPandas().sort_values("time")
    exp = fc.toPandas().sort_values("time")
    np.testing.assert_allclose(out.fcst.values, exp.fcst.values, rtol=1e-9)


def test_median_ensemble_combines(spark):
    df = _trending(spark)
    f1 = trend.linear_forecast(df, steps=6, freq_seconds=3600)
    f2 = trend.quadratic_forecast(df, steps=6, freq_seconds=3600)
    f3 = fcst_mod.simple_heuristic_forecast(df, steps=6, freq_seconds=3600)
    out = ensemble.median_ensemble([f1, f2, f3]).toPandas()
    assert len(out) == 6
    p1 = f1.toPandas().sort_values("time").fcst.values
    p3 = f3.toPandas().sort_values("time").fcst.values
    med = out.sort_values("time").fcst.values
    assert (med <= np.maximum.reduce([p1, p3]) + 1e9).all()  # sanity: finite
    assert np.isfinite(med).all()


def test_weighted_ensemble_prefers_low_error_model(spark):
    df = _trending(spark)
    f1 = ensemble.tag("good", trend.linear_forecast(df, steps=4, freq_seconds=3600))
    bad = trend.linear_forecast(df, steps=4, freq_seconds=3600).withColumn(
        "fcst", F.col("fcst") + 100.0
    )
    f2 = ensemble.tag("bad", bad)
    errors = spark.createDataFrame(
        [("s", "good", 0.1), ("s", "bad", 100.0)], "series_id string, model string, err double"
    )
    out = ensemble.weighted_avg_ensemble(f1.unionByName(f2), errors).toPandas()
    good = trend.linear_forecast(df, steps=4, freq_seconds=3600).toPandas()
    # weight of bad model is ~0.001 -> result within 0.2 of the good model
    diff = np.abs(out.sort_values("time").fcst.values - good.sort_values("time").fcst.values)
    assert diff.max() < 0.2


def test_empirical_ci_widens_with_horizon(spark):
    # random walk: linear-model error genuinely grows with horizon
    rng = np.random.RandomState(62)
    pdf = pd.DataFrame(
        {
            "series_id": "rw",
            "time": pd.date_range("2024-01-01", periods=200, freq="h"),
            "value": np.cumsum(rng.randn(200)),
        }
    )
    df = spark.createDataFrame(pdf)
    spec = backtest.fold_spec(spark, n_folds=4, train_frac=0.5, test_frac=0.2)
    out = (
        empirical_ci.empirical_ci_forecast(df, spec, steps=24, freq_seconds=3600)
        .toPandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    assert len(out) == 24
    widths = (out.fcst_upper - out.fcst_lower).values
    assert (widths > 0).all()
    assert widths[-1] >= widths[0]  # slope of error vs horizon is >= 0 here


def test_hpt_picks_longer_window_for_noise(spark):
    # pure iid noise: longer averaging window -> lower one-step MAE
    df = simulator.simulate(spark, n_series=2, n_points=400, noise_std=1.0, seed=71)
    out = hpt.tune_rolling_window(df, [2, 4, 8, 16]).toPandas()
    assert set(out.best_window) == {16}


def test_hpt_picks_short_window_for_random_walk(spark):
    rng = np.random.RandomState(72)
    vals = np.cumsum(rng.randn(400))
    pdf = pd.DataFrame(
        {
            "series_id": "rw",
            "time": pd.date_range("2024-01-01", periods=400, freq="h"),
            "value": vals,
        }
    )
    out = hpt.tune_rolling_window(spark.createDataFrame(pdf), [2, 4, 8, 16]).toPandas()
    assert out.best_window.iloc[0] == 2


def test_aggregate_series_blocks(spark):
    df = _trending(spark, n=10)
    agg = reconciliation.aggregate_series(df, k=3).toPandas().sort_values("time")
    src = df.toPandas().sort_values("time").value.values
    assert len(agg) == 3  # 10 -> 3 full blocks
    np.testing.assert_allclose(agg.value.values[0], src[0:3].sum(), rtol=1e-9)


def test_bottom_up_coherence(spark):
    df = _trending(spark, n=100)
    out = reconciliation.bottom_up_forecast(df, steps=12, freq_seconds=3600, k=4).toPandas()
    base = out[out.level == "base"].sort_values("time").reset_index(drop=True)
    agg = out[out.level == "agg"].sort_values("time").reset_index(drop=True)
    assert len(base) == 12 and len(agg) == 3
    for b in range(3):
        np.testing.assert_allclose(
            agg.fcst[b], base.fcst[4 * b : 4 * b + 4].sum(), rtol=1e-9
        )


def test_classify_anomalies_kinds(spark):
    times = pd.date_range("2024-01-01", periods=40, freq="h")
    score = np.zeros(40)
    score[5] = 8.0  # individual
    score[10:16] = 6.0  # level shift (sustained one direction)
    score[20:26] = [5, -5, 5, -5, 5, -5]  # volatility (alternating)
    score[30:35] = [3.5, 4.5, 5.5, 6.5, 7.5]  # trend (growing)
    pdf = pd.DataFrame({"series_id": "s", "time": times, "score": score})
    out = (
        postprocess.classify_anomalies(spark.createDataFrame(pdf), threshold=3.0)
        .toPandas()
        .sort_values("episode_start")
        .reset_index(drop=True)
    )
    assert list(out.kind) == ["individual", "level_shift", "volatility", "trend"]
    assert out.n_points.tolist() == [1, 6, 6, 5]
    assert (out.severity > 0).all()


def test_ensemble_prediction_interval(spark):
    rng = np.random.RandomState(63)
    pdf = pd.DataFrame(
        {
            "series_id": "rw",
            "time": pd.date_range("2024-01-01", periods=200, freq="h"),
            "value": np.cumsum(rng.randn(200)),
        }
    )
    df = spark.createDataFrame(pdf)
    spec = backtest.fold_spec(spark, n_folds=4, train_frac=0.5, test_frac=0.2)
    out = (
        empirical_ci.ensemble_prediction_interval(df, spec, steps=24, freq_seconds=3600)
        .toPandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    assert len(out) == 24
    assert (out.fcst_upper >= out.fcst_lower).all()
    # random-walk backtest errors disperse with horizon -> wider far bands
    w = (out.fcst_upper - out.fcst_lower).values
    assert w[12:].mean() > w[:12].mean()


def test_pipeline_chain(spark):
    from kats_spark.plans.pipeline import Pipeline
    from kats_spark.operators import statsig, postprocess

    df = simulator.simulate(
        spark, n_series=1, n_points=300, noise_std=1.0,
        level_shift_at=250, level_shift_size=6.0, seed=64,
    )
    pipe = Pipeline(
        [
            ("score", lambda d: statsig.statsig_scores(d, n_control=100, n_test=20)),
            ("classify", lambda d: postprocess.classify_anomalies(
                d, score_col="stat_sig_score", threshold=4.0)),
        ]
    )
    out = pipe.run(df).toPandas()
    assert len(out) >= 1  # the injected shift produces at least one episode


def test_nowcast_beats_mean(spark):
    from kats_spark.models import nowcasting

    df = simulator.simulate(
        spark, n_series=2, n_points=300, noise_std=0.5,
        seasonal_period=24, seasonal_magnitude=3.0, seed=65,
    )
    out = nowcasting.nowcast(df, step=1, max_iter=10).toPandas()
    resid = out.target - out.prediction
    base = out.target - out.target.mean()
    assert (resid**2).mean() < 0.5 * (base**2).mean()


def test_nowcast_variants_beat_mean(spark):
    """The DynamicNowcasting (rf) and NowcastingPlus (linear + poly)
    variants run through the same distributed fit and both beat the
    series-mean baseline on a seasonal fixture."""
    from kats_spark.models import nowcasting

    df = simulator.simulate(
        spark, n_series=2, n_points=300, noise_std=0.5,
        seasonal_period=24, seasonal_magnitude=3.0, seed=66,
    )
    for reg in ("rf", "linear"):
        out = nowcasting.nowcast(df, step=1, max_iter=10, regressor=reg).toPandas()
        resid = out.target - out.prediction
        base = out.target - out.target.mean()
        assert (resid**2).mean() < 0.7 * (base**2).mean(), reg
    import pytest

    with pytest.raises(ValueError):
        nowcasting.nowcast(df, regressor="bogus")
