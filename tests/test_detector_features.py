"""Detector-derived TsFeatures group (kats/tsfeatures/tsfeatures.py:
1444-1720): seeded-injection behavior + reference default semantics."""

import numpy as np
import pandas as pd
import pytest

from kats_spark.operators.detector_features import (
    DETECTOR_FEATURE_COLUMNS,
    cusum_detector_features,
    detector_features,
    robust_stat_detector_features,
    trend_detector_features,
)


def _series(spark, values, sid="s1"):
    t = pd.date_range("2024-01-01", periods=len(values), freq="h")
    pdf = pd.DataFrame(
        {"series_id": sid, "time": t, "value": np.asarray(values, dtype=float)}
    )
    return spark.createDataFrame(pdf)


def test_cusum_features_level_shift(spark):
    rng = np.random.default_rng(7)
    y = np.concatenate([rng.normal(0, 0.3, 60), rng.normal(8, 0.3, 60)])
    row = cusum_detector_features(_series(spark, y)).collect()[0]
    assert row["cusum_num"] >= 1
    assert row["cusum_regression_detected"] == 1
    # cp_index is normalized by the series length
    assert 0.3 < row["cusum_cp_index"] < 0.7
    assert row["cusum_delta"] == pytest.approx(8.0, abs=1.0)
    assert row["cusum_conf"] == pytest.approx(1.0 - row["cusum_p_value"])
    assert 0.0 <= row["cusum_p_value"] < 0.05


def test_cusum_features_flat_series_defaults(spark):
    rng = np.random.default_rng(3)
    y = rng.normal(5, 0.1, 100)
    row = cusum_detector_features(_series(spark, y)).collect()[0]
    # reference zero defaults when no changepoint survives the gates
    assert row["cusum_num"] == 0
    assert row["cusum_conf"] == 0.0
    assert row["cusum_llr"] == 0.0
    assert row["cusum_regression_detected"] == 0
    assert row["cusum_stable_changepoint"] == 0


def test_robust_metric_mean_null_when_no_changepoints(spark):
    y = np.sin(np.linspace(0, 4 * np.pi, 120))  # smooth: no robust cps
    row = robust_stat_detector_features(_series(spark, y)).collect()[0]
    assert row["robust_num"] == 0
    assert row["robust_metric_mean"] is None  # the reference's np.nan


def test_trend_features_monotonic_ramp(spark):
    # a clean ramp: every 20-point window is perfectly monotonic ->
    # Tau = 1 > 0.8 and |z| far above the 5% critical value
    y = np.arange(60, dtype=float)
    row = trend_detector_features(_series(spark, y)).collect()[0]
    assert row["trend_num"] == 40  # anchors 20..59
    assert row["trend_num_increasing"] == 40
    assert row["trend_avg_abs_tau"] == pytest.approx(1.0)
    down = trend_detector_features(_series(spark, -y)).collect()[0]
    assert down["trend_num"] == 40
    assert down["trend_num_increasing"] == 0


def test_trend_features_noise_and_short_series(spark):
    rng = np.random.default_rng(11)
    row = trend_detector_features(_series(spark, rng.normal(0, 1, 80))).collect()[0]
    # white noise: |Tau| > 0.8 over 20 points is essentially impossible
    assert row["trend_num"] == 0
    assert row["trend_avg_abs_tau"] == 0.0
    short = trend_detector_features(_series(spark, np.arange(15.0))).collect()[0]
    assert short["trend_num"] == 0


def test_detector_features_joined_row(spark):
    rng = np.random.default_rng(5)
    y = np.concatenate([rng.normal(0, 0.5, 80), rng.normal(6, 0.5, 80)])
    out = detector_features(_series(spark, y), period=24)
    assert set(DETECTOR_FEATURE_COLUMNS) <= set(out.columns)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    for c in DETECTOR_FEATURE_COLUMNS:
        if c != "robust_metric_mean":  # nullable by design
            assert r[c] is not None, c
