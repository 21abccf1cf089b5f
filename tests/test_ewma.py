"""EWMA-family features vs the pandas reference kernel (the reference's own
backend, kats/models/nowcasting/feature_extraction.py:117-460)."""

import datetime as dt

import numpy as np
import pandas as pd

from kats_spark.functions import ta


def test_ewma_features_match_pandas(spark):
    rng = np.random.RandomState(7)
    n = 200
    pdf = pd.DataFrame(
        {
            "series_id": ["a"] * n + ["b"] * n,
            "time": list(pd.date_range("2024-01-01", periods=n, freq="h")) * 2,
            "value": rng.randn(2 * n).cumsum() + 50,
        }
    )
    df = spark.createDataFrame(pdf)
    specs = [
        ("ema_10", {"kind": "ema", "n": 10}),
        ("macd", {"kind": "macd", "n_fast": 12, "n_slow": 26}),
        ("rsi_14", {"kind": "rsi", "n": 14}),
        ("trix_15", {"kind": "trix", "n": 15}),
        ("tsi", {"kind": "tsi", "r": 25, "s": 13}),
    ]
    out = ta.with_ewma_features(df, specs).toPandas()
    got = out[out.series_id == "a"].sort_values("time").reset_index(drop=True)

    ref = pdf[pdf.series_id == "a"].sort_values("time").reset_index(drop=True)
    v = ref["value"]
    exp_ema = v.ewm(span=10, min_periods=9).mean()
    np.testing.assert_allclose(got["ema_10"], exp_ema, rtol=1e-10, equal_nan=True)

    fast = v.ewm(span=12, min_periods=25).mean()
    slow = v.ewm(span=26, min_periods=25).mean()
    np.testing.assert_allclose(got["macd"], fast - slow, rtol=1e-10, equal_nan=True)

    d = v.diff(1)
    ru = d.clip(lower=0).ewm(alpha=1 / 14, min_periods=14).mean()
    rd = (-d).clip(lower=0).ewm(alpha=1 / 14, min_periods=14).mean()
    np.testing.assert_allclose(
        got["rsi_14"], 100 - 100 / (1 + ru / rd), rtol=1e-10, equal_nan=True
    )
