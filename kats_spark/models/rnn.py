"""Per-series RNN forecaster — the kats/models/lstm.py shape (fit :92 /
predict :157: one recurrent net per series over sliding windows) without
torch: the numpy GRU from models/global_rnn.py trains INSIDE the
``applyInPandas`` group, so every series fits its own weights
distributed-side (the fan-out contract of the whole model zoo,
kats/models/model.py:18).

Differences from the global model: no driver-side training, no weight
broadcast — each task trains on its own group's windows (the LSTM
model's semantics); the global model remains the one-model-many-series
path.  Direct multi-horizon head (the reference trains one-step and
unrolls; direct heads avoid error accumulation and need no unroll loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from kats_spark.models.global_rnn import GRULite, Z95
from kats_spark.tsframe import TSSchema, DEFAULT


def _series_windows(y: np.ndarray, win: int, horizon: int) -> np.ndarray:
    wsize = win + horizon
    n = len(y) - wsize + 1
    if n <= 0:
        return np.empty((0, wsize))
    return np.lib.stride_tricks.sliding_window_view(y, wsize).copy()


def rnn_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    window: int = 16,
    hidden: int = 8,
    epochs: int = 120,
    seed: int = 0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper): one GRU per
    series, trained in-task on that series' sliding windows (per-window
    scale normalization, Adam, manual BPTT), bands from per-horizon
    in-sample residual spread."""
    win = window
    schema = (
        f"{s.series_id} string, {s.time} timestamp, "
        "fcst double, fcst_lower double, fcst_upper double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        W = _series_windows(y, win, steps)
        if len(W) < 8:
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        scale = np.abs(W[:, :win]).mean(axis=1, keepdims=True) + 1e-9
        Wn = W / scale
        model = GRULite(hidden=hidden, horizon=steps, seed=seed)
        model.fit(Wn[:, :win], Wn[:, win:], epochs=epochs)
        resid = (model.predict(Wn[:, :win]) - Wn[:, win:]) * scale
        se_h = resid.std(axis=0, ddof=1)
        tail = y[-win:][None, :]
        sc = np.abs(tail).mean() + 1e-9
        fc = model.predict(tail / sc)[0] * sc
        h = np.arange(1, steps + 1)
        times = pd.Timestamp(pdf[s.time].iloc[-1]) + pd.to_timedelta(
            h * freq_seconds, unit="s"
        )
        return pd.DataFrame(
            {
                s.series_id: str(pdf[s.series_id].iloc[0]),
                s.time: times,
                "fcst": fc,
                "fcst_lower": fc - Z95 * se_h,
                "fcst_upper": fc + Z95 * se_h,
            }
        )

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )
