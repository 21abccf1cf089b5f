"""NeuralProphet-lite: Prophet components + AR-Net lags in pure numpy.

Parity target: kats/models/neuralprophet.py (wraps the neuralprophet
package, absent from this container).  NeuralProphet's published core
(Triebe et al. 2021) = the Prophet decomposition (trend + Fourier
seasonality + events/regressors) PLUS AR-Net — a LINEAR autoregression
over the last ``n_lags`` observations fit jointly with the other
components.  ProphetLite already fits arbitrary extra regressors under a
Normal prior, so the AR block enters as ``n_lags`` lagged-y regressor
columns — exactly AR-Net's linear form (its sparsity comes from a
regularizer we mirror with the regressor prior scale).

Forecasting is recursive over the horizon (each step's prediction feeds
the next step's lag vector), matching NeuralProphet's one-step decoder
unrolled.  The torch-backed wrapper in models/external.py stays gated
for numerical parity with the real package.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from kats_spark.models.prophet_lite import ProphetLite
from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054


class NeuralProphetLite:
    def __init__(
        self,
        n_lags: int = 8,
        ar_prior_scale: float = 1.0,
        **prophet_kwargs,
    ) -> None:
        self.n_lags = int(n_lags)
        prophet_kwargs.setdefault("regressor_prior_scale", ar_prior_scale)
        self._kw = prophet_kwargs
        self.model_: ProphetLite | None = None

    def fit(self, times: np.ndarray, y: np.ndarray) -> "NeuralProphetLite":
        L = self.n_lags
        if len(y) <= L + 4:
            raise ValueError(f"need more than n_lags+4={L + 4} points")
        lagmat = np.column_stack([y[L - j - 1 : len(y) - j - 1] for j in range(L)])
        self._tail = y[-L:].astype(float).copy()
        self.model_ = ProphetLite(**self._kw).fit(
            times[L:], y[L:], regressors=lagmat
        )
        return self

    def predict(self, future_times: np.ndarray) -> pd.DataFrame:
        m = self.model_
        L = self.n_lags
        lags = list(self._tail)  # lags[-1] = most recent
        rows = []
        for t in future_times:
            reg = np.array([lags[-1 - j] for j in range(L)])[None, :]
            out = m.predict(np.array([t], dtype="datetime64[ns]"), regressors=reg)
            yhat = float(out.fcst.iloc[0])
            rows.append((yhat, float(out.fcst_lower.iloc[0]), float(out.fcst_upper.iloc[0])))
            lags.append(yhat)
        return pd.DataFrame(rows, columns=["fcst", "fcst_lower", "fcst_upper"])


def neural_prophet_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    n_lags: int = 8,
    s: TSSchema = DEFAULT,
    **params,
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper) per series."""
    schema = (
        f"{s.series_id} string, {s.time} timestamp, "
        "fcst double, fcst_lower double, fcst_upper double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        times = pdf[s.time].to_numpy(dtype="datetime64[ns]")
        if len(y) < max(3 * n_lags, 30):
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        model = NeuralProphetLite(n_lags=n_lags, **params).fit(times, y)
        h = np.arange(1, steps + 1)
        fut = times[-1] + (h * freq_seconds).astype("timedelta64[s]").astype(
            "timedelta64[ns]"
        )
        out = model.predict(fut)
        return pd.DataFrame(
            {
                s.series_id: str(pdf[s.series_id].iloc[0]),
                s.time: pd.to_datetime(fut),
                "fcst": out.fcst,
                "fcst_lower": out.fcst_lower,
                "fcst_upper": out.fcst_upper,
            }
        )

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )
