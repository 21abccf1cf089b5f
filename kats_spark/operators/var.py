"""VAR(p) forecasting over multivariate series, closed-form OLS.

Parity with kats/models/var.py:37-295 (``VARModel``: statsmodels VAR fit
:103, predict :132) and the multivariate anomaly use in
kats/detectors/outlier.py:166 (``MultivariateAnomalyDetector``): stack the
co-observed series into a vector series, fit Y_t = c + sum_i A_i Y_{t-i}
by least squares, forecast recursively with per-equation residual-sigma
bands.

Spark plan: the member series of one vector group co-reside after a single
``groupBy(group_id)`` shuffle; the pivot to wide and the OLS normal
equations run in numpy inside ``applyInPandas`` (the design matrix is
n x (1 + p*k) — tiny).  Groups are independent -> embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054


def _var_fit_forecast(wide: pd.DataFrame, p: int, steps: int) -> tuple[np.ndarray, np.ndarray]:
    """wide: rows=time, cols=series. Returns (forecast[steps,k], sigma[k])."""
    Y = wide.to_numpy(dtype=float)
    n, k = Y.shape
    rows = n - p
    X = np.ones((rows, 1 + p * k))
    for i in range(1, p + 1):
        X[:, 1 + (i - 1) * k : 1 + i * k] = Y[p - i : n - i]
    T = Y[p:]
    coef, *_ = np.linalg.lstsq(X, T, rcond=None)  # (1+p*k, k)
    resid = T - X @ coef
    dof = max(rows - (1 + p * k), 1)
    sigma = np.sqrt((resid**2).sum(axis=0) / dof)

    hist = Y[-p:].copy()
    out = np.empty((steps, k))
    for h in range(steps):
        x = np.ones(1 + p * k)
        for i in range(1, p + 1):
            x[1 + (i - 1) * k : 1 + i * k] = hist[-i]
        yh = x @ coef
        out[h] = yh
        hist = np.vstack([hist, yh])[-p:]
    return out, sigma


def var_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    p: int = 1,
    group_col: str | None = None,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Forecast every series jointly within a group (default: all series
    form one vector).  Output (series_id, time, fcst, fcst_lower,
    fcst_upper) — the model-zoo contract frame (kats/models/model.py:18)."""
    gcol = group_col or "__g"
    src = df if group_col else df.withColumn(gcol, F.lit("all"))
    schema = (
        f"{s.series_id} string, {s.time} timestamp, "
        "fcst double, fcst_lower double, fcst_upper double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        wide = (
            pdf.pivot_table(index=s.time, columns=s.series_id, values=s.value)
            .sort_index()
            .dropna()
        )
        if len(wide) < 3 * p + 5 or wide.shape[1] == 0:
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        fc, sigma = _var_fit_forecast(wide, p, steps)
        h = np.arange(1, steps + 1)
        last = wide.index.max()
        times = pd.Timestamp(last) + pd.to_timedelta(h * freq_seconds, unit="s")
        frames = []
        for j, sid in enumerate(wide.columns):
            se = sigma[j] * np.sqrt(h)
            frames.append(
                pd.DataFrame(
                    {
                        s.series_id: sid,
                        s.time: times,
                        "fcst": fc[:, j],
                        "fcst_lower": fc[:, j] - Z95 * se,
                        "fcst_upper": fc[:, j] + Z95 * se,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return (
        src.select(gcol, s.series_id, s.time, s.value)
        .groupBy(gcol)
        .applyInPandas(fn, schema)
    )


def var_residual_scores(
    df: DataFrame,
    p: int = 1,
    group_col: str | None = None,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Multivariate anomaly scoring (kats/detectors/outlier.py:166): one-step
    in-sample VAR residuals scored by Mahalanobis distance per time point.
    Output (time, mahalanobis)."""
    gcol = group_col or "__g"
    src = df if group_col else df.withColumn(gcol, F.lit("all"))
    schema = f"{gcol} string, {s.time} timestamp, mahalanobis double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[gcol].iloc[0]
        wide = (
            pdf.pivot_table(index=s.time, columns=s.series_id, values=s.value)
            .sort_index()
            .dropna()
        )
        n = len(wide)
        k = wide.shape[1]
        if n < 3 * p + 5 or k == 0:
            return pd.DataFrame(columns=[gcol, s.time, "mahalanobis"])
        Y = wide.to_numpy(dtype=float)
        X = np.ones((n - p, 1 + p * k))
        for i in range(1, p + 1):
            X[:, 1 + (i - 1) * k : 1 + i * k] = Y[p - i : n - i]
        T = Y[p:]
        coef, *_ = np.linalg.lstsq(X, T, rcond=None)
        resid = T - X @ coef
        cov = np.cov(resid, rowvar=False) + 1e-9 * np.eye(k)
        icov = np.linalg.pinv(cov)
        d = np.sqrt(np.einsum("ij,jk,ik->i", resid, icov, resid))
        return pd.DataFrame(
            {gcol: g, s.time: wide.index[p:], "mahalanobis": np.round(d, 6)}
        )

    return src.select(gcol, s.series_id, s.time, s.value).groupBy(gcol).applyInPandas(fn, schema)
