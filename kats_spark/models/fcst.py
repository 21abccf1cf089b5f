"""Exponential-smoothing family forecasters — per-series numpy kernels.

Parity targets (statsmodels is not available in this environment, so the
recursions are implemented directly; parameters are fit by dense grid
search over the smoothing constants minimizing in-sample SSE — a
documented deviation from statsmodels' L-BFGS MLE, same model family):

- SES / simple exponential smoothing and Holt's linear trend
  (kats/models/holtwinters.py:34-254 uses ExponentialSmoothing; the
  ``simple_heuristic`` last-value model is kats/models/simple_heuristic_model.py)
- Holt-Winters additive/multiplicative seasonality
  (kats/models/holtwinters.py:102 ``HoltWintersParams``)
- Theta method (kats/models/theta.py:36-284): SES on the series + drift
  from the theta-line decomposition; forecast = ses_fcst + drift·(h + ...)
  simplified to the standard theta(2) formulation.

Output contract (kats/models/arima.py:282-289, uniform across models):
(series_id, time, fcst, fcst_lower, fcst_upper); intervals are normal
approximations from in-sample residual std, widening with sqrt(h) — the
same shape statsmodels' SES prediction intervals take.

All models emit via one ``applyInPandas`` per series.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054


def _ses_fit(y: np.ndarray, alpha: float) -> tuple[np.ndarray, float]:
    """Return fitted one-step-ahead predictions and final level."""
    l = y[0]
    fitted = np.empty(len(y))
    fitted[0] = l
    for i in range(1, len(y)):
        fitted[i] = l
        l = alpha * y[i] + (1 - alpha) * l
    return fitted, l


def _ses_best_alpha(y: np.ndarray, grid=None) -> float:
    grid = grid or [i / 100 for i in range(5, 100, 5)]
    best, best_sse = grid[0], math.inf
    for a in grid:
        fitted, _ = _ses_fit(y, a)
        sse = float(np.sum((y[1:] - fitted[1:]) ** 2))
        if sse < best_sse:
            best, best_sse = a, sse
    return best


def _holt_fit(y: np.ndarray, alpha: float, beta: float) -> tuple[np.ndarray, float, float]:
    l, b = y[0], y[1] - y[0] if len(y) > 1 else 0.0
    fitted = np.empty(len(y))
    fitted[0] = l
    for i in range(1, len(y)):
        fitted[i] = l + b
        l_new = alpha * y[i] + (1 - alpha) * (l + b)
        b = beta * (l_new - l) + (1 - beta) * b
        l = l_new
    return fitted, l, b


def _holt_damped_fit(
    y: np.ndarray, alpha: float, beta: float, phi: float
) -> tuple[np.ndarray, float, float]:
    """Damped Holt (Gardner-McKenzie): trend multiplied by phi in both
    the update and the forecast, so long-horizon forecasts flatten to
    l + phi/(1-phi) * b instead of extrapolating forever — the
    reference's HoltWintersParams ``damped`` flag."""
    l, b = y[0], (y[1] - y[0] if len(y) > 1 else 0.0)
    fitted = np.empty(len(y))
    fitted[0] = l
    for i in range(1, len(y)):
        fitted[i] = l + phi * b
        l_new = alpha * y[i] + (1 - alpha) * (l + phi * b)
        b = beta * (l_new - l) + (1 - beta) * phi * b
        l = l_new
    return fitted, l, b


def _hw_fit(
    y: np.ndarray, m: int, alpha: float, beta: float, gamma: float, mult: bool
) -> tuple[np.ndarray, float, float, np.ndarray]:
    n = len(y)
    l = float(np.mean(y[:m]))
    b = (float(np.mean(y[m: 2 * m])) - l) / m if n >= 2 * m else 0.0
    seas = (y[:m] / l) if mult else (y[:m] - l)
    seas = seas.astype(float).copy()
    fitted = np.empty(n)
    for i in range(n):
        si = seas[i % m]
        fitted[i] = (l + b) * si if mult else l + b + si
        if mult:
            l_new = alpha * (y[i] / si) + (1 - alpha) * (l + b)
            seas[i % m] = gamma * (y[i] / l_new) + (1 - gamma) * si
        else:
            l_new = alpha * (y[i] - si) + (1 - alpha) * (l + b)
            seas[i % m] = gamma * (y[i] - l_new) + (1 - gamma) * si
        b = beta * (l_new - l) + (1 - beta) * b
        l = l_new
    return fitted, l, b, seas


def _ses_fit_estimated(y: np.ndarray) -> tuple[float, float, float, float]:
    """SES with (alpha, l0) JOINTLY optimized by in-sample SSE — the
    statsmodels ``SimpleExpSmoothing(...).fit()`` 'estimated'
    initialization the reference's theta model calls
    (kats/models/theta.py:139).  Coarse-to-fine grid (3 refinement
    rounds) instead of L-BFGS; measured within 1.5% of the statsmodels
    optimum on the parity goldens.  Returns (alpha, final_level, sse,
    l0) — ``l0`` lets callers reconstruct the one-step-ahead FITTED
    series (fitted[i] = level before absorbing y[i]), the
    ``include_history`` surface the theta incl-hist goldens pin."""
    y = np.asarray(y, dtype=float)

    def sse_of(alpha: float, l0: float) -> float:
        l = l0
        sse = 0.0
        for v in y:
            d = v - l
            sse += d * d
            l = alpha * v + (1 - alpha) * l
        return sse

    best = (math.inf, 0.5, float(y[0]))
    al_lo, al_hi = 0.01, 0.999
    l_guesses = [float(y[0]), float(y[: min(6, len(y))].mean()),
                 float(y[: min(12, len(y))].mean())]
    l_lo = min(l_guesses) - 2 * abs(np.std(y))
    l_hi = max(l_guesses) + 2 * abs(np.std(y))
    for _ in range(3):
        for a in np.linspace(al_lo, al_hi, 24):
            for l0 in np.linspace(l_lo, l_hi, 24):
                s0 = sse_of(float(a), float(l0))
                if s0 < best[0]:
                    best = (s0, float(a), float(l0))
        da = (al_hi - al_lo) / 12
        dl = (l_hi - l_lo) / 12
        al_lo, al_hi = max(0.001, best[1] - da), min(0.999, best[1] + da)
        l_lo, l_hi = best[2] - dl, best[2] + dl
    alpha, l0 = best[1], best[2]
    l = l0
    for v in y:
        l = alpha * v + (1 - alpha) * l
    return alpha, float(l), best[0], l0


def _theta_deseasonalize(y: np.ndarray, m: int) -> tuple[bool, np.ndarray]:
    """Shared theta preprocessing (kats/models/theta.py:100-152):
    the ACF seasonality gate |r_m| / sqrt((1 + 2 sum r_j^2)/n) > 1.644
    and, when it fires, the multiplicative STL seasonal component
    (log-space STL, exp back, identity when any factor ~ 0).  Returns
    (seasonal, seas) — used by BOTH the forecast tail and the
    include_history fitted surface so the two paths cannot drift
    (ADVICE r10)."""
    n = len(y)
    seasonal = False
    if m > 1 and len(np.unique(y)) > 1 and n > 2 * m:
        c = y - y.mean()
        ss = float(c @ c)
        r = np.array([float(c[k:] @ c[:-k]) / ss for k in range(1, m + 1)])
        stat = math.sqrt((1.0 + 2.0 * float(np.sum(r[:-1] ** 2))) / n)
        seasonal = abs(r[-1] / stat) > 1.644
    seas = np.ones(n)
    if seasonal:
        from kats_spark.operators.stl import stl_decompose_np

        _, S, _ = stl_decompose_np(np.log(np.maximum(y, 1e-12)), m)
        seas_c = np.exp(S)
        if np.all(np.abs(seas_c) >= 1e-10):
            seas = seas_c
    return seasonal, seas


def theta_seasonal_forecast_one(
    y: np.ndarray, m: int, steps: int
) -> np.ndarray:
    """Reference-parity theta forecast for one series
    (kats/models/theta.py:100-211): ACF seasonality gate, multiplicative
    STL deseasonalization, SES + half the OLS drift, re-seasonalize with
    the tiled last period.  Point forecasts only (the golden-parity
    surface); the distributed theta query keeps its exact-oracle
    non-seasonal form in ``_fit_predict_one``."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    seasonal, seas = _theta_deseasonalize(y, m)
    des = y / seas
    alpha, level, _, _ = _ses_fit_estimated(des)
    regr = np.vstack([np.arange(n, dtype=float), np.ones(n)]).T
    slope = float(np.linalg.lstsq(regr, des, rcond=None)[0][0])
    drift = slope / 2.0
    const = (1.0 - (1.0 - alpha) ** n) / alpha
    fc = np.full(steps, level) + drift * (np.arange(steps) + const)
    if seasonal:
        rep = steps // m + 1
        fc = fc * np.tile(seas[-m:], rep)[:steps]
    return fc


def theta_fitted_one(y: np.ndarray, m: int) -> np.ndarray:
    """The theta model's IN-SAMPLE fitted values — the history block of
    ``predict(include_history=True)`` (kats/models/theta.py:150-152,
    229-247): SES one-step-ahead fitted values on the deseasonalized
    series, re-seasonalized by the FULL per-point seasonal component
    (not the tiled last period the forecast tail uses).  Pinned by the
    SM_12 incl-hist goldens on both public fixtures (measured 2e-5 on
    Peyton m=1, 0.34% on air m=12).  The seasonality decision is the
    SHARED ``_theta_deseasonalize`` helper, so the fitted surface and
    the forecast tail cannot disagree for the same series."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    _, seas = _theta_deseasonalize(y, m)
    des = y / seas
    alpha, _, _, l0 = _ses_fit_estimated(des)
    fitted = np.empty(n)
    level = l0
    for i, v in enumerate(des):
        fitted[i] = level
        level = alpha * v + (1 - alpha) * level
    return fitted * seas


def _forecast_frame(
    sid, last_time, freq_seconds: int, fcst: np.ndarray, sigma: float, s: TSSchema
) -> pd.DataFrame:
    h = np.arange(1, len(fcst) + 1)
    se = sigma * np.sqrt(h)
    times = pd.Timestamp(last_time) + pd.to_timedelta(h * freq_seconds, unit="s")
    return pd.DataFrame(
        {
            s.series_id: sid,
            s.time: times,
            "fcst": fcst,
            "fcst_lower": fcst - Z95 * se,
            "fcst_upper": fcst + Z95 * se,
        }
    )


def _grid(step=0.1):
    return [round(x * step, 3) for x in range(1, int(1 / step))]


def _fit_predict_one(pdf: pd.DataFrame, model: str, steps: int, freq_seconds: int,
                     period: int, s: TSSchema) -> pd.DataFrame:
    pdf = pdf.sort_values(s.time)
    y = pdf[s.value].to_numpy(dtype=float)
    sid = pdf[s.series_id].iloc[0]
    last_time = pdf[s.time].iloc[-1]
    n = len(y)
    if n < max(5, 2 * period if model == "holtwinters" else 5):
        return pd.DataFrame(columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"])

    if model == "ses":
        alpha = _ses_best_alpha(y)
        fitted, l = _ses_fit(y, alpha)
        fc = np.full(steps, l)
    elif model == "holt":
        best, best_sse = None, math.inf
        for a in _grid(0.2):
            for b in _grid(0.2):
                fitted, l, tr = _holt_fit(y, a, b)
                sse = float(np.sum((y[1:] - fitted[1:]) ** 2))
                if sse < best_sse:
                    best, best_sse = (a, b, l, tr, fitted), sse
        a, b, l, tr, fitted = best
        fc = l + tr * np.arange(1, steps + 1)
    elif model == "holt_damped":
        best, best_sse = None, math.inf
        for a in _grid(0.2):
            for b in _grid(0.2):
                for ph in (0.8, 0.9, 0.95, 0.98):
                    fitted, l, tr = _holt_damped_fit(y, a, b, ph)
                    sse = float(np.sum((y[1:] - fitted[1:]) ** 2))
                    if sse < best_sse:
                        best, best_sse = (ph, l, tr, fitted), sse
        ph, l, tr, fitted = best
        h = np.arange(1, steps + 1)
        phi_sum = ph * (1 - ph**h) / (1 - ph)
        fc = l + phi_sum * tr
    elif model in ("holtwinters", "holtwinters_mul"):
        # 'holtwinters_mul' = multiplicative SEASONALITY with additive
        # trend (the reference's seasonal="mul" knob,
        # kats/models/holtwinters.py:34-60); same grid fit, the
        # multiplicative recursions already in _hw_fit
        mult = model == "holtwinters_mul"
        best, best_sse = None, math.inf
        for a in _grid(0.25):
            for bta in _grid(0.25):
                for g in _grid(0.25):
                    fitted, l, tr, seas = _hw_fit(y, period, a, bta, g, mult=mult)
                    sse = float(np.sum((y - fitted) ** 2))
                    if sse < best_sse:
                        best, best_sse = (fitted, l, tr, seas), sse
        fitted, l, tr, seas = best
        h = np.arange(1, steps + 1)
        si = seas[(n + h - 1) % period]
        fc = (l + tr * h) * si if mult else l + tr * h + si
    elif model == "theta":
        # theta(2): SES on the series + half the drift of the fitted trend
        alpha = _ses_best_alpha(y)
        fitted, l = _ses_fit(y, alpha)
        x = np.arange(n)
        slope = float(np.polyfit(x, y, 1)[0])
        h = np.arange(1, steps + 1)
        fc = l + 0.5 * slope * (h + (1 / alpha - 1) * (1 - (1 - alpha) ** n))
    else:
        raise ValueError(model)

    resid = y[1:] - fitted[1:]
    sigma = float(np.std(resid, ddof=1)) if len(resid) > 2 else 0.0
    return _forecast_frame(sid, last_time, freq_seconds, fc, sigma, s)


def forecast(
    df: DataFrame,
    model: str,
    steps: int,
    freq_seconds: int,
    period: int = 24,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """model in {ses, holt, holtwinters, theta} ->
    (series_id, time, fcst, fcst_lower, fcst_upper)."""
    schema = (
        f"{s.series_id} string, {s.time} timestamp, "
        "fcst double, fcst_lower double, fcst_upper double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _fit_predict_one(pdf, model, steps, freq_seconds, period, s)

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )


def simple_heuristic_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    quantile: float = 0.9,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Last-value forecast with quantile band
    (kats/models/simple_heuristic_model.py:26-232) — pure expressions, no
    UDF: last value per series + percentile band, fanned out with
    ``explode(sequence(...))``."""
    from pyspark.sql import functions as F

    agg = df.groupBy(s.series_id).agg(
        F.max_by(s.value, s.time).alias("__last"),
        F.percentile(F.col(s.value), F.lit(1 - quantile)).alias("__lo"),
        F.percentile(F.col(s.value), F.lit(quantile)).alias("__hi"),
        F.max(s.time).alias("__tmax"),
    )
    fut = agg.select("*", F.explode(F.sequence(F.lit(1), F.lit(steps))).alias("__h"))
    t = F.timestamp_seconds(F.unix_timestamp("__tmax") + F.col("__h") * freq_seconds)
    return fut.select(
        s.series_id,
        t.alias(s.time),
        F.col("__last").alias("fcst"),
        F.col("__lo").alias("fcst_lower"),
        F.col("__hi").alias("fcst_upper"),
    )
