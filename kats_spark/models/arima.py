"""ARIMA(p, d, q) forecasting — numpy Hannan-Rissanen, no statsmodels.

Parity with kats/models/arima.py:43-334 (``ARIMAModel``: fit :144 wraps
statsmodels ARIMA, predict :236 returns (time, fcst, fcst_lower,
fcst_upper)) and sarima.py's differencing semantics.  This container has
no statsmodels, so estimation is the classic two-stage Hannan-Rissanen
procedure (public-domain algorithm):

1. difference d times;
2. fit a long AR(m) by OLS to estimate innovations;
3. regress x_t on (x_{t-1..p}, e_{t-1..q}) by OLS -> (phi, theta);
4. forecast recursively, integrate d times back, sigma bands from the
   innovation variance with psi-weight accumulation.

Per-series ``applyInPandas`` — same fan-out contract as every model-zoo
operator (kats/models/model.py:18).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054


def _hannan_rissanen(x: np.ndarray, p: int, q: int) -> tuple[np.ndarray, np.ndarray, float, np.ndarray, float]:
    """Returns (phi, theta, intercept, innovations, sigma2)."""
    n = len(x)
    mu = x.mean()
    xc = x - mu
    # stage 1: long AR for innovation estimates
    m = max(p + q + 2, int(round(np.log(n) * 2)))
    m = min(m, n // 3) or 1
    X1 = np.column_stack([xc[m - i : n - i] for i in range(1, m + 1)])
    a1, *_ = np.linalg.lstsq(X1, xc[m:], rcond=None)
    e = np.zeros(n)
    e[m:] = xc[m:] - X1 @ a1
    # stage 2: regression on lags of x and e
    k = max(p, q)
    start = m + k
    if n - start < p + q + 5:
        # short series: fall back to AR(p)-only OLS
        Xa = np.column_stack([xc[k - i : n - i] for i in range(1, p + 1)]) if p else np.empty((n - k, 0))
        phi, *_ = np.linalg.lstsq(Xa, xc[k:], rcond=None) if p else (np.zeros(0),)
        theta = np.zeros(q)
        resid = xc[k:] - (Xa @ phi if p else 0)
        sigma2 = float(resid @ resid / max(len(resid) - p, 1))
        return phi, theta, mu, e, sigma2
    cols = [xc[start - i : n - i] for i in range(1, p + 1)]
    cols += [e[start - j : n - j] for j in range(1, q + 1)]
    X2 = np.column_stack(cols) if cols else np.empty((n - start, 0))
    coef, *_ = np.linalg.lstsq(X2, xc[start:], rcond=None)
    phi = coef[:p]
    theta = coef[p : p + q]
    resid = xc[start:] - X2 @ coef
    sigma2 = float(resid @ resid / max(len(resid) - p - q, 1))
    # refresh innovations with fitted model for forecasting
    e2 = np.zeros(n)
    for t in range(k, n):
        ar = sum(phi[i] * xc[t - 1 - i] for i in range(p))
        ma = sum(theta[j] * e2[t - 1 - j] for j in range(q))
        e2[t] = xc[t] - ar - ma
    return phi, theta, mu, e2, sigma2


def _css_residuals(
    xc: np.ndarray, phi: np.ndarray, theta: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Conditional-sum-of-squares residuals and Jacobian.

    e_t = xc_t - sum_i phi_i xc_{t-i} - sum_j theta_j e_{t-j}  (e_{<k}=0)
    with the exact gradient recursions
      de/dphi_i  = -xc_{t-i}  - sum_j theta_j de_{t-j}/dphi_i
      de/dtheta_j= -e_{t-j}   - sum_l theta_l de_{t-l}/dtheta_j
    Returns (e, J) over t = k..n-1 where k = max(p, q)."""
    p, q = len(phi), len(theta)
    k = max(p, q)
    n = len(xc)
    m = p + q
    e = np.zeros(n)
    J = np.zeros((n, m))
    for t in range(k, n):
        ar = xc[t - p : t][::-1] @ phi if p else 0.0
        ma = e[t - q : t][::-1] @ theta if q else 0.0
        e[t] = xc[t] - ar - ma
        g = J[t]
        if p:
            g[:p] = -xc[t - p : t][::-1]
        if q:
            g[p:] = -e[t - q : t][::-1]
        if q:
            # - sum_j theta_j * dE_{t-j}/dparam  (chain through past grads)
            g -= theta @ J[t - q : t][::-1]
    return e[k:], J[k:]


def _css_refine(
    xc: np.ndarray, phi: np.ndarray, theta: np.ndarray, max_iter: int = 10
) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Newton CSS refinement from the Hannan-Rissanen start — the
    estimator statsmodels ARIMA uses for its CSS stage (the reference's
    kats/models/arima.py:144 fit wraps statsmodels MLE, which itself
    starts from CSS).  Each step solves the linearized least squares
    (J'J) d = -J'e with halving line search; a step that would leave the
    stationary/invertible region or raise the SSE is shrunk, and the HR
    start is kept if no step helps.  Typically converges in 3-5 steps."""
    p, q = len(phi), len(theta)
    if p + q == 0:
        return phi, theta
    params = np.concatenate([phi, theta])
    e, J = _css_residuals(xc, phi, theta)
    sse = float(e @ e)
    for _ in range(max_iter):
        A = J.T @ J
        A[np.diag_indices_from(A)] += 1e-8
        try:
            step = np.linalg.solve(A, J.T @ e)
        except np.linalg.LinAlgError:
            break
        improved = False
        for damp in (1.0, 0.5, 0.25, 0.1):
            cand = params - damp * step
            cp, ct = cand[:p], cand[p:]
            # keep roots outside the unit circle (loose guard: reject
            # wildly explosive candidates, accept the borderline ones the
            # data genuinely supports)
            if p and np.any(np.abs(np.roots(np.r_[1.0, -cp])) > 1.02):
                continue
            if q and np.any(np.abs(np.roots(np.r_[1.0, ct])) > 1.02):
                continue
            e2, J2 = _css_residuals(xc, cp, ct)
            sse2 = float(e2 @ e2)
            if sse2 < sse * (1 - 1e-10):
                params, e, J, sse = cand, e2, J2, sse2
                improved = True
                break
        if not improved:
            break
        if np.linalg.norm(damp * step) < 1e-9:
            break
    return params[:p], params[p:]


def _psi_weights(phi: np.ndarray, theta: np.ndarray, steps: int) -> np.ndarray:
    """MA(inf) psi weights for forecast variance accumulation."""
    p, q = len(phi), len(theta)
    psi = np.zeros(steps)
    for j in range(steps):
        v = theta[j] if j < q else 0.0
        for i in range(min(p, j + 1)):
            prev = psi[j - 1 - i] if j - 1 - i >= 0 else (1.0 if j - 1 - i == -1 else 0.0)
            v += phi[i] * prev
        psi[j] = v
    return psi


def _innovations(xc: np.ndarray, phi: np.ndarray, theta: np.ndarray) -> np.ndarray:
    p, q = len(phi), len(theta)
    k = max(p, q)
    n = len(xc)
    e = np.zeros(n)
    for t in range(k, n):
        ar = xc[t - p : t][::-1] @ phi if p else 0.0
        ma = e[t - q : t][::-1] @ theta if q else 0.0
        e[t] = xc[t] - ar - ma
    return e


def _arima_forecast_one(
    y: np.ndarray, p: int, d: int, q: int, steps: int, css: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (forecast, se) on the ORIGINAL scale."""
    x = y.copy()
    heads = []
    for _ in range(d):
        heads.append(x[-1])
        x = np.diff(x)
    phi, theta, mu, e, sigma2 = _hannan_rissanen(x, p, q)
    xc = x - mu
    if css and p + q:
        phi, theta = _css_refine(xc, phi, theta)
        e = _innovations(xc, phi, theta)
        k = max(p, q)
        resid = e[k:]
        sigma2 = float(resid @ resid / max(len(resid) - p - q, 1))
    n = len(xc)
    hist = list(xc)
    errs = list(e)
    fc = np.empty(steps)
    for h in range(steps):
        ar = sum(phi[i] * hist[-1 - i] for i in range(len(phi)))
        ma = sum(
            theta[j] * (errs[-1 - j] if len(errs) - 1 - j >= 0 else 0.0)
            for j in range(len(theta))
        )
        v = ar + ma
        fc[h] = v + mu
        hist.append(v)
        errs.append(0.0)
    # variance: cumulative psi^2 on the differenced scale, then integrate
    psi = np.concatenate([[1.0], _psi_weights(phi, theta, steps - 1)]) if steps > 1 else np.array([1.0])
    var_diff = sigma2 * np.cumsum(psi**2)
    out = fc
    for head in reversed(heads):
        out = head + np.cumsum(out)
    se = np.sqrt(var_diff)
    if d > 0:
        # integrated forecasts accumulate variance; use cumulative sum of se
        se = np.sqrt(np.cumsum(var_diff))
    return out, se


def arima_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    order: tuple[int, int, int] = (2, 1, 1),
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper)."""
    p, d, q = order
    schema = (
        f"{s.series_id} string, {s.time} timestamp, "
        "fcst double, fcst_lower double, fcst_upper double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        sid = pdf[s.series_id].iloc[0]
        if len(y) < 3 * (p + q + d) + 10:
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        fc, se = _arima_forecast_one(y, p, d, q, steps)
        h = np.arange(1, steps + 1)
        times = pd.Timestamp(pdf[s.time].iloc[-1]) + pd.to_timedelta(
            h * freq_seconds, unit="s"
        )
        return pd.DataFrame(
            {
                s.series_id: sid,
                s.time: times,
                "fcst": fc,
                "fcst_lower": fc - Z95 * se,
                "fcst_upper": fc + Z95 * se,
            }
        )

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )


def _css_residuals_lagset(
    xc: np.ndarray,
    phi: np.ndarray,
    theta: np.ndarray,
    ar_lags: list[int],
    ma_lags: list[int],
) -> tuple[np.ndarray, np.ndarray]:
    """CSS residuals + Jacobian for SPARSE lag sets (the additive
    lag-set parameterization sarima.py fits):
      e_t = xc_t - sum_i phi_i xc_{t-l_i} - sum_j theta_j e_{t-lm_j}
    with the same chain-rule gradient recursions as the dense case."""
    k = max(ar_lags + ma_lags, default=0)
    n = len(xc)
    m = len(phi) + len(theta)
    e = np.zeros(n)
    J = np.zeros((n, m))
    for t in range(k, n):
        ar = sum(phi[i] * xc[t - l] for i, l in enumerate(ar_lags))
        ma = sum(theta[j] * e[t - l] for j, l in enumerate(ma_lags))
        e[t] = xc[t] - ar - ma
        g = J[t]
        for i, l in enumerate(ar_lags):
            g[i] = -xc[t - l]
        for j, l in enumerate(ma_lags):
            g[len(ar_lags) + j] = -e[t - l]
        for j, l in enumerate(ma_lags):
            g -= theta[j] * J[t - l]
    return e[k:], J[k:]


def _css_refine_lagset(
    xc: np.ndarray,
    phi: np.ndarray,
    theta: np.ndarray,
    ar_lags: list[int],
    ma_lags: list[int],
    max_iter: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Damped Gauss-Newton CSS over the lag-set parameterization; the
    stationarity/invertibility guard checks the DENSE polynomial built
    from the sparse coefficients."""
    p, q = len(phi), len(theta)
    if p + q == 0:
        return phi, theta

    def dense(coefs, lags):
        out = np.zeros(max(lags, default=0))
        for c, l in zip(coefs, lags):
            out[l - 1] = c
        return out

    params = np.concatenate([phi, theta])
    e, J = _css_residuals_lagset(xc, phi, theta, ar_lags, ma_lags)
    sse = float(e @ e)
    for _ in range(max_iter):
        A = J.T @ J
        A[np.diag_indices_from(A)] += 1e-8
        try:
            step = np.linalg.solve(A, J.T @ e)
        except np.linalg.LinAlgError:
            break
        improved = False
        for damp in (1.0, 0.5, 0.25, 0.1):
            cand = params - damp * step
            cp, ct = cand[:p], cand[p:]
            dp, dt = dense(cp, ar_lags), dense(ct, ma_lags)
            if len(dp) and np.any(np.abs(np.roots(np.r_[1.0, -dp])) > 1.02):
                continue
            if len(dt) and np.any(np.abs(np.roots(np.r_[1.0, dt])) > 1.02):
                continue
            e2, J2 = _css_residuals_lagset(xc, cp, ct, ar_lags, ma_lags)
            sse2 = float(e2 @ e2)
            if sse2 < sse * (1 - 1e-10):
                params, e, J, sse = cand, e2, J2, sse2
                improved = True
                break
        if not improved:
            break
    return params[:p], params[p:]
