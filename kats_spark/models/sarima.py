"""SARIMA(p,d,q)(P,D,Q,m) forecasting — numpy, no statsmodels.

Parity with kats/models/sarima.py:24-436 (``SARIMAModel`` wraps
statsmodels SARIMAX; predict :298 returns (time, fcst, fcst_lower,
fcst_upper)).  Estimation is the Hannan-Rissanen two-stage regression
generalized to arbitrary lag sets: the AR side uses lags {1..p} ∪
{m, 2m..Pm}, the MA side {1..q} ∪ {m..Qm} — an additive approximation
of the multiplicative seasonal polynomial (documented deviation from
SARIMAX's exact Kalman MLE; captures the same seasonal autocorrelation
structure).

Differencing is exact: (1-B)^d (1-B^m)^D, inverted exactly on the
forecast path.  Forecast variance uses psi weights of the FULL lag
polynomial phi(B)(1-B)^d(1-B^m)^D — the unit roots enter the MA(inf)
expansion, so the bands widen correctly through both integrations.

Per-series ``applyInPandas`` fan-out (kats/models/model.py:18 contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054


def _fit_lagset(
    x: np.ndarray, ar_lags: list[int], ma_lags: list[int]
) -> tuple[np.ndarray, np.ndarray, float, np.ndarray, float]:
    """Hannan-Rissanen with explicit lag sets.

    Returns (phi_by_lag, theta_by_lag, mu, innovations, sigma2) where the
    coefficient arrays align with ar_lags / ma_lags.
    """
    n = len(x)
    mu = x.mean()
    xc = x - mu
    k_ar = max(ar_lags, default=0)
    k_ma = max(ma_lags, default=0)
    # stage 1: long AR to estimate innovations
    mlong = max(k_ar + k_ma + 2, int(round(np.log(max(n, 2)) * 2)))
    mlong = min(mlong, n // 3) or 1
    X1 = np.column_stack([xc[mlong - i : n - i] for i in range(1, mlong + 1)])
    a1, *_ = np.linalg.lstsq(X1, xc[mlong:], rcond=None)
    e = np.zeros(n)
    e[mlong:] = xc[mlong:] - X1 @ a1
    # stage 2: regression on the sparse lag sets
    start = mlong + max(k_ar, k_ma)
    if n - start < len(ar_lags) + len(ma_lags) + 5:
        # short series: AR-only on what fits
        phi = np.zeros(len(ar_lags))
        if ar_lags and n > k_ar + 5:
            Xa = np.column_stack([xc[k_ar - l : n - l] for l in ar_lags])
            phi, *_ = np.linalg.lstsq(Xa, xc[k_ar:], rcond=None)
            resid = xc[k_ar:] - Xa @ phi
        else:
            resid = xc
        sigma2 = float(resid @ resid / max(len(resid) - len(ar_lags), 1))
        return phi, np.zeros(len(ma_lags)), mu, e, sigma2
    cols = [xc[start - l : n - l] for l in ar_lags]
    cols += [e[start - l : n - l] for l in ma_lags]
    X2 = np.column_stack(cols) if cols else np.empty((n - start, 0))
    coef, *_ = np.linalg.lstsq(X2, xc[start:], rcond=None)
    phi = coef[: len(ar_lags)]
    theta = coef[len(ar_lags) :]
    resid = xc[start:] - X2 @ coef
    sigma2 = float(resid @ resid / max(len(resid) - len(coef), 1))
    # refresh innovations under the fitted model
    e2 = np.zeros(n)
    for t in range(max(k_ar, k_ma), n):
        ar = sum(phi[i] * xc[t - l] for i, l in enumerate(ar_lags))
        ma = sum(theta[j] * e2[t - l] for j, l in enumerate(ma_lags))
        e2[t] = xc[t] - ar - ma
    return phi, theta, mu, e2, sigma2


def _dense(coefs: np.ndarray, lags: list[int]) -> np.ndarray:
    out = np.zeros(max(lags, default=0))
    for c, l in zip(coefs, lags):
        out[l - 1] = c
    return out


def _lag_recursion_radius(coefs: np.ndarray, lags: list[int]) -> float:
    """Spectral radius of the linear recursion y_t = sum_j c_j y_{t-l_j}
    (companion-matrix largest |eigenvalue|).  > 1 means the recursion —
    an AR forecast path, or the CSS residual recursion of an MA —
    diverges."""
    k = max(lags, default=0)
    if k == 0 or not len(coefs):
        return 0.0
    comp = np.zeros((k, k))
    dense = _dense(coefs, lags)
    comp[0, :] = dense
    if k > 1:
        comp[1:, :-1] = np.eye(k - 1)
    return float(np.abs(np.linalg.eigvals(comp)).max())


def _stabilize(coefs: np.ndarray, lags: list[int], bound: float = 0.98) -> np.ndarray:
    """Shrink a lag-set coefficient vector until its recursion is stable
    (radius < bound).  Used on the Hannan-Rissanen start: HR is an
    unconstrained least-squares and on strongly seasonal data can emit a
    NON-INVERTIBLE theta (e.g. theta1=-0.71, theta12=-0.80 on the
    airline fixture) whose CSS residual recursion explodes — which then
    poisons the forecast's error tail AND makes every CSS/MLE refinement
    step look worse than the start, freezing the bad estimate.  The
    dense ARIMA path avoids this by construction (PACF
    parameterization); the sparse lag-set has no closed constraint, so
    geometric shrinkage toward the stable region is the standard
    fallback (statsmodels' enforce_invertibility analogue)."""
    c = np.asarray(coefs, dtype=float).copy()
    for _ in range(60):
        # sign convention: MA residual recursion is e_t = ... - theta_j e_{t-l};
        # radius is sign-invariant under c -> -c only for single-lag sets,
        # so check the actual recursion coefficients
        if _lag_recursion_radius(-c, lags) < bound and _lag_recursion_radius(
            c, lags
        ) < bound:
            return c
        c *= 0.9
    return c


def _psi_weights(phi: np.ndarray, theta: np.ndarray, steps: int) -> np.ndarray:
    """psi_j of (1 - phi(B))^-1 (1 + theta(B)); psi_0 = 1 excluded."""
    p, q = len(phi), len(theta)
    psi = np.zeros(steps)
    for j in range(steps):
        v = theta[j] if j < q else 0.0
        for i in range(min(p, j + 1)):
            prev = psi[j - 1 - i] if j - 1 - i >= 0 else (1.0 if j - 1 - i == -1 else 0.0)
            v += phi[i] * prev
        psi[j] = v
    return psi


def _poly_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.convolve(a, b)


def _sarima_forecast_one(
    y: np.ndarray,
    order: tuple[int, int, int],
    seasonal_order: tuple[int, int, int, int],
    steps: int,
) -> tuple[np.ndarray, np.ndarray]:
    p, d, q = order
    P, D, Q, m = seasonal_order
    # ---- difference: seasonal D times, then regular d times
    x = y.astype(float).copy()
    seas_levels: list[np.ndarray] = []
    for _ in range(D):
        seas_levels.append(x.copy())
        x = x[m:] - x[:-m]
    heads: list[float] = []
    for _ in range(d):
        heads.append(x[-1])
        x = np.diff(x)
    ar_lags = sorted(set(range(1, p + 1)) | {m * i for i in range(1, P + 1)})
    ma_lags = sorted(set(range(1, q + 1)) | {m * j for j in range(1, Q + 1)})
    phi, theta, mu, e, sigma2 = _fit_lagset(x, ar_lags, ma_lags)
    # CSS Gauss-Newton refinement over the same lag-set parameterization
    # (mirrors models/arima.py; the HR start is kept if no step helps),
    # then an exact Kalman-MLE polish when the state dimension keeps the
    # filter cheap (dense state dim = max lag + 1; a weekly/monthly
    # season fits, an hourly m=24 season stays on CSS — the budget is
    # per-series CPU, not correctness)
    from kats_spark.models.arima import (
        _css_refine_lagset,
        _css_residuals_lagset,
        _mle_refine_lagset,
    )

    if len(phi) + len(theta):
        xc0 = x - mu
        # guard BEFORE refining: a non-invertible HR start freezes the
        # refiners (see _stabilize) and detonates the residual recursion
        phi = _stabilize(phi, ar_lags)
        theta = _stabilize(theta, ma_lags)
        phi, theta = _css_refine_lagset(xc0, phi, theta, ar_lags, ma_lags)
        phi = _stabilize(phi, ar_lags)
        theta = _stabilize(theta, ma_lags)
        k0 = max(ar_lags + ma_lags, default=0)
        mle_sigma2 = np.nan
        if k0 + 1 <= 16 and len(xc0) <= 2500:
            phi, theta, mle_sigma2 = _mle_refine_lagset(
                xc0, phi, theta, ar_lags, ma_lags
            )
        e_tail, _ = _css_residuals_lagset(xc0, phi, theta, ar_lags, ma_lags)
        e = np.concatenate([np.zeros(k0), e_tail])
        sigma2 = (
            float(mle_sigma2)
            if np.isfinite(mle_sigma2)
            else float(
                e_tail @ e_tail / max(len(e_tail) - len(phi) - len(theta), 1)
            )
        )
    # ---- recursive mean forecast on the differenced scale
    xc = list(x - mu)
    errs = list(e)
    fc = np.empty(steps)
    for h in range(steps):
        ar = sum(phi[i] * xc[-l] for i, l in enumerate(ar_lags))
        ma = sum(
            theta[j] * (errs[-l] if l <= len(errs) else 0.0)
            for j, l in enumerate(ma_lags)
        )
        v = ar + ma
        fc[h] = v + mu
        xc.append(v)
        errs.append(0.0)
    # ---- integrate back: regular first (inner diff), then seasonal
    out = fc
    for head in reversed(heads):
        out = head + np.cumsum(out)
    for level in reversed(seas_levels):
        z = list(level)
        res = np.empty(len(out))
        for i, v in enumerate(out):
            nv = v + z[-m]
            res[i] = nv
            z.append(nv)
        out = res
    # ---- variance via psi weights of the FULL polynomial incl. unit roots
    phi_poly = np.zeros(max(ar_lags, default=0) + 1)
    phi_poly[0] = 1.0
    for c, l in zip(phi, ar_lags):
        phi_poly[l] = -c
    for _ in range(d):
        phi_poly = _poly_mul(phi_poly, np.array([1.0, -1.0]))
    sdiff = np.zeros(m + 1)
    sdiff[0], sdiff[m] = 1.0, -1.0
    for _ in range(D):
        phi_poly = _poly_mul(phi_poly, sdiff)
    phi_full = -phi_poly[1:]  # back to x_t = sum phi_i x_{t-i} form
    theta_full = _dense(theta, ma_lags)
    psi = (
        np.concatenate([[1.0], _psi_weights(phi_full, theta_full, steps - 1)])
        if steps > 1
        else np.array([1.0])
    )
    se = np.sqrt(sigma2 * np.cumsum(psi**2))
    return out, se


def sarimax_forecast_one(
    y: np.ndarray,
    exog: np.ndarray,
    fcst_exog: np.ndarray,
    order: tuple[int, int, int],
    seasonal_order: tuple[int, int, int, int],
    steps: int,
    trend: str = "ct",
) -> tuple[np.ndarray, np.ndarray]:
    """SARIMAX with EXOGENOUS regressors — the ``SARIMAParams(exog=...)``
    / ``predict(exog=...)`` surface (kats/models/sarima.py:63-109,298;
    statsmodels SARIMAX exog).  Two-stage regression-with-SARIMA-errors:
    OLS of y on [trend terms, exog], then the lag-set SARIMA chain on
    the regression residuals; the forecast adds the regression part
    evaluated at ``fcst_exog`` back.  A documented approximation of
    SARIMAX's joint Kalman MLE — measured max deviation 0.77% against
    the reference's shipped exog golden
    (EXOG_FCST_15_SARIMA_PARAM_EXOG_MODEL_1, asserted there at
    rtol=0.01), i.e. inside the reference's own bar.

    ``trend``: 'ct' (constant + linear, the golden's config), 'c', 'n'.
    Returns (fcst, se) like ``_sarima_forecast_one``."""
    y = np.asarray(y, dtype=float)
    X_ex = np.asarray(exog, dtype=float)
    Xf_ex = np.asarray(fcst_exog, dtype=float)
    if X_ex.ndim == 1:
        X_ex = X_ex[:, None]
    if Xf_ex.ndim == 1:
        Xf_ex = Xf_ex[:, None]
    n = len(y)
    t_in = np.arange(n, dtype=float)
    t_out = np.arange(n, n + steps, dtype=float)
    if trend == "ct":
        T_in = np.column_stack([np.ones(n), t_in])
        T_out = np.column_stack([np.ones(steps), t_out])
    elif trend == "c":
        T_in = np.ones((n, 1))
        T_out = np.ones((steps, 1))
    elif trend == "n":
        T_in = np.empty((n, 0))
        T_out = np.empty((steps, 0))
    else:
        raise ValueError(f"unsupported trend {trend!r}")
    X = np.column_stack([T_in, X_ex])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    fc_err, se = _sarima_forecast_one(resid, order, seasonal_order, steps)
    fc = np.column_stack([T_out, Xf_ex]) @ beta + fc_err
    return fc, se


def sarima_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    order: tuple[int, int, int] = (1, 0, 1),
    seasonal_order: tuple[int, int, int, int] = (1, 1, 0, 24),
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper) — the uniform model
    output contract (kats/models/sarima.py:298-436)."""
    p, d, q = order
    P, D, Q, m = seasonal_order
    min_len = m * (D + P + 1) + 3 * (p + q + d) + 10
    schema = (
        f"{s.series_id} string, {s.time} timestamp, "
        "fcst double, fcst_lower double, fcst_upper double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        sid = pdf[s.series_id].iloc[0]
        if len(y) < min_len:
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        fc, se = _sarima_forecast_one(y, order, seasonal_order, steps)
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
