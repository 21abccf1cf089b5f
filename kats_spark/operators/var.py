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


def _gauss_solve_multi(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Pivot-free Gauss-Jordan solve of A C = B for positive-definite A.

    Deterministic scalar elimination order — the DuckDB VAR oracles replay
    the identical double-precision operations in a recursive CTE, so this
    (rather than np.linalg.lstsq's SVD) keeps the correctness gate on the
    6-decimal rounding lattice."""
    m = A.shape[0]
    aug = np.concatenate([A.astype(float), B.astype(float)], axis=1)
    for piv_i in range(m):
        piv = aug[piv_i, piv_i]
        aug[piv_i] = aug[piv_i] / piv
        for r in range(m):
            if r != piv_i:
                aug[r] = aug[r] - aug[r, piv_i] * aug[piv_i]
    return aug[:, m:]


def _standardize(Y: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Column z-scores (population sd).  The VAR regression runs in z-space:
    OLS predictions are invariant to the affine transform in exact
    arithmetic, and the O(1) regressors keep the normal equations
    well-conditioned for the Gauss-Jordan oracle replay."""
    mu = Y.mean(axis=0)
    sd = np.sqrt(((Y - mu) ** 2).mean(axis=0))
    sd = np.where(sd > 0, sd, 1.0)
    return (Y - mu) / sd, mu, sd


def _var_design(Z: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    n, k = Z.shape
    rows = n - p
    X = np.ones((rows, 1 + p * k))
    for i in range(1, p + 1):
        X[:, 1 + (i - 1) * k : 1 + i * k] = Z[p - i : n - i]
    return X, Z[p:]


def select_order(Z: np.ndarray, maxlags: int, ic: str = "aic") -> int:
    """VAR order selection by information criterion — the reference's
    fit surface (kats/models/var.py:107-120 passes maxlags/ic to
    statsmodels; default maxlags = 12*(n/100)^0.25).  For each candidate
    p the OLS residual covariance determinant gives
      aic  = ln|S| + 2 d / T
      bic  = ln|S| + d ln(T) / T
      hqic = ln|S| + 2 d ln(ln(T)) / T
    with d = k(1 + p k) free parameters and T the common sample size
    (rows after dropping maxlags leading points, so candidates compare
    on identical data — the statsmodels convention)."""
    n, k = Z.shape
    T = n - maxlags
    if T <= maxlags * k + 1:
        return 1
    best_p, best_val = 1, np.inf
    for p in range(1, maxlags + 1):
        X, Y = _var_design(Z[maxlags - p :], p)
        coef = _gauss_solve_multi(X.T @ X + 1e-10 * np.eye(X.shape[1]), X.T @ Y)
        resid = Y - X @ coef
        S = resid.T @ resid / T
        sign, logdet = np.linalg.slogdet(S + 1e-300 * np.eye(k))
        if sign <= 0:
            continue
        d = k * (1 + p * k)
        if ic == "bic":
            val = logdet + d * np.log(T) / T
        elif ic == "hqic":
            val = logdet + 2.0 * d * np.log(np.log(T)) / T
        else:
            val = logdet + 2.0 * d / T
        if val < best_val:
            best_p, best_val = p, val
    return best_p


def default_maxlags(n: int) -> int:
    """statsmodels/reference default: 12 * (n/100)^0.25 (var.py:109)."""
    return max(1, int(12 * (n / 100.0) ** 0.25))


def _var_fit_forecast(wide: pd.DataFrame, p: int, steps: int) -> tuple[np.ndarray, np.ndarray]:
    """wide: rows=time, cols=series. Returns (forecast[steps,k], sigma[k])."""
    Y = wide.to_numpy(dtype=float)
    n, k = Y.shape
    Z, mu, sd = _standardize(Y)
    X, T = _var_design(Z, p)
    rows = n - p
    coef = _gauss_solve_multi(X.T @ X, X.T @ T)  # (1+p*k, k)
    resid = T - X @ coef
    dof = max(rows - (1 + p * k), 1)
    sigma = sd * np.sqrt((resid**2).sum(axis=0) / dof)

    hist = Z[-p:].copy()
    out = np.empty((steps, k))
    for h in range(steps):
        x = np.ones(1 + p * k)
        for i in range(1, p + 1):
            x[1 + (i - 1) * k : 1 + i * k] = hist[-i]
        zh = x @ coef
        out[h] = mu + sd * zh
        hist = np.vstack([hist, zh])[-p:]
    return out, sigma


def var_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    p: int | None = 1,
    group_col: str | None = None,
    s: TSSchema = DEFAULT,
    maxlags: int | None = None,
    ic: str = "aic",
) -> DataFrame:
    """Forecast every series jointly within a group (default: all series
    form one vector).  Output (series_id, time, fcst, fcst_lower,
    fcst_upper) — the model-zoo contract frame (kats/models/model.py:18).

    ``p=None`` selects the order per group by information criterion over
    ``maxlags`` candidates (reference var.py:107-120 surface; default
    maxlags = 12*(n/100)^0.25) — data-dependent, so callers needing the
    SQL oracle use a fixed p."""
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
        if wide.shape[1] == 0:
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        if p is None:
            ml = maxlags or default_maxlags(len(wide))
            Z0, _, _ = _standardize(wide.to_numpy(dtype=float))
            use_p = select_order(Z0, ml, ic)
        else:
            use_p = p
        if len(wide) < 3 * use_p + 5:
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        fc, sigma = _var_fit_forecast(wide, use_p, steps)
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
        Z, _, _ = _standardize(Y)
        X, T = _var_design(Z, p)
        coef = _gauss_solve_multi(X.T @ X, X.T @ T)
        resid = T - X @ coef
        rm = resid.mean(axis=0)
        rc = resid - rm
        cov = (rc.T @ rc) / (len(resid) - 1) + 1e-9 * np.eye(k)
        icov = _gauss_solve_multi(cov, np.eye(k))
        d = np.sqrt(np.einsum("ij,jk,ik->i", resid, icov, resid))
        return pd.DataFrame(
            {gcol: g, s.time: wide.index[p:], "mahalanobis": np.round(d, 6)}
        )

    return src.select(gcol, s.series_id, s.time, s.value).groupBy(gcol).applyInPandas(fn, schema)
