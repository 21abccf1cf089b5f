"""Bayesian VAR(p) with Minnesota prior — numpy closed-form posterior.

Parity with kats/models/bayesian_var.py:35-517 (``BayesianVAR``:
Minnesota/Litterman prior with tightness knobs phi_0..phi_3 :50-53,
closed-form normal posterior fit :183-243, sigma_ols :279-293, prior
covariance :295+ per Canova ch.10 p.5).

Math note: the reference loops t over block-diagonal Z_t matrices.
Because every equation shares the same regressor vector z_t
(lags + intercept), the stacked quantities collapse to Kronecker
products:  sum_t Z_t' S^-1 Z_t = kron(S^-1, sum_t z_t z_t') and
sum_t Z_t' S^-1 y_t = sum_t kron(S^-1 y_t, z_t) — so the fit is two
small dense solves instead of a T-step loop of m(mp+1)-sized products.

Spark plan: identical fan-out to operators/var.py — one shuffle groups
co-observed series, the (mp+1)-sized algebra runs in numpy inside
``applyInPandas``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054


def _bvar_fit(
    Y: np.ndarray, p: int, phi_0: float, phi_1: float, phi_2: float, phi_3: float
) -> tuple[np.ndarray, np.ndarray]:
    """Y: (T, m) observations. Returns (coef (N, m) with N = m*p + 1 laid
    out [var0 lag1..varm lag1, var0 lag2.., intercept], sigma (m,))."""
    T, m = Y.shape
    N = m * p + 1
    rows = T - p
    # regressor matrix: z_t = [y_{t-1}, ..., y_{t-p}, 1]
    X = np.ones((rows, N))
    for i in range(1, p + 1):
        X[:, (i - 1) * m : i * m] = Y[p - i : T - i]
    Yt = Y[p:]
    # r12: deterministic replay numerics (the VAR-oracle convention,
    # operators/var.py:28) — normal equations accumulated SEQUENTIALLY
    # in t (matching DuckDB list_sum order; BLAS matmul sums blockwise,
    # which drifts off the 6dp rounding lattice on raw-scale inputs)
    # and solved by the pivot-free Gauss-Jordan instead of lstsq's SVD.
    # Valid: X'X is positive definite for rank-complete designs, and
    # sigma_ols / the ridge-like posterior matrix are PD by
    # construction.  Same estimator to ~1e-11; now SQL-replayable.
    from kats_spark.operators.var import _gauss_solve_multi

    S = np.zeros((N, N))
    C = np.zeros((N, m))
    for t in range(rows):
        S += np.outer(X[t], X[t])
        C += np.outer(X[t], Yt[t])
    # sigma_ols from the unrestricted OLS fit (bayesian_var.py:279-293)
    beta_ols = _gauss_solve_multi(S, C)
    resid = Yt - X @ beta_ols
    dof = max(T - m * p - 1, 1)
    sig_acc = np.zeros((m, m))
    for t in range(rows):
        sig_acc += np.outer(resid[t], resid[t])
    sigma_ols = sig_acc / float(dof)
    inv_sigma = _gauss_solve_multi(sigma_ols, np.eye(m))
    # Minnesota prior (bayesian_var.py:_sigma_ijl, Canova ch.10 p.5):
    # own lag l: phi0/l^phi3; cross (i,j): phi0*phi1/l^phi3 * var_j/var_i;
    # intercept: phi0*phi2.  Prior mean: 1 on own first lag (random walk).
    variance = Y.var(axis=0)
    v_prior_diag = np.empty(m * N)
    mu_prior = np.zeros(m * N)
    for i in range(m):  # equation i
        base = i * N
        mu_prior[base + i] = 1.0  # own lag-1 coefficient
        for l in range(1, p + 1):
            for j in range(m):
                idx = base + (l - 1) * m + j
                if i == j:
                    v_prior_diag[idx] = phi_0 / l**phi_3
                else:
                    v_prior_diag[idx] = (
                        phi_0 * (phi_1 / l**phi_3) * (variance[j] / variance[i])
                    )
        v_prior_diag[base + N - 1] = phi_0 * phi_2  # intercept
    inv_v_prior = np.diag(1.0 / v_prior_diag)
    # Kronecker collapse of the stacked posterior (see module docstring).
    # y_sum = kron(inv_sigma, X') vec(Y') collapses further to
    # (inv_sigma @ C')_{i,a} with C = X'Y — a 5-term dot per entry, the
    # form the DuckDB oracle replays (the big kron matvec's float-sum
    # order is BLAS-internal; the collapsed form is exact-equal and
    # deterministic).
    ZsZ = np.kron(inv_sigma, S)
    y_sum = (inv_sigma @ C.T).reshape(-1)
    mu_post = _gauss_solve_multi(
        inv_v_prior + ZsZ,
        (inv_v_prior @ mu_prior + y_sum).reshape(-1, 1),
    ).ravel()
    coef = mu_post.reshape(m, N).T  # (N, m): column i = equation i
    sigma = np.sqrt(np.diag(sigma_ols))
    return coef, sigma


def _bvar_forecast(Y: np.ndarray, coef: np.ndarray, p: int, steps: int) -> np.ndarray:
    T, m = Y.shape
    hist = Y[-p:].copy()
    out = np.empty((steps, m))
    N = m * p + 1
    for h in range(steps):
        z = np.ones(N)
        for i in range(1, p + 1):
            z[(i - 1) * m : i * m] = hist[-i]
        yh = z @ coef
        out[h] = yh
        hist = np.vstack([hist, yh])[-p:]
    return out


def bvar_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    p: int = 5,
    phi_0: float = 0.02,
    phi_1: float = 0.25,
    phi_2: float = 20.0,
    phi_3: float = 3.0,
    group_col: str | None = None,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper) for every member
    series of each vector group (default: all series are one system)."""
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
        m = wide.shape[1]
        if len(wide) < m * p + p + 5 or m == 0:
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        Y = wide.to_numpy(dtype=float)
        coef, sigma = _bvar_fit(Y, p, phi_0, phi_1, phi_2, phi_3)
        fc = _bvar_forecast(Y, coef, p, steps)
        h = np.arange(1, steps + 1)
        times = wide.index[-1] + pd.to_timedelta(h * freq_seconds, unit="s")
        frames = []
        for j, sid in enumerate(wide.columns):
            frames.append(
                pd.DataFrame(
                    {
                        s.series_id: str(sid),
                        s.time: times,
                        "fcst": fc[:, j],
                        "fcst_lower": fc[:, j] - Z95 * sigma[j],
                        "fcst_upper": fc[:, j] + Z95 * sigma[j],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return (
        src.select(gcol, s.series_id, s.time, s.value)
        .groupBy(gcol)
        .applyInPandas(fn, schema)
    )
