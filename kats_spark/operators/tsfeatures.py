"""TsFeatures: the full per-series feature vector (SURVEY §2.11).

Parity with kats/tsfeatures/tsfeatures.py:108-240 (registry
``_ALL_TS_FEATURES`` / ``_FEATURE_GROUP_MAPPING``) and ``transform``
:490-588: one row per series with named features.

Two-layer Spark plan:
- *expression layer* (statistics / level-shift / nowcasting groups):
  pure window+agg expressions shared with functions/stats.py — oracled
  separately (ts_stat_features, acf_features, level_shift, decomp_strength
  queries);
- *kernel layer* (spectral entropy :636, hurst :906, unitroot_kpss :1238,
  het_arch :1259, linearity :1349, firstmin/firstzero autocorrelation
  :1297, holt/hw fitted params :1365,1400, trend/seasonality strength
  :738): one numpy pass per series via ``applyInPandas`` — a single
  groupBy(series_id) shuffle computes ALL kernel features in one Arrow
  batch (the reference dispatches feature-by-feature per series in
  Python).

``tsfeatures(df)`` joins both layers into one wide frame; group opt-in
mirrors the reference's ``selected_features``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.functions import stats as stats_fn
from kats_spark.tsframe import TSSchema, DEFAULT


def _acf(y: np.ndarray, nlags: int) -> np.ndarray:
    y = y - y.mean()
    n = len(y)
    d = np.dot(y, y)
    if d == 0:
        return np.zeros(nlags + 1)
    return np.array([np.dot(y[: n - k], y[k:]) / d for k in range(nlags + 1)])


def _spectral_entropy(y: np.ndarray) -> float:
    """Normalized Shannon entropy of the one-sided periodogram, exactly
    scipy's ``periodogram(x, fs)`` as the reference computes it
    (tsfeatures.py:633-655): constant detrend, interior frequencies
    DOUBLED (one-sided scaling) while DC and Nyquist are not, log2, and
    the normalizer is log2 of the FULL bin count (n//2 + 1, the zero
    bin included — its 0·log0 term is nan-skipped).  r10 parity fix:
    the old version dropped the DC bin and used uniform |rfft|² weights
    with a natural-log normalizer — 1.3% off on the T1 golden."""
    n = len(y)
    y = y - y.mean()
    amp2 = np.abs(np.fft.rfft(y)) ** 2
    psd = amp2.copy()
    if n % 2 == 0:
        psd[1:-1] *= 2.0  # Nyquist bin not doubled
    else:
        psd[1:] *= 2.0
    tot = psd.sum()
    if tot <= 0:
        return 0.0
    p = psd / tot
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = p * np.log2(p)
    ent = np.nansum(terms)
    return float(-(ent / np.log2(p.size)))


def _hurst(y: np.ndarray, lag_size: int = 30) -> float:
    """Variance-of-differences slope estimator (tsfeatures.py:906-928):
    lags = range(2, min(lag_size, n-1)) — the reference's exact lag set
    (r10 parity fix: we previously capped at n//2 with max_lag=20, which
    lands a different slope on short series; the committed
    METALEARNING_TEST_T1 feature vector pins this)."""
    n = len(y)
    hi = min(lag_size, n - 1)
    if hi <= 3:
        return np.nan
    lags = np.arange(2, hi)
    # the reference takes log(tau) UNclamped: a constant series gives
    # tau=0 -> log(0)=-inf -> NaN slope, and get_hurst returns 0 on a
    # NaN slope (tsfeatures.py:928) — mirror both (ADVICE r10)
    tau = np.array([np.std(y[l:] - y[:-l]) for l in lags])
    with np.errstate(divide="ignore"):
        slope = float(np.polyfit(np.log(lags), np.log(tau), 1)[0])
    return slope if not np.isnan(slope) else 0.0


def _kpss(y: np.ndarray) -> float:
    """KPSS statistic exactly as the reference computes it
    (tsfeatures.py:1238: ``kpss(x, regression="ct", nlags=1)``):
    TREND-stationarity — residuals of the OLS fit on [1, t] — with a
    Bartlett long-run variance at nlags=1 (s² = γ0 + γ1, since the
    l=1 Bartlett weight is 1/2 and enters doubled).  r10 parity fix:
    the previous version tested LEVEL stationarity with legacy lag
    count — a different statistic entirely."""
    n = len(y)
    t = np.arange(n, dtype=float)
    tc = t - t.mean()
    denom = float(tc @ tc)
    if denom <= 0:
        return np.nan
    b = float(tc @ y) / denom
    a = float(y.mean()) - b * float(t.mean())
    e = y - (a + b * t)
    s = np.cumsum(e)
    gamma0 = float(e @ e) / n
    gamma1 = float(e[:-1] @ e[1:]) / n
    lrv = gamma0 + gamma1
    if lrv <= 0:
        return np.nan
    return float(np.dot(s, s) / (n * n * lrv))


def _gauss_solve(A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pivot-free Gauss-Jordan on a (small) positive-definite system.

    Deterministic scalar elimination order — the DuckDB oracle replays the
    identical double-precision operations in a recursive CTE, so using
    this instead of np.linalg.lstsq (SVD, not SQL-replayable) buys bit
    parity for the correctness gate.  Valid because the ARCH normal
    equations X'X are positive definite (no pivoting needed)."""
    m = len(b)
    aug = np.concatenate([A.astype(float), b.reshape(-1, 1).astype(float)], axis=1)
    for p in range(m):
        piv = aug[p, p]
        aug[p] = aug[p] / piv
        for r in range(m):
            if r != p:
                aug[r] = aug[r] - aug[r, p] * aug[p]
    return aug[:, m]


def _arch_r2(y: np.ndarray, nlags: int = 4) -> float:
    """R² of the Engle ARCH LM regression of x² on its lags — exactly
    statsmodels ``het_arch`` as the reference calls it
    (tsfeatures.py:1259: raw series squared, NOT centered residuals —
    r10 parity fix); OLS via normal equations + _gauss_solve.

    x² is scaled by its mean before the regression — the statistic is
    scale-invariant in exact arithmetic, and the O(1) regressors keep the
    normal equations well-conditioned so the DuckDB replay stays within
    the 6-decimal rounding lattice."""
    e2 = y**2
    n = len(e2) - nlags
    if n < nlags + 2:
        return np.nan
    m2 = e2.mean()
    if m2 <= 0:
        return np.nan
    z = e2 / m2
    X = np.ones((n, nlags + 1))
    for i in range(1, nlags + 1):
        X[:, i] = z[nlags - i : len(z) - i]
    t = z[nlags:]
    coef = _gauss_solve(X.T @ X, X.T @ t)
    pred = X @ coef
    ss_res = float(((t - pred) ** 2).sum())
    ss_tot = float(((t - t.mean()) ** 2).sum())
    if ss_tot <= 0:
        return np.nan
    return float(1.0 - ss_res / ss_tot)


def _het_arch(y: np.ndarray, nlags: int | None = None) -> float:
    """Engle ARCH LM statistic = nobs·R² with the reference's lag rule
    ``nlags = min(10, n // 5)`` (tsfeatures.py:1259 het_arch)."""
    if nlags is None:
        nlags = min(10, len(y) // 5)
    r2 = _arch_r2(y, nlags)
    if not np.isfinite(r2):
        return np.nan
    return float((len(y) - nlags) * r2)


def _linearity(y: np.ndarray) -> float:
    """R² of the linear trend fit (tsfeatures.py:1349), closed-form
    centered-sums OLS (replayed verbatim by the kernel_stats oracle)."""
    n = len(y)
    x = np.arange(n, dtype=float)
    xc = x - x.mean()
    denom = float(np.dot(xc, xc))
    ss_tot = float(((y - y.mean()) ** 2).sum())
    if ss_tot <= 0 or denom <= 0:
        return np.nan
    b = float(np.dot(xc, y) / denom)
    a = y.mean() - b * x.mean()
    pred = a + b * x
    return float(1.0 - ((y - pred) ** 2).sum() / ss_tot)


def _first_min_zero_ac(y: np.ndarray) -> tuple[float, float]:
    """(firstmin_ac, firstzero_ac) — tsfeatures.py:1295-1345 get_special_ac,
    the reference's EXACT scan conventions (r10 parity fix; the old
    version looked for a strict local minimum / the first non-positive
    lag, which disagrees on short noisy series):

    * firstmin: walk while AC strictly decreases; answer = i + 1 where i
      is the first index with AC[i] <= AC[i+1] (lags are 1-based).
    * firstzero: first j with AC[j] > 0 and AC[j+1] < 0; answer = j + 2
      (the lag just AFTER the sign change).  No crossing -> the scan
      runs off the end and returns len(AC) + 1, like the reference."""
    nlags = len(y) - 1
    ac = _acf(y, nlags)[1:]  # lags 1..n-1, the reference's AC array
    i = 0
    while i < len(ac) - 1:
        if ac[i] > ac[i + 1]:
            i += 1
        else:
            break
    firstmin = float(i + 1)
    j = 0
    while j < len(ac) - 1:
        if ac[j] > 0 and ac[j + 1] < 0:
            break
        j += 1
    firstzero = float(j + 2)
    return firstmin, firstzero


def _stl_strengths(
    y: np.ndarray, period: int, stl_trend: int | None = None
) -> tuple[float, float, float]:
    """(trend_strength, seasonality_strength, spikiness) from the
    statsmodels-exact STL split (tsfeatures.py:738-792 get_stl_features:
    ``STL(x, period=period).fit()`` then population-variance ratios and
    the variance of the leave-one-out residual variances — computed here
    via the O(n) closed form loo_var_i = (S2-r_i^2)/(n-1) -
    ((S1-r_i)/(n-1))^2 instead of the reference's O(n^2) matrix)."""
    from kats_spark.operators.stl import stl_statsmodels_np

    n = len(y)
    if n < 2 * period:
        return np.nan, np.nan, np.nan
    try:
        T, S, R = stl_statsmodels_np(y, period, trend=stl_trend)
    except Exception:
        return np.nan, np.nan, np.nan
    vr = float(np.var(R))
    vt = float(np.var(T + R))
    vs = float(np.var(S + R))
    trend_strength = 1.0 - vr / vt if vt > 0 else np.nan
    seas_strength = 1.0 - vr / vs if vs > 0 else np.nan
    if n > 3:
        s1, s2 = float(R.sum()), float((R * R).sum())
        loo_mean = (s1 - R) / (n - 1)
        loo_var = (s2 - R * R) / (n - 1) - loo_mean * loo_mean
        spikiness = float(np.var(loo_var))
    else:
        spikiness = np.nan
    return trend_strength, seas_strength, spikiness


# ---------------------------------------------------------------------
# statsmodels-procedure replicas for the optimizer-backed holt/hw
# features (r11, VERDICT r10 item #3).  The committed
# METALEARNING_TEST_T1/T2 golden values were produced by the pre-0.12
# statsmodels ExponentialSmoothing.fit() procedure: LEGACY initial
# states (non-seasonal: l0=y[0], b0=y[1]-y[0]; seasonal: l0=mean of the
# first cycle, b0=mean one-cycle-apart slope, s0=first cycle - l0 —
# fixed, NOT estimated), then scipy.optimize.brute over the smoothing
# params on the Ns=20 lattice linspace(0,1,20)=k/19 (finish=None) of
# the classical SSE with the usual-region cliffs (alpha==0 -> max_seen,
# beta>alpha -> max_seen, hw additionally alpha*beta==0 or
# gamma>1-alpha -> max_seen), then L-BFGS-B from that start.  On these
# fixtures L-BFGS-B is defeated by the beta>alpha cliff sitting ON the
# start point (finite-difference gradients cross into max_seen): T1
# holt returns the brute point EXACTLY (4/19, 4/19) and T2 hw moves
# <= 6e-6 off (2/19, 2/19, 5/19); T2 holt wanders along the diagonal to
# 0.2007 — an unreproducible scipy trajectory artifact (the brute point
# is 5/19 = 0.2632, the true constrained optimum 0.2705), carried as a
# documented band.  ``_brute_*_params`` below replicate init + cliffs +
# brute argmin exactly (vectorized across the 20^2 / 20^3 lattice).
# ---------------------------------------------------------------------


def _brute_holt_params(y: np.ndarray) -> tuple[float, float]:
    """Pre-0.12 procedure replica for holt (alpha, beta): legacy init +
    constrained brute argmin on the k/19 lattice (see block comment)."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    if n < 2:
        return np.nan, np.nan
    l0, b0 = float(y[0]), float(y[1] - y[0])
    g = np.linspace(0.0, 1.0, 20)
    A, B = np.meshgrid(g, g, indexing="ij")
    A, B = A.ravel(), B.ravel()
    feas = (A > 0.0) & (B <= A)
    A, B = A[feas], B[feas]
    l = np.full(len(A), l0)
    b = np.full(len(A), b0)
    sse = (l + b - y[0]) ** 2
    for i in range(1, n):
        l_new = A * y[i - 1] + (1.0 - A) * (l + b)
        b = B * (l_new - l) + (1.0 - B) * b
        l = l_new
        sse += (l + b - y[i]) ** 2
    k = int(np.argmin(sse))
    return float(A[k]), float(B[k])


def _boxcox_mle_lambda(x: np.ndarray) -> float:
    """Box-Cox lambda by profile log-likelihood (scipy
    boxcox_normmax(method='mle') replica: the llf
    (lam-1)*sum(log x) - n/2*log(var(x_lam)) maximized over the brent
    bracket (-2, 2) — coarse scan + golden-section refine)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    logx = np.log(x)
    slogx = float(logx.sum())

    def neg(lam: float) -> float:
        xt = logx if abs(lam) < 1e-12 else (x**lam - 1.0) / lam
        v = float(xt.var())
        if v <= 0:
            return np.inf
        return -((lam - 1.0) * slogx - n / 2.0 * np.log(v))

    lams = np.linspace(-2.0, 2.0, 401)
    i = int(np.argmin([neg(v) for v in lams]))
    a, b = lams[max(0, i - 1)], lams[min(len(lams) - 1, i + 1)]
    phi = (np.sqrt(5.0) - 1.0) / 2.0
    c, d = b - phi * (b - a), a + phi * (b - a)
    for _ in range(80):
        if neg(c) < neg(d):
            b, d = d, c
            c = b - phi * (b - a)
        else:
            a, c = c, d
            d = a + phi * (b - a)
    return (a + b) / 2.0


def _brute_hw_params(y: np.ndarray, period: int) -> tuple[float, float, float]:
    """Pre-0.12 procedure replica for additive HW (alpha, beta, gamma)
    with use_boxcox=True: Box-Cox transform (MLE lambda), legacy
    seasonal init, constrained brute argmin on the k/19 lattice."""
    y = np.asarray(y, dtype=float)
    m = int(period)
    n = len(y)
    if n < 2 * m or np.min(y) <= 0:
        # use_boxcox=True raises on non-positive data -> reference NaNs
        return (float("nan"),) * 3
    yt = (
        np.log(y)
        if abs(lam := _boxcox_mle_lambda(y)) < 1e-12
        else (y**lam - 1.0) / lam
    )
    l0 = float(yt[:m].mean())
    b0 = float(((yt[m : 2 * m] - yt[:m]) / m).mean())
    s0 = yt[:m] - l0
    g = np.linspace(0.0, 1.0, 20)
    A, B, G = (v.ravel() for v in np.meshgrid(g, g, g, indexing="ij"))
    feas = (A * B > 0.0) & (B <= A) & (G <= 1.0 - A)
    A, B, G = A[feas], B[feas], G[feas]
    kk = len(A)
    l = np.full(kk, l0)
    b = np.full(kk, b0)
    # classical recursion (pre-0.12 _holt_win_add_add_dam): the factor
    # read at i-1 sits m steps before the one written at i+m-1
    s_arr = np.empty((n + m - 1, kk))
    s_arr[:m] = np.repeat(s0[:, None], kk, axis=1)
    sse = (l + b + s_arr[0] - yt[0]) ** 2
    for i in range(1, n):
        prev = l + b
        l_new = A * (yt[i - 1] - s_arr[i - 1]) + (1.0 - A) * prev
        b = B * (l_new - l) + (1.0 - B) * b
        s_arr[i + m - 1] = G * (yt[i - 1] - prev) + (1.0 - G) * s_arr[i - 1]
        l = l_new
        sse += (l + b + s_arr[i] - yt[i]) ** 2
    k = int(np.argmin(sse))
    return float(A[k]), float(B[k]), float(G[k])


def _holt_params(y: np.ndarray) -> tuple[float, float]:
    """Holt (alpha, beta) by in-sample SSE — tsfeatures.py:1365
    holt_params (statsmodels ``ExponentialSmoothing(trend='add').fit()``
    smoothing params).  Coarse-to-fine grid over (alpha, beta) with the
    initial (level, trend) re-estimated per candidate by the statsmodels
    heuristic (OLS over the first 10 points) — this DEFAULT mode finds a
    lower-SSE optimum than the reference's pre-0.12 procedure; pass
    ``reference_parity=True`` to kernel_features for the exact
    procedure replica (``_brute_holt_params``)."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    k = min(10, n)
    t0 = np.arange(k, dtype=float)
    b0 = (
        float(np.polyfit(t0, y[:k], 1)[0]) if k >= 2 else 0.0
    )
    l0 = float(y[:k].mean()) - b0 * float(t0.mean()) if k >= 2 else float(y[0])

    def grid_sse(a_vals: np.ndarray, b_vals: np.ndarray) -> np.ndarray:
        # whole (a, b) lattice in ONE time-sequential pass (r11: the
        # scalar per-candidate loop dominated tsfeatures_full's driver
        # cost); per-lane arithmetic order is identical to the old
        # scalar loop, so the argmin is unchanged
        A, B = (v.ravel() for v in np.meshgrid(a_vals, b_vals, indexing="ij"))
        l = np.full(len(A), l0)
        tr = np.full(len(A), b0)
        sse = np.zeros(len(A))
        for v in y:
            f = l + tr
            d = v - f
            sse += d * d
            l_new = A * v + (1 - A) * f
            tr = B * (l_new - l) + (1 - B) * tr
            l = l_new
        return sse

    best = (np.inf, 0.5, 0.1)
    a_lo, a_hi, b_lo, b_hi = 0.01, 0.99, 0.01, 0.99
    for _ in range(3):
        a_vals = np.linspace(a_lo, a_hi, 20)
        b_vals = np.linspace(b_lo, b_hi, 20)
        sse = grid_sse(a_vals, b_vals)
        i = int(np.argmin(sse))  # first minimum, like the old strict <
        if sse[i] < best[0]:
            best = (float(sse[i]), float(a_vals[i // 20]), float(b_vals[i % 20]))
        da = (a_hi - a_lo) / 10
        db = (b_hi - b_lo) / 10
        a_lo, a_hi = max(1e-4, best[1] - da), min(0.9999, best[1] + da)
        b_lo, b_hi = max(1e-4, best[2] - db), min(0.9999, best[2] + db)
    return best[1], best[2]


def _hw_params(y: np.ndarray, period: int) -> tuple[float, float, float]:
    """Grid-fitted additive Holt-Winters (alpha, beta, gamma) —
    tsfeatures.py:1400-1441 hw_params (the reference uses statsmodels'
    continuous optimizer; this is the same grid-SSE convention as
    holt_params above, replicating fcst._hw_fit's recursion)."""
    if len(y) < 2 * period:
        return (float("nan"),) * 3
    if np.min(y) <= 0:
        # the reference fits with use_boxcox=True (tsfeatures.py:1425),
        # which raises on non-positive data — its hw params are NaN
        # there (pinned by the T1 golden); mirror the gate
        return (float("nan"),) * 3
    # whole 4^3 lattice in ONE vectorized time-sequential pass (r11) —
    # per-lane arithmetic replicates _hw_fit exactly, iteration order
    # (a outer, b mid, g inner) and first-minimum tie-break preserved
    grid = np.array([0.2, 0.4, 0.6, 0.8])
    A, B, G = (v.ravel() for v in np.meshgrid(grid, grid, grid, indexing="ij"))
    n = len(y)
    m = period
    l = np.full(len(A), float(np.mean(y[:m])))
    b = np.full(len(A), (float(np.mean(y[m : 2 * m])) - l[0]) / m)
    seas = np.repeat((y[:m] - l[0]).astype(float)[:, None], len(A), axis=1)
    sse = np.zeros(len(A))
    for i in range(n):
        si = seas[i % m]
        fitted_i = l + b + si
        if i >= m:
            d = y[i] - fitted_i
            sse += d * d
        l_new = A * (y[i] - si) + (1 - A) * (l + b)
        seas[i % m] = G * (y[i] - l_new) + (1 - G) * si
        b = B * (l_new - l) + (1 - B) * b
        l = l_new
    k = int(np.argmin(sse))
    return float(A[k]), float(B[k]), float(G[k])


_KERNEL_SCHEMA = (
    "series_id string, entropy double, hurst double, unitroot_kpss double, "
    "heterogeneity double, linearity double, firstmin_ac double, firstzero_ac double, "
    "trend_strength double, seasonality_strength double, spikiness double, "
    "holt_alpha double, holt_beta double, "
    "hw_alpha double, hw_beta double, hw_gamma double"
)


def kernel_features(
    df: DataFrame,
    period: int = 24,
    s: TSSchema = DEFAULT,
    stl_trend: int | None = None,
    reference_parity: bool = False,
    skip_stl: bool = False,
) -> DataFrame:
    """All numpy-kernel features in ONE pass per series.

    ``reference_parity=True`` switches the optimizer-backed holt/hw
    params to the pre-0.12 statsmodels procedure replica (legacy init +
    constrained k/19 brute argmin — see the _brute_* block comment);
    the default keeps this repo's lower-SSE coarse-to-fine optimum.

    ``skip_stl=True`` skips the per-series STL fit behind
    trend_strength / seasonality_strength / spikiness (NaN-filled
    instead) for callers that immediately drop those three columns —
    the wide tsfeatures() path selects stl_features_block's loess-STL
    values over these, and without the flag the expensive STL ran
    twice per series."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        sid = pdf[s.series_id].iloc[0]
        if len(y) < 10:
            return pd.DataFrame(columns=[c.split()[0] for c in _KERNEL_SCHEMA.split(", ")])
        fmin, fzero = _first_min_zero_ac(y)
        if skip_stl:
            ts_, ss_, spk = float("nan"), float("nan"), float("nan")
        else:
            ts_, ss_, spk = _stl_strengths(y, period, stl_trend)
        if reference_parity:
            ha, hb = _brute_holt_params(y)
            hwa, hwb, hwg = _brute_hw_params(y, period)
        else:
            ha, hb = _holt_params(y)
            hwa, hwb, hwg = _hw_params(y, period)
        return pd.DataFrame(
            [
                {
                    "series_id": sid,
                    "entropy": _spectral_entropy(y),
                    "hurst": _hurst(y),
                    "unitroot_kpss": _kpss(y),
                    # reference feature NAME is "heterogeneity"
                    # (tsfeatures.py:178,462 -> get_het_arch)
                    "heterogeneity": _het_arch(y),
                    "linearity": _linearity(y),
                    "firstmin_ac": fmin,
                    "firstzero_ac": fzero,
                    "trend_strength": ts_,
                    "seasonality_strength": ss_,
                    "spikiness": spk,
                    "holt_alpha": ha,
                    "holt_beta": hb,
                    "hw_alpha": hwa,
                    "hw_beta": hwb,
                    "hw_gamma": hwg,
                }
            ]
        )

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, _KERNEL_SCHEMA)
    )


_KSTAT_SCHEMA = (
    "series_id string, linearity double, unitroot_kpss double, arch_r2 double"
)


def kernel_stats(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """The three SQL-replayable statsmodels-grade kernels — linearity
    (tsfeatures.py:1349), KPSS (:1238), ARCH-LM R² (:1259) — in one
    Arrow batch per series; hash-matched by the ``kernel_stats`` DuckDB
    oracle (centered-sums OLS, Bartlett long-run variance, and a
    Gauss-Jordan recursive-CTE replay of the ARCH normal equations)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        if len(y) < 10:
            return pd.DataFrame(
                columns=["series_id", "linearity", "unitroot_kpss", "arch_r2"]
            )
        return pd.DataFrame(
            [
                {
                    "series_id": pdf[s.series_id].iloc[0],
                    "linearity": _linearity(y),
                    "unitroot_kpss": _kpss(y),
                    "arch_r2": _arch_r2(y),
                }
            ]
        )

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, _KSTAT_SCHEMA)
    )


# ---------------------------------------------------------------------
# reference-name group layer (tsfeatures.py:108-240 _ALL_TS_FEATURES
# parity): stl_features / acfpacf_features / nowcasting / seasonalities
# / time + the five detector groups, joinable into the same wide row as
# the fine-grained statistics groups below.
# ---------------------------------------------------------------------


def stl_features_block(
    df: DataFrame,
    period: int,
    s: TSSchema = DEFAULT,
    method: str = "stl",
    stl_trend: int | None = None,
) -> DataFrame:
    """stl_features group (tsfeatures.py:738-802 get_stl_features):
    trend_strength / seasonality_strength (population-variance ratios,
    np.var convention — unclamped, unlike stl_strengths' legacy
    var_samp variant), spikiness (variance of the leave-one-out
    variances of the residual, via the O(n) closed form
    loo_var_i = (S2 - r_i^2)/(n-1) - ((S1 - r_i)/(n-1))^2), and
    peak / trough (argmax / argmin of the first period's seasonal
    values, first-occurrence ties like np.argmax).  Pure expressions
    over the decomposition split — one pass, two aggregates.
    ``method='stl'`` (default, reference parity) uses the
    statsmodels-EXACT STL port (stl.stl_statsmodels_np — r11: closes
    the r10 loess band; exact vs the reference's own committed
    vectors); ``method='ma'`` uses the window-expressible centered-MA
    split, which makes every downstream feature SQL-replayable (the
    oracled ``stl_features_expr`` query).  ``stl_trend`` overrides the
    STL trend window (the committed reference vectors are
    statsmodels-<0.12 era and need the pre-0.12 default, smallest odd
    >= 1.5*period — see stl.py era note)."""
    if method == "stl":
        from kats_spark.operators.stl import stl_decompose

        parts = stl_decompose(
            df, period, trend=stl_trend, kernel="statsmodels", s=s
        )
    else:
        from kats_spark.operators.decomposition import decompose

        parts = decompose(df, period, "additive", method, s).filter(
            F.col("residual").isNotNull()
        )
    # r11 fusion: every statistic below is a WINDOW over series_id (the
    # stats_bundle pattern) — strengths, the two-pass LOO spikiness, and
    # the first-period peak/trough argminmax all compute after ONE
    # exchange with ZERO joins (was: 3 aggregates + 2 joins + a
    # broadcast of the stats frame back onto the rows).
    parts = parts.withColumn("__rn", F.row_number().over(s.w()))
    r = F.col("residual")
    w_all = Window.partitionBy(s.series_id)
    rn0 = F.col("__rn") - 1
    step1 = parts.select(
        "*",
        F.count("*").over(w_all).cast("double").alias("__n"),
        F.sum(r).over(w_all).alias("__s1"),
        F.sum(r * r).over(w_all).alias("__s2"),
        F.var_pop(r).over(w_all).alias("__vr"),
        F.var_pop(F.col("trend") + r).over(w_all).alias("__vtr"),
        F.var_pop(F.col("seasonal") + r).over(w_all).alias("__vsr"),
        # first-period argmax/argmin with max_by tie semantics: highest
        # seasonal wins, earlier row breaks ties (the -rn / +rn keys)
        F.max(
            F.when(
                F.col("__rn") <= period,
                F.struct(F.col("seasonal"), (-rn0).alias("__nr")),
            )
        ).over(w_all).alias("__pk"),
        F.min(
            F.when(
                F.col("__rn") <= period,
                F.struct(F.col("seasonal"), rn0.alias("__pr")),
            )
        ).over(w_all).alias("__tr"),
    )
    loo_mean = (F.col("__s1") - r) / (F.col("__n") - 1)
    loo_var = (F.col("__s2") - r * r) / (F.col("__n") - 1) - loo_mean * loo_mean
    final = step1.withColumn("__loo", loo_var).withColumn(
        "spikiness", F.var_pop("__loo").over(w_all)
    )
    return final.filter(F.col("__rn") == 1).select(
        s.series_id,
        (1.0 - F.col("__vr") / F.col("__vtr")).alias("trend_strength"),
        (1.0 - F.col("__vr") / F.col("__vsr")).alias("seasonality_strength"),
        "spikiness",
        (-F.col("__pk.__nr")).cast("bigint").alias("peak"),
        F.col("__tr.__pr").cast("bigint").alias("trough"),
    )


def time_group_features(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """time group (tsfeatures.py:1996-2110 get_time): distinct
    year/month/week/day counts, day-of-week frequencies, span in days.
    time_days faithfully replicates the reference's strftime("%Y-%d")
    (year + day-of-MONTH); time_avg_timezone_offset is 0.0 — naive
    timestamps, the reference's AttributeError fallback.  Pure
    expression aggregate — one shuffle."""
    from kats_spark.functions.calendar import dayofweek_iso

    t = F.col(s.time)
    d = F.to_date(t)
    iso_dow = dayofweek_iso(t)  # Monday=0
    # ISO week-based year = calendar year of that week's Thursday
    iso_year = F.year(F.date_add(d, 3 - iso_dow))
    n = F.count("*").cast("double")
    aggs = [
        F.countDistinct(F.year(t)).cast("bigint").alias("time_years"),
        F.countDistinct(F.date_format(t, "yyyy-MM")).cast("bigint").alias("time_months"),
        F.countDistinct(F.month(t)).cast("bigint").alias("time_monthsofyear"),
        F.countDistinct(F.concat_ws("-", iso_year, F.weekofyear(t)))
        .cast("bigint").alias("time_weeks"),
        F.countDistinct(F.weekofyear(t)).cast("bigint").alias("time_weeksofyear"),
        F.countDistinct(F.date_format(t, "yyyy-dd")).cast("bigint").alias("time_days"),
        F.countDistinct(F.dayofyear(t)).cast("bigint").alias("time_daysofyear"),
        F.lit(0.0).alias("time_avg_timezone_offset"),
        F.datediff(F.max(d), F.min(d)).cast("bigint").alias("time_length_days"),
    ]
    dows = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday", "Sunday"]
    for k, name in enumerate(dows):
        aggs.append(
            (F.sum((iso_dow == k).cast("int")) / n).alias(f"time_freq_{name}")
        )
    return df.groupBy(s.series_id).agg(*aggs)


def _pacf_yw_adjusted(y: np.ndarray, nlags: int) -> np.ndarray:
    """statsmodels pacf(method='ywadjusted'): per-order Yule-Walker on
    the UNBIASED autocovariances, keeping the last coefficient."""
    y = y - y.mean()
    n = len(y)
    gamma = np.array(
        [np.dot(y[: n - k], y[k:]) / (n - k) for k in range(nlags + 1)]
    )
    out = [1.0]
    idx = np.arange(nlags)
    for k in range(1, nlags + 1):
        R = gamma[np.abs(np.subtract.outer(idx[:k], idx[:k]))]
        out.append(float(np.linalg.solve(R, gamma[1 : k + 1])[-1]))
    return np.array(out)


def _fft_detected_periods(x: np.ndarray) -> list[float]:
    """FFTDetector peak selection replicated exactly
    (kats/detectors/seasonality.py:265-330 get_fft / get_fft_peaks):
    dB amplitude 10·log10|fft|², cut = median(positive-dB bins) + 6 ×
    mean-abs-deviation of the above-median bins, scipy-find_peaks-style
    local maxima with a 0.1 dB vertical-distance threshold, and the
    reference's pairwise near-integer frequency-ratio harmonic removal
    (lower frequency wins).  Returns the surviving periods (1/freq) —
    get_seasonalities then takes int(min(...))."""
    fftv = np.fft.fft(np.asarray(x, dtype=float))
    psd = np.abs(fftv) ** 2
    freqs = np.fft.fftfreq(len(psd), 1.0)
    pos = freqs > 0
    freq = freqs[pos]
    with np.errstate(divide="ignore"):
        ampl = 10.0 * np.log10(psd[pos])
    pos_ampl = ampl[ampl > 0]
    if len(pos_ampl) == 0:
        return []
    median = float(np.median(pos_ampl))
    above = pos_ampl[pos_ampl > median]
    if len(above) == 0:
        return []
    mad = float(np.abs(above - above.mean()).mean())
    cut = median + mad * 6.0
    peak_f = [
        float(freq[i])
        for i in range(1, len(ampl) - 1)
        if ampl[i] > ampl[i - 1] and ampl[i] > ampl[i + 1]
        and min(ampl[i] - ampl[i - 1], ampl[i] - ampl[i + 1]) >= 0.1
        and ampl[i] > cut
    ]
    rm = [False] * len(peak_f)
    for i1 in range(len(peak_f)):
        for i2 in range(i1 + 1, len(peak_f)):
            if rm[i2]:
                continue
            frac = (peak_f[i2] / peak_f[i1]) % 1
            if frac < 0.01 or frac > 0.99:
                rm[i2] = True
    return [1.0 / f for f, r in zip(peak_f, rm) if not r]


_REF_KERNEL_COLS: dict[str, list[str]] = {
    "acfpacf_features": [
        "y_acf1", "y_acf5", "diff1y_acf1", "diff1y_acf5", "diff2y_acf1",
        "diff2y_acf5", "y_pacf5", "diff1y_pacf5", "diff2y_pacf5",
        "seas_acf1", "seas_pacf1",
    ],
    "seasonalities": [
        "seasonal_period", "trend_mag", "seasonality_mag", "residual_std",
    ],
    "nowcasting": [
        "nowcast_roc", "nowcast_ma", "nowcast_mom", "nowcast_lag",
        "nowcast_macd", "nowcast_macdsign", "nowcast_macddiff",
    ],
}


def ref_kernel_features(
    df: DataFrame,
    period: int = 24,
    acfpacf_lag: int = 6,
    window: int = 5,
    n_fast: int = 12,
    n_slow: int = 21,
    s: TSSchema = DEFAULT,
    groups: "tuple[str, ...]" = ("acfpacf_features", "seasonalities", "nowcasting"),
) -> DataFrame:
    """The three reference groups that are genuinely iterative numpy
    (acfpacf_features :1060-1160, seasonalities :1912-1993, nowcasting
    :1756-1908) in ONE ``applyInPandas`` pass — a single
    groupBy(series_id) shuffle computes every selected group per Arrow
    batch, like :func:`kernel_features`.  Deselected groups are skipped
    inside the kernel and pruned from the schema."""
    from kats_spark.operators.stl import stl_decompose_np

    groups = tuple(g for g in _REF_KERNEL_COLS if g in set(groups))
    cols = [c for g in groups for c in _REF_KERNEL_COLS[g]]
    schema = f"{s.series_id} string, " + ", ".join(f"{c} double" for c in cols)

    def _acfpacf(x: np.ndarray) -> dict[str, float]:
        names = _REF_KERNEL_COLS["acfpacf_features"]
        out = {k: float("nan") for k in names}
        if len(x) < 10 or len(x) < period or len(np.unique(x)) == 1:
            return out
        nlag = min(acfpacf_lag, len(x) - 2)
        d1 = np.diff(x)
        d2 = np.diff(d1)
        try:
            y_acf = _acf(x, period)[1:]
            d1_acf = _acf(d1, nlag)[1:]
            d2_acf = _acf(d2, nlag)[1:]
            y_pacf = _pacf_yw_adjusted(x, period)[1:]
            d1_pacf = _pacf_yw_adjusted(d1, nlag)[1:]
            d2_pacf = _pacf_yw_adjusted(d2, nlag)[1:]
        except np.linalg.LinAlgError:
            return out
        out["y_acf1"] = float(y_acf[0])
        out["y_acf5"] = float(np.sum(y_acf[:5] ** 2))
        out["diff1y_acf1"] = float(d1_acf[0])
        out["diff1y_acf5"] = float(np.sum(d1_acf[:5] ** 2))
        out["diff2y_acf1"] = float(d2_acf[0])
        out["diff2y_acf5"] = float(np.sum(d2_acf[:5] ** 2))
        out["seas_acf1"] = float(y_acf[period - 1])
        out["y_pacf5"] = float(np.nansum(y_pacf[:5] ** 2))
        out["diff1y_pacf5"] = float(np.nansum(d1_pacf[:5] ** 2))
        out["diff2y_pacf5"] = float(np.nansum(d2_pacf[:5] ** 2))
        out["seas_pacf1"] = float(y_pacf[period - 1])
        return out

    def _seasonalities(x: np.ndarray) -> dict[str, float]:
        names = _REF_KERNEL_COLS["seasonalities"]
        out = {k: float("nan") for k in names}
        try:
            detected = _fft_detected_periods(np.diff(x))
            _period = int(min(detected)) if detected else 7
            trend, seasonal, resid = stl_decompose_np(x, _period)
        except Exception:
            return out
        out["seasonal_period"] = float(_period)
        out["seasonality_mag"] = float(
            np.round(np.quantile(seasonal, 0.95) - np.quantile(seasonal, 0.05))
        )
        series = trend - trend[0]
        t = np.arange(len(series), dtype=float)
        denom = float(np.dot(t, t))
        out["trend_mag"] = float(np.dot(t, series) / denom) if denom > 0 else float("nan")
        out["residual_std"] = float(np.std(resid))
        return out

    def _ewma(arr: np.ndarray, span: int, min_periods: int) -> np.ndarray:
        return (
            pd.Series(arr).ewm(span=span, min_periods=min_periods).mean().to_numpy()
        )

    def _nowcasting(x: np.ndarray) -> dict[str, float]:
        names = _REF_KERNEL_COLS["nowcasting"]
        out = {k: float("nan") for k in names}
        try:
            if len(x) > window:
                m = x[window - 1:] - x[: -(window - 1)]
                nn = x[: -(window - 1)]
                with np.errstate(divide="ignore", invalid="ignore"):
                    arr = m / nn
                out["nowcast_roc"] = float(
                    np.nan_to_num(arr, nan=0.0, posinf=0.0, neginf=0.0).mean()
                )
                out["nowcast_mom"] = float(
                    np.nan_to_num(x[window:] - x[:-window], nan=0.0,
                                  posinf=0.0, neginf=0.0).mean()
                )
                ret = np.cumsum(x, dtype=float)
                ret[window:] = ret[window:] - ret[:-window]
                ma = ret[window - 1:] / window
                out["nowcast_ma"] = float(
                    np.nan_to_num(ma, nan=0.0, posinf=0.0, neginf=0.0).mean()
                )
                out["nowcast_lag"] = float(
                    np.nan_to_num(x[:-window], nan=0.0, posinf=0.0,
                                  neginf=0.0).mean()
                )
            macd = _ewma(x, n_fast, n_slow - 1) - _ewma(x, n_slow, n_slow - 1)
            out["nowcast_macd"] = float(
                np.nan_to_num(np.nanmean(macd), nan=0.0, posinf=0.0, neginf=0.0)
            )
            if len(x) >= 27:
                sign = _ewma(macd, 9, 8)
                out["nowcast_macdsign"] = float(
                    np.nan_to_num(np.nanmean(sign), nan=0.0, posinf=0.0,
                                  neginf=0.0)
                )
                out["nowcast_macddiff"] = float(
                    np.nan_to_num(np.nanmean(macd - sign), nan=0.0,
                                  posinf=0.0, neginf=0.0)
                )
        except Exception:
            pass
        return out

    builders = {
        "acfpacf_features": _acfpacf,
        "seasonalities": _seasonalities,
        "nowcasting": _nowcasting,
    }

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        x = pdf[s.value].to_numpy(dtype=float)
        row: dict = {s.series_id: pdf[s.series_id].iloc[0]}
        for g in groups:
            row.update(builders[g](x))
        return pd.DataFrame([row], columns=[s.series_id] + cols)

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )


FEATURE_GROUPS = (
    "basic", "lumpiness", "stability", "crossing_points", "binarize_mean",
    "std_first_derivative", "flat_spots", "histogram_mode", "level_shift",
    "kernel",
)

#: Reference-name groups beyond the fine-grained statistics registry
#: (tsfeatures.py:108-123 _ALL_TS_FEATURES).
REF_FEATURE_GROUPS = (
    "stl_features", "acfpacf_features", "nowcasting", "seasonalities", "time",
)

#: Detector-derived groups (tsfeatures.py:117-121) — OFF by default,
#: exactly like the reference (TsFeatures.__init__:434-438 defaults
#: cusum_detector..trend_detector to False).
DETECTOR_FEATURE_GROUPS = (
    "cusum_detector", "robust_stat_detector", "bocp_detector",
    "outlier_detector", "trend_detector",
)

ALL_FEATURE_GROUPS = FEATURE_GROUPS + REF_FEATURE_GROUPS + DETECTOR_FEATURE_GROUPS

#: What ``tsfeatures()`` computes when ``selected`` is omitted: every
#: group the reference enables by default (detectors are opt-in there
#: too).
DEFAULT_FEATURE_GROUPS = FEATURE_GROUPS + REF_FEATURE_GROUPS


def tsfeatures(
    df: DataFrame,
    period: int = 24,
    window_size: int = 48,
    s: TSSchema = DEFAULT,
    selected: "list[str] | None" = None,
    stl_trend: int | None = None,
    optimizer_parity: bool = False,
) -> DataFrame:
    """The full wide feature frame: expression layer ⋈ kernel layers.

    ``selected`` mirrors the reference's opt-in feature-group registry
    (kats/tsfeatures/tsfeatures.py:108-240 ``_ALL_TS_FEATURES`` /
    group selection :314-445): only the named groups are computed, and
    because each group is its own subplan, deselecting a group prunes its
    whole subtree (scans, windows, kernels) — selection is a plan
    optimization, not a post-hoc column drop.  The default set matches
    the reference default (everything except the detector groups, which
    are opt-in there too — TsFeatures.__init__:434-438); pass
    ``selected=ALL_FEATURE_GROUPS`` for the detector-inclusive row.
    The three iterative reference groups (acfpacf / seasonalities /
    nowcasting) share ONE applyInPandas pass however many of them are
    selected."""
    if selected is None:
        selected = list(DEFAULT_FEATURE_GROUPS)
    chosen = set(selected)
    unknown = chosen - set(ALL_FEATURE_GROUPS)
    if unknown:
        raise ValueError(f"unknown feature groups: {sorted(unknown)}; "
                         f"available: {list(ALL_FEATURE_GROUPS)}")
    from kats_spark.operators import detector_features as det

    ref_kernel = tuple(g for g in _REF_KERNEL_COLS if g in chosen)
    builders = {
        "basic": lambda: stats_fn.basic_stats(df, s),
        "lumpiness": lambda: stats_fn.lumpiness(df, window_size, s),
        "stability": lambda: stats_fn.stability(df, window_size, s),
        "crossing_points": lambda: stats_fn.crossing_points(df, s),
        "binarize_mean": lambda: stats_fn.binarize_mean(df, s),
        "std_first_derivative": lambda: stats_fn.std_first_derivative(df, s),
        "flat_spots": lambda: stats_fn.flat_spots(df, 10, s),
        "histogram_mode": lambda: stats_fn.histogram_mode(df, 10, s),
        "level_shift": lambda: stats_fn.level_shift_features(df, window_size, s),
        # when the stl_features group is also selected, its loess-STL
        # (reference-exact) trend/seasonality strengths and spikiness win
        # over the kernel layer's MA-decomposition stand-ins — drop the
        # kernel's columns so the wide row has one of each name, and
        # skip_stl=True saves the redundant per-series STL fit entirely.
        "kernel": lambda: (
            kernel_features(
                df, period, s, reference_parity=optimizer_parity, skip_stl=True
            ).drop("trend_strength", "seasonality_strength", "spikiness")
            if "stl_features" in chosen
            else kernel_features(
                df, period, s, stl_trend=stl_trend, reference_parity=optimizer_parity
            )
        ),
        "stl_features": lambda: stl_features_block(df, period, s, stl_trend=stl_trend),
        "time": lambda: time_group_features(df, s),
        "cusum_detector": lambda: det.cusum_detector_features(df, s=s),
        "robust_stat_detector": lambda: det.robust_stat_detector_features(df, s=s),
        "bocp_detector": lambda: det.bocp_detector_features(df, s=s),
        "outlier_detector": lambda: det.outlier_detector_features(df, period, s=s),
        "trend_detector": lambda: det.trend_detector_features(df, s=s),
    }
    pieces = []
    ref_kernel_done = False
    for g in ALL_FEATURE_GROUPS:
        if g not in chosen:
            continue
        if g in _REF_KERNEL_COLS:
            if not ref_kernel_done:
                pieces.append(ref_kernel_features(df, period, s=s, groups=ref_kernel))
                ref_kernel_done = True
            continue
        pieces.append(builders[g]())
    out = pieces[0]
    for piece in pieces[1:]:
        out = out.join(piece, s.series_id, "left")
    return out
