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
from pyspark.sql import DataFrame
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
    """Normalized Shannon entropy of the periodogram (tsfeatures.py:636)."""
    y = y - y.mean()
    psd = np.abs(np.fft.rfft(y)) ** 2
    psd = psd[1:]
    tot = psd.sum()
    if tot <= 0:
        return 0.0
    p = psd / tot
    p = p[p > 0]
    return float(-(p * np.log(p)).sum() / np.log(len(p)))


def _hurst(y: np.ndarray, max_lag: int = 20) -> float:
    """Variance-of-differences slope estimator (tsfeatures.py:906)."""
    max_lag = min(max_lag, len(y) // 2)
    if max_lag < 3:
        return np.nan
    lags = np.arange(2, max_lag)
    tau = [np.std(y[l:] - y[:-l]) for l in lags]
    tau = np.maximum(tau, 1e-12)
    return float(np.polyfit(np.log(lags), np.log(tau), 1)[0])


def _kpss(y: np.ndarray) -> float:
    """KPSS level-stationarity statistic (tsfeatures.py:1238): partial-sum
    variance ratio with a Bartlett long-run variance."""
    n = len(y)
    e = y - y.mean()
    s = np.cumsum(e)
    lag = int(np.ceil(12.0 * (n / 100.0) ** 0.25))
    lag = min(lag, n - 1)
    gamma0 = np.dot(e, e) / n
    lrv = gamma0
    for k in range(1, lag + 1):
        w = 1.0 - k / (lag + 1.0)
        lrv += 2.0 * w * np.dot(e[:-k], e[k:]) / n
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
    """R² of the Engle ARCH LM regression of e² on its lags
    (tsfeatures.py:1259); OLS via normal equations + _gauss_solve.

    e² is scaled by its mean before the regression — the statistic is
    scale-invariant in exact arithmetic, and the O(1) regressors keep the
    normal equations well-conditioned so the DuckDB replay stays within
    the 6-decimal rounding lattice."""
    e2 = (y - y.mean()) ** 2
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


def _het_arch(y: np.ndarray, nlags: int = 4) -> float:
    """Engle ARCH LM statistic = n·R² (tsfeatures.py:1259)."""
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
    """(firstmin_ac, firstzero_ac) — tsfeatures.py:1297."""
    nlags = min(len(y) - 1, len(y) // 2)
    ac = _acf(y, nlags)
    firstmin = np.nan
    for i in range(1, len(ac) - 1):
        if ac[i] < ac[i - 1] and ac[i] < ac[i + 1]:
            firstmin = float(i)
            break
    firstzero = np.nan
    for i in range(1, len(ac)):
        if ac[i] <= 0:
            firstzero = float(i)
            break
    return firstmin, firstzero


def _ma_decompose_strengths(y: np.ndarray, period: int) -> tuple[float, float, float]:
    """(trend_strength, seasonality_strength, spikiness) via centered-MA
    additive decomposition (tsfeatures.py:738 stl_features analog)."""
    n = len(y)
    if n < 2 * period + 1:
        return np.nan, np.nan, np.nan
    if period % 2 == 0:
        # centered 2xMA kernel of length period+1
        trend = np.convolve(y, np.r_[0.5, np.ones(period - 1), 0.5] / period, "valid")
    else:
        trend = np.convolve(y, np.ones(period) / period, "valid")
    pad = (n - len(trend)) // 2
    tr = np.full(n, np.nan)
    tr[pad : pad + len(trend)] = trend
    detr = y - tr
    seas = np.array(
        [np.nanmean(detr[i::period]) if np.isfinite(detr[i::period]).any() else 0.0
         for i in range(period)]
    )
    seas = seas - np.nanmean(seas)
    seasonal = np.tile(seas, n // period + 1)[:n]
    resid = y - tr - seasonal
    ok = np.isfinite(resid)
    vr = float(np.var(resid[ok])) if ok.any() else np.nan
    deseason = y - seasonal
    detrend = y - tr
    vt = float(np.var(deseason[ok])) if ok.any() else np.nan
    vs = float(np.var(detrend[ok])) if ok.any() else np.nan
    trend_strength = max(0.0, 1.0 - vr / vt) if vt and np.isfinite(vt) else np.nan
    seas_strength = max(0.0, 1.0 - vr / vs) if vs and np.isfinite(vs) else np.nan
    # spikiness: variance of leave-one-out variances of residuals
    r = resid[ok]
    if len(r) > 3:
        loo = [np.var(np.delete(r, i)) for i in range(len(r))]
        spikiness = float(np.var(loo))
    else:
        spikiness = np.nan
    return trend_strength, seas_strength, spikiness


def _holt_params(y: np.ndarray) -> tuple[float, float]:
    """Grid-fitted Holt (alpha, beta) — tsfeatures.py:1365 holt_params."""
    from kats_spark.models.fcst import _holt_fit

    best, best_sse = (np.nan, np.nan), np.inf
    for a in [0.2, 0.4, 0.6, 0.8]:
        for b in [0.2, 0.4, 0.6, 0.8]:
            fitted, *_ = _holt_fit(y, a, b)
            sse = float(np.sum((y[1:] - fitted[1:]) ** 2))
            if sse < best_sse:
                best, best_sse = (a, b), sse
    return best


_KERNEL_SCHEMA = (
    "series_id string, entropy double, hurst double, unitroot_kpss double, "
    "het_arch double, linearity double, firstmin_ac double, firstzero_ac double, "
    "trend_strength double, seasonality_strength double, spikiness double, "
    "holt_alpha double, holt_beta double"
)


def kernel_features(df: DataFrame, period: int = 24, s: TSSchema = DEFAULT) -> DataFrame:
    """All numpy-kernel features in ONE pass per series."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        sid = pdf[s.series_id].iloc[0]
        if len(y) < 10:
            return pd.DataFrame(columns=[c.split()[0] for c in _KERNEL_SCHEMA.split(", ")])
        fmin, fzero = _first_min_zero_ac(y)
        ts_, ss_, spk = _ma_decompose_strengths(y, period)
        ha, hb = _holt_params(y)
        return pd.DataFrame(
            [
                {
                    "series_id": sid,
                    "entropy": _spectral_entropy(y),
                    "hurst": _hurst(y),
                    "unitroot_kpss": _kpss(y),
                    "het_arch": _het_arch(y),
                    "linearity": _linearity(y),
                    "firstmin_ac": fmin,
                    "firstzero_ac": fzero,
                    "trend_strength": ts_,
                    "seasonality_strength": ss_,
                    "spikiness": spk,
                    "holt_alpha": ha,
                    "holt_beta": hb,
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


FEATURE_GROUPS = (
    "basic", "lumpiness", "stability", "crossing_points", "binarize_mean",
    "std_first_derivative", "flat_spots", "histogram_mode", "level_shift",
    "kernel",
)


def tsfeatures(
    df: DataFrame,
    period: int = 24,
    window_size: int = 48,
    s: TSSchema = DEFAULT,
    selected: "list[str] | None" = None,
) -> DataFrame:
    """The full wide feature frame: expression layer ⋈ kernel layer.

    ``selected`` mirrors the reference's opt-in feature-group registry
    (kats/tsfeatures/tsfeatures.py:108-240 ``_ALL_TS_FEATURES`` /
    group selection :314-445): only the named groups are computed, and
    because each group is its own subplan, deselecting a group prunes its
    whole subtree (scans, windows, kernels) — selection is a plan
    optimization, not a post-hoc column drop."""
    if selected is None:
        selected = list(FEATURE_GROUPS)
    unknown = set(selected) - set(FEATURE_GROUPS)
    if unknown:
        raise ValueError(f"unknown feature groups: {sorted(unknown)}; "
                         f"available: {list(FEATURE_GROUPS)}")
    builders = {
        "basic": lambda: stats_fn.basic_stats(df, s),
        "lumpiness": lambda: stats_fn.lumpiness(df, window_size, s),
        "stability": lambda: stats_fn.stability(df, window_size, s),
        "crossing_points": lambda: stats_fn.crossing_points(df, s),
        "binarize_mean": lambda: stats_fn.binarize_mean(df, s),
        "std_first_derivative": lambda: stats_fn.std_first_derivative(df, s),
        "flat_spots": lambda: stats_fn.flat_spots(df, 10, s),
        "histogram_mode": lambda: stats_fn.histogram_mode(df, 10, s),
        "level_shift": lambda: stats_fn.level_shift_features(df, 10, s),
        "kernel": lambda: kernel_features(df, period, s),
    }
    pieces = [builders[g]() for g in FEATURE_GROUPS if g in set(selected)]
    out = pieces[0]
    for piece in pieces[1:]:
        out = out.join(piece, s.series_id, "left")
    return out
