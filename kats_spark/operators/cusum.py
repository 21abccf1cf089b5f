"""CUSUM changepoint detector — per-series numpy kernel, distributed fan-out.

Parity with kats/detectors/cusum_detection.py:309-738 (``CUSUMDetector``):
- iterative likelihood-ratio CUSUM mean-shift search (`_get_change_point`
  :345-430): start at argmin/argmax of cumsum(ts - mean), refine up to
  ``max_iter`` by re-estimating (mu0, mu1) around the candidate;
- log-likelihood ratio of the two-segment model vs the pooled model
  (`_get_llr` :425-475), p-value 1 - chi2.cdf(llr, 2) (:614);
- significance gate llr > chi2.ppf(1 - threshold, 2) plus
  ``delta_std_ratio`` and ``min_abs_change`` magnitude gates (:620-640);
- both directions searched by default (increase / decrease).

chi2 with df=2 is the exponential distribution, so no scipy:
cdf(x) = 1 - exp(-x/2) and ppf(q) = -2 ln(1-q).

The per-series recursion is genuinely iterative (argmin of a running sum
re-computed each refinement), so it runs as one Arrow-batched
``applyInPandas`` per series — the reference's VectorizedCUSUMDetector
(:962) exists only to batch series in numpy; Spark's groupBy partitioning
makes it redundant.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from kats_spark.tsframe import TSSchema, DEFAULT


def _log_llr(x: np.ndarray, mu0: float, sigma0: float, mu1: float, sigma1: float) -> float:
    return float(
        np.sum(np.log(sigma1 / sigma0) + 0.5 * (((x - mu1) / sigma1) ** 2 - ((x - mu0) / sigma0) ** 2))
    )


def _llr(ts: np.ndarray, mu0: float, mu1: float, cp: int) -> float:
    scale = math.sqrt(
        (np.sum((ts[: cp + 1] - mu0) ** 2) + np.sum((ts[cp + 1:] - mu1) ** 2)) / (len(ts) - 2)
    )
    mu_t, sigma_t = float(np.mean(ts)), float(np.std(ts))
    if scale == 0:
        scale = sigma_t * 0.01
    return -2 * (
        _log_llr(ts[: cp + 1], mu_t, sigma_t, mu0, scale)
        + _log_llr(ts[cp + 1:], mu_t, sigma_t, mu1, scale)
    )


def _find_cp(
    ts: np.ndarray,
    direction: str,
    max_iter: int,
    interest_window: tuple[int, int] | None = None,
    start_point: int | None = None,
) -> tuple[int, bool, float]:
    """Iterative argmin/argmax-of-cusum refinement
    (cusum_detection.py:344-423): optionally searching only inside
    ``interest_window`` (llr still uses all data; the interest-window llr
    is returned for the extra significance gate), optionally seeded at
    ``start_point``.  Returns (cp_global_index, stable, llr_int)."""
    pick = np.argmin if direction == "increase" else np.argmax
    ts_int = ts[interest_window[0]: interest_window[1]] if interest_window else ts
    if start_point is None:
        cusum = np.cumsum(ts_int - np.mean(ts_int))
        cp = min(int(pick(cusum)), len(ts_int) - 2)
    else:
        cp = int(start_point)
    stable = False
    for _ in range(max_iter):
        mu0 = np.mean(ts_int[: cp + 1])
        mu1 = np.mean(ts_int[cp + 1:])
        cusum = np.cumsum(ts_int - (mu0 + mu1) / 2)
        nxt = max(1, min(int(pick(cusum)), len(ts_int) - 2))
        if nxt == cp:
            stable = True
            break
        cp = nxt
    llr_int = math.inf
    if interest_window:
        mu0 = float(np.mean(ts_int[: cp + 1]))
        mu1 = float(np.mean(ts_int[cp + 1:]))
        llr_int = _llr(ts_int, mu0, mu1, cp)
        cp += interest_window[0]
    return cp, stable, llr_int


def _magnitude(x: np.ndarray, q: float) -> float:
    """Nearest-rank quantile of the RAW values — the reference formula
    (cusum_detection.py:510-517 ``np.quantile(ts, q,
    interpolation='nearest')``): no abs, so the decrease direction
    (change_ts = -ts) keeps the reference's negated-tail semantics."""
    return float(np.quantile(x, q, method="nearest")) if len(x) else float("nan")


def _magnitude_compare(
    ts: np.ndarray,
    times: np.ndarray,
    interest_window: tuple[int, int],
    quantile: float,
    ratio: float,
) -> float:
    """Share of prior day-shifted windows whose magnitude the interest
    window exceeds by >= ratio (cusum_detection.py:477-517) — the daily
    seasonality guard: a genuine regression dwarfs every prior day."""
    t64 = times.astype("datetime64[ns]")
    days = int((t64.max() - t64.min()) / np.timedelta64(1, "D"))
    if days <= 0:
        return 1.0
    iw0, iw1 = interest_window
    mag_int = _magnitude(ts[iw0:iw1], quantile)
    comparable = 0
    end_anchor = t64[iw1] if iw1 < len(t64) else t64[-1] + (t64[-1] - t64[-2])
    for i in range(days):
        st = t64[iw0] - np.timedelta64(i, "D")
        en = end_anchor - np.timedelta64(i, "D")
        si = int(np.searchsorted(t64, st))
        ei = int(np.searchsorted(t64, en))
        if si >= ei:
            continue
        hist = _magnitude(ts[si:ei], quantile)
        # reference divides unguarded (cusum_detection.py:504): hist == 0
        # with a positive interest magnitude gives inf >= ratio -> counts
        if hist != 0:
            r = mag_int / hist
        elif mag_int > 0:
            r = math.inf
        elif mag_int < 0:
            r = -math.inf
        else:
            r = math.nan
        if r >= ratio:
            comparable += 1
    return comparable / days


def _detect_one(
    ts: np.ndarray,
    times: np.ndarray,
    threshold: float,
    max_iter: int,
    delta_std_ratio: float,
    min_abs_change: float,
    change_directions: list[str] | None = None,
    start_point: int | None = None,
    interest_window: tuple[int, int] | None = None,
    magnitude_quantile: float | None = None,
    magnitude_ratio: float = 1.3,
    magnitude_comparable_day: float = 0.5,
    return_all_changepoints: bool = False,
) -> list[dict]:
    """Full reference gate set (cusum_detection.py:519-662): per-direction
    refinement, interest-window llr gate, directional min_abs_change,
    prefix-std delta gate (``np.std(ts[:cp])`` exactly as :646-649), and
    the daily-magnitude seasonality guard."""
    out = []
    if len(ts) < 10:
        return out
    crit = -2.0 * math.log(threshold)  # chi2.ppf(1 - threshold, 2)
    dirs = change_directions or ["increase", "decrease"]
    for direction in dirs:
        cp, stable, llr_int = _find_cp(ts, direction, max_iter, interest_window, start_point)
        mu0 = float(np.mean(ts[: cp + 1]))
        mu1 = float(np.mean(ts[cp + 1:]))
        llr = _llr(ts, mu0, mu1, cp)
        p_value = math.exp(-llr / 2) if llr < 1400 else 0.0  # 1 - chi2.cdf(llr, 2)
        change_ok = (mu0 + min_abs_change < mu1) if direction == "increase" else (
            mu0 > mu1 + min_abs_change
        )
        mag_change = True
        if float(np.min(ts)) >= 0 and magnitude_quantile and interest_window:
            change_ts = ts if direction == "increase" else -ts
            mag_change = (
                _magnitude_compare(
                    change_ts, times, interest_window, magnitude_quantile, magnitude_ratio
                )
                >= magnitude_comparable_day
            )
        significant = (
            llr > crit
            and (llr_int > crit)
            and change_ok
            and abs(mu1 - mu0) > float(np.std(ts[:cp])) * delta_std_ratio
            and mag_change
        )
        if significant or return_all_changepoints:
            out.append(
                {
                    "cp_time": times[cp],
                    "cp_index": int(cp),
                    "direction": direction,
                    "mu0": mu0,
                    "mu1": mu1,
                    "delta": mu1 - mu0,
                    "llr": float(llr),
                    "p_value": float(p_value),
                    "stable": bool(stable),
                }
            )
    return out


def cusum_detect(
    df: DataFrame,
    threshold: float = 0.01,
    max_iter: int = 10,
    delta_std_ratio: float = 1.0,
    min_abs_change: float = 0.0,
    s: TSSchema = DEFAULT,
    change_directions: list[str] | None = None,
    start_point: int | None = None,
    interest_window: tuple[int, int] | None = None,
    magnitude_quantile: float | None = None,
    magnitude_ratio: float = 1.3,
    magnitude_comparable_day: float = 0.5,
    return_all_changepoints: bool = False,
) -> DataFrame:
    """One row per significant changepoint:
    (series_id, cp_time, cp_index, direction, mu0, mu1, delta, llr,
    p_value, stable).  Knob surface mirrors the reference detector
    (cusum_detection.py:519-662, CUSUMDefaultArgs :64-76):
    change_directions / start_point / interest_window (window-restricted
    search + llr_int gate) / magnitude_* (daily-seasonality guard) /
    return_all_changepoints."""
    schema = (
        f"{s.series_id} string, cp_time timestamp, cp_index int, direction string, "
        "mu0 double, mu1 double, delta double, llr double, p_value double, stable boolean"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        ts = pdf[s.value].to_numpy(dtype=float)
        times = pdf[s.time].to_numpy()
        rows = _detect_one(
            ts, times, threshold, max_iter, delta_std_ratio, min_abs_change,
            change_directions=change_directions,
            start_point=start_point,
            interest_window=interest_window,
            magnitude_quantile=magnitude_quantile,
            magnitude_ratio=magnitude_ratio,
            magnitude_comparable_day=magnitude_comparable_day,
            return_all_changepoints=return_all_changepoints,
        )
        sid = pdf[s.series_id].iloc[0]
        return pd.DataFrame(
            [
                {
                    s.series_id: sid,
                    **r,
                }
                for r in rows
            ],
            columns=[
                s.series_id, "cp_time", "cp_index", "direction", "mu0", "mu1",
                "delta", "llr", "p_value", "stable",
            ],
        )

    return df.select(s.series_id, s.time, s.value).groupBy(s.series_id).applyInPandas(fn, schema)


# ---------------------------------------------------------------------------
# Multivariate CUSUM (kats/detectors/cusum_detection.py:740-962
# ``MultiCUSUMDetector``): changepoint in the multivariate mean under a
# multivariate-Gaussian likelihood; chi2 test with df = k + 1.
# ---------------------------------------------------------------------------


def _gammainc_lower(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) — series for x < a+1,
    continued fraction otherwise (standard numerics, no scipy)."""
    if x <= 0:
        return 0.0
    lg = math.lgamma(a)
    if x < a + 1.0:
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        return total * math.exp(-x + a * math.log(x) - lg)
    # Lentz continued fraction for Q(a, x)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = math.exp(-x + a * math.log(x) - lg) * h
    return 1.0 - q


def chi2_cdf(x: float, df: float) -> float:
    return _gammainc_lower(df / 2.0, x / 2.0)


def chi2_ppf(q: float, df: float) -> float:
    """Inverse chi2 CDF by bisection (monotone; df is small here)."""
    lo, hi = 0.0, max(4.0 * df, 16.0)
    while chi2_cdf(hi, df) < q:
        hi *= 2.0
        if hi > 1e8:
            break
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if chi2_cdf(mid, df) < q:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def _cov_inv(Y: np.ndarray) -> np.ndarray:
    """Inverse of the sample covariance — pivot-free Gauss-Jordan when
    the matrix is cleanly invertible (every pivot bounded away from 0;
    the deterministic op order the r12 multi_cusum oracle replays),
    np.linalg.pinv as the degenerate-input fallback (rank-deficient
    synthetic fixtures, k=1 zero-variance corners)."""
    from kats_spark.operators.var import _gauss_solve_multi

    sigma = np.atleast_2d(np.cov(Y, rowvar=False))
    k = sigma.shape[0]
    try:
        with np.errstate(all="raise"):
            inv = _gauss_solve_multi(sigma, np.eye(k))
        if not np.all(np.isfinite(inv)):
            raise FloatingPointError
        return inv
    except FloatingPointError:
        return np.linalg.pinv(sigma)


def _find_cp_multi(Y: np.ndarray, max_iter: int) -> tuple[int, bool]:
    """Iterative multivariate changepoint (cusum_detection.py:870-930):
    si = Mahalanobis(x, mu0) - Mahalanobis(x, mu1) under the pooled
    covariance; cp = clamp(argmin(cumsum(si))); start at the midpoint."""
    n = len(Y)
    inv = _cov_inv(Y)
    cp = n // 2
    stable = False
    for _ in range(max_iter):
        mu0 = Y[: cp + 1].mean(axis=0)
        mu1 = Y[cp + 1 :].mean(axis=0)
        d0 = Y - mu0
        d1 = Y - mu1
        si = np.einsum("ij,jk,ik->i", d0, inv, d0) - np.einsum(
            "ij,jk,ik->i", d1, inv, d1
        )
        nxt = max(1, min(int(np.argmin(np.cumsum(si))), n - 2))
        if nxt == cp:
            stable = True
            break
        cp = nxt
    return cp, stable


def _llr_multi(Y: np.ndarray, cp: int) -> float:
    """Two-segment Gaussian LRT with the pooled covariance (log-det terms
    cancel): llr = sum over both segments of quad(x, mu_null) -
    quad(x, mu_segment).

    Parity note (cusum_detection.py:814-846): the reference SUBTRACTS the
    after-segment term from the before-segment term, which cancels the
    statistic for a symmetric shift; we use the standard sum — the same
    convention its own univariate ``_get_llr`` uses — and document the
    deviation here.
    """
    mu_tilde = Y.mean(axis=0)
    inv = _cov_inv(Y)
    mu0 = Y[: cp + 1].mean(axis=0)
    mu1 = Y[cp + 1 :].mean(axis=0)

    def seg(x: np.ndarray, m_alt: np.ndarray) -> float:
        d_alt = x - m_alt
        d_null = x - mu_tilde
        return float(
            np.einsum("ij,jk,ik->", d_null, inv, d_null)
            - np.einsum("ij,jk,ik->", d_alt, inv, d_alt)
        )

    return seg(Y[: cp + 1], mu0) + seg(Y[cp + 1 :], mu1)


def multi_cusum_detect(
    df: DataFrame,
    threshold: float = 0.01,
    max_iter: int = 10,
    group_col: str | None = None,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Changepoint in the joint mean of co-observed series (one row per
    vector group): (group_id, cp_time, cp_index, llr, p_value, stable,
    delta_l2).  Spark shape: member series co-locate after one
    groupBy(group) shuffle; the matrix kernel runs per group in Arrow
    batches (same fan-out as operators/var.py)."""
    from pyspark.sql import functions as F

    gcol = group_col or "__g"
    src = df if group_col else df.withColumn(gcol, F.lit("all"))
    schema = (
        "group_id string, cp_time timestamp, cp_index int, llr double, "
        "p_value double, stable boolean, delta_l2 double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["group_id", "cp_time", "cp_index", "llr", "p_value", "stable", "delta_l2"]
        wide = (
            pdf.pivot_table(index=s.time, columns=s.series_id, values=s.value)
            .sort_index()
            .dropna()
        )
        n, k = wide.shape
        if n < 10 or k == 0:
            return pd.DataFrame(columns=cols)
        Y = wide.to_numpy(dtype=float)
        cp, stable = _find_cp_multi(Y, max_iter)
        llr = _llr_multi(Y, cp)
        dof = k + 1
        p_value = 1.0 - chi2_cdf(llr, dof)
        if llr <= chi2_ppf(1.0 - threshold, dof):
            return pd.DataFrame(columns=cols)
        delta = Y[cp + 1 :].mean(axis=0) - Y[: cp + 1].mean(axis=0)
        return pd.DataFrame(
            [
                {
                    "group_id": str(pdf[gcol].iloc[0]),
                    "cp_time": wide.index[cp],
                    "cp_index": int(cp),
                    "llr": float(llr),
                    "p_value": float(p_value),
                    "stable": bool(stable),
                    "delta_l2": float(np.linalg.norm(delta)),
                }
            ],
            columns=cols,
        )

    return (
        src.select(gcol, s.series_id, s.time, s.value)
        .groupBy(gcol)
        .applyInPandas(fn, schema)
    )
