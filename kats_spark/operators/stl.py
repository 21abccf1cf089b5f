"""STL decomposition (Cleveland/Cleveland/McRae/Terpenning 1990) as a
pure-numpy per-series kernel over ``applyInPandas``.

Parity target: kats/utils/decomposition.py:171-211 (``__decompose_STL``),
which delegates to statsmodels ``STL`` with defaults seasonal=7,
trend=None (auto), low_pass=None (auto), degrees=1, robust=False.
statsmodels is absent from this container, so the algorithm is
implemented from the published paper with the same parameter conventions:

- seasonal span ``ns`` (odd, >= 3), default 7
- trend span ``nt`` default = smallest odd >= 1.5*period / (1 - 1.5/ns)
- low-pass span ``nl`` default = smallest odd >= period
- inner iterations 2 / outer 0 (non-robust), 1 / 15 (robust) — the
  paper's recommendation, which statsmodels follows.

Inner loop: detrend -> per-phase cycle-subseries loess (extended one
cycle each side) -> low-pass (MA period x2 + MA 3 + loess nl) ->
seasonal = subseries - low-pass -> trend = loess nt of deseasonalized.
Outer loop: bisquare robustness weights from the remainder.

Spark-side shape: one ``applyInPandas`` keyed on series_id — each series
fits entirely in a task (the same bound every per-series model op in
this repo documents); the kernel is vectorized numpy (windowed weighted
least squares via einsum), no Python-level per-point loops.

The decomposition is iterative loess — not expressible in SQL — so the
declared query is rows-only with seeded-simulation tests asserting
component recovery (see tests/test_stl.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def _next_odd(x: float) -> int:
    n = int(np.ceil(x))
    return n if n % 2 == 1 else n + 1


def _loess(
    y: np.ndarray,
    q: int,
    deg: int,
    x_eval: np.ndarray | None = None,
    rho: np.ndarray | None = None,
) -> np.ndarray:
    """1-D loess of ``y`` observed at x = 0..n-1, evaluated at ``x_eval``
    (default: the observation grid).  ``q`` = span (number of nearest
    points), ``deg`` in {0, 1}, ``rho`` = optional robustness weights.

    Vectorized: every eval point's q-nearest neighbours form a contiguous
    clamped window of the sorted grid, so the weighted least squares for
    ALL eval points reduces to a handful of (m, q) einsums.  Eval points
    are chunked to bound memory at O(chunk * q)."""
    n = len(y)
    if x_eval is None:
        x_eval = np.arange(n, dtype=np.float64)
    x_eval = np.asarray(x_eval, dtype=np.float64)
    qq = min(q, n)
    lo = np.clip(np.ceil(x_eval - (qq - 1) / 2.0).astype(np.int64), 0, n - qq)
    out = np.empty(len(x_eval), dtype=np.float64)
    chunk = max(1, 262_144 // max(qq, 1))
    for c0 in range(0, len(x_eval), chunk):
        sl = slice(c0, min(c0 + chunk, len(x_eval)))
        L = lo[sl]
        X0 = x_eval[sl]
        idx = L[:, None] + np.arange(qq)[None, :]
        xw = idx.astype(np.float64)
        dist = np.abs(xw - X0[:, None])
        lam = dist.max(axis=1)
        if q > n:
            lam = lam * (q / n)
        lam = np.maximum(lam, 1e-12)
        u = np.minimum(dist / lam[:, None], 1.0)
        w = (1.0 - u**3) ** 3
        if rho is not None:
            w = w * rho[idx]
        yw = y[idx]
        if deg == 0:
            sw = w.sum(axis=1)
            out[sl] = (w * yw).sum(axis=1) / np.where(sw == 0, 1.0, sw)
        else:
            # weighted linear fit centered at X0: minimize sum w (y - a - b t)^2
            t = xw - X0[:, None]
            sw = w.sum(axis=1)
            st = (w * t).sum(axis=1)
            stt = (w * t * t).sum(axis=1)
            sy = (w * yw).sum(axis=1)
            sty = (w * t * yw).sum(axis=1)
            det = sw * stt - st * st
            # fall back to weighted mean where the window is degenerate
            safe = np.abs(det) > 1e-12
            a = np.where(
                safe,
                (stt * sy - st * sty) / np.where(safe, det, 1.0),
                sy / np.where(sw == 0, 1.0, sw),
            )
            out[sl] = a
    return out


def _ma(y: np.ndarray, span: int) -> np.ndarray:
    """Simple moving average, output length len(y) - span + 1."""
    c = np.cumsum(np.concatenate(([0.0], y)))
    return (c[span:] - c[:-span]) / span


def stl_decompose_np(
    y: np.ndarray,
    period: int,
    seasonal: int = 7,
    trend: int | None = None,
    low_pass: int | None = None,
    seasonal_deg: int = 1,
    trend_deg: int = 1,
    low_pass_deg: int = 1,
    robust: bool = False,
    inner_iter: int | None = None,
    outer_iter: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (trend, seasonal, resid) arrays, length = len(y)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    np_ = int(period)
    if np_ < 2 or n < 2 * np_:
        raise ValueError(f"series of {n} points cannot fit period {np_} STL")
    ns = max(3, seasonal if seasonal % 2 == 1 else seasonal + 1)
    nt = trend if trend is not None else _next_odd(1.5 * np_ / (1 - 1.5 / ns))
    nl = low_pass if low_pass is not None else _next_odd(np_ + 1)  # smallest odd > period
    ni = inner_iter if inner_iter is not None else (1 if robust else 2)
    no = outer_iter if outer_iter is not None else (15 if robust else 0)

    T = np.zeros(n)
    S = np.zeros(n)
    rho: np.ndarray | None = None
    for _outer in range(no + 1):
        for _inner in range(ni):
            D = y - T
            # 1. cycle-subseries loess, extended one position each side
            C = np.empty(n + 2 * np_)
            for p in range(np_):
                sub = D[p::np_]
                m = len(sub)
                sub_rho = rho[p::np_] if rho is not None else None
                ev = np.arange(-1, m + 1, dtype=np.float64)
                fit = _loess(sub, ns, seasonal_deg, x_eval=ev, rho=sub_rho)
                C[p::np_] = fit  # positions p, p+np_, ... within 0..n+2np_-1
            # 2. low-pass: MA(np) twice, MA(3), then loess(nl)
            L = _ma(_ma(_ma(C, np_), np_), 3)
            L = _loess(L, nl, low_pass_deg)
            # 3. seasonal
            S = C[np_:-np_] - L
            # 4. trend from deseasonalized
            T = _loess(y - S, nt, trend_deg, rho=rho)
        if _outer < no:
            R = y - T - S
            h = 6.0 * np.median(np.abs(R))
            if h <= 0:
                rho = np.ones(n)
            else:
                u = np.minimum(np.abs(R) / h, 1.0)
                rho = (1.0 - u**2) ** 2
    return T, S, y - T - S


def stl_decompose(
    df: DataFrame,
    period: int,
    model: str = "additive",
    seasonal: int = 7,
    trend: int | None = None,
    low_pass: int | None = None,
    robust: bool = False,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, value, trend, seasonal, residual) via per-series
    STL.  ``model='multiplicative'`` log-transforms before and
    exponentiates after, exactly the reference's pre/post transform
    (decomposition.py:178-186: data = log(original), post = exp)."""
    mult = model == "multiplicative"
    sid, tcol, vcol = s.series_id, s.time, s.value

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(tcol).reset_index(drop=True)
        yv = pdf[vcol].to_numpy(dtype=np.float64)
        yw = np.log(yv) if mult else yv
        T, S, R = stl_decompose_np(
            yw, period, seasonal=seasonal, trend=trend, low_pass=low_pass, robust=robust
        )
        if mult:
            T, S, R = np.exp(T), np.exp(S), np.exp(R)
        return pd.DataFrame(
            {
                sid: pdf[sid],
                tcol: pdf[tcol],
                vcol: yv,
                "trend": T,
                "seasonal": S,
                "residual": R,
            }
        )

    schema = (
        f"{sid} string, {tcol} timestamp, {vcol} double, "
        "trend double, seasonal double, residual double"
    )
    return df.select(sid, tcol, vcol).groupBy(sid).applyInPandas(fit, schema=schema)


def stl_strengths(
    df: DataFrame,
    period: int,
    seasonal: int = 7,
    robust: bool = False,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Seasonal/trend strengths from the STL split
    (tsfeatures.py:738-769 stl_features convention):
    trend_strength = 1 - var(resid)/var(trend + resid),
    seasonality_strength = 1 - var(resid)/var(seasonal + resid)."""
    parts = stl_decompose(df, period, seasonal=seasonal, robust=robust, s=s)
    vr = F.var_samp("residual")
    vtr = F.var_samp(F.col("trend") + F.col("residual"))
    vsr = F.var_samp(F.col("seasonal") + F.col("residual"))
    return parts.groupBy(s.series_id).agg(
        (1 - vr / vtr).alias("trend_strength"),
        (1 - vr / vsr).alias("seasonality_strength"),
    )
