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


# ---------------------------------------------------------------------
# statsmodels-EXACT STL kernel (r11): a faithful port of the original
# Cleveland et al. Fortran ``stl`` routine (netlib stl.f), which
# statsmodels.tsa.seasonal.STL wraps verbatim (_stl.pyx) and the
# reference delegates to (kats/tsfeatures/tsfeatures.py:766
# ``STL(x, period=period).fit()``; kats/utils/decomposition.py:100-113).
# Distinct from ``stl_decompose_np`` above (a simplified loess variant
# whose values are frozen into rows-only consumers: stlf/theta models,
# q_stl_decompose); this kernel reproduces statsmodels bit-for-bit:
#
# - the reference's OWN version-gated test expectations
#   (kats/tests/tsfeatures/test_tsfeatures.py:156-196) are reproduced
#   exactly on BOTH statsmodels eras: >=0.12 values (trend_strength
#   0.426899 ...) with the default trend window, <0.12 values (0.5364
#   ...) with the pre-0.12 default trend window (see below);
# - the committed METALEARNING_TEST_T1/T2_FEATURES stl-block values
#   (test_models_dummy_data.py:4665) are reproduced to ~1e-15 with the
#   pre-0.12 trend window — proving the r10 3-17% "loess band" was
#   purely statsmodels version drift, not a formula gap.
#
# Era note: statsmodels < 0.12 defaulted the trend window to the
# smallest odd >= 1.5*period (T1/T2 fixtures: 11); >= 0.12 uses the
# paper's smallest odd >= 1.5*period/(1 - 1.5/seasonal) (15).  The
# reference pins statsmodels==0.12.2 (requirements.txt:14), so the
# post-0.12 formula is this kernel's default; pass ``trend=`` for the
# pre-0.12 value when matching the committed (pre-0.12) golden vectors.
# ---------------------------------------------------------------------


def _sm_est(
    y: np.ndarray,
    n: int,
    span: int,
    deg: int,
    xs: float,
    nleft: int,
    nright: int,
    rw: np.ndarray | None = None,
) -> float | None:
    """Fortran ``stlest``: tricube-weighted fit of degree ``deg`` at
    position ``xs`` (1-indexed) over points ``nleft..nright``.  Returns
    None when every weight vanishes (caller substitutes y[xs])."""
    rng = float(n - 1)
    h = max(xs - nleft, nright - xs)
    if span > n:
        h += (span - n) // 2
    h9, h1 = 0.999 * h, 0.001 * h
    j = np.arange(nleft, nright + 1, dtype=np.float64)
    r = np.abs(j - xs)
    w = np.zeros_like(j)
    inside = r <= h9
    w[inside & (r <= h1)] = 1.0
    mid = inside & (r > h1)
    w[mid] = (1.0 - (r[mid] / h) ** 3) ** 3
    if rw is not None:
        w *= rw[nleft - 1 : nright]
    a = w.sum()
    if a <= 0:
        return None
    w /= a
    if h > 0 and deg > 0:
        a = float((w * j).sum())
        b = xs - a
        c = float((w * (j - a) ** 2).sum())
        if np.sqrt(c) > 0.001 * rng:
            b /= c
            w *= b * (j - a) + 1.0
    return float((w * y[nleft - 1 : nright]).sum())


def _sm_loess(
    y: np.ndarray, span: int, deg: int, jump: int = 1, rw: np.ndarray | None = None
) -> np.ndarray:
    """Fortran ``stless``: loess over the integer grid with evaluation
    every ``jump`` points + linear interpolation between.  The jump=1
    unweighted interior (constant symmetric tricube window, where the
    degree-1 correction vanishes by symmetry) is vectorized as one
    sliding-window matvec; boundary points replay the scalar path."""
    n = len(y)
    ys = np.empty(n)
    if n < 2:
        ys[:] = y
        return ys
    newnj = min(jump, n - 1)
    if span >= n:
        nleft, nright = 1, n
        for i in range(1, n + 1, newnj):
            v = _sm_est(y, n, span, deg, float(i), nleft, nright, rw)
            ys[i - 1] = y[i - 1] if v is None else v
    elif newnj == 1:
        nsh = (span + 1) // 2
        lo_end = nsh  # i in [1, nsh]: window pinned [1, span]
        hi_start = n - span + nsh + 1  # window pinned [n-span+1, n]
        # Fast path requires odd span: for interior xs the Fortran halfwidth
        # is max(xs-nleft, nright-xs) = max(nsh-1, span-nsh), which collapses
        # to nsh-1 only when span is odd (even span: span-nsh = nsh > nsh-1,
        # so the hardcoded h would yield wrong tricube weights).
        if rw is None and hi_start > lo_end + 1 and span % 2 == 1:
            h = float(nsh - 1)
            t = np.abs(np.arange(span, dtype=np.float64) - h)
            if h > 0:
                k = np.where(t <= 0.001 * h, 1.0, (1.0 - (t / h) ** 3) ** 3)
                k[t > 0.999 * h] = 0.0
            else:
                k = np.ones(span)
            k /= k.sum()
            win = np.lib.stride_tricks.sliding_window_view(y, span)
            # interior i -> window starting at i - nsh (0-indexed)
            ys[lo_end : hi_start - 1] = win[1 : n - span + 1] @ k
            idx_loop: list[int] = list(range(1, lo_end + 1)) + list(
                range(hi_start, n + 1)
            )
        else:
            idx_loop = list(range(1, n + 1))
        for i in idx_loop:
            if i <= nsh:
                nleft, nright = 1, span
            elif i >= hi_start:
                nleft, nright = n - span + 1, n
            else:
                nleft, nright = i - nsh + 1, i - nsh + span
            v = _sm_est(y, n, span, deg, float(i), nleft, nright, rw)
            ys[i - 1] = y[i - 1] if v is None else v
    else:
        nsh = (span + 1) // 2
        nleft, nright = 1, span
        for i in range(1, n + 1, newnj):
            if i < nsh:
                nleft, nright = 1, span
            elif i >= n - nsh + 1:
                nleft, nright = n - span + 1, n
            else:
                nleft, nright = i - nsh + 1, span + i - nsh
            v = _sm_est(y, n, span, deg, float(i), nleft, nright, rw)
            ys[i - 1] = y[i - 1] if v is None else v
    if newnj != 1:
        for i in range(1, n - newnj + 1, newnj):
            delta = (ys[i + newnj - 1] - ys[i - 1]) / newnj
            for j in range(i + 1, i + newnj):
                ys[j - 1] = ys[i - 1] + delta * (j - i)
        k_last = ((n - 1) // newnj) * newnj + 1
        if k_last != n:
            v = _sm_est(y, n, span, deg, float(n), nleft, nright, rw)
            ys[n - 1] = y[n - 1] if v is None else v
            if k_last != n - 1:
                delta = (ys[n - 1] - ys[k_last - 1]) / (n - k_last)
                for j in range(k_last + 1, n):
                    ys[j - 1] = ys[k_last - 1] + delta * (j - k_last)
    return ys


def _sm_subseries(
    y: np.ndarray,
    n: int,
    period: int,
    ns: int,
    isdeg: int,
    nsjump: int,
    rw: np.ndarray | None,
) -> np.ndarray:
    """Fortran ``stlss``: per-phase cycle-subseries loess, extended one
    period on each side (fits at subseries positions 0 and m+1)."""
    season = np.empty(n + 2 * period)
    for j in range(1, period + 1):
        m = (n - j) // period + 1
        sub = y[j - 1 :: period][:m]
        sub_rw = rw[j - 1 :: period][:m] if rw is not None else None
        sm = _sm_loess(sub, ns, isdeg, nsjump, sub_rw)
        ext = np.empty(m + 2)
        ext[1 : m + 1] = sm
        v = _sm_est(sub, m, ns, isdeg, 0.0, 1, min(ns, m), sub_rw)
        ext[0] = sm[0] if v is None else v
        v = _sm_est(sub, m, ns, isdeg, float(m + 1), max(1, m - ns + 1), m, sub_rw)
        ext[m + 1] = sm[m - 1] if v is None else v
        season[j - 1 :: period][: m + 2] = ext
    return season


def stl_statsmodels_np(
    y: np.ndarray,
    period: int,
    seasonal: int = 7,
    trend: int | None = None,
    low_pass: int | None = None,
    seasonal_deg: int = 1,
    trend_deg: int = 1,
    low_pass_deg: int = 1,
    seasonal_jump: int = 1,
    trend_jump: int = 1,
    low_pass_jump: int = 1,
    robust: bool = False,
    inner_iter: int | None = None,
    outer_iter: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """statsmodels-exact STL: returns (trend, seasonal, resid).

    Defaults mirror ``statsmodels.tsa.seasonal.STL`` (0.12.2, the
    reference's pinned version): seasonal=7, trend = smallest odd >=
    1.5*period/(1-1.5/seasonal), low_pass = smallest odd > period, all
    degrees 1, jumps 1; fit() iterations inner=5/outer=0 (non-robust)
    or inner=2/outer=15 (robust, bisquare weights on 6*median|resid|).
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    np_ = int(period)
    if np_ < 2 or n < 2 * np_:
        raise ValueError(f"series of {n} points cannot fit period {np_} STL")
    ns = max(3, seasonal)
    ns += (ns % 2) == 0
    if trend is None:
        nt = int(np.ceil(1.5 * np_ / (1 - 1.5 / ns)))
    else:
        nt = trend
    nt = max(3, nt)
    nt += (nt % 2) == 0
    if low_pass is None:
        nl = np_ + 1
    else:
        nl = low_pass
    nl = max(3, nl)
    nl += (nl % 2) == 0
    ni = inner_iter if inner_iter is not None else (2 if robust else 5)
    no = outer_iter if outer_iter is not None else (15 if robust else 0)

    T = np.zeros(n)
    S = np.zeros(n)
    rw: np.ndarray | None = None
    for outer in range(no + 1):
        for _ in range(ni):
            ext = _sm_subseries(y - T, n, np_, ns, seasonal_deg, seasonal_jump, rw)
            lp = _ma(_ma(_ma(ext, np_), np_), 3)
            lp = _sm_loess(lp, nl, low_pass_deg, low_pass_jump)
            S = ext[np_ : np_ + n] - lp
            T = _sm_loess(y - S, nt, trend_deg, trend_jump, rw)
        if outer < no:
            # Fortran stlrwt: bisquare weights on 6*median(|resid|)
            r = np.abs(y - S - T)
            rs = np.sort(r)
            m1 = n // 2  # 0-indexed upper middle
            cmad = 3.0 * (rs[m1] + rs[n - m1 - 1])
            if cmad <= 0:
                rw = np.ones(n)
            else:
                rw = np.where(
                    r <= 0.001 * cmad,
                    1.0,
                    np.where(
                        r <= 0.999 * cmad, (1.0 - (r / cmad) ** 2) ** 2, 0.0
                    ),
                )
    return T, S, y - S - T


def stl_decompose(
    df: DataFrame,
    period: int,
    model: str = "additive",
    seasonal: int = 7,
    trend: int | None = None,
    low_pass: int | None = None,
    robust: bool = False,
    kernel: str = "loess",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, value, trend, seasonal, residual) via per-series
    STL.  ``model='multiplicative'`` log-transforms before and
    exponentiates after, exactly the reference's pre/post transform
    (decomposition.py:178-186: data = log(original), post = exp).
    ``kernel='loess'`` (default) keeps the historical simplified-loess
    split (frozen into this repo's rows-only consumers);
    ``kernel='statsmodels'`` uses the statsmodels-exact port
    (:func:`stl_statsmodels_np`) — the reference-parity path."""
    if kernel not in ("loess", "statsmodels"):
        raise ValueError(
            f"stl_decompose: unknown kernel {kernel!r} (expected 'loess' or "
            "'statsmodels') — refusing to silently fall back"
        )
    mult = model == "multiplicative"
    kern = stl_statsmodels_np if kernel == "statsmodels" else stl_decompose_np
    sid, tcol, vcol = s.series_id, s.time, s.value

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(tcol).reset_index(drop=True)
        yv = pdf[vcol].to_numpy(dtype=np.float64)
        yw = np.log(yv) if mult else yv
        T, S, R = kern(
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
