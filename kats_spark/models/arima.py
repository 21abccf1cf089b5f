"""ARIMA(p, d, q) forecasting — numpy Hannan-Rissanen, no statsmodels.

Parity with kats/models/arima.py:43-334 (``ARIMAModel``: fit :144 wraps
statsmodels ARIMA, predict :236 returns (time, fcst, fcst_lower,
fcst_upper)) and sarima.py's differencing semantics.  This container has
no statsmodels, so the estimator chain is reimplemented in numpy — the
same chain statsmodels runs:

1. difference d times;
2. Hannan-Rissanen start: long-AR innovations + OLS on (x, e) lags;
3. damped Gauss-Newton over the conditional sum of squares;
4. EXACT maximum likelihood: Kalman-filter innovations log-likelihood
   (Harvey state space, stationary Lyapunov init, concentrated sigma^2)
   maximized by BFGS over Monahan's PACF parameterization — this is
   where CSS and the reference's statsmodels MLE measurably diverge
   (near-unit-root AR, strong MA; seeded divergence test in
   tests/test_models.py);
5. forecast recursively, integrate d times back, sigma bands from the
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


# ---- exact maximum likelihood via the Kalman filter ---------------------
#
# The reference wraps statsmodels ARIMA (kats/models/arima.py:144), whose
# estimator is the EXACT innovations likelihood, not CSS: near unit roots
# and with strong MA terms the two measurably diverge.  This is the same
# likelihood in numpy: Harvey's ARMA state space, stationary (Lyapunov)
# initialization, concentrated sigma^2, steady-state filter shortcut, and
# a BFGS polish over Monahan's PACF parameterization (tanh -> partial
# autocorrelations -> Durbin-Levinson), which keeps the optimizer
# unconstrained while every iterate stays stationary/invertible.


def _pacf_to_ar(pacf: np.ndarray) -> np.ndarray:
    """Durbin-Levinson: partial autocorrelations -> AR coefficients of a
    stationary polynomial 1 - phi_1 B - ... - phi_k B^k."""
    y = np.array(pacf, dtype=float)
    for k in range(1, len(y)):
        y[:k] = y[:k] - pacf[k] * y[:k][::-1]
    return y


def _ar_to_pacf(phi: np.ndarray) -> np.ndarray:
    """Inverse Durbin-Levinson; requires a stationary input."""
    y = np.array(phi, dtype=float)
    out = np.zeros(len(y))
    for k in range(len(y) - 1, 0, -1):
        a = y[k]
        out[k] = a
        denom = 1.0 - a * a
        if abs(denom) < 1e-12:
            denom = np.sign(denom) * 1e-12 if denom else 1e-12
        y[:k] = (y[:k] + a * y[:k][::-1]) / denom
    if len(y):
        out[0] = y[0]
    return out


def _unconstrain(phi: np.ndarray, theta: np.ndarray) -> np.ndarray:
    """(phi, theta) -> unconstrained z via arctanh(pacf); non-stationary
    starts are pulled just inside the region first."""

    def inv(coefs, flip):
        c = -coefs if flip else coefs
        if len(c) and np.any(np.abs(np.roots(np.r_[1.0, -c])) >= 1.0):
            c = c * 0.95 ** np.arange(1, len(c) + 1)  # shrink toward 0
            while np.any(np.abs(np.roots(np.r_[1.0, -c])) >= 1.0):
                c = c * 0.9
        pac = np.clip(_ar_to_pacf(c), -0.9999, 0.9999)
        return np.arctanh(pac)

    # MA poly 1 + sum theta_j B^j == 1 - sum (-theta_j) B^j: reuse the AR map
    return np.concatenate([inv(phi, False), inv(theta, True)])


def _constrain(z: np.ndarray, p: int, q: int) -> tuple[np.ndarray, np.ndarray]:
    phi = _pacf_to_ar(np.tanh(z[:p])) if p else np.zeros(0)
    theta = -_pacf_to_ar(np.tanh(z[p:])) if q else np.zeros(0)
    return phi, theta


def _kalman_loglik(
    xc: np.ndarray, phi: np.ndarray, theta: np.ndarray
) -> tuple[float, float]:
    """Concentrated exact Gaussian log-likelihood of a zero-mean
    ARMA(p, q).  Returns (loglik, sigma2_hat).

    Harvey state space: T has phi down column 0 and an identity
    superdiagonal, R = (1, theta_1..theta_{r-1})', Z = e_1, no
    observation noise (F_t = P[0,0]).  P_0 is the exact stationary
    covariance (discrete Lyapunov via kron solve — state dim r is tiny).
    Once P converges the filter drops to the steady-state recursion.

    State dim <= 3 (p <= 3, q <= 2 — every common order) takes a
    scalar-unrolled filter loop ~5x faster than the ndarray loop; the
    generic path below is the reference implementation and covers the
    rest (equivalence asserted in tests)."""
    p, q = len(phi), len(theta)
    n = len(xc)
    r = max(p, q + 1, 1)
    if not np.all(np.isfinite(xc)):
        # missing observations: the generic filter skips the update step
        # on NaN rows (statsmodels' missing handling); the scalar fast
        # path and the steady-state handoff assume a gap-free stream
        return _kalman_loglik_generic(xc, phi, theta)
    if r <= 3:
        return _kalman_loglik_r3(xc, phi, theta)
    return _kalman_loglik_generic(xc, phi, theta)


def _kalman_loglik_generic(
    xc: np.ndarray, phi: np.ndarray, theta: np.ndarray
) -> tuple[float, float]:
    p, q = len(phi), len(theta)
    n = len(xc)
    r = max(p, q + 1, 1)
    T = np.zeros((r, r))
    T[:p, 0] = phi
    T[: r - 1, 1:] = np.eye(r - 1)
    R = np.zeros(r)
    R[0] = 1.0
    R[1 : q + 1] = theta
    RR = np.outer(R, R)
    # stationary P0: vec(P) = (I - T (x) T)^-1 vec(RR)
    try:
        vecP = np.linalg.solve(np.eye(r * r) - np.kron(T, T), RR.reshape(-1))
    except np.linalg.LinAlgError:
        return -np.inf, np.nan
    P = vecP.reshape(r, r)
    P = 0.5 * (P + P.T)  # the kron solve is ill-conditioned near the
    # unit circle and can return a visibly asymmetric P; the true
    # stationary covariance is symmetric
    if not np.all(np.isfinite(P)) or P[0, 0] <= 0:
        return -np.inf, np.nan
    a = np.zeros(r)
    ss = 0.0  # sum nu^2 / F
    logF = 0.0
    k = max(p, q, 1)
    nus: list[float] = []
    steady_at = -1
    conv_run = 0
    has_missing = not np.all(np.isfinite(xc))
    n_obs = 0
    for t in range(n):
        if has_missing and not np.isfinite(xc[t]):
            # missing observation: prediction step only (no innovation,
            # no likelihood contribution) — the exact treatment
            nus.append(np.nan)
            a = T @ a
            P = T @ P @ T.T + RR
            conv_run = 0
            continue
        nu = xc[t] - a[0]
        nus.append(float(nu))
        n_obs += 1
        F = P[0, 0]
        if F <= 0 or not np.isfinite(F):
            return -np.inf, np.nan
        K = (T @ P[:, 0]) / F
        logF += np.log(F)
        ss += nu * nu / F
        a = T @ a + K * nu
        Pn = T @ P @ T.T + RR - np.outer(K, K) * F
        # steady only after THREE consecutive sub-tolerance steps: with
        # oscillatory near-boundary roots |dP| dips transiently while P
        # is still far from its fixpoint; never while gaps exist (the
        # ARMA-recursion handoff needs a contiguous observed stream)
        if np.max(np.abs(Pn - P)) < 1e-12:
            conv_run += 1
        else:
            conv_run = 0
        P = Pn
        if conv_run >= 3 and t + 1 >= k and not has_missing:
            steady_at = t + 1
            break
    if 0 <= steady_at < n:
        # Steady state: the filter has converged to the innovations
        # representation of the (invertible) ARMA model, so the
        # remaining innovations follow the ARMA recursion itself —
        # pure-Python float math, ~10x cheaper than the matrix loop.
        F_s = P[0, 0]
        logF += (n - steady_at) * float(np.log(F_s))
        xl = xc.tolist()
        phl = [float(v) for v in phi]
        thl = [float(v) for v in theta]
        inv_F = 1.0 / F_s
        for t in range(steady_at, n):
            acc = xl[t]
            for i, ph in enumerate(phl):
                acc -= ph * xl[t - 1 - i]
            for j, th in enumerate(thl):
                acc -= th * nus[t - 1 - j]
            nus.append(acc)
            ss += acc * acc * inv_F
            n_obs += 1
    sigma2 = ss / max(n_obs, 1)
    if sigma2 <= 0 or not np.isfinite(sigma2):
        return -np.inf, np.nan
    ll = (
        -0.5 * n_obs * (np.log(2.0 * np.pi) + 1.0 + np.log(sigma2))
        - 0.5 * logF
    )
    return float(ll), float(sigma2)


def _kalman_loglik_r3(
    xc: np.ndarray, phi: np.ndarray, theta: np.ndarray
) -> tuple[float, float]:
    """Scalar-unrolled Harvey filter for state dim <= 3 (zero-padded to
    exactly 3 — the padded representation is the same ARMA model).  Same
    math as ``_kalman_loglik_generic``, ~5x faster: the hot loop is pure
    float arithmetic on the 6 unique entries of the symmetric P."""
    from math import isfinite, log

    p, q = len(phi), len(theta)
    n = len(xc)
    f1 = float(phi[0]) if p > 0 else 0.0
    f2 = float(phi[1]) if p > 1 else 0.0
    f3 = float(phi[2]) if p > 2 else 0.0
    t1 = float(theta[0]) if q > 0 else 0.0
    t2 = float(theta[1]) if q > 1 else 0.0
    T = np.array([[f1, 1.0, 0.0], [f2, 0.0, 1.0], [f3, 0.0, 0.0]])
    R = np.array([1.0, t1, t2])
    RR = np.outer(R, R)
    try:
        vecP = np.linalg.solve(np.eye(9) - np.kron(T, T), RR.reshape(-1))
    except np.linalg.LinAlgError:
        return -np.inf, np.nan
    P0 = vecP.reshape(3, 3)
    P0 = 0.5 * (P0 + P0.T)  # symmetrize (see generic path)
    if not np.all(np.isfinite(P0)) or P0[0, 0] <= 0:
        return -np.inf, np.nan
    p00, p01, p02 = float(P0[0, 0]), float(P0[0, 1]), float(P0[0, 2])
    p11, p12, p22 = float(P0[1, 1]), float(P0[1, 2]), float(P0[2, 2])
    r00, r01, r02 = 1.0, t1, t2
    r11, r12, r22 = t1 * t1, t1 * t2, t2 * t2
    a0 = a1 = a2 = 0.0
    ss = 0.0
    logF = 0.0
    k = max(p, q, 1)
    nus: list[float] = []
    steady_at = -1
    conv_run = 0
    xl = [float(v) for v in xc]
    for t in range(n):
        nu = xl[t] - a0
        nus.append(nu)
        F = p00
        if F <= 0 or not isfinite(F):
            return -np.inf, np.nan
        inv_F = 1.0 / F
        # K = T P[:,0] / F
        k0 = (f1 * p00 + p01) * inv_F
        k1 = (f2 * p00 + p02) * inv_F
        k2 = f3 * p00 * inv_F
        logF += log(F)
        ss += nu * nu * inv_F
        # a' = T a + K nu
        a0, a1, a2 = (
            f1 * a0 + a1 + k0 * nu,
            f2 * a0 + a2 + k1 * nu,
            f3 * a0 + k2 * nu,
        )
        # TP rows
        tp00 = f1 * p00 + p01
        tp01 = f1 * p01 + p11
        tp02 = f1 * p02 + p12
        tp10 = f2 * p00 + p02
        tp11 = f2 * p01 + p12
        tp12 = f2 * p02 + p22
        tp20 = f3 * p00
        tp21 = f3 * p01
        tp22_ = f3 * p02
        # P' = TP T' + RR - F K K'
        n00 = f1 * tp00 + tp01 + r00 - F * k0 * k0
        n01 = f2 * tp00 + tp02 + r01 - F * k0 * k1
        n02 = f3 * tp00 + r02 - F * k0 * k2
        n11 = f2 * tp10 + tp12 + r11 - F * k1 * k1
        n12 = f3 * tp10 + r12 - F * k1 * k2
        n22 = f3 * tp20 + r22 - F * k2 * k2
        d = max(
            abs(n00 - p00),
            abs(n01 - p01),
            abs(n02 - p02),
            abs(n11 - p11),
            abs(n12 - p12),
            abs(n22 - p22),
        )
        p00, p01, p02, p11, p12, p22 = n00, n01, n02, n11, n12, n22
        conv_run = conv_run + 1 if d < 1e-12 else 0
        if conv_run >= 3 and t + 1 >= k:
            steady_at = t + 1
            break
    if 0 <= steady_at < n:
        F_s = p00
        logF += (n - steady_at) * log(F_s)
        inv_F = 1.0 / F_s
        phl = [float(v) for v in phi]
        thl = [float(v) for v in theta]
        for t in range(steady_at, n):
            acc = xl[t]
            for i, ph in enumerate(phl):
                acc -= ph * xl[t - 1 - i]
            for j, th in enumerate(thl):
                acc -= th * nus[t - 1 - j]
            nus.append(acc)
            ss += acc * acc * inv_F
    sigma2 = ss / n
    if sigma2 <= 0 or not isfinite(sigma2):
        return -np.inf, np.nan
    ll = -0.5 * n * (log(2.0 * np.pi) + 1.0 + log(sigma2)) - 0.5 * logF
    return float(ll), float(sigma2)


def _bfgs_max(f, z0: np.ndarray, max_iter: int = 40, tol: float = 1e-8):
    """Tiny BFGS maximizer with forward-difference gradients and Armijo
    backtracking — scipy is absent from the container."""
    m = len(z0)
    z = z0.copy()
    fz = f(z)
    if not np.isfinite(fz):
        return z0, f(z0)
    H = np.eye(m)  # inverse-Hessian approx
    eps = 1e-6

    def grad(z, fz):
        g = np.zeros(m)
        for i in range(m):
            zp = z.copy()
            zp[i] += eps
            g[i] = (f(zp) - fz) / eps
        return g

    g = grad(z, fz)
    for _ in range(max_iter):
        d = H @ g
        if not np.all(np.isfinite(d)):
            break
        step = 1.0
        gd = g @ d
        if gd <= 0:  # not an ascent direction: reset
            H = np.eye(m)
            d = g
            gd = g @ g
        improved = False
        for _ls in range(20):
            z2 = z + step * d
            f2 = f(z2)
            if np.isfinite(f2) and f2 > fz + 1e-4 * step * gd:
                improved = True
                break
            step *= 0.5
        if not improved:
            break
        g2 = grad(z2, f2)
        s = z2 - z
        yk = g2 - g
        sy = s @ yk
        if sy < -1e-12:  # curvature ok for maximization (s'y < 0)
            # standard BFGS on -f with y_min = -yk, rho_min = -1/s'y:
            # the projection factors keep rho = 1/s'y, the rank-one term
            # flips sign
            rho = 1.0 / sy
            I = np.eye(m)
            with np.errstate(invalid="ignore", over="ignore"):
                H2 = (I - rho * np.outer(s, yk)) @ H @ (
                    I - rho * np.outer(yk, s)
                ) - rho * np.outer(s, s)
            # a non-finite gradient at a line-search endpoint can poison
            # the update — reset to identity instead of propagating NaNs
            # through every later step
            H = H2 if np.all(np.isfinite(H2)) else np.eye(m)
        gain = f2 - fz
        z, fz, g = z2, f2, g2
        if np.linalg.norm(s) < tol or gain < 1e-8 * (1.0 + abs(fz)):
            break
    return z, fz


def _mle_refine(
    xc: np.ndarray, phi: np.ndarray, theta: np.ndarray, max_iter: int = 40
) -> tuple[np.ndarray, np.ndarray, float]:
    """Exact-MLE polish from a (CSS) start.  Returns
    (phi, theta, sigma2); falls back to the start if BFGS cannot improve
    its likelihood."""
    p, q = len(phi), len(theta)
    if p + q == 0:
        return phi, theta, float(xc @ xc) / max(len(xc), 1)
    z0 = _unconstrain(phi, theta)

    def f(z):
        cp, ct = _constrain(z, p, q)
        return _kalman_loglik(xc, cp, ct)[0]

    ll_start = f(z0)
    z, ll = _bfgs_max(f, z0, max_iter=max_iter)
    if not np.isfinite(ll) or ll < ll_start:
        z, ll = z0, ll_start
    cp, ct = _constrain(z, p, q)
    sigma2 = _kalman_loglik(xc, cp, ct)[1]
    # the constrained start may sit just inside the boundary after the
    # shrink; if even that is non-finite, return the raw inputs
    if not np.isfinite(sigma2):
        k = max(p, q)
        e = _innovations(xc, phi, theta)[k:]
        return phi, theta, float(e @ e) / max(len(e) - p - q, 1)
    return cp, ct, float(sigma2)


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
    y: np.ndarray,
    p: int,
    d: int,
    q: int,
    steps: int,
    css: bool = True,
    method: str = "mle",
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (forecast, se) on the ORIGINAL scale.

    ``method="mle"`` (default): HR start -> Gauss-Newton CSS -> exact
    Kalman-likelihood BFGS polish — the statsmodels estimator chain the
    reference wraps.  ``method="css"`` stops after Gauss-Newton (cheaper;
    indistinguishable away from the unit circle)."""
    finite = np.isfinite(y)
    if not finite.all():
        # gaps: linear-interpolate ONLY for the start estimators (HR/CSS
        # need a contiguous stream) — the exact likelihood then runs on
        # the RAW gapped series, skipping the Kalman update at missing
        # rows (statsmodels' missing handling)
        if finite.sum() < 3:
            raise ValueError("too few observed points")
        idx = np.arange(len(y), dtype=float)
        y_fill = y.copy()
        y_fill[~finite] = np.interp(idx[~finite], idx[finite], y[finite])
    else:
        y_fill = y
    x = y_fill.copy()
    x_gap = y.copy()
    heads = []
    for _ in range(d):
        heads.append(x[-1])
        x = np.diff(x)
        x_gap = np.diff(x_gap)  # NaNs propagate — gapped differenced view
    phi, theta, mu, e, sigma2 = _hannan_rissanen(x, p, q)
    xc = x - mu
    if css and p + q:
        phi, theta = _css_refine(xc, phi, theta)
        if method == "mle":
            # fan-out path: capped BFGS budget — the CSS start is close,
            # so 15 iterations converge in practice; the uncapped default
            # stays available for direct calls (divergence test)
            xc_mle = (x_gap - mu) if not finite.all() else xc
            phi, theta, sigma2_mle = _mle_refine(
                xc_mle, phi, theta, max_iter=15
            )
            if np.isfinite(sigma2_mle):
                sigma2 = sigma2_mle
        e = _innovations(xc, phi, theta)
        k = max(p, q)
        resid = e[k:]
        if method != "mle":
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
    method: str = "mle",
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
        fc, se = _arima_forecast_one(y, p, d, q, steps, method=method)
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


def _mle_refine_lagset(
    xc: np.ndarray,
    phi: np.ndarray,
    theta: np.ndarray,
    ar_lags: list[int],
    ma_lags: list[int],
    max_iter: int = 15,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Exact-MLE polish for SPARSE lag sets (the SARIMA additive
    parameterization): BFGS directly over the sparse coefficients, the
    likelihood evaluated by the same Kalman filter on the DENSE
    polynomial.  Candidates outside the stationary/invertible region
    score -inf (the Armijo search shrinks past them).  Returns
    (phi, theta, sigma2) — the CSS start if no step improves it."""
    p, q = len(phi), len(theta)
    if p + q == 0:
        return phi, theta, float(xc @ xc) / max(len(xc), 1)

    def dense(coefs, lags):
        out = np.zeros(max(lags, default=0))
        for c, l in zip(coefs, lags):
            out[l - 1] = c
        return out

    def f(c):
        dp, dt = dense(c[:p], ar_lags), dense(c[p:], ma_lags)
        if len(dp) and np.any(np.abs(np.roots(np.r_[1.0, -dp])) >= 1.0):
            return -np.inf
        if len(dt) and np.any(np.abs(np.roots(np.r_[1.0, dt])) >= 1.0):
            return -np.inf
        return _kalman_loglik(xc, dp, dt)[0]

    z0 = np.concatenate([phi, theta])
    ll0 = f(z0)
    if not np.isfinite(ll0):
        # CSS start outside the strict region (its guard allows 1.02):
        # shrink toward zero until valid
        for shrink in (0.98, 0.95, 0.9, 0.8):
            if np.isfinite(f(z0 * shrink)):
                z0 = z0 * shrink
                ll0 = f(z0)
                break
        else:
            e = _innovations(xc, dense(phi, ar_lags), dense(theta, ma_lags))
            k = max(ar_lags + ma_lags, default=0)
            et = e[k:]
            return phi, theta, float(et @ et) / max(len(et) - p - q, 1)
    z, ll = _bfgs_max(f, z0, max_iter=max_iter)
    if not np.isfinite(ll) or ll < ll0:
        z = z0
    cp, ct = z[:p], z[p:]
    sigma2 = _kalman_loglik(xc, dense(cp, ar_lags), dense(ct, ma_lags))[1]
    return cp, ct, float(sigma2)


def select_order(
    x: np.ndarray,
    max_p: int = 3,
    max_q: int = 2,
    method: str = "aicc",
) -> tuple[int, int, float]:
    """Automatic ARMA(p, q) order selection on a (differenced) series by
    exact-likelihood information criteria — the pmdarima/auto-arima
    selection loop without the dependency.

    Every (p, q) in the grid gets the full estimator chain (HR start ->
    CSS Gauss-Newton -> capped Kalman-MLE polish); the winner minimizes
    AICc (default; 'aic'/'bic' available).  k counts ARMA coefficients
    + the concentrated variance.  Returns (p, q, criterion)."""
    n = len(x)
    mu = x.mean()
    xc = x - mu
    best = (0, 0, np.inf)
    for p in range(max_p + 1):
        for q in range(max_q + 1):
            if p + q == 0:
                s2 = float(xc @ xc) / max(n, 1)
                ll = -0.5 * n * (np.log(2 * np.pi) + 1 + np.log(max(s2, 1e-300)))
            else:
                try:
                    phi, theta, _, _, _ = _hannan_rissanen(x, p, q)
                    phi, theta = _css_refine(xc, phi, theta)
                    phi, theta, _ = _mle_refine(xc, phi, theta, max_iter=10)
                    ll = _kalman_loglik(xc, phi, theta)[0]
                except (np.linalg.LinAlgError, ValueError):
                    continue
            if not np.isfinite(ll):
                continue
            k = p + q + 1  # + concentrated sigma^2
            aic = -2 * ll + 2 * k
            if method == "bic":
                crit = -2 * ll + k * np.log(n)
            elif method == "aic":
                crit = aic
            else:  # aicc
                denom = n - k - 1
                crit = aic + (2 * k * (k + 1)) / denom if denom > 0 else np.inf
            if crit < best[2] - 1e-9:
                best = (p, q, float(crit))
    return best


def param_stderr(
    xc: np.ndarray, phi: np.ndarray, theta: np.ndarray
) -> np.ndarray:
    """Asymptotic standard errors of (phi, theta) at the MLE from the
    OBSERVED information matrix: numerical central-difference Hessian of
    the exact Kalman log-likelihood in COEFFICIENT space, inverted and
    diagonal-rooted — the statsmodels ``bse`` surface.  Non-invertible
    information (boundary fits) yields NaNs for the affected entries."""
    p, q = len(phi), len(theta)
    m = p + q
    if m == 0:
        return np.zeros(0)
    th0 = np.concatenate([phi, theta])

    def ll(v):
        return _kalman_loglik(xc, v[:p], v[p:])[0]

    eps = 1e-4
    H = np.empty((m, m))
    base = ll(th0)
    for i in range(m):
        for j in range(i, m):
            vpp = th0.copy(); vpp[i] += eps; vpp[j] += eps
            vpm = th0.copy(); vpm[i] += eps; vpm[j] -= eps
            vmp = th0.copy(); vmp[i] -= eps; vmp[j] += eps
            vmm = th0.copy(); vmm[i] -= eps; vmm[j] -= eps
            H[i, j] = H[j, i] = (
                ll(vpp) - ll(vpm) - ll(vmp) + ll(vmm)
            ) / (4 * eps * eps)
    if not np.all(np.isfinite(H)):
        return np.full(m, np.nan)
    info = -H  # observed information
    try:
        cov = np.linalg.inv(info)
    except np.linalg.LinAlgError:
        return np.full(m, np.nan)
    d = np.diag(cov)
    out = np.full(m, np.nan)
    ok = d > 0
    out[ok] = np.sqrt(d[ok])
    return out


def arimax_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    future_exog: DataFrame,
    exog_cols: list[str],
    order: tuple[int, int, int] = (2, 0, 1),
    s: TSSchema = DEFAULT,
    method: str = "mle",
) -> DataFrame:
    """Linear regression with ARIMA errors — the reference's
    ``ARIMAParams.exog`` surface (kats/models/arima.py:54,62,71, passed
    through to statsmodels' joint MLE).  Two-stage estimator per series:
    OLS of y on the exogenous columns (with intercept), then the full
    HR -> CSS -> exact-Kalman-MLE ARIMA chain on the OLS residual
    process; forecast = X_future @ beta + ARIMA forecast of the
    residuals.  The two-stage split is the classical regression-with-
    ARMA-errors simplification of the joint likelihood (beta converges
    to the joint-MLE estimate as n grows); prediction intervals carry
    the ARIMA process variance (beta uncertainty excluded, documented).

    ``future_exog``: (series_id, step 1..steps, <exog_cols>) — the
    horizon's regressor values, cogrouped with the history so each
    series' fit and its future X meet in ONE task
    (``groupBy().cogroup().applyInPandas``, no join node, no driver
    state).  Output: (series_id, time, fcst, fcst_lower, fcst_upper)."""
    p, d, q = order
    schema = (
        f"{s.series_id} string, {s.time} timestamp, "
        "fcst double, fcst_lower double, fcst_upper double"
    )
    cols = list(exog_cols)

    def fn(hist: pd.DataFrame, fut: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
        )
        if len(hist) < 3 * (p + q + d) + 10 or len(fut) < steps:
            return empty
        hist = hist.sort_values(s.time)
        fut = fut.sort_values("step").iloc[:steps]
        y = hist[s.value].to_numpy(dtype=float)
        X = np.column_stack(
            [np.ones(len(y))] + [hist[c].to_numpy(dtype=float) for c in cols]
        )
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        fc_r, se = _arima_forecast_one(resid, p, d, q, steps, method=method)
        Xf = np.column_stack(
            [np.ones(steps)] + [fut[c].to_numpy(dtype=float) for c in cols]
        )
        fc = Xf @ beta + fc_r
        h = np.arange(1, steps + 1)
        times = pd.Timestamp(hist[s.time].iloc[-1]) + pd.to_timedelta(
            h * freq_seconds, unit="s"
        )
        return pd.DataFrame(
            {
                s.series_id: hist[s.series_id].iloc[0],
                s.time: times,
                "fcst": fc,
                "fcst_lower": fc - Z95 * se,
                "fcst_upper": fc + Z95 * se,
            }
        )

    return (
        df.select(s.series_id, s.time, s.value, *cols)
        .groupBy(s.series_id)
        .cogroup(future_exog.select(s.series_id, "step", *cols).groupBy(s.series_id))
        .applyInPandas(fn, schema)
    )
