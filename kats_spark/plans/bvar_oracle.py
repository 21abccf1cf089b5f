"""DuckDB oracle generator for the Minnesota-prior Bayesian VAR query.

Round-12 promotion of ``bvar_forecast`` from rows-only: the whole fit is
closed-form linear algebra once the solves are deterministic, and r12
moved ``models/bvar.py`` onto the VAR-oracle numerics convention
(operators/var.py:28 ``_gauss_solve_multi`` — pivot-free Gauss-Jordan —
plus SEQUENTIAL-in-t accumulation of X'X / X'Y / the residual outer
products, matching DuckDB ``list_sum`` order where BLAS matmul's blocked
sums drift off the rounding lattice on raw-scale inputs).

Replayed pipeline (kats/models/bayesian_var.py:35-517 semantics):
linear-resample densification (the resample_linear oracle's
spine+interp SQL) -> co-observed wide rows -> OLS sigma via GJ ->
Minnesota prior diagonal (phi_0..phi_3 knobs, variance ratios) ->
kron-collapsed posterior solve (one (m*N) x (m*N+1) Gauss-Jordan
recursion) -> the VAR-style forecast recursion in RAW space with the
intercept-last regressor layout -> constant +-z95*sigma_ols bands.
"""

from __future__ import annotations

Z95 = 1.959963984540054


def _reg(a: int, k: int, n_reg: int) -> str:
    """Regressor a (0-based, intercept LAST at a = n_reg-1) at target
    row t over the 1-based per-series lists Y[j]."""
    if a == n_reg - 1:
        return "1.0"
    lag = a // k + 1
    j = a % k + 1
    return f"Y[{j}][t-{lag}]"


def forecast_sql(
    hourly_sql: str,
    p: int = 3,
    k: int = 5,
    steps: int = 24,
    freq_seconds: int = 3600,
    phi_0: float = 0.02,
    phi_1: float = 0.25,
    phi_2: float = 20.0,
    phi_3: float = 3.0,
    dk_fmt: str = "%Y-%m-%d %H:%M:%S",
) -> str:
    N = k * p + 1          # regressors per equation (intercept last)
    ac = N + k             # beta_ols augmented width
    big = k * N            # stacked posterior dimension
    bac = big + 1          # posterior augmented width

    def r(a: int) -> str:
        return _reg(a, k, N)

    # ---- beta_ols augmented matrix [X'X | X'Y], sequential in t ----
    m0 = []
    for rr in range(N):
        for cc in range(N):
            m0.append(
                f"list_sum(list_transform(range({p+1}, n+1), t -> {r(rr)} * {r(cc)}))"
            )
        for j in range(1, k + 1):
            m0.append(
                f"list_sum(list_transform(range({p+1}, n+1), t -> {r(rr)} * Y[{j}][t]))"
            )
    m0_sql = "[" + ",\n   ".join(m0) + "]"

    def beta(a: int, j: int) -> str:
        """beta_ols[a, j] from the solved augmented list (1-based)."""
        return f"m[{a * ac + N + j + 1}]"

    # residual lists per series: rz[j][ti] = Y[j][t] - X_t @ beta[:, j]
    rz = "[" + ", ".join(
        f"list_transform(range({p+1}, n+1), t -> Y[{j}][t] - ("
        + " + ".join(f"{beta(a, j - 1)} * {r(a)}" for a in range(N))
        + "))"
        for j in range(1, k + 1)
    ) + "]"

    # sigma_ols flat k x k (sequential in t), then GJ-inverse via [sigma | I]
    sig0 = "[" + ", ".join(
        f"list_sum(list_transform(range(1, rows+1), t -> rz[{i}][t] * rz[{j}][t])) / dof"
        for i in range(1, k + 1)
        for j in range(1, k + 1)
    ) + "]"
    # k x 2k row-major augmented [sigma | I] for the GJ inverse
    inv0 = "[" + ", ".join(
        ", ".join(
            [f"sg[{i * k + j + 1}]" for j in range(k)]
            + [("1.0" if i == jj else "0.0") for jj in range(k)]
        )
        for i in range(k)
    ) + "]"

    # ---- Minnesota prior diagonal (python-evaluated literals x ratios) ----
    prior_entries = []
    for i in range(k):          # equation i
        for l in range(1, p + 1):
            for j in range(k):
                if i == j:
                    prior_entries.append(repr(phi_0 / l**phi_3))
                else:
                    lit = phi_0 * (phi_1 / l**phi_3)
                    prior_entries.append(f"{lit!r} * (var[{j+1}] / var[{i+1}])")
        prior_entries.append(repr(phi_0 * phi_2))  # intercept
    prior_sql = "[" + ", ".join(prior_entries) + "]"

    # ---- stacked posterior augmented matrix, row = i*N + a ----
    # P[row, col] = inv_sigma[i, i2] * S[a, b] (+ 1/v[row] on the diag);
    # rhs[row] = mu_prior[row]/v[row] + sum_j inv_sigma[i, j] * C[a, j].
    # S[a, b] and C[a, j] come from the ORIGINAL (pre-elimination)
    # augmented matrix m0, carried as m00; inv_sigma from the solved si.
    post_rows = []
    for i in range(k):
        for a in range(N):
            row = i * N + a
            cols = []
            for i2 in range(k):
                for b in range(N):
                    term = f"si[{i * 2 * k + k + i2 + 1}] * m00[{a * ac + b + 1}]"
                    if i2 * N + b == row:
                        term = f"1.0 / vp[{row + 1}] + " + term
                    cols.append(term)
            ysum = " + ".join(
                f"si[{i * 2 * k + k + j + 1}] * m00[{a * ac + N + j + 1}]"
                for j in range(k)
            )
            rhs = f"({ysum})"
            if a == i:  # own lag-1: mu_prior = 1
                rhs = f"1.0 / vp[{row + 1}] + {rhs}"
            post_rows.append(", ".join(cols) + ", " + rhs)
    post_sql = "[" + ",\n   ".join(post_rows) + "]"

    def coef(a: int, j: int) -> str:
        """coef[a, j] = mu_post[j*N + a] = solved last column of row j*N+a."""
        return f"mp[{(j * N + a) * bac + big + 1}]"

    znew = (
        f"list_transform(range(1, {k + 1}), j ->\n"
        "      "
        + "("
        + " + ".join(f"state[{a + 1}] * cf[(j-1) * {N} + {a + 1}]" for a in range(N))
        + "))"
    )
    init_state = (
        "["
        + ", ".join(
            f"Y[{a % k + 1}][n - {a // k}]" for a in range(k * p)
        )
        + ", 1.0]"
    )
    # new state = [yh (k), old lag1..lag(p-1) (k*(p-1)), intercept 1]
    carry = f"list_concat(state[1:{k * (p - 1)}], [1.0])"

    return f"""
WITH RECURSIVE hseries AS ({hourly_sql}),
bounds AS (
  SELECT series_id, min(time) AS t0, max(time) AS t1 FROM hseries GROUP BY 1
),
spine AS (
  SELECT series_id, unnest(generate_series(t0, t1, INTERVAL {freq_seconds} SECONDS)) AS time
  FROM bounds
),
g AS (
  SELECT s.series_id, s.time, b.value AS obs, epoch(s.time)::DOUBLE AS t
  FROM spine s LEFT JOIN hseries b USING (series_id, time)
),
filled AS (
  SELECT series_id, time,
    coalesce(
      CASE WHEN obs IS NOT NULL THEN obs
           WHEN next_t = prev_t THEN prev_v
           ELSE prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t) END,
      prev_v, next_v) AS value
  FROM (
    SELECT *,
      last_value(obs IGNORE NULLS) OVER w_prev AS prev_v,
      first_value(obs IGNORE NULLS) OVER w_next AS next_v,
      last_value(CASE WHEN obs IS NOT NULL THEN t END IGNORE NULLS) OVER w_prev AS prev_t,
      first_value(CASE WHEN obs IS NOT NULL THEN t END IGNORE NULLS) OVER w_next AS next_t
    FROM g
    WINDOW
      w_prev AS (PARTITION BY series_id ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_next AS (PARTITION BY series_id ORDER BY time ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
  )
),
ct AS (
  SELECT time FROM filled GROUP BY time
  HAVING count(DISTINCT series_id) = (SELECT count(DISTINCT series_id) FROM filled)
),
co AS (SELECT f.* FROM filled f JOIN ct USING (time)),
stat AS (
  SELECT series_id, list(value ORDER BY time) AS vs FROM co GROUP BY 1
),
agg AS (
  SELECT list(series_id ORDER BY series_id) AS ids,
         list(vs ORDER BY series_id) AS Y,
         (SELECT count(*) FROM ct)::BIGINT AS n,
         (SELECT max(time) FROM ct) AS tmax
  FROM stat
),
agg2 AS (
  SELECT *, list_transform(Y, l ->
      list_sum(list_transform(l, v -> pow(v - list_sum(l)/len(l), 2))) / len(l)) AS var
  FROM agg WHERE n >= {k * p + p + 5}
),
gj0 AS (SELECT ids, Y, var, n, tmax, 0 AS pv, {m0_sql} AS m FROM agg2),
gj AS (
  SELECT ids, Y, var, n, tmax, pv, m FROM gj0
  UNION ALL
  SELECT ids, Y, var, n, tmax, pv+1,
    list_transform(range(0, {N * ac}), i ->
      CASE WHEN i // {ac} = pv THEN m[i+1] / m[pv*{ac}+pv+1]
      ELSE m[i+1] - m[(i//{ac})*{ac} + pv + 1] * (m[pv*{ac} + (i%{ac}) + 1] / m[pv*{ac}+pv+1]) END)
  FROM gj WHERE pv < {N}
),
fit AS (
  SELECT ids, Y, var, n, tmax, m, m00,
         (n - {p})::BIGINT AS rows,
         greatest(n - {k * p} - 1, 1) AS dof,
         {rz} AS rz
  FROM (
    SELECT g.ids, g.Y, g.var, g.n, g.tmax, g.m, g0.m AS m00
    FROM gj g JOIN gj0 g0 ON g.ids = g0.ids WHERE g.pv = {N}
  )
),
sig AS (SELECT *, {sig0} AS sg FROM fit),
sgj0 AS (SELECT *, 0 AS pv2, {inv0} AS si FROM sig),
sgj AS (
  SELECT ids, Y, var, n, tmax, m, m00, rows, dof, rz, sg, pv2, si FROM sgj0
  UNION ALL
  SELECT ids, Y, var, n, tmax, m, m00, rows, dof, rz, sg, pv2+1,
    list_transform(range(0, {k * 2 * k}), i ->
      CASE WHEN i // {2 * k} = pv2 THEN si[i+1] / si[pv2*{2 * k}+pv2+1]
      ELSE si[i+1] - si[(i//{2 * k})*{2 * k} + pv2 + 1] * (si[pv2*{2 * k} + (i%{2 * k}) + 1] / si[pv2*{2 * k}+pv2+1]) END)
  FROM sgj WHERE pv2 < {k}
),
prior AS (
  SELECT *, {prior_sql} AS vp FROM sgj WHERE pv2 = {k}
),
pgj0 AS (SELECT ids, Y, n, tmax, sg, 0 AS pv3, {post_sql} AS mp FROM prior),
pgj AS (
  SELECT ids, Y, n, tmax, sg, pv3, mp FROM pgj0
  UNION ALL
  SELECT ids, Y, n, tmax, sg, pv3+1,
    list_transform(range(0, {big * bac}), i ->
      CASE WHEN i // {bac} = pv3 THEN mp[i+1] / mp[pv3*{bac}+pv3+1]
      ELSE mp[i+1] - mp[(i//{bac})*{bac} + pv3 + 1] * (mp[pv3*{bac} + (i%{bac}) + 1] / mp[pv3*{bac}+pv3+1]) END)
  FROM pgj WHERE pv3 < {big}
),
cfit AS (
  SELECT ids, Y, n, tmax, sg,
    list_transform(range(0, {k * N}), x ->
      CASE {" ".join(f"WHEN x = {j * N + a} THEN {coef(a, j)}" for j in range(k) for a in range(N))} END) AS cf
  FROM pgj WHERE pv3 = {big}
),
fc AS (
  SELECT ids, tmax, sg, cf, Y, n, 0 AS hh,
    {init_state} AS state,
    CAST(NULL AS DOUBLE[]) AS yf
  FROM cfit
  UNION ALL
  SELECT ids, tmax, sg, cf, Y, n, hh+1,
    list_concat({znew}, {carry}),
    {znew}
  FROM fc WHERE hh < {steps}
),
fcast AS (
  SELECT ids[j] AS series_id,
    tmax + to_seconds(hh * {freq_seconds}) AS time,
    yf[j] AS fcst,
    yf[j] - {Z95} * sqrt(sg[(j-1)*{k} + j]) AS fcst_lower,
    yf[j] + {Z95} * sqrt(sg[(j-1)*{k} + j]) AS fcst_upper
  FROM fc, unnest(range(1, {k + 1})) AS u(j)
  WHERE hh >= 1
)
SELECT series_id, strftime(time, '{dk_fmt}') AS time,
  round(1e-9 + fcst, 6) AS fcst,
  round(1e-9 + fcst_lower, 6) AS fcst_lower,
  round(1e-9 + fcst_upper, 6) AS fcst_upper
FROM fcast
"""
