"""DuckDB oracle generators for the VAR(p) queries.

The Spark side (operators/var.py) fits Y_t = c + Σ A_i Y_{t-i} by OLS on
column z-scores, solving the normal equations with a pivot-free
Gauss-Jordan (kats/models/var.py:37-295 semantics, numerics chosen for
SQL replay).  These generators emit SQL that replays the identical
double-precision operations: the augmented [X'X | X'T] matrix as
list-lambda sums, the elimination as a recursive CTE over pivot steps,
the forecast as a recursive CTE in z-space, and the Mahalanobis scores
(kats/detectors/outlier.py:166) via a second Gauss-Jordan that inverts
the ridge-regularized residual covariance.

Generated for a fixed series count K (the testdata events table has 5
event types); the small-input guard mirrors the operator's
``len(wide) < 3p+5 -> empty`` rule so sparse scale factors where no hour
co-observes all K series return zero rows on both sides.
"""

from __future__ import annotations

Z95 = 1.959963984540054


def _reg(a: int, k: int) -> str:
    """Regressor a at target row t over 1-based z-lists Z[j]."""
    if a == 0:
        return "1.0"
    lag = (a - 1) // k + 1
    j = (a - 1) % k + 1
    return f"Z[{j}][t-{lag}]"


def _common_head(hourly_sql: str, p: int, k: int) -> str:
    m = 1 + p * k
    ac = m + k
    entries = []
    for r in range(m):
        for c in range(m):
            entries.append(
                f"list_sum(list_transform(range({p+1}, n+1), t -> {_reg(r, k)} * {_reg(c, k)}))"
            )
        for j in range(1, k + 1):
            entries.append(
                f"list_sum(list_transform(range({p+1}, n+1), t -> {_reg(r, k)} * Z[{j}][t]))"
            )
    m0 = "[" + ",\n   ".join(entries) + "]"

    def pred(j: int) -> str:
        terms = " + ".join(f"m[{a * ac + j + m}] * {_reg(a, k)}" for a in range(1, m))
        return f"(m[{j + m}] + {terms})"

    rz = "[" + ", ".join(
        f"list_transform(range({p+1}, n+1), t -> Z[{j}][t] - {pred(j)})"
        for j in range(1, k + 1)
    ) + "]"

    return f"""
WITH RECURSIVE h AS ({hourly_sql}),
ct AS (
  SELECT time FROM h GROUP BY time
  HAVING count(DISTINCT series_id) = (SELECT count(DISTINCT series_id) FROM h)
),
hh AS (SELECT h.* FROM h JOIN ct USING (time)),
stat AS (
  SELECT series_id, list(value ORDER BY time) AS vs FROM hh GROUP BY 1
),
zs AS (
  SELECT series_id,
    list_sum(vs)/len(vs) AS mu,
    sqrt(list_sum(list_transform(vs, v -> pow(v - list_sum(vs)/len(vs), 2)))/len(vs)) AS sd,
    list_transform(vs, v -> (v - list_sum(vs)/len(vs)) /
      sqrt(list_sum(list_transform(vs, q -> pow(q - list_sum(vs)/len(vs), 2)))/len(vs))) AS zl
  FROM stat
),
agg AS (
  SELECT list(series_id ORDER BY series_id) AS ids,
         list(mu ORDER BY series_id) AS mus,
         list(sd ORDER BY series_id) AS sds,
         list(zl ORDER BY series_id) AS Z,
         (SELECT count(*) FROM ct)::BIGINT AS n,
         (SELECT max(time) FROM ct) AS tmax,
         (SELECT list(time ORDER BY time) FROM ct) AS ts
  FROM zs
),
agg2 AS (
  SELECT * FROM agg WHERE n >= {3 * p + 5}
),
gj0 AS (
  SELECT ids, mus, sds, Z, n, tmax, ts, 0 AS p, {m0} AS m FROM agg2
),
gj AS (
  SELECT ids, mus, sds, Z, n, tmax, ts, p, m FROM gj0
  UNION ALL
  SELECT ids, mus, sds, Z, n, tmax, ts, p+1,
    list_transform(range(0, {m * ac}), i ->
      CASE WHEN i // {ac} = p THEN m[i+1] / m[p*{ac}+p+1]
      ELSE m[i+1] - m[(i//{ac})*{ac} + p + 1] * (m[p*{ac} + (i%{ac}) + 1] / m[p*{ac}+p+1]) END)
  FROM gj WHERE p < {m}
),
fit AS (
  SELECT ids, mus, sds, Z, n, tmax, ts, m,
         (n - {p})::BIGINT AS rows,
         {rz} AS rz
  FROM gj WHERE p = {m}
),
fit2 AS (
  SELECT *, greatest(rows - {m}, 1) AS dof FROM fit
)"""


def forecast_sql(
    hourly_sql: str,
    p: int = 2,
    k: int = 5,
    steps: int = 24,
    freq_seconds: int = 3600,
    dk_fmt: str = "%Y-%m-%d %H:%M:%S",
) -> str:
    m = 1 + p * k
    ac = m + k
    znew = (
        f"list_transform(range(1, {k + 1}), j ->\n"
        f"      m[j + {m}] + list_sum(list_transform(range(1, {m}), a -> "
        f"m[a*{ac} + j + {m}] * state[a])))"
    )
    init_state = (
        f"list_transform(range(1, {m}), a ->\n"
        f"      Z[((a - 1) % {k}) + 1][n - ((a - 1) // {k})])"
    )
    carry = f"state[1:{k * (p - 1)}]" if p > 1 else "[]::DOUBLE[]"
    return f"""{_common_head(hourly_sql, p, k)},
sig AS (
  SELECT *, list_transform(range(1, {k + 1}), j ->
    sds[j] * sqrt(list_sum(list_transform(rz[j], r -> r*r)) / dof)) AS sigma
  FROM fit2
),
fc AS (
  SELECT ids, mus, sds, tmax, m, sigma, 0 AS hh,
    {init_state} AS state,
    CAST(NULL AS DOUBLE[]) AS zf
  FROM sig
  UNION ALL
  SELECT ids, mus, sds, tmax, m, sigma, hh+1,
    list_concat({znew}, {carry}),
    {znew}
  FROM fc WHERE hh < {steps}
),
fcast AS (
  SELECT ids[j] AS series_id,
    tmax + to_seconds(hh * {freq_seconds}) AS time,
    mus[j] + sds[j] * zf[j] AS fcst,
    mus[j] + sds[j] * zf[j] - {Z95} * sigma[j] * sqrt(hh) AS fcst_lower,
    mus[j] + sds[j] * zf[j] + {Z95} * sigma[j] * sqrt(hh) AS fcst_upper
  FROM fc, unnest(range(1, {k + 1})) AS u(j)
  WHERE hh >= 1
)
SELECT series_id, strftime(time, '{dk_fmt}') AS time,
  round(1e-9 + fcst, 6) AS fcst,
  round(1e-9 + fcst_lower, 6) AS fcst_lower,
  round(1e-9 + fcst_upper, 6) AS fcst_upper
FROM fcast
"""


def scores_sql(
    hourly_sql: str,
    p: int = 2,
    k: int = 5,
    dk_fmt: str = "%Y-%m-%d %H:%M:%S",
) -> str:
    k2 = 2 * k
    cov = "[" + ",\n   ".join(
        f"list_sum(list_transform(range(1, rows+1), i -> "
        f"(rz[{a}][i] - list_sum(rz[{a}])/rows) * (rz[{b}][i] - list_sum(rz[{b}])/rows)))"
        f" / (rows - 1){' + 1e-9' if a == b else ''}"
        for a in range(1, k + 1)
        for b in range(1, k + 1)
    ) + "]"
    covaug = "[" + ",\n   ".join(
        (f"cve[{(a - 1) * k + b}]" if b <= k else ("1.0" if (b - k) == a else "0.0"))
        for a in range(1, k + 1)
        for b in range(1, k2 + 1)
    ) + "]"
    return f"""{_common_head(hourly_sql, p, k)},
cov0 AS (
  SELECT ts, rz, rows, 0 AS q, {covaug} AS cm
  FROM (SELECT ts, rz, rows, {cov} AS cve FROM fit2)
),
cgj AS (
  SELECT ts, rz, rows, q, cm FROM cov0
  UNION ALL
  SELECT ts, rz, rows, q+1,
    list_transform(range(0, {k * k2}), i ->
      CASE WHEN i // {k2} = q THEN cm[i+1] / cm[q*{k2}+q+1]
      ELSE cm[i+1] - cm[(i//{k2})*{k2} + q + 1] * (cm[q*{k2} + (i%{k2}) + 1] / cm[q*{k2}+q+1]) END)
  FROM cgj WHERE q < {k}
),
dist AS (
  SELECT ts[i + {p}] AS time,
    sqrt(list_sum(list_transform(range(1, {k + 1}), a ->
      rz[a][i] * list_sum(list_transform(range(1, {k + 1}), b ->
        cm[(a-1)*{k2} + {k} + b] * rz[b][i])))))
    AS mahalanobis
  FROM cgj, unnest(range(1, rows + 1)) AS u(i)
  WHERE q = {k}
)
SELECT strftime(time, '{dk_fmt}') AS time,
  round(1e-9 + round(mahalanobis, 6), 6) AS mahalanobis
FROM dist
"""
