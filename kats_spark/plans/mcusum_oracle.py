"""DuckDB oracle generator for the multivariate-CUSUM query.

Round-12 promotion of ``multi_cusum`` from rows-only: with
``operators/cusum.py`` moved onto the pivot-free Gauss-Jordan
covariance inverse (r12, the bvar/mint numerics convention), the whole
kernel is deterministic arithmetic: the iterative joint-mean
changepoint (cusum_detection.py:870-930 semantics — si =
Mahalanobis(x, mu0) - Mahalanobis(x, mu1) under the pooled covariance,
cp = clamp(first-argmin(cumsum(si))), midpoint start) unrolls to
``max_iter`` fixed rounds because convergence is idempotent (once
nxt == cp every later round is a no-op, so unconditional unrolling
lands on the loop's exact fixed point and stable == (cp_N == cp_{N-1})),
the two-segment Gaussian LRT is closed-form quadratic sums, and the
chi-square tail uses the closed form Q(3, x) = e^{-x}(1 + x + x^2/2)
(dof = k+1 = 6 on the 5-series events table) — equal to the operator's
series/continued-fraction evaluation to ~1e-15, far inside the 6dp
lattice, with the threshold gate rewritten through the monotone
equivalence llr > ppf(1-t)  <=>  p_value < t."""

from __future__ import annotations


def multi_cusum_sql(
    hourly_sql: str,
    k: int = 5,
    max_iter: int = 10,
    threshold: float = 0.01,
    freq_seconds: int = 3600,
    shift_ts: str = "2024-01-20 00:00:00",
    shift: float = 25.0,
    dk_fmt: str = "%Y-%m-%d %H:%M:%S",
) -> str:
    kk = 2 * k  # GJ augmented width

    def inv(i: int, j: int) -> str:  # 0-based into solved ci
        return f"ci[{i * kk + k + j + 1}]"

    def quad(mu: str) -> str:
        """25-term quadratic form at row i against mean list ``mu``."""
        return " + ".join(
            f"(Y[{j + 1}][i] - {mu}[{j + 1}]) * {inv(j, l)} * (Y[{l + 1}][i] - {mu}[{l + 1}])"
            for j in range(k)
            for l in range(k)
        )

    def quad_t(mu: str, var: str = "t") -> str:
        return quad(mu).replace("[i]", f"[{var}]")

    rounds = []
    for r in range(max_iter):
        rounds.append(f"""
it{r}a AS MATERIALIZED (
  SELECT series_ids, Y, ts, n, ci, cp{r},
    list_transform(range(1, {k + 1}), j ->
      list_sum(Y[j][1:cp{r} + 1]) / (cp{r} + 1)) AS m0,
    list_transform(range(1, {k + 1}), j ->
      list_sum(Y[j][cp{r} + 2:n]) / (n - cp{r} - 1)) AS m1
  FROM it{r}
),
it{r}b AS MATERIALIZED (
  SELECT *, list_transform(range(1, n + 1), i ->
    ({quad("m0")}) - ({quad("m1")})) AS si
  FROM it{r}a
),
it{r}c AS MATERIALIZED (
  SELECT *, list_transform(range(1, n + 1), t -> list_sum(si[1:t])) AS cums
  FROM it{r}b
),
it{r + 1} AS MATERIALIZED (
  SELECT series_ids, Y, ts, n, ci,
    cp{r} AS cp_prev,
    greatest(1, least(
      list_position(cums, list_min(cums)) - 1, n - 2))::BIGINT AS cp{r + 1}
  FROM it{r}c
),""")
    iter_sql = "".join(rounds)

    aug_rows = ",\n     ".join(
        ", ".join(
            [f"list_sum(list_transform(range(1, n + 1), t -> "
             f"(Y[{i + 1}][t] - mu[{i + 1}]) * (Y[{j + 1}][t] - mu[{j + 1}]))) / (n - 1)"
             for j in range(k)]
            + [("1.0" if i == j else "0.0") for j in range(k)]
        )
        for i in range(k)
    )
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
      prev_v, next_v)
    + CASE WHEN time >= TIMESTAMP '{shift_ts}' THEN {shift!r} ELSE 0.0 END AS value
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
  SELECT list(series_id ORDER BY series_id) AS series_ids,
         list(vs ORDER BY series_id) AS Y,
         (SELECT list(time ORDER BY time) FROM ct) AS ts,
         (SELECT count(*) FROM ct)::BIGINT AS n
  FROM stat
),
agg2 AS (SELECT * FROM agg WHERE n >= 10),
mus AS (
  SELECT *, list_transform(Y, l -> list_sum(l) / n) AS mu FROM agg2
),
covgj0 AS (
  SELECT series_ids, Y, ts, n, mu, 0 AS pv,
    [{aug_rows}] AS m
  FROM mus
),
covgj AS (
  SELECT series_ids, Y, ts, n, mu, pv, m FROM covgj0
  UNION ALL
  SELECT series_ids, Y, ts, n, mu, pv + 1,
    list_transform(range(0, {k * kk}), i ->
      CASE WHEN i // {kk} = pv THEN m[i+1] / m[pv*{kk}+pv+1]
      ELSE m[i+1] - m[(i//{kk})*{kk} + pv + 1] * (m[pv*{kk} + (i%{kk}) + 1] / m[pv*{kk}+pv+1]) END)
  FROM covgj WHERE pv < {k}
),
it0 AS MATERIALIZED (
  SELECT series_ids, Y, ts, n, m AS ci, (n // 2)::BIGINT AS cp0
  FROM covgj WHERE pv = {k}
),{iter_sql}
final AS MATERIALIZED (
  SELECT series_ids, Y, ts, n, ci,
    cp{max_iter} AS cp, (cp{max_iter} = cp_prev) AS stable,
    list_transform(range(1, {k + 1}), j -> list_sum(Y[j]) / n) AS mt,
    list_transform(range(1, {k + 1}), j ->
      list_sum(Y[j][1:cp{max_iter} + 1]) / (cp{max_iter} + 1)) AS m0,
    list_transform(range(1, {k + 1}), j ->
      list_sum(Y[j][cp{max_iter} + 2:n]) / (n - cp{max_iter} - 1)) AS m1
  FROM it{max_iter}
),
llr AS (
  SELECT *,
    (list_sum(list_transform(range(1, cp + 2), t -> {quad_t("mt")}))
     - list_sum(list_transform(range(1, cp + 2), t -> {quad_t("m0")})))
    + (list_sum(list_transform(range(cp + 2, n + 1), t -> {quad_t("mt")}))
     - list_sum(list_transform(range(cp + 2, n + 1), t -> {quad_t("m1")}))) AS llr
  FROM final
),
pv AS (
  SELECT *,
    exp(-llr / 2.0) * (1.0 + llr / 2.0 + (llr / 2.0) * (llr / 2.0) / 2.0) AS p_value
  FROM llr
)
SELECT 'all' AS group_id,
  strftime(ts[cp + 1], '{dk_fmt}') AS time,
  cp::INT AS cp_index,
  round(1e-9 + llr, 6) AS llr,
  round(1e-9 + p_value, 6) AS p_value,
  stable,
  round(1e-9 + sqrt({" + ".join(f"(m1[{j + 1}] - m0[{j + 1}]) * (m1[{j + 1}] - m0[{j + 1}])" for j in range(k))}), 6) AS delta_l2
FROM pv
WHERE p_value < {threshold!r}
"""
