"""DuckDB oracle generator for the MinT-shrink reconciliation query.

Round-12 promotion of ``reconcile_mint`` from rows-only: the data-driven
W (shrunk residual covariance, Wickramasuriya 2019 / thm.py get_W
``mint_shrink``) is closed-form arithmetic end to end, and r12 moved
``operators/reconciliation.py`` onto deterministic numerics (centered-
sums OLS instead of polyfit's SVD; pivot-free Gauss-Jordan for the W
inverse and the GLS solve — operators/var.py:28 convention).

Replayed per series: block aggregation -> closed-form linear fits at
both levels -> residual matrix over full blocks -> sample covariance
(ddof=1) -> the shrinkage intensity lam = var(off-diag corr) /
sum(off-diag corr^2) with the exact numpy op order (cor[i][j] =
(cov[j][i]/sq[i])/sq[j]; off-diagonals flattened row-major) -> W =
lam*diag + (1-lam)*cov + eps*I -> GJ inverse (7x14) -> the two-level
S-structure collapse (S'WinvS and S'Winv reduce to 2-term sums because
S = [1'; I] products are exact 0/1 multiplies) -> GJ solve (6x13) ->
per-block GLS projection + coherent aggregate rows."""

from __future__ import annotations


def forecast_sql(
    hourly_sql: str,
    k: int = 6,
    steps: int = 24,
    freq_seconds: int = 3600,
    eps: float = 1e-5,
    dk_fmt: str = "%Y-%m-%d %H:%M:%S",
) -> str:
    kk = k + 1            # residual rows: aggregate + k base positions
    n_blocks = steps // k
    wac = 2 * kk          # W-inverse augmented width
    gac = k + kk          # GLS augmented width (M | S'Winv)

    # residual row r (1-based): r=1 aggregate, r=2..kk base position r-1
    def res(r: int, b: str) -> str:
        if r == 1:
            return f"ra[{b}]"
        return f"rb[({b} - 1) * {k} + {r - 1}]"

    # covariance flat kk x kk (ddof=1), means precomputed as rm list
    cov_entries = []
    for i in range(1, kk + 1):
        for j in range(1, kk + 1):
            cov_entries.append(
                f"list_sum(list_transform(range(1, nb + 1), b -> "
                f"({res(i, 'b')} - rm[{i}]) * ({res(j, 'b')} - rm[{j}]))) / (nb - 1)"
            )
    cov_sql = "[" + ",\n   ".join(cov_entries) + "]"

    def cv(i: int, j: int) -> str:  # 1-based
        return f"cv[{(i - 1) * kk + j}]"

    # off-diagonal correlations, row-major (numpy cor[mask] order),
    # with the exact op order (cov[j][i]/sq[i])/sq[j]
    off_terms = [
        f"(({cv(j, i)} / sq[{i}]) / sq[{j}])"
        for i in range(1, kk + 1)
        for j in range(1, kk + 1)
        if i != j
    ]
    n_off = len(off_terms)
    off_sql = "[" + ", ".join(off_terms) + "]"

    # W augmented [W | I] flat kk x 2kk
    w_entries = []
    for i in range(1, kk + 1):
        row = []
        for j in range(1, kk + 1):
            if i == j:
                row.append(
                    f"(lam * {cv(i, i)} + (1.0 - lam) * {cv(i, i)}) + {eps!r}"
                )
            else:
                row.append(f"(1.0 - lam) * {cv(i, j)}")
        row += ["1.0" if i - 1 == j else "0.0" for j in range(kk)]
        w_entries.append(", ".join(row))
    w_sql = "[" + ",\n   ".join(w_entries) + "]"

    def winv(i: int, j: int) -> str:  # 0-based into solved augmented wi
        return f"wi[{i * wac + kk + j + 1}]"

    # S-structure collapse: T1[i, a] = Winv[0, a] + Winv[i+1, a]
    # (i = 0..k-1 base coords, a = 0..kk-1); M[i, j] = T1[i,0] + T1[i,j+1]
    def t1(i: int, a: int) -> str:
        return f"({winv(0, a)} + {winv(i + 1, a)})"

    g_entries = []
    for i in range(k):
        row = []
        for j in range(k):
            row.append(f"({t1(i, 0)} + {t1(i, j + 1)})")
        for a in range(kk):
            row.append(t1(i, a))
        g_entries.append(", ".join(row))
    g_sql = "[" + ",\n   ".join(g_entries) + "]"

    def g(i: int, a: int) -> str:  # solved G[i, a], 0-based
        return f"gm[{i * gac + k + a + 1}]"

    # yhat for block blk (0-based): [agg_fc[blk+1], base_fc[blk*k+1 ..]]
    def yhat(a: int, blk: str) -> str:
        if a == 0:
            return f"(aa + ba * (nb - 1 + ({blk} + 1)))"
        return f"(ab + bb * (n - 1 + ({blk} * {k} + {a})))"

    recon = "[" + ", ".join(
        "("
        + " + ".join(f"{g(j, a)} * {yhat(a, 'blk')}" for a in range(kk))
        + ")"
        for j in range(k)
    ) + "]"

    return f"""
WITH RECURSIVE h AS ({hourly_sql}),
lst AS (
  SELECT series_id, list(value ORDER BY time) AS vs,
         count(*)::BIGINT AS n, max(time) AS tmax
  FROM h GROUP BY 1
),
sized AS (
  SELECT *, (n // {k}) * {k} AS n_full, ((n // {k}))::BIGINT AS nb
  FROM lst WHERE (n // {k}) * {k} >= {3 * k}
),
fits AS (
  SELECT *,
    list_transform(range(1, nb + 1), b ->
      {" + ".join(f"vs[(b - 1) * {k} + {j}]" for j in range(1, k + 1))}) AS agg,
    (n - 1) / 2.0 AS tmb,
    (nb - 1) / 2.0 AS tma
  FROM sized
),
ols AS (
  SELECT *,
    list_sum(list_transform(range(1, n + 1), t -> ((t - 1) - tmb) * vs[t]))
      / list_sum(list_transform(range(1, n + 1), t -> ((t - 1) - tmb) * ((t - 1) - tmb))) AS bb,
    list_sum(list_transform(range(1, nb + 1), t -> ((t - 1) - tma) * agg[t]))
      / list_sum(list_transform(range(1, nb + 1), t -> ((t - 1) - tma) * ((t - 1) - tma))) AS ba
  FROM fits
),
ols2 AS (
  SELECT *,
    list_sum(vs) / n - bb * tmb AS ab,
    list_sum(agg) / nb - ba * tma AS aa
  FROM ols
),
resid AS (
  SELECT *,
    list_transform(range(1, n + 1), t -> vs[t] - (ab + bb * (t - 1))) AS rb,
    list_transform(range(1, nb + 1), t -> agg[t] - (aa + ba * (t - 1))) AS ra
  FROM ols2
),
rmeans AS (
  SELECT *,
    list_transform(range(1, {kk + 1}), r -> CASE
      {" ".join(f"WHEN r = {r} THEN list_sum(list_transform(range(1, nb + 1), b -> {res(r, 'b')})) / nb" for r in range(1, kk + 1))}
    END) AS rm
  FROM resid
),
covm AS (SELECT *, {cov_sql} AS cv FROM rmeans),
shrink0 AS (
  SELECT *, list_transform(range(1, {kk + 1}), i -> sqrt(cv[(i - 1) * {kk} + i])) AS sq
  FROM covm
),
shrink1 AS (SELECT *, {off_sql} AS off FROM shrink0),
shrink AS (
  SELECT *,
    least(1.0, greatest(0.0,
      CASE WHEN list_sum(list_transform(off, o -> o * o)) > 0
           THEN (list_sum(list_transform(off, o ->
                   (o - list_sum(off) / {n_off}) * (o - list_sum(off) / {n_off}))) / {n_off})
                / list_sum(list_transform(off, o -> o * o))
           ELSE 0.0 END)) AS lam
  FROM shrink1
),
wgj0 AS (SELECT *, 0 AS pv, {w_sql} AS wi FROM shrink),
wgj AS (
  SELECT series_id, n, nb, tmax, ab, bb, aa, ba, pv, wi FROM wgj0
  UNION ALL
  SELECT series_id, n, nb, tmax, ab, bb, aa, ba, pv + 1,
    list_transform(range(0, {kk * wac}), i ->
      CASE WHEN i // {wac} = pv THEN wi[i+1] / wi[pv*{wac}+pv+1]
      ELSE wi[i+1] - wi[(i//{wac})*{wac} + pv + 1] * (wi[pv*{wac} + (i%{wac}) + 1] / wi[pv*{wac}+pv+1]) END)
  FROM wgj WHERE pv < {kk}
),
ggj0 AS (SELECT *, 0 AS pv2, {g_sql} AS gm FROM wgj WHERE pv = {kk}),
ggj AS (
  SELECT series_id, n, nb, tmax, ab, bb, aa, ba, pv2, gm FROM ggj0
  UNION ALL
  SELECT series_id, n, nb, tmax, ab, bb, aa, ba, pv2 + 1,
    list_transform(range(0, {k * gac}), i ->
      CASE WHEN i // {gac} = pv2 THEN gm[i+1] / gm[pv2*{gac}+pv2+1]
      ELSE gm[i+1] - gm[(i//{gac})*{gac} + pv2 + 1] * (gm[pv2*{gac} + (i%{gac}) + 1] / gm[pv2*{gac}+pv2+1]) END)
  FROM ggj WHERE pv2 < {k}
),
blocks AS (
  SELECT g.*, u.blk, {recon} AS rec
  FROM ggj g, unnest(range(0, {n_blocks})) AS u(blk)
  WHERE g.pv2 = {k}
),
rows_out AS (
  SELECT series_id, 'base' AS level,
    tmax + to_seconds((blk * {k} + j) * {freq_seconds}) AS time,
    rec[j] AS fcst
  FROM blocks, unnest(range(1, {k + 1})) AS u2(j)
  UNION ALL
  SELECT series_id, 'agg' AS level,
    tmax + to_seconds((blk * {k} + 1) * {freq_seconds}) AS time,
    {" + ".join(f"rec[{j}]" for j in range(1, k + 1))} AS fcst
  FROM blocks
)
SELECT series_id, level, strftime(time, '{dk_fmt}') AS time,
  round(1e-9 + fcst, 6) AS fcst
FROM rows_out
"""
