"""DuckDB replay of the loess-STL kernel (stl.py:115 ``stl_decompose_np``).

Round-12 promotion (VERDICT r11 item #4): ``stl_decompose`` /
``stl_strength`` / ``outlier_detect_stl`` move from rows-only to full
value-hash oracles.  The kernel is deterministic numpy — two unrolled
inner iterations (non-robust default), each a fixed pipeline of
  cycle-subseries loess (span ns, deg 1, one extrapolated point each
  side) -> MA(period) x2 -> MA(3) -> loess(nl) low-pass -> seasonal ->
  loess(nt) trend on the deseasonalized series
— so the whole decomposition is expressible as a straight-line CTE
chain: positions unnested to rows, each loess evaluation a staged
scalar computation (window bounds -> tricube weights -> the closed-form
degree-1 weighted fit), lists re-gathered between passes.  No recursion
needed: the non-robust paper default is exactly ni=2 / no=0
(stl.py:137-138), which this module unrolls.

Every arithmetic step mirrors ``_loess`` (stl.py:47) to the operation:
clamped q-nearest contiguous windows, lam = max window distance with the
q > n correction, tricube (1-u^3)^3, degree-1 fit centered at the eval
point with the |det| <= 1e-12 weighted-mean fallback.  Float-sum
ordering differs from numpy's einsum/cumsum at ~1e-13; the shared
round(1e-9 + x, 6) lattice guard absorbs it, same as every other
numeric oracle in this repo.
"""

from __future__ import annotations


def _loess_stage_sql(
    out_cte: str,
    src_cte: str,
    list_col: str,
    m_expr: str,
    q: int,
    x_expr: str,
    fitted_col: str,
    carry: str,
) -> str:
    """Three chained CTEs computing one loess evaluation per row of
    ``src_cte``: fitted value of degree-1 tricube-weighted regression of
    ``list_col`` (1-indexed DuckDB list, observed at grid 0..m-1) at
    position ``x_expr``.  ``carry`` = comma-led columns to thread
    through.  Emits CTE text ending with a comma."""
    a, b = f"{out_cte}_a", f"{out_cte}_b"
    return f"""
{a} AS MATERIALIZED (
  SELECT series_id{carry}, {list_col} AS yl, {x_expr} AS x,
    least({q}, {m_expr}) AS qq, {m_expr} AS m
  FROM {src_cte}
),
{b} AS MATERIALIZED (
  SELECT *,
    greatest(0, least(m - qq, ceil(x - (qq - 1) / 2.0)::BIGINT)) AS lo,
    greatest(
      list_max(list_transform(generate_series(0, qq - 1),
                              k -> abs((greatest(0, least(m - qq, ceil(x - (qq - 1) / 2.0)::BIGINT)) + k)::DOUBLE - x)))
      * (CASE WHEN {q} > m THEN {q}::DOUBLE / m ELSE 1.0 END),
      1e-12) AS lam
  FROM {a}
),
{out_cte} AS MATERIALIZED (
  SELECT series_id{carry},
    CASE WHEN abs(sw * stt - st * st) > 1e-12
         THEN (stt * sy - st * sty) / (sw * stt - st * st)
         ELSE sy / (CASE WHEN sw = 0 THEN 1.0 ELSE sw END)
    END AS {fitted_col}
  FROM (
    SELECT *,
      list_sum(list_transform(generate_series(0, qq - 1), k ->
        pow(1.0 - pow(least(abs((lo + k)::DOUBLE - x) / lam, 1.0), 3), 3))) AS sw,
      list_sum(list_transform(generate_series(0, qq - 1), k ->
        pow(1.0 - pow(least(abs((lo + k)::DOUBLE - x) / lam, 1.0), 3), 3)
        * ((lo + k)::DOUBLE - x))) AS st,
      list_sum(list_transform(generate_series(0, qq - 1), k ->
        pow(1.0 - pow(least(abs((lo + k)::DOUBLE - x) / lam, 1.0), 3), 3)
        * ((lo + k)::DOUBLE - x) * ((lo + k)::DOUBLE - x))) AS stt,
      list_sum(list_transform(generate_series(0, qq - 1), k ->
        pow(1.0 - pow(least(abs((lo + k)::DOUBLE - x) / lam, 1.0), 3), 3)
        * yl[lo + k + 1])) AS sy,
      list_sum(list_transform(generate_series(0, qq - 1), k ->
        pow(1.0 - pow(least(abs((lo + k)::DOUBLE - x) / lam, 1.0), 3), 3)
        * ((lo + k)::DOUBLE - x) * yl[lo + k + 1])) AS sty
    FROM {b}
  )
),"""


def _iteration_sql(it: int, period: int, ns: int, nt: int, nl: int) -> str:
    """One STL inner iteration: from d{it} (series_id, n, d = detrended
    list) to t{it}l (series_id, n, t = trend list) and s{it}l
    (series_id, n, s = seasonal list)."""
    p = period
    # cycle-subseries positions: extended array of n + 2*period slots,
    # phase = (pos-1) % period, eval point = cycle - 1 (one extrapolated
    # position each side of the m_p observed cycles)
    sub = f"""
cpos{it} AS MATERIALIZED (
  SELECT d.series_id, d.n, g.pos,
    ((g.pos - 1) % {p})::BIGINT AS ph,
    ((g.pos - 1) // {p})::BIGINT AS cyc,
    ((d.n - 1 - ((g.pos - 1) % {p})) // {p} + 1)::BIGINT AS msub,
    list_transform(generate_series(0, ((d.n - 1 - ((g.pos - 1) % {p})) // {p})::BIGINT),
                   j -> d.d[((g.pos - 1) % {p}) + 1 + {p} * j]) AS sub
  FROM d{it} d, LATERAL (SELECT unnest(generate_series(1, d.n + {2 * p})) AS pos) g
),"""
    sub += _loess_stage_sql(
        f"cfit{it}", f"cpos{it}", "sub", "msub", ns,
        "(cyc - 1)::DOUBLE", "cv", ", n, pos",
    )
    # low-pass: MA(period) twice then MA(3) over the extended C, then
    # loess(nl) on the resulting n-length grid
    sub += f"""
cl{it} AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, list(cv ORDER BY pos) AS c
  FROM cfit{it} GROUP BY series_id
),
ma1_{it} AS MATERIALIZED (
  SELECT series_id, n, pos,
    sum(cv) OVER (PARTITION BY series_id ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND {p - 1} FOLLOWING) / {p}.0 AS v
  FROM cfit{it} QUALIFY pos <= n + {p + 1}
),
ma2_{it} AS MATERIALIZED (
  SELECT series_id, n, pos,
    sum(v) OVER (PARTITION BY series_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {p - 1} FOLLOWING) / {p}.0 AS v
  FROM ma1_{it} QUALIFY pos <= n + 2
),
ma3_{it} AS MATERIALIZED (
  SELECT series_id, n, pos,
    sum(v) OVER (PARTITION BY series_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) / 3.0 AS v
  FROM ma2_{it} QUALIFY pos <= n
),
ma3l_{it} AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, list(v ORDER BY pos) AS l3
  FROM ma3_{it} GROUP BY series_id
),
lpos{it} AS MATERIALIZED (
  SELECT m.series_id, m.n, m.pos, l.l3
  FROM ma3_{it} m JOIN ma3l_{it} l USING (series_id)
),"""
    sub += _loess_stage_sql(
        f"lfit{it}", f"lpos{it}", "l3", "n", nl,
        "(pos - 1)::DOUBLE", "lp", ", n, pos",
    )
    # seasonal = C[pos + period] - lowpass; trend = loess(nt) of y - S
    sub += f"""
s{it} AS MATERIALIZED (
  SELECT f.series_id, f.n, f.pos, c.c[f.pos + {p}] - f.lp AS sv
  FROM lfit{it} f JOIN cl{it} c USING (series_id)
),
s{it}l AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, list(sv ORDER BY pos) AS s
  FROM s{it} GROUP BY series_id
),
tpos{it} AS MATERIALIZED (
  SELECT s.series_id, s.n, s.pos,
    list_transform(generate_series(1, s.n), i -> l.vs[i] - sl.s[i]) AS ys
  FROM s{it} s JOIN lst l USING (series_id) JOIN s{it}l sl USING (series_id)
),"""
    sub += _loess_stage_sql(
        f"tfit{it}", f"tpos{it}", "ys", "n", nt,
        "(pos - 1)::DOUBLE", "tv", ", n, pos",
    )
    sub += f"""
t{it}l AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, list(tv ORDER BY pos) AS t
  FROM tfit{it} GROUP BY series_id
),"""
    return sub


def stl_core_sql(hourly_sql: str, period: int = 24, seasonal: int = 7) -> str:
    """CTE chain ending in ``stl`` = (series_id, n, vs, ts, t, s) — the
    final trend/seasonal lists after the two non-robust inner iterations,
    with defaults matching stl_decompose_np: ns = seasonal (odd-forced),
    nt = next odd >= 1.5 p / (1 - 1.5/ns), nl = next odd > p."""
    ns = max(3, seasonal if seasonal % 2 == 1 else seasonal + 1)

    def next_odd(x: float) -> int:
        import math

        v = int(math.ceil(x))
        return v if v % 2 == 1 else v + 1

    nt = next_odd(1.5 * period / (1 - 1.5 / ns))
    nl = next_odd(period + 1)
    sql = f"""
WITH RECURSIVE h AS ({hourly_sql}),
lst AS MATERIALIZED (
  SELECT series_id, count(*)::BIGINT AS n,
         list(value ORDER BY time) AS vs,
         list(time ORDER BY time) AS ts
  FROM h GROUP BY 1 HAVING count(*) >= {2 * period}
),
d1 AS MATERIALIZED (SELECT series_id, n, vs AS d FROM lst),"""
    sql += _iteration_sql(1, period, ns, nt, nl)
    sql += """
d2 AS MATERIALIZED (
  SELECT l.series_id, l.n,
         list_transform(generate_series(1, l.n), i -> l.vs[i] - t.t[i]) AS d
  FROM lst l JOIN t1l t USING (series_id)
),"""
    sql += _iteration_sql(2, period, ns, nt, nl)
    sql += """
stl AS MATERIALIZED (
  SELECT l.series_id, l.n, l.vs, l.ts, t.t, s.s
  FROM lst l JOIN t2l t USING (series_id) JOIN s2l s USING (series_id)
)"""
    return sql


def stl_decompose_sql(hourly_sql: str, dk_fmt: str, period: int = 24) -> str:
    """(series_id, time, value, trend, seasonal, residual) — the
    q_stl_decompose oracle."""
    return stl_core_sql(hourly_sql, period) + f"""
SELECT series_id, strftime(ts[i.i], '{dk_fmt}') AS time,
  round(1e-9 + vs[i.i], 6) AS value,
  round(1e-9 + t[i.i], 6) AS trend,
  round(1e-9 + s[i.i], 6) AS seasonal,
  round(1e-9 + (vs[i.i] - t[i.i] - s[i.i]), 6) AS residual
FROM stl, LATERAL (SELECT unnest(generate_series(1, n)) AS i) i
"""


def stl_strength_sql(hourly_sql: str, period: int = 24) -> str:
    """(series_id, trend_strength, seasonality_strength) — the
    q_stl_strength oracle (stl.py:476 convention: 1 - var(resid)/var(x +
    resid) with sample variance)."""
    return stl_core_sql(hourly_sql, period) + """
, pts AS (
  SELECT series_id, t[i.i] AS tv, s[i.i] AS sv,
         vs[i.i] - t[i.i] - s[i.i] AS rv
  FROM stl, LATERAL (SELECT unnest(generate_series(1, n)) AS i) i
)
SELECT series_id,
  round(1e-9 + (1 - var_samp(rv) / var_samp(tv + rv)), 6) AS trend_strength,
  round(1e-9 + (1 - var_samp(rv) / var_samp(sv + rv)), 6) AS seasonality_strength
FROM pts GROUP BY series_id
"""


def std_global_sql(
    hourly_sql: str,
    dk_fmt: str,
    period: int = 24,
    steps: int = 12,
    p: int = 4,
    freq_seconds: int = 3600,
) -> str:
    """(series_id, time, fcst) — the q_std_global oracle
    (kats/models/globalmodel/stdmodel.py:29 STDGlobalModel, base='dms',
    additive): the loess-STL core above deseasonalizes each series
    (value - seasonal), ONE pooled direct-multi-step linear model fits
    the z-scored panel (the proven global_dms replay, re-sourced from
    the deseason lists), and the horizon is re-seasonalized by the tiled
    LAST period of each series' seasonal component
    (stdmodel.py:219-234 / stlf.py:348 convention)."""
    m = p + 1
    H = steps
    ac = m + H

    def reg(a: int) -> str:
        return "1.0" if a == 0 else f"Z[t-{a-1}]"

    ent = []
    for r in range(m):
        for c in range(m):
            ent.append(
                f"coalesce(list_sum(list_transform(range({p}, n-{H}+1), t -> {reg(r)} * {reg(c)})), 0.0)"
            )
        for h in range(1, H + 1):
            ent.append(
                f"coalesce(list_sum(list_transform(range({p}, n-{H}+1), t -> {reg(r)} * Z[t+{h}])), 0.0)"
            )
    ent_list = "[" + ",\n    ".join(ent) + "]"
    head = f"s.m[{m} + u.h]" + "".join(
        f" + s.m[{(i + 1) * ac + m} + u.h] * z.Z[z.n - {i}]" for i in range(p)
    )
    return stl_core_sql(hourly_sql, period) + f"""
, dstat AS (
  -- deseasonalized panel + the tiled last-period seasonal lookup
  SELECT series_id, n, ts[n] AS tmax, s,
    list_transform(range(1, n + 1), i -> vs[i] - s[i]) AS vs
  FROM stl
),
zs AS (
  SELECT series_id, tmax, n, s,
    list_sum(vs)/len(vs) AS mu,
    CASE WHEN sqrt(list_sum(list_transform(vs, v -> v*v))/len(vs)
                   - (list_sum(vs)/len(vs)) * (list_sum(vs)/len(vs))) > 0
         THEN sqrt(list_sum(list_transform(vs, v -> v*v))/len(vs)
                   - (list_sum(vs)/len(vs)) * (list_sum(vs)/len(vs)))
         ELSE 1.0 END AS sd
  FROM dstat
),
zl AS (
  SELECT z.series_id, z.tmax, z.n, z.mu, z.sd, z.s,
    list_transform(d.vs, v -> (v - z.mu) / z.sd) AS Z
  FROM zs z JOIN dstat d USING (series_id)
),
sums AS (
  SELECT {ent_list} AS e FROM zl WHERE n - {H} >= {p}
),
pooled AS (
  SELECT list(sv ORDER BY i) AS m0 FROM (
    SELECT i, sum(v) AS sv FROM (
      SELECT unnest(e) AS v, unnest(range(1, {m * ac} + 1)) AS i FROM sums
    ) GROUP BY i
  )
  HAVING count(*) = {m * ac}
),
dgj AS (
  SELECT 0 AS pv, m0 AS m FROM pooled
  UNION ALL
  SELECT pv+1,
    list_transform(range(0, {m * ac}), i ->
      CASE WHEN i // {ac} = pv THEN m[i+1] / m[pv*{ac}+pv+1]
      ELSE m[i+1] - m[(i//{ac})*{ac} + pv + 1] * (m[pv*{ac} + (i%{ac}) + 1] / m[pv*{ac}+pv+1]) END)
  FROM dgj WHERE pv < {m}
),
solved AS (SELECT m FROM dgj WHERE pv = {m})
SELECT z.series_id,
  strftime(z.tmax + to_seconds(u.h * {freq_seconds}), '{dk_fmt}') AS time,
  round(1e-9 + (z.mu + z.sd * ({head}))
    + coalesce(z.s[z.n - {period} + ((((z.n - 1 + u.h) % {period}) - ((z.n - {period}) % {period}) + {period}) % {period}) + 1], 0.0), 6) AS fcst
FROM zl z CROSS JOIN solved s,
     (SELECT unnest(generate_series(1, {H})) AS h) u
WHERE z.n >= {p}
"""


def outlier_stl_sql(hourly_sql: str, dk_fmt: str, period: int = 24) -> str:
    """(series_id, time, value, residual, is_outlier) — the
    q_outlier_detect_stl oracle: IQR rule (outlier.py:25, iqr_mult=3) on
    loess-STL residuals; quantile_cont == Spark's interpolated
    F.percentile."""
    return stl_core_sql(hourly_sql, period) + f"""
, pts AS (
  SELECT series_id, ts[i.i] AS time, vs[i.i] AS value,
         vs[i.i] - t[i.i] - s[i.i] AS rv
  FROM stl, LATERAL (SELECT unnest(generate_series(1, n)) AS i) i
),
bounds AS (
  SELECT series_id,
    quantile_cont(rv, 0.25) AS q1, quantile_cont(rv, 0.75) AS q3
  FROM pts WHERE rv IS NOT NULL GROUP BY 1
)
SELECT p.series_id, strftime(p.time, '{dk_fmt}') AS time,
  round(1e-9 + p.value, 6) AS value,
  round(1e-9 + p.rv, 6) AS residual,
  CASE WHEN p.rv IS NOT NULL AND
            (p.rv < b.q1 - 3.0 * (b.q3 - b.q1) OR p.rv > b.q3 + 3.0 * (b.q3 - b.q1))
       THEN 1 ELSE 0 END AS is_outlier
FROM pts p JOIN bounds b USING (series_id)
"""
