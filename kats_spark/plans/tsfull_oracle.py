"""DuckDB replay of the COMPLETE TsFeatures wide row (``tsfeatures_full``).

Round-13 promotion (VERDICT r12 item #2): ``tsfeatures_full`` was the
last rows-only query whose constituent groups were all individually
oracled; the blocker was the seasonalities group's data-dependent STL
period (reference surface kats/tsfeatures/tsfeatures.py:490,557 — the
transform -> _transform_1d dispatch; period selection in
kats/detectors/seasonality.py:265-330 FFTDetector).  This module replays
the period SELECTION itself in SQL — the FFT peak pipeline on diff(y):
naive-DFT periodogram -> dB amplitudes -> median + 6*MAD cut ->
local-maxima scan with the 0.1 dB vertical-distance threshold ->
pairwise near-integer frequency-ratio harmonic removal ->
trunc(min(1/f)) with the 7 fallback — and then runs a PERIOD-GENERIC
variant of the r12 loess-STL CTE chain (plans/stl_oracle.py) in which
every period-derived literal (period, nt, nl, the MA window widths) is
a per-series COLUMN, so no data-dependent literal is baked in.

The three remaining never-individually-oracled fragments land here too:

- ``acfpacf_sql``: full ACF to lag ``period`` on y / diff(y) / diff2(y)
  plus the statsmodels 'ywadjusted' PACF — per-order Yule-Walker solves
  on the UNBIASED autocovariances (tsfeatures.py:711
  ``_pacf_yw_adjusted``), each Toeplitz system replayed by the
  pivot-free Gauss-Jordan recursive CTE (the r12 kernel_oracle ARCH-LM
  pattern, here with a per-row order k so one recursion serves all 11
  solves).
- ``nowcasting_sql``: the ROC/MOM/MA/LAG window means and the pandas
  ``ewm(span, min_periods, adjust=True)`` MACD / sign / diff means via
  the proven normalized (1-a)^i weighted-sum expansion (the q_macd
  oracle convention); np.nan_to_num(...)=0 on empty means via coalesce.
- ``seasonalities_sql``: the FFT-selected period + the generic loess-STL
  chain (stl_decompose_np — tsfeatures.py:838-856 ``_seasonalities``),
  np.round half-even via roundbankers, np.quantile == quantile_cont.
- ``smstl_features_sql``: the statsmodels-EXACT STL kernel
  (stl.py:351 ``stl_statsmodels_np``, the Fortran stl port with the
  default 5 non-robust inner iterations) unrolled iteration-for-
  iteration, feeding the stl_features block math (strengths, LOO
  spikiness, first-period peak/trough — tsfeatures.py:591
  ``stl_features_block``).

``tsfull_sql`` composes these with the already-proven expression-layer,
kernel-group, and time-group replays into the 69-column frame.
"""

from __future__ import annotations


# ---------------------------------------------------------------------
# acfpacf_features (ref_kernel_features._acfpacf, tsfeatures.py:807-836)
# ---------------------------------------------------------------------

def acfpacf_sql(hourly_sql: str, period: int = 24, nlag: int = 6) -> str:
    """(series_id, y_acf1..seas_pacf1) — 11 doubles, NaN-gated exactly
    like the kernel: len < 10 or len < period or constant series -> all
    NULL (pandas reads NULL as NaN, matching the kernel's NaN row)."""
    p = period

    def centered(src: str, nn: str) -> str:
        return (
            f"list_transform({src}, v -> v - list_sum({src}) / {nn})"
        )

    return f"""
WITH RECURSIVE h AS ({hourly_sql}),
lst AS MATERIALIZED (
  SELECT series_id, count(*)::BIGINT AS n, list(value ORDER BY time) AS vs
  FROM h GROUP BY 1
),
elig AS MATERIALIZED (
  SELECT series_id, n, vs
  FROM lst
  WHERE n >= 10 AND n >= {p} AND len(list_distinct(vs)) > 1
),
-- centered arrays: y, d1 = diff(y), d2 = diff(d1), each minus its OWN mean
cent AS MATERIALIZED (
  SELECT series_id, n,
    list_transform(vs, v -> v - list_sum(vs) / n) AS e0,
    n - 1 AS n1,
    list_transform(range(1, n), i -> vs[i+1] - vs[i]) AS d1r,
    n - 2 AS n2,
    list_transform(range(1, n - 1), i -> (vs[i+2] - vs[i+1]) - (vs[i+1] - vs[i])) AS d2r
  FROM elig
),
cent2 AS MATERIALIZED (
  SELECT series_id, n, e0, n1, n2,
    list_transform(d1r, v -> v - list_sum(d1r) / n1) AS e1,
    list_transform(d2r, v -> v - list_sum(d2r) / n2) AS e2
  FROM cent
),
-- biased ACF (denominator sum e^2) to the needed lags
acfs AS MATERIALIZED (
  SELECT series_id, n, n1, n2, e0, e1, e2,
    list_transform(range(1, {p} + 1), k ->
      list_sum(list_transform(range(1, n - k + 1), t -> e0[t] * e0[t+k]))
      / list_sum(list_transform(e0, v -> v*v))) AS a0,
    list_transform(range(1, 6), k ->
      list_sum(list_transform(range(1, n1 - k + 1), t -> e1[t] * e1[t+k]))
      / list_sum(list_transform(e1, v -> v*v))) AS a1,
    list_transform(range(1, 6), k ->
      list_sum(list_transform(range(1, n2 - k + 1), t -> e2[t] * e2[t+k]))
      / list_sum(list_transform(e2, v -> v*v))) AS a2
  FROM cent2
),
-- UNBIASED autocovariances gamma_k = sum e_t e_(t+k) / (len - k)
gams AS MATERIALIZED (
  SELECT series_id,
    list_transform(range(0, {p} + 1), k ->
      list_sum(list_transform(range(1, n - k + 1), t -> e0[t] * e0[t+k]))
      / (n - k)) AS g0,
    list_transform(range(0, 6), k ->
      list_sum(list_transform(range(1, n1 - k + 1), t -> e1[t] * e1[t+k]))
      / (n1 - k)) AS g1,
    list_transform(range(0, 6), k ->
      list_sum(list_transform(range(1, n2 - k + 1), t -> e2[t] * e2[t+k]))
      / (n2 - k)) AS g2
  FROM cent2
),
-- one (series, array, order-k) row per Yule-Walker system; the
-- augmented k x (k+1) Toeplitz matrix [R | gamma_1..k] flattened
yw0 AS MATERIALIZED (
  SELECT series_id, arr, k, k + 1 AS w, 0 AS pv,
    flatten(list_transform(range(0, k), r ->
      list_append(
        list_transform(range(0, k), c -> g[abs(r - c) + 1]),
        g[r + 2]))) AS m
  FROM (
    SELECT series_id, 0 AS arr, g0 AS g FROM gams
    UNION ALL SELECT series_id, 1, g1 FROM gams
    UNION ALL SELECT series_id, 2, g2 FROM gams
  ), (SELECT unnest([1, 2, 3, 4, 5, {p}]) AS k)
  WHERE arr = 0 OR k <= 5
),
-- pivot-free Gauss-Jordan, one pivot per recursion step, per-row order
ywgj AS (
  SELECT series_id, arr, k, w, pv, m FROM yw0
  UNION ALL
  SELECT series_id, arr, k, w, pv + 1,
    list_transform(range(0, k * w), i ->
      CASE WHEN i // w = pv THEN m[i+1] / m[pv*w + pv + 1]
      ELSE m[i+1] - m[(i//w)*w + pv + 1] * (m[pv*w + (i%w) + 1] / m[pv*w + pv + 1])
      END)
  FROM ywgj WHERE pv < k
),
phis AS MATERIALIZED (
  SELECT series_id, arr, k, m[(k-1)*w + k + 1] AS phi
  FROM ywgj WHERE pv = k
),
pacf AS MATERIALIZED (
  SELECT series_id,
    sum(CASE WHEN arr = 0 AND k <= 5 THEN phi * phi END) AS y_pacf5,
    sum(CASE WHEN arr = 1 THEN phi * phi END) AS d1_pacf5,
    sum(CASE WHEN arr = 2 THEN phi * phi END) AS d2_pacf5,
    max(CASE WHEN arr = 0 AND k = {p} THEN phi END) AS seas_pacf1
  FROM phis GROUP BY 1
)
SELECT l.series_id,
  round(1e-9 + a.a0[1], 6) AS y_acf1,
  round(1e-9 + (a.a0[1]*a.a0[1] + a.a0[2]*a.a0[2] + a.a0[3]*a.a0[3]
                + a.a0[4]*a.a0[4] + a.a0[5]*a.a0[5]), 6) AS y_acf5,
  round(1e-9 + a.a1[1], 6) AS diff1y_acf1,
  round(1e-9 + (a.a1[1]*a.a1[1] + a.a1[2]*a.a1[2] + a.a1[3]*a.a1[3]
                + a.a1[4]*a.a1[4] + a.a1[5]*a.a1[5]), 6) AS diff1y_acf5,
  round(1e-9 + a.a2[1], 6) AS diff2y_acf1,
  round(1e-9 + (a.a2[1]*a.a2[1] + a.a2[2]*a.a2[2] + a.a2[3]*a.a2[3]
                + a.a2[4]*a.a2[4] + a.a2[5]*a.a2[5]), 6) AS diff2y_acf5,
  round(1e-9 + pc.y_pacf5, 6) AS y_pacf5,
  round(1e-9 + pc.d1_pacf5, 6) AS diff1y_pacf5,
  round(1e-9 + pc.d2_pacf5, 6) AS diff2y_pacf5,
  round(1e-9 + a.a0[{p}], 6) AS seas_acf1,
  round(1e-9 + pc.seas_pacf1, 6) AS seas_pacf1
FROM lst l
LEFT JOIN acfs a USING (series_id)
LEFT JOIN pacf pc USING (series_id)
"""


# ---------------------------------------------------------------------
# nowcasting (ref_kernel_features._nowcasting, tsfeatures.py:864-906)
# ---------------------------------------------------------------------

def nowcasting_sql(
    hourly_sql: str, window: int = 5, n_fast: int = 12, n_slow: int = 21
) -> str:
    """(series_id, nowcast_roc/ma/mom/lag/macd/macdsign/macddiff) —
    pandas ewm(span, adjust=True) as the normalized (1-a)^i weighted
    sum; min_periods masks outputs only.  The sign/diff chain runs on
    the macd sequence starting at its first valid index (leading-NaN
    semantics of ignore_na=False)."""
    w = window
    af = f"(1.0 - 2.0/{n_fast + 1}.0)"
    as_ = f"(1.0 - 2.0/{n_slow + 1}.0)"
    a9 = "(1.0 - 2.0/10.0)"
    mp = n_slow - 1  # min_periods for the two base EWMAs (1-based t >= mp)
    return f"""
WITH h AS ({hourly_sql}),
lst AS MATERIALIZED (
  SELECT series_id, count(*)::BIGINT AS n, list(value ORDER BY time) AS vs
  FROM h GROUP BY 1
),
winf AS MATERIALIZED (
  SELECT series_id, n, vs,
    CASE WHEN n > {w} THEN
      list_sum(list_transform(range(1, n - {w} + 2), t ->
        CASE WHEN vs[t] = 0 THEN 0.0
             ELSE (vs[t + {w - 1}] - vs[t]) / vs[t] END))
      / (n - {w - 1})
    END AS nowcast_roc,
    CASE WHEN n > {w} THEN
      list_sum(list_transform(range(1, n - {w} + 1), t -> vs[t + {w}] - vs[t]))
      / (n - {w})
    END AS nowcast_mom,
    CASE WHEN n > {w} THEN
      list_sum(list_transform(range(1, n - {w} + 2), t ->
        list_sum(vs[t:t + {w - 1}]) / {w}.0))
      / (n - {w - 1})
    END AS nowcast_ma,
    CASE WHEN n > {w} THEN list_sum(vs[1:n - {w}]) / (n - {w}) END AS nowcast_lag
  FROM lst
),
-- macd_t for 1-based t >= {mp}: adjusted EWMA(span 12) - EWMA(span 21)
macd AS MATERIALIZED (
  SELECT series_id, n, vs, nowcast_roc, nowcast_mom, nowcast_ma, nowcast_lag,
    list_transform(range({mp}, n + 1), t ->
      list_sum(list_transform(vs[1:t], (x, j) -> x * pow({af}, t - j))) /
      list_sum(list_transform(vs[1:t], (x, j) -> pow({af}, t - j)))
      -
      list_sum(list_transform(vs[1:t], (x, j) -> x * pow({as_}, t - j))) /
      list_sum(list_transform(vs[1:t], (x, j) -> pow({as_}, t - j)))) AS ms
  FROM winf
),
-- sign_j over the valid macd subsequence (j 1-based in ms); valid from
-- the 8th macd value (min_periods=8)
sgn AS MATERIALIZED (
  SELECT series_id, n, nowcast_roc, nowcast_mom, nowcast_ma, nowcast_lag, ms,
    CASE WHEN n >= 27 THEN
      list_transform(range(8, len(ms) + 1), j ->
        list_sum(list_transform(ms[1:j], (x, i) -> x * pow({a9}, j - i))) /
        list_sum(list_transform(ms[1:j], (x, i) -> pow({a9}, j - i))))
    END AS sg
  FROM macd
)
SELECT series_id,
  round(1e-9 + nowcast_roc, 6) AS nowcast_roc,
  round(1e-9 + nowcast_ma, 6) AS nowcast_ma,
  round(1e-9 + nowcast_mom, 6) AS nowcast_mom,
  round(1e-9 + nowcast_lag, 6) AS nowcast_lag,
  round(1e-9 + coalesce(list_sum(ms) / len(ms), 0.0), 6) AS nowcast_macd,
  round(1e-9 + CASE WHEN sg IS NOT NULL
        THEN coalesce(list_sum(sg) / len(sg), 0.0) END, 6) AS nowcast_macdsign,
  round(1e-9 + CASE WHEN sg IS NOT NULL
        THEN coalesce(
          list_sum(list_transform(range(1, len(sg) + 1), j -> ms[j + 7] - sg[j]))
          / len(sg), 0.0) END, 6) AS nowcast_macddiff
FROM sgn
"""

# ---------------------------------------------------------------------
# seasonalities (ref_kernel_features._seasonalities, tsfeatures.py:838)
# FFT period selection + PERIOD-GENERIC loess-STL chain
# ---------------------------------------------------------------------

def _loess_stage_g(
    out_cte: str,
    src_cte: str,
    list_col: str,
    m_expr: str,
    q_expr: str,
    x_expr: str,
    fitted_col: str,
    carry: str,
) -> str:
    """The stl_oracle loess stage with the span ``q_expr`` as an SQL
    EXPRESSION (a per-series column like ``nt``/``nl`` or a literal) —
    the generalization that makes the chain period-generic.  Same
    staged arithmetic as stl.py:47 ``_loess``: clamped q-nearest
    window, lam = max window distance with the q > m correction,
    tricube, closed-form degree-1 fit with the |det| <= 1e-12
    weighted-mean fallback."""
    a, b = f"{out_cte}_a", f"{out_cte}_b"
    return f"""
{a} AS MATERIALIZED (
  SELECT series_id{carry}, {list_col} AS yl, {x_expr} AS x,
    least({q_expr}, {m_expr}) AS qq, {m_expr} AS m, {q_expr} AS qspan
  FROM {src_cte}
),
{b} AS MATERIALIZED (
  SELECT *,
    greatest(0, least(m - qq, ceil(x - (qq - 1) / 2.0)::BIGINT)) AS lo,
    greatest(
      list_max(list_transform(generate_series(0, qq - 1),
                              k -> abs((greatest(0, least(m - qq, ceil(x - (qq - 1) / 2.0)::BIGINT)) + k)::DOUBLE - x)))
      * (CASE WHEN qspan > m THEN qspan::DOUBLE / m ELSE 1.0 END),
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


_GCARRY = ", n, p, nt, nl"


def _g_iteration_sql(it: int) -> str:
    """One period-GENERIC STL inner iteration (ns = 7 literal; period /
    nt / nl per-series columns): d{it} (series_id, n, p, nt, nl, d list)
    -> t{it}l / s{it}l.  Mirrors stl_oracle._iteration_sql with the
    window-frame MAs replaced by list-slice MAs (variable width p)."""
    sub = f"""
cpos{it} AS MATERIALIZED (
  SELECT d.series_id, d.n, d.p, d.nt, d.nl, g.pos,
    ((g.pos - 1) % d.p)::BIGINT AS ph,
    ((g.pos - 1) // d.p)::BIGINT AS cyc,
    ((d.n - 1 - ((g.pos - 1) % d.p)) // d.p + 1)::BIGINT AS msub,
    list_transform(generate_series(0, ((d.n - 1 - ((g.pos - 1) % d.p)) // d.p)::BIGINT),
                   j -> d.d[((g.pos - 1) % d.p) + 1 + d.p * j]) AS sub
  FROM d{it} d, LATERAL (SELECT unnest(generate_series(1, d.n + 2 * d.p)) AS pos) g
),"""
    sub += _loess_stage_g(
        f"cfit{it}", f"cpos{it}", "sub", "msub", "7",
        "(cyc - 1)::DOUBLE", "cv", _GCARRY + ", pos",
    )
    sub += f"""
cl{it} AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, any_value(p) AS p,
         any_value(nt) AS nt, any_value(nl) AS nl,
         list(cv ORDER BY pos) AS c
  FROM cfit{it} GROUP BY series_id
),
maa{it} AS MATERIALIZED (
  SELECT series_id, n, p, nt, nl,
    list_transform(range(1, n + p + 2), i -> list_sum(c[i:i + p - 1]) / p) AS m1
  FROM cl{it}
),
mab{it} AS MATERIALIZED (
  SELECT series_id, n, p, nt, nl,
    list_transform(range(1, n + 3), i -> list_sum(m1[i:i + p - 1]) / p) AS m2
  FROM maa{it}
),
mac{it} AS MATERIALIZED (
  SELECT series_id, n, p, nt, nl,
    list_transform(range(1, n + 1), i -> list_sum(m2[i:i + 2]) / 3.0) AS l3
  FROM mab{it}
),
lpos{it} AS MATERIALIZED (
  SELECT m.series_id, m.n, m.p, m.nt, m.nl, g.pos, m.l3
  FROM mac{it} m, LATERAL (SELECT unnest(generate_series(1, m.n)) AS pos) g
),"""
    sub += _loess_stage_g(
        f"lfit{it}", f"lpos{it}", "l3", "n", "nl",
        "(pos - 1)::DOUBLE", "lp", _GCARRY + ", pos",
    )
    sub += f"""
s{it} AS MATERIALIZED (
  SELECT f.series_id, f.n, f.p, f.nt, f.nl, f.pos, c.c[f.pos + f.p] - f.lp AS sv
  FROM lfit{it} f JOIN cl{it} c USING (series_id)
),
s{it}l AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, any_value(p) AS p,
         any_value(nt) AS nt, any_value(nl) AS nl,
         list(sv ORDER BY pos) AS s
  FROM s{it} GROUP BY series_id
),
tpos{it} AS MATERIALIZED (
  SELECT s.series_id, s.n, s.p, s.nt, s.nl, s.pos,
    list_transform(generate_series(1, s.n), i -> l.vs[i] - sl.s[i]) AS ys
  FROM s{it} s JOIN prm l USING (series_id) JOIN s{it}l sl USING (series_id)
),"""
    sub += _loess_stage_g(
        f"tfit{it}", f"tpos{it}", "ys", "n", "nt",
        "(pos - 1)::DOUBLE", "tv", _GCARRY + ", pos",
    )
    sub += f"""
t{it}l AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, any_value(p) AS p,
         any_value(nt) AS nt, any_value(nl) AS nl,
         list(tv ORDER BY pos) AS t
  FROM tfit{it} GROUP BY series_id
),"""
    return sub


def period_select_ctes(src_cte: str = "lstf") -> str:
    """FFT period-selection CTE chain from ``{src_cte}`` (series_id, n,
    vs) to ``per`` (series_id, p) — the FFTDetector peak pipeline
    (kats/detectors/seasonality.py:265-330) on diff(vs), replayed
    operation-for-operation: naive-DFT periodogram over the positive
    fftfreq bins k = 1..(N-1)//2, 10*log10 dB, median + 6*MAD-of-above-
    median cut, strict local maxima with the 0.1 dB vertical-distance
    threshold, harmonic removal (ANY earlier peak with near-integer
    frequency ratio removes a later one — rm[i1] is never consulted),
    and period = trunc(min over survivors of 1/(k*(1/N))) with the 7
    fallback.  Emits CTE text ending with a comma."""
    return f"""
dif AS MATERIALIZED (
  SELECT series_id, n, n - 1 AS nd,
    list_transform(range(1, n), i -> vs[i+1] - vs[i]) AS dv
  FROM {src_cte}
),
amp AS MATERIALIZED (
  SELECT series_id, nd,
    list_transform(range(1, (nd - 1) // 2 + 1), k ->
      pow(list_sum(list_transform(range(1, nd + 1), t ->
            dv[t] * cos(2.0 * pi() * k * (t - 1) / nd))), 2)
      + pow(list_sum(list_transform(range(1, nd + 1), t ->
            dv[t] * sin(2.0 * pi() * k * (t - 1) / nd))), 2)) AS psd
  FROM dif
),
dbs AS MATERIALIZED (
  SELECT series_id, nd,
    list_transform(psd, v ->
      CASE WHEN v > 0 THEN 10.0 * log10(v) ELSE -1e308 END) AS ampl
  FROM amp
),
cutc AS MATERIALIZED (
  SELECT series_id, nd, ampl,
    CASE WHEN len(list_filter(ampl, v -> v > 0)) > 0
         THEN list_aggregate(list_filter(ampl, v -> v > 0), 'median')
    END AS med
  FROM dbs
),
cutc2 AS MATERIALIZED (
  SELECT series_id, nd, ampl, med,
    med + 6.0 * (
      list_sum(list_transform(abv, v ->
        abs(v - list_sum(abv) / len(abv)))) / len(abv)) AS cut
  FROM (
    SELECT *, list_filter(ampl, v -> v > 0 AND v > med) AS abv FROM cutc
  )
),
pk AS MATERIALIZED (
  SELECT series_id, nd,
    list_filter(range(2, len(ampl)), i ->
      ampl[i] > ampl[i-1] AND ampl[i] > ampl[i+1]
      AND least(ampl[i] - ampl[i-1], ampl[i] - ampl[i+1]) >= 0.1
      AND ampl[i] > cut) AS pkpos
  FROM cutc2
),
surv AS MATERIALIZED (
  SELECT series_id, nd,
    list_filter(pkpos, (k2, j2) ->
      len(list_filter(pkpos[1:j2-1], k1 ->
        fmod((k2 * (1.0 / nd)) / (k1 * (1.0 / nd)), 1.0) < 0.01
        OR fmod((k2 * (1.0 / nd)) / (k1 * (1.0 / nd)), 1.0) > 0.99)) = 0) AS sv
  FROM pk
),
per AS MATERIALIZED (
  SELECT series_id,
    CASE WHEN len(sv) > 0 THEN
      trunc(list_min(list_transform(sv, k -> 1.0 / (k * (1.0 / nd)))))::BIGINT
    ELSE 7 END AS p
  FROM surv
),"""


def seasonalities_sql(hourly_sql: str) -> str:
    """(series_id, seasonal_period, trend_mag, seasonality_mag,
    residual_std) — the seasonalities kernel group: FFT-selected period
    (CTE chain above), then stl_decompose_np (ns=7, nt/nl from the
    period, 2 non-robust inner iterations) via the generic chain;
    np.round half-even == roundbankers, np.quantile == quantile_cont,
    np.std population convention."""
    sql = f"""
WITH RECURSIVE h AS ({hourly_sql}),
lstf AS MATERIALIZED (
  SELECT series_id, count(*)::BIGINT AS n, list(value ORDER BY time) AS vs
  FROM h GROUP BY 1
),"""
    sql += period_select_ctes("lstf")
    sql += """
prm AS MATERIALIZED (
  SELECT series_id, n, vs, p,
    CASE WHEN cv % 2 = 1 THEN cv ELSE cv + 1 END AS nt,
    CASE WHEN lv % 2 = 1 THEN lv ELSE lv + 1 END AS nl
  FROM (
    SELECT l.series_id, l.n, l.vs, pr.p,
      ceil((1.5 * pr.p) / (1.0 - 1.5 / 7.0))::BIGINT AS cv,
      (pr.p + 1)::BIGINT AS lv
    FROM lstf l JOIN per pr USING (series_id)
    WHERE pr.p >= 2 AND l.n >= 2 * pr.p
  )
),
d1 AS MATERIALIZED (SELECT series_id, n, p, nt, nl, vs AS d FROM prm),"""
    sql += _g_iteration_sql(1)
    sql += """
d2 AS MATERIALIZED (
  SELECT l.series_id, l.n, l.p, l.nt, l.nl,
         list_transform(generate_series(1, l.n), i -> l.vs[i] - t.t[i]) AS d
  FROM prm l JOIN t1l t USING (series_id)
),"""
    sql += _g_iteration_sql(2)
    sql += """
fin AS MATERIALIZED (
  SELECT l.series_id, l.n, l.p, t.t AS tl, s.s AS sl,
    list_transform(generate_series(1, l.n), i -> l.vs[i] - t.t[i] - s.s[i]) AS rl
  FROM prm l JOIN t2l t USING (series_id) JOIN s2l s USING (series_id)
),
qs AS MATERIALIZED (
  SELECT series_id, quantile_cont(sv, 0.95) AS q95, quantile_cont(sv, 0.05) AS q05
  FROM (SELECT series_id, unnest(sl) AS sv FROM fin) GROUP BY 1
),
feats AS MATERIALIZED (
  SELECT f.series_id,
    f.p::DOUBLE AS seasonal_period,
    CASE WHEN den > 0 THEN num / den END AS trend_mag,
    roundbankers(q.q95 - q.q05, 0) AS seasonality_mag,
    sqrt(list_sum(list_transform(rl, r ->
      (r - list_sum(rl) / n) * (r - list_sum(rl) / n))) / n) AS residual_std
  FROM (
    SELECT *,
      list_sum(list_transform(range(1, n + 1), i ->
        (i - 1)::DOUBLE * (tl[i] - tl[1]))) AS num,
      list_sum(list_transform(range(1, n + 1), i ->
        (i - 1)::DOUBLE * (i - 1)::DOUBLE)) AS den
    FROM fin
  ) f JOIN qs q USING (series_id)
)
SELECT l.series_id,
  round(1e-9 + f.seasonal_period, 6) AS seasonal_period,
  round(1e-9 + f.trend_mag, 6) AS trend_mag,
  round(1e-9 + f.seasonality_mag, 6) AS seasonality_mag,
  round(1e-9 + f.residual_std, 6) AS residual_std
FROM lstf l LEFT JOIN feats f USING (series_id)
"""
    return sql

# ---------------------------------------------------------------------
# statsmodels-EXACT STL (stl.py:351 stl_statsmodels_np) + stl_features
# block math (tsfeatures.py:591 stl_features_block) — period 24 literal
# ---------------------------------------------------------------------

def _smest_stage(
    out_cte: str,
    src_cte: str,
    list_col: str,
    m_expr: str,
    span: int,
    fitted_col: str,
    carry: str,
) -> str:
    """One Fortran ``stlest`` evaluation per row of ``src_cte`` (which
    must carry xs DOUBLE, wl/wr BIGINT window bounds): tricube weights
    with the 0.999h/0.001h cutoffs and the span > n halfwidth
    correction, normalize-then-measure degree-1 correction gated on
    sqrt(c) > 0.001*(n-1), weighted sum.  Mirrors stl.py:457 ``_sm_est``
    operation-for-operation (aa computed from NORMALIZED weights, like
    the kernel's ``a = (w * j).sum()`` after ``w /= a``)."""
    a, b, c = f"{out_cte}_a", f"{out_cte}_b", f"{out_cte}_c"

    def W(h: str = "h") -> str:
        return (
            f"(CASE WHEN abs(j - xs) > 0.999 * {h} THEN 0.0 "
            f"WHEN abs(j - xs) <= 0.001 * {h} THEN 1.0 "
            f"ELSE pow(1.0 - pow(abs(j - xs) / {h}, 3), 3) END)"
        )

    return f"""
{a} AS MATERIALIZED (
  SELECT series_id{carry}, {list_col} AS yl, {m_expr} AS m, xs, wl, wr,
    greatest(xs - wl, wr - xs)
      + (CASE WHEN {span} > {m_expr} THEN (({span} - {m_expr}) // 2)::DOUBLE
              ELSE 0.0 END) AS h
  FROM {src_cte}
),
{b} AS MATERIALIZED (
  SELECT *,
    list_sum(list_transform(generate_series(wl, wr), j -> {W()})) AS sw
  FROM {a}
),
{c} AS MATERIALIZED (
  SELECT *,
    list_sum(list_transform(generate_series(wl, wr), j -> ({W()} / sw) * j)) AS aa
  FROM {b}
),
{out_cte} AS MATERIALIZED (
  SELECT series_id{carry},
    CASE WHEN sw > 0 THEN
      CASE WHEN h > 0 AND sqrt(cc) > 0.001 * (m - 1) THEN
        list_sum(list_transform(generate_series(wl, wr), j ->
          ({W()} / sw) * (((xs - aa) / cc) * (j - aa) + 1.0) * yl[j]))
      ELSE
        list_sum(list_transform(generate_series(wl, wr), j ->
          ({W()} / sw) * yl[j]))
      END
    END AS {fitted_col}
  FROM (
    SELECT *,
      list_sum(list_transform(generate_series(wl, wr), j ->
        ({W()} / sw) * (j - aa) * (j - aa))) AS cc
    FROM {c}
  )
),"""


def _grid_windows(span: int, n: str = "n", pos: str = "pos") -> "tuple[str, str]":
    """(wl, wr) CASE expressions for the jump=1 ``_sm_loess`` window of
    an ODD ``span`` over an ``n``-point grid evaluated at integer
    ``pos`` (stl.py:500-530 stless window bookkeeping); ``n``/``pos``
    are SQL symbols so callers can qualify them."""
    nsh = (span + 1) // 2
    wl = (f"CASE WHEN {span} >= {n} THEN 1 "
          f"WHEN {pos} <= {nsh} THEN 1 "
          f"WHEN {pos} >= {n} - {span} + {nsh} + 1 THEN {n} - {span} + 1 "
          f"ELSE {pos} - {nsh} + 1 END")
    wr = (f"CASE WHEN {span} >= {n} THEN {n} "
          f"WHEN {pos} <= {nsh} THEN {span} "
          f"WHEN {pos} >= {n} - {span} + {nsh} + 1 THEN {n} "
          f"ELSE {pos} - {nsh} + {span} END")
    return wl, wr


def _sm_iteration_sql(it: int, p: int, ns: int, nt: int, nl: int) -> str:
    """One statsmodels STL inner iteration: smd{it} (series_id, n, d
    list = y - T) -> smt{it} (trend list) / sms{it}l (seasonal list).
    Fortran flow: stlss cycle subseries (interior points via stless
    jump=1 windows, the two extrapolated points via explicit stlest
    windows) -> MA(p) x2 + MA(3) -> stless(nl) -> seasonal ->
    stless(nt) on the deseasonalized series."""
    nsh_s = (ns + 1) // 2
    sub = f"""
smcpos{it} AS MATERIALIZED (
  SELECT d.series_id, d.n, g.pos,
    ((g.pos - 1) % {p})::BIGINT AS ph,
    ((g.pos - 1) // {p})::BIGINT AS cyc,
    ((d.n - 1 - ((g.pos - 1) % {p})) // {p} + 1)::BIGINT AS msub,
    list_transform(generate_series(0, ((d.n - 1 - ((g.pos - 1) % {p})) // {p})::BIGINT),
                   j -> d.d[((g.pos - 1) % {p}) + 1 + {p} * j]) AS sub
  FROM smd{it} d, LATERAL (SELECT unnest(generate_series(1, d.n + {2 * p})) AS pos) g
),
smcw{it} AS MATERIALIZED (
  SELECT series_id, n, pos, msub, sub,
    CASE WHEN cyc = 0 THEN 0.0
         WHEN cyc = msub + 1 THEN (msub + 1)::DOUBLE
         ELSE cyc::DOUBLE END AS xs,
    CASE WHEN cyc = 0 THEN 1
         WHEN cyc = msub + 1 THEN greatest(1, msub - {ns} + 1)
         WHEN {ns} >= msub THEN 1
         WHEN cyc <= {nsh_s} THEN 1
         WHEN cyc >= msub - {ns} + {nsh_s} + 1 THEN msub - {ns} + 1
         ELSE cyc - {nsh_s} + 1 END AS wl,
    CASE WHEN cyc = 0 THEN least({ns}, msub)
         WHEN cyc = msub + 1 THEN msub
         WHEN {ns} >= msub THEN msub
         WHEN cyc <= {nsh_s} THEN {ns}
         WHEN cyc >= msub - {ns} + {nsh_s} + 1 THEN msub
         ELSE cyc - {nsh_s} + {ns} END AS wr
  FROM smcpos{it}
),"""
    sub += _smest_stage(
        f"smcfit{it}", f"smcw{it}", "sub", "msub", ns, "cv", ", n, pos",
    )
    wl25, wr25 = _grid_windows(nl, "m.n", "m.pos")
    wl47, wr47 = _grid_windows(nt, "s.n", "s.pos")
    sub += f"""
smcl{it} AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, list(cv ORDER BY pos) AS c
  FROM smcfit{it} GROUP BY series_id
),
smma1_{it} AS MATERIALIZED (
  SELECT series_id, n, pos,
    sum(cv) OVER (PARTITION BY series_id ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND {p - 1} FOLLOWING) / {p}.0 AS v
  FROM smcfit{it} QUALIFY pos <= n + {p + 1}
),
smma2_{it} AS MATERIALIZED (
  SELECT series_id, n, pos,
    sum(v) OVER (PARTITION BY series_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {p - 1} FOLLOWING) / {p}.0 AS v
  FROM smma1_{it} QUALIFY pos <= n + 2
),
smma3_{it} AS MATERIALIZED (
  SELECT series_id, n, pos,
    sum(v) OVER (PARTITION BY series_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) / 3.0 AS v
  FROM smma2_{it} QUALIFY pos <= n
),
smma3l_{it} AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, list(v ORDER BY pos) AS l3
  FROM smma3_{it} GROUP BY series_id
),
smlpos{it} AS MATERIALIZED (
  SELECT m.series_id, m.n, m.pos, l.l3,
    m.pos::DOUBLE AS xs, {wl25} AS wl, {wr25} AS wr
  FROM smma3_{it} m JOIN smma3l_{it} l USING (series_id)
),"""
    sub += _smest_stage(
        f"smlfit{it}", f"smlpos{it}", "l3", "n", nl, "lp", ", n, pos",
    )
    sub += f"""
sms{it} AS MATERIALIZED (
  SELECT f.series_id, f.n, f.pos, c.c[f.pos + {p}] - f.lp AS sv
  FROM smlfit{it} f JOIN smcl{it} c USING (series_id)
),
sms{it}l AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, list(sv ORDER BY pos) AS s
  FROM sms{it} GROUP BY series_id
),
smtpos{it} AS MATERIALIZED (
  SELECT s.series_id, s.n, s.pos,
    list_transform(generate_series(1, s.n), i -> l.vs[i] - sl.s[i]) AS ys,
    s.pos::DOUBLE AS xs, {wl47} AS wl, {wr47} AS wr
  FROM sms{it} s JOIN smlst l USING (series_id) JOIN sms{it}l sl USING (series_id)
),"""
    sub += _smest_stage(
        f"smtfit{it}", f"smtpos{it}", "ys", "n", nt, "tv", ", n, pos",
    )
    sub += f"""
smt{it}l AS MATERIALIZED (
  SELECT series_id, any_value(n) AS n, list(tv ORDER BY pos) AS t
  FROM smtfit{it} GROUP BY series_id
),"""
    return sub


def smstl_core_sql(hourly_sql: str, period: int = 24, seasonal: int = 7,
                   inner: int = 5) -> str:
    """CTE chain ending in ``smstl`` (series_id, n, vs, t, s) — the
    statsmodels-default non-robust fit: FIVE inner iterations, ns =
    seasonal odd-forced, nt = smallest odd >= 1.5p/(1-1.5/ns) (>= 3),
    nl = smallest odd >= p + 1."""
    import math

    ns = max(3, seasonal + ((seasonal % 2) == 0))
    nt = max(3, int(math.ceil(1.5 * period / (1 - 1.5 / ns))))
    nt += (nt % 2) == 0
    nl = max(3, period + 1)
    nl += (nl % 2) == 0
    sql = f"""
WITH RECURSIVE h AS ({hourly_sql}),
smlst AS MATERIALIZED (
  SELECT series_id, count(*)::BIGINT AS n,
         list(value ORDER BY time) AS vs,
         list(time ORDER BY time) AS ts
  FROM h GROUP BY 1 HAVING count(*) >= {2 * period}
),
smd1 AS MATERIALIZED (SELECT series_id, n, vs AS d FROM smlst),"""
    sql += _sm_iteration_sql(1, period, ns, nt, nl)
    for it in range(2, inner + 1):
        sql += f"""
smd{it} AS MATERIALIZED (
  SELECT l.series_id, l.n,
         list_transform(generate_series(1, l.n), i -> l.vs[i] - t.t[i]) AS d
  FROM smlst l JOIN smt{it - 1}l t USING (series_id)
),"""
        sql += _sm_iteration_sql(it, period, ns, nt, nl)
    sql += f"""
smstl AS MATERIALIZED (
  SELECT l.series_id, l.n, l.vs, t.t, s.s
  FROM smlst l JOIN smt{inner}l t USING (series_id)
       JOIN sms{inner}l s USING (series_id)
)"""
    return sql


def smstl_features_sql(hourly_sql: str, period: int = 24) -> str:
    """(series_id, trend_strength, seasonality_strength, spikiness,
    peak, trough) — the stl_features block on the statsmodels STL
    split: population-variance strength ratios (unclamped), the O(n)
    closed-form leave-one-out spikiness, first-period argmax/argmin
    with first-occurrence ties."""
    return smstl_core_sql(hourly_sql, period) + f"""
, smpts AS MATERIALIZED (
  SELECT series_id, n, i.i AS rn, s[i.i] AS sv, t[i.i] AS tv,
         vs[i.i] - t[i.i] - s[i.i] AS rv
  FROM smstl, LATERAL (SELECT unnest(generate_series(1, n)) AS i) i
),
smst AS MATERIALIZED (
  SELECT series_id, count(*)::DOUBLE AS nn,
         sum(rv) AS s1, sum(rv * rv) AS s2,
         var_pop(rv) AS vr,
         var_pop(tv + rv) AS vtr,
         var_pop(sv + rv) AS vsr
  FROM smpts GROUP BY 1
),
smspk AS MATERIALIZED (
  SELECT p.series_id, var_pop(
    (t.s2 - p.rv * p.rv) / (t.nn - 1)
    - ((t.s1 - p.rv) / (t.nn - 1)) * ((t.s1 - p.rv) / (t.nn - 1))
  ) AS spikiness
  FROM smpts p JOIN smst t USING (series_id) GROUP BY 1
),
smpk AS MATERIALIZED (
  SELECT series_id,
    (list_position(s[1:{period}], list_max(s[1:{period}])) - 1)::BIGINT AS peak,
    (list_position(s[1:{period}], list_min(s[1:{period}])) - 1)::BIGINT AS trough
  FROM smstl
)
SELECT t.series_id,
  round(1e-9 + (1.0 - t.vr / t.vtr), 6) AS trend_strength,
  round(1e-9 + (1.0 - t.vr / t.vsr), 6) AS seasonality_strength,
  round(1e-9 + k.spikiness, 6) AS spikiness,
  p.peak, p.trough
FROM smst t JOIN smspk k USING (series_id) JOIN smpk p USING (series_id)
"""

# ---------------------------------------------------------------------
# composition: the 69-column wide row
# ---------------------------------------------------------------------

def tsfull_sql(
    hourly_sql: str, expr_sql: str, kernel_sql: str, time_sql: str
) -> str:
    """The complete ``tsfeatures_full`` oracle: the proven expression-
    layer / kernel-group / time-group replays (passed in from the query
    registry) joined with this module's four fragments.  INNER joins
    are exact here: every fragment emits a row for every series the
    Spark side can process (a series shorter than 2*period would raise
    inside the Spark kernel itself)."""
    return f"""
SELECT e.*,
  k.* EXCLUDE (series_id),
  sf.* EXCLUDE (series_id),
  ap.* EXCLUDE (series_id),
  se.* EXCLUDE (series_id),
  nc.* EXCLUDE (series_id),
  tg.* EXCLUDE (series_id)
FROM ({expr_sql}) e
JOIN ({kernel_sql}) k USING (series_id)
JOIN ({smstl_features_sql(hourly_sql)}) sf USING (series_id)
JOIN ({acfpacf_sql(hourly_sql)}) ap USING (series_id)
JOIN ({seasonalities_sql(hourly_sql)}) se USING (series_id)
JOIN ({nowcasting_sql(hourly_sql)}) nc USING (series_id)
JOIN ({time_sql}) tg USING (series_id)
"""
