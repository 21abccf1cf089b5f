"""DuckDB replay of the TsFeatures KERNEL group (operators/tsfeatures.py
``kernel_features``) — the last never-oracled tsfeatures group.

Round-12 promotion: the 12 optimizer/spectral features the wide row
takes from the kernel layer (the STL trio comes from stl_features_block
there, already oracled as ``stl_features_expr``; the loess-STL split
now has its own oracle in stl_oracle.py):

  entropy, hurst, unitroot_kpss, heterogeneity, linearity,
  firstmin_ac, firstzero_ac, holt_alpha, holt_beta,
  hw_alpha, hw_beta, hw_gamma

Every replay mirrors the numpy kernel operation-for-operation:

- ``_spectral_entropy`` (tsfeatures.py:44): naive O(n^2) DFT of the
  centered series, one-sided periodogram doubling (DC and the even-n
  Nyquist bin NOT doubled), p*log2(p) with the zero-bin nan-skip, and
  the log2(n//2 + 1) normalizer.
- ``_hurst`` (:71): population std of the lag-l differences for
  l = 2..min(30, n-1)-1, then the closed-form slope of log(tau) on
  log(l) (np.polyfit deg-1 agrees with centered sums to ~1e-12, far
  inside the 6dp lattice); any tau <= 0 reproduces the NaN-slope -> 0
  convention.
- ``_kpss`` / ``_linearity``: the kernel_stats oracle fragments
  verbatim (same centered-sums OLS and Bartlett nlags=1 variance).
- ``_het_arch`` (:167): the Engle LM statistic (n - nlags) * R^2 at the
  reference's lag rule nlags = min(10, n // 5) — the same Gauss-Jordan
  recursive-CTE replay as kernel_stats' nlags=4 arch_r2, generated here
  for the 11x12 augmented system.
- ``_first_min_zero_ac`` (:194): full ACF to n-1 lags (O(n^2) list
  sums) + the reference's exact scan conventions (first lag with
  ac[L] <= ac[L+1]; first sign change + 2; off-the-end fallbacks).
- ``_holt_params`` (:377): the three-round coarse-to-fine 20x20 lattice
  — each round one recursive CTE carrying 400 (l, trend, sse) lanes
  time-sequentially with identical per-lane arithmetic order, linspace
  endpoints forced exactly like np.linspace, first-minimum argmin, and
  the best-so-far / bounds-shrink bookkeeping between rounds.
- ``_hw_params`` (:429): the 4^3 lattice additive HW recursion with the
  m-slot seasonal ring (flattened 24 x 64 state list), the i >= m SSE
  gate, and the n < 2*period / min(y) <= 0 NaN gates.
"""

from __future__ import annotations


def _arch_m0_sql(nlags: int) -> str:
    """Flattened (nlags+1) x (nlags+2) augmented matrix [X'X | X't] of
    the ARCH lag regression (constant + nlags lags of z, target z[t])."""
    p = nlags + 1

    def term(a: int) -> str:
        return "1.0" if a == 0 else f"z[t-{a}]"

    entries = []
    for r in range(p):
        for c in range(p):
            entries.append(
                f"list_sum(list_transform(range({p}, n+1), t -> {term(r)} * {term(c)}))"
            )
        entries.append(
            f"list_sum(list_transform(range({p}, n+1), t -> {term(r)} * z[t]))"
        )
    return "[" + ",\n     ".join(entries) + "]"


def _holt_round_sql(r: int, n_grid: int = 20) -> str:
    """One coarse-to-fine holt round as a recursive CTE.  Input CTE
    ``hbounds{r}`` carries (series_id, n, vs, l0, b0, alo, ahi, blo,
    bhi, bs, ba, bb); output ``hround{r}`` carries the updated
    (bs, ba, bb) plus shrunk bounds for round r+1."""
    g = n_grid
    lanes = g * g
    return f"""
hlane{r} AS (
  SELECT *,
    list_transform(range(0, {lanes}), q ->
      CASE WHEN q // {g} = {g - 1} THEN ahi
           ELSE alo + (q // {g}) * ((ahi - alo) / {g - 1}) END) AS av,
    list_transform(range(0, {lanes}), q ->
      CASE WHEN q % {g} = {g - 1} THEN bhi
           ELSE blo + (q % {g}) * ((bhi - blo) / {g - 1}) END) AS bv
  FROM hbounds{r}
),
hrec{r} AS (
  SELECT series_id, n, vs, l0, b0, alo, ahi, blo, bhi, bs, ba, bb, av, bv,
    0::BIGINT AS i,
    list_transform(range(0, {lanes}), q -> l0) AS l,
    list_transform(range(0, {lanes}), q -> b0) AS tr,
    list_transform(range(0, {lanes}), q -> 0.0::DOUBLE) AS sse
  FROM hlane{r}
  UNION ALL
  SELECT series_id, n, vs, l0, b0, alo, ahi, blo, bhi, bs, ba, bb, av, bv,
    i + 1,
    list_transform(range(0, {lanes}), q ->
      av[q+1] * vs[i+1] + (1.0 - av[q+1]) * (l[q+1] + tr[q+1])),
    list_transform(range(0, {lanes}), q ->
      bv[q+1] * ((av[q+1] * vs[i+1] + (1.0 - av[q+1]) * (l[q+1] + tr[q+1])) - l[q+1])
      + (1.0 - bv[q+1]) * tr[q+1]),
    list_transform(range(0, {lanes}), q ->
      sse[q+1] + (vs[i+1] - (l[q+1] + tr[q+1])) * (vs[i+1] - (l[q+1] + tr[q+1])))
  FROM hrec{r} WHERE i < n
),
hround{r} AS (
  SELECT series_id, n, vs, l0, b0,
    CASE WHEN list_min(sse) < bs THEN list_min(sse) ELSE bs END AS bs,
    CASE WHEN list_min(sse) < bs THEN av[list_position(sse, list_min(sse))] ELSE ba END AS ba,
    CASE WHEN list_min(sse) < bs THEN bv[list_position(sse, list_min(sse))] ELSE bb END AS bb,
    greatest(1e-4, (CASE WHEN list_min(sse) < bs THEN av[list_position(sse, list_min(sse))] ELSE ba END) - (ahi - alo) / 10.0) AS alo,
    least(0.9999, (CASE WHEN list_min(sse) < bs THEN av[list_position(sse, list_min(sse))] ELSE ba END) + (ahi - alo) / 10.0) AS ahi,
    greatest(1e-4, (CASE WHEN list_min(sse) < bs THEN bv[list_position(sse, list_min(sse))] ELSE bb END) - (bhi - blo) / 10.0) AS blo,
    least(0.9999, (CASE WHEN list_min(sse) < bs THEN bv[list_position(sse, list_min(sse))] ELSE bb END) + (bhi - blo) / 10.0) AS bhi
  FROM hrec{r} WHERE i = n
),"""


def kernel_sql(hourly_sql: str, period: int = 24) -> str:
    """The full 12-feature kernel-group oracle."""
    m = period
    hw_lanes = 64  # 4^3 lattice
    return f"""
WITH RECURSIVE h AS ({hourly_sql}),
lst AS (
  SELECT series_id, list(value ORDER BY time) AS vs, count(*)::BIGINT AS n
  FROM h GROUP BY 1 HAVING count(*) >= 10
),
dev AS (
  SELECT series_id, n, vs, list_sum(vs)/n AS mu,
         list_transform(vs, v -> v - list_sum(vs)/n) AS e,
         (n-1)/2.0 AS xm
  FROM lst
),
-- ============ entropy: naive DFT one-sided periodogram ============
spec AS (
  SELECT series_id, n, e, n // 2 AS half,
    list_transform(range(0, n // 2 + 1), k ->
      pow(list_sum(list_transform(range(1, n + 1), t ->
            e[t] * cos(2.0 * pi() * k * (t - 1) / n))), 2)
      + pow(list_sum(list_transform(range(1, n + 1), t ->
            e[t] * sin(2.0 * pi() * k * (t - 1) / n))), 2)) AS amp2
  FROM dev
),
psd AS (
  SELECT series_id,
    list_transform(amp2, (v, j) ->
      CASE WHEN j = 1 THEN v
           WHEN n % 2 = 0 AND j = half + 1 THEN v
           ELSE 2.0 * v END) AS pw,
    half
  FROM spec
),
ent AS (
  SELECT series_id,
    CASE WHEN list_sum(pw) <= 0 THEN 0.0 ELSE
      -(list_sum(list_transform(pw, v ->
          CASE WHEN v / list_sum(pw) > 0
               THEN (v / list_sum(pw)) * log2(v / list_sum(pw))
               ELSE 0.0 END))
        / log2(half + 1))
    END AS entropy
  FROM psd
),
-- ============ hurst: variance-of-differences slope ============
hur0 AS (
  SELECT series_id, n, least(30, n - 1) AS hi,
    list_transform(range(2, least(30, n - 1)), l ->
      sqrt(
        list_sum(list_transform(range(1, n - l + 1), t ->
          (vs[t + l] - vs[t]) * (vs[t + l] - vs[t]))) / (n - l)
        - pow(list_sum(list_transform(range(1, n - l + 1), t ->
            vs[t + l] - vs[t])) / (n - l), 2)
      )) AS tau
  FROM lst WHERE least(30, n - 1) > 3
),
hur1 AS (
  -- lag j (1-based list index) is difference lag j+1
  SELECT series_id, tau,
    list_sum(list_transform(range(1, len(tau) + 1), j -> ln(j + 1))) / len(tau) AS lxm,
    CASE WHEN list_min(tau) > 0
         THEN list_sum(list_transform(tau, v -> ln(v))) / len(tau) END AS lym
  FROM hur0
),
hur AS (
  SELECT series_id,
    CASE WHEN lym IS NULL THEN 0.0 ELSE
      list_sum(list_transform(range(1, len(tau) + 1), j ->
        (ln(j + 1) - lxm) * (ln(tau[j]) - lym)))
      / list_sum(list_transform(range(1, len(tau) + 1), j ->
        (ln(j + 1) - lxm) * (ln(j + 1) - lxm)))
    END AS hurst
  FROM hur1
),
-- ============ linearity + kpss (kernel_stats fragments) ============
lin AS (
  SELECT series_id, n, vs, mu, e, xm,
    list_sum(list_transform(vs, (v,i) -> ((i-1) - xm) * v)) /
    list_sum(list_transform(vs, (v,i) -> ((i-1) - xm) * ((i-1) - xm))) AS slope
  FROM dev
),
lin2 AS (
  SELECT series_id, n, vs, mu, e,
    1 - list_sum(list_transform(vs, (v,i) ->
          pow(v - ((mu - slope*xm) + slope*(i-1)), 2))) /
        list_sum(list_transform(e, d -> d*d)) AS linearity
  FROM lin
),
kpct AS (
  SELECT series_id, n,
    list_transform(range(1, n+1), i ->
      vs[i] - ((mu - slope*xm) + slope*(i-1))) AS ect
  FROM lin
),
kp AS (
  SELECT series_id, n, ect,
    list_sum(list_transform(ect, d -> d*d))/n AS gamma0,
    list_sum(list_transform(range(1, n), i -> ect[i]*ect[i+1]))/n AS gamma1,
    list_sum(list_transform(range(1, n+1), t ->
      pow(list_sum(ect[1:t]), 2))) AS ss_cum
  FROM kpct
),
kp2 AS (
  SELECT series_id, ss_cum / (n * n * (gamma0 + gamma1)) AS kpss
  FROM kp
),
-- ============ heterogeneity: (n - 10) * R^2, nlags = min(10, n//5) ======
arch0 AS (
  SELECT series_id, n,
    list_transform(vs, v -> v*v / (list_sum(list_transform(vs, q -> q*q))/n)) AS z
  FROM dev WHERE least(10, n // 5) = 10
),
arch_init AS (
  SELECT series_id, n, z, 0 AS p,
    {_arch_m0_sql(10)} AS m
  FROM arch0
),
gj AS (
  SELECT series_id, n, z, p, m FROM arch_init
  UNION ALL
  SELECT series_id, n, z, p+1,
    list_transform(range(0, 132), i ->
      CASE WHEN i // 12 = p THEN m[i+1] / m[p*12+p+1]
      ELSE m[i+1] - m[(i//12)*12 + p + 1] * (m[p*12 + (i%12) + 1] / m[p*12+p+1]) END)
  FROM gj WHERE p < 11
),
het AS (
  SELECT series_id,
    (n - 10) * (
      1.0 -
      list_sum(list_transform(range(11, n+1), t ->
        pow(z[t] - (m[12] + m[24]*z[t-1] + m[36]*z[t-2] + m[48]*z[t-3]
                    + m[60]*z[t-4] + m[72]*z[t-5] + m[84]*z[t-6] + m[96]*z[t-7]
                    + m[108]*z[t-8] + m[120]*z[t-9] + m[132]*z[t-10]), 2)))
      /
      list_sum(list_transform(range(11, n+1), t ->
        pow(z[t] - list_sum(z[11:n])/(n-10), 2)))
    ) AS heterogeneity
  FROM gj WHERE p = 11
),
-- ============ firstmin_ac / firstzero_ac: full ACF + scans ============
acf AS (
  SELECT series_id, n,
    list_transform(range(1, n), k ->
      list_sum(list_transform(range(1, n - k + 1), t -> e[t] * e[t+k]))
      / list_sum(list_transform(e, d -> d*d))) AS ac
  FROM dev
),
special AS (
  SELECT series_id,
    coalesce(
      list_min(list_filter(range(1, len(ac)), L -> ac[L] <= ac[L+1])),
      len(ac))::DOUBLE AS firstmin_ac,
    coalesce(
      list_min(list_filter(range(1, len(ac)), L -> ac[L] > 0 AND ac[L+1] < 0)) + 1,
      len(ac) + 1)::DOUBLE AS firstzero_ac
  FROM acf
),
-- ============ holt: 3-round coarse-to-fine 20x20 lattice ============
hinit AS (
  SELECT series_id, n, vs, least(10, n) AS k0 FROM lst
),
hinit2 AS (
  SELECT series_id, n, vs,
    -- np.polyfit deg-1 over the first k0 points (centered sums)
    list_sum(list_transform(range(1, k0 + 1), t ->
      ((t - 1) - (k0 - 1)/2.0) * vs[t]))
    / list_sum(list_transform(range(1, k0 + 1), t ->
      ((t - 1) - (k0 - 1)/2.0) * ((t - 1) - (k0 - 1)/2.0))) AS b0,
    list_sum(vs[1:k0]) / k0 AS mu0,
    (k0 - 1)/2.0 AS tm0
  FROM hinit
),
hbounds1 AS (
  SELECT series_id, n, vs, mu0 - b0 * tm0 AS l0, b0,
    0.01 AS alo, 0.99 AS ahi, 0.01 AS blo, 0.99 AS bhi,
    1e308 AS bs, 0.5 AS ba, 0.1 AS bb
  FROM hinit2
),{_holt_round_sql(1)}
hbounds2 AS (SELECT series_id, n, vs, l0, b0, alo, ahi, blo, bhi, bs, ba, bb FROM hround1),{_holt_round_sql(2)}
hbounds3 AS (SELECT series_id, n, vs, l0, b0, alo, ahi, blo, bhi, bs, ba, bb FROM hround2),{_holt_round_sql(3)}
holt AS (
  SELECT series_id, ba AS holt_alpha, bb AS holt_beta FROM hround3
),
-- ============ hw: 4^3 lattice with the m-slot seasonal ring ============
hwg AS (
  SELECT l.series_id, l.n, l.vs,
    list_sum(l.vs[1:{m}]) / {m} AS hl0
  FROM lst l WHERE l.n >= {2 * m} AND list_min(l.vs) > 0
),
hwinit AS (
  SELECT series_id, n, vs, hl0,
    (list_sum(vs[{m + 1}:{2 * m}]) / {m} - hl0) / {m} AS hb0,
    list_transform(range(0, {hw_lanes}), q -> 0.2 + 0.2 * (q // 16)) AS av,
    list_transform(range(0, {hw_lanes}), q -> 0.2 + 0.2 * ((q // 4) % 4)) AS bv,
    list_transform(range(0, {hw_lanes}), q -> 0.2 + 0.2 * (q % 4)) AS gv
  FROM hwg
),
hwrec AS (
  SELECT series_id, n, vs, av, bv, gv, 0::BIGINT AS i,
    list_transform(range(0, {hw_lanes}), q -> hl0) AS l,
    list_transform(range(0, {hw_lanes}), q -> hb0) AS b,
    -- seasonal ring: slot p (0..{m - 1}) lane q at index p*{hw_lanes}+q+1
    flatten(list_transform(range(0, {m}), p ->
      list_transform(range(0, {hw_lanes}), q -> vs[p + 1] - hl0))) AS s,
    list_transform(range(0, {hw_lanes}), q -> 0.0::DOUBLE) AS sse
  FROM hwinit
  UNION ALL
  SELECT series_id, n, vs, av, bv, gv, i + 1,
    list_transform(range(0, {hw_lanes}), q ->
      av[q+1] * (vs[i+1] - s[(i % {m}) * {hw_lanes} + q + 1])
      + (1.0 - av[q+1]) * (l[q+1] + b[q+1])),
    list_transform(range(0, {hw_lanes}), q ->
      bv[q+1] * ((av[q+1] * (vs[i+1] - s[(i % {m}) * {hw_lanes} + q + 1])
                  + (1.0 - av[q+1]) * (l[q+1] + b[q+1])) - l[q+1])
      + (1.0 - bv[q+1]) * b[q+1]),
    list_transform(range(0, {m * hw_lanes}), x ->
      CASE WHEN x // {hw_lanes} = i % {m} THEN
        gv[(x % {hw_lanes}) + 1]
          * (vs[i+1]
             - (av[(x % {hw_lanes}) + 1] * (vs[i+1] - s[x+1])
                + (1.0 - av[(x % {hw_lanes}) + 1]) * (l[(x % {hw_lanes}) + 1] + b[(x % {hw_lanes}) + 1])))
        + (1.0 - gv[(x % {hw_lanes}) + 1]) * s[x+1]
      ELSE s[x+1] END),
    list_transform(range(0, {hw_lanes}), q ->
      sse[q+1] + CASE WHEN i >= {m} THEN
        pow(vs[i+1] - (l[q+1] + b[q+1] + s[(i % {m}) * {hw_lanes} + q + 1]), 2)
      ELSE 0.0 END)
  FROM hwrec WHERE i < n
),
hw AS (
  SELECT series_id,
    av[list_position(sse, list_min(sse))] AS hw_alpha,
    bv[list_position(sse, list_min(sse))] AS hw_beta,
    gv[list_position(sse, list_min(sse))] AS hw_gamma
  FROM hwrec WHERE i = n
)
SELECT l.series_id,
  round(1e-9 + ent.entropy, 6) AS entropy,
  round(1e-9 + hur.hurst, 6) AS hurst,
  round(1e-9 + kp2.kpss, 6) AS unitroot_kpss,
  round(1e-9 + het.heterogeneity, 6) AS heterogeneity,
  round(1e-9 + lin2.linearity, 6) AS linearity,
  round(1e-9 + special.firstmin_ac, 6) AS firstmin_ac,
  round(1e-9 + special.firstzero_ac, 6) AS firstzero_ac,
  round(1e-9 + holt.holt_alpha, 6) AS holt_alpha,
  round(1e-9 + holt.holt_beta, 6) AS holt_beta,
  round(1e-9 + hw.hw_alpha, 6) AS hw_alpha,
  round(1e-9 + hw.hw_beta, 6) AS hw_beta,
  round(1e-9 + hw.hw_gamma, 6) AS hw_gamma
FROM lst l
JOIN ent USING (series_id)
JOIN lin2 USING (series_id)
JOIN kp2 USING (series_id)
JOIN special USING (series_id)
JOIN holt USING (series_id)
LEFT JOIN hur USING (series_id)
LEFT JOIN het USING (series_id)
LEFT JOIN hw USING (series_id)
"""
