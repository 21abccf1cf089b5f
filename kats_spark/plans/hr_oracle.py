"""DuckDB replay of ``hourly_ratio_detect`` (operators/hourly_ratio.py:65)
— the r13 promotion that closes the last pinv holdout.

The 24-dim day-share Mahalanobis pipeline was rows-only since r09
because of its ``np.linalg.pinv``.  r13 measurement (see the operator
docstring): the profile rows are day SHARES, so the ridged covariance's
largest singular value is bounded by 24 and pinv's default truncation
cutoff (1e-15 * 24 * smax <= 5.8e-13) can never reach the 1e-9 ridge
floor — pinv was ALWAYS the plain inverse here, and the operator now
computes it with the pivot-free Gauss-Jordan this module mirrors
row-operation-for-row-operation (measured GJ-vs-pinv Mahalanobis delta
4.1e-12 at sf0.1; decision margins on is_anomaly >= 0.41).

Reference surface: kats/detectors/hourly_ratio_detection.py:29 (drop
incomplete days), :61-88 (profile mean/covariance + Mahalanobis), with
the repo's documented >= 30-full-days gate and robust-z flags.
"""

from __future__ import annotations


def hourly_ratio_sql(dim: int = 24, min_days: int = 30,
                     threshold: float = 3.0) -> str:
    """(series_id, date, mahalanobis, is_anomaly) — every day of every
    series; NULL mahalanobis (and flag 0) for incomplete days and for
    series under the full-day gate, exactly the kernel's NaN story."""
    n = dim
    w = 2 * dim  # augmented GJ width
    return f"""
WITH RECURSIVE raw AS (SELECT event_type AS series_id, ts AS time, value FROM events),
hourly AS (
  SELECT series_id, time::DATE AS date, hour(time) AS hour, avg(value) AS v
  FROM raw GROUP BY 1, 2, 3
),
daily AS (
  SELECT series_id, date, sum(v) AS tot, count(*) AS n_hours
  FROM hourly GROUP BY 1, 2
),
ratios AS (
  SELECT h.series_id, h.date, h.hour,
    CASE WHEN d.tot = 0 THEN NULL ELSE h.v / d.tot END AS ratio,
    d.n_hours
  FROM hourly h JOIN daily d USING (series_id, date)
),
fdays AS (
  SELECT series_id, date, list(ratio ORDER BY hour) AS p
  FROM ratios
  WHERE n_hours = {n}
  GROUP BY 1, 2
  HAVING bool_and(ratio IS NOT NULL)
),
gated AS (
  SELECT series_id, count(*) AS nf FROM fdays GROUP BY 1
  HAVING count(*) >= {min_days}
),
cells AS (
  SELECT f.series_id, f.date, i.i AS hr, f.p[i.i] AS x
  FROM fdays f JOIN gated g USING (series_id),
       LATERAL (SELECT unnest(generate_series(1, {n})) AS i) i
),
means AS (
  SELECT series_id, hr, avg(x) AS m FROM cells GROUP BY 1, 2
),
ml AS (SELECT series_id, list(m ORDER BY hr) AS m FROM means GROUP BY 1),
covc AS (
  -- np.cov ddof=1 + the 1e-9 ridge on the diagonal
  SELECT a.series_id, a.hr AS i, b.hr AS j,
    sum((a.x - am.m) * (b.x - bm.m)) / (count(*) - 1)
    + CASE WHEN a.hr = b.hr THEN 1e-9 ELSE 0.0 END AS c
  FROM cells a
  JOIN cells b ON a.series_id = b.series_id AND a.date = b.date
  JOIN means am ON am.series_id = a.series_id AND am.hr = a.hr
  JOIN means bm ON bm.series_id = b.series_id AND bm.hr = b.hr
  GROUP BY 1, 2, 3
),
covl AS (SELECT series_id, list(c ORDER BY i, j) AS cv FROM covc GROUP BY 1),
aug0 AS (
  SELECT series_id, 0 AS pv,
    list_transform(range(0, {n * w}), idx ->
      CASE WHEN idx % {w} < {n}
           THEN cv[(idx // {w}) * {n} + (idx % {w}) + 1]
           ELSE CASE WHEN idx % {w} - {n} = idx // {w}
                     THEN 1.0 ELSE 0.0 END END) AS m
  FROM covl
),
gjh AS (
  SELECT series_id, pv, m FROM aug0
  UNION ALL
  SELECT series_id, pv + 1,
    list_transform(range(0, {n * w}), i ->
      CASE WHEN i // {w} = pv THEN m[i+1] / m[pv*{w} + pv + 1]
      ELSE m[i+1] - m[(i//{w})*{w} + pv + 1] * (m[pv*{w} + (i%{w}) + 1] / m[pv*{w} + pv + 1])
      END)
  FROM gjh WHERE pv < {n}
),
icl AS (
  -- right block of the reduced augmented matrix = the inverse
  SELECT series_id,
    list_transform(range(0, {n * n}), idx ->
      m[(idx // {n}) * {w} + {n} + (idx % {n}) + 1]) AS ic
  FROM gjh WHERE pv = {n}
),
mah AS (
  SELECT f.series_id, f.date,
    sqrt(list_sum(list_transform(range(0, {n * n}), idx ->
      (f.p[idx // {n} + 1] - l.m[idx // {n} + 1])
      * i.ic[idx + 1]
      * (f.p[idx % {n} + 1] - l.m[idx % {n} + 1])))) AS dd
  FROM fdays f
  JOIN gated g USING (series_id)
  JOIN ml l USING (series_id)
  JOIN icl i USING (series_id)
),
meds AS (
  SELECT series_id, median(dd) AS med FROM mah GROUP BY 1
),
mads AS (
  SELECT m.series_id, median(abs(m.dd - s.med)) * 1.4826 AS mad
  FROM mah m JOIN meds s USING (series_id) GROUP BY 1
)
SELECT d.series_id, strftime(d.date, '%Y-%m-%d') AS date,
  round(1e-9 + roundbankers(h.dd, 6), 6) AS mahalanobis,
  (CASE WHEN h.dd IS NOT NULL
             AND (h.dd - s.med) > {threshold} * (CASE WHEN a.mad > 0
                                                      THEN a.mad ELSE 1.0 END)
        THEN 1 ELSE 0 END)::INTEGER AS is_anomaly
FROM daily d
LEFT JOIN mah h USING (series_id, date)
LEFT JOIN meds s ON s.series_id = d.series_id
LEFT JOIN mads a ON a.series_id = d.series_id
"""
