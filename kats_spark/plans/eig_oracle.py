"""DuckDB replay of ``embedding_pca`` (operators/similarity.py:716) —
the r13 promotion that retires "eigendecomposition" from the
non-replayable list.

The operator moved (r13) from LAPACK ``eigvalsh`` to a deterministic
pair this module mirrors step-for-step:

- **Householder tridiagonalization** via full-matrix similarity updates
  ``A' = A - beta (v w^T + w v^T) + beta^2 s v v^T`` — 62 unrolled
  single-row MATERIALIZED CTE steps over the flat 64x64 covariance
  list, each computing (xnorm2, x0) -> v -> (vnorm2, w) -> A' exactly
  like ``_householder_tridiag``.
- **Sturm bisection** for the top-8 eigenvalues: Gershgorin bracket,
  80 fixed halvings per target, the eigenvalue-count-below-lambda via
  a ``list_reduce`` fold of the Sturm recursion q_i = (d_i - lam) -
  e_{i-1}^2 / q_{i-1} with the identical q == 0 -> -1e-300 guard.
  80 halvings shrink the bracket below one ulp, so convergence is not
  a tolerance question — both engines walk the same midpoints.
- **Trace identities** for the spectral totals: sum(evals) = tr(cov),
  sum(evals^2) = ||cov||_F^2 — closed forms, no eigensolve.

The covariance itself comes from the same gram/colsum math as the
operator's Arrow partials (sum x_i x_j over rows / n minus the mean
outer product); float summation order differs at ~1e-13, far inside
the shared 6dp rounding lattice.
"""

from __future__ import annotations


def _householder_steps(dim: int) -> str:
    """62 unrolled Householder steps: hh0 (the covariance list) ->
    hh{dim-2} (tridiagonal in flat form)."""
    out = []
    n = dim
    for k in range(n - 2):
        kp = k + 1
        # v's head element needs x0/alpha; building it through a struct
        # keeps the chain at 3 materialized CTEs per step (planning
        # overhead across 62 steps is the oracle's dominant cost)
        out.append(f"""
hv{k} AS MATERIALIZED (
  SELECT a, st.xn2 AS xn2,
    list_transform(range(0, {n}), r ->
      CASE WHEN r < {kp} THEN 0.0
           WHEN r = {kp} THEN st.x0 - (CASE WHEN st.x0 >= 0 THEN -sqrt(st.xn2)
                                            ELSE sqrt(st.xn2) END)
           ELSE a[r*{n} + {kp}] END) AS v
  FROM (
    SELECT a, {{'xn2': list_sum(list_transform(range({kp}, {n}), r ->
                  a[r*{n} + {kp}] * a[r*{n} + {kp}])),
               'x0': a[{kp * n + k + 1}]}} AS st
    FROM hh{k}
  )
),
hw{k} AS MATERIALIZED (
  SELECT a, xn2, v,
    list_sum(list_transform(v, q -> q*q)) AS vn2,
    list_transform(range(0, {n}), r ->
      list_sum(list_transform(range(0, {n}), c ->
        a[r*{n} + c + 1] * v[c + 1]))) AS w
  FROM hv{k}
),
hh{k + 1} AS MATERIALIZED (
  SELECT CASE WHEN xn2 = 0 OR vn2 = 0 THEN a ELSE
    list_transform(range(0, {n * n}), idx ->
      a[idx + 1]
      - (2.0/vn2) * (v[idx//{n} + 1] * w[idx%{n} + 1]
                     + w[idx//{n} + 1] * v[idx%{n} + 1])
      + ((2.0/vn2) * (2.0/vn2)
         * list_sum(list_transform(range(0, {n}), r -> v[r+1] * w[r+1])))
        * v[idx//{n} + 1] * v[idx%{n} + 1])
  END AS a
  FROM hw{k}
),""")
    return "".join(out)


def embedding_pca_sql(dim: int = 64, top_k: int = 8, iters: int = 80) -> str:
    """(component, eigenvalue, cum_var_explained, participation_ratio)
    — one row per top component, exactly the q_embedding_pca frame."""
    n = dim

    # Sturm count of eigenvalues strictly below lam, as a list_reduce
    # fold; the first element carries the i=1 state, later elements the
    # (d_i - lam, e_{i-1}) pair.  All struct fields DOUBLE.
    #
    # FIELD ORDER IS LOAD-BEARING: DuckDB (1.0.0, the pinned container
    # engine) evaluates the lambda's struct fields sequentially INTO the
    # accumulator, so a later field referencing acc.q sees the UPDATED
    # q.  'c' therefore comes BEFORE 'q' — it must read the previous
    # step's q (pinned by tests/test_tsfull_oracle.py's eig test).
    qprev = "(CASE WHEN acc.q = 0 THEN -1e-300 ELSE acc.q END)"
    qnew = f"(x.dd - x.ee * x.ee / {qprev})"
    sturm = f"""(list_reduce(
      list_transform(range(1, {n + 1}), i ->
        CASE WHEN i = 1 THEN
          {{'c': CASE WHEN d[1] - lam < 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END,
            'q': d[1] - lam,
            'dd': 0.0::DOUBLE, 'ee': 0.0::DOUBLE}}
        ELSE
          {{'c': 0.0::DOUBLE, 'q': 0.0::DOUBLE,
            'dd': d[i] - lam, 'ee': e[i-1]}} END),
      (acc, x) -> {{'c': acc.c + CASE WHEN {qnew} < 0 THEN 1.0::DOUBLE
                                      ELSE 0.0::DOUBLE END,
                    'q': {qnew},
                    'dd': 0.0::DOUBLE, 'ee': 0.0::DOUBLE}})).c"""

    return f"""
WITH RECURSIVE base AS MATERIALIZED (
  SELECT embedding::DOUBLE[] AS e FROM embeddings
),
nn AS MATERIALIZED (SELECT count(*)::BIGINT AS cnt FROM base),
grams AS MATERIALIZED (
  SELECT i.i AS i, j.j AS j, sum(e[i.i] * e[j.j]) AS g
  FROM base,
       (SELECT unnest(range(1, {n + 1})) AS i) i,
       (SELECT unnest(range(1, {n + 1})) AS j) j
  GROUP BY 1, 2
),
gl AS MATERIALIZED (SELECT list(g ORDER BY i, j) AS g FROM grams),
csums AS MATERIALIZED (
  SELECT i.i AS i, sum(e[i.i]) AS s
  FROM base, (SELECT unnest(range(1, {n + 1})) AS i) i
  GROUP BY 1
),
csl AS MATERIALIZED (SELECT list(s ORDER BY i) AS s FROM csums),
hh0 AS MATERIALIZED (
  SELECT list_transform(range(0, {n * n}), x ->
    g.g[x + 1] / t.cnt
    - (c.s[x // {n} + 1] / t.cnt) * (c.s[x % {n} + 1] / t.cnt)) AS a
  FROM gl g, csl c, nn t
),{_householder_steps(n)}
trid AS MATERIALIZED (
  SELECT list_transform(range(0, {n}), i -> a[i*{n} + i + 1]) AS d,
         list_transform(range(0, {n - 1}), i -> a[i*{n} + i + 2]) AS e
  FROM hh{n - 2}
),
gersh AS MATERIALIZED (
  SELECT d, e,
    list_min(list_transform(range(0, {n}), i -> d[i+1] -
      (CASE WHEN i = 0 THEN abs(e[1])
            WHEN i = {n - 1} THEN abs(e[{n - 1}])
            ELSE abs(e[i]) + abs(e[i+1]) END))) AS lo0,
    list_max(list_transform(range(0, {n}), i -> d[i+1] +
      (CASE WHEN i = 0 THEN abs(e[1])
            WHEN i = {n - 1} THEN abs(e[{n - 1}])
            ELSE abs(e[i]) + abs(e[i+1]) END))) AS hi0
  FROM trid
),
bis AS (
  SELECT j.j AS j, 0 AS it, lo0 AS lo, hi0 AS hi, d, e
  FROM gersh, (SELECT unnest(range(1, {top_k + 1})) AS j) j
  UNION ALL
  SELECT j, it + 1,
    CASE WHEN cnt >= {n + 1} - j THEN lo ELSE lam END,
    CASE WHEN cnt >= {n + 1} - j THEN lam ELSE hi END,
    d, e
  FROM (
    SELECT *, {sturm} AS cnt
    FROM (SELECT *, (lo + hi) * 0.5 AS lam FROM bis WHERE it < {iters})
  )
),
evs AS MATERIALIZED (
  SELECT j, (lo + hi) * 0.5 AS ev FROM bis WHERE it = {iters}
),
tots AS MATERIALIZED (
  SELECT
    list_sum(list_transform(range(0, {n}), i -> a[i*{n} + i + 1])) AS total,
    list_sum(list_transform(a, z -> z*z)) AS sumsq
  FROM hh0
)
SELECT (j - 1)::INTEGER AS component,
  round(1e-9 + ev, 6) AS eigenvalue,
  round(1e-9 + sum(ev) OVER (ORDER BY j) / t.total, 6) AS cum_var_explained,
  round(1e-9 + t.total * t.total / t.sumsq, 6) AS participation_ratio
FROM evs, tots t
ORDER BY j
"""
