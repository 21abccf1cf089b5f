"""Hyperparameter tuning as a param-grid crossJoin.

Parity with kats/utils/time_series_parameter_tuning.py:296-648 (grid /
random search over ``get_parameter_search_space()`` definitions,
kats/models/model.py:142) re-expressed Spark-first: the candidate grid is
a tiny literal DataFrame crossJoined against the series; every (series,
candidate) cell evaluates in one distributed pass; argmin is a window
rank.  No ax-platform: the search loop IS the plan.

``tune_rolling_window`` is the demonstrator: pick the trailing-MA window
size minimizing one-step-ahead MAE — each candidate is a frame aggregate
over the same sort, so Catalyst shares the single per-series sort across
all candidates (one shuffle total, WindowExec chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def tune_rolling_window(
    df: DataFrame,
    candidates: list[int],
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, best_window, best_mae): the trailing-MA window length w
    whose predictions ma_{t-1,w} minimize MAE over the series.  Ties break
    to the smaller window (deterministic)."""
    w_base = s.w()
    preds = []
    for wlen in candidates:
        ma = F.avg(s.value).over(w_base.rowsBetween(-wlen, -1))
        cnt = F.count(s.value).over(w_base.rowsBetween(-wlen, -1))
        err = F.when(cnt == wlen, F.abs(F.col(s.value) - ma))
        preds.append(err.alias(f"__e_{wlen}"))
    scored = df.select(s.series_id, *preds)
    aggs = [F.avg(f"__e_{w}").alias(f"mae_{w}") for w in candidates]
    per_series = scored.groupBy(s.series_id).agg(*aggs)
    # argmin across the candidate columns via stack -> min_by
    stack_expr = ", ".join(f"{w}, mae_{w}" for w in candidates)
    long = per_series.selectExpr(
        s.series_id, f"stack({len(candidates)}, {stack_expr}) as (window, mae)"
    )
    return long.groupBy(s.series_id).agg(
        F.min_by(
            F.col("window"), F.struct(F.col("mae"), F.col("window"))
        ).cast("int").alias("best_window"),
        F.min("mae").alias("best_mae"),
    )


# --------------------------------------------------------------------------
# Default per-model search spaces (kats/utils/parameter_tuning_utils.py)
# --------------------------------------------------------------------------

def _logspace(lo: float, hi: float, n: int) -> list[float]:
    import numpy as np

    return [float(v) for v in np.logspace(lo, hi, n, endpoint=True)]


def default_search_space(model: str) -> list[dict]:
    """The reference's default hyperparameter search space for ``model``
    (kats/utils/parameter_tuning_utils.py: prophet :25, arnet :93,
    stlf :135, arima :171, holtwinters :213, sarima :261, theta :325,
    lightgbm :380 — VAR raises NotImplementedError there and here).
    Same dict shape (name/type/value_type/values) so callers can port
    existing Kats tuning configs unchanged."""
    spaces: dict[str, list[dict]] = {
        "arima": [
            {"name": "p", "type": "choice", "value_type": "int",
             "values": list(range(1, 6)), "is_ordered": True},
            {"name": "d", "type": "choice", "value_type": "int",
             "values": list(range(1, 3)), "is_ordered": True},
            {"name": "q", "type": "choice", "value_type": "int",
             "values": list(range(1, 6)), "is_ordered": True},
        ],
        "sarima": [
            {"name": "p", "type": "choice", "value_type": "int",
             "values": list(range(1, 6)), "is_ordered": True},
            {"name": "d", "type": "choice", "value_type": "int",
             "values": list(range(1, 3)), "is_ordered": True},
            {"name": "q", "type": "choice", "value_type": "int",
             "values": list(range(1, 6)), "is_ordered": True},
            {"name": "seasonal_order", "type": "choice", "value_type": "str",
             "values": ["(1,0,1,7)", "(1,0,2,7)", "(2,0,1,7)", "(2,0,2,7)",
                        "(1,1,1,7)", "(0,1,1,7)"]},
            {"name": "trend", "type": "choice", "value_type": "str",
             "values": ["n", "c", "t", "ct"]},
        ],
        "holtwinters": [
            {"name": "trend", "type": "choice", "value_type": "str",
             "values": ["additive", "multiplicative"]},
            {"name": "damped", "type": "choice", "value_type": "bool",
             "values": [True, False]},
            {"name": "seasonal", "type": "choice", "value_type": "str",
             "values": ["additive", "multiplicative"]},
            {"name": "seasonal_periods", "type": "choice", "value_type": "int",
             "values": [4, 7, 10, 14, 24, 30], "is_ordered": True},
        ],
        "theta": [
            {"name": "m", "type": "choice", "value_type": "int",
             "values": list(range(1, 31)), "is_ordered": True},
        ],
        "stlf": [
            {"name": "method", "type": "choice", "value_type": "str",
             "values": ["linear", "quadratic", "theta", "prophet"]},
            {"name": "m", "type": "choice", "value_type": "int",
             "values": [4, 7, 10, 14, 24, 30], "is_ordered": True},
        ],
        "prophet": [
            {"name": "seasonality_prior_scale", "type": "choice",
             "value_type": "float", "values": _logspace(-2, 1, 10),
             "is_ordered": True},
            {"name": "yearly_seasonality", "type": "choice",
             "value_type": "bool", "values": [True, False]},
            {"name": "weekly_seasonality", "type": "choice",
             "value_type": "bool", "values": [True, False]},
            {"name": "daily_seasonality", "type": "choice",
             "value_type": "bool", "values": [True, False]},
            {"name": "seasonality_mode", "type": "choice", "value_type": "str",
             "values": ["additive", "multiplicative"]},
            {"name": "changepoint_prior_scale", "type": "choice",
             "value_type": "float", "values": _logspace(-3, -0.5, 10),
             "is_ordered": True},
            {"name": "changepoint_range", "type": "choice",
             "value_type": "float",
             "values": [0.8, 0.85, 0.9, 0.95], "is_ordered": True},
        ],
    }
    if model == "var":
        raise NotImplementedError(
            "default search space not defined for VAR (parity with "
            "parameter_tuning_utils.py:355-377)"
        )
    if model not in spaces:
        raise KeyError(f"no default search space for {model!r}; "
                       f"available: {sorted(spaces)}")
    return spaces[model]


def grid_df(spark, space: list[dict], max_candidates: int | None = None,
            seed: int = 0):
    """Expand a choice search space into the candidate DataFrame the
    crossJoin planner consumes: one row per combination (grid search), or
    a seeded uniform sample of ``max_candidates`` combinations (random
    search, time_series_parameter_tuning.py random strategy).  The grid is
    tiny metadata — it broadcasts; the series side never reshuffles."""
    import itertools
    import random as _random

    names = [p["name"] for p in space]
    combos = list(itertools.product(*[p["values"] for p in space]))
    if max_candidates is not None and len(combos) > max_candidates:
        combos = _random.Random(seed).sample(combos, max_candidates)
    rows = [dict(zip(names, [str(v) for v in c])) for c in combos]
    return spark.createDataFrame(rows)


# --------------------------------------------------------------------------
# Quasi-random (low-discrepancy) search — the reference's
# RANDOM_SEARCH_SOBOL strategy (kats/consts.py:1354, ax-platform Sobol
# backend in kats/utils/time_series_parameter_tuning.py).  Halton radical
# inverse per dimension: same space-filling property, dependency-free and
# fully deterministic, so tuned results replay bit-identically.
# --------------------------------------------------------------------------

_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47]


def _radical_inverse(i: int, base: int) -> float:
    f, r = 1.0, 0.0
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def quasirandom_rows(space: list[dict], n: int, seed: int = 0) -> list[dict]:
    """The ``quasirandom_df`` candidate set as a plain list of dicts —
    the same rows ``createDataFrame`` would round-trip (all values str),
    for evaluators that accept row lists (``pass_rows=True`` searches)."""
    import math

    if len(space) > len(_PRIMES):
        raise ValueError(f"at most {len(_PRIMES)} dimensions supported")
    rows = []
    for k in range(n):
        row = {}
        for d, p in enumerate(space):
            u = _radical_inverse(k + 1 + seed * n, _PRIMES[d])
            if "values" in p:
                vals = p["values"]
                row[p["name"]] = str(vals[min(int(u * len(vals)), len(vals) - 1)])
            else:
                lo, hi = p["bounds"]
                if p.get("log"):
                    v = math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
                else:
                    v = lo + u * (hi - lo)
                row[p["name"]] = str(v)
        rows.append(row)
    return rows


def quasirandom_df(spark, space: list[dict], n: int, seed: int = 0):
    """Low-discrepancy candidate DataFrame: ``n`` Halton points over the
    search space (one prime base per dimension; ``seed`` leaps the start
    index).  Space entries are either choice params ``{"name", "values"}``
    (index-mapped) or continuous ``{"name", "bounds": [lo, hi],
    "log": bool}`` ranges.  Like ``grid_df`` the result is tiny literal
    metadata — it broadcasts against the series side."""
    return spark.createDataFrame(quasirandom_rows(space, n, seed=seed))


# --------------------------------------------------------------------------
# TPE (tree-structured Parzen estimator) search — the numpy stand-in for
# the reference's Bayesian strategies (kats/consts.py SearchMethodEnum
# BAYES_OPT / ax BoTorch backend, time_series_parameter_tuning.py:296,648;
# ax is absent from this container).  Sequential model-based optimization:
# observed trials are split into good/bad by the gamma quantile, new
# candidates are drawn from a Parzen model of the GOOD set and ranked by
# the density ratio g(x)/b(x) (Bergstra et al., NeurIPS 2011 — public
# algorithm).  Evaluation stays fully distributed: each round hands ONE
# candidate-batch DataFrame to the caller's evaluate() plan; only the
# (tiny) per-candidate scores come back to the driver.
# --------------------------------------------------------------------------


def _tpe_sample_and_rank(space, good, bad, n_draw, batch, rng):
    """Draw n_draw candidates from the good-set Parzen model, keep the
    `batch` with the highest log g(x) - log b(x)."""
    import numpy as np

    def _model(obs, p):
        if "values" in p:
            # trials round-trip through string-typed DataFrames: compare
            # categorical levels as strings
            vals = [str(v) for v in p["values"]]
            counts = np.ones(len(vals))  # Laplace prior
            for o in obs:
                counts[vals.index(str(o))] += 1.0
            return ("cat", vals, counts / counts.sum())
        lo, hi = p["bounds"]
        arr = np.array(obs, dtype=float) if len(obs) else np.array([(lo + hi) / 2])
        if p.get("log"):
            arr, lo, hi = np.log(arr), np.log(lo), np.log(hi)
        # spacing-based bandwidth (hyperopt-style): shrinks as the good
        # set densifies, so later rounds exploit locally instead of
        # re-sampling the whole range
        bw = max((hi - lo) / (2.0 * len(arr)), 1e-12)
        return ("num", arr, bw, lo, hi, bool(p.get("log")))

    gmods = [_model([o[p["name"]] for o in good], p) for p in space]
    bmods = [_model([o[p["name"]] for o in bad], p) for p in space]

    def _draw(m):
        if m[0] == "cat":
            _, vals, prob = m
            return vals[rng.choice(len(vals), p=prob)]
        _, arr, bw, lo, hi, is_log = m
        center = arr[rng.integers(len(arr))]
        v = float(np.clip(rng.normal(center, bw), lo, hi))
        return float(np.exp(v)) if is_log else v

    def _logpdf(m, x):
        import numpy as np

        if m[0] == "cat":
            _, vals, prob = m
            return float(np.log(prob[vals.index(x)]))
        _, arr, bw, lo, hi, is_log = m
        xx = np.log(x) if is_log else x
        z = (xx - arr) / bw
        return float(np.log(np.mean(np.exp(-0.5 * z * z)) / bw + 1e-300))

    cands = []
    for _ in range(n_draw):
        c = {p["name"]: _draw(gm) for p, gm in zip(space, gmods)}
        score = sum(
            _logpdf(gm, c[p["name"]]) - _logpdf(bm, c[p["name"]])
            for p, gm, bm in zip(space, gmods, bmods)
        )
        cands.append((score, c))
    cands.sort(key=lambda t: -t[0])
    seen, out = set(), []
    for _, c in cands:
        key = tuple(sorted(c.items()))
        if key not in seen:
            seen.add(key)
            out.append(c)
        if len(out) == batch:
            break
    return out


def tpe_search(
    spark,
    space: list[dict],
    evaluate,
    n_init: int = 8,
    n_iter: int = 4,
    batch: int = 4,
    gamma: float = 0.25,
    n_draw: int = 32,
    seed: int = 0,
    pass_rows: bool = False,
):
    """Minimize ``evaluate`` over the search space with TPE.

    ``evaluate(candidates_df) -> DataFrame`` must return one row per
    candidate with the param columns (as strings, like grid_df) plus a
    ``score`` column (lower = better) — it runs as a normal distributed
    plan; tpe_search only collects the per-candidate scalars.  Returns
    (best_params_dict, best_score, trials) with trials the full list of
    (params, score).

    ``pass_rows=True`` hands each candidate batch to ``evaluate`` as a
    plain list of dicts (the exact rows ``createDataFrame`` would
    round-trip — all values str, same order) instead of a DataFrame:
    one less createDataFrame + collect per round for evaluators that
    only ever collect the batch anyway (guide §5 driver work)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    init = (
        quasirandom_rows(space, n_init, seed=seed)
        if pass_rows
        else quasirandom_df(spark, space, n_init, seed=seed)
    )
    trials: list[tuple[dict, float]] = []

    def _run(cdf):
        res = evaluate(cdf)
        # evaluate may return the scored rows as a plain list of dicts —
        # the batches are driver-sized (<= ``batch``) either way, and the
        # list form skips a createDataFrame + collect round trip per
        # round (r13: ~0.1 s of py4j/analysis per round at the bench)
        rows = res if isinstance(res, list) else [r.asDict() for r in res.collect()]
        for rd in rows:
            d = dict(rd)
            sc = float(d.pop("score"))
            trials.append(({k: d[k] for k in (p["name"] for p in space)}, sc))

    _run(init)
    for _ in range(n_iter):
        obs = sorted(trials, key=lambda t: t[1])
        n_good = max(1, int(np.ceil(gamma * len(obs))))
        good = [t[0] for t in obs[:n_good]]
        bad = [t[0] for t in obs[n_good:]] or good
        props = _tpe_sample_and_rank(space, good, bad, n_draw, batch, rng)
        rows = [{k: str(v) for k, v in c.items()} for c in props]
        _run(rows if pass_rows else spark.createDataFrame(rows))
    best = min(trials, key=lambda t: t[1])
    return best[0], best[1], trials


# --------------------------------------------------------------------------
# GP-EI Bayesian optimization — the reference's ax-platform GPEI strategy
# (kats/utils/time_series_parameter_tuning.py:296,648 SearchMethodEnum
# BAYES_OPT) re-derived from the public math (Rasmussen & Williams 2006
# ch. 2; Jones/Schonlau/Welch 1998 expected improvement), numpy-only.
# --------------------------------------------------------------------------


def _gp_encode(space: list[dict], params: dict) -> list[float]:
    """Map a param dict to the unit cube: numeric bounds scale linearly
    (log-scaled first when flagged); ordered ``values`` choices map to
    their level index / (n-1) — a 1-D embedding that preserves order, so
    the GP can model smooth response over the choice ladder."""
    import numpy as np

    x = []
    for p in space:
        v = params[p["name"]]
        if "values" in p:
            vals = [str(u) for u in p["values"]]
            x.append(vals.index(str(v)) / max(len(vals) - 1, 1))
        else:
            lo, hi = p["bounds"]
            vv = float(v)
            if p.get("log"):
                vv, lo, hi = np.log(vv), np.log(lo), np.log(hi)
            x.append((vv - lo) / (hi - lo))
    return x


def _gp_decode(space: list[dict], x: list[float]) -> dict:
    import numpy as np

    out = {}
    for p, u in zip(space, x):
        if "values" in p:
            vals = p["values"]
            out[p["name"]] = vals[int(round(u * (len(vals) - 1)))]
        else:
            lo, hi = p["bounds"]
            if p.get("log"):
                out[p["name"]] = float(
                    np.exp(np.log(lo) + u * (np.log(hi) - np.log(lo)))
                )
            else:
                out[p["name"]] = float(lo + u * (hi - lo))
    return out


def _gp_posterior(X, y, Xs, length_scale: float, noise: float):
    """Squared-exponential GP posterior mean/std at Xs given (X, y),
    via Cholesky (RW06 algorithm 2.1).  y is standardized by the
    caller."""
    import numpy as np

    def k(A, B):
        d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        return np.exp(-0.5 * d2 / (length_scale**2))

    K = k(X, X) + noise * np.eye(len(X))
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
    Ks = k(X, Xs)
    mu = Ks.T @ alpha
    v = np.linalg.solve(L, Ks)
    var = np.clip(1.0 - (v * v).sum(0), 1e-12, None)
    return mu, np.sqrt(var), L, alpha


def _gp_log_marginal(y, L, alpha) -> float:
    import numpy as np

    return float(
        -0.5 * y @ alpha - np.log(np.diag(L)).sum() - 0.5 * len(y) * np.log(2 * np.pi)
    )


def gp_ei_search(
    spark,
    space: list[dict],
    evaluate,
    n_init: int = 8,
    n_iter: int = 4,
    batch: int = 4,
    n_draw: int = 256,
    xi: float = 0.01,
    noise: float = 1e-6,
    seed: int = 0,
    pass_rows: bool = False,
):
    """Minimize ``evaluate`` with GP-EI Bayesian optimization: a
    squared-exponential GP surrogate on the unit-cube-encoded params
    (length-scale picked each round by marginal likelihood over a small
    grid — RW06 §5.4 model selection), expected-improvement acquisition
    (Jones 1998) maximized over a fresh Sobol candidate cloud, top
    ``batch`` proposals evaluated as ONE distributed plan per round.

    Same contract as ``tpe_search``: ``evaluate(candidates_df) ->
    DataFrame`` with param columns + ``score`` (lower better); returns
    (best_params, best_score, trials).  Driver-side cost is O(n³) in the
    TRIAL count — dozens — never in the data size."""
    import numpy as np

    rng = np.random.default_rng(seed)
    d = len(space)
    trials: list[tuple[dict, float]] = []

    def _run(cdf):
        res = evaluate(cdf)
        rows = res if isinstance(res, list) else [r.asDict() for r in res.collect()]
        for row in rows:
            rd = dict(row)
            sc = float(rd.pop("score"))
            trials.append(({k: rd[k] for k in (p["name"] for p in space)}, sc))

    _run(
        quasirandom_rows(space, n_init, seed=seed)
        if pass_rows
        else quasirandom_df(spark, space, n_init, seed=seed)
    )
    for it in range(n_iter):
        X = np.array([_gp_encode(space, t[0]) for t in trials])
        y_raw = np.array([t[1] for t in trials])
        mu0, sd0 = y_raw.mean(), y_raw.std() + 1e-12
        y = (y_raw - mu0) / sd0
        # fresh scrambled Sobol cloud each round (space-filling, cheap)
        cloud = np.array(sobol_points(n_draw, d, seed=seed + 1 + it))
        # length-scale by marginal likelihood over a small grid
        best_ls, best_lml = None, -np.inf
        for ls in (0.05, 0.1, 0.2, 0.5, 1.0):
            try:
                _, _, L, alpha = _gp_posterior(X, y, X[:1], ls, noise + 1e-8)
            except np.linalg.LinAlgError:
                continue
            lml = _gp_log_marginal(y, L, alpha)
            if lml > best_lml:
                best_ls, best_lml = ls, lml
        mu, sd, _, _ = _gp_posterior(X, y, cloud, best_ls, noise + 1e-8)
        f_best = y.min()
        z = (f_best - mu - xi) / sd
        ei = (f_best - mu - xi) * _norm_cdf(z) + sd * _norm_pdf(z)
        order = np.argsort(-ei)
        seen = {tuple(sorted(t[0].items())) for t in trials}
        props = []
        for idx in order:
            c = _gp_decode(space, cloud[idx])
            key = tuple(sorted({k: str(v) for k, v in c.items()}.items()))
            if key in seen:
                continue
            seen.add(key)
            props.append(c)
            if len(props) == batch:
                break
        if not props:  # space exhausted (tiny discrete spaces)
            break
        rows = [{k: str(v) for k, v in c.items()} for c in props]
        _run(rows if pass_rows else spark.createDataFrame(rows))
    best = min(trials, key=lambda t: t[1])
    return best[0], best[1], trials


def _norm_pdf(z):
    import numpy as np

    return np.exp(-0.5 * z * z) / np.sqrt(2 * np.pi)


def _norm_cdf(z):
    import math

    import numpy as np

    return 0.5 * (1.0 + np.vectorize(math.erf)(np.asarray(z) / math.sqrt(2.0)))


# --------------------------------------------------------------------------
# Sobol sequence — the reference's RANDOM_SEARCH_SOBOL strategy proper
# (kats/consts.py:1354; ax-platform Sobol backend in
# time_series_parameter_tuning.py).  Gray-code Sobol with the classic
# Joe-Kuo/Bratley-Fox primitive polynomials and initial direction numbers
# for the first 10 dimensions (public tables), plus an optional seeded
# digital shift (XOR scramble) that preserves the (t, m, s)-net
# structure.  Fully deterministic: tuned results replay bit-identically.
# --------------------------------------------------------------------------

# (s, a, m): polynomial degree, coefficient bits, initial m values —
# first entries of the public new-joe-kuo-6 table
_SOBOL_DIRS = [
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
    (5, 4, [1, 1, 5, 5, 5]),
    (5, 7, [1, 1, 7, 11, 19]),
]
_SOBOL_BITS = 32


def _sobol_direction_numbers(dim_index: int) -> list[int]:
    """v[k] (k = 0..31) for one dimension; dim 0 is van der Corput."""
    if dim_index == 0:
        return [1 << (_SOBOL_BITS - 1 - k) for k in range(_SOBOL_BITS)]
    s, a, m = _SOBOL_DIRS[dim_index - 1]
    v = [0] * _SOBOL_BITS
    for k in range(s):
        v[k] = m[k] << (_SOBOL_BITS - 1 - k)
    for k in range(s, _SOBOL_BITS):
        v[k] = v[k - s] ^ (v[k - s] >> s)
        for i in range(1, s):
            if (a >> (s - 1 - i)) & 1:
                v[k] ^= v[k - i]
    return v


def sobol_points(n: int, dim: int, seed: int = 0) -> list[list[float]]:
    """First ``n`` points of the ``dim``-dimensional Sobol sequence in
    [0, 1)^dim (Gray-code order, the point at index 0 is the second
    sequence element so no candidate sits at the origin).  ``seed`` != 0
    applies a seeded digital shift per dimension."""
    import numpy as np

    if dim > len(_SOBOL_DIRS) + 1:
        raise ValueError(f"at most {len(_SOBOL_DIRS) + 1} Sobol dimensions supported")
    vs = [_sobol_direction_numbers(d) for d in range(dim)]
    shift = [0] * dim
    if seed:
        rng = np.random.default_rng(seed)
        shift = [int(rng.integers(0, 1 << _SOBOL_BITS)) for _ in range(dim)]
    x = [0] * dim
    out = []
    denom = float(1 << _SOBOL_BITS)
    for i in range(n):
        # lowest zero bit of i (Gray-code step)
        c, ii = 0, i
        while ii & 1:
            ii >>= 1
            c += 1
        for d in range(dim):
            x[d] ^= vs[d][c]
        out.append([((x[d] ^ shift[d]) / denom) for d in range(dim)])
    return out


def sobol_df(spark, space: list[dict], n: int, seed: int = 0):
    """Sobol candidate DataFrame over the search space — same contract
    as ``quasirandom_df`` (choice params index-mapped, continuous ranges
    linear or log), strictly better space-filling than Halton in low
    dimensions.  Tiny literal metadata; broadcasts against the series
    side."""
    import math

    pts = sobol_points(n, len(space), seed=seed)
    rows = []
    for k in range(n):
        row = {}
        for d, p in enumerate(space):
            u = pts[k][d]
            if "values" in p:
                vals = p["values"]
                row[p["name"]] = str(vals[min(int(u * len(vals)), len(vals) - 1)])
            else:
                lo, hi = p["bounds"]
                if p.get("log"):
                    v = math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
                else:
                    v = lo + u * (hi - lo)
                row[p["name"]] = str(v)
        rows.append(row)
    return spark.createDataFrame(rows)
