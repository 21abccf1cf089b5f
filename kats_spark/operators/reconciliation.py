"""Temporal hierarchical reconciliation.

Parity with kats/models/reconciliation/thm.py:50
(``TemporalHierarchicalModel``) and base_models.py:43,94
(``GetAggregateTS``): build the k-aggregated series (non-overlapping
blocks of k base steps summed), forecast every level, and reconcile so
the levels cohere.  Bottom-up (``method="bu"``): the aggregate forecast
is REPLACED by the sum of base-level forecasts within each block —
guaranteed coherent, no matrix inverse needed (thm.py supports bu/ols/
struc variants; bu is the exactly-SQL-expressible one, the GLS variants
drop into the same shape with a numpy UDF on the tiny per-series matrix).

Everything is expression-based: block aggregation is a floor-division
groupBy, forecasts are the closed-form linear model, the coherence join
is block_index = (h-1) // k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.operators.trend import linear_forecast
from kats_spark.tsframe import TSSchema, DEFAULT


def aggregate_series(df: DataFrame, k: int, s: TSSchema = DEFAULT) -> DataFrame:
    """GetAggregateTS (base_models.py:94): sum non-overlapping blocks of k
    steps; block timestamp = first timestamp in the block.  Trailing
    partial blocks are dropped (reference truncates to full blocks)."""
    rn = F.row_number().over(s.w()) - 1
    n = F.count("*").over(Window.partitionBy(s.series_id))
    blocked = df.withColumn("__blk", F.floor(rn / k)).withColumn(
        "__full", (F.floor((n - (n % k)) / k))
    )
    return (
        blocked.filter(F.col("__blk") < F.col("__full"))
        .groupBy(s.series_id, "__blk")
        .agg(F.min(s.time).alias(s.time), F.sum(s.value).alias(s.value))
        .select(s.series_id, s.time, s.value)
    )


def bottom_up_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    k: int,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Reconciled two-level forecast: base level forecast ``steps`` ahead
    (closed-form linear), aggregate level = block sums of the base
    forecasts.  Output: (series_id, level, time, fcst) with level in
    {'base', 'agg'} — coherent by construction (thm.py bottom-up)."""
    base_fc = linear_forecast(df, steps, freq_seconds, s=s).select(
        s.series_id, s.time, "fcst"
    )
    w = Window.partitionBy(s.series_id).orderBy(s.time)
    base_h = base_fc.withColumn("__h", F.row_number().over(w) - 1)
    n_blocks = steps // k
    agg_fc = (
        base_h.withColumn("__blk", F.floor(F.col("__h") / k))
        .filter(F.col("__blk") < n_blocks)
        .groupBy(s.series_id, "__blk")
        .agg(F.min(s.time).alias(s.time), F.sum("fcst").alias("fcst"))
        .select(s.series_id, F.lit("agg").alias("level"), s.time, "fcst")
    )
    base_out = base_fc.select(s.series_id, F.lit("base").alias("level"), s.time, "fcst")
    return base_out.unionByName(agg_fc)


def struc_g_matrix(k: int) -> list[list[float]]:
    """The "struc" GLS reconciliation projection for a two-level temporal
    hierarchy (thm.py:50 method='struc'): S = [1ᵀ; I_k] (aggregate = sum
    of the k base steps), W = diag(#leaves) = diag(k, 1, …, 1), and

        G = (Sᵀ W⁻¹ S)⁻¹ Sᵀ W⁻¹            (k × (k+1))

    so reconciled base = G · [agg_fcst; base_fcst_1..k].  Computed once
    driver-side with numpy on the tiny (k+1) system and inlined into BOTH
    the Spark plan and the DuckDB oracle as float literals — the same
    constants-as-literals trick as the LSH planes."""
    import numpy as np

    S = np.vstack([np.ones((1, k)), np.eye(k)])
    lam = np.diag([1.0 / k] + [1.0] * k)  # W⁻¹
    G = np.linalg.inv(S.T @ lam @ S) @ S.T @ lam
    return [[float(x) for x in row] for row in G]


def struc_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    k: int,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """GLS-reconciled two-level forecast: forecast BOTH levels
    independently (base: ``steps`` ahead; aggregate series: ``steps//k``
    blocks ahead), then project onto the coherent subspace with the
    struc-weighted G matrix.  Unlike bottom-up, the aggregate-level
    forecast influences the reconciled base values.

    Plan shape: the per-block base forecasts gather into one array row per
    (series, block) — a series_id-partitioned agg — joined to the
    aggregate forecast of the same block; the k reconciled values are k
    literal-coefficient dot products, exploded back to long form.  Zero
    UDFs, and the G constants make the whole thing oracle-checkable."""
    n_blocks = steps // k
    G = struc_g_matrix(k)
    base_fc = linear_forecast(df, steps, freq_seconds, s=s).select(
        s.series_id, s.time, "fcst"
    )
    w = Window.partitionBy(s.series_id).orderBy(s.time)
    base_h = (
        base_fc.withColumn("__h", F.row_number().over(w) - 1)
        .withColumn("__blk", F.floor(F.col("__h") / k))
        .withColumn("__pos", F.col("__h") % k)
        .filter(F.col("__blk") < n_blocks)
    )
    wide = base_h.groupBy(s.series_id, "__blk").agg(
        F.min(s.time).alias(s.time),
        F.array_sort(F.collect_list(F.struct("__pos", "fcst"))).alias("__pf"),
    )
    agg_fc = linear_forecast(
        aggregate_series(df, k, s), n_blocks, freq_seconds * k, s=s
    ).select(
        s.series_id,
        (F.row_number().over(w) - 1).alias("__blk"),
        F.col("fcst").alias("__afcst"),
    )
    j = wide.join(agg_fc, [s.series_id, "__blk"])
    bvec = F.col("__pf.fcst")
    recon = []
    for i in range(k):
        expr = F.lit(G[i][0]) * F.col("__afcst")
        for jj in range(k):
            expr = expr + F.lit(G[i][jj + 1]) * F.element_at(bvec, jj + 1)
        recon.append(expr.alias(f"__b{i}"))
    rc = j.select(s.series_id, "__blk", s.time, F.col("__afcst"), *recon)
    base_rows = rc.select(
        s.series_id,
        F.lit("base").alias("level"),
        "__blk",
        F.posexplode(F.array(*[F.col(f"__b{i}") for i in range(k)])).alias(
            "__pos", "fcst"
        ),
        F.col(s.time).alias("__t0"),
    ).select(
        s.series_id,
        "level",
        F.timestamp_seconds(
            F.unix_timestamp("__t0") + F.col("__pos") * freq_seconds
        ).alias(s.time),
        "fcst",
    )
    agg_rows = rc.select(
        s.series_id,
        F.lit("agg").alias("level"),
        F.col(s.time),
        sum([F.col(f"__b{i}") for i in range(1, k)], F.col("__b0")).alias("fcst"),
    )
    return base_rows.unionByName(agg_rows)


def _w_matrix(res_rows: "np.ndarray", method: str, k: int, eps: float = 1e-5):
    """W for the GLS projection from the (k+1) x n_blocks residual
    matrix (row 0 = aggregate, rows 1..k = base positions) — the five
    weight schemes of thm.py:get_W (struc/svar/hvar/mint_sample/
    mint_shrink, public MinT methodology: Wickramasuriya et al. 2019).
    Returns (W, is_diag)."""
    import numpy as np

    if method == "struc":
        return np.array([float(k)] + [1.0] * k), True
    if method == "svar":
        # per-LEVEL mean squared residual: one value for the aggregate
        # row, one shared value for all base rows
        agg_v = float(np.nanmean(res_rows[0] ** 2)) + eps
        base_v = float(np.nanmean(res_rows[1:] ** 2)) + eps
        return np.array([agg_v] + [base_v] * k), True
    if method == "hvar":
        return np.nanvar(res_rows, axis=1) + eps, True
    if method in ("mint_sample", "mint_shrink"):
        cov = np.cov(res_rows)
        if method == "mint_shrink":
            sqrt = np.sqrt(np.diag(cov))
            cor = ((cov / sqrt).T) / sqrt
            mask = ~np.eye(cor.shape[0], dtype=bool)
            off = cor[mask]
            denom = float(np.sum(off**2))
            lam = float(np.var(off) / denom) if denom > 0 else 0.0
            lam = min(max(lam, 0.0), 1.0)
            cov = np.diag(np.diag(cov)) * lam + (1.0 - lam) * cov
        cov = cov + np.eye(len(cov)) * eps
        return cov, False
    raise ValueError(f"unknown reconciliation method {method!r}")


def _g_from_w(W, is_diag: bool, k: int):
    """G = (S' W^-1 S)^-1 S' W^-1 for the two-level temporal hierarchy
    S = [1'; I_k].

    r12: the inverse and the solve use the pivot-free Gauss-Jordan
    (operators/var.py:28) instead of LAPACK's pivoted LU — W and
    S'W^-1S are positive definite (eps-ridged covariance / diagonal
    weights), the estimator is unchanged to ~1e-13, and the
    deterministic elimination order is what lets the mint_shrink oracle
    (plans/mint_oracle.py) replay the projection exactly."""
    import numpy as np

    from kats_spark.operators.var import _gauss_solve_multi

    S = np.vstack([np.ones((1, k)), np.eye(k)])
    Winv = (
        np.diag(1.0 / W)
        if is_diag
        else _gauss_solve_multi(W, np.eye(len(W)))
    )
    return _gauss_solve_multi(S.T @ Winv @ S, S.T @ Winv)


def reconcile_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    k: int,
    method: str = "mint_shrink",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Generalized GLS-reconciled two-level forecast — the full weight-
    method surface of the reference (struc / svar / hvar / mint_sample /
    mint_shrink).  Unlike ``struc_forecast`` (whose W is data-free and
    therefore literal/oracle-able), the data-driven W comes from each
    series' own base-model residuals, so everything runs per series in
    ONE ``applyInPandas`` task: closed-form linear fits at both levels,
    residual matrix over full blocks, W per ``method``, the (k+1) GLS
    projection, coherent output.

    Output (series_id, level, time, fcst): reconciled base steps and
    block aggregates; coherence (agg == sum of its k base values) holds
    by construction for every method."""
    import numpy as np
    import pandas as pd

    schema = f"{s.series_id} string, level string, {s.time} timestamp, fcst double"
    n_blocks = steps // k

    def _ols_fit(y):
        # centered-sums closed form (was np.polyfit's SVD — same fit to
        # ~1e-13, SQL-replayable op order for the mint_shrink oracle)
        t = np.arange(len(y), dtype=float)
        tm = t.mean()
        b = float(np.dot(t - tm, y)) / float(np.dot(t - tm, t - tm))
        a = float(y.mean()) - b * tm
        return a, b  # intercept, slope

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        n_full = (len(y) // k) * k
        if n_full < 3 * k or n_blocks < 1:
            return pd.DataFrame(columns=[s.series_id, "level", s.time, "fcst"])
        yb = y[:n_full]
        agg = yb.reshape(-1, k).sum(1)
        # closed-form fits + in-sample residuals
        a_b, b_b = _ols_fit(y)
        base_resid = y - (a_b + b_b * np.arange(len(y)))
        a_a, b_a = _ols_fit(agg)
        agg_resid = agg - (a_a + b_a * np.arange(len(agg)))
        nb = len(agg)
        res_rows = np.vstack(
            [agg_resid[None, :], base_resid[:n_full].reshape(-1, k).T]
        )
        W, is_diag = _w_matrix(res_rows, method, k)
        G = _g_from_w(W, is_diag, k)
        # base forecasts for steps, aggregate forecasts for the blocks
        h = np.arange(1, steps + 1)
        base_fc = a_b + b_b * (len(y) - 1 + h)
        agg_fc = a_a + b_a * (nb - 1 + np.arange(1, n_blocks + 1))
        last_t = pd.Timestamp(pdf[s.time].iloc[-1])
        times = last_t + pd.to_timedelta(h * freq_seconds, unit="s")
        rows = []
        sid = str(pdf[s.series_id].iloc[0])
        for blk in range(n_blocks):
            yhat = np.concatenate(
                [[agg_fc[blk]], base_fc[blk * k : (blk + 1) * k]]
            )
            recon_base = G @ yhat
            for j in range(k):
                rows.append(
                    (sid, "base", times[blk * k + j], float(recon_base[j]))
                )
            rows.append(
                (sid, "agg", times[blk * k], float(recon_base.sum()))
            )
        return pd.DataFrame(rows, columns=[s.series_id, "level", s.time, "fcst"])

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )
