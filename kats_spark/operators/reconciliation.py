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
