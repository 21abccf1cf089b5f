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
