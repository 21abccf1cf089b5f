"""Forecast ensembles: median and weighted-average combination.

Parity with kats/models/ensemble/ensemble.py:31-176 (base fan-out via a
multiprocessing Pool :113-116), median_ensemble.py:24, and
weighted_avg_ensemble.py:30 (weights proportional to 1/backtest-error):
run N base models, align their forecast frames on (series_id, time), and
combine.

Spark-first shape: each base model is an independent lazy plan over the
SAME input scan; the combiner is a union with a ``model`` tag followed by
one ``groupBy(series_id, time)`` aggregation — the Pool becomes the
executor pool, and Catalyst reuses the shared input subplan.  Weighted
variant: per-(series, model) backtest MAE feeds weight = (1/mae) /
Σ(1/mae), a broadcast-joined tiny table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def tag(model_name: str, fc: DataFrame) -> DataFrame:
    return fc.withColumn("model", F.lit(model_name))


def median_ensemble(forecasts: list[DataFrame], s: TSSchema = DEFAULT) -> DataFrame:
    """Point-wise median of aligned forecast frames
    (median_ensemble.py:24): (series_id, time, fcst, fcst_lower,
    fcst_upper) with each column the median across models."""
    u = forecasts[0]
    for f in forecasts[1:]:
        u = u.unionByName(f)
    return u.groupBy(s.series_id, s.time).agg(
        F.median("fcst").alias("fcst"),
        F.median("fcst_lower").alias("fcst_lower"),
        F.median("fcst_upper").alias("fcst_upper"),
    )


def weighted_avg_ensemble(
    tagged_forecasts: DataFrame,
    model_errors: DataFrame,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """weights ∝ 1/error per (series_id, model)
    (weighted_avg_ensemble.py:30 ``_backtester_all`` → 1/mae weighting).

    ``tagged_forecasts``: union of forecast frames with a ``model`` column.
    ``model_errors``: (series_id, model, err) — e.g. backtest MAE.
    """
    wsum = model_errors.groupBy(s.series_id).agg(
        F.sum(1.0 / F.col("err")).alias("__wsum")
    )
    weights = (
        model_errors.join(wsum, s.series_id)
        .withColumn("weight", (1.0 / F.col("err")) / F.col("__wsum"))
        .select(s.series_id, "model", "weight")
    )
    return (
        tagged_forecasts.join(F.broadcast(weights), [s.series_id, "model"])
        .groupBy(s.series_id, s.time)
        .agg(
            F.sum(F.col("fcst") * F.col("weight")).alias("fcst"),
            F.sum(F.col("fcst_lower") * F.col("weight")).alias("fcst_lower"),
            F.sum(F.col("fcst_upper") * F.col("weight")).alias("fcst_upper"),
        )
    )
