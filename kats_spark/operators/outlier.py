"""Outlier detector: seasonal-decomposition residual IQR test.

Parity with kats/detectors/outlier.py:36-126 (``OutlierDetector``):
decompose (additive or multiplicative), take residuals, flag points whose
residual is outside [Q1 - iqr_mult*IQR, Q3 + iqr_mult*IQR] (default
iqr_mult=3).  The reference runs statsmodels seasonal_decompose on one
series; here the decomposition is the pure-window MA decompose and the IQR
gate is two exact percentiles per series — fully expression-based, one
shuffle, DuckDB-oracle-checkable.

Also ``outlier_remove`` — the ``remover`` interpolation path
(kats/detectors/detector.py:101): replace flagged points with NULL and
optionally linear-interpolate via the resample operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.operators.decomposition import decompose
from kats_spark.tsframe import TSSchema, DEFAULT


def outlier_detect(
    df: DataFrame,
    period: int,
    iqr_mult: float = 3.0,
    model: str = "additive",
    s: TSSchema = DEFAULT,
    method: str = "ma",
) -> DataFrame:
    """(series_id, time, value, residual, is_outlier).  ``method='stl'``
    runs the IQR rule on loess-STL residuals (the reference
    OutlierDetector's decomposition backend)."""
    dec = decompose(df, period, model, method, s)
    bounds = (
        dec.filter(F.col("residual").isNotNull())
        .groupBy(s.series_id)
        .agg(
            F.percentile(F.col("residual"), F.lit(0.25)).alias("__q1"),
            F.percentile(F.col("residual"), F.lit(0.75)).alias("__q3"),
        )
    )
    iqr = F.col("__q3") - F.col("__q1")
    lo = F.col("__q1") - iqr_mult * iqr
    hi = F.col("__q3") + iqr_mult * iqr
    return (
        dec.join(F.broadcast(bounds), s.series_id)
        .withColumn(
            "is_outlier",
            F.when(
                F.col("residual").isNotNull(),
                ((F.col("residual") < lo) | (F.col("residual") > hi)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .select(s.series_id, s.time, s.value, "residual", "is_outlier")
    )


def outlier_remove(
    df: DataFrame,
    period: int,
    iqr_mult: float = 3.0,
    s: TSSchema = DEFAULT,
    method: str = "ma",
) -> DataFrame:
    """Null out flagged outliers (caller can resample(method='linear') to
    re-fill, mirroring remover(interpolate=True))."""
    flagged = outlier_detect(df, period, iqr_mult, s=s, method=method)
    return flagged.select(
        s.series_id,
        s.time,
        F.when(F.col("is_outlier") == 0, F.col(s.value)).alias(s.value),
    )
