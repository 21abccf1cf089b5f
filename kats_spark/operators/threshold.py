"""Static threshold detector model.

Parity with kats/detectors/threshold_detector.py:19-107
(``StaticThresholdModel``): the AnomalyResponse ``scores`` series is a
copy of the input values and ``anomaly_magnitude_ts`` is all zeros —
thresholding itself is delegated downstream.  We keep that contract and
additionally expose the obvious vectorized thresholding step
(``apply_thresholds``) so the downstream consumer is also a pure
column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def static_threshold_scores(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """AnomalyResponse of StaticThresholdModel (threshold_detector.py:61-87):
    score = the value itself, magnitude = 0.  Narrow map-only projection —
    no shuffle, survives any scale."""
    return df.select(
        s.series_id,
        s.time,
        F.col(s.value).cast("double").alias("score"),
        F.lit(0.0).alias("magnitude"),
    )


def apply_thresholds(
    df: DataFrame,
    lower: float,
    upper: float,
    score_col: str = "score",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Flag score excursions outside [lower, upper] and report the signed
    distance to the violated bound."""
    sc = F.col(score_col)
    breach = F.when(sc > F.lit(upper), sc - F.lit(upper)).when(
        sc < F.lit(lower), sc - F.lit(lower)
    )
    return df.withColumn("is_anomaly", breach.isNotNull()).withColumn(
        "excess", F.coalesce(breach, F.lit(0.0))
    )
