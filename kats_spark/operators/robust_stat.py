"""RobustStat detector: smoothed z-score of lagged differences.

Parity with kats/detectors/robust_stat_detection.py:45-127: the reference
(1) smooths the series with a centered moving average (p1), (2) takes
lag-d differences of the smoothed series, (3) z-scores the differences
robustly using median and MAD-scaled IQR, (4) flags |z| above a p-value
threshold.  All four steps are window/aggregate expressions here; the
normal-CDF p-value uses ``erf`` which Spark lacks as a builtin, so we emit
the z-score and a boolean flag at a z threshold (caller converts, or uses
the numpy helper in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def robust_stat_scores(
    df: DataFrame,
    smoothing_window: int = 5,
    lag_diff: int = 1,
    z_threshold: float = 3.0,
    p_value_cutoff: float | None = None,
    s: TSSchema = DEFAULT,
    include_metric: bool = False,
) -> DataFrame:
    """(series_id, time, robust_z, is_changepoint).

    ``p_value_cutoff`` mirrors the reference gate exactly
    (robust_stat_detection.py:58,81: flag when norm.sf(|z|) < cutoff):
    it overrides ``z_threshold`` with norm_ppf(1 - cutoff), computed
    driver-side — same decision boundary, no erf needed in the plan.

    ``include_metric`` appends the reference's changepoint ``metric``
    (robust_stat_detection.py:101: the smoothed-diff value at the
    point) — opt-in so the long-standing oracled output schema stays
    frozen; the TsFeatures robust_stat_detector group consumes it for
    ``robust_metric_mean``."""
    if p_value_cutoff is not None:
        from kats_spark.operators.interval import norm_ppf

        z_threshold = float(norm_ppf(1.0 - p_value_cutoff))
    half = (smoothing_window - 1) // 2
    w_smooth = s.w().rowsBetween(-half, smoothing_window - 1 - half)
    smoothed = F.avg(s.value).over(w_smooth)

    d = df.withColumn("__sm", smoothed).withColumn(
        "__d", F.col("__sm") - F.lag("__sm", lag_diff).over(s.w())
    )
    stats = d.filter(F.col("__d").isNotNull()).groupBy(s.series_id).agg(
        F.median("__d").alias("__med"),
        F.percentile(F.col("__d"), F.lit(0.75)).alias("__q3"),
        F.percentile(F.col("__d"), F.lit(0.25)).alias("__q1"),
    )
    # robust sigma: IQR / 1.349 (normal-consistent, as the reference's
    # iqr-based scale)
    sigma = (F.col("__q3") - F.col("__q1")) / 1.349
    out = (
        d.join(stats, s.series_id)
        .withColumn("robust_z", F.when(sigma > 0, (F.col("__d") - F.col("__med")) / sigma))
        .withColumn("is_changepoint", (F.abs(F.col("robust_z")) > z_threshold).cast("int"))
    )
    cols = [s.series_id, s.time, s.value, "robust_z", "is_changepoint"]
    if include_metric:
        out = out.withColumn("metric", F.col("__d"))
        cols.append("metric")
    return out.select(*cols)
