"""Interval detector: pointwise two-sample tests + rejection-interval
consolidation.

Parity with kats/detectors/interval_detector.py:77-620
(``IntervalDetectorModel``): input is the TwoSampleSchema — two concurrent
series pre-joined wide per timestamp (value_a, variance_a, sample_count_a,
value_b, ...; :180-240).  Per point, a two-sample z statistic

    z = (value_b - value_a) / sqrt(variance_a/n_a + variance_b/n_b)

is compared to a critical value; consecutive rejections merge into
``IntervalAnomaly`` spans (:1-30 module docstring describes the
rejection-interval consolidation).  The reference solves a duration-based
critical value via scipy root finding; we expose the z threshold directly
(caller supplies it, e.g. 1.96 for alpha=.05 one-point tests).

Everything is expressions: the z-test is arithmetic, consolidation is the
classic gaps-and-islands window pattern — distributed, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def two_sample_scores(
    df: DataFrame,
    z_threshold: float = 1.96,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Input wide frame: (series_id, time, value_a, variance_a,
    sample_count_a, value_b, variance_b, sample_count_b).
    Output adds (z_score, rejected)."""
    se = F.sqrt(
        F.col("variance_a") / F.col("sample_count_a")
        + F.col("variance_b") / F.col("sample_count_b")
    )
    z = (F.col("value_b") - F.col("value_a")) / se
    return df.withColumn("z_score", z).withColumn(
        "rejected", (F.abs(F.col("z_score")) > z_threshold).cast("int")
    )


def consolidate_intervals(
    scored: DataFrame,
    min_len: int = 1,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Merge consecutive rejected points into (series_id, start_time,
    end_time, n_points, max_abs_z) intervals; keep intervals with at least
    ``min_len`` points (the duration-based control of
    interval_detector.py's consolidation)."""
    w = s.w()
    start_flag = F.when(
        (F.col("rejected") == 1)
        & (F.coalesce(F.lag("rejected").over(w), F.lit(0)) == 0),
        1,
    ).otherwise(0)
    runs = (
        scored.withColumn("__start", start_flag)
        .withColumn(
            "__grp",
            F.sum("__start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("rejected") == 1)
    )
    return (
        runs.groupBy(s.series_id, "__grp")
        .agg(
            F.min(s.time).alias("start_time"),
            F.max(s.time).alias("end_time"),
            F.count("*").alias("n_points"),
            F.max(F.abs(F.col("z_score"))).alias("max_abs_z"),
        )
        .filter(F.col("n_points") >= min_len)
        .drop("__grp")
    )
