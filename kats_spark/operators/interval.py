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
    test_statistic: str = "absolute",
    distribution: str = "normal",
    test_type: str = "two_sided",
    effect_size: float = 0.0,
) -> DataFrame:
    """Input wide frame: (series_id, time, value_a, variance_a,
    sample_count_a, value_b, variance_b, sample_count_b).
    Output adds (z_score, rejected).

    Mirrors the reference's full test surface, all as expressions:

    - ``distribution`` picks the per-sample variance model
      (interval_detector.py:1741-1785 normal approximations):
      ``normal`` = variance_x/n_x, ``binomial`` = p(1-p)/n (value is a
      proportion), ``poisson`` = λ/n (value is a count rate).
    - ``test_statistic``: ``absolute`` = (b - a - effect)/se
      (:1509-1563); ``relative`` = delta method on the log ratio,
      (log b - log a - log(1+effect)) / sqrt(va/a² + vb/b²) with the
      reference's 1e-9 clamps (:1566-1620).
    - ``test_type``: ``two_sided`` rejects |z| > threshold;
      ``one_sided_upper`` rejects z > threshold; ``one_sided_lower``
      rejects z < -threshold (TestType enum :255-258).
    """
    a, b = F.col("value_a"), F.col("value_b")
    if distribution == "normal":
        va = F.col("variance_a") / F.col("sample_count_a")
        vb = F.col("variance_b") / F.col("sample_count_b")
    elif distribution == "binomial":
        va = a * (F.lit(1.0) - a) / F.col("sample_count_a")
        vb = b * (F.lit(1.0) - b) / F.col("sample_count_b")
    elif distribution == "poisson":
        va = a / F.col("sample_count_a")
        vb = b / F.col("sample_count_b")
    else:
        raise ValueError(f"unknown distribution {distribution!r}")

    import math

    _EPS = 1.0e-9
    if test_statistic == "absolute":
        z = (b - a - F.lit(float(effect_size))) / F.sqrt(va + vb)
    elif test_statistic == "relative":
        diff = (
            F.log(F.greatest(b, F.lit(_EPS)))
            - F.log(F.greatest(a, F.lit(_EPS)))
            - F.lit(math.log(1.0 + effect_size))
        )
        se = F.sqrt(
            va / F.greatest(a * a, F.lit(_EPS * _EPS))
            + vb / F.greatest(b * b, F.lit(_EPS * _EPS))
        )
        z = diff / se
    else:
        raise ValueError(f"unknown test_statistic {test_statistic!r}")

    if test_type == "two_sided":
        rej = F.abs(z) > z_threshold
    elif test_type == "one_sided_upper":
        rej = z > z_threshold
    elif test_type == "one_sided_lower":
        rej = z < -z_threshold
    else:
        raise ValueError(f"unknown test_type {test_type!r}")
    out = df.withColumn("z_score", z)
    return out.withColumn("rejected", rej.cast("int"))


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
