"""Anomaly post-processing: severity scoring + 4-way classification.

Parity with kats/detectors/anomaly_postprocessing.py:23-538
(``AnomalyPostProcessHandler``): given per-point anomaly scores, group
consecutive flagged points into episodes and classify each as
``individual`` (single point), ``level_shift`` (sustained mean move in
one direction), ``volatility`` (sustained but sign-alternating), or
``trend`` (scores monotonically growing) — with a severity =
max |score| * sqrt(duration).

Pure expressions: episode grouping is the run-length sessionization trick
(cumulative sum of gap flags), classification is aggregates over each
episode.  Downstream of ANY scorer producing (series_id, time, score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def classify_anomalies(
    scores: DataFrame,
    score_col: str = "score",
    threshold: float = 3.0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, episode_start, episode_end, n_points, severity, kind).

    kind: individual | level_shift | volatility | trend.
    """
    sc = F.col(score_col)
    # NULL scores (warm-up regions) must flag as 0, not NULL — a NULL flag
    # would break the run-length grouping across gaps
    flagged = scores.withColumn(
        "__flag", F.when(F.abs(sc) >= threshold, 1).otherwise(0)
    )
    w = s.w()
    # episode id: cumulative count of "starts" (flagged with unflagged
    # predecessor) over flagged rows only
    prev = F.lag("__flag", 1, 0).over(w)
    ep = flagged.withColumn(
        "__start", ((F.col("__flag") == 1) & (prev == 0)).cast("int")
    ).withColumn("__ep", F.sum("__start").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    eps = ep.filter(F.col("__flag") == 1)

    sgn = F.signum(sc)
    prev_sgn = F.lag(sgn, 1).over(Window.partitionBy(s.series_id, "__ep").orderBy(s.time))
    prev_abs = F.lag(F.abs(sc), 1).over(
        Window.partitionBy(s.series_id, "__ep").orderBy(s.time)
    )
    enriched = eps.withColumn(
        "__flip", F.when(prev_sgn.isNotNull() & (sgn != prev_sgn), 1).otherwise(0)
    ).withColumn(
        "__grow",
        F.when(prev_abs.isNotNull() & (F.abs(sc) > prev_abs), 1).otherwise(0),
    )
    g = enriched.groupBy(s.series_id, "__ep").agg(
        F.min(s.time).alias("episode_start"),
        F.max(s.time).alias("episode_end"),
        F.count("*").cast("bigint").alias("n_points"),
        F.max(F.abs(sc)).alias("__max_abs"),
        F.sum("__flip").alias("__flips"),
        F.sum("__grow").alias("__grows"),
    )
    n = F.col("n_points")
    kind = (
        F.when(n == 1, F.lit("individual"))
        .when(F.col("__flips") >= (n - 1) * 0.5, F.lit("volatility"))
        .when(F.col("__grows") >= (n - 1) * 0.8, F.lit("trend"))
        .otherwise(F.lit("level_shift"))
    )
    return g.select(
        s.series_id,
        "episode_start",
        "episode_end",
        "n_points",
        (F.col("__max_abs") * F.sqrt(n.cast("double"))).alias("severity"),
        kind.alias("kind"),
    )


def interval_second_len(start_col: str = "episode_start", end_col: str = "episode_end"):
    """``IntervalAnomaly.second_len`` (kats/consts.py:1323): interval
    length in seconds as a column expression."""
    return F.unix_timestamp(F.col(end_col)) - F.unix_timestamp(F.col(start_col))


def get_last_n(df: DataFrame, n: int, s: TSSchema = DEFAULT) -> DataFrame:
    """``AnomalyResponse.get_last_n`` (kats/detectors/detector_consts.py:692):
    the trailing ``n`` rows of every series, via a tail row_number window —
    one exchange, no collect."""
    w = Window.partitionBy(s.series_id).orderBy(F.col(s.time).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
