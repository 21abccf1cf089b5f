"""Metalearners: predictability check + model selection on TsFeatures.

Parity with kats/models/metalearner/metalearner_predictability.py:31
(classify whether a series is forecastable from its feature vector) and
metalearner_modelselect.py:38 (recommend a model per series).  The
reference trains sklearn/torch classifiers offline; this container has
neither, so both metalearners use a nearest-centroid rule over the SAME
feature space — the Spark plan (feature extraction at scale → broadcast
tiny model → one scoring pass) is identical for any pluggable scorer.

- ``predictability``: label = whether the closed-form linear backtest
  beats the naive last-value forecast; train centroids on a labeled
  sample, score every series with one broadcast join.
- ``model_select``: run K cheap candidate models' backtests (each a
  distributed plan), argmin per series — the exhaustive fallback the
  reference's classifier approximates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def predictability_labels(
    df: DataFrame,
    spec: DataFrame,
    threshold: float = 1.0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, predictable): linear-model backtest MAE vs naive
    last-value MAE; ratio < threshold -> predictable.  Fully closed-form
    (the training-label generator for the predictability metalearner)."""
    from kats_spark.operators.backtest import linear_backtest

    lin = (
        linear_backtest(df, spec, s)
        .groupBy(s.series_id)
        .agg(F.avg("mae").alias("lin_mae"))
    )
    w = s.w()
    naive_err = df.withColumn(
        "__naive_ae", F.abs(F.col(s.value) - F.lag(s.value, 1).over(w))
    )
    naive = naive_err.groupBy(s.series_id).agg(F.avg("__naive_ae").alias("naive_mae"))
    return (
        lin.join(naive, s.series_id)
        .withColumn(
            "predictable",
            (F.col("lin_mae") < threshold * F.col("naive_mae")).cast("int"),
        )
        .select(s.series_id, "lin_mae", "naive_mae", "predictable")
    )


def nearest_centroid_score(
    features: DataFrame,
    labeled: DataFrame,
    feature_cols: list[str],
    label_col: str = "predictable",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Nearest-centroid classifier: centroids from ``labeled`` (a tiny
    aggregate, broadcast), score every row of ``features``.  Features are
    standardized by the training stats so no dimension dominates."""
    stats = labeled.agg(
        *[F.avg(c).alias(f"__m_{c}") for c in feature_cols],
        *[F.stddev_samp(c).alias(f"__s_{c}") for c in feature_cols],
    )
    centroids = (
        labeled.crossJoin(F.broadcast(stats))
        .groupBy(label_col)
        .agg(
            *[
                F.avg(
                    (F.col(c) - F.col(f"__m_{c}"))
                    / F.greatest(F.col(f"__s_{c}"), F.lit(1e-9))
                ).alias(f"__c_{c}")
                for c in feature_cols
            ]
        )
    )
    centroids = centroids.withColumnRenamed(label_col, "__label")
    scored = features.crossJoin(F.broadcast(stats)).crossJoin(
        F.broadcast(centroids)
    )
    dist = None
    for c in feature_cols:
        z = (F.col(c) - F.col(f"__m_{c}")) / F.greatest(F.col(f"__s_{c}"), F.lit(1e-9))
        term = F.pow(z - F.col(f"__c_{c}"), 2)
        dist = term if dist is None else dist + term
    ranked = scored.withColumn("__dist", F.sqrt(dist)).withColumn(
        "__rk",
        F.row_number().over(Window.partitionBy(s.series_id).orderBy("__dist")),
    )
    return ranked.filter(F.col("__rk") == 1).select(
        s.series_id, F.col("__label").alias("predicted_label"), F.col("__dist").alias("distance")
    )


def model_select(
    df: DataFrame,
    spec: DataFrame,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, best_model, best_mae): exhaustive candidate backtest —
    linear trend vs naive last-value vs trailing-MA(8) one-step — argmin
    per series.  Each candidate is one distributed expression plan; the
    union is a model-as-group-key aggregation (the ensembles pattern)."""
    from kats_spark.operators.backtest import linear_backtest

    lin = (
        linear_backtest(df, spec, s)
        .groupBy(s.series_id)
        .agg(F.avg("mae").alias("mae"))
        .withColumn("model", F.lit("linear"))
    )
    w = s.w()
    naive = (
        df.withColumn("__ae", F.abs(F.col(s.value) - F.lag(s.value, 1).over(w)))
        .groupBy(s.series_id)
        .agg(F.avg("__ae").alias("mae"))
        .withColumn("model", F.lit("naive"))
    )
    ma_w = w.rowsBetween(-8, -1)
    ma = (
        df.withColumn(
            "__ae",
            F.when(
                F.count(s.value).over(ma_w) == 8,
                F.abs(F.col(s.value) - F.avg(s.value).over(ma_w)),
            ),
        )
        .groupBy(s.series_id)
        .agg(F.avg("__ae").alias("mae"))
        .withColumn("model", F.lit("ma8"))
    )
    allm = lin.unionByName(naive).unionByName(ma)
    return allm.groupBy(s.series_id).agg(
        F.min_by("model", F.struct(F.col("mae"), F.col("model"))).alias("best_model"),
        F.min("mae").alias("best_mae"),
    )
