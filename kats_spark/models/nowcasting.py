"""Nowcasting: GBT regression on technical-analysis features.

Parity with kats/models/nowcasting/nowcasting.py:36-840 (Nowcasting /
NowcastingPlus / DynamicNowcasting: LightGBM over the ROC/MOM/MA/LAG
feature block of feature_extraction.py).  Spark-first: the TA features
are the window expressions in functions/ta.py computed over ALL series in
one pass, and the model is one global MLlib GBTRegressor (LightGBM's
role), predicting ``step`` ahead — the same global-model pattern as ML_AR
but with the nowcasting feature block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.functions import ta
from kats_spark.tsframe import TSSchema, DEFAULT

_WINDOWS = [2, 5, 10]


def make_ta_features(df: DataFrame, s: TSSchema = DEFAULT) -> tuple[DataFrame, list[str]]:
    """ROC/MOM/MA/LAG feature block (feature_extraction.py:25-117) as a
    wide frame; one per-series sort serves every window."""
    cols: dict[str, F.Column] = {}
    for n in _WINDOWS:
        cols[f"roc_{n}"] = ta.roc(n, s)
        cols[f"mom_{n}"] = ta.mom(n, s)
        cols[f"ma_{n}"] = ta.ma(n, s)
        cols[f"lag_{n}"] = ta.lag_feature(n, s)
    out = df.withColumns(cols)
    names = list(cols.keys())
    return out.dropna(subset=names), names


def nowcast(
    df: DataFrame,
    step: int = 1,
    max_iter: int = 20,
    seed: int = 7,
    regressor: str = "gbt",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """In-sample ``step``-ahead nowcast: (series_id, time, value, target,
    prediction) — deterministic given ``seed``.

    ``regressor`` selects the reference's three nowcasting variants over
    the SAME feature block:
    - 'gbt'    — Nowcasting (nowcasting.py, LightGBM's role)
    - 'rf'     — DynamicNowcasting (dynamic_nowcasting.py:99-120,
                 sklearn RandomForestRegressor's role)
    - 'linear' — NowcastingPlus (nowcastingplus.py:52-63: LinearRegression
                 over TA features + the poly(x, n) powers of the value)
    All three are one distributed MLlib fit — tree ensembles and the
    normal-equation solve both scale as treeAggregate passes.
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import (
        GBTRegressor,
        LinearRegression,
        RandomForestRegressor,
    )

    feats, names = make_ta_features(df, s)
    if regressor == "linear":
        # NowcastingPlus's poly features: value^2, value^3
        feats = feats.withColumn("poly_2", F.col(s.value) * F.col(s.value))
        feats = feats.withColumn("poly_3", F.col("poly_2") * F.col(s.value))
        names = names + ["poly_2", "poly_3"]
    labeled = feats.withColumn("target", F.lead(s.value, step).over(s.w())).dropna(
        subset=["target"]
    )
    vec = VectorAssembler(inputCols=names, outputCol="features", handleInvalid="skip")
    assembled = vec.transform(labeled)
    if regressor == "gbt":
        est = GBTRegressor(
            featuresCol="features", labelCol="target", maxIter=max_iter,
            maxDepth=4, seed=seed,
        )
    elif regressor == "rf":
        est = RandomForestRegressor(
            featuresCol="features", labelCol="target", numTrees=max_iter,
            maxDepth=4, seed=seed,
        )
    elif regressor == "linear":
        est = LinearRegression(featuresCol="features", labelCol="target")
    else:
        raise ValueError(f"unknown regressor {regressor!r}")
    model = est.fit(assembled)
    return model.transform(assembled).select(
        s.series_id, s.time, s.value, "target", "prediction"
    )
