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
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """In-sample ``step``-ahead nowcast: (series_id, time, value, target,
    prediction) — deterministic given ``seed``."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    feats, names = make_ta_features(df, s)
    labeled = feats.withColumn("target", F.lead(s.value, step).over(s.w())).dropna(
        subset=["target"]
    )
    vec = VectorAssembler(inputCols=names, outputCol="features", handleInvalid="skip")
    assembled = vec.transform(labeled)
    gbt = GBTRegressor(
        featuresCol="features", labelCol="target", maxIter=max_iter, maxDepth=4,
        seed=seed,
    )
    model = gbt.fit(assembled)
    return model.transform(assembled).select(
        s.series_id, s.time, s.value, "target", "prediction"
    )
