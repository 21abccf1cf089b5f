"""Harmonic regression — closed-form distributed OLS on a Fourier basis.

Parity with kats/models/harmonic_regression.py:24-237
(``HarmonicRegressionModel``: fit_harmonics :187 builds a sin/cos design
matrix and least-squares fits it; the reference uses scipy optimize).
For one harmonic the model is y = a + b·sin(2πt/P) + c·cos(2πt/P) — the
3×3 normal equations solve in closed form with Cramer's rule over
moment sums, exactly like the quadratic trend model (trend.py): one
``groupBy(series_id).agg`` of sums, scalar algebra per series, zero UDFs,
DuckDB-oracle-checkable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054


def harmonic_fit(df: DataFrame, period: int, s: TSSchema = DEFAULT) -> DataFrame:
    """Per-series (a, b, c, mse, n, __tmax) for
    y = a + b·sin(2πx/P) + c·cos(2πx/P), x = 0-based row index."""
    x = (F.row_number().over(s.w()) - 1).cast("double")
    ang = 2.0 * math.pi * x / period
    sn, cs = F.sin(ang), F.cos(ang)
    y = F.col(s.value).cast("double")
    base = df.select(
        s.series_id, F.col(s.time),
        sn.alias("__s"), cs.alias("__c"), y.alias("__y"),
    )
    m = base.groupBy(s.series_id).agg(
        F.count("*").cast("double").alias("n"),
        F.sum("__s").alias("ss"),
        F.sum("__c").alias("sc"),
        F.sum(F.col("__s") ** 2).alias("ss2"),
        F.sum(F.col("__c") ** 2).alias("sc2"),
        F.sum(F.col("__s") * F.col("__c")).alias("ssc"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__s") * F.col("__y")).alias("ssy"),
        F.sum(F.col("__c") * F.col("__y")).alias("scy"),
        F.sum(F.col("__y") ** 2).alias("sy2"),
        F.max(s.time).alias("__tmax"),
    )
    n, ss, sc = (F.col(c) for c in ["n", "ss", "sc"])
    ss2, sc2, ssc = (F.col(c) for c in ["ss2", "sc2", "ssc"])
    sy, ssy, scy, sy2 = (F.col(c) for c in ["sy", "ssy", "scy", "sy2"])

    def det3(a1, a2, a3, b1, b2, b3, c1, c2, c3):
        return a1 * (b2 * c3 - b3 * c2) - a2 * (b1 * c3 - b3 * c1) + a3 * (b1 * c2 - b2 * c1)

    D = det3(n, ss, sc, ss, ss2, ssc, sc, ssc, sc2)
    Da = det3(sy, ss, sc, ssy, ss2, ssc, scy, ssc, sc2)
    Db = det3(n, sy, sc, ss, ssy, ssc, sc, scy, sc2)
    Dc = det3(n, ss, sy, ss, ss2, ssy, sc, ssc, scy)
    a, b, c = Da / D, Db / D, Dc / D
    sse = sy2 - a * sy - b * ssy - c * scy
    mse = sse / (n - 3)
    return m.select(
        s.series_id, "n",
        a.alias("a"), b.alias("b"), c.alias("c"),
        mse.alias("mse"), "__tmax",
    )


def harmonic_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    period: int,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper) — the model-zoo
    contract frame; band = fcst ± z·sqrt(mse·(1 + 1/n))."""
    fit = harmonic_fit(df, period, s)
    fut = fit.select("*", F.explode(F.sequence(F.lit(1), F.lit(steps))).alias("__h"))
    x = F.col("n") - 1 + F.col("__h")
    ang = 2.0 * math.pi * x / period
    t = F.timestamp_seconds(F.unix_timestamp("__tmax") + F.col("__h") * freq_seconds)
    fcst = F.col("a") + F.col("b") * F.sin(ang) + F.col("c") * F.cos(ang)
    se = F.sqrt(F.col("mse") * (1.0 + 1.0 / F.col("n")))
    return fut.select(
        s.series_id,
        t.alias(s.time),
        fcst.alias("fcst"),
        (fcst - Z95 * se).alias("fcst_lower"),
        (fcst + Z95 * se).alias("fcst_upper"),
    )
