"""Global direct-multi-step (DMS) forecaster: ONE pooled model over ALL
series, one output head per horizon.

Parity target: the reference's global model family
(kats/models/globalmodel/model.py:35 — one RNN trained across many
series, decoding all horizons at once).  The torch backend is absent, so
this is the closed-form member of that family: per-series z-scores
(population sd — the reference normalizes per-series windows too), a
pooled linear map from the last ``p`` standardized lags to each of the
``H`` horizons, fit by least squares on EVERY (series, t) training row
at once.

Scale shape (the whole point of global models): the training pass is ONE
aggregation — map-side partial sums of the (p+1)x(p+1) normal matrix and
the H right-hand sides, a single tiny reduce, a driver-side
(p+1)x(p+1+H) pivot-free Gauss-Jordan (microseconds), and a broadcast of
(p+1)xH coefficients back into a per-series forecast expression.  No
per-series fit, no iteration, no shuffle beyond the one series-keyed
window pass.  Direct multi-horizon also avoids recursive error
compounding (the DMS-vs-IMS tradeoff from the forecasting literature).

Every step is deterministic closed-form arithmetic -> full DuckDB oracle
(plans/queries2.py replays the z-scores, pooled sums, the identical
Gauss-Jordan elimination order, and the de-standardized heads).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.operators.var import _gauss_solve_multi
from kats_spark.tsframe import TSSchema, DEFAULT


def global_dms_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    p: int = 4,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, fcst) — ``steps`` direct-horizon forecasts per
    series from one pooled linear model."""
    spark = df.sparkSession
    w = s.w()

    stats = df.groupBy(s.series_id).agg(
        F.avg(s.value).alias("__mu"),
        F.sqrt(F.avg(F.col(s.value) * F.col(s.value)) - F.avg(s.value) * F.avg(s.value)).alias("__sd0"),
        F.max(s.time).alias("__tmax"),
        F.count("*").alias("__n"),
    ).withColumn("__sd", F.when(F.col("__sd0") > 0, F.col("__sd0")).otherwise(F.lit(1.0)))

    z = (F.col(s.value) - F.col("__mu")) / F.col("__sd")
    base = df.join(F.broadcast(stats), s.series_id).withColumn("__z", z)
    lag_cols = {f"__l{i}": F.lag("__z", i).over(w) for i in range(1, p)}
    lead_cols = {f"__t{h}": F.lead("__z", h).over(w) for h in range(1, steps + 1)}
    feat = base.withColumns({**lag_cols, **lead_cols})

    # training rows: all p lags AND all H targets present
    cond = F.lit(True)
    for i in range(1, p):
        cond = cond & F.col(f"__l{i}").isNotNull()
    for h in range(1, steps + 1):
        cond = cond & F.col(f"__t{h}").isNotNull()
    train = feat.filter(cond)

    regs = [F.lit(1.0)] + [F.col("__z")] + [F.col(f"__l{i}") for i in range(1, p)]
    m = p + 1
    aggs = []
    for r in range(m):
        for c in range(m):
            aggs.append(F.sum(regs[r] * regs[c]).alias(f"__a_{r}_{c}"))
        for h in range(1, steps + 1):
            aggs.append(F.sum(regs[r] * F.col(f"__t{h}")).alias(f"__b_{r}_{h}"))
    row = train.agg(*aggs).first()
    if row is None or row[f"__a_{0}_{0}"] is None:
        return spark.createDataFrame(
            [], f"{s.series_id} string, {s.time} timestamp, fcst double"
        )
    A = np.array([[row[f"__a_{r}_{c}"] for c in range(m)] for r in range(m)])
    B = np.array([[row[f"__b_{r}_{h}"] for h in range(1, steps + 1)] for r in range(m)])
    W = _gauss_solve_multi(A, B)  # (m, H)

    # last p standardized values per series -> H head dot products
    rn_desc = F.row_number().over(
        Window.partitionBy(s.series_id).orderBy(F.desc(s.time))
    )
    tail = (
        base.withColumn("__rnd", rn_desc)
        .filter(F.col("__rnd") <= p)
        .groupBy(s.series_id)
        .agg(
            *[
                F.first(F.when(F.col("__rnd") == i + 1, F.col("__z")), ignorenulls=True).alias(f"__zl{i}")
                for i in range(p)
            ],
            F.first("__mu").alias("__mu"),
            F.first("__sd").alias("__sd"),
            F.first("__tmax").alias("__tmax"),
            F.first("__n").alias("__n"),
        )
        .filter(F.col("__n") >= p)
    )
    # one row per (series, horizon) via a single explode — NOT a union of
    # H selects (that plans H separate joins/jobs)
    entries = []
    for h in range(1, steps + 1):
        zhat = F.lit(float(W[0, h - 1]))
        # regs order: [1, z_t, z_{t-1}, ...] and __zl0 is the LAST value
        for i in range(p):
            zhat = zhat + F.lit(float(W[i + 1, h - 1])) * F.col(f"__zl{i}")
        entries.append(
            F.struct(
                F.lit(h).alias("__h"),
                (F.col("__mu") + F.col("__sd") * zhat).alias("__f"),
            )
        )
    return (
        tail.select(s.series_id, "__tmax", F.explode(F.array(*entries)).alias("__e"))
        .select(
            s.series_id,
            F.expr(
                f"timestampadd(SECOND, __e.__h * {int(freq_seconds)}, __tmax)"
            ).alias(s.time),
            F.col("__e.__f").alias("fcst"),
        )
    )
