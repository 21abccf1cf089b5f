"""STLF: decompose → forecast the deseasonalized series → re-seasonalize.

Parity with kats/models/stlf.py:57-432 (``STLFModel``: STL-decompose the
input, forecast the deseasonalized series with a base model
(prophet/linear/quadratic/theta), add the seasonal component back onto
the forecast horizon).

Spark-first composition — every stage is an existing distributed
operator: seasonal component = the MA-decomposition phase table
(broadcastable, period rows/series), deseasonalize = one broadcast join,
base forecast = the closed-form linear/quadratic trend model, and the
re-seasonalization joins the phase table onto forecast rows at phase
(n - 1 + h) mod period.  With the linear base the WHOLE pipeline is
closed-form expressions — DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.operators.decomposition import seasonal_table
from kats_spark.operators.trend import linear_forecast, quadratic_forecast
from kats_spark.tsframe import TSSchema, DEFAULT


def stlf_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    period: int,
    base: str = "linear",
    s: TSSchema = DEFAULT,
    method: str = "ma",
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper).

    ``method='stl'`` decomposes with loess STL (the reference STLFModel's
    actual backend, stlf.py:219-258) and deseasonalizes with the
    time-varying STL seasonal; the horizon is re-seasonalized with the
    LAST period of the seasonal component tiled forward
    (stlf.py:348-350), which is what the phase-keyed join below does
    when fed ``last_period_seasonal_table``.  The default 'ma' path is
    unchanged (phase-mean seasonal, exact DuckDB oracle)."""
    if method == "stl":
        from kats_spark.operators.decomposition import (
            decompose,
            last_period_seasonal_table,
        )

        dec = decompose(df, period, "additive", "stl", s)
        seas = last_period_seasonal_table(dec, period, s).persist()
        deseason = dec.select(
            s.series_id,
            s.time,
            (F.col(s.value) - F.col("seasonal")).alias(s.value),
        )
    else:
        # read twice (deseasonalize + re-seasonalize) — persist the tiny table
        seas = seasonal_table(df, period, "additive", s).persist()
        deseason = (
            df.withColumn("__rn", F.row_number().over(s.w()) - 1)
            .withColumn("__phase", F.col("__rn") % period)
            .join(F.broadcast(seas), [s.series_id, "__phase"], "left")
            .select(
                s.series_id,
                s.time,
                (F.col(s.value) - F.coalesce(F.col("seasonal"), F.lit(0.0))).alias(s.value),
            )
        )
    fc_fn = {"linear": linear_forecast, "quadratic": quadratic_forecast}[base]
    fc = fc_fn(deseason, steps, freq_seconds, s=s)
    n_tbl = df.groupBy(s.series_id).agg(F.count("*").alias("__n"))
    w = Window.partitionBy(s.series_id).orderBy(s.time)
    fc_h = (
        fc.withColumn("__h", F.row_number().over(w))
        .join(F.broadcast(n_tbl), s.series_id)
        .withColumn("__phase", (F.col("__n") - 1 + F.col("__h")) % period)
    )
    out = fc_h.join(F.broadcast(seas), [s.series_id, "__phase"], "left")
    sadd = F.coalesce(F.col("seasonal"), F.lit(0.0))
    return out.select(
        s.series_id,
        s.time,
        (F.col("fcst") + sadd).alias("fcst"),
        (F.col("fcst_lower") + sadd).alias("fcst_lower"),
        (F.col("fcst_upper") + sadd).alias("fcst_upper"),
    )
