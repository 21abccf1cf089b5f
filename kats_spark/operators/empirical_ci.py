"""Empirical confidence intervals from backtest errors.

Parity with kats/utils/emp_confidence_int.py (342 LoC): run a rolling
backtest, collect per-horizon absolute errors, fit OLS of error vs
horizon, and widen the model CI linearly in the horizon:
ci(h) = fcst(h) ± z * (intercept + slope * h).

Fully closed-form here: the backtest uses the closed-form linear trend
model (trend.py), per-horizon errors come out of the same
(series, fold) grouped pass, and the error-vs-horizon OLS is another
moment-sum aggregation.  Zero UDFs, two shuffles total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054


def horizon_errors(
    df: DataFrame,
    spec: DataFrame,
    s: TSSchema = DEFAULT,
    signed: bool = False,
) -> DataFrame:
    """Per (series_id, fold_id, horizon) error of the linear-trend model:
    horizon = 1-based index into the fold's test range.  ``signed=False``
    emits |error| (empirical CI); ``signed=True`` emits y - yhat (the
    ensemble-prediction-interval error matrix)."""
    ranked = df.withColumn("__rn", F.row_number().over(s.w()) - 1).withColumn(
        "__n", F.count("*").over(Window.partitionBy(s.series_id))
    )
    j = ranked.crossJoin(F.broadcast(spec))
    lo = (F.col("train_start") * F.col("__n")).cast("int")
    hi = (F.col("train_end") * F.col("__n")).cast("int")
    ts_ = (F.col("test_start") * F.col("__n")).cast("int")
    te = (F.col("test_end") * F.col("__n")).cast("int")
    tagged = j.withColumn(
        "__set",
        F.when((F.col("__rn") >= lo) & (F.col("__rn") < hi), F.lit("train")).when(
            (F.col("__rn") >= ts_) & (F.col("__rn") < te), F.lit("test")
        ),
    ).filter(F.col("__set").isNotNull())
    x = F.col("__rn").cast("double")
    y = F.col(s.value)
    is_tr = F.col("__set") == "train"
    g = tagged.groupBy(s.series_id, "fold_id").agg(
        F.sum(F.when(is_tr, 1).otherwise(0)).cast("double").alias("n"),
        F.sum(F.when(is_tr, x)).alias("sx"),
        F.sum(F.when(is_tr, x * x)).alias("sx2"),
        F.sum(F.when(is_tr, y)).alias("sy"),
        F.sum(F.when(is_tr, x * y)).alias("sxy"),
        F.min(F.when(~is_tr, F.col("__rn"))).alias("__test_start"),
        F.collect_list(F.when(~is_tr, F.struct(x.alias("x"), y.alias("y")))).alias("__test"),
    )
    n, sx, sx2, sy, sxy = (F.col(c) for c in ["n", "sx", "sx2", "sy", "sxy"])
    b = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    a = sy / n - b * sx / n
    fitted = g.withColumn("__a", a).withColumn("__b", b)
    ex = fitted.select(
        s.series_id,
        "fold_id",
        "__a",
        "__b",
        "__test_start",
        F.explode("__test").alias("t"),
    )
    err = F.col("t.y") - (F.col("__a") + F.col("__b") * F.col("t.x"))
    return ex.select(
        s.series_id,
        "fold_id",
        (F.col("t.x") - F.col("__test_start") + 1).cast("int").alias("horizon"),
        (err if signed else F.abs(err)).alias("error" if signed else "abs_error"),
    )


def ensemble_prediction_interval(
    df: DataFrame,
    spec: DataFrame,
    steps: int,
    freq_seconds: int,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Ensemble prediction interval (kats/utils/ensemble_predict_interval.py):
    the reference builds an error matrix from rolling backtests, samples
    perturbation ensembles from N(mean_h, std_h) per horizon, and takes
    ensemble percentiles.  We compute the DETERMINISTIC limit of that
    procedure — band(h) = fcst(h) + mean_err(h) ± z·std_err(h) — which is
    what the sampling converges to (documented deviation: no Monte Carlo
    noise), keeping it closed-form and oracle-checkable."""
    from kats_spark.operators.trend import linear_forecast

    errs = horizon_errors(df, spec, s, signed=True)
    stats = errs.groupBy(s.series_id, "horizon").agg(
        F.avg("error").alias("__me"),
        F.stddev_samp("error").alias("__se"),
    )
    fc = linear_forecast(df, steps, freq_seconds, s=s).select(s.series_id, s.time, "fcst")
    w = Window.partitionBy(s.series_id).orderBy(s.time)
    fc_h = fc.withColumn("horizon", F.row_number().over(w))
    out = fc_h.join(F.broadcast(stats), [s.series_id, "horizon"], "left")
    center = F.col("fcst") + F.coalesce(F.col("__me"), F.lit(0.0))
    half = Z95 * F.coalesce(F.col("__se"), F.lit(0.0))
    return out.select(
        s.series_id,
        s.time,
        F.col("fcst"),
        (center - half).alias("fcst_lower"),
        (center + half).alias("fcst_upper"),
    )


def error_vs_horizon_fit(errors: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """OLS of abs_error on horizon per series -> (series_id, ci_intercept,
    ci_slope): the empirical CI width generator."""
    h = F.col("horizon").cast("double")
    e = F.col("abs_error")
    g = errors.groupBy(s.series_id).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(h).alias("sx"),
        F.sum(h * h).alias("sx2"),
        F.sum(e).alias("sy"),
        F.sum(h * e).alias("sxy"),
    )
    n, sx, sx2, sy, sxy = (F.col(c) for c in ["n", "sx", "sx2", "sy", "sxy"])
    b = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    a = sy / n - b * sx / n
    return g.select(s.series_id, a.alias("ci_intercept"), b.alias("ci_slope"))


def empirical_ci_forecast(
    df: DataFrame,
    spec: DataFrame,
    steps: int,
    freq_seconds: int,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Linear forecast re-banded with the empirical widths:
    fcst ± z * (ci_intercept + ci_slope * h)."""
    from kats_spark.operators.trend import linear_forecast

    fc = linear_forecast(df, steps, freq_seconds, s=s).select(
        s.series_id, s.time, "fcst"
    )
    w = Window.partitionBy(s.series_id).orderBy(s.time)
    fc = fc.withColumn("__h", F.row_number().over(w).cast("double"))
    ci = error_vs_horizon_fit(horizon_errors(df, spec, s), s)
    width = Z95 * (F.col("ci_intercept") + F.col("ci_slope") * F.col("__h"))
    return (
        fc.join(F.broadcast(ci), s.series_id)
        .select(
            s.series_id,
            s.time,
            "fcst",
            (F.col("fcst") - width).alias("fcst_lower"),
            (F.col("fcst") + width).alias("fcst_upper"),
        )
    )
