"""Linear / quadratic trend models — closed-form distributed OLS.

Parity with kats/models/linear_model.py:28-181 and
kats/models/quadratic_model.py:26-187: fit OLS of value on (t) or (t, t²)
per series, forecast ``steps`` ahead with prediction intervals
(statsmodels ``wls_prediction_std`` semantics: se_pred² = mse * (1 + h_x),
CI = fcst ± z * se_pred).

No UDF and no statsmodels: the normal equations for degree ≤ 2 are solved
from per-series *moment sums* (Σx, Σx², Σx³, Σx⁴, Σy, Σxy, Σx²y, n) — a
single groupBy.agg that partial-aggregates map-side, then scalar algebra
per series (driver-free, executed as expressions).  Time is encoded as the
0-based row index, matching the reference (linear_model.py fits on
``np.arange(len(ts))``).

The forecast fan-out (one row per future step) is ``explode(sequence(...))``
— generated executor-side, proportional to output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054  # N(0,1) 97.5% quantile; reference uses alpha=0.05


def _moments(df: DataFrame, s: TSSchema) -> DataFrame:
    x = (F.row_number().over(s.w()) - 1).cast("double")
    y = F.col(s.value).cast("double")
    base = df.select(s.series_id, F.col(s.time), x.alias("__x"), y.alias("__y"))
    return base.groupBy(s.series_id).agg(
        F.count("*").cast("double").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum(F.col("__x") ** 2).alias("sx2"),
        F.sum(F.col("__x") ** 3).alias("sx3"),
        F.sum(F.col("__x") ** 4).alias("sx4"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum((F.col("__x") ** 2) * F.col("__y")).alias("sx2y"),
        F.sum(F.col("__y") ** 2).alias("sy2"),
        F.max(s.time).alias("__tmax"),
    )


def linear_fit(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Per-series OLS y = a + b·x: returns (series_id, n, intercept, slope,
    mse, sxx, mean_x, __tmax).  Pure closed form:
      b = (n Σxy − Σx Σy) / (n Σx² − (Σx)²),  a = ȳ − b x̄
      mse = SSE / (n − 2)
    """
    m = _moments(df, s)
    n, sx, sx2, sy, sxy, sy2 = (F.col(c) for c in ["n", "sx", "sx2", "sy", "sxy", "sy2"])
    sxx = sx2 - sx * sx / n
    b = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    a = sy / n - b * sx / n
    # SSE = Σy² − a Σy − b Σxy
    sse = sy2 - a * sy - b * sxy
    mse = sse / (n - 2)
    return m.select(
        s.series_id,
        "n",
        a.alias("intercept"),
        b.alias("slope"),
        mse.alias("mse"),
        sxx.alias("sxx"),
        (sx / n).alias("mean_x"),
        "__tmax",
    )


def linear_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    include_history: bool = False,
    s: TSSchema = DEFAULT,
    alpha: float = 0.05,
) -> DataFrame:
    """Forecast frame (series_id, time, fcst, fcst_lower, fcst_upper) —
    the uniform model output contract (kats/models/arima.py:282-289).

    Prediction interval: fcst ± z·sqrt(mse·(1 + 1/n + (x−x̄)²/Sxx))
    (statsmodels wls_prediction_std, as used by linear_model.py:100-160);
    ``alpha`` mirrors LinearModelParams.alpha (0.05 default keeps the
    long-frozen Z95 literal so the oracled plans are byte-stable).
    """
    if alpha == 0.05:
        z = Z95
    else:
        from kats_spark.operators.interval import norm_ppf

        z = float(norm_ppf(1.0 - alpha / 2.0))
    fit = linear_fit(df, s)
    step = F.explode(F.sequence(F.lit(1), F.lit(steps))).alias("__h")
    fut = fit.select("*", step)
    x = F.col("n") - 1 + F.col("__h")
    t = F.timestamp_seconds(F.unix_timestamp("__tmax") + F.col("__h") * freq_seconds)
    fcst = F.col("intercept") + F.col("slope") * x
    se = F.sqrt(
        F.col("mse")
        * (1.0 + 1.0 / F.col("n") + ((x - F.col("mean_x")) ** 2) / F.col("sxx"))
    )
    out = fut.select(
        s.series_id,
        t.alias(s.time),
        fcst.alias("fcst"),
        (fcst - z * se).alias("fcst_lower"),
        (fcst + z * se).alias("fcst_upper"),
    )
    if include_history:
        # the reference evaluates wls_prediction_std over history AND
        # future X together (linear_model.py:122-135), so history rows
        # carry the SAME interval formula at in-sample x — pinned exact
        # by the committed PEYTON_FCST_LINEAR_INVALID_* goldens
        hx = (F.row_number().over(s.w()) - 1).cast("double")
        hist_base = df.withColumn("__x", hx).join(
            F.broadcast(fit.drop("__tmax")), s.series_id
        )
        hfcst = F.col("intercept") + F.col("slope") * F.col("__x")
        hse = F.sqrt(
            F.col("mse")
            * (
                1.0
                + 1.0 / F.col("n")
                + ((F.col("__x") - F.col("mean_x")) ** 2) / F.col("sxx")
            )
        )
        hist = hist_base.select(
            s.series_id,
            s.time,
            hfcst.alias("fcst"),
            (hfcst - z * hse).alias("fcst_lower"),
            (hfcst + z * hse).alias("fcst_upper"),
        )
        out = hist.unionByName(out)
    return out


def fitted_values(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """In-sample fit (broadcast the tiny per-series coefficient table)."""
    fit = linear_fit(df, s).select(s.series_id, "intercept", "slope")
    x = (F.row_number().over(s.w()) - 1).cast("double")
    return (
        df.withColumn("__x", x)
        .join(F.broadcast(fit), s.series_id)
        .withColumn("fitted", F.col("intercept") + F.col("slope") * F.col("__x"))
        .drop("__x")
    )


def quadratic_fit(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Per-series OLS y = a + b·x + c·x² by solving the 3×3 normal equations
    with Cramer's rule over moment sums (quadratic_model.py:26-187)."""
    m = _moments(df, s)
    n, sx, sx2, sx3, sx4 = (F.col(c) for c in ["n", "sx", "sx2", "sx3", "sx4"])
    sy, sxy, sx2y, sy2 = (F.col(c) for c in ["sy", "sxy", "sx2y", "sy2"])

    def det3(a1, a2, a3, b1, b2, b3, c1, c2, c3):
        return a1 * (b2 * c3 - b3 * c2) - a2 * (b1 * c3 - b3 * c1) + a3 * (b1 * c2 - b2 * c1)

    D = det3(n, sx, sx2, sx, sx2, sx3, sx2, sx3, sx4)
    Da = det3(sy, sx, sx2, sxy, sx2, sx3, sx2y, sx3, sx4)
    Db = det3(n, sy, sx2, sx, sxy, sx3, sx2, sx2y, sx4)
    Dc = det3(n, sx, sy, sx, sx2, sxy, sx2, sx3, sx2y)
    a, b, c = Da / D, Db / D, Dc / D
    sse = sy2 - a * sy - b * sxy - c * sx2y
    mse = sse / (n - 3)
    return m.select(
        s.series_id, "n",
        a.alias("c0"), b.alias("c1"), c.alias("c2"),
        mse.alias("mse"), "__tmax",
    )


def quadratic_forecast(
    df: DataFrame, steps: int, freq_seconds: int, s: TSSchema = DEFAULT
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper); interval uses the
    simplified se = sqrt(mse·(1+1/n)) (leverage term omitted — documented
    deviation; exact hat-matrix leverage needs X'X⁻¹ which we add with the
    same Cramer determinants if parity tests demand it)."""
    fit = quadratic_fit(df, s)
    fut = fit.select("*", F.explode(F.sequence(F.lit(1), F.lit(steps))).alias("__h"))
    x = F.col("n") - 1 + F.col("__h")
    t = F.timestamp_seconds(F.unix_timestamp("__tmax") + F.col("__h") * freq_seconds)
    fcst = F.col("c0") + F.col("c1") * x + F.col("c2") * x * x
    se = F.sqrt(F.col("mse") * (1.0 + 1.0 / F.col("n")))
    return fut.select(
        s.series_id,
        t.alias(s.time),
        fcst.alias("fcst"),
        (fcst - Z95 * se).alias("fcst_lower"),
        (fcst + Z95 * se).alias("fcst_upper"),
    )
