"""Seasonal decomposition (trend / seasonal / residual).

Parity with kats/utils/decomposition.py:37-283 ``TimeSeriesDecomposition``.
The reference offers statsmodels ``seasonal_decompose`` (moving-average)
and STL.  statsmodels is unavailable here, so:

- ``ma_decompose``: the classical moving-average decomposition, exactly
  the seasonal_decompose algorithm, implemented as pure Spark windows —
  centered MA trend (period-aware even/odd handling), detrend
  (additive/multiplicative), seasonal = per-phase mean of detrended,
  seasonal recentred to mean 0 (or 1), residual = remainder.  Fully
  distributed and oracle-checkable.
- STL (loess-based) lands later as a numpy ``applyInPandas`` kernel.

Also ``remove_seasonality`` — the ``SeasonalityHandler`` used by detectors
(kats/utils/decomposition.py:284).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def ma_decompose(
    df: DataFrame,
    period: int,
    model: str = "additive",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, value, trend, seasonal, residual).

    Matches statsmodels.seasonal_decompose: trend = centered MA of length
    ``period`` (for even periods, a 2×MA: window of period+1 points with
    half weights at the ends); seasonal = phase-mean of detrended, centred;
    resid = value − trend − seasonal (or ratio for multiplicative).
    """
    rn = F.row_number().over(s.w()) - 1
    base = df.withColumn("__rn", rn)

    if period % 2 == 1:
        half = period // 2
        w = s.w().rowsBetween(-half, half)
        cnt = F.count(s.value).over(w)
        trend = F.when(cnt == period, F.avg(s.value).over(w))
    else:
        half = period // 2
        w = s.w().rowsBetween(-half, half)
        cnt = F.count(s.value).over(w)
        # 2xMA: full-weight interior, half-weight endpoints
        total = F.sum(s.value).over(w)
        first_v = F.first(s.value).over(w)
        last_v = F.last(s.value).over(w)
        trend = F.when(cnt == period + 1, (total - first_v / 2 - last_v / 2) / period)

    base = base.withColumn("trend", trend)
    detr = (
        F.col(s.value) - F.col("trend")
        if model == "additive"
        else F.col(s.value) / F.col("trend")
    )
    base = base.withColumn("__detr", detr).withColumn("__phase", F.col("__rn") % period)

    # r11 fusion: phase means, the grand mean of phase means (the
    # stats_bundle stat-of-stat trick: one representative row per phase)
    # and the per-row seasonal are all WINDOWS over series_id-prefixed
    # partitions — HashPartitioning(series_id) satisfies every one, so
    # the whole decomposition computes after ONE exchange with ZERO
    # joins (was: 2 aggregates + a broadcast join back).  avg() skips
    # NULL detrended rows exactly like the old filtered groupBy.
    w_phase = Window.partitionBy(s.series_id, "__phase")
    w_all = Window.partitionBy(s.series_id)
    fused = base.select(
        "*",
        F.avg("__detr").over(w_phase).alias("__pm"),
        F.row_number()
        .over(Window.partitionBy(s.series_id, "__phase").orderBy("__rn"))
        .alias("__phase_rn"),
    )
    pm_rep = F.when(F.col("__phase_rn") == 1, F.col("__pm"))
    fused = fused.withColumn("__gm", F.avg(pm_rep).over(w_all))
    seasonal = (
        (F.col("__pm") - F.col("__gm"))
        if model == "additive"
        else (F.col("__pm") / F.col("__gm"))
    )
    out = fused.withColumn("seasonal", seasonal)
    resid = (
        F.col(s.value) - F.col("trend") - F.col("seasonal")
        if model == "additive"
        else F.col(s.value) / (F.col("trend") * F.col("seasonal"))
    )
    return out.select(
        s.series_id, s.time, s.value, "trend", "seasonal", resid.alias("residual")
    )


def decompose(
    df: DataFrame,
    period: int,
    model: str = "additive",
    method: str = "ma",
    s: TSSchema = DEFAULT,
    **stl_kwargs,
) -> DataFrame:
    """Method dispatcher mirroring TimeSeriesDecomposition
    (decomposition.py:68-101): ``method='ma'`` (seasonal_decompose
    analogue, pure window expressions, oracle-checkable) or
    ``method='stl'`` (loess STL, per-series numpy kernel).  Both return
    (series_id, time, value, trend, seasonal, residual)."""
    if method in ("ma", "seasonal_decompose"):
        return ma_decompose(df, period, model, s)
    if method.lower() == "stl":
        from kats_spark.operators.stl import stl_decompose

        return stl_decompose(df, period, model=model, s=s, **stl_kwargs)
    raise ValueError(f"unknown decomposition method {method!r} (ma|stl)")


def last_period_seasonal_table(
    dec: DataFrame, period: int, s: TSSchema = DEFAULT
) -> DataFrame:
    """(series_id, __phase, seasonal) built from the LAST ``period`` rows
    of a decompose() output — the reference STLF re-seasonalization
    convention (stlf.py:348-350: ``decomp['seasonal'].value[-m:]``
    tiled over the horizon).  Phase key = global row index mod period,
    so it joins the same way as :func:`seasonal_table`."""
    w = s.w()
    n_tbl = dec.groupBy(s.series_id).agg(F.count("*").alias("__n"))
    return (
        dec.withColumn("__rn", F.row_number().over(w) - 1)
        .join(F.broadcast(n_tbl), s.series_id)
        .filter(F.col("__rn") >= F.col("__n") - period)
        .select(
            s.series_id,
            (F.col("__rn") % period).alias("__phase"),
            "seasonal",
        )
    )


def seasonal_table(
    df: DataFrame, period: int, model: str = "additive", s: TSSchema = DEFAULT
) -> DataFrame:
    """(series_id, __phase, seasonal) — the centred per-phase seasonal
    component of the MA decomposition, as a broadcastable tiny table
    (period rows per series).  Shared by ma_decompose and STLF."""
    rn = F.row_number().over(s.w()) - 1
    base = df.withColumn("__rn", rn)
    if period % 2 == 1:
        half = period // 2
        w = s.w().rowsBetween(-half, half)
        cnt = F.count(s.value).over(w)
        trend = F.when(cnt == period, F.avg(s.value).over(w))
    else:
        half = period // 2
        w = s.w().rowsBetween(-half, half)
        cnt = F.count(s.value).over(w)
        total = F.sum(s.value).over(w)
        first_v = F.first(s.value).over(w)
        last_v = F.last(s.value).over(w)
        trend = F.when(cnt == period + 1, (total - first_v / 2 - last_v / 2) / period)
    detr = (
        F.col(s.value) - trend if model == "additive" else F.col(s.value) / trend
    )
    base = base.withColumn("__detr", detr).withColumn("__phase", F.col("__rn") % period)
    phase_means = (
        base.filter(F.col("__detr").isNotNull())
        .groupBy(s.series_id, "__phase")
        .agg(F.avg("__detr").alias("__pm"))
    )
    grand = phase_means.groupBy(s.series_id).agg(F.avg("__pm").alias("__gm"))
    return phase_means.join(grand, s.series_id).select(
        s.series_id,
        "__phase",
        (
            (F.col("__pm") - F.col("__gm"))
            if model == "additive"
            else (F.col("__pm") / F.col("__gm"))
        ).alias("seasonal"),
    )


def remove_seasonality(
    df: DataFrame, period: int, model: str = "additive", s: TSSchema = DEFAULT
) -> DataFrame:
    """SeasonalityHandler (decomposition.py:284): value minus (or over) the
    seasonal component — input cleaner for CUSUM/StatSig detectors."""
    dec = ma_decompose(df, period, model, s)
    clean = (
        (F.col(s.value) - F.col("seasonal"))
        if model == "additive"
        else (F.col(s.value) / F.col("seasonal"))
    )
    return dec.select(s.series_id, s.time, F.coalesce(clean, F.col(s.value)).alias(s.value))


def strength_features(
    df: DataFrame, period: int, s: TSSchema = DEFAULT, method: str = "ma"
) -> DataFrame:
    """STL-feature block (tsfeatures.py:738): trend_strength = 1 −
    var(resid)/var(detrended... ), seasonal_strength analogous, computed
    from the MA (default, oracle-checkable) or loess-STL decomposition —
    the formula only needs the (trend, seasonal, residual) split, so it
    is method-agnostic."""
    dec = decompose(df, period, "additive", method, s)
    return strengths_from_decomposition(dec, s)


def strengths_from_decomposition(dec: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Strength aggregation over an existing decompose() output frame —
    lets callers that already hold the (persisted) decomposition avoid a
    second full decomposition pass."""
    dec = dec.filter(F.col("residual").isNotNull())
    agg = dec.groupBy(s.series_id).agg(
        F.var_samp("residual").alias("__vr"),
        F.var_samp(F.col(s.value) - F.col("seasonal")).alias("__v_deseason"),
        F.var_samp(F.col(s.value) - F.col("trend")).alias("__v_detrend"),
    )
    return agg.select(
        s.series_id,
        F.greatest(F.lit(0.0), 1.0 - F.col("__vr") / F.col("__v_deseason")).alias("trend_strength"),
        F.greatest(F.lit(0.0), 1.0 - F.col("__vr") / F.col("__v_detrend")).alias("seasonality_strength"),
    )
