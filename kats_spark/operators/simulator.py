"""Series simulator — distributed, seeded, expression-based.

Parity with kats/utils/simulator.py:48-834: arima_sim(:83), trend(:187),
noise(:214), seasonality(:237), level_shift_sim(:416), trend_shift_sim
(:562).  The reference builds one numpy series; here ``spark.range``
generates (series x points) rows executor-side and every component is an
expression — ``F.randn(seed)`` gives deterministic per-row gaussians, sin/
cos give seasonality, conditional exprs inject level/trend shifts.  The
ARMA recursion is the one non-expression piece (per-series numpy kernel).

Used by the seeded-simulation detector tests (SURVEY §5: the reference
seeds np.random and asserts detectors find injected changes)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def simulate(
    spark: SparkSession,
    n_series: int,
    n_points: int,
    freq_seconds: int = 3600,
    start: str = "2024-01-01",
    trend_slope: float = 0.0,
    noise_std: float = 1.0,
    seasonal_period: int = 0,
    seasonal_magnitude: float = 0.0,
    level_shift_at: int | None = None,
    level_shift_size: float = 0.0,
    trend_shift_at: int | None = None,
    trend_shift_slope: float = 0.0,
    seed: int = 42,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, value) with the requested components injected."""
    base = (
        spark.range(n_series * n_points)
        .withColumn("__sid", (F.col("id") / n_points).cast("int"))
        .withColumn("__i", (F.col("id") % n_points).cast("int"))
    )
    t = F.to_timestamp(F.lit(start)) + F.make_interval(secs=F.col("__i") * freq_seconds)
    value = F.lit(0.0) + F.col("__i") * trend_slope + F.randn(seed) * noise_std
    if seasonal_period:
        value = value + seasonal_magnitude * F.sin(
            F.col("__i") * (2.0 * math.pi / seasonal_period)
        )
    if level_shift_at is not None:
        value = value + F.when(F.col("__i") >= level_shift_at, level_shift_size).otherwise(0.0)
    if trend_shift_at is not None:
        value = value + F.when(
            F.col("__i") >= trend_shift_at,
            (F.col("__i") - trend_shift_at) * trend_shift_slope,
        ).otherwise(0.0)
    return base.select(
        F.concat(F.lit("sim_"), F.col("__sid")).alias(s.series_id),
        t.alias(s.time),
        value.alias(s.value),
    )


def arma_sim(
    spark: SparkSession,
    n_series: int,
    n_points: int,
    ar: list[float],
    ma: list[float],
    noise_std: float = 1.0,
    freq_seconds: int = 3600,
    start: str = "2024-01-01",
    seed: int = 42,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """ARMA(p,q) recursion (simulator.py:83 arima_sim) — the innovations are
    generated as expression ``randn`` rows, the recursion itself runs as a
    per-series numpy kernel over those rows."""
    innov = simulate(
        spark, n_series, n_points, freq_seconds, start,
        noise_std=noise_std, seed=seed, s=s,
    )
    p, q = len(ar), len(ma)
    schema = f"{s.series_id} string, {s.time} timestamp, {s.value} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        e = pdf[s.value].to_numpy(dtype=float)
        n = len(e)
        y = np.zeros(n)
        for t_ in range(n):
            acc = e[t_]
            for i, a in enumerate(ar, 1):
                if t_ - i >= 0:
                    acc += a * y[t_ - i]
            for j, m in enumerate(ma, 1):
                if t_ - j >= 0:
                    acc += m * e[t_ - j]
            y[t_] = acc
        out = pdf.copy()
        out[s.value] = y
        return out[[s.series_id, s.time, s.value]]

    return innov.groupBy(s.series_id).applyInPandas(fn, schema)


_P = 2147483647  # 2^31 - 1


def portable_randn(x: Column, seed: int = 42) -> Column:
    """Counter-based deterministic standard normal, reproducible in ANSI
    SQL: two affine-mod-p rounds of the integer counter give two uniforms,
    Box-Muller converts them — z = sqrt(-2 ln u1) · cos(2π u2).  Unlike
    ``F.randn`` (partition-seeded XORShift), the value depends ONLY on the
    counter and seed, so it is stable under repartitioning and matches the
    DuckDB oracle bit-for-bit (mod last-ulp libm jitter under the rounding
    epsilon)."""
    import random

    rnd = random.Random(seed)
    a1, b1 = rnd.randrange(1, _P), rnd.randrange(0, _P)
    a2, b2 = rnd.randrange(1, _P), rnd.randrange(0, _P)
    h1 = (x * a1 + b1) % _P
    h2 = (h1 * a2 + b2) % _P
    u1 = (h1 + 1).cast("double") / float(_P + 1)
    u2 = (h2 + 1).cast("double") / float(_P + 1)
    two_pi = 2.0 * math.pi
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(u2 * two_pi)


def simulate_portable(
    spark: SparkSession,
    n_series: int,
    n_points: int,
    freq_seconds: int = 3600,
    start: str = "2024-01-01",
    trend_slope: float = 0.0,
    noise_std: float = 1.0,
    seasonal_period: int = 0,
    seasonal_magnitude: float = 0.0,
    level_shift_at: int | None = None,
    level_shift_size: float = 0.0,
    seed: int = 42,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """``simulate`` with the portable counter-based gaussian — the variant
    whose values (not just shape) the DuckDB oracle replays exactly."""
    base = (
        spark.range(n_series * n_points)
        .withColumn("__sid", (F.col("id") / n_points).cast("int"))
        .withColumn("__i", (F.col("id") % n_points).cast("int"))
    )
    t = F.to_timestamp(F.lit(start)) + F.make_interval(secs=F.col("__i") * freq_seconds)
    counter = F.col("id").cast("long")
    value = (
        F.lit(0.0)
        + F.col("__i") * trend_slope
        + portable_randn(counter, seed) * noise_std
    )
    if seasonal_period:
        value = value + seasonal_magnitude * F.sin(
            F.col("__i") * (2.0 * math.pi / seasonal_period)
        )
    if level_shift_at is not None:
        value = value + F.when(F.col("__i") >= level_shift_at, level_shift_size).otherwise(0.0)
    return base.select(
        F.concat(F.lit("sim_"), F.col("__sid")).alias(s.series_id),
        t.alias(s.time),
        value.alias(s.value),
    )
