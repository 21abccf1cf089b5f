"""Resample / interpolate: regularize each series onto a fixed-frequency
time spine and fill gaps.

Parity with kats/consts.py:991-1111 ``interpolate`` (methods: linear,
ffill, bfill at a given frequency).  The reference reindexes one pandas
series; here the spine is generated *distributed*:

1. per-series min/max time (one agg),
2. ``sequence(min, max, interval)`` + ``explode`` — spine rows are
   generated executor-side, proportional to output size, never collected,
3. left join original points onto the spine (co-partitioned on series_id),
4. gap fill with window expressions:
   - ffill  = ``last(value, ignorenulls=True)`` over unbounded-preceding,
   - bfill  = ``first(value, ignorenulls=True)`` over unbounded-following,
   - linear = interpolate between the bracketing observed points using
     their timestamps (exact for irregular gaps too).

All expressions; no UDF; one shuffle (the join) reused by the fill windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def time_spine(df: DataFrame, freq_seconds: int, s: TSSchema = DEFAULT) -> DataFrame:
    """Per-series regular grid from min(time) to max(time)."""
    bounds = df.groupBy(s.series_id).agg(F.min(s.time).alias("__t0"), F.max(s.time).alias("__t1"))
    seq = F.sequence(
        F.col("__t0"),
        F.col("__t1"),
        F.expr(f"interval {int(freq_seconds)} seconds"),
    )
    return bounds.select(s.series_id, F.explode(seq).alias(s.time))


def resample(
    df: DataFrame,
    freq_seconds: int,
    method: str = "linear",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Regularize to ``freq_seconds`` with gap fill (kats/consts.py:991).

    method in {"linear", "ffill", "bfill", "null"}.
    Observed points that fall exactly on the grid are kept as-is; the spine
    join is on equality, matching the reference's ``reindex`` semantics
    (off-grid observations are dropped after regularization).
    """
    spine = time_spine(df, freq_seconds, s)
    obs = df.select(s.series_id, s.time, F.col(s.value).alias("__obs"))
    g = spine.join(obs, [s.series_id, s.time], "left")

    w_prev = s.w().rowsBetween(Window.unboundedPreceding, 0)
    w_next = s.w().rowsBetween(0, Window.unboundedFollowing)

    if method == "null":
        return g.select(s.series_id, s.time, F.col("__obs").alias(s.value))
    if method == "ffill":
        filled = F.last("__obs", ignorenulls=True).over(w_prev)
        return g.select(s.series_id, s.time, filled.alias(s.value))
    if method == "bfill":
        filled = F.first("__obs", ignorenulls=True).over(w_next)
        return g.select(s.series_id, s.time, filled.alias(s.value))
    if method == "linear":
        t = F.col(s.time).cast("double")
        prev_v = F.last("__obs", ignorenulls=True).over(w_prev)
        next_v = F.first("__obs", ignorenulls=True).over(w_next)
        prev_t = F.last(F.when(F.col("__obs").isNotNull(), t), ignorenulls=True).over(w_prev)
        next_t = F.first(F.when(F.col("__obs").isNotNull(), t), ignorenulls=True).over(w_next)
        frac = (t - prev_t) / (next_t - prev_t)
        lin = F.when(F.col("__obs").isNotNull(), F.col("__obs")).otherwise(
            F.when(next_t == prev_t, prev_v).otherwise(prev_v + (next_v - prev_v) * frac)
        )
        # edges: before first / after last observation -> nearest value
        lin = F.coalesce(lin, prev_v, next_v)
        return g.select(s.series_id, s.time, lin.alias(s.value))
    raise ValueError(f"unknown method {method!r}")


def aggregate_to_grid(
    df: DataFrame,
    freq_seconds: int,
    agg: str = "avg",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Downsample: bucket time to the grid and aggregate — the
    ``GetAggregateTS`` primitive of temporal reconciliation
    (kats/models/reconciliation/base_models.py:43,94)."""
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(s.time)) / freq_seconds).cast("bigint") * freq_seconds
    )
    agg_fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "median": F.median}[agg]
    return (
        df.groupBy(s.series_id, bucket.alias(s.time))
        .agg(agg_fn(s.value).alias(s.value))
    )
