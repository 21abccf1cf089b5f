"""Canonical long time-series frame and its invariants.

Reference parity (file:line cites are into /root/reference):
- ``TimeSeriesData`` (kats/consts.py:156): a time column + value column(s),
  always time-sorted (kats/consts.py:948 ``_sort_by_time``), optional
  duplicate-timestamp drop keep-first (kats/consts.py:296-298), equal-length
  validation, min/max metadata (kats/consts.py:760-771).
- Binary arithmetic ``+ - * /`` between two series = full-outer equi-join on
  time then columnwise op, unmatched -> NULL (kats/consts.py:898-946
  ``_perform_op``); scalar rhs broadcast (kats/consts.py:871-896).
- ``extend`` = concatenation + revalidation (kats/consts.py:655-692).
- Frequency inference: pandas ``infer_freq`` (kats/consts.py:751) with a
  robust mode-of-diffs fallback (kats/consts.py:968-989).

Spark-first shape: a *long* DataFrame ``(series_id, time, value)`` holding
many series at once.  All invariants are window/aggregate expressions —
no UDFs, no collect; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TSSchema:
    """Column-name binding for the canonical long layout."""

    series_id: str = "series_id"
    time: str = "time"
    value: str = "value"

    def w(self) -> Window:
        """Per-series time-ordered window — the engine's core frame."""
        return Window.partitionBy(self.series_id).orderBy(self.time)


DEFAULT = TSSchema()


def ensure_sorted(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Sort within series (kats/consts.py:948 sorts globally; per-series
    order is all downstream window ops need, so we avoid a global sort)."""
    return df.repartition(F.col(s.series_id)).sortWithinPartitions(s.series_id, s.time)


def dedup_timestamps(df: DataFrame, s: TSSchema = DEFAULT, keep: str = "first") -> DataFrame:
    """Drop duplicate timestamps per series, keep-first
    (kats/consts.py:296-298 ``drop_duplicates(keep="first")``).

    "first" is resolved by a deterministic tiebreak on the value column so
    the result is stable under any partitioning.
    """
    order = [F.col(s.time)] + ([F.col(s.value).asc()] if keep == "first" else [F.col(s.value).desc()])
    w = Window.partitionBy(s.series_id, s.time).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def validate_equal_spacing(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Per-series regularity report: mode of diffs and the share of
    intervals equal to the mode.  Mirrors the irregular-granularity check
    (kats/consts.py:64-67, kats/detectors/cusum_model.py:649-659 which
    requires >=50% of diffs at the modal frequency)."""
    diff = F.col(s.time).cast("double") - F.lag(F.col(s.time).cast("double")).over(s.w())
    with_diff = df.withColumn("__diff", diff).filter(F.col("__diff").isNotNull())
    mode_per_series = (
        with_diff.groupBy(s.series_id, "__diff")
        .count()
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(s.series_id).orderBy(F.desc("count"), F.asc("__diff"))
            ),
        )
        .filter(F.col("__rk") == 1)
        .select(s.series_id, F.col("__diff").alias("freq_seconds"), F.col("count").alias("mode_count"))
    )
    totals = with_diff.groupBy(s.series_id).agg(F.count("*").alias("n_intervals"))
    return (
        mode_per_series.join(totals, s.series_id)
        .withColumn("regular_share", F.col("mode_count") / F.col("n_intervals"))
        .withColumn("is_regular", F.col("regular_share") >= F.lit(0.5))
    )


def infer_freq_seconds(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Robust frequency inference = per-series mode of successive diffs
    (kats/consts.py:968-989 ``infer_freq_robust``).  Returns
    ``(series_id, freq_seconds)``."""
    return validate_equal_spacing(df, s).select(s.series_id, "freq_seconds")


def series_minmax(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """min/max metadata (kats/consts.py:760-771) plus length."""
    return df.groupBy(s.series_id).agg(
        F.min(s.value).alias("min_value"),
        F.max(s.value).alias("max_value"),
        F.min(s.time).alias("min_time"),
        F.max(s.time).alias("max_time"),
        F.count(s.value).alias("n"),
    )


def exclude(df: DataFrame, start, end, s: TSSchema = DEFAULT) -> DataFrame:
    """Drop rows inside the closed interval [start, end]
    (kats/consts.py:694-722)."""
    return df.filter((F.col(s.time) < F.lit(start)) | (F.col(s.time) > F.lit(end)))


def extend(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Union of two long frames (kats/consts.py:655-692 ``extend``)."""
    return df1.unionByName(df2, allowMissingColumns=True)


def binary_op(
    df1: DataFrame,
    df2: DataFrame,
    op: str,
    s: TSSchema = DEFAULT,
    out_col: str | None = None,
) -> DataFrame:
    """Arithmetic between two long frames: full-outer join on
    (series_id, time) then the columnwise op; unmatched rows yield NULL
    (kats/consts.py:898-946).  ``op`` in {add, sub, mul, div}."""
    out_col = out_col or s.value
    l = df1.select(s.series_id, s.time, F.col(s.value).alias("__l"))
    r = df2.select(s.series_id, s.time, F.col(s.value).alias("__r"))
    joined = l.join(r, [s.series_id, s.time], "full_outer")
    expr = {
        "add": F.col("__l") + F.col("__r"),
        "sub": F.col("__l") - F.col("__r"),
        "mul": F.col("__l") * F.col("__r"),
        "div": F.col("__l") / F.col("__r"),
    }[op]
    return joined.select(s.series_id, s.time, expr.alias(out_col))


def scalar_op(df: DataFrame, op: str, scalar: float, s: TSSchema = DEFAULT) -> DataFrame:
    """Scalar broadcast arithmetic (kats/consts.py:871-896)."""
    expr = {
        "add": F.col(s.value) + F.lit(scalar),
        "sub": F.col(s.value) - F.lit(scalar),
        "mul": F.col(s.value) * F.lit(scalar),
        "div": F.col(s.value) / F.lit(scalar),
    }[op]
    return df.withColumn(s.value, expr)


def from_wide(df: DataFrame, time_col: str, value_cols: list[str], s: TSSchema = DEFAULT) -> DataFrame:
    """Melt a wide frame (one column per series, kats/consts.py:962-966
    ``_extract_from_df``) into the canonical long layout via a ``stack``
    expression — a narrow map-side transform, no shuffle."""
    pairs = ", ".join(f"'{c}', cast(`{c}` as double)" for c in value_cols)
    stacked = df.selectExpr(
        f"`{time_col}` as {s.time}",
        f"stack({len(value_cols)}, {pairs}) as ({s.series_id}, {s.value})",
    )
    return stacked.select(s.series_id, s.time, s.value)
