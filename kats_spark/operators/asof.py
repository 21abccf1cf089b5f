"""As-of join — "last right value at or before each left timestamp".

SURVEY §2.3: the reference has no as-of join in its public surface, but
its ``historical_data`` hand-off (kats/detectors/detector.py:174-194 —
detectors receive history + new data and align them by time) is exactly
this pattern, and every long-format lake design needs it (attach the
latest model state / reference level / exchange rate to each event).

Spark-first plan: NO join at all.  Stack right rows (carrying the value)
and left rows (carrying null) into one frame, sort per key by
(time, side) with right-before-left on ties (inclusive ``rt <= lt``
semantics), and take ``last(value, ignorenulls=True)`` over an
unbounded-preceding running frame.  One exchange on the key, linear in
|L|+|R|, no row explosion on duplicate timestamps — the plan that
survives a 100 TB right side where a range join would be quadratic on
hot keys.  An optional ``tolerance_seconds`` nulls matches older than
the window (pandas ``merge_asof`` tolerance semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "series_id",
    left_time: str = "time",
    right_time: str = "time",
    value_col: str = "value",
    out_col: str = "asof_value",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Attach to every left row the most recent right ``value_col`` with
    ``right_time <= left_time`` (per ``on`` key); null when no right row
    precedes it (or the match is older than ``tolerance_seconds``)."""
    lcols = left.columns
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("double").alias("__rv"),
        F.lit(None).cast("timestamp").alias("__rt"),
        F.struct(*lcols).alias("__row"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(value_col).cast("double").alias("__rv"),
        F.col(right_time).cast("timestamp").alias("__rt"),
        F.lit(None).cast(l.schema["__row"].dataType).alias("__row"),
    )
    stacked = l.unionByName(r)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = stacked.withColumn("__v", F.last("__rv", ignorenulls=True).over(w))
    matched = matched.withColumn("__mt", F.last("__rt", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1)
    val: Column = F.col("__v")
    if tolerance_seconds is not None:
        fresh = (
            F.unix_timestamp(F.col("__t")) - F.unix_timestamp(F.col("__mt"))
        ) <= tolerance_seconds
        val = F.when(fresh, val)
    return out.select(*[F.col(f"__row.{c}").alias(c) for c in lcols], val.alias(out_col))
