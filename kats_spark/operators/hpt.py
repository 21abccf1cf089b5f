"""Hyperparameter tuning as a param-grid crossJoin.

Parity with kats/utils/time_series_parameter_tuning.py:296-648 (grid /
random search over ``get_parameter_search_space()`` definitions,
kats/models/model.py:142) re-expressed Spark-first: the candidate grid is
a tiny literal DataFrame crossJoined against the series; every (series,
candidate) cell evaluates in one distributed pass; argmin is a window
rank.  No ax-platform: the search loop IS the plan.

``tune_rolling_window`` is the demonstrator: pick the trailing-MA window
size minimizing one-step-ahead MAE — each candidate is a frame aggregate
over the same sort, so Catalyst shares the single per-series sort across
all candidates (one shuffle total, WindowExec chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def tune_rolling_window(
    df: DataFrame,
    candidates: list[int],
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, best_window, best_mae): the trailing-MA window length w
    whose predictions ma_{t-1,w} minimize MAE over the series.  Ties break
    to the smaller window (deterministic)."""
    w_base = s.w()
    preds = []
    for wlen in candidates:
        ma = F.avg(s.value).over(w_base.rowsBetween(-wlen, -1))
        cnt = F.count(s.value).over(w_base.rowsBetween(-wlen, -1))
        err = F.when(cnt == wlen, F.abs(F.col(s.value) - ma))
        preds.append(err.alias(f"__e_{wlen}"))
    scored = df.select(s.series_id, *preds)
    aggs = [F.avg(f"__e_{w}").alias(f"mae_{w}") for w in candidates]
    per_series = scored.groupBy(s.series_id).agg(*aggs)
    # argmin across the candidate columns via stack -> min_by
    stack_expr = ", ".join(f"{w}, mae_{w}" for w in candidates)
    long = per_series.selectExpr(
        s.series_id, f"stack({len(candidates)}, {stack_expr}) as (window, mae)"
    )
    return long.groupBy(s.series_id).agg(
        F.min_by(
            F.col("window"), F.struct(F.col("mae"), F.col("window"))
        ).cast("int").alias("best_window"),
        F.min("mae").alias("best_mae"),
    )
