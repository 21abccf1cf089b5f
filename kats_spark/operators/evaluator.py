"""Evaluator: named prediction runs -> one metric table.

Parity with kats/evaluation/evaluator.py:32-115 (``Evaluator``: a dict of
named EvaluationObject runs, ``evaluate(run, metric_to_func, labels)``
returning a one-row metric frame per run).  Spark-first: a "run" is a
model-tagged slice of ONE long frame ``(model, series_id, time, y,
yhat)``; every requested metric is a column expression from the
functions/metrics registry, so the whole evaluation — all runs x all
series x all metrics — is a single grouped aggregation (map-side
combinable, one shuffle keyed on (model, series_id)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.functions import metrics as M


def tag_run(name: str, preds: DataFrame) -> DataFrame:
    """Label a prediction frame as one evaluation run
    (create_evaluation_run, evaluator.py:36-38)."""
    return preds.withColumn("model", F.lit(name))


def evaluate(
    preds: DataFrame,
    metric_names: list[str],
    y_col: str = "y",
    yhat_col: str = "yhat",
    by: tuple[str, ...] = ("model", "series_id"),
) -> DataFrame:
    """Metric table over tagged runs (evaluate, evaluator.py:71-115).

    ``preds``: union of ``tag_run`` frames; ``metric_names``: names from
    the metric registry (kats/metrics/metrics.py:976 ``metric``).
    Returns one row per ``by`` group with one column per metric.
    """
    aggs = [
        M.metric(name)(y_col, yhat_col).alias(name) for name in metric_names
    ]
    return preds.groupBy(*by).agg(*aggs)
