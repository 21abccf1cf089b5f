"""Forecast-error metrics as aggregate expression builders.

Parity with kats/metrics/metrics.py:197-856 — one closed-form aggregate
expression per metric over (y, yhat) column pairs, so an entire backtest's
error table is a single groupBy.agg with map-side partial aggregation.
Registry mirrors ``metric`` / ``core_metric`` (kats/metrics/metrics.py:976,
1010).

Each builder takes Column (or name) y / yhat and returns an *aggregate*
Column.  Metrics needing an extra input take it as a keyword.

Implemented (reference line in parens):
  error/abs/percentage families (:197-530), MSE/RMSE (:531-585),
  MSLE/RMSLE (:586-618), RMSPE (:619), MASE (:466), sMAPE (:448 family),
  MAPE, max_error (:197), tracking_signal (:856 family), exceed (:828
  family), pinball_loss (:732), interval_score (:828), coverage.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def error(y, yhat) -> Column:
    return _c(y) - _c(yhat)


def mean_error(y, yhat) -> Column:
    return F.avg(error(y, yhat))


def mean_absolute_error(y, yhat) -> Column:
    return F.avg(F.abs(error(y, yhat)))


def median_absolute_error(y, yhat) -> Column:
    return F.median(F.abs(error(y, yhat)))


def max_error(y, yhat) -> Column:
    return F.max(F.abs(error(y, yhat)))


def mean_squared_error(y, yhat) -> Column:
    e = error(y, yhat)
    return F.avg(e * e)


def root_mean_squared_error(y, yhat) -> Column:
    return F.sqrt(mean_squared_error(y, yhat))


def mean_squared_log_error(y, yhat) -> Column:
    e = F.log1p(_c(y)) - F.log1p(_c(yhat))
    return F.avg(e * e)


def root_mean_squared_log_error(y, yhat) -> Column:
    return F.sqrt(mean_squared_log_error(y, yhat))


def mean_absolute_percentage_error(y, yhat) -> Column:
    """MAPE (kats/metrics/metrics.py:448)."""
    return F.avg(F.abs(error(y, yhat)) / F.abs(_c(y)))


def median_absolute_percentage_error(y, yhat) -> Column:
    return F.median(F.abs(error(y, yhat)) / F.abs(_c(y)))


def symmetric_mean_absolute_percentage_error(y, yhat) -> Column:
    """sMAPE: 2|e| / (|y|+|yhat|)."""
    return F.avg(2.0 * F.abs(error(y, yhat)) / (F.abs(_c(y)) + F.abs(_c(yhat))))


def mean_percentage_error(y, yhat) -> Column:
    return F.avg(error(y, yhat) / _c(y))


def root_mean_squared_percentage_error(y, yhat) -> Column:
    p = error(y, yhat) / _c(y)
    return F.sqrt(F.avg(p * p))


def tracking_signal(y, yhat) -> Column:
    """sum(e) / MAE (kats/metrics/metrics.py tracking_signal)."""
    return F.sum(error(y, yhat)) / F.avg(F.abs(error(y, yhat)))


def exceed_rate(y, yhat) -> Column:
    """share of yhat exceeding y."""
    return F.avg((_c(yhat) > _c(y)).cast("double"))


def pinball_loss(y, yhat, quantile: float = 0.5) -> Column:
    """Pinball/quantile loss (kats/metrics/metrics.py:732)."""
    e = error(y, yhat)
    q = F.lit(quantile)
    return F.avg(F.when(e >= 0, q * e).otherwise((q - 1.0) * e))


def coverage(y, lower, upper) -> Column:
    """Share of actuals inside the interval."""
    return F.avg(((_c(y) >= _c(lower)) & (_c(y) <= _c(upper))).cast("double"))


def interval_score(y, lower, upper, alpha: float = 0.05) -> Column:
    """Winkler interval score (kats/metrics/metrics.py:828)."""
    yc, lo, hi = _c(y), _c(lower), _c(upper)
    width = hi - lo
    below = F.when(yc < lo, (2.0 / alpha) * (lo - yc)).otherwise(F.lit(0.0))
    above = F.when(yc > hi, (2.0 / alpha) * (yc - hi)).otherwise(F.lit(0.0))
    return F.avg(width + below + above)


def scaled_symmetric_mean_absolute_percentage_error(y, yhat) -> Column:
    """sSMAPE (kats/metrics/metrics.py:614): |e| / (|y|+|yhat|), i.e.
    SMAPE / 2, range [0, 1]."""
    return F.avg(F.abs(error(y, yhat)) / (F.abs(_c(y)) + F.abs(_c(yhat))))


def symmetric_bias(y, yhat) -> Column:
    """sbias (kats/metrics/metrics.py:633): -2 · mean(e / (|y|+|yhat|))."""
    return -2.0 * F.avg(error(y, yhat) / (F.abs(_c(y)) + F.abs(_c(yhat))))


def frequency_exceeds_relative_threshold(y, yhat, threshold: float) -> Column:
    """Fraction of actuals ≥ threshold × prediction
    (kats/metrics/metrics.py:335)."""
    return F.avg((_c(y) >= F.lit(threshold) * _c(yhat)).cast("double"))


def exceed_at(y, yhat, threshold: float) -> Column:
    """Directional quantile exceed rate (kats/metrics/metrics.py:762).
    Matches the reference CODE, not its docstring (which has the
    directions swapped): mask = +1 if t > 0.5 else -1, rate =
    mean((y - yhat) · mask > 0) — i.e. for an upper quantile (t > 0.5)
    the share of actuals above the prediction."""
    mask = 1.0 if threshold > 0.5 else -1.0
    return F.avg(((_c(y) - _c(yhat)) * mask > 0).cast("double"))


def mult_exceed(y, yhat_by_threshold: "dict[float, object]") -> "list[Column]":
    """Per-quantile exceed rates (kats/metrics/metrics.py:682): one
    directional exceed column per (threshold, prediction) pair."""
    return [
        exceed_at(y, col, t).alias(f"exceed_{str(t).replace('.', '_')}")
        for t, col in yhat_by_threshold.items()
    ]


def mult_coverage(y, bounds: "list[tuple[object, object, str]]") -> "list[Column]":
    """Coverage per interval (kats/metrics/metrics.py:803): one coverage
    column per (lower, upper, label)."""
    return [coverage(y, lo, hi).alias(f"coverage_{label}") for lo, hi, label in bounds]


def mult_interval_score(
    y, bounds: "list[tuple[object, object, float, str]]"
) -> "list[Column]":
    """Winkler score per interval (kats/metrics/metrics.py:856)."""
    return [
        interval_score(y, lo, hi, alpha).alias(f"interval_score_{label}")
        for lo, hi, alpha, label in bounds
    ]


def ecdf_error_scores(
    df,
    group_col: str = "series_id",
    key_col: str = "time",
    y: str = "y",
    yhat: str = "yhat",
):
    """Per-group CRPS and LEPS (kats/metrics/metrics.py:305,352):
    ECDF of the actuals evaluated at both actuals and predictions, then
    mean((F(ŷ)-F(y))²) and mean(|F(ŷ)-F(y)|).

    Distributed ECDF without a quadratic self-join: stack (value, is_y)
    rows for actuals and predictions, one RANGE-frame running sum of
    ``is_y`` ordered by value gives F(v) = #\\{y ≤ v\\}/n at every stacked
    row in a single exchange (peer rows are inside the default frame, so
    ties resolve to the right-continuous ECDF on both engines)."""
    from pyspark.sql import Window

    f = df.select(group_col, key_col, F.col(y).alias("__y"), F.col(yhat).alias("__p"))
    stacked = f.select(
        group_col, key_col, F.col("__y").alias("v"), F.lit(1).alias("is_y")
    ).unionByName(
        f.select(group_col, key_col, F.col("__p").alias("v"), F.lit(0).alias("is_y"))
    )
    w_ecdf = Window.partitionBy(group_col).orderBy("v")
    n_y = F.sum("is_y").over(Window.partitionBy(group_col))
    e = (F.sum("is_y").over(w_ecdf).cast("double") / n_y).alias("e")
    scored = stacked.select(group_col, key_col, "is_y", e)
    pairs = scored.groupBy(group_col, key_col).agg(
        F.max(F.when(F.col("is_y") == 1, F.col("e"))).alias("ey"),
        F.max(F.when(F.col("is_y") == 0, F.col("e"))).alias("ep"),
    )
    d = F.col("ep") - F.col("ey")
    return pairs.groupBy(group_col).agg(
        F.avg(d * d).alias("crps"), F.avg(F.abs(d)).alias("leps")
    )


def mean_absolute_scaled_error(y, yhat, naive_abs_diff) -> Column:
    """MASE (kats/metrics/metrics.py:466): MAE / mean |seasonal naive error|.

    ``naive_abs_diff`` is a per-row column of |y_t - y_{t-m}| computed by the
    caller with a lag window (the scaling denominator is over the training
    series)."""
    return F.avg(F.abs(error(y, yhat))) / F.avg(_c(naive_abs_diff))


_REGISTRY: dict[str, Callable[..., Column]] = {
    "me": mean_error,
    "mae": mean_absolute_error,
    "mdae": median_absolute_error,
    "max_error": max_error,
    "mse": mean_squared_error,
    "rmse": root_mean_squared_error,
    "msle": mean_squared_log_error,
    "rmsle": root_mean_squared_log_error,
    "mape": mean_absolute_percentage_error,
    "mdape": median_absolute_percentage_error,
    "smape": symmetric_mean_absolute_percentage_error,
    "mpe": mean_percentage_error,
    "rmspe": root_mean_squared_percentage_error,
    "tracking_signal": tracking_signal,
    "exceed": exceed_rate,
    "pinball": pinball_loss,
    "coverage": coverage,
    "interval_score": interval_score,
    "mase": mean_absolute_scaled_error,
    "ssmape": scaled_symmetric_mean_absolute_percentage_error,
    "sbias": symmetric_bias,
    "frequency_exceed": frequency_exceeds_relative_threshold,
    "exceed_at": exceed_at,
}


def metric(name: str) -> Callable[..., Column]:
    """Registry lookup (kats/metrics/metrics.py:976)."""
    return _REGISTRY[name]


def all_metrics() -> list[str]:
    return sorted(_REGISTRY)


# --------------------------------------------------------------------------
# Metric metadata (kats/metrics/metadata.py:16-130): type (score / error /
# neither), improvement direction, and value bounds per registry name —
# what evaluator UIs and model-selection loops need to rank without
# hard-coding per-metric logic.
# --------------------------------------------------------------------------

from typing import NamedTuple  # noqa: E402


class MetricMetadata(NamedTuple):
    kind: str            # 'score' | 'error' | 'none'
    direction: str       # 'positive' (larger better) | 'negative' | 'none'
    lower_bound: float
    upper_bound: float


_INF = float("inf")
_NONNEG_ERR = MetricMetadata("error", "negative", 0.0, _INF)
_RATE_ERR = MetricMetadata("error", "negative", 0.0, 1.0)
_UNBOUNDED_ERR = MetricMetadata("error", "none", -_INF, _INF)
_UNBOUNDED = MetricMetadata("none", "none", -_INF, _INF)
_SCORE_MIN_0 = MetricMetadata("score", "positive", 0.0, _INF)

_METADATA: dict[str, MetricMetadata] = {
    "me": _UNBOUNDED_ERR,
    "mae": _NONNEG_ERR,
    "mdae": _UNBOUNDED_ERR,
    "max_error": _UNBOUNDED_ERR,
    "mse": _NONNEG_ERR,
    "rmse": _NONNEG_ERR,
    "msle": _NONNEG_ERR,
    "rmsle": _NONNEG_ERR,
    "mape": _NONNEG_ERR,
    "mdape": _NONNEG_ERR,
    "smape": _RATE_ERR,
    "mpe": _UNBOUNDED_ERR,
    "rmspe": _NONNEG_ERR,
    "tracking_signal": _UNBOUNDED_ERR,
    "exceed": _RATE_ERR,
    "pinball": _NONNEG_ERR,
    "coverage": MetricMetadata("score", "positive", 0.0, 1.0),
    "interval_score": _SCORE_MIN_0,
    "mase": _NONNEG_ERR,
    "ssmape": _RATE_ERR,
    "sbias": _UNBOUNDED,
    "frequency_exceed": _RATE_ERR,
    "exceed_at": _RATE_ERR,
}


def metric_metadata(name: str) -> MetricMetadata:
    """Metadata lookup; KeyError lists known names, same error contract
    as ``metric``."""
    try:
        return _METADATA[name]
    except KeyError:
        raise KeyError(
            f"No metadata for metric {name!r}; known: {sorted(_METADATA)}"
        ) from None
