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
}


def metric(name: str) -> Callable[..., Column]:
    """Registry lookup (kats/metrics/metrics.py:976)."""
    return _REGISTRY[name]


def all_metrics() -> list[str]:
    return sorted(_REGISTRY)
