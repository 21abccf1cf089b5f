"""Operator / detector / model registries.

Parity with kats/detectors/detector.py:38-78 (``DetectorModelRegistry``,
a metaclass auto-registering every concrete DetectorModel subclass by
class name) and the metric registry (kats/metrics/metrics.py:976).
Our operators are functions, not classes, so the registry is an explicit
name -> callable dict with a decorator for registration; lookups raise
KeyError listing the known names (mirroring the reference's error path,
detector.py:71-78).
"""

from __future__ import annotations

from typing import Callable


class Registry:
    """Name -> callable registry with decorator registration."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: dict[str, Callable] = {}

    def register(self, name: str | None = None) -> Callable:
        def deco(fn: Callable) -> Callable:
            self._entries[name or fn.__name__] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable:
        try:
            return self._entries[name]
        except KeyError:
            raise KeyError(
                f"No {self.kind} registered under {name!r}; known: {sorted(self._entries)}"
            ) from None

    def names(self) -> list[str]:
        return sorted(self._entries)


def builtin_detectors() -> Registry:
    """The always-available detector surface, keyed by the reference's
    class names (DetectorModelRegistry.get_detector_model_by_name,
    detector.py:71)."""
    from kats_spark.operators import (
        bocpd, cusum, dtw, hourly_ratio, interval, mk, outlier,
        robust_stat, seasonality, statsig, threshold,
    )

    r = Registry("detector")
    r._entries.update(
        {
            "CUSUMDetector": cusum.cusum_detect,
            "BOCPDetector": bocpd.bocpd_detect,
            "OutlierDetector": outlier.outlier_detect,
            "RobustStatDetector": robust_stat.robust_stat_scores,
            "MKDetector": mk.mk_rolling,
            "FFTDetector": seasonality.fft_detect,
            "HourlyRatioDetector": hourly_ratio.hourly_ratio_detect,
            "DTWCPDDetector": dtw.dtw_detect,
            "StatSigDetectorModel": statsig.statsig_scores,
            "StaticThresholdModel": threshold.static_threshold_scores,
            "IntervalDetectorModel": interval.two_sample_scores,
        }
    )
    return r


def builtin_forecasters() -> Registry:
    """Forecaster surface, keyed by the reference's model module names
    (kats/models/model.py:18 contract)."""
    from kats_spark.models import (
        ar, arima, bvar, fcst, harmonic, neural_prophet_lite, prophet_lite,
        rnn, sarima, std_global, stlf,
    )
    from kats_spark.operators import trend, var

    def _fcst(model: str):
        return lambda df, steps, freq_seconds, **kw: fcst.forecast(
            df, model, steps, freq_seconds, **kw
        )

    r = Registry("forecaster")
    r._entries.update(
        {
            "linear": trend.linear_forecast,
            "quadratic": trend.quadratic_forecast,
            "arima": arima.arima_forecast,
            "sarima": sarima.sarima_forecast,
            "ar": ar.ar2_forecast,
            "theta": _fcst("theta"),
            "ses": _fcst("ses"),
            "holt": _fcst("holt"),
            "damped": _fcst("holt_damped"),
            "holtwinters": _fcst("holtwinters"),
            "holtwinters_mul": _fcst("holtwinters_mul"),
            "simple_heuristic": fcst.simple_heuristic_forecast,
            "harmonic": harmonic.harmonic_forecast,
            "stlf": stlf.stlf_forecast,
            "prophet": prophet_lite.prophet_forecast,
            "neuralprophet": neural_prophet_lite.neural_prophet_forecast,
            "lstm": rnn.lstm_forecast,
            "gru": rnn.rnn_forecast,
            "var": var.var_forecast,
            "bayesian_var": bvar.bvar_forecast,
            "std_global": std_global.std_global_forecast,
        }
    )
    return r
