"""Seasonality detection: FFT peak detector.

Parity with kats/detectors/seasonality.py:185-~330 (``FFTDetector``,
detector :204): rfft the demeaned series, flag frequencies whose spectral
power is a MAD-outlier above the spectrum median, convert to periods, and
prune harmonics (a candidate that is an integer multiple of a stronger
one, mirroring ``_get_seasonality_length`` :82-88 in the ACF detector).

One numpy rfft per series inside ``applyInPandas`` — Arrow batch in, tiny
(series_id, period) frame out, so the shuffle payload is the raw series
once and the result is per-series-constant rows.  Rows-only correctness
(no SQL FFT); the seeded-simulator test injects a known period and asserts
recovery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from kats_spark.tsframe import TSSchema, DEFAULT


def _fft_periods(y: np.ndarray, mad_threshold: float, max_periods: int) -> list[tuple[float, float]]:
    n = len(y)
    y = y - y.mean()
    power = np.abs(np.fft.rfft(y)) ** 2 / n
    freqs = np.fft.rfftfreq(n)  # cycles per sample
    power, freqs = power[1:], freqs[1:]  # drop DC
    med = float(np.median(power))
    mad = float(np.median(np.abs(power - med))) or 1e-12
    score = (power - med) / (1.4826 * mad)
    idx = np.where(score > mad_threshold)[0]
    if len(idx) == 0:
        return []
    cands = sorted(
        ((1.0 / freqs[i], float(score[i])) for i in idx), key=lambda t: -t[1]
    )
    kept: list[tuple[float, float]] = []
    for period, sc in cands:
        if period >= n / 2:  # fewer than 2 full cycles observed
            continue
        is_harmonic = False
        for kp, _ in kept:
            ratio = max(period, kp) / min(period, kp)
            if abs(ratio - round(ratio)) < 0.05:
                is_harmonic = True
                break
        if not is_harmonic:
            kept.append((period, sc))
        if len(kept) >= max_periods:
            break
    return kept


def fft_detect(
    df: DataFrame,
    mad_threshold: float = 6.0,
    max_periods: int = 3,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Detected seasonal periods per series:
    (series_id, period, strength) — period in samples, strongest first."""
    schema = f"{s.series_id} string, period double, strength double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        sid = pdf[s.series_id].iloc[0]
        if len(y) < 8:
            return pd.DataFrame(columns=[s.series_id, "period", "strength"])
        kept = _fft_periods(y, mad_threshold, max_periods)
        return pd.DataFrame(
            {
                s.series_id: [sid] * len(kept),
                "period": [round(p, 4) for p, _ in kept],
                "strength": [round(sc, 4) for _, sc in kept],
            }
        )

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )
