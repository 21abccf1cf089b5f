"""KDE residual translator: residual -> false-alarm probability.

Parity with kats/detectors/residual_translation.py:29-227
(``KDEResidualTranslator``): fit a Gaussian kernel density to a detector's
residuals and translate each residual into a probability of being at
least that extreme (1 - CDF of |residual| under the KDE) — a calibrated
anomaly probability instead of a raw score.

No sklearn: the Gaussian KDE CDF is a closed form over the sample points,
Phi((x - x_i)/bw) averaged — vectorized numpy per series inside one
``applyInPandas`` (the fit "model" IS the residual sample + bandwidth,
which is also what sklearn's KernelDensity stores).

erf uses the Abramowitz & Stegun 7.1.26 rational approximation
(|error| <= 1.5e-7, far inside the 1e-6 output rounding) instead of libm
erf: the identical double-precision expression evaluates in the DuckDB
oracle, giving bit-level cross-engine parity for the correctness gate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from kats_spark.tsframe import TSSchema, DEFAULT


def _erf_as(x: np.ndarray) -> np.ndarray:
    """Abramowitz & Stegun 7.1.26 (same Horner form as the SQL oracle)."""
    sign = np.sign(x)
    ax = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736)
        * t
        + 0.254829592
    ) * t
    return sign * (1.0 - poly * np.exp(-ax * ax))


def _phi(z: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + _erf_as(z / math.sqrt(2.0)))


def kde_translate(
    df: DataFrame,
    residual_col: str = "residual",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, residual, proba): two-sided tail probability of
    each residual under the per-series Gaussian KDE (Silverman bandwidth).
    """
    schema = f"{s.series_id} string, {s.time} timestamp, {residual_col} double, proba double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        r = pdf[residual_col].to_numpy(dtype=float)
        ok = np.isfinite(r)
        out = pd.DataFrame(
            {
                s.series_id: pdf[s.series_id],
                s.time: pdf[s.time],
                residual_col: r,
            }
        )
        proba = np.full(len(r), np.nan)
        sample = r[ok]
        n = len(sample)
        if n >= 10:
            sd = np.std(sample, ddof=1)
            iqr = np.subtract(*np.percentile(sample, [75, 25]))
            a = min(sd, iqr / 1.349) if iqr > 0 else sd
            bw = 0.9 * a * n ** (-0.2) if a > 0 else 1.0
            # P(|X| >= |x|) under KDE: 1 - (F(|x|) - F(-|x|))
            absr = np.abs(r[ok])
            f_hi = _phi((absr[:, None] - sample[None, :]) / bw).mean(axis=1)
            f_lo = _phi((-absr[:, None] - sample[None, :]) / bw).mean(axis=1)
            proba[ok] = 1.0 - (f_hi - f_lo)
        out["proba"] = np.round(proba, 6)
        return out

    return (
        df.select(s.series_id, s.time, residual_col)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )
