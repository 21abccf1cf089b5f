"""CUSUM changepoint detector — per-series numpy kernel, distributed fan-out.

Parity with kats/detectors/cusum_detection.py:309-738 (``CUSUMDetector``):
- iterative likelihood-ratio CUSUM mean-shift search (`_get_change_point`
  :345-430): start at argmin/argmax of cumsum(ts - mean), refine up to
  ``max_iter`` by re-estimating (mu0, mu1) around the candidate;
- log-likelihood ratio of the two-segment model vs the pooled model
  (`_get_llr` :425-475), p-value 1 - chi2.cdf(llr, 2) (:614);
- significance gate llr > chi2.ppf(1 - threshold, 2) plus
  ``delta_std_ratio`` and ``min_abs_change`` magnitude gates (:620-640);
- both directions searched by default (increase / decrease).

chi2 with df=2 is the exponential distribution, so no scipy:
cdf(x) = 1 - exp(-x/2) and ppf(q) = -2 ln(1-q).

The per-series recursion is genuinely iterative (argmin of a running sum
re-computed each refinement), so it runs as one Arrow-batched
``applyInPandas`` per series — the reference's VectorizedCUSUMDetector
(:962) exists only to batch series in numpy; Spark's groupBy partitioning
makes it redundant.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from kats_spark.tsframe import TSSchema, DEFAULT


def _log_llr(x: np.ndarray, mu0: float, sigma0: float, mu1: float, sigma1: float) -> float:
    return float(
        np.sum(np.log(sigma1 / sigma0) + 0.5 * (((x - mu1) / sigma1) ** 2 - ((x - mu0) / sigma0) ** 2))
    )


def _llr(ts: np.ndarray, mu0: float, mu1: float, cp: int) -> float:
    scale = math.sqrt(
        (np.sum((ts[: cp + 1] - mu0) ** 2) + np.sum((ts[cp + 1:] - mu1) ** 2)) / (len(ts) - 2)
    )
    mu_t, sigma_t = float(np.mean(ts)), float(np.std(ts))
    if scale == 0:
        scale = sigma_t * 0.01
    return -2 * (
        _log_llr(ts[: cp + 1], mu_t, sigma_t, mu0, scale)
        + _log_llr(ts[cp + 1:], mu_t, sigma_t, mu1, scale)
    )


def _find_cp(ts: np.ndarray, direction: str, max_iter: int) -> tuple[int, bool]:
    pick = np.argmin if direction == "increase" else np.argmax
    cusum = np.cumsum(ts - np.mean(ts))
    cp = min(int(pick(cusum)), len(ts) - 2)
    stable = False
    for _ in range(max_iter):
        mu0 = np.mean(ts[: cp + 1])
        mu1 = np.mean(ts[cp + 1:])
        cusum = np.cumsum(ts - (mu0 + mu1) / 2)
        nxt = max(1, min(int(pick(cusum)), len(ts) - 2))
        if nxt == cp:
            stable = True
            break
        cp = nxt
    return cp, stable


def _detect_one(
    ts: np.ndarray,
    times: np.ndarray,
    threshold: float,
    max_iter: int,
    delta_std_ratio: float,
    min_abs_change: float,
) -> list[dict]:
    out = []
    if len(ts) < 10:
        return out
    crit = -2.0 * math.log(threshold)  # chi2.ppf(1 - threshold, 2)
    for direction in ("increase", "decrease"):
        cp, stable = _find_cp(ts, direction, max_iter)
        mu0 = float(np.mean(ts[: cp + 1]))
        mu1 = float(np.mean(ts[cp + 1:]))
        llr = _llr(ts, mu0, mu1, cp)
        p_value = math.exp(-llr / 2) if llr < 1400 else 0.0  # 1 - chi2.cdf(llr, 2)
        change_ok = (mu1 > mu0) if direction == "increase" else (mu1 < mu0)
        std = float(np.std(ts))
        significant = (
            llr > crit
            and change_ok
            and abs(mu1 - mu0) > delta_std_ratio * std
            and abs(mu1 - mu0) > min_abs_change
        )
        if significant:
            out.append(
                {
                    "cp_time": times[cp],
                    "cp_index": int(cp),
                    "direction": direction,
                    "mu0": mu0,
                    "mu1": mu1,
                    "delta": mu1 - mu0,
                    "llr": float(llr),
                    "p_value": float(p_value),
                    "stable": bool(stable),
                }
            )
    return out


def cusum_detect(
    df: DataFrame,
    threshold: float = 0.01,
    max_iter: int = 10,
    delta_std_ratio: float = 1.0,
    min_abs_change: float = 0.0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """One row per significant changepoint:
    (series_id, cp_time, cp_index, direction, mu0, mu1, delta, llr,
    p_value, stable)."""
    schema = (
        f"{s.series_id} string, cp_time timestamp, cp_index int, direction string, "
        "mu0 double, mu1 double, delta double, llr double, p_value double, stable boolean"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        ts = pdf[s.value].to_numpy(dtype=float)
        times = pdf[s.time].to_numpy()
        rows = _detect_one(ts, times, threshold, max_iter, delta_std_ratio, min_abs_change)
        sid = pdf[s.series_id].iloc[0]
        return pd.DataFrame(
            [
                {
                    s.series_id: sid,
                    **r,
                }
                for r in rows
            ],
            columns=[
                s.series_id, "cp_time", "cp_index", "direction", "mu0", "mu1",
                "delta", "llr", "p_value", "stable",
            ],
        )

    return df.select(s.series_id, s.time, s.value).groupBy(s.series_id).applyInPandas(fn, schema)
