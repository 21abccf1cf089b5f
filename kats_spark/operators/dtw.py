"""DTW-based changepoint detection.

Parity with kats/detectors/dtwcpd.py:84-376 (``DTWCPDDetector``): slide a
window over each series, compute the dynamic-time-warping distance between
consecutive (non-overlapping) subsequences, and flag positions where the
DTW distance spikes — a shape-change detector robust to small time
misalignments that pointwise diffs miss.

Per-series ``applyInPandas``; the DTW kernel is a banded (Sakoe-Chiba)
O(w·band) dynamic program in numpy per window pair, so cost is linear in
series length for fixed window.  Rows-only correctness (iterative DP);
seeded-simulation test injects a waveform change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from kats_spark.tsframe import TSSchema, DEFAULT


def _dtw_dist(a: np.ndarray, b: np.ndarray, band: int) -> float:
    n, m = len(a), len(b)
    INF = np.inf
    prev = np.full(m + 1, INF)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF)
        lo = max(1, i - band)
        hi = min(m, i + band)
        for j in range(lo, hi + 1):
            cost = abs(a[i - 1] - b[j - 1])
            cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return float(prev[m])


def dtw_scores(
    df: DataFrame,
    window: int = 24,
    band: int = 4,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, dtw_dist): DTW distance between the window ending
    at t and the preceding window, emitted every ``window//2`` points."""
    step = max(window // 2, 1)
    schema = f"{s.series_id} string, {s.time} timestamp, dtw_dist double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time).reset_index(drop=True)
        y = pdf[s.value].to_numpy(dtype=float)
        sid = pdf[s.series_id].iloc[0]
        rows = []
        for end in range(2 * window, len(y) + 1, step):
            cur = y[end - window : end]
            prev_w = y[end - 2 * window : end - window]
            rows.append(
                {
                    s.series_id: sid,
                    s.time: pdf[s.time].iloc[end - 1],
                    "dtw_dist": round(_dtw_dist(cur, prev_w, band), 6),
                }
            )
        return pd.DataFrame(rows, columns=[s.series_id, s.time, "dtw_dist"])

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )


def dtw_detect(
    df: DataFrame,
    window: int = 24,
    band: int = 4,
    z_threshold: float = 3.0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Changepoints = windows whose DTW distance is a robust-z outlier vs
    the series' own distance distribution."""
    from pyspark.sql import functions as F

    sc = dtw_scores(df, window, band, s)
    stats = sc.groupBy(s.series_id).agg(
        F.median("dtw_dist").alias("__med"),
        F.percentile(F.col("dtw_dist"), F.lit(0.75)).alias("__q3"),
        F.percentile(F.col("dtw_dist"), F.lit(0.25)).alias("__q1"),
    )
    iqr_sd = (F.col("__q3") - F.col("__q1")) / 1.349
    return (
        sc.join(F.broadcast(stats), s.series_id)
        .withColumn(
            "dtw_z",
            F.when(iqr_sd > 0, (F.col("dtw_dist") - F.col("__med")) / iqr_sd),
        )
        .filter(F.col("dtw_z") > z_threshold)
        .select(s.series_id, s.time, "dtw_dist", F.round("dtw_z", 6).alias("dtw_z"))
    )
