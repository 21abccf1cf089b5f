"""Distribution-distance detector: JS divergence vs the series' own past.

Parity with kats/detectors/distribution_distance_model.py:147-368
(``DistributionDistanceModel``): for each point, build the empirical
percentile vector of the trailing window ending at t and of the window one
``window`` earlier, and score their Jensen-Shannon divergence; a
distribution shift (not just a mean shift) raises the score.

Spark plan: the two windows are ``collect_list`` frame aggregates over
``rowsBetween`` specs (JVM-side gather — the only UDF work is the
percentile + JS math on two small arrays per row, vectorized via an
Arrow-batched pandas UDF).  No self-join: one sort, two frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kats_spark.tsframe import TSSchema, DEFAULT

_NBINS = 20


def _js_div(c: np.ndarray, p: np.ndarray) -> float:
    """JS divergence between the two windows' empirical distributions,
    histogrammed on a COMMON bin grid spanning both samples (so location
    AND scale shifts move mass between bins)."""
    lo = min(c.min(), p.min())
    hi = max(c.max(), p.max())
    if not np.isfinite(lo) or not np.isfinite(hi) or hi <= lo:
        return 0.0
    edges = np.linspace(lo, hi, _NBINS + 1)
    pc, _ = np.histogram(c, bins=edges)
    pp, _ = np.histogram(p, bins=edges)
    pc = pc / pc.sum() + 1e-12
    pp = pp / pp.sum() + 1e-12
    m = 0.5 * (pc + pp)
    kl = lambda a, b: float(np.sum(a * np.log(a / b)))
    return 0.5 * kl(pc, m) + 0.5 * kl(pp, m)


def _make_js_udf():
    # built lazily: pandas_udf parses its DDL type against the live session
    @pandas_udf("double")
    def _js_udf(cur: pd.Series, prev: pd.Series) -> pd.Series:
        out = np.full(len(cur), np.nan)
        for i, (c, p) in enumerate(zip(cur, prev)):
            if c is None or p is None:
                continue
            c = np.asarray(c, dtype=float)
            p = np.asarray(p, dtype=float)
            if len(c) < 5 or len(p) < 5:
                continue
            out[i] = _js_div(c, p)
        return pd.Series(out)

    return _js_udf


def distribution_distance_scores(
    df: DataFrame,
    window: int = 48,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, value, js_div) — NULL until both windows fill."""
    js_udf = _make_js_udf()
    w_cur = s.w().rowsBetween(-(window - 1), 0)
    w_prev = s.w().rowsBetween(-(2 * window - 1), -window)
    cnt_prev = F.count(s.value).over(w_prev)
    return (
        df.withColumn("__cur", F.collect_list(s.value).over(w_cur))
        .withColumn("__prev", F.collect_list(s.value).over(w_prev))
        .withColumn("__np", cnt_prev)
        .withColumn(
            "js_div",
            F.when(
                F.col("__np") == window,
                F.round(js_udf(F.col("__cur"), F.col("__prev")), 6),
            ),
        )
        .select(s.series_id, s.time, s.value, "js_div")
    )
