"""Streaming RollingStatsModel on ``applyInPandasWithState``.

Parity with kats/detectors/rolling_stats_model.py:188-498
(``RollingStatsModel``): each arriving point scores against its own
TRAILING window (the ``point_based=False`` convention — window excludes
the scored point), for the z-score / IQR / MAD score family
(rolling_stats_model.py:58-187).

State = ring buffer of the last ``n`` values per series (versioned JSON,
vN+1 loads vN).  Streaming == batch: scores equal the window-expression
plan in functions/rolling.py row for row (partial-window semantics
included: mean over whatever the clamped frame holds, std needs >= 2
points, exact linear-interpolated percentiles) — asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd

from kats_spark.sources.state import StateCodec
from kats_spark.tsframe import TSSchema, DEFAULT

OUTPUT_SCHEMA = (
    "series_id string, time timestamp, value double, "
    "z_score double, iqr_score double, mad_score double"
)
STATE_SCHEMA = "state_json string"

CODEC = StateCodec(1, {"buf": []})


def _scores(buf: list[float], value: float) -> tuple:
    """Scores of ``value`` vs the trailing buffer (excluded point)."""
    z = iqr = mad = None
    if buf:
        arr = np.asarray(buf, dtype=float)
        mean = float(arr.mean())
        if len(arr) >= 2:
            std = float(arr.std(ddof=1))
            if std > 0:
                z = (value - mean) / std
        med = float(np.percentile(arr, 50))
        q75 = float(np.percentile(arr, 75))
        q25 = float(np.percentile(arr, 25))
        rng = q75 - q25
        if rng > 0:
            iqr = (value - med) / rng
        m = float(np.percentile(np.abs(arr - med), 50))
        if m > 0:
            mad = (value - med) / m
    return z, iqr, mad


def make_rolling_updater(n: int, s: TSSchema = DEFAULT):
    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (sid,) = key
        st: dict[str, Any] = CODEC.loads(state.get[0]) if state.exists else CODEC.new()
        buf = list(st["buf"])
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(s.time)
            for t, v in zip(pdf[s.time], pdf[s.value]):
                z, iqr, mad = _scores(buf, float(v))
                out.append((sid, t, float(v), z, iqr, mad))
                buf = (buf + [float(v)])[-n:]
        st["buf"] = buf
        state.update((CODEC.dumps(st),))
        yield pd.DataFrame(
            out,
            columns=[s.series_id, s.time, s.value, "z_score", "iqr_score", "mad_score"],
        )

    return update


def rolling_stream(stream_df, n: int, s: TSSchema = DEFAULT):
    """Structured Streaming rolling-stats scorer."""
    return stream_df.groupBy(s.series_id).applyInPandasWithState(
        make_rolling_updater(n, s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def rolling_batch(df, n: int, s: TSSchema = DEFAULT):
    """Batch twin from the window-expression library (one plan, no UDF)."""
    from pyspark.sql import functions as F

    from kats_spark.functions import rolling as R

    return R.with_mad_scores(df, n, s).select(
        s.series_id,
        s.time,
        F.col(s.value),
        R.z_score(n, s).alias("z_score"),
        R.iqr_score(n, s).alias("iqr_score"),
        "mad_score",
    )
