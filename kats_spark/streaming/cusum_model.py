"""Streaming CUSUMDetectorModel on ``applyInPandasWithState``.

Parity with kats/detectors/cusum_model.py:150-680 (``CUSUMDetectorModel``,
fit_predict :594, window algebra :603-612): maintain a reference regime
(historical window) and scan incoming points with a two-sided tabular
CUSUM; crossing the decision interval emits a changepoint, resets the
statistic, and restarts the reference regime — the incremental analog of
the reference's historical_window/scan_window/step_window loop.

State (versioned JSON, vN+1-loads-vN like kats/detectors/detector.py:157):
- Welford (n, mean, m2) of the CURRENT regime = ``historical_data``
- s_pos / s_neg        = tabular CUSUM statistics
- changepoints         = [(epoch_seconds, direction)] with the reference's
                         retention rules: 7-day TTL (cusum_model.py:59
                         CHANGEPOINT_RETENTION) and 10-cp cap (:61
                         MAX_CHANGEPOINT)

Output rows are the AnomalyResponse shape; ``score`` follows
CusumScoreFunction.z_score (cusum_model.py:124): standardized deviation
from the regime mean.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kats_spark.tsframe import TSSchema, DEFAULT

STATE_VERSION = 1
RETENTION_SEC = 604800  # 7 days, cusum_model.py:59
MAX_CHANGEPOINTS = 10  # cusum_model.py:61

OUTPUT_SCHEMA = (
    "series_id string, time timestamp, value double, score double, "
    "predicted double, lower double, upper double, stat_sig int, cp_flag int"
)
STATE_SCHEMA = "state_json string"


def _new_state() -> dict[str, Any]:
    return {
        "version": STATE_VERSION,
        "n": 0,
        "mean": 0.0,
        "m2": 0.0,
        "s_pos": 0.0,
        "s_neg": 0.0,
        "changepoints": [],
    }


def serialize_state(state: dict[str, Any]) -> str:
    return json.dumps(state, sort_keys=True)


def deserialize_state(raw: str | None) -> dict[str, Any]:
    if not raw:
        return _new_state()
    base = _new_state()
    base.update(json.loads(raw))
    return base


def _update_one(
    state: dict[str, Any],
    value: float,
    epoch_sec: float,
    k: float,
    h: float,
    min_history: int,
) -> dict[str, Any]:
    n, mean, m2 = state["n"], state["mean"], state["m2"]
    sd = (m2 / (n - 1)) ** 0.5 if n >= 2 else 0.0
    cp_flag = 0
    if n >= min_history and sd > 0:
        z = (value - mean) / sd
        score = z
        s_pos = max(0.0, state["s_pos"] + z - k)
        s_neg = max(0.0, state["s_neg"] - z - k)
        if s_pos > h or s_neg > h:
            cp_flag = 1
            direction = "increase" if s_pos > h else "decrease"
            cps = [
                cp for cp in state["changepoints"]
                if epoch_sec - cp[0] <= RETENTION_SEC
            ]
            cps.append([epoch_sec, direction])
            state["changepoints"] = cps[-MAX_CHANGEPOINTS:]
            # new regime: reset statistic and reference window
            state.update(n=0, mean=0.0, m2=0.0, s_pos=0.0, s_neg=0.0)
            n, mean, m2 = 0, 0.0, 0.0
        else:
            state.update(s_pos=s_pos, s_neg=s_neg)
        lower, upper = mean - h * sd, mean + h * sd
        stat_sig = int(abs(z) > h) if cp_flag == 0 else 1
    else:
        score, lower, upper, stat_sig = 0.0, None, None, 0
    # Welford into the (possibly fresh) regime
    n += 1
    delta = value - mean
    mean += delta / n
    m2 += delta * (value - mean)
    state.update(n=n, mean=mean, m2=m2)
    return {
        "score": score,
        "predicted": mean,
        "lower": lower,
        "upper": upper,
        "stat_sig": stat_sig,
        "cp_flag": cp_flag,
    }


def make_cusum_updater(
    k: float = 0.5, h: float = 5.0, min_history: int = 10, s: TSSchema = DEFAULT
):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = deserialize_state(state.get[0] if state.exists else None)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(s.time)
            for _, row in pdf.iterrows():
                ts = pd.Timestamp(row[s.time])
                res = _update_one(
                    st, float(row[s.value]), ts.timestamp(), k, h, min_history
                )
                rows.append(
                    {s.series_id: key[0], s.time: row[s.time], s.value: row[s.value], **res}
                )
        state.update((serialize_state(st),))
        yield pd.DataFrame(rows)

    return update


def cusum_stream(
    stream_df: DataFrame,
    k: float = 0.5,
    h: float = 5.0,
    min_history: int = 10,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    return stream_df.groupBy(s.series_id).applyInPandasWithState(
        make_cusum_updater(k, h, min_history, s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_batch(
    df: DataFrame,
    k: float = 0.5,
    h: float = 5.0,
    min_history: int = 10,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Batch reference with the identical update rule (streaming==batch
    parity target)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        st = _new_state()
        rows = []
        for _, row in pdf.sort_values(s.time).iterrows():
            ts = pd.Timestamp(row[s.time])
            res = _update_one(st, float(row[s.value]), ts.timestamp(), k, h, min_history)
            rows.append(
                {s.series_id: row[s.series_id], s.time: row[s.time], s.value: row[s.value], **res}
            )
        return pd.DataFrame(rows)

    return df.groupBy(s.series_id).applyInPandas(fn, OUTPUT_SCHEMA)
