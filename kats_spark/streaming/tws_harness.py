"""Streaming DetectorModel harness on ``transformWithStateInPandas``
(Spark 4 arbitrary-stateful API) — the modern twin of
``detector_harness.zscore_stream``.

Same DetectorModel contract mapping (kats/detectors/detector.py:137-207:
serialize() bytes as state, fit_predict as the per-micro-batch update) and
the SAME update rule (`detector_harness._update_one`), so streaming output
is bit-equal to ``detector_harness.zscore_batch``.  What the new API adds
over ``applyInPandasWithState``:

- **Native state TTL**: ``getValueState(..., ttlDurationMs=...)`` lets the
  state store itself expire idle series — the reference's retention
  contract (7-day changepoint retention, kats/detectors/cusum_model.py:59)
  becomes a store property instead of hand-rolled updater logic, and
  expiry cost is RocksDB-side, not per-batch Python.
- **Typed composite state**: value/list/map states per key instead of one
  packed tuple — a CUSUM model can keep its changepoint list in a
  ListState and its running moments in a ValueState independently.
- **Timers**: event/processing-time callbacks for emit-on-silence
  detectors (not used by the z-score model).

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` →
``...state.RocksDBStateStoreProvider``); the HDFS-backed default does not
support transformWithState.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from kats_spark.streaming.detector_harness import (
    OUTPUT_SCHEMA,
    _update_one,
    deserialize_state,
    serialize_state,
)
from kats_spark.tsframe import TSSchema, DEFAULT

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# the reference's changepoint-retention default (cusum_model.py:59) as a
# state-store TTL
RETENTION_7D_MS = 7 * 24 * 3600 * 1000


class ZScoreProcessor(StatefulProcessor):
    """Welford z-score DetectorModel as a StatefulProcessor: one ValueState
    holding the versioned-JSON serialize() payload."""

    def __init__(
        self,
        z_threshold: float = 3.0,
        s: TSSchema = DEFAULT,
        state_ttl_ms: int | None = None,
        late_tolerance_seconds: float | None = None,
    ) -> None:
        self._z = z_threshold
        self._s = s
        self._ttl = state_ttl_ms
        self._late_tol = late_tolerance_seconds

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "detector", "state_json string", ttlDurationMs=self._ttl
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        s = self._s
        existing = self._state.get()
        st = deserialize_state(existing[0] if existing else None)
        out_rows: list[dict] = []
        pdf = pd.concat(list(rows), ignore_index=True).sort_values(s.time)
        for _, row in pdf.iterrows():
            ts = pd.Timestamp(row[s.time]).value / 1e9
            if self._late_tol is not None:
                max_seen = st.get("max_ts")
                if max_seen is not None and ts < max_seen - self._late_tol:
                    continue  # late beyond the watermark bound: drop
                st["max_ts"] = max(max_seen or ts, ts)
            res = _update_one(st, float(row[s.value]), self._z)
            out_rows.append(
                {s.series_id: key[0], s.time: row[s.time], s.value: row[s.value], **res}
            )
        self._state.update((serialize_state(st),))
        yield pd.DataFrame(out_rows)

    def close(self) -> None:
        pass


def zscore_stream_tws(
    stream_df: DataFrame,
    z_threshold: float = 3.0,
    s: TSSchema = DEFAULT,
    state_ttl_ms: int | None = None,
    late_policy_watermark: str | None = None,
) -> DataFrame:
    """Wire a streaming long frame through the TWS stateful detector.

    ``state_ttl_ms`` (e.g. ``RETENTION_7D_MS``) expires idle series' state
    natively; TTL is processing-time based, so timeMode switches to
    processingTime when set."""
    tol = None
    if late_policy_watermark is not None:
        stream_df = stream_df.withWatermark(s.time, late_policy_watermark)
        tol = pd.Timedelta(late_policy_watermark).total_seconds()
    return stream_df.groupBy(s.series_id).transformWithStateInPandas(
        statefulProcessor=ZScoreProcessor(
            z_threshold, s, state_ttl_ms=state_ttl_ms, late_tolerance_seconds=tol
        ),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime" if state_ttl_ms else "none",
    )
