"""Bucketed series store — the optional zero-shuffle layout from
SURVEY §4 (reference has no equivalent; Kats is single-machine so every
"shuffle" is free — at cluster scale the groupBy(series_id) exchange is
the dominant cost of per-series operators).

Writing the long table bucketed (and sorted) by ``series_id`` makes the
scan report HashPartitioning(series_id), which satisfies the clustered
distribution required by every per-series window, groupBy and join in
the engine — Catalyst drops the Exchange from all of them.  At 100 TB
this converts every per-series operator from "full shuffle of the fact
table" to "local sort (or nothing, with sortBy) per bucket file".

Bucket count guidance: ~2-4× total executor cores, and at least
``|table| / 1 GiB`` so single buckets fit in executor memory; skewed
giant series stay a single bucket (bucketing is hash-on-key) — chunk
those inside the operator like the reference's ``max_split_ts_length``
(kats/detectors/stat_sig_detector.py:66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str = "series_id",
    time_col: str = "time",
    buckets: int = 32,
) -> None:
    """Persist ``df`` as a parquet table bucketed by ``key`` and sorted by
    (key, time) inside each bucket — per-series windows then need neither
    exchange nor sort."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key, time_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange nodes in the executed plan (broadcast
    exchanges excluded — they move a small side to every executor, not the
    fact table) — the metric the bucketed layout drives to zero for
    per-series ops."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")
