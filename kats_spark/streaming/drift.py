"""Streaming distribution-drift monitor — the deploy-time twin of the
batch drift operators (``dist_distance.psi_drift`` / ``ks_drift``): a
metric stream is scored per event-time window against a STATIC
reference histogram, emitting one PSI row per (window, key) as the
window closes.

Streaming-legal by construction (append mode allows at most one
aggregation, and joins may not FOLLOW it):

1. the reference — per-key bin edges + reference probabilities — is a
   tiny static frame broadcast-joined to the raw stream BEFORE the
   aggregation (stream-static joins pre-aggregation are allowed);
2. ONE windowed aggregation (watermarked event time) computes the
   current window's per-bin counts as ``n_bins`` conditional sums —
   not a per-(window, key, bin) groupBy, which would need a second
   aggregation to fold into PSI;
3. PSI is a closing projection over the aggregated row (the reference
   probabilities ride along via ``first()``).

Binning matches ``psi_drift`` exactly: fixed-width over the reference
window's per-key min/max, out-of-range mass clamped to the edge bins,
the same eps smoothing — so a closed streaming window's PSI equals the
batch operator's on the same rows (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_histogram(
    df: DataFrame,
    value_col: str = "value",
    by: str = "series_id",
    time_col: str = "time",
    n_bins: int = 10,
) -> DataFrame:
    """Per-key reference histogram of a batch frame: (key, __lo, __hi,
    __p0..__p{n_bins-1}) — bin probabilities over fixed-width bins of
    the key's min/max, edge-clamped.  Key-count-sized; broadcast it to
    the stream."""
    ref = df.groupBy(by).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )
    b = df.join(F.broadcast(ref), by)
    ix = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col(value_col) - F.col("__lo"))
                / ((F.col("__hi") - F.col("__lo")) / n_bins + F.lit(1e-300))
            ).cast("int"),
        ),
    )
    counts = b.groupBy(by).agg(
        F.first("__lo").alias("__lo"),
        F.first("__hi").alias("__hi"),
        F.count("*").alias("__n"),
        *[
            F.sum((ix == i).cast("long")).alias(f"__c{i}")
            for i in range(n_bins)
        ],
    )
    return counts.select(
        by,
        "__lo",
        "__hi",
        *[
            (F.col(f"__c{i}") / F.col("__n")).alias(f"__p{i}")
            for i in range(n_bins)
        ],
    )


def streaming_psi(
    stream: DataFrame,
    ref_hist: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str = "value",
    by: str = "series_id",
    time_col: str = "time",
    n_bins: int = 10,
    eps: float = 1.0e-4,
) -> DataFrame:
    """(window_start, window_end, key, n, psi) append rows — one per
    closed tumbling window per key, scored against ``ref_hist``
    (:func:`reference_histogram` output).  PSI > 0.25 is the standard
    major-shift alarm; route the output to any sink."""
    joined = stream.withWatermark(time_col, watermark).join(
        F.broadcast(ref_hist), by
    )
    ix = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col(value_col) - F.col("__lo"))
                / ((F.col("__hi") - F.col("__lo")) / n_bins + F.lit(1e-300))
            ).cast("int"),
        ),
    )
    agg = joined.groupBy(F.window(time_col, window), F.col(by)).agg(
        F.count("*").alias("n"),
        *[F.sum((ix == i).cast("long")).alias(f"__q{i}") for i in range(n_bins)],
        *[F.first(f"__p{i}").alias(f"__p{i}") for i in range(n_bins)],
    )
    psi = None
    for i in range(n_bins):
        p = F.col(f"__p{i}") + F.lit(eps)
        q = F.col(f"__q{i}") / F.col("n") + F.lit(eps)
        term = (p - q) * F.log(p / q)
        psi = term if psi is None else psi + term
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.col(by),
        F.col("n").cast("bigint").alias("n"),
        F.round(psi + F.lit(1e-9), 6).alias("psi"),
    )
