"""Streaming DSIR scoring — the deploy-time twin of the stored batch
scorer (``sources/ann_store.dsir_weights_stored``): arriving documents
are importance-weighted against the SAVED dense log-ratio table
(``save_dsir_ratio``) as they land, so ingestion can route or drop
documents by target-domain affinity without ever re-touching the
fitting corpora.

Streaming-legal by construction (the ``streaming/quality.py`` shape):
the dense ratio table is exactly ``num_buckets`` rows and broadcast-
joins the exploded feature rows BEFORE the single windowed aggregation
(stream-static pre-agg joins are allowed); every feature bucket exists
in the dense table, so the join is inner and lossless.  A closed
window's (n_feats, log_weight) equals ``dsir_weights_stored`` on the
same rows (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.operators.dsir import ngram_bucket_rows


def streaming_dsir_weights(
    stream: DataFrame,
    ratio_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    time_col: str = "t",
    window: str = "1 hour",
    watermark: str = "2 hours",
    num_buckets: int = 8192,
    bigrams: bool = True,
) -> DataFrame:
    """(window_start, window_end, id, n_feats, log_weight) append rows
    — one per document per closed tumbling window.  ``ratio_table`` is
    the DENSE (__b, __lr) frame read from ``save_dsir_ratio``'s path;
    ``num_buckets``/``bigrams`` must match what was saved.  The table
    is STATIC, so the same mismatch guard as the batch scorer runs at
    construction time (one count of a tiny frame, before the stream
    starts) — a silent wrong-bucket join never reaches the query."""
    n_stored = ratio_table.count()
    if n_stored != num_buckets:
        raise ValueError(
            f"ratio table has {n_stored} buckets but num_buckets="
            f"{num_buckets} was requested — features would hash into "
            "the wrong rows silently"
        )
    wm = stream.withWatermark(time_col, watermark)
    feats = ngram_bucket_rows(
        wm,
        text_col,
        id_col,
        num_buckets,
        bigrams,
        carry_cols=[time_col],
    )
    scored = feats.join(F.broadcast(ratio_table), "__b")
    return (
        scored.groupBy(F.window(time_col, window), F.col(id_col))
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("__lr").alias("log_weight"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(id_col),
            "n_feats",
            "log_weight",
        )
    )


def streaming_dsir_to_sink(
    stream: DataFrame,
    ratio_path: str,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 8192,
    bigrams: bool = True,
    min_log_weight: float | None = None,
):
    """END-TO-END streaming DSIR consumer (VERDICT r09 item #5 — the
    ``streaming_excise_to_sink`` shape): arriving documents are scored
    against the SAVED dense ratio table and LAND in a parquet sink with
    their payload columns plus (n_feats, log_weight) — the deployable
    end of the DSIR family (fit once / score at ingest / route by
    affinity).

    Inside ``foreachBatch`` a micro-batch is a plain batch frame, so
    ``ann_store.dsir_weights_stored`` runs UNCHANGED per micro-batch —
    the sink consumer cannot drift from the batch scorer because it IS
    the batch scorer.  Scoring is strictly per-document, so micro-batch
    boundaries are invisible: the union of per-micro-batch outputs
    equals the whole-batch scoring (asserted in tests).

    ``min_log_weight`` optionally keeps only documents at or above the
    threshold (the selection-at-ingest deployment); ``None`` scores and
    lands everything.  Returns the started ``StreamingQuery``
    (availableNow trigger: drain what exists, then stop — swap the
    trigger for continuous ingestion)."""
    from kats_spark.sources.ann_store import dsir_weights_stored

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        w = dsir_weights_stored(
            batch_df.sparkSession, ratio_path, batch_df,
            text_col, id_col, num_buckets, bigrams,
        )
        out = batch_df.join(w, id_col)
        if min_log_weight is not None:
            out = out.filter(F.col("log_weight") >= F.lit(float(min_log_weight)))
        out.write.mode("append").parquet(out_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
