"""Streaming bitext mining — the deploy-time consumer of the stored
target index (``sources/ann_store.save_bitext_target`` /
``bitext_mine_stored``): arriving SOURCE-language batches are margin-
mined against the saved target-side IVF lists as they land, and the
mined pairs LAND in a parquet sink — the CCMatrix daily-mining loop
(index the target corpus once, mine each day's crawl against it) as a
Structured Streaming job.

Batch-scoped semantics, stated precisely: inside ``foreachBatch`` a
micro-batch is a plain frame, so ``bitext_mine_stored`` runs UNCHANGED
per micro-batch — each batch's output is bit-identical to running the
batch operator on that batch's rows (asserted in tests).  Unlike the
per-document DSIR sink, the margin rule is NOT per-document: the
y-side hubness average (``_margin_tail``'s ``__ay``) is computed over
the arriving batch's candidates, so the union over micro-batches
equals the whole-batch run only when every target's top-k candidate
set is confined to one batch.  That is the INTENDED deployment
semantics — CCMatrix-style mining normalizes hubness within each
mining run (each day's crawl), not across all history — and the tests
pin both sides of the contract: per-batch bit-equality always, union ==
whole-batch exactly when batches are candidate-disjoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_bitext_to_sink(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    k: int = 4,
    threshold: float = 1.0,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_margin: float | None = None,
):
    """END-TO-END streaming bitext consumer (VERDICT r10 item #7 — the
    ``streaming_dsir_to_sink`` shape): each arriving source micro-batch
    is mined against the SAVED target index (probed-cell partition
    pruning and all — ``bitext_mine_stored`` runs unchanged) and the
    selected pairs land in a parquet sink as
    (x_id, y_id, cos_sim, margin, batch_id).

    ``min_margin`` optionally tightens the selection beyond the
    operator's own ``threshold`` (routing only the highest-confidence
    pairs onward); ``None`` lands every selected pair.  Returns the
    started ``StreamingQuery`` (availableNow trigger: drain what
    exists, then stop — swap the trigger for continuous ingestion)."""
    from kats_spark.sources.ann_store import bitext_mine_stored

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        pairs = bitext_mine_stored(
            batch_df.sparkSession,
            index_path,
            batch_df,
            k=k,
            threshold=threshold,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
        )
        if min_margin is not None:
            pairs = pairs.filter(F.col("margin") >= F.lit(float(min_margin)))
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
