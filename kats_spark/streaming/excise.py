"""Streaming duplicated-span start detection — the stream-static stage
of incremental span excision (operators/dedup.py excise_vs_corpus).

A document STREAM's positioned full-window grams equi-join the standing
corpus's gram-key table (static side: ``dedup.corpus_gram_keys``,
materialized once per corpus like the stored MinHash band index); each
match emits one ``(doc_id, pos)`` duplicated-span START.  Coverage +
reassembly — the part that needs a document's own tokens — is the
per-document batch projection ``dedup.finish_excision``, applied by the
consumer downstream; this mirrors ``streaming_incremental_neardup``'s
contract (emit candidates in-stream, finalize downstream).

Streaming-safe by construction: the gram builder is a PURE PROJECTION —
no window functions (streams forbid them), no aggregations, no state.
The batch builder (``dedup.positioned_gram_rows``) gets each position's
gram from ``lead()`` over a per-doc window; here the token array stays
a bound ARRAY column and one HOF emits (pos, gram) structs — every HOF
input staged as a bound column first, dodging the per-element
re-evaluation trap the same way ``neardup.portable_band_keys`` does.
Row-for-row equivalence of the two builders, and streaming==batch
equivalence of the full excision, are asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_start_rows_projection(
    df: DataFrame,
    span_n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, pos, g)`` FULL-window gram rows as a pure projection —
    the exact rows ``dedup.positioned_gram_rows`` produces via its
    window/lead plan, computed without windows so the identical
    expression tree runs inside a streaming micro-batch."""
    from kats_spark.operators.dedup import normalize
    from kats_spark.operators.text import tokens

    staged = df.select(
        F.col(id_col), tokens(normalize(F.col(text_col))).alias("__t")
    )
    # number of full windows; sequence() needs a positive upper bound,
    # so short docs build one struct the pos-filter below drops
    staged = staged.select(
        F.col(id_col),
        "__t",
        F.greatest(F.size("__t") - (span_n - 1), F.lit(0)).alias("__nf"),
    )
    idx = F.sequence(F.lit(1), F.greatest(F.col("__nf"), F.lit(1)))
    structs = F.transform(
        idx,
        lambda i: F.struct(
            (i - 1).cast("int").alias("pos"),
            F.array_join(F.slice(F.col("__t"), i, span_n), " ").alias("g"),
        ),
    )
    rows = staged.select(
        F.col(id_col), F.col("__nf"), F.explode(structs).alias("__s")
    )
    return rows.filter(F.col("__s.pos") < F.col("__nf")).select(
        F.col(id_col),
        F.col("__s.pos").alias("pos"),
        F.col("__s.g").alias("g"),
    )


def streaming_excise_starts(
    stream: DataFrame,
    corpus_keys: DataFrame,
    span_n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Duplicated-span starts of a document stream vs the standing
    corpus: stream-static equi-join of the stream's positioned gram
    keys against ``corpus_keys`` (a ``dedup.corpus_gram_keys`` frame or
    the saved table materialized from it — pass ``portable`` matching
    how the keys were built).  Emits ``(id, pos)`` append-mode rows;
    finish with ``dedup.finish_excision`` downstream."""
    grams = gram_start_rows_projection(stream, span_n, text_col, id_col)
    key = F.col("g") if portable else F.xxhash64("g")
    keyed = grams.select(F.col(id_col), "pos", key.alias("gram_key"))
    return keyed.join(corpus_keys, "gram_key").select(id_col, "pos")


def streaming_excise_to_sink(
    stream: DataFrame,
    corpus_keys: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    span_n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
):
    """END-TO-END streaming excision consumer (VERDICT r07 item #9):
    arriving documents are cleaned against the standing corpus and the
    cleaned rows LAND in a parquet sink — the deployable shape of the
    excision trio (corpus-wide / incremental / streaming).

    Inside ``foreachBatch`` a micro-batch is a plain batch frame, so the
    window/lead gram builder and ``dedup.finish_excision`` (which needs
    per-document window reassembly — forbidden on the stream itself) run
    unchanged per micro-batch; only the stream-static gram-key join and
    the sink append involve streaming machinery.  Excision is strictly
    per-document (batch-internal duplication is out of scope by design,
    matching ``excise_vs_corpus``), so micro-batch boundaries are
    invisible: the union of per-micro-batch outputs equals the
    whole-batch excision — asserted oracle-identical in
    tests/test_streaming.py.

    Returns the started ``StreamingQuery`` (availableNow trigger: drain
    what exists, then stop — swap the trigger for continuous ingestion).
    """
    from kats_spark.operators.dedup import finish_excision, positioned_gram_rows

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bkey = F.col("g") if portable else F.xxhash64("g")
        # fan_out=False: a micro-batch is arriving-batch sized by
        # definition (see dedup.incremental_neardup_pairs)
        starts = positioned_gram_rows(
            batch_df, span_n, text_col, id_col, fan_out=False
        ).select(F.col(id_col), "pos", bkey.alias("gram_key"))
        dup = starts.join(corpus_keys, "gram_key").select(id_col, "pos")
        cleaned = finish_excision(
            batch_df, dup, span_n, text_col, id_col, fan_out=False
        )
        cleaned.write.mode("append").parquet(out_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
