"""Streaming quality bucketing — the deploy-time twin of the batch
CCNet terciles (``operators/sampling.quality_buckets``): arriving
documents are LM-scored against a STATIC token-NLL table and labeled
head/middle/tail by STATIC cut bins, both frozen from a reference
corpus — exactly the CCNet deployment shape (cutoffs computed once on
a sample, applied at ingest forever).

Streaming-legal by construction (append mode allows at most one
aggregation, and joins may not FOLLOW it):

1. the per-stratum cut bins (``quality_cut_bins`` — 2 longs per
   stratum) broadcast-join the document rows BEFORE tokenization and
   ride through the aggregation via ``first()``;
2. the token-NLL table broadcast-joins the exploded token rows
   (stream-static pre-aggregation join); out-of-vocabulary tokens take
   the add-alpha floor probability via a plan-time literal;
3. ONE windowed aggregation (watermarked event time) folds each
   document's token NLLs into its mean log-perplexity; the bucket
   label is a closing projection.

A closed window's (logppl, bucket) equals the batch pipeline's on the
same rows (asserted in tests; float summation order may differ in the
last ulps, so the equality contract is bucket-exact and
logppl-approximate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.operators.dedup import normalize
from kats_spark.operators.text import tokens


def token_nll_table(
    corpus: DataFrame, text_col: str = "text", alpha: float = 1.0
) -> DataFrame:
    """(tk, __nll) static add-alpha negative-log-likelihood table from
    a reference corpus — the same arithmetic as
    ``sampling.unigram_logppl`` (so scoring the corpus against its own
    table reproduces the batch scores exactly).  Vocabulary-sized;
    broadcast it to the stream."""
    tok = corpus.select(F.explode(tokens(normalize(F.col(text_col)))).alias("tk"))
    freq = tok.groupBy("tk").agg(F.count("*").alias("__c"))
    tot = freq.agg(
        F.sum("__c").alias("__total"), F.count("*").alias("__vocab")
    )
    nll = -F.log(
        (F.col("__c") + F.lit(float(alpha)))
        / (F.col("__total") + F.lit(float(alpha)) * F.col("__vocab"))
    )
    return freq.crossJoin(F.broadcast(tot)).select("tk", nll.alias("__nll"))


def oov_nll(corpus: DataFrame, text_col: str = "text", alpha: float = 1.0) -> float:
    """The add-alpha floor NLL an out-of-vocabulary token scores —
    ``-ln(alpha / (total + alpha * vocab))``.  One bounded 1-row
    aggregate at twin-construction time (batch side)."""
    import math

    tok = corpus.select(F.explode(tokens(normalize(F.col(text_col)))).alias("tk"))
    row = tok.agg(
        F.count("*").alias("total"), F.countDistinct("tk").alias("vocab")
    ).collect()[0]
    return -math.log(alpha / (row.total + alpha * row.vocab))


def streaming_quality_buckets(
    stream: DataFrame,
    nll_table: DataFrame,
    oov: float,
    cuts: DataFrame,
    by: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    time_col: str = "t",
    window: str = "1 hour",
    watermark: str = "2 hours",
    bins: int = 1000,
) -> DataFrame:
    """(window_start, window_end, id, stratum, n_tokens, logppl,
    score_bin, bucket) append rows — one per document per closed
    tumbling window, labeled against the frozen reference cuts.

    ``bins`` must equal the value the cuts were frozen with
    (``quality_cut_bins``'s ``bins``): the cut bins are quantized score
    values, so a different quantization here would compare incompatible
    lattices.

    A document whose stratum is ABSENT from the frozen cuts (a new
    language arriving after the reference corpus was cut) is NOT
    dropped: the join is left-outer and the document labels
    ``unknown`` — silently losing new-language traffic at ingest is
    exactly the failure mode a deploy-time labeler must surface.  The
    same contract covers ZERO-TOKEN documents (whitespace-only or empty
    text): the token fan-out is ``explode_outer``, so they reach the
    output with ``n_tokens=0``, null logppl/score_bin, and the sentinel
    bucket ``empty`` instead of vanishing at the explode."""
    docs = stream.withWatermark(time_col, watermark).join(
        F.broadcast(cuts), by, "left"
    )
    tok = docs.select(
        F.col(id_col),
        F.col(by),
        F.col(time_col),
        "__b1",
        "__b2",
        F.explode_outer(tokens(normalize(F.col(text_col)))).alias("tk"),
    )
    scored = tok.join(F.broadcast(nll_table), "tk", "left")
    nll = F.when(
        F.col("tk").isNotNull(), F.coalesce(F.col("__nll"), F.lit(float(oov)))
    )
    agg = scored.groupBy(
        F.window(time_col, window), F.col(id_col), F.col(by)
    ).agg(
        F.count("tk").cast("long").alias("n_tokens"),
        F.avg(nll).alias("logppl"),
        F.first("__b1").alias("__b1"),
        F.first("__b2").alias("__b2"),
    )
    sb = F.floor(F.col("logppl") * F.lit(float(bins))).cast("long")
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.col(id_col),
        F.col(by),
        "n_tokens",
        "logppl",
        sb.alias("score_bin"),
        F.when(F.col("n_tokens") == 0, F.lit("empty"))
        .when(F.col("__b1").isNull(), F.lit("unknown"))
        .when(sb <= F.col("__b1"), F.lit("head"))
        .when(sb <= F.col("__b2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
