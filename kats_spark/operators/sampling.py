"""Corpus sampling operators for training-data pipelines.

Not in the reference (Kats is numeric-only); first-class extensions for
the 100 TB corpus-building story: after mixture accounting
(``corpus_mixture``) decides per-(source, lang) token budgets, the
sampler actually DRAWS the subcorpus — deterministically, so a re-run
over the same snapshot reproduces the exact same training set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.operators.text import tokens


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    by: list[str] = ("source", "lang"),
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic stratified sample: within every ``by`` bucket, take
    documents in a seeded-hash shuffle order until the cumulative token
    count reaches ``budget_tokens`` (a document whose START precedes the
    budget line is kept whole — the standard greedy fill, so each bucket
    may overshoot by at most one document).

    Plan: one narrow projection (token counts + portable md5 rank key),
    one window pass keyed on the bucket (cumulative sum in rank order),
    one filter — a single shuffle on the bucket columns, no sort beyond
    the window's own, no driver participation.  At 100 TB the bucket key
    set is small (sources x languages) while rows are huge — exactly the
    high-volume/low-cardinality shape a window-cumsum handles; if one
    bucket dominated, the same greedy fill can run per (bucket, salt)
    shard with per-shard budget = budget/shards.

    The rank key is ``md5(seed || id)`` — portable across engines (the
    DuckDB oracle replays the identical ordering), unlike xxhash64.
    Output: input columns + n_tokens + cum_tokens (budget audit
    columns)."""
    by = list(by)
    rank_key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    base = df.withColumn("n_tokens", F.size(tokens(F.col(text_col)))).withColumn(
        "__rk", rank_key
    )
    w = Window.partitionBy(*by).orderBy("__rk", id_col)
    cum = F.sum("n_tokens").over(w)
    out = base.withColumn("cum_tokens", cum).filter(
        F.col("cum_tokens") - F.col("n_tokens") < budget_tokens
    )
    return out.drop("__rk")
