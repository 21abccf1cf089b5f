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


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    shingle_n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Benchmark decontamination — the standard pretraining hygiene step
    (flag and drop training documents that share verbatim word
    ``shingle_n``-grams with any evaluation document).

    Returns (flagged, clean): ``flagged`` = (train id, n_gram_hits) for
    docs with >= ``min_hits`` distinct eval-overlapping grams; ``clean``
    = the surviving training rows.

    Scale shape: the EVAL side is tiny by construction (benchmarks), so
    its distinct gram set broadcasts; the train side streams through one
    shingle explode + broadcast semi-join + groupBy count — no shuffle of
    train text, no pairwise anything.  Uses STRING shingles (not hashed)
    so the check is exact and the oracle replays it."""
    from kats_spark.operators.dedup import shingle_string_rows

    train_g = shingle_string_rows(train_df, text_col, id_col, shingle_n)
    eval_g = (
        shingle_string_rows(eval_df, text_col, id_col, shingle_n)
        .select(F.col("g"))
        .distinct()
    )
    hits = (
        train_g.join(F.broadcast(eval_g), "g")
        .groupBy(id_col)
        .agg(F.countDistinct("g").alias("n_gram_hits"))
        .filter(F.col("n_gram_hits") >= min_hits)
    )
    flagged = hits
    clean = train_df.join(
        hits.select(id_col), id_col, "left_anti"
    )
    return flagged, clean


def repetition_stats(
    df: DataFrame,
    shingle_n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intra-document repetition features (the Gopher/MassiveText-style
    repetition filters, public methodology): per document
    - ``dup_line_ratio``: fraction of lines that are duplicates of an
      earlier identical line;
    - ``top_gram_share``: occurrences of the most frequent word
      ``shingle_n``-gram over total gram count;
    - ``dup_gram_ratio``: fraction of gram OCCURRENCES whose gram appears
      more than once.
    One explode + two grouped aggregations, all counting — exact oracle."""
    from kats_spark.operators.dedup import normalize

    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
    ).filter(F.trim("__line") != "")
    line_stats = (
        lines.groupBy(id_col, "__line")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(
            (
                1.0
                - F.count("*").cast("double") / F.sum("__c")
            ).alias("dup_line_ratio")
        )
    )
    t = tokens(normalize(F.col(text_col)))
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - (shingle_n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(t, i, shingle_n), " "))
    g = df.select(F.col(id_col), F.explode(grams).alias("__g"))
    gram_stats = (
        g.groupBy(id_col, "__g")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(
            (F.max("__c") / F.sum("__c")).alias("top_gram_share"),
            (
                F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
                / F.sum("__c")
            ).alias("dup_gram_ratio"),
        )
    )
    ids = df.select(id_col)
    return (
        ids.join(line_stats, id_col, "left")
        .join(gram_stats, id_col, "left")
        .fillna({"dup_line_ratio": 0.0})
    )


def unigram_logppl(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Unigram log-perplexity per document — the cheap corpus-level
    LM-quality signal (the CCNet-style filter uses a KenLM 5-gram; the
    unigram version is its exact-arithmetic, SQL-replayable core):

      p(t) = (count(t) + alpha) / (total + alpha * |V|)    (add-alpha)
      logppl(doc) = avg over tokens of -ln p(t)

    Rare/garbage-token documents score HIGH, fluent in-domain documents
    LOW.  Plan: one token explode feeding (a) the global frequency table
    (one groupBy) and (b) a token-keyed join back, then a per-doc avg —
    two shuffles total, both keyed on high-cardinality columns (token,
    doc), no broadcast of the (possibly huge) vocabulary required.
    Output (doc_id, n_tokens, logppl)."""
    from kats_spark.operators.dedup import normalize

    tok = df.select(
        F.col(id_col), F.explode(tokens(normalize(F.col(text_col)))).alias("__t")
    )
    freq = tok.groupBy("__t").agg(F.count("*").alias("__c"))
    totals = freq.agg(
        F.sum("__c").alias("__total"), F.count("*").alias("__vocab")
    )
    scored = (
        tok.join(freq, "__t")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.col("__c") + F.lit(float(alpha)))
                    / (F.col("__total") + F.lit(float(alpha)) * F.col("__vocab"))
                )
            ).alias("__nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"), F.avg("__nll").alias("logppl")
    )
