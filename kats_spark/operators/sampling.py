"""Corpus sampling operators for training-data pipelines.

Not in the reference (Kats is numeric-only); first-class extensions for
the 100 TB corpus-building story: after mixture accounting
(``corpus_mixture``) decides per-(source, lang) token budgets, the
sampler actually DRAWS the subcorpus — deterministically, so a re-run
over the same snapshot reproduces the exact same training set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.operators.skew import input_is_big
from kats_spark.operators.text import tokens


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    by: list[str] = ("source", "lang"),
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    salt_shards: int | None = None,
    bucket_budgets: DataFrame | None = None,
) -> DataFrame:
    """Deterministic stratified sample: within every ``by`` bucket, take
    documents in a seeded-hash shuffle order until the cumulative token
    count reaches ``budget_tokens`` (a document whose START precedes the
    budget line is kept whole — the standard greedy fill, so each bucket
    may overshoot by at most one document).

    The rank key is ``md5(seed || id)`` — portable across engines (the
    DuckDB oracle replays the identical ordering), unlike xxhash64.

    SALTED-EXACT plan (the 100 TB shape; VERDICT r02 item #3): a naive
    ``sum().over(partitionBy(bucket).orderBy(rank))`` makes ONE task
    sort and scan each bucket — a scale-killer when a single (web, en)
    bucket is most of the corpus.  Instead the salt is the leading hex
    of the md5 rank key itself, so ordering by the key is ALREADY
    shard-major: the exact global cumulative sum decomposes as
    ``exclusive_prefix_sum(per-shard totals) + within-shard cumsum``.

      1. one narrow projection: n_tokens + __rk + __salt = hex prefix;
      2. per-(bucket, salt) totals — a tiny aggregate
         (|buckets| x salt_shards rows);
      3. exclusive prefix over salts within each bucket (window on the
         tiny frame), broadcast-joined back;
      4. the big window runs ``partitionBy(bucket, salt)`` — parallelism
         multiplied by salt_shards, identical output to the single-
         window plan (equivalence asserted in tests).

    Output: input columns + n_tokens + cum_tokens (budget audit
    columns).  ``salt_shards`` in {1, 16, 256}; 1 = the naive single
    window.  Default None = COUNT-GUARDED auto-gate (the prefilter
    pattern): corpora under 1M rows take the naive plan — at bench
    scale the salted plan's extra aggregate + reattach join cost more
    than the parallelism buys — and larger ones the 256-shard salted
    plan.  Both produce bit-identical output (asserted in tests), so
    the gate is purely a physical-plan choice.

    ``bucket_budgets`` (optional) overrides the constant budget with a
    PER-BUCKET budget frame (columns ``by`` + ``__budget``) — the hook
    the temperature-mixture sampler uses.  It is bucket-count-sized and
    broadcasts; the fill logic is otherwise identical."""
    by = list(by)
    if salt_shards is None:
        salt_shards = 1 if not input_is_big(df) else 256
    rank_key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    base = df.withColumn("n_tokens", F.size(tokens(F.col(text_col)))).withColumn(
        "__rk", rank_key
    )
    budget = (
        F.col("__budget") if bucket_budgets is not None else F.lit(budget_tokens)
    )
    if salt_shards <= 1:
        if bucket_budgets is not None:
            base = base.join(F.broadcast(bucket_budgets), by)
        w = Window.partitionBy(*by).orderBy("__rk", id_col)
        cum = F.sum("n_tokens").over(w)
        out = base.withColumn("cum_tokens", cum).filter(
            F.col("cum_tokens") - F.col("n_tokens") < budget
        )
        return out.drop("__rk", "__budget") if bucket_budgets is not None else out.drop("__rk")
    prefix_len = {16: 1, 256: 2}.get(salt_shards)
    if prefix_len is None:
        raise ValueError("salt_shards must be 1, 16 or 256 (hex-prefix widths)")
    from pyspark import StorageLevel

    # SLIM frame: keys + rank + token count, NO text payload.  Persisted
    # because both the shard-totals aggregate and the window pass consume
    # it — without this the tokenizer runs twice over the full corpus.
    # ~tens of bytes/row (vs KBs with text), MEMORY_AND_DISK so a 100 TB
    # corpus spills instead of evicting.
    slim = (
        base.select(
            *by,
            id_col,
            "n_tokens",
            "__rk",
            F.substring("__rk", 1, prefix_len).alias("__salt"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    shard_totals = slim.groupBy(*by, "__salt").agg(
        F.sum("n_tokens").alias("__shard_tok")
    )
    w_off = (
        Window.partitionBy(*by)
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = shard_totals.select(
        *by,
        "__salt",
        F.coalesce(F.sum("__shard_tok").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy(*by, "__salt").orderBy("__rk", id_col)
    picked = slim.join(F.broadcast(offsets), [*by, "__salt"])
    if bucket_budgets is not None:
        picked = picked.join(F.broadcast(bucket_budgets), by)
    picked = (
        picked.withColumn(
            "cum_tokens", F.col("__off") + F.sum("n_tokens").over(w_in)
        )
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .select(id_col, "n_tokens", "cum_tokens")
    )
    # Reattach the full rows (text etc.) for the selected ids only.
    # ``picked`` is budget-bounded (the greedy fill stops at
    # budget_tokens per stratum), so it broadcasts: the reattach is a
    # broadcast-hash join over one more scan of df — no shuffle of the
    # corpus.
    return df.join(F.broadcast(picked), id_col)


def temperature_mixture_sample(
    df: DataFrame,
    total_budget: int,
    alpha: float = 0.7,
    by: list[str] = ("lang",),
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    salt_shards: int | None = None,
) -> DataFrame:
    """Temperature-weighted mixture sampling — the multilingual/
    multi-source pretraining rebalance (the p_l ∝ n_l^alpha rule of
    multilingual LM training; alpha < 1 upsamples tail buckets relative
    to their natural share, alpha = 1 is proportional, alpha = 0 uniform).

    Per-bucket budgets come from the corpus's OWN token totals:
    budget_b = total_budget * n_b^alpha / sum_m n_m^alpha, rounded with
    the +1e-9 lattice epsilon so both engines floor identically; the
    greedy salted-exact fill of token_budget_sample then runs against
    the per-bucket budget line.  Everything is one token-count aggregate
    (bucket-count-sized, broadcasts) on top of the existing sampler —
    fully oracle-replayable, no driver math.

    Output: sampled rows + n_tokens + cum_tokens + __budget audit
    columns per row's bucket."""
    by = list(by)
    totals = (
        df.select(*by, F.size(tokens(F.col(text_col))).alias("__nt"))
        .groupBy(*by)
        .agg(F.sum("__nt").alias("__bucket_tok"))
    )
    wsum = totals.agg(
        F.sum(F.pow(F.col("__bucket_tok").cast("double"), F.lit(alpha))).alias("__z")
    )
    budgets = (
        totals.crossJoin(F.broadcast(wsum))
        .select(
            *by,
            F.floor(
                F.lit(float(total_budget))
                * F.pow(F.col("__bucket_tok").cast("double"), F.lit(alpha))
                / F.col("__z")
                + F.lit(1.0e-9)
            )
            .cast("bigint")
            .alias("__budget"),
        )
    )
    out = token_budget_sample(
        df,
        budget_tokens=0,  # unused: per-bucket budgets drive the fill
        by=by,
        text_col=text_col,
        id_col=id_col,
        seed=seed,
        salt_shards=salt_shards,
        bucket_budgets=budgets,
    )
    # reattach the audit budget column (token_budget_sample returns rows)
    return out.join(F.broadcast(budgets), by)


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
    # ROW-BASED gram builder (same plan shape as dedup.shingle_rows): a
    # lambda that slices a computed token array re-evaluates the tokenizer
    # PER GRAM (HOFs are excluded from common-subexpression elimination and
    # the array expression inlines into the lambda body) — the array
    # version was O(tokens²) per document and 7x this whole operator's
    # cost.  posexplode tokenizes once per token; the n-gram combine is
    # lead() over the (id, pos) window; concat_ws skips the null leads so
    # a document shorter than shingle_n keeps its single partial gram at
    # pos 0, exactly like the truncated array slice did.
    from pyspark.sql import Window

    t = tokens(normalize(F.col(text_col)))
    tok = df.select(F.col(id_col), F.posexplode(t).alias("__pos", "__tok"))
    w = Window.partitionBy(id_col).orderBy("__pos")
    parts = [F.col("__tok")] + [
        F.lead("__tok", j).over(w) for j in range(1, shingle_n)
    ]
    cnt = F.count("*").over(Window.partitionBy(id_col))
    g = (
        tok.withColumn("__g", F.concat_ws(" ", *parts))
        .withColumn("__n_tok", cnt)
        .filter(
            (F.col("__pos") <= F.col("__n_tok") - shingle_n)
            | (F.col("__pos") == 0)
        )
    )
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
        # zero-token docs have no gram rows; the array builder gave them
        # one empty gram -> share 1.0, dup 0.0 — reproduce that here
        .fillna(
            {"dup_line_ratio": 0.0, "top_gram_share": 1.0, "dup_gram_ratio": 0.0}
        )
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
    LOW.

    DE-SKEWED plan (VERDICT r02 item #4 — token frequency is Zipf, so a
    raw per-occurrence join lands ~5% of ALL occurrences on one key):

      1. pre-aggregate the exploded stream to (doc, token, count) —
         shrinks the join input ~5-10x and the join multiplicity from
         occurrences to document frequency;
      2. the global frequency table derives from that same aggregate
         (no second explode);
      3. the frequency join keys now carry document frequency, whose
         residual skew AQE's skew-join split handles (enabled in the
         session factory); ``head_k`` > 0 additionally broadcast-joins
         the top-``head_k`` vocabulary head so the shuffle join sees
         only near-uniform tail keys — the belt-and-suspenders setting
         for a 100 TB corpus (off by default: at bench scale the extra
         stages cost more than the skew they remove).

    Identical arithmetic on every path; the DuckDB oracle is unchanged.
    COUNT-GUARDED like token_budget_sample: under 1M documents the
    per-occurrence join runs directly (Zipf skew needs web-scale mass to
    hurt; at bench scale the pre-aggregation''s extra shuffle + persist
    cost more than they save), at or above it the de-skewed plan engages
    (1M-doc Zipf guard test exercises it).
    Output (doc_id, n_tokens, logppl)."""
    from pyspark import StorageLevel

    from kats_spark.operators.dedup import normalize

    head_k = 0 if df.sparkSession.conf.get(
        "spark.sql.adaptive.skewJoin.enabled", "true"
    ) == "true" else 4096
    tok = df.select(
        F.col(id_col), F.explode(tokens(normalize(F.col(text_col)))).alias("__t")
    )
    if not input_is_big(df):
        # NOTE (r13): persisting the exploded token stream here was
        # A/B'd and REGRESSES (~+0.2 s best-of at sf0.1): the in-memory
        # store pays per-string serialization that exceeds the 2 extra
        # codegen tokenize passes it saves (same finding as the
        # quality-classifier __words cache, r07).  The big path persists
        # the slim (doc, token, count) pre-aggregate instead.
        freq_s = tok.groupBy("__t").agg(F.count("*").alias("__c"))
        totals_s = freq_s.agg(
            F.sum("__c").alias("__total"), F.count("*").alias("__vocab")
        )
        nll_s = -F.log(
            (F.col("__c") + F.lit(float(alpha)))
            / (F.col("__total") + F.lit(float(alpha)) * F.col("__vocab"))
        )
        scored_s = (
            tok.join(freq_s, "__t")
            .crossJoin(F.broadcast(totals_s))
            .select(F.col(id_col), nll_s.alias("__nll"))
        )
        return scored_s.groupBy(id_col).agg(
            F.count("*").alias("n_tokens"), F.avg("__nll").alias("logppl")
        )
    # (doc, token, count): one shuffle keyed on (doc, token) — high
    # cardinality, no skew (a single doc repeating one token stays in
    # one row).  PERSISTED: the global frequency table and the join
    # consume it; unpersisted they would each re-run the explode + agg.
    doc_tok = (
        tok.groupBy(id_col, "__t")
        .agg(F.count("*").alias("__k"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    freq = doc_tok.groupBy("__t").agg(F.sum("__k").alias("__c"))
    totals = freq.agg(
        F.sum("__c").alias("__total"), F.count("*").alias("__vocab")
    )
    nll = -F.log(
        (F.col("__c") + F.lit(float(alpha)))
        / (F.col("__total") + F.lit(float(alpha)) * F.col("__vocab"))
    )
    if head_k > 0:
        head = freq.orderBy(F.desc("__c"), F.asc("__t")).limit(head_k)
        joined = doc_tok.join(F.broadcast(head), "__t").unionByName(
            doc_tok.join(
                F.broadcast(head.select("__t")), "__t", "left_anti"
            ).join(freq, "__t")
        )
    else:
        joined = doc_tok.join(freq, "__t")
    scored = joined.crossJoin(F.broadcast(totals)).select(
        id_col, F.col("__k"), (F.col("__k") * nll).alias("__nll_sum")
    )
    return scored.groupBy(id_col).agg(
        F.sum("__k").cast("long").alias("n_tokens"),
        (F.sum("__nll_sum") / F.sum("__k")).alias("logppl"),
    )


def bigram_logppl(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Bigram log-perplexity per document — one rung up from
    ``unigram_logppl`` toward the CCNet-style n-gram LM filter, still in
    exact SQL-replayable arithmetic:

      p(w2 | w1) = (c(w1 w2) + alpha) / (c1(w1) + alpha * |V|)
      logppl(doc) = avg over the doc's bigram occurrences of -ln p

    where c1 counts UNIGRAM occurrences in bigram-context position (all
    tokens except each doc's last) and |V| is the unigram vocabulary.

    Plan: one posexplode + lead-window pairs the tokens (the shingle_rows
    pattern — no per-element lambda re-evaluation), ONE (doc, w1, w2,
    count) pre-aggregation feeds the bigram table, the context table and
    the scoring join (the de-skew shape proven on unigram_logppl).

    The CONTEXT join (on ``__w1`` alone) carries the Zipf head — 'the'
    is the context of a large share of all distinct bigrams.  Same
    escape hatch AS CODE as unigram_logppl (VERDICT r03 item #9),
    count-guarded: corpora >= 1M docs persist the pre-aggregation and
    broadcast the top-``head_k`` context rows so the shuffle join sees
    only near-uniform tail keys (when AQE skew-join is on, head_k stays
    0 and AQE's runtime split handles it — belt and suspenders
    otherwise).  Identical arithmetic on every path; the DuckDB oracle
    is unchanged.  Output (doc_id, n_bigrams, logppl)."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from kats_spark.operators.dedup import normalize

    big = input_is_big(df)
    head_k = (
        0
        if df.sparkSession.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
        == "true"
        else 4096
    )
    t = tokens(normalize(F.col(text_col)))
    # NOTE (r13): persisting the exploded token stream on the small path
    # was A/B'd and REGRESSES (see unigram_logppl) — reverted.
    tok = df.select(F.col(id_col), F.posexplode(t).alias("__pos", "__w1"))
    w = Window.partitionBy(id_col).orderBy("__pos")
    pairs = tok.withColumn("__w2", F.lead("__w1", 1).over(w)).filter(
        F.col("__w2").isNotNull()
    )
    doc_bg = pairs.groupBy(id_col, "__w1", "__w2").agg(
        F.count("*").alias("__k")
    )
    if big:
        # three consumers (bigram table -> context table, scoring join);
        # without the persist each re-runs the explode + window + agg
        doc_bg = doc_bg.persist(StorageLevel.MEMORY_AND_DISK)
    bg = doc_bg.groupBy("__w1", "__w2").agg(F.sum("__k").alias("__c12"))
    ctx = bg.groupBy("__w1").agg(F.sum("__c12").alias("__c1"))
    vocab = tok.agg(F.countDistinct("__w1").alias("__v"))
    nll = -F.log(
        (F.col("__c12") + F.lit(float(alpha)))
        / (F.col("__c1") + F.lit(float(alpha)) * F.col("__v"))
    )
    with_bg = doc_bg.join(bg, ["__w1", "__w2"])
    if big and head_k > 0:
        head = ctx.orderBy(F.desc("__c1"), F.asc("__w1")).limit(head_k)
        with_ctx = with_bg.join(F.broadcast(head), "__w1").unionByName(
            with_bg.join(
                F.broadcast(head.select("__w1")), "__w1", "left_anti"
            ).join(ctx, "__w1")
        )
    else:
        with_ctx = with_bg.join(ctx, "__w1")
    scored = with_ctx.crossJoin(F.broadcast(vocab)).select(
        id_col, "__k", (F.col("__k") * nll).alias("__s")
    )
    return scored.groupBy(id_col).agg(
        F.sum("__k").cast("long").alias("n_bigrams"),
        (F.sum("__s") / F.sum("__k")).alias("logppl"),
    )


def salted_cumsum(
    base: DataFrame,
    value_col: str = "n_tokens",
    rk_col: str = "__rk",
    id_col: str = "doc_id",
    salt_shards: int = 256,
    out_col: str = "cum_tokens",
) -> DataFrame:
    """Exact GLOBAL running sum of ``value_col`` in ``(rk_col, id_col)``
    order without a single-task global window — the shared salted-exact
    decomposition behind :func:`token_budget_sample`,
    :func:`pack_sequences` and ``q_corpus_build``'s budget fill.

    ``rk_col`` must be an md5 hex-string order key already present on
    ``base``: the salt is its leading hex prefix, so ordering by the key
    is ALREADY shard-major and the exact global prefix sum decomposes as
    ``exclusive_prefix(per-shard totals) + within-shard cumsum``.  The
    per-shard totals frame is at most ``salt_shards`` rows (window on a
    tiny frame, broadcast-joined back); the big window runs
    ``partitionBy(__salt)`` — parallelism multiplied by ``salt_shards``,
    output bit-identical to ``sum().over(Window.orderBy(rk, id))``
    (asserted in tests).

    ``salt_shards`` in {1, 16, 256}; 1 = the naive single global window
    (small-input fast path — callers count-gate at ~1M rows).  The
    salted path persists the slim input at MEMORY_AND_DISK because both
    the totals aggregate and the window pass consume it; pass a
    pre-narrowed frame (keys + value + rank only, no text payload)."""
    if salt_shards <= 1:
        w = Window.orderBy(rk_col, id_col)
        return base.withColumn(out_col, F.sum(value_col).over(w))
    prefix_len = {16: 1, 256: 2}.get(salt_shards)
    if prefix_len is None:
        raise ValueError("salt_shards must be 1, 16 or 256")
    from pyspark import StorageLevel

    slim = base.withColumn(
        "__salt", F.substring(rk_col, 1, prefix_len)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    shard_totals = slim.groupBy("__salt").agg(
        F.sum(value_col).alias("__shard_tok")
    )
    w_off = Window.orderBy("__salt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = shard_totals.select(
        "__salt",
        F.coalesce(F.sum("__shard_tok").over(w_off), F.lit(0)).alias(
            "__off"
        ),
    )
    w_in = Window.partitionBy("__salt").orderBy(rk_col, id_col)
    return (
        slim.join(F.broadcast(offsets), "__salt")
        .withColumn(out_col, F.col("__off") + F.sum(value_col).over(w_in))
        .drop("__salt", "__off")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    salt_shards: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style pretraining
    step that turns a sampled document pool into fixed-length training
    sequences: documents are laid end-to-end in a seeded-md5 shuffle
    order and the token stream is cut every ``seq_len`` tokens, so a
    document may span a sequence boundary (the standard packing that
    wastes zero tokens to padding).

    Per-document output (all derivable from one exact global prefix
    sum): ``n_tokens``, ``cum_tokens``, ``seq_first``/``seq_last`` (the
    sequences the document lands in), ``offset_in_seq`` (token offset of
    the document's first token inside ``seq_first``), ``n_seqs_spanned``.

    Scale shape: the global cumulative sum reuses the salted-exact
    decomposition of :func:`token_budget_sample` — the salt is the
    leading hex of the md5 order key itself, so the exact global prefix
    sum is ``exclusive_prefix(per-shard totals) + within-shard cumsum``
    and the big window runs 256-way parallel instead of single-task.
    Count-guarded auto-gate as in the sampler; both plans bit-identical
    (asserted in tests).  Fully window-expressible -> exact oracle."""
    if salt_shards is None:
        salt_shards = 1 if not input_is_big(df) else 256
    rank_key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    base = df.select(
        id_col,
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
        rank_key.alias("__rk"),
    )
    cum = salted_cumsum(base, id_col=id_col, salt_shards=salt_shards)
    start = F.col("cum_tokens") - F.col("n_tokens")
    return cum.select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        F.floor(start / seq_len).cast("bigint").alias("seq_first"),
        F.floor((F.col("cum_tokens") - 1) / seq_len)
        .cast("bigint")
        .alias("seq_last"),
        (start % seq_len).cast("bigint").alias("offset_in_seq"),
        (
            F.floor((F.col("cum_tokens") - 1) / seq_len)
            - F.floor(start / seq_len)
            + 1
        )
        .cast("bigint")
        .alias("n_seqs_spanned"),
    )


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test split: each row lands in the split
    whose cumulative-weight interval contains ``u = md5-hash(seed||id)
    mapped to [0, 1)`` — portable across engines (the same md5 lattice
    as the samplers), independent of row order and partitioning, and
    stable under re-runs/appends (a doc's split never changes when other
    docs arrive, unlike fraction-of-count schemes).

    ``weights`` need not sum to 1 — they are normalized.  Output: input
    columns + ``split``.  Pure projection: no shuffle, no state; the
    100 TB shape is a map over the scan."""
    total = float(sum(weights.values()))
    # u from the first 12 hex chars (48 bits) of md5 — exact in a double
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(str(seed)), F.col(id_col).cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 48))
    )
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def epoch_upsample(
    df: DataFrame,
    epoch_col: str = "epochs",
    id_col: str = "doc_id",
) -> DataFrame:
    """Epoch-factor upsampling — the mixing step that repeats
    high-weight documents: a row with ``epochs = e`` is emitted
    ``floor(e)`` times plus one more iff its md5 residual ``u < frac(e)``
    — deterministic (re-runs reproduce the same corpus) with expected
    multiplicity exactly ``e`` under the hash's uniformity.  Output:
    input columns + ``epoch_ix`` (0-based copy index).  Pure explode
    over a computed sequence: no shuffle; output volume = the sum of
    epoch factors."""
    u = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit("ep"), F.col(id_col).cast("string"))), 1, 12), 16, 10).cast("double")
        / F.lit(float(1 << 48))
    )
    n_copies = (
        F.floor(F.col(epoch_col))
        + F.when(u < F.col(epoch_col) - F.floor(F.col(epoch_col)), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .select(
            "*",
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1)).alias("epoch_ix"),
        )
        .drop("__n")
    )


def decontaminate_hashed(
    train_df: DataFrame,
    eval_df: DataFrame,
    shingle_n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Hashed-gram decontamination — the scale path when the eval gram
    set outgrows an exact broadcast: `decontaminate` ships the full
    distinct gram STRINGS (an 8-gram averages ~50 bytes; a few hundred
    benchmark suites x paraphrase expansions reach GBs), while this
    variant broadcasts one xxhash64 LONG per gram — a ~6x smaller
    broadcast with the identical join shape (train text never shuffles,
    eval side broadcasts, one explode + semi-join + count per doc).

    Same contract as :func:`decontaminate` (returns (flagged, clean)).
    Error semantics are ONE-SIDED, like a Bloom filter with k=1 and a
    2^64 bit-space: no false negatives (every truly contaminated doc is
    flagged), false positives only on 64-bit hash collisions
    (n_train_grams x n_eval_grams / 2^64 expected — numerically zero at
    any real corpus size), so ``clean`` can only lose extra docs, never
    leak contamination.  Superset-of-exact is asserted in tests.
    Hash-dependent -> rows-only (no DuckDB oracle); the exact twin
    carries the value-hash check.

    (Spark's own runtime Bloom pushdown —
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` — already covers
    the shuffle-join formulation of this problem; ``bloom_filter_agg``
    is not SQL-exposed in this build, and for a broadcast-shaped eval
    side the hashed semi-join is strictly simpler with an effectively
    zero false-positive rate.)"""
    from kats_spark.operators.dedup import shingle_string_rows

    train_g = shingle_string_rows(train_df, text_col, id_col, shingle_n).select(
        id_col, F.xxhash64("g").alias("__hg")
    )
    eval_g = (
        shingle_string_rows(eval_df, text_col, id_col, shingle_n)
        .select(F.xxhash64("g").alias("__hg"))
        .distinct()
    )
    hits = (
        train_g.join(F.broadcast(eval_g), "__hg")
        .groupBy(id_col)
        .agg(F.countDistinct("__hg").alias("n_gram_hits"))
        .filter(F.col("n_gram_hits") >= min_hits)
    )
    clean = train_df.join(hits.select(id_col), id_col, "left_anti")
    return hits, clean


def per_source_cap(
    df: DataFrame,
    cap: int,
    by: list[str] = ("source",),
    id_col: str = "doc_id",
    seed: int = 0,
    salt_shards: int | None = None,
) -> DataFrame:
    """Per-bucket document quota — the C4/RefinedWeb-style cap on how
    many documents any one source/domain may contribute: within each
    ``by`` bucket keep the first ``cap`` documents in seeded-md5 shuffle
    order (deterministic, order/partition independent, append-stable
    for survivors until the bucket fills).

    SALTED two-phase scale path (the token_budget_sample shape): a
    dominant bucket would single-task the global ``row_number``, but
    the count-cap makes an exact refinement cheap — phase 1 takes the
    per-(bucket, salt-shard) top-``cap`` on a SLIM (keys, rank) frame
    (parallelism x salt_shards; the global top-cap of a bucket is
    contained in the union of its shards' top-caps), phase 2 re-ranks
    the union, now bounded at cap x salt_shards rows per bucket, and
    the survivors broadcast-join back onto the corpus scan — text
    never shuffles.  COUNT-GUARDED like the samplers: under 1M rows
    the single window is cheaper; both paths are bit-identical
    (asserted in tests).

    Output: surviving rows + ``bucket_rank``."""
    by = list(by)
    rk = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    if salt_shards is None:
        salt_shards = 1 if not input_is_big(df) else 256
    if salt_shards <= 1:
        w = Window.partitionBy(*by).orderBy(rk, id_col)
        return (
            df.withColumn("bucket_rank", F.row_number().over(w))
            .filter(F.col("bucket_rank") <= cap)
        )
    prefix_len = {16: 1, 256: 2}.get(salt_shards)
    if prefix_len is None:
        raise ValueError("salt_shards must be 1, 16 or 256 (hex-prefix widths)")
    slim = df.select(*by, id_col).withColumn("__rk", rk).withColumn(
        "__salt", F.substring("__rk", 1, prefix_len)
    )
    w1 = Window.partitionBy(*by, "__salt").orderBy("__rk", id_col)
    pre = slim.withColumn("__r1", F.row_number().over(w1)).filter(
        F.col("__r1") <= cap
    )
    w2 = Window.partitionBy(*by).orderBy("__rk", id_col)
    picked = (
        pre.withColumn("bucket_rank", F.row_number().over(w2))
        .filter(F.col("bucket_rank") <= cap)
        .select(id_col, "bucket_rank")
    )
    return df.join(F.broadcast(picked), id_col)


def quality_cut_bins(
    scored: DataFrame,
    score_col: str = "logppl",
    by: list[str] = ("lang",),
    bins: int = 1000,
) -> DataFrame:
    """The per-stratum tercile CUT BINS of :func:`quality_buckets` as
    their own tiny frame (``by`` + ``__b1`` + ``__b2``) — freeze them
    from a reference corpus and broadcast them to any later batch or
    stream (``streaming/quality.py``), the CCNet deployment shape:
    cutoffs computed once on a sample, applied everywhere."""
    by = list(by)
    binned = scored.withColumn(
        "score_bin", F.floor(F.col(score_col) * F.lit(float(bins))).cast("long")
    )
    hist = binned.groupBy(*by, "score_bin").agg(F.count("*").alias("__c"))
    w = (
        Window.partitionBy(*by)
        .orderBy("score_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        *by,
        "score_bin",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(Window.partitionBy(*by)).alias("__n"),
    )
    return cum.groupBy(*by).agg(
        F.min(
            F.when(F.col("__cum") * 3 >= F.col("__n"), F.col("score_bin"))
        ).alias("__b1"),
        F.min(
            F.when(F.col("__cum") * 3 >= F.col("__n") * 2, F.col("score_bin"))
        ).alias("__b2"),
    )


def quality_buckets(
    scored: DataFrame,
    score_col: str = "logppl",
    by: list[str] = ("lang",),
    bins: int = 1000,
) -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing (Wenzek et al.
    2020 §4.3): within every ``by`` stratum, the third of documents
    with the LOWEST LM perplexity is ``head``, the next third
    ``middle``, the rest ``tail`` — the standard coarse quality label
    downstream mixture design keys on.

    Exact HISTOGRAM terciles, not a sort: a per-stratum global
    ``ntile`` would single-task each stratum (the corpus_build
    scale-killer shape), so instead the score quantizes to
    ``floor(score * bins)`` integer bins, the per-(stratum, bin) counts
    aggregate map-side to a tiny frame, the tercile CUT BINS come from
    an integer-arithmetic cumulative scan over that frame
    (``3 * cum >= n`` / ``3 * cum >= 2n`` — no float division), and the
    assignment is a broadcast join + comparison, a pure projection over
    the corpus.  Documents sharing a bin share a bucket, so the split
    is exact up to bin granularity (1/bins of a score unit) and fully
    deterministic — the DuckDB oracle replays it bit-for-bit.

    Output: input columns + ``score_bin`` + ``bucket``."""
    by = list(by)
    # NOTE (r13): persisting ``scored`` here (it feeds both the binned
    # projection and the cut-bin aggregate) was A/B'd and is a small
    # REGRESSION at bench scale — the cache write of the scored frame
    # costs about what the second run of the caller's pipeline does.
    # At real corpus scale the caller should persist its own scored
    # frame (or hand this a cached one); the operator stays pristine.
    binned = scored.withColumn(
        "score_bin", F.floor(F.col(score_col) * F.lit(float(bins))).cast("long")
    )
    cuts = quality_cut_bins(scored, score_col, by, bins)
    out = binned.join(F.broadcast(cuts), by).withColumn(
        "bucket",
        F.when(F.col("score_bin") <= F.col("__b1"), F.lit("head"))
        .when(F.col("score_bin") <= F.col("__b2"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return out.drop("__b1", "__b2")


def unimax_budgets(
    df: DataFrame,
    budget_tokens: float,
    epochs_cap: float = 4.0,
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language-balanced token allocation (Chung et al. 2023,
    arXiv:2304.09151): spread ``budget_tokens`` as uniformly as
    possible across ``by`` strata, except no stratum may be repeated
    more than ``epochs_cap`` epochs — low-resource languages saturate
    at ``epochs_cap * n_tokens`` and the leftover redistributes
    uniformly among the rest (exact waterfilling).

    Closed form over the |strata|-row capacity frame (capacities
    c_(1) <= ... <= c_(n) sorted ascending, cum their prefix sums):
    stratum i SATURATES iff giving every remaining stratum at least
    c_(i) is affordable — c_(i) * (n-i+1) + cum_(i-1) <= B — and the
    shared water level for the unsaturated rest is
    (B - sum of saturated capacities) / (#unsaturated).  Pure window
    arithmetic on a tiny frame; the only corpus-sized work is ONE
    map-side token-count aggregate.  When B >= sum(c) every stratum
    saturates and the allocation leaves budget unfilled — UniMax's
    defining behavior (never exceed the epoch cap).

    Output: (by, n_tokens, capacity, budget) — feed
    ``budget.alias("__budget")`` into ``token_budget_sample``'s
    ``bucket_budgets`` hook to actually draw the subcorpus."""
    tok = df.groupBy(by).agg(
        F.sum(F.size(tokens(F.col(text_col)))).cast("double").alias("n_tokens")
    )
    cap = tok.withColumn("capacity", F.col("n_tokens") * F.lit(float(epochs_cap)))
    w_ord = Window.orderBy("capacity", by)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    B = F.lit(float(budget_tokens))
    staged = cap.select(
        by,
        "n_tokens",
        "capacity",
        F.coalesce(F.sum("capacity").over(w_prev), F.lit(0.0)).alias("__cum_prev"),
        F.row_number().over(w_ord).alias("__i"),
        F.count("*").over(w_all).alias("__n"),
    )
    sat = (
        F.col("capacity") * (F.col("__n") - F.col("__i") + 1) + F.col("__cum_prev")
        <= B
    )
    flagged = staged.withColumn("__sat", sat.cast("int"))
    agg = flagged.select(
        "*",
        F.sum("__sat").over(w_all).alias("__k"),
        F.sum(F.col("capacity") * F.col("__sat")).over(w_all).alias("__cum_k"),
    )
    level = F.when(
        F.col("__n") > F.col("__k"),
        (B - F.col("__cum_k")) / (F.col("__n") - F.col("__k")),
    ).otherwise(F.lit(float("inf")))
    return agg.select(
        by,
        "n_tokens",
        "capacity",
        F.when(F.col("__sat") == 1, F.col("capacity"))
        .otherwise(F.least(level, F.col("capacity")))
        .alias("budget"),
    )


def assign_shards(
    df: DataFrame,
    shard_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    salt_shards: int | None = None,
) -> DataFrame:
    """Deterministic training-shard assignment — the final "write the
    corpus" step: every document lands in the shard where its tokens
    START along the seeded-md5 global order, so each shard carries
    ~``shard_tokens`` tokens (overshoot at most one document, the greedy
    fill convention) and a re-run over the same snapshot reproduces the
    identical sharding byte-for-byte.

    The global running sum is :func:`salted_cumsum` — count-guarded
    like the samplers (naive single window under 1M docs, 256-shard
    salted-exact above), computed on a SLIM (id, rank, count) frame with
    the payload reattached by broadcast-joining ONLY the assignment
    columns back onto the corpus scan... the assignment frame is
    corpus-sized, so the reattach is a plain id-keyed join (one shuffle
    of slim columns; the text itself never sorts).

    Output: input columns + n_tokens + shard_id.  Feed
    ``.write.partitionBy("shard_id")`` to materialize the shards."""
    rk = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    if salt_shards is None:
        salt_shards = 1 if not input_is_big(df) else 256
    base = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("n_tokens")
    ).withColumn("__rk", rk)
    cum = salted_cumsum(
        base, "n_tokens", "__rk", id_col, salt_shards, "cum_tokens"
    )
    assign = cum.select(
        id_col,
        "n_tokens",
        F.floor(
            (F.col("cum_tokens") - F.col("n_tokens"))
            / F.lit(float(shard_tokens))
        )
        .cast("long")
        .alias("shard_id"),
    )
    return df.join(assign, id_col)
