"""Training-data-pipeline query registry: dedup, text analysis, similarity
search over the ``documents`` and ``embeddings`` tables.

Hash-based ops whose values depend on Spark's xxhash64 (minhash, simhash,
LSH buckets) are declared WITHOUT an oracle — the driver records a
rows-only check; the exact variants (exact dedup survivors, exact n-gram
Jaccard, brute-force cosine) have full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kats_spark import boundary
from kats_spark.operators import dedup, similarity, text
from kats_spark.operators.sampling import salted_cumsum
from kats_spark.plans import eig_oracle as _EIG_ORACLE
from kats_spark.plans.prepared import prepared


def _rnd(col, d=6):
    """Round with a +1e-9 epsilon shift, applied identically in the DuckDB
    oracles: keeps exact decimal half-boundary values (which the two
    engines round in opposite directions) off the rounding lattice."""
    if isinstance(col, str):
        col = F.col(col)
    return F.round(col + F.lit(1.0e-9), d)


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------

@prepared()
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.exact_dedup(docs)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang", "source")


_Q_EXACT_DEDUP_SQL = """
WITH keyed AS (
  SELECT *, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm FROM documents
)
SELECT min(doc_id)::BIGINT AS doc_id, any_value(lang) AS lang, any_value(source) AS source
FROM keyed GROUP BY norm
"""


@prepared()
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (threshold 0.5) via the
    prefix-filtered AllPairs plan (dedup.jaccard_allpairs) — identical
    result set to the naive shared-shingle join, near-linear candidates."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.jaccard_allpairs(docs, shingle_n=3, threshold=0.5)
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        _rnd("jaccard", 6).alias("jaccard"),
    )


_Q_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      i -> array_to_string(t[i:i+2], ' '))) AS s
  FROM toks
),
sized AS (SELECT doc_id, s, len(s) AS sz FROM sh),
ex AS (SELECT doc_id, sz, unnest(s) AS g FROM sized),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         count(*) AS inter, any_value(a.sz) AS sz_a, any_value(b.sz) AS sz_b
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b,
       round(1e-9 + inter / (sz_a + sz_b - inter), 6) AS jaccard
FROM inter
WHERE inter / (sz_a + sz_b - inter) >= 0.5
"""


@prepared()
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs — approximate (Spark xxhash64-based), so
    declared rows-only (no SQL oracle can reproduce the hash family)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(docs, num_hashes=64, bands=16).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints — rows-only (hash-family dependent)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "simhash"
    )


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

@prepared()
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text.word_stats(docs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        _rnd("avg_token_len", 6).alias("avg_token_len"),
        _rnd("distinct_token_ratio", 6).alias("distinct_token_ratio"),
    )


_Q_TOKEN_STATS_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
  len(t)::BIGINT AS n_tokens,
  round(1e-9 + list_sum(list_transform(t, x -> length(x)::DOUBLE)) / len(t), 6) AS avg_token_len,
  round(1e-9 + len(list_distinct(t)) / len(t)::DOUBLE, 6) AS distinct_token_ratio
FROM toks
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text.lang_id(text.quality_score(docs))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "quality_score",
        "lang_pred",
    )


_EN_STOP_SQL = "['the', 'a', 'and', 'of', 'to', 'in', 'is', 'it', 'that', 'for']"

_Q_TEXT_QUALITY_SQL = f"""
WITH toks0 AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
toks AS (
  SELECT *, list_transform(t, x -> lower(x)) AS lt FROM toks0
),
feats AS (
  SELECT doc_id,
    len(t) AS n,
    len(list_intersect(lt, {_EN_STOP_SQL})) / 10.0 AS stop_ratio,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / greatest(length(text), 1) AS alpha_ratio,
    len(list_distinct(t))::DOUBLE / greatest(len(t), 1) AS distinct_ratio,
    CASE WHEN len(t) BETWEEN 20 AND 100000 THEN 1.0
         ELSE least(len(t)::DOUBLE / 20.0, 1.0) END AS len_band,
    len(list_filter(lt, x -> list_contains(['der', 'die', 'und', 'das', 'ist', 'nicht', 'ein', 'mit', 'von', 'den'], x)))::DOUBLE / greatest(len(lt), 1) AS r_de,
    len(list_filter(lt, x -> list_contains(['the', 'a', 'and', 'of', 'to', 'in', 'is', 'it', 'that', 'for'], x)))::DOUBLE / greatest(len(lt), 1) AS r_en,
    len(list_filter(lt, x -> list_contains(['el', 'la', 'de', 'que', 'y', 'en', 'un', 'los', 'se', 'con'], x)))::DOUBLE / greatest(len(lt), 1) AS r_es,
    len(list_filter(lt, x -> list_contains(['le', 'la', 'les', 'de', 'et', 'des', 'un', 'une', 'dans', 'est'], x)))::DOUBLE / greatest(len(lt), 1) AS r_fr,
    len(list_filter(lt, x -> list_contains(['yang', 'dan', 'di', 'itu', 'dengan', 'untuk', 'tidak', 'ini', 'dari', 'pada'], x)))::DOUBLE / greatest(len(lt), 1) AS r_id,
    len(list_filter(lt, x -> list_contains(['il', 'di', 'che', 'la', 'per', 'con', 'una', 'del', 'non', 'sono'], x)))::DOUBLE / greatest(len(lt), 1) AS r_it,
    len(list_filter(lt, x -> list_contains(['de', 'het', 'een', 'van', 'en', 'dat', 'niet', 'met', 'voor', 'ik'], x)))::DOUBLE / greatest(len(lt), 1) AS r_nl,
    len(list_filter(lt, x -> list_contains(['de', 'que', 'e', 'o', 'da', 'em', 'um', 'para', 'com', 'os'], x)))::DOUBLE / greatest(len(lt), 1) AS r_pt,
    len(list_filter(lt, x -> list_contains(['и', 'в', 'не', 'на', 'что', 'с', 'как', 'это', 'по', 'то'], x)))::DOUBLE / greatest(len(lt), 1) AS r_ru,
    len(list_filter(lt, x -> list_contains(['bir', 've', 'bu', 'için', 'ne', 'gibi', 'ama', 'çok', 'daha', 'ben'], x)))::DOUBLE / greatest(len(lt), 1) AS r_tr
  FROM toks
),
withbest AS (
  SELECT *, list_max([{{'r': r_de, 'l': 'de'}}, {{'r': r_en, 'l': 'en'}}, {{'r': r_es, 'l': 'es'}}, {{'r': r_fr, 'l': 'fr'}}, {{'r': r_id, 'l': 'id'}}, {{'r': r_it, 'l': 'it'}}, {{'r': r_nl, 'l': 'nl'}}, {{'r': r_pt, 'l': 'pt'}}, {{'r': r_ru, 'l': 'ru'}}, {{'r': r_tr, 'l': 'tr'}}]) AS best FROM feats
)
SELECT doc_id::BIGINT AS doc_id,
  round(1e-9 + 0.25 * len_band + 0.25 * stop_ratio + 0.25 * alpha_ratio + 0.25 * distinct_ratio, 6) AS quality_score,
  CASE WHEN (best).r >= 0.05 THEN (best).l ELSE 'unknown' END AS lang_pred
FROM withbest
"""


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-corpus token budgeting: BPE-style pre-token counts (GPT-2
    pattern, lookahead-free so RE2 replays it) beside whitespace counts,
    plus chars-per-token — the compression-rate proxy used to budget
    training corpora."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.length("text").cast("bigint").alias("n_chars"),
        text.bpe_token_count(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
        text.token_count(F.col("text")).cast("bigint").alias("n_ws_tokens"),
    )
    return out.withColumn(
        "chars_per_token",
        _rnd(F.col("n_chars") / F.greatest(F.col("n_bpe_tokens"), F.lit(1)), 6),
    )


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher document-quality rule set (Rae et al. 2021
    A1.1; operators/text.py gopher_rules) — per-rule integer flags +
    overall pass, beside the blended text_quality heuristic.  All six
    rules are pure column expressions; exact oracle."""
    from kats_spark.operators.text import gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = gopher_rules(docs)
    cols = ["r_wordcount", "r_meanlen", "r_symbol", "r_bullet", "r_alpha",
            "r_stop", "gopher_pass"]
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_words"),
        *[F.col(c).cast("int").alias(c) for c in cols],
    ).orderBy("doc_id")


_Q_GOPHER_SQL = """
WITH toks AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
feat AS (
  SELECT doc_id,
    len(t) AS n,
    greatest(len(t), 1)::DOUBLE AS nf,
    list_sum(list_transform(t, w -> length(w)))::DOUBLE
      / greatest(len(t), 1) AS mean_len,
    len(string_split(text, '#')) - 1 AS n_hash,
    len(string_split(text, '...')) - 1 AS n_ell,
    string_split(text, chr(10)) AS lines,
    len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
      / greatest(len(t), 1) AS alpha_frac,
    len(list_filter(['the','be','to','of','and','that','have','with'],
        s -> list_contains(list_transform(t, w -> lower(w)), s))) AS n_stops
  FROM toks
),
flags AS (
  SELECT doc_id, n,
    (n >= 50 AND n <= 100000)::INT AS r_wordcount,
    (mean_len >= 3.0 AND mean_len <= 10.0)::INT AS r_meanlen,
    (n_hash / nf <= 0.1 AND n_ell / nf <= 0.1)::INT AS r_symbol,
    (len(list_filter(lines, l -> starts_with(trim(l), '-')
                                 OR starts_with(trim(l), '*')))::DOUBLE
       / greatest(len(lines), 1) <= 0.9
     AND len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE
       / greatest(len(lines), 1) <= 0.3)::INT AS r_bullet,
    (alpha_frac >= 0.8)::INT AS r_alpha,
    (n_stops >= 2)::INT AS r_stop
  FROM feat
)
SELECT doc_id::BIGINT AS doc_id, n::BIGINT AS n_words,
  r_wordcount, r_meanlen, r_symbol, r_bullet, r_alpha, r_stop,
  (r_wordcount * r_meanlen * r_symbol * r_bullet * r_alpha * r_stop)::INT
    AS gopher_pass
FROM flags ORDER BY doc_id
"""


def _bpe_train_sql(num_merges: int = 20) -> str:
    """q_bpe_train oracle (r12 promotion): the Sennrich training loop
    unrolled — every round is pure SQL over a (word, freq, position,
    symbol) rows table: adjacent-pair frequency count, the
    (count DESC, pair ASC) argmax (binary collation == python tuple
    order on these normalized tokens), and the LEFTMOST-NON-OVERLAPPING
    merge application via gaps-and-islands parity (consecutive matches
    only occur when left == right; greedy takes the odd ones within
    each run, exactly the driver loop's i += 2 skip).  Integer counts
    throughout — no float lattice at all."""
    rounds = []
    for k in range(num_merges):
        rounds.append(f"""
p{k} AS (
  SELECT l, r, sum(freq)::BIGINT AS c
  FROM (SELECT wid, freq, sym AS l,
               lead(sym) OVER (PARTITION BY wid ORDER BY i) AS r
        FROM r{k})
  WHERE r IS NOT NULL GROUP BY 1, 2
),
b{k} AS MATERIALIZED (SELECT l, r, c FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
m{k} AS (
  SELECT t.wid, t.freq, t.i, t.sym,
    coalesce(t.sym = b.l
             AND lead(t.sym) OVER (PARTITION BY t.wid ORDER BY t.i) = b.r,
             false) AS m
  FROM r{k} t CROSS JOIN b{k} b
),
g{k} AS (
  SELECT *, sum(CASE WHEN m THEN 0 ELSE 1 END)
              OVER (PARTITION BY wid ORDER BY i) AS isl
  FROM m{k}
),
tk{k} AS (
  SELECT *, m AND (row_number()
      OVER (PARTITION BY wid, isl, m ORDER BY i) % 2 = 1) AS take
  FROM g{k}
),
r{k + 1} AS MATERIALIZED (
  SELECT wid, freq,
    row_number() OVER (PARTITION BY wid ORDER BY i) AS i,
    CASE WHEN take THEN sym ||
      lead_sym ELSE sym END AS sym
  FROM (
    SELECT *, lead(sym) OVER (PARTITION BY wid ORDER BY i) AS lead_sym,
           lag(take) OVER (PARTITION BY wid ORDER BY i) AS prev_take
    FROM tk{k}
  )
  WHERE NOT coalesce(prev_take, false)
),""")
    union = "\nUNION ALL ".join(
        f"SELECT {k} AS rank, l AS \"left\", r AS \"right\", c AS pair_count FROM b{k}"
        for k in range(num_merges)
    )
    return rf"""
WITH wf AS (
  SELECT word, count(*)::BIGINT AS freq FROM (
    SELECT unnest(list_filter(
      regexp_split_to_array(trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+'),
      x -> x != '')) AS word
    FROM documents
  ) GROUP BY 1
),
r0 AS MATERIALIZED (
  SELECT word AS wid, freq, j.i AS i,
    CASE WHEN j.i = len(word) THEN substring(word, j.i, 1) || '</w>'
         ELSE substring(word, j.i, 1) END AS sym
  FROM wf, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) j
  WHERE len(word) > 0
),{"".join(rounds)[:-1]}
{union}
ORDER BY rank
"""


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (operators/bpe.py, Sennrich et al. 2016):
    learn the corpus's top-20 merges from the (word, freq) table — one
    corpus pass, then vocabulary-sized work (size-gated driver loop /
    distributed merge rounds, bit-identical by test).  FULL oracle since
    r12 (_bpe_train_sql): all 20 rounds unrolled in SQL — pair counts,
    the (count desc, pair asc) argmax, and the leftmost-non-overlapping
    merge application via gaps-and-islands parity.  Integer arithmetic
    end to end."""
    from kats_spark.operators.bpe import bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_train(docs, num_merges=20).orderBy("rank")


# fixed merge list for the ORACLED encode query: the corpus's own first
# 8 merges, frozen as literals so the identical replace chain replays in
# DuckDB (training itself is iterative and stays rows-only)
_BPE_MERGES = [
    ("e", "r</w>"), ("o", "w</w>"), ("o", "r"), ("l", "u"),
    ("i", "n"), ("a", "r"), ("p", "ar"), ("e", "r"),
]


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLICATION under a fixed merge list (operators/bpe.py
    bpe_encode_stats): per-document subword token counts — the
    budget-accounting view a trained tokenizer feeds.  The merge chain
    is literal `replace` steps over the space-joined symbol string
    (left-to-right non-overlapping = BPE merge order within a word),
    evaluated once per DISTINCT (doc, word); exact oracle."""
    from kats_spark.operators.bpe import bpe_encode_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bpe_encode_stats(docs, _BPE_MERGES)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_words",
        "n_bpe_tokens",
    ).orderBy("doc_id")


def _bpe_encode_sql(merges: list[tuple[str, str]]) -> str:
    # Wrapped-symbol representation (chr(31) delimiters) mirrors
    # operators/bpe.py bpe_encode_expr: plain replace is exactly greedy
    # left-to-right BPE because the pattern never consumes the flanking
    # separators (adjacent same-merge occurrences don't overlap).
    chain = (
        "array_to_string(list_transform(range(1, length(w)+1), "
        "i -> chr(31) || (CASE WHEN i = length(w) THEN substr(w, i, 1) || '</w>' "
        "ELSE substr(w, i, 1) END) || chr(31)), ' ')"
    )
    for l, r in merges:
        ql, qr = l.replace("'", "''"), r.replace("'", "''")
        pat = f"chr(31) || '{ql}' || chr(31) || ' ' || chr(31) || '{qr}' || chr(31)"
        rep = f"chr(31) || '{ql}{qr}' || chr(31)"
        chain = f"replace({chain}, {pat}, {rep})"
    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
per_word AS (SELECT doc_id, w, count(*) AS n FROM tok GROUP BY 1, 2),
enc AS (
  SELECT doc_id, n,
    len(string_split(trim({chain}), ' ')) AS toks
  FROM per_word
)
SELECT doc_id::BIGINT AS doc_id, sum(n)::BIGINT AS n_words,
  sum(n * toks)::BIGINT AS n_bpe_tokens
FROM enc GROUP BY doc_id ORDER BY doc_id
"""


def _bpe_token_stats_sql() -> str:
    pat = text.BPE_PATTERN.replace("'", "''")
    return f"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
    len(regexp_extract_all(text, '{pat}')) AS n_bpe_tokens,
    len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_ws_tokens
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars,
  n_bpe_tokens::BIGINT AS n_bpe_tokens, n_ws_tokens::BIGINT AS n_ws_tokens,
  round(1e-9 + n_chars / greatest(n_bpe_tokens, 1)::DOUBLE, 6) AS chars_per_token
FROM t
"""


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture table: per (source, lang) document counts,
    BPE-token totals, and the group's share of corpus tokens — the
    data-mixture accounting every pretraining run starts from.  One scan,
    one partial-aggregating groupBy, one scalar broadcast for the share."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(text.bpe_token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
    )
    total = per.agg(F.sum("n_tokens").alias("__tot"))
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        _rnd(F.col("n_tokens") / F.col("__tot"), 6).alias("token_share"),
    )


def _corpus_mixture_sql() -> str:
    pat = text.BPE_PATTERN.replace("'", "''")
    return f"""
WITH per AS (
  SELECT source, lang, count(*)::BIGINT AS n_docs,
    sum(len(regexp_extract_all(text, '{pat}')))::BIGINT AS n_tokens,
    sum(length(text))::BIGINT AS n_chars
  FROM documents GROUP BY 1, 2
)
SELECT source, lang, n_docs, n_tokens, n_chars,
  round(1e-9 + n_tokens / (SELECT sum(n_tokens) FROM per)::DOUBLE, 6) AS token_share
FROM per
"""


@prepared()
def q_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (k=20 char grams, window 32; guarantee
    length w+k-1=51 chars) — the rolling-hash overlap-detection layer
    above exact-hash fingerprints.  Long grams fit this vocabulary-dense
    corpus: k=5 collapsed to 59 global minima (measured), k=20 yields
    ~7.4k distinct fingerprints with max document frequency 5."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text.winnow_fingerprints(docs, k=20, w=32)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("fp_pos").cast("bigint").alias("fp_pos"),
        F.col("fp_hash").cast("bigint").alias("fp_hash"),
    )


def _winnow_fp_sql(k: int = 20, w: int = 32) -> str:
    C = 1 << 21
    poly = (
        "list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, {k} + 1), i -> ord(g[i])::BIGINT)), "
        "(h, c) -> (h * 31 + c) % 2147483647)"
    )
    return f"""
WITH nt AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents
),
gr AS (
  SELECT doc_id, unnest(range(1, greatest(length(t) - {k - 1}, 1) + 1)) AS pos, t FROM nt
),
hs AS (
  SELECT doc_id, pos::BIGINT AS pos, {poly} AS h
  FROM (SELECT doc_id, pos, substr(t, pos, {k}) AS g FROM gr)
),
m AS (
  SELECT doc_id, pos,
    min((h + 1) * {C} - pos) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS mk
  FROM hs
)
SELECT DISTINCT doc_id::BIGINT AS doc_id,
  ((mk // {C} + 1) * {C} - mk)::BIGINT AS fp_pos,
  (mk // {C})::BIGINT AS fp_hash
FROM m WHERE pos >= {w}
"""


@prepared()
def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap pairs via shared winnowing fingerprints: the case
    whole-document dedup misses (one doc quoting a chunk of another).
    Fingerprints appearing in more than 20 documents are dropped before
    the self-join (the document-frequency cap that keeps boilerplate
    phrases from going quadratic — same discipline as AllPairs prefix
    filtering); pairs sharing >= 5 rare fingerprints are reported."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # persist the fingerprint set: it feeds the document-frequency agg
    # AND (through ``rare``) BOTH sides of the overlap self-join — without
    # the boundary the whole winnowing pipeline (char-gram rolling hash +
    # window minima) executes once per consumer (r13 plan audit: three
    # full winnow subtrees).  (doc_id, fp_hash) longs only.
    fp = boundary.register(
        text.winnow_fingerprints(docs, k=20, w=32)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "fp_hash")
        .distinct()
        .persist()
    )
    freq = fp.groupBy("fp_hash").agg(F.count("*").alias("__df"))
    rare = fp.join(freq.filter(F.col("__df") <= 20), "fp_hash").select(
        "doc_id", "fp_hash"
    )
    a = rare.select(F.col("doc_id").alias("id_a"), "fp_hash")
    b = rare.select(F.col("doc_id").alias("id_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )


def _winnow_overlap_sql() -> str:
    return f"""
WITH fp0 AS ({_winnow_fp_sql()}),
fp AS (SELECT DISTINCT doc_id, fp_hash FROM fp0),
freq AS (SELECT fp_hash FROM fp GROUP BY fp_hash HAVING count(*) <= 20),
rare AS (SELECT f.doc_id, f.fp_hash FROM fp f JOIN freq USING (fp_hash))
SELECT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b,
       count(*)::BIGINT AS n_shared
FROM rare a JOIN rare b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 5
"""


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 vs the vec_id=0 embedding (exact ANN
    baseline).  Joins the single query row via crossJoin-broadcast — the
    scan side never shuffles."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__q"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            _rnd(similarity.cosine(F.col("embedding"), F.col("__q")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(20)


_Q_TOPK_COSINE_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id::BIGINT AS vec_id,
    round(1e-9 + 
      list_sum(list_transform(range(1, len(e.embedding) + 1),
        i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
         * sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cos_sim
  FROM embeddings e, q WHERE e.vec_id <> 0
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT 20
"""


def q_allpairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine top-3 neighbors per vector via the broadcast
    numpy index (ranked on the rounded score so ordering is fp-stable
    across engines).  The index build (count + collect + broadcast of the
    immutable embeddings parquet) is memoized per (gateway, sf_dir) —
    the prepared-statement pattern applied to the one driver-side cost
    this query has (VERDICT r07 item #4)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.all_pairs_topk(emb, k=3, memo_key=f"allpairs:{sf_dir}")


_Q_ALLPAIRS_SQL = """
WITH scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    round(1e-9 + 
      list_sum(list_transform(range(1, len(a.embedding) + 1),
        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
         * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY cos_sim DESC, id_b ASC) AS rk
  FROM scored
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, cos_sim, rk::INT AS rk
FROM ranked WHERE rk <= 3
"""


@prepared()
def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (similarity.bitext_margin_pairs,
    Artetxe & Schwenk 2019 ratio margin / CCMatrix): best target match
    per source vector, hubness-corrected by both sides' kNN averages —
    label 0 plays the source language, label 1 the target.  Exact
    oracle (selection ranks on the rounded margin)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.bitext_margin_pairs(
        emb.filter(F.col("label") == 0),
        emb.filter(F.col("label") == 1),
        k=4,
        threshold=1.0,
    )
    return out.select(
        F.col("x_id").cast("bigint").alias("x_id"),
        F.col("y_id").cast("bigint").alias("y_id"),
        _rnd("cos_sim", 6).alias("cos_sim"),
        _rnd("margin", 6).alias("margin"),
    ).orderBy("x_id")


_Q_BITEXT_SQL = """
WITH xs AS (SELECT vec_id AS x_id, embedding AS xv FROM embeddings WHERE label = 0),
ys AS (SELECT vec_id AS y_id, embedding AS yv FROM embeddings WHERE label = 1),
scored AS (
  SELECT x_id, y_id,
    list_sum(list_transform(range(1, len(xv) + 1),
      i -> xv[i]::DOUBLE * yv[i]::DOUBLE))
    / (sqrt(list_sum(list_transform(xv, v -> v::DOUBLE * v::DOUBLE)))
       * sqrt(list_sum(list_transform(yv, v -> v::DOUBLE * v::DOUBLE)))) AS c
  FROM xs, ys
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY x_id ORDER BY c DESC, y_id ASC) AS rx,
    row_number() OVER (PARTITION BY y_id ORDER BY c DESC, x_id ASC) AS ry
  FROM scored
),
ax AS (SELECT x_id, avg(c) AS ax FROM ranked WHERE rx <= 4 GROUP BY 1),
ay AS (SELECT y_id, avg(c) AS ay FROM ranked WHERE ry <= 4 GROUP BY 1),
m AS (
  SELECT s.x_id, s.y_id, s.c, s.c / ((ax.ax + ay.ay) / 2) AS margin,
    round(s.c / ((ax.ax + ay.ay) / 2) + 1e-9, 6) AS mr
  FROM scored s JOIN ax USING (x_id) JOIN ay USING (y_id)
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY mr DESC, y_id ASC) AS rk
  FROM m
)
SELECT x_id::BIGINT AS x_id, y_id::BIGINT AS y_id,
  round(1e-9 + c, 6) AS cos_sim, round(1e-9 + margin, 6) AS margin
FROM best WHERE rk = 1 AND mr > 1.0 ORDER BY x_id
"""


@prepared()
def q_bitext_mine_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-composed bitext mining (similarity.bitext_margin_pairs_ann —
    the CCMatrix scale path): portable-IVF candidate pairs from probing
    the 3 nearest of 8 target-side cells, kNN hubness averages over
    candidates only, and the exact operator's identical margin tail.
    The whole pipeline — subset-seeded IVF build, probe ranking,
    candidate equi-join, margin selection — replays exactly in DuckDB.
    At n_probe == n_cells the output equals ``bitext_mine`` (tested)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    out = similarity.bitext_margin_pairs_ann(
        emb.filter(F.col("label") == 0),
        emb.filter(F.col("label") == 1),
        k=4,
        threshold=1.0,
        n_cells=8,
        n_probe=3,
    )
    return out.select(
        F.col("x_id").cast("bigint").alias("x_id"),
        F.col("y_id").cast("bigint").alias("y_id"),
        _rnd("cos_sim", 6).alias("cos_sim"),
        _rnd("margin", 6).alias("margin"),
    ).orderBy("x_id")


_Q_BITEXT_ANN_SQL = """
WITH xs AS (
  SELECT vec_id AS x_id, list_transform(embedding, v -> v::DOUBLE) AS xv
  FROM embeddings WHERE label = 0
),
ys AS (
  SELECT vec_id AS y_id, list_transform(embedding, v -> v::DOUBLE) AS yv
  FROM embeddings WHERE label = 1
),
seeds AS (
  SELECT (row_number() OVER (ORDER BY y_id) - 1)::INT AS cell_id, yv AS center
  FROM (SELECT y_id, yv FROM ys ORDER BY y_id LIMIT 8)
),
a1 AS (
  SELECT y_id, yv, cell_id,
    round(1e-9 + list_sum(list_transform(range(1, 65),
      i -> (yv[i] - center[i]) * (yv[i] - center[i]))), 6) AS d
  FROM ys CROSS JOIN seeds
),
asg1 AS (
  SELECT y_id, yv, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY y_id ORDER BY d, cell_id) AS rn FROM a1
  ) WHERE rn = 1
),
cent AS (
  SELECT cell_id, i AS pos, round(1e-9 + avg(yv[i]), 6) AS cv
  FROM asg1 CROSS JOIN (SELECT i FROM range(1, 65) t(i)) GROUP BY cell_id, i
),
centers AS (SELECT cell_id, list(cv ORDER BY pos) AS center FROM cent GROUP BY cell_id),
a2 AS (
  SELECT y_id, yv, cell_id,
    round(1e-9 + list_sum(list_transform(range(1, 65),
      i -> (yv[i] - center[i]) * (yv[i] - center[i]))), 6) AS d
  FROM ys CROSS JOIN centers
),
indexed AS (
  SELECT y_id, yv, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY y_id ORDER BY d, cell_id) AS rn FROM a2
  ) WHERE rn = 1
),
xc AS (
  SELECT x_id, xv, cell_id,
    round(1e-9 + list_sum(list_transform(range(1, 65),
      i -> (xv[i] - center[i]) * (xv[i] - center[i]))), 6) AS d
  FROM xs CROSS JOIN centers
),
probes AS (
  SELECT x_id, xv, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY d, cell_id) AS cr FROM xc
  ) WHERE cr <= 3
),
scored AS (
  SELECT x_id, y_id,
    list_sum(list_transform(range(1, 65), i -> xv[i] * yv[i]))
    / (sqrt(list_sum(list_transform(xv, v -> v * v)))
       * sqrt(list_sum(list_transform(yv, v -> v * v)))) AS c
  FROM probes JOIN indexed USING (cell_id)
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY x_id ORDER BY c DESC, y_id ASC) AS rx,
    row_number() OVER (PARTITION BY y_id ORDER BY c DESC, x_id ASC) AS ry
  FROM scored
),
ax AS (SELECT x_id, avg(c) AS ax FROM ranked WHERE rx <= 4 GROUP BY 1),
ay AS (SELECT y_id, avg(c) AS ay FROM ranked WHERE ry <= 4 GROUP BY 1),
m AS (
  SELECT s.x_id, s.y_id, s.c, s.c / ((ax.ax + ay.ay) / 2) AS margin,
    round(s.c / ((ax.ax + ay.ay) / 2) + 1e-9, 6) AS mr
  FROM scored s JOIN ax USING (x_id) JOIN ay USING (y_id)
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY mr DESC, y_id ASC) AS rk
  FROM m
)
SELECT x_id::BIGINT AS x_id, y_id::BIGINT AS y_id,
  round(1e-9 + c, 6) AS cos_sim, round(1e-9 + margin, 6) AS margin
FROM best WHERE rk = 1 AND mr > 1.0 ORDER BY x_id
"""


def q_bitext_mine_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN bitext mining against the SAVED target index
    (ann_store.save_bitext_target / bitext_mine_stored): the
    target-language side is IVF-indexed once per snapshot as a
    centroids + cell-partitioned-lists lake layout, and every source
    batch mines against it via partition-pruned list scans — the
    amortized daily-mining shape.  Output (and oracle) identical to
    ``bitext_mine_ann``: the stored search replays the same rounded
    probe / margin lattice.  Reuse gate keys on the source parquet's
    content fingerprint."""
    import os

    from kats_spark.sources.ann_store import (
        bitext_mine_stored,
        mark_stored,
        save_bitext_target,
        source_fingerprint,
        stored_is_current,
    )

    sf_name = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "spark-warehouse",
        f"bitext_target_{sf_name}",
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    fp = source_fingerprint(f"{sf_dir}/embeddings.parquet")
    if not stored_is_current(path, fp):
        save_bitext_target(emb.filter(F.col("label") == 1), path, n_cells=8)
        mark_stored(path, fp)
    out = bitext_mine_stored(
        spark, path, emb.filter(F.col("label") == 0),
        k=4, threshold=1.0, n_probe=3,
    )
    return out.select(
        F.col("x_id").cast("bigint").alias("x_id"),
        F.col("y_id").cast("bigint").alias("y_id"),
        _rnd("cos_sim", 6).alias("cos_sim"),
        _rnd("margin", 6).alias("margin"),
    ).orderBy("x_id")


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment (sampling.assign_shards):
    documents land in the shard where their tokens start along the
    seeded-md5 global order (~2000 tokens per shard), computed by the
    salted-exact cumsum.  Exact oracle."""
    from kats_spark.operators.sampling import assign_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = assign_shards(docs, shard_tokens=2000, seed=5)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("shard_id").cast("bigint").alias("shard_id"),
    ).orderBy("doc_id")


_Q_SHARD_ASSIGN_SQL = """
WITH toks AS (
  SELECT doc_id,
    len(list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                    x -> x <> '')) AS n_tokens,
    md5(concat_ws(':', '5', doc_id::VARCHAR)) AS rk
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY rk, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM toks
)
SELECT doc_id::BIGINT AS doc_id, n_tokens::BIGINT AS n_tokens,
  floor((cum_tokens - n_tokens) / 2000.0)::BIGINT AS shard_id
FROM cum ORDER BY doc_id
"""


def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (similarity.
    quantize_int8_rows): per-vector scale = max|x|/127, explicit
    floor(x+0.5) rounding so both engines agree on half-integers;
    long-format output for exact value-hash.  Pure projection —
    exact oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.quantize_int8_rows(emb.filter(F.col("vec_id") < 100))
    return out.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "pos",
        "q",
        _rnd("scale", 6).alias("scale"),
    ).orderBy("vec_id", "pos")


_Q_QUANTIZE_SQL = """
WITH base AS (
  SELECT vec_id, embedding,
    greatest(list_max(list_transform(embedding, v -> abs(v::DOUBLE))) / 127.0,
             1e-30) AS scale
  FROM embeddings WHERE vec_id < 100
),
ex AS (
  -- parallel unnests zip in DuckDB: position and element stay aligned
  SELECT vec_id, scale,
    unnest(range(0, len(embedding))) AS pos,
    unnest(embedding)::DOUBLE AS x
  FROM base
)
SELECT vec_id::BIGINT AS vec_id, pos::BIGINT AS pos,
  greatest(-127, least(127, floor(x / scale + 0.5)))::BIGINT AS q,
  round(1e-9 + scale, 6) AS scale
FROM ex ORDER BY vec_id, pos
"""


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH candidate pairs.  The planes are seed-deterministic
    driver-side literals baked into the plan, so the EXACT same constants
    are inlined into the oracle SQL — full value-hash check, no PRNG
    parity required (see ``_lsh_bucket_sql``)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.lsh_bucket_pairs(emb, num_planes=8, dim=64).select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
    )


def _lsh_bucket_sql(num_planes: int = 8, dim: int = 64, seed: int = 7) -> str:
    """Oracle for q_lsh_buckets: the same gaussian plane constants
    (repr = shortest round-trip, parsed back to the identical double),
    with each dot product written as the same left-associated sum the
    Spark ``aggregate`` fold evaluates — bit-exact sign decisions."""
    planes = similarity.lsh_planes(num_planes, dim, seed)
    bucket_terms = []
    for i, p in enumerate(planes):
        dot = " + ".join(f"e.embedding[{j + 1}]::DOUBLE * {x!r}" for j, x in enumerate(p))
        bucket_terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << i} ELSE 0 END)")
    bucket = " + ".join(bucket_terms)
    return f"""
WITH b AS (
  SELECT e.vec_id, ({bucket})::INT AS bucket FROM embeddings e
)
SELECT l.bucket, l.vec_id::BIGINT AS id_a, r.vec_id::BIGINT AS id_b
FROM b l JOIN b r USING (bucket)
WHERE l.vec_id < r.vec_id
"""


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded hyperplane-LSH candidates
    (4 bands x 4 planes) verified with the exact rounded cosine >= 0.4.
    Plane constants are inlined into the oracle, so the whole approximate
    pipeline — candidate generation AND verification — hash-matches."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.embedding_neardup_pairs(
        emb, threshold=0.4, memo_key=f"neardup:{sf_dir}"
    )
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "cos_sim",
    )


def q_embed_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy keep-smallest-id dedup over the near-dup pairs (id_a < id_b
    always, so dropped = appears-as-id_b): one left-anti join."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = similarity.embedding_neardup_pairs(
        emb, threshold=0.4, memo_key=f"neardup:{sf_dir}"
    )
    return similarity.neardup_survivors(emb, pairs).select(
        F.col("vec_id").cast("bigint").alias("vec_id")
    )


def _banded_lsh_cte(bands: int = 4, planes_per_band: int = 4, seed: int = 7, dim: int = 64) -> str:
    """Shared SQL: keyed (vec_id, band, bucket) rows + verified near-dup
    pairs, with the exact Spark plane literals and the same left-assoc dot
    products."""
    planes = similarity.lsh_planes(bands * planes_per_band, dim, seed)
    band_exprs = []
    for b in range(bands):
        bits = []
        for i in range(planes_per_band):
            pl = planes[b * planes_per_band + i]
            d = " + ".join(f"e.embedding[{j + 1}]::DOUBLE * {x!r}" for j, x in enumerate(pl))
            bits.append(f"(CASE WHEN ({d}) > 0 THEN {1 << i} ELSE 0 END)")
        band_exprs.append(f"SELECT e.vec_id, {b} AS band, ({' + '.join(bits)})::INT AS bucket FROM embeddings e")
    keyed = "\nUNION ALL\n".join(band_exprs)
    return f"""
keyed AS (
{keyed}
),
cand AS (
  -- NOT deduped (mirrors the Spark plan): cross-band repeats survive to
  -- the verify stage and the final DISTINCT collapses them
  SELECT l.vec_id AS id_a, r.vec_id AS id_b
  FROM keyed l JOIN keyed r USING (band, bucket)
  WHERE l.vec_id < r.vec_id
),
verified AS (
  SELECT c.id_a, c.id_b,
    round(1e-9 +
      list_sum(list_transform(range(1, {dim} + 1), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
         * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cos_sim
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.id_a
  JOIN embeddings b ON b.vec_id = c.id_b
)"""


def _embed_neardup_sql() -> str:
    return f"""
WITH {_banded_lsh_cte()}
SELECT DISTINCT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, cos_sim
FROM verified WHERE cos_sim >= 0.4
"""


def _embed_survivors_sql() -> str:
    return f"""
WITH {_banded_lsh_cte()}
SELECT e.vec_id::BIGINT AS vec_id FROM embeddings e
WHERE e.vec_id NOT IN (SELECT id_b FROM verified WHERE cos_sim >= 0.4)
"""


# --------------------------------------------------------------------------
# end-to-end corpus preparation (the canonical 100TB training-data flow,
# composed as ONE lazy plan: quality/lang filter -> exact dedup -> exact
# near-dup removal -> surviving docs with token counts)
# --------------------------------------------------------------------------

_PERSISTED: list = []
_STAGE_MEMO: dict = {}


def release_corpus_cache() -> None:
    """Unpersist frames cached by ``_corpus_stages``.  Called
    automatically when stages are REBUILT for a different (gateway,
    sf_dir) key (so the session holds at most one cached stage set);
    callers that want a fully clean session can invoke it directly after
    collecting their result."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:  # session already gone — nothing to release
            pass


def _corpus_stages(spark: SparkSession, sf_dir: str):
    """Shared corpus-prep stage frames: (docs, kept, exact, final).

    The constructed frames are MEMOIZED per (py4j gateway, sf_dir): the
    stage plan is ~1 s of driver-side py4j Column construction plus two
    persist-forced Catalyst analyses, a fixed cost that real pipelines
    pay once (the prepared-statement pattern) but that repeated query
    calls in one session were paying per call — the source of
    corpus_prep's round-over-round bench creep on unchanged plans.
    DataFrame plans are immutable, so reuse is safe; the persist
    boundaries are re-registered on every hit because an external
    ``spark.catalog.clearCache()`` (the bench harness does this between
    reps) silently drops them, and without the boundary the AllPairs
    self-join re-executes the whole scoring scan per side."""
    sc = spark.sparkContext
    key = ((sc.applicationId, sc.startTime), sf_dir)
    hit = _STAGE_MEMO.get(key)
    if hit is not None:
        frames, out = hit
        for f in frames:  # no-op if still registered; re-registers after
            f.persist()   # an external clearCache
        return out
    # new key: drop stale memo entries + release their cached frames so
    # at most one stage set stays materialized per process
    _STAGE_MEMO.clear()
    release_corpus_cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # persist the scored projection BEFORE filtering: predicate pushdown
    # substitutes computed columns into the filter, duplicating the
    # tokenize/score expressions ~10x per row (measured: 47 copies of the
    # tokenizer in the optimized plan, 2.6x on the whole pipeline).  The
    # cache is a materialization boundary — scores evaluate once, the
    # filter reads columns.  (At 100 TB the same boundary is an
    # intermediate parquet write.)
    scored = (
        text.score_and_lang(docs, keep_token_count=True)
        .select("doc_id", "text", "quality_score", "lang_pred", "n_tokens")
        .persist()
    )
    _PERSISTED.append(scored)
    kept = scored.filter(
        (F.col("lang_pred") == "en") & (F.col("quality_score") >= 0.6)
    ).select("doc_id", "text", "quality_score", "n_tokens")
    # persist the deduped frame: it feeds BOTH the AllPairs shingle plan
    # and the final anti-join — without the cache the parquet scan and the
    # HOF-heavy quality expressions run twice (a second full corpus pass
    # at 100TB)
    # n_tokens rides in from the scored projection (computed once from
    # the staged token array — HOF expressions are CSE-exempt, so a
    # size(tokens(text)) here would pay the full regex split again)
    # persisting exact A/B-measured vs recompute-from-scored (r13): the
    # cache write pays for itself across the three consumers (8.6 s vs
    # 9.3 s for prep+build+funnel at sf0.1)
    exact = dedup.exact_dedup(kept).persist()
    _PERSISTED.append(exact)
    inner: list = []
    pairs = dedup.jaccard_allpairs(
        exact, shingle_n=3, threshold=0.5, persist_registry=inner
    )
    _PERSISTED.extend(inner)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    # final is NOT persisted: its upstream boundaries (scored, exact, the
    # AllPairs inner frames) already cache everything expensive, so
    # consumers that read it twice (corpus_build) re-run only the cheap
    # anti-join over cached inputs.  Persisting it was measured at +1.2s
    # per cleared-cache rep on corpus_prep (4.34s -> 3.04s best-of-5
    # after removal) while saving corpus_build nothing (5.4s both ways):
    # a persist here forces materializing all three columns through the
    # in-memory store where the count()-shaped consumers only need one.
    final = exact.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "quality_score", "n_tokens"
    )
    out = (docs, kept, exact, final)
    _STAGE_MEMO[key] = ([scored, exact, *inner], out)
    return out


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full corpus-prep pipeline as one Catalyst plan.

    Stage order mirrors a production pretraining-data build: (1) score
    every document (quality heuristic + stopword lang-ID) and keep
    English docs with quality >= 0.6; (2) exact dedup on the normalized
    text (keep-smallest doc_id); (3) near-dup removal via the
    prefix-filtered AllPairs exact Jaccard (threshold 0.5), dropping the
    larger id of every matched pair; (4) emit survivors with their score
    and whitespace token count.  Because each stage is a DataFrame ->
    DataFrame transform, Catalyst prunes columns across every boundary
    and the expensive shingle self-join only ever sees the
    quality-filtered, exact-deduped subset — the filters run BEFORE the
    quadratic-risk stage, exactly the ordering you want at 100TB.
    """
    _, _, _, final = _corpus_stages(spark, sf_dir)
    return final.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "quality_score",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )


_Q_CORPUS_PREP_SQL = f"""
WITH tokraw AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
  FROM documents
),
toks0 AS (
  SELECT *, list_transform(t, x -> lower(x)) AS lt FROM tokraw
),
feats AS (
  SELECT doc_id, text, len(t) AS n_tokens,
    round(1e-9
      + 0.25 * (CASE WHEN len(t) BETWEEN 20 AND 100000 THEN 1.0
                     ELSE least(len(t)::DOUBLE / 20.0, 1.0) END)
      + 0.25 * (len(list_intersect(lt, {_EN_STOP_SQL})) / 10.0)
      + 0.25 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / greatest(length(text), 1))
      + 0.25 * (len(list_distinct(t))::DOUBLE / greatest(len(t), 1)), 6) AS quality_score,
    len(list_filter(lt, x -> list_contains(['der', 'die', 'und', 'das', 'ist', 'nicht', 'ein', 'mit', 'von', 'den'], x)))::DOUBLE / greatest(len(lt), 1) AS r_de,
    len(list_filter(lt, x -> list_contains(['the', 'a', 'and', 'of', 'to', 'in', 'is', 'it', 'that', 'for'], x)))::DOUBLE / greatest(len(lt), 1) AS r_en,
    len(list_filter(lt, x -> list_contains(['el', 'la', 'de', 'que', 'y', 'en', 'un', 'los', 'se', 'con'], x)))::DOUBLE / greatest(len(lt), 1) AS r_es,
    len(list_filter(lt, x -> list_contains(['le', 'la', 'les', 'de', 'et', 'des', 'un', 'une', 'dans', 'est'], x)))::DOUBLE / greatest(len(lt), 1) AS r_fr,
    len(list_filter(lt, x -> list_contains(['yang', 'dan', 'di', 'itu', 'dengan', 'untuk', 'tidak', 'ini', 'dari', 'pada'], x)))::DOUBLE / greatest(len(lt), 1) AS r_id,
    len(list_filter(lt, x -> list_contains(['il', 'di', 'che', 'la', 'per', 'con', 'una', 'del', 'non', 'sono'], x)))::DOUBLE / greatest(len(lt), 1) AS r_it,
    len(list_filter(lt, x -> list_contains(['de', 'het', 'een', 'van', 'en', 'dat', 'niet', 'met', 'voor', 'ik'], x)))::DOUBLE / greatest(len(lt), 1) AS r_nl,
    len(list_filter(lt, x -> list_contains(['de', 'que', 'e', 'o', 'da', 'em', 'um', 'para', 'com', 'os'], x)))::DOUBLE / greatest(len(lt), 1) AS r_pt,
    len(list_filter(lt, x -> list_contains(['и', 'в', 'не', 'на', 'что', 'с', 'как', 'это', 'по', 'то'], x)))::DOUBLE / greatest(len(lt), 1) AS r_ru,
    len(list_filter(lt, x -> list_contains(['bir', 've', 'bu', 'için', 'ne', 'gibi', 'ama', 'çok', 'daha', 'ben'], x)))::DOUBLE / greatest(len(lt), 1) AS r_tr
  FROM toks0
),
kept AS (
  SELECT * FROM (SELECT *, list_max([{{'r': r_de, 'l': 'de'}}, {{'r': r_en, 'l': 'en'}}, {{'r': r_es, 'l': 'es'}}, {{'r': r_fr, 'l': 'fr'}}, {{'r': r_id, 'l': 'id'}}, {{'r': r_it, 'l': 'it'}}, {{'r': r_nl, 'l': 'nl'}}, {{'r': r_pt, 'l': 'pt'}}, {{'r': r_ru, 'l': 'ru'}}, {{'r': r_tr, 'l': 'tr'}}]) AS best FROM feats)
  WHERE (best).l = 'en' AND (best).r >= 0.05 AND quality_score >= 0.6
),
keyed AS (
  SELECT *, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm FROM kept
),
reps AS (SELECT norm, min(doc_id) AS rep_id FROM keyed GROUP BY norm),
exact AS (
  SELECT k.* FROM keyed k JOIN reps r ON k.norm = r.norm AND k.doc_id = r.rep_id
),
toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(norm, '\\s+'), x -> x <> '') AS t
  FROM exact
),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      i -> array_to_string(t[i:i+2], ' '))) AS s
  FROM toks
),
sized AS (SELECT doc_id, s, len(s) AS sz FROM sh),
ex AS (SELECT doc_id, sz, unnest(s) AS g FROM sized),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         count(*) AS i, any_value(a.sz) AS sz_a, any_value(b.sz) AS sz_b
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dropped AS (SELECT DISTINCT id_b FROM inter WHERE i / (sz_a + sz_b - i) >= 0.5)
SELECT e.doc_id::BIGINT AS doc_id, e.quality_score, e.n_tokens::BIGINT AS n_tokens
FROM exact e WHERE e.doc_id NOT IN (SELECT id_b FROM dropped)
"""


# --------------------------------------------------------------------------
# portable-hash dedup variants (exact oracles: the hash family is plain
# modular arithmetic, reproduced verbatim in DuckDB SQL)
# --------------------------------------------------------------------------

_TOKS_CTE = """
toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
)"""

_POLY = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(range(1, length({col})+1), i -> ord({col}[i])::BIGINT)), "
    "(h, c) -> (h * 31 + c) % 2147483647)"
)


@prepared()
def q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over the portable polynomial hash — exact oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_portable(docs, bits=16).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "simhash16"
    )


def _simhash_portable_sql(bits: int = 16) -> str:
    sums = ",\n    ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits))
    return f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
hs AS (SELECT doc_id, {_POLY.format(col='tk')} AS h FROM tok),
bits AS (SELECT doc_id,
    {sums}
  FROM hs GROUP BY doc_id)
SELECT doc_id::BIGINT AS doc_id, ({fp})::BIGINT AS simhash16 FROM bits
"""


def q_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram log-perplexity against the corpus LM
    (add-1 smoothing) — the SQL-replayable core of CCNet-style quality
    filtering.  Exact oracle."""
    from kats_spark.operators.sampling import unigram_logppl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = unigram_logppl(docs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        _rnd("logppl", 6).alias("logppl"),
    )


_Q_UNIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
freq AS (SELECT tk, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c)::DOUBLE AS total, count(*)::DOUBLE AS vocab FROM freq)
SELECT doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_tokens,
  round(1e-9 + avg(-ln((c + 1.0) / (total + vocab))), 6) AS logppl
FROM tok JOIN freq USING (tk) CROSS JOIN tot
GROUP BY 1
"""


def q_bigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BIGRAM log-perplexity (add-1 conditional model) —
    one rung up the n-gram LM ladder from unigram_logppl, same exact
    SQL-replayable arithmetic.  Exact oracle."""
    from kats_spark.operators.sampling import bigram_logppl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bigram_logppl(docs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        _rnd("logppl", 6).alias("logppl"),
    )


_Q_BIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
p0 AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM p0),
doc_bg AS (SELECT doc_id, w1, w2, count(*) AS k FROM pairs GROUP BY 1, 2, 3),
bg AS (SELECT w1, w2, sum(k) AS c12 FROM doc_bg GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM bg GROUP BY 1),
vocab AS (
  SELECT count(DISTINCT tk)::DOUBLE AS v
  FROM (SELECT unnest(t) AS tk FROM toks)
)
SELECT d.doc_id::BIGINT AS doc_id,
  sum(d.k)::BIGINT AS n_bigrams,
  round(1e-9 + sum(d.k * -ln((b.c12 + 1.0) / (c.c1 + vocab.v))) / sum(d.k), 6) AS logppl
FROM doc_bg d JOIN bg b USING (w1, w2) JOIN ctx c USING (w1) CROSS JOIN vocab
GROUP BY 1
"""


@prepared()
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with id < 20 play the eval set;
    flag training docs sharing any verbatim word-8-gram with them.
    Broadcast-semi-join plan, exact oracle."""
    from kats_spark.operators.sampling import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") < 20)
    tr = docs.filter(F.col("doc_id") >= 20)
    flagged, _ = decontaminate(tr, ev, shingle_n=8)
    return flagged.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_gram_hits").cast("bigint").alias("n_gram_hits"),
    )


_Q_DECONTAMINATE_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 7, 1) + 1),
      i -> array_to_string(t[i:i+7], ' '))) AS s
  FROM toks
),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
ev AS (SELECT DISTINCT g FROM ex WHERE doc_id < 20)
SELECT e.doc_id::BIGINT AS doc_id, count(DISTINCT e.g)::BIGINT AS n_gram_hits
FROM ex e JOIN ev USING (g)
WHERE e.doc_id >= 20
GROUP BY 1
"""


@prepared()
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition features (dup-line ratio,
    top 2-gram share, duplicated-gram occurrence ratio) — exact oracle."""
    from kats_spark.operators.sampling import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = repetition_stats(docs, shingle_n=2)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        _rnd("dup_line_ratio", 6).alias("dup_line_ratio"),
        _rnd("top_gram_share", 6).alias("top_gram_share"),
        _rnd("dup_gram_ratio", 6).alias("dup_gram_ratio"),
    )


_Q_REPETITION_SQL = """
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
),
lf AS (SELECT doc_id, line FROM lines WHERE trim(line) <> ''),
lstat AS (
  SELECT doc_id, 1.0 - count(*)::DOUBLE / sum(c) AS dup_line_ratio
  FROM (SELECT doc_id, line, count(*) AS c FROM lf GROUP BY 1, 2)
  GROUP BY 1
),
toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
    unnest(list_transform(range(1, greatest(len(t) - 1, 1) + 1),
      i -> array_to_string(t[i:i+1], ' '))) AS g
  FROM toks
),
gstat AS (
  SELECT doc_id,
    max(c)::DOUBLE / sum(c) AS top_gram_share,
    sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c) AS dup_gram_ratio
  FROM (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2)
  GROUP BY 1
)
SELECT d.doc_id::BIGINT AS doc_id,
  round(1e-9 + coalesce(l.dup_line_ratio, 0.0), 6) AS dup_line_ratio,
  round(1e-9 + g.top_gram_share, 6) AS top_gram_share,
  round(1e-9 + g.dup_gram_ratio, 6) AS dup_gram_ratio
FROM documents d
LEFT JOIN lstat l USING (doc_id)
LEFT JOIN gstat g USING (doc_id)
"""


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget stratified sampling: greedy-fill each
    (source, lang) bucket to 5000 tokens in seeded-md5 shuffle order —
    the draw step after corpus_mixture's budget accounting.  Fully
    window-expressible -> exact oracle."""
    from kats_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = token_budget_sample(docs, budget_tokens=5000, seed=7)
    # Canonical output: deterministic orderBy + explicit casts.  r03's
    # driver hash-mismatch traced to the ORACLE side (DuckDB windowed
    # sum(BIGINT) -> HUGEINT -> pandas float64 vs Spark int64); both
    # sides now pin bigint and doc_id order so the driver's hasher sees
    # identical dtype + row order however it canonicalizes.
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    ).orderBy("doc_id")


_Q_CORPUS_SAMPLE_SQL = """
WITH base AS (
  SELECT doc_id, source, lang,
    len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS n_tokens,
    md5(concat_ws(':', '7', doc_id::VARCHAR)) AS rk
  FROM documents
),
c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source, lang ORDER BY rk, doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM base
)
SELECT doc_id, source, lang, n_tokens, cum_tokens::BIGINT AS cum_tokens
FROM c WHERE cum_tokens - n_tokens < 5000
ORDER BY doc_id
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling (sampling.py
    temperature_mixture_sample): per-language budgets p_l ∝ n_l^0.5 over
    a 20k-token total, then the deterministic greedy fill — the
    multilingual-pretraining rebalance as one oracle-replayable plan
    (budget arithmetic + md5 shuffle order + prefix-sum fill)."""
    from kats_spark.operators.sampling import temperature_mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = temperature_mixture_sample(
        docs, total_budget=20000, alpha=0.5, by=["lang"], seed=7
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        F.col("__budget").cast("bigint").alias("bucket_budget"),
    ).orderBy("doc_id")


_Q_MIXTURE_SAMPLE_SQL = """
WITH base AS (
  SELECT doc_id, lang,
    len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS n_tokens,
    md5(concat_ws(':', '7', doc_id::VARCHAR)) AS rk
  FROM documents
),
tot AS (SELECT lang, sum(n_tokens) AS bt FROM base GROUP BY lang),
z AS (SELECT sum(pow(bt::DOUBLE, 0.5)) AS z FROM tot),
bud AS (
  SELECT lang, floor(20000.0 * pow(bt::DOUBLE, 0.5) / z + 1e-9)::BIGINT AS bucket_budget
  FROM tot CROSS JOIN z
),
c AS (
  SELECT b.doc_id, b.lang, b.n_tokens, u.bucket_budget,
    sum(b.n_tokens) OVER (PARTITION BY b.lang ORDER BY b.rk, b.doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM base b JOIN bud u USING (lang)
)
SELECT doc_id, lang, n_tokens, cum_tokens::BIGINT AS cum_tokens, bucket_budget
FROM c WHERE cum_tokens - n_tokens < bucket_budget
ORDER BY doc_id
"""


@prepared()
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via the pigeonhole band join
    (Manku/Jain/Sarma WWW'07) over the PORTABLE 16-bit fingerprint —
    exact oracle: fingerprints, chunk join, and bit_count(xor) hamming
    verify all replay in DuckDB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # 24-bit fingerprint: 6-bit chunks give 64 buckets per band, keeping
    # band-join fan-out linear at corpus scale (16 bits collided half the
    # corpus into 16 buckets; measured 4.5s -> sub-second at sf0.1)
    fp = dedup.simhash_portable(docs, bits=24)
    # max_hamming=1: the near-identical tier (the synthetic corpus's tiny
    # shared vocabulary makes looser thresholds match half the corpus --
    # 1.6M pairs at hamming<=3)
    out = dedup.simhash_pairs(
        fp, max_hamming=1, bands=2, bits=24, fp_col="simhash16"
    )
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("hamming").cast("bigint").alias("hamming"),
    )


def _simhash_neardup_sql(bits: int = 16, bands: int = 4, max_hamming: int = 3) -> str:
    base = _simhash_portable_sql(bits)
    w = bits // bands
    chunk_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash16, {b} AS band, (simhash16 >> {b * w}) & {(1 << (w if b < bands - 1 else bits - w * (bands - 1))) - 1} AS chunk FROM fp"
        for b in range(bands)
    )
    return f"""
WITH fp AS ({base}),
keyed AS (
  {chunk_rows}
)
SELECT DISTINCT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b,
  bit_count(xor(a.simhash16, b.simhash16))::BIGINT AS hamming
FROM keyed a JOIN keyed b ON a.band = b.band AND a.chunk = b.chunk
  AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash16, b.simhash16)) <= {max_hamming}
"""


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: distributed min-label
    propagation with pointer jumping (dedup.dup_components) over the
    simhash_neardup pair graph.  Full oracle: a recursive-CTE transitive
    closure computes the identical min-reachable-id labels in DuckDB —
    the iterative Spark loop and the recursive SQL agree exactly at the
    fixpoint."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = dedup.simhash_portable(docs, bits=24)
    pairs = dedup.simhash_pairs(
        fp, max_hamming=1, bands=2, bits=24, fp_col="simhash16"
    )
    out = dedup.dup_components(pairs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
    )


def _dup_clusters_sql(bits: int = 24, bands: int = 2, max_hamming: int = 1) -> str:
    base = _simhash_portable_sql(bits)
    w = bits // bands
    chunk_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash16, {b} AS band, (simhash16 >> {b * w}) & {(1 << (w if b < bands - 1 else bits - w * (bands - 1))) - 1} AS chunk FROM fp"
        for b in range(bands)
    )
    return f"""
WITH RECURSIVE fp AS ({base}),
keyed AS (
  {chunk_rows}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM keyed a JOIN keyed b ON a.band = b.band AND a.chunk = b.chunk
    AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash16, b.simhash16)) <= {max_hamming}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(u, lbl) AS (
  SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u
)
SELECT u::BIGINT AS doc_id, min(lbl)::BIGINT AS cluster_id
FROM reach GROUP BY u
"""


def q_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-quality representative per duplicate cluster
    (dedup.cluster_representatives over the simhash_neardup pair graph,
    quality = n_chars — the RefinedWeb keep-the-longest retention rule).
    Full oracle: the dup_clusters recursive-CTE closure + a window
    argmax replay the identical winners."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = dedup.simhash_portable(docs, bits=24)
    pairs = dedup.simhash_pairs(
        fp, max_hamming=1, bands=2, bits=24, fp_col="simhash16"
    )
    out = dedup.cluster_representatives(docs, pairs, quality_col="n_chars")
    return out.select(
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.col("rep_id").cast("bigint").alias("rep_id"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.col("rep_quality").cast("bigint").alias("rep_quality"),
    )


def _cluster_reps_sql(bits: int = 24, bands: int = 2, max_hamming: int = 1) -> str:
    return f"""
WITH clusters AS ({_dup_clusters_sql(bits, bands, max_hamming)}),
labeled AS (
  SELECT coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.doc_id, d.n_chars
  FROM documents d LEFT JOIN clusters c USING (doc_id)
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC) AS rk,
    count(*) OVER (PARTITION BY cluster_id) AS sz,
    max(n_chars) OVER (PARTITION BY cluster_id) AS bq
  FROM labeled
)
SELECT cluster_id::BIGINT AS cluster_id, doc_id::BIGINT AS rep_id,
  sz::BIGINT AS cluster_size, bq::BIGINT AS rep_quality
FROM ranked WHERE rk = 1
"""


def q_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs over the portable hash family (16
    permutations, 4 bands) — exact oracle with the same seeded (a_k, b_k)
    constants inlined into both plans."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_portable_pairs(docs, num_hashes=16, bands=4, seed=7).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
    )


def _minhash_portable_sql(num_hashes: int = 16, bands: int = 4, seed: int = 7) -> str:
    params = dedup._hash_params(num_hashes, seed)
    rpb = num_hashes // bands
    mins = ",\n    ".join(
        f"min((h * {a}::BIGINT + {b}) % 2147483647) AS m{k}"
        for k, (a, b) in enumerate(params)
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_id, concat_ws(',', "
        + ", ".join(f"m{j * rpb + r}" for r in range(rpb))
        + ") AS key FROM sig"
        for j in range(bands)
    )
    return f"""
WITH {_TOKS_CTE},
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      i -> array_to_string(t[i:i+2], ' '))) AS s
  FROM toks
),
g AS (SELECT doc_id, unnest(s) AS g FROM sh),
hs AS (SELECT doc_id, {_POLY.format(col='g')} AS h FROM g),
sig AS (SELECT doc_id,
    {mins}
  FROM hs GROUP BY doc_id),
bands AS (
  {band_selects}
)
SELECT DISTINCT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b
FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id
"""


def q_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (minhash-similarity) benchmark decontamination — the
    NEAR-verbatim leakage check the exact n-gram pass misses.  The eval
    set is constructed as the 80%-token prefix of every 97th document
    (deterministic truncation = lightly-edited leakage); the flagged set
    must recover exactly those source documents.  Full oracle: the
    portable hash family, truncation, and band join replay in DuckDB
    with identical constants."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")
    ev = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(
                toks, F.lit(1), F.ceil(F.size(toks) * 0.8).cast("int")
            ),
            " ",
        ).alias("text"),
    )
    flagged, _clean = dedup.decontaminate_fuzzy(docs, ev, threshold=0.5)
    return flagged.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "sim_hat",
        F.col("n_eval_hits").cast("bigint").alias("n_eval_hits"),
    )


def _decontaminate_fuzzy_sql(
    num_hashes: int = 16, bands: int = 4, seed: int = 7, threshold: float = 0.5
) -> str:
    params = dedup._hash_params(num_hashes, seed)
    rpb = num_hashes // bands
    mins = ",\n    ".join(
        f"min((h * {a}::BIGINT + {b}) % 2147483647) AS m{k}"
        for k, (a, b) in enumerate(params)
    )

    def band_rows(src: str) -> str:
        return "\n  UNION ALL ".join(
            f"SELECT doc_id, {j} AS band_id, concat_ws(',', "
            + ", ".join(f"m{j * rpb + r}" for r in range(rpb))
            + f") AS key FROM {src}"
            for j in range(bands)
        )

    agree = " + ".join(
        f"CASE WHEN t.m{k} = e.m{k} THEN 1 ELSE 0 END" for k in range(num_hashes)
    )
    return f"""
WITH {_TOKS_CTE},
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      i -> array_to_string(t[i:i+2], ' '))) AS s
  FROM toks
),
g AS (SELECT doc_id, unnest(s) AS g FROM sh),
hs AS (SELECT doc_id, {_POLY.format(col='g')} AS h FROM g),
tsig AS (SELECT doc_id, {mins} FROM hs GROUP BY doc_id),
-- eval corpus: 80%-token prefix of every 97th document (near-verbatim
-- leakage by construction), id-shifted into its own space
etoks AS (
  SELECT doc_id + 1000000 AS doc_id,
         tt[1:ceil(len(tt) * 0.8)::INT] AS t
  FROM (
    SELECT doc_id,
      list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                  x -> x <> '') AS tt
    FROM documents WHERE doc_id % 97 = 0
  )
),
esh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      i -> array_to_string(t[i:i+2], ' '))) AS s
  FROM etoks
),
eg AS (SELECT doc_id, unnest(s) AS g FROM esh),
ehs AS (SELECT doc_id, {_POLY.format(col='g')} AS h FROM eg),
esig AS (SELECT doc_id, {mins} FROM ehs GROUP BY doc_id),
tb AS ({band_rows('tsig')}),
eb AS ({band_rows('esig')}),
cand AS (
  SELECT DISTINCT t.doc_id AS doc_id, e.doc_id AS eval_id
  FROM tb t JOIN eb e ON t.band_id = e.band_id AND t.key = e.key
),
agree AS (
  SELECT c.doc_id, c.eval_id, ({agree}) / {float(num_hashes)} AS a
  FROM cand c JOIN tsig t ON c.doc_id = t.doc_id
              JOIN esig e ON c.eval_id = e.doc_id
)
SELECT doc_id::BIGINT AS doc_id,
       round(max(a) + 1e-9, 6) AS sim_hat,
       count(DISTINCT eval_id)::BIGINT AS n_eval_hits
FROM agree WHERE a >= {threshold}
GROUP BY doc_id
"""


@prepared()
def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus profile: doc counts, token totals and
    exact interpolated token-length quantiles (p50/p90/p99) — the
    at-a-glance audit a mixture decision reads.  Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share the interpolated
    definition, so the oracle is exact."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tok = F.size(text.tokens(F.col("text")))
    return (
        docs.withColumn("__nt", n_tok)
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__nt").cast("bigint").alias("n_tokens"),
            F.round(F.expr("percentile(__nt, 0.5)") + 1e-9, 6).alias("p50_tokens"),
            F.round(F.expr("percentile(__nt, 0.9)") + 1e-9, 6).alias("p90_tokens"),
            F.round(F.expr("percentile(__nt, 0.99)") + 1e-9, 6).alias("p99_tokens"),
        )
    )


_Q_CORPUS_PROFILE_SQL = """
WITH d AS (
  SELECT source, lang,
    len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS nt
  FROM documents
)
SELECT source, lang,
  count(*)::BIGINT AS n_docs,
  sum(nt)::BIGINT AS n_tokens,
  round(1e-9 + quantile_cont(nt, 0.5), 6) AS p50_tokens,
  round(1e-9 + quantile_cont(nt, 0.9), 6) AS p90_tokens,
  round(1e-9 + quantile_cont(nt, 0.99), 6) AS p99_tokens
FROM d GROUP BY 1, 2
"""


def q_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact corpus profile audit (text.sketch_profile): HLL++
    vocabulary count and approx percentiles next to their exact twins,
    with the relative error AS A COLUMN — the measured-approximation
    pattern (ivf_recall, minhash_quality) applied to the sketches a
    100 TB profile run would use.  Sketch values are engine-internal
    (HLL register layout) -> rows-only; the error bound is asserted in
    tests/test_batch3.py."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.sketch_profile(docs, rsd=0.02)


@prepared()
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law audit over corpus token frequencies — full oracle:
    identical normalize/tokenize, rank window, and regr_slope/regr_r2."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.zipf_fit(docs, top_n=1000)


_Q_ZIPF_SQL = """
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
),
tok AS (SELECT unnest(t) AS tk FROM toks),
freq AS (SELECT tk, count(*) AS c FROM tok GROUP BY 1),
totals AS (SELECT sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab FROM freq),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tk ASC) AS r FROM freq
),
fit AS (
  SELECT regr_slope(ln(c), ln(r)) AS zipf_slope, regr_r2(ln(c), ln(r)) AS zipf_r2
  FROM ranked WHERE r <= 1000
)
SELECT t.n_tokens, t.vocab,
       round(1e-9 + f.zipf_slope, 6) AS zipf_slope,
       round(1e-9 + f.zipf_r2, 6) AS zipf_r2
FROM totals t CROSS JOIN fit f
"""


@prepared()
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between the corpus and a deterministically perturbed
    copy (every 7th doc text-modified, every 13th dropped, 20 synthetic
    ids added) — full oracle: fingerprints and the outer-join
    classification replay exactly in DuckDB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" EDITED"))
            ).otherwise(F.col("text")).alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 5_000_000).alias("doc_id"),
                F.concat(F.lit("brand new doc "), F.col("text")).alias("text"),
            )
        )
    )
    out = dedup.snapshot_diff(docs, new)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "status", "old_fp", "new_fp"
    )


_Q_SNAPSHOT_DIFF_SQL = """
WITH o AS (
  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS old_fp
  FROM documents
),
base_new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' EDITED' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 5000000 AS doc_id, 'brand new doc ' || text AS text
  FROM documents WHERE doc_id < 20
),
n AS (
  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS new_fp
  FROM base_new
)
SELECT coalesce(o.doc_id, n.doc_id)::BIGINT AS doc_id,
  CASE WHEN o.old_fp IS NULL THEN 'added'
       WHEN n.new_fp IS NULL THEN 'removed'
       WHEN o.old_fp = n.new_fp THEN 'unchanged'
       ELSE 'changed' END AS status,
  o.old_fp, n.new_fp
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability: one row of per-stage survivor counts and
    retention rates for the corpus-prep funnel (raw → lang/quality kept →
    exact-deduped → near-dup-free).  The numbers a data-quality dashboard
    tracks per ingest batch; at 100 TB this is the same plan with the
    counts coming from the stage frames already being computed."""
    docs, kept, exact, final = _corpus_stages(spark, sf_dir)
    counts = (
        docs.agg(F.count("*").cast("bigint").alias("n_docs"))
        .crossJoin(kept.agg(F.count("*").cast("bigint").alias("n_kept")))
        .crossJoin(exact.agg(F.count("*").cast("bigint").alias("n_exact")))
        .crossJoin(final.agg(F.count("*").cast("bigint").alias("n_final")))
    )
    return counts.select(
        "n_docs",
        "n_kept",
        "n_exact",
        "n_final",
        _rnd(F.col("n_kept") / F.col("n_docs"), 6).alias("keep_rate"),
        _rnd(F.col("n_final") / F.col("n_docs"), 6).alias("survival_rate"),
    )


_Q_CORPUS_FUNNEL_SQL = f"""
WITH base AS ({_Q_CORPUS_PREP_SQL}),
n0 AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
n1 AS (
  SELECT count(*)::BIGINT AS n_kept FROM (
    {_Q_CORPUS_PREP_SQL.split("kept AS (")[0]}
    kept AS (
      SELECT * FROM (SELECT *, list_max([{{'r': r_de, 'l': 'de'}}, {{'r': r_en, 'l': 'en'}}, {{'r': r_es, 'l': 'es'}}, {{'r': r_fr, 'l': 'fr'}}, {{'r': r_id, 'l': 'id'}}, {{'r': r_it, 'l': 'it'}}, {{'r': r_nl, 'l': 'nl'}}, {{'r': r_pt, 'l': 'pt'}}, {{'r': r_ru, 'l': 'ru'}}, {{'r': r_tr, 'l': 'tr'}}]) AS best FROM feats)
      WHERE (best).l = 'en' AND (best).r >= 0.05 AND quality_score >= 0.6
    )
    SELECT doc_id FROM kept
  ) t1
),
n2 AS (
  SELECT count(*)::BIGINT AS n_exact FROM (
    {_Q_CORPUS_PREP_SQL.split("toks AS (")[0]}
    x AS (SELECT 1)
    SELECT e.doc_id FROM exact e
  ) t2
),
n3 AS (SELECT count(*)::BIGINT AS n_final FROM base)
SELECT n_docs, n_kept, n_exact, n_final,
  round(1e-9 + n_kept / n_docs::DOUBLE, 6) AS keep_rate,
  round(1e-9 + n_final / n_docs::DOUBLE, 6) AS survival_rate
FROM n0, n1, n2, n3
"""


def q_minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured approximation quality of MinHash-LSH dedup: candidate
    pairs from the portable-hash banded LSH (16 perms, 4 bands) scored
    against ground-truth exact Jaccard >= 0.5 pairs (prefix-filtered
    AllPairs).  Returns ONE row: candidate / truth / hit counts plus
    precision and recall — both inputs are deterministic, so the whole
    audit hash-matches a DuckDB oracle.  This is the don't-guess knob:
    re-run with different (num_hashes, bands) before committing a band
    geometry to a 100TB dedup pass."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    truth = dedup.jaccard_allpairs(docs, shingle_n=3, threshold=0.5).select(
        "id_a", "id_b", F.lit(1).alias("__t")
    )
    cand = dedup.minhash_portable_pairs(docs, num_hashes=16, bands=4, seed=7).select(
        "id_a", "id_b", F.lit(1).alias("__c")
    )
    joined = truth.join(cand, ["id_a", "id_b"], "full_outer")
    return joined.agg(
        F.sum("__t").cast("bigint").alias("n_true"),
        F.sum("__c").cast("bigint").alias("n_cand"),
        F.sum(F.col("__t") * F.col("__c")).cast("bigint").alias("n_hit"),
        _rnd(F.sum(F.col("__t") * F.col("__c")) / F.sum("__c"), 6).alias("precision"),
        _rnd(F.sum(F.col("__t") * F.col("__c")) / F.sum("__t"), 6).alias("recall"),
    )


def _minhash_quality_sql(num_hashes: int = 16, bands: int = 4, seed: int = 7) -> str:
    params = dedup._hash_params(num_hashes, seed)
    rpb = num_hashes // bands
    mins = ",\n    ".join(
        f"min((h * {a}::BIGINT + {b}) % 2147483647) AS m{k}"
        for k, (a, b) in enumerate(params)
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_id, concat_ws(',', "
        + ", ".join(f"m{j * rpb + r}" for r in range(rpb))
        + ") AS key FROM sig"
        for j in range(bands)
    )
    return f"""
WITH {_TOKS_CTE},
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      i -> array_to_string(t[i:i+2], ' '))) AS s
  FROM toks
),
sized AS (SELECT doc_id, s, len(s) AS sz FROM sh),
ex AS (SELECT doc_id, sz, unnest(s) AS g FROM sized),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         count(*) AS i, any_value(a.sz) AS sz_a, any_value(b.sz) AS sz_b
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT id_a, id_b, 1 AS t FROM inter WHERE i / (sz_a + sz_b - i) >= 0.5
),
g AS (SELECT doc_id, unnest(s) AS g FROM sh),
hs AS (SELECT doc_id, {_POLY.format(col='g')} AS h FROM g),
sig AS (SELECT doc_id,
    {mins}
  FROM hs GROUP BY doc_id),
bands AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, 1 AS c
  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id
),
j AS (
  SELECT coalesce(t.id_a, c.id_a) AS id_a, t.t, c.c
  FROM truth t FULL OUTER JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
)
SELECT sum(t)::BIGINT AS n_true, sum(c)::BIGINT AS n_cand,
  sum(t * c)::BIGINT AS n_hit,
  round(1e-9 + sum(t * c) / sum(c)::DOUBLE, 6) AS precision,
  round(1e-9 + sum(t * c) / sum(t)::DOUBLE, 6) AS recall
FROM j
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (sampling.py pack_sequences):
    documents laid end-to-end in seeded-md5 shuffle order, token stream
    cut every 512 tokens — per-doc sequence assignment, boundary spans
    and offsets from one exact global prefix sum (salted-exact at
    scale).  Fully window-expressible -> exact oracle."""
    from kats_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, seq_len=512, seed=7).orderBy("doc_id")


_Q_PACK_SEQUENCES_SQL = """
WITH base AS (
  SELECT doc_id,
    len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''))::BIGINT AS n_tokens,
    md5(concat_ws(':', '7', doc_id::VARCHAR)) AS rk
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY rk, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
  FROM base
)
SELECT doc_id, n_tokens, cum_tokens,
  ((cum_tokens - n_tokens) // 512)::BIGINT AS seq_first,
  ((cum_tokens - 1) // 512)::BIGINT AS seq_last,
  ((cum_tokens - n_tokens) % 512)::BIGINT AS offset_in_seq,
  ((cum_tokens - 1) // 512 - (cum_tokens - n_tokens) // 512 + 1)::BIGINT AS n_seqs_spanned
FROM c ORDER BY doc_id
"""


@prepared()
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (text.py chunk_documents):
    64-token windows, 16-token overlap — the RAG/embedding prep fan-out
    as pure narrow JVM ops (tokenize + posexplode(sequence) + slice),
    zero shuffles.  chunk_text hashed to md5 so the oracle hash stays
    value-dense without shipping full chunk strings."""
    from kats_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_documents(docs, chunk_size=64, overlap=16)
    return out.select(
        "doc_id",
        "chunk_id",
        "start_tok",
        "chunk_len",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


_Q_CHUNK_DOCS_SQL = """
WITH base AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
n AS (
  SELECT doc_id, toks, len(toks) AS nt,
    greatest(ceil((len(toks) - 16) / 48.0), 1)::BIGINT AS n_chunks
  FROM base
),
e AS (
  SELECT doc_id, toks, i AS chunk_id, (i * 48)::BIGINT AS start_tok
  FROM n, unnest(range(0, n_chunks)) AS t(i)
)
SELECT doc_id, chunk_id::BIGINT AS chunk_id, start_tok,
  len(list_slice(toks, start_tok + 1, start_tok + 64))::BIGINT AS chunk_len,
  md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + 64), ' ')) AS chunk_md5
FROM e ORDER BY doc_id, chunk_id
"""


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical top-k neighbors (text.py tfidf_topk_pairs):
    sublinear-tf smoothed-idf weights, vectors truncated to their top-10 terms
    (deterministic rounded-weight ranking — the Bayardo-style posting
    bound), inverted-index self-join, full-norm cosine, top-3 per doc.
    The oracle replays the identical truncation, so the check is an
    exact hash despite the prune being part of the semantics."""
    from kats_spark.operators.text import tfidf_topk_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_topk_pairs(docs, k=3, top_m=10).orderBy("id_a", "rk")


_Q_TFIDF_TOPK_SQL = """
WITH term_rows AS (
  SELECT id, lower(t) AS t FROM (
    SELECT doc_id AS id,
      unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS t
    FROM documents)
),
tf AS (SELECT id, t, count(*)::DOUBLE AS tf FROM term_rows GROUP BY id, t),
dfreq AS (SELECT t, count(*)::DOUBLE AS df FROM tf GROUP BY t),
n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM documents),
w AS (
  SELECT id, t, (1 + ln(tf)) * (ln((1 + n) / (1 + df)) + 1) AS w
  FROM tf JOIN dfreq USING (t) CROSS JOIN n
),
norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
trunc0 AS (
  SELECT id, t, w FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY round(w + 1e-9, 6) DESC, t ASC) AS trk
    FROM w) WHERE trk <= 10
),
trunc AS (
  SELECT id, t, w FROM (
    SELECT *, row_number() OVER (
      PARTITION BY t ORDER BY round(w + 1e-9, 6) DESC, id ASC) AS prk
    FROM trunc0) WHERE prk <= 4096
),
dots AS (
  SELECT a.id AS id_a, b.id AS id_b, sum(a.w * b.w) AS dot
  FROM trunc a JOIN trunc b ON a.t = b.t AND a.id <> b.id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm) + 1e-9, 6) AS cos_sim
  FROM dots
  JOIN norms na ON na.id = dots.id_a
  JOIN norms nb ON nb.id = dots.id_b
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY id_a ORDER BY cos_sim DESC, id_b ASC) AS rk
  FROM scored
)
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, cos_sim, rk::INT AS rk
FROM ranked WHERE rk <= 3 ORDER BY id_a, rk
"""


@prepared()
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash train/val/test split (sampling.py
    split_assign): u = md5(seed||id) first-48-bits / 2^48, compared
    against cumulative normalized weights — order/partition independent,
    stable under appends, zero shuffles.  Returns the per-split count
    audit plus each doc's assignment."""
    from kats_spark.operators.sampling import split_assign

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = split_assign(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "split"
    ).orderBy("doc_id")


_Q_SPLIT_ASSIGN_SQL = """
WITH u AS (
  SELECT doc_id,
    (('0x' || substr(md5(concat_ws(':', '7', doc_id::VARCHAR)), 1, 12))::UBIGINT)::DOUBLE
      / 281474976710656.0 AS u
  FROM documents
)
SELECT doc_id,
  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
FROM u ORDER BY doc_id
"""


def q_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-factor upsampling (sampling.py epoch_upsample): per-source
    epoch factors (books get 2.5 epochs, web 1, the rest 1.3) repeat
    documents floor(e) times plus a deterministic md5-residual extra —
    expected multiplicity exactly e, re-runs byte-identical.  Output:
    one row per (doc, copy)."""
    from kats_spark.operators.sampling import epoch_upsample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weighted = docs.withColumn(
        "epochs",
        F.when(F.col("source") == "books", F.lit(2.5))
        .when(F.col("source") == "web", F.lit(1.0))
        .otherwise(F.lit(1.3)),
    )
    out = epoch_upsample(weighted)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        F.col("epoch_ix").cast("int").alias("epoch_ix"),
    ).orderBy("doc_id", "epoch_ix")


_Q_EPOCH_UPSAMPLE_SQL = """
WITH w AS (
  SELECT doc_id, source,
    CASE WHEN source = 'books' THEN 2.5 WHEN source = 'web' THEN 1.0
         ELSE 1.3 END AS epochs,
    (('0x' || substr(md5(concat_ws(':', 'ep', doc_id::VARCHAR)), 1, 12))::UBIGINT)::DOUBLE
      / 281474976710656.0 AS u
  FROM documents
),
n AS (
  SELECT doc_id, source,
    (floor(epochs) + CASE WHEN u < epochs - floor(epochs) THEN 1 ELSE 0 END)::INT AS n_copies
  FROM w
)
SELECT doc_id, source, i::INT AS epoch_ix
FROM n, unnest(range(0, n_copies)) AS t(i)
WHERE n_copies > 0
ORDER BY doc_id, epoch_ix
"""


@prepared()
def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup (dedup.py incremental_neardup_pairs): every
    97th document, truncated to its 80%-token prefix and re-id'd, plays
    the arriving batch; candidates join ACROSS batch/corpus band rows
    only — the daily-ingestion shape with no corpus self-join.  Full
    oracle: the portable family + asymmetric band join replay in
    DuckDB."""
    from kats_spark.operators.dedup import incremental_neardup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = incremental_neardup_pairs(_incremental_batch(docs), docs)
    return out.select(
        F.col("new_id").cast("bigint").alias("new_id"),
        F.col("corpus_id").cast("bigint").alias("corpus_id"),
    ).orderBy("new_id", "corpus_id")


def _incremental_batch(docs):
    """The arriving-batch frame q_incremental_neardup uses (every 97th
    doc, 80%-token prefix, re-id'd) — shared with the stored variant so
    both queries answer the same question."""
    toks = F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")
    return docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(toks, F.lit(1), F.ceil(F.size(toks) * 0.8).cast("int")), " "
        ).alias("text"),
    )


@prepared()
def q_incremental_neardup_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup against the SAVED band index
    (sources/ann_store.py): the standing corpus's MinHash band rows
    persist ONCE per scale factor as a table bucketed on the join key,
    and each arriving batch joins it with NO corpus-side exchange (the
    bucketed scan pre-satisfies the join distribution — asserted in
    tests/test_sources.py).  Same output and oracle as
    incremental_neardup; this is the amortized daily-ingest path the
    in-line variant's one-shot plan promises."""
    import os

    from kats_spark.sources.ann_store import (
        incremental_neardup_stored,
        save_band_index,
    )

    sf_name = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    table = f"band_index_{sf_name}"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if not spark.catalog.tableExists(table):
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "spark-warehouse",
            table,
        )
        # register-or-rebuild (r14): the session catalog is in-memory, so
        # a fresh session forgets the table; when the on-disk index is
        # current for this source (content fingerprint + build params),
        # re-register it instead of re-running the corpus signature pass
        # and rewriting the files
        _ensure_stored_index(
            spark,
            table,
            path,
            fingerprint_suffix="|band:mh16,b4,n3,s7",
            bucket_cols=["band_id", "key"],
            sf_dir=sf_dir,
            build=lambda: save_band_index(docs, table, path),
        )
    out = incremental_neardup_stored(spark, table, _incremental_batch(docs))
    return out.select(
        F.col("new_id").cast("bigint").alias("new_id"),
        F.col("corpus_id").cast("bigint").alias("corpus_id"),
    ).orderBy("new_id", "corpus_id")


def _ensure_stored_index(
    spark, table, path, fingerprint_suffix, bucket_cols, sf_dir, build, buckets=32
):
    """Shared register-or-rebuild gate for the stored-index queries:
    current on-disk data (source content fingerprint + build-param
    suffix) is RE-REGISTERED with the in-memory catalog; anything else
    is rebuilt and fingerprint-marked.  Values are identical either way
    — the registered table reads the exact files a fresh build writes."""
    from kats_spark.sources.ann_store import (
        mark_stored,
        register_bucketed_table,
        source_fingerprint,
        stored_is_current,
    )

    fp = source_fingerprint(f"{sf_dir}/documents.parquet") + fingerprint_suffix
    if stored_is_current(path, fp):
        register_bucketed_table(spark, table, path, bucket_cols, buckets)
    else:
        build()
        mark_stored(path, fp)


def _incremental_neardup_sql(num_hashes: int = 16, bands: int = 4, seed: int = 7) -> str:
    params = dedup._hash_params(num_hashes, seed)
    rpb = num_hashes // bands
    mins = ",\n    ".join(
        f"min((h * {a}::BIGINT + {b}) % 2147483647) AS m{k}"
        for k, (a, b) in enumerate(params)
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_id, concat_ws(',', "
        + ", ".join(f"m{j * rpb + r}" for r in range(rpb))
        + ") AS key FROM sig"
        for j in range(bands)
    )
    return f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
    array_to_string(
      t[1:ceil(len(t) * 0.8)::BIGINT], ' ') AS text
  FROM (
    SELECT doc_id,
      string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
    FROM documents WHERE doc_id % 97 = 0)
),
toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+'), x -> x <> '') AS t
  FROM src
),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
      i -> array_to_string(t[i:i+2], ' '))) AS s
  FROM toks
),
g AS (SELECT doc_id, unnest(s) AS g FROM sh),
hs AS (SELECT doc_id, {_POLY.format(col='g')} AS h FROM g),
sig AS (SELECT doc_id,
    {mins}
  FROM hs GROUP BY doc_id),
bands AS (
  {band_selects}
)
SELECT DISTINCT a.doc_id::BIGINT AS new_id, b.doc_id::BIGINT AS corpus_id
FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.key = b.key
WHERE a.doc_id >= 1000000 AND b.doc_id < 1000000
ORDER BY new_id, corpus_id
"""


@prepared()
def q_incremental_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SimHash near-dup (dedup.incremental_simhash_pairs):
    the same arriving batch as incremental_neardup (every 97th doc, 80%
    prefix, re-id'd) checked against the standing corpus by the
    pigeonhole chunk join ACROSS sides only + exact hamming verify —
    the simhash family's daily-ingestion shape.  Full oracle: portable
    fingerprints, chunk join, and bit_count(xor) all replay in DuckDB."""
    from kats_spark.operators.dedup import incremental_simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = incremental_simhash_pairs(
        _incremental_batch(docs), docs, max_hamming=1, bands=2, bits=24
    )
    return out.select(
        F.col("new_id").cast("bigint").alias("new_id"),
        F.col("corpus_id").cast("bigint").alias("corpus_id"),
        F.col("hamming").cast("bigint").alias("hamming"),
    ).orderBy("new_id", "corpus_id")


@prepared()
def q_incremental_simhash_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SimHash against the SAVED chunk index
    (ann_store.save_simhash_index): the corpus fingerprint pass persists
    ONCE per scale factor bucketed on (band, chunk), and each arriving
    batch joins it with no corpus-side exchange — completing the
    stored-index trio (MinHash bands / span grams / simhash chunks).
    Same output and oracle as incremental_simhash."""
    import os

    from kats_spark.sources.ann_store import (
        incremental_simhash_stored,
        save_simhash_index,
    )

    sf_name = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    table = f"simhash_index_{sf_name}"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if not spark.catalog.tableExists(table):
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "spark-warehouse",
            table,
        )
        # register-or-rebuild (r14) — see q_incremental_neardup_stored
        _ensure_stored_index(
            spark,
            table,
            path,
            fingerprint_suffix="|simhash:bits24,bands2",
            bucket_cols=["band", "chunk"],
            sf_dir=sf_dir,
            build=lambda: save_simhash_index(docs, table, path, bits=24, bands=2),
        )
    out = incremental_simhash_stored(
        spark, table, _incremental_batch(docs), max_hamming=1, bands=2, bits=24
    )
    return out.select(
        F.col("new_id").cast("bigint").alias("new_id"),
        F.col("corpus_id").cast("bigint").alias("corpus_id"),
        F.col("hamming").cast("bigint").alias("hamming"),
    ).orderBy("new_id", "corpus_id")


def _incremental_simhash_sql(
    bits: int = 24, bands: int = 2, max_hamming: int = 1
) -> str:
    sums = ",\n    ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    fp_expr = " + ".join(
        f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits)
    )
    w = bits // bands
    chunk_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash16, {b} AS band, (simhash16 >> {b * w}) & "
        f"{(1 << (w if b < bands - 1 else bits - w * (bands - 1))) - 1} AS chunk FROM fp"
        for b in range(bands)
    )
    return f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
    array_to_string(t[1:ceil(len(t) * 0.8)::BIGINT], ' ') AS text
  FROM (
    SELECT doc_id,
      string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
    FROM documents WHERE doc_id % 97 = 0)
),
toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM src
),
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
hs AS (SELECT doc_id, {_POLY.format(col='tk')} AS h FROM tok),
bits AS (SELECT doc_id,
    {sums}
  FROM hs GROUP BY doc_id),
fp AS (SELECT doc_id, ({fp_expr})::BIGINT AS simhash16 FROM bits),
keyed AS (
  {chunk_rows}
)
SELECT DISTINCT a.doc_id::BIGINT AS new_id, b.doc_id::BIGINT AS corpus_id,
  bit_count(xor(a.simhash16, b.simhash16))::BIGINT AS hamming
FROM keyed a JOIN keyed b ON a.band = b.band AND a.chunk = b.chunk
WHERE a.doc_id >= 1000000 AND b.doc_id < 1000000
  AND bit_count(xor(a.simhash16, b.simhash16)) <= {max_hamming}
ORDER BY new_id, corpus_id
"""


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota (sampling.py per_source_cap): keep the
    first 30 docs per source in seeded-md5 shuffle order — the C4-style
    domain cap as one window.  Exact oracle."""
    from kats_spark.operators.sampling import per_source_cap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = per_source_cap(docs, cap=30, seed=7)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        F.col("bucket_rank").cast("bigint").alias("bucket_rank"),
    ).orderBy("doc_id")


_Q_SOURCE_CAP_SQL = """
WITH r AS (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source
      ORDER BY md5(concat_ws(':', '7', doc_id::VARCHAR)), doc_id) AS bucket_rank
  FROM documents
)
SELECT doc_id, source, bucket_rank::BIGINT AS bucket_rank
FROM r WHERE bucket_rank <= 30 ORDER BY doc_id
"""


@prepared()
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span fraction (dedup.py dup_span_fraction): per doc,
    the share of its 20-token windows occurring in >= 2 documents — the
    Lee et al. substring-dedup metric, fully linear (one (doc, gram)
    pass + gram-df count + join back), oracled via the portable
    polynomial gram hash."""
    from kats_spark.operators.dedup import dup_span_fraction

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dup_span_fraction(docs, span_n=20, portable=True)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_spans",
        "n_dup_spans",
        "dup_frac",
    ).orderBy("doc_id")


def _dup_spans_sql(span_n: int = 20) -> str:
    return f"""
WITH {_TOKS_CTE},
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(t) - {span_n - 1}, 1) + 1),
      i -> array_to_string(t[i:i+{span_n - 1}], ' '))) AS s
  FROM toks
),
g AS (SELECT doc_id, unnest(s) AS g FROM sh),
hs AS (SELECT doc_id, {_POLY.format(col='g')} AS h FROM g),
dfq AS (SELECT h, count(DISTINCT doc_id) AS df FROM hs GROUP BY h),
per AS (
  SELECT hs.doc_id, count(*)::BIGINT AS n_spans,
    sum(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans
  FROM hs JOIN dfq USING (h) GROUP BY hs.doc_id
)
SELECT doc_id, n_spans, n_dup_spans,
  round(n_dup_spans / n_spans::DOUBLE + 1e-9, 6) AS dup_frac
FROM per ORDER BY doc_id
"""


@prepared()
def q_dup_span_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span EXCISION (dedup.py excise_dup_spans): the removal
    step of Lee et al. 2022 — every token covered by a 5-token window
    occurring in >= 2 documents is cut, docs reassembled from surviving
    tokens in order.  Exact oracle (portable string-keyed grams, window
    coverage, ordered string_agg reassembly)."""
    from kats_spark.operators.dedup import excise_dup_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = excise_dup_spans(docs, span_n=5, min_docs=2, portable=True)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "n_removed",
        "clean_text",
    ).orderBy("doc_id")


def _dup_span_excise_sql(span_n: int = 5) -> str:
    return f"""
WITH {_TOKS_CTE},
tok AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i, unnest(t) AS tok,
    len(t) AS n
  FROM toks
),
st AS (
  SELECT doc_id, i, array_to_string(t[i:i+{span_n - 1}], ' ') AS g
  FROM tok WHERE i <= n - {span_n - 1}
),
dup AS (SELECT g FROM st GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
ds AS (SELECT doc_id, i, 1 AS d FROM st JOIN dup USING (g)),
cov AS (
  SELECT tok.doc_id, tok.i, tok.tok,
    max(coalesce(ds.d, 0)) OVER (PARTITION BY tok.doc_id ORDER BY tok.i
      ROWS BETWEEN {span_n - 1} PRECEDING AND CURRENT ROW) AS c
  FROM tok LEFT JOIN ds ON tok.doc_id = ds.doc_id AND tok.i = ds.i
),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(c)::BIGINT AS n_removed,
    string_agg(CASE WHEN c = 0 THEN tok END, ' ' ORDER BY i) AS clean_text
  FROM cov GROUP BY doc_id
)
SELECT doc_id::BIGINT AS doc_id, n_tokens, n_removed,
  coalesce(clean_text, '') AS clean_text
FROM per ORDER BY doc_id
"""


@prepared()
def q_incremental_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental duplicated-span excision (dedup.excise_vs_corpus):
    clean an arriving batch against the standing corpus — the removal
    twin of incremental_neardup.  The batch is every 97th doc's
    80%-token prefix (re-crawled text the corpus already has) plus five
    novel id-specific tail tokens, so the result demonstrates BOTH
    behaviors: the prefix excises completely (every 5-window occurs
    verbatim in the source doc), the novel tail survives.  Exact oracle
    (string-keyed grams)."""
    from kats_spark.operators.dedup import excise_vs_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = excise_vs_corpus(
        _excise_batch(docs), docs, span_n=5, min_docs=1, portable=True
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "n_removed",
        "clean_text",
    ).orderBy("doc_id")


def _excise_batch(docs):
    """The arriving-batch frame the excision queries use (every 97th
    doc's 80%-token prefix + five novel id-specific tail tokens,
    re-id'd) — shared by the direct and stored variants so both answer
    the same question."""
    toks = F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")
    prefix = F.array_join(
        F.slice(toks, F.lit(1), F.ceil(F.size(toks) * 0.8).cast("int")), " "
    )
    sid = F.col("doc_id").cast("string")
    return docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            prefix,
            F.concat(F.lit("xa"), sid),
            F.concat(F.lit("xb"), sid),
            F.concat(F.lit("xc"), sid),
            F.concat(F.lit("xd"), sid),
            F.concat(F.lit("xe"), sid),
        ).alias("text"),
    )


@prepared()
def q_incremental_excise_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental span excision against the SAVED gram index
    (sources/ann_store.py save_gram_index): the standing corpus's
    qualifying gram keys persist ONCE per scale factor as a table
    bucketed on the join key, and each arriving batch's excision joins
    it with NO corpus-side exchange or recompute (asserted in
    tests/test_sources.py).  Same output and oracle as
    incremental_excise; this is the amortized daily-ingest path."""
    import os

    from kats_spark.sources.ann_store import (
        incremental_excise_stored,
        save_gram_index,
    )

    sf_name = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    table = f"gram_index_{sf_name}"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if not spark.catalog.tableExists(table):
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "spark-warehouse",
            table,
        )
        # register-or-rebuild (r14) — see q_incremental_neardup_stored
        _ensure_stored_index(
            spark,
            table,
            path,
            fingerprint_suffix="|gram:span5,min1,portable",
            bucket_cols=["gram_key"],
            sf_dir=sf_dir,
            build=lambda: save_gram_index(
                docs, table, path, span_n=5, min_docs=1, portable=True
            ),
        )
    out = incremental_excise_stored(
        spark, table, _excise_batch(docs), span_n=5, portable=True
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "n_removed",
        "clean_text",
    ).orderBy("doc_id")


_Q_INCREMENTAL_EXCISE_SQL = """
WITH batch AS (
  SELECT doc_id + 1000000 AS doc_id,
    concat_ws(' ',
      array_to_string(t0[1:ceil(len(t0) * 0.8)::BIGINT], ' '),
      'xa' || doc_id::VARCHAR, 'xb' || doc_id::VARCHAR,
      'xc' || doc_id::VARCHAR, 'xd' || doc_id::VARCHAR,
      'xe' || doc_id::VARCHAR) AS text
  FROM (
    SELECT doc_id,
      string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t0
    FROM documents WHERE doc_id % 97 = 0)
),
ctoks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
ckeys AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_distinct(list_transform(
        range(1, greatest(len(t) - 4, 1) + 1),
        i -> array_to_string(t[i:i+4], ' ')))) AS g
    FROM ctoks)
),
btoks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+'),
                x -> x <> '') AS t
  FROM batch
),
btok AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i, unnest(t) AS tok,
    len(t) AS n
  FROM btoks
),
bst AS (
  SELECT doc_id, i, array_to_string(t[i:i+4], ' ') AS g
  FROM btok WHERE i <= n - 4
),
ds AS (SELECT doc_id, i, 1 AS d FROM bst JOIN ckeys USING (g)),
cov AS (
  SELECT btok.doc_id, btok.i, btok.tok,
    max(coalesce(ds.d, 0)) OVER (PARTITION BY btok.doc_id ORDER BY btok.i
      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS c
  FROM btok LEFT JOIN ds ON btok.doc_id = ds.doc_id AND btok.i = ds.i
),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(c)::BIGINT AS n_removed,
    string_agg(CASE WHEN c = 0 THEN tok END, ' ' ORDER BY i) AS clean_text
  FROM cov GROUP BY doc_id
)
SELECT doc_id::BIGINT AS doc_id, n_tokens, n_removed,
  coalesce(clean_text, '') AS clean_text
FROM per ORDER BY doc_id
"""


def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-corpus build as ONE lazy plan — the flagship
    composition: score/filter -> exact dedup -> near-dup removal
    (corpus_prep's stages) -> global 60k-token budget sample in
    seeded-md5 order -> concat-and-chunk packing stats at seq_len=512.
    One audit row out: stage survivor counts, sampled token total,
    sequence count, boundary-spanning docs.  Every stage is the already
    -oracled operator, so the whole chain value-hash replays in
    DuckDB."""
    _, _, _, final = _corpus_stages(spark, sf_dir)
    # ONE count job serves both the shard gate below AND the n_docs audit
    # column (it used to be a driver count PLUS a second documents scan
    # inside the plan; the value is identical — the oracle's subquery
    # count — and still computed fresh on every call)
    n_docs_val = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_docs = spark.range(1).select(
        F.lit(n_docs_val).cast("bigint").alias("n_docs")
    )
    rk = F.md5(F.concat_ws(":", F.lit("7"), F.col("doc_id").cast("string")))
    # Exact budget fill WITHOUT a single-task global window (VERDICT r07
    # item #2): the shared salted-exact decomposition of
    # sampling.salted_cumsum — exclusive_prefix(per-shard totals) +
    # within-shard cumsum keyed on the md5 rank's own hex prefix —
    # replaces Window.orderBy(rk), which funneled every post-dedup
    # survivor through ONE reducer.  Count-gated like the sampler:
    # corpora under 1M raw docs (an upper bound on survivors, and a
    # metadata-only parquet count) take the naive single window — at
    # bench scale the extra aggregate + reattach join cost more than
    # the parallelism buys — and larger ones the 256-shard plan.  Both
    # produce bit-identical output (asserted in tests), so the oracle
    # is unchanged.
    shards = 1 if n_docs_val < 1_000_000 else 256
    cum = salted_cumsum(
        final.select("doc_id", "n_tokens").withColumn("__rk", rk),
        salt_shards=shards,
    )
    # ONE aggregate over ONE execution of the cumsum frame: the cumsum
    # output has exactly one row per survivor, so n_survivors is its row
    # count and the budget-fill stats are conditional aggregates on the
    # in-budget predicate — the previous separate final.agg(count) forced
    # a second full run of the anti-join chain (guide §1.2: don't compute
    # things twice).  Values are identical by construction (same row set,
    # same per-row expressions); asserted against the unchanged oracle.
    start = F.col("cum_tokens") - F.col("n_tokens")
    in_budget = start < 60_000
    cum_in = F.when(in_budget, F.col("cum_tokens"))
    stats = cum.agg(
        F.count("*").cast("bigint").alias("n_survivors"),
        F.sum(in_budget.cast("int")).cast("bigint").alias("n_sampled"),
        F.max(cum_in).cast("bigint").alias("sampled_tokens"),
        (F.floor((F.max(cum_in) - 1) / 512) + 1)
        .cast("bigint")
        .alias("n_sequences"),
        F.sum(
            F.when(
                in_budget,
                (
                    F.floor((F.col("cum_tokens") - 1) / 512)
                    > F.floor(start / 512)
                ).cast("int"),
            )
        )
        .cast("bigint")
        .alias("n_boundary_docs"),
    )
    return n_docs.crossJoin(F.broadcast(stats))


_Q_CORPUS_BUILD_SQL = f"""
WITH surv AS ({_Q_CORPUS_PREP_SQL}),
rk AS (
  SELECT doc_id, n_tokens,
    md5(concat_ws(':', '7', doc_id::VARCHAR)) AS rk
  FROM surv
),
c AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY rk, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
  FROM rk
),
sampled AS (SELECT * FROM c WHERE cum_tokens - n_tokens < 60000)
SELECT
  (SELECT count(*)::BIGINT FROM documents) AS n_docs,
  (SELECT count(*)::BIGINT FROM surv) AS n_survivors,
  count(*)::BIGINT AS n_sampled,
  max(cum_tokens)::BIGINT AS sampled_tokens,
  ((max(cum_tokens) - 1) // 512 + 1)::BIGINT AS n_sequences,
  sum(CASE WHEN (cum_tokens - 1) // 512 > (cum_tokens - n_tokens) // 512
      THEN 1 ELSE 0 END)::BIGINT AS n_boundary_docs
FROM sampled
"""


def q_embedding_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health check (similarity.py embedding_diag):
    norm distribution + the anisotropy estimate ||mean||^2 / E||x||^2
    (expected random-pair cosine; ->1 = collapsed space, breaks
    cosine-threshold dedup).  One map-side-combined aggregate, vectors
    never shuffle, exact oracle."""
    from kats_spark.operators.similarity import embedding_diag

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_diag(emb)


def _embedding_diag_sql(dim: int = 64) -> str:
    mu_sq = " + ".join(
        f"pow(avg(embedding[{i + 1}]::DOUBLE), 2)" for i in range(dim)
    )
    return f"""
WITH per AS (
  SELECT embedding,
    list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) AS sq
  FROM embeddings
)
SELECT count(*)::BIGINT AS n, {dim}::INT AS dim,
  round(avg(sqrt(sq)) + 1e-9, 6) AS norm_mean,
  round(min(sqrt(sq)) + 1e-9, 6) AS norm_min,
  round(max(sqrt(sq)) + 1e-9, 6) AS norm_max,
  round(({mu_sq}) / avg(sq) + 1e-9, 6) AS anisotropy
FROM per
"""


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral diagnostics (similarity.py embedding_pca): top-8
    covariance eigenvalues + participation ratio from Arrow-batched
    gram partials.  FULL oracle since r13 (VERDICT r12 item #4): the
    operator's eigensolve moved to the deterministic Householder-
    tridiag + Sturm-bisection pair and the totals to trace identities,
    all replayed step-for-step in plans/eig_oracle.py."""
    from kats_spark.operators.similarity import embedding_pca

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_pca(emb, top_k=8)
    return out.select(
        "component",
        F.round(F.col("eigenvalue") + F.lit(1e-9), 6).alias("eigenvalue"),
        F.round(F.col("cum_var_explained") + F.lit(1e-9), 6).alias("cum_var_explained"),
        F.round(F.col("participation_ratio") + F.lit(1e-9), 6).alias("participation_ratio"),
    )


def q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document embeddings (text.py hash_embed): signed
    token hashing into 64 dims + L2 normalize — the cheap deterministic
    vectorizer that feeds the ANN/semantic-dedup family from raw text.
    Portable polynomial hash -> the full vector replays in DuckDB;
    output exploded to (doc, dim, value) scalars for the hash gate."""
    from kats_spark.operators.text import hash_embed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hash_embed(docs, dim=64)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        F.posexplode("embedding").alias("dim_ix", "val"),
    ).select(
        "doc_id", "n_tokens",
        F.col("dim_ix").cast("int").alias("dim_ix"), "val"
    ).orderBy("doc_id", "dim_ix")


def _hash_embed_sql(dim: int = 64) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
    string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')) AS t
  FROM documents
),
hs AS (SELECT doc_id, {_POLY.format(col='t')} AS h FROM tok),
acc AS (
  SELECT doc_id, (h % {dim})::INT AS slot,
    sum(CASE WHEN (h & 256) > 0 THEN 1.0 ELSE -1.0 END) AS w,
    count(*) AS c
  FROM hs GROUP BY doc_id, slot
),
nt AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens FROM acc GROUP BY doc_id),
dims AS (
  SELECT d.doc_id, i.i::INT AS dim_ix FROM
    (SELECT DISTINCT doc_id FROM acc) d, range(0, {dim}) i(i)
),
dense AS (
  SELECT dims.doc_id, dims.dim_ix, coalesce(acc.w, 0.0) AS w
  FROM dims LEFT JOIN acc ON acc.doc_id = dims.doc_id AND acc.slot = dims.dim_ix
),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM dense GROUP BY doc_id)
SELECT dense.doc_id, nt.n_tokens, dense.dim_ix,
  round(dense.w / greatest(nrm.nm, 1e-12) + 1e-9, 6) AS val
FROM dense JOIN nrm USING (doc_id) JOIN nt USING (doc_id)
ORDER BY doc_id, dim_ix
"""


def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus VOCABULARY drift between two snapshots (even vs odd
    doc_id — deterministic twins of one corpus): eps-smoothed unigram
    distributions over the union vocabulary, tokens ranked by PSI
    contribution — the token-level companion of psi_drift/ks_drift a
    corpus-refresh review reads.  Exact oracle: both engines divide the
    same exact integer counts, so even the pre-rounding sort keys are
    bitwise identical."""
    from kats_spark.operators.text import vocab_drift

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = vocab_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        top_k=20,
    )
    return out


_Q_VOCAB_DRIFT_SQL = r"""
WITH tokdocs AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), '\s+'),
                x -> x <> '') AS t
  FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS token FROM tokdocs),
ca AS (SELECT token, count(*)::BIGINT AS c_a FROM tok WHERE doc_id % 2 = 0 GROUP BY 1),
cb AS (SELECT token, count(*)::BIGINT AS c_b FROM tok WHERE doc_id % 2 = 1 GROUP BY 1),
j AS (
  SELECT coalesce(ca.token, cb.token) AS token,
         coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token
),
tot AS (SELECT sum(c_a)::DOUBLE AS na, sum(c_b)::DOUBLE AS nb FROM j),
scored AS (
  SELECT token,
    round(1e-9 + (c_a / t.na + 1e-6), 8) AS p_a,
    round(1e-9 + (c_b / t.nb + 1e-6), 8) AS p_b,
    round(1e-9 + ((c_a / t.na + 1e-6) - (c_b / t.nb + 1e-6))
                 * ln((c_a / t.na + 1e-6) / (c_b / t.nb + 1e-6)), 8) AS psi_contrib
  FROM j, tot t
),
rk AS (
  SELECT *, row_number() OVER (ORDER BY psi_contrib DESC, token ASC) AS rank
  FROM scored
)
SELECT token, p_a, p_b, psi_contrib, rank::INT AS rank FROM rk WHERE rank <= 20
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between the Jan 1-15
    reference window and Jan 16+ (operators/dist_distance.py psi_drift):
    fixed-width bins over the reference min/max, out-of-range mass
    clamped to edge bins — the standard deploy-time drift monitor,
    exact oracle."""
    from kats_spark.operators.dist_distance import psi_drift
    from kats_spark.plans.queries import load_events

    ev = load_events(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    out = psi_drift(ev, "2024-01-16 00:00:00", time_col="ts")
    return out.orderBy("series_id")


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift per event_type between
    the Jan 1-15 reference window and Jan 16+ (dist_distance.ks_drift):
    no binning — per-distinct-value counts + one cumulative window per
    key give both ECDFs exactly; emits D and the finite-sample scaled
    lambda.  The nonparametric companion to psi_drift; exact oracle."""
    from kats_spark.operators.dist_distance import ks_drift
    from kats_spark.plans.queries import load_events

    ev = load_events(spark, sf_dir).select(
        F.col("event_type").alias("series_id"), "ts", "value"
    )
    out = ks_drift(ev, "2024-01-16 00:00:00", time_col="ts")
    return out.orderBy("series_id")


_Q_KS_DRIFT_SQL = """
WITH ev AS (SELECT event_type AS series_id, ts, value FROM events),
c1 AS (SELECT series_id, value, count(*) AS n FROM ev
       WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1, 2),
c2 AS (SELECT series_id, value, count(*) AS n FROM ev
       WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1, 2),
aligned AS (
  SELECT coalesce(c1.series_id, c2.series_id) AS series_id,
    coalesce(c1.value, c2.value) AS value,
    coalesce(c1.n, 0) AS n1, coalesce(c2.n, 0) AS n2
  FROM c1 FULL OUTER JOIN c2
    ON c1.series_id = c2.series_id AND c1.value = c2.value
),
cum AS (
  SELECT series_id,
    sum(n1) OVER (PARTITION BY series_id ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
      / sum(n1) OVER (PARTITION BY series_id) AS f1,
    sum(n2) OVER (PARTITION BY series_id ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
      / sum(n2) OVER (PARTITION BY series_id) AS f2,
    sum(n1) OVER (PARTITION BY series_id) AS tn1,
    sum(n2) OVER (PARTITION BY series_id) AS tn2
  FROM aligned
)
SELECT series_id,
  max(tn1)::BIGINT AS n_before,
  max(tn2)::BIGINT AS n_after,
  round(max(abs(f1 - f2)) + 1e-9, 6) AS ks_stat,
  round((max(sqrt(tn1 * tn2 / (tn1 + tn2))) + 0.12
         + 0.11 / max(sqrt(tn1 * tn2 / (tn1 + tn2))))
        * max(abs(f1 - f2)) + 1e-9, 6) AS ks_lambda
FROM cum GROUP BY series_id ORDER BY series_id
"""


_Q_PSI_DRIFT_SQL = """
WITH ev AS (SELECT event_type AS series_id, ts, value FROM events),
before AS (SELECT * FROM ev WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
after AS (SELECT * FROM ev WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
ref AS (SELECT series_id, min(value) AS lo, max(value) AS hi FROM before GROUP BY series_id),
bb AS (
  SELECT b.series_id,
    least(9, greatest(0, floor((b.value - r.lo) / ((r.hi - r.lo) / 10 + 1e-300))))::INT AS bin,
    count(*) AS nb
  FROM before b JOIN ref r USING (series_id) GROUP BY 1, 2
),
ba AS (
  SELECT a.series_id,
    least(9, greatest(0, floor((a.value - r.lo) / ((r.hi - r.lo) / 10 + 1e-300))))::INT AS bin,
    count(*) AS na
  FROM after a JOIN ref r USING (series_id) GROUP BY 1, 2
),
tot AS (
  SELECT tb.series_id, tb.tb, ta.ta FROM
    (SELECT series_id, sum(nb) AS tb FROM bb GROUP BY 1) tb
    JOIN (SELECT series_id, sum(na) AS ta FROM ba GROUP BY 1) ta USING (series_id)
),
j AS (
  SELECT coalesce(bb.series_id, ba.series_id) AS series_id,
         coalesce(nb, 0) AS nb, coalesce(na, 0) AS na
  FROM bb FULL OUTER JOIN ba ON bb.series_id = ba.series_id AND bb.bin = ba.bin
),
terms AS (
  SELECT j.series_id, t.tb, t.ta,
    (nb / t.tb::DOUBLE + 1e-4) AS p, (na / t.ta::DOUBLE + 1e-4) AS q
  FROM j JOIN tot t USING (series_id)
)
SELECT series_id, max(tb)::BIGINT AS n_before, max(ta)::BIGINT AS n_after,
  round(sum((p - q) * ln(p / q)) + 1e-9, 6) AS psi
FROM terms GROUP BY series_id ORDER BY series_id
"""


def q_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail quality terciles per language
    (sampling.py quality_buckets over unigram_logppl): exact
    histogram-quantile cut bins — integer-arithmetic thresholds over a
    tiny (lang, bin) aggregate, never a per-stratum global sort.
    Exact oracle."""
    from kats_spark.operators.sampling import quality_buckets, unigram_logppl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lp = unigram_logppl(docs).join(docs.select("doc_id", "lang"), "doc_id")
    out = quality_buckets(lp, score_col="logppl", by=["lang"], bins=1000)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        F.col("score_bin").cast("bigint").alias("score_bin"),
        "bucket",
    ).orderBy("doc_id")


_Q_QUALITY_BUCKETS_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
freq AS (SELECT tk, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c)::DOUBLE AS total, count(*)::DOUBLE AS vocab FROM freq),
lp AS (
  SELECT doc_id, avg(-ln((c + 1.0) / (total + vocab))) AS logppl
  FROM tok JOIN freq USING (tk) CROSS JOIN tot GROUP BY 1
),
sb AS (
  SELECT d.doc_id, d.lang, floor(lp.logppl * 1000.0)::BIGINT AS score_bin
  FROM lp JOIN documents d USING (doc_id)
),
hist AS (SELECT lang, score_bin, count(*) AS c FROM sb GROUP BY 1, 2),
cum AS (
  SELECT lang, score_bin,
    sum(c) OVER (PARTITION BY lang ORDER BY score_bin) AS cum,
    sum(c) OVER (PARTITION BY lang) AS n
  FROM hist
),
cuts AS (
  SELECT lang,
    min(CASE WHEN cum * 3 >= n THEN score_bin END) AS b1,
    min(CASE WHEN cum * 3 >= 2 * n THEN score_bin END) AS b2
  FROM cum GROUP BY 1
)
SELECT sb.doc_id::BIGINT AS doc_id, sb.lang, sb.score_bin,
  CASE WHEN score_bin <= b1 THEN 'head'
       WHEN score_bin <= b2 THEN 'middle' ELSE 'tail' END AS bucket
FROM sb JOIN cuts USING (lang)
ORDER BY doc_id
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-n-gram importance weights (dsir.py dsir_weights,
    Xie et al. 2023): target = the zh subcorpus, raw = everything;
    every raw document scored by the target/raw log-likelihood ratio
    of its hashed uni+bigram bag.  Exact oracle (the md5-lattice
    feature hashing replays in DuckDB)."""
    from kats_spark.operators.dsir import dsir_weights

    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .repartition(par)  # one sub-128MB bench split; see q_source_overlap
    )
    # target ⊆ raw: one fused tokenize pass (dsir.dsir_weights r14)
    out = dsir_weights(
        docs, None, num_buckets=1024, target_from_raw=F.col("lang") == "zh"
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_feats").cast("bigint").alias("n_feats"),
        _rnd("log_weight", 6).alias("log_weight"),
    )


_DSIR_FEATS_CTE = f"""
toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
bi AS (
  SELECT doc_id, t,
    CASE WHEN len(t) >= 2
         THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
         ELSE []::VARCHAR[] END AS b
  FROM toks
),
feats AS (SELECT doc_id, unnest(list_concat(t, b)) AS f FROM bi),
fb AS (
  SELECT doc_id,
    (('0x' || substr(md5(f), 1, 12))::UBIGINT % 1024)::BIGINT AS bk
  FROM feats
),
cr AS (SELECT bk, count(*) AS cr FROM fb GROUP BY 1),
ct AS (SELECT bk, count(*) AS ct FROM fb JOIN documents USING (doc_id)
       WHERE lang = 'zh' GROUP BY 1),
j AS (
  SELECT coalesce(cr.bk, ct.bk) AS bk,
         coalesce(cr, 0) AS cr, coalesce(ct, 0) AS ct
  FROM cr FULL OUTER JOIN ct ON cr.bk = ct.bk
),
tot AS (SELECT sum(cr)::DOUBLE AS tr, sum(ct)::DOUBLE AS tt FROM j),
lr AS (
  SELECT bk, ln((ct + 1.0) / (tt + 1024.0)) - ln((cr + 1.0) / (tr + 1024.0)) AS lr
  FROM j CROSS JOIN tot
),
w AS (
  SELECT doc_id, count(*) AS n_feats, sum(lr) AS lw
  FROM fb JOIN lr USING (bk) GROUP BY 1
)"""

def _mixture_fit_sql(num_buckets: int = 1024, iters: int = 500) -> str:
    """q_mixture_fit oracle (r12 promotion): the whole mixture-design
    solve replayed — hashed-n-gram bucket counts (the DSIR md5-lattice
    feature CTE), per-source distribution normalization, the Gram matrix
    and target projection as ascending-bucket sums, the 50-round power
    iteration for the Lipschitz step, and all ``iters`` projected-
    gradient rounds with Duchi et al. 2008's sort-form simplex
    projection inlined per step (sort desc, per-k prefix sums, last k
    with u_k * k > css_k, clamp).  The map is non-expansive at step 1/L,
    so the ~1e-13 BLAS-vs-list_sum input drift stays bounded through
    all rounds — inside the 6dp lattice."""
    B = num_buckets
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
bi AS (
  SELECT doc_id, t,
    CASE WHEN len(t) >= 2
         THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
         ELSE []::VARCHAR[] END AS b
  FROM toks
),
feats AS (SELECT doc_id, unnest(list_concat(t, b)) AS f FROM bi),
fb AS (
  SELECT doc_id,
    (('0x' || substr(md5(f), 1, 12))::UBIGINT % {B})::BIGINT AS bk
  FROM feats
),
srcrows AS (
  SELECT d.source AS s, fb.bk, count(*)::DOUBLE AS c
  FROM fb JOIN documents d USING (doc_id) GROUP BY 1, 2
),
psrc AS (
  SELECT s, map(list(bk ORDER BY bk), list(c ORDER BY bk)) AS m,
         greatest(sum(c), 1.0) AS tot
  FROM srcrows GROUP BY s
),
pdense AS (
  SELECT s,
    list_transform(range(0, {B}), bb -> coalesce(m[bb][1], 0.0) / tot) AS p
  FROM psrc
),
pmat AS (
  SELECT list(s ORDER BY s) AS sl, count(*)::BIGINT AS S,
         list(p ORDER BY s) AS P
  FROM pdense
),
tgt AS (
  SELECT map(list(bk ORDER BY bk), list(c ORDER BY bk)) AS m,
         greatest(sum(c), 1.0) AS tot
  FROM (
    SELECT fb.bk, count(*)::DOUBLE AS c
    FROM fb JOIN documents d USING (doc_id) WHERE d.lang = 'zh' GROUP BY 1
  )
),
qvec AS (
  SELECT list_transform(range(0, {B}), bb -> coalesce(m[bb][1], 0.0) / tot) AS q
  FROM tgt
),
gram AS (
  SELECT sl, S,
    flatten(list_transform(P, pi ->
      list_transform(P, pj ->
        list_sum(list_transform(range(1, {B} + 1), bb -> pi[bb] * pj[bb]))))) AS G,
    list_transform(P, pi ->
      list_sum(list_transform(range(1, {B} + 1), bb -> pi[bb] * q[bb]))) AS bv
  FROM pmat CROSS JOIN qvec
),
pow_it AS (
  SELECT sl, S, G, bv, 0 AS it,
    list_transform(range(1, S + 1), i -> 1.0 / sqrt(S)) AS v
  FROM gram
  UNION ALL
  SELECT sl, S, G, bv, it + 1,
    list_transform(range(1, S + 1), i ->
      (list_sum(list_transform(range(1, S + 1), j -> G[(i-1)*S + j] * v[j])))
      / sqrt(list_sum(list_transform(range(1, S + 1), i2 ->
          pow(list_sum(list_transform(range(1, S + 1), j2 -> G[(i2-1)*S + j2] * v[j2])), 2)))))
  FROM pow_it WHERE it < 50
),
lip AS (
  SELECT sl, S, G, bv,
    CASE WHEN lraw = 0.0 THEN 1.0 ELSE lraw END AS L
  FROM (
    SELECT sl, S, G, bv,
      list_sum(list_transform(range(1, S + 1), i ->
        v[i] * list_sum(list_transform(range(1, S + 1), j -> G[(i-1)*S + j] * v[j])))) AS lraw
    FROM pow_it WHERE it = 50
  )
),
pg AS (
  SELECT sl, S, G, bv, L, 0 AS it,
    list_transform(range(1, S + 1), i -> 1.0 / S) AS w
  FROM lip
  UNION ALL
  SELECT sl, S, G, bv, L, it + 1,
    list_transform(vv, x -> greatest(x - theta, 0.0))
  FROM (
    SELECT *, (list_sum(uu[1:rho]) - 1.0) / rho AS theta
    FROM (
      SELECT *, list_max(list_filter(range(1, S + 1), k ->
        uu[k] * k > list_sum(uu[1:k]) - 1.0)) AS rho
      FROM (
        SELECT *, list_reverse(list_sort(vv)) AS uu
        FROM (
          SELECT sl, S, G, bv, L, it,
            list_transform(range(1, S + 1), i ->
              w[i] - (list_sum(list_transform(range(1, S + 1), j ->
                G[(i-1)*S + j] * w[j])) - bv[i]) / L) AS vv
          FROM pg WHERE it < {iters}
        ) q1
      ) q2
    ) q3
  ) q4
)
SELECT sl[u.i] AS source, round(1e-9 + w[u.i], 6) AS weight
FROM pg, (SELECT unnest(range(1, 64)) AS i) u
WHERE it = {iters} AND u.i <= S
ORDER BY source
"""


_Q_DSIR_WEIGHTS_SQL = f"""
WITH {_DSIR_FEATS_CTE}
SELECT doc_id::BIGINT AS doc_id, n_feats::BIGINT AS n_feats,
  round(1e-9 + lw, 6) AS log_weight
FROM w
"""


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel top-64 resample (dsir.py dsir_resample): selection
    key = log_weight + Gumbel from the seeded md5 lattice, top-n via
    TakeOrderedAndProject, payload reattached by broadcast join.  The
    noise is deterministic, so the selected subcorpus — not just its
    size — value-hashes against the DuckDB replay."""
    from kats_spark.operators.dsir import dsir_resample

    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .repartition(par)  # one sub-128MB bench split; see q_source_overlap
    )
    # target ⊆ raw: one fused tokenize pass (dsir.dsir_weights r14)
    out = dsir_resample(
        docs, None, n=64, seed=7, num_buckets=1024,
        target_from_raw=F.col("lang") == "zh",
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        F.col("n_feats").cast("bigint").alias("n_feats"),
        _rnd("log_weight", 6).alias("log_weight"),
    ).orderBy("doc_id")


_Q_DSIR_SAMPLE_SQL = f"""
WITH {_DSIR_FEATS_CTE},
k AS (
  SELECT doc_id, n_feats, lw,
    round(1e-9 + lw - ln(-ln(
      ((('0x' || substr(md5(concat_ws(':', 'dsir', '7', doc_id::VARCHAR)), 1, 12))::UBIGINT)::DOUBLE + 0.5)
      / 281474976710656.0)), 6) AS key
  FROM w
)
SELECT doc_id, lang, n_feats, log_weight FROM (
  SELECT k.doc_id::BIGINT AS doc_id, d.lang AS lang,
    n_feats::BIGINT AS n_feats, round(1e-9 + lw, 6) AS log_weight, key
  FROM k JOIN documents d USING (doc_id)
  ORDER BY key DESC, k.doc_id LIMIT 64
) ORDER BY doc_id
"""


def q_dsir_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR scoring of an arriving batch against the SAVED dense
    log-ratio table (ann_store.save_dsir_ratio fit once per scale
    factor on corpus=documents / target=zh): one feature pass over the
    batch + a broadcast join — the reference corpora are never
    re-touched, completing the stored-model family (band / gram /
    chunk / ivf indexes + ratio tables).  Exact oracle (the dense
    table's unseen buckets are the pure-smoothing ratio, replayed as a
    coalesce default in DuckDB).  The reuse gate keys on a CONTENT
    fingerprint of the source parquet, not path existence — a
    regenerated dataset refreshes the stored table (ADVICE r09)."""
    import os

    from kats_spark.sources.ann_store import (
        dsir_weights_stored,
        mark_stored,
        save_dsir_ratio,
        source_fingerprint,
        stored_is_current,
    )

    sf_name = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "spark-warehouse",
        f"dsir_ratio_{sf_name}",
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = source_fingerprint(f"{sf_dir}/documents.parquet")
    if not stored_is_current(path, fp):
        save_dsir_ratio(
            docs, docs.filter(F.col("lang") == "zh"), path, num_buckets=1024
        )
        mark_stored(path, fp)
    out = dsir_weights_stored(
        spark, path, _incremental_batch(docs), num_buckets=1024
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_feats").cast("bigint").alias("n_feats"),
        _rnd("log_weight", 6).alias("log_weight"),
    ).orderBy("doc_id")


_Q_DSIR_STORED_SQL = f"""
WITH {_DSIR_FEATS_CTE},
bt AS (
  SELECT doc_id + 1000000 AS doc_id,
    list_filter(
      list_transform(t0[1:ceil(len(t0) * 0.8)::INT], x -> lower(x)),
      x -> x <> '') AS t
  FROM (
    SELECT doc_id,
      string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t0
    FROM documents
  ) WHERE doc_id % 97 = 0
),
bbi AS (
  SELECT doc_id, t,
    CASE WHEN len(t) >= 2
         THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
         ELSE []::VARCHAR[] END AS b
  FROM bt
),
bfeats AS (SELECT doc_id, unnest(list_concat(t, b)) AS f FROM bbi),
bfb AS (
  SELECT doc_id,
    (('0x' || substr(md5(f), 1, 12))::UBIGINT % 1024)::BIGINT AS bk
  FROM bfeats
)
SELECT bfb.doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_feats,
  round(1e-9 + sum(coalesce(lr.lr,
    ln(1.0 / (tot.tt + 1024.0)) - ln(1.0 / (tot.tr + 1024.0)))), 6) AS log_weight
FROM bfb LEFT JOIN lr USING (bk) CROSS JOIN tot
GROUP BY 1 ORDER BY doc_id
"""


def q_unimax_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-balanced allocation (sampling.py unimax_budgets,
    Chung et al. 2023): exact waterfilling of a 15k-token budget across
    languages under a 2-epoch cap — low-resource languages saturate,
    the leftover spreads uniformly.  One map-side token aggregate +
    window arithmetic on the |langs|-row frame; exact oracle (identical
    cumulative order both engines)."""
    from kats_spark.operators.sampling import unimax_budgets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = unimax_budgets(docs, budget_tokens=15000.0, epochs_cap=2.0)
    return out.select(
        "lang",
        _rnd("n_tokens", 6).alias("n_tokens"),
        _rnd("capacity", 6).alias("capacity"),
        _rnd("budget", 6).alias("budget"),
    ).orderBy("lang")


_Q_UNIMAX_SQL = """
WITH toks AS (
  SELECT lang,
    list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
cap AS (
  SELECT lang, sum(len(t))::DOUBLE AS n_tokens,
         sum(len(t))::DOUBLE * 2.0 AS capacity
  FROM toks GROUP BY 1
),
st AS (
  SELECT lang, n_tokens, capacity,
    coalesce(sum(capacity) OVER (ORDER BY capacity, lang
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cum_prev,
    row_number() OVER (ORDER BY capacity, lang) AS i,
    count(*) OVER () AS n
  FROM cap
),
fl AS (
  SELECT *, CASE WHEN capacity * (n - i + 1) + cum_prev <= 15000.0
                 THEN 1 ELSE 0 END AS sat
  FROM st
),
ag AS (
  SELECT *, sum(sat) OVER () AS k, sum(capacity * sat) OVER () AS cum_k
  FROM fl
)
SELECT lang,
  round(1e-9 + n_tokens, 6) AS n_tokens,
  round(1e-9 + capacity, 6) AS capacity,
  round(1e-9 + CASE WHEN sat = 1 THEN capacity
    ELSE least((15000.0 - cum_k) / (n - k), capacity) END, 6) AS budget
FROM ag ORDER BY lang
"""


def q_mixture_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-design weights (dsir.py mixture_fit): non-negative
    per-source weights summing to 1 whose blended hashed-n-gram
    distribution best matches the zh target domain — simplex-projected
    least squares on the (|sources| x buckets) count matrix (ONE
    map-side aggregate; the driver solve is bounded by construction).
    FULL oracle since r12 (_mixture_fit_sql): the md5-lattice bucket
    counts, Gram/target sums, 50-round power iteration, and all 500
    projected-gradient rounds with the Duchi sort-form simplex
    projection replay in DuckDB; exact-recovery contracts stay in
    tests/test_dsir.py."""
    from kats_spark.operators.dsir import mixture_fit

    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "source", "text")
        .repartition(par)  # one sub-128MB bench split; see q_source_overlap
    )
    # target ⊆ raw: one tokenize pass + ONE aggregate/collect
    # (dsir.mixture_fit r14)
    w = mixture_fit(
        docs, None, num_buckets=1024, target_from_raw=F.col("lang") == "zh"
    )
    out = spark.createDataFrame(w, ["source", "weight"])
    return out.select(
        "source", _rnd("weight", 6).alias("weight")
    ).orderBy("source")


@prepared()
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap estimation (dsir.py source_overlap):
    per-source minhash signatures over word 3-gram shingles, estimated
    Jaccard = signature agreement fraction — the mixture-design
    diagnostic run before any dedup.  One partial-aggregating pass to
    |sources| rows; exact oracle (portable affine hash family)."""
    from kats_spark.operators.dsir import source_overlap

    # narrow (source, text) projection repartitioned to the core count:
    # the bench parquet is one sub-128MB split, and the 64 affine mins
    # per shingle would otherwise run on ONE task (the multimodal-kernel
    # precedent); a real corpus has plenty of input splits already
    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .repartition(par)
    )
    out = source_overlap(docs, num_hashes=64, shingle_n=3, seed=1)
    return out.select(
        "source_a", "source_b", _rnd("est_jaccard", 6).alias("est_jaccard")
    ).orderBy("source_a", "source_b")


def _source_overlap_sql(num_hashes: int = 64, shingle_n: int = 3, seed: int = 1) -> str:
    from kats_spark.operators.dedup import _hash_params

    mins = ",\n    ".join(
        f"min((h * {a} + {b}) % 2147483647) AS m{k}"
        for k, (a, b) in enumerate(_hash_params(num_hashes, seed))
    )
    agree = " + ".join(
        f"CASE WHEN a.m{k} = b.m{k} THEN 1 ELSE 0 END" for k in range(num_hashes)
    )
    return f"""
WITH {_TOKS_CTE},
gr AS (
  SELECT doc_id,
    unnest(list_transform(range(1, greatest(len(t) - {shingle_n - 1}, 1) + 1),
      i -> array_to_string(t[i:i+{shingle_n - 1}], ' '))) AS g
  FROM toks
),
hs AS (
  SELECT d.source AS src,
    (('0x' || substr(md5(g), 1, 12))::UBIGINT % 2147483647)::BIGINT AS h
  FROM gr JOIN documents d USING (doc_id)
),
sig AS (SELECT src,
    {mins}
  FROM hs GROUP BY src)
SELECT a.src AS source_a, b.src AS source_b,
  round(1e-9 + ({agree}) / {float(num_hashes)}, 6) AS est_jaccard
FROM sig a JOIN sig b ON a.src < b.src
ORDER BY source_a, source_b
"""


QUERIES = {
    "psi_drift": q_psi_drift,
    "vocab_drift": q_vocab_drift,
    "ks_drift": q_ks_drift,
    "embedding_diag": q_embedding_diag,
    "embedding_pca": q_embedding_pca,
    "hash_embed": q_hash_embed,
    "corpus_build": q_corpus_build,
    "dup_spans": q_dup_spans,
    "dup_span_excise": q_dup_span_excise,
    "incremental_excise": q_incremental_excise,
    "incremental_excise_stored": q_incremental_excise_stored,
    "pack_sequences": q_pack_sequences,
    "chunk_docs": q_chunk_docs,
    "tfidf_topk": q_tfidf_topk,
    "split_assign": q_split_assign,
    "epoch_upsample": q_epoch_upsample,
    "incremental_neardup": q_incremental_neardup,
    "incremental_neardup_stored": q_incremental_neardup_stored,
    "incremental_simhash": q_incremental_simhash,
    "incremental_simhash_stored": q_incremental_simhash_stored,
    "source_cap": q_source_cap,
    "exact_dedup": q_exact_dedup,
    "jaccard_pairs": q_jaccard_pairs,
    "minhash_lsh_pairs": q_minhash_lsh,
    "simhash": q_simhash,
    "token_stats": q_token_stats,
    "bpe_token_stats": q_bpe_token_stats,
    "gopher_rules": q_gopher_rules,
    "bpe_train": q_bpe_train,
    "bpe_encode": q_bpe_encode,
    "text_quality": q_text_quality,
    "topk_cosine": q_topk_cosine,
    "allpairs_topk": q_allpairs_topk,
    "lsh_bucket_pairs": q_lsh_buckets,
    "embed_neardup": q_embed_neardup,
    "embed_survivors": q_embed_survivors,
    "simhash_portable": q_simhash_portable,
    "simhash_neardup": q_simhash_neardup,
    "dup_clusters": q_dup_clusters,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
    "snapshot_diff": q_snapshot_diff,
    "zipf_fit": q_zipf_fit,
    "sketch_profile": q_sketch_profile,
    "corpus_profile": q_corpus_profile,
    "corpus_sample": q_corpus_sample,
    "mixture_sample": q_mixture_sample,
    "decontaminate": q_decontaminate,
    "unigram_logppl": q_unigram_logppl,
    "bigram_logppl": q_bigram_logppl,
    "repetition_stats": q_repetition_stats,
    "minhash_portable_pairs": q_minhash_portable,
    "corpus_prep": q_corpus_prep,
    "minhash_quality": q_minhash_quality,
    "corpus_funnel": q_corpus_funnel,
    "winnow_fp": q_winnow_fp,
    "corpus_mixture": q_corpus_mixture,
    "winnow_overlap": q_winnow_overlap,
    "dsir_weights": q_dsir_weights,
    "dsir_sample": q_dsir_sample,
    "source_overlap": q_source_overlap,
    "quality_buckets": q_quality_buckets,
    "cluster_reps": q_cluster_reps,
    "dsir_stored": q_dsir_stored,
    # mixture_fit: rows-only BY DESIGN (simplex-projected gradient is an
    # iterative numpy solve; the data side is one aggregate) — recovery
    # contracts in tests/test_dsir.py
    "mixture_fit": q_mixture_fit,
    "unimax_alloc": q_unimax_alloc,
    "bitext_mine": q_bitext_mine,
    "bitext_mine_ann": q_bitext_mine_ann,
    "bitext_mine_stored": q_bitext_mine_stored,
    "quantize_int8": q_quantize_int8,
    "shard_assign": q_shard_assign,
}

ORACLES = {
    "pack_sequences": _Q_PACK_SEQUENCES_SQL,
    "chunk_docs": _Q_CHUNK_DOCS_SQL,
    "tfidf_topk": _Q_TFIDF_TOPK_SQL,
    "split_assign": _Q_SPLIT_ASSIGN_SQL,
    "epoch_upsample": _Q_EPOCH_UPSAMPLE_SQL,
    "incremental_neardup": _incremental_neardup_sql(),
    # stored band index replays the identical portable band join
    "incremental_neardup_stored": _incremental_neardup_sql(),
    "incremental_simhash": _incremental_simhash_sql(),
    # stored chunk index replays the identical pigeonhole join
    "incremental_simhash_stored": _incremental_simhash_sql(),
    "source_cap": _Q_SOURCE_CAP_SQL,
    "dup_spans": _dup_spans_sql(),
    "dup_span_excise": _dup_span_excise_sql(),
    "incremental_excise": _Q_INCREMENTAL_EXCISE_SQL,
    "incremental_excise_stored": _Q_INCREMENTAL_EXCISE_SQL,
    "corpus_build": _Q_CORPUS_BUILD_SQL,
    "embedding_diag": _embedding_diag_sql(),
    # r13 (VERDICT r12 item #4): Householder + Sturm-bisection replay of
    # the deterministic eigensolve embedding_pca moved to this round
    "embedding_pca": _EIG_ORACLE.embedding_pca_sql(),
    "hash_embed": _hash_embed_sql(),
    "psi_drift": _Q_PSI_DRIFT_SQL,
    "vocab_drift": _Q_VOCAB_DRIFT_SQL,
    "ks_drift": _Q_KS_DRIFT_SQL,
    "unigram_logppl": _Q_UNIGRAM_SQL,
    "bigram_logppl": _Q_BIGRAM_SQL,
    "decontaminate": _Q_DECONTAMINATE_SQL,
    "repetition_stats": _Q_REPETITION_SQL,
    "corpus_sample": _Q_CORPUS_SAMPLE_SQL,
    "mixture_sample": _Q_MIXTURE_SAMPLE_SQL,
    "simhash_neardup": _simhash_neardup_sql(bits=24, bands=2, max_hamming=1),
    "dup_clusters": _dup_clusters_sql(),
    "decontaminate_fuzzy": _decontaminate_fuzzy_sql(),
    "snapshot_diff": _Q_SNAPSHOT_DIFF_SQL,
    "zipf_fit": _Q_ZIPF_SQL,
    "corpus_profile": _Q_CORPUS_PROFILE_SQL,
    "exact_dedup": _Q_EXACT_DEDUP_SQL,
    "jaccard_pairs": _Q_JACCARD_SQL,
    "token_stats": _Q_TOKEN_STATS_SQL,
    "bpe_token_stats": _bpe_token_stats_sql(),
    "bpe_encode": _bpe_encode_sql(_BPE_MERGES),
    # r12: Sennrich training loop unrolled (20 rounds, integer-exact)
    "bpe_train": _bpe_train_sql(20),
    # r12: simplex-projected mixture-design solve replayed end to end
    "mixture_fit": _mixture_fit_sql(1024, 500),
    "gopher_rules": _Q_GOPHER_SQL,
    "text_quality": _Q_TEXT_QUALITY_SQL,
    "topk_cosine": _Q_TOPK_COSINE_SQL,
    "allpairs_topk": _Q_ALLPAIRS_SQL,
    "simhash_portable": _simhash_portable_sql(),
    "minhash_portable_pairs": _minhash_portable_sql(),
    "lsh_bucket_pairs": _lsh_bucket_sql(),
    "embed_neardup": _embed_neardup_sql(),
    "embed_survivors": _embed_survivors_sql(),
    "corpus_prep": _Q_CORPUS_PREP_SQL,
    "minhash_quality": _minhash_quality_sql(),
    "corpus_funnel": _Q_CORPUS_FUNNEL_SQL,
    "winnow_fp": _winnow_fp_sql(),
    "corpus_mixture": _corpus_mixture_sql(),
    "winnow_overlap": _winnow_overlap_sql(),
    "dsir_weights": _Q_DSIR_WEIGHTS_SQL,
    "dsir_sample": _Q_DSIR_SAMPLE_SQL,
    "source_overlap": _source_overlap_sql(),
    "quality_buckets": _Q_QUALITY_BUCKETS_SQL,
    "cluster_reps": _cluster_reps_sql(),
    "dsir_stored": _Q_DSIR_STORED_SQL,
    "unimax_alloc": _Q_UNIMAX_SQL,
    "bitext_mine": _Q_BITEXT_SQL,
    "bitext_mine_ann": _Q_BITEXT_ANN_SQL,
    "bitext_mine_stored": _Q_BITEXT_ANN_SQL,
    "quantize_int8": _Q_QUANTIZE_SQL,
    "shard_assign": _Q_SHARD_ASSIGN_SQL,
    # minhash_lsh_pairs / simhash: rows-only by design (Spark xxhash64 has
    # no SQL equivalent; the *_portable variants above cover the same
    # algorithms with an exact oracle)
}
