"""Cross-engine fuzz: the oracle story rests on Spark (Java regex,
UTF-8 strings) and DuckDB (RE2) agreeing on the text kernels.  These
tests push batches of adversarial strings through BOTH engines and
compare wholesale — the regex-dialect edge cases (escapes, classes,
quantifiers, unicode) are exactly where a hash-match would silently
diverge on real data."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def _adversarial_strings(n=200, seed=13):
    rng = np.random.default_rng(seed)
    alphabet = (
        list("abcdefghijklmnopqrstuvwxyz0123456789")
        + list(" \t\n.,;:!?+-_@#$%&*()[]{}<>/\\|'\"`~^=")
        + ["  ", "   ", "\n\n", "\t "]
    )
    fixed = [
        "",
        " ",
        "\t\n ",
        "a",
        "  leading and trailing  ",
        "tab\tseparated\twords",
        "new\nline\nbreaks",
        "dots...and,,,commas",
        "under_score-dash+plus",
        "a@b.co http://x.io 1.2.3.4 +1 555 123 4567",
        "email.with+tag@sub.domain.org trailing",
        "https://a.b/c?d=e&f=g#h i",
        "10.0.0.1. 256.1.1.1 1.2.3",
        "+12 345 6789 0 ++44 (0) 20 7946 0958",
        "ünïcödé wörds münchen zürich",
        "русский текст здесь",
        "mixed русский and english",
        "$pecial ^chars* every(where)",
        "back\\slash and \"quotes' here",
        "репу+tición?? of-puncts!!!",
    ]
    rand = [
        "".join(rng.choice(alphabet, size=rng.integers(1, 60)))
        for _ in range(n - len(fixed))
    ]
    return fixed + rand


def test_tokenizer_and_normalize_agree_cross_engine(spark):
    """tokens(normalize(text)) — the kernel under every dedup/LM/lang
    oracle — produces identical token lists in Spark and DuckDB for 200
    adversarial strings."""
    from kats_spark.operators.dedup import normalize
    from kats_spark.operators.text import tokens

    texts = _adversarial_strings()
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    got = (
        spark.createDataFrame(pdf)
        .select("i", tokens(normalize(F.col("text"))).alias("t"))
        .toPandas()
        .sort_values("i")
    )
    con = duckdb.connect()
    con.register("d", pdf)
    exp = con.execute(
        """
        SELECT i, list_filter(
            string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
            x -> x <> '') AS t
        FROM d ORDER BY i
        """
    ).df()
    for i, (a, b) in enumerate(zip(got.t, exp.t)):
        assert list(a) == list(b), (i, texts[i], list(a), list(b))


def test_pii_scrub_agrees_cross_engine(spark):
    """The sequential PII chain (Java regex vs RE2): counts AND scrubbed
    text identical across engines for the adversarial batch."""
    from kats_spark.operators.text import scrub_pii, scrub_pii_sql

    texts = _adversarial_strings(seed=29)
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    got = (
        scrub_pii(spark.createDataFrame(pdf))
        .select("i", "n_url", "n_email", "n_ip", "n_phone", "text_scrubbed")
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("d", pdf)
    exp = (
        con.execute(f"SELECT i, {scrub_pii_sql('text')} FROM d ORDER BY i")
        .df()
        .reset_index(drop=True)
    )
    for c in ("n_url", "n_email", "n_ip", "n_phone"):
        mism = got[c].astype(int) != exp[c].astype(int)
        assert not mism.any(), (c, got[mism].head(), exp[mism].head())
    mism = got.text_scrubbed != exp.text_scrubbed
    assert not mism.any(), got[mism].head()


def test_char_trigram_extraction_agrees_cross_engine(spark):
    """The lang_id_ngram trigram construction (\\p{L} classes + substr)
    matches across engines, including non-ASCII letters."""
    texts = _adversarial_strings(seed=41)
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    cleaned = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^\p{L}]+", " ")),
        F.lit(" "),
    )
    d = spark.createDataFrame(pdf).select("i", cleaned.alias("s"))
    n = F.greatest(F.length("s") - 2, F.lit(1))
    got = (
        d.select(
            "i",
            F.transform(
                F.sequence(F.lit(1), n), lambda k: F.col("s").substr(k, F.lit(3))
            ).alias("g"),
        )
        .toPandas()
        .sort_values("i")
    )
    con = duckdb.connect()
    con.register("d", pdf)
    exp = con.execute(
        """
        WITH c AS (
          SELECT i, ' ' || trim(regexp_replace(lower(text), '[^\\p{L}]+', ' ', 'g')) || ' ' AS s
          FROM d
        )
        SELECT i, list_transform(range(1, greatest(length(s) - 2, 1) + 1),
                                 k -> substring(s, k, 3)) AS g
        FROM c ORDER BY i
        """
    ).df()
    for i, (a, b) in enumerate(zip(got.g, exp.g)):
        assert list(a) == list(b), (i, texts[i])


def test_bpe_pretokenizer_agrees_cross_engine(spark):
    """The GPT-2-style BPE pre-tokenizer regex — the pattern most likely
    to diverge between Java regex and RE2 (alternations, optional
    leading space, negated classes) — extracts identical token lists on
    the adversarial batch."""
    from kats_spark.operators.text import BPE_PATTERN, bpe_tokens

    texts = _adversarial_strings(seed=57) + [
        "it's we're I'll they've he'd I'm",
        "word123mix 42abc  double  space",
        "CamelCase UPPER lower 0x1f 3.14",
        "tail'",
    ]
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    got = (
        spark.createDataFrame(pdf)
        .select("i", bpe_tokens(F.col("text")).alias("t"))
        .toPandas()
        .sort_values("i")
    )
    con = duckdb.connect()
    con.register("d", pdf)
    sql_pat = BPE_PATTERN.replace("'", "''")
    exp = con.execute(
        f"SELECT i, regexp_extract_all(text, '{sql_pat}') AS t FROM d ORDER BY i"
    ).df()
    for i, (a, b) in enumerate(zip(got.t, exp.t)):
        assert list(a) == list(b), (i, texts[i], list(a)[:8], list(b)[:8])


def test_bpe_encode_chain_agrees_cross_engine(spark):
    """The wrapped-symbol (\\x1f) BPE merge chain — plain literal
    replace on both engines — yields identical per-document token
    counts on adversarial text, including merges made of regex/SQL
    metacharacters and repeated-symbol runs ('aaaa', '....') where the
    old space-padded chain overlapped."""
    from kats_spark.plans.pipeline_queries import _bpe_encode_sql
    from kats_spark.operators.bpe import bpe_encode_stats

    texts = _adversarial_strings(150, seed=29) + [
        "aaaaa aaaa aa a", "....... ... ..", "''''' '' '",
        "ababab abab ab", "$$$$ $$ $", "-- --- ----",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    merges = [
        ("a", "a"), ("aa", "a"), (".", "."), ("'", "'"), ("a", "b"),
        ("ab", "ab"), ("-", "-"), ("$", "$"), ("e", "r</w>"), ("t", "h"),
    ]
    got = (
        bpe_encode_stats(spark.createDataFrame(pdf), merges)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = con.execute(_bpe_encode_sql(merges)).df()
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    # empty docs produce no rows on both sides; align on doc_id
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.n_words.astype(int).tolist() == exp.n_words.astype(int).tolist()
    assert (
        got.n_bpe_tokens.astype(int).tolist()
        == exp.n_bpe_tokens.astype(int).tolist()
    )
    # ground truth on the overlap case: 'aaaaa' under (a,a),(aa,a) chains
    # to [aa, aa, a</w>] -> (aa,a)? no adjacent pair -> 3 tokens
    row = got[got.doc_id == 150].iloc[0]  # "aaaaa aaaa aa a"
    assert int(row.n_words) == 4


def test_md5_lattice_hash_agrees_cross_engine(spark):
    """The md5-lattice bucket hash behind DSIR / the stored ratio /
    the seeded samplers — ('0x'||substr(md5(x),1,12))::UBIGINT vs
    F.conv(substring(md5(x),1,12),16,10) — agrees byte-for-byte on
    200 adversarial strings (unicode strings hash through UTF-8
    identically in both engines)."""
    from kats_spark.operators.dsir import md5_hash48

    texts = _adversarial_strings(seed=29)
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    got = {
        r.i: r.h
        for r in sdf.select("i", md5_hash48("text").alias("h")).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    exp = {
        i: h
        for i, h in con.execute(
            "SELECT i, (('0x' || substr(md5(text), 1, 12))::UBIGINT)::BIGINT FROM t"
        ).fetchall()
    }
    assert got == exp


def test_dsir_weights_fuzz_matches_duckdb_replay(spark):
    """End-to-end DSIR weight fuzz: a randomized adversarial corpus
    scored by the Spark operator equals the pure-DuckDB replay of the
    identical arithmetic (hashing, smoothing, log-ratio sum) to 1e-9."""
    from kats_spark.operators.dsir import dsir_weights

    texts = _adversarial_strings(n=120, seed=31)
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["zh" if i % 5 == 0 else "en" for i in range(len(texts))],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = {
        r.doc_id: (r.n_feats, r.log_weight)
        for r in dsir_weights(
            sdf, sdf.filter(F.col("lang") == "zh"), num_buckets=128
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = """
WITH toks AS (
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
fb AS (SELECT doc_id, (('0x' || substr(md5(f), 1, 12))::UBIGINT % 128)::BIGINT AS bk FROM feats),
cr AS (SELECT bk, count(*) AS cr FROM fb GROUP BY 1),
ct AS (SELECT bk, count(*) AS ct FROM fb JOIN documents USING (doc_id)
       WHERE lang = 'zh' GROUP BY 1),
j AS (SELECT coalesce(cr.bk, ct.bk) AS bk, coalesce(cr, 0) AS cr, coalesce(ct, 0) AS ct
      FROM cr FULL OUTER JOIN ct ON cr.bk = ct.bk),
tot AS (SELECT sum(cr)::DOUBLE AS tr, sum(ct)::DOUBLE AS tt FROM j),
lr AS (SELECT bk, ln((ct + 1.0) / (tt + 128.0)) - ln((cr + 1.0) / (tr + 128.0)) AS lr
       FROM j CROSS JOIN tot)
SELECT doc_id, count(*), sum(lr) FROM fb JOIN lr USING (bk) GROUP BY 1
"""
    exp = {d: (n, w) for d, n, w in con.execute(sql).fetchall()}
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert abs(got[d][1] - exp[d][1]) < 1e-9
