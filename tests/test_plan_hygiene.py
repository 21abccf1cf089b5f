"""Physical-plan hygiene guards over representative declared queries.

The scale discipline the repo documents (SCALE.md / PLANS.md) as
executable assertions: no row-at-a-time Python UDFs anywhere
(BatchEvalPython — Arrow-batched FlatMapGroupsInPandas / MapInPandas are
the sanctioned Python paths), and no cartesian product that isn't a
deliberate broadcast of tiny metadata (fold specs, stats rows, candidate
grids).  A regression that sneaks either in changes the 100 TB story,
not just a benchmark number — so it fails the suite, not a code review.
"""

import pytest

SF = "/root/testdata/sf0.001"

# lazy queries only: building the frame must not trigger driver-side
# actions (some query fns legitimately run scalar aggs / fits eagerly)
LAZY_QUERIES = [
    "daily_revenue_by_region",
    "tpch_q1",
    "hourly_rollup",
    "resample_linear",
    "rolling_zscore",
    "rolling_mad",
    "statsig",
    "robust_stat",
    "mk_detect",
    "acf_seasonality",
    "linear_forecast",
    "theta_forecast",
    "holtwinters_forecast",
    "ts_stat_features",
    "tsfeatures_expr",
    "ma_decompose",
    "stl_decompose",
    "outlier_detect",
    "interval_detect",
    "sessionize",
    "exact_dedup",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_neardup",
    "token_stats",
    "text_quality",
    "lang_id",
    "unigram_logppl",
    "repetition_stats",
    "decontaminate",
    "corpus_sample",
    "topk_cosine",
    "lsh_bucket_pairs",
    "kats_ensemble",
    "stlf_forecast",
    "arima_forecast",
    "sarima_forecast",
    "prophet_forecast",
    # round-3 operators
    "lang_id_ngram",
    "multimodal_decode",
    "global_rnn",
    "rnn_forecast",
    "hpt_sobol",
    "bm25_topk",
    "decontaminate_fuzzy",
    "pii_scrub",
    "damped_forecast",
    "reconcile_mint",
    "neural_prophet",
    "detector_select",
    "bigram_logppl",
    "snapshot_diff",
    "zipf_fit",
    "corpus_profile",
    # round-5 operators
    "pack_sequences",
    "chunk_docs",
    "tfidf_topk",
    "split_assign",
    "epoch_upsample",
    "incremental_neardup",
    "source_cap",
    "dup_spans",
    # round-7/8 operators
    "dup_span_excise",
    "incremental_excise",
    "incremental_simhash",
    "ks_drift",
    "bpe_encode",
    "gopher_rules",
    "prophet_detect",
    # round-9 operators
    "tsfeatures_detector",
    "metalearn_metadata",
    "detector_hpt",
    "tsfeatures_full",
    "tsfeatures_wide_expr",
    "vocab_drift",
    "diversity_sample",
    "stl_features_expr",
    "tsfeatures_time",
    "dsir_weights",
    "dsir_sample",
    "source_overlap",
    "quality_buckets",
    "unimax_alloc",
    "bitext_mine",
    "bitext_mine_ann",
    "bitext_mine_stored",
    "quantize_int8",
    "shard_assign",
]


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    out = {}
    for name in LAZY_QUERIES:
        df = qs[name](spark, SF)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_row_at_a_time_python_udfs(plans):
    """BatchEvalPython = per-row Python round-trips (the 10-100x slow
    path).  Every Python kernel in this repo must be Arrow-batched."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_no_unbounded_cartesian_products(plans):
    """CartesianProduct without a broadcast is an O(n^2) shuffle bomb.
    The declared queries never need one: candidate generation is always
    an equi-join on buckets/chunks/keys, and the only cross joins are
    broadcast-tiny metadata (which plan as BroadcastNestedLoopJoin)."""
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_parquet_filter_pushdown_reaches_scan(spark):
    """Filters on source columns must reach the parquet scan
    (PushedFilters) — the first thing that breaks if an operator wraps
    the scan in something opaque."""
    import __spark_entry__ as entry

    qs = entry.queries()
    # decontaminate filters doc_id < 20 / >= 20 straight off the scan
    df = qs["decontaminate"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(doc_id)" in plan or "LessThan(doc_id" in plan or "GreaterThanOrEqual(doc_id" in plan
