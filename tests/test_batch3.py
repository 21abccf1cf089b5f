"""Tests: streaming CUSUM model, DTW CPD, KDE translator, ARIMA HR,
metalearners."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from kats_spark.models import arima, metalearner
from kats_spark.operators import backtest, dtw, kde, simulator
from kats_spark.streaming import cusum_model as cm


def test_cusum_stream_state_roundtrip():
    st = cm._new_state()
    cm._update_one(st, 5.0, 1000.0, 0.5, 5.0, 1)
    raw = cm.serialize_state(st)
    assert cm.deserialize_state(raw) == st
    legacy = cm.deserialize_state('{"version": 0, "n": 3, "mean": 1.0, "m2": 0.5}')
    assert legacy["s_pos"] == 0.0 and legacy["n"] == 3


def test_cusum_batch_detects_shift_and_retention(spark):
    df = simulator.simulate(
        spark, n_series=2, n_points=200, noise_std=1.0,
        level_shift_at=120, level_shift_size=8.0, seed=101,
    )
    out = cm.cusum_batch(df, k=0.5, h=5.0).toPandas()
    for sid, g in out.groupby("series_id"):
        g = g.sort_values("time").reset_index(drop=True)
        flagged = g[g.cp_flag == 1]
        assert len(flagged) >= 1
        assert abs(flagged.index[0] - 120) <= 10
    quiet = simulator.simulate(spark, n_series=1, n_points=200, noise_std=1.0, seed=102)
    qo = cm.cusum_batch(quiet, k=0.5, h=5.0).toPandas()
    assert qo.cp_flag.sum() == 0


def test_cusum_changepoint_cap():
    st = cm._new_state()
    # 15 forced changepoints: cap at 10, retention keeps recent only
    t = 0.0
    for i in range(15):
        for v in [0.0] * 12:
            cm._update_one(st, v + i * 50.0, t, 0.5, 5.0, 3)
            t += 3600.0
    assert len(st["changepoints"]) <= 10


def test_dtw_detects_waveform_change(spark):
    rng = np.random.RandomState(111)
    n = 480
    t = np.arange(n)
    # sine -> square wave at same amplitude/period: pointwise mean/var are
    # similar, shape differs
    vals = np.where(
        t < 240,
        3 * np.sin(2 * np.pi * t / 24),
        3 * np.sign(np.sin(2 * np.pi * t / 24)),
    ) + rng.randn(n) * 0.2
    pdf = pd.DataFrame(
        {
            "series_id": "s",
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "value": vals,
        }
    )
    cps = dtw.dtw_detect(spark.createDataFrame(pdf), window=24, z_threshold=3.0).toPandas()
    assert len(cps) >= 1
    # detection near the change (index 240 -> timestamp 2024-01-11)
    assert any(abs((pd.Timestamp(ts) - pd.Timestamp("2024-01-11")).total_seconds()) < 3 * 86400
               for ts in cps.time)


def test_kde_translate_calibration(spark):
    rng = np.random.RandomState(121)
    n = 500
    resid = rng.randn(n)
    resid[100] = 6.0  # extreme residual
    pdf = pd.DataFrame(
        {
            "series_id": "s",
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "residual": resid,
        }
    )
    out = (
        kde.kde_translate(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    assert out.loc[100, "proba"] < 0.01  # extreme -> tiny tail probability
    near_zero = out[np.abs(out.residual) < 0.1].proba
    assert (near_zero > 0.8).all()  # typical residuals -> high probability


def test_arima_forecast_on_ar_process(spark):
    rng = np.random.RandomState(131)
    n = 400
    y = np.zeros(n)
    for t in range(2, n):
        y[t] = 0.6 * y[t - 1] + 0.2 * y[t - 2] + rng.randn() * 0.5
    pdf = pd.DataFrame(
        {
            "series_id": "s",
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "value": y + 10,
        }
    )
    out = (
        arima.arima_forecast(spark.createDataFrame(pdf), steps=10,
                             freq_seconds=3600, order=(2, 0, 1))
        .toPandas()
        .sort_values("time")
    )
    assert len(out) == 10
    assert (out.fcst_upper > out.fcst).all() and (out.fcst > out.fcst_lower).all()
    # stationary AR around 10: forecast stays in a sane band
    assert out.fcst.between(7, 13).all()
    # bands widen with horizon
    w = (out.fcst_upper - out.fcst_lower).values
    assert w[-1] > w[0]


def test_arima_with_differencing_tracks_trend(spark):
    rng = np.random.RandomState(132)
    n = 300
    y = 0.5 * np.arange(n) + np.cumsum(rng.randn(n) * 0.3)
    pdf = pd.DataFrame(
        {
            "series_id": "s",
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "value": y,
        }
    )
    out = (
        arima.arima_forecast(spark.createDataFrame(pdf), steps=5,
                             freq_seconds=3600, order=(1, 1, 0))
        .toPandas()
        .sort_values("time")
    )
    # d=1 keeps the trend: forecasts continue upward from the last value
    assert (np.diff(out.fcst.values) > 0).all()
    assert abs(out.fcst.iloc[0] - y[-1]) < 5


def test_predictability_and_model_select(spark):
    rng = np.random.RandomState(141)
    n = 200
    times = pd.date_range("2024-01-01", periods=n, freq="h")
    trend = 0.5 * np.arange(n) + rng.randn(n) * 0.3      # linear wins
    walk = np.cumsum(rng.randn(n))                        # naive wins
    pdf = pd.DataFrame(
        {
            "series_id": ["trend"] * n + ["walk"] * n,
            "time": list(times) * 2,
            "value": np.concatenate([trend, walk]),
        }
    )
    df = spark.createDataFrame(pdf)
    spec = backtest.fold_spec(spark, n_folds=3, train_frac=0.5, test_frac=0.1)
    labels = metalearner.predictability_labels(df, spec).toPandas().set_index("series_id")
    assert labels.loc["trend", "predictable"] == 1
    sel = metalearner.model_select(df, spec).toPandas().set_index("series_id")
    assert sel.loc["trend", "best_model"] == "linear"
    assert sel.loc["walk", "best_model"] == "naive"


def test_nearest_centroid_scoring(spark):
    rng = np.random.RandomState(142)
    rows = []
    for i in range(40):
        lab = i % 2
        rows.append((f"s{i}", float(lab * 4 + rng.randn() * 0.3),
                     float(lab * -2 + rng.randn() * 0.3), lab))
    labeled = spark.createDataFrame(
        rows, "series_id string, f1 double, f2 double, predictable int"
    )
    scored = metalearner.nearest_centroid_score(
        labeled, labeled, ["f1", "f2"]
    ).toPandas()
    truth = {r[0]: r[3] for r in rows}
    acc = np.mean([truth[r.series_id] == r.predicted_label for r in scored.itertuples()])
    assert acc > 0.95


def test_harmonic_regression_recovers_sine(spark):
    rng = np.random.RandomState(151)
    n = 240
    t = np.arange(n)
    vals = 5 + 3 * np.sin(2 * np.pi * t / 24 + 0.7) + rng.randn(n) * 0.2
    pdf = pd.DataFrame(
        {
            "series_id": "s",
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "value": vals,
        }
    )
    from kats_spark.models import harmonic

    out = (
        harmonic.harmonic_forecast(spark.createDataFrame(pdf), steps=24,
                                   freq_seconds=3600, period=24)
        .toPandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    expected = 5 + 3 * np.sin(2 * np.pi * (n + np.arange(24)) / 24 + 0.7)
    np.testing.assert_allclose(out.fcst.values, expected, atol=0.15)


def test_external_models_gate_cleanly(spark):
    from kats_spark.models import external

    df = simulator.simulate(spark, n_series=1, n_points=50, noise_std=1.0, seed=161)
    import pytest

    with pytest.raises(external.BackendMissing, match="prophet"):
        external.prophet_forecast(df, steps=5, freq_seconds=3600, fallback="raise")
    # default now routes to the numpy ProphetLite implementation
    lite = external.prophet_forecast(df, steps=5, freq_seconds=3600).toPandas()
    assert len(lite) == 5 and lite.fcst.notna().all()
    with pytest.raises(external.BackendMissing, match="torch"):
        external.lstm_forecast(df, steps=5, freq_seconds=3600)
    with pytest.raises(external.BackendMissing, match="prophet"):
        external.prophet_detector_scores(df, fallback="raise")
    lite_scores = external.prophet_detector_scores(df).toPandas()
    assert len(lite_scores) > 0 and lite_scores.score.notna().all()


def test_rename_columns_by_prefix(spark):
    from kats_spark.sources.load import rename_columns_by_prefix
    import pytest

    df = spark.createDataFrame(
        [(1, 100.0, 90.0, 7)],
        ["time", "test_metric_count", "control_metric_count", "other_column"],
    )
    out = rename_columns_by_prefix(
        df, {"test_metric_": "numerator_test", "control_metric_": "numerator_control"}
    )
    assert out.columns == ["time", "numerator_test", "numerator_control", "other_column"]
    with pytest.raises(ValueError, match="matched 0 columns"):
        rename_columns_by_prefix(df, {"missing_": "x"})
    with pytest.raises(ValueError, match="multiple prefixes"):
        rename_columns_by_prefix(df, {"test_": "a", "test_metric_": "b"})


def test_stlf_recovers_trend_plus_season(spark):
    rng = np.random.RandomState(171)
    n = 240
    t = np.arange(n)
    vals = 0.2 * t + 4 * np.sin(2 * np.pi * t / 24) + rng.randn(n) * 0.3
    pdf = pd.DataFrame(
        {
            "series_id": "s",
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "value": vals,
        }
    )
    from kats_spark.models import stlf

    out = (
        stlf.stlf_forecast(spark.createDataFrame(pdf), steps=24,
                           freq_seconds=3600, period=24)
        .toPandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    exp = 0.2 * (n + np.arange(24)) + 4 * np.sin(2 * np.pi * (n + np.arange(24)) / 24)
    assert np.abs(out.fcst.values - exp).max() < 0.5
    # plain linear would miss the seasonal swing entirely
    assert (out.fcst_upper >= out.fcst).all() and (out.fcst >= out.fcst_lower).all()


def test_static_threshold_and_apply(spark):
    from kats_spark.operators import threshold as th

    pdf = pd.DataFrame(
        {
            "series_id": "s",
            "time": pd.date_range("2024-01-01", periods=4, freq="h"),
            "value": [1.0, -2.0, 3.0, 10.0],
        }
    )
    scored = th.static_threshold_scores(spark.createDataFrame(pdf))
    out = th.apply_thresholds(scored, lower=0.0, upper=5.0).toPandas().sort_values("time")
    # scores are a copy of the values, magnitude all zeros (threshold_detector.py:61-87)
    assert out.score.tolist() == [1.0, -2.0, 3.0, 10.0]
    assert (out.magnitude == 0.0).all()
    assert out.is_anomaly.tolist() == [False, True, False, True]
    assert out.excess.tolist() == [0.0, -2.0, 0.0, 5.0]


def test_evaluator_metric_table(spark):
    from kats_spark.operators import evaluator as ev

    pdf = pd.DataFrame(
        {"series_id": "s", "y": [1.0, 2.0, 4.0], "yhat": [1.0, 3.0, 2.0]}
    )
    runs = ev.tag_run("m1", spark.createDataFrame(pdf))
    out = ev.evaluate(runs, ["mae", "rmse"]).toPandas()
    assert len(out) == 1
    assert abs(out.mae[0] - 1.0) < 1e-12
    assert abs(out.rmse[0] - np.sqrt(5 / 3)) < 1e-12


def test_fold_spec_gap_and_simple(spark):
    from kats_spark.operators import backtest

    spec = backtest.fold_spec(
        spark, n_folds=2, train_frac=0.4, test_frac=0.1, mode="rolling", gap_frac=0.1
    ).toPandas().sort_values("fold_id")
    # gap sits between train_end and test_start in every fold
    assert (spec.test_start - spec.train_end).round(9).tolist() == [0.1, 0.1]
    assert spec.train_start.tolist() == [0.0, 0.4]
    simple = backtest.simple_spec(spark, train_frac=0.75).toPandas()
    assert simple.test_end.tolist() == [1.0] and simple.train_end.tolist() == [0.75]


def test_jaccard_allpairs_equals_bruteforce_randomized(spark):
    """Property check: the prefix-filtered AllPairs plan returns EXACTLY
    the brute-force >= t pairs on randomized corpora (the filter only
    prunes candidates that provably cannot reach the threshold)."""
    import numpy as np

    from kats_spark.operators import dedup

    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        docs = []
        for i in range(40):
            n_tok = rng.randint(3, 25)
            docs.append((i, " ".join(rng.choice(vocab, n_tok))))
        # inject guaranteed near-dups
        docs[35] = (35, docs[0][1] + " w0")
        docs[36] = (36, docs[1][1])
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = (
            dedup.jaccard_allpairs(df, threshold=0.5)
            .toPandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

        def sh(text, n=3):
            toks = text.lower().split()
            if len(toks) < n:
                return {" ".join(toks[:n])}
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

        exp = []
        for a in range(len(docs)):
            for b in range(a + 1, len(docs)):
                sa, sb = sh(docs[a][1]), sh(docs[b][1])
                j = len(sa & sb) / len(sa | sb)
                if j >= 0.5:
                    exp.append((docs[a][0], docs[b][0], j))
        assert len(got) == len(exp), f"trial {trial}: {len(got)} vs {len(exp)}"
        for (ea, eb, ej), (_, row) in zip(exp, got.iterrows()):
            assert (ea, eb) == (row.id_a, row.id_b)
            assert abs(ej - row.jaccard) < 1e-9


def test_session_window_equals_lag_formulation_randomized(spark):
    """Two independent sessionization implementations must agree on random
    event sets: Spark's native session_window vs the lag/cumsum gap plan
    (the declared sessionize oracle shape).  Gaps avoid the exact
    window-size boundary (both engines merge AT the boundary; this pins
    the strict-greater split rule)."""
    rng = np.random.RandomState(17)
    for trial in range(3):
        rows = []
        t0 = pd.Timestamp("2024-03-01")
        for uid in range(1, 6):
            cur = t0
            for _ in range(rng.randint(10, 60)):
                gap = float(rng.choice([30, 240, 1100, 1799, 1801, 5000, 9000]))
                cur = cur + pd.Timedelta(seconds=gap + rng.rand() * 0.5)
                rows.append((uid, cur, float(rng.randn())))
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        df = spark.createDataFrame(pdf)

        native = (
            df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 9).alias("v"))
            .select("user_id", F.col("w.start").alias("start"), "n", "v")
            .toPandas()
            .sort_values(["user_id", "start"])
            .reset_index(drop=True)
        )

        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts")
        gap_s = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
        lagged = (
            df.withColumn("new_s", F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0))
            .withColumn("sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("user_id", "sid")
            .agg(
                F.min("ts").alias("start"),
                F.count("*").alias("n"),
                F.round(F.sum("value"), 9).alias("v"),
            )
            .select("user_id", "start", "n", "v")
            .toPandas()
            .sort_values(["user_id", "start"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(native, lagged, check_dtype=False)


def test_salted_join_equals_plain_join(spark):
    """salted_join is row-identical to the plain equi-join on a skewed
    fact table (90% of rows share one key), for inner and left joins."""
    from kats_spark.operators import skew

    n = 2000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame(
        [("hot", 1.0), ("cold", 2.0), ("orphan", 3.0)], ["k", "weight"]
    )
    for how in ("inner", "left"):
        plain = (
            fact.join(dim, "k", how)
            .toPandas()
            .sort_values(["k", "payload"])
            .reset_index(drop=True)
        )
        salted = (
            skew.salted_join(fact, dim, "k", salt_cols=["payload"], buckets=8, how=how)
            .toPandas()
            .sort_values(["k", "payload"])
            .reset_index(drop=True)
        )
        assert plain.equals(salted[plain.columns.tolist()]), how
    # the salt actually spreads the hot key
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64("payload"), F.lit(8))
    )
    spread = (
        salted_fact.filter(F.col("k") == "hot").groupBy("__salt").count().count()
    )
    assert spread == 8


def test_embed_neardup_prefilter_equivalence(spark):
    """The numpy prefilter changes nothing: identical pair sets and
    identical rounded cosines with prefilter on and off."""
    from kats_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = (
        sim.embedding_neardup_pairs(emb, threshold=0.4, prefilter=True)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    b = (
        sim.embedding_neardup_pairs(emb, threshold=0.4, prefilter=False)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) > 0


def test_semantic_dedup_drop_rule_matches_numpy(spark):
    """semantic_dedup (SemDeDup, arXiv:2303.09540) against an independent
    numpy replay: plant 10 near-copies in 40 random vectors, run the
    operator, then recompute the within-cell pairwise drop rule from the
    operator's own cell assignment — the dropped sets must agree exactly,
    and every planted duplicate pair must lose exactly its
    nearer-to-centroid member."""
    import numpy as np

    from kats_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 64))
    dups = base[:10] + rng.normal(scale=1e-3, size=(10, 64))
    M = np.vstack([base, dups])
    rows = [(i, [float(x) for x in M[i]]) for i in range(len(M))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = (
        semantic_dedup(df, n_cells=8, threshold=0.95)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == 50
    dropped = set(out.loc[~out["kept"], "vec_id"])
    assert len(dropped) > 0
    # numpy replay of the pairwise rule, given the operator's cells
    cell = dict(zip(out["vec_id"], out["cell_id"]))
    cdist = dict(zip(out["vec_id"], out["centroid_dist"]))
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    expect = set()
    for x in range(50):
        for y in range(50):
            if x == y or cell[x] != cell[y]:
                continue
            cos = np.round(float(Mn[x] @ Mn[y]) + 1e-9, 6)
            if cos >= 0.95 and (
                cdist[y] > cdist[x] or (cdist[y] == cdist[x] and y < x)
            ):
                expect.add(x)
    assert dropped == expect
    # each planted pair (i, i+40) that landed in one cell lost one member
    for i in range(10):
        if cell[i] == cell[i + 40]:
            assert (i in dropped) != (i + 40 in dropped)


def test_segmented_score_giant_series_2m_rows(spark):
    """Scale evidence for the skew story: one 2M-point series (the case a
    plain per-series window serializes onto a single task) runs through
    segmented_score with bounded tiles, and spot-agrees with the plain
    window on a sampled slice."""
    from pyspark.sql import Window

    from kats_spark.functions import rolling

    n_rows, w = 2_000_000, 48
    base = spark.range(n_rows).select(
        F.lit("giant").alias("series_id"),
        F.timestamp_seconds(1700000000 + F.col("id") * 60).alias("time"),
        (F.sin(F.col("id") / 1000.0) + (F.col("id") % 97) / 97.0).alias("value"),
    )
    seg = rolling.segmented_score(base, n=w, segment_rows=65536)
    assert seg.count() == n_rows

    # spot-check a 2k slice against the plain single-window plan
    lo, hi = 1_000_000, 1_002_000
    seg_slice = (
        seg.withColumn(
            "__rn", F.row_number().over(Window.partitionBy("series_id").orderBy("time")) - 1
        )
        .filter((F.col("__rn") >= lo) & (F.col("__rn") < hi))
        .select("time", "score")
        .toPandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    plain = base.withColumn("score", rolling.z_score(w)).withColumn(
        "__rn", F.row_number().over(Window.partitionBy("series_id").orderBy("time")) - 1
    )
    plain_slice = (
        plain.filter((F.col("__rn") >= lo) & (F.col("__rn") < hi))
        .select("time", "score")
        .toPandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(seg_slice, plain_slice, rtol=1e-12)


def test_winnowing_guarantee_shared_substring(spark):
    """Winnowing's core guarantee: two documents sharing a substring of
    length >= w + k - 1 share at least one fingerprint; disjoint docs
    share none (probabilistically, with distinct vocabularies)."""
    from kats_spark.operators.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog near the river bank today"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma " + shared + " delta epsilon",
                "zeta eta " + shared + " theta iota kappa",
                "completely different words xylophone quartz jigsaw vortex plasma",
            ],
        }
    )
    fp = winnow_fingerprints(spark.createDataFrame(pdf), k=5, w=16).toPandas()
    s1 = set(fp[fp.doc_id == 1].fp_hash)
    s2 = set(fp[fp.doc_id == 2].fp_hash)
    s3 = set(fp[fp.doc_id == 3].fp_hash)
    assert s1 & s2, "docs sharing a long substring must share a fingerprint"
    assert not (s1 & s3) and not (s2 & s3)


def test_winnowing_long_document_not_truncated(spark):
    """Regression: the powers table used to cap at 8192 chars and the
    inner join silently DROPPED the tail of longer documents.  A >8192
    char doc must now fingerprint its tail, and a duplicate block placed
    past position 8192 must still be detected as shared."""
    import numpy as np

    from kats_spark.operators.text import winnow_fingerprints

    rng = np.random.default_rng(7)
    words = ["w%04d" % i for i in rng.integers(0, 4000, size=2600)]
    long_text = " ".join(words)  # ~13k chars
    shared_tail = "an unmistakably shared block of text far past the old cap"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [long_text + " " + shared_tail, "short prefix " + shared_tail],
        }
    )
    fp = winnow_fingerprints(spark.createDataFrame(pdf), k=5, w=16).toPandas()
    d1 = fp[fp.doc_id == 1]
    assert len(long_text) > 8192
    assert d1.fp_pos.max() > 8192, "fingerprints must cover the tail"
    assert set(d1.fp_hash) & set(fp[fp.doc_id == 2].fp_hash)
    # asserted-bound mode raises instead of truncating
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winnow_fingerprints(spark.createDataFrame(pdf), max_len=4096).toPandas()


def test_mod_power_table_doubling_equals_incremental(spark):
    """The log2-doubling JVM generator must produce the same rows as the
    literal incremental table (checked past one doubling boundary)."""
    from kats_spark.operators.text import _mod_power_table

    P = 2147483647
    n = 100
    small = _mod_power_table(spark, n, P).toPandas().sort_values("i").reset_index(drop=True)
    inv31 = pow(31, P - 2, P)
    for i in range(1, n + 1):
        row = small.iloc[i - 1]
        assert row.i == i and row.p31 == pow(31, i, P) and row.pinv == pow(inv31, i, P)
    # spot-check far past the small range, including a power-of-two edge
    big = _mod_power_table(spark, (1 << 16) + 5, P)
    chk = big.filter("i in (1, 2, 65536, 65541)").toPandas().set_index("i")
    for i in (1, 2, 65536, 65541):
        assert chk.loc[i, "p31"] == pow(31, i, P)
        assert chk.loc[i, "pinv"] == pow(inv31, i, P)


def test_acf_detector_first_differences_match_numpy(spark):
    """ACFDetector parity (seasonality.py:117-124): acf runs on the
    diff=1 series.  A trending series with no seasonality must NOT light
    up candidates (the raw-series acf would), and the r_k values implied
    by the detector must match numpy acf of np.diff(y)."""
    import numpy as np

    from kats_spark.functions.acf import acf_seasonality_detect

    rng = np.random.default_rng(3)
    n = 400
    t = np.arange(n)
    # strong linear trend + mild noise, NO seasonality
    y = 10.0 + 0.5 * t + rng.normal(0, 0.5, n)
    pdf = pd.DataFrame(
        {
            "series_id": "s",
            "time": pd.date_range("2024-01-01", periods=n, freq="h"),
            "value": y,
        }
    )
    out = acf_seasonality_detect(spark.createDataFrame(pdf), lags=24).toPandas()
    assert out.seasonality_presence.iloc[0] == 0, (
        "trending non-seasonal series must not report seasonality once "
        "acf runs on first differences"
    )
    # seasonal series still detected, and period recovered
    # prime period so no smaller divisor-candidate can prune it (for a
    # period-12 sine, lag 2 has acf cos(60)=0.5 -- a true candidate that
    # the reference greedy pruning pops first, dropping 12 itself)
    ys = 10.0 + 0.3 * t + 5.0 * np.sin(2 * np.pi * t / 7) + rng.normal(0, 0.2, n)
    pdf2 = pdf.assign(value=ys)
    out2 = acf_seasonality_detect(spark.createDataFrame(pdf2), lags=30).toPandas()
    assert out2.seasonality_presence.iloc[0] == 1
    assert "7" in out2.seasonalities.iloc[0].split(",")


def test_all_pairs_topk_sharded_equals_unsharded(spark):
    """The sharded broadcast-index path (driver peak = one shard) must
    produce EXACTLY the single-index result: per-shard top-k is a
    superset of every item's global winners, and the window re-rank uses
    the same (rounded score desc, id asc) order as the perturbed argsort."""
    import numpy as np

    from kats_spark.operators.similarity import all_pairs_topk

    rng = np.random.default_rng(11)
    n, dim = 400, 16
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.normal(size=dim).astype(float).tolist() for _ in range(n)],
        }
    )
    df = spark.createDataFrame(pdf)
    one = (
        all_pairs_topk(df, k=5)
        .toPandas()
        .sort_values(["id_a", "rk"])
        .reset_index(drop=True)
    )
    sharded = (
        all_pairs_topk(df, k=5, shard_rows=60)  # forces 7 shards
        .toPandas()
        .sort_values(["id_a", "rk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, sharded, check_dtype=False)
    # VERDICT r07 #4: the memoized-index path (prepared-statement pattern
    # for the driver-side collect + broadcast) is bit-identical to a
    # fresh build, and the second call actually HITS the memo (no new
    # broadcast handles).
    from kats_spark.operators import similarity as sim

    sim.clear_index_memo()
    first = (
        all_pairs_topk(df, k=5, memo_key="test-allpairs")
        .toPandas()
        .sort_values(["id_a", "rk"])
        .reset_index(drop=True)
    )
    handles_after_first = dict(sim._INDEX_MEMO)
    hitpath = (
        all_pairs_topk(df, k=5, memo_key="test-allpairs")
        .toPandas()
        .sort_values(["id_a", "rk"])
        .reset_index(drop=True)
    )
    assert dict(sim._INDEX_MEMO) == handles_after_first  # same live handles
    pd.testing.assert_frame_equal(one, first, check_dtype=False)
    pd.testing.assert_frame_equal(one, hitpath, check_dtype=False)
    sim.clear_index_memo()


def test_minhash_bucket_cap_overflow_join_equals_in_row(spark):
    """Buckets above bucket_cap route through the member-explode
    self-join; the pair set must be identical to the pure in-row
    expansion (bucket_cap large)."""
    rng = __import__("numpy").random.default_rng(5)
    base = [
        " ".join("tok%03d" % w for w in rng.integers(0, 300, size=40)) for _ in range(12)
    ]
    texts, ids = [], []
    i = 0
    for b in base:
        for _ in range(4):  # 4 near-identical copies -> shared buckets
            texts.append(b + (" extra%d" % (i % 2)))
            ids.append(i)
            i += 1
    pdf = pd.DataFrame({"doc_id": ids, "text": texts})
    df = spark.createDataFrame(pdf)
    from kats_spark.operators.dedup import minhash_lsh_pairs

    big_cap = minhash_lsh_pairs(df, bucket_cap=10_000).toPandas()
    tiny_cap = minhash_lsh_pairs(df, bucket_cap=2).toPandas()  # everything overflows
    key = lambda d: set(zip(d.id_a, d.id_b))  # noqa: E731
    assert key(big_cap) == key(tiny_cap) and len(big_cap) > 0


def test_embed_neardup_auto_prefilter_gate(spark):
    """prefilter=None must auto-route: tiny prefilter_max_rows forces the
    pure-SQL path and the result still matches the forced-index path."""
    import numpy as np

    from kats_spark.operators.similarity import embedding_neardup_pairs

    rng = np.random.default_rng(2)
    n, dim = 120, 16
    base = rng.normal(size=(n // 2, dim))
    vecs = np.vstack([base, base + rng.normal(scale=0.01, size=base.shape)])
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(float).tolist() for v in vecs],
        }
    )
    df = spark.createDataFrame(pdf)
    forced = embedding_neardup_pairs(df, dim=dim, prefilter=True).toPandas()
    auto_sql = embedding_neardup_pairs(
        df, dim=dim, prefilter=None, prefilter_max_rows=10
    ).toPandas()
    key = lambda d: set(zip(d.id_a, d.id_b))  # noqa: E731
    assert key(forced) == key(auto_sql) and len(forced) > 0


def test_arima_css_refinement_reduces_sse():
    """Gauss-Newton CSS over the Hannan-Rissanen start: SSE must never
    increase, and on a seeded ARMA(2,1) both stages must land near the
    generating parameters (CSS at least as close in SSE terms)."""
    import numpy as np

    from kats_spark.models.arima import (
        _css_refine,
        _css_residuals,
        _hannan_rissanen,
    )

    rng = np.random.default_rng(42)
    for n in (150, 600):
        e = rng.normal(0, 1, n + 100)
        x = np.zeros(n + 100)
        for t in range(2, n + 100):
            x[t] = 0.6 * x[t - 1] - 0.3 * x[t - 2] + e[t] + 0.4 * e[t - 1]
        x = x[100:]
        phi, theta, mu, _, _ = _hannan_rissanen(x, 2, 1)
        xc = x - mu
        p2, t2 = _css_refine(xc, phi, theta)
        e_hr, _ = _css_residuals(xc, phi, theta)
        e_css, _ = _css_residuals(xc, p2, t2)
        assert e_css @ e_css <= e_hr @ e_hr + 1e-9
        assert abs(p2[0] - 0.6) < 0.2 and abs(p2[1] + 0.3) < 0.2
        assert abs(t2[0] - 0.4) < 0.25


def test_lang_id_multilingual(spark):
    """Stopword lang-ID over the top-10 whitespace languages: real-ish
    sentences per language must classify correctly; gibberish stays
    'unknown'; English unchanged from the legacy behavior."""
    rows = [
        ("en", "the cat sat on the mat and it was happy that the sun is out"),
        ("de", "der hund und die katze sind nicht mit dem ball von den kindern"),
        ("es", "el perro y la gata que viven en un parque de los arboles se van con ellos"),
        ("fr", "le chien et la chatte dans les jardins des villes est une belle chose de plus"),
        ("it", "il cane che corre per la strada con una palla del parco non sono soli"),
        ("pt", "o cachorro e a gata que moram em um parque da cidade para os amigos com ela de novo"),
        ("nl", "de hond en het katje van een park dat niet met de bal voor ik speel"),
        ("ru", "и вот не кошка на столе что с собакой как это было по утрам то"),
        ("id", "yang anjing dan kucing di taman itu dengan bola untuk anak ini tidak dari pada"),
        ("tr", "bir kedi ve köpek bu bahçede ne güzel gibi ama çok daha mutlu ben bunu için"),
        ("unknown", "zxqv wplk djfh qwrt mnbv lkjh gfds poiu ytre zxcv asdf hjkl qwer uiop"),
    ]
    pdf = pd.DataFrame(
        {"doc_id": range(len(rows)), "text": [t for _, t in rows],
         "expected": [l for l, _ in rows]}
    )
    from kats_spark.operators.text import lang_id

    out = lang_id(spark.createDataFrame(pdf)).toPandas().sort_values("doc_id")
    assert list(out.lang_pred) == list(out.expected), list(
        zip(out.expected, out.lang_pred)
    )


def test_score_and_lang_equals_composed(spark):
    """The fused single-tokenize scorer must produce byte-identical
    columns to quality_score |> lang_id (the corpus_prep hot path)."""
    from kats_spark.operators.text import lang_id, quality_score, score_and_lang

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["doc_id", "quality_score", "stop_ratio", "lang_ratio", "lang_pred"]
    composed = lang_id(quality_score(docs)).select(cols)
    fused = score_and_lang(docs).select(cols)
    assert composed.exceptAll(fused).count() == 0
    assert fused.exceptAll(composed).count() == 0


def test_all_pairs_topk_sharded_40k_vectors(spark):
    """Scale guard for the sharded index path: 40k vectors force 4
    shard collections (driver peak = one ~20k-row shard instead of the
    full corpus); spot-check exact global top-k for sampled queries
    against a local BLAS answer."""
    import numpy as np

    from kats_spark.operators.similarity import all_pairs_topk

    rng = np.random.default_rng(21)
    n, dim, k = 40_000, 4, 3
    mat = rng.normal(size=(n, dim))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [v.tolist() for v in mat]}
    )
    df = spark.createDataFrame(pdf).repartition(16)
    out = (
        all_pairs_topk(df, k=k, shard_rows=10_000)
        .filter("id_a in (7, 4242, 39999)")
        .toPandas()
        .sort_values(["id_a", "rk"])
    )
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in (7, 4242, 39999):
        sims = np.round(norm[qid] @ norm.T + 1e-9, 6)
        sims[qid] = -np.inf
        order = np.lexsort((np.arange(n), -sims))[:k]
        got = out[out.id_a == qid]
        assert list(got.id_b) == list(order), qid
        np.testing.assert_allclose(got.cos_sim.to_numpy(), sims[order], atol=1e-9)


def test_minhash_overflow_bucket_thousands_of_members(spark):
    """Scale guard for the bucket cap: 1500 identical docs put
    thousands of members in the same (band, bucket); the overflow join
    must produce the full pair set WITHOUT materializing an m^2-struct
    array in one row (the pre-cap formulation built ~9M structs in a
    single row here — ~1.1M structs at this size)."""
    n = 1500
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["an identical boilerplate template document body"] * n,
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    from kats_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        df, num_hashes=16, bands=2, bucket_cap=512
    )
    cnt = pairs.count()
    assert cnt == n * (n - 1) // 2  # every pair, exactly once


def test_model_backtest_arima_beats_naive(spark):
    """Generic model backtester (BackTesterParent shape): on a seeded
    AR(1) process the ARIMA kernel's fold-mean MAE must beat the naive
    last-value kernel over multi-step test horizons."""
    import numpy as np

    from kats_spark.operators import backtest as bt

    rng = np.random.default_rng(17)
    frames = []
    for k in range(3):
        n = 400
        e = rng.normal(0, 1, n + 50)
        x = np.zeros(n + 50)
        for t in range(1, n + 50):
            x[t] = 0.6 * x[t - 1] + e[t]
        frames.append(
            pd.DataFrame(
                {
                    "series_id": f"s{k}",
                    "time": pd.date_range("2024-01-01", periods=n, freq="h"),
                    "value": x[50:] + 20,
                }
            )
        )
    df = spark.createDataFrame(pd.concat(frames))
    spec = bt.fold_spec(spark, n_folds=3, train_frac=0.6, test_frac=0.05)
    ar = bt.model_backtest(df, spec, model="arima", order=(1, 0, 0)).toPandas()
    nv = bt.model_backtest(df, spec, model="naive").toPandas()
    assert len(ar) == 9 and len(nv) == 9
    assert ar.mae.mean() < nv.mae.mean()


def test_simhash_pairs_band_join_equals_bruteforce(spark):
    """Pigeonhole guarantee (Manku et al. WWW'07): the band-join candidate
    set + hamming verify must return EXACTLY the pairs within
    max_hamming, for max_hamming <= bands-1 — checked against a
    brute-force all-pairs hamming filter on random 16-bit fingerprints."""
    import itertools

    import numpy as np

    from kats_spark.operators.dedup import simhash_pairs

    rng = np.random.default_rng(23)
    n = 300
    fps = rng.integers(0, 1 << 16, size=n, dtype=np.int64)
    # plant some near-dup clusters
    for base in (5, 77, 200):
        for off, flip in ((1, 1), (2, 3)):
            fps[base + off] = fps[base] ^ ((1 << flip) - 1)  # hamming = flip
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "simhash16": fps})
    got = (
        simhash_pairs(
            spark.createDataFrame(pdf), max_hamming=3, bands=4, bits=16,
            fp_col="simhash16",
        )
        .toPandas()
    )
    expect = set()
    for i, j in itertools.combinations(range(n), 2):
        h = bin(int(fps[i]) ^ int(fps[j])).count("1")
        if h <= 3:
            expect.add((i, j, h))
    assert set(zip(got.id_a, got.id_b, got.hamming)) == expect
    assert len(expect) >= 6  # the planted clusters are in there


def test_token_budget_sample_contract(spark):
    """Deterministic stratified sampling: every bucket greedy-fills to
    the budget (overshoot at most one doc), re-runs reproduce the exact
    same sample, and different seeds draw different docs."""
    import numpy as np

    from kats_spark.operators.sampling import token_budget_sample

    rng = np.random.default_rng(31)
    rows = []
    for i in range(400):
        nt = int(rng.integers(20, 120))
        rows.append(
            {
                "doc_id": i,
                "source": "web" if i % 2 == 0 else "book",
                "lang": "en" if i % 3 else "de",
                "text": " ".join(f"w{j}" for j in range(nt)),
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows))
    a = token_budget_sample(df, budget_tokens=1000, seed=7).toPandas()
    b = token_budget_sample(df, budget_tokens=1000, seed=7).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # deterministic
    g = a.groupby(["source", "lang"])
    for _, grp in g:
        total = grp.n_tokens.sum()
        # filled to budget: at least budget once the last doc started
        assert total >= 1000 or len(grp) == 0
        # overshoot bounded by one document
        assert total - grp.n_tokens.max() < 1000
    c = token_budget_sample(df, budget_tokens=1000, seed=8).toPandas()
    assert sorted(c.doc_id) != sorted(a.doc_id)  # seed changes the draw


def test_decontaminate_flags_planted_overlap(spark):
    """A train doc containing a verbatim 8-gram from the eval set is
    flagged and removed; clean docs survive."""
    from kats_spark.operators.sampling import decontaminate

    bench = "the quick brown fox jumps over the lazy dog in the garden"
    train = pd.DataFrame(
        {
            "doc_id": [100, 101, 102],
            "text": [
                "prefix words " + bench + " suffix words",  # contaminated
                "totally unrelated content about spark query planning internals",
                "another clean document discussing window aggregation semantics today",
            ],
        }
    )
    ev = pd.DataFrame({"doc_id": [1], "text": [bench]})
    flagged, clean = decontaminate(
        spark.createDataFrame(train), spark.createDataFrame(ev), shingle_n=8
    )
    f = flagged.toPandas()
    assert list(f.doc_id) == [100] and f.n_gram_hits.iloc[0] >= 1
    assert sorted(clean.toPandas().doc_id) == [101, 102]


def test_repetition_stats_scores_repetitive_doc(spark):
    """The repeated-line/repeated-gram document scores high on every
    repetition feature; the diverse document scores low."""
    from kats_spark.operators.sampling import repetition_stats

    rep = "spam line here\n" * 10 + "unique closing line"
    div = "\n".join(f"line number {i} with distinct words w{i} v{i}" for i in range(10))
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": [rep, div]})
    out = repetition_stats(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    assert out.loc[1, "dup_line_ratio"] > 0.7
    assert out.loc[1, "dup_gram_ratio"] > 0.7
    assert out.loc[2, "dup_line_ratio"] == 0.0
    assert out.loc[2, "top_gram_share"] < 0.2


def test_unigram_logppl_separates_fluent_from_garbage(spark):
    """The corpus-LM score must rank a rare-token (garbage) document
    above in-domain documents built from common corpus vocabulary."""
    from kats_spark.operators.sampling import unigram_logppl

    common = "data query table join window filter group sort hash batch"
    rows = [(i, common + f" extra{i % 3}") for i in range(20)]
    rows.append((99, "zxqv wplk djfh qwrt mnbv lkjh gfds poiu"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = unigram_logppl(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    garbage = out.loc[99, "logppl"]
    fluent_max = out.drop(index=99).logppl.max()
    assert garbage > fluent_max + 1.0


def test_token_budget_sample_salted_equals_naive(spark):
    """VERDICT r02 #3: the salted-exact plan (hex-prefix shard-major
    ordering + per-shard cumsum + exclusive shard offsets) must produce
    BIT-IDENTICAL output to the naive single-window greedy fill, at
    every supported shard count."""
    import numpy as np

    from kats_spark.operators.sampling import token_budget_sample

    rng = np.random.default_rng(5)
    rows = [
        {
            "doc_id": i,
            "source": "web" if i % 2 else "book",
            "lang": "en" if i % 3 else "de",
            "text": " ".join(f"w{j}" for j in range(int(rng.integers(20, 120)))),
        }
        for i in range(500)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    cols = ["doc_id", "n_tokens", "cum_tokens"]
    naive = (
        token_budget_sample(df, 1000, seed=7, salt_shards=1)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[cols]
    )
    for shards in (16, 256):
        salted = (
            token_budget_sample(df, 1000, seed=7, salt_shards=shards)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[cols]
        )
        assert salted.equals(naive), f"salt_shards={shards} diverged"


def test_token_budget_sample_giant_single_bucket_2m_rows(spark):
    """VERDICT r02 #3 guard: one dominant (web, en) bucket with 2M docs
    — the case where the naive plan serializes the whole corpus onto a
    single window task — runs through the salted plan with the window
    split over 256 shards, and the greedy-fill invariants hold."""
    from kats_spark.operators.sampling import token_budget_sample

    n_rows, tok_per_doc, budget = 2_000_000, 5, 2_000_000
    docs = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.lit("web").alias("source"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("a b c d "), F.col("id").cast("string")).alias("text"),
    )
    out = token_budget_sample(docs, budget, seed=3)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum("n_tokens").alias("tok"),
        F.max("cum_tokens").alias("cum_max"),
    ).collect()[0]
    # filled to budget, overshoot bounded by one doc
    assert agg.tok >= budget
    assert agg.tok - tok_per_doc < budget
    assert agg.cum_max == agg.tok
    assert agg.n == agg.tok // tok_per_doc


def test_unigram_logppl_zipf_head_2m_tokens(spark):
    """VERDICT r02 #4 guard: a Zipf-extreme corpus (every doc contains
    the same head token, plus a unique tail token) — the shape where a
    raw occurrence join piles the head key onto one task.  The de-skewed
    plan (doc-token pre-aggregation + broadcast vocabulary head) runs it
    and the arithmetic stays exact: every doc has the same closed-form
    score, verified against numpy."""
    import numpy as np

    from kats_spark.operators.sampling import unigram_logppl

    n_docs = 1_000_000
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the the the u"), F.col("id").cast("string")).alias("text"),
    )
    out = unigram_logppl(docs, alpha=1.0)
    agg = out.agg(
        F.count("*").alias("n"),
        F.min("logppl").alias("lo"),
        F.max("logppl").alias("hi"),
        F.min("n_tokens").alias("ntmin"),
        F.max("n_tokens").alias("ntmax"),
    ).collect()[0]
    assert agg.n == n_docs and agg.ntmin == agg.ntmax == 4
    total, vocab = 4 * n_docs, 1 + n_docs
    p_head = (3 * n_docs + 1.0) / (total + vocab)
    p_tail = (1 + 1.0) / (total + vocab)
    expect = -(3 * np.log(p_head) + np.log(p_tail)) / 4.0
    assert abs(agg.lo - expect) < 1e-9 and abs(agg.hi - expect) < 1e-9


def _sim_arma11(n, phi, theta, seed, burn=300):
    rng = np.random.default_rng(seed)
    e = rng.normal(0, 1, n + burn)
    x = np.zeros(n + burn)
    for t in range(1, n + burn):
        x[t] = phi * x[t - 1] + e[t] + theta * e[t - 1]
    return x[burn:]


def test_kalman_loglik_matches_closed_form_ar1():
    """The Kalman innovations likelihood must equal the closed-form exact
    Gaussian AR(1) likelihood (x_1 ~ N(0, s2/(1-phi^2)), concentrated
    s2) to machine precision."""
    from kats_spark.models.arima import _kalman_loglik

    x = _sim_arma11(300, 0.8, 0.0, seed=5)
    xc = x - x.mean()
    phi = 0.73
    n = len(xc)
    # closed form, concentrated: F_1 = 1/(1-phi^2), F_t = 1
    nu = np.concatenate([[xc[0]], xc[1:] - phi * xc[:-1]])
    F = np.concatenate([[1.0 / (1 - phi**2)], np.ones(n - 1)])
    s2 = float(np.mean(nu**2 / F))
    ll_exact = -0.5 * n * (np.log(2 * np.pi) + 1 + np.log(s2)) - 0.5 * np.sum(
        np.log(F)
    )
    ll, s2k = _kalman_loglik(xc, np.array([phi]), np.zeros(0))
    assert abs(ll - ll_exact) < 1e-8
    assert abs(s2k - s2) < 1e-12


def test_kalman_loglik_matches_mvn_ma1():
    """MA(1) anchor: the innovations likelihood equals the direct
    multivariate-normal evaluation on the Toeplitz covariance."""
    from kats_spark.models.arima import _kalman_loglik

    theta = -0.6
    x = _sim_arma11(60, 0.0, theta, seed=9)
    xc = x - x.mean()
    n = len(xc)
    cov = np.zeros((n, n))
    np.fill_diagonal(cov, 1 + theta**2)
    idx = np.arange(n - 1)
    cov[idx, idx + 1] = theta
    cov[idx + 1, idx] = theta
    sign, logdet = np.linalg.slogdet(cov)
    quad = float(xc @ np.linalg.solve(cov, xc))
    s2 = quad / n  # concentrated scale
    ll_exact = -0.5 * n * (np.log(2 * np.pi) + 1 + np.log(s2)) - 0.5 * logdet
    ll, s2k = _kalman_loglik(xc, np.zeros(0), np.array([theta]))
    assert sign > 0
    assert abs(ll - ll_exact) < 1e-6
    assert abs(s2k - s2) < 1e-9


def test_pacf_transform_roundtrip():
    """Monahan parameterization: unconstrain -> constrain is the identity
    on stationary/invertible coefficients, including near the boundary."""
    from kats_spark.models.arima import _constrain, _unconstrain

    for phi, theta in [([0.95], [0.8]), ([0.5, 0.3], [-0.4]), ([0.98], [-0.9])]:
        z = _unconstrain(np.array(phi, float), np.array(theta, float))
        cp, ct = _constrain(z, len(phi), len(theta))
        assert np.allclose(cp, phi, atol=1e-10)
        assert np.allclose(ct, theta, atol=1e-10)


def test_arima_mle_recovers_where_css_diverges():
    """VERDICT r02 item #2 'done' criterion: a seeded near-unit-root /
    strong-MA ARMA(1,1) where CSS measurably diverges (rel err 18% on
    this draw) while the exact Kalman MLE recovers both parameters
    within rtol 0.01 of the truth — and the MLE never scores below the
    CSS point on its own likelihood."""
    from kats_spark.models.arima import (
        _css_refine,
        _hannan_rissanen,
        _kalman_loglik,
        _mle_refine,
    )

    phi_t, th_t = 0.9, -0.95
    x = _sim_arma11(1000, phi_t, th_t, seed=12)
    xc = x - x.mean()
    p0, t0, _, _, _ = _hannan_rissanen(x, 1, 1)
    pc, tc = _css_refine(xc, p0, t0)
    pm, tm, s2 = _mle_refine(xc, pc, tc)
    css_err = max(abs(pc[0] - phi_t) / abs(phi_t), abs(tc[0] - th_t) / abs(th_t))
    mle_err = max(abs(pm[0] - phi_t) / abs(phi_t), abs(tm[0] - th_t) / abs(th_t))
    assert css_err > 0.05  # CSS genuinely diverges on this draw
    assert mle_err < 0.01  # exact MLE recovers the truth
    assert s2 > 0
    assert (
        _kalman_loglik(xc, pm, tm)[0] >= _kalman_loglik(xc, pc, tc)[0] - 1e-9
    )


def test_sarima_lagset_mle_improves_likelihood():
    """The sparse-lag-set MLE polish never scores below its CSS start on
    the exact likelihood, and stays stationary/invertible."""
    from kats_spark.models.arima import (
        _css_refine_lagset,
        _kalman_loglik,
        _mle_refine_lagset,
    )
    from kats_spark.models.sarima import _fit_lagset

    rng = np.random.default_rng(4)
    n, m = 400, 7
    e = rng.normal(0, 1, n + 100)
    x = np.zeros(n + 100)
    for t in range(m, n + 100):
        x[t] = 0.5 * x[t - 1] + 0.3 * x[t - m] + e[t] - 0.4 * e[t - 1]
    x = x[100:]
    ar_lags, ma_lags = [1, m], [1]
    phi, theta, mu, _, _ = _fit_lagset(x, ar_lags, ma_lags)
    xc = x - mu
    pc, tc = _css_refine_lagset(xc, phi, theta, ar_lags, ma_lags)

    def dense(c, lags):
        out = np.zeros(max(lags))
        for v, l in zip(c, lags):
            out[l - 1] = v
        return out

    pm, tm, s2 = _mle_refine_lagset(xc, pc, tc, ar_lags, ma_lags)
    ll_css = _kalman_loglik(xc, dense(pc, ar_lags), dense(tc, ma_lags))[0]
    ll_mle = _kalman_loglik(xc, dense(pm, ar_lags), dense(tm, ma_lags))[0]
    assert ll_mle >= ll_css - 1e-9
    assert s2 > 0
    assert np.all(np.abs(np.roots(np.r_[1.0, -dense(pm, ar_lags)])) < 1.0)
    # true parameters in the neighborhood
    assert abs(pm[0] - 0.5) < 0.15 and abs(pm[1] - 0.3) < 0.15


def test_kalman_scalar_fast_path_matches_generic():
    """The scalar-unrolled r<=3 filter must agree with the generic
    ndarray filter to ~1e-9 relative across random stationary/invertible
    draws, including near-boundary oscillatory roots."""
    from kats_spark.models.arima import (
        _constrain,
        _kalman_loglik_generic,
        _kalman_loglik_r3,
    )

    rng = np.random.default_rng(1)
    x = np.cumsum(rng.normal(0, 1, 700))
    xc = np.diff(x)
    xc = xc - xc.mean()
    checked = 0
    for _ in range(120):
        p = int(rng.integers(0, 4))
        q = int(rng.integers(0, 3))
        if p + q == 0:
            continue
        phi, theta = _constrain(rng.normal(0, 1.2, p + q), p, q)
        ll_a, s2_a = _kalman_loglik_r3(xc, phi, theta)
        ll_b, s2_b = _kalman_loglik_generic(xc, phi, theta)
        assert abs(ll_a - ll_b) < 1e-8 * max(1.0, abs(ll_b))
        assert abs(s2_a - s2_b) < 1e-8 * max(1.0, abs(s2_b))
        checked += 1
    assert checked > 80


def test_lang_id_ngram_beats_stopword_on_content_sentences(spark):
    """VERDICT r02 item #9 'done' criterion: the char-trigram profile
    kernel (IDF-weighted Cavnar-Trenkle) classifies content-word
    sentences — where the stopword heuristic sees nothing — at strictly
    higher accuracy, and still calls gibberish 'unknown'."""
    from kats_spark.operators.text import lang_id, lang_id_ngram

    rows = [
        ("en", "weather forecast available tomorrow morning throughout northern regions"),
        ("de", "wettervorhersage morgen verfügbar schönes spazieren gehen draußen"),
        ("es", "información meteorológica disponible mañana aprendizaje escritura niños"),
        ("fr", "prévisions météorologiques disponibles demain apprentissage écriture"),
        ("it", "previsioni meteorologiche disponibili domani apprendimento scrittura"),
        ("pt", "previsão meteorológica disponível amanhã aprendizagem escrita crianças"),
        ("nl", "weersvoorspelling morgen beschikbaar wandelen buiten lekker weer"),
        ("ru", "прогноз погоды доступен завтра утром обучение чтению письму"),
        ("id", "prakiraan cuaca tersedia besok pagi pembelajaran membaca menulis"),
        ("tr", "hava durumu tahmini yarın sabah mevcut okuma yazma öğrenimi"),
        ("unknown", "zxqv wplk djfh qwrt mnbv lkjh gfds poiu ytre"),
    ]
    pdf = pd.DataFrame(
        {"doc_id": range(len(rows)), "text": [t for _, t in rows],
         "expected": [l for l, _ in rows]}
    )
    df = spark.createDataFrame(pdf)
    ng = lang_id_ngram(df).toPandas()
    sw = lang_id(df).toPandas()[["doc_id", "lang_pred"]]
    m = pdf.merge(ng, on="doc_id").merge(sw, on="doc_id")
    acc_ng = float((m.lang_pred_ng == m.expected).mean())
    acc_sw = float((m.lang_pred == m.expected).mean())
    assert acc_ng == 1.0, list(zip(m.expected, m.lang_pred_ng))
    assert acc_ng > acc_sw  # stopword heuristic sees no function words here
    assert m.loc[m.expected == "unknown", "lang_pred_ng"].iloc[0] == "unknown"


def test_lang_id_ngram_agrees_with_stopword_on_function_word_text(spark):
    """On the original function-word fixture both kernels agree."""
    from kats_spark.operators.text import lang_id_ngram

    rows = [
        ("en", "the cat sat on the mat and it was happy that the sun is out"),
        ("de", "der hund und die katze sind nicht mit dem ball von den kindern"),
        ("es", "el perro y la gata que viven en un parque de los arboles se van con ellos"),
        ("fr", "le chien et la chatte dans les jardins des villes est une belle chose de plus"),
        ("ru", "и вот не кошка на столе что с собакой как это было по утрам то"),
    ]
    pdf = pd.DataFrame(
        {"doc_id": range(len(rows)), "text": [t for _, t in rows],
         "expected": [l for l, _ in rows]}
    )
    out = lang_id_ngram(spark.createDataFrame(pdf)).toPandas()
    m = pdf.merge(out, on="doc_id")
    assert (m.lang_pred_ng == m.expected).all(), list(zip(m.expected, m.lang_pred_ng))


def test_dup_components_min_label_clusters(spark):
    """Connected components over a pair list: chains, triangles, and
    isolated pairs all collapse to min-id cluster labels; a long path
    (needing pointer jumping, diameter 12) converges too."""
    from kats_spark.operators.dedup import dup_components

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    pairs += [(100 + i, 101 + i) for i in range(12)]  # path 100..112
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    out = {r.doc_id: r.cluster_id for r in dup_components(df).collect()}
    assert {out[i] for i in (1, 2, 3, 4)} == {1}
    assert {out[i] for i in (10, 11)} == {10}
    assert {out[i] for i in (20, 21, 22)} == {20}
    assert {out[100 + i] for i in range(13)} == {100}
    assert len(out) == 4 + 2 + 3 + 13


def test_dup_components_deterministic_and_bounded_plan(spark):
    """Re-running yields identical labels (deterministic), and the
    iterative loop's checkpointing keeps the plan flat enough that a
    500-node random graph converges without plan blowup."""
    import numpy as np

    from kats_spark.operators.dedup import dup_components

    rng = np.random.default_rng(7)
    n = 500
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (400, 2)) if a != b]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    a = sorted((r.doc_id, r.cluster_id) for r in dup_components(df).collect())
    b = sorted((r.doc_id, r.cluster_id) for r in dup_components(df).collect())
    assert a == b
    # verify against a union-find ground truth
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for u, v in edges:
        parent[find(u)] = find(v)
    import collections
    comp_min = collections.defaultdict(lambda: 10**9)
    nodes = {x for e in edges for x in e}
    for x in nodes:
        comp_min[find(x)] = min(comp_min[find(x)], x)
    expect = sorted((x, comp_min[find(x)]) for x in nodes)
    assert a == expect


def test_dup_components_wide_pair_graph_olog_rounds(spark):
    """1M-edge adversarial pair graph guard (VERDICT r03 item #5): a
    500k-node CHAIN (worst case for plain label propagation — diameter
    500k) plus a 500k-leaf STAR (worst case for skew — one hub in every
    neighbor-min group).  Pointer jumping must converge in O(log n)
    rounds, not O(diameter), and loop partitioning must scale with
    defaultParallelism rather than serializing through a constant."""
    import math

    from pyspark.sql import functions as F

    from kats_spark.operators.dedup import dup_components

    n_chain = 500_000
    hub = 10_000_000
    chain = spark.range(n_chain).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    star = spark.range(500_000).select(
        F.lit(hub).alias("id_a"), (F.col("id") + hub + 1).alias("id_b")
    )
    out = dup_components(chain.unionByName(star))
    agg = out.agg(
        F.countDistinct("cluster_id").alias("k"),
        F.count("*").alias("n"),
        F.min("cluster_id").alias("lo"),
        F.max("cluster_id").alias("hi"),
    ).first()
    assert agg.k == 2 and agg.lo == 0 and agg.hi == hub
    assert agg.n == (n_chain + 1) + 500_001
    # log2(500k) ~ 19; allow slack for propagate-vs-jump interleaving +
    # the fixpoint-detection round, but fail loudly at O(diameter)
    assert dup_components.last_rounds <= 2 * math.ceil(math.log2(n_chain)) + 2, (
        dup_components.last_rounds
    )
    """Kalman missing-data parity: with 12% of points deleted, the exact
    likelihood skips the update step at gaps (no interpolation bias in
    the estimator) and still recovers the AR(1) parameter; forecasts
    stay finite."""
    from kats_spark.models.arima import _arima_forecast_one, _kalman_loglik

    rng = np.random.default_rng(4)
    n, phi_t = 800, 0.85
    e = rng.normal(0, 1, n)
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = phi_t * y[t - 1] + e[t]
    y_gapped = y.copy()
    drop = rng.choice(np.arange(5, n - 5), size=int(0.12 * n), replace=False)
    y_gapped[drop] = np.nan
    # likelihood evaluates finite on the gapped series
    xc = y_gapped - np.nanmean(y_gapped)
    ll, s2 = _kalman_loglik(xc, np.array([phi_t]), np.zeros(0))
    assert np.isfinite(ll) and 0.8 < s2 < 1.3
    # and is maximized near the true phi (coarse profile check)
    lls = {p: _kalman_loglik(xc, np.array([p]), np.zeros(0))[0]
           for p in (0.5, 0.7, 0.85, 0.95)}
    assert max(lls, key=lls.get) == 0.85
    fc, se = _arima_forecast_one(y_gapped, 1, 0, 0, steps=5)
    assert np.all(np.isfinite(fc)) and np.all(np.isfinite(se))


def test_bm25_ranks_term_dense_docs_first(spark):
    """BM25: a short doc dense in query terms outranks a long one with a
    single mention; docs without any query term never appear; rare terms
    outweigh common ones via idf."""
    from kats_spark.operators.text import bm25_topk

    rows = [
        (1, "spark spark spark window"),                  # dense, short
        (2, "spark " + "filler " * 200),                  # one hit, long
        (3, "completely unrelated text about nothing"),   # no hits
        (4, "window join window join window"),
        (5, "rare-term here"),
    ] + [(10 + i, "common common common") for i in range(20)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    out = bm25_topk(df, ["spark", "window", "join"], k=10).toPandas()
    assert 3 not in set(out.doc_id)
    assert set(out.doc_id) <= {1, 2, 4}
    top = out.sort_values("score", ascending=False).doc_id.tolist()
    assert top[0] in (1, 4)           # dense docs first
    assert top[-1] == 2               # single long-doc mention last
    # idf: a term present in almost every doc scores near zero
    out2 = bm25_topk(df, ["common"], k=25).toPandas()
    assert (out2.score < 1.0).all()


def test_decontaminate_fuzzy_flags_edited_leakage(spark):
    """Minhash fuzzy decontamination: a train doc that leaked into the
    eval set with light edits (truncation + a changed word) is flagged
    with high estimated similarity; unrelated docs survive; the exact
    n-gram pass at 8-grams misses the same leak when edits break every
    shared 8-gram window."""
    from kats_spark.operators.dedup import decontaminate_fuzzy

    base = " ".join(f"tok{i}" for i in range(60))
    edited = " ".join(
        ("CHANGED" if i % 15 == 3 else f"tok{i}") for i in range(48)
    )
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                base,
                "totally different content about spark catalyst planning",
                "yet another unrelated document on window aggregation",
            ],
        }
    )
    ev = pd.DataFrame({"doc_id": [900], "text": [edited]})
    # single-row bands (bands = num_hashes): candidate iff ANY minhash
    # agrees — the right recall setting for edited leakage
    flagged, clean = decontaminate_fuzzy(
        spark.createDataFrame(train), spark.createDataFrame(ev),
        threshold=0.3, num_hashes=16, bands=16,
    )
    f = flagged.toPandas()
    assert list(f.doc_id) == [1]
    assert f.sim_hat.iloc[0] >= 0.3
    assert sorted(clean.toPandas().doc_id) == [2, 3]


def test_arima_select_order_recovers_true_orders():
    """Exact-likelihood information-criterion order selection (the
    auto-arima loop): BIC recovers the true (p, q) on 12/12 seeded
    AR(1)/MA(1)/AR(2)/ARMA(1,1) draws; AICc at worst overfits by one
    order (its documented behavior)."""
    from kats_spark.models.arima import select_order

    def sim(n, phi, theta, seed, burn=300):
        rng = np.random.default_rng(seed)
        e = rng.normal(0, 1, n + burn)
        x = np.zeros(n + burn)
        p, q = len(phi), len(theta)
        for t in range(max(p, q, 1), n + burn):
            x[t] = (
                sum(phi[i] * x[t - 1 - i] for i in range(p))
                + e[t]
                + sum(theta[j] * e[t - 1 - j] for j in range(q))
            )
        return x[burn:]

    cases = [([0.7], []), ([], [0.6]), ([0.6, -0.3], []), ([0.5], [0.4])]
    for phi, theta in cases:
        for seed in (1, 2, 3):
            x = sim(1200, phi, theta, seed)
            p, q, crit = select_order(x, method="bic")
            assert (p, q) == (len(phi), len(theta)), (phi, theta, seed, p, q)
            assert np.isfinite(crit)
    # aicc never UNDERfits on these draws
    for phi, theta in cases:
        x = sim(1200, phi, theta, 1)
        p, q, _ = select_order(x, method="aicc")
        assert p >= len(phi) or q >= len(theta)


def test_scrub_pii_categories_and_order(spark):
    """Sequential PII scrub: each category is counted and replaced; an
    email inside a URL counts as URL (order matters); text without PII
    passes through unchanged."""
    from kats_spark.operators.text import scrub_pii

    rows = [
        (1, "mail me at a.b+c@test.org or visit https://x.io/a@b.com now"),
        (2, "server 192.168.0.1 phone +44 20 7946 0958 done"),
        (3, "nothing sensitive here at all"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = {r.doc_id: r for r in scrub_pii(spark.createDataFrame(pdf)).collect()}
    r1 = out[1]
    assert (r1.n_url, r1.n_email) == (1, 1)  # the in-URL address is URL
    assert "<URL>" in r1.text_scrubbed and "<EMAIL>" in r1.text_scrubbed
    assert "a.b+c@test.org" not in r1.text_scrubbed
    r2 = out[2]
    assert (r2.n_ip, r2.n_phone) == (1, 1)
    assert "<IP>" in r2.text_scrubbed and "<PHONE>" in r2.text_scrubbed
    r3 = out[3]
    assert r3.text_scrubbed == "nothing sensitive here at all"
    assert (r3.n_url, r3.n_email, r3.n_ip, r3.n_phone) == (0, 0, 0, 0)


def test_damped_holt_flattens_and_beats_plain_on_decaying_trend(spark):
    """Damped Holt (HoltWintersParams damped=True surface): on a series
    whose trend decays, the damped model's holdout error beats plain
    Holt, and its long-horizon forecast flattens instead of
    extrapolating linearly."""
    from kats_spark.models import fcst

    rng = np.random.default_rng(2)
    n = 160
    t = np.arange(n + 24, dtype=float)
    y_full = 50 + 30 * (1 - 0.97**t) + rng.normal(0, 0.4, n + 24)
    rows = [
        ("s", pd.Timestamp("2024-01-01") + pd.Timedelta(hours=int(i)), float(y_full[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series_id", "time", "value"]))
    damped = fcst.forecast(df, steps=24, freq_seconds=3600, model="holt_damped").toPandas()
    plain = fcst.forecast(df, steps=24, freq_seconds=3600, model="holt").toPandas()
    truth = y_full[n:]
    err_d = float(np.mean((damped.sort_values("time").fcst.to_numpy() - truth) ** 2))
    err_p = float(np.mean((plain.sort_values("time").fcst.to_numpy() - truth) ** 2))
    assert err_d < err_p, (err_d, err_p)
    # flattening: the last 5 damped steps move less than the first 5
    fd = damped.sort_values("time").fcst.to_numpy()
    assert abs(fd[-1] - fd[-6]) < abs(fd[5] - fd[0])


def test_reconcile_all_weight_methods_coherent(spark):
    """The generalized GLS reconciler (struc/svar/hvar/mint_sample/
    mint_shrink — the reference's full get_W surface): every method
    yields COHERENT forecasts (agg == sum of its k base steps), the
    methods genuinely differ on heteroskedastic data, and mint_shrink
    interpolates between sample covariance and its diagonal."""
    from kats_spark.operators.reconciliation import reconcile_forecast

    rng = np.random.default_rng(9)
    n, k, steps = 144, 6, 12
    rows = []
    for sid in ("x", "y"):
        t = np.arange(n)
        noise = rng.normal(0, 0.2 + 1.5 * (t % k == 0), n)  # position-skewed
        y = 20 + 0.3 * t + noise
        for i in range(n):
            rows.append((sid, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=int(i)), float(y[i])))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series_id", "time", "value"]))
    outs = {}
    for method in ("struc", "svar", "hvar", "mint_sample", "mint_shrink"):
        out = (
            reconcile_forecast(df, steps, 3600, k, method=method)
            .toPandas()
            .sort_values(["series_id", "level", "time"])
        )
        outs[method] = out
        base = out[out.level == "base"].sort_values(["series_id", "time"])
        agg = out[out.level == "agg"].sort_values(["series_id", "time"])
        assert len(base) == 2 * steps and len(agg) == 2 * (steps // k)
        for sid in ("x", "y"):
            b = base[base.series_id == sid].fcst.to_numpy()
            a = agg[agg.series_id == sid].fcst.to_numpy()
            sums = b.reshape(-1, k).sum(1)
            assert np.allclose(sums, a, atol=1e-9), method
    # hvar sees the position-skewed noise -> differs from struc
    d = np.abs(
        outs["hvar"][outs["hvar"].level == "base"].fcst.to_numpy()
        - outs["struc"][outs["struc"].level == "base"].fcst.to_numpy()
    )
    assert d.max() > 1e-6


def test_reconcile_struc_general_matches_literal_g_matrix():
    """The general reconciler with method='struc' reproduces the literal
    struc G-matrix projection (the oracle-checked path) numerically."""
    import numpy as np

    from kats_spark.operators.reconciliation import (
        _g_from_w,
        _w_matrix,
        struc_g_matrix,
    )

    for k in (2, 4, 6, 24):
        W, diag = _w_matrix(np.zeros((k + 1, 5)), "struc", k)
        G = _g_from_w(W, diag, k)
        G_lit = np.array(struc_g_matrix(k))
        assert np.allclose(G, G_lit, atol=1e-10), k


def test_detector_select_tournament(spark):
    """Self-supervised detector selection: deterministic 6-sigma spike
    injection, three window detectors benchmarked by F1, argmax per
    series.  On gaussian noise the winner catches most injections; the
    output is deterministic and one row per series."""
    from kats_spark.models.metalearner import detector_select

    rng = np.random.default_rng(3)
    rows = []
    for sid in ("a", "b"):
        y = rng.normal(0, 1, 600)
        for i in range(600):
            rows.append((sid, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i), float(y[i])))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series_id", "time", "value"]))
    out = detector_select(df).toPandas().sort_values("series_id").reset_index(drop=True)
    assert len(out) == 2
    assert (out.n_injected == 6).all()  # 600 // 97
    assert (out.best_f1 >= 0.6).all()
    assert set(out.best_detector) <= {"zscore", "mad", "iqr"}
    out2 = detector_select(df).toPandas().sort_values("series_id").reset_index(drop=True)
    assert out.equals(out2)


def test_bigram_logppl_separates_scrambled_from_fluent(spark):
    """The bigram LM sees word ORDER (unigram cannot): documents built
    from the same vocabulary but scrambled word order score higher
    perplexity than the fluent originals."""
    from kats_spark.operators.sampling import bigram_logppl, unigram_logppl

    base = "the quick brown fox jumps over the lazy dog".split()
    rng = np.random.default_rng(4)
    rows = []
    for i in range(20):  # fluent: same sentence repeated
        rows.append((i, " ".join(base)))
    for i in range(20, 25):  # scrambled: same words, shuffled
        perm = list(base)
        rng.shuffle(perm)
        rows.append((i, " ".join(perm)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    bg = bigram_logppl(df).toPandas().set_index("doc_id")
    fluent = bg.loc[:19, "logppl"].max()
    scrambled = bg.loc[20:, "logppl"].min()
    assert scrambled > fluent + 0.5, (fluent, scrambled)
    # unigram is blind to the scrambling
    ug = unigram_logppl(df).toPandas().set_index("doc_id")
    assert abs(ug.loc[:19, "logppl"].mean() - ug.loc[20:, "logppl"].mean()) < 0.05


def test_arima_param_stderr_matches_asymptotic_ar1():
    """Observed-information standard errors (the statsmodels bse
    surface): for AR(1) the Kalman-Hessian stderr matches the plug-in
    asymptotic sqrt((1 - phi_hat^2)/n) within 2%."""
    from kats_spark.models.arima import (
        _css_refine,
        _hannan_rissanen,
        _mle_refine,
        param_stderr,
    )

    rng = np.random.default_rng(2)
    n, phi_t = 2000, 0.7
    e = rng.normal(0, 1, n)
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = phi_t * y[t - 1] + e[t]
    xc = y - y.mean()
    p0, t0, *_ = _hannan_rissanen(y, 1, 0)
    pc, tc = _css_refine(xc, p0, t0)
    pm, tm, _ = _mle_refine(xc, pc, tc)
    se = param_stderr(xc, pm, tm)
    plug_in = np.sqrt((1 - pm[0] ** 2) / n)
    assert abs(se[0] / plug_in - 1.0) < 0.02
    # ARMA(1,1): finite positive stderrs for both params
    e2 = rng.normal(0, 1, n)
    y2 = np.zeros(n)
    for t in range(1, n):
        y2[t] = 0.6 * y2[t - 1] + e2[t] + 0.4 * e2[t - 1]
    xc2 = y2 - y2.mean()
    p0, t0, *_ = _hannan_rissanen(y2, 1, 1)
    pc, tc = _css_refine(xc2, p0, t0)
    pm, tm, _ = _mle_refine(xc2, pc, tc)
    se2 = param_stderr(xc2, pm, tm)
    assert np.all(np.isfinite(se2)) and np.all(se2 > 0) and np.all(se2 < 0.2)


def test_snapshot_diff_classifies_all_transitions(spark):
    """added / removed / changed / unchanged all classified; whitespace
    and case changes do NOT count as changes (normalized fingerprint)."""
    from kats_spark.operators.dedup import snapshot_diff

    old = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["a b", "keep me", "going away", "Case  Test"]})
    new = pd.DataFrame({"doc_id": [1, 2, 4, 9], "text": ["a b c", "keep me", "  case test ", "fresh"]})
    out = {
        r.doc_id: r.status
        for r in snapshot_diff(
            spark.createDataFrame(old), spark.createDataFrame(new)
        ).collect()
    }
    assert out == {1: "changed", 2: "unchanged", 3: "removed",
                   4: "unchanged", 9: "added"}


def test_ljung_box_separates_white_noise_from_ar(spark):
    """Ljung-Box: white noise stays below the chi2(10) 99th percentile
    (23.2); an AR(1) series blows far past it; the statistic matches the
    numpy closed form."""
    from kats_spark.functions.acf import ljung_box

    rng = np.random.default_rng(7)
    n = 500
    wn = rng.normal(0, 1, n)
    ar = np.zeros(n)
    for t in range(1, n):
        ar[t] = 0.6 * ar[t - 1] + rng.normal(0, 1)
    rows = []
    for sid, y in (("wn", wn), ("ar", ar)):
        for i in range(n):
            rows.append((sid, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i), float(y[i])))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series_id", "time", "value"]))
    out = ljung_box(df, lags=10).toPandas().set_index("series_id")
    assert out.loc["wn", "q_stat"] < 23.2
    assert out.loc["ar", "q_stat"] > 100
    # closed form check on the white-noise series
    c = wn - wn.mean()
    ss = float(c @ c)
    q = 0.0
    for k in range(1, 11):
        rho = float(c[k:] @ c[:-k]) / ss
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    assert abs(out.loc["wn", "q_stat"] - q) < 1e-4


def test_zipf_fit_separates_natural_from_uniform(spark):
    """The Zipf audit: tokens drawn from a Zipf(1) distribution fit
    slope ~ -1 with high r2; a uniform-vocabulary corpus is flat — the
    signal that a corpus is templated/synthetic rather than natural."""
    from kats_spark.operators.text import zipf_fit

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(500)]
    p = 1.0 / np.arange(1, 501)
    p /= p.sum()
    zipf_docs = [
        " ".join(rng.choice(vocab, size=80, p=p)) for _ in range(300)
    ]
    unif_docs = [
        " ".join(rng.choice(vocab, size=80)) for _ in range(300)
    ]
    za = zipf_fit(
        spark.createDataFrame(pd.DataFrame({"text": zipf_docs})), top_n=300
    ).collect()[0]
    ua = zipf_fit(
        spark.createDataFrame(pd.DataFrame({"text": unif_docs})), top_n=300
    ).collect()[0]
    assert -1.3 < za.zipf_slope < -0.7 and za.zipf_r2 > 0.9
    assert ua.zipf_slope > -0.3


def test_arima_interval_empirical_coverage():
    """Interval honesty: across 250 seeded AR(1) worlds, the 95%
    one-step band contains the realized next value at a rate consistent
    with its nominal level (binomial 99% acceptance region)."""
    from kats_spark.models.arima import _arima_forecast_one

    rng = np.random.default_rng(17)
    hits = 0
    trials = 250
    for _ in range(trials):
        n, phi = 240, 0.7
        e = rng.normal(0, 1, n + 1)
        y = np.zeros(n + 1)
        for t in range(1, n + 1):
            y[t] = phi * y[t - 1] + e[t]
        fc, se = _arima_forecast_one(y[:-1], 1, 0, 0, steps=1, method="css")
        lo, hi = fc[0] - 1.96 * se[0], fc[0] + 1.96 * se[0]
        hits += lo <= y[-1] <= hi
    rate = hits / trials
    assert 0.90 <= rate <= 0.985, rate


def test_bigram_logppl_zipf_head_1m_docs(spark):
    """VERDICT r03 item #9 guard: a Zipf-extreme corpus where every doc
    shares the same context head ('the' begins every bigram but one) —
    the shape where the context join piles one __w1 key onto one task.
    The count-guarded big-corpus path (persisted pre-aggregation +
    head-broadcast escape hatch) runs it with exact closed-form scores.

    Docs: 'the the the u<i>' -> bigrams (the,the) x2, (the,u<i>).
    c12(the,the)=2N, c12(the,u_i)=1 each; c1(the)=3N; |V|=N+1."""
    import numpy as np

    from kats_spark.operators.sampling import bigram_logppl

    n_docs = 1_000_000
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the the the u"), F.col("id").cast("string")).alias("text"),
    )
    out = bigram_logppl(docs, alpha=1.0)
    agg = out.agg(
        F.count("*").alias("n"),
        F.min("logppl").alias("lo"),
        F.max("logppl").alias("hi"),
        F.min("n_bigrams").alias("bmin"),
        F.max("n_bigrams").alias("bmax"),
    ).collect()[0]
    assert agg.n == n_docs and agg.bmin == agg.bmax == 3
    vocab = n_docs + 1
    c1 = 3 * n_docs
    p_tt = (2 * n_docs + 1.0) / (c1 + vocab)
    p_tu = (1 + 1.0) / (c1 + vocab)
    expect = -(2 * np.log(p_tt) + np.log(p_tu)) / 3.0
    assert abs(agg.lo - expect) < 1e-9 and abs(agg.hi - expect) < 1e-9, (
        agg.lo, agg.hi, expect,
    )


def test_lang_id_ngram_twenty_languages(spark):
    """Round-4 breadth (VERDICT r03 'missing' #5): content-word
    sentences in all ten NEW seed languages classify correctly alongside
    the original ten — including the hard neighbor pairs (uk vs ru,
    cs vs pl, ro vs it/es) — and gibberish stays 'unknown'."""
    from kats_spark.operators.text import lang_id_ngram

    rows = [
        ("pl", "prognoza pogody dostępna jutro rano nauka czytania pisania dzieci"),
        ("sv", "väderprognos tillgänglig imorgon bitti promenad vackert väder lärande"),
        ("fi", "sääennuste saatavilla huomenna aamulla lukemisen kirjoittamisen oppiminen"),
        ("cs", "předpověď počasí dostupná zítra ráno učení čtení psaní děti"),
        ("ro", "prognoza meteo disponibilă mâine dimineață învățarea citirii scrierii"),
        ("hu", "időjárás előrejelzés elérhető holnap reggel olvasás írás tanulása"),
        ("vi", "dự báo thời tiết có sẵn sáng mai việc học đọc viết của trẻ em"),
        ("uk", "прогноз погоди доступний завтра вранці навчання читання письма дітей"),
        ("el", "πρόγνωση καιρού διαθέσιμη αύριο το πρωί εκμάθηση ανάγνωσης γραφής"),
        ("sw", "utabiri wa hali ya hewa unapatikana kesho asubuhi kujifunza kusoma kuandika"),
        # originals still green beside the new neighbors
        ("ru", "прогноз погоды доступен завтра утром обучение чтению письму"),
        ("it", "previsioni meteorologiche disponibili domani apprendimento scrittura"),
        ("es", "información meteorológica disponible mañana aprendizaje escritura niños"),
        ("unknown", "zxqv wplk djfh qwrt mnbv lkjh gfds poiu ytre"),
    ]
    pdf = pd.DataFrame(
        {"doc_id": range(len(rows)), "text": [t for _, t in rows],
         "expected": [l for l, _ in rows]}
    )
    out = lang_id_ngram(spark.createDataFrame(pdf)).toPandas()
    m = pdf.merge(out, on="doc_id")
    assert (m.lang_pred_ng == m.expected).all(), list(
        zip(m.expected, m.lang_pred_ng)
    )


def test_sketch_profile_error_bounds(spark):
    """sketch_profile's HLL++ vocab estimate lands within 3x the
    configured rsd of the exact count, and the approx median within one
    token of the exact median — the sketches a 100 TB profile would run
    are measured against their exact twins on every call."""
    from kats_spark.operators.text import sketch_profile

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    row = sketch_profile(docs, rsd=0.02).collect()[0]
    assert row.n_docs == 500 and row.n_tokens > 0
    assert row.vocab_exact > 0
    assert row.vocab_rel_err <= 3 * 0.02
    assert abs(row.len_p50_approx - row.len_p50_exact) <= 1.0
    assert row.len_p90_approx >= row.len_p50_approx


def test_temperature_mixture_sample_contract(spark):
    """temperature_mixture_sample: budgets follow n^alpha (alpha < 1
    shifts share toward tail languages vs proportional), per-bucket
    fills respect their own budget line, and the salted plan produces
    the identical row set."""
    from kats_spark.operators.sampling import temperature_mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    flat = (
        temperature_mixture_sample(
            docs, total_budget=20000, alpha=0.5, by=["lang"], seed=7
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    prop = temperature_mixture_sample(
        docs, total_budget=20000, alpha=1.0, by=["lang"], seed=7
    ).toPandas()
    # every kept row STARTED under its bucket budget
    assert ((flat.cum_tokens - flat.n_tokens) < flat["__budget"]).all()
    # alpha < 1 gives the smallest language a larger budget than alpha=1
    bud_flat = flat.groupby("lang")["__budget"].first()
    bud_prop = prop.groupby("lang")["__budget"].first()
    tail = bud_prop.idxmin()
    head = bud_prop.idxmax()
    assert bud_flat[tail] > bud_prop[tail]
    assert bud_flat[head] < bud_prop[head]
    # salted plan = identical rows
    salted = (
        temperature_mixture_sample(
            docs, total_budget=20000, alpha=0.5, by=["lang"], seed=7,
            salt_shards=256,
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(salted.doc_id) == list(flat.doc_id)
    assert list(salted.cum_tokens) == list(flat.cum_tokens)


def test_pack_sequences_contract(spark):
    """Concat-and-chunk packing: exact prefix-sum invariants — offsets
    within [0, seq_len), sequence ids consistent with cum_tokens, the
    token stream fully covered with no gaps, and the salted plan
    bit-identical to the naive window."""
    from kats_spark.operators.sampling import pack_sequences

    rng = np.random.default_rng(11)
    rows = [
        {"doc_id": i, "text": " ".join(f"w{j}" for j in range(int(rng.integers(1, 90))))}
        for i in range(400)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = (
        pack_sequences(df, seq_len=128, seed=3, salt_shards=1)
        .toPandas()
        .sort_values("cum_tokens")
        .reset_index(drop=True)
    )
    assert len(out) == 400
    # the concatenated stream is gapless: each doc starts where the
    # previous ended
    starts = out.cum_tokens - out.n_tokens
    assert starts.iloc[0] == 0
    assert (starts.iloc[1:].values == out.cum_tokens.iloc[:-1].values).all()
    assert ((out.offset_in_seq >= 0) & (out.offset_in_seq < 128)).all()
    assert (out.seq_first == starts // 128).all()
    assert (out.seq_last == (out.cum_tokens - 1) // 128).all()
    assert (out.n_seqs_spanned == out.seq_last - out.seq_first + 1).all()
    # boundary-spanning docs exist in a random-length corpus
    assert (out.n_seqs_spanned > 1).any()
    for shards in (16, 256):
        salted = (
            pack_sequences(df, seq_len=128, seed=3, salt_shards=shards)
            .toPandas()
            .sort_values("cum_tokens")
            .reset_index(drop=True)
        )
        assert salted.equals(out), f"salt_shards={shards} diverged"


def test_chunk_documents_contract(spark):
    """Overlapping token-window chunking: stride = chunk - overlap,
    full coverage, correct final-partial handling, consecutive chunks
    share exactly `overlap` tokens, short/empty docs yield one chunk."""
    from kats_spark.operators.text import chunk_documents

    rows = [
        {"doc_id": 1, "text": " ".join(f"t{j}" for j in range(100))},
        {"doc_id": 2, "text": " ".join(f"t{j}" for j in range(40))},  # = chunk
        {"doc_id": 3, "text": "a b c"},  # shorter than overlap
        {"doc_id": 4, "text": "   "},  # empty after trim
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = (
        chunk_documents(df, chunk_size=40, overlap=10)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    # 100 tokens, stride 30: minimal full cover = starts 0,30,60 (the
    # chunk at 60 reaches token 99, so no 4th start is emitted)
    assert list(d1.start_tok) == [0, 30, 60]
    assert list(d1.chunk_len) == [40, 40, 40]
    texts = list(d1.chunk_text)
    for a, b in zip(texts, texts[1:]):
        assert a.split()[-10:] == b.split()[:10]  # overlap carried
    # coverage: union of [start, start+len) is exactly [0, 100)
    covered = set()
    for s, ln in zip(d1.start_tok, d1.chunk_len):
        covered |= set(range(s, s + ln))
    assert covered == set(range(100))
    assert list(out[out.doc_id == 2].chunk_len) == [40]
    assert list(out[out.doc_id == 3].chunk_len) == [3]
    d4 = out[out.doc_id == 4]
    assert list(d4.chunk_len) == [0] and list(d4.chunk_text) == [""]


def test_tfidf_topk_pairs_matches_numpy(spark):
    """Full-vocab (top_m >= vocab) TF-IDF cosine top-k equals a dense
    numpy computation of the same smoothed-idf weighting."""
    from kats_spark.operators.text import tfidf_topk_pairs

    corpus = {
        1: "apple banana apple cherry",
        2: "apple banana banana date",
        3: "cherry date elderberry fig",
        4: "apple apple apple banana cherry",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(corpus), "text": list(corpus.values())})
    )
    out = (
        tfidf_topk_pairs(df, k=2, top_m=100)
        .toPandas()
        .sort_values(["id_a", "rk"])
        .reset_index(drop=True)
    )
    vocab = sorted({t for c in corpus.values() for t in c.split()})
    N = len(corpus)
    mat = np.zeros((N, len(vocab)))
    ids = sorted(corpus)
    docs = [corpus[i].split() for i in ids]
    for r, toks in enumerate(docs):
        for c, t in enumerate(vocab):
            tf = toks.count(t)
            df_t = sum(t in d for d in docs)
            if tf:
                mat[r, c] = (1 + np.log(tf)) * (np.log((1 + N) / (1 + df_t)) + 1)
    nrm = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(nrm, nrm)
    for r, i in enumerate(ids):
        order = sorted(
            (j for j in range(N) if j != r),
            key=lambda j: (-round(cos[r, j] + 1e-9, 6), ids[j]),
        )[:2]
        got = out[out.id_a == i]
        assert list(got.id_b) == [ids[j] for j in order], f"doc {i}"
        for _, row in got.iterrows():
            j = ids.index(row.id_b)
            assert abs(row.cos_sim - round(cos[r, j] + 1e-9, 6)) < 2e-6


def test_tfidf_posting_cap_bounds_candidates(spark):
    """posting_cap: on a collapsed vocabulary (every doc = same terms)
    the capped plan emits at most vocab * cap^2-bounded pair volume and
    keeps the cap highest-weight docs per term (deterministic).  Here
    cap=2 on 6 identical-vocab docs -> each term's posting list is 2, so
    each doc can pair only within the capped lists."""
    from kats_spark.operators.text import tfidf_topk_pairs

    rows = [
        {"doc_id": i, "text": " ".join(["alpha"] * (i + 1) + ["beta"] * 2)}
        for i in range(6)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = tfidf_topk_pairs(df, k=5, top_m=10, posting_cap=2).toPandas()
    # alpha's capped postings = the 2 highest-weight docs (5, 4); beta's
    # weights are equal -> tie-break keeps docs 0, 1.  Only ids in some
    # capped posting list can appear at all.
    assert set(out.id_a) <= {0, 1, 4, 5}
    assert set(out.id_b) <= {0, 1, 4, 5}
    # pair volume is bounded: each side's candidates come from 2-entry
    # posting lists over 2 terms -> at most 2 neighbors per doc
    assert out.groupby("id_a").size().max() <= 2
    # uncapped run on the same frame reaches all 6 docs
    full = tfidf_topk_pairs(df, k=5, top_m=10).toPandas()
    assert set(full.id_a) == set(range(6))


def test_split_assign_stable_and_proportional(spark):
    """split_assign: proportions approach the weights, assignment is a
    pure function of (seed, id) — appending rows never moves an
    existing doc's split — and normalization handles non-unit weights."""
    from kats_spark.operators.sampling import split_assign

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = split_assign(df, {"train": 8, "val": 1, "test": 1}, seed=3).toPandas()
    frac = out.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    # stability: the same ids in a larger frame get the same split
    big = split_assign(
        spark.range(4000).withColumnRenamed("id", "doc_id"),
        {"train": 8, "val": 1, "test": 1},
        seed=3,
    ).toPandas()
    merged = out.merge(big, on="doc_id", suffixes=("_a", "_b"))
    assert (merged.split_a == merged.split_b).all()
    # different seed reshuffles
    other = split_assign(df, {"train": 8, "val": 1, "test": 1}, seed=4).toPandas()
    m2 = out.merge(other, on="doc_id", suffixes=("_a", "_b"))
    assert (m2.split_a != m2.split_b).any()


def test_epoch_upsample_multiplicity(spark):
    """epoch_upsample: floor(e) copies always, the fractional extra on
    ~frac(e) of docs, epoch_ix dense from 0, e < 1 may drop docs but
    keeps the expected count."""
    from kats_spark.operators.sampling import epoch_upsample

    df = (
        spark.range(3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("epochs", F.lit(2.3))
    )
    out = epoch_upsample(df).toPandas()
    per = out.groupby("doc_id").size()
    assert set(per.unique()) == {2, 3}
    assert abs(per.mean() - 2.3) < 0.05
    assert (out.groupby("doc_id").epoch_ix.min() == 0).all()
    # e < 1: subsampling regime
    down = epoch_upsample(
        spark.range(3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("epochs", F.lit(0.4))
    ).toPandas()
    assert abs(len(down) / 3000 - 0.4) < 0.05
    assert (down.epoch_ix == 0).all()


def test_decontaminate_hashed_one_sided_vs_exact(spark):
    """Hashed-gram decontamination: flags a SUPERSET of the exact twin's
    docs (one-sided error — no contamination leaks into clean); with
    64-bit hashes and this gram volume the flagged sets and counts
    coincide exactly."""
    from kats_spark.operators.sampling import decontaminate, decontaminate_hashed

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    evals = docs.filter(F.col("doc_id") % 5 == 0).limit(40)
    fe, ce = decontaminate(train, evals, shingle_n=8)
    fh, ch = decontaminate_hashed(train, evals, shingle_n=8)
    exact = {r.doc_id: r.n_gram_hits for r in fe.collect()}
    hashed = {r.doc_id: r.n_gram_hits for r in fh.collect()}
    assert set(exact) <= set(hashed)  # no false negatives
    for d, n in exact.items():
        assert hashed[d] >= n
    assert ch.count() <= ce.count()  # clean can only shrink
    # 64-bit collisions are numerically absent at this volume
    assert hashed == exact


def test_incremental_neardup_no_within_side_pairs(spark):
    """incremental_neardup_pairs: every emitted pair crosses sides, an
    exact duplicate planted in the batch is found against its corpus
    source, and a fresh batch doc pairs with nothing."""
    from kats_spark.operators.dedup import incremental_neardup_pairs

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "the quick brown fox jumps over the lazy dog tonight again",
                    "structured streaming stateful operators with watermark rules",
                ],
            }
        )
    )
    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [100, 101],
                "text": [
                    "the quick brown fox jumps over the lazy dog tonight again",
                    "utterly unrelated content mentioning nothing shared at all",
                ],
            }
        )
    )
    out = incremental_neardup_pairs(batch, corpus).toPandas()
    assert list(out.new_id) == [100]
    assert list(out.corpus_id) == [1]


def test_per_source_cap_contract(spark):
    """per_source_cap: at most cap rows per bucket, survivors are the
    md5-first ranks, and survivors are stable when more docs arrive
    until the bucket fills."""
    from kats_spark.operators.sampling import per_source_cap

    rows = [
        {"doc_id": i, "source": "web" if i % 2 else "book"} for i in range(200)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = per_source_cap(df, cap=10, seed=1).toPandas()
    sizes = out.groupby("source").size()
    assert (sizes == 10).all()
    assert set(out.bucket_rank) == set(range(1, 11))
    # append-stability: halving the corpus keeps every survivor that is
    # still present ranked no worse
    half = per_source_cap(
        spark.createDataFrame(pd.DataFrame(rows[:100])), cap=10, seed=1
    ).toPandas()
    merged = out.merge(half, on="doc_id", suffixes=("_full", "_half"))
    assert (merged.bucket_rank_half <= merged.bucket_rank_full).all()


def test_dup_span_fraction_planted_copy(spark):
    """dup_span_fraction: a doc sharing a verbatim 25-token run with
    another scores dup_frac > 0 on exactly the shared windows; an
    unrelated doc scores 0; a full verbatim copy scores 1."""
    from kats_spark.operators.dedup import dup_span_fraction

    shared = " ".join(f"s{j}" for j in range(25))
    rows = [
        {"doc_id": 1, "text": shared + " tail1 tail2 tail3 tail4 tail5"},
        {"doc_id": 2, "text": "head1 head2 head3 head4 head5 " + shared},
        {"doc_id": 3, "text": " ".join(f"u{j}" for j in range(30))},
        {"doc_id": 4, "text": " ".join(f"u{j}" for j in range(30))},  # verbatim copy of 3
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = dup_span_fraction(df, span_n=20).toPandas().set_index("doc_id")
    # docs 1/2: 30 tokens -> 11 windows each; the shared 25-token run
    # contributes 6 identical 20-token windows to both
    assert out.loc[1, "n_spans"] == 11
    assert out.loc[1, "n_dup_spans"] == 6
    assert out.loc[2, "n_dup_spans"] == 6
    assert abs(out.loc[1, "dup_frac"] - 6 / 11) < 1e-5
    assert out.loc[3, "dup_frac"] > 0.999  # verbatim pair: every window shared
    assert out.loc[4, "dup_frac"] > 0.999


def test_excise_dup_spans_semantics(spark):
    """excise_dup_spans: a shared 5-token run is cut from every carrier
    (coverage extends span_n-1 tokens past each duplicated start); docs
    shorter than span_n pass through unchanged; unique text survives;
    a verbatim pair is excised to empty.  xxhash64 and portable string
    keys agree."""
    from kats_spark.operators.dedup import excise_dup_spans

    shared = " ".join(f"s{j}" for j in range(5))  # exactly one 5-window
    rows = [
        {"doc_id": 1, "text": "a1 a2 " + shared + " a3 a4"},
        {"doc_id": 2, "text": shared + " b1 b2 b3 b4 b5"},
        {"doc_id": 3, "text": "c1 c2 c3 c4 c5 c6"},  # unique, untouched
        {"doc_id": 4, "text": "d1 d2 d3"},  # shorter than span_n
        {"doc_id": 5, "text": "e1 e2 e3 e4 e5 e6 e7"},
        {"doc_id": 6, "text": "e1 e2 e3 e4 e5 e6 e7"},  # verbatim pair
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    for portable in (False, True):
        out = (
            excise_dup_spans(df, span_n=5, min_docs=2, portable=portable)
            .toPandas()
            .set_index("doc_id")
        )
        # doc 1: only the s0..s4 window is duplicated -> those 5 go
        assert out.loc[1, "clean_text"] == "a1 a2 a3 a4"
        assert out.loc[1, "n_removed"] == 5
        # doc 2: same span at position 0
        assert out.loc[2, "clean_text"] == "b1 b2 b3 b4 b5"
        assert out.loc[3, "n_removed"] == 0
        assert out.loc[3, "clean_text"] == "c1 c2 c3 c4 c5 c6"
        assert out.loc[4, "clean_text"] == "d1 d2 d3"  # no windows
        # verbatim pair: every one of the 3 windows duplicated -> all
        # 7 tokens covered, reassembly is the empty string
        assert out.loc[5, "n_removed"] == 7
        assert out.loc[5, "clean_text"] == ""
        assert out.loc[6, "clean_text"] == ""


def test_excise_vs_corpus_semantics(spark):
    """excise_vs_corpus: batch tokens covered by corpus spans are cut,
    novel batch text survives, and batch-INTERNAL duplication is
    deliberately ignored (that's excise_dup_spans' job)."""
    from kats_spark.operators.dedup import excise_vs_corpus

    shared = " ".join(f"s{j}" for j in range(6))  # two corpus 5-windows
    corpus = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 1, "text": shared + " c1 c2 c3"},
                {"doc_id": 2, "text": "d1 d2 d3 d4 d5 d6"},
            ]
        )
    )
    batch_dup = " ".join(f"q{j}" for j in range(5))
    batch = spark.createDataFrame(
        pd.DataFrame(
            [
                # corpus span + novel tail: span cut, tail kept
                {"doc_id": 10, "text": shared + " n1 n2 n3 n4 n5"},
                # batch-internal duplicate pair, absent from corpus: kept
                {"doc_id": 11, "text": batch_dup + " m1 m2"},
                {"doc_id": 12, "text": batch_dup + " m3 m4"},
                # shorter than span_n: no windows, untouched
                {"doc_id": 13, "text": "p1 p2 p3"},
            ]
        )
    )
    for portable in (False, True):
        out = (
            excise_vs_corpus(batch, corpus, span_n=5, portable=portable)
            .toPandas()
            .set_index("doc_id")
        )
        assert out.loc[10, "clean_text"] == "n1 n2 n3 n4 n5"
        assert out.loc[10, "n_removed"] == 6
        assert out.loc[11, "n_removed"] == 0
        assert out.loc[11, "clean_text"] == batch_dup + " m1 m2"
        assert out.loc[12, "n_removed"] == 0
        assert out.loc[13, "clean_text"] == "p1 p2 p3"


def test_embedding_pca_matches_numpy(spark):
    """embedding_pca: distributed gram/mean partials reproduce the dense
    numpy covariance spectrum; a rank-deficient construction shows up in
    the participation ratio."""
    from kats_spark.operators.similarity import embedding_pca

    rng = np.random.default_rng(2)
    # 2 dominant directions in 8 dims + small noise
    basis = rng.normal(size=(2, 8))
    X = rng.normal(size=(300, 2)) @ basis + 0.01 * rng.normal(size=(300, 8))
    df = spark.createDataFrame(
        pd.DataFrame({"embedding": [row.tolist() for row in X]})
    )
    out = embedding_pca(df, top_k=8).toPandas().sort_values("component")
    cov = np.cov(X, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)[::-1]
    assert np.allclose(out.eigenvalue.values, evals, rtol=1e-8)
    pr = evals.sum() ** 2 / (evals**2).sum()
    assert abs(out.participation_ratio.iloc[0] - pr) < 1e-8
    assert pr < 2.5  # the planted 2-direction structure
    assert out.cum_var_explained.iloc[1] > 0.99


def test_hash_embed_geometry(spark):
    """hash_embed: unit norms; verbatim copies map to identical vectors;
    a one-token edit stays close in cosine; token-disjoint docs stay far."""
    from kats_spark.operators.text import hash_embed

    base = " ".join(f"w{j}" for j in range(60))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},  # verbatim
        {"doc_id": 3, "text": base.replace("w30", "edited")},
        {"doc_id": 4, "text": " ".join(f"z{j}" for j in range(60))},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = hash_embed(df, dim=64).toPandas().set_index("doc_id")
    vecs = {i: np.array(out.loc[i, "embedding"]) for i in out.index}
    for v in vecs.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    cos = lambda a, b: float(a @ b)
    assert cos(vecs[1], vecs[2]) > 0.9999
    assert cos(vecs[1], vecs[3]) > 0.9
    assert abs(cos(vecs[1], vecs[4])) < 0.5
    assert (out.n_tokens == 60).all()


def test_psi_drift_detects_planted_shift(spark):
    """psi_drift: a mean-shifted after-window scores PSI above the 0.25
    major-shift line while an unshifted key stays under 0.1; counts per
    window are exact."""
    from kats_spark.operators.dist_distance import psi_drift

    rng = np.random.default_rng(4)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(2000):
        ts = t0 + pd.Timedelta(minutes=i * 20)
        half = ts >= pd.Timestamp("2024-01-16")
        rows.append({"series_id": "stable", "ts": ts, "value": float(rng.normal(0, 1))})
        rows.append({
            "series_id": "shifted", "ts": ts,
            "value": float(rng.normal(3.0 if half else 0.0, 1)),
        })
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = (
        psi_drift(df, "2024-01-16 00:00:00", time_col="ts")
        .toPandas()
        .set_index("series_id")
    )
    assert out.loc["stable", "psi"] < 0.1
    assert out.loc["shifted", "psi"] > 0.25
    assert out.n_before.sum() + out.n_after.sum() == 4000


def test_dup_components_driver_gate_equals_distributed(spark):
    """The size-gated driver union-find path must produce exactly the
    distributed min-label loop's output (same clusters, same schema) —
    the gate may only change the physical strategy."""
    from pyspark.sql import functions as F

    from kats_spark.operators.dedup import dup_components

    rng_pairs = [
        (1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21),
        (30, 31), (31, 32), (32, 33), (33, 30), (5, 40), (40, 41),
    ]
    df = spark.createDataFrame(rng_pairs, "id_a bigint, id_b bigint")
    fast = sorted(
        (r.doc_id, r.cluster_id) for r in dup_components(df).collect()
    )
    assert dup_components.last_rounds == 0  # gate took the driver path
    slow = sorted(
        (r.doc_id, r.cluster_id)
        for r in dup_components(df, driver_gate_edges=0).collect()
    )
    assert dup_components.last_rounds > 0  # forced distributed
    assert fast == slow


def test_salted_cumsum_equals_naive(spark):
    """VERDICT r07 #2: the shared salted-exact global cumsum helper
    (exclusive_prefix(per-shard totals) + within-shard cumsum keyed on
    the md5 rank's own hex prefix) is BIT-IDENTICAL to the naive
    single-task global window at every supported shard count."""
    from kats_spark.operators.sampling import salted_cumsum

    rng = np.random.default_rng(11)
    base = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(700), "n_tokens": rng.integers(1, 300, 700)}
        )
    ).withColumn(
        "__rk",
        F.md5(F.concat_ws(":", F.lit("7"), F.col("doc_id").cast("string"))),
    )
    cols = ["doc_id", "n_tokens", "cum_tokens"]
    naive = (
        salted_cumsum(base, salt_shards=1)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[cols]
    )
    for shards in (16, 256):
        salted = (
            salted_cumsum(base, salt_shards=shards)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[cols]
        )
        assert salted.equals(naive), f"salt_shards={shards} diverged"


def test_corpus_build_sampled_stage_salted_equals_naive(spark):
    """VERDICT r07 #2: q_corpus_build's budget fill rebuilt on
    salted_cumsum — the 256-shard plan over the REAL survivor frame
    (sf0.001 corpus stages) picks the identical sampled set, so the
    count gate at 1M docs is purely a physical-plan choice and the
    DuckDB oracle is unchanged."""
    from kats_spark.operators.sampling import salted_cumsum
    from kats_spark.plans.pipeline_queries import _corpus_stages

    _, _, _, final = _corpus_stages(spark, "/root/testdata/sf0.001")
    rk = F.md5(F.concat_ws(":", F.lit("7"), F.col("doc_id").cast("string")))
    base = final.select("doc_id", "n_tokens").withColumn("__rk", rk)
    cols = ["doc_id", "n_tokens", "cum_tokens"]

    def fill(shards):
        return (
            salted_cumsum(base, salt_shards=shards)
            .filter(F.col("cum_tokens") - F.col("n_tokens") < 60_000)
            .select(*cols)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    naive, salted = fill(1), fill(256)
    assert len(naive) > 0
    assert salted.equals(naive)


def test_quality_buckets_exact_thirds(spark):
    """Nine distinct scores in one stratum split exactly 3/3/3 with the
    lowest-score third labeled head (CCNet orientation)."""
    from kats_spark.operators.sampling import quality_buckets

    rows = [(i, "en", float(i)) for i in range(1, 10)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "logppl"])
    out = {r.doc_id: r.bucket for r in quality_buckets(df, bins=10).collect()}
    assert [out[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )


def test_quality_buckets_strata_independent(spark):
    """Cut bins are computed per stratum: a stratum whose scores all sit
    above another stratum's tail still gets its own head third."""
    from kats_spark.operators.sampling import quality_buckets

    rows = [(i, "en", float(i)) for i in range(1, 10)] + [
        (100 + i, "zh", 100.0 + i) for i in range(1, 10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "logppl"])
    out = {r.doc_id: r.bucket for r in quality_buckets(df, bins=10).collect()}
    assert out[101] == "head" and out[109] == "tail"
    assert sum(1 for d, b in out.items() if d > 100 and b == "head") == 3


def test_quality_buckets_ties_share_bucket(spark):
    """Documents in the same quantized bin always land in the same
    bucket (the split is exact up to bin granularity by design)."""
    from kats_spark.operators.sampling import quality_buckets

    rows = [(i, "en", 1.0) for i in range(6)] + [(10, "en", 2.0), (11, "en", 3.0)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "logppl"])
    out = {r.doc_id: r.bucket for r in quality_buckets(df, bins=10).collect()}
    assert all(out[i] == "head" for i in range(6))  # tied bin stays together
    # 6/8 = 75% >= 2/3 sit in the tied head bin, so BOTH cuts land there
    # and everything above it is tail — exact-quantile tie semantics
    assert out[10] == "tail" and out[11] == "tail"


def test_cluster_representatives_quality_winner(spark):
    from kats_spark.operators.dedup import cluster_representatives

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 7), (9, 55)],
        ["doc_id", "n_chars"],
    )
    # {1,2,3} one cluster, {4} paired-less singleton... 4 pairs with nothing
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    got = {
        r.cluster_id: (r.rep_id, r.cluster_size, r.rep_quality)
        for r in cluster_representatives(docs, pairs, "n_chars").collect()
    }
    # winner: highest n_chars, tie broken to the LOWER id (2 beats 3)
    assert got[1] == (2, 3, 99)
    # unpaired docs are their own singleton clusters
    assert got[4] == (4, 1, 7) and got[9] == (9, 1, 55)


def test_quality_buckets_tercile_invariants_random(spark):
    """Randomized invariants of the histogram terciles: per stratum,
    head covers >= 1/3 of docs, head+middle >= 2/3, and the buckets are
    monotone in the quantized score (no tail doc below a head doc)."""
    import collections

    import numpy as np

    from kats_spark.operators.sampling import quality_buckets

    rng = np.random.default_rng(0)
    for _ in range(5):
        n = int(rng.integers(5, 60))
        scores = rng.normal(5, 2, n)
        langs = rng.choice(["en", "zh"], n)
        df = spark.createDataFrame(
            [(i, str(langs[i]), float(scores[i])) for i in range(n)],
            ["doc_id", "lang", "logppl"],
        )
        per = collections.defaultdict(list)
        for r in quality_buckets(df, bins=50).collect():
            per[r.lang].append((r.bucket, r.score_bin))
        for rows in per.values():
            m = len(rows)
            h = [sb for b, sb in rows if b == "head"]
            mid = [sb for b, sb in rows if b == "middle"]
            t = [sb for b, sb in rows if b == "tail"]
            assert 3 * len(h) >= m
            assert 3 * (len(h) + len(mid)) >= 2 * m
            if h and mid:
                assert max(h) <= min(mid)
            if mid and t:
                assert max(mid) <= min(t)
            if h and t:
                assert max(h) <= min(t)


def test_per_source_cap_salted_equals_naive(spark):
    """The two-phase salted cap refinement returns the identical
    survivor set and ranks as the single-window plan (the global
    top-cap of a bucket is contained in the union of its shards'
    top-caps, so phase 2's re-rank is exact)."""
    from kats_spark.operators.sampling import per_source_cap

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    naive = (
        per_source_cap(docs, cap=7, seed=3, salt_shards=1)
        .select("doc_id", "bucket_rank")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    salted = (
        per_source_cap(docs, cap=7, seed=3, salt_shards=256)
        .select("doc_id", "bucket_rank")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(naive) > 0
    assert salted.equals(naive)


def test_unimax_budgets_hand_waterfilling(spark):
    """Three strata (capacities 20/200/2000 at 2 epochs), budget 1000:
    A and B saturate, C takes the 780-token leftover; a budget past the
    total capacity saturates everyone and leaves budget unfilled."""
    from kats_spark.operators.sampling import unimax_budgets

    rows = (
        [(i, " ".join(["a"] * 10), "A") for i in range(1)]
        + [(10 + i, " ".join(["b"] * 50), "B") for i in range(2)]
        + [(20 + i, " ".join(["c"] * 100), "C") for i in range(10)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r.lang: (r.capacity, r.budget)
        for r in unimax_budgets(df, 1000.0, epochs_cap=2.0).collect()
    }
    assert got["A"] == (20.0, 20.0)
    assert got["B"] == (200.0, 200.0)
    assert got["C"][0] == 2000.0 and abs(got["C"][1] - 780.0) < 1e-9
    # budget beyond total capacity: every stratum capped at capacity
    full = {
        r.lang: r.budget
        for r in unimax_budgets(df, 10000.0, epochs_cap=2.0).collect()
    }
    assert full == {"A": 20.0, "B": 200.0, "C": 2000.0}


def test_unimax_budgets_feed_token_budget_sample(spark):
    """The allocation frame drives token_budget_sample's bucket_budgets
    hook end-to-end: per-language drawn tokens stay within budget plus
    at most one document's overshoot."""
    from pyspark.sql import functions as F

    from kats_spark.operators.sampling import token_budget_sample, unimax_budgets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    alloc = unimax_budgets(docs, 800.0, epochs_cap=1.0)
    budgets = alloc.select("lang", F.col("budget").alias("__budget"))
    out = token_budget_sample(docs, 0, by=["lang"], bucket_budgets=budgets)
    drawn = {
        r.lang: r.tok for r in
        out.groupBy("lang").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    cap = {r.lang: (r.budget, r.n_tokens) for r in alloc.collect()}
    max_doc = {
        r.lang: r.m for r in
        docs.select("lang", F.size(F.split(F.trim("text"), r"\s+")).alias("nt"))
        .groupBy("lang").agg(F.max("nt").alias("m")).collect()
    }
    for lang, tok in drawn.items():
        assert tok <= cap[lang][0] + max_doc[lang]
        assert tok > 0


def test_assign_shards_contract(spark):
    """Every shard except the last carries at least shard_tokens minus
    one document's overshoot; assignment is deterministic and salted ==
    naive (the salted_cumsum equivalence applied to sharding)."""
    from kats_spark.operators.sampling import assign_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = (
        assign_shards(docs, 2000, seed=5, salt_shards=1)
        .select("doc_id", "n_tokens", "shard_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        assign_shards(docs, 2000, seed=5, salt_shards=256)
        .select("doc_id", "n_tokens", "shard_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    per = a.groupby("shard_id").n_tokens.sum()
    max_doc = a.n_tokens.max()
    # a doc STARTING before the boundary is kept whole: each shard's
    # token mass sits in (shard_tokens - max_doc, shard_tokens + max_doc)
    for sid, tok in per.items():
        if sid != per.index.max():
            assert tok > 2000 - max_doc
        assert tok < 2000 + max_doc
