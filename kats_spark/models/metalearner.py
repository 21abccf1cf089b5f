"""Metalearners: predictability check + model selection on TsFeatures.

Parity with kats/models/metalearner/metalearner_predictability.py:31
(classify whether a series is forecastable from its feature vector) and
metalearner_modelselect.py:38 (recommend a model per series).  The
reference trains sklearn/torch classifiers offline; this container has
neither, so both metalearners use a nearest-centroid rule over the SAME
feature space — the Spark plan (feature extraction at scale → broadcast
tiny model → one scoring pass) is identical for any pluggable scorer.

- ``predictability``: label = whether the closed-form linear backtest
  beats the naive last-value forecast; train centroids on a labeled
  sample, score every series with one broadcast join.
- ``model_select``: run K cheap candidate models' backtests (each a
  distributed plan), argmin per series — the exhaustive fallback the
  reference's classifier approximates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def predictability_labels(
    df: DataFrame,
    spec: DataFrame,
    threshold: float = 1.0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, predictable): linear-model backtest MAE vs naive
    last-value MAE; ratio < threshold -> predictable.  Fully closed-form
    (the training-label generator for the predictability metalearner)."""
    from kats_spark.operators.backtest import linear_backtest

    lin = (
        linear_backtest(df, spec, s)
        .groupBy(s.series_id)
        .agg(F.avg("mae").alias("lin_mae"))
    )
    w = s.w()
    naive_err = df.withColumn(
        "__naive_ae", F.abs(F.col(s.value) - F.lag(s.value, 1).over(w))
    )
    naive = naive_err.groupBy(s.series_id).agg(F.avg("__naive_ae").alias("naive_mae"))
    return (
        lin.join(naive, s.series_id)
        .withColumn(
            "predictable",
            (F.col("lin_mae") < threshold * F.col("naive_mae")).cast("int"),
        )
        .select(s.series_id, "lin_mae", "naive_mae", "predictable")
    )


def nearest_centroid_score(
    features: DataFrame,
    labeled: DataFrame,
    feature_cols: list[str],
    label_col: str = "predictable",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Nearest-centroid classifier: centroids from ``labeled`` (a tiny
    aggregate, broadcast), score every row of ``features``.  Features are
    standardized by the training stats so no dimension dominates."""
    stats = labeled.agg(
        *[F.avg(c).alias(f"__m_{c}") for c in feature_cols],
        *[F.stddev_samp(c).alias(f"__s_{c}") for c in feature_cols],
    )
    centroids = (
        labeled.crossJoin(F.broadcast(stats))
        .groupBy(label_col)
        .agg(
            *[
                F.avg(
                    (F.col(c) - F.col(f"__m_{c}"))
                    / F.greatest(F.col(f"__s_{c}"), F.lit(1e-9))
                ).alias(f"__c_{c}")
                for c in feature_cols
            ]
        )
    )
    centroids = centroids.withColumnRenamed(label_col, "__label")
    scored = features.crossJoin(F.broadcast(stats)).crossJoin(
        F.broadcast(centroids)
    )
    dist = None
    for c in feature_cols:
        z = (F.col(c) - F.col(f"__m_{c}")) / F.greatest(F.col(f"__s_{c}"), F.lit(1e-9))
        term = F.pow(z - F.col(f"__c_{c}"), 2)
        dist = term if dist is None else dist + term
    ranked = scored.withColumn("__dist", F.sqrt(dist)).withColumn(
        "__rk",
        F.row_number().over(Window.partitionBy(s.series_id).orderBy("__dist")),
    )
    return ranked.filter(F.col("__rk") == 1).select(
        s.series_id, F.col("__label").alias("predicted_label"), F.col("__dist").alias("distance")
    )


def model_select(
    df: DataFrame,
    spec: DataFrame,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, best_model, best_mae): exhaustive candidate backtest —
    linear trend vs naive last-value vs trailing-MA(8) one-step — argmin
    per series.  Each candidate is one distributed expression plan; the
    union is a model-as-group-key aggregation (the ensembles pattern)."""
    from kats_spark.operators.backtest import linear_backtest

    lin = (
        linear_backtest(df, spec, s)
        .groupBy(s.series_id)
        .agg(F.avg("mae").alias("mae"))
        .withColumn("model", F.lit("linear"))
    )
    w = s.w()
    naive = (
        df.withColumn("__ae", F.abs(F.col(s.value) - F.lag(s.value, 1).over(w)))
        .groupBy(s.series_id)
        .agg(F.avg("__ae").alias("mae"))
        .withColumn("model", F.lit("naive"))
    )
    ma_w = w.rowsBetween(-8, -1)
    ma = (
        df.withColumn(
            "__ae",
            F.when(
                F.count(s.value).over(ma_w) == 8,
                F.abs(F.col(s.value) - F.avg(s.value).over(ma_w)),
            ),
        )
        .groupBy(s.series_id)
        .agg(F.avg("__ae").alias("mae"))
        .withColumn("model", F.lit("ma8"))
    )
    allm = lin.unionByName(naive).unionByName(ma)
    return allm.groupBy(s.series_id).agg(
        F.min_by("model", F.struct(F.col("mae"), F.col("model"))).alias("best_model"),
        F.min("mae").alias("best_mae"),
    )


# ---------------------------------------------------------------------------
# Hyper-parameter recommendation (kats/models/metalearner/metalearner_hpt.py
# ``MetaLearnHPT``): map a series' feature vector to recommended model
# hyper-parameters.  The reference trains a torch multitask net
# (classification heads for categorical HPs, regression heads for numerical,
# MetaLearnHPT.build_network/train); this container has no torch, so the
# Spark-first analog is k-nearest-neighbor over the SAME metadata table the
# net would train on: numerical HP = neighbor mean, categorical HP =
# neighbor majority — the standard non-parametric stand-in, and the Spark
# plan (features at scale x broadcast metadata -> windowed top-k -> one
# agg) is what a learned scorer would use too.
# ---------------------------------------------------------------------------


def hpt_neighbors(
    features: DataFrame,
    metadata: DataFrame,
    feature_cols: list[str],
    k: int = 3,
    id_col: str = "series_id",
    meta_id_col: str = "meta_id",
) -> DataFrame:
    """k nearest metadata rows per input series by euclidean distance in
    feature space (ties broken on meta id — deterministic).  The metadata
    table is the trained artifact — small by construction — so it
    broadcasts; no shuffle touches the (large) feature side until the
    per-series top-k window."""
    m = metadata.select(
        F.col(meta_id_col),
        *[F.col(c).alias(f"__m_{c}") for c in feature_cols],
        *[c for c in metadata.columns if c != meta_id_col and c not in feature_cols],
    )
    dist = F.sqrt(
        sum(((F.col(c) - F.col(f"__m_{c}")) ** 2 for c in feature_cols), F.lit(0.0))
    )
    joined = features.crossJoin(F.broadcast(m)).withColumn("__dist", dist)
    w = Window.partitionBy(id_col).orderBy(F.asc("__dist"), F.asc(meta_id_col))
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop(*[f"__m_{c}" for c in feature_cols])
    )


def hpt_recommend(
    features: DataFrame,
    metadata: DataFrame,
    feature_cols: list[str],
    numerical_hps: list[str],
    categorical_hps: list[str],
    k: int = 3,
    id_col: str = "series_id",
    meta_id_col: str = "meta_id",
) -> DataFrame:
    """One recommendation row per series: mean of the k neighbors for each
    numerical HP, majority vote (count desc, value asc on ties) for each
    categorical HP."""
    nb = hpt_neighbors(features, metadata, feature_cols, k, id_col, meta_id_col)
    out = nb.groupBy(id_col).agg(
        *[F.avg(h).alias(h) for h in numerical_hps],
        *[
            F.get(
                F.array_sort(
                    F.map_entries(
                        F.aggregate(
                            F.collect_list(h),
                            F.create_map().cast("map<string,int>"),
                            lambda acc, v: F.map_concat(
                                F.map_filter(acc, lambda kk, _: kk != v),
                                F.create_map(
                                    v, F.coalesce(F.element_at(acc, v), F.lit(0)) + 1
                                ),
                            ),
                        )
                    ),
                    lambda a, b: F.when(a["value"] > b["value"], -1)
                    .when(a["value"] < b["value"], 1)
                    .when(a["key"] < b["key"], -1)
                    .when(a["key"] > b["key"], 1)
                    .otherwise(0),
                ),
                0,
            )["key"].alias(h)
            for h in categorical_hps
        ],
    )
    return out


# ---------------------------------------------------------------------------
# MLlib RandomForest metalearner scorer — the classifier the reference
# actually uses (metalearner_modelselect.py:38 RandomForestClassifier /
# GBTClassifier over TsFeatures vectors; metalearner_predictability.py:31
# same for the binary predictability label).  sklearn is absent but MLlib
# is not, so the learned path is a first-class citizen next to the
# nearest-centroid fallback (kept: it is closed-form and oracle-checkable).
# ---------------------------------------------------------------------------


def random_forest_score(
    features: DataFrame,
    labeled: DataFrame,
    feature_cols: list[str],
    label_col: str = "predictable",
    num_trees: int = 100,
    max_depth: int = 6,
    seed: int = 42,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Train a RandomForest on ``labeled`` (features + label — the small
    metadata table the reference trains on offline), score every row of
    ``features``.  Returns (series_id, predicted_label, confidence).

    Scale shape: training data is the metalearner metadata table (small
    by construction — one row per TRAINING series); the fitted forest is
    a broadcast-sized model applied in one narrow pass over the scoring
    side, so inference is embarrassingly parallel at any corpus size.
    String labels round-trip through StringIndexer/IndexToString so
    ``model_select``-style categorical targets work unchanged."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import IndexToString, StringIndexer, VectorAssembler

    vec = VectorAssembler(
        inputCols=feature_cols, outputCol="__fv", handleInvalid="keep"
    )
    idx = StringIndexer(
        inputCol=label_col, outputCol="__lbl", handleInvalid="error", stringOrderType="alphabetAsc"
    )
    train = labeled.withColumn(label_col, F.col(label_col).cast("string"))
    idx_model = idx.fit(train)
    rf = RandomForestClassifier(
        featuresCol="__fv",
        labelCol="__lbl",
        numTrees=num_trees,
        maxDepth=max_depth,
        seed=seed,
    )
    rf_model = rf.fit(idx_model.transform(vec.transform(train)))
    scored = rf_model.transform(vec.transform(features))
    back = IndexToString(
        inputCol="prediction", outputCol="predicted_label", labels=idx_model.labels
    )
    from pyspark.ml.functions import vector_to_array

    out = back.transform(scored)
    conf = F.array_max(vector_to_array(F.col("probability")))
    return out.select(
        s.series_id,
        "predicted_label",
        conf.alias("confidence"),
    )


def detector_select(
    df: DataFrame,
    window: int = 24,
    flag_threshold: float = 3.0,
    spike_every: int = 97,
    spike_sigmas: float = 6.0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Per-series DETECTOR selection — the
    kats/detectors/meta_learning/metalearning_detection_model.py:90
    (``MetaDetectModelSelect``) surface without its offline labeled
    metadata: candidate detectors are benchmarked SELF-SUPERVISED by
    deterministic anomaly injection.

    Every ``spike_every``-th point of each series gets a
    ``spike_sigmas``-sigma spike added (seedless — positions come from
    row_number, magnitude from the series' own std, so reruns are
    bit-identical); the rolling z-score / modified-MAD-z / IQR detectors
    run on the spiked series; each detector's F1 against the known
    injection mask decides ``best_detector`` per series.

    Output (series_id, best_detector, best_f1, n_injected).  All three
    candidates are window expressions over ONE partitioning — the whole
    tournament is a single-exchange plan per candidate family."""
    from kats_spark.functions import rolling

    w = s.w()
    rn = F.row_number().over(w)
    sd = F.stddev_samp(s.value).over(Window.partitionBy(s.series_id))
    injected = (rn % spike_every) == 0
    spiked = df.withColumn(
        "__inj", injected
    ).withColumn(
        s.value,
        F.when(injected, F.col(s.value) + spike_sigmas * sd).otherwise(
            F.col(s.value)
        ),
    )
    # mad via the STAGED builder (with_mad_scores): the raw column
    # expression re-inlines the window median per array element —
    # O(w^2 log w)/row, measured 60s vs 4s on the tournament fixture
    spiked = rolling.with_mad_scores(
        spiked, window, s, score_col="__mad_raw", mod_col="__mad_score"
    )
    scores = {
        "zscore": rolling.z_score(window, s),
        "mad": F.col("__mad_score"),
        "iqr": rolling.iqr_score(window, s),
    }
    # r12 plan fusion: the three per-detector frames used to be separate
    # subplans unioned together, each re-running the spike + window
    # pipeline (plan audit: 9 exchanges / 6 scans).  All three scores
    # share the SAME series_id window partitioning, so compute them as
    # sibling columns in ONE pass and unpivot with stack() — identical
    # values (the oracle is unchanged and stays green), one window
    # subtree instead of three.
    scored = spiked.select(
        s.series_id,
        F.col("__inj"),
        *[score.alias(f"__s_{name}") for name, score in scores.items()],
    )
    stack_expr = "stack({}, {}) as (detector, score)".format(
        len(scores),
        ", ".join(f"'{name}', __s_{name}" for name in scores),
    )
    long_rows = scored.select(s.series_id, "__inj", F.expr(stack_expr))
    flagged = F.abs(F.col("score")) > flag_threshold
    allf = long_rows.select(
        s.series_id,
        "detector",
        F.col("__inj").cast("int").alias("inj"),
        (flagged & F.col("__inj")).cast("int").alias("tp"),
        (flagged & ~F.col("__inj")).cast("int").alias("fp"),
        (~flagged & F.col("__inj")).cast("int").alias("fn"),
    )
    perf = allf.groupBy(s.series_id, "detector").agg(
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
        F.sum("inj").alias("n_injected"),
    )
    f1 = (2.0 * F.col("tp")) / F.greatest(
        2.0 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1.0)
    )
    ranked = perf.withColumn("f1", F.round(f1 + 1e-9, 6))
    return ranked.groupBy(s.series_id).agg(
        F.max_by(
            "detector", F.struct(F.col("f1"), F.col("detector"))
        ).alias("best_detector"),
        F.max("f1").alias("best_f1"),
        F.first("n_injected").alias("n_injected"),
    )


def metadata_tournament(
    df: DataFrame,
    steps: int = 24,
    freq_seconds: int = 3600,
    mean_windows: tuple = (6, 12, 24),
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Metalearner METADATA PRODUCER — the reference's get_metadata
    workflow (kats/models/metalearner/get_metadata.py: per-series
    candidate-model tournament emitting the (hpt_res, best_model) rows
    that metalearner_predictability / modelselect / hpt train on) as
    ONE distributed plan.

    Candidates are closed-form so the whole tournament VALUE-HASHES
    against a DuckDB oracle (the reference's candidates are iterative
    fitters; the tournament SHAPE — holdout split, per-candidate
    hyper-parameter search, per-candidate error, argmin best model — is
    the parity surface): linear trend, quadratic trend, and a last-w
    window mean whose window w is the tuned hyper-parameter (grid
    ``mean_windows``, argmin holdout MAE, ties to the smaller window).
    ``best_model`` is the argmin of the rounded per-candidate MAEs with
    the deterministic tie order linear < quadratic < mean.

    Output: (series_id, mae_linear, mae_quadratic, mae_mean,
    best_mean_window, best_model).  The declared query joins the
    TsFeatures expression layer on series_id so each row is the
    reference's (features, best_hpt, best_model) triple.  Every stage
    is a per-series window/agg — no driver loop, no cross-series state."""
    from kats_spark.operators import trend

    wdesc = Window.partitionBy(s.series_id).orderBy(F.desc(s.time))
    tagged = df.withColumn("__rn", F.row_number().over(wdesc))
    train = tagged.filter(F.col("__rn") > steps).drop("__rn")
    hold = tagged.filter(F.col("__rn") <= steps).drop("__rn")

    lin = trend.linear_forecast(train, steps=steps, freq_seconds=freq_seconds).select(
        s.series_id, s.time, F.round(F.col("fcst") + 1e-9, 6).alias("__lf")
    )
    quad = trend.quadratic_forecast(train, steps=steps, freq_seconds=freq_seconds).select(
        s.series_id, s.time, F.round(F.col("fcst") + 1e-9, 6).alias("__qf")
    )
    ttag = train.withColumn("__trn", F.row_number().over(wdesc))
    mean_aggs = [
        F.round(F.avg(F.when(F.col("__trn") <= w, F.col(s.value))) + 1e-9, 6).alias(f"__m{w}")
        for w in mean_windows
    ]
    means = ttag.groupBy(s.series_id).agg(*mean_aggs)

    scored = (
        hold.join(lin, [s.series_id, s.time])
        .join(quad, [s.series_id, s.time])
        .join(F.broadcast(means), s.series_id)
    )
    err_aggs = [
        F.round(F.avg(F.abs(F.col(s.value) - F.col("__lf"))) + 1e-9, 6).alias("mae_linear"),
        F.round(F.avg(F.abs(F.col(s.value) - F.col("__qf"))) + 1e-9, 6).alias("mae_quadratic"),
    ] + [
        F.round(F.avg(F.abs(F.col(s.value) - F.col(f"__m{w}"))) + 1e-9, 6).alias(f"__mae_m{w}")
        for w in mean_windows
    ]
    errs = scored.groupBy(s.series_id).agg(*err_aggs)

    # tuned mean: argmin over the window grid, ties to the smaller window
    best_w = None
    best_mae = None
    for w in mean_windows:
        mw = F.col(f"__mae_m{w}")
        if best_w is None:
            best_w, best_mae = F.lit(w), mw
        else:
            cond = mw < best_mae
            best_w = F.when(cond, F.lit(w)).otherwise(best_w)
            best_mae = F.when(cond, mw).otherwise(best_mae)
    errs = errs.withColumn("best_mean_window", best_w.cast("int")).withColumn(
        "mae_mean", best_mae
    )
    best = (
        F.when(
            (F.col("mae_linear") <= F.col("mae_quadratic"))
            & (F.col("mae_linear") <= F.col("mae_mean")),
            F.lit("linear"),
        )
        .when(F.col("mae_quadratic") <= F.col("mae_mean"), F.lit("quadratic"))
        .otherwise(F.lit("mean"))
    )
    return errs.withColumn("best_model", best).select(
        s.series_id, "mae_linear", "mae_quadratic", "mae_mean",
        "best_mean_window", "best_model",
    )


def detector_hpt(
    features: DataFrame,
    metadata: DataFrame,
    detector_type: str,
    feature_cols: list[str],
    numerical_hps: list[str],
    categorical_hps: list[str],
    k: int = 3,
    id_col: str = "series_id",
    meta_id_col: str = "meta_id",
    type_col: str = "detector_type",
) -> DataFrame:
    """Detector meta-learning HPT — the
    kats/detectors/meta_learning/hpt_tuning.py ``MetaDetectHptSelect``
    surface: the trained (features -> best detector hyper-parameters)
    metadata bank is keyed by DETECTOR TYPE (the reference trains one
    MetaLearnHPT per algorithm_name); recommending for a type filters
    the bank to that type's examples and runs the shared broadcast-kNN
    ``hpt_recommend`` (k=1 = the reference's nearest-example argmin).
    Output: one row per series with the recommended HPs +
    ``detector_type``."""
    bank = metadata.filter(F.col(type_col) == detector_type).drop(type_col)
    out = hpt_recommend(
        features, bank, feature_cols, numerical_hps, categorical_hps,
        k=k, id_col=id_col, meta_id_col=meta_id_col,
    )
    return out.withColumn(type_col, F.lit(detector_type))
