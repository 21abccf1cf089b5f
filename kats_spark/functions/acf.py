"""Autocorrelation features as closed-form aggregate expressions.

Parity with kats/tsfeatures/tsfeatures.py:934-1175 (acfpacf_features):
y_acf1..y_acf5, diff1y_acf1, diff2y_acf1, optional seasonal-lag acf, and
pacf for lags 2-3 via the Durbin-Levinson recursion on the acf values.

acf_k = sum_t (y_t - ybar)(y_{t-k} - ybar) / sum_t (y_t - ybar)^2 with
ybar the full-series mean (statsmodels convention).  Everything is a
lag-product aggregate: one window pass + one groupBy, no UDF,
oracle-checkable.  The centered diff-series acf is expanded algebraically
(sum of cross products minus mean corrections) so it needs no second
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def _centered_acf1_aggs(col: str, prefix: str) -> list[Column]:
    """Aggregates needed for the exact centered lag-1 acf of a derived
    series whose mean isn't known until aggregation time."""
    c = F.col(col)
    cl = F.col(f"{col}_l1")
    pair = cl.isNotNull() & c.isNotNull()
    return [
        F.sum(F.when(pair, c * cl)).alias(f"{prefix}_sxy"),
        F.sum(F.when(pair, c)).alias(f"{prefix}_sx"),
        F.sum(F.when(pair, cl)).alias(f"{prefix}_sy"),
        F.count(F.when(pair, F.lit(1))).alias(f"{prefix}_np"),
        F.sum(c * c).alias(f"{prefix}_ss"),
        F.sum(c).alias(f"{prefix}_s"),
        F.count(c).alias(f"{prefix}_n"),
    ]


def _centered_acf1(prefix: str) -> Column:
    """acf1 = [Σxy − m(Σx+Σy) + n_p m²] / [Σx² − 2mΣx_all + n m²]."""
    m = F.col(f"{prefix}_s") / F.col(f"{prefix}_n")
    num = (
        F.col(f"{prefix}_sxy")
        - m * (F.col(f"{prefix}_sx") + F.col(f"{prefix}_sy"))
        + F.col(f"{prefix}_np") * m * m
    )
    den = F.col(f"{prefix}_ss") - 2 * m * F.col(f"{prefix}_s") + F.col(f"{prefix}_n") * m * m
    return num / den


def acf_features(
    df: DataFrame,
    lags: int = 5,
    seasonal_lag: int | None = None,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, acf_1..acf_{lags}[, acf_seasonal], pacf_2, pacf_3,
    diff1_acf1, diff2_acf1)."""
    all_lags = list(range(1, lags + 1))
    if seasonal_lag and seasonal_lag > lags:
        all_lags.append(seasonal_lag)

    mean_ = df.groupBy(s.series_id).agg(F.avg(s.value).alias("__m"))
    d = df.join(F.broadcast(mean_), s.series_id).withColumn(
        "__c", F.col(s.value) - F.col("__m")
    )
    d = d.withColumn("__d1", F.col(s.value) - F.lag(s.value).over(s.w()))
    d = d.withColumn("__d2", F.col("__d1") - F.lag("__d1").over(s.w()))

    lag_cols = {f"__c_l{k}": F.lag("__c", k).over(s.w()) for k in all_lags}
    lag_cols["__d1_l1"] = F.lag("__d1").over(s.w())
    lag_cols["__d2_l1"] = F.lag("__d2").over(s.w())
    d = d.withColumns(lag_cols)

    aggs = [F.sum(F.col("__c") * F.col("__c")).alias("__ss")]
    for k in all_lags:
        aggs.append(F.sum(F.col("__c") * F.col(f"__c_l{k}")).alias(f"__num{k}"))
    aggs += _centered_acf1_aggs("__d1", "__d1")
    aggs += _centered_acf1_aggs("__d2", "__d2")
    g = d.groupBy(s.series_id).agg(*aggs)

    sel = [F.col(s.series_id)]
    for k in all_lags:
        name = f"acf_{k}" if k <= lags else "acf_seasonal"
        sel.append((F.col(f"__num{k}") / F.col("__ss")).alias(name))
    r1 = F.col("__num1") / F.col("__ss")
    r2 = F.col("__num2") / F.col("__ss")
    r3 = F.col("__num3") / F.col("__ss")
    pacf2 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi22 = pacf2
    phi21 = r1 - phi22 * r1
    pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    sel += [
        pacf2.alias("pacf_2"),
        pacf3.alias("pacf_3"),
        _centered_acf1("__d1").alias("diff1_acf1"),
        _centered_acf1("__d2").alias("diff2_acf1"),
    ]
    return g.select(*sel)


def acf_seasonality_detect(
    df: DataFrame,
    lags: int = 36,
    alpha: float = 0.01,
    diff: int = 1,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """ACF seasonality DETECTION (seasonality.py:93-137 ACFDetector):
    the series is first-differenced ``diff`` times (reference default
    diff=1, ``np.diff`` before ``acf`` — seasonality.py:117-120) to remove
    trend, then Bartlett confidence intervals over the first ``lags``
    autocorrelations of the differenced series; a lag is a seasonality
    candidate when its CI lower bound >= 0 (lag>1), candidates pruned to
    non-multiples.

    The reference prunes with a greedy pop-and-drop-multiples loop
    (:82-88); because divisibility is transitive, that greedy result
    equals "keep k iff no smaller candidate divides k" — which IS
    expressible as a per-element array filter, so the whole detector is
    one aggregation + closed-form expressions (exact DuckDB oracle).

    Output: (series_id, seasonality_presence, seasonalities) where
    seasonalities is the comma-joined pruned lag list.
    """
    from kats_spark.operators.interval import norm_ppf

    z = float(norm_ppf(1.0 - alpha / 2.0))
    work = df
    dcol = s.value
    for i in range(diff):
        nxt = f"__diff{i + 1}"
        work = work.withColumn(nxt, F.col(dcol) - F.lag(dcol).over(s.w()))
        dcol = nxt
    mean_ = work.groupBy(s.series_id).agg(F.avg(dcol).alias("__m"))
    d = work.join(F.broadcast(mean_), s.series_id).withColumn(
        "__c", F.col(dcol) - F.col("__m")
    )
    lag_cols = {f"__cl{k}": F.lag("__c", k).over(s.w()) for k in range(1, lags + 1)}
    d = d.withColumns(lag_cols)
    aggs = [
        # n = len(ts_diff): diff strips `diff` leading points per series
        F.count("__c").cast("double").alias("__n"),
        F.sum(F.col("__c") * F.col("__c")).alias("__ss"),
    ]
    for k in range(1, lags + 1):
        aggs.append(F.sum(F.col("__c") * F.col(f"__cl{k}")).alias(f"__s{k}"))
    g = d.groupBy(s.series_id).agg(*aggs)

    r = {k: F.col(f"__s{k}") / F.col("__ss") for k in range(1, lags + 1)}
    # Bartlett: var(r_k) = (1 + 2*sum_{j<k} r_j^2) / n
    acc = F.lit(1.0)
    det = {}
    for k in range(1, lags + 1):
        var_k = acc / F.col("__n")
        if k >= 2:
            det[k] = (r[k] - F.lit(z) * F.sqrt(var_k)) >= 0
        acc = acc + 2.0 * r[k] * r[k]
    kept = {}
    for k in range(2, lags + 1):
        cond = det[k]
        for j in range(2, k):
            if k % j == 0:  # only divisors can prune k
                cond = cond & ~det[j]
        kept[k] = cond
    season_arr = F.filter(
        F.array(*[F.when(kept[k], F.lit(k)) for k in range(2, lags + 1)]),
        lambda x: x.isNotNull(),
    )
    return g.select(
        s.series_id,
        (F.size(season_arr) > 0).cast("int").alias("seasonality_presence"),
        F.array_join(season_arr, ",").alias("seasonalities"),
    )


def theta_seasonality_gate(
    df: DataFrame,
    m: int,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Theta's seasonality decision (kats/models/theta.py:100-109) as one
    aggregation: seasonal iff m > 1, the series is non-constant, n > 2m,
    and |r_m| / sqrt((1 + 2·Σ_{j∉{0,m}} r_j²)/n) > 1.644 with ACF
    computed to nlags=m.  Output (series_id, seasonal)."""
    mean_ = df.groupBy(s.series_id).agg(F.avg(s.value).alias("__m"))
    d = df.join(F.broadcast(mean_), s.series_id).withColumn(
        "__c", F.col(s.value) - F.col("__m")
    )
    d = d.withColumns(
        {f"__cl{k}": F.lag("__c", k).over(s.w()) for k in range(1, m + 1)}
    )
    aggs = [
        F.count("*").cast("double").alias("__n"),
        F.countDistinct(s.value).alias("__u"),
        F.sum(F.col("__c") * F.col("__c")).alias("__ss"),
    ]
    for k in range(1, m + 1):
        aggs.append(F.sum(F.col("__c") * F.col(f"__cl{k}")).alias(f"__s{k}"))
    g = d.groupBy(s.series_id).agg(*aggs)
    # np.delete(r, [0, m]) keeps lags 1..m-1 (r_0 = 1 is excluded, as is r_m)
    acc = F.lit(0.0)
    for j in range(1, m):
        rj = F.col(f"__s{j}") / F.col("__ss")
        acc = acc + rj * rj
    stat = F.sqrt((F.lit(1.0) + 2.0 * acc) / F.col("__n"))
    rm = F.col(f"__s{m}") / F.col("__ss")
    seasonal = (
        F.lit(m > 1)
        & (F.col("__u") > 1)
        & (F.col("__n") > 2 * m)
        & (F.abs(rm / stat) > 1.644)
    )
    return g.select(s.series_id, seasonal.cast("int").alias("seasonal"))


def ljung_box(
    df: DataFrame,
    lags: int = 10,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Ljung-Box portmanteau statistic per series — the standard
    white-noise / residual-diagnostic test (Ljung & Box 1978):

      Q = n (n + 2) * sum_{k=1..h} rho_k^2 / (n - k)

    with rho_k the lag-k autocorrelation of the centered series.  Under
    H0 (white noise) Q ~ chi2(h).  One window pass for the lagged
    products + one grouped aggregation — the acf_features plan shape.
    Output (series_id, n, dof, q_stat)."""
    mean_ = df.groupBy(s.series_id).agg(F.avg(s.value).alias("__m"))
    d = df.join(F.broadcast(mean_), s.series_id).withColumn(
        "__c", F.col(s.value) - F.col("__m")
    )
    lag_cols = {f"__l{k}": F.lag("__c", k).over(s.w()) for k in range(1, lags + 1)}
    d = d.withColumns(lag_cols)
    aggs = [
        F.count("*").cast("double").alias("__n"),
        F.sum(F.col("__c") * F.col("__c")).alias("__ss"),
    ]
    for k in range(1, lags + 1):
        aggs.append(F.sum(F.col("__c") * F.col(f"__l{k}")).alias(f"__num{k}"))
    g = d.groupBy(s.series_id).agg(*aggs)
    n = F.col("__n")
    q = F.lit(0.0)
    for k in range(1, lags + 1):
        rho = F.col(f"__num{k}") / F.col("__ss")
        q = q + (rho * rho) / (n - k)
    q = n * (n + 2.0) * q
    return g.select(
        s.series_id,
        n.cast("long").alias("n"),
        F.lit(lags).alias("dof"),
        F.round(q + 1e-9, 6).alias("q_stat"),
    )
