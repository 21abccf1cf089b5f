"""Mann-Kendall monotonic-trend test.

Parity with kats/detectors/trend_mk.py:115-684 (``MKDetector``): the MK
statistic S = sum over all pairs i<j of sign(x_j - x_i); variance under H0
with tie correction; z-score and Kendall's tau.

The reference materializes an n×n pairwise matrix per series (numpy).  A
pairwise matrix does not scale; instead we use the O(n log n) identity

    S = sum_j [ rank_lt(j) - rank_gt(j) ]

where rank_lt(j) = #{i<j : x_i < x_j} and rank_gt(j) = #{i<j : x_i > x_j}.
Computing exact "count of prior smaller values" needs an order-statistics
pass; for the distributed implementation we use a *windowed* MK over the
trailing ``window_size`` points (the reference's rolling mode,
trend_mk.py ``training_days``), where each point's window is an array and
S is evaluated with higher-order array expressions — bounded by window
size, never by series length.  For whole-series S on short-to-moderate
series we collect the series array per group (one row per series) and use
the same array kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def _pairwise_s(arr: Column) -> Column:
    """S = Σ_{i<j} sign(x_j - x_i) via nested higher-order functions.

    O(w²) per row but JVM-side and w is the (small) MK window; this is the
    same arithmetic the reference does in numpy (trend_mk.py:115-200),
    minus the n×n python-object matrix.
    """
    n = F.size(arr)
    # for each j, sum of signs vs all earlier i
    per_j = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda j: F.aggregate(
            F.slice(arr, F.lit(1), j),
            F.lit(0.0),
            lambda acc, x: acc + F.signum(F.element_at(arr, (j + 1).cast("int")) - x),
        ),
    )
    return F.aggregate(per_j, F.lit(0.0), lambda acc, x: acc + x)


def mk_statistic(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Whole-series MK: (series_id, mk_s, tau, var_s, z).

    Tie-corrected variance: Var(S) = [n(n-1)(2n+5) - Σ t(t-1)(2t+5)] / 18.
    """
    arr_df = (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .agg(F.array_sort(F.collect_list(F.struct(s.time, s.value))).alias("__pairs"))
        .select(
            s.series_id,
            F.transform("__pairs", lambda p: p[s.value]).alias("__arr"),
        )
    )
    sd = arr_df.withColumn("mk_s", _pairwise_s(F.col("__arr"))).withColumn(
        "__n", F.size("__arr").cast("double")
    )
    # tie counts
    ties = (
        df.groupBy(s.series_id, s.value)
        .count()
        .filter(F.col("count") > 1)
        .withColumn("__tt", F.col("count").cast("double"))
        .groupBy(s.series_id)
        .agg(F.sum(F.col("__tt") * (F.col("__tt") - 1) * (2 * F.col("__tt") + 5)).alias("__tie_adj"))
    )
    n = F.col("__n")
    out = (
        sd.join(ties, s.series_id, "left")
        .withColumn("__tie_adj", F.coalesce("__tie_adj", F.lit(0.0)))
        .withColumn("var_s", (n * (n - 1) * (2 * n + 5) - F.col("__tie_adj")) / 18.0)
        .withColumn("tau", F.col("mk_s") / (n * (n - 1) / 2.0))
        .withColumn(
            "z",
            F.when(F.col("mk_s") > 0, (F.col("mk_s") - 1) / F.sqrt("var_s"))
            .when(F.col("mk_s") < 0, (F.col("mk_s") + 1) / F.sqrt("var_s"))
            .otherwise(F.lit(0.0)),
        )
    )
    return out.select(s.series_id, "mk_s", "tau", "var_s", "z")


def mk_rolling(df: DataFrame, window_size: int, s: TSSchema = DEFAULT) -> DataFrame:
    """Rolling MK over the trailing ``window_size`` points (the reference's
    rolling detection mode, trend_mk.py:372): per-point S and tau."""
    w = s.w().rowsBetween(-(window_size - 1), 0)
    arr = F.collect_list(F.col(s.value)).over(w)
    with_arr = df.withColumn("__arr", arr).withColumn("__wn", F.size("__arr"))
    s_col = F.when(F.col("__wn") == window_size, _pairwise_s(F.col("__arr")))
    tau = s_col / (window_size * (window_size - 1) / 2.0)
    return with_arr.select(
        s.series_id, s.time, s_col.alias("mk_s"), tau.alias("tau")
    )


def mk_detect(
    df: DataFrame,
    window_size: int,
    alpha: float = 0.05,
    direction: str = "both",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Rolling MK trend DETECTION — the reference detector surface
    (trend_mk.py:372-520): tie-corrected Var(S) within each window,
    continuity-corrected z, two-sided significance at ``alpha``, points
    filtered to significant trends and optionally to ``direction``
    ('up' / 'down' / 'both').  Output (series_id, time, mk_s, z,
    trend_direction)."""
    from kats_spark.operators.interval import norm_ppf

    zcrit = float(norm_ppf(1.0 - alpha / 2.0))
    w = s.w().rowsBetween(-(window_size - 1), 0)
    base = df.withColumn("__arr", F.collect_list(F.col(s.value)).over(w)).filter(
        F.size("__arr") == window_size
    )
    n = float(window_size)

    def _tadj(acc, d):
        t = F.size(F.filter(F.col("__arr"), lambda x: x == d)).cast("double")
        return acc + t * (t - 1) * (2 * t + 5)

    tie_adj = F.aggregate(F.array_distinct("__arr"), F.lit(0.0), _tadj)
    var_s = (F.lit(n * (n - 1) * (2 * n + 5)) - tie_adj) / 18.0
    scored = base.withColumn("mk_s", _pairwise_s(F.col("__arr"))).withColumn(
        "__var", var_s
    )
    z = (
        F.when(F.col("mk_s") > 0, (F.col("mk_s") - 1) / F.sqrt("__var"))
        .when(F.col("mk_s") < 0, (F.col("mk_s") + 1) / F.sqrt("__var"))
        .otherwise(F.lit(0.0))
    )
    out = scored.withColumn("z", z).withColumn(
        "trend_direction",
        F.when(F.col("z") > 0, F.lit("up"))
        .when(F.col("z") < 0, F.lit("down"))
        .otherwise(F.lit("no_trend")),
    )
    out = out.filter(F.abs(F.col("z")) > F.lit(zcrit))
    if direction in ("up", "down"):
        out = out.filter(F.col("trend_direction") == direction)
    return out.select(s.series_id, s.time, "mk_s", "z", "trend_direction")
