"""Per-series statistical features as pure aggregate/window expressions.

Parity with kats/tsfeatures/tsfeatures.py "statistics" and related groups
(registry :108-125): length, mean, var, lumpiness(:661), stability(:690),
flat_spots(:872), crossing_points(:1194), binarize_mean(:1212),
std1st_der(:1176), level_shift features(:807-871), histogram_mode(:1224),
plus the CUSUM transform (kats/detectors/cusum_detection.py:345-430 core)
as a running-sum expression.

Everything here is closed-form Spark SQL — one groupBy(series_id) produces
the whole feature row, with map-side partial aggregation at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def _rn(s: TSSchema) -> Column:
    return F.row_number().over(s.w()) - 1


def tiled_stat_of_stat(
    df: DataFrame,
    window_size: int,
    inner: str,
    outer: str,
    out_col: str,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Generic tiled (tumbling) window statistic-of-statistic.

    lumpiness (tsfeatures.py:661) = var of tiled-window variances;
    stability (tsfeatures.py:690) = var of tiled-window means.
    Tiling = floor(row_number / w) groupBy — two cheap aggregations.
    """
    agg_inner = {"var": F.var_samp, "mean": F.avg}[inner]
    agg_outer = {"var": F.var_samp, "mean": F.avg}[outer]
    tiles = (
        df.withColumn("__tile", F.floor(_rn(s) / window_size))
        .groupBy(s.series_id, "__tile")
        .agg(agg_inner(s.value).alias("__stat"), F.count("*").alias("__n"))
        .filter(F.col("__n") == window_size)  # reference drops ragged tail tiles
    )
    return tiles.groupBy(s.series_id).agg(agg_outer("__stat").alias(out_col))


def lumpiness(df: DataFrame, window_size: int = 20, s: TSSchema = DEFAULT) -> DataFrame:
    return tiled_stat_of_stat(df, window_size, "var", "var", "lumpiness", s)


def stability(df: DataFrame, window_size: int = 20, s: TSSchema = DEFAULT) -> DataFrame:
    return tiled_stat_of_stat(df, window_size, "mean", "var", "stability", s)


def crossing_points(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Number of median-crossings (tsfeatures.py:1194 crosses the median).

    flag = x > median(series); crossings = count(flag != lag(flag)).
    """
    med = df.groupBy(s.series_id).agg(F.median(s.value).alias("__med"))
    flagged = (
        df.join(med, s.series_id)
        .withColumn("__b", (F.col(s.value) > F.col("__med")).cast("int"))
        .withColumn("__prev", F.lag("__b").over(s.w()))
    )
    return flagged.groupBy(s.series_id).agg(
        F.sum((F.col("__b") != F.col("__prev")).cast("int")).alias("crossing_points")
    )


def binarize_mean(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Share of points above the series mean (tsfeatures.py:1212)."""
    mean_ = df.groupBy(s.series_id).agg(F.avg(s.value).alias("__m"))
    return (
        df.join(mean_, s.series_id)
        .groupBy(s.series_id)
        .agg(F.avg((F.col(s.value) > F.col("__m")).cast("double")).alias("binarize_mean"))
    )


def std_first_derivative(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Stddev of first differences (tsfeatures.py:1176 std1st_der)."""
    d = F.col(s.value) - F.lag(s.value).over(s.w())
    return (
        df.withColumn("__d", d)
        .groupBy(s.series_id)
        .agg(F.stddev_samp("__d").alias("std1st_der"))
    )


def flat_spots(df: DataFrame, n_buckets: int = 10, s: TSSchema = DEFAULT) -> DataFrame:
    """Max run length within equal-width value buckets (tsfeatures.py:872).

    Run-length encoding with windows: a new run starts when the bucket
    changes; run_id = running count of starts; answer = max run size.
    """
    mm = df.groupBy(s.series_id).agg(F.min(s.value).alias("__lo"), F.max(s.value).alias("__hi"))
    b = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(s.value) - F.col("__lo")) / ((F.col("__hi") - F.col("__lo")) / n_buckets)),
    )
    bucketed = df.join(mm, s.series_id).withColumn("__bkt", b)
    start = (F.col("__bkt") != F.lag("__bkt").over(s.w())).cast("int")
    runs = bucketed.withColumn("__start", F.coalesce(start, F.lit(1))).withColumn(
        "__run", F.sum("__start").over(s.w().rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.groupBy(s.series_id, "__run")
        .count()
        .groupBy(s.series_id)
        .agg(F.max("count").alias("flat_spots"))
    )


def level_shift_features(df: DataFrame, window_size: int = 10, s: TSSchema = DEFAULT) -> DataFrame:
    """level_shift_idx / level_shift_size (tsfeatures.py:807-871): max jump
    between adjacent trailing-window means."""
    w = s.w().rowsBetween(-(window_size - 1), 0)
    rm = F.avg(s.value).over(w)
    cnt = F.count(s.value).over(w)
    stepped = (
        df.withColumn("__rm", F.when(cnt >= window_size, rm))
        .withColumn("__jump", F.abs(F.col("__rm") - F.lag("__rm").over(s.w())))
        .withColumn("__idx", F.row_number().over(s.w()) - 1)
    )
    best = Window.partitionBy(s.series_id).orderBy(F.desc_nulls_last("__jump"), F.asc("__idx"))
    return (
        stepped.withColumn("__rk", F.row_number().over(best))
        .filter(F.col("__rk") == 1)
        .select(
            s.series_id,
            F.col("__idx").alias("level_shift_idx"),
            F.col("__jump").alias("level_shift_size"),
        )
    )


def histogram_mode(df: DataFrame, n_buckets: int = 10, s: TSSchema = DEFAULT) -> DataFrame:
    """Midpoint of the most-populated equal-width bucket (tsfeatures.py:1224)."""
    mm = df.groupBy(s.series_id).agg(F.min(s.value).alias("__lo"), F.max(s.value).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / n_buckets
    b = F.least(F.lit(n_buckets - 1), F.floor((F.col(s.value) - F.col("__lo")) / width))
    counts = (
        df.join(mm, s.series_id)
        .withColumn("__bkt", b)
        .groupBy(s.series_id, "__bkt")
        .agg(F.count("*").alias("__c"), F.first("__lo").alias("__lo"), F.first("__hi").alias("__hi"))
    )
    best = Window.partitionBy(s.series_id).orderBy(F.desc("__c"), F.asc("__bkt"))
    width2 = (F.col("__hi") - F.col("__lo")) / n_buckets
    return (
        counts.withColumn("__rk", F.row_number().over(best))
        .filter(F.col("__rk") == 1)
        .select(
            s.series_id,
            (F.col("__lo") + (F.col("__bkt") + 0.5) * width2).alias("histogram_mode"),
        )
    )


def cusum_transform(df: DataFrame, s: TSSchema = DEFAULT, out_col: str = "cusum") -> DataFrame:
    """Running sum of demeaned values — the CUSUM statistic underlying
    changepoint detection (kats/detectors/cusum_detection.py:345-430)."""
    mean_ = df.groupBy(s.series_id).agg(F.avg(s.value).alias("__m"))
    run = F.sum(F.col(s.value) - F.col("__m")).over(
        s.w().rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.join(mean_, s.series_id).withColumn(out_col, run).drop("__m")


def basic_stats(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """length / mean / var (tsfeatures.py:588-660 statistics group core)."""
    return df.groupBy(s.series_id).agg(
        F.count(s.value).alias("length"),
        F.avg(s.value).alias("mean"),
        F.var_samp(s.value).alias("var"),
        F.stddev_samp(s.value).alias("std"),
        F.skewness(s.value).alias("skewness"),
        F.kurtosis(s.value).alias("kurtosis"),
    )


def stats_bundle(
    df: DataFrame,
    window_size: int = 20,
    n_buckets: int = 10,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """The whole statistics feature group in ONE logical pipeline.

    The naive assembly (one operator frame per feature, joined at the end)
    scans the source 8× and shuffles 22× at sf0.01.  Here:

    - pass 1: one groupBy(series_id) produces every whole-series moment
      (count/mean/var/min/max/median) — map-side combinable;
    - the tiny per-series frame broadcasts back onto the raw rows, and ONE
      window (the per-series sort) computes every row-local derivation
      (diff, median-cross flag, bucket, run id, tile id) shared by all
      downstream branches;
    - branches re-aggregate on their own keys (series / series,tile /
      series,run / series,bucket) — each prunes to the 2-3 columns it
      needs, so the branch re-scans are narrow.

    Everything is a WINDOW aggregate: every partition spec below is
    prefixed by series_id, and Spark's HashPartitioning(series_id)
    satisfies ClusteredDistribution(series_id, X) — so the whole feature
    set computes after ONE exchange and ONE file scan (sub-key windows
    add only in-partition sorts).  The final filter keeps one row per
    series.  Output matches the separate operators exactly (same
    expressions over the same rows — oracle-identical)."""
    w_all = Window.partitionBy(s.series_id)
    w_ord = s.w()
    v = F.col(s.value)

    # whole-series moments as window aggs (no pre-pass, no join)
    step1 = df.select(
        s.series_id,
        F.col(s.time),
        v.alias("__v"),
        F.count(s.value).over(w_all).alias("length"),
        F.avg(s.value).over(w_all).alias("mean"),
        F.var_samp(s.value).over(w_all).alias("var"),
        F.min(s.value).over(w_all).alias("__lo"),
        F.max(s.value).over(w_all).alias("__hi"),
        F.median(s.value).over(w_all).alias("__med"),
        (F.row_number().over(w_ord) - 1).alias("__rn"),
        (v - F.lag(v).over(w_ord)).alias("__d"),
        F.lag(v).over(w_ord).alias("__pv"),
    )
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("__v") - F.col("__lo")) / ((F.col("__hi") - F.col("__lo")) / n_buckets)),
    )
    b = (F.col("__v") > F.col("__med")).cast("int")
    pb = (F.col("__pv") > F.col("__med")).cast("int")
    step2 = step1.select(
        "*",
        bucket.alias("__bkt"),
        b.alias("__b"),
        pb.alias("__prev"),
        (F.col("__v") > F.col("mean")).cast("double").alias("__above_mean"),
        F.floor(F.col("__rn") / window_size).alias("__tile"),
    )
    prev_bkt = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("__pv") - F.col("__lo")) / ((F.col("__hi") - F.col("__lo")) / n_buckets)),
    )
    start = F.coalesce((F.col("__bkt") != prev_bkt).cast("int"), F.lit(1))
    step3 = step2.withColumn(
        "__run", F.sum(start).over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    )
    # sub-key windows: same series_id hash partitioning, sort-only
    w_tile = Window.partitionBy(s.series_id, "__tile")
    w_run = Window.partitionBy(s.series_id, "__run")
    w_bkt = Window.partitionBy(s.series_id, "__bkt")
    step4 = step3.select(
        "*",
        F.var_samp("__v").over(w_tile).alias("__tv"),
        F.avg("__v").over(w_tile).alias("__tm"),
        F.count("*").over(w_tile).alias("__tn"),
        F.count("*").over(w_run).alias("__rl"),
        F.count("*").over(w_bkt).alias("__bc"),
        F.row_number().over(
            Window.partitionBy(s.series_id, "__tile").orderBy("__rn")
        ).alias("__tile_rn"),
    )
    # one representative row per tile/bucket keeps stat-of-stat unweighted
    tile_var_rep = F.when((F.col("__tile_rn") == 1) & (F.col("__tn") == window_size), F.col("__tv"))
    tile_mean_rep = F.when((F.col("__tile_rn") == 1) & (F.col("__tn") == window_size), F.col("__tm"))
    final = step4.select(
        "*",
        F.sum((F.col("__b") != F.col("__prev")).cast("int")).over(w_all).alias("crossing_points"),
        F.avg("__above_mean").over(w_all).alias("binarize_mean"),
        F.stddev_samp("__d").over(w_all).alias("std1st_der"),
        F.var_samp(tile_var_rep).over(w_all).alias("lumpiness"),
        F.var_samp(tile_mean_rep).over(w_all).alias("stability"),
        F.max("__rl").over(w_all).alias("flat_spots"),
        F.max(F.struct(F.col("__bc"), (-F.col("__bkt")).alias("__nb"))).over(w_all).alias("__best"),
    )
    hmode = (
        F.col("__lo")
        + (-F.col("__best.__nb") + 0.5) * ((F.col("__hi") - F.col("__lo")) / n_buckets)
    )
    return final.filter(F.col("__rn") == 0).select(
        s.series_id,
        "length",
        "mean",
        "var",
        "lumpiness",
        "stability",
        "crossing_points",
        "binarize_mean",
        "std1st_der",
        F.col("flat_spots").cast("bigint").alias("flat_spots"),
        hmode.alias("histogram_mode"),
    )
