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


def _chunk_id(rn: Column, n: Column, window_size: int) -> Column:
    """np.array_split chunk index — the reference's EXACT tiling for
    lumpiness/stability (tsfeatures.py:661,690: ``np.array_split(x,
    len(x) // window_size + 1)``): k = n//w + 1 chunks, the first
    (n mod k) of size n//k + 1, the rest of size n//k.  r10 parity fix:
    the old fixed-width tumbling tiles (+ complete-tile filter) are a
    different chunking that lands different variances on any n not a
    multiple of the window."""
    k = F.floor(n / window_size) + 1
    sz = F.floor(n / k)
    r = n % k
    head = r * (sz + 1)
    return F.when(rn < head, F.floor(rn / (sz + 1))).otherwise(
        r + F.floor((rn - head) / sz)
    )


def tiled_stat_of_stat(
    df: DataFrame,
    window_size: int,
    inner: str,
    outer: str,
    out_col: str,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Chunked statistic-of-statistic on the reference's array_split
    tiling with POPULATION variance at both levels (np.var default —
    tsfeatures.py:661 lumpiness = var of chunk variances, :690
    stability = var of chunk means)."""
    agg_inner = {"var": F.var_pop, "mean": F.avg}[inner]
    agg_outer = {"var": F.var_pop, "mean": F.avg}[outer]
    n = F.count(s.value).over(Window.partitionBy(s.series_id))
    tiles = (
        df.withColumn("__tile", _chunk_id(_rn(s), n, window_size))
        .groupBy(s.series_id, "__tile")
        .agg(agg_inner(s.value).alias("__stat"))
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


def _gradient(s: TSSchema) -> Column:
    """np.gradient over the per-series order (tsfeatures.py:1176
    std1st_der operates on the gradient, not lag-1 diffs — r10 parity
    fix): central differences (lead - lag)/2 in the interior, one-sided
    at both edges."""
    v = F.col(s.value)
    nxt = F.lead(s.value).over(s.w())
    prv = F.lag(s.value).over(s.w())
    return (
        F.when(prv.isNull(), nxt - v)
        .when(nxt.isNull(), v - prv)
        .otherwise((nxt - prv) / 2.0)
    )


def std_first_derivative(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """POPULATION stddev of np.gradient (tsfeatures.py:1176 std1st_der:
    ``np.std(np.gradient(x))``)."""
    return (
        df.withColumn("__g", _gradient(s))
        .groupBy(s.series_id)
        .agg(F.stddev_pop("__g").alias("std1st_der"))
    )


def flat_spots(df: DataFrame, n_buckets: int = 10, s: TSSchema = DEFAULT) -> DataFrame:
    """Max run length of EQUAL CONSECUTIVE VALUES within time segments of
    width ``len(x) // nbins`` (tsfeatures.py:872-901 — the Kats variant;
    r10 parity fix: the old implementation ran the R-tsfeatures
    value-bucket runs, a different feature).  A run breaks when the
    value changes OR the segment boundary is crossed; series shorter
    than ``nbins`` emit NULL like the reference's NaN."""
    n = F.count(s.value).over(Window.partitionBy(s.series_id))
    # greatest(1, ...) guards the n <= nbins division by zero (ANSI mode
    # throws before the NULL output gate below applies — ADVICE r10);
    # those series emit NULL regardless via the __n > n_buckets gate.
    seg_w = F.greatest(F.lit(1), F.floor(n / n_buckets))
    segged = df.withColumn("__n", n).withColumn(
        "__seg", F.floor(_rn(s) / seg_w)
    )
    start = (
        (F.col(s.value) != F.lag(s.value).over(s.w()))
        | (F.col("__seg") != F.lag("__seg").over(s.w()))
    ).cast("int")
    runs = segged.withColumn("__start", F.coalesce(start, F.lit(1))).withColumn(
        "__run", F.sum("__start").over(s.w().rowsBetween(Window.unboundedPreceding, 0))
    )
    per_run = runs.groupBy(s.series_id, "__run").agg(
        F.count("*").alias("__len"), F.first("__n").alias("__n")
    )
    return per_run.groupBy(s.series_id).agg(
        F.when(F.first("__n") > n_buckets, F.max("__len")).alias("flat_spots")
    )


def level_shift_features(df: DataFrame, window_size: int = 20, s: TSSchema = DEFAULT) -> DataFrame:
    """level_shift_idx / level_shift_size (tsfeatures.py:819-866): max
    |mean difference| between CONSECUTIVE SLIDING windows of width
    ``window_size`` (stride 1) — means[i] = mean(x[i:i+w]),
    diff[i] = |means[i] - means[i+1]|, idx = argmax (first maximum).
    r10 parity fixes: forward (not trailing) windows so the reported
    index is the reference's 0-based diff index, the reference's default
    width 20, and series shorter than window_size + 2 emit NULL."""
    w = s.w().rowsBetween(0, window_size - 1)
    rm = F.avg(s.value).over(w)
    cnt = F.count(s.value).over(w)
    n = F.count(s.value).over(Window.partitionBy(s.series_id))
    stepped = (
        df.withColumn("__rm", F.when(cnt == window_size, rm))
        .withColumn(
            "__jump", F.abs(F.lead("__rm").over(s.w()) - F.col("__rm"))
        )
        .withColumn("__idx", F.row_number().over(s.w()) - 1)
        .withColumn("__n", n)
    )
    best = Window.partitionBy(s.series_id).orderBy(
        F.desc_nulls_last("__jump"), F.asc("__idx")
    )
    return (
        stepped.withColumn("__rk", F.row_number().over(best))
        .filter(F.col("__rk") == 1)
        .select(
            s.series_id,
            F.when(F.col("__n") >= window_size + 2, F.col("__idx")).alias(
                "level_shift_idx"
            ),
            F.when(F.col("__n") >= window_size + 2, F.col("__jump")).alias(
                "level_shift_size"
            ),
        )
    )


def histogram_mode(df: DataFrame, n_buckets: int = 10, s: TSSchema = DEFAULT) -> DataFrame:
    """LEFT EDGE of the most-populated equal-width bucket — exactly
    ``np.histogram(x, nbins); val[cnt.argmax()]`` (tsfeatures.py:1291;
    r10 parity fix: the old version returned the bucket MIDPOINT, half a
    bin width off the reference everywhere)."""
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
            (F.col("__lo") + F.col("__bkt") * width2).alias("histogram_mode"),
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
    """length / mean / var (tsfeatures.py:588-660 statistics group core).
    ``var``/``std`` are POPULATION moments — the reference's np.var /
    np.std defaults (r10 parity fix: var_samp is off by (n-1)/n, pinned
    by the committed METALEARNING_TEST_T1 vector)."""
    return df.groupBy(s.series_id).agg(
        F.count(s.value).alias("length"),
        F.avg(s.value).alias("mean"),
        F.var_pop(s.value).alias("var"),
        F.stddev_pop(s.value).alias("std"),
        F.skewness(s.value).alias("skewness"),
        F.kurtosis(s.value).alias("kurtosis"),
    )


def stats_bundle(
    df: DataFrame,
    window_size: int = 20,
    n_buckets: int = 10,
    s: TSSchema = DEFAULT,
    with_moments: bool = False,
    level_shift_window: int | None = None,
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
    expressions over the same rows — oracle-identical).

    ``with_moments`` adds std/skewness/kurtosis (the remaining basic
    moments, same single window pass); ``level_shift_window`` fuses the
    level_shift pair in too (the sliding means and the argmax are more
    windows over the SAME series_id partitioning — r11 wide-row fusion,
    VERDICT r10 item #9: one exchange instead of per-feature joins)."""
    w_all = Window.partitionBy(s.series_id)
    w_ord = s.w()
    v = F.col(s.value)

    moment_cols = (
        [
            F.stddev_pop(s.value).over(w_all).alias("std"),
            F.skewness(s.value).over(w_all).alias("skewness"),
            F.kurtosis(s.value).over(w_all).alias("kurtosis"),
        ]
        if with_moments
        else []
    )
    lsw = level_shift_window
    ls_cols = []
    if lsw is not None:
        w_slide = w_ord.rowsBetween(0, lsw - 1)
        ls_cols = [
            F.when(
                F.count(s.value).over(w_slide) == lsw, F.avg(s.value).over(w_slide)
            ).alias("__lsm")
        ]

    # whole-series moments as window aggs (no pre-pass, no join)
    step1 = df.select(
        s.series_id,
        F.col(s.time),
        v.alias("__v"),
        F.count(s.value).over(w_all).alias("length"),
        F.avg(s.value).over(w_all).alias("mean"),
        F.var_pop(s.value).over(w_all).alias("var"),
        *moment_cols,
        *ls_cols,
        F.min(s.value).over(w_all).alias("__lo"),
        F.max(s.value).over(w_all).alias("__hi"),
        F.median(s.value).over(w_all).alias("__med"),
        (F.row_number().over(w_ord) - 1).alias("__rn"),
        # np.gradient: central differences, one-sided at the edges
        # (tsfeatures.py:1176 std1st_der — r10 parity fix vs lag-1 diffs)
        F.when(F.lag(v).over(w_ord).isNull(), F.lead(v).over(w_ord) - v)
        .when(F.lead(v).over(w_ord).isNull(), v - F.lag(v).over(w_ord))
        .otherwise((F.lead(v).over(w_ord) - F.lag(v).over(w_ord)) / 2.0)
        .alias("__g"),
        F.lag(v).over(w_ord).alias("__pv"),
    )
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("__v") - F.col("__lo")) / ((F.col("__hi") - F.col("__lo")) / n_buckets)),
    )
    b = (F.col("__v") > F.col("__med")).cast("int")
    pb = (F.col("__pv") > F.col("__med")).cast("int")
    # lumpiness/stability chunking = np.array_split (r10 parity fix):
    # k = n//w + 1 chunks, first (n mod k) of size n//k + 1
    k = F.floor(F.col("length") / window_size) + 1
    csz = F.floor(F.col("length") / k)
    crem = F.col("length") % k
    chead = crem * (csz + 1)
    chunk = F.when(F.col("__rn") < chead, F.floor(F.col("__rn") / (csz + 1))).otherwise(
        crem + F.floor((F.col("__rn") - chead) / csz)
    )
    # flat_spots segmentation: width n // nbins, runs of EQUAL values
    # (tsfeatures.py:872 — r10 parity fix vs value-bucket runs);
    # greatest(1, ...) guards the n <= nbins division by zero under ANSI
    # (ADVICE r10) — those series emit NULL via the length gate anyway
    segw = F.greatest(F.lit(1), F.floor(F.col("length") / n_buckets))
    ls_jump = (
        [F.abs(F.lead("__lsm").over(w_ord) - F.col("__lsm")).alias("__lsj")]
        if lsw is not None
        else []
    )
    step2 = step1.select(
        "*",
        bucket.alias("__bkt"),
        b.alias("__b"),
        pb.alias("__prev"),
        (F.col("__v") > F.col("mean")).cast("double").alias("__above_mean"),
        chunk.alias("__tile"),
        F.floor(F.col("__rn") / segw).alias("__seg"),
        *ls_jump,
    )
    start = F.coalesce(
        (
            (F.col("__v") != F.col("__pv"))
            | (F.col("__seg") != F.floor((F.col("__rn") - 1) / segw))
        ).cast("int"),
        F.lit(1),
    )
    step3 = step2.withColumn(
        "__run", F.sum(start).over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    )
    # sub-key windows: same series_id hash partitioning, sort-only
    w_tile = Window.partitionBy(s.series_id, "__tile")
    w_run = Window.partitionBy(s.series_id, "__run")
    w_bkt = Window.partitionBy(s.series_id, "__bkt")
    step4 = step3.select(
        "*",
        F.var_pop("__v").over(w_tile).alias("__tv"),
        F.avg("__v").over(w_tile).alias("__tm"),
        F.count("*").over(w_run).alias("__rl"),
        F.count("*").over(w_bkt).alias("__bc"),
        F.row_number().over(
            Window.partitionBy(s.series_id, "__tile").orderBy("__rn")
        ).alias("__tile_rn"),
    )
    # one representative row per chunk/bucket keeps stat-of-stat unweighted
    tile_var_rep = F.when(F.col("__tile_rn") == 1, F.col("__tv"))
    tile_mean_rep = F.when(F.col("__tile_rn") == 1, F.col("__tm"))
    ls_best = (
        [
            # first-maximum tie semantics of level_shift_features'
            # (desc_nulls_last jump, asc idx) rank: NULL jumps sink via
            # the -inf fill, idx ties break to the smaller via -__rn max
            F.max(
                F.struct(
                    F.coalesce(F.col("__lsj"), F.lit(float("-inf"))).alias("__j"),
                    (-F.col("__rn")).alias("__ni"),
                )
            )
            .over(w_all)
            .alias("__lsbest")
        ]
        if lsw is not None
        else []
    )
    final = step4.select(
        "*",
        F.sum((F.col("__b") != F.col("__prev")).cast("int")).over(w_all).alias("crossing_points"),
        F.avg("__above_mean").over(w_all).alias("binarize_mean"),
        F.stddev_pop("__g").over(w_all).alias("std1st_der"),
        F.var_pop(tile_var_rep).over(w_all).alias("lumpiness"),
        F.var_pop(tile_mean_rep).over(w_all).alias("stability"),
        F.max("__rl").over(w_all).alias("flat_spots"),
        F.max(F.struct(F.col("__bc"), (-F.col("__bkt")).alias("__nb"))).over(w_all).alias("__best"),
        *ls_best,
    )
    hmode = (
        F.col("__lo")
        + (-F.col("__best.__nb")) * ((F.col("__hi") - F.col("__lo")) / n_buckets)
    )
    extra = ["std", "skewness", "kurtosis"] if with_moments else []
    ls_out = (
        [
            F.when(F.col("length") >= lsw + 2, -F.col("__lsbest.__ni")).alias(
                "level_shift_idx"
            ),
            F.when(
                (F.col("length") >= lsw + 2)
                & (F.col("__lsbest.__j") != float("-inf")),
                F.col("__lsbest.__j"),
            ).alias("level_shift_size"),
        ]
        if lsw is not None
        else []
    )
    return final.filter(F.col("__rn") == 0).select(
        s.series_id,
        "length",
        "mean",
        "var",
        *extra,
        "lumpiness",
        "stability",
        "crossing_points",
        "binarize_mean",
        "std1st_der",
        F.when(F.col("length") > n_buckets, F.col("flat_spots"))
        .cast("bigint")
        .alias("flat_spots"),
        hmode.alias("histogram_mode"),
        *ls_out,
    )
