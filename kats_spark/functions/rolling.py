"""Rolling-statistics anomaly scores as window expressions.

Parity with kats/detectors/rolling_stats_model.py (enum :40-66, score
functions :58-187, model :188): each score compares a point against its own
trailing window.  The reference loops a pandas ``.rolling`` over one series;
here every score is a Spark window expression evaluated for *all* series and
*all* points in one pass — no UDF, one shuffle on series_id.

Scores:
- ``z_score``: (x - mean_w) / std_w
- ``iqr_score``: (x - median_w) / (q75_w - q25_w)
- ``mad_score``: (x - median_w) / MAD_w   (MAD = median(|x - median|))
- ``modified_z_score_mad``: 0.6745 * (x - median_w) / MAD_w
- ``iqr_median_deviation``: (x - median_w) / median_w

Exact percentiles (``F.percentile``) are used so results hash-match the
DuckDB oracle; at 100 TB swap to ``percentile_approx`` (same plan shape,
documented knob).  MAD needs re-centering inside each frame, which no SQL
window aggregate expresses directly — we collect the trailing window as an
array (bounded: window length n) and evaluate the nested median with
higher-order array functions, still JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def trailing_window(s: TSSchema, n: int, include_current: bool = False):
    """rows [-n, -1] (score point excluded, reference's point_based=False)
    or [-n+1, 0] when the current point is part of the window."""
    if include_current:
        return s.w().rowsBetween(-(n - 1), 0)
    return s.w().rowsBetween(-n, -1)


def rolling_mean(n: int, s: TSSchema = DEFAULT, include_current: bool = False) -> Column:
    return F.avg(s.value).over(trailing_window(s, n, include_current))


def rolling_std(n: int, s: TSSchema = DEFAULT, include_current: bool = False) -> Column:
    return F.stddev_samp(s.value).over(trailing_window(s, n, include_current))


def _safe_div(num: Column, denom: Column) -> Column:
    """NULL on a zero/NULL denominator (ANSI-safe: Spark 4 raises on /0)."""
    return F.when(denom != 0, num / denom)


def z_score(n: int, s: TSSchema = DEFAULT) -> Column:
    """(x - rolling_mean) / rolling_std (rolling_stats_model.py:58-90)."""
    return _safe_div(F.col(s.value) - rolling_mean(n, s), rolling_std(n, s))


def _exact_pct(col: str, p: float, w) -> Column:
    return F.percentile(F.col(col), F.lit(p)).over(w)


def iqr_score(n: int, s: TSSchema = DEFAULT) -> Column:
    """(x - median) / IQR over the trailing window
    (rolling_stats_model.py iqr variant)."""
    w = trailing_window(s, n)
    med = _exact_pct(s.value, 0.5, w)
    iqr = _exact_pct(s.value, 0.75, w) - _exact_pct(s.value, 0.25, w)
    return _safe_div(F.col(s.value) - med, iqr)


def iqr_median_deviation(n: int, s: TSSchema = DEFAULT) -> Column:
    """(x - median) / median (rolling_stats_model.py iqr_median_deviation)."""
    w = trailing_window(s, n)
    med = _exact_pct(s.value, 0.5, w)
    return _safe_div(F.col(s.value) - med, med)


def _sorted_median(a: Column) -> Column:
    """Exact median of an ALREADY-SORTED array column: O(1) element_at
    midpoint, no per-call sort."""
    n = F.size(a)
    mid = (n / 2).cast("int")
    odd = F.element_at(a, mid + 1)
    even = (F.element_at(a, F.greatest(mid, F.lit(1))) + F.element_at(a, mid + 1)) / 2.0
    return (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, odd)
        .otherwise(even)
    )


def _array_median(arr: Column) -> Column:
    """Exact median of an array column via sort + midpoint — higher-order
    expressions only, evaluated JVM-side per row (array length = window n,
    bounded and small)."""
    return _sorted_median(F.array_sort(arr))


def mad_score(n: int, s: TSSchema = DEFAULT, modified: bool = False) -> Column:
    """(x - median) / MAD; modified z multiplies by 0.6745
    (rolling_stats_model.py mad / modified z variants).

    Column-expression form: the nested median forces the sorted-window
    array to be re-derived inside the abs-deviation lambda, so cost is
    O(w^2 log w) per row.  Fine for modest windows; for the batch query
    path prefer :func:`with_mad_scores`, which materializes the sorted
    array and median as columns once (O(w log w) per row)."""
    w = trailing_window(s, n)
    sa = F.array_sort(F.collect_list(F.col(s.value)).over(w))
    med = _sorted_median(sa)
    abs_dev = F.transform(sa, lambda v: F.abs(v - med))
    mad = _array_median(abs_dev)
    score = _safe_div(F.col(s.value) - med, mad)
    return score * 0.6745 if modified else score


def with_mad_scores(
    df: DataFrame,
    n: int,
    s: TSSchema = DEFAULT,
    score_col: str = "mad_score",
    mod_col: str | None = None,
) -> DataFrame:
    """MAD / modified-z rolling scores with the intermediates (sorted
    window array, its median) materialized as columns, so the
    abs-deviation lambda references the median VALUE instead of
    re-inlining the median EXPRESSION per array element.

    Same semantics as :func:`mad_score` (asserted in tests); ~100x faster
    because the per-row cost drops from O(w^2 log w) expression re-eval to
    one sort + one transform + one sort.  CollapseProject keeps the
    staging columns separate because each is a non-trivial expression
    referenced more than once."""
    w = trailing_window(s, n)
    df = df.withColumn("__sa", F.array_sort(F.collect_list(F.col(s.value)).over(w)))
    df = df.withColumn("__med", _sorted_median(F.col("__sa")))
    df = df.withColumn(
        "__mad",
        _sorted_median(
            F.array_sort(
                F.transform(F.col("__sa"), lambda v: F.abs(v - F.col("__med")))
            )
        ),
    )
    df = df.withColumn(
        score_col, _safe_div(F.col(s.value) - F.col("__med"), F.col("__mad"))
    )
    if mod_col is not None:
        df = df.withColumn(mod_col, F.col(score_col) * 0.6745)
    return df.drop("__sa", "__med", "__mad")


def segmented_score(
    df: DataFrame,
    n: int,
    score: str = "z_score",
    segment_rows: int = 4096,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Skew-proof rolling score for GIANT series (SURVEY §7 hard part (e);
    the reference chunks long series the same way —
    kats/detectors/stat_sig_detector.py:66 ``max_split_ts_length``).

    A per-series window puts the whole series in one task; a single
    100M-point series stalls the stage no matter how many executors
    exist.  Fix: split each series into ``segment_rows`` tiles, copy the
    trailing ``n`` boundary rows into the NEXT tile (so every point still
    sees its full window), compute the same frame expression per
    (series_id, segment), and drop the copies.  Output is IDENTICAL to
    the plain window — asserted in tests — but the shuffle key becomes
    (series_id, segment): parallelism scales with series length, per-task
    memory is bounded by segment_rows + n.

    Cost: one extra narrow duplicate of n/segment_rows of the rows and a
    shuffle keyed on (series_id, segment) instead of (series_id)."""
    if score not in ("z_score",):
        raise ValueError(f"segmented_score supports z_score (got {score!r})")
    if n >= segment_rows:
        raise ValueError(
            f"window n={n} must be < segment_rows={segment_rows}: each tile "
            "must hold more fresh rows than carried boundary rows"
        )
    rn = F.row_number().over(s.w()) - 1
    base = df.withColumn("__rn", rn).withColumn(
        "__seg", (F.col("__rn") / segment_rows).cast("long")
    )
    # boundary rows: the last n rows of each tile also feed the next tile
    own = base.withColumn("__home", F.lit(True))
    carry = (
        base.filter(F.col("__rn") % segment_rows >= segment_rows - n)
        .withColumn("__seg", F.col("__seg") + 1)
        .withColumn("__home", F.lit(False))
    )
    stacked = own.unionByName(carry)
    w = (
        Window.partitionBy(s.series_id, "__seg")
        .orderBy("__rn")
        .rowsBetween(-n, -1)
    )
    mean = F.avg(s.value).over(w)
    std = F.stddev_samp(s.value).over(w)
    out = stacked.withColumn("score", _safe_div(F.col(s.value) - mean, std))
    return out.filter(F.col("__home")).drop("__rn", "__seg", "__home")
