"""PercentageChange: two-interval comparison with t-test + delta method.

Parity with kats/detectors/detector_consts.py:179-555 (``PercentageChange``
over two ``ChangePointInterval``s): compare the trailing ``n_test`` points
of each series against the ``n_control`` points before them —
  - perc_change = (mean_test/mean_control - 1) * 100
  - t_score = mean_diff / pooled_stddev  (the reference's default
    ``use_corrected_scores=False`` divides by s_p, NOT s_p*sqrt(1/n1+1/n2)
    — detector_consts.py:373-404 — reproduced verbatim)
  - delta-method CI of the ratio (detector_consts.py:522-555):
    sigma^2 = v_t/(n_t*m_c^2) - 2*m_t*cov/(m_c^3) + v_c*m_t^2/(n_c*m_c^4),
    cov = sample-cov of the positionally-aligned interval tails / n_min
    (detector_consts.py:495-520 ``_calc_cov``)
  - stat_sig = NOT (upper > 1 AND lower < 1)

Spark shape: one descending row_number window splits the tail into
test/control, a single conditional groupBy computes every segment moment
in one pass, and the covariance pairs tails with one equi-join on
(series_id, tail_index) — no UDFs, fully Catalyst-optimizable, and the
shuffle keys stay on series_id so a 100 TB run is one window + one join
on the same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT

# norm.ppf(0.025), the reference's alpha=0.05 two-sided z
_Z_ALPHA = -1.9599639845400545


def percentage_change(
    df: DataFrame,
    n_control: int,
    n_test: int,
    min_perc_change: float = 0.0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """One row per series: (series_id, n_control, n_test, mean_control,
    mean_test, perc_change, t_score, perc_change_lower, perc_change_upper,
    direction, stat_sig)."""
    rn = F.row_number().over(
        Window.partitionBy(s.series_id).orderBy(F.col(s.time).desc())
    )
    tail = (
        df.select(s.series_id, s.time, s.value)
        .withColumn("__rn", rn)
        .filter(F.col("__rn") <= n_control + n_test)
        .withColumn(
            "__side", F.when(F.col("__rn") <= n_test, "test").otherwise("control")
        )
    )
    v = F.col(s.value)
    is_t = F.col("__side") == "test"
    agg = tail.groupBy(s.series_id).agg(
        F.count(F.when(is_t, v)).alias("n_t"),
        F.count(F.when(~is_t, v)).alias("n_c"),
        F.avg(F.when(is_t, v)).alias("m_t"),
        F.avg(F.when(~is_t, v)).alias("m_c"),
        F.var_samp(F.when(is_t, v)).alias("v_t"),
        F.var_samp(F.when(~is_t, v)).alias("v_c"),
    )
    # positionally-aligned tails: test tail index j pairs with control tail
    # index j (both counted from each interval's end), j <= min(n_c, n_t)
    t_rows = tail.filter(is_t).select(
        s.series_id, F.col("__rn").alias("__j"), v.alias("__x")
    )
    c_rows = tail.filter(~is_t).select(
        s.series_id, (F.col("__rn") - n_test).alias("__j"), v.alias("__y")
    )
    n_min = min(n_control, n_test)
    cov = (
        t_rows.join(c_rows, [s.series_id, "__j"])
        .filter(F.col("__j") <= n_min)
        .groupBy(s.series_id)
        .agg((F.covar_samp("__x", "__y") / F.lit(n_min)).alias("cov_xy"))
    )
    j = agg.join(cov, s.series_id)
    ratio = F.col("m_t") / F.col("m_c")
    perc = (ratio - 1.0) * 100.0
    sp = F.sqrt(
        ((F.col("n_c") - 1) * F.col("v_c") + (F.col("n_t") - 1) * F.col("v_t"))
        / (F.col("n_c") + F.col("n_t") - 2)
    )
    t_score_raw = (F.col("m_t") - F.col("m_c")) / sp
    t_score = F.when(F.abs(perc) < min_perc_change, 0.0).otherwise(t_score_raw)
    sigma_sq = (
        F.col("v_t") / (F.col("n_t") * F.col("m_c") * F.col("m_c"))
        - 2.0 * F.col("m_t") * F.col("cov_xy")
        / (F.col("m_c") * F.col("m_c") * F.col("m_c"))
        + F.col("v_c") * F.col("m_t") * F.col("m_t")
        / (F.col("n_c") * F.pow(F.col("m_c"), 4))
    )
    lower = ratio + _Z_ALPHA * F.sqrt(F.abs(sigma_sq))
    upper = ratio - _Z_ALPHA * F.sqrt(F.abs(sigma_sq))
    return j.select(
        s.series_id,
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_test"),
        F.col("m_c").alias("mean_control"),
        F.col("m_t").alias("mean_test"),
        perc.alias("perc_change"),
        t_score.alias("t_score"),
        ((lower - 1.0) * 100.0).alias("perc_change_lower"),
        ((upper - 1.0) * 100.0).alias("perc_change_upper"),
        F.when(perc > 0.0, "up").otherwise("down").alias("direction"),
        (~((upper > 1.0) & (lower < 1.0))).cast("int").alias("stat_sig"),
    )
