"""StatSig detector: rolling two-sample t-test, fully native windows.

Parity with kats/detectors/stat_sig_detector.py:44-933
(``StatSigDetectorModel``, fit_predict :199): for each point, compare the
trailing *test* window (n_test points ending at the point) against the
*control* window immediately before it (n_control points), via a
two-sample t statistic:

    score = (mean_test - mean_control) / se
    se    = sqrt(var_test/n_test + var_control/n_control)

The reference rolls this point-by-point in pandas (and splits big series
into chunks for speed, :66 ``max_split_ts_length``).  Here both windows are
Spark frame aggregates — two ``rowsBetween`` specs over one sort — so all
series and all points compute in one pass; the big-series split is
unnecessary because windows distribute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def statsig_scores(
    df: DataFrame,
    n_control: int,
    n_test: int,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Emit per-point t-scores: (series_id, time, value, mean_test,
    mean_control, stat_sig_score).  Points without full windows score NULL
    (reference emits zeros inside the warm-up region; NULL is the
    distributed-friendly equivalent and filters cleanly)."""
    w_test = s.w().rowsBetween(-(n_test - 1), 0)
    w_ctrl = s.w().rowsBetween(-(n_test - 1) - n_control, -n_test)

    mean_t = F.avg(s.value).over(w_test)
    var_t = F.var_samp(s.value).over(w_test)
    cnt_t = F.count(s.value).over(w_test)
    mean_c = F.avg(s.value).over(w_ctrl)
    var_c = F.var_samp(s.value).over(w_ctrl)
    cnt_c = F.count(s.value).over(w_ctrl)

    se = F.sqrt(var_t / cnt_t + var_c / cnt_c)
    score = F.when(
        (cnt_t == n_test) & (cnt_c == n_control) & (se > 0),
        (mean_t - mean_c) / se,
    )
    return df.select(
        s.series_id,
        s.time,
        F.col(s.value),
        mean_t.alias("mean_test"),
        mean_c.alias("mean_control"),
        score.alias("stat_sig_score"),
    )
