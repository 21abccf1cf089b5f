"""Interval detector: pointwise two-sample tests + rejection-interval
consolidation.

Parity with kats/detectors/interval_detector.py:77-620
(``IntervalDetectorModel``): input is the TwoSampleSchema — two concurrent
series pre-joined wide per timestamp (value_a, variance_a, sample_count_a,
value_b, ...; :180-240).  Per point, a two-sample z statistic

    z = (value_b - value_a) / sqrt(variance_a/n_a + variance_b/n_b)

is compared to a critical value; consecutive rejections merge into
``IntervalAnomaly`` spans (:1-30 module docstring describes the
rejection-interval consolidation).  The duration-based critical value
(multiple-testing control over consecutive rejections) is solved
driver-side by ``duration_critical_value`` — same Markov-chain m-run
probability and binary search as the reference, scipy-free.

Everything is expressions: the z-test is arithmetic, consolidation is the
classic gaps-and-islands window pattern — distributed, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT


def two_sample_scores(
    df: DataFrame,
    z_threshold: float = 1.96,
    s: TSSchema = DEFAULT,
    test_statistic: str = "absolute",
    distribution: str = "normal",
    test_type: str = "two_sided",
    effect_size: float = 0.0,
) -> DataFrame:
    """Input wide frame: (series_id, time, value_a, variance_a,
    sample_count_a, value_b, variance_b, sample_count_b).
    Output adds (z_score, rejected).

    Mirrors the reference's full test surface, all as expressions:

    - ``distribution`` picks the per-sample variance model
      (interval_detector.py:1741-1785 normal approximations):
      ``normal`` = variance_x/n_x, ``binomial`` = p(1-p)/n (value is a
      proportion), ``poisson`` = λ/n (value is a count rate).
    - ``test_statistic``: ``absolute`` = (b - a - effect)/se
      (:1509-1563); ``relative`` = delta method on the log ratio,
      (log b - log a - log(1+effect)) / sqrt(va/a² + vb/b²) with the
      reference's 1e-9 clamps (:1566-1620).
    - ``test_type``: ``two_sided`` rejects |z| > threshold;
      ``one_sided_upper`` rejects z > threshold; ``one_sided_lower``
      rejects z < -threshold (TestType enum :255-258).
    """
    a, b = F.col("value_a"), F.col("value_b")
    if distribution == "normal":
        va = F.col("variance_a") / F.col("sample_count_a")
        vb = F.col("variance_b") / F.col("sample_count_b")
    elif distribution == "binomial":
        va = a * (F.lit(1.0) - a) / F.col("sample_count_a")
        vb = b * (F.lit(1.0) - b) / F.col("sample_count_b")
    elif distribution == "poisson":
        va = a / F.col("sample_count_a")
        vb = b / F.col("sample_count_b")
    else:
        raise ValueError(f"unknown distribution {distribution!r}")

    import math

    _EPS = 1.0e-9
    if test_statistic == "absolute":
        z = (b - a - F.lit(float(effect_size))) / F.sqrt(va + vb)
    elif test_statistic == "relative":
        diff = (
            F.log(F.greatest(b, F.lit(_EPS)))
            - F.log(F.greatest(a, F.lit(_EPS)))
            - F.lit(math.log(1.0 + effect_size))
        )
        se = F.sqrt(
            va / F.greatest(a * a, F.lit(_EPS * _EPS))
            + vb / F.greatest(b * b, F.lit(_EPS * _EPS))
        )
        z = diff / se
    else:
        raise ValueError(f"unknown test_statistic {test_statistic!r}")

    if test_type == "two_sided":
        rej = F.abs(z) > z_threshold
    elif test_type == "one_sided_upper":
        rej = z > z_threshold
    elif test_type == "one_sided_lower":
        rej = z < -z_threshold
    else:
        raise ValueError(f"unknown test_type {test_type!r}")
    out = df.withColumn("z_score", z)
    return out.withColumn("rejected", rej.cast("int"))


def consolidate_intervals(
    scored: DataFrame,
    min_len: int = 1,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """Merge consecutive rejected points into (series_id, start_time,
    end_time, n_points, max_abs_z) intervals; keep intervals with at least
    ``min_len`` points (the duration-based control of
    interval_detector.py's consolidation)."""
    w = s.w()
    start_flag = F.when(
        (F.col("rejected") == 1)
        & (F.coalesce(F.lag("rejected").over(w), F.lit(0)) == 0),
        1,
    ).otherwise(0)
    runs = (
        scored.withColumn("__start", start_flag)
        .withColumn(
            "__grp",
            F.sum("__start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("rejected") == 1)
    )
    return (
        runs.groupBy(s.series_id, "__grp")
        .agg(
            F.min(s.time).alias("start_time"),
            F.max(s.time).alias("end_time"),
            F.count("*").alias("n_points"),
            F.max(F.abs(F.col("z_score"))).alias("max_abs_z"),
        )
        .filter(F.col("n_points") >= min_len)
        .drop("__grp")
    )


# --------------------------------------------------------------------------
# Duration-based critical value (interval_detector.py:796-930, 1066-1116):
# choose the per-point rejection probability p so that the chance of ANY
# run of `duration` consecutive false rejections across n points equals
# alpha.  Driver-side scalar math (numpy matrix power + binary search) —
# the result is a plain z threshold fed to two_sample_scores.
# --------------------------------------------------------------------------

def norm_cdf(x: float) -> float:
    import math

    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def norm_ppf(q: float) -> float:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9), refined with one Halley step on erf — no scipy.
    Edge semantics mirror scipy.stats.norm.ppf (the reference's interval
    math passes user alphas straight through, kats linear_model.py: the
    committed INVALID goldens pin ±inf bounds at alpha=0 and NaN bounds
    at alpha<0): q==0 -> -inf, q==1 -> +inf, outside [0,1] -> nan."""
    import math

    if q == 0.0:
        return float("-inf")
    if q == 1.0:
        return float("inf")
    if not 0.0 < q < 1.0:
        return float("nan")
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if q < plow:
        t = math.sqrt(-2 * math.log(q))
        x = (((((c[0]*t+c[1])*t+c[2])*t+c[3])*t+c[4])*t+c[5]) / ((((d[0]*t+d[1])*t+d[2])*t+d[3])*t+1)
    elif q <= phigh:
        t = q - 0.5
        r = t * t
        x = (((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*t / (((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1)
    else:
        t = math.sqrt(-2 * math.log(1 - q))
        x = -(((((c[0]*t+c[1])*t+c[2])*t+c[3])*t+c[4])*t+c[5]) / ((((d[0]*t+d[1])*t+d[2])*t+d[3])*t+1)
    # one Halley refinement against the exact erf-based CDF
    import math as _m
    e = norm_cdf(x) - q
    u = e * _m.sqrt(2 * _m.pi) * _m.exp(x * x / 2.0)
    return x - u / (1 + x * u / 2.0)


def m_run_probability(p: float, n: int, m: int) -> float:
    """P(at least one run of m consecutive rejections in n independent
    Bernoulli(p) trials) — the reference's Markov-chain formulation
    (interval_detector.py:1066-1116 with the independence weights
    :968-969): state = current run length, absorbing at m."""
    import numpy as np

    if m <= 0 or n <= 0 or m > n:
        raise ValueError(f"need 0 < m <= n, found n={n} m={m}")
    w = np.power(p, np.arange(m + 1)) * np.array([(1 - p)] * m + [1.0])
    A = np.diag([1.0] * m, k=1)
    A[:, 0] = w
    A[-2, -1] = 0.0
    A[-1, -1] = 1.0
    r = np.array([0.0] * m + [1.0])
    return float((r @ np.linalg.matrix_power(A, n - m + 1))[0])


def duration_critical_value(
    alpha: float,
    n: int,
    duration: int,
    r_tol: float = 0.01,
    max_iter: int = 1000,
) -> float:
    """The z threshold whose per-point rejection probability p yields a
    global P(any duration-run of false rejections in n points) = alpha —
    the reference's _get_lowest_p binary search (:837-905) with the same
    p**m*n / binomial bracketing bounds, returned as
    z = norm_ppf(1 - p_corrected) for a one-sided-upper test."""
    m = duration
    if m > n:
        raise ValueError(f"duration must be <= n, found n={n} duration={m}")
    if n == m:
        return norm_ppf(1.0 - alpha ** (1.0 / m))
    p_low = (alpha / n) ** (1.0 / m)
    p_high = (1.0 - (1.0 - alpha) ** (1.0 / (n // m))) ** (1.0 / m)
    for _ in range(max_iter):
        p_c = (p_low + p_high) / 2.0
        p_g = m_run_probability(p_c, n=n, m=m)
        if alpha * (1 - r_tol) <= p_g <= alpha * (1 + r_tol):
            return norm_ppf(1.0 - p_c)
        if p_g < alpha:
            p_low = p_c
        else:
            p_high = p_c
    raise RuntimeError(
        f"critical value search did not converge (alpha={alpha}, n={n}, m={m})"
    )
