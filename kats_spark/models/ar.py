"""AR(p) autoregressive forecaster — closed-form distributed OLS, p <= 2.

The conditional-least-squares AR fit (the core of
kats/models/arima.py:43-334 with d=0, q=0) reduces to OLS of y_t on
(1, y_{t-1}, ..., y_{t-p}).  For p<=2 the normal equations are a 3x3
solve, done with Cramer determinants over per-series moment sums — the
same zero-UDF pattern as operators.trend.  Full ARIMA (d,q != 0) requires
iterative innovations estimation and lands as a numpy kernel later.

Forecast recursion y_{n+h} = c + phi1·y_{n+h-1} + phi2·y_{n+h-2} is
unrolled driver-side into h closed-form expressions (h is a small
constant), so the whole forecast stays an expression plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT

Z95 = 1.959963984540054


def ar2_fit(df: DataFrame, s: TSSchema = DEFAULT) -> DataFrame:
    """Per-series AR(2) OLS: (series_id, c, phi1, phi2, mse, n, y_last,
    y_prev, __tmax)."""
    l1 = F.lag(s.value, 1).over(s.w())
    l2 = F.lag(s.value, 2).over(s.w())
    d = (
        df.withColumn("__x1", l1)
        .withColumn("__x2", l2)
        .filter(F.col("__x2").isNotNull())
    )
    y, x1, x2 = F.col(s.value), F.col("__x1"), F.col("__x2")
    m = d.groupBy(s.series_id).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(y).alias("sy"),
        F.sum(y * x1).alias("sy1"),
        F.sum(y * x2).alias("sy2"),
        F.sum(y * y).alias("syy"),
        F.max(s.time).alias("__tmax"),
        F.max_by(s.value, s.time).alias("y_last"),
        F.max_by("__x1", s.time).alias("y_prev"),
    )

    def det3(a1, a2, a3, b1, b2, b3, c1, c2, c3):
        return a1 * (b2 * c3 - b3 * c2) - a2 * (b1 * c3 - b3 * c1) + a3 * (b1 * c2 - b2 * c1)

    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, sy1, sy2, syy = F.col("sy"), F.col("sy1"), F.col("sy2"), F.col("syy")
    D = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    Dc = det3(sy, s1, s2, sy1, s11, s12, sy2, s12, s22)
    D1 = det3(n, sy, s2, s1, sy1, s12, s2, sy2, s22)
    D2 = det3(n, s1, sy, s1, s11, sy1, s2, s12, sy2)
    c, p1, p2 = Dc / D, D1 / D, D2 / D
    sse = syy - c * sy - p1 * sy1 - p2 * sy2
    return m.select(
        s.series_id,
        c.alias("c"),
        p1.alias("phi1"),
        p2.alias("phi2"),
        (sse / (n - 3)).alias("mse"),
        "n",
        "y_last",
        "y_prev",
        "__tmax",
    )


def ar2_forecast(
    df: DataFrame, steps: int, freq_seconds: int, s: TSSchema = DEFAULT
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper); interval uses the
    AR psi-weight accumulation se_h = sqrt(mse * sum(psi_j^2)) computed by
    the same driver-side unroll."""
    fit = ar2_fit(df, s)
    c, p1, p2 = F.col("c"), F.col("phi1"), F.col("phi2")

    # build the recursion as a withColumn chain: each step references the
    # previous steps by *alias*, so the optimizer keeps separate projections
    # (CollapseProject does not inline duplicated non-cheap expressions) and
    # the expression tree stays linear in ``steps`` instead of exploding
    # Fibonacci-style (which overflows janino codegen)
    cur = fit.withColumn("__p0", F.col("y_last")).withColumn("__pm1", F.col("y_prev"))
    cur = cur.withColumn("__psi0", F.lit(1.0)).withColumn("__vm1", F.lit(1.0))
    for h in range(1, steps + 1):
        prev1 = F.col(f"__p{h - 1}") if h > 1 else F.col("__p0")
        prev2 = F.col(f"__p{h - 2}") if h > 2 else (F.col("__p0") if h == 2 else F.col("__pm1"))
        cur = cur.withColumn(f"__p{h}", c + p1 * prev1 + p2 * prev2)
        if h >= 2:
            psi_prev1 = F.col(f"__psi{h - 2}")
            psi_prev2 = F.col(f"__psi{h - 3}") if h >= 3 else F.lit(0.0)
            cur = cur.withColumn(f"__psi{h - 1}", p1 * psi_prev1 + p2 * psi_prev2)
            cur = cur.withColumn(
                f"__vm{h}", F.col(f"__vm{h - 1}") + F.col(f"__psi{h - 1}") * F.col(f"__psi{h - 1}")
            )
    rows = []
    for h in range(1, steps + 1):
        pred = F.col(f"__p{h}")
        se = F.sqrt(F.col("mse") * F.col(f"__vm{h}" if h >= 2 else "__vm1"))
        t = F.timestamp_seconds(F.unix_timestamp("__tmax") + F.lit(h * freq_seconds))
        rows.append(
            F.struct(
                t.alias(s.time),
                pred.alias("fcst"),
                (pred - Z95 * se).alias("fcst_lower"),
                (pred + Z95 * se).alias("fcst_upper"),
            )
        )
    exploded = cur.select(s.series_id, F.explode(F.array(*rows)).alias("__r"))
    return exploded.select(
        s.series_id,
        F.col(f"__r.{s.time}").alias(s.time),
        "__r.fcst",
        "__r.fcst_lower",
        "__r.fcst_upper",
    )
