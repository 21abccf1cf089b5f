"""Distribution-distance detector: JS divergence vs the series' own past.

Parity with kats/detectors/distribution_distance_model.py:147-368
(``DistributionDistanceModel``): for each point, build the empirical
percentile vector of the trailing window ending at t and of the window one
``window`` earlier, and score their Jensen-Shannon divergence; a
distribution shift (not just a mean shift) raises the score.

Spark plan: the two windows are ``collect_list`` frame aggregates over
``rowsBetween`` specs (JVM-side gather — the only UDF work is the
percentile + JS math on two small arrays per row, vectorized via an
Arrow-batched pandas UDF).  No self-join: one sort, two frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kats_spark.tsframe import TSSchema, DEFAULT

_NBINS = 20


def _js_div(c: np.ndarray, p: np.ndarray) -> float:
    """JS divergence between the two windows' empirical distributions,
    histogrammed on a COMMON bin grid spanning both samples (so location
    AND scale shifts move mass between bins)."""
    lo = min(c.min(), p.min())
    hi = max(c.max(), p.max())
    if not np.isfinite(lo) or not np.isfinite(hi) or hi <= lo:
        return 0.0
    edges = np.linspace(lo, hi, _NBINS + 1)
    pc, _ = np.histogram(c, bins=edges)
    pp, _ = np.histogram(p, bins=edges)
    pc = pc / pc.sum() + 1e-12
    pp = pp / pp.sum() + 1e-12
    m = 0.5 * (pc + pp)
    kl = lambda a, b: float(np.sum(a * np.log(a / b)))
    return 0.5 * kl(pc, m) + 0.5 * kl(pp, m)


def _make_js_udf():
    # built lazily: pandas_udf parses its DDL type against the live session
    @pandas_udf("double")
    def _js_udf(cur: pd.Series, prev: pd.Series) -> pd.Series:
        out = np.full(len(cur), np.nan)
        for i, (c, p) in enumerate(zip(cur, prev)):
            if c is None or p is None:
                continue
            c = np.asarray(c, dtype=float)
            p = np.asarray(p, dtype=float)
            if len(c) < 5 or len(p) < 5:
                continue
            out[i] = _js_div(c, p)
        return pd.Series(out)

    return _js_udf


def distribution_distance_scores(
    df: DataFrame,
    window: int = 48,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, value, js_div) — NULL until both windows fill."""
    js_udf = _make_js_udf()
    w_cur = s.w().rowsBetween(-(window - 1), 0)
    w_prev = s.w().rowsBetween(-(2 * window - 1), -window)
    cnt_prev = F.count(s.value).over(w_prev)
    return (
        df.withColumn("__cur", F.collect_list(s.value).over(w_cur))
        .withColumn("__prev", F.collect_list(s.value).over(w_prev))
        .withColumn("__np", cnt_prev)
        .withColumn(
            "js_div",
            F.when(
                F.col("__np") == window,
                F.round(js_udf(F.col("__cur"), F.col("__prev")), 6),
            ),
        )
        .select(s.series_id, s.time, s.value, "js_div")
    )


def psi_drift(
    df,
    split_time,
    value_col: str = "value",
    by: str = "series_id",
    time_col: str = "time",
    n_bins: int = 10,
    eps: float = 1.0e-4,
):
    """Population Stability Index between the before/after halves of a
    time split — the industry-standard distribution-drift monitor
    (PSI = sum over bins of (p_b - q_b) * ln(p_b / q_b); rule of thumb
    < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 major shift).  The
    companion to the JS-divergence detector above: PSI compares two
    EXPLICIT windows (deploy-time vs reference snapshot) instead of a
    series against its own trailing past.

    Bins are FIXED-WIDTH over the reference (before) window's min/max
    per key — deterministic, oracle-exact (quantile bins would hinge on
    interpolation conventions), with the out-of-range mass clamped into
    the edge bins (the standard treatment for drift beyond the
    reference range).  Both histograms are one grouped count each; the
    whole operator is two narrow aggregates + one broadcast-sized join
    per key — no shuffle of the raw rows beyond the per-key count.

    Output: one row per key — (key, n_before, n_after, psi)."""
    from pyspark.sql import functions as F

    before = df.filter(F.col(time_col) < split_time)
    after = df.filter(F.col(time_col) >= split_time)
    ref = before.groupBy(by).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )

    def binned(side, name):
        b = side.join(F.broadcast(ref), by)
        ix = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col(value_col) - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo")) / n_bins + F.lit(1e-300))
                ).cast("int"),
            ),
        )
        return b.groupBy(by, ix.alias("__bin")).agg(
            F.count("*").alias(name)
        )

    pb = binned(before, "__nb")
    pa = binned(after, "__na")
    tot = (
        pb.groupBy(by).agg(F.sum("__nb").alias("__tb"))
        .join(pa.groupBy(by).agg(F.sum("__na").alias("__ta")), by)
    )
    joined = (
        pb.join(pa, [by, "__bin"], "full_outer")
        .fillna(0, subset=["__nb", "__na"])
        .join(tot, by)
    )
    p = F.col("__nb") / F.col("__tb") + F.lit(eps)
    q = F.col("__na") / F.col("__ta") + F.lit(eps)
    term = (p - q) * F.log(p / q)
    return joined.groupBy(by).agg(
        F.max("__tb").cast("bigint").alias("n_before"),
        F.max("__ta").cast("bigint").alias("n_after"),
        F.round(F.sum(term) + F.lit(1e-9), 6).alias("psi"),
    )


def ks_drift(
    df,
    split_time,
    value_col: str = "value",
    by: str = "series_id",
    time_col: str = "time",
    value_shards: int | None = None,
):
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    before/after halves of a time split, per key — the nonparametric
    companion to :func:`psi_drift`: ``D = sup_x |F_before(x) -
    F_after(x)|`` computed EXACTLY (no binning, ties handled by
    evaluating both right-continuous ECDFs at every distinct pooled
    value).  Also emits the standard finite-sample scaling
    ``ks_lambda = (sqrt(ne) + 0.12 + 0.11/sqrt(ne)) * D`` with
    ``ne = n1 n2 / (n1 + n2)`` (the argument of the Kolmogorov
    distribution in the classic asymptotic p-value approximation) so a
    consumer can threshold on the scale-free statistic.

    Plan shape: one grouped count per side collapses the raw rows to
    per-(key, distinct value) counts, a full-outer join aligns them,
    and ONE cumulative window per key (ordered by value over the
    distinct values only — not the raw rows) yields both ECDFs; the max
    aggregates per key.  The raw data is never sorted globally and
    never shuffled beyond the two grouped counts.  Exact oracle: the
    identical counts + window replay in SQL.

    ``value_shards`` is the 100 TB knob for CONTINUOUS metrics, where
    distinct values ~ rows and the per-key window becomes one task
    sorting the key's whole history: fixed-width VALUE-RANGE shards
    over the key's [min, max] are order-preserving (every value in
    shard s-1 precedes every value in shard s), so the exact per-key
    cumulative decomposes as ``exclusive_prefix(per-shard totals) +
    within-(key, shard) cumsum`` — the salted_cumsum decomposition with
    range shards standing in for the hash prefix.  Bit-identical to the
    single-window plan (asserted in tests); default None keeps the
    naive window (cheaper at monitor scale).

    Output: one row per key — (key, n_before, n_after, ks_stat,
    ks_lambda)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    before = df.filter(F.col(time_col) < split_time)
    after = df.filter(F.col(time_col) >= split_time)
    c1 = before.groupBy(by, value_col).agg(F.count("*").alias("__c1"))
    c2 = after.groupBy(by, value_col).agg(F.count("*").alias("__c2"))
    aligned = c1.join(c2, [by, value_col], "full_outer").fillna(
        0, subset=["__c1", "__c2"]
    )
    if value_shards is not None and value_shards > 1:
        s = value_shards
        rng = aligned.groupBy(by).agg(
            F.min(value_col).alias("__lo"),
            F.max(value_col).alias("__hi"),
            F.sum("__c1").alias("__n1"),
            F.sum("__c2").alias("__n2"),
        )
        a = aligned.join(F.broadcast(rng), by).withColumn(
            "__s",
            F.least(
                F.lit(s - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(value_col) - F.col("__lo"))
                        / ((F.col("__hi") - F.col("__lo")) / s + F.lit(1e-300))
                    ).cast("int"),
                ),
            ),
        )
        st = a.groupBy(by, "__s").agg(
            F.sum("__c1").alias("__t1"), F.sum("__c2").alias("__t2")
        )
        w_off = (
            Window.partitionBy(by)
            .orderBy("__s")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = st.select(
            by,
            "__s",
            F.coalesce(F.sum("__t1").over(w_off), F.lit(0)).alias("__o1"),
            F.coalesce(F.sum("__t2").over(w_off), F.lit(0)).alias("__o2"),
        )
        w_in = (
            Window.partitionBy(by, "__s")
            .orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = a.join(F.broadcast(offs), [by, "__s"]).select(
            F.col(by),
            ((F.col("__o1") + F.sum("__c1").over(w_in)) / F.col("__n1")).alias(
                "__f1"
            ),
            ((F.col("__o2") + F.sum("__c2").over(w_in)) / F.col("__n2")).alias(
                "__f2"
            ),
            "__n1",
            "__n2",
        )
        ne = F.col("__n1") * F.col("__n2") / (F.col("__n1") + F.col("__n2"))
        d = F.max(F.abs(F.col("__f1") - F.col("__f2")))
        return (
            cum.groupBy(by)
            .agg(
                F.max("__n1").cast("bigint").alias("n_before"),
                F.max("__n2").cast("bigint").alias("n_after"),
                d.alias("__d"),
                F.max(F.sqrt(ne)).alias("__sne"),
            )
            .select(
                F.col(by),
                "n_before",
                "n_after",
                F.round(F.col("__d") + F.lit(1e-9), 6).alias("ks_stat"),
                F.round(
                    (F.col("__sne") + 0.12 + 0.11 / F.col("__sne"))
                    * F.col("__d")
                    + F.lit(1e-9),
                    6,
                ).alias("ks_lambda"),
            )
        )
    w = (
        Window.partitionBy(by)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(by)
    cum = aligned.select(
        F.col(by),
        (F.sum("__c1").over(w) / F.sum("__c1").over(tot)).alias("__f1"),
        (F.sum("__c2").over(w) / F.sum("__c2").over(tot)).alias("__f2"),
        F.sum("__c1").over(tot).alias("__n1"),
        F.sum("__c2").over(tot).alias("__n2"),
    )
    ne = F.col("__n1") * F.col("__n2") / (F.col("__n1") + F.col("__n2"))
    d = F.max(F.abs(F.col("__f1") - F.col("__f2")))
    return (
        cum.groupBy(by)
        .agg(
            F.max("__n1").cast("bigint").alias("n_before"),
            F.max("__n2").cast("bigint").alias("n_after"),
            d.alias("__d"),
            F.max(F.sqrt(ne)).alias("__sne"),
        )
        .select(
            F.col(by),
            "n_before",
            "n_after",
            F.round(F.col("__d") + F.lit(1e-9), 6).alias("ks_stat"),
            F.round(
                (F.col("__sne") + 0.12 + 0.11 / F.col("__sne")) * F.col("__d")
                + F.lit(1e-9),
                6,
            ).alias("ks_lambda"),
        )
    )
