"""Nowcasting technical-analysis features.

Parity with kats/models/nowcasting/feature_extraction.py: ROC(:25),
MOM(:48), MA(:69), LAG(:95), MACD family(:117), BBANDS(:308), TRIX(:341),
EMA(:375), TSI(:402), RSI(:432).

The lag/rolling family is pure window expressions.  The EWMA family (EMA,
MACD, TRIX, TSI, RSI) is an order-dependent recursion — not expressible as a
SQL frame aggregate — so it runs as one ``applyInPandas`` per series using
pandas ``.ewm`` (exactly the reference's kernel), Arrow-batched.  At scale
the EWMA pass is a single groupBy(series_id) shuffle shared by all
recursive features.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kats_spark.tsframe import TSSchema, DEFAULT
from kats_spark.functions.rolling import trailing_window


def roc(n: int, s: TSSchema = DEFAULT) -> Column:
    """Rate of change: x / lag(x, n) - 1 (feature_extraction.py:25 uses
    diff(n-1)/shift(n-1); we parameterize on the effective lag n)."""
    prev = F.lag(s.value, n).over(s.w())
    return (F.col(s.value) - prev) / prev


def mom(n: int, s: TSSchema = DEFAULT) -> Column:
    """Momentum: x - lag(x, n) (feature_extraction.py:48)."""
    return F.col(s.value) - F.lag(s.value, n).over(s.w())


def ma(n: int, s: TSSchema = DEFAULT) -> Column:
    """Simple moving average incl. current row (feature_extraction.py:69)."""
    return F.avg(s.value).over(trailing_window(s, n, include_current=True))


def lag_feature(n: int, s: TSSchema = DEFAULT) -> Column:
    """LAG (feature_extraction.py:95)."""
    return F.lag(s.value, n).over(s.w())


def bbands(n: int, k: float = 2.0, s: TSSchema = DEFAULT) -> tuple[Column, Column, Column]:
    """Bollinger bands (feature_extraction.py:308): (mid, upper, lower)."""
    w = trailing_window(s, n, include_current=True)
    mid = F.avg(s.value).over(w)
    sd = F.stddev_samp(s.value).over(w)
    return mid, mid + k * sd, mid - k * sd


# ---- EWMA family: recursive -> per-series pandas kernel ----------------

def _ewma_kernel(pdf: pd.DataFrame, specs: list[tuple[str, dict]], s: TSSchema) -> pd.DataFrame:
    pdf = pdf.sort_values(s.time)
    v = pdf[s.value]
    for name, spec in specs:
        kind = spec["kind"]
        if kind == "ema":
            pdf[name] = v.ewm(span=spec["n"], min_periods=spec["n"] - 1).mean()
        elif kind == "macd":
            fast = v.ewm(span=spec["n_fast"], min_periods=spec["n_slow"] - 1).mean()
            slow = v.ewm(span=spec["n_slow"], min_periods=spec["n_slow"] - 1).mean()
            macd = fast - slow
            sign = macd.ewm(span=9, min_periods=8).mean()
            pdf[name] = macd
            pdf[name + "sign"] = sign
            pdf[name + "diff"] = macd - sign
        elif kind == "trix":
            e1 = v.ewm(span=spec["n"], min_periods=spec["n"] - 1).mean()
            e2 = e1.ewm(span=spec["n"], min_periods=spec["n"] - 1).mean()
            e3 = e2.ewm(span=spec["n"], min_periods=spec["n"] - 1).mean()
            pdf[name] = e3.pct_change()
        elif kind == "tsi":
            m = v.diff(1)
            m1 = m.ewm(span=spec["r"], min_periods=spec["r"] - 1).mean()
            m2 = m1.ewm(span=spec["s"], min_periods=spec["s"] - 1).mean()
            a1 = m.abs().ewm(span=spec["r"], min_periods=spec["r"] - 1).mean()
            a2 = a1.ewm(span=spec["s"], min_periods=spec["s"] - 1).mean()
            pdf[name] = m2 / a2
        elif kind == "rsi":
            d = v.diff(1)
            up = d.clip(lower=0.0)
            dn = (-d).clip(lower=0.0)
            ru = up.ewm(alpha=1.0 / spec["n"], min_periods=spec["n"]).mean()
            rd = dn.ewm(alpha=1.0 / spec["n"], min_periods=spec["n"]).mean()
            pdf[name] = 100.0 - 100.0 / (1.0 + ru / rd)
        else:
            raise ValueError(kind)
    return pdf


def with_ewma_features(df: DataFrame, specs: list[tuple[str, dict]], s: TSSchema = DEFAULT) -> DataFrame:
    """Attach EWMA-family features (feature_extraction.py:117-460) via one
    per-series applyInPandas pass.  ``specs`` = [(out_col, {kind, ...})].
    """
    out_cols = []
    for name, spec in specs:
        out_cols.append(name)
        if spec["kind"] == "macd":
            out_cols += [name + "sign", name + "diff"]
    schema = df.schema
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    out_schema = fields + ", " + ", ".join(f"`{c}` double" for c in out_cols)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _ewma_kernel(pdf, specs, s)

    return df.groupBy(s.series_id).applyInPandas(fn, schema=out_schema)
