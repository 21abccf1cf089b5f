"""Calendar / time feature expressions.

Parity with kats/utils/feature_engineering.py:
- ``date_features`` (:85-141): year, month, day, dayofweek, dayofyear,
  quarter, season, weekofyear, weekofmonth, is_weekend, is_leap_year,
  is_leap_day, is_month_end, is_quarter_end.
- ``time_features`` (:143-188): hour, minute, second, milliseconds,
  quarterhour, hourofweek, daytime bucket.
- ``circle_encode`` (:224): sin/cos encoding of cyclic features.
- Fourier terms (kats/tsfeatures/tsfeatures.py:2187 ``TsFourierFeatures``,
  kats/models/ml_ar.py:152-155): sin/cos of arbitrary period/order.

All pure Column expressions — zero UDFs, fully codegen'd, pushdown-safe.

Convention notes (chosen to be reproducible in ANSI SQL for the oracle):
- ``dayofweek``: ISO, Monday=0 .. Sunday=6 (matches pandas ``.dayofweek``
  used by the reference).
- ``weekofyear``: ISO week number.
- ``season``: meteorological quarter from month (DJF=winter=0, MAM=1,
  JJA=2, SON=3) — reference uses month%12//3 (feature_engineering.py:118).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def dayofweek_iso(t: Column) -> Column:
    """Monday=0 .. Sunday=6 (pandas convention)."""
    return ((F.dayofweek(t) + 5) % 7).cast("int")


def is_weekend(t: Column) -> Column:
    return dayofweek_iso(t).isin(5, 6).cast("int")


def season(t: Column) -> Column:
    """month%12 // 3: DJF=0, MAM=1, JJA=2, SON=3 (feature_engineering.py:118)."""
    return ((F.month(t) % 12) / 3).cast("int")


def weekofmonth(t: Column) -> Column:
    """Week index within the month, 1-based from day-of-month."""
    return (((F.dayofmonth(t) - 1) / 7) + 1).cast("int")


def is_leap_year(t: Column) -> Column:
    y = F.year(t)
    return (((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)).cast("int")


def is_leap_day(t: Column) -> Column:
    return ((F.month(t) == 2) & (F.dayofmonth(t) == 29)).cast("int")


def is_month_end(t: Column) -> Column:
    return (F.dayofmonth(t) == F.dayofmonth(F.last_day(t))).cast("int")


def is_quarter_end(t: Column) -> Column:
    return (is_month_end(t).cast("boolean") & (F.month(t) % 3 == 0)).cast("int")


def date_features(time_col: str = "time") -> dict[str, Column]:
    """The full date-feature block (feature_engineering.py:85-141)."""
    t = F.col(time_col)
    return {
        "year": F.year(t),
        "month": F.month(t),
        "day": F.dayofmonth(t),
        "dayofweek": dayofweek_iso(t),
        "dayofyear": F.dayofyear(t),
        "quarter": F.quarter(t),
        "season": season(t),
        "weekofyear": F.weekofyear(t),
        "weekofmonth": weekofmonth(t),
        "is_weekend": is_weekend(t),
        "is_leap_year": is_leap_year(t),
        "is_leap_day": is_leap_day(t),
        "is_month_end": is_month_end(t),
        "is_quarter_end": is_quarter_end(t),
    }


def time_features(time_col: str = "time") -> dict[str, Column]:
    """Time-of-day features (feature_engineering.py:143-188)."""
    t = F.col(time_col)
    return {
        "hour": F.hour(t),
        "minute": F.minute(t),
        "second": F.second(t),
        "quarterhour": (F.minute(t) / 15 + 1).cast("int"),
        "hourofweek": (dayofweek_iso(t) * 24 + F.hour(t)).cast("int"),
    }


def circle_encode(col: Column, period: float, prefix: str) -> dict[str, Column]:
    """sin/cos encoding of a cyclic feature (feature_engineering.py:224)."""
    ang = col.cast("double") * (2.0 * math.pi / period)
    return {f"{prefix}_sin": F.sin(ang), f"{prefix}_cos": F.cos(ang)}


def fourier_features(
    time_col: str = "time",
    period_seconds: float = 7 * 86400.0,
    order: int = 3,
    prefix: str = "fourier",
) -> dict[str, Column]:
    """Fourier terms of arbitrary period/order over epoch seconds
    (tsfeatures.py:2187, ml_ar.py:152-155)."""
    epoch = F.unix_timestamp(F.col(time_col)).cast("double")
    out: dict[str, Column] = {}
    for k in range(1, order + 1):
        ang = epoch * (2.0 * math.pi * k / period_seconds)
        out[f"{prefix}_sin_{k}"] = F.sin(ang)
        out[f"{prefix}_cos_{k}"] = F.cos(ang)
    return out


def with_features(df, features: dict[str, Column]):
    """Attach a feature dict as columns."""
    return df.withColumns(features)
