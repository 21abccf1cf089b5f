"""Built-in country holiday calendars — the reference's Prophet
``country_holidays`` surface (kats/models/prophet.py:91-93 passes a
country code through to fbprophet's holiday table; the underlying dates
are public civil/religious calendar rules).

Two faces, same rules:

- :func:`country_holidays` — pure-Python dict {holiday: [dates]} for
  driver-side consumers (``ProphetLite(holidays=...)``);
- :func:`holiday_calendar` — the SAME rules as Spark COLUMN EXPRESSIONS
  over a ``spark.range`` of years (Easter via the Anonymous Gregorian
  computus — integer arithmetic only — and nth-weekday rules via
  ``make_date`` + day-of-week offsets), so the full calendar is an
  oracled, codegen'd query at any year range, not a driver loop.

Rules are the ACTUAL dates (no observed-shift substitution), matching
the default fbprophet tables.  Countries: US, UK, DE, FR, CA.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pure-Python rules
# ---------------------------------------------------------------------------


def easter_sunday(year: int) -> datetime.date:
    """Anonymous Gregorian computus (Meeus/Jones/Butcher — public)."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7  # noqa: E741
    m = (a + 11 * h + 22 * l) // 451
    month, day = divmod(h + l - 7 * m + 114, 31)
    return datetime.date(year, month, day + 1)


def _nth_weekday(year: int, month: int, weekday: int, n: int) -> datetime.date:
    """n-th (1-based) `weekday` (Mon=0) of a month; n=-1 = last."""
    if n > 0:
        d = datetime.date(year, month, 1)
        off = (weekday - d.weekday()) % 7
        return d + datetime.timedelta(days=off + 7 * (n - 1))
    nxt = datetime.date(year + (month == 12), month % 12 + 1, 1)
    d = nxt - datetime.timedelta(days=1)
    return d - datetime.timedelta(days=(d.weekday() - weekday) % 7)


def _rules(country: str):
    """(name, fn(year) -> date) list per country."""
    fix = lambda m, d: (lambda y: datetime.date(y, m, d))  # noqa: E731
    nth = lambda m, w, n: (lambda y: _nth_weekday(y, m, w, n))  # noqa: E731
    east = lambda off: (  # noqa: E731
        lambda y: easter_sunday(y) + datetime.timedelta(days=off)
    )
    tables = {
        "US": [
            ("New Year's Day", fix(1, 1)),
            ("Martin Luther King Jr. Day", nth(1, 0, 3)),
            ("Washington's Birthday", nth(2, 0, 3)),
            ("Memorial Day", nth(5, 0, -1)),
            ("Juneteenth National Independence Day", fix(6, 19)),
            ("Independence Day", fix(7, 4)),
            ("Labor Day", nth(9, 0, 1)),
            ("Columbus Day", nth(10, 0, 2)),
            ("Veterans Day", fix(11, 11)),
            ("Thanksgiving", nth(11, 3, 4)),
            ("Christmas Day", fix(12, 25)),
        ],
        "UK": [
            ("New Year's Day", fix(1, 1)),
            ("Good Friday", east(-2)),
            ("Easter Monday", east(1)),
            ("Early May Bank Holiday", nth(5, 0, 1)),
            ("Spring Bank Holiday", nth(5, 0, -1)),
            ("Summer Bank Holiday", nth(8, 0, -1)),
            ("Christmas Day", fix(12, 25)),
            ("Boxing Day", fix(12, 26)),
        ],
        "DE": [
            ("Neujahr", fix(1, 1)),
            ("Karfreitag", east(-2)),
            ("Ostermontag", east(1)),
            ("Tag der Arbeit", fix(5, 1)),
            ("Christi Himmelfahrt", east(39)),
            ("Pfingstmontag", east(50)),
            ("Tag der Deutschen Einheit", fix(10, 3)),
            ("Erster Weihnachtstag", fix(12, 25)),
            ("Zweiter Weihnachtstag", fix(12, 26)),
        ],
        "FR": [
            ("Jour de l'an", fix(1, 1)),
            ("Lundi de Pâques", east(1)),
            ("Fête du Travail", fix(5, 1)),
            ("Victoire 1945", fix(5, 8)),
            ("Ascension", east(39)),
            ("Lundi de Pentecôte", east(50)),
            ("Fête nationale", fix(7, 14)),
            ("Assomption", fix(8, 15)),
            ("Toussaint", fix(11, 1)),
            ("Armistice 1918", fix(11, 11)),
            ("Noël", fix(12, 25)),
        ],
        "CA": [
            ("New Year's Day", fix(1, 1)),
            ("Good Friday", east(-2)),
            # Monday on or before May 24
            ("Victoria Day", lambda y: _nth_weekday(y, 5, 0, 4)
             if _nth_weekday(y, 5, 0, 4).day <= 24
             else _nth_weekday(y, 5, 0, 3)),
            ("Canada Day", fix(7, 1)),
            ("Labour Day", nth(9, 0, 1)),
            ("Thanksgiving (CA)", nth(10, 0, 2)),
            ("Christmas Day", fix(12, 25)),
            ("Boxing Day", fix(12, 26)),
        ],
    }
    try:
        return tables[country.upper()]
    except KeyError:
        raise ValueError(
            f"unknown country {country!r}; have {sorted(tables)}"
        ) from None


def country_holidays(country: str, years) -> dict[str, list[datetime.date]]:
    """{holiday name: [date per year]} — plug straight into
    ``ProphetLite(holidays=...)``."""
    out: dict[str, list[datetime.date]] = {}
    for name, fn in _rules(country):
        out[name] = [fn(int(y)) for y in years]
    return out


# ---------------------------------------------------------------------------
# Spark expression rules (oracle-replayable)
# ---------------------------------------------------------------------------


def _easter_cols(y: Column) -> tuple[Column, Column]:
    """(month, day) of Easter Sunday as integer-arithmetic columns."""
    a = y % 19
    b = F.floor(y / 100)
    c = y % 100
    d = F.floor(b / 4)
    e = b % 4
    f = F.floor((b + 8) / 25)
    g = F.floor((b - f + 1) / 3)
    h = (19 * a + b - d - g + 15) % 30
    i = F.floor(c / 4)
    k = c % 4
    l = (32 + 2 * e + 2 * i - h - k) % 7  # noqa: E741
    m = F.floor((a + 11 * h + 22 * l) / 451)
    month = F.floor((h + l - 7 * m + 114) / 31)
    day = (h + l - 7 * m + 114) % 31 + 1
    return month.cast("int"), day.cast("int")


def _nth_weekday_col(y: Column, month: int, weekday: int, n: int) -> Column:
    """Date column for the n-th (1-based, n=-1 last) Mon=0 `weekday`."""
    if n > 0:
        first = F.make_date(y, F.lit(month), F.lit(1))
        # Spark dayofweek: Sun=1..Sat=7 -> Mon0 = (dayofweek + 5) % 7
        off = (F.lit(weekday) - (F.dayofweek(first) + 5) % 7 + 7) % 7
        return F.date_add(first, (off + 7 * (n - 1)).cast("int"))
    last = F.last_day(F.make_date(y, F.lit(month), F.lit(1)))
    back = ((F.dayofweek(last) + 5) % 7 - F.lit(weekday) + 7) % 7
    return F.date_sub(last, back.cast("int"))


def holiday_calendar(
    spark: SparkSession, start_year: int, end_year: int, country: str = "US"
) -> DataFrame:
    """(year, holiday, date) for every rule of ``country`` over the year
    range — entirely Spark expressions (one ``spark.range`` of years,
    a computus projection, one explode), so the whole calendar is
    codegen'd, scales to any range for free, and replays exactly in an
    ANSI-SQL oracle."""
    years = spark.range(start_year, end_year + 1).select(
        F.col("id").cast("int").alias("year")
    )
    y = F.col("year")
    em, ed = _easter_cols(y)
    base = years.withColumn("easter", F.make_date(y, em, ed))
    entries = []
    probe_years = list(range(2019, 2031))
    for name, fn in _rules(country):
        # classify the rule by probing a 12-year window driver-side
        # (rules are static; this runs NO Spark job).  A 2-year probe is
        # NOT enough: 4th-Thursday and last-Thursday coincide in many
        # years — over 12 years the nth index is constant iff the rule
        # is genuinely nth-weekday.
        ds = [fn(py) for py in probe_years]
        offs = {(d - easter_sunday(py)).days for d, py in zip(ds, probe_years)}
        if len(offs) == 1:  # Easter-anchored
            col = F.date_add(F.col("easter"), offs.pop())
        elif len({(d.month, d.day) for d in ds}) == 1:  # fixed date
            col = F.make_date(y, F.lit(ds[0].month), F.lit(ds[0].day))
        elif name == "Victoria Day":  # Monday on or before May 24
            may24 = F.make_date(y, F.lit(5), F.lit(24))
            back = (F.dayofweek(may24) + 5) % 7
            col = F.date_sub(may24, back.cast("int"))
        else:  # nth-weekday rule: recover (month, weekday, n)
            wd = ds[0].weekday()
            assert len({d.weekday() for d in ds}) == 1, name
            assert len({d.month for d in ds}) == 1, name
            ns = {(d.day - 1) // 7 + 1 for d in ds}
            n = ns.pop() if len(ns) == 1 else -1
            col = _nth_weekday_col(y, ds[0].month, wd, n)
        entries.append(F.struct(F.lit(name).alias("holiday"), col.alias("date")))
    return (
        base.select("year", F.explode(F.array(*entries)).alias("h"))
        .select("year", F.col("h.holiday").alias("holiday"), F.col("h.date").alias("date"))
    )
