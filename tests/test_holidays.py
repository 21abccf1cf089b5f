"""Country holiday calendars — computus correctness, pinned civil dates,
Python-vs-Spark-expression parity, ProphetLite integration."""

import datetime

import numpy as np
import pytest

from kats_spark.functions.holidays import (
    country_holidays,
    easter_sunday,
    holiday_calendar,
)


def test_easter_computus_known_dates():
    """Anonymous Gregorian computus against published Easter dates,
    including the extremes of the cycle (1818 Mar 22 earliest, 1943
    Apr 25 latest)."""
    known = {
        1818: (3, 22), 1886: (4, 25), 1943: (4, 25),
        2000: (4, 23), 2008: (3, 23), 2016: (3, 27), 2020: (4, 12),
        2024: (3, 31), 2025: (4, 20), 2026: (4, 5), 2030: (4, 21),
        2038: (4, 25),
    }
    for y, (m, d) in known.items():
        assert easter_sunday(y) == datetime.date(y, m, d), y


def test_country_rules_pinned_dates():
    us = country_holidays("US", [2024, 2025])
    assert datetime.date(2024, 11, 28) in us["Thanksgiving"]
    assert datetime.date(2025, 11, 27) in us["Thanksgiving"]
    assert datetime.date(2024, 5, 27) in us["Memorial Day"]
    assert datetime.date(2025, 1, 20) in us["Martin Luther King Jr. Day"]
    assert datetime.date(2025, 2, 17) in us["Washington's Birthday"]
    uk = country_holidays("UK", [2024])
    assert datetime.date(2024, 3, 29) in uk["Good Friday"]
    assert datetime.date(2024, 5, 6) in uk["Early May Bank Holiday"]
    assert datetime.date(2024, 5, 27) in uk["Spring Bank Holiday"]
    assert datetime.date(2024, 8, 26) in uk["Summer Bank Holiday"]
    de = country_holidays("DE", [2024])
    assert datetime.date(2024, 5, 9) in de["Christi Himmelfahrt"]
    assert datetime.date(2024, 5, 20) in de["Pfingstmontag"]
    ca = country_holidays("CA", [2024, 2025, 2027])
    assert datetime.date(2024, 5, 20) in ca["Victoria Day"]
    assert datetime.date(2025, 5, 19) in ca["Victoria Day"]
    # 2027: May 24 IS a Monday -> Victoria Day on the 24th itself
    assert datetime.date(2027, 5, 24) in ca["Victoria Day"]
    assert datetime.date(2024, 10, 14) in ca["Thanksgiving (CA)"]
    with pytest.raises(ValueError, match="unknown country"):
        country_holidays("XX", [2024])


def test_spark_expressions_match_python_rules(spark):
    """The expression calendar (computus + make_date arithmetic) must
    agree with the pure-Python rules for every country over 41 years —
    the parity that makes holiday_calendar oracle-checkable."""
    for country in ("US", "UK", "DE", "FR", "CA"):
        got = {
            (r.year, r.holiday): r.date
            for r in holiday_calendar(spark, 2000, 2040, country).collect()
        }
        exp = {
            (yy, nm): dates[0]
            for yy in range(2000, 2041)
            for nm, dates in country_holidays(country, [yy]).items()
        }
        assert got == exp, (country, sorted(set(exp) ^ set(got))[:3])


def test_prophet_lite_with_country_holidays():
    """End-to-end: a daily series with genuine spikes on US Thanksgiving
    + Independence Day; ProphetLite(holidays=country_holidays('US',...))
    must absorb them — future forecasts on holiday dates carry the
    effect, neighbors do not."""
    import pandas as pd

    from kats_spark.models.prophet_lite import ProphetLite

    times = pd.date_range("2022-01-01", periods=3 * 365, freq="D").to_numpy()
    years = range(2022, 2027)
    hol = country_holidays("US", years)
    spikes = {np.datetime64(d, "D") for d in hol["Thanksgiving"]} | {
        np.datetime64(d, "D") for d in hol["Independence Day"]
    }
    rng = np.random.default_rng(5)
    days = times.astype("datetime64[D]")
    y = 10.0 + 0.01 * np.arange(len(times)) + rng.normal(0, 0.3, len(times))
    y = y + np.where(np.isin(days, np.array(sorted(spikes))), 6.0, 0.0)
    m = ProphetLite(
        yearly_seasonality=False, weekly_seasonality=False,
        daily_seasonality=False,
        holidays={k: hol[k] for k in ("Thanksgiving", "Independence Day")},
    )
    m.fit(times, y)
    # forecast across 2025's Independence Day
    fut = np.arange(
        np.datetime64("2025-07-01"), np.datetime64("2025-07-08")
    ).astype("datetime64[ns]")
    fc = m.predict(fut).fcst.to_numpy()
    base = np.delete(fc, 3)  # July 4 is index 3
    assert fc[3] - base.mean() > 4.0, fc
