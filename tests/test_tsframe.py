"""Unit tests for the canonical frame invariants (kats/consts.py parity)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from kats_spark import tsframe


def _mk(spark, rows):
    return spark.createDataFrame(rows, "series_id string, time timestamp, value double")


def _t(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def test_dedup_keep_first(spark):
    df = _mk(spark, [("a", _t(0), 1.0), ("a", _t(0), 2.0), ("a", _t(1), 3.0)])
    out = tsframe.dedup_timestamps(df).orderBy("time").collect()
    assert [r.value for r in out] == [1.0, 3.0]


def test_exclude_closed_interval(spark):
    df = _mk(spark, [("a", _t(i), float(i)) for i in range(5)])
    out = tsframe.exclude(df, _t(1), _t(3)).orderBy("time").collect()
    assert [r.value for r in out] == [0.0, 4.0]


def test_binary_op_full_outer_nulls(spark):
    d1 = _mk(spark, [("a", _t(0), 1.0), ("a", _t(1), 2.0)])
    d2 = _mk(spark, [("a", _t(1), 10.0), ("a", _t(2), 20.0)])
    out = {r.time: r.value for r in tsframe.binary_op(d1, d2, "add").collect()}
    assert out[_t(1)] == 12.0
    assert out[_t(0)] is None and out[_t(2)] is None


def test_infer_freq_mode_of_diffs(spark):
    rows = [("a", _t(0), 1.0), ("a", _t(1), 1.0), ("a", _t(2), 1.0), ("a", _t(5), 1.0)]
    out = tsframe.infer_freq_seconds(_mk(spark, rows)).collect()
    assert out[0].freq_seconds == 3600.0


def test_validate_equal_spacing_regular_share(spark):
    rows = [("a", _t(i), 1.0) for i in range(10)] + [("a", _t(20), 1.0)]
    r = tsframe.validate_equal_spacing(_mk(spark, rows)).collect()[0]
    assert r.is_regular and abs(r.regular_share - 0.9) < 1e-9


def test_from_wide_melt(spark):
    pdf = spark.createDataFrame(
        [(_t(0), 1.0, 10.0), (_t(1), 2.0, 20.0)], "t timestamp, v1 double, v2 double"
    )
    out = tsframe.from_wide(pdf, "t", ["v1", "v2"])
    assert out.count() == 4
    assert set(r.series_id for r in out.collect()) == {"v1", "v2"}


def test_scalar_op(spark):
    df = _mk(spark, [("a", _t(0), 2.0)])
    assert tsframe.scalar_op(df, "mul", 3.0).collect()[0].value == 6.0


def test_segmented_rolling_equals_plain_window(spark):
    """segmented_score (skew-proof tiling) must be row-identical to the
    single-window rolling z-score."""
    import pandas as pd
    import numpy as np
    from pyspark.sql import functions as F

    from kats_spark.functions import rolling

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "series_id": ["a"] * 500 + ["b"] * 137,
            "time": list(pd.date_range("2024-01-01", periods=500, freq="h"))
            + list(pd.date_range("2024-01-01", periods=137, freq="h")),
            "value": rng.randn(637),
        }
    )
    df = spark.createDataFrame(pdf)
    plain = df.withColumn("score", rolling.z_score(24)).select(
        "series_id", "time", "score"
    )
    seg = rolling.segmented_score(df, n=24, segment_rows=100).select(
        "series_id", "time", "score"
    )
    p = plain.orderBy("series_id", "time").toPandas()
    g = seg.orderBy("series_id", "time").toPandas()
    assert len(p) == len(g) == 637
    pd.testing.assert_frame_equal(p, g, check_exact=False, rtol=1e-12, atol=1e-12)


def test_asof_join_semantics(spark):
    """Inclusive rt <= lt, nulls before any right row, tolerance nulls
    stale matches."""
    import pandas as pd
    from kats_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "series_id": ["a"] * 3,
                "time": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-05"]),
                "value": [1.0, 2.0, 3.0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "series_id": ["a"] * 2,
                "time": pd.to_datetime(["2024-01-02", "2024-01-03"]),
                "value": [10.0, 20.0],
            }
        )
    )
    out = {
        r.time.strftime("%m-%d"): r.asof_value
        for r in asof_join(left, right).collect()
    }
    assert out == {"01-01": None, "01-02": 10.0, "01-05": 20.0}
    tol = {
        r.time.strftime("%m-%d"): r.asof_value
        for r in asof_join(left, right, tolerance_seconds=86400.0).collect()
    }
    assert tol == {"01-01": None, "01-02": 10.0, "01-05": None}


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check: asof_join == pandas merge_asof (backward,
    allow_exact_matches) over randomized irregular frames."""
    import numpy as np
    import pandas as pd
    from hypothesis import HealthCheck, given, settings, strategies as st

    from kats_spark.operators.asof import asof_join

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lt=st.lists(st.integers(0, 500), min_size=1, max_size=25, unique=True),
        rt=st.lists(st.integers(0, 500), min_size=0, max_size=25, unique=True),
        seed=st.integers(0, 10_000),
    )
    def check(lt, rt, seed):
        rng = np.random.RandomState(seed)
        base = pd.Timestamp("2024-01-01")
        lpdf = pd.DataFrame(
            {
                "series_id": "k",
                "time": [base + pd.Timedelta(hours=h) for h in sorted(lt)],
                "value": rng.randn(len(lt)),
            }
        )
        rpdf = pd.DataFrame(
            {
                "series_id": pd.Series(["k"] * len(rt), dtype=object),
                "time": pd.to_datetime(
                    [base + pd.Timedelta(hours=h) for h in sorted(rt)]
                ),
                "value": rng.randn(len(rt)),
            }
        )
        got = (
            asof_join(spark.createDataFrame(lpdf),
                      spark.createDataFrame(rpdf) if len(rpdf) else
                      spark.createDataFrame(rpdf, "series_id string, time timestamp, value double"))
            .orderBy("time")
            .toPandas()
        )
        exp = pd.merge_asof(
            lpdf, rpdf.rename(columns={"value": "asof_value"})[["time", "asof_value"]],
            on="time", direction="backward",
        )
        np.testing.assert_allclose(
            got["asof_value"].to_numpy(dtype=float),
            exp["asof_value"].to_numpy(dtype=float),
            rtol=0, atol=0,
        )

    check()


def test_resample_linear_matches_pandas(spark):
    """Property check: resample(linear) == pandas reindex + time-indexed
    interpolation (edges -> nearest) over randomized gappy hourly series."""
    import numpy as np
    import pandas as pd
    from hypothesis import HealthCheck, given, settings, strategies as st

    from kats_spark.operators.resample import resample

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        hours=st.lists(st.integers(0, 120), min_size=2, max_size=30, unique=True),
        seed=st.integers(0, 10_000),
    )
    def check(hours, seed):
        rng = np.random.RandomState(seed)
        base = pd.Timestamp("2024-01-01")
        times = [base + pd.Timedelta(hours=h) for h in sorted(hours)]
        vals = rng.randn(len(times))
        pdf = pd.DataFrame({"series_id": "k", "time": times, "value": vals})
        got = (
            resample(spark.createDataFrame(pdf), 3600, "linear")
            .orderBy("time")
            .toPandas()
        )
        spine = pd.date_range(times[0], times[-1], freq="h")
        exp = (
            pd.Series(vals, index=pd.DatetimeIndex(times))
            .reindex(spine)
            .interpolate(method="index", limit_direction="both")
        )
        assert len(got) == len(spine)
        np.testing.assert_allclose(
            got["value"].to_numpy(), exp.to_numpy(), rtol=1e-9, atol=1e-12
        )

    check()
