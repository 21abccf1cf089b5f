"""The tsfeatures_full oracle fragments vs their numpy kernels
(plans/tsfull_oracle.py, the r13 promotion).

The driver/parity suite exercises the composed oracle on the test data,
where the FFT period selection always lands on the 7-fallback — these
tests pin the branches the real data never reaches: detected
non-fallback periods flowing through the PERIOD-GENERIC loess-STL
chain, harmonic removal, and the short-series NaN gate.  Pure
DuckDB-vs-numpy (no Spark): fast enough to run on every suite pass.
"""

import duckdb
import numpy as np
import pandas as pd

from kats_spark.operators.stl import stl_decompose_np
from kats_spark.operators.tsfeatures import _fft_detected_periods
from kats_spark.plans.tsfull_oracle import seasonalities_sql

_HOURLY = """
  SELECT event_type AS series_id,
         to_timestamp((floor(epoch(ts))::BIGINT // 3600) * 3600) AS time,
         avg(value) AS value
  FROM events GROUP BY 1, 2
"""


def _np_seasonalities(x: np.ndarray) -> dict:
    out = {k: float("nan") for k in
           ("seasonal_period", "trend_mag", "seasonality_mag", "residual_std")}
    try:
        detected = _fft_detected_periods(np.diff(x))
        period = int(min(detected)) if detected else 7
        trend, seasonal, resid = stl_decompose_np(x, period)
    except Exception:
        return out
    out["seasonal_period"] = float(period)
    out["seasonality_mag"] = float(
        np.round(np.quantile(seasonal, 0.95) - np.quantile(seasonal, 0.05))
    )
    series = trend - trend[0]
    t = np.arange(len(series), dtype=float)
    denom = float(np.dot(t, t))
    out["trend_mag"] = float(np.dot(t, series) / denom) if denom > 0 else float("nan")
    out["residual_std"] = float(np.std(resid))
    return out


def _synthetic_events() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    t0 = pd.Timestamp("2024-01-01")
    specs = [
        # strong periodicities at different periods -> the FFT detector
        # fires and the STL chain runs with a NON-default period column
        ("p24", 400, lambda t: 50 + 20 * np.sin(2 * np.pi * t / 24)
            + 0.01 * t + rng.normal(0, 1.0, len(t))),
        ("p12", 300, lambda t: 10 + 8 * np.sin(2 * np.pi * t / 12)
            + 3 * np.sin(2 * np.pi * t / 6) + rng.normal(0, 0.5, len(t))),
        # two incommensurate periods -> harmonic-removal bookkeeping
        ("mix", 500, lambda t: 4 * np.sin(2 * np.pi * t / 30)
            + 6 * np.sin(2 * np.pi * t / 50) + rng.normal(0, 0.3, len(t))),
        # too short for STL at the fallback period -> all-NaN row
        ("short", 12, lambda t: np.sin(t) * 5 + rng.normal(0, 0.1, len(t))),
        # no detectable peak -> the 7 fallback
        ("noise", 250, lambda t: rng.normal(0, 1.0, len(t))),
    ]
    rows = []
    for sid, n, f in specs:
        t = np.arange(n, dtype=float)
        v = f(t)
        for i in range(n):
            rows.append(
                (sid, t0 + pd.Timedelta(hours=i) + pd.Timedelta(minutes=7),
                 float(v[i]))
            )
    return pd.DataFrame(rows, columns=["event_type", "ts", "value"])


def test_seasonalities_oracle_matches_kernel_on_detected_periods():
    pdf = _synthetic_events()
    con = duckdb.connect()
    con.register("events", pdf)
    series = con.execute(
        f"SELECT series_id, list(value ORDER BY time) FROM ({_HOURLY}) "
        "GROUP BY 1 ORDER BY 1"
    ).fetchall()
    got = (
        con.execute(seasonalities_sql(_HOURLY))
        .df().set_index("series_id").sort_index()
    )
    periods_seen = set()
    for sid, vs in series:
        x = np.array(vs, float)
        exp = _np_seasonalities(x)
        periods_seen.add(exp["seasonal_period"])
        for col, ev in exp.items():
            gv = got.loc[sid, col]
            evr = round(1e-9 + ev, 6) if ev == ev else float("nan")
            both_nan = evr != evr and gv != gv
            assert both_nan or evr == gv, (
                f"{sid}.{col}: kernel={ev!r} oracle={gv!r}"
            )
    # the branches this test exists for: at least two distinct detected
    # (non-fallback) periods, the fallback, and the NaN gate all present
    assert len({p for p in periods_seen if p == p and p != 7.0}) >= 2
    assert 7.0 in periods_seen
    assert any(p != p for p in periods_seen)


def test_deterministic_eigensolver_matches_lapack():
    """The r13 embedding_pca eigensolve (Householder tridiag + Sturm
    bisection, operators/similarity.py) reproduces LAPACK eigvalsh to
    roundoff across random symmetric matrices, including clustered and
    near-zero spectra — the operator-quality anchor for the move off
    eigvalsh that made the SQL replay possible."""
    from kats_spark.operators.similarity import (
        _householder_tridiag,
        _sturm_topk,
    )

    rng = np.random.default_rng(11)
    for trial in range(12):
        n = int(rng.choice([4, 8, 16, 64]))
        X = rng.normal(size=(3 * n, n))
        cov = np.cov(X.T, bias=True)
        if trial % 3 == 0:
            # rank-deficient: clustered near-zero eigenvalues
            B = rng.normal(size=(2, n))
            Y = rng.normal(size=(3 * n, 2)) @ B + 1e-6 * rng.normal(size=(3 * n, n))
            cov = np.cov(Y.T, bias=True)
        d, e = _householder_tridiag(cov)
        k = min(8, n)
        got = _sturm_topk(d, e, k)
        exp = np.linalg.eigvalsh(cov)[::-1][:k]
        np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-12)


def test_eig_oracle_sturm_fold_counts():
    """Pin the DuckDB list_reduce field-order behavior the eig oracle
    leans on (fields evaluate sequentially INTO the accumulator, so 'c'
    placed before 'q' reads the previous q): the SQL Sturm count must
    equal the numpy one at arbitrary shifts."""
    from kats_spark.operators.similarity import (
        _householder_tridiag,
        _sturm_count,
    )

    rng = np.random.default_rng(5)
    A = rng.normal(size=(64, 64))
    cov = A @ A.T / 64
    d, e = _householder_tridiag(cov)
    dl = "[" + ",".join(repr(v) for v in d) + "]::DOUBLE[]"
    el = "[" + ",".join(repr(v) for v in e) + "]::DOUBLE[]"
    qprev = "(CASE WHEN acc.q = 0 THEN -1e-300 ELSE acc.q END)"
    qnew = f"(x.dd - x.ee * x.ee / {qprev})"
    con = duckdb.connect()
    for lam in (0.05, 0.3, 1.0, 2.5, 10.0):
        sql = f"""
        WITH t AS (SELECT {dl} AS d, {el} AS e, {lam}::DOUBLE AS lam)
        SELECT (list_reduce(
          list_transform(range(1, 65), i ->
            CASE WHEN i = 1 THEN
              {{'c': CASE WHEN d[1] - lam < 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END,
                'q': d[1] - lam, 'dd': 0.0::DOUBLE, 'ee': 0.0::DOUBLE}}
            ELSE {{'c': 0.0::DOUBLE, 'q': 0.0::DOUBLE,
                   'dd': d[i] - lam, 'ee': e[i-1]}} END),
          (acc, x) -> {{'c': acc.c + CASE WHEN {qnew} < 0 THEN 1.0::DOUBLE
                                          ELSE 0.0::DOUBLE END,
                        'q': {qnew}, 'dd': 0.0::DOUBLE, 'ee': 0.0::DOUBLE}})).c
        FROM t"""
        got = int(con.execute(sql).fetchone()[0])
        assert got == _sturm_count(d, e, lam), lam
