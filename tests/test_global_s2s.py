"""S2SLite encoder-decoder global model (globalmodel model_type="s2s",
kats/models/globalmodel/model.py:69,990-1015)."""

import numpy as np
import pandas as pd
import pytest

from kats_spark.models.global_rnn import GRULite
from kats_spark.models.global_s2s import S2SLite, global_s2s_forecast


def test_s2s_gradients_match_finite_differences():
    rng = np.random.default_rng(0)
    m = S2SLite(hidden=4, horizon=6, fcst_window=3, seed=1)
    X = rng.normal(0, 1, (3, 5))
    Y = rng.normal(0, 1, (3, 6))
    _, g = m.loss_and_grads(X, Y)
    eps = 1e-6
    for k in ("e_Wz", "e_Un", "d_Wr", "d_bn", "Wd", "bd"):
        flat = m.params[k].ravel()
        for idx in range(0, flat.size, max(1, flat.size // 3)):
            orig = flat[idx]
            flat[idx] = orig + eps
            lp, _ = m.loss_and_grads(X, Y)
            flat[idx] = orig - eps
            lm, _ = m.loss_and_grads(X, Y)
            flat[idx] = orig
            num = (lp - lm) / (2 * eps)
            assert g[k].ravel()[idx] == pytest.approx(num, rel=1e-4, abs=1e-8), k


def test_s2s_beats_oneshot_gru_on_long_horizon():
    """The decoder's chunked unroll carries position information the
    one-shot linear head lacks: on a seasonal task with horizon 24 the
    seed-averaged held-out MSE is lower (deterministic computation)."""
    t = np.arange(500, dtype=float)
    y = np.sin(t * 2 * np.pi / 24) + 0.3 * np.sin(t * 2 * np.pi / 168) + 0.02 * t / 100
    win, hor = 24, 24
    W = np.stack([y[i:i + win + hor] for i in range(0, len(y) - win - hor)])
    tr, te = W[:300], W[300:]
    s2s_mse, one_mse = [], []
    for seed in (0, 1, 2):
        s2s = S2SLite(hidden=10, horizon=hor, fcst_window=6, seed=seed).fit(
            tr[:, :win], tr[:, win:], epochs=250)
        one = GRULite(hidden=10, horizon=hor, seed=seed).fit(
            tr[:, :win], tr[:, win:], epochs=250)
        s2s_mse.append(float(((s2s.predict(te[:, :win]) - te[:, win:]) ** 2).mean()))
        one_mse.append(float(((one.predict(te[:, :win]) - te[:, win:]) ** 2).mean()))
    assert np.mean(s2s_mse) < np.mean(one_mse)
    assert np.mean(s2s_mse) < 0.05  # and absolutely accurate on clean data


def test_s2s_state_roundtrip_and_chunking():
    rng = np.random.default_rng(5)
    m = S2SLite(hidden=6, horizon=12, fcst_window=4, seed=2)
    X = rng.normal(0, 1, (4, 8))
    assert m.predict(X).shape == (4, 12)
    assert m.n_chunks == 3
    clone = S2SLite.from_state(m.to_state())
    assert np.allclose(clone.predict(X), m.predict(X))
    with pytest.raises(ValueError, match="multiple"):
        S2SLite(hidden=4, horizon=10, fcst_window=4)


def test_global_s2s_forecast_spark(spark):
    n = 160
    t = pd.date_range("2024-01-01", periods=n, freq="h")
    rng = np.random.default_rng(9)
    rows = []
    for sid in ("a", "b"):
        y = 10 + 3 * np.sin(np.arange(n) * 2 * np.pi / 24) + rng.normal(0, 0.2, n)
        rows.append(pd.DataFrame({"series_id": sid, "time": t, "value": y}))
    df = spark.createDataFrame(pd.concat(rows))
    out = global_s2s_forecast(
        df, steps=12, freq_seconds=3600, window=16, hidden=6,
        fcst_window=4, epochs=60, sample_windows=256, seed=3,
    ).toPandas()
    assert len(out) == 24  # 12 steps x 2 series
    assert (out.fcst_upper >= out.fcst).all() and (out.fcst >= out.fcst_lower).all()
    assert out.fcst.between(0, 20).all()
