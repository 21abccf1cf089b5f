"""Per-series RNN forecasters — the kats/models/lstm.py shape (fit :92 /
predict :157: one recurrent net per series over sliding windows) without
torch: numpy cells train INSIDE the ``applyInPandas`` group, so every
series fits its own weights distributed-side (the fan-out contract of the
whole model zoo, kats/models/model.py:18).

Two cells share one training harness:

- ``GRULite`` (models/global_rnn.py) — the default;
- ``LSTMLite`` (here) — the actual LSTM cell of kats/models/lstm.py:34
  (``nn.LSTM`` hidden_size/num_layers at :108, fit loop :178, predict
  unroll :228): input/forget/cell/output gates, forget-gate bias init 1,
  manual BPTT through both the hidden and cell states, verified against
  finite differences in tests/test_global_rnn.py.

Differences from the global model: no driver-side training, no weight
broadcast — each task trains on its own group's windows (the LSTM
model's semantics); the global model remains the one-model-many-series
path.  Direct multi-horizon head (the reference trains one-step and
unrolls; direct heads avoid error accumulation and need no unroll loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from kats_spark.models.global_rnn import GRULite, Z95, _sigmoid
from kats_spark.tsframe import TSSchema, DEFAULT


class LSTMLite:
    """Scalar-input LSTM + linear multi-horizon head, trained with Adam
    on manual-BPTT gradients; same (B, T) windows / (B, H) targets
    contract as GRULite.  Gate params: W* scalar-input weights (h,),
    U* recurrent (h, h), b* biases; Wy/by is the readout head."""

    def __init__(self, hidden: int = 12, horizon: int = 12, seed: int = 0) -> None:
        rng = np.random.default_rng(seed)
        h = hidden
        s = 1.0 / np.sqrt(h)
        self.h = h
        self.horizon = horizon
        self.params = {
            "Wi": rng.normal(0, s, h), "Ui": rng.normal(0, s, (h, h)), "bi": np.zeros(h),
            # forget bias 1.0: the published LSTM trick (Jozefowicz et
            # al. 2015) so early training doesn't flush the cell state
            "Wf": rng.normal(0, s, h), "Uf": rng.normal(0, s, (h, h)), "bf": np.ones(h),
            "Wg": rng.normal(0, s, h), "Ug": rng.normal(0, s, (h, h)), "bg": np.zeros(h),
            "Wo": rng.normal(0, s, h), "Uo": rng.normal(0, s, (h, h)), "bo": np.zeros(h),
            "Wy": rng.normal(0, s, (horizon, h)), "by": np.zeros(horizon),
        }

    # ---- forward/backward ------------------------------------------------
    def _forward(self, X: np.ndarray):
        p = self.params
        B, T = X.shape
        hprev = np.zeros((B, self.h))
        cprev = np.zeros((B, self.h))
        cache = []
        for t in range(T):
            x = X[:, t : t + 1]  # (B, 1)
            i = _sigmoid(x * p["Wi"] + hprev @ p["Ui"].T + p["bi"])
            f = _sigmoid(x * p["Wf"] + hprev @ p["Uf"].T + p["bf"])
            g = np.tanh(x * p["Wg"] + hprev @ p["Ug"].T + p["bg"])
            o = _sigmoid(x * p["Wo"] + hprev @ p["Uo"].T + p["bo"])
            cnew = f * cprev + i * g
            tc = np.tanh(cnew)
            hnew = o * tc
            cache.append((x, hprev, cprev, i, f, g, o, tc))
            hprev, cprev = hnew, cnew
        yhat = hprev @ p["Wy"].T + p["by"]
        return yhat, (cache, hprev)

    def _backward(self, X: np.ndarray, dy: np.ndarray, fwd) -> dict:
        p = self.params
        cache, hT = fwd
        grads = {k: np.zeros_like(v) for k, v in p.items()}
        grads["Wy"] = dy.T @ hT
        grads["by"] = dy.sum(axis=0)
        dh = dy @ p["Wy"]
        dc = np.zeros((len(X), self.h))
        for t in range(len(cache) - 1, -1, -1):
            x, hprev, cprev, i, f, g, o, tc = cache[t]
            do = dh * tc
            dop = do * o * (1 - o)
            dc = dc + dh * o * (1 - tc * tc)
            di = dc * g
            dip = di * i * (1 - i)
            df = dc * cprev
            dfp = df * f * (1 - f)
            dg = dc * i
            dgp = dg * (1 - g * g)
            dh = dip @ p["Ui"] + dfp @ p["Uf"] + dgp @ p["Ug"] + dop @ p["Uo"]
            dc = dc * f
            for nm, dpre in (("i", dip), ("f", dfp), ("g", dgp), ("o", dop)):
                grads["W" + nm] += (dpre * x).sum(axis=0)
                grads["U" + nm] += dpre.T @ hprev
                grads["b" + nm] += dpre.sum(axis=0)
        return grads

    def loss_and_grads(self, X: np.ndarray, Y: np.ndarray):
        yhat, fwd = self._forward(X)
        err = yhat - Y
        loss = float((err * err).mean())
        dy = 2.0 * err / err.size
        return loss, self._backward(X, dy, fwd)

    def fit(
        self,
        X: np.ndarray,
        Y: np.ndarray,
        epochs: int = 200,
        lr: float = 2e-2,
    ) -> "LSTMLite":
        p = self.params
        m = {k: np.zeros_like(v) for k, v in p.items()}
        v = {k: np.zeros_like(v_) for k, v_ in p.items()}
        b1, b2, eps = 0.9, 0.999, 1e-8
        for it in range(1, epochs + 1):
            _, g = self.loss_and_grads(X, Y)
            for k in p:
                m[k] = b1 * m[k] + (1 - b1) * g[k]
                v[k] = b2 * v[k] + (1 - b2) * g[k] * g[k]
                mh = m[k] / (1 - b1**it)
                vh = v[k] / (1 - b2**it)
                p[k] -= lr * mh / (np.sqrt(vh) + eps)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self._forward(X)[0]


_CELLS = {"gru": GRULite, "lstm": LSTMLite}


def _series_windows(y: np.ndarray, win: int, horizon: int) -> np.ndarray:
    wsize = win + horizon
    n = len(y) - wsize + 1
    if n <= 0:
        return np.empty((0, wsize))
    return np.lib.stride_tricks.sliding_window_view(y, wsize).copy()


def rnn_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    window: int = 16,
    hidden: int = 8,
    epochs: int = 120,
    seed: int = 0,
    cell: str = "gru",
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper): one recurrent net
    per series (``cell`` = 'gru' or 'lstm'), trained in-task on that
    series' sliding windows (per-window scale normalization, Adam, manual
    BPTT), bands from per-horizon in-sample residual spread."""
    cell_cls = _CELLS[cell]
    win = window
    schema = (
        f"{s.series_id} string, {s.time} timestamp, "
        "fcst double, fcst_lower double, fcst_upper double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        W = _series_windows(y, win, steps)
        if len(W) < 8:
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        scale = np.abs(W[:, :win]).mean(axis=1, keepdims=True) + 1e-9
        Wn = W / scale
        model = cell_cls(hidden=hidden, horizon=steps, seed=seed)
        model.fit(Wn[:, :win], Wn[:, win:], epochs=epochs)
        resid = (model.predict(Wn[:, :win]) - Wn[:, win:]) * scale
        se_h = resid.std(axis=0, ddof=1)
        tail = y[-win:][None, :]
        sc = np.abs(tail).mean() + 1e-9
        fc = model.predict(tail / sc)[0] * sc
        h = np.arange(1, steps + 1)
        times = pd.Timestamp(pdf[s.time].iloc[-1]) + pd.to_timedelta(
            h * freq_seconds, unit="s"
        )
        return pd.DataFrame(
            {
                s.series_id: str(pdf[s.series_id].iloc[0]),
                s.time: times,
                "fcst": fc,
                "fcst_lower": fc - Z95 * se_h,
                "fcst_upper": fc + Z95 * se_h,
            }
        )

    return (
        df.select(s.series_id, s.time, s.value)
        .groupBy(s.series_id)
        .applyInPandas(fn, schema)
    )


def lstm_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    window: int = 16,
    hidden: int = 8,
    epochs: int = 120,
    seed: int = 0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """kats/models/lstm.py parity surface: ``rnn_forecast`` with the real
    LSTM cell (input/forget/cell/output gates)."""
    return rnn_forecast(
        df, steps, freq_seconds, window=window, hidden=hidden,
        epochs=epochs, seed=seed, cell="lstm", s=s,
    )
