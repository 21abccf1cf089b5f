"""S2SLite: encoder-decoder (seq2seq) global model.

Parity target: the reference global model's ``model_type="s2s"`` variant
(kats/models/globalmodel/model.py:69 decoder reset, :990-1015 encoder /
decoder construction): an encoder RNN consumes the history window, a
SEPARATE decoder RNN unrolls one step per forecast chunk — its input
carries a ``step_num_encode`` position feature and it emits
``fcst_window`` values per decode step — so a long horizon is produced
in chunks instead of one linear head (the reference's "rnn" one-shot
shape, covered by models/global_rnn.py GRULite).

Lite re-expression (torch is gated out of this container): both stacks
are scalar-input GRU cells in numpy with manual-BPTT gradients shared
with GRULite's cell math; the decoder's initial hidden state is the
encoder's final state (the classic seq2seq handoff) and its per-step
input is the normalized step number — gradients flow through the
handoff into the encoder.  Training is Adam on a bounded hash-ranked
global window sample; inference is distributed per series with the
trained weights travelling in the UDF closure (Spark broadcasts the
serialized task), exactly the global_rnn_forecast plan shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from kats_spark.models.global_rnn import Z95, _normalize_windows, _sigmoid, _window_frame
from kats_spark.tsframe import TSSchema, DEFAULT


def _gru_forward(p: dict, pre: str, X: np.ndarray, h0: np.ndarray):
    """Scalar-input GRU over X (B, T) from initial hidden h0 (B, h).
    Returns (hs, cache): hs[t] = hidden AFTER consuming X[:, t]."""
    hprev = h0
    cache = []
    hs = []
    for t in range(X.shape[1]):
        x = X[:, t : t + 1]
        z = _sigmoid(x * p[pre + "Wz"] + hprev @ p[pre + "Uz"].T + p[pre + "bz"])
        r = _sigmoid(x * p[pre + "Wr"] + hprev @ p[pre + "Ur"].T + p[pre + "br"])
        rh = r * hprev
        n = np.tanh(x * p[pre + "Wn"] + rh @ p[pre + "Un"].T + p[pre + "bn"])
        hnew = (1 - z) * n + z * hprev
        cache.append((x, hprev, z, r, rh, n))
        hs.append(hnew)
        hprev = hnew
    return hs, cache


def _gru_backward(
    p: dict, pre: str, cache: list, dhs: list, g: dict
) -> np.ndarray:
    """Backprop through a _gru_forward pass.  ``dhs[t]`` is the gradient
    INJECTED at step t's output hidden (zeros where nothing taps it);
    returns the gradient w.r.t. the initial hidden h0 and accumulates
    parameter grads into ``g``."""
    dh = np.zeros_like(dhs[-1])
    for t in range(len(cache) - 1, -1, -1):
        dh = dh + dhs[t]
        x, hprev, z, r, rh, n = cache[t]
        dn = dh * (1 - z)
        dnp = dn * (1 - n * n)
        dz = dh * (hprev - n)
        dzp = dz * z * (1 - z)
        dh_prev = dh * z
        drh = dnp @ p[pre + "Un"]
        dr = drh * hprev
        drp = dr * r * (1 - r)
        dh_prev = dh_prev + drh * r + dzp @ p[pre + "Uz"] + drp @ p[pre + "Ur"]
        g[pre + "Wn"] += (dnp * x).sum(axis=0)
        g[pre + "Un"] += dnp.T @ rh
        g[pre + "bn"] += dnp.sum(axis=0)
        g[pre + "Wz"] += (dzp * x).sum(axis=0)
        g[pre + "Uz"] += dzp.T @ hprev
        g[pre + "bz"] += dzp.sum(axis=0)
        g[pre + "Wr"] += (drp * x).sum(axis=0)
        g[pre + "Ur"] += drp.T @ hprev
        g[pre + "br"] += drp.sum(axis=0)
        dh = dh_prev
    return dh


def _gru_param_init(rng, pre: str, h: int) -> dict:
    s = 1.0 / np.sqrt(h)
    return {
        pre + "Wz": rng.normal(0, s, h), pre + "Uz": rng.normal(0, s, (h, h)),
        pre + "bz": np.zeros(h),
        pre + "Wr": rng.normal(0, s, h), pre + "Ur": rng.normal(0, s, (h, h)),
        pre + "br": np.zeros(h),
        pre + "Wn": rng.normal(0, s, h), pre + "Un": rng.normal(0, s, (h, h)),
        pre + "bn": np.zeros(h),
    }


class S2SLite:
    """Encoder-decoder GRU: encoder over the input window, decoder
    unrolled ``horizon // fcst_window`` steps from the encoder's final
    hidden, each step fed ``step_num_encode`` = (d+1)/n_chunks and
    emitting ``fcst_window`` values through a shared linear head
    (GMParam fcst_window / step_num_encode semantics,
    kats/models/globalmodel/model.py:1000-1015)."""

    def __init__(
        self, hidden: int = 12, horizon: int = 12, fcst_window: int = 4,
        seed: int = 0,
    ) -> None:
        if horizon % fcst_window != 0:
            raise ValueError("horizon must be a multiple of fcst_window")
        rng = np.random.default_rng(seed)
        self.h = hidden
        self.horizon = horizon
        self.c = fcst_window
        self.n_chunks = horizon // fcst_window
        s = 1.0 / np.sqrt(hidden)
        self.params = {
            **_gru_param_init(rng, "e_", hidden),
            **_gru_param_init(rng, "d_", hidden),
            "Wd": rng.normal(0, s, (fcst_window, hidden)),
            "bd": np.zeros(fcst_window),
        }

    def _step_inputs(self, B: int) -> np.ndarray:
        d = np.arange(1, self.n_chunks + 1, dtype=float) / self.n_chunks
        return np.tile(d, (B, 1))

    def _forward(self, X: np.ndarray):
        p = self.params
        B = X.shape[0]
        ehs, ecache = _gru_forward(p, "e_", X, np.zeros((B, self.h)))
        dhs, dcache = _gru_forward(p, "d_", self._step_inputs(B), ehs[-1])
        yhat = np.concatenate(
            [h @ p["Wd"].T + p["bd"] for h in dhs], axis=1
        )  # (B, horizon)
        return yhat, (ecache, dcache, dhs)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self._forward(X)[0]

    def loss_and_grads(self, X: np.ndarray, Y: np.ndarray):
        p = self.params
        yhat, (ecache, dcache, dhs) = self._forward(X)
        err = yhat - Y
        loss = float((err * err).mean())
        dy = 2.0 * err / err.size
        g = {k: np.zeros_like(v) for k, v in p.items()}
        dh_inject = []
        for d in range(self.n_chunks):
            dy_d = dy[:, d * self.c : (d + 1) * self.c]
            g["Wd"] += dy_d.T @ dhs[d]
            g["bd"] += dy_d.sum(axis=0)
            dh_inject.append(dy_d @ p["Wd"])
        dh0_dec = _gru_backward(p, "d_", dcache, dh_inject, g)
        enc_inject = [np.zeros_like(dh0_dec) for _ in range(X.shape[1])]
        enc_inject[-1] = dh0_dec  # the seq2seq handoff gradient
        _gru_backward(p, "e_", ecache, enc_inject, g)
        return loss, g

    def fit(
        self, X: np.ndarray, Y: np.ndarray, epochs: int = 200, lr: float = 2e-2
    ) -> "S2SLite":
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

    # ---- serialization (StateCodec; vN+1 loads vN) ----------------------
    def to_state(self) -> str:
        from kats_spark.sources.state import StateCodec

        codec = StateCodec(1, {})
        state = codec.new()
        state.update(
            {
                "hidden": self.h, "horizon": self.horizon,
                "fcst_window": self.c,
                "params": {k: v.tolist() for k, v in self.params.items()},
            }
        )
        return codec.dumps(state)

    @classmethod
    def from_state(cls, raw: str) -> "S2SLite":
        from kats_spark.sources.state import StateCodec

        state = StateCodec(1, {"hidden": 12, "horizon": 12, "fcst_window": 4}).loads(raw)
        mdl = cls(
            hidden=int(state["hidden"]), horizon=int(state["horizon"]),
            fcst_window=int(state["fcst_window"]),
        )
        mdl.params = {k: np.asarray(v) for k, v in state["params"].items()}
        return mdl


def global_s2s_forecast(
    df: DataFrame,
    steps: int,
    freq_seconds: int,
    window: int = 16,
    hidden: int = 12,
    fcst_window: int = 4,
    epochs: int = 200,
    sample_windows: int = 2048,
    seed: int = 0,
    s: TSSchema = DEFAULT,
) -> DataFrame:
    """(series_id, time, fcst, fcst_lower, fcst_upper): one S2S fit on a
    bounded hash-ranked global window sample (the ONLY driver-side
    data, capped regardless of corpus size), distributed per-series
    inference from each tail window — the global_rnn_forecast plan
    shape with the encoder-decoder model swapped in."""
    win = window
    wsize = win + steps
    wins = _window_frame(df, win, wsize, s).orderBy("k").limit(sample_windows)
    sample = np.array([list(r.w) for r in wins.collect()], dtype=float)
    if len(sample) == 0:
        raise ValueError(f"no series long enough for window+steps={wsize}")
    Wn, _ = _normalize_windows(sample, win)
    model = S2SLite(hidden=hidden, horizon=steps, fcst_window=fcst_window, seed=seed)
    model.fit(Wn[:, :win], Wn[:, win:], epochs=epochs)
    yhat_n = model.predict(Wn[:, :win])
    scale = np.abs(sample[:, :win]).mean(axis=1, keepdims=True) + 1e-9
    resid = (yhat_n - Wn[:, win:]) * scale
    se_h = resid.std(axis=0, ddof=1)
    state = model.to_state()
    hor = steps

    schema = (
        f"{s.series_id} string, {s.time} timestamp, "
        "fcst double, fcst_lower double, fcst_upper double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s.time)
        y = pdf[s.value].to_numpy(dtype=float)
        if len(y) < win:
            return pd.DataFrame(
                columns=[s.series_id, s.time, "fcst", "fcst_lower", "fcst_upper"]
            )
        mdl = S2SLite.from_state(state)
        tail = y[-win:][None, :]
        sc = np.abs(tail).mean() + 1e-9
        fc = mdl.predict(tail / sc)[0] * sc
        h = np.arange(1, hor + 1)
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
