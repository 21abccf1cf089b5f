"""MetaLearnHPT: multi-task hyper-parameter recommender.

Parity target: kats/models/metalearner/metalearner_hpt.py:38-835
(``MetaLearnHPT`` + ``MultitaskNet``) — a shared MLP encoder over
TsFeatures vectors with one softmax head per CATEGORICAL hyper-parameter
and one linear head for the NUMERICAL hyper-parameter block, trained
with minibatch SGD/Adam, early-stopped on a validation split
(metalearner_hpt.py:521 ``train``: loss = Σ cross-entropy +
MSE / loss_scale).  The reference builds the net in torch; this
container has numpy only, so the net and its backprop are implemented
directly (same activations: ReLU after every shared layer and between
head layers, none on head outputs — metalearner_hpt.py:890-924).

Spark shape (the part that survives 100 TB): the metadata table —
(features, best-HPs) rows from historical tuning — is the TRAINED
ARTIFACT and is small by construction, so it collects to the driver
under a hard cap for the fit; the fitted weights (a few KB) ship to
executors inside the ``mapInPandas`` closure and every series in the
corpus is scored in one distributed pass with no shuffle at all.
Identical topology to the GRULite / global-model pattern
(models/global_rnn.py): bounded driver fit -> broadcast weights ->
linear scoring scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


class _Chain:
    """One dense chain (list of (W, b)); ReLU between layers, linear out."""

    def __init__(self, dims: list[int], rng: np.random.Generator) -> None:
        self.W = [
            rng.normal(0.0, np.sqrt(2.0 / dims[i]), (dims[i], dims[i + 1]))
            for i in range(len(dims) - 1)
        ]
        self.b = [np.zeros(dims[i + 1]) for i in range(len(dims) - 1)]

    def forward(self, x: np.ndarray, relu_last: bool):
        """Returns (output, caches); caches = list of (input, pre-act)."""
        caches = []
        h = x
        for i, (W, b) in enumerate(zip(self.W, self.b)):
            z = h @ W + b
            caches.append((h, z))
            h = _relu(z) if (relu_last or i < len(self.W) - 1) else z
        return h, caches

    def backward(self, dout: np.ndarray, caches, relu_last: bool):
        """Returns (d_input, grads); grads aligned with (W, b)."""
        gW = [None] * len(self.W)
        gb = [None] * len(self.b)
        d = dout
        for i in reversed(range(len(self.W))):
            h_in, z = caches[i]
            if relu_last or i < len(self.W) - 1:
                d = d * (z > 0)
            gW[i] = h_in.T @ d
            gb[i] = d.sum(axis=0)
            d = d @ self.W[i].T
        return d, (gW, gb)

    def params(self):
        return self.W + self.b

    def grads_list(self, g):
        return g[0] + g[1]


class MultitaskNetLite:
    """Numpy twin of the reference MultitaskNet + its training loop.

    ``cat_classes``: number of classes per categorical task;
    ``n_num``: number of numerical response variables (0 to disable).
    """

    def __init__(
        self,
        input_dim: int,
        n_hidden_shared: list[int],
        n_hidden_cat_combo: list[list[int]],
        cat_classes: list[int],
        n_hidden_num: list[int],
        n_num: int,
        seed: int = 0,
    ) -> None:
        rng = np.random.default_rng(seed)
        if len(n_hidden_cat_combo) != len(cat_classes):
            raise ValueError("one hidden spec per categorical task required")
        self.shared = _Chain([input_dim, *n_hidden_shared], rng)
        last = n_hidden_shared[-1] if n_hidden_shared else input_dim
        self.cat_heads = [
            _Chain([last, *hid, k], rng)
            for hid, k in zip(n_hidden_cat_combo, cat_classes)
        ]
        self.num_head = (
            _Chain([last, *n_hidden_num, n_num], rng) if n_num > 0 else None
        )
        self.cat_classes = list(cat_classes)
        self.n_num = n_num
        self._loss_path: dict[str, list[float]] = {
            "LOSS_train_cat": [], "LOSS_train_num": [],
            "LOSS_val_cat": [], "LOSS_val_num": [],
        }

    # ---- forward / loss --------------------------------------------------
    def _forward(self, X: np.ndarray):
        h, sc = self.shared.forward(X, relu_last=True)
        cat_logits, cat_caches = [], []
        for head in self.cat_heads:
            o, c = head.forward(h, relu_last=False)
            cat_logits.append(o)
            cat_caches.append(c)
        if self.num_head is not None:
            num_out, num_cache = self.num_head.forward(h, relu_last=False)
        else:
            num_out, num_cache = None, None
        return h, sc, cat_logits, cat_caches, num_out, num_cache

    def _losses(self, cat_logits, num_out, y_cat, y_num):
        loss_cat = 0.0
        for t, logits in enumerate(cat_logits):
            p = _softmax(logits)
            n = len(p)
            loss_cat += float(
                -np.log(np.clip(p[np.arange(n), y_cat[:, t]], 1e-12, None)).mean()
            )
        loss_num = (
            float(((num_out - y_num) ** 2).mean()) if num_out is not None else 0.0
        )
        return loss_cat, loss_num

    def predict(self, X: np.ndarray):
        """Returns (list of per-task class-prob arrays, numerical array)."""
        _, _, cat_logits, _, num_out, _ = self._forward(np.asarray(X, float))
        return [_softmax(o) for o in cat_logits], num_out

    # ---- training --------------------------------------------------------
    def fit(
        self,
        X: np.ndarray,
        y_cat: np.ndarray | None = None,
        y_num: np.ndarray | None = None,
        loss_scale: float = 1.0,
        lr: float = 0.001,
        n_epochs: int = 1000,
        batch_size: int = 128,
        method: str = "adam",
        val_size: float = 0.1,
        momentum: float = 0.9,
        n_epochs_stop: int = 20,
        seed: int = 0,
    ) -> "MultitaskNetLite":
        X = np.asarray(X, float)
        n = len(X)
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        n_val = max(int(round(n * val_size)), 1)
        vi, ti = perm[:n_val], perm[n_val:]
        has_cat = y_cat is not None and len(self.cat_heads) > 0
        has_num = y_num is not None and self.num_head is not None
        yc = np.asarray(y_cat, int) if has_cat else None
        yn = np.asarray(y_num, float) if has_num else None
        if has_num and yn.ndim == 1:
            yn = yn[:, None]
        batch_size = min(batch_size, max(len(ti), 1))

        chains = [self.shared, *self.cat_heads] + (
            [self.num_head] if self.num_head is not None else []
        )
        params = [p for c in chains for p in c.params()]
        m_t = [np.zeros_like(p) for p in params]
        v_t = [np.zeros_like(p) for p in params]
        step = 0
        min_val, no_improve = np.inf, 0
        best = [p.copy() for p in params]

        for epoch in range(n_epochs):
            order = rng.permutation(ti)
            lc_tr = ln_tr = 0.0
            for s0 in range(0, len(order), batch_size):
                idx = order[s0 : s0 + batch_size]
                Xb = X[idx]
                h, sc, cat_logits, cat_caches, num_out, num_cache = self._forward(Xb)
                lc_tr, ln_tr = self._losses(
                    cat_logits, num_out,
                    yc[idx] if has_cat else None,
                    yn[idx] if has_num else None,
                )
                # ---- backward
                d_h = np.zeros_like(h)
                all_grads: list = [None] * len(chains)
                ci = 1
                if has_cat:
                    for t, head in enumerate(self.cat_heads):
                        p = _softmax(cat_logits[t])
                        d = p.copy()
                        d[np.arange(len(p)), yc[idx][:, t]] -= 1.0
                        d /= len(p)  # mean CE
                        dh, g = head.backward(d, cat_caches[t], relu_last=False)
                        d_h += dh
                        all_grads[ci + t] = g
                if has_num:
                    d = 2.0 * (num_out - yn[idx]) / num_out.size / loss_scale
                    dh, g = self.num_head.backward(d, num_cache, relu_last=False)
                    d_h += dh
                    all_grads[-1] = g
                _, g_sh = self.shared.backward(d_h, sc, relu_last=True)
                all_grads[0] = g_sh
                grads = []
                for c, g in zip(chains, all_grads):
                    grads.extend(
                        c.grads_list(g)
                        if g is not None
                        else [np.zeros_like(p) for p in c.params()]
                    )
                # ---- update
                step += 1
                if method == "adam":
                    for j, (p, g) in enumerate(zip(params, grads)):
                        m_t[j] = 0.9 * m_t[j] + 0.1 * g
                        v_t[j] = 0.999 * v_t[j] + 0.001 * g * g
                        mh = m_t[j] / (1 - 0.9**step)
                        vh = v_t[j] / (1 - 0.999**step)
                        p -= lr * mh / (np.sqrt(vh) + 1e-8)
                else:  # SGD + momentum (the reference default)
                    for j, (p, g) in enumerate(zip(params, grads)):
                        m_t[j] = momentum * m_t[j] + g
                        p -= lr * m_t[j]
            self._loss_path["LOSS_train_cat"].append(lc_tr)
            self._loss_path["LOSS_train_num"].append(ln_tr)
            # ---- validation + early stop (reference: epoch > 20 guard)
            _, _, cl_v, _, no_v, _ = self._forward(X[vi])
            lc_v, ln_v = self._losses(
                cl_v, no_v, yc[vi] if has_cat else None, yn[vi] if has_num else None
            )
            self._loss_path["LOSS_val_cat"].append(lc_v)
            self._loss_path["LOSS_val_num"].append(ln_v)
            val = lc_v + ln_v / loss_scale
            if val < min_val:
                min_val, no_improve = val, 0
                best = [p.copy() for p in params]
            else:
                no_improve += 1
            if epoch > 20 and no_improve >= n_epochs_stop:
                break
        for p, bp in zip(params, best):
            p[...] = bp
        return self

    # ---- (de)serialization ----------------------------------------------
    def get_weights(self) -> dict:
        out = {"cat_classes": self.cat_classes, "n_num": self.n_num}
        chains = {"shared": self.shared, "num": self.num_head}
        for i, h in enumerate(self.cat_heads):
            chains[f"cat{i}"] = h
        for name, c in chains.items():
            if c is None:
                continue
            out[name] = {
                "W": [w.tolist() for w in c.W],
                "b": [b.tolist() for b in c.b],
            }
        return out

    @classmethod
    def from_weights(cls, blob: dict) -> "MultitaskNetLite":
        obj = cls.__new__(cls)
        obj.cat_classes = list(blob["cat_classes"])
        obj.n_num = int(blob["n_num"])
        obj._loss_path = {}

        def chain(d):
            c = _Chain.__new__(_Chain)
            c.W = [np.asarray(w, float) for w in d["W"]]
            c.b = [np.asarray(b, float) for b in d["b"]]
            return c

        obj.shared = chain(blob["shared"])
        obj.cat_heads = [
            chain(blob[f"cat{i}"]) for i in range(len(obj.cat_classes))
        ]
        obj.num_head = chain(blob["num"]) if "num" in blob else None
        return obj


def metalearn_hpt_recommend(
    features: DataFrame,
    metadata: DataFrame,
    feature_cols: list[str],
    numerical_hps: list[str],
    categorical_hps: list[str],
    id_col: str = "series_id",
    max_train_rows: int = 20_000,
    n_hidden_shared: list[int] | None = None,
    n_hidden_cat: list[int] | None = None,
    n_hidden_num: list[int] | None = None,
    n_epochs: int = 300,
    lr: float = 0.01,
    batch_size: int = 64,
    loss_scale: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """One recommendation row per series from the multi-task net.

    The metadata table (the trained artifact: TsFeatures + best-HP rows
    from historical tuning) collects under ``max_train_rows`` — it is
    small by construction, like every metalearner's training set
    (kats/models/metalearner/metalearner_hpt.py trains on an in-memory
    DataFrame); the cap fails loud rather than letting an mis-wired
    corpus-sized frame onto the driver.  Scoring is one mapInPandas scan
    with the weights in the closure — no shuffle, no join.
    """
    n_hidden_shared = n_hidden_shared or [32]
    n_hidden_cat = n_hidden_cat if n_hidden_cat is not None else [16]
    n_hidden_num = n_hidden_num if n_hidden_num is not None else [16]

    meta_pd = metadata.limit(max_train_rows + 1).toPandas()
    if len(meta_pd) > max_train_rows:
        raise ValueError(
            f"metadata has >{max_train_rows} rows — not a trained-artifact "
            "table; raise max_train_rows explicitly if intended"
        )
    X = meta_pd[feature_cols].to_numpy(float)
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd = np.where(sd > 0, sd, 1.0)
    Xs = (X - mu) / sd

    cat_levels = [sorted(meta_pd[h].astype(str).unique()) for h in categorical_hps]
    y_cat = (
        np.column_stack(
            [
                meta_pd[h].astype(str).map({v: i for i, v in enumerate(lv)}).to_numpy()
                for h, lv in zip(categorical_hps, cat_levels)
            ]
        )
        if categorical_hps
        else None
    )
    if numerical_hps:
        Yn = meta_pd[numerical_hps].to_numpy(float)
        n_mu, n_sd = Yn.mean(axis=0), Yn.std(axis=0)
        n_sd = np.where(n_sd > 0, n_sd, 1.0)
        Yns = (Yn - n_mu) / n_sd
    else:
        Yns, n_mu, n_sd = None, None, None

    net = MultitaskNetLite(
        input_dim=len(feature_cols),
        n_hidden_shared=n_hidden_shared,
        n_hidden_cat_combo=[list(n_hidden_cat) for _ in categorical_hps],
        cat_classes=[len(lv) for lv in cat_levels],
        n_hidden_num=list(n_hidden_num),
        n_num=len(numerical_hps),
        seed=seed,
    ).fit(
        Xs, y_cat, Yns,
        loss_scale=loss_scale, lr=lr, n_epochs=n_epochs,
        batch_size=batch_size, method="adam", seed=seed,
    )
    blob = net.get_weights()
    f_mu, f_sd = mu.tolist(), sd.tolist()
    num_mu = n_mu.tolist() if n_mu is not None else []
    num_sd = n_sd.tolist() if n_sd is not None else []
    fcols, nhps, chps = list(feature_cols), list(numerical_hps), list(categorical_hps)
    levels = [list(lv) for lv in cat_levels]

    fields = [f"{id_col} string"]
    fields += [f"{h} double" for h in nhps]
    fields += [f"{h} string" for h in chps]
    schema = ", ".join(fields)

    def score(batches):
        model = MultitaskNetLite.from_weights(blob)
        fmu = np.asarray(f_mu)
        fsd = np.asarray(f_sd)
        for pdf in batches:
            if not len(pdf):
                continue
            Xq = (pdf[fcols].to_numpy(float) - fmu) / fsd
            probs, num = model.predict(Xq)
            out = {id_col: pdf[id_col].astype(str)}
            for j, h in enumerate(nhps):
                out[h] = num[:, j] * num_sd[j] + num_mu[j]
            for t, h in enumerate(chps):
                out[h] = [levels[t][i] for i in probs[t].argmax(axis=1)]
            yield pd.DataFrame(out)

    return features.select(id_col, *fcols).mapInPandas(score, schema)
