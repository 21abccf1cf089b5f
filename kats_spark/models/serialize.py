"""Global-model serialize/load — the kats/models/globalmodel/serialize.py
surface (``global_model_to_json`` :50 / ``load_global_model_from_json``
:81) for the numpy cells, without pickle: weights round-trip as versioned
JSON through the same ``StateCodec`` contract the detectors use
(kats/detectors/detector.py:157-166 — version N+1 MUST load version-N
state; unknown future keys survive a load/dump cycle).

JSON, not pickle, is deliberate: the reference stores torch state_dicts
via joblib, which ties the artifact to a code version; a JSON weight
payload is engine-portable, diffable, and safe to keep in a checkpoint
table column next to the detector states.
"""

from __future__ import annotations

import json

import numpy as np

from kats_spark.models.global_rnn import GRULite
from kats_spark.models.rnn import LSTMLite
from kats_spark.sources.state import StateCodec

_CODEC = StateCodec(
    version=1,
    defaults={
        "kind": "gru",       # cell class of a single model
        "combine": "median",  # ensemble combine rule (ensemble.py:24)
        "models": None,       # list of single-model payloads (ensemble)
        "hidden": None,
        "horizon": None,
        "params": None,       # name -> nested-list weights
    },
)

_KINDS = {"gru": GRULite, "lstm": LSTMLite}


def _model_payload(model) -> dict:
    kind = {GRULite: "gru", LSTMLite: "lstm"}.get(type(model))
    if kind is None:
        raise TypeError(f"cannot serialize {type(model).__name__}")
    state = _CODEC.new()
    state.update(
        {
            "kind": kind,
            "hidden": model.h,
            "horizon": model.horizon,
            "params": {k: np.asarray(v).tolist() for k, v in model.params.items()},
        }
    )
    return state


def _model_from_payload(state: dict):
    model = _KINDS[state["kind"]](
        hidden=int(state["hidden"]), horizon=int(state["horizon"]), seed=0
    )
    for k, v in state["params"].items():
        arr = np.asarray(v, dtype=float)
        # tolerate future params the current cell doesn't know (forward
        # compat) and missing ones (the seed-0 init stays — backward compat)
        if k in model.params and arr.shape == model.params[k].shape:
            model.params[k] = arr
    return model


def global_model_to_json(model) -> str:
    """GRULite / LSTMLite / list-of-cells (ensemble) -> versioned JSON."""
    if isinstance(model, (list, tuple)):
        state = _CODEC.new()
        state["kind"] = "ensemble"
        state["models"] = [_model_payload(m) for m in model]
        return _CODEC.dumps(state)
    return _CODEC.dumps(_model_payload(model))


def load_global_model_from_json(raw: str | bytes):
    """Versioned JSON -> model(s) with identical forecasts; missing keys
    default, unknown keys are preserved by the codec (vN+1 loads vN)."""
    state = _CODEC.loads(raw)
    if state["kind"] == "ensemble":
        return [_model_from_payload(_CODEC.loads(json.dumps(m)))
                for m in state["models"]]
    return _model_from_payload(state)
