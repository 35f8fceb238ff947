"""Checkpoint save/restore: params + optimizer + geometry state + scalers.

The reference persists model buffers (center/inv_cov/mean_vector ride along
inside the Lightning ckpt because they are registered buffers,
models/sts/ae.py:69-73), the fitted RobustScaler pickles
(utils/dataset.py:176-179), and a copy of the config YAML
(train_COSKAD.py:33). Here all of it is one msgpack file written atomically,
plus a JSON config snapshot beside it.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..config import Config
from ..data.normalize import RobustScalerState
from .state import TrainState


def _state_to_pure(state: TrainState):
    return serialization.to_state_dict(jax.device_get(state))


def save(
    path: str,
    state: TrainState,
    cfg: Optional[Config] = None,
    scaler: Optional[RobustScalerState] = None,
    extra: Optional[dict] = None,
) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"state": _state_to_pure(state)}
    if scaler is not None:
        payload["scaler"] = {"center": np.asarray(scaler.center),
                             "scale": np.asarray(scaler.scale)}
    if extra:
        payload["extra"] = extra
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if cfg is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    return path


def restore(
    path: str, template_state: TrainState
) -> Tuple[TrainState, Optional[RobustScalerState], dict]:
    """Restore into the shape of `template_state` (from Trainer.init_state)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(template_state, payload["state"])
    scaler = None
    if "scaler" in payload:
        scaler = RobustScalerState(
            center=np.asarray(payload["scaler"]["center"]),
            scale=np.asarray(payload["scaler"]["scale"]),
        )
    return state, scaler, payload.get("extra", {})
