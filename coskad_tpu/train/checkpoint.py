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


def read_payload(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _scaler_of(payload: dict) -> Optional[RobustScalerState]:
    if "scaler" not in payload:
        return None
    return RobustScalerState(
        center=np.asarray(payload["scaler"]["center"]),
        scale=np.asarray(payload["scaler"]["scale"]),
    )


def load_scaler(path: str) -> Optional[RobustScalerState]:
    """Read just the fitted scaler from a checkpoint."""
    return _scaler_of(read_payload(path))


def restore(
    path: str,
    template_state: TrainState,
    payload: Optional[dict] = None,
) -> Tuple[TrainState, Optional[RobustScalerState], dict]:
    """Restore into the shape of `template_state` (from Trainer.init_state).

    Pass a pre-read `payload` (from read_payload) to avoid deserializing the
    checkpoint twice when the scaler is needed before the Trainer exists."""
    if payload is None:
        payload = read_payload(path)
    state = serialization.from_state_dict(template_state, payload["state"])
    return state, _scaler_of(payload), payload.get("extra", {})


# --------------------------------------------------------------- orbax flavor
#
# Directory-format Orbax checkpoints for production/multi-host runs: sharded
# arrays are written per-host (no device_get gather through one process) and
# saves can be made async. The msgpack flavor above stays the default — at
# this model size (<300k params) a single file is simpler and faster.


def _array_tree(state: TrainState):
    return jax.tree.map(np.asarray, serialization.to_state_dict(state))


# Async saves share one AsyncCheckpointer: it owns the background thread
# pool, and keeping it alive between saves is the Orbax-recommended pattern
# (a fresh one per save would block on construction and teardown).
_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_async_saves() -> None:
    """Block until every scheduled async Orbax save has committed. Call
    before reading a just-saved checkpoint or at clean shutdown."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_orbax(
    path: str,
    state: TrainState,
    cfg: Optional[Config] = None,
    scaler: Optional[RobustScalerState] = None,
    extra: Optional[dict] = None,
    async_save: bool = False,
) -> str:
    """Write an Orbax (directory) checkpoint. Scaler and extra metadata go
    to a `<path>.extra.json` sidecar; config snapshots to
    `<path>.config.json` like the msgpack flavor.

    async_save=True schedules the array write on Orbax's background thread
    and returns as soon as the host copy is snapshotted — the training loop
    keeps dispatching while bytes hit disk. The directory is complete only
    after `wait_for_async_saves()`; Orbax writes a commit marker, so a
    half-written directory is detected (and refused) at restore."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if async_save:
        _async_checkpointer().save(path, args=ocp.args.StandardSave(
            _array_tree(state)), force=True)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, _array_tree(state), force=True)
    sidecar = {"extra": extra or {}}
    if scaler is not None:
        sidecar["scaler"] = {"center": np.asarray(scaler.center).tolist(),
                             "scale": np.asarray(scaler.scale).tolist()}
    with open(path + ".extra.json", "w") as f:
        json.dump(sidecar, f)
    if cfg is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    return path


def restore_orbax(
    path: str, template_state: TrainState
) -> Tuple[TrainState, Optional[RobustScalerState], dict]:
    """Restore an Orbax checkpoint written by save_orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path, _array_tree(template_state))
    state = serialization.from_state_dict(template_state, tree)
    scaler, extra = None, {}
    sidecar_path = path + ".extra.json"
    if os.path.exists(sidecar_path):
        with open(sidecar_path) as f:
            sidecar = json.load(f)
        extra = sidecar.get("extra", {})
        if "scaler" in sidecar:
            scaler = RobustScalerState(
                center=np.asarray(sidecar["scaler"]["center"]),
                scale=np.asarray(sidecar["scaler"]["scale"]),
            )
    return state, scaler, extra
