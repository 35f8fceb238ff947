"""Self-contained serialized scoring artifacts (jax.export / StableHLO).

`export_scorer` captures a trained model's complete window-scoring program
— eval-mode forward, variant geometry distance, per-window reconstruction
error — with parameters, BatchNorm statistics and geometry state (center,
inv_cov, mean_vector) baked in as constants, and serializes it with
`jax.export`. The artifact is one zip file that `load_artifact` runs with
NO model code: deployment needs jax plus this loader, nothing from
models/ or train/. The loader reproduces `AnomalyScorer.score_windows`'s
batching and RNG schedule exactly, so exported scores match the library's
to compute-dtype reassociation tolerance (the live scorer executes
sharded over the session mesh, the artifact as one device program, and
XLA may re-associate reductions differently for the two layouts —
measured 3e-8 on fp32 tiny models, CPU mesh; 8e-6 on the bf16 smoke
model, real v5e), and a given artifact is deterministic bit-for-bit
across calls (tests/test_export_hlo.py).

The reference has no deployment format at all — its only inference path
is re-running eval_COSKAD.py end to end (reference eval_COSKAD.py:115).
This module is TPU-build serving infrastructure: by default the program
is lowered for BOTH 'cpu' and 'tpu', so a single artifact serves TPU
production and CPU CI/edge smoke tests.

Artifact layout (zip):
    scoring.jaxexport   jax.export serialized bytes
                        fn(windows f32[B, C_in, T, V], key u32[2])
                          -> (scores f32[B], rec_err f32[B])
    meta.json           variant/geometry/preprocessing metadata + the
                        serve chunking contract (see ExportedScorer)
    scaler.npz          fitted RobustScaler state, when the checkpoint
                        carries one (host-side preprocessing parity)
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from .data.transforms import apply_transforms
from .train import objectives

ARTIFACT_VERSION = 1
SCORING_MEMBER = "scoring.jaxexport"
META_MEMBER = "meta.json"
SCALER_MEMBER = "scaler.npz"


def scoring_fn(trainer, state):
    """Build the pure scoring program for one (Trainer, TrainState).

    Returns fn(windows [B, C_in, T, V] f32, key uint32[2]) ->
    (scores [B] f32, rec_err [B] f32) with all state captured as host
    constants (so the traced program carries no device/mesh placement).

    Semantics match Trainer._score_many_impl's scanned body for one chunk:
    identity affine + coord slice (data/transforms.py::gather_batch),
    eval-mode forward, variant distance (train/objectives.py::
    window_scores), decoder-variant reconstruction MSE. `key` is the
    chunk RNG (only the VAE's sampled latent consumes it).
    """
    cfg = trainer.cfg
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    center = np.asarray(jax.device_get(state.center))
    inv_cov = np.asarray(jax.device_get(state.inv_cov))
    mean_vector = np.asarray(jax.device_get(state.mean_vector))
    identity = np.asarray(jax.device_get(trainer.trans_table))[0]
    num_coords = cfg.model.num_coords

    def fn(windows: jax.Array, key: jax.Array):
        b = windows.shape[0]
        mats = jnp.broadcast_to(jnp.asarray(identity), (b, 3, 3))
        # Replicate gather_batch's transform+slice exactly (identity
        # matrix, so x' = 1*x + 0*y + 0 — bit-exact) for score parity
        # with AnomalyScorer.score_windows.
        if num_coords == 2 and windows.shape[1] > 2:
            batch = apply_transforms(windows[:, :2], mats)
        else:
            batch = apply_transforms(windows, mats)[:, :num_coords]
        out, _ = trainer._forward(
            params, batch_stats, batch, train=False, rng=key
        )
        z = objectives.latent_of(cfg.model.variant, out)
        scores = objectives.window_scores(
            cfg, z, jnp.asarray(center), jnp.asarray(inv_cov),
            jnp.asarray(mean_vector),
        )
        if cfg.model.use_decoder:
            rec = jnp.mean((out[1] - batch) ** 2, axis=(1, 2, 3))
        else:
            rec = jnp.zeros(scores.shape[:1], jnp.float32)
        return scores.astype(jnp.float32), rec.astype(jnp.float32)

    return fn


def export_scorer(
    scorer,
    out_path: str,
    batch_size: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
    in_channels: Optional[int] = None,
) -> dict:
    """Serialize an AnomalyScorer's scoring program to `out_path`.

    Args:
        scorer: serve.AnomalyScorer (checkpoint-loaded or live).
        out_path: artifact zip to write.
        batch_size: fixed leading dimension; None exports a symbolic batch
            ("b"), one program for every request size.
        platforms: lowering targets; the default covers TPU production and
            CPU CI with one artifact.
        in_channels: input channel count; defaults to the training window
            layout (num_coords + 1: x, y, confidence) unless the train set
            carries a different one.

    Returns the artifact's metadata dict.
    """
    trainer, state = scorer.trainer, scorer.state
    cfg = trainer.cfg
    if in_channels is None:
        data = getattr(trainer.train_ds, "data", None)
        in_channels = (
            int(data.shape[1]) if data is not None and data.ndim == 4
            else cfg.model.num_coords + 1
        )
    t, v = cfg.data.seg_len, cfg.data.n_joints
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    win_spec = jax.ShapeDtypeStruct((b, in_channels, t, v), jnp.float32)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)

    fn = scoring_fn(trainer, state)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(
        win_spec, key_spec
    )
    blob = exported.serialize()

    # The RNG schedule score_windows uses: chunk i of a request is scored
    # with fold_in(fold_in(base_key, 7), i) (train/loop.py::score_all).
    base_key = np.asarray(jax.device_get(state.rng), np.uint32)
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "variant": cfg.model.variant,
        "distance": cfg.model.distance,
        "use_decoder": bool(cfg.model.use_decoder),
        "use_vae": bool(cfg.model.use_vae),
        "vae_sample": bool(getattr(trainer, "vae_sample", True)),
        "num_coords": cfg.model.num_coords,
        "in_channels": int(in_channels),
        "seg_len": int(t),
        "n_joints": int(v),
        "batch_size": None if batch_size is None else int(batch_size),
        # serve-parity chunking contract (AnomalyScorer.score_windows):
        "serve_batch_size": int(cfg.data.batch_size),
        "base_key": [int(x) for x in base_key.ravel()[:2]],
        # host-side preprocessing recipe (serve.preprocess_windows):
        "preprocess": {
            "kp18_format": bool(cfg.data.kp18_format),
            "headless": bool(cfg.data.headless),
            "normalize_pose": bool(cfg.data.normalize_pose),
            "normalization_strategy": cfg.data.normalization_strategy,
            "vid_res": list(cfg.data.vid_res),
            "symm_range": bool(cfg.data.symm_range),
            "sub_mean": bool(cfg.data.sub_mean),
            "kp_threshold": float(cfg.data.kp_threshold),
        },
    }

    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(SCORING_MEMBER, blob)
        zf.writestr(META_MEMBER, json.dumps(meta, indent=1))
        scaler = getattr(scorer, "scaler", None)
        if scaler is not None:
            buf = io.BytesIO()
            np.savez(
                buf,
                center=np.asarray(scaler.center),
                scale=np.asarray(scaler.scale),
            )
            zf.writestr(SCALER_MEMBER, buf.getvalue())
    return meta


class ExportedScorer:
    """Run a serialized scoring artifact — no model code required.

    `score_windows` reproduces AnomalyScorer.score_windows's contract —
    zero-pad the request to a whole number of `serve_batch_size` chunks,
    score chunk i with key fold_in(fold_in(base_key, 7), i), concatenate,
    truncate — so scores match the live scorer to float32 reassociation
    tolerance. `__call__` is the raw program (one chunk, explicit key).
    """

    def __init__(self, exported, meta: dict, scaler_arrays=None):
        self.exported = exported
        self.meta = meta
        self.scaler_arrays = scaler_arrays
        self._call = jax.jit(exported.call)

    def __call__(self, windows, key) -> Tuple[np.ndarray, np.ndarray]:
        scores, rec = self._call(
            jnp.asarray(windows, jnp.float32), jnp.asarray(key, jnp.uint32)
        )
        return np.asarray(scores), np.asarray(rec)

    def _chunk_size(self, n: int) -> int:
        fixed = self.meta.get("batch_size")
        if fixed is not None:
            return int(fixed)
        return int(self.meta["serve_batch_size"])

    def score_windows(
        self, windows: np.ndarray, base_key=None, return_rec: bool = False
    ):
        """[N, C_in, T, V] -> [N] scores ([, [N] rec errors])."""
        windows = np.asarray(windows, np.float32)
        n = len(windows)
        bs = self._chunk_size(n)
        bucket = max(bs * ((n + bs - 1) // bs), bs)
        padded = np.zeros((bucket, *windows.shape[1:]), np.float32)
        padded[:n] = windows
        if base_key is None:
            base_key = np.asarray(self.meta["base_key"], np.uint32)
        rng = jax.random.fold_in(jnp.asarray(base_key, jnp.uint32), 7)
        scores, recs = [], []
        for i in range(bucket // bs):
            s, r = self(padded[i * bs : (i + 1) * bs],
                        jax.random.fold_in(rng, i))
            scores.append(s)
            recs.append(r)
        scores = np.concatenate(scores)[:n]
        recs = np.concatenate(recs)[:n]
        return (scores, recs) if return_rec else scores


def load_artifact(path: str) -> ExportedScorer:
    """Load an artifact written by export_scorer."""
    with zipfile.ZipFile(path) as zf:
        blob = zf.read(SCORING_MEMBER)
        meta = json.loads(zf.read(META_MEMBER))
        scaler_arrays = None
        if SCALER_MEMBER in zf.namelist():
            with np.load(io.BytesIO(zf.read(SCALER_MEMBER))) as npz:
                scaler_arrays = {k: npz[k] for k in npz.files}
    if meta.get("artifact_version", 0) > ARTIFACT_VERSION:
        raise ValueError(
            f"artifact {path!r} has version {meta['artifact_version']}, "
            f"this loader supports <= {ARTIFACT_VERSION}"
        )
    exported = jexport.deserialize(blob)
    return ExportedScorer(exported, meta, scaler_arrays)
