"""Per-window anomaly scores for reconstruction-based eval modes.

The autoencoder eval (reference eval_COSKAD.py:62-73,187-189 +
utils/eval_utils.py:77-106) supports three scorings selected by
rec_loss_weight: 'hyp' (weight == 0: latent distance to center only, the
shipped default), 'rec' (weight > 100: reconstruction MSE only) and
'rec+hyp' (both; the rec term divided by the weight). Also ports
`extract_single_pose` (utils/eval_utils.py:131-166), the multi-detection
pose-matrix consolidation helper used in analysis notebooks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mode_from_rec_weight(rec_loss_weight: float) -> str:
    """Reference's selection rule (eval_COSKAD.py:66-73)."""
    if rec_loss_weight == 0:
        return "hyp"
    if rec_loss_weight > 100:
        return "rec"
    return "rec+hyp"


def reconstruction_window_scores(
    x: jax.Array,
    recon: jax.Array,
    z: jax.Array,
    center: jax.Array,
    rec_loss_weight: float = 0.0,
) -> jax.Array:
    """[B, C, T, V] input/recon + [B, D] latents -> [B] window scores in the
    selected mode. Matches windows_based_loss_rec_and_hy: the rec term is the
    MSE over all elements, the hyp term the MSE over latent dims; in
    'rec+hyp' the rec term is divided by rec_loss_weight."""
    mode = mode_from_rec_weight(rec_loss_weight)
    hyp = jnp.mean((z - center) ** 2, axis=-1)
    if mode == "hyp":
        return hyp
    rec = jnp.mean((recon - x) ** 2, axis=(1, 2, 3))
    if mode == "rec":
        return rec
    return rec / rec_loss_weight + hyp


def extract_single_pose(
    pose_matrix: np.ndarray,
    method: str = "median",
    return_std: bool = False,
    std_method: str = "mean",
    std_lift: float = 1e-7,
) -> Tuple[np.ndarray, np.ndarray]:
    """Consolidate a [num_detections, n_frames, D] pose matrix into a single
    [n_frames, D] pose by unique/mean/median over the non-zero detections at
    each frame; optionally a min-max-scaled per-frame disagreement score."""
    n_det, n_frames, d = pose_matrix.shape
    single = np.zeros((n_frames, d))
    std_vec = np.zeros(n_frames)
    nonzero_frames = sorted(set(np.nonzero(pose_matrix)[1]))
    for idx in nonzero_frames:
        col = pose_matrix[:, idx, :]
        used = np.stack([row for row in col if np.sum(row) != 0], 0)
        if method == "unique":
            single[idx] = used[0]
        elif method == "mean":
            single[idx] = np.mean(used, 0)
        elif method == "median":
            single[idx] = np.median(used, 0)
        else:
            raise ValueError(f"Unknown method {method!r}")
        if return_std:
            per_dim_std = np.std(used, 0)
            std_vec[idx] = (
                np.mean(per_dim_std) if std_method == "mean" else np.median(per_dim_std)
            )
    if return_std:
        s = std_vec + std_lift
        lo, hi = s.min(), s.max()
        s = (s - lo) / (hi - lo) if hi > lo else np.zeros_like(s)
        return single, s
    return single, np.array([])


def calculate_loss(x: np.ndarray, target: np.ndarray, to_pow: bool = False) -> np.ndarray:
    """Per-row MSE, optionally raised to the 4th power (reference
    utils/eval_utils.py:174-188's sharpening option)."""
    loss = np.mean((np.asarray(target, np.float64) - np.asarray(x, np.float64)) ** 2,
                   axis=-1)
    return loss**4 if to_pow else loss


def compute_fig_matrix(pos: np.ndarray, frames_pos: np.ndarray,
                       n_frames: int) -> np.ndarray:
    """Scatter per-window poses into a [num_windows, n_frames, joints*dim]
    matrix at their (1-based) frame positions (reference
    utils/eval_utils.py:14-25; used for reconstruction visualization)."""
    assert pos.ndim == 4
    w, dim, timesteps, joints = pos.shape
    flat = pos.transpose(0, 2, 3, 1).reshape(w, timesteps, joints * dim)
    pose = np.zeros((w, n_frames, joints * dim))
    for n in range(w):
        pose[n, frames_pos[n] - 1, :] = flat[n]
    return pose
