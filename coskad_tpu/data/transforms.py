"""Geometric (affine) pose augmentations, applied on device.

The reference replicates the dataset K times on the host and applies one of
K affine 3x3 matrices per __getitem__ (utils/dataset.py:65-80,
utils/dataset_utils.py:255-310). TPU-first redesign: windows stay resident in
HBM once, and the transform becomes part of the jitted step — a gather of the
per-sample 3x3 matrix followed by one batched einsum over the xy channels.
The canonical 5-transform list (identity, flip, rot90, rot90+flip, rot45)
matches `ae_trans_list` (utils/dataset_utils.py:304-310).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def affine_matrix(
    sx: float = 1.0,
    sy: float = 1.0,
    tx: float = 0.0,
    ty: float = 0.0,
    rot_deg: float = 0.0,
    flip: bool = False,
) -> np.ndarray:
    """3x3 affine matrix: flip @ rot @ scale_translate (reference order,
    utils/dataset_utils.py:255-269)."""
    cos_r = math.cos(math.radians(rot_deg))
    sin_r = math.sin(math.radians(rot_deg))
    flip_mat = np.eye(3, dtype=np.float32)
    if flip:
        flip_mat[0, 0] = -1.0
    trans_scale = np.array(
        [[sx, 0, tx], [0, sy, ty], [0, 0, 1]], dtype=np.float32
    )
    rot = np.array(
        [[cos_r, -sin_r, 0], [sin_r, cos_r, 0], [0, 0, 1]], dtype=np.float32
    )
    return flip_mat @ (rot @ trans_scale)


def canonical_transforms(num_transform: int = 5) -> np.ndarray:
    """The reference's 5-transform table, first `num_transform` rows. [K,3,3]."""
    table = np.stack(
        [
            affine_matrix(),
            affine_matrix(flip=True),
            affine_matrix(rot_deg=90),
            affine_matrix(rot_deg=90, flip=True),
            affine_matrix(rot_deg=45),
        ]
    )
    return table[:num_transform]


def apply_transforms(pose: jax.Array, mats: jax.Array) -> jax.Array:
    """Apply a per-sample affine matrix to pose windows.

    Args:
        pose: [B, C, T, V] with C >= 2; channels 0,1 are x,y. Extra channels
            (confidence) pass through untouched — matching the reference's
            conf-isolation trick (utils/dataset_utils.py:272-286).
        mats: [B, 3, 3] affine matrices.

    Returns:
        [B, C, T, V] transformed windows.
    """
    x, y = pose[:, 0], pose[:, 1]  # [B, T, V]
    # [x', y'] = M[:2,:2] @ [x, y] + M[:2, 2], written as broadcast
    # multiplies: a per-sample batched 2x2 einsum lowers to B tiny matmuls
    # (measured ~0.9 ms/step at B=2048); six VPU broadcasts fuse into the
    # gather instead.
    def m(i, j):
        return mats[:, i, j][:, None, None]  # [B, 1, 1]

    out_xy = jnp.stack(
        [
            m(0, 0) * x + m(0, 1) * y + m(0, 2),
            m(1, 0) * x + m(1, 1) * y + m(1, 2),
        ],
        axis=1,
    )
    if pose.shape[1] > 2:
        return jnp.concatenate([out_xy, pose[:, 2:]], axis=1)
    return out_xy


def gather_batch(
    data: jax.Array,
    indices: jax.Array,
    trans_table: jax.Array,
    num_coords: int = 2,
    window_shape=None,
) -> jax.Array:
    """Device-side batch construction from HBM-resident windows.

    Logical index i in [0, K*N) maps to (sample i % N, transform i // N),
    exactly the reference's indexing (utils/dataset.py:65-80), but computed
    inside jit: gather the window, gather its 3x3 matrix, apply, slice to
    `num_coords` channels.

    Args:
        data: [N, C, T, V] resident window tensor, or FLAT [N, C*T*V] with
            `window_shape` = (C, T, V). The flat layout puts C*T*V (=648)
            on the lanes (~84% of the 128-lane tiles) instead of V=18
            (~14%), so the row gather reads ~6x less padding — the same
            effect as the TrajectoryStore flat layout (RESULTS.md round 3).
            Trainer._device_data uploads windows flat.
        indices: [B] logical indices.
        trans_table: [K, 3, 3].
        num_coords: channels to keep (reference keeps x, y).
    """
    n = data.shape[0]
    sample_idx = indices % n
    trans_idx = indices // n
    batch = jnp.take(data, sample_idx, axis=0)
    if window_shape is not None and batch.ndim == 2:
        batch = batch.reshape((batch.shape[0],) + tuple(window_shape))
    mats = jnp.take(trans_table, trans_idx, axis=0)
    if num_coords == 2 and batch.shape[1] > 2:
        # xy-only: the affine never reads the confidence channel, so slice
        # before the transform and skip the concat+slice round-trip.
        return apply_transforms(batch[:, :2], mats)
    return apply_transforms(batch, mats)[:, :num_coords]
