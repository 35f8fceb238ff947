"""Jit-friendly stochastic skeleton augmentations (device-side).

The reference's contrastive path (`double_item`, utils/dataset.py:97-121)
builds a second, strongly-augmented view of each window on the host with
utils/tools.py ops. These are their in-jit equivalents over batched
[B, C, T, V] windows with per-sample randomness from a single PRNG key —
the whole two-view contrastive step compiles into the training program.

Faithful ports (same math as data/augment.py, vectorized):
reflection-padded temporal crop, the pseudo-3D rotation trick (xy cycled to
3 channels, two axis rotations, xy kept), Gaussian noise, temporal Gaussian
blur with per-sample sigma (reference's UNnormalized kernel), coordinate-
axis masking, time flip.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def random_temporal_crop(pose: jax.Array, key: jax.Array,
                         padding_ratio: int = 6) -> jax.Array:
    """Per-sample random crop of the reflection-padded sequence."""
    b, c, t, v = pose.shape
    pad = t // padding_ratio
    starts = jax.random.randint(key, (b,), 0, 2 * pad + 1)
    padded = jnp.concatenate(
        [pose[:, :, :pad][:, :, ::-1], pose, pose[:, :, -pad:][:, :, ::-1]],
        axis=2,
    )
    idx = starts[:, None] + jnp.arange(t)[None, :]
    return jnp.take_along_axis(padded, idx[:, None, :, None], axis=2)


def _rot_matrix(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Batched 3x3 rotation about axis 0 (x) or 1 (y). [B] -> [B, 3, 3]."""
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    rx = jnp.stack([
        jnp.stack([ones, zeros, zeros], -1),
        jnp.stack([zeros, ca, sa], -1),
        jnp.stack([zeros, -sa, ca], -1),
    ], -2)
    ry = jnp.stack([
        jnp.stack([ca, zeros, -sa], -1),
        jnp.stack([zeros, ones, zeros], -1),
        jnp.stack([sa, zeros, ca], -1),
    ], -2)
    return jnp.where((axis == 0)[:, None, None], rx, ry)


def random_rotate(pose: jax.Array, key: jax.Array) -> jax.Array:
    """The reference's pseudo-3D rotation (utils/tools.py:98-138): xy cycled
    to 3 channels, rotated about axes 0 then 1 (up to 30 deg about a random
    'main' axis, up to 1 deg about the other), keeping xy after each."""
    b, c, t, v = pose.shape
    k_main, k0, k1 = jax.random.split(key, 3)
    main_axis = jax.random.randint(k_main, (b,), 0, 3)
    seq = jnp.transpose(pose[:, :2], (0, 2, 3, 1))  # [B, T, V, 2]
    for axis, k in ((0, k0), (1, k1)):
        big = jax.random.uniform(k, (b,), minval=0.0, maxval=30.0)
        small = jax.random.uniform(jax.random.fold_in(k, 1), (b,), minval=0.0,
                                   maxval=1.0)
        deg = jnp.where(main_axis == axis, big, small)
        rot = _rot_matrix(jnp.full((b,), axis), jnp.deg2rad(deg))
        rot = jnp.swapaxes(rot, -1, -2)  # reference multiplies by R.T
        seq3 = jnp.concatenate([seq, seq], axis=-1)[..., :3]
        seq = jnp.einsum("btvk,bkj->btvj", seq3, rot)[..., :2]
    out = jnp.transpose(seq, (0, 3, 1, 2))
    if c > 2:
        out = jnp.concatenate([out, pose[:, 2:]], axis=1)
    return out


def gaussian_noise(pose: jax.Array, key: jax.Array, std: float = 0.01,
                   p: float = 0.5) -> jax.Array:
    k_apply, k_noise = jax.random.split(key)
    apply = jax.random.uniform(k_apply, (pose.shape[0],)) < p
    noise = std * jax.random.normal(k_noise, pose.shape)
    return jnp.where(apply[:, None, None, None], pose + noise, pose)


def temporal_gaussian_blur(pose: jax.Array, key: jax.Array, kernel: int = 15,
                           sigma_range: Tuple[float, float] = (0.1, 2.0),
                           p: float = 0.5) -> jax.Array:
    """Per-sample random-sigma blur along T with the reference's
    unnormalized kernel and zero padding (utils/tools.py:156-182)."""
    b, c, t, v = pose.shape
    radius = kernel // 2
    k_apply, k_sigma = jax.random.split(key)
    apply = jax.random.uniform(k_apply, (b,)) < p
    sigma = jax.random.uniform(k_sigma, (b,), minval=sigma_range[0],
                               maxval=sigma_range[1])
    taps = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    weights = jnp.exp(-(taps[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))  # [B, K]
    padded = jnp.pad(pose, ((0, 0), (0, 0), (radius, radius), (0, 0)))
    # sliding windows over T: [K, B, C, T, V]
    slides = jnp.stack([padded[:, :, i : i + t] for i in range(kernel)], axis=0)
    blurred = jnp.einsum("bk,kbctv->bctv", weights, slides)
    return jnp.where(apply[:, None, None, None], blurred, pose)


def axis_mask(pose: jax.Array, key: jax.Array, p: float = 0.5) -> jax.Array:
    """Zero out x or y (random per sample) with probability p."""
    k_apply, k_axis = jax.random.split(key)
    apply = jax.random.uniform(k_apply, (pose.shape[0],)) < p
    axis = jax.random.randint(k_axis, (pose.shape[0],), 0, 2)
    ch = jnp.arange(pose.shape[1])
    mask = (ch[None, :] == axis[:, None]) & apply[:, None]  # [B, C]
    return jnp.where(mask[:, :, None, None], 0.0, pose)


def random_time_flip(pose: jax.Array, key: jax.Array, p: float = 0.5) -> jax.Array:
    apply = jax.random.uniform(key, (pose.shape[0],)) < p
    return jnp.where(apply[:, None, None, None], pose[:, :, ::-1], pose)


def weak_augment(pose: jax.Array, key: jax.Array,
                 padding_ratio: int = 6) -> jax.Array:
    """The reference's `_old_aug`: temporal crop only."""
    return random_temporal_crop(pose, key, padding_ratio)


def strong_augment(pose: jax.Array, key: jax.Array,
                   padding_ratio: int = 6) -> jax.Array:
    """The reference's `_old_strong_aug` chain, fully in-jit."""
    keys = jax.random.split(key, 6)
    out = random_temporal_crop(pose, keys[0], padding_ratio)
    out = random_rotate(out, keys[1])
    out = gaussian_noise(out, keys[2])
    out = temporal_gaussian_blur(out, keys[3])
    out = axis_mask(out, keys[4])
    out = random_time_flip(out, keys[5])
    return out
