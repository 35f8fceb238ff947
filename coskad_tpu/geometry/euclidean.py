"""Euclidean latent-space distances: MSE-to-center and Mahalanobis.

Reference behaviours reproduced:
- per-window MSE distance = mean over latent dims of (z - c)^2
  (reference utils/eval_utils.py:57-64),
- Mahalanobis distance sqrt((z-c)^T VI (z-c)) with VI the inverse covariance
  of the latents (reference utils/eval_utils.py:28-54,
  models/euclidean_encoder_staticCenter.py:40-46,133-142),
- cosine distance 1 - cos(z, c) used by the spherical VAE
  (reference eval_COSKAD.py:81, models/spherical_vae.py:165).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_to_center(z: jax.Array, c: jax.Array) -> jax.Array:
    """Per-sample mean squared distance to the center. [B, D] -> [B]."""
    return jnp.mean((z - c) ** 2, axis=-1)


def cosine_distance_to_center(z: jax.Array, c: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-sample 1 - cosine similarity to the center. [B, D] -> [B].

    Matches torch.nn.functional.cosine_similarity's eps clamping semantics:
    each vector's norm is clamped from below by eps before the division.
    """
    zn = jnp.maximum(jnp.linalg.norm(z, axis=-1), eps)
    cn = jnp.maximum(jnp.linalg.norm(c, axis=-1), eps)
    cos = jnp.sum(z * c, axis=-1) / (zn * cn)
    return 1.0 - cos


def mahalanobis(z: jax.Array, c: jax.Array, inv_cov: jax.Array) -> jax.Array:
    """Per-sample Mahalanobis distance sqrt((z-c)^T VI (z-c)). [B, D] -> [B]."""
    d = z - c
    return jnp.sqrt(jnp.maximum(jnp.einsum("bi,ij,bj->b", d, inv_cov, d), 0.0))


def covariance_stats(z: jax.Array, mu: jax.Array):
    """Per-shard sufficient statistics for the latent covariance.

    Returns (sum of outer products [D, D], sample count). Additive across
    shards; psum them for the exact global covariance, then invert once.
    The reference accumulates the same outer-product sum per batch
    (models/euclidean_encoder_staticCenter.py:40-46,133-142).
    """
    d = z - mu
    return jnp.einsum("bi,bj->ij", d, d), jnp.asarray(z.shape[0], z.dtype)


def inv_cov_from_stats(outer_sum: jax.Array, n: jax.Array) -> jax.Array:
    """Inverse of the unbiased covariance estimate (divisor n - 1)."""
    cov = outer_sum / (n - 1.0)
    return jnp.linalg.inv(cov)
