"""Training state: one explicit pytree instead of Lightning-module attributes.

The reference scatters training state across nn buffers (`c`,
`inv_cov_matrix`, `mean_vector` — models/sts/ae.py:69-73, vae.py:57-60),
Lightning-module python attributes (`self.temp`, `self.cumt`,
`self.n_samples`, `self.hidden_out_cache`) and the optimizer. Here it is a
single flax.struct pytree that flows through a jitted train_step, so the
whole step — forward, loss, grads, optimizer, center accumulators — is one
compiled XLA program.

Epoch accumulators are shard-additive sufficient statistics:
- acc_vec / acc_weight: sum of latents + count (Euclidean dynamic center,
  VAE mean_vector) or Lorenz-weighted Klein sum + weight (hyperbolic
  Einstein midpoint, geometry/poincare.py streaming stats),
- acc_outer: sum of (z-c)(z-c)^T outer products (Mahalanobis covariance).
Under jit with a batch-sharded input these sums have global semantics, so
centers are exact across data shards (the reference's DDP computes per-rank
centers; SURVEY.md section 2.8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    # Geometry state
    center: jax.Array  # [D]
    inv_cov: jax.Array  # [D, D] (mahalanobis; identity otherwise)
    mean_vector: jax.Array  # [D] (VAE empirical latent mean)

    # Epoch accumulators (reset at epoch boundaries)
    acc_vec: jax.Array  # [D]
    acc_weight: jax.Array  # []
    acc_outer: jax.Array  # [D, D]

    def reset_accumulators(self) -> "TrainState":
        return self.replace(
            acc_vec=jnp.zeros_like(self.acc_vec),
            acc_weight=jnp.zeros_like(self.acc_weight),
            acc_outer=jnp.zeros_like(self.acc_outer),
        )


def init_state(params, batch_stats, opt_state, latent_dim: int, rng) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=rng,
        center=jnp.zeros((latent_dim,), jnp.float32),
        inv_cov=jnp.eye(latent_dim, dtype=jnp.float32),
        mean_vector=jnp.zeros((latent_dim,), jnp.float32),
        acc_vec=jnp.zeros((latent_dim,), jnp.float32),
        acc_weight=jnp.zeros((), jnp.float32),
        acc_outer=jnp.zeros((latent_dim, latent_dim), jnp.float32),
    )


def clamp_center(c: jax.Array, eps: float) -> jax.Array:
    """Push near-zero center coordinates to +-eps so the trivial solution
    z == 0 is excluded (reference euclidean_encoder_staticCenter.py:120-122).
    Exact zeros stay zero, like the reference."""
    small_neg = (jnp.abs(c) < eps) & (c < 0)
    small_pos = (jnp.abs(c) < eps) & (c > 0)
    return jnp.where(small_neg, -eps, jnp.where(small_pos, eps, c))
