"""PowerSpherical and hyperspherical-uniform distributions in JAX.

TPU-native reimplementation of the `power_spherical` package the reference's
spherical VAE depends on (reference models/sts/vae.py:7,109-113: PowerSpherical
posterior, HypersphericalUniform prior, KL between them). The PowerSpherical
distribution (De Cao & Aziz, 2020) has density

    p(x; mu, kappa) ~ (1 + mu^T x)^kappa   on S^{d-1},

is rotation-symmetric around `mu` and fully reparameterizable: sampling uses a
Beta draw (differentiable in JAX via implicit reparameterization of the
underlying Gamma sampler) plus a Householder reflection, so gradients flow to
both `loc` and `scale` — the property the reference's VAE training relies on
(rsample at models/sts/vae.py:129).

Also provides diagonal-Normal KL for the `distribution='normal'` variant
(reference models/sts/vae.py:106-108, models/spherical_vae.py:90).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln


def _log_surface_area(sphere_dim: int) -> float:
    """Log surface area of S^{sphere_dim} embedded in R^{sphere_dim + 1}."""
    d = sphere_dim + 1  # ambient dimension
    return math.log(2.0) + (d / 2.0) * math.log(math.pi) - math.lgamma(d / 2.0)


class HypersphericalUniform(NamedTuple):
    """Uniform distribution on S^{dim} (dim = ambient dimension - 1)."""

    dim: int

    def entropy(self) -> jax.Array:
        return jnp.asarray(_log_surface_area(self.dim), jnp.float32)

    def sample(self, key: jax.Array, shape=()) -> jax.Array:
        v = jax.random.normal(key, (*shape, self.dim + 1))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class PowerSpherical(NamedTuple):
    """PowerSpherical(loc, scale) on the unit sphere.

    loc: [..., D] unit vectors, scale (concentration kappa): [...].
    """

    loc: jax.Array
    scale: jax.Array

    @property
    def dim(self) -> int:
        return self.loc.shape[-1]

    def _alpha_beta(self):
        d = self.dim
        beta = (d - 1.0) / 2.0
        alpha = beta + self.scale
        return alpha, beta

    def log_normalizer(self) -> jax.Array:
        alpha, beta = self._alpha_beta()
        return -(
            (alpha + beta) * math.log(2.0)
            + gammaln(alpha)
            - gammaln(alpha + beta)
            + beta * math.log(math.pi)
        )

    def log_prob(self, x: jax.Array) -> jax.Array:
        return self.log_normalizer() + self.scale * jnp.log1p(
            jnp.sum(self.loc * x, axis=-1)
        )

    def entropy(self) -> jax.Array:
        alpha, beta = self._alpha_beta()
        return -(
            self.log_normalizer()
            + self.scale * (math.log(2.0) + digamma(alpha) - digamma(alpha + beta))
        )

    def rsample(self, key: jax.Array) -> jax.Array:
        """Reparameterized sample; gradients flow to loc and scale."""
        d = self.dim
        alpha, beta = self._alpha_beta()
        key_z, key_v = jax.random.split(key)
        z = jax.random.beta(key_z, alpha, beta)  # [...]
        t = 2.0 * z - 1.0  # marginal of mu^T x
        v = jax.random.normal(key_v, (*self.loc.shape[:-1], d - 1))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        y = jnp.concatenate(
            [t[..., None], jnp.sqrt(jnp.maximum(1.0 - t[..., None] ** 2, 0.0)) * v],
            axis=-1,
        )
        # Householder reflection mapping e1 onto loc.
        e1 = jnp.zeros_like(self.loc).at[..., 0].set(1.0)
        u = e1 - self.loc
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
        return y - 2.0 * u * jnp.sum(u * y, axis=-1, keepdims=True)

    def sample_from_draws(self, z01: jax.Array, v_raw: jax.Array) -> jax.Array:
        """Deterministic sample from pre-drawn noise: z01 [...] in (0, 1)
        (the Beta draw) and v_raw [..., D-1] (tangent noise). The lockstep
        parity hook (tests/test_lockstep_parity.py): identical draws fed to
        this and to the torch mirror produce identical samples, so the 'ps'
        VAE trains in lockstep across frameworks. Gradients flow to `loc`
        through the Householder map; the implicit-reparameterization term
        through the Beta is absent (draws are constants) — identically so
        on both sides, which is what the parity test requires."""
        t = (2.0 * z01 - 1.0)[..., None]
        v = v_raw / jnp.linalg.norm(v_raw, axis=-1, keepdims=True)
        y = jnp.concatenate(
            [t, jnp.sqrt(jnp.maximum(1.0 - t**2, 0.0)) * v], axis=-1
        )
        e1 = jnp.zeros_like(self.loc).at[..., 0].set(1.0)
        u = e1 - self.loc
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
        return y - 2.0 * u * jnp.sum(u * y, axis=-1, keepdims=True)

    def kl_to_uniform(self) -> jax.Array:
        """KL(PowerSpherical || HypersphericalUniform on S^{D-1})."""
        return -self.entropy() + _log_surface_area(self.dim - 1)


def normal_kl_standard(mean: jax.Array, std: jax.Array) -> jax.Array:
    """KL(N(mean, std^2) || N(0, 1)) elementwise; [..., D] -> [..., D].

    The reference builds torch Normal(Z_mean, Z_var) where Z_var is used as
    the *scale* (std), then sums KL over the last dim (spherical_vae.py:90).
    """
    var = std**2
    return 0.5 * (var + mean**2 - 1.0) - jnp.log(std)
