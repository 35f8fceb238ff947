"""Hyperbolic neural-network layers (flax).

Equivalents of the reference's local hyperbolic layers
(utils/hyperbolic.py:119-260): MobiusLinear (Mobius matvec + Mobius bias on
the ball) and MobiusDist2Hyperplane (signed distances to learned hyperplanes
scaled by exp(scale)). The reference forces float64 for these; TPUs run
float32, which the clamped artanh/projection in geometry.poincare keeps
stable — validated against closed-form identities in tests.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import poincare as pm


class MobiusLinear(nn.Module):
    """Hyperbolic linear layer: y = proj((W (x) x) (+) exp0(b)).

    Weight init: small normal std = 1 / sqrt(2 * out * in) / 100 (HNN++-style,
    reference utils/hyperbolic.py:186-192); bias initialized as a near-origin
    ball point exp0(normal / 400).
    """

    features: int
    k: float = -1.0
    use_bias: bool = True
    hyperbolic_input: bool = True
    nonlin: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        std = 1.0 / (2.0 * self.features * in_features) ** 0.5 / 100.0
        w = self.param(
            "kernel",
            lambda key, shape: std * jax.random.normal(key, shape),
            (self.features, in_features),
        )
        if self.hyperbolic_input:
            out = pm.mobius_matvec(w, x, self.k)
        else:
            out = pm.expmap0(jnp.einsum("...d,ed->...e", x, w), self.k)
        if self.use_bias:
            b = self.param(
                "bias",
                lambda key, shape: pm.expmap0(
                    jax.random.normal(key, shape) / 400.0, self.k
                ),
                (self.features,),
            )
            out = pm.mobius_add(out, jnp.broadcast_to(b, out.shape), self.k)
        if self.nonlin is not None:
            # Mobius function application: log0 -> f -> exp0
            out = pm.expmap0(self.nonlin(pm.logmap0(out, self.k)), self.k)
        return pm.project(out, self.k)


class MobiusDist2Hyperplane(nn.Module):
    """Distances to `features` learned Poincare hyperplanes, scaled by
    exp(scale) (reference utils/hyperbolic.py:223-252)."""

    features: int
    k: float = -1.0

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        point = self.param(
            "point",
            lambda key, shape: pm.project(
                pm.expmap0(jax.random.normal(key, shape) / 4.0, self.k), self.k
            ),
            (self.features, in_features),
        )
        tangent = self.param(
            "tangent",
            lambda key, shape: jax.random.normal(key, shape),
            (self.features, in_features),
        )
        tangent = tangent / jnp.linalg.norm(tangent, axis=-1, keepdims=True)
        scale = self.param("scale", nn.initializers.zeros, (self.features,))
        d = pm.dist2plane(x[..., None, :], point, tangent, self.k, signed=True)
        return d * jnp.exp(scale)
