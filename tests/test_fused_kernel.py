"""Fused Pallas STSE forward: parity with the flax eval path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.kernels import fold_stse_params, fused_stse_forward
from coskad_tpu.models import STSE


def _trained_like_variables(model, x, seed=0):
    """Init + randomize batch stats so BN folding is non-trivial."""
    variables = model.init(jax.random.PRNGKey(seed), x)
    rng = np.random.default_rng(seed)

    def jitter(path, v):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        arr = np.asarray(v)
        if name == "mean":
            return jnp.asarray(rng.uniform(-0.5, 0.5, arr.shape), jnp.float32)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, arr.shape), jnp.float32)
        return v

    stats = jax.tree_util.tree_map_with_path(jitter, variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("batch,block", [(64, 32), (50, 32)])  # incl. padding
def test_fused_matches_flax(batch, block):
    model = STSE(
        input_dim=2, layer_channels=(32, 16, 32), hidden_dimension=64,
        latent_dim=16, n_frames=12, n_joints=17, projector="linear",
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(batch, 2, 12, 17)), jnp.float32
    )
    variables = _trained_like_variables(model, x[:2])
    ref = model.apply(variables, x)

    folded = fold_stse_params(variables["params"], variables["batch_stats"])
    z = fused_stse_forward(x, folded, block_b=block, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_identity_residual_layer():
    """Channel-preserving layers use an identity residual (no residual dense)."""
    model = STSE(
        input_dim=8, layer_channels=(8,), hidden_dimension=8, latent_dim=4,
        n_frames=6, n_joints=5, projector="linear",
    )
    x = jnp.asarray(np.random.default_rng(2).normal(size=(16, 8, 6, 5)), jnp.float32)
    variables = _trained_like_variables(model, x[:2], seed=3)
    ref = model.apply(variables, x)
    folded = fold_stse_params(variables["params"], variables["batch_stats"])
    z = fused_stse_forward(x, folded, block_b=16, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), rtol=2e-4, atol=2e-5)
