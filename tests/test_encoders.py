"""Alternative encoder backbones: shapes, graph construction parity with the
reference (where its code is runnable), and training smoke."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.models import STSE
from coskad_tpu.models.graph import (
    build_partitioned_adjacency,
    build_spacetime_adjacency,
    hop_distance,
)

REFERENCE = "/root/reference"


@pytest.mark.parametrize(
    "encoder_type", ["sts_gcn", "st_gcn", "learnable_gcn", "static_gcn", "cnn"]
)
def test_encoder_types_forward(encoder_type):
    model = STSE(
        input_dim=2, layer_channels=(8, 4), hidden_dimension=8, latent_dim=4,
        n_frames=6, n_joints=17, encoder_type=encoder_type,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, 2, 6, 17)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    z = model.apply(variables, x)
    assert z.shape == (3, 4)
    assert np.isfinite(np.asarray(z)).all()
    # train mode works too (BN batch stats where present)
    out, _ = model.apply(x=x, train=True, mutable=["batch_stats"],
                         variables=variables)
    assert out.shape == (3, 4)


def test_unknown_encoder_rejected():
    model = STSE(encoder_type="transformer", n_joints=17)
    with pytest.raises(ValueError, match="not supported"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 12, 17)))


def test_decoder_requires_sts_gcn():
    from coskad_tpu.models import STSAE

    model = STSAE(encoder_type="learnable_gcn", n_joints=17)
    with pytest.raises(ValueError, match="No decoder"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 12, 17)))


# ------------------------------------------------------------ graph


def test_hop_distance_openpose():
    from coskad_tpu.models.graph import LAYOUTS

    n, links, _ = LAYOUTS["openpose"]
    edges = [(i, i) for i in range(n)] + links
    d = hop_distance(n, edges, max_hop=1)
    assert d[0, 0] == 0
    assert d[0, 1] == 1
    assert np.isinf(d[3, 16])  # nose-side joint to ankle: > 1 hop
    np.testing.assert_allclose(d, d.T)


@pytest.mark.parametrize(
    "strategy,expected_k", [("uniform", 1), ("distance", 2), ("spatial", 3)]
)
def test_partition_shapes(strategy, expected_k):
    a = build_partitioned_adjacency("openpose", strategy)
    assert a.shape == (expected_k, 17, 17)
    # partitions sum back to the normalized adjacency
    full = build_partitioned_adjacency("openpose", "uniform")[0]
    np.testing.assert_allclose(a.sum(0), full, atol=1e-12)


def test_ntu_layout():
    a = build_partitioned_adjacency("ntu-rgb+d", "spatial")
    assert a.shape == (3, 25, 25)


def test_spacetime_adjacency_matches_reference():
    """The static space-time adjacency equals the reference encoder's
    buffer (alternative_components.py:207-230)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if not hasattr(np, "int"):
        np.int = int
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.common.alternative_components import EncoderStaticPlainGCN

    ref = EncoderStaticPlainGCN(
        input_dim=2, layer_channels=[8], hidden_dimension=8,
        n_frames=6, n_joints=17, dropout=0.0,
    )
    ours = build_spacetime_adjacency(6, 17)
    np.testing.assert_allclose(ours, ref.Adj.numpy(), rtol=1e-6, atol=1e-7)


def test_plain_gcn_matches_reference_forward():
    """Weight-transplant parity for the static plain GCN encoder."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if not hasattr(np, "int"):
        np.int = int
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch
    from models.common.alternative_components import EncoderStaticPlainGCN

    torch.manual_seed(0)
    ref = EncoderStaticPlainGCN(
        input_dim=2, layer_channels=[8], hidden_dimension=8,
        n_frames=6, n_joints=17, dropout=0.0,
    )
    model = STSE(
        input_dim=2, layer_channels=(8,), hidden_dimension=8, latent_dim=4,
        n_frames=6, n_joints=17, encoder_type="static_gcn",
    )
    x_np = np.random.default_rng(3).normal(size=(4, 2, 6, 17)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    params = jax.tree_util.tree_map(np.array, variables["params"])
    for i, layer in enumerate(ref.gcns):
        params["encoder"][f"layer_{i}"]["weight"] = layer.gcn.weight.detach().numpy()
        params["encoder"][f"layer_{i}"]["bias"] = layer.gcn.bias.detach().numpy()

    # Compare encoder outputs (bypass the projector).
    def encode(variables, x):
        return model.apply(variables, x, method=lambda m, x: m.encode(x)[1])

    h = encode({**variables, "params": params}, jnp.asarray(x_np))
    ours = np.transpose(np.asarray(h), (0, 3, 1, 2))
    with torch.no_grad():
        ref_h = ref(torch.tensor(x_np)).numpy()
    np.testing.assert_allclose(ours, ref_h, rtol=1e-4, atol=1e-6)
