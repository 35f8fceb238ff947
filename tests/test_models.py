"""Model core: shape/semantics tests + golden weight-transplant parity with
the reference torch implementation (imported from /root/reference)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.models import STSE, STSAE, STSVAE, build_model

REFERENCE = "/root/reference"


def _reference_models():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if not hasattr(np, "int"):
        np.int = int
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import models.common.components as ref_components  # type: ignore

    return ref_components


# ------------------------------------------------------------ shapes


def test_stse_shapes():
    model = STSE(input_dim=2, layer_channels=(32, 16, 32), hidden_dimension=64,
                 latent_dim=16, n_frames=12, n_joints=17)
    x = jnp.zeros((4, 2, 12, 17))
    variables = model.init(jax.random.PRNGKey(0), x)
    z = model.apply(variables, x)
    assert z.shape == (4, 16)


def test_stsae_shapes():
    model = STSAE(input_dim=2, layer_channels=(32, 16, 32), hidden_dimension=64,
                  latent_dim=16, n_frames=12, n_joints=18)
    x = jnp.zeros((3, 2, 12, 18))
    variables = model.init(jax.random.PRNGKey(0), x)
    z, recon = model.apply(variables, x)
    assert z.shape == (3, 16)
    assert recon.shape == x.shape


@pytest.mark.parametrize("distribution,var_dim", [("ps", 1), ("normal", 8)])
def test_stsvae_shapes(distribution, var_dim):
    model = STSVAE(input_dim=2, layer_channels=(32, 16, 32), hidden_dimension=64,
                   latent_dim=8, n_frames=12, n_joints=17,
                   decoder_channels=(8, 8), distribution=distribution,
                   projector="mlp")
    x = jnp.zeros((3, 2, 12, 17))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )
    z, recon, (z_mean, z_var) = model.apply(
        variables, x, rngs={"sample": jax.random.PRNGKey(2)}
    )
    assert z.shape == (3, 8) and recon.shape == x.shape
    assert z_mean.shape == (3, 8) and z_var.shape == (3, var_dim)
    if distribution == "ps":
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(z), axis=-1), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(z_mean), axis=-1), 1.0, atol=1e-5
        )
        assert np.all(np.asarray(z_var) >= 1.0)  # softplus + 1


def test_build_model_dispatch():
    assert isinstance(build_model(use_vae=True, distribution="ps"), STSVAE)
    m = build_model(use_decoder=True)
    assert isinstance(m, STSAE) and not isinstance(m, STSVAE)
    m2 = build_model()
    assert isinstance(m2, STSE) and not isinstance(m2, STSAE)


def test_train_mode_updates_batch_stats():
    model = STSE(latent_dim=4, layer_channels=(8,), hidden_dimension=8,
                 n_frames=6, n_joints=5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 2, 6, 5)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


# ------------------------------------------------------------ torch parity


def _transplant_layer(ref_layer, flax_params, flax_stats, has_residual):
    """Copy one torch ST_GCNN_layer's weights into the flax param dicts."""
    import torch

    def t2n(t):
        return np.asarray(t.detach().numpy())

    flax_params["gcn"]["a_adj"] = t2n(ref_layer.gcn.A)
    flax_params["gcn"]["t_adj"] = t2n(ref_layer.gcn.T)
    conv = ref_layer.tcn[0]
    flax_params["tcn_dense"]["kernel"] = t2n(conv.weight)[:, :, 0, 0].T
    flax_params["tcn_dense"]["bias"] = t2n(conv.bias)
    bn = ref_layer.tcn[1]
    flax_params["tcn_bn"]["scale"] = t2n(bn.weight)
    flax_params["tcn_bn"]["bias"] = t2n(bn.bias)
    flax_stats["tcn_bn"]["mean"] = t2n(bn.running_mean)
    flax_stats["tcn_bn"]["var"] = t2n(bn.running_var)
    flax_params["prelu"]["alpha"] = float(t2n(ref_layer.prelu.weight)[0])
    if has_residual:
        rconv = ref_layer.residual[0]
        flax_params["residual_dense"]["kernel"] = t2n(rconv.weight)[:, :, 0, 0].T
        flax_params["residual_dense"]["bias"] = t2n(rconv.bias)
        rbn = ref_layer.residual[1]
        flax_params["residual_bn"]["scale"] = t2n(rbn.weight)
        flax_params["residual_bn"]["bias"] = t2n(rbn.bias)
        flax_stats["residual_bn"]["mean"] = t2n(rbn.running_mean)
        flax_stats["residual_bn"]["var"] = t2n(rbn.running_var)


def test_encoder_stack_matches_torch_reference():
    """Transplant the reference Encoder's weights into STSGCNStack and
    compare eval-mode forward outputs (golden parity, SURVEY.md section 4)."""
    ref_components = _reference_models()
    import torch

    from coskad_tpu.models.stsgcn import STSGCNStack

    torch.manual_seed(0)
    layer_channels = [32, 16, 32]
    hidden = 64
    t_dim, v_dim = 12, 17
    ref = ref_components.Encoder(
        input_dim=2, layer_channels=layer_channels, hidden_dimension=hidden,
        n_frames=t_dim, n_joints=v_dim, dropout=0.0,
    )
    ref.eval()
    # Randomize BN running stats so parity is non-trivial.
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    stack = STSGCNStack(
        channel_schedule=layer_channels + [hidden], time_dim=t_dim,
        joints_dim=v_dim, dropout=0.0,
    )
    x_np = np.random.default_rng(0).normal(size=(8, 2, t_dim, v_dim)).astype(np.float32)
    x_ntvc = jnp.transpose(jnp.asarray(x_np), (0, 2, 3, 1))
    variables = stack.init(jax.random.PRNGKey(0), x_ntvc)
    params = jax.tree_util.tree_map(np.array, variables["params"])
    stats = jax.tree_util.tree_map(np.array, variables["batch_stats"])

    schedule_in = [2] + layer_channels
    for i, ref_layer in enumerate(ref.model):
        has_res = schedule_in[i] != (layer_channels + [hidden])[i]
        _transplant_layer(ref_layer, params[f"layer_{i}"], stats[f"layer_{i}"], has_res)

    out = stack.apply({"params": params, "batch_stats": stats}, x_ntvc)
    out_nctv = np.transpose(np.asarray(out), (0, 3, 1, 2))
    with torch.no_grad():
        ref_out = ref(torch.tensor(x_np)).numpy()
    np.testing.assert_allclose(out_nctv, ref_out, rtol=2e-4, atol=2e-5)


def test_full_stse_matches_torch_reference():
    """Full STSE (encoder + linear projector) parity incl. the flatten-order
    permutation of the projector kernel."""
    ref_components = _reference_models()
    import torch

    torch.manual_seed(1)
    layer_channels = [32, 16, 32]
    hidden, latent, t_dim, v_dim = 64, 16, 12, 17
    ref_enc = ref_components.Encoder(
        input_dim=2, layer_channels=layer_channels, hidden_dimension=hidden,
        n_frames=t_dim, n_joints=v_dim, dropout=0.0,
    )
    ref_btlnk = torch.nn.Linear(hidden * t_dim * v_dim, latent)
    ref_enc.eval()

    model = STSE(
        input_dim=2, layer_channels=layer_channels, hidden_dimension=hidden,
        latent_dim=latent, n_frames=t_dim, n_joints=v_dim, projector="linear",
    )
    x_np = np.random.default_rng(1).normal(size=(4, 2, t_dim, v_dim)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    params = jax.tree_util.tree_map(np.array, variables["params"])
    stats = jax.tree_util.tree_map(np.array, variables["batch_stats"])

    schedule_in = [2] + layer_channels
    full_schedule = layer_channels + [hidden]
    for i, ref_layer in enumerate(ref_enc.model):
        has_res = schedule_in[i] != full_schedule[i]
        _transplant_layer(
            ref_layer, params["encoder"][f"layer_{i}"],
            stats["encoder"][f"layer_{i}"], has_res,
        )
    # Projector: reference flattens (C, T, V); we flatten (T, V, C).
    w = ref_btlnk.weight.detach().numpy()  # [latent, C*T*V]
    w_perm = (
        w.reshape(latent, hidden, t_dim, v_dim).transpose(0, 2, 3, 1).reshape(latent, -1)
    )
    params["btlnk"]["kernel"] = w_perm.T
    params["btlnk"]["bias"] = ref_btlnk.bias.detach().numpy()

    z = model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x_np))
    with torch.no_grad():
        h = ref_enc(torch.tensor(x_np))
        ref_z = ref_btlnk(h.reshape(4, -1)).numpy()
    np.testing.assert_allclose(np.asarray(z), ref_z, rtol=2e-3, atol=2e-4)


def test_linear_projector_equals_flat_dense():
    """LinearProjector (dot_general over the 4-D hidden) == Dense over the
    flattened hidden: identical variable tree, identical math."""
    from coskad_tpu.models.stse import LinearProjector

    b, t, v, c, latent = 4, 6, 5, 8, 16
    h = jnp.asarray(np.random.default_rng(0).normal(size=(b, t, v, c)), jnp.float32)
    mod = LinearProjector(latent_dim=latent, fan_in=t * v * c, use_bias=True)
    variables = mod.init(jax.random.PRNGKey(3), h)
    z = mod.apply(variables, h)
    k = np.asarray(variables["params"]["kernel"])
    bias = np.asarray(variables["params"]["bias"])
    assert k.shape == (t * v * c, latent) and bias.shape == (latent,)
    ref = np.asarray(h).reshape(b, -1) @ k + bias
    np.testing.assert_allclose(np.asarray(z), ref, rtol=1e-5, atol=1e-5)


def test_reverse_projector_equals_dense_reshape():
    """ReverseProjector == Dense [latent -> H*T*V] + channel-major reshape
    (the reference's de-flatten, models/sts/ae.py:222-226) + channels-last
    transpose."""
    from coskad_tpu.models.stse import ReverseProjector

    b, hdim, t, v, latent = 3, 8, 6, 5, 16
    z = jnp.asarray(np.random.default_rng(1).normal(size=(b, latent)), jnp.float32)
    mod = ReverseProjector(hidden_dimension=hdim, n_frames=t, n_joints=v,
                           latent_dim=latent)
    variables = mod.init(jax.random.PRNGKey(4), z)
    out = mod.apply(variables, z)
    k = np.asarray(variables["params"]["kernel"])
    bias = np.asarray(variables["params"]["bias"])
    assert k.shape == (latent, hdim * t * v) and bias.shape == (hdim * t * v,)
    ref = (np.asarray(z) @ k + bias).reshape(b, hdim, t, v).transpose(0, 2, 3, 1)
    assert out.shape == (b, t, v, hdim)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_vae_linear_heads_match_dense_over_flat():
    """STSVAE with the identity ('linear') projector: the LinearProjector
    heads produce exactly Dense-over-flat-hidden outputs (same params tree,
    fp32 math) — the head swap is a pure layout optimization."""
    model = STSVAE(input_dim=2, layer_channels=(8,), hidden_dimension=8,
                   latent_dim=4, n_frames=6, n_joints=5,
                   decoder_channels=(8,), distribution="normal",
                   projector="linear")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 2, 6, 5)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x
    )
    z_mean, z_var = model.apply(
        variables, x, method=lambda m, x: m.encode_distribution(x)
    )
    # oracle: flat hidden -> dense heads
    _, h = model.apply(variables, x, method=lambda m, x: m.encode(x))
    flat = np.asarray(h, np.float32).reshape(3, -1)
    p = variables["params"]
    mean_ref = flat @ np.asarray(p["fc_mean"]["kernel"]) + np.asarray(
        p["fc_mean"]["bias"])
    var_ref = flat @ np.asarray(p["fc_var"]["kernel"]) + np.asarray(
        p["fc_var"]["bias"])
    np.testing.assert_allclose(np.asarray(z_mean), mean_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(z_var), np.logaddexp(0.0, var_ref) + 1.0, rtol=1e-4, atol=1e-5)
