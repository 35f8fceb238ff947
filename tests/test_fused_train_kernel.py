"""Parity tests for the fused ghost-BN train kernel (kernels/stse_train.py).

The pure-jnp ghost reference (`ghost_encode_reference`) is the semantic
spec; it itself equals the flax model bit-for-bit when ghost_size == B
(asserted below). The Pallas kernels (interpret mode on CPU here; compiled
on TPU in scripts/bench) must match the reference's forward, stat sums, and
parameter gradients to fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.kernels import stse_train as K
from coskad_tpu.models import STSE


def make_model(n_joints=18, channels=(32, 16, 32), h_dim=64, latent=16,
               c_in=2, t=12):
    model = STSE(
        input_dim=c_in, layer_channels=channels, hidden_dimension=h_dim,
        latent_dim=latent, n_frames=t, n_joints=n_joints,
        projector="linear", bn_mode="flax",
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(64, c_in, t, n_joints), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables["params"], variables["batch_stats"], x


def test_ghost_reference_equals_flax_at_full_batch():
    model, params, bs, x = make_model()
    z_flax, _ = model.apply(
        {"params": params, "batch_stats": bs}, x, train=True,
        mutable=["batch_stats"],
    )
    z_ghost, _ = K.ghost_encode_reference(params, x, ghost_size=x.shape[0])
    np.testing.assert_allclose(np.asarray(z_flax), np.asarray(z_ghost),
                               atol=5e-4)


@pytest.mark.parametrize("ghost", [16, 32])
def test_fused_forward_matches_reference(ghost):
    _, params, bs, x = make_model()
    z_ref, sums_ref = K.ghost_encode_reference(params, x, ghost_size=ghost)
    z_k, new_bs = K.fused_stse_apply(params, bs, x, ghost_size=ghost,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref),
                               rtol=2e-4, atol=2e-4)
    # running statistics: fold the reference sums and compare trees
    bs_ref = K.updated_batch_stats(bs, params, sums_ref)
    flat_k = jax.tree_util.tree_leaves(new_bs)
    flat_r = jax.tree_util.tree_leaves(bs_ref)
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bwd_mode", ["split", "mono"])
def test_fused_gradients_match_reference(bwd_mode):
    _, params, bs, x = make_model()
    center = jnp.asarray(np.random.RandomState(1).randn(16), jnp.float32)

    def loss_ref(p):
        z, _ = K.ghost_encode_reference(p, x, ghost_size=16)
        return jnp.mean((z - center) ** 2)

    def loss_k(p):
        z, _ = K.fused_stse_apply(p, bs, x, ghost_size=16, interpret=True,
                                  bwd_mode=bwd_mode)
        return jnp.mean((z - center) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_k, g_k = jax.value_and_grad(loss_k)(params)
    np.testing.assert_allclose(float(l_k), float(l_ref), rtol=1e-5)
    flat_r, tree_r = jax.tree_util.tree_flatten(g_ref)
    flat_k, tree_k = jax.tree_util.tree_flatten(g_k)
    assert tree_r == tree_k
    paths = jax.tree_util.tree_leaves_with_path(g_ref)
    for (path, a), b in zip(paths, flat_k):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        err = float(jnp.abs(jnp.asarray(b) - a).max())
        # 1e-3 absolute-ish band: the kernel reduces over the full padded
        # array with analytic pad corrections while the jnp reference
        # reduces per ghost block — different fp32 summation orders through
        # the BN-backward's 1/cnt cancellations land ~1e-4..5e-4 apart.
        assert err < 1e-3 * max(scale, 1.0) + 1e-6, (
            jax.tree_util.keystr(path), err, scale
        )


def test_trainer_fused_dispatch_sharding_invariant():
    """Trainer with fused_train='on' (reference impl on CPU) trains on the
    8-device mesh; the first-step loss matches the single-device mesh and
    the running statistics follow the ghost+EMA rule."""
    import dataclasses

    import numpy as onp

    from coskad_tpu.config import Config, DataConfig, ModelConfig, OptConfig, RunConfig
    from coskad_tpu.data.windows import SegmentDataset
    from coskad_tpu.parallel import batch_sharding, create_mesh
    from coskad_tpu.train.loop import Trainer

    rng = onp.random.default_rng(0)
    n_windows = 64
    ds = SegmentDataset(
        data=rng.normal(size=(n_windows, 3, 12, 17)).astype(onp.float32),
        meta=onp.tile([1, 1, 1, 1], (n_windows, 1)).astype(onp.int64),
        frame_ids=onp.tile(onp.arange(1, 13), (n_windows, 1)).astype(onp.int32),
        num_transform=5,
    )
    cfg = Config(
        model=ModelConfig(variant="euclidean_static"),
        data=DataConfig(seg_len=12, batch_size=32, num_transform=5, kp18_format=False),
        opt=OptConfig(lr=1e-4, epochs=1),
        run=RunConfig(fused_train="on", ghost_size=8),
    )

    losses = {}
    for n_dev in (1, 4):
        mesh = create_mesh(n_dev, 1, devices=jax.devices()[:n_dev])
        tr = Trainer(cfg, ds, mesh=mesh)
        assert tr._fused_compat
        state = tr.initialize_center(tr.init_state())
        idx = jax.device_put(jnp.arange(32), batch_sharding(mesh))
        state, metrics = tr._train_step(state, tr.train_data, idx)
        losses[n_dev] = float(metrics["loss"])
        assert np.isfinite(losses[n_dev])
    assert abs(losses[1] - losses[4]) < 1e-4 * max(abs(losses[1]), 1e-3)


def test_trainer_fused_matches_manual_ghost_loss():
    """The fused train step's loss equals a hand-computed ghost-BN loss on
    the same gathered batch (single device, reference impl)."""
    import numpy as onp

    from coskad_tpu.config import Config, DataConfig, ModelConfig, OptConfig, RunConfig
    from coskad_tpu.data.windows import SegmentDataset
    from coskad_tpu.parallel import create_mesh
    from coskad_tpu.train.loop import Trainer
    from coskad_tpu.train import objectives

    rng = onp.random.default_rng(1)
    ds = SegmentDataset(
        data=rng.normal(size=(64, 3, 12, 17)).astype(onp.float32),
        meta=onp.tile([1, 1, 1, 1], (64, 1)).astype(onp.int64),
        frame_ids=onp.tile(onp.arange(1, 13), (64, 1)).astype(onp.int32),
        num_transform=5,
    )
    cfg = Config(
        model=ModelConfig(variant="euclidean_static"),
        data=DataConfig(seg_len=12, batch_size=32, num_transform=5, kp18_format=False),
        opt=OptConfig(lr=1e-4, epochs=1),
        run=RunConfig(fused_train="on", ghost_size=8),
    )
    mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    tr = Trainer(cfg, ds, mesh=mesh)
    state = tr.initialize_center(tr.init_state())
    idx = jnp.arange(32)
    batch = tr._gather(tr.train_data, idx)
    z, _ = K.ghost_encode_reference(
        jax.device_get(state.params), batch, ghost_size=8
    )
    expected, _ = objectives.compute_loss(
        cfg, z, batch, state.params, state.center, state.inv_cov
    )
    _, metrics = tr._train_step(state, tr.train_data, idx)
    np.testing.assert_allclose(float(metrics["loss"]), float(expected),
                               rtol=1e-5)


def test_fused_identity_residual_layer():
    # channel schedule with an equal-channel step exercises the identity
    # residual path (no residual dense/BN params)
    _, params, bs, x = make_model(channels=(32, 32), h_dim=64)
    z_ref, _ = K.ghost_encode_reference(params, x, ghost_size=16)
    z_k, _ = K.fused_stse_apply(params, bs, x, ghost_size=16, interpret=True)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref),
                               rtol=2e-4, atol=2e-4)

    def loss_k(p):
        z, _ = K.fused_stse_apply(p, bs, x, ghost_size=16, interpret=True,
                                  bwd_mode="split")
        return jnp.mean(z ** 2)

    def loss_ref(p):
        z, _ = K.ghost_encode_reference(p, x, ghost_size=16)
        return jnp.mean(z ** 2)

    g_k = jax.grad(loss_k)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_k)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=5e-4)


def test_fused_bf16_path_close_to_fp32(rng):
    """compute_dtype='bfloat16' stores the big intermediates in bf16 with
    fp32 stat accumulation (v3 layout): forward within bf16 tolerance of
    the fp32 reference, grads finite and directionally consistent."""
    _, params, bs, x = make_model()
    z_ref, _ = K.ghost_encode_reference(params, x, ghost_size=16)
    z_k, _ = K.fused_stse_apply(params, bs, x, ghost_size=16, interpret=True,
                                compute_dtype="bfloat16")
    scale = float(jnp.abs(z_ref).max())
    assert float(jnp.abs(z_k - z_ref).max()) < 5e-2 * max(scale, 1.0)

    center = jnp.asarray(np.random.RandomState(1).randn(16), jnp.float32)

    def loss_k(p):
        z, _ = K.fused_stse_apply(p, bs, x, ghost_size=16, interpret=True,
                                  compute_dtype="bfloat16")
        return jnp.mean((z - center) ** 2)

    def loss_ref(p):
        z, _ = K.ghost_encode_reference(p, x, ghost_size=16)
        return jnp.mean((z - center) ** 2)

    g_k = jax.grad(loss_k)(params)
    g_ref = jax.grad(loss_ref)(params)
    # cosine similarity per leaf: bf16 grads must point the same way
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                            jax.tree_util.tree_leaves(g_k)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        assert np.all(np.isfinite(b)), jax.tree_util.keystr(path)
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom > 1e-10:
            cos = float(a @ b / denom)
            assert cos > 0.98, (jax.tree_util.keystr(path), cos)


def test_fused_train_auto_semantics():
    """fused_train='auto' engages the ghost-BN path when the variant is
    compatible and silently falls back (no error) when it is not — e.g.
    the autoencoder keeps the XLA live-BN path."""
    import dataclasses

    import numpy as onp

    from coskad_tpu.config import (Config, DataConfig, ModelConfig,
                                   OptConfig, RunConfig)
    from coskad_tpu.data.windows import SegmentDataset
    from coskad_tpu.parallel import create_mesh
    from coskad_tpu.train.loop import Trainer

    rng = onp.random.default_rng(0)
    ds = SegmentDataset(
        data=rng.normal(size=(32, 3, 12, 17)).astype(onp.float32),
        meta=onp.tile([1, 1, 1, 1], (32, 1)).astype(onp.int64),
        frame_ids=onp.tile(onp.arange(1, 13), (32, 1)).astype(onp.int32),
        num_transform=1,
    )
    base = Config(
        model=ModelConfig(variant="euclidean_static"),
        data=DataConfig(seg_len=12, batch_size=16, num_transform=1,
                        kp18_format=False),
        opt=OptConfig(lr=1e-4, epochs=1),
        run=RunConfig(fused_train="auto", ghost_size=8),
    )
    mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    assert Trainer(base, ds, mesh=mesh)._fused_compat

    ae = dataclasses.replace(
        base, model=dataclasses.replace(base.model, variant="autoencoder"))
    assert not Trainer(ae, ds, mesh=mesh)._fused_compat  # silent fallback

    # 'on' with an incompatible variant must raise instead
    ae_on = dataclasses.replace(
        ae, run=dataclasses.replace(ae.run, fused_train="on"))
    with pytest.raises(ValueError):
        Trainer(ae_on, ds, mesh=mesh)
