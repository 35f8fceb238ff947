"""Training loop: all five variants fit on synthetic data, centers behave,
validation produces a meaningful AUC, and sharding is exact."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.parallel import create_mesh
from coskad_tpu.train.loop import Trainer

from helpers import synthetic_segments, tiny_config


def _make_trainer(variant, with_val=False, mesh=None, **cfg_over):
    cfg = tiny_config(variant=variant, **cfg_over)
    train_ds, _ = synthetic_segments(seed=0, stride=2)
    val_ds, gt = None, None
    gts = {}
    if with_val:
        # Clip must be much longer than the sigma=30 Gaussian smoothing
        # radius (120 frames) or scores flatten into ties.
        val_ds, gt = synthetic_segments(
            seed=1, stride=1, n_frames=600, anomalous_ranges=[(250, 350)]
        )
        gts = {(1, 1): gt}
        cfg = dataclasses.replace(cfg, opt=dataclasses.replace(cfg.opt, validation=True))
    return Trainer(cfg, train_ds, val_ds, gts, mesh=mesh), cfg


VARIANTS = ["euclidean_static", "euclidean_dynamic", "autoencoder", "vae", "hyperbolic"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_fit_two_epochs(variant):
    trainer, _ = _make_trainer(variant, epochs=2)
    state, history = trainer.fit()
    assert len(history["loss"]) == 2
    assert np.isfinite(history["loss"]).all()
    assert np.isfinite(np.asarray(state.center)).all()
    if variant == "hyperbolic":
        assert np.linalg.norm(np.asarray(state.center)) < 1.0


def test_lr_schedule_wiring():
    """OptConfig.lr_schedule drives the live optimizer lr per epoch
    (torch semantics: lr(epoch e) = schedule(e))."""
    trainer, cfg = _make_trainer(
        "euclidean_static", epochs=3, lr_schedule="exp", lr_decay=0.5
    )
    state, history = trainer.fit()
    live = float(jax.device_get(state.opt_state.hyperparams["learning_rate"]))
    # Last installed lr is schedule(epoch=2) = lr * 0.5**2.
    assert np.isclose(live, cfg.opt.lr * 0.25, rtol=1e-6)
    assert np.isfinite(history["loss"]).all()


def test_lr_schedule_tri_matches_library():
    from coskad_tpu.train import schedulers

    trainer, cfg = _make_trainer(
        "euclidean_static", epochs=2, lr_schedule="tri"
    )
    state, _ = trainer.fit()
    sched = schedulers.build_schedule("tri", cfg.opt.lr, cfg.opt.epochs)
    live = float(jax.device_get(state.opt_state.hyperparams["learning_rate"]))
    assert np.isclose(live, sched(1), rtol=1e-6)


def test_center_contraction_reduces_loss():
    trainer, _ = _make_trainer("euclidean_static", epochs=5)
    _, history = trainer.fit()
    assert history["loss"][-1] < history["loss"][0]


def test_center_init_clamps_small_coords():
    trainer, cfg = _make_trainer("euclidean_static")
    state = trainer.init_state()
    state = trainer.initialize_center(state)
    c = np.asarray(state.center)
    eps = cfg.opt.center_tolerance
    nonzero = c != 0.0
    assert np.all(np.abs(c[nonzero]) >= eps - 1e-9)


def test_dynamic_center_updates_per_epoch():
    trainer, _ = _make_trainer("euclidean_dynamic", epochs=1)
    state = trainer.init_state()
    state = trainer.initialize_center(state)
    c0 = np.asarray(state.center).copy()
    state, _ = trainer.fit(state=state, epochs=1)
    c1 = np.asarray(state.center)
    assert not np.allclose(c0, c1)


def test_validation_auc_after_training():
    trainer, _ = _make_trainer("euclidean_static", with_val=True, epochs=3)
    state, history = trainer.fit()
    assert len(history["validation_auc"]) == 3
    # Planted anomalies are gross outliers; even a briefly-trained model
    # must rank them far above chance.
    assert history["validation_auc"][-1] > 0.8


def test_mahalanobis_path():
    trainer, _ = _make_trainer(
        "euclidean_static", epochs=2, distance="mahalanobis"
    )
    state, history = trainer.fit()
    assert np.isfinite(history["loss"]).all()
    assert np.isfinite(np.asarray(state.inv_cov)).all()
    assert not np.allclose(np.asarray(state.inv_cov), np.eye(4))


def test_vae_mean_vector_updates():
    trainer, _ = _make_trainer("vae", epochs=1)
    state, _ = trainer.fit()
    mv = np.asarray(state.mean_vector)
    assert np.isfinite(mv).all() and np.abs(mv).max() > 0


# ------------------------------------------------------------ sharding


def test_sharded_center_matches_single_device():
    """Center init on an 8-device data mesh == single device (exact global
    pmean, SURVEY.md section 2.8/section 4)."""
    mesh8 = create_mesh(data_parallel=8)
    mesh1 = create_mesh(data_parallel=1, devices=jax.devices()[:1])
    t8, _ = _make_trainer("euclidean_static", mesh=mesh8)
    t1, _ = _make_trainer("euclidean_static", mesh=mesh1)
    s8 = t8.initialize_center(t8.init_state())
    s1 = t1.initialize_center(t1.init_state())
    np.testing.assert_allclose(
        np.asarray(s8.center), np.asarray(s1.center), rtol=1e-5, atol=1e-6
    )


def test_sharded_train_step_matches_single_device():
    """One jitted step on an 8-device data mesh vs 1 device: same global
    semantics (loss, grads, BN batch stats all reduce over the global batch).
    Only fp32 reduce-order noise may differ; Adam roughly sign-normalizes
    gradients so params can drift by O(lr) where a near-zero grad flips sign
    — hence the absolute tolerance of 2*lr on params and a tight one on the
    loss."""
    import jax.numpy as jnp

    from coskad_tpu.parallel import batch_sharding

    mesh8 = create_mesh(data_parallel=8)
    mesh1 = create_mesh(data_parallel=1, devices=jax.devices()[:1])
    outs = {}
    for name, mesh in [("m8", mesh8), ("m1", mesh1)]:
        trainer, _ = _make_trainer("euclidean_static", mesh=mesh, epochs=1)
        state = trainer.init_state()
        state = trainer.initialize_center(state)
        idx = jax.device_put(jnp.arange(32), batch_sharding(mesh))
        state, metrics = trainer._train_step(state, trainer.train_data, idx)
        outs[name] = (
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.params)),
            float(metrics["loss"]),
            np.asarray(state.acc_vec),
        )
    # the center init itself carries ~1e-5 reduce-order noise which the
    # squared distance amplifies
    np.testing.assert_allclose(outs["m8"][1], outs["m1"][1], rtol=1e-3)
    # acc_vec must be the *global* latent sum: a per-shard bug would be off
    # by ~8x; cross-program fp noise through BatchNorm stays under 0.5%.
    np.testing.assert_allclose(outs["m8"][2], outs["m1"][2], rtol=5e-3, atol=1e-4)
    flat8 = jax.tree_util.tree_leaves(outs["m8"][0])
    flat1 = jax.tree_util.tree_leaves(outs["m1"][0])
    for a, b in zip(flat8, flat1):
        np.testing.assert_allclose(a, b, atol=2.1e-3)


def test_projector_kernel_model_sharded_on_tp_mesh():
    """With model_parallel > 1, the wide projector kernels carry the 'model'
    axis in their sharding spec (tensor parallelism layout)."""
    from coskad_tpu.parallel import create_mesh
    from coskad_tpu.parallel.mesh import shard_params

    mesh = create_mesh(data_parallel=4, model_parallel=2)
    trainer, _ = _make_trainer("euclidean_static", mesh=mesh)
    state = trainer.init_state()
    specs = shard_params(state.params, mesh)
    btlnk = specs["btlnk"]["kernel"].spec
    assert "model" in str(btlnk)
    gcn = specs["encoder"]["layer_0"]["gcn"]["t_adj"].spec
    assert "model" not in str(gcn)  # tiny params stay replicated
    # and the state actually lives with those shardings
    assert "model" in str(state.params["btlnk"]["kernel"].sharding.spec)


def test_dropout_training_path():
    """dropout > 0 needs the 'dropout' RNG collection threaded through the
    jitted step (all reference configs use 0, but it's a config knob)."""
    cfg = tiny_config("euclidean_static", epochs=1)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dropout=0.3)
    )
    train_ds, _ = synthetic_segments(seed=0, stride=2)
    trainer = Trainer(cfg, train_ds)
    state, history = trainer.fit()
    assert np.isfinite(history["loss"]).all()


def test_dropout_vae_training_path():
    cfg = tiny_config("vae", epochs=1)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dropout=0.2)
    )
    train_ds, _ = synthetic_segments(seed=0, stride=2)
    trainer = Trainer(cfg, train_ds)
    state, history = trainer.fit()
    assert np.isfinite(history["loss"]).all()


def test_fit_with_dataset_smaller_than_batch():
    """Logical dataset < batch_size must still train (short-batch clamp)."""
    cfg = tiny_config("euclidean_static", epochs=1, batch_size=4096)
    ds, _ = synthetic_segments(seed=0, stride=8)  # few windows
    assert len(ds) < 4096
    trainer = Trainer(cfg, ds)
    state, history = trainer.fit()
    assert np.isfinite(history["loss"]).all()


def test_freeze_bn_after_trains_and_freezes_stats():
    """freeze_bn_after trains with running BN statistics from that epoch:
    batch_stats stop changing while the loss keeps improving."""
    cfg = tiny_config("euclidean_static", epochs=1)
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, freeze_bn_after=0)
    )
    ds, _ = synthetic_segments(seed=0, stride=2)
    trainer = Trainer(cfg, ds)
    state = trainer.init_state()
    state = trainer.initialize_center(state)
    stats_before = jax.tree_util.tree_map(np.array, jax.device_get(state.batch_stats))
    state, history = trainer.fit(state=state, epochs=2)
    stats_after = jax.tree_util.tree_map(np.array, jax.device_get(state.batch_stats))
    for b, a in zip(jax.tree_util.tree_leaves(stats_before),
                    jax.tree_util.tree_leaves(stats_after)):
        np.testing.assert_allclose(b, a)  # frozen: no stat updates
    assert np.isfinite(history["loss"]).all()
    assert history["loss"][-1] < history["loss"][0]


def test_training_is_deterministic_per_seed():
    """Same seed -> identical loss trajectory and final params."""
    outs = []
    for _ in range(2):
        cfg = tiny_config("euclidean_static", epochs=2)
        ds, _ = synthetic_segments(seed=0, stride=2)
        trainer = Trainer(cfg, ds)
        state, history = trainer.fit()
        outs.append((history["loss"],
                     jax.tree_util.tree_map(np.asarray,
                                            jax.device_get(state.params))))
    np.testing.assert_allclose(outs[0][0], outs[1][0])
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        np.testing.assert_allclose(a, b)


@pytest.mark.parametrize("variant", VARIANTS)
def test_bfloat16_compute_traces_with_fp32_boundaries(variant):
    """compute_dtype=bfloat16 (the benched/recommended TPU precision)
    traces the full train step and keeps the fp32 boundaries: loss,
    latents, center accumulators. Execution-level bf16 runs on TPU only
    (XLA-CPU has no BF16xBF16->F32 dot kernel); the accuracy evidence is
    the head-to-head in RESULTS.md."""
    import jax

    trainer, cfg = _make_trainer(variant)
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, compute_dtype="bfloat16"))
    trainer2 = Trainer(cfg, trainer.train_ds)
    state = trainer2.init_state()
    idx = jnp.arange(cfg.data.batch_size)
    out_state, metrics = jax.eval_shape(
        lambda s, d, i: trainer2._train_step(s, d, i),
        state, trainer2.train_data, idx,
    )
    assert metrics["loss"].dtype == jnp.float32
    assert out_state.center.dtype == jnp.float32
    assert out_state.acc_vec.dtype == jnp.float32
    z, _rec = jax.eval_shape(
        lambda p, b, d, i, r: trainer2._embed_many(p, b, d, i[None], r),
        state.params, state.batch_stats, trainer2.train_data, idx, state.rng,
    )
    assert z.dtype == jnp.float32  # latents stay fp32 for the geometry


@pytest.mark.parametrize("variant", ["euclidean_static", "autoencoder"])
def test_flat_carry_epoch_matches_tree_steps(variant):
    """The flat-carry scanned epoch (params raveled into one tile-padded
    [rows, 1024] matrix, Adam applied flat — loop.py:_train_epoch_impl)
    produces the SAME params/opt-state as stepping the tree path: the
    padding lanes contribute nothing (zero grad -> zero Adam moments ->
    zero update) and the transform restores tree shapes on exit."""
    trainer, cfg = _make_trainer(variant)
    assert trainer._flat_carry  # default single-device mesh: TP=1
    b = cfg.data.batch_size
    idx = np.arange(2 * b).reshape(2, b) % len(trainer.train_ds)

    # the jitted paths donate the state buffers -> build each start state
    # fresh (init_state is seed-deterministic).
    epoch_state, _ = trainer._train_epoch(
        trainer.init_state(), trainer.train_data, jnp.asarray(idx))

    step_state = trainer.init_state()
    for k in range(2):
        step_state, _ = trainer._train_step(
            step_state, trainer.train_data, jnp.asarray(idx[k]))

    for a, b_ in zip(jax.tree_util.tree_leaves(epoch_state.params),
                     jax.tree_util.tree_leaves(step_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-7)
    # opt_state leaf shapes restored (mu/nu back to the flat [P] form the
    # tree path / checkpoints use) and values match.
    for a, b_ in zip(jax.tree_util.tree_leaves(epoch_state.opt_state),
                     jax.tree_util.tree_leaves(step_state.opt_state)):
        assert np.shape(a) == np.shape(b_)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-7)
    # The restored state feeds straight back into another scanned epoch.
    again, metrics = trainer._train_epoch(
        epoch_state, trainer.train_data, jnp.asarray(idx))
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_cov_shrinkage_tames_mahalanobis_noise_amplification():
    """opt.cov_shrinkage (OFF by default) must damp the inverse-covariance
    noise amplification seen in the 2-process DCN test (cond(cov) ~ 2.4e4
    turns ~1e-6 float noise into percent-level mahalanobis score spread,
    tests/test_multiprocess.py) by >=10x, while leaving the score RANKING —
    hence the AUC — unchanged (VERDICT r4 #9).

    The amplification statement uses a constructed latent cloud at the
    measured conditioning (a random-init tiny model's latents are too
    isotropic to show it); the config plumbing is then checked through the
    real Trainer path."""
    import types

    from helpers import synthetic_segments, tiny_config

    # --- the math, at cond(cov) ~ 1e4
    rng = np.random.default_rng(0)
    scales = np.logspace(0, -2.5, 16)  # cond(cov) ~ 1e5, the measured
    # 2.4e4 regime's order of magnitude
    z = rng.normal(size=(2048, 16)) * scales
    z[-8:] *= 4.0  # planted outliers pin the ranking contract
    noise = rng.normal(scale=1e-6, size=z.shape)

    def mscores(zz, lam):
        cfg = tiny_config(distance="mahalanobis", cov_shrinkage=lam)
        shim = types.SimpleNamespace(cfg=cfg)  # _shrink_cov reads cfg only
        d = zz - zz.mean(axis=0)
        cov = (d.T @ d) / (len(zz) - 1)
        inv = np.linalg.inv(Trainer._shrink_cov(shim, cov))
        return np.einsum("nd,de,ne->n", d, inv, d)

    deltas, clean = {}, {}
    for lam in (0.0, 0.2):
        clean[lam] = mscores(z, lam)
        noisy = mscores(z + noise, lam)
        deltas[lam] = np.max(np.abs(noisy - clean[lam]) / np.abs(clean[lam]))
    assert deltas[0.2] < deltas[0.0] / 10, deltas
    # The AUC-level contract: anomalous-vs-normal ordering is unchanged by
    # the shrinkage itself (inlier-vs-inlier order may legitimately move —
    # the metric reweights small-variance directions — but that never
    # enters the AUC).
    assert (set(np.argsort(clean[0.0])[-8:]) == set(np.argsort(clean[0.2])[-8:])
            == set(range(len(z) - 8, len(z))))
    from sklearn.metrics import roc_auc_score

    labels = np.zeros(len(z)); labels[-8:] = 1
    assert (roc_auc_score(labels, clean[0.2])
            == roc_auc_score(labels, clean[0.0]) == 1.0)

    # --- the plumbing: the knob reaches both inv-cov sites via the Trainer
    ds, _ = synthetic_segments(n_frames=120, num_transform=1,
                               anomalous_ranges=((90, 110),))
    invs, tops = {}, {}
    for lam in (0.0, 0.5):
        cfg = tiny_config(distance="mahalanobis", cov_shrinkage=lam)
        trainer = Trainer(cfg, ds)
        state = trainer.initialize_center(trainer.init_state())
        invs[lam] = np.asarray(state.inv_cov)
        # epoch-end recompute path flows through _shrink_cov too
        state, _ = trainer.fit(state=state, epochs=1)
        s, _ = trainer.score_all(state, ds, trainer.train_data)
        tops[lam] = set(np.argsort(np.asarray(s))[-16:])
    assert not np.allclose(invs[0.0], invs[0.5])  # the knob reached init
    # Planted outliers still dominate the ranking (boundary windows whose
    # frames only graze the anomalous span are legitimate near-ties).
    assert len(tops[0.0] & tops[0.5]) >= 14


def test_vae_stabilizer_knobs():
    """The three opt-in VAE stabilizers (RESULTS.md round-5 'VAE
    stabilization'), each OFF by default = reference semantics:
    - model.kappa_floor: z_var = softplus + floor (reference hardcodes +1);
    - opt.vae_contraction: posterior-mean contraction toward mean_vector,
      gated on the anchor existing (inert at epoch 1);
    - eval.vae_sample=False: deterministic posterior-mean scoring, with the
      mean_vector accumulator switched to posterior means to match
      (training keeps sampling)."""
    import dataclasses

    from helpers import synthetic_segments, tiny_config

    ds, _ = synthetic_segments(n_frames=60, num_transform=1)

    # kappa_floor reaches the model head
    cfg = tiny_config("vae")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, kappa_floor=8.0))
    tr = Trainer(cfg, ds)
    state = tr.init_state()
    _, z_var = tr.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(ds.data[:4, :2]), train=False,
        method="encode_distribution")
    assert float(jnp.min(z_var)) >= 8.0

    # vae_contraction: gated off at epoch 1 (mean_vector still zero), live
    # from epoch 2; enabling it changes the trained parameters.
    def run(weight):
        cfg = tiny_config("vae", vae_contraction=weight)
        tr = Trainer(cfg, ds)
        state = tr.init_state()
        state = tr.initialize_center(state)
        state, hist = tr.fit(state=state, epochs=3)
        return state, hist

    s0, _ = run(0.0)
    s1, _ = run(2.0)
    p0 = jax.flatten_util.ravel_pytree(s0.params)[0]
    p1 = jax.flatten_util.ravel_pytree(s1.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    # eval.vae_sample=False: eval-mode embeddings are deterministic and the
    # anchor is unit-norm-scale (posterior means), not noise-cancelled.
    cfg = tiny_config("vae")
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, vae_sample=False))
    tr = Trainer(cfg, ds)
    state = tr.init_state()
    state = tr.initialize_center(state)
    z_a = tr.embed_all(state, ds, tr.train_data)
    z_b = tr.embed_all(state, ds, tr.train_data)
    np.testing.assert_allclose(z_a, z_b, rtol=0, atol=0)  # no draw in eval
    state, _ = tr.fit(state=state, epochs=2)
    mv = np.asarray(state.mean_vector)
    assert np.linalg.norm(mv) > 0.5  # means align; a sampled anchor at
    # kappa~2 on S^3..S^15 cancels to 0.1-0.4 (measured, RESULTS.md)

    # default sampled eval really samples (different draws differ)
    cfg_s = tiny_config("vae")
    tr_s = Trainer(cfg_s, ds)
    st = tr_s.init_state()
    z1 = tr_s.embed_all(st, ds, tr_s.train_data)
    st2 = st.replace(rng=jax.random.PRNGKey(123))
    z2 = tr_s.embed_all(st2, ds, tr_s.train_data)
    assert not np.allclose(z1, z2)


def test_contrastive_second_view_respects_frozen_bn():
    """freeze_bn_after must freeze BOTH forward passes of the contrastive
    step: the strongly-augmented view previously defaulted frozen_bn=False
    and kept mutating running stats after the freeze (round-5 review)."""
    import dataclasses

    from helpers import synthetic_segments, tiny_config

    ds, _ = synthetic_segments(n_frames=60, num_transform=1)
    cfg = tiny_config(contrastive_weight=0.5)
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, freeze_bn_after=0))
    trainer = Trainer(cfg, ds)
    state = trainer.init_state()
    state = trainer.initialize_center(state)
    before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    state, _ = trainer.fit(state=state, epochs=1)  # epoch 0 >= freeze -> frozen
    after = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(b, a)


def test_fit_with_dataset_smaller_than_data_axis():
    """n logical windows < the data-mesh axis: the rounded-up batch is
    wrap-padded modulo n instead of reshape-crashing (round-5 review)."""
    from helpers import synthetic_segments, tiny_config

    ds, _ = synthetic_segments(n_frames=20, seg_len=6, n_actors=1,
                               stride=6, num_transform=1)
    assert len(ds) < 8  # fewer logical items than the 8-device mesh
    trainer = Trainer(tiny_config(batch_size=16), ds)
    state, hist = trainer.fit(epochs=1)
    assert np.isfinite(hist["loss"][0])


def test_num_transform_mismatch_is_rejected():
    """A dataset whose num_transform disagrees with the config (other than
    the always-safe 1) must be rejected at Trainer construction — an
    out-of-range transform index would be silently CLIPPED by jnp.take to
    the wrong affine matrix (round-5 review)."""
    import dataclasses

    from helpers import synthetic_segments, tiny_config

    ds, _ = synthetic_segments(n_frames=40, num_transform=4)
    cfg = tiny_config()  # data.num_transform = 2
    with pytest.raises(ValueError, match="num_transform"):
        Trainer(cfg, ds)
    # num_transform=1 datasets stay allowed (the serving raw-windows path)
    ds1, _ = synthetic_segments(n_frames=40, num_transform=1)
    Trainer(cfg, ds1)
