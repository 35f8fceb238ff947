"""Variant-dispatched training objectives and window scores.

The reference quintuplicates ~200 LoC per Lightning module for what is one
loss family (models/euclidean_encoder_staticCenter.py:164-194,
euclidean_encoder_dynamicCenter.py, euclidean_autoencoder.py:108-122,
spherical_vae.py:81-107, hyperbolic_encoder.py:137-172). Here each variant is
a pure function of (latents/recon, center state, hyperparameters); dispatch
happens at trace time on the static variant string.

Window anomaly scores (used by validation and offline eval) follow the same
dispatch: MSE / Mahalanobis to center, 1 - cosine to mean_vector (VAE), or
Poincare geodesic distance of the exp-mapped latent (hyperbolic) —
eval_COSKAD.py:186-199.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..geometry import euclidean as euc
from ..geometry import poincare as hyp
from ..geometry.sphere import PowerSpherical, normal_kl_standard
from ..config import Config


def reg_loss(params) -> jax.Array:
    """Mean over non-bias parameter tensors of 0.5 * ||W||^2
    (reference utils/model_utils.py:90-103: `'bias' not in name`)."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    vals = [
        0.5 * jnp.sum(x.astype(jnp.float32) ** 2)
        for path, x in leaves
        if getattr(path[-1], "key", getattr(path[-1], "name", "")) != "bias"
    ]
    return sum(vals) / len(vals)


def compute_loss(
    cfg: Config,
    variant_outputs,
    batch: jax.Array,
    params,
    center: jax.Array,
    inv_cov: jax.Array,
    mean_vector: jax.Array = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Loss + scalar metrics for one batch.

    `variant_outputs` is the model forward result: z (STSE), (z, recon)
    (STSAE), or (z, recon, (z_mean, z_var)) (STSVAE). `mean_vector` is the
    VAE's scoring anchor (previous epoch's latent mean), used only by the
    opt-in `opt.vae_contraction` term.
    """
    variant = cfg.model.variant
    opt = cfg.opt
    l_reg = reg_loss(params)
    metrics: Dict[str, jax.Array] = {"regularization": l_reg}

    if variant in ("euclidean_static", "euclidean_dynamic"):
        z = variant_outputs
        if cfg.model.distance == "mahalanobis":
            l_center = jnp.mean(euc.mahalanobis(z, center, inv_cov))
        else:
            l_center = jnp.mean((z - center) ** 2)
        loss = l_center + opt.alpha * l_reg
        metrics["hypersphere_loss"] = l_center

    elif variant == "autoencoder":
        z, recon = variant_outputs
        l_rec = jnp.mean((recon - batch) ** 2)
        l_center = jnp.mean((z - center) ** 2)
        loss = opt.lambda_ * l_rec + l_center + opt.alpha * l_reg
        metrics["reconstruction_loss"] = l_rec
        metrics["hypersphere_loss"] = l_center

    elif variant == "vae":
        z, recon, (z_mean, z_var) = variant_outputs
        l_rec = jnp.mean((recon - batch) ** 2)
        if cfg.model.distribution == "ps":
            l_kl = jnp.mean(
                PowerSpherical(z_mean, jnp.squeeze(z_var, -1)).kl_to_uniform()
            )
        else:
            l_kl = jnp.mean(jnp.sum(normal_kl_standard(z_mean, z_var), axis=-1))
        l_exp = jnp.mean(1.0 / z_var)
        loss = opt.phi * l_rec + opt.alpha * l_reg + opt.beta * l_kl + opt.gamma * l_exp
        metrics.update(
            reconstruction_loss=l_rec, kl_loss=l_kl, exp_dist_loss=l_exp
        )
        if opt.vae_contraction > 0 and mean_vector is not None:
            # Opt-in stabilizer (OFF by default = reference semantics,
            # spherical_vae.py:81-107): contract the POSTERIOR MEAN toward
            # the scoring anchor, the Deep-SVDD-style term every other
            # variant has and the VAE uniquely lacks — its cosine score
            # presumes normal latents concentrate around mean_vector, but
            # nothing in the reference ELBO makes them (diagnosed
            # structural sign-flipping, RESULTS.md round-5 "VAE
            # stabilization"). Gated on |mean_vector| > 0 so epoch 0
            # (anchor not yet computed) is unaffected.
            mv_norm = jnp.linalg.norm(mean_vector)
            mv_dir = mean_vector / (mv_norm + 1e-12)
            zdir = z_mean
            if cfg.model.distribution != "ps":  # 'ps' means are unit already
                zdir = z_mean / (
                    jnp.linalg.norm(z_mean, axis=-1, keepdims=True) + 1e-12)
            l_con = jnp.mean(1.0 - jnp.sum(zdir * mv_dir, axis=-1))
            gate = (mv_norm > 1e-6).astype(loss.dtype)
            loss = loss + opt.vae_contraction * gate * l_con
            metrics["vae_contraction_loss"] = l_con

    elif variant == "hyperbolic":
        z = variant_outputs
        z_h = hyp.project(hyp.expmap0(z))
        l_poincare = jnp.mean(hyp.dist(center, z_h))
        loss = l_poincare + opt.alpha * l_reg
        metrics["poincare_loss"] = l_poincare
        metrics["hyperlatent_norm"] = jnp.mean(jnp.linalg.norm(z_h, axis=-1))

    else:
        raise ValueError(f"Unknown variant {variant!r}")

    metrics["loss"] = loss
    return loss, metrics


def latent_of(variant: str, variant_outputs) -> jax.Array:
    """Extract the latent used for center/mean accumulation."""
    if variant in ("euclidean_static", "euclidean_dynamic", "hyperbolic"):
        return variant_outputs
    return variant_outputs[0]  # (z, recon[, dists])


def accumulate_stats(
    state_acc: Tuple[jax.Array, jax.Array, jax.Array],
    variant: str,
    distance: str,
    z: jax.Array,
    center: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Add one batch's shard-additive center/covariance statistics."""
    acc_vec, acc_weight, acc_outer = state_acc
    z = jax.lax.stop_gradient(z)
    if variant == "hyperbolic":
        z_h = hyp.project(hyp.expmap0(z))
        ws, w = hyp.streaming_midpoint_stats(z_h)
        acc_vec = acc_vec + ws
        acc_weight = acc_weight + jnp.squeeze(w)
    else:
        acc_vec = acc_vec + jnp.sum(z, axis=0)
        acc_weight = acc_weight + z.shape[0]
    if distance == "mahalanobis":
        outer, _ = euc.covariance_stats(z, center)
        acc_outer = acc_outer + outer
    return acc_vec, acc_weight, acc_outer


def window_scores(
    cfg: Config,
    z: jax.Array,
    center: jax.Array,
    inv_cov: jax.Array,
    mean_vector: jax.Array,
) -> jax.Array:
    """Per-window anomaly score in the variant's geometry. [B, D] -> [B]."""
    variant = cfg.model.variant
    if variant == "vae":
        return euc.cosine_distance_to_center(z, mean_vector)
    if variant == "hyperbolic":
        z_h = hyp.project(hyp.expmap0(z))
        return hyp.dist(z_h, center)
    if cfg.model.distance == "mahalanobis":
        return euc.mahalanobis(z, center, inv_cov)
    return euc.mse_to_center(z, center)
