"""End-to-end scoring parity: our vectorized pipeline vs the reference's
actual scoring loop (its eval_utils functions driving the eval_COSKAD.py
transform/clip/actor structure), fed identical synthetic latents.

This is the hard parity constraint of SURVEY.md section 7.3 item 1: the final
AUC must match to floating-point noise, including the scatter-at-(frame-1),
zeros->NaN->nanmean->0 round-trip, actor-max, shift-by-11 + sigma=30
smoothing, HR masking, and mean-over-transforms ordering.
"""

import os
import sys

import numpy as np
import pytest

from coskad_tpu.score.aggregate import ScoringConfig, evaluate_windows
from coskad_tpu.score.masks import AVENUE_MASKED_CLIPS

REFERENCE = "/root/reference"


def _reference_eval_utils():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if not hasattr(np, "int"):
        np.int = int
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch

    # The reference hardcodes .cuda(); run its scoring on CPU.
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    # eval_utils imports geoopt at module level; only its hyperbolic branch
    # needs it, which this test doesn't exercise — stub the module.
    if "geoopt" not in sys.modules:
        import types

        geoopt = types.ModuleType("geoopt")
        manifolds = types.ModuleType("geoopt.manifolds")
        stereographic = types.ModuleType("geoopt.manifolds.stereographic")
        gmath = types.ModuleType("geoopt.manifolds.stereographic.math")
        geoopt.manifolds = manifolds
        manifolds.stereographic = stereographic
        stereographic.math = gmath
        for name, mod in [
            ("geoopt", geoopt),
            ("geoopt.manifolds", manifolds),
            ("geoopt.manifolds.stereographic", stereographic),
            ("geoopt.manifolds.stereographic.math", gmath),
        ]:
            sys.modules[name] = mod
    import utils.eval_utils as ref_eval

    return ref_eval


def _synthetic_eval_inputs(rng, num_transform=3, clips=((1, 1), (1, 2)),
                           n_frames=300, latent=8, seg_len=12):
    """Latents + metadata shaped like a predict pass, plus ground truths."""
    gts = {}
    metas, transs, frames, zs = [], [], [], []
    for scene, clip in clips:
        gt = np.zeros(n_frames, dtype=int)
        lo = rng.integers(50, n_frames - 120)
        gt[lo : lo + 80] = 1
        gts[(scene, clip)] = gt
        for actor in (1, 2, 3):
            # staggered presence with a gap to exercise zero-coverage frames
            starts = list(range(actor, n_frames - seg_len, 1))
            del starts[40:70]
            for tr in range(num_transform):
                for s in starts:
                    z = rng.normal(size=latent) * (1 + 2 * gt[s - 1 : s - 1 + seg_len].mean())
                    zs.append(z)
                    metas.append([scene, clip, actor, s])
                    transs.append(tr)
                    frames.append(np.arange(s, s + seg_len))
    return (
        np.asarray(zs, np.float32),
        np.asarray(transs),
        np.asarray(metas),
        np.asarray(frames),
        gts,
    )


def _reference_scoring_loop(ref_eval, center, hidden, trans, meta, frames, gts,
                            num_transform, pad_size=-1,
                            avenue_masks=None):
    """Direct port of the reference's nested scoring loop
    (eval_COSKAD.py:140-253 / post_processing) using ITS functions."""
    import torch
    import torch.nn as nn
    from sklearn.metrics import roc_auc_score as sk_auc

    loss_fn = nn.MSELoss(reduction="none")
    c = torch.tensor(center)
    clip_keys = sorted(gts.keys())
    model_scores_transf, dataset_gt_transf = {}, {}
    for transformation in range(num_transform):
        cond = trans == transformation
        h_t, m_t, f_t = hidden[cond], meta[cond], frames[cond]
        model_scores, dataset_gt = [], []
        for scene_idx, clip_idx in clip_keys:
            gt = gts[(scene_idx, clip_idx)].copy()
            n_frames = gt.shape[0]
            cond_sc = (m_t[:, 0] == scene_idx) & (m_t[:, 1] == clip_idx)
            h_sc, m_sc, f_sc = h_t[cond_sc], m_t[cond_sc], f_t[cond_sc]
            figs = sorted(set(m_sc[:, 2]))
            per_person = []
            for fig in figs:
                cf = m_sc[:, 2] == fig
                loss_matrix = ref_eval.windows_based_loss_hy(
                    c, h_sc[cf], f_sc[cf], n_frames, loss_fn
                )
                loss_matrix = np.where(loss_matrix == 0.0, np.nan, loss_matrix)
                fig_loss = np.nanmean(loss_matrix, 0)
                fig_loss = np.where(np.isnan(fig_loss), 0, fig_loss)
                if pad_size != -1:
                    fig_loss = ref_eval.pad_scores(fig_loss, gt, pad_size)
                per_person.append(fig_loss)
            clip_score = np.amax(np.stack(per_person, 0), 0)
            if avenue_masks and clip_idx in avenue_masks:
                m = np.array(avenue_masks[clip_idx]) == 1
                clip_score = clip_score[m]
                gt = gt[m]
            clip_score = ref_eval.score_process(clip_score, win_size=50)
            model_scores.append(clip_score)
            dataset_gt.append(gt)
        model_scores_transf[transformation] = np.concatenate(model_scores, 0)
        dataset_gt_transf[transformation] = np.concatenate(dataset_gt, 0)
    pds = np.mean(np.stack(list(model_scores_transf.values()), 0), 0)
    gt_final = dataset_gt_transf[0]
    return sk_auc(gt_final, pds), pds, gt_final


@pytest.mark.parametrize("pad_size", [-1, 5])
def test_final_auc_matches_reference_loop(pad_size, rng):
    ref_eval = _reference_eval_utils()
    z, trans, meta, frames, gts = _synthetic_eval_inputs(rng)
    center = rng.normal(size=8).astype(np.float32) * 0.1

    scores = np.mean((z - center) ** 2, axis=-1)  # our device-side step, on host
    ours = evaluate_windows(
        scores, trans, meta, frames, gts,
        ScoringConfig(num_transform=3, pad_size=pad_size),
    )
    ref_auc, ref_pds, ref_gt = _reference_scoring_loop(
        ref_eval, center, z, trans, meta, frames, gts, 3, pad_size=pad_size
    )
    np.testing.assert_allclose(ours.scores, ref_pds, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(ours.gt, ref_gt)
    np.testing.assert_allclose(ours.auc, ref_auc, rtol=1e-9)


def test_final_auc_matches_with_avenue_masks(rng):
    """HR-Avenue clip-mask path (masked_clips table applied before smoothing)."""
    ref_eval = _reference_eval_utils()
    # clip ids 1 and 2 so the hardcoded Avenue masks apply; frame counts must
    # match the mask lengths (1439 and 1211).
    clips = ((1, 1), (1, 2))
    lens = {1: 1439, 2: 1211}
    gts, metas, transs, frames, zs = {}, [], [], [], []
    for scene, clip in clips:
        n = lens[clip]
        gt = np.zeros(n, int)
        gt[300:450] = 1
        gts[(scene, clip)] = gt
        for actor in (1, 2):
            for tr in range(2):
                for s in range(actor, n - 12, 3):
                    zs.append(rng.normal(size=8) * (1 + gt[s]))
                    metas.append([scene, clip, actor, s])
                    transs.append(tr)
                    frames.append(np.arange(s, s + 12))
    z = np.asarray(zs, np.float32)
    trans, meta, frames = np.asarray(transs), np.asarray(metas), np.asarray(frames)
    center = np.zeros(8, np.float32)
    scores = np.mean((z - center) ** 2, axis=-1)

    ours = evaluate_windows(
        scores, trans, meta, frames, gts,
        ScoringConfig(num_transform=2),
        avenue_clip_masks=AVENUE_MASKED_CLIPS,
    )
    from coskad_tpu.score import masks as our_masks

    ref_masks = {1: our_masks.V_01, 2: our_masks.V_02}
    ref_auc, ref_pds, ref_gt = _reference_scoring_loop(
        ref_eval, center, z, trans, meta, frames, gts, 2,
        avenue_masks=ref_masks,
    )
    np.testing.assert_allclose(ours.scores, ref_pds, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(ours.auc, ref_auc, rtol=1e-9)


def test_vae_cosine_scoring_matches_reference_loop(rng):
    """VAE eval scores 1 - cosine(z, mean_vector) through the reference's
    windows_based_loss_hy with its lambda loss_fn (eval_COSKAD.py:81,191)."""
    import torch
    import torch.nn.functional as F
    from sklearn.metrics import roc_auc_score as sk_auc

    ref_eval = _reference_eval_utils()
    z, trans, meta, frames, gts = _synthetic_eval_inputs(rng, num_transform=2)
    mean_vector = rng.normal(size=8).astype(np.float32)

    from coskad_tpu.geometry.euclidean import cosine_distance_to_center
    import jax.numpy as jnp

    scores = np.asarray(
        cosine_distance_to_center(jnp.asarray(z), jnp.asarray(mean_vector))
    )
    ours = evaluate_windows(
        scores, trans, meta, frames, gts, ScoringConfig(num_transform=2)
    )

    loss_fn = lambda x, y: torch.unsqueeze(1 - F.cosine_similarity(x, y), dim=-1)
    mv = torch.tensor(mean_vector)
    clip_keys = sorted(gts.keys())
    per_t_scores, per_t_gt = [], []
    for t in range(2):
        cond = trans == t
        h_t, m_t, f_t = z[cond], meta[cond], frames[cond]
        cs, cg = [], []
        for scene, clip in clip_keys:
            gt = gts[(scene, clip)]
            sel = (m_t[:, 0] == scene) & (m_t[:, 1] == clip)
            h_sc, m_sc, f_sc = h_t[sel], m_t[sel], f_t[sel]
            rows = []
            for fig in sorted(set(m_sc[:, 2])):
                cf = m_sc[:, 2] == fig
                lm = ref_eval.windows_based_loss_hy(mv, h_sc[cf], f_sc[cf],
                                                    len(gt), loss_fn)
                lm = np.where(lm == 0.0, np.nan, lm)
                fl = np.nanmean(lm, 0)
                rows.append(np.where(np.isnan(fl), 0, fl))
            clip_score = ref_eval.score_process(np.amax(np.stack(rows), 0))
            cs.append(clip_score)
            cg.append(gt)
        per_t_scores.append(np.concatenate(cs))
        per_t_gt.append(np.concatenate(cg))
    ref_pds = np.mean(np.stack(per_t_scores), 0)
    ref_auc = sk_auc(per_t_gt[0], ref_pds)
    np.testing.assert_allclose(ours.scores, ref_pds, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(ours.auc, ref_auc, rtol=1e-9)


def test_mahalanobis_scoring_matches_reference_loop(rng):
    """Mahalanobis eval path (windows_based_loss_mahalanobis,
    utils/eval_utils.py:41-54) vs our device-side mahalanobis scores."""
    import torch
    from sklearn.metrics import roc_auc_score as sk_auc

    ref_eval = _reference_eval_utils()
    z, trans, meta, frames, gts = _synthetic_eval_inputs(rng, num_transform=2)
    center = rng.normal(size=8).astype(np.float32) * 0.1
    a = rng.normal(size=(8, 8)).astype(np.float32)
    inv_cov = (a @ a.T + np.eye(8)).astype(np.float32)

    from coskad_tpu.geometry.euclidean import mahalanobis
    import jax.numpy as jnp

    scores = np.asarray(
        mahalanobis(jnp.asarray(z), jnp.asarray(center), jnp.asarray(inv_cov))
    )
    ours = evaluate_windows(
        scores, trans, meta, frames, gts, ScoringConfig(num_transform=2)
    )

    c_t, vi_t = torch.tensor(center), torch.tensor(inv_cov)
    clip_keys = sorted(gts.keys())
    per_t_scores, per_t_gt = [], []
    for t in range(2):
        cond = trans == t
        h_t, m_t, f_t = z[cond], meta[cond], frames[cond]
        cs, cg = [], []
        for scene, clip in clip_keys:
            gt = gts[(scene, clip)]
            sel = (m_t[:, 0] == scene) & (m_t[:, 1] == clip)
            h_sc, m_sc, f_sc = h_t[sel], m_t[sel], f_t[sel]
            rows = []
            for fig in sorted(set(m_sc[:, 2])):
                cf = m_sc[:, 2] == fig
                lm = ref_eval.windows_based_loss_mahalanobis(
                    c_t, h_sc[cf], vi_t, f_sc[cf], len(gt)
                )
                lm = np.where(lm == 0.0, np.nan, lm)
                fl = np.nanmean(lm, 0)
                rows.append(np.where(np.isnan(fl), 0, fl))
            clip_score = ref_eval.score_process(np.amax(np.stack(rows), 0))
            cs.append(clip_score)
            cg.append(gt)
        per_t_scores.append(np.concatenate(cs))
        per_t_gt.append(np.concatenate(cg))
    ref_pds = np.mean(np.stack(per_t_scores), 0)
    ref_auc = sk_auc(per_t_gt[0], ref_pds)
    np.testing.assert_allclose(ours.scores, ref_pds, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(ours.auc, ref_auc, rtol=1e-9)
