"""Property-fuzz of the SCORING pipeline against the reference's own eval
loop (sibling of tests/test_data_fuzz.py; NEXT round-6 item 3 pulled into
round 5). The fixed-fixture parity tests pin the common path at 1e-9
(tests/test_scoring_parity_reference.py); this fuzz randomizes everything
the aggregation is sensitive to — clip/actor structure, staggered presence
with gaps, window stride, exact-zero window scores (the zeros->NaN->
nanmean->0 round-trip), pad_size, transform count, HR boolean masks — and
asserts the final score vector, gt assembly and AUC still match the
reference loop to float noise. Seeds printed for replay.
"""

import numpy as np
import pytest

from test_scoring_parity_reference import (
    _reference_eval_utils,
    _reference_scoring_loop,
)

from coskad_tpu.score.aggregate import ScoringConfig, evaluate_windows


def _fuzz_eval_inputs(rng, latent=6, seg_len=12):
    """Randomized predict-pass shaped inputs + ground truths + HR masks."""
    num_transform = int(rng.integers(1, 6))
    n_scenes = int(rng.integers(1, 4))
    gts, hr_masks = {}, {}
    metas, transs, frames, zs = [], [], [], []
    center = rng.normal(size=latent).astype(np.float64) * 0.1
    any_window = False
    for scene in range(1, n_scenes + 1):
        for clip in range(1, int(rng.integers(1, 3)) + 1):
            n_frames = int(rng.integers(10 * seg_len, 400))
            gt = np.zeros(n_frames, dtype=int)
            lo = int(rng.integers(0, n_frames - seg_len))
            gt[lo: lo + int(rng.integers(10, 100))] = 1
            gts[(scene, clip)] = gt
            if rng.random() < 0.4:  # HR boolean mask for this clip
                m = rng.random(n_frames) > 0.15
                m[:3] = True  # keep some frames regardless
                hr_masks[(scene, clip)] = m
            stride = int(rng.integers(1, 5))
            n_actors = int(rng.integers(1, 5))
            clip_has = False
            for actor in range(1, n_actors + 1):
                start = int(rng.integers(1, 6))
                starts = list(range(start, n_frames - seg_len, stride))
                if rng.random() < 0.5 and len(starts) > 20:  # absence gap
                    g0 = int(rng.integers(0, len(starts) - 10))
                    del starts[g0: g0 + int(rng.integers(3, 15))]
                if rng.random() < 0.2:  # sparse actor: a handful of windows
                    starts = starts[:: max(len(starts) // 3, 1)]
                if not starts:
                    continue
                clip_has = True
                for tr in range(num_transform):
                    for s in starts:
                        amp = 1 + 2 * gt[s - 1: s - 1 + seg_len].mean()
                        z = rng.normal(size=latent) * amp
                        if rng.random() < 0.03:
                            # exact-zero window score: the reference treats
                            # 0.0 as "no observation" (zeros->NaN)
                            z = center.copy()
                        zs.append(z)
                        metas.append([scene, clip, actor, s])
                        transs.append(tr)
                        frames.append(np.arange(s, s + seg_len))
            if not clip_has:
                # the reference loop crashes on a clip with zero windows
                # (np.stack of an empty actor list); keep the draw valid
                del gts[(scene, clip)]
                hr_masks.pop((scene, clip), None)
            else:
                any_window = True
    assert any_window
    return (np.asarray(zs, np.float64), np.asarray(transs),
            np.asarray(metas), np.asarray(frames), gts, hr_masks,
            num_transform, center)


def _reference_loop_with_hr(ref_eval, center, hidden, trans, meta, frames,
                            gts, num_transform, pad_size, hr_masks):
    """The shared oracle loop, extended with the reference's HR-mask step
    (clip_score/gt sliced AFTER actor-max, BEFORE score_process —
    /root/reference/eval_COSKAD.py:213-217)."""
    if not hr_masks:
        return _reference_scoring_loop(
            ref_eval, center, hidden, trans, meta, frames, gts,
            num_transform, pad_size=pad_size)
    import torch
    import torch.nn as nn
    from sklearn.metrics import roc_auc_score as sk_auc

    loss_fn = nn.MSELoss(reduction="none")
    c = torch.tensor(center)
    clip_keys = sorted(gts.keys())
    scores_t, gt_t = {}, {}
    for transformation in range(num_transform):
        cond = trans == transformation
        h_t, m_t, f_t = hidden[cond], meta[cond], frames[cond]
        model_scores, dataset_gt = [], []
        for scene_idx, clip_idx in clip_keys:
            gt = gts[(scene_idx, clip_idx)].copy()
            n_frames = gt.shape[0]
            cond_sc = (m_t[:, 0] == scene_idx) & (m_t[:, 1] == clip_idx)
            h_sc, m_sc, f_sc = h_t[cond_sc], m_t[cond_sc], f_t[cond_sc]
            per_person = []
            for fig in sorted(set(m_sc[:, 2])):
                cf = m_sc[:, 2] == fig
                lm = ref_eval.windows_based_loss_hy(
                    c, h_sc[cf], f_sc[cf], n_frames, loss_fn)
                lm = np.where(lm == 0.0, np.nan, lm)
                fl = np.nanmean(lm, 0)
                fl = np.where(np.isnan(fl), 0, fl)
                if pad_size != -1:
                    fl = ref_eval.pad_scores(fl, gt, pad_size)
                per_person.append(fl)
            clip_score = np.amax(np.stack(per_person, 0), 0)
            if (scene_idx, clip_idx) in hr_masks:
                m = hr_masks[(scene_idx, clip_idx)]
                clip_score = clip_score[m]
                gt = gt[m]
            clip_score = ref_eval.score_process(clip_score, win_size=50)
            model_scores.append(clip_score)
            dataset_gt.append(gt)
        scores_t[transformation] = np.concatenate(model_scores, 0)
        gt_t[transformation] = np.concatenate(dataset_gt, 0)
    pds = np.mean(np.stack(list(scores_t.values()), 0), 0)
    gt_final = gt_t[0]
    return sk_auc(gt_final, pds), pds, gt_final


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_scoring_pipeline_matches_reference(seed):
    ref_eval = _reference_eval_utils()
    rng = np.random.default_rng(981_000 + seed)
    (z, trans, meta, frames, gts, hr_masks, num_transform,
     center) = _fuzz_eval_inputs(rng)
    pad_size = int(rng.choice([-1, -1, 2, 5, 9]))
    msg = f"seed={981_000 + seed} k={num_transform} pad={pad_size} " \
          f"clips={len(gts)} hr={len(hr_masks)} windows={len(z)}"

    scores = np.mean((z - center) ** 2, axis=-1)
    ours = evaluate_windows(
        scores, trans, meta, frames, gts,
        ScoringConfig(num_transform=num_transform, pad_size=pad_size),
        hr_clip_masks=hr_masks,
    )
    ref_auc, ref_pds, ref_gt = _reference_loop_with_hr(
        ref_eval, center, z, trans, meta, frames, gts, num_transform,
        pad_size, hr_masks)
    np.testing.assert_allclose(ours.scores, ref_pds, rtol=1e-6, atol=1e-9,
                               err_msg=msg)
    np.testing.assert_array_equal(ours.gt, ref_gt, err_msg=msg)
    np.testing.assert_allclose(ours.auc, ref_auc, rtol=1e-9, err_msg=msg)
