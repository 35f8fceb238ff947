"""Scoring stack: AUC vs sklearn, Gaussian smoothing vs scipy, the
window->frame scatter vs a direct port of the reference's loop semantics,
pad_scores interval logic, and the end-to-end aggregation."""

import numpy as np
import pytest

from coskad_tpu.score import aggregate, auc, frames, smoothing


# ---------------------------------------------------------------- AUC


@pytest.mark.parametrize("seed", range(5))
def test_auc_matches_sklearn(seed):
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, 500)
    y[0], y[1] = 0, 1  # both classes present
    # include ties
    s = np.round(rng.normal(size=500), 1)
    np.testing.assert_allclose(
        auc.roc_auc_score(y, s), sk.roc_auc_score(y, s), rtol=1e-12
    )


def test_auc_perfect_and_chance():
    y = np.array([0, 0, 1, 1])
    assert auc.roc_auc_score(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert auc.roc_auc_score(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert auc.roc_auc_score(y, np.array([0.5, 0.5, 0.5, 0.5])) == 0.5


def test_roc_curve_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(7)
    y = rng.integers(0, 2, 200)
    y[:2] = [0, 1]
    s = np.round(rng.normal(size=200), 2)
    fpr_r, tpr_r, _ = sk.roc_curve(y, s, drop_intermediate=False)
    fpr_o, tpr_o, _ = auc.roc_curve(y, s)
    np.testing.assert_allclose(fpr_o, fpr_r)
    np.testing.assert_allclose(tpr_o, tpr_r)


# ---------------------------------------------------------------- smoothing


@pytest.mark.parametrize("n", [40, 200, 1500])
def test_gaussian_filter_matches_scipy(n):
    scipy_nd = pytest.importorskip("scipy.ndimage")
    x = np.random.default_rng(n).normal(size=n)
    ref = scipy_nd.gaussian_filter1d(x, 30)
    ours = smoothing.gaussian_filter1d(x, 30)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_score_process_matches_reference_semantics():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    score = np.random.default_rng(3).random(500)
    shifted = np.zeros_like(score)
    shift = 8 + (8 // 2) - 1
    shifted[shift:] = score[:-shift]
    ref = scipy_nd.gaussian_filter1d(shifted, 30)
    np.testing.assert_allclose(smoothing.score_process(score), ref, rtol=1e-10)


# ---------------------------------------------------------------- scatter


def _reference_windows_based(losses, frames_fig, n_frames):
    """Direct port of the reference loop (utils/eval_utils.py:57-74 +
    eval_COSKAD.py:201-203) used as a semantic oracle."""
    w = len(losses)
    pose = np.zeros((w, n_frames))
    for n in range(w):
        pose[n, frames_fig[n] - 1] = losses[n]
    pose = np.where(pose == 0.0, np.nan, pose)
    out = np.nanmean(pose, 0)
    return np.where(np.isnan(out), 0, out)


@pytest.mark.parametrize("seed", range(3))
def test_actor_frame_scores_matches_reference_loop(seed):
    rng = np.random.default_rng(seed)
    n_frames, t = 60, 12
    n_windows = 25
    losses = rng.random(n_windows) + 0.01
    losses[3] = 0.0  # exact-zero score treated as missing
    starts = rng.integers(1, n_frames - t, n_windows)
    frame_ids = starts[:, None] + np.arange(t)[None, :]

    ref = _reference_windows_based(losses, frame_ids, n_frames)
    ours = frames.actor_frame_scores(
        losses, np.zeros(n_windows, int), frame_ids, n_frames, 1
    )[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_actor_frame_scores_multi_actor():
    rng = np.random.default_rng(11)
    n_frames, t = 40, 5
    losses = rng.random(10) + 0.1
    actor = np.array([0] * 5 + [1] * 5)
    starts = rng.integers(1, n_frames - t, 10)
    frame_ids = starts[:, None] + np.arange(t)[None, :]
    ours = frames.actor_frame_scores(losses, actor, frame_ids, n_frames, 2)
    for a in range(2):
        ref = _reference_windows_based(losses[actor == a], frame_ids[actor == a], n_frames)
        np.testing.assert_allclose(ours[a], ref, rtol=1e-12)


def test_actor_frame_scores_multi_bit_equals_single():
    """The batched K-transform scatter (aggregate hot path) must be
    BIT-identical per transform to the single-transform call — same
    bincount element order per segment, so identical float accumulation."""
    rng = np.random.default_rng(7)
    n_frames, t, w, k = 55, 8, 40, 5
    actor = rng.integers(0, 3, w)
    starts = rng.integers(0, n_frames - t + 2, w)  # some run out of bounds
    frame_ids = starts[:, None] + np.arange(t)[None, :]
    scores = rng.random((k, w)) + 0.01
    scores[0, 4] = 0.0  # exact-zero = missing, per-transform validity
    scores[2, 9] = 0.0
    multi = frames.actor_frame_scores_multi(scores, actor, frame_ids,
                                            n_frames, 3)
    for i in range(k):
        single = frames.actor_frame_scores(scores[i], actor, frame_ids,
                                           n_frames, 3)
        np.testing.assert_array_equal(multi[i], single)


# ---------------------------------------------------------------- pad_scores


def _reference_pad_scores(fig_reconstruction_loss, gt_len, pad_size):
    """Direct port of reference utils/eval_utils.py:210-248 as oracle."""

    def ranges(nums):
        nums = sorted(set(nums))
        gaps = [[s, e] for s, e in zip(nums, nums[1:]) if s + 1 < e]
        edges = iter(nums[:1] + sum(gaps, []) + nums[-1:])
        return list(zip(edges, edges))

    out = fig_reconstruction_loss.copy()
    zero_interval = set(range(gt_len - 1)) - set(np.nonzero(out)[0])
    nope = []
    for interval in ranges(zero_interval):
        start, end = interval
        if start == 0 and end == gt_len - 2:
            continue
        elif start == 0 and end != gt_len - 2:
            nope.append((start, min(end + pad_size, gt_len)))
        elif start != 0 and end == gt_len - 2:
            nope.append((max(start - pad_size, 0), end))
        else:
            nope.append((max(start - pad_size, 0), min(end + pad_size, gt_len)))
    for interval in nope:
        out[range(interval[0], interval[1])] = 0
    return out


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("pad", [2, 5, 10])
def test_pad_scores_matches_reference(seed, pad):
    rng = np.random.default_rng(seed)
    n = 80
    scores = rng.random(n)
    # Carve some absence intervals, including boundary-touching ones.
    scores[:5] = 0.0 if seed % 2 else scores[:5]
    scores[20:30] = 0.0
    scores[70:] = 0.0 if seed % 3 else scores[70:]
    ref = _reference_pad_scores(scores.copy(), n, pad)
    ours = frames.pad_scores(scores, n, pad)
    np.testing.assert_allclose(ours, ref)


def test_pad_scores_all_absent_untouched():
    scores = np.zeros(50)
    out = frames.pad_scores(scores, 50, 5)
    np.testing.assert_allclose(out, scores)


# ---------------------------------------------------------------- end-to-end


def test_evaluate_windows_anomaly_detected():
    """Synthetic sanity: windows over anomalous frames score higher ->
    AUC far above chance; also exercises multi-transform averaging."""
    rng = np.random.default_rng(0)
    n_frames = 200
    gt = np.zeros(n_frames, dtype=int)
    gt[100:140] = 1
    t = 12
    num_t = 2
    starts = np.arange(1, n_frames - t, 1)
    n_w = len(starts)
    metas, transs, scoress, frames_list = [], [], [], []
    for tr in range(num_t):
        for s in starts:
            is_anom = gt[s - 1 : s - 1 + t].any()
            metas.append([1, 1, 7, s])
            transs.append(tr)
            scoress.append(rng.random() * 0.1 + (1.0 if is_anom else 0.1))
            frames_list.append(np.arange(s, s + t))
    res = aggregate.evaluate_windows(
        np.asarray(scoress),
        np.asarray(transs),
        np.asarray(metas),
        np.asarray(frames_list),
        {(1, 1): gt},
        aggregate.ScoringConfig(num_transform=num_t),
    )
    assert res.auc > 0.9
    assert len(res.per_transform_auc) == num_t
    assert res.scores.shape == (n_frames,)


def test_evaluate_windows_empty_clip_with_large_id_no_key_collision():
    """A gt clip with NO detected windows whose id exceeds every detected
    clip id must stay empty (score 0), not alias another group's composite
    sort key and steal its windows."""
    rng = np.random.default_rng(3)
    t, n_frames = 12, 200
    gt_anom = np.zeros(n_frames, dtype=int)
    gt_anom[100:140] = 1
    # Detected windows only for (scene=3, clip=4). With multipliers taken
    # from meta alone, scene_mult = 4+1 = 5 and the window-less gt clip
    # (2, 9) collides exactly: 2*5+9 == 3*5+4 == 19 — it would be served
    # clip (3, 4)'s windows.
    starts = np.arange(1, n_frames - t)
    metas = [[3, 4, 0, s] for s in starts]
    frames_l = [np.arange(s, s + t) for s in starts]
    scores = np.array([1.0 if gt_anom[s - 1 : s - 1 + t].any() else 0.1
                       for s in starts])
    trans = np.zeros(len(starts), dtype=int)
    gts = {(3, 4): gt_anom, (2, 9): np.r_[np.zeros(30, int), 1]}
    res = aggregate.evaluate_windows(
        scores, trans, np.asarray(metas), np.asarray(frames_l), gts,
        aggregate.ScoringConfig(num_transform=1))
    # clip keys iterate sorted: the empty (2, 9) clip comes first and must
    # contribute all-zero scores for its 31 frames
    assert res.scores.shape == (31 + n_frames,)
    np.testing.assert_allclose(res.scores[:31], 0.0)
    # and the real clip still detects its anomaly span
    assert res.per_clip_auc[(3, 4)] > 0.9


def test_hr_ubnormal_mask_loading(tmp_path):
    from coskad_tpu.score.masks import hr_ubnormal

    np.save(tmp_path / "3_7.npy", np.array([1, 0, 1], dtype=np.uint8))
    np.save(tmp_path / "12_4.npy", np.array([0, 0], dtype=np.uint8))
    masks = hr_ubnormal(str(tmp_path / "*"))
    assert set(masks) == {(3, 7), (12, 4)}
    assert masks[(3, 7)].dtype == bool
    np.testing.assert_array_equal(masks[(3, 7)], [True, False, True])


def test_hr_glob_derived_from_reference_yaml():
    from coskad_tpu.config import from_reference_dict

    cfg = from_reference_dict({
        "use_hr": True, "split": "test", "data_dir": "/data/UBnormal",
    })
    assert cfg.eval.hr_masks_glob == \
        "/data/UBnormal/hr_bool_masks/testing/test_frame_mask/*"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_evaluate_windows_matches_naive_masks(seed):
    """Differential check: the lexsort+searchsorted fast path produces
    byte-identical results to a naive boolean-mask implementation on random
    ragged inputs (uneven clips, missing (transform, clip) groups, empty
    clips, HR + Avenue masks, pad_scores on)."""
    rng = np.random.default_rng(seed)
    t, num_t = 8, 3
    clip_keys = [(1, 1), (1, 3), (2, 2), (2, 7)]
    gts, rows = {}, []
    for s, c in clip_keys:
        nf = int(rng.integers(160, 260))
        gt = np.zeros(nf, dtype=int)
        a0 = int(rng.integers(20, nf - 60))
        gt[a0 : a0 + 40] = 1
        gts[(s, c)] = gt
        if (s, c) == (2, 7):
            continue  # one clip with zero detections
        for tr in range(num_t):
            if (s, c) == (1, 3) and tr == 1:
                continue  # one missing (transform, clip) group
            for actor in rng.choice(10, size=rng.integers(1, 4), replace=False):
                for st in range(1, nf - t, 2):
                    rows.append((tr, s, c, int(actor), st,
                                 float(rng.random()) * (2.0 if gt[st - 1] else 1.0)))
    rng.shuffle(rows)
    trans = np.array([r[0] for r in rows])
    meta = np.array([[r[1], r[2], r[3], r[4]] for r in rows])
    frames_arr = np.array([np.arange(r[4], r[4] + t) for r in rows])
    scores = np.array([r[5] for r in rows])

    hr = {(1, 1): rng.random(len(gts[(1, 1)])) > 0.2}
    avenue = {2: rng.random(len(gts[(2, 2)])) > 0.1}
    cfg = aggregate.ScoringConfig(num_transform=num_t, pad_size=4)

    def naive(ws, tr_arr, m, f, g, c, hr_m, av_m):
        from coskad_tpu.score.smoothing import score_process
        keys = sorted(g.keys())
        per_t_scores, per_t_gt = [], []
        for transformation in range(c.num_transform):
            cs_list, gt_list = [], []
            for (si, ci) in keys:
                gt_ = np.asarray(g[(si, ci)])
                nf = gt_.shape[0]
                mask = (tr_arr == transformation) & (m[:, 0] == si) & (m[:, 1] == ci)
                if not mask.any():
                    cscore = np.zeros(nf)
                else:
                    fig = np.unique(m[mask][:, 2])
                    dense = np.searchsorted(fig, m[mask][:, 2])
                    pa = frames.actor_frame_scores(ws[mask], dense, f[mask], nf, len(fig))
                    pa = np.stack([frames.pad_scores(r_, nf, c.pad_size) for r_ in pa])
                    cscore = np.amax(pa, axis=0)
                if (si, ci) in hr_m:
                    cscore, gt_ = cscore[hr_m[(si, ci)]], gt_[hr_m[(si, ci)]]
                elif ci in av_m:
                    cscore, gt_ = cscore[av_m[ci]], gt_[av_m[ci]]
                cs_list.append(score_process(cscore, c.smoothing_sigma, c.shift))
                gt_list.append(gt_)
            per_t_scores.append(np.concatenate(cs_list))
            per_t_gt.append(np.concatenate(gt_list))
        return np.mean(np.stack(per_t_scores), 0), per_t_gt[0]

    res = aggregate.evaluate_windows(scores, trans, meta, frames_arr, gts,
                                     cfg, hr_clip_masks=hr,
                                     avenue_clip_masks=avenue)
    want_scores, want_gt = naive(scores, trans, meta, frames_arr, gts, cfg,
                                 hr, avenue)
    np.testing.assert_array_equal(res.scores, want_scores)
    np.testing.assert_array_equal(res.gt, want_gt)


@pytest.mark.parametrize("seed", [0, 3])
def test_evaluate_windows_shared_meta_matches_tiled(seed):
    """The shared-meta fast path (base [NW] meta/frames + transform-major
    scores, what the CLI/validate call sites pass) is byte-identical to the
    general tiled form, including per-clip AUCs."""
    rng = np.random.default_rng(seed)
    t, num_t = 8, 3
    clip_keys = [(1, 1), (1, 2), (3, 4)]
    gts, rows = {}, []
    for s, c in clip_keys:
        nf = int(rng.integers(120, 200))
        gt = np.zeros(nf, dtype=int)
        gt[30:70] = 1
        gts[(s, c)] = gt
        for actor in range(int(rng.integers(1, 4))):
            for st in range(1, nf - t, 3):
                rows.append((s, c, actor, st))
    meta_b = np.array([[r[0], r[1], r[2], r[3]] for r in rows])
    frames_b = np.array([np.arange(r[3], r[3] + t) for r in rows])
    nw = len(rows)
    scores = rng.random(nw * num_t) + 0.01
    cfg = aggregate.ScoringConfig(num_transform=num_t, pad_size=3)

    tiled = aggregate.evaluate_windows(
        scores, np.repeat(np.arange(num_t), nw),
        np.tile(meta_b, (num_t, 1)), np.tile(frames_b, (num_t, 1)),
        gts, cfg)
    shared = aggregate.evaluate_windows(
        scores, None, meta_b, frames_b, gts, cfg)
    np.testing.assert_array_equal(tiled.scores, shared.scores)
    np.testing.assert_array_equal(tiled.gt, shared.gt)
    assert tiled.per_clip_auc_all == shared.per_clip_auc_all
    assert tiled.per_transform_auc == shared.per_transform_auc


def test_builtin_avenue_mask_length_mismatch_clear_error():
    """Built-in HR-Avenue masks are keyed by clip id alone; non-Avenue data
    reusing those ids must fail with an explanatory ValueError, not an
    opaque boolean-index mismatch (found by the real-data runbook smoke:
    synthetic 120-frame clips under dataset_choice HR-Avenue)."""
    import pytest

    from coskad_tpu.score.masks import AVENUE_MASKED_CLIPS

    clip_id = sorted(AVENUE_MASKED_CLIPS)[0]
    n_frames = 50  # much shorter than any real Avenue test clip
    gt = np.zeros(n_frames, dtype=int)
    gt[10:20] = 1
    t = 12
    starts = np.arange(1, n_frames - t, 1)
    meta = np.asarray([[1, clip_id, 7, s] for s in starts])
    frames = np.asarray([np.arange(s, s + t) for s in starts])
    scores = np.linspace(0.1, 1.0, len(starts))
    with pytest.raises(ValueError, match="HR-Avenue mask"):
        aggregate.evaluate_windows(
            scores, np.zeros(len(starts), int), meta, frames,
            {(1, clip_id): gt},
            aggregate.ScoringConfig(num_transform=1),
            avenue_clip_masks=AVENUE_MASKED_CLIPS,
        )


def test_smoothing_handles_empty_and_short_inputs():
    """gaussian_filter1d/score_process on zero-length and shorter-than-
    radius vectors: scipy-equal, and no infinite reflect-pad loop (the
    empty case previously never returned; round-5 soak finding)."""
    import scipy.ndimage as ndi

    from coskad_tpu.score.smoothing import gaussian_filter1d, score_process

    assert gaussian_filter1d(np.zeros(0), 30.0).shape == (0,)
    assert score_process(np.zeros(0)).shape == (0,)
    for n in (1, 2, 5, 40):
        x = np.sin(np.arange(n)).astype(np.float64)
        np.testing.assert_allclose(
            gaussian_filter1d(x, 30.0), ndi.gaussian_filter1d(x, 30.0),
            rtol=1e-12, atol=1e-15)
