"""Serving API: checkpoint -> scorer -> per-frame scores."""

import os

import numpy as np
import pytest

from fixtures import make_synthetic_dataset


def test_anomaly_scorer_end_to_end(tmp_path):
    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.serve import AnomalyScorer, config_from_snapshot

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1, n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", "2"])
    ckpt = os.path.join(str(tmp_path), "checkpoints", "Synthetic", "smoke",
                        "best.ckpt")

    cfg = config_from_snapshot(ckpt + ".config.json")
    assert cfg.model.variant == "euclidean_static"
    assert cfg.data.seg_len == 12

    scorer = AnomalyScorer.from_checkpoint(ckpt)

    # window-level scoring
    rng = np.random.default_rng(0)
    windows = rng.normal(size=(20, 3, 12, 18)).astype(np.float32)
    s = scorer.score_windows(windows)
    assert s.shape == (20,) and np.isfinite(s).all() and (s >= 0).all()

    # clip-level scoring on a test clip with a planted anomaly span
    clip_json = os.path.join(str(tmp_path), "pose", "testing",
                             sorted(os.listdir(os.path.join(str(tmp_path), "pose", "testing")))[0])
    gt = np.load(os.path.join(str(tmp_path), "gt", "01_0001.npy"))
    frame_scores = scorer.score_clip_json(clip_json, n_frames=len(gt))
    assert frame_scores.shape == (len(gt),)
    from coskad_tpu.score.auc import roc_auc_score

    auc = roc_auc_score(gt, frame_scores)
    assert auc > 0.6  # trained 2 epochs; must beat chance clearly


def test_scorer_robust_normalization_uses_checkpoint_scaler(tmp_path):
    """Serving a robust-normalization model applies the checkpoint's fitted
    scaler to incoming clips."""
    import yaml

    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.serve import AnomalyScorer

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    raw = yaml.safe_load(open(cfg_path))
    raw["dataset_normalization_strategy"] = "robust"
    raw["dataset_sub_mean"] = False
    yaml.safe_dump(raw, open(cfg_path, "w"))
    train_cli.main(["--config", cfg_path, "--epochs", "1"])
    ckpt = os.path.join(str(tmp_path), "checkpoints", "Synthetic", "smoke",
                        "best.ckpt")
    scorer = AnomalyScorer.from_checkpoint(ckpt)
    assert scorer.scaler is not None  # restored from the checkpoint
    clip_json = os.path.join(
        str(tmp_path), "pose", "testing",
        sorted(os.listdir(os.path.join(str(tmp_path), "pose", "testing")))[0])
    gt = np.load(os.path.join(str(tmp_path), "gt", "01_0001.npy"))
    scores = scorer.score_clip_json(clip_json, n_frames=len(gt))
    assert scores.shape == (len(gt),) and np.isfinite(scores).all()


def test_score_clip_json_empty_clip_and_pad(tmp_path):
    """A clip with no tracked people returns zeros (with n_frames) or a
    clear error (without); pad_size from the config is applied like
    offline eval (reference eval_COSKAD.py:179-183)."""
    import dataclasses
    import json

    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.serve import AnomalyScorer, config_from_snapshot

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", "1"])
    ckpt = os.path.join(str(tmp_path), "checkpoints", "Synthetic", "smoke",
                        "best.ckpt")
    scorer = AnomalyScorer.from_checkpoint(ckpt)

    empty = tmp_path / "empty_tracked.json"
    empty.write_text(json.dumps({}))
    scores = scorer.score_clip_json(str(empty), n_frames=40)
    assert scores.shape == (40,) and (scores == 0).all()
    with pytest.raises(ValueError, match="no tracked people"):
        scorer.score_clip_json(str(empty))

    # pad_size path: a padded scorer still returns a full-length vector
    cfg2 = dataclasses.replace(
        scorer.cfg, eval=dataclasses.replace(scorer.cfg.eval, pad_size=5))
    scorer2 = AnomalyScorer.from_checkpoint(ckpt, cfg=cfg2)
    clip_json = os.path.join(
        str(tmp_path), "pose", "testing",
        sorted(os.listdir(os.path.join(str(tmp_path), "pose", "testing")))[0])
    gt = np.load(os.path.join(str(tmp_path), "gt", "01_0001.npy"))
    out = scorer2.score_clip_json(clip_json, n_frames=len(gt))
    assert out.shape == (len(gt),) and np.isfinite(out).all()


def test_serve_cli_batch_scores_without_gt(tmp_path):
    """The GT-free batch entry point (cli/serve.py): score a directory of
    clip JSONs off one checkpoint, write per-clip arrays, and report
    per-clip failures without aborting the batch."""
    import json

    from coskad_tpu.cli import serve as serve_cli
    from coskad_tpu.cli import train as train_cli

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=2)
    train_cli.main(["--config", cfg_path, "--epochs", "1"])
    ckpt = os.path.join(str(tmp_path), "checkpoints", "Synthetic", "smoke",
                        "best.ckpt")
    clips_dir = os.path.join(str(tmp_path), "pose", "testing")
    out = tmp_path / "scores"

    rc = serve_cli.main(["--ckpt", ckpt, "--clips-dir", clips_dir,
                         "--out", str(out),
                         "--n-frames-from-gt",
                         os.path.join(str(tmp_path), "gt")])
    assert rc == 0
    arrays = sorted(os.listdir(out))
    assert len(arrays) == 2 and all(a.endswith("_scores.npy") for a in arrays)
    gt = np.load(os.path.join(str(tmp_path), "gt", "01_0001.npy"))
    scores = np.load(out / arrays[0])
    assert scores.shape == (len(gt),) and np.isfinite(scores).all()

    # The CLI's output must equal the library call (same ckpt, same clip).
    from coskad_tpu.serve import AnomalyScorer

    scorer = AnomalyScorer.from_checkpoint(ckpt)
    clip0 = os.path.join(clips_dir, sorted(os.listdir(clips_dir))[0])
    np.testing.assert_allclose(
        scores, scorer.score_clip_json(clip0, n_frames=len(gt)), atol=1e-6)

    # JSON output mode + a bad clip in the batch -> exit 1, others scored.
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    rc = serve_cli.main(["--ckpt", ckpt, str(bad), clip0, "--out",
                         str(out), "--json", "--n-frames", str(len(gt))])
    assert rc == 1
    stem = os.path.basename(clip0)[: -len("_alphapose_tracked_person.json")] \
        if clip0.endswith("_alphapose_tracked_person.json") \
        else os.path.basename(clip0)[:-len(".json")]
    data = json.load(open(out / f"{stem}_scores.json"))
    assert len(data) == len(gt)


def test_robust_preprocessing_without_scaler_is_rejected():
    """A robust-normalized scorer with no fitted scaler must refuse to
    preprocess windows: fitting quantiles on each request's batch would
    score every request in its own coordinate system (round-5 review;
    streaming already hard-errors on the same condition)."""
    import dataclasses

    import pytest

    from coskad_tpu.serve import AnomalyScorer
    from helpers import tiny_config

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, normalization_strategy="robust", normalize_pose=True))
    from coskad_tpu.train.loop import Trainer
    from coskad_tpu.data.windows import SegmentDataset

    dummy = SegmentDataset(
        data=np.zeros((1, 3, cfg.data.seg_len, cfg.data.n_joints), np.float32),
        meta=np.zeros((1, 4), np.int64),
        frame_ids=np.zeros((1, cfg.data.seg_len), np.int32),
        num_transform=1,
    )
    trainer = Trainer(cfg, dummy)
    scorer = AnomalyScorer(cfg, trainer.init_state(), trainer=trainer)
    raw = np.random.default_rng(0).normal(
        size=(4, cfg.data.seg_len, cfg.data.n_joints, 3))
    with pytest.raises(ValueError, match="scaler"):
        scorer.preprocess_windows(raw)
