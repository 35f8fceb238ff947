"""On-disk synthetic dataset fixture: AlphaPose JSONs + gt masks + config.

Generates a miniature HR-Avenue-shaped dataset: train clips of normal
walking-like motion, test clips with a contiguous anomalous span where one
actor's keypoints scatter wildly. Used by the CLI end-to-end tests and the
verify drive.
"""

from __future__ import annotations

import json
import os

import numpy as np
import yaml


def _make_clip(rng, n_frames, n_joints, anomaly_span=None, n_actors=2):
    clip = {}
    gt = np.zeros(n_frames, dtype=int)
    if anomaly_span:
        gt[anomaly_span[0] : anomaly_span[1]] = 1
    for pid in range(1, n_actors + 1):
        frames = {}
        base = rng.uniform(150, 500, size=(n_joints, 2))
        for f in range(1, n_frames + 1):
            base = base + rng.normal(scale=1.5, size=(n_joints, 2))
            pos = base
            if anomaly_span and pid == 1 and gt[f - 1]:
                pos = rng.uniform(0, 856, size=(n_joints, 2))
            kp = np.concatenate(
                [pos, rng.uniform(0.5, 1.0, size=(n_joints, 1))], axis=-1
            )
            frames[f"{f:04d}"] = {"keypoints": kp.reshape(-1).tolist()}
        clip[str(pid)] = frames
    return clip, gt


def _gappy_actor(rng, n_frames, n_joints, gap_at, gap_len):
    """Actor present on all frames except a gap of `gap_len` frames starting
    at `gap_at` (1-based keys, like AlphaPose exports)."""
    frames = {}
    base = rng.uniform(150, 500, size=(n_joints, 2))
    for f in range(1, n_frames + 1):
        base = base + rng.normal(scale=1.5, size=(n_joints, 2))
        if gap_at <= f < gap_at + gap_len:
            continue
        kp = np.concatenate(
            [base, rng.uniform(0.5, 1.0, size=(n_joints, 1))], axis=-1
        )
        frames[f"{f:04d}"] = {"keypoints": kp.reshape(-1).tolist()}
    return frames


def make_adversarial_dataset(
    root: str,
    n_frames: int = 220,
    n_joints: int = 17,
    seed: int = 3,
) -> str:
    """UBnormal-shaped adversarial fixture exercising the branches the basic
    fixture cannot (round-1 verdict "What's weak" #1):

    - multi-scene layout (scenes 1 and 2, several clips each),
    - gappy trajectories at the continuity threshold: one actor with a
      2-missing-frame gap (windows may bridge it — is_seg_continuous,
      reference utils/dataset_utils.py:213-231) and one with a 4-frame gap
      (windows must not bridge it),
    - a training clip with ZERO tracked people (empty AlphaPose JSON),
    - a single-actor test clip with a mid-clip absence interval, so
      `pad_size > 0` exercises the reference's pad_scores interval logic
      end-to-end (utils/eval_utils.py:232-248),
    - HR boolean masks under the reference's derived
      hr_bool_masks/<split>/test_frame_mask layout (eval_COSKAD.py:92-99),
    - the UBnormal 'validating' split protocol: pose/validating +
      validating/test_frame_mask ground truth (utils/argparser.py:14-27).

    Returns the config path.
    """
    rng = np.random.default_rng(seed)
    dirs = {
        "train": os.path.join(root, "pose", "training"),
        "test": os.path.join(root, "pose", "testing"),
        "validating": os.path.join(root, "pose", "validating"),
        "gt": os.path.join(root, "gt"),
        "val_gt": os.path.join(root, "validating", "test_frame_mask"),
        "hr": os.path.join(root, "hr_bool_masks", "testing", "test_frame_mask"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    # --- training: two scenes
    clip, _ = _make_clip(rng, n_frames, n_joints)
    # actor with a 2-frame gap (at the <=2-missing threshold: windows bridge)
    clip["7"] = _gappy_actor(rng, n_frames, n_joints, gap_at=100, gap_len=2)
    # actor with a 4-frame gap (over threshold: trajectory effectively splits)
    clip["8"] = _gappy_actor(rng, n_frames, n_joints, gap_at=100, gap_len=4)
    with open(os.path.join(dirs["train"], "01_0001_tracked.json"), "w") as f:
        json.dump(clip, f)
    # zero-detection training clip
    with open(os.path.join(dirs["train"], "01_0002_tracked.json"), "w") as f:
        json.dump({}, f)
    for i in (1, 2):
        clip, _ = _make_clip(rng, n_frames, n_joints)
        with open(os.path.join(dirs["train"], f"02_{i:04d}_tracked.json"), "w") as f:
            json.dump(clip, f)

    # --- testing: one anomalous clip per scene; scene-1 clip has a
    # single actor with a mid-clip absence interval (pad_scores target)
    span = (n_frames // 3, n_frames // 3 + 50)
    clip, gt = _make_clip(rng, n_frames, n_joints, anomaly_span=span,
                          n_actors=1)
    absent = {f"{f:04d}" for f in range(150, 180)}
    clip["1"] = {k: v for k, v in clip["1"].items() if k not in absent}
    with open(os.path.join(dirs["test"], "01_0003_tracked.json"), "w") as f:
        json.dump(clip, f)
    np.save(os.path.join(dirs["gt"], "01_0003.npy"), gt)
    hr = np.ones(n_frames, dtype=np.uint8)
    hr[:20] = 0  # drop some frames as non-human-related
    np.save(os.path.join(dirs["hr"], "1_3.npy"), hr)

    clip, gt = _make_clip(rng, n_frames, n_joints, anomaly_span=span)
    with open(os.path.join(dirs["test"], "02_0003_tracked.json"), "w") as f:
        json.dump(clip, f)
    np.save(os.path.join(dirs["gt"], "02_0003.npy"), gt)
    np.save(os.path.join(dirs["hr"], "2_3.npy"),
            np.ones(n_frames, dtype=np.uint8))

    # --- validating split (UBnormal protocol): its own clips + masks
    span_v = (50, 90)
    clip, gt = _make_clip(rng, n_frames, n_joints, anomaly_span=span_v)
    with open(os.path.join(dirs["validating"], "01_0004_tracked.json"), "w") as f:
        json.dump(clip, f)
    np.save(os.path.join(dirs["val_gt"], "01_0004.npy"), gt)

    cfg = {
        "dataset_choice": "UBnormal",
        "data_dir": root,
        "gt_path": dirs["gt"],
        "exp_dir": os.path.join(root, "checkpoints"),
        "dir_name": "adversarial",
        "seed": 0,
        "validation": True,
        "use_decoder": False,
        "use_vae": False,
        "hyperbolic": False,
        "static_center": True,
        "num_coords": 2,
        "channels": [32, 16, 32],
        "h_dim": 64,
        "latent_dim": 16,
        "projector": "linear",
        "dropout": 0,
        "alpha": 1e-6,
        "lambda_": 0.01,
        "center_tolerance": 0.001,
        "distance": "euclidean",
        "dataset_seg_len": 12,
        "dataset_seg_stride": 8,
        "dataset_num_transform": 5,
        "dataset_vid_res": [856, 480],
        "dataset_symm_range": True,
        "dataset_sub_mean": True,
        "dataset_kp18_format": True,
        "dataset_normalize_pose": True,
        "dataset_normalization_strategy": "markovitz",
        "dataset_batch_size": 256,
        "dataset_headless": False,
        "ae_epochs": 2,
        "opt_lr": 1e-4,
        "pad_size": 5,
        "smoothing": 50,
        "split": "test",
        "use_hr": True,
    }
    cfg_path = os.path.join(root, "adversarial.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


def make_ubnormal_tree(
    root: str,
    n_train_clips: int = 250,
    n_test_clips: int = 60,
    n_val_clips: int = 30,
    n_frames: int = 500,
    n_joints: int = 17,
    n_scenes: int = 10,
    seed: int = 11,
) -> str:
    """Full UBnormal-LAYOUT synthetic tree at configurable scale — the
    stand-in for the downloaded dataset in the dress-rehearsal runbook
    (scripts/dress_rehearsal.py). Unlike make_synthetic_dataset (flat
    gt/ + config), this produces exactly the documented expected tree
    (README 'Datasets & real-data runbook'; scripts/prepare_data.py:10-16):

        <root>/pose/{training,testing,validating}/<scene>_<clip>*.json
        <root>/testing/test_frame_mask/<scene>_<clip>.npy
        <root>/validating/test_frame_mask/...
        <root>/hr_bool_masks/testing/test_frame_mask/<scene>_<clip>.npy

    Returns root. No config is written — that is prepare_data.py's job.
    """
    rng = np.random.default_rng(seed)
    dirs = {
        "train": os.path.join(root, "pose", "training"),
        "test": os.path.join(root, "pose", "testing"),
        "val": os.path.join(root, "pose", "validating"),
        "gt": os.path.join(root, "testing", "test_frame_mask"),
        "vgt": os.path.join(root, "validating", "test_frame_mask"),
        "hr": os.path.join(root, "hr_bool_masks", "testing",
                           "test_frame_mask"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def clip_name(scene, clip):
        return f"{scene:02d}_{clip:04d}_alphapose_tracked_person.json"

    for i in range(n_train_clips):
        scene, clip = i % n_scenes + 1, i // n_scenes + 1
        c, _ = _make_clip(rng, n_frames, n_joints)
        with open(os.path.join(dirs["train"], clip_name(scene, clip)), "w") as f:
            json.dump(c, f)
    for split, n_clips, pose_d, gt_d in (
        ("test", n_test_clips, dirs["test"], dirs["gt"]),
        ("val", n_val_clips, dirs["val"], dirs["vgt"]),
    ):
        for i in range(n_clips):
            scene, clip = i % n_scenes + 1, 500 + i // n_scenes + 1
            span = (n_frames // 3, n_frames // 3 + 80)
            c, gt = _make_clip(rng, n_frames, n_joints, anomaly_span=span)
            with open(os.path.join(pose_d, clip_name(scene, clip)), "w") as f:
                json.dump(c, f)
            np.save(os.path.join(gt_d, f"{scene:02d}_{clip:04d}.npy"), gt)
            if split == "test":
                np.save(os.path.join(dirs["hr"], f"{scene}_{clip}.npy"),
                        np.ones(n_frames, dtype=np.uint8))
    return root


def make_synthetic_dataset(
    root: str,
    n_train_clips: int = 2,
    n_test_clips: int = 2,
    n_frames: int = 420,
    n_joints: int = 17,
    seed: int = 0,
) -> str:
    """Create <root>/{train,test,gt} and a reference-format YAML config.

    Returns the config path."""
    rng = np.random.default_rng(seed)
    train_dir = os.path.join(root, "pose", "training")
    test_dir = os.path.join(root, "pose", "testing")
    gt_dir = os.path.join(root, "gt")
    for d in (train_dir, test_dir, gt_dir):
        os.makedirs(d, exist_ok=True)

    for i in range(1, n_train_clips + 1):
        clip, _ = _make_clip(rng, n_frames, n_joints)
        with open(os.path.join(train_dir, f"01_{i:04d}_tracked.json"), "w") as f:
            json.dump(clip, f)
    for i in range(1, n_test_clips + 1):
        span = (n_frames // 3, n_frames // 3 + 80)
        clip, gt = _make_clip(rng, n_frames, n_joints, anomaly_span=span)
        with open(os.path.join(test_dir, f"01_{i:04d}_tracked.json"), "w") as f:
            json.dump(clip, f)
        np.save(os.path.join(gt_dir, f"01_{i:04d}.npy"), gt)

    cfg = {
        "dataset_choice": "Synthetic",
        "data_dir": root,
        "gt_path": gt_dir,
        "exp_dir": os.path.join(root, "checkpoints"),
        "dir_name": "smoke",
        "seed": 0,
        "validation": True,
        "use_decoder": False,
        "use_vae": False,
        "hyperbolic": False,
        "static_center": True,
        "num_coords": 2,
        "channels": [32, 16, 32],
        "h_dim": 64,
        "latent_dim": 16,
        "projector": "linear",
        "dropout": 0,
        "alpha": 1e-6,
        "lambda_": 0.01,
        "center_tolerance": 0.001,
        "distance": "euclidean",
        "dataset_seg_len": 12,
        "dataset_seg_stride": 8,
        "dataset_num_transform": 5,
        "dataset_vid_res": [856, 480],
        "dataset_symm_range": True,
        "dataset_sub_mean": True,
        "dataset_kp18_format": True,
        "dataset_normalize_pose": True,
        "dataset_normalization_strategy": "markovitz",
        "dataset_batch_size": 256,
        "dataset_headless": False,
        "ae_epochs": 2,
        "opt_lr": 1e-4,
        "pad_size": -1,
        "smoothing": 50,
        "split": "train",
        "use_hr": False,
    }
    cfg_path = os.path.join(root, "smoke.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path
