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
