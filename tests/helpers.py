"""Shared synthetic-data builders for tests."""

from __future__ import annotations

import numpy as np

from coskad_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, OptConfig, RunConfig
from coskad_tpu.data.windows import SegmentDataset


def synthetic_segments(
    n_frames: int = 80,
    seg_len: int = 6,
    n_joints: int = 5,
    n_actors: int = 2,
    scene: int = 1,
    clip: int = 1,
    stride: int = 1,
    seed: int = 0,
    num_transform: int = 2,
    anomalous_ranges=(),
    anomaly_scale: float = 6.0,
) -> tuple:
    """Windows from smooth random-walk 'skeletons'; anomalous frames get
    large-amplitude jumps. Returns (SegmentDataset, gt [n_frames])."""
    rng = np.random.default_rng(seed)
    gt = np.zeros(n_frames, dtype=int)
    for lo, hi in anomalous_ranges:
        gt[lo:hi] = 1
    data, meta, fids = [], [], []
    for actor in range(1, n_actors + 1):
        base = rng.normal(scale=0.2, size=(n_joints, 2))
        traj = []
        for f in range(n_frames):
            step = rng.normal(scale=0.02, size=(n_joints, 2))
            base = base + step
            pos = base.copy()
            if gt[f]:
                pos = pos + rng.normal(scale=anomaly_scale, size=(n_joints, 2))
            traj.append(pos)
        traj = np.stack(traj)  # [F, V, 2]
        for start in range(0, n_frames - seg_len, stride):
            data.append(traj[start : start + seg_len])
            meta.append([scene, clip, actor, start + 1])
            fids.append(np.arange(start + 1, start + 1 + seg_len))
    arr = np.stack(data).transpose(0, 3, 1, 2).astype(np.float32)  # [N, 2, T, V]
    ds = SegmentDataset(
        data=arr,
        meta=np.asarray(meta, np.int64),
        frame_ids=np.asarray(fids, np.int32),
        num_transform=num_transform,
    )
    return ds, gt


def tiny_config(variant="euclidean_static", **overrides) -> Config:
    model = ModelConfig(
        variant=variant,
        num_coords=2,
        channels=(8,),
        h_dim=8,
        latent_dim=4,
        projector="linear",
        distribution=overrides.pop("distribution", "ps"),
        distance=overrides.pop("distance", "euclidean"),
    )
    data = DataConfig(
        seg_len=6,
        kp18_format=False,
        batch_size=overrides.pop("batch_size", 32),
        num_transform=2,
        n_joints_override=5,
    )
    opt = OptConfig(lr=1e-3, epochs=overrides.pop("epochs", 2), **overrides)
    cfg = Config(model=model, data=data, opt=opt, eval=EvalConfig(), run=RunConfig(seed=0))
    return cfg
