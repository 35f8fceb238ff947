"""Shared CLI plumbing: config + dataset loading, ground-truth discovery."""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import Config, from_reference_yaml
from ..data.alphapose import load_alphapose_split
from ..data.windows import SegmentDataset


def load_config(path: str) -> Config:
    return from_reference_yaml(path)


def add_distributed_flag(parser) -> None:
    """Attach the multi-host launch flag shared by the train/eval CLIs.

    The reference trains on N devices with ONE command per host — Lightning
    spawns the DDP processes itself (train_COSKAD.py:75-78, devices: [0,1];
    eval_COSKAD.py:115). The TPU equivalent is one CLI process per host wired
    into a global device mesh over DCN; this flag is that wiring
    (parallel/mesh.py::initialize_distributed -> jax.distributed.initialize).
    """
    parser.add_argument(
        "--distributed", default=None, metavar="SPEC",
        help="multi-host launch: 'auto' (JAX_COORDINATOR_ADDRESS / "
             "JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars or Cloud TPU "
             "metadata) or explicit 'coordinator:port,num_processes,"
             "process_id' — run the same command on every host with its own "
             "process_id")


def init_distributed(spec: Optional[str]) -> None:
    """Wire jax.distributed from a --distributed SPEC. Must run before any
    JAX device use (backend init); a no-op when spec is None/''."""
    if not spec:
        return
    from ..parallel.mesh import initialize_distributed

    if spec in ("auto", "env"):
        initialize_distributed()
        return
    parts = spec.rsplit(",", 2)
    if len(parts) != 3:
        raise ValueError(
            f"--distributed expects 'coordinator:port,num_processes,"
            f"process_id' or 'auto', got {spec!r}"
        )
    initialize_distributed(parts[0], int(parts[1]), int(parts[2]))


def is_primary() -> bool:
    """True on the process that owns file writes (ckpts, metrics, plots).
    All processes compute identical host-side results (scores/latents are
    allgathered, train/loop.py::_fetch_global), so gating WRITES on rank 0
    is enough to keep a shared filesystem race-free."""
    import jax

    return jax.process_index() == 0


def distributed_barrier(name: str) -> None:
    """Cross-process sync point; no-op single-process. Used before process
    exit so one rank's teardown cannot land under another's live collectives
    (the gloo transport is torn down with the process)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def load_split(
    cfg: Config, split: str, stride: Optional[int] = None, scaler=None
) -> SegmentDataset:
    d = cfg.data
    if d.normalization_strategy == "robust" and d.path_to_robust:
        from ..data.robust import load_robust_split

        return load_robust_split(
            d.path_to_robust,
            split=split,
            include_global=cfg.model.num_coords == 6,
            seg_len=d.seg_len,
            seg_stride=stride if stride is not None else d.seg_stride,
            vid_res=d.vid_res,
            normalization_strategy="robust",
            exp_dir=cfg.ckpt_dir,
            normalize_pose=d.normalize_pose,
            kp18_format=d.kp18_format,
            headless=d.headless,
            num_transform=d.num_transform,
            num_clips_debug=d.num_clips,
            scaler=scaler,
        )
    pose_dir = d.pose_dirs.get(split)
    if not pose_dir or not os.path.isdir(pose_dir):
        raise FileNotFoundError(
            f"pose directory for split {split!r} not found: {pose_dir!r}"
        )
    # AlphaPose path with robust normalization: the fitted scaler persists as
    # <ckpt_dir>/robust.pkl like the reference (utils/dataset.py:176-179,
    # 290-294); use_fitted_scaler (or a non-train split) loads it.
    scaler_pkl = os.path.join(cfg.ckpt_dir, "robust.pkl")
    if (
        scaler is None
        and d.normalization_strategy == "robust"
        and (d.use_fitted_scaler or split != "train")
        and os.path.exists(scaler_pkl)
    ):
        import pickle

        with open(scaler_pkl, "rb") as f:
            scaler = pickle.load(f)
    if cfg.run.device_pipeline:
        from ..data.alphapose import load_alphapose_store

        return load_alphapose_store(
            pose_dir,
            seg_len=d.seg_len,
            seg_stride=stride if stride is not None else d.seg_stride,
            start_offset=d.start_offset,
            num_clips=d.num_clips,
            kp_threshold=d.kp_threshold,
            kp18_format=d.kp18_format,
            headless=d.headless,
            normalization_strategy=(
                d.normalization_strategy if d.normalize_pose else "none"
            ),
            vid_res=d.vid_res,
            symm_range=d.symm_range,
            sub_mean=d.sub_mean,
            scaler=scaler,
            num_transform=d.num_transform,
        )
    ds = load_alphapose_split(
        pose_dir,
        seg_len=d.seg_len,
        seg_stride=stride if stride is not None else d.seg_stride,
        start_offset=d.start_offset,
        num_clips=d.num_clips,
        kp_threshold=d.kp_threshold,
        kp18_format=d.kp18_format,
        headless=d.headless,
        normalize_pose=d.normalize_pose,
        normalization_strategy=d.normalization_strategy,
        vid_res=d.vid_res,
        symm_range=d.symm_range,
        sub_mean=d.sub_mean,
        scaler=scaler,
        num_transform=d.num_transform,
    )
    if (
        d.normalization_strategy == "robust"
        and split == "train"
        and scaler is None
        and ds.scaler is not None
        and is_primary()  # multi-host: every rank fits the identical scaler
        # from the identical data; only rank 0 persists it (write race).
    ):
        import pickle

        os.makedirs(cfg.ckpt_dir, exist_ok=True)
        with open(scaler_pkl, "wb") as f:
            pickle.dump(ds.scaler, f)
    return ds


def load_ground_truths(gt_dir: str) -> Dict[Tuple[int, int], np.ndarray]:
    """{(scene, clip): labels} from '<scene>_<clip>.npy' files (sorted), the
    reference's gt listing (eval_COSKAD.py:127-129)."""
    gts = {}
    for fn in sorted(os.listdir(gt_dir)):
        if not fn.endswith(".npy"):
            continue
        scene = int(fn.split("_")[0])
        clip = int(fn.split("_")[1].split(".")[0])
        gts[(scene, clip)] = np.load(os.path.join(gt_dir, fn))
    return gts
