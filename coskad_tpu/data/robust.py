"""The 'robust' (Morais CSV) dataset pipeline used by the UBnormal configs.

End-to-end equivalent of the reference's utils/get_robust_data.py +
PoseDatasetRobust (utils/dataset.py:204-279): load CSV trajectories, drop
short ones, optionally extract global bbox features, change the local
coordinate system to bounding-box-centre, window, fit-or-load scalers
(persisted as '<kind>_<strategy>.pickle' in the experiment dir, same names
as the reference), and assemble a SegmentDataset of [N, C, T, V] windows
(C = x, y, conf=1; or 7 channels with the 4 global features appended).
"""

from __future__ import annotations

import os
import pickle
from copy import deepcopy
from typing import Optional, Tuple

import numpy as np

from .trajectories import (
    aggregate_all_coordinates,
    aggregate_windows,
    load_trajectories,
    remove_short_trajectories,
    scale_trajectories,
)
from .windows import SegmentDataset, keypoints17_to_coco18


def save_scaler(scaler, path: str) -> None:
    """Persist a fitted scaler like the reference
    (utils/get_robust_data.py:83-98) — atomically, and from rank 0 only in
    multi-host runs: every rank fits the identical scaler from the
    identical data, and concurrent non-atomic writes to the shared
    exp_dir pickle could leave a truncated file (round-5 review; same
    gating as the AlphaPose robust.pkl in cli/common.py)."""
    import jax

    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(scaler, f)
    os.replace(tmp, path)


def load_scaler(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def robust_windows(
    trajectories_path: str,
    split: str = "train",
    seg_len: int = 12,
    seg_stride: int = 1,
    vid_res=(1080, 720),
    normalization_strategy: str = "robust",
    exp_dir: str = ".",
    normalize_pose: bool = True,
    include_global: bool = False,
    debug: bool = False,
    scaler=None,
):
    """-> ((X_global, meta) | (None, None), (X_local, (meta, frame_ids))).

    Mirrors data_of_combined_model (reference utils/get_robust_data.py:24-186)
    with pred_length=0 / reconstruct_original_data=False, the only mode the
    main pipeline uses. `seg_stride` follows the reference's convention of
    becoming an intra-window frame gap of (stride - 1).
    """
    subfolder = (
        "training" if "train" in split
        else "testing" if "test" in split
        else "validating"
    )
    path = os.path.join(trajectories_path, subfolder, "trajectories")
    video_resolution = np.array(vid_res, dtype=np.float32)
    input_gap = seg_stride - 1

    trajectories = load_trajectories(path, debug=debug, split=split)
    trajectories = remove_short_trajectories(
        trajectories, input_length=seg_len, input_gap=input_gap
    )

    x_global, global_meta = None, None
    if include_global:
        gtraj = {
            tid: deepcopy(tr).use_global_features(video_resolution)
            for tid, tr in trajectories.items()
        }
        for tr in gtraj.values():
            tr.to_global_coordinates(video_resolution)
        x_global, gmeta, gids = aggregate_windows(gtraj, seg_len, input_gap)
        global_meta = (gmeta, gids)
        if normalize_pose:
            scaler_path = os.path.join(
                exp_dir, f"global_{normalization_strategy}.pickle"
            )
            if split == "train":
                _, gscaler = scale_trajectories(
                    aggregate_all_coordinates(gtraj), strategy=normalization_strategy
                )
                save_scaler(gscaler, scaler_path)
            else:
                try:
                    gscaler = load_scaler(scaler_path)
                except FileNotFoundError:
                    raise FileNotFoundError(
                        f"global scaler pickle missing: {scaler_path}. The "
                        "include_global path persists its global-feature "
                        "scaler only in exp_dir (not in checkpoints yet — "
                        "see NEXT.md); evaluate in the training exp_dir or "
                        "re-fit on the train split."
                    ) from None
            x_global, _ = scale_trajectories(
                x_global, scaler=gscaler, strategy=normalization_strategy
            )

    for tr in trajectories.values():
        tr.to_bounding_box_centre(video_resolution)
    x_local, lmeta, lids = aggregate_windows(trajectories, seg_len, input_gap)
    if normalize_pose:
        scaler_path = os.path.join(exp_dir, f"local_{normalization_strategy}.pickle")
        if scaler is not None:
            # e.g. restored from a checkpoint (cli/eval.py) — takes priority
            # over the exp_dir pickle files.
            lscaler = scaler
        elif split == "train":
            _, lscaler = scale_trajectories(
                aggregate_all_coordinates(trajectories),
                strategy=normalization_strategy,
            )
            save_scaler(lscaler, scaler_path)
        else:
            lscaler = load_scaler(scaler_path)
        x_local, _ = scale_trajectories(
            x_local, scaler=lscaler, strategy=normalization_strategy
        )

    return (x_global, global_meta), (x_local, (lmeta, lids))


def load_robust_split(
    trajectories_path: str,
    split: str = "train",
    seg_len: int = 12,
    seg_stride: int = 1,
    vid_res=(1080, 720),
    normalization_strategy: str = "robust",
    exp_dir: str = ".",
    normalize_pose: bool = True,
    include_global: bool = False,
    kp18_format: bool = False,
    headless: bool = False,
    num_transform: int = 5,
    debug: bool = False,
    num_clips_debug: Optional[int] = None,
    scaler=None,
) -> SegmentDataset:
    """Robust pipeline -> SegmentDataset (reference PoseDatasetRobust
    .gen_dataset, utils/dataset.py:229-279)."""
    (x_global, _), (x_local, (meta, ids)) = robust_windows(
        trajectories_path,
        split=split,
        seg_len=seg_len,
        seg_stride=seg_stride,
        vid_res=vid_res,
        normalization_strategy=normalization_strategy,
        exp_dir=exp_dir,
        normalize_pose=normalize_pose,
        include_global=include_global,
        debug=debug or (num_clips_debug is not None),
        scaler=scaler,
    )
    n, t, d = x_local.shape
    v = d // 2
    local = x_local.reshape(n, t, v, 2)
    if include_global:
        segs = np.empty((n, t, v, 7))
        segs[..., :2] = local
        segs[..., 2:6] = x_global[:, :, None, :]
        segs[..., 6] = 1.0
    else:
        segs = np.empty((n, t, v, 3))
        segs[..., :2] = local
        segs[..., 2] = 1.0

    if kp18_format and segs.shape[-2] == 17:
        segs = keypoints17_to_coco18(segs)
    if headless:
        segs = segs[:, :, :14]

    fitted = scaler
    if fitted is None and normalize_pose:
        try:
            fitted = load_scaler(
                os.path.join(exp_dir, f"local_{normalization_strategy}.pickle")
            )
        except FileNotFoundError:
            fitted = None
    return SegmentDataset(
        data=np.transpose(segs, (0, 3, 1, 2)).astype(np.float32),
        meta=np.asarray(meta, dtype=np.int64),
        frame_ids=np.asarray(ids, dtype=np.int32),
        num_transform=num_transform,
        scaler=fitted,
    )
