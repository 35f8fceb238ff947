"""AlphaPose tracked-person JSON ingestion.

One-time host-side IO (reference utils/dataset.py:130-196): a directory holds
one JSON per clip, named '<scene>_<clip>[...].json', each mapping
person_id -> {frame_key -> {'keypoints': flat [x, y, conf] * 17}}. This
module parses those into `PersonTrajectory` objects and assembles a whole
split into a `SegmentDataset` of normalized [N, C, T, V] windows.

Ordering semantics are kept bit-compatible with the reference:
- persons are iterated in numeric order of their ids
  (utils/dataset_utils.py:163),
- a person's keypoint rows are stacked in *lexicographic* frame-key order
  while windowing consults the *numeric* key order
  (utils/dataset_utils.py:190 vs :241) — identical whenever frame keys are
  zero-padded (all supported datasets), reproduced literally regardless.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .normalize import normalize
from .windows import (
    PersonTrajectory,
    SegmentDataset,
    keypoints17_to_coco18,
    segment_clip,
)


def parse_person(
    person_entry, person_id: int, kp_threshold: float = 0.0
) -> PersonTrajectory:
    """One person's {frame_key: {'keypoints': [...]}} -> PersonTrajectory."""
    if isinstance(person_entry, list):  # some exports shard the dict
        merged: Dict = {}
        for sub in person_entry:
            merged.update(**sub)
        person_entry = merged
    lex_keys = sorted(person_entry.keys())  # lexicographic: row order
    rows = []
    for key in lex_keys:
        kp = np.array(person_entry[key]["keypoints"], dtype=np.float64).reshape(-1, 3)
        if kp_threshold > 0:
            low = kp[:, 2] < kp_threshold
            kp[low, :2] = 0.0
        rows.append(kp)
    keypoints = np.stack(rows, axis=0)
    numeric_keys = sorted(int(k) for k in lex_keys)  # numeric: window order
    return PersonTrajectory(
        person_id=person_id, frame_keys=numeric_keys, keypoints=keypoints
    )


def parse_clip_json(path: str, kp_threshold: float = 0.0) -> List[PersonTrajectory]:
    # Fast path: the C++ single-pass parser (data/native.py), byte-identical
    # semantics; disable with COSKAD_NATIVE=0.
    if os.environ.get("COSKAD_NATIVE", "1") != "0":
        from .native import parse_clip_json_native

        native = parse_clip_json_native(path, kp_threshold)
        if native is not None:
            return native
    with open(path, "r") as f:
        clip_dict = json.load(f)
    trajectories = []
    for pid in sorted(clip_dict.keys(), key=lambda x: int(x)):
        entry = clip_dict[pid]
        # A tracked id with zero detections (empty dict, or a sharded-list
        # form whose shards are all empty) contributes no windows; skip it
        # instead of crashing on an empty stack. (The reference's loader
        # would crash too — single_pose_dict2np indexes the first key — but
        # real exports always carry >=1 detection per id; found by
        # tests/test_data_fuzz.py.)
        if not entry or (isinstance(entry, list) and not any(entry)):
            continue
        trajectories.append(parse_person(entry, int(pid), kp_threshold))
    return trajectories


def scene_clip_from_filename(filename: str):
    scene_id, clip_id = filename.split("_")[:2]
    return int(scene_id), int(clip_id.split(".")[0])


def load_alphapose_split(
    json_dir: str,
    seg_len: int = 12,
    seg_stride: int = 1,
    start_offset: int = 0,
    num_clips: Optional[int] = None,
    kp_threshold: float = 0.0,
    kp18_format: bool = True,
    headless: bool = False,
    normalize_pose: bool = True,
    normalization_strategy: str = "markovitz",
    vid_res: Sequence[int] = (856, 480),
    symm_range: bool = True,
    sub_mean: bool = True,
    scaler=None,
    num_transform: int = 5,
) -> SegmentDataset:
    """Directory of per-clip AlphaPose JSONs -> normalized SegmentDataset.

    Mirrors reference PoseDataset.gen_dataset (utils/dataset.py:130-196):
    walk sorted *.json, window each person, optional 17->18 conversion,
    optional headless truncation to the first 14 joints, normalization, and
    the final [N, T, V, F] -> [N, F, T, V] transpose.
    """
    json_list = sorted(fn for fn in os.listdir(json_dir) if fn.endswith(".json"))
    if num_clips is not None:
        json_list = json_list[:num_clips]

    all_data, all_meta, all_ids = [], [], []
    for fn in json_list:
        scene_id, clip_id = scene_clip_from_filename(fn)
        trajectories = parse_clip_json(os.path.join(json_dir, fn), kp_threshold)
        data, meta, ids = segment_clip(
            trajectories, scene_id, clip_id, start_offset, seg_stride, seg_len
        )
        if data.shape[0]:
            all_data.append(data)
        all_meta += meta
        all_ids += ids
    if not all_data:
        raise ValueError(f"No windows produced from {json_dir}")
    segs = np.concatenate(all_data, axis=0)  # [N, T, V, F]

    if kp18_format and segs.shape[-2] == 17:
        segs = keypoints17_to_coco18(segs)
    if headless:
        segs = segs[:, :, :14]

    means, scaler_out = None, scaler
    if normalize_pose:
        if normalization_strategy == "robust":
            segs, scaler_out = normalize(
                segs,
                "robust",
                vid_res=vid_res,
                symm_range=symm_range,
                scaler=scaler,
            )
        else:
            segs, means = normalize(
                segs,
                normalization_strategy,
                vid_res=vid_res,
                symm_range=symm_range,
                sub_mean=sub_mean,
            )

    data_nctv = np.transpose(segs, (0, 3, 1, 2)).astype(np.float32)
    return SegmentDataset(
        data=data_nctv,
        meta=np.asarray(all_meta, dtype=np.int64),
        frame_ids=np.asarray(all_ids, dtype=np.int32),
        num_transform=num_transform,
        means=means,
        scaler=scaler_out,
    )


def load_alphapose_store(
    json_dir: str,
    seg_len: int = 12,
    seg_stride: int = 1,
    start_offset: int = 0,
    num_clips: Optional[int] = None,
    kp_threshold: float = 0.0,
    kp18_format: bool = True,
    headless: bool = False,
    normalization_strategy: str = "markovitz",
    vid_res: Sequence[int] = (856, 480),
    symm_range: bool = True,
    sub_mean: bool = True,
    scaler=None,
    num_transform: int = 5,
):
    """Directory of per-clip AlphaPose JSONs -> device-resident
    TrajectoryStore (data/device_pipeline.py): raw trajectories go to HBM
    once; windowing, normalization and affine transforms happen in-jit per
    batch. Same window enumeration and normalization semantics as
    load_alphapose_split, ~12x less HBM at stride 1 (whole trajectories
    instead of overlapping windows).

    The 'robust' strategy needs a host-fitted scaler (pass `scaler`);
    unlike the host pipeline the store cannot fit one on the fly.
    """
    from .device_pipeline import build_store

    if normalization_strategy == "robust" and scaler is None:
        raise ValueError(
            "device_pipeline with robust normalization needs a pre-fitted "
            "scaler (fit once via the host pipeline or restore from a "
            "checkpoint)"
        )
    json_list = sorted(fn for fn in os.listdir(json_dir) if fn.endswith(".json"))
    if num_clips is not None:
        json_list = json_list[:num_clips]
    clips = []
    for fn in json_list:
        scene_id, clip_id = scene_clip_from_filename(fn)
        clips.append(
            (scene_id, clip_id,
             parse_clip_json(os.path.join(json_dir, fn), kp_threshold))
        )
    return build_store(
        clips,
        seg_len=seg_len,
        seg_stride=seg_stride,
        start_offset=start_offset,
        kp18_format=kp18_format,
        headless=headless,
        num_transform=num_transform,
        normalization=normalization_strategy,
        vid_res=tuple(vid_res),
        symm_range=symm_range,
        sub_mean=sub_mean,
        scaler=scaler,
    )
