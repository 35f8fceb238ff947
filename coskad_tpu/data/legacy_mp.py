"""Legacy multi-person dataset shim (reference utils/pose_dataset_mp.py).

The reference file is dead code: it imports `dataset_utils` and `argparser`
top-level modules that exist nowhere in the repository
(utils/pose_dataset_mp.py:6-8), so it cannot even be imported, and nothing
references it — it is the older Markovitz-lineage flavor of PoseDataset,
superseded by utils/dataset.py (SURVEY.md §2.2). This shim completes the
component inventory anyway: the same class surface on top of the live data
layer, so any legacy call site migrates with an import change only.

Preserved semantics (utils/pose_dataset_mp.py:56-85):
- logical index -> (sample ``i % N``, transform ``i // N``)
- ``__getitem__`` positional contract: ``[data, trans_index]`` +
  ``[meta, ids]`` if return_metadata + ``[mean]`` if return_mean and
  normalizing + ``[index]`` if return_indices
- exposed attributes: ``segs_data_np`` [N, C, T, V], ``segs_meta``,
  ``segs_ids``, ``segs_mean``, ``person_keys``
  ('{scene:02d}_{clip:04d}_{person:02d}' -> int frame keys,
  utils/dataset_utils.py:162-166), ``num_samples``/``C``/``T``/``V``

Deviations (deliberate): transforms are the canonical affine table (mats),
not torch callables, and applied lazily per item on host — the TPU training
path never uses this class (SegmentDataset + device-side gather_batch is the
performant equivalent); no torch DataLoader coupling.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .alphapose import (
    load_alphapose_split,
    parse_clip_json,
    scene_clip_from_filename,
)
from .transforms import canonical_transforms

__all__ = ["PoseDatasetMP"]


class PoseDatasetMP:
    """Drop-in stand-in for the reference's (unimportable) PoseDatasetMP."""

    def __init__(
        self,
        path_to_json_dir: str,
        transform_list: Optional[Sequence] = None,
        return_indices: bool = False,
        return_metadata: bool = False,
        debug: bool = False,
        dataset_clips: Optional[int] = None,
        **dataset_args,
    ):
        self.path_to_json = path_to_json_dir
        self.headless = dataset_args.get("headless", False)
        self.normalize_pose_seg = dataset_args.get("normalize_pose", True)
        self.kp18_format = dataset_args.get("kp18_format", True)
        self.vid_res = dataset_args.get("vid_res", [856, 480])
        self.num_coords = dataset_args.get("num_coords", 2)
        self.return_mean = dataset_args.get("return_mean", True)
        self.return_indices = return_indices
        self.return_metadata = return_metadata
        self.start_ofst = dataset_args.get("start_offset", 0)
        self.seg_len = dataset_args.get("seg_len", 12)
        self.seg_stride = dataset_args.get("seg_stride", 1)
        # debug caps at 5 clips like the reference (pose_dataset_mp.py:26-29)
        num_clips = 5 if debug else None
        if dataset_clips:
            num_clips = dataset_clips
        self.num_clips = num_clips

        # Transform table: accept the legacy list (its length selects the
        # canonical affine rows), an int count, or an explicit [K, 3, 3].
        if transform_list is None or (
            hasattr(transform_list, "__len__") and len(transform_list) == 0
        ):
            self.apply_transforms = False
            self.num_transform = 1
            self.trans_mats = canonical_transforms(1)
        else:
            self.apply_transforms = True
            if isinstance(transform_list, (int, np.integer)):
                self.num_transform = int(transform_list)
                self.trans_mats = canonical_transforms(self.num_transform)
            else:
                arr = np.asarray(transform_list, dtype=np.float32)
                if arr.ndim == 3 and arr.shape[1:] == (3, 3):
                    self.trans_mats = arr
                else:  # legacy callables: use their count
                    self.trans_mats = canonical_transforms(len(transform_list))
                self.num_transform = len(self.trans_mats)
        self.transform_list = transform_list

        ds = load_alphapose_split(
            path_to_json_dir,
            seg_len=self.seg_len,
            seg_stride=self.seg_stride,
            start_offset=self.start_ofst,
            num_clips=self.num_clips,
            kp18_format=self.kp18_format,
            headless=self.headless,
            normalize_pose=self.normalize_pose_seg,
            normalization_strategy="markovitz",
            vid_res=self.vid_res,
            symm_range=dataset_args.get("symm_range", True),
            sub_mean=self.return_mean,
            num_transform=self.num_transform,
        )
        self.segs_data_np = ds.data  # [N, C, T, V] float32
        self.segs_meta = np.asarray(ds.meta)
        self.segs_ids = np.asarray(ds.frame_ids)
        self.segs_mean = ds.means
        self.metadata = self.segs_meta
        self.person_keys = self._gen_person_keys()
        self.num_samples, self.C, self.T, self.V = self.segs_data_np.shape

    def _gen_person_keys(self):
        """'{scene:02d}_{clip:04d}_{person:02d}' -> [int frame keys]
        (utils/dataset_utils.py:162-166 key format)."""
        import os

        keys = {}
        json_list = sorted(
            fn for fn in os.listdir(self.path_to_json) if fn.endswith(".json")
        )
        if self.num_clips is not None:
            json_list = json_list[: self.num_clips]
        for fn in json_list:
            scene_id, clip_id = scene_clip_from_filename(fn)
            for traj in parse_clip_json(os.path.join(self.path_to_json, fn)):
                key = "{:02d}_{:04d}_{:02d}".format(
                    int(scene_id), int(clip_id), int(traj.person_id)
                )
                keys[key] = [int(k) for k in traj.frame_keys]
        return keys

    def _transform(self, window: np.ndarray, trans_index: int) -> np.ndarray:
        """Host-side affine on channels 0,1 of one [C, T, V] window."""
        m = self.trans_mats[trans_index]
        out = np.array(window)
        x, y = out[0], out[1]
        out[0] = m[0, 0] * x + m[0, 1] * y + m[0, 2]
        out[1] = m[1, 0] * x + m[1, 1] * y + m[1, 2]
        return out

    def __getitem__(self, index: int):
        if self.apply_transforms:
            sample_index = index % self.num_samples
            trans_index = index // self.num_samples
            data = self._transform(self.segs_data_np[sample_index], trans_index)
        else:
            sample_index = index
            trans_index = 0
            data = np.array(self.segs_data_np[index])
        data = data[: self.num_coords]
        ret = [data, trans_index]
        if self.return_metadata:
            ret += [self.segs_meta[sample_index], self.segs_ids[sample_index]]
        if self.return_mean and self.normalize_pose_seg:
            ret += [self.segs_mean[sample_index]]
        if self.return_indices:
            ret += [index]
        return ret

    def __len__(self) -> int:
        return self.num_transform * self.num_samples
