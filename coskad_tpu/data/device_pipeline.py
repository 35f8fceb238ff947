"""Fused device-side preprocessing: trajectories -> normalized windows in-jit.

The BASELINE.json north star: instead of materializing every sliding window
on the host ([N, C, T, V] with ~T-fold duplication at stride 1), whole
per-person trajectories stay HBM-resident once ([P, F, V, 3] padded) and the
jitted step gathers window rows, normalizes them, applies the geometric
transform and drops the confidence channel — all fused into the training /
embedding program.

Semantics are identical to the host path (data/alphapose.py + normalize.py):
- window validity (the <=2-missing-frames continuity rule) is decided on the
  host when building the index table; window CONTENT is consecutive
  trajectory rows, reproducing the reference exactly (gaps included),
- 'markovitz' / 'stan' / 'bbox' normalizations are per-window-independent
  and computed in-jit; 'robust' applies the host-fitted scaler (elementwise)
  in-jit,
- the per-(t)ransform expansion uses the same logical indexing
  (i % N windows, i // N transforms).

Memory: stride-1 evaluation windows duplicate each frame ~T times; the
trajectory store is up to T x smaller in HBM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import apply_transforms
from .windows import (
    PersonTrajectory,
    SegmentDataset,
    is_seg_continuous,
    keypoints17_to_coco18,
)


@dataclass
class TrajectoryStore:
    """Device-resident trajectories + host-side window index tables.

    `traj` is stored FLAT as [P, F_max, V*C] (not [P, F_max, V, C]): the
    minor dim is then 54 lanes of a 128-lane tile (~42% utilization) instead
    of C=3 (~2%), and the per-window gather is one [1, T, V*C] contiguous
    slice per window instead of B*T tiny [V, C] row gathers — measured ~5x
    faster on v5e (scripts/probe_gather.py; the gather was the single
    largest kernel of the scoring scan at ~25% of its device time).
    `kp_shape` carries (V, C) for the reshape back after gathering.
    """

    traj: jax.Array  # [P, F_max, V*C] float32 (zero padded)
    kp_shape: Tuple[int, int]  # (V, C) of the flattened minor dim
    window_person: np.ndarray  # [N] int32 row into traj
    window_start: np.ndarray  # [N] int32 start row within the trajectory
    meta: np.ndarray  # [N, 4] scene, clip, person, start_frame
    frame_ids: np.ndarray  # [N, T] actual frame keys
    seg_len: int
    num_transform: int
    normalization: str = "markovitz"
    vid_res: Tuple[int, int] = (856, 480)
    symm_range: bool = True
    sub_mean: bool = True
    scaler_center: Optional[np.ndarray] = None  # robust strategy
    scaler_scale: Optional[np.ndarray] = None

    @property
    def num_windows(self) -> int:
        return len(self.window_person)

    def __len__(self) -> int:
        return self.num_windows * max(self.num_transform, 1)

    @property
    def scaler(self):
        """RobustScalerState view of the fitted scaler (checkpointing wants
        the same attribute the SegmentDataset pipeline exposes)."""
        if self.scaler_center is None:
            return None
        from .normalize import RobustScalerState

        return RobustScalerState(center=self.scaler_center,
                                 scale=self.scaler_scale)


def build_store(
    clips: Sequence[Tuple[int, int, Sequence[PersonTrajectory]]],
    seg_len: int = 12,
    seg_stride: int = 1,
    start_offset: int = 0,
    kp18_format: bool = True,
    headless: bool = False,
    num_transform: int = 5,
    normalization: str = "markovitz",
    vid_res=(856, 480),
    symm_range: bool = True,
    sub_mean: bool = True,
    scaler=None,
) -> TrajectoryStore:
    """[(scene, clip, trajectories)] -> TrajectoryStore.

    Window validity follows the reference exactly (same enumeration as
    windows.split_trajectory_to_windows); raw keypoints go to the device,
    normalization happens in-jit.
    """
    persons: List[np.ndarray] = []
    w_person, w_start, meta, fids = [], [], [], []
    for scene_id, clip_id, trajectories in clips:
        for tr in trajectories:
            kp = tr.keypoints
            if kp18_format and kp.shape[-2] == 17:
                kp = keypoints17_to_coco18(kp)
            if headless:
                kp = kp[:, :14]
            row = len(persons)
            persons.append(kp.astype(np.float32))
            clip_t = kp.shape[0]
            keys = tr.frame_keys
            num_segs = (
                int(np.ceil((clip_t - seg_len) / seg_stride)) if clip_t > seg_len else 0
            )
            for seg_ind in range(max(num_segs, 0)):
                start = start_offset + seg_ind * seg_stride
                if start >= clip_t or start + seg_len > clip_t:
                    continue
                if not is_seg_continuous(keys, keys[start], seg_len):
                    continue
                w_person.append(row)
                w_start.append(start)
                meta.append([scene_id, clip_id, tr.person_id, keys[start]])
                fids.append(keys[start : start + seg_len])
    if not w_person:
        raise ValueError("no valid windows")
    # gather_windows uses GatherScatterMode.CLIP, which clamps the slice
    # START (not each row) — semantically different from per-row clamping
    # for out-of-range starts. It relies on every window being fully
    # in-bounds for its person's trajectory; check that invariant here, on
    # the host, where violations are cheap to catch. (Vectorized, and a real
    # raise rather than an assert: the safety net must survive python -O.)
    rows = np.asarray(w_person)
    starts = np.asarray(w_start)
    lengths = np.asarray([p.shape[0] for p in persons])
    bad = (starts < 0) | (starts + seg_len > lengths[rows])
    if bad.any():
        i = int(np.argmax(bad))
        raise ValueError(
            f"window [{starts[i]}, {starts[i] + seg_len}) exceeds trajectory "
            f"length {lengths[rows[i]]} for person row {rows[i]} "
            f"({int(bad.sum())} violations total)"
        )
    # Drop trajectories no window ever reads BEFORE padding: every person
    # is padded to the split's longest trajectory, so window-less tracks
    # (shorter than seg_len, or all-discontinuous) would occupy full
    # [f_max, V*C] HBM rows for nothing (round-5 review finding). Remap
    # window_person onto the kept rows.
    used = np.unique(rows)
    if len(used) < len(persons):
        remap = np.full(len(persons), -1, np.int64)
        remap[used] = np.arange(len(used))
        rows = remap[rows]
        w_person = rows.tolist()
        persons = [persons[i] for i in used]
    f_max = max(p.shape[0] for p in persons)
    v, f = persons[0].shape[1], persons[0].shape[2]
    padded = np.zeros((len(persons), f_max, v, f), np.float32)
    for i, p in enumerate(persons):
        padded[i, : p.shape[0]] = p
    return TrajectoryStore(
        traj=jnp.asarray(padded.reshape(len(persons), f_max, v * f)),
        kp_shape=(v, f),
        window_person=np.asarray(w_person, np.int32),
        window_start=np.asarray(w_start, np.int32),
        meta=np.asarray(meta, np.int64),
        frame_ids=np.asarray(fids, np.int32),
        seg_len=seg_len,
        num_transform=num_transform,
        normalization=normalization,
        vid_res=tuple(vid_res),
        symm_range=symm_range,
        sub_mean=sub_mean,
        scaler_center=None if scaler is None else np.asarray(scaler.center),
        scaler_scale=None if scaler is None else np.asarray(scaler.scale),
    )


def gather_windows(traj: jax.Array, person: jax.Array, start: jax.Array,
                   seg_len: int, kp_shape: Tuple[int, int]) -> jax.Array:
    """[P, F, V*C] + per-window (person, start) -> [B, T, V, C] (in-jit).

    Window content is seg_len CONSECUTIVE trajectory rows, so this is ONE
    lax.gather of [1, T, V*C] contiguous slices at B start positions — B*T
    times fewer, T times larger slices than the advanced-indexing form
    `traj[person[:, None], rows]`, and the flat V*C minor dim keeps the
    lanes ~42% utilized instead of ~2% (see TrajectoryStore). Bit-identical
    output (scripts/probe_gather.py / tests/test_device_pipeline.py)."""
    v, c = kp_shape
    starts = jnp.stack([person, start], axis=-1).astype(jnp.int32)  # [B, 2]
    win = jax.lax.gather(
        traj,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1),
        ),
        slice_sizes=(1, seg_len, v * c),
        # CLIP clamps the slice START to F_max - seg_len; unlike advanced
        # indexing it does NOT clamp each row independently. Correctness
        # relies on build_store's invariant that every (person, start)
        # window is fully in-bounds (asserted there, host-side).
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return win.reshape(win.shape[0], seg_len, v, c)


def normalize_windows_device(
    win: jax.Array,
    normalization: str,
    vid_res,
    symm_range: bool,
    sub_mean: bool,
    scaler_center=None,
    scaler_scale=None,
) -> jax.Array:
    """In-jit equivalents of data/normalize.py over [B, T, V, 3] windows."""
    norm = jnp.asarray(list(vid_res) + [1], jnp.float32)
    out = win / norm
    if symm_range:
        out = out.at[..., :2].set(2 * out[..., :2] - 1)
    if normalization == "markovitz":
        if sub_mean:
            mean = jnp.mean(out[..., :2], axis=(1, 2), keepdims=True)
            out = out.at[..., :2].add(-mean)
        return out
    if normalization == "stan":
        out = out - jnp.mean(out, axis=1, keepdims=True)
        xy = out[..., :2]
        smean = jnp.mean(xy, axis=(2, 3), keepdims=True)
        std = jnp.sqrt(jnp.mean((xy - smean) ** 2, axis=(2, 3), keepdims=True) + 1e-5)
        return out.at[..., :2].set(xy / std)
    if normalization == "bbox":
        # NB: the reference's ranges run over axis=-2 of the [..., T, V]
        # coordinate slice — the TIME axis (per-joint temporal extent), not
        # the joint axis (utils/dataset_utils.py:144-147).
        w = out[..., 0].max(-2, keepdims=True) - out[..., 0].min(-2, keepdims=True)
        h = out[..., 1].max(-2, keepdims=True) - out[..., 1].min(-2, keepdims=True)
        out = out.at[..., 0].set(out[..., 0] / w)
        out = out.at[..., 1].set(out[..., 1] / h)
        return out
    if normalization == "robust":
        b, t, v, _ = out.shape
        xy = out[..., :2].reshape(b, t, v * 2)
        missing = xy == 0.0
        center = jnp.asarray(scaler_center, jnp.float32).reshape(v * 2)
        scale = jnp.asarray(scaler_scale, jnp.float32).reshape(v * 2)
        scaled = jnp.where(missing, 0.0, (xy - center) / scale)
        out = out.at[..., :2].set(scaled.reshape(b, t, v, 2))
        return out.at[..., 2].set(1.0)
    if normalization in (None, "none"):
        return win
    raise ValueError(f"Unsupported device normalization {normalization!r}")


def normalize_xy_device(
    win: jax.Array,
    normalization: str,
    vid_res,
    symm_range: bool,
    sub_mean: bool,
    scaler_center=None,
    scaler_scale=None,
) -> jax.Array:
    """xy-only normalization: [B, T, V, 3] windows -> [B, T, V, 2].

    Bit-identical to `normalize_windows_device(...)[..., :2]` (asserted in
    tests/test_device_pipeline.py) but never materializes the 3-channel
    buffer: the .at[..., :2].set writes in the general path lower to two
    full-tensor dynamic-update-slices per step (~0.26 ms at B=2048 on v5e,
    profiled — RESULTS.md round 3); the xy path is one fused elementwise
    chain instead. Used whenever the model consumes num_coords == 2 (every
    reference config) — the confidence channel never affects the xy math in
    any strategy."""
    res = jnp.asarray(list(vid_res), jnp.float32)
    xy = win[..., :2] / res
    if symm_range:
        xy = 2.0 * xy - 1.0
    if normalization == "markovitz":
        if sub_mean:
            xy = xy - jnp.mean(xy, axis=(1, 2), keepdims=True)
        return xy
    if normalization == "stan":
        xy = xy - jnp.mean(xy, axis=1, keepdims=True)
        smean = jnp.mean(xy, axis=(2, 3), keepdims=True)
        std = jnp.sqrt(jnp.mean((xy - smean) ** 2, axis=(2, 3), keepdims=True) + 1e-5)
        return xy / std
    if normalization == "bbox":
        w = xy[..., 0].max(-2, keepdims=True) - xy[..., 0].min(-2, keepdims=True)
        h = xy[..., 1].max(-2, keepdims=True) - xy[..., 1].min(-2, keepdims=True)
        return xy / jnp.stack([w, h], axis=-1)
    if normalization == "robust":
        b, t, v, _ = xy.shape
        flat = xy.reshape(b, t, v * 2)
        missing = flat == 0.0
        center = jnp.asarray(scaler_center, jnp.float32).reshape(v * 2)
        scale = jnp.asarray(scaler_scale, jnp.float32).reshape(v * 2)
        return jnp.where(missing, 0.0, (flat - center) / scale).reshape(
            b, t, v, 2)
    if normalization in (None, "none"):
        return win[..., :2]
    raise ValueError(f"Unsupported device normalization {normalization!r}")


def gather_batch_from_store(
    store: TrajectoryStore,
    traj: jax.Array,
    persons_dev: jax.Array,
    starts_dev: jax.Array,
    indices: jax.Array,
    trans_table: jax.Array,
    num_coords: int = 2,
) -> jax.Array:
    """Logical indices -> normalized, transformed [B, C, T, V] (fully in-jit).

    `persons_dev` / `starts_dev` are the device copies of the window index
    tables; `traj` the resident trajectory tensor.
    """
    n = persons_dev.shape[0]
    sample_idx = indices % n
    trans_idx = indices // n
    win = gather_windows(
        traj, persons_dev[sample_idx], starts_dev[sample_idx], store.seg_len,
        store.kp_shape,
    )
    mats = jnp.take(trans_table, trans_idx, axis=0)
    if num_coords == 2:
        xy = normalize_xy_device(
            win, store.normalization, store.vid_res, store.symm_range,
            store.sub_mean, store.scaler_center, store.scaler_scale,
        )
        return apply_transforms(jnp.transpose(xy, (0, 3, 1, 2)), mats)
    win = normalize_windows_device(
        win, store.normalization, store.vid_res, store.symm_range,
        store.sub_mean, store.scaler_center, store.scaler_scale,
    )
    pose = jnp.transpose(win, (0, 3, 1, 2))  # -> [B, 3, T, V]
    return apply_transforms(pose, mats)[:, :num_coords]


def to_segment_dataset_host(store: TrajectoryStore) -> SegmentDataset:
    """Materialize the store on the host (for comparisons/tests)."""
    v, c = store.kp_shape
    traj = np.asarray(store.traj).reshape(store.traj.shape[0],
                                          store.traj.shape[1], v, c)
    win = traj[store.window_person[:, None],
               store.window_start[:, None] + np.arange(store.seg_len)[None, :]]
    win = np.asarray(
        normalize_windows_device(
            jnp.asarray(win), store.normalization, store.vid_res,
            store.symm_range, store.sub_mean, store.scaler_center,
            store.scaler_scale,
        )
    )
    return SegmentDataset(
        data=np.transpose(win, (0, 3, 1, 2)).astype(np.float32),
        meta=store.meta,
        frame_ids=store.frame_ids,
        num_transform=store.num_transform,
    )
