"""Fused device-side preprocessing: exact agreement with the host loader and
end-to-end training through the TrajectoryStore pipeline."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.data import alphapose, device_pipeline, transforms
from coskad_tpu.data.device_pipeline import (
    TrajectoryStore,
    build_store,
    gather_batch_from_store,
    to_segment_dataset_host,
)


def _clip_files(tmp_path, rng, n_clips=2, n_frames=60):
    paths = []
    for c in range(1, n_clips + 1):
        clip = {}
        for pid in ("1", "2"):
            frames = {}
            for f in range(int(pid), n_frames):
                if pid == "2" and f % 19 == 0:
                    continue  # gaps exercise the continuity rule
                kp = rng.uniform(10, 800, size=(17, 3))
                frames[f"{f:04d}"] = {"keypoints": kp.reshape(-1).tolist()}
            clip[pid] = frames
        p = tmp_path / f"01_{c:04d}_t.json"
        p.write_text(json.dumps(clip))
        paths.append((1, c, str(p)))
    return paths


@pytest.mark.parametrize("norm,kwargs", [
    ("markovitz", dict(sub_mean=True)),
    ("markovitz", dict(sub_mean=False)),
    ("stan", {}),
    ("bbox", {}),
])
def test_store_matches_host_loader(tmp_path, rng, norm, kwargs):
    paths = _clip_files(tmp_path, rng)
    host = alphapose.load_alphapose_split(
        str(tmp_path), seg_len=12, seg_stride=4, kp18_format=True,
        normalization_strategy=norm, vid_res=[856, 480],
        sub_mean=kwargs.get("sub_mean", True),
    )
    clips = [
        (s, c, alphapose.parse_clip_json(p)) for s, c, p in paths
    ]
    store = build_store(
        clips, seg_len=12, seg_stride=4, kp18_format=True,
        normalization=norm, vid_res=(856, 480),
        sub_mean=kwargs.get("sub_mean", True),
    )
    assert store.num_windows == host.num_windows
    np.testing.assert_allclose(store.meta, host.meta)
    np.testing.assert_allclose(store.frame_ids, host.frame_ids)
    materialized = to_segment_dataset_host(store)
    # host path computes in float64, device in float32
    np.testing.assert_allclose(materialized.data, host.data, rtol=1e-4, atol=5e-4)


def test_gather_windows_flat_slice_gather(rng):
    """The flat-store slice gather ([P, F, V*C] + one [1, T, V*C] slice per
    window) is bit-identical to advanced row indexing of the 4-D store —
    the formulation it replaced (~5x faster on v5e, RESULTS.md round 3)."""
    p, f, v, c, t, b = 7, 40, 18, 3, 12, 64
    traj4 = rng.uniform(10, 800, size=(p, f, v, c)).astype(np.float32)
    person = rng.integers(0, p, b).astype(np.int32)
    start = rng.integers(0, f - t + 1, b).astype(np.int32)
    ref = traj4[person[:, None], start[:, None] + np.arange(t)[None, :]]
    got = device_pipeline.gather_windows(
        jnp.asarray(traj4.reshape(p, f, v * c)), jnp.asarray(person),
        jnp.asarray(start), t, (v, c),
    )
    assert got.shape == (b, t, v, c)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_store_robust_scaler_path(tmp_path, rng):
    paths = _clip_files(tmp_path, rng)
    host = alphapose.load_alphapose_split(
        str(tmp_path), seg_len=12, seg_stride=4, kp18_format=False,
        normalization_strategy="robust", vid_res=[856, 480],
    )
    clips = [(s, c, alphapose.parse_clip_json(p)) for s, c, p in paths]
    store = build_store(
        clips, seg_len=12, seg_stride=4, kp18_format=False,
        normalization="robust", vid_res=(856, 480), scaler=host.scaler,
    )
    materialized = to_segment_dataset_host(store)
    np.testing.assert_allclose(materialized.data, host.data, rtol=1e-4, atol=1e-6)


def test_gather_batch_matches_windows_pipeline(tmp_path, rng):
    """Fused store gather == windows-pipeline gather for the same logical
    indices (incl. transform expansion)."""
    from coskad_tpu.data.transforms import canonical_transforms, gather_batch

    paths = _clip_files(tmp_path, rng)
    host = alphapose.load_alphapose_split(
        str(tmp_path), seg_len=12, seg_stride=4, normalization_strategy="markovitz",
        vid_res=[856, 480],
    )
    clips = [(s, c, alphapose.parse_clip_json(p)) for s, c, p in paths]
    store = build_store(clips, seg_len=12, seg_stride=4, vid_res=(856, 480))
    table = jnp.asarray(canonical_transforms(5))
    n = host.num_windows
    idx = jnp.asarray(np.random.default_rng(0).permutation(n * 5)[:32])
    ref = gather_batch(jnp.asarray(host.data), idx, table, 2)
    ours = gather_batch_from_store(
        store, store.traj, jnp.asarray(store.window_person),
        jnp.asarray(store.window_start), idx, table, 2,
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-6)


def test_train_through_store_pipeline(tmp_path, rng):
    """End-to-end: Trainer fits and validates on the fused pipeline, and its
    center init matches the windows pipeline."""
    import dataclasses

    from coskad_tpu.train.loop import Trainer

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import tiny_config

    paths = _clip_files(tmp_path, rng, n_clips=1, n_frames=200)
    host = alphapose.load_alphapose_split(
        str(tmp_path), seg_len=6, seg_stride=2, kp18_format=False,
        normalization_strategy="markovitz", vid_res=[856, 480], num_transform=2,
    )
    clips = [(s, c, alphapose.parse_clip_json(p)) for s, c, p in paths]
    store = build_store(clips, seg_len=6, seg_stride=2, kp18_format=False,
                        vid_res=(856, 480), num_transform=2)
    cfg = tiny_config("euclidean_static", epochs=1)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, n_joints_override=17, seg_len=6)
    )
    tr_store = Trainer(cfg, store)
    tr_win = Trainer(cfg, host)
    s1 = tr_store.initialize_center(tr_store.init_state())
    s2 = tr_win.initialize_center(tr_win.init_state())
    np.testing.assert_allclose(
        np.asarray(s1.center), np.asarray(s2.center), rtol=1e-4, atol=1e-5
    )
    state, history = tr_store.fit(state=s1, epochs=1)
    assert np.isfinite(history["loss"]).all()


@pytest.mark.parametrize("norm,kwargs", [
    ("markovitz", dict(sub_mean=True)),
    ("markovitz", dict(sub_mean=False)),
    ("stan", {}),
    ("bbox", {}),
    ("robust", {}),
    ("none", {}),
])
def test_normalize_xy_matches_full(rng, norm, kwargs):
    """normalize_xy_device == normalize_windows_device[..., :2] for every
    strategy — the xy fast path must be a pure layout optimization."""
    win = jnp.asarray(rng.uniform(0, 800, size=(8, 12, 17, 3)), jnp.float32)
    # plant zeros so the robust missing-keypoint rule is exercised
    win = win.at[0, 3, 5, :2].set(0.0)
    skw = {}
    if norm == "robust":
        skw = dict(
            scaler_center=rng.normal(size=(17, 2)).astype(np.float32),
            scaler_scale=rng.uniform(0.5, 2.0, size=(17, 2)).astype(np.float32),
        )
    for symm in (False, True):
        full = device_pipeline.normalize_windows_device(
            win, norm, (856, 480), symm, kwargs.get("sub_mean", True), **skw)
        fast = device_pipeline.normalize_xy_device(
            win, norm, (856, 480), symm, kwargs.get("sub_mean", True), **skw)
        assert fast.shape == (8, 12, 17, 2)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(full)[..., :2])


def test_gather_batch_xy_fast_path(rng):
    """gather_batch num_coords=2 (slice-before-transform) == the general
    transform-then-slice path, bit for bit."""
    from coskad_tpu.data.transforms import (
        apply_transforms, canonical_transforms, gather_batch)

    data = jnp.asarray(rng.normal(size=(20, 3, 6, 17)), jnp.float32)
    table = jnp.asarray(canonical_transforms(5))
    idx = jnp.asarray(np.random.default_rng(1).permutation(100)[:32])
    fast = gather_batch(data, idx, table, num_coords=2)
    batch = jnp.take(data, idx % 20, axis=0)
    mats = jnp.take(table, idx // 20, axis=0)
    ref = apply_transforms(batch, mats)[:, :2]
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))


def test_load_alphapose_store_loader(tmp_path, rng):
    """The directory-level store loader (used by the CLI's device_pipeline
    knob) walks clips like load_alphapose_split: identical window metadata,
    and a clear error for robust normalization without a fitted scaler."""
    _clip_files(tmp_path, rng)
    host = alphapose.load_alphapose_split(
        str(tmp_path), seg_len=12, seg_stride=1, kp18_format=True,
        normalization_strategy="markovitz", num_transform=3)
    store = alphapose.load_alphapose_store(
        str(tmp_path), seg_len=12, seg_stride=1, kp18_format=True,
        normalization_strategy="markovitz", num_transform=3)
    assert store.num_windows == host.num_windows
    assert len(store) == len(host)  # windows x transforms
    np.testing.assert_array_equal(store.meta, host.meta)
    np.testing.assert_array_equal(store.frame_ids, host.frame_ids)

    with pytest.raises(ValueError, match="pre-fitted"):
        alphapose.load_alphapose_store(
            str(tmp_path), normalization_strategy="robust")


def test_store_drops_windowless_trajectories():
    """Trajectories that yield no window (shorter than seg_len) must not
    occupy padded HBM rows; window_person is remapped onto the kept rows
    and gathers are unchanged (round-5 review finding)."""
    from coskad_tpu.data.alphapose import PersonTrajectory
    from coskad_tpu.data.device_pipeline import build_store, gather_batch_from_store

    rng = np.random.default_rng(0)

    def traj(pid, n):
        return PersonTrajectory(
            person_id=pid, frame_keys=list(range(1, n + 1)),
            keypoints=rng.normal(size=(n, 5, 3)),
        )

    long_a, short, long_b = traj(1, 40), traj(2, 4), traj(3, 30)
    clips = [(1, 1, [long_a, short, long_b])]
    store = build_store(clips, seg_len=6, seg_stride=1, kp18_format=False,
                        normalization="none", num_transform=1)
    # the 4-frame trajectory contributes no windows and no padded row
    assert store.traj.shape[0] == 2
    assert store.window_person.max() == 1
    # the remapped gather still reads the right person's keypoints
    import jax.numpy as jnp

    from coskad_tpu.data.transforms import canonical_transforms

    idx = jnp.asarray([0, store.num_windows - 1])
    table = jnp.asarray(canonical_transforms(1))
    batch = gather_batch_from_store(
        store, store.traj, jnp.asarray(store.window_person),
        jnp.asarray(store.window_start), idx, table, num_coords=2)
    start_b = int(store.window_start[-1])
    np.testing.assert_allclose(
        np.asarray(batch[1]).transpose(1, 2, 0),
        long_b.keypoints[start_b:start_b + 6, :, :2], rtol=1e-6)
