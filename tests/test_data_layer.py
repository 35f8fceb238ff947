"""Data layer: windowing/normalization/transform parity with the reference
implementation's own numpy functions (imported from /root/reference as the
oracle when present), plus standalone semantic tests."""

import json
import os
import sys

import numpy as np
import pytest

from coskad_tpu.data import alphapose, normalize, transforms, windows

REFERENCE = "/root/reference"


def _reference_utils():
    """Import reference utils.dataset_utils as an oracle (numpy/torch only)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    # The 2022-era reference uses the removed np.int alias.
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    sys.path.insert(0, REFERENCE)
    try:
        import utils.dataset_utils as ref_du  # type: ignore

        return ref_du
    finally:
        sys.path.remove(REFERENCE)


def _synthetic_clip_dict(rng, n_persons=3, n_frames=60, v=17, gaps=True):
    """AlphaPose-style {person: {frame_key: {'keypoints': flat51}}}."""
    clip = {}
    for p in range(1, n_persons + 1):
        frames = {}
        present = range(p, n_frames)  # staggered entry
        for f in present:
            if gaps and p == 2 and f % 17 == 0:
                continue  # drop some frames to exercise continuity logic
            kp = rng.uniform(10, 400, size=(v, 3))
            kp[:, 2] = rng.uniform(0.3, 1.0, size=v)
            frames[f"{f:04d}"] = {"keypoints": kp.reshape(-1).tolist()}
        clip[str(p)] = frames
    return clip


# ------------------------------------------------------------ windowing


@pytest.mark.parametrize("stride", [1, 4, 8])
def test_windowing_matches_reference(stride, rng):
    ref_du = _reference_utils()
    clip = _synthetic_clip_dict(rng)
    ref_data, ref_meta, ref_ids = ref_du.gen_clip_seg_data_np(
        clip, start_ofst=0, seg_stride=stride, seg_len=12, scene_id="01", clip_id="05"
    )

    trajectories = [
        alphapose.parse_person(clip[pid], int(pid))
        for pid in sorted(clip.keys(), key=int)
    ]
    ours_data, ours_meta, ours_ids = windows.segment_clip(
        trajectories, 1, 5, start_offset=0, stride=stride, seg_len=12
    )

    np.testing.assert_allclose(ours_data, ref_data)
    assert ours_meta == [[int(a) for a in m] for m in ref_meta]
    assert ours_ids == ref_ids


def test_continuity_rule():
    keys = [1, 2, 3, 4, 5, 6, 9, 10, 11, 12, 13, 14, 15]
    # window of 12 starting at 1 misses frames 7, 8 -> 2 missing, allowed
    assert windows.is_seg_continuous(keys, 1, 12)
    keys2 = [1, 2, 3, 4, 5, 9, 10, 11, 12, 13, 14, 15, 16]
    # misses 6, 7, 8 -> 3 missing, rejected
    assert not windows.is_seg_continuous(keys2, 1, 12)


def test_kp17_to_18_matches_reference(rng):
    ref_du = _reference_utils()
    kps = rng.normal(size=(7, 12, 17, 3))
    np.testing.assert_allclose(
        windows.keypoints17_to_coco18(kps), ref_du.keypoints17_to_coco18(kps)
    )


# ------------------------------------------------------------ normalization


def test_markovitz_matches_reference(rng):
    ref_du = _reference_utils()
    pose = rng.uniform(0, 400, size=(20, 12, 18, 3))
    ref_out, ref_mean = ref_du.normalize_pose(
        pose.copy(), vid_res=[856, 480], symm_range=True, sub_mean=True
    )
    ours_out, ours_mean = normalize.normalize_markovitz(
        pose, vid_res=[856, 480], symm_range=True, sub_mean=True
    )
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-12)
    np.testing.assert_allclose(ours_mean, ref_mean, rtol=1e-12)


def test_robust_matches_reference(rng):
    pytest.importorskip("sklearn")
    ref_du = _reference_utils()
    pose = rng.uniform(0, 400, size=(50, 12, 17, 3))
    pose[rng.random(pose.shape[:-1]) < 0.05] = 0.0  # missing keypoints
    ref_out, ref_scaler = ref_du.normalize_pose_robust(
        pose.copy(), vid_res=[1080, 720], symm_range=True
    )
    ours_out, ours_scaler = normalize.normalize_robust(
        pose, vid_res=[1080, 720], symm_range=True
    )
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours_scaler.center, ref_scaler.center_, rtol=1e-9)
    np.testing.assert_allclose(ours_scaler.scale, ref_scaler.scale_, rtol=1e-9)
    # Reusing the fitted scaler (test split path) matches too.
    pose2 = rng.uniform(0, 400, size=(20, 12, 17, 3))
    ref2, _ = ref_du.normalize_pose_robust(
        pose2.copy(), scaler=ref_scaler, vid_res=[1080, 720], symm_range=True
    )
    ours2, _ = normalize.normalize_robust(
        pose2, scaler=ours_scaler, vid_res=[1080, 720], symm_range=True
    )
    np.testing.assert_allclose(ours2, ref2, rtol=1e-9, atol=1e-12)


def test_stan_and_bbox_match_reference(rng):
    ref_du = _reference_utils()
    pose = rng.uniform(1, 400, size=(16, 12, 18, 3))
    ref_s, _ = ref_du.normalize_pose_stan(pose.copy(), vid_res=[640, 360])
    ours_s, _ = normalize.normalize_stan(pose, vid_res=[640, 360])
    np.testing.assert_allclose(ours_s, ref_s, rtol=1e-10)
    ref_b, _ = ref_du.normalize_pose_bbox(pose.copy(), vid_res=[640, 360])
    ours_b, _ = normalize.normalize_bbox(pose, vid_res=[640, 360])
    np.testing.assert_allclose(ours_b, ref_b, rtol=1e-10)


# ------------------------------------------------------------ transforms


def test_affine_table_matches_reference():
    ref_du = _reference_utils()
    ours = transforms.canonical_transforms(5)
    for i, pt in enumerate(ref_du.ae_trans_list):
        np.testing.assert_allclose(ours[i], pt.trans_mat.numpy(), atol=1e-7)


def test_apply_transforms_matches_reference(rng):
    ref_du = _reference_utils()
    pose = rng.normal(size=(4, 3, 12, 18)).astype(np.float32)  # C=3 incl conf
    table = transforms.canonical_transforms(5)
    import jax.numpy as jnp

    for k in range(5):
        ref_out = np.stack(
            [ref_du.apply_pose_transform(p, ref_du.ae_trans_list[k].trans_mat) for p in pose]
        )
        ours = transforms.apply_transforms(
            jnp.asarray(pose), jnp.asarray(np.tile(table[k], (4, 1, 1)))
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4, atol=1e-5)


def test_gather_batch_indexing(rng):
    """Logical index i -> (sample i % N, transform i // N), like the
    reference's __getitem__ (utils/dataset.py:65-80)."""
    import jax.numpy as jnp

    n, c, t, v = 6, 3, 4, 5
    data = jnp.asarray(rng.normal(size=(n, c, t, v)).astype(np.float32))
    table = jnp.asarray(transforms.canonical_transforms(5))
    idx = jnp.asarray([0, n, 2 * n + 3])  # (s0,t0), (s0,t1), (s3,t2)
    out = transforms.gather_batch(data, idx, table, num_coords=2)
    assert out.shape == (3, 2, t, v)
    np.testing.assert_allclose(out[0], data[0, :2], rtol=1e-6)  # identity
    # flip: x negated
    np.testing.assert_allclose(np.asarray(out[1][0]), -np.asarray(data[0, 0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1][1]), np.asarray(data[0, 1]), rtol=1e-5)


# ------------------------------------------------------------ end-to-end load


def test_load_alphapose_split(tmp_path, rng):
    d = tmp_path / "train"
    d.mkdir()
    for scene, clip in [(1, 1), (1, 2)]:
        clip_dict = _synthetic_clip_dict(rng)
        with open(d / f"{scene:02d}_{clip:04d}_alphapose.json", "w") as f:
            json.dump(clip_dict, f)
    ds = alphapose.load_alphapose_split(
        str(d), seg_len=12, seg_stride=8, kp18_format=True,
        normalization_strategy="markovitz", vid_res=[856, 480],
    )
    assert ds.data.ndim == 4 and ds.data.shape[1:] == (3, 12, 18)
    assert ds.meta.shape == (ds.num_windows, 4)
    assert ds.frame_ids.shape == (ds.num_windows, 12)
    assert len(ds) == ds.num_windows * 5
    assert ds.means.shape == (ds.num_windows, 2)
    assert set(np.unique(ds.meta[:, 1])) == {1, 2}


def test_is_person_dict_continuous():
    from coskad_tpu.data.windows import is_person_dict_continuous

    assert is_person_dict_continuous([1, 2, 3, 5, 6])  # 1 missing over span 5
    assert not is_person_dict_continuous([1, 2, 10, 11, 12])


def test_calculate_loss_pow4():
    from coskad_tpu.score.window_losses import calculate_loss

    x = np.array([[1.0, 1.0], [2.0, 2.0]])
    t = np.zeros_like(x)
    np.testing.assert_allclose(calculate_loss(x, t), [1.0, 4.0])
    np.testing.assert_allclose(calculate_loss(x, t, to_pow=True), [1.0, 256.0])


def test_legacy_pose_dataset_mp(tmp_path, rng):
    """Compat shim for the reference's dead utils/pose_dataset_mp.py: same
    indexing (i % N sample, i // N transform), same positional return
    contract, same person_keys format."""
    from coskad_tpu.data.legacy_mp import PoseDatasetMP
    from coskad_tpu.data.transforms import canonical_transforms

    d = tmp_path / "train"
    d.mkdir()
    for scene, clip in [(1, 1), (1, 2)]:
        clip_dict = _synthetic_clip_dict(rng)
        with open(d / f"{scene:02d}_{clip:04d}_alphapose.json", "w") as f:
            json.dump(clip_dict, f)

    ds = PoseDatasetMP(
        str(d), transform_list=5, return_metadata=True, return_indices=True,
        seg_len=12, seg_stride=8, kp18_format=True, sub_mean=True,
        return_mean=True, vid_res=[856, 480],
    )
    n = ds.num_samples
    assert len(ds) == 5 * n
    assert (ds.C, ds.T, ds.V) == (3, 12, 18)
    # identity transform row: item == stored window (num_coords slice)
    data0, t0, meta0, ids0, mean0, idx0 = ds[0]
    assert t0 == 0 and idx0 == 0
    np.testing.assert_allclose(data0, ds.segs_data_np[0, :2])
    assert meta0.shape == (4,) and ids0.shape == (12,) and mean0.shape == (2,)
    # transform row 1 (flip): x negated relative to the identity row
    data_f, t1 = ds[n][0], ds[n][1]
    assert t1 == 1
    np.testing.assert_allclose(data_f[0], -ds.segs_data_np[0, 0], atol=1e-6)
    np.testing.assert_allclose(data_f[1], ds.segs_data_np[0, 1], atol=1e-6)
    # person_keys: '{scene:02d}_{clip:04d}_{person:02d}' -> int frame keys
    assert "01_0001_01" in ds.person_keys
    assert all(isinstance(k, int) for k in ds.person_keys["01_0001_01"])
    # no-transform mode matches the reference's num_transform=1 fallback
    ds1 = PoseDatasetMP(str(d), transform_list=None, seg_len=12, seg_stride=8,
                        return_mean=False, normalize_pose=False)
    assert len(ds1) == ds1.num_samples
    item = ds1[3]
    np.testing.assert_allclose(item[0], ds1.segs_data_np[3, :2])
    # explicit matrix table accepted
    ds2 = PoseDatasetMP(str(d), transform_list=canonical_transforms(3),
                        seg_len=12, seg_stride=8, return_mean=False,
                        normalize_pose=False)
    assert ds2.num_transform == 3
