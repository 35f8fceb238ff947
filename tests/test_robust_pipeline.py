"""Morais robust pipeline: parity with the reference's utils/data.py,
utils/preprocessing.py, utils/get_robust_data.py on synthetic CSV data."""

import os
import sys

import numpy as np
import pytest

from coskad_tpu.data import trajectories as tj
from coskad_tpu.data.robust import load_robust_split, robust_windows

REFERENCE = "/root/reference"


def _reference_data_mod():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if not hasattr(np, "int"):
        np.int = int
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import utils.data as ref_data
    import utils.preprocessing as ref_prep

    return ref_data, ref_prep


def _write_csv_tree(root, split="training", n_clips=2, n_persons=2,
                    n_frames=60, v=17, seed=0):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, split, "trajectories")
    for c in range(1, n_clips + 1):
        folder = os.path.join(base, f"1-{c}")
        os.makedirs(folder, exist_ok=True)
        for p in range(1, n_persons + 1):
            frames = np.arange(1, n_frames + 1)
            coords = rng.uniform(50, 600, size=(n_frames, v * 2))
            coords[rng.random(coords.shape) < 0.03] = 0.0  # missing joints
            arr = np.concatenate([frames[:, None], coords], axis=1)
            np.savetxt(os.path.join(folder, f"{p:04d}.csv"), arr, delimiter=",",
                       fmt="%.6f")
    return base


def test_bounding_box_matches_reference(rng):
    ref_data, _ = _reference_data_mod()
    res = np.array([856.0, 480.0], np.float32)
    for seed in range(5):
        kps = np.random.default_rng(seed).uniform(0, 900, size=34).astype(np.float32)
        kps[seed] = 0.0
        assert tj.compute_bounding_box(kps, res) == ref_data.compute_bounding_box(kps, res)


def test_bbox_centre_coordinates_match_reference(tmp_path, rng):
    ref_data, _ = _reference_data_mod()
    res = np.array([856.0, 480.0], np.float32)
    coords = rng.uniform(10, 800, size=(20, 34)).astype(np.float32)
    coords[rng.random(coords.shape) < 0.05] = 0.0
    ref_tr = ref_data.Trajectory("1-1_0001", np.arange(20), coords.copy())
    ref_tr.change_coordinate_system(res, coordinate_system="bounding_box_centre")
    ours = tj.Trajectory("1-1_0001", np.arange(20), coords.copy())
    ours.to_bounding_box_centre(res)
    np.testing.assert_allclose(ours.coordinates, ref_tr.coordinates, rtol=1e-5, atol=1e-6)


def test_global_features_match_reference(rng):
    ref_data, _ = _reference_data_mod()
    res = np.array([856.0, 480.0], np.float32)
    coords = rng.uniform(10, 800, size=(15, 34)).astype(np.float32)
    ref_tr = ref_data.Trajectory("1-1_0001", np.arange(15), coords.copy())
    ref_tr.use_global_features(res)
    ours = tj.Trajectory("1-1_0001", np.arange(15), coords.copy())
    np.testing.assert_allclose(ours.global_features(res), ref_tr.coordinates,
                               rtol=1e-5, atol=1e-6)


def test_missing_step_interpolation_matches_reference(rng):
    ref_data, _ = _reference_data_mod()
    coords = rng.uniform(10, 100, size=(12, 6)).astype(np.float32)
    coords[4:7] = 0.0  # fully missing block
    coords[9] = 0.0
    ref_tr = ref_data.Trajectory("1-1_0001", np.arange(12), coords.copy())
    ref_tr.input_missing_steps()
    ours = tj.Trajectory("1-1_0001", np.arange(12), coords.copy())
    ours.input_missing_steps()
    np.testing.assert_allclose(ours.coordinates, ref_tr.coordinates, rtol=1e-6)


@pytest.mark.parametrize("strategy", ["zero_one", "three_stds", "robust"])
def test_scalers_match_reference(strategy, rng):
    ref_data, _ = _reference_data_mod()
    x = rng.uniform(-1, 1, size=(300, 8))
    x[rng.random(x.shape) < 0.1] = 0.0
    ref_out, ref_scaler = ref_data.scale_trajectories(x.copy(), strategy=strategy)
    ours_out, ours_scaler = tj.scale_trajectories(x.copy(), strategy=strategy)
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-6, atol=1e-9)
    # reuse path (test split)
    x2 = rng.uniform(-1, 1, size=(50, 8))
    ref_out2, _ = ref_data.scale_trajectories(x2.copy(), scaler=ref_scaler,
                                              strategy=strategy)
    ours_out2, _ = tj.scale_trajectories(x2.copy(), scaler=ours_scaler,
                                         strategy=strategy)
    np.testing.assert_allclose(ours_out2, ref_out2, rtol=1e-6, atol=1e-9)


def test_window_aggregation_matches_reference(rng):
    ref_data, ref_prep = _reference_data_mod()
    coords = rng.uniform(size=(40, 34)).astype(np.float32)
    frames = np.arange(3, 43)
    for gap in (0, 1):
        ref_tr = {"1-2_0007": ref_data.Trajectory("1-2_0007", frames, coords.copy())}
        ref_x, _, (ref_meta, ref_ids), _ = ref_prep.aggregate_rnn_autoencoder_data(
            ref_tr, input_length=12, input_gap=gap, pred_length=0, return_ids=True
        )
        ours_tr = {"1-2_0007": tj.Trajectory("1-2_0007", frames, coords.copy())}
        ours_x, ours_meta, ours_ids = tj.aggregate_windows(ours_tr, 12, gap)
        np.testing.assert_allclose(ours_x, ref_x)
        assert ours_meta == ref_meta
        np.testing.assert_allclose(np.asarray(ours_ids), np.asarray(ref_ids))


def test_full_robust_pipeline_matches_reference(tmp_path, rng):
    """End-to-end: our robust_windows vs the reference's
    data_of_combined_model on the same CSV tree."""
    ref_exp = str(tmp_path / "ref_exp")
    ours_exp = str(tmp_path / "ours_exp")
    os.makedirs(ref_exp), os.makedirs(ours_exp)
    _write_csv_tree(str(tmp_path))

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from utils.get_robust_data import data_of_combined_model

    (ref_g, _), (ref_l, (ref_meta, ref_ids)) = data_of_combined_model(
        trajectories_path=str(tmp_path), split="train", seg_len=12, seg_stride=1,
        vid_res=[856, 480], normalization_strategy="robust", exp_dir=ref_exp,
        reconstruct_original_data=False, normalize_pose=True,
        include_global=True, debug=False,
    )
    (ours_g, _), (ours_l, (ours_meta, ours_ids)) = robust_windows(
        str(tmp_path), split="train", seg_len=12, seg_stride=1,
        vid_res=[856, 480], normalization_strategy="robust", exp_dir=ours_exp,
        normalize_pose=True, include_global=True, debug=False,
    )
    np.testing.assert_allclose(ours_l, ref_l, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ours_g, ref_g, rtol=1e-5, atol=1e-7)
    assert [list(m) for m in ours_meta] == [list(m) for m in ref_meta]


def test_load_robust_split_shapes(tmp_path):
    _write_csv_tree(str(tmp_path))
    ds = load_robust_split(
        str(tmp_path), split="train", seg_len=12, seg_stride=1,
        vid_res=[856, 480], exp_dir=str(tmp_path / "exp"), num_transform=5,
    )
    assert ds.data.shape[1:] == (3, 12, 17)
    assert ds.meta.shape[1] == 4
    assert ds.frame_ids.shape[1] == 12
    assert len(ds) == ds.num_windows * 5
    # conf channel is all ones
    np.testing.assert_allclose(ds.data[:, 2], 1.0)


def test_global_features_delta_and_reference_frame(rng):
    ref_data, _ = _reference_data_mod()
    res = np.array([856.0, 480.0], np.float32)
    coords = rng.uniform(10, 800, size=(15, 34)).astype(np.float32)
    for kwargs in (dict(extract_delta=True),
                   dict(use_first_step_as_reference=True),
                   dict(extract_delta=True, use_first_step_as_reference=True)):
        ref_tr = ref_data.Trajectory("1-1_0001", np.arange(15), coords.copy())
        ref_tr.use_global_features(res, **kwargs)
        ours = tj.Trajectory("1-1_0001", np.arange(15), coords.copy())
        np.testing.assert_allclose(
            ours.global_features(res, **kwargs), ref_tr.coordinates,
            rtol=1e-5, atol=1e-5,
        )


def test_split_into_train_and_test_matches_reference(rng):
    ref_data, _ = _reference_data_mod()
    trajs = {}
    for i in range(40):
        n = int(rng.integers(5, 60))
        trajs[f"1-{i}_0001"] = tj.Trajectory(
            f"1-{i}_0001", np.arange(n), rng.normal(size=(n, 34)).astype(np.float32)
        )
    ref_trajs = {
        k: ref_data.Trajectory(k, v.frames.copy(), v.coordinates.copy())
        for k, v in trajs.items()
    }
    ours_train, ours_val = tj.split_into_train_and_test(trajs, 0.8, seed=42)
    ref_train, ref_val = ref_data.split_into_train_and_test(ref_trajs, 0.8, seed=42)
    assert list(ours_train.keys()) == list(ref_train.keys())
    assert list(ours_val.keys()) == list(ref_val.keys())


def test_remove_missing_skeletons():
    x = np.array([[1.0, 2.0], [0.0, 0.0], [3.0, 0.0]])
    ids = np.array([10, 20, 30])
    out, (kept_ids,) = tj.remove_missing_skeletons(x, ids)
    np.testing.assert_allclose(out, [[1.0, 2.0], [3.0, 0.0]])
    np.testing.assert_allclose(kept_ids, [10, 30])


def test_robust_split_uses_provided_scaler_over_pickles(tmp_path, rng):
    """A checkpoint-restored scaler takes priority over exp_dir pickles and
    is returned on the dataset for re-checkpointing."""
    _write_csv_tree(str(tmp_path), split="testing")
    from coskad_tpu.data.normalize import RobustScalerState

    scaler = RobustScalerState(center=np.zeros(34), scale=np.ones(34))
    ds = load_robust_split(
        str(tmp_path), split="test", seg_len=12, seg_stride=1,
        vid_res=[856, 480], exp_dir=str(tmp_path / "empty_exp"),
        num_transform=1, scaler=scaler,
    )
    assert ds.scaler is scaler  # no pickle needed, none written


def test_include_global_seven_channel_training(tmp_path, rng):
    """num_coords=6 trains on x,y + 4 global bbox features (reference
    PoseDatasetRobust include_global, utils/dataset.py:262-265)."""
    import dataclasses
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import tiny_config

    from coskad_tpu.train.loop import Trainer

    _write_csv_tree(str(tmp_path), n_frames=120)
    ds = load_robust_split(
        str(tmp_path), split="train", seg_len=6, seg_stride=1,
        vid_res=[856, 480], exp_dir=str(tmp_path / "exp"), num_transform=2,
        include_global=True,
    )
    assert ds.data.shape[1] == 7  # x, y, 4 global, conf
    cfg = tiny_config("euclidean_static", epochs=1)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, num_coords=6),
        data=dataclasses.replace(cfg.data, n_joints_override=17, seg_len=6),
    )
    trainer = Trainer(cfg, ds)
    state, history = trainer.fit()
    assert np.isfinite(history["loss"]).all()


def test_cli_train_eval_include_global_robust(tmp_path):
    """Full CLI path for num_coords=6: robust CSVs -> 7-channel windows ->
    train -> checkpoint -> eval AUC (reference PoseDatasetRobust
    include_global consumed via utils/dataset.py:310-320 when
    args.num_coords == 6)."""
    import yaml

    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli import train as train_cli

    root = str(tmp_path)
    n_frames = 120
    _write_csv_tree(root, split="training", n_clips=2, n_frames=n_frames)
    _write_csv_tree(root, split="testing", n_clips=2, n_frames=n_frames,
                    seed=3)
    gt_dir = os.path.join(root, "gt")
    os.makedirs(gt_dir)
    for c in (1, 2):
        gt = np.zeros(n_frames, dtype=np.uint8)
        gt[40:70] = 1
        np.save(os.path.join(gt_dir, f"1_{c}.npy"), gt)

    cfg = {
        "dataset_choice": "Synthetic",
        "dataset_path_to_robust": root,
        "gt_path": gt_dir,
        "exp_dir": os.path.join(root, "checkpoints"),
        "dir_name": "global7",
        "seed": 0,
        "validation": False,
        "static_center": True,
        "num_coords": 6,
        "channels": [16, 8],
        "h_dim": 16,
        "latent_dim": 8,
        "projector": "linear",
        "alpha": 1e-6,
        "dataset_seg_len": 6,
        "dataset_seg_stride": 1,
        "dataset_num_transform": 2,
        "dataset_vid_res": [856, 480],
        "dataset_kp18_format": False,
        "dataset_normalize_pose": True,
        "dataset_normalization_strategy": "robust",
        "dataset_batch_size": 128,
        "ae_epochs": 1,
        "opt_lr": 1e-4,
        "pad_size": -1,
        "smoothing": 50,
        "use_hr": False,
    }
    cfg_path = os.path.join(root, "global7.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    train_cli.main(["--config", cfg_path, "--epochs", "1"])
    ckpt_dir = os.path.join(root, "checkpoints", "Synthetic", "global7")
    assert os.path.exists(os.path.join(ckpt_dir, "last.ckpt"))
    # the global-feature scaler persisted alongside the local one
    assert os.path.exists(os.path.join(ckpt_dir, "global_robust.pickle"))

    result = eval_cli.main(["--config", cfg_path])
    assert np.isfinite(result.auc) and 0.0 <= result.auc <= 1.0
    assert len(result.per_transform_auc) == 2
    assert result.scores.shape == (2 * n_frames,)
