"""scripts/prepare_data.py: layout validation, arranging, config emission.

The real-data on-ramp (reference README.md:36-76 dataset + eval
instructions) must take a MoCoDAD-layout tree to a loadable config — and
its debug smoke mode must reproduce the reference's 5-clip protocol
(utils/dataset.py:27-29)."""

import json
import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
sys.path.insert(0, os.path.dirname(__file__))

import prepare_data  # noqa: E402
from fixtures import _make_clip  # noqa: E402

from coskad_tpu.cli.common import load_config, load_split  # noqa: E402


def _mocodad_tree(root, n_train=7, n_test=2, n_frames=80, flat=False):
    """A minimal MoCoDAD/HR-Avenue-layout tree: pose JSONs + GT masks."""
    rng = np.random.default_rng(0)
    pose_base = root if flat else os.path.join(root, "pose")
    for split, n in (("training", n_train), ("testing", n_test)):
        d = os.path.join(pose_base, split)
        os.makedirs(d, exist_ok=True)
        for i in range(1, n + 1):
            span = (20, 50) if split == "testing" else None
            clip, gt = _make_clip(rng, n_frames, 17, anomaly_span=span)
            with open(os.path.join(d, f"01_{i:04d}_tracked.json"), "w") as f:
                json.dump(clip, f)
            if split == "testing":
                gt_dir = os.path.join(root, "testing", "test_frame_mask")
                os.makedirs(gt_dir, exist_ok=True)
                np.save(os.path.join(gt_dir, f"01_{i:04d}.npy"), gt)
    return root


def test_validates_good_tree_and_emits_config(tmp_path):
    root = _mocodad_tree(str(tmp_path / "HR-Avenue"))
    out = str(tmp_path / "run.yaml")
    rc = prepare_data.main([
        "--root", root, "--dataset", "HR-Avenue", "--out-config", out,
    ])
    assert rc == 0
    cfg = load_config(out)
    assert cfg.data.pose_dirs["train"] == os.path.join(
        root, "pose", "training"
    )
    assert cfg.data.gt_dir == os.path.join(root, "testing",
                                           "test_frame_mask")
    assert cfg.data.num_clips is None


def test_smoke_mode_sets_debug_five_clips(tmp_path):
    root = _mocodad_tree(str(tmp_path / "HR-Avenue"))
    out = str(tmp_path / "smoke.yaml")
    rc = prepare_data.main([
        "--root", root, "--dataset", "HR-Avenue", "--out-config", out,
        "--smoke",
    ])
    assert rc == 0
    raw = yaml.safe_load(open(out))
    assert raw["debug"] is True
    cfg = load_config(out)
    # The reference's debug protocol: 5 clips, epochs capped at 10
    # (utils/dataset.py:27-29, utils/argparser.py:11-12).
    assert cfg.data.num_clips == 5
    assert cfg.opt.epochs <= 10
    # The debug dataset actually loads and is capped at 5 clips.
    ds = load_split(cfg, "train")
    scenes_clips = {tuple(m[:2]) for m in np.asarray(ds.meta)[:, :2].tolist()}
    assert len(scenes_clips) == 5


def test_arrange_symlinks_flat_layout(tmp_path):
    root = _mocodad_tree(str(tmp_path / "flat"), flat=True)
    # report-only first: must not modify the tree
    prepare_data.main(["--root", root, "--dataset", "HR-Avenue"])
    assert not os.path.isdir(os.path.join(root, "pose", "training"))
    rc = prepare_data.main(["--root", root, "--dataset", "HR-Avenue",
                            "--arrange"])
    assert rc == 0
    assert os.path.islink(os.path.join(root, "pose", "training"))
    assert os.path.isdir(os.path.join(root, "pose", "testing"))


def test_rejects_bad_layout_and_bad_masks(tmp_path):
    root = str(tmp_path / "empty")
    os.makedirs(root)
    assert prepare_data.main(["--root", root, "--dataset", "HR-Avenue"]) == 1

    root = _mocodad_tree(str(tmp_path / "badmask"))
    # Mask shorter than the frames the pose JSON references.
    gt_dir = os.path.join(root, "testing", "test_frame_mask")
    np.save(os.path.join(gt_dir, "01_0001.npy"), np.zeros(3, dtype=int))
    assert prepare_data.main(["--root", root, "--dataset", "HR-Avenue"]) == 1

    root = _mocodad_tree(str(tmp_path / "badname"))
    os.rename(
        os.path.join(root, "pose", "training", "01_0001_tracked.json"),
        os.path.join(root, "pose", "training", "notaclip.json"),
    )
    assert prepare_data.main(["--root", root, "--dataset", "HR-Avenue"]) == 1


def test_ubnormal_requires_validating_split(tmp_path):
    root = _mocodad_tree(str(tmp_path / "UBnormal"))
    # No pose/validating or validating/test_frame_mask -> invalid
    assert prepare_data.main(["--root", root, "--dataset", "UBnormal"]) == 1
    # Add them -> valid.
    rng = np.random.default_rng(1)
    vdir = os.path.join(root, "pose", "validating")
    os.makedirs(vdir)
    clip, gt = _make_clip(rng, 80, 17, anomaly_span=(20, 40))
    with open(os.path.join(vdir, "02_0001_tracked.json"), "w") as f:
        json.dump(clip, f)
    vgt = os.path.join(root, "validating", "test_frame_mask")
    os.makedirs(vgt)
    np.save(os.path.join(vgt, "02_0001.npy"), gt)
    out = str(tmp_path / "ub.yaml")
    rc = prepare_data.main([
        "--root", root, "--dataset", "UBnormal", "--out-config", out,
        "--template", os.path.join(os.path.dirname(__file__), "..",
                                   "config", "UBnormal",
                                   "euclidean_encoder.yaml"),
    ])
    assert rc == 0
    cfg = load_config(out)
    assert cfg.data.val_gt_dir == vgt


def test_non_hr_dataset_names_borrow_hr_template(tmp_path):
    """Avenue/STC are valid --dataset choices but only HR-Avenue/HR-STC
    config dirs ship; the default-template fallback must map to them
    instead of dying on a missing config/Avenue/ path after validation
    already printed all-OK."""
    for name, tdir in [("Avenue", "HR-Avenue"), ("STC", "HR-STC")]:
        root = _mocodad_tree(str(tmp_path / name))
        out = str(tmp_path / f"{name}.yaml")
        rc = prepare_data.main(
            ["--root", root, "--dataset", name, "--out-config", out])
        assert rc == 0, name
        cfg = load_config(out)
        assert cfg.data.dataset_choice == name
