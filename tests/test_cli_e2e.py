"""End-to-end CLI test: synthetic dataset on disk -> train -> eval -> AUC."""

import os

import numpy as np
import pytest

from fixtures import make_synthetic_dataset


def test_train_and_eval_cli(tmp_path):
    cfg_path = make_synthetic_dataset(str(tmp_path))

    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli import train as train_cli

    train_cli.main(["--config", cfg_path, "--epochs", "2"])
    ckpt_dir = os.path.join(str(tmp_path), "checkpoints", "Synthetic", "smoke")
    assert os.path.exists(os.path.join(ckpt_dir, "last.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "best.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "best.ckpt.config.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "metrics.jsonl"))

    result = eval_cli.main(["--config", cfg_path])
    # Plumbing smoke test: 2 epochs on tiny data must still rank the planted
    # gross outliers clearly above chance.
    assert result.auc > 0.6
    assert len(result.per_transform_auc) == 5
    assert len(result.per_clip_auc) == 2


def test_checkpoint_roundtrip(tmp_path):
    """Restored state reproduces identical latents/scores."""
    import jax.numpy as jnp

    from coskad_tpu.cli.common import load_config, load_split
    from coskad_tpu.train import checkpoint
    from coskad_tpu.train.loop import Trainer

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1, n_test_clips=1)
    cfg = load_config(cfg_path)
    ds = load_split(cfg, "train")
    trainer = Trainer(cfg, ds)
    state = trainer.init_state()
    state = trainer.initialize_center(state)
    state, _ = trainer.fit(state=state, epochs=1)
    z1 = trainer.embed_all(state, ds, trainer.train_data)

    path = os.path.join(str(tmp_path), "ck.ckpt")
    checkpoint.save(path, state, cfg, extra={"note": "test"})
    trainer2 = Trainer(cfg, ds)
    template = trainer2.init_state()
    restored, scaler, extra = checkpoint.restore(path, template)
    assert extra["note"] == "test"
    np.testing.assert_allclose(
        np.asarray(restored.center), np.asarray(state.center)
    )
    z2 = trainer2.embed_all(restored, ds, trainer2.train_data)
    np.testing.assert_allclose(z1, z2, rtol=1e-5, atol=1e-6)


def test_validation_split_derivation(tmp_path):
    """Validation pose split: 'validating' for UBnormal, the test split
    otherwise (utils/argparser.py:21-27). In-training gt points at the
    validating masks for ALL datasets (train_COSKAD.py:59-60) while the
    offline-eval gt stays the test masks."""
    from coskad_tpu.config import from_reference_dict

    data_dir = str(tmp_path)
    os.makedirs(os.path.join(data_dir, "validating", "test_frame_mask"))
    common = {"data_dir": data_dir, "validation": True,
              "test_path": os.path.join(data_dir, "testing", "test_frame_mask")}

    cfg = from_reference_dict({"dataset_choice": "UBnormal", **common})
    assert cfg.data.pose_dirs["validation"].endswith("pose/validating")
    assert cfg.data.val_gt_dir == os.path.join(
        data_dir, "validating", "test_frame_mask")
    assert cfg.data.gt_dir == common["test_path"]  # eval gt unchanged

    cfg2 = from_reference_dict({"dataset_choice": "HR-Avenue", **common})
    assert cfg2.data.pose_dirs["validation"] == cfg2.data.pose_dirs["test"]
    assert cfg2.data.val_gt_dir == os.path.join(
        data_dir, "validating", "test_frame_mask")


def test_variant_dispatch_order_matches_reference_train():
    """use_decoder > use_vae > hyperbolic (train_COSKAD.py:36-55)."""
    from coskad_tpu.config import from_reference_dict

    both = from_reference_dict({"use_vae": True, "hyperbolic": True})
    assert both.model.variant == "vae"
    dec = from_reference_dict({"use_decoder": True, "use_vae": True})
    assert dec.model.variant == "autoencoder"


def test_debug_caps_epochs():
    from coskad_tpu.config import from_reference_dict

    assert from_reference_dict({"debug": True, "ae_epochs": 100}).opt.epochs == 10
    assert from_reference_dict({"debug": False, "ae_epochs": 42}).opt.epochs == 42


def test_alphapose_robust_scaler_persists_to_ckpt_dir(tmp_path):
    """Train split fits + persists robust.pkl; test split reloads it so both
    splits share one scaler (reference utils/dataset.py:176-179,290-294)."""
    import yaml

    from coskad_tpu.cli.common import load_config, load_split

    cfg_path = make_synthetic_dataset(str(tmp_path))
    raw = yaml.safe_load(open(cfg_path))
    raw["dataset_normalization_strategy"] = "robust"
    raw["dataset_sub_mean"] = False
    yaml.safe_dump(raw, open(cfg_path, "w"))
    cfg = load_config(cfg_path)
    train_ds = load_split(cfg, "train")
    pkl = os.path.join(cfg.ckpt_dir, "robust.pkl")
    assert os.path.exists(pkl)
    test_ds = load_split(cfg, "test", stride=1)
    # same scaler => identical normalization statistics
    np.testing.assert_allclose(train_ds.scaler.center, test_ds.scaler.center)
    np.testing.assert_allclose(train_ds.scaler.scale, test_ds.scaler.scale)


def test_eval_cli_hr_masks_path(tmp_path):
    """use_hr + hr_masks_glob: eval drops non-HR frames per clip before
    smoothing (reference eval_COSKAD.py:92-101, 213-215)."""
    import yaml

    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli import train as train_cli

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", "1"])

    # HR masks: drop 50 frames of clip (1, 1)
    gt = np.load(os.path.join(str(tmp_path), "gt", "01_0001.npy"))
    masks_dir = tmp_path / "hr_masks"
    masks_dir.mkdir()
    mask = np.ones(len(gt), dtype=np.uint8)
    mask[:50] = 0
    np.save(masks_dir / "1_1.npy", mask)

    raw = yaml.safe_load(open(cfg_path))
    raw["use_hr"] = True
    raw["hr_masks_glob"] = str(masks_dir / "*")
    yaml.safe_dump(raw, open(cfg_path, "w"))

    result = eval_cli.main(["--config", cfg_path])
    assert result.scores.shape == (len(gt) - 50,)
    assert len(result.gt) == len(gt) - 50


def test_eval_cli_save_scores(tmp_path):
    """--save-scores dumps the notebook-layout per-clip artifacts
    (error_per_person_scene_S_scenario_C.npy [P, F] + gt_masks/) that
    visualize.plot_person_scores consumes."""
    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.visualize import plot_person_scores

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", "1"])
    out_dir = str(tmp_path / "saved_clip_scores")
    eval_cli.main(["--config", cfg_path, "--save-scores", out_dir])

    gt_path = os.path.join(str(tmp_path), "gt", "01_0001.npy")
    gt_ref = np.load(gt_path)
    epp = np.load(os.path.join(out_dir,
                               "error_per_person_scene_1_scenario_1.npy"))
    gt = np.load(os.path.join(out_dir, "gt_masks", "scene_1_scenario_1.npy"))
    assert epp.ndim == 2 and epp.shape[1] == len(gt_ref)
    np.testing.assert_array_equal(gt, gt_ref)
    plot_person_scores(epp, gt, path=str(tmp_path / "pp.png"))
    assert os.path.getsize(tmp_path / "pp.png") > 0


def test_train_cli_resume_continues_epochs(tmp_path, capsys):
    """--resume restores last.ckpt and continues from the next epoch with
    the trainer state reattached (mesh-sharded center/opt hyperparams)."""
    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.train.checkpoint import read_payload

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", "2"])
    ckpt = os.path.join(str(tmp_path), "checkpoints", "Synthetic", "smoke",
                        "last.ckpt")
    assert read_payload(ckpt)["extra"]["epoch"] == 1

    train_cli.main(["--config", cfg_path, "--epochs", "3", "--resume"])
    out = capsys.readouterr().out
    assert "resumed from" in out and "at epoch 2" in out
    assert read_payload(ckpt)["extra"]["epoch"] == 2

    result = eval_cli.main(["--config", cfg_path])
    assert np.isfinite(result.auc) and result.auc > 0.6


def test_eval_cli_rec_weight_modes(tmp_path):
    """--rec-weight selects the autoencoder scoring mode like the reference
    (0 -> latent distance, >100 -> reconstruction, else rec/weight +
    latent; utils/eval_utils.py:77-106 loss_type dispatch)."""
    import yaml

    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli import train as train_cli

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    raw = yaml.safe_load(open(cfg_path))
    raw["use_decoder"] = True
    yaml.safe_dump(raw, open(cfg_path, "w"))
    train_cli.main(["--config", cfg_path, "--epochs", "1"])

    base = eval_cli.main(["--config", cfg_path])
    rec = eval_cli.main(["--config", cfg_path, "--rec-weight", "200"])
    both = eval_cli.main(["--config", cfg_path, "--rec-weight", "0.5"])
    for r in (base, rec, both):
        assert np.isfinite(r.auc) and 0.0 <= r.auc <= 1.0
    # reconstruction scoring produces genuinely different frame scores
    assert not np.allclose(base.scores, rec.scores)
    assert not np.allclose(base.scores, both.scores)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """The Orbax (directory) flavor restores identical state + scaler +
    extra; latents match the msgpack flavor's."""
    pytest.importorskip("orbax.checkpoint")
    from coskad_tpu.cli.common import load_config, load_split
    from coskad_tpu.data.normalize import RobustScalerState
    from coskad_tpu.train import checkpoint
    from coskad_tpu.train.loop import Trainer

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    cfg = load_config(cfg_path)
    ds = load_split(cfg, "train")
    trainer = Trainer(cfg, ds)
    state = trainer.initialize_center(trainer.init_state())
    state, _ = trainer.fit(state=state, epochs=1)

    scaler = RobustScalerState(center=np.arange(4.0), scale=np.ones(4))
    path = os.path.join(str(tmp_path), "orbax_ck")
    checkpoint.save_orbax(path, state, cfg, scaler=scaler,
                          extra={"epoch": 3})
    assert os.path.isdir(path)
    assert os.path.exists(path + ".config.json")

    trainer2 = Trainer(cfg, ds)
    restored, scaler2, extra = checkpoint.restore_orbax(
        path, trainer2.init_state())
    assert extra == {"epoch": 3}
    np.testing.assert_allclose(scaler2.center, scaler.center)
    np.testing.assert_allclose(np.asarray(restored.center),
                               np.asarray(state.center))
    z1 = trainer.embed_all(state, ds, trainer.train_data)
    z2 = trainer2.embed_all(trainer2.attach_state(restored), ds,
                            trainer2.train_data)
    np.testing.assert_allclose(z1, z2, rtol=1e-5, atol=1e-6)

    # overwrite-in-place must not fail (force=True path)
    checkpoint.save_orbax(path, state)

    # async flavor: returns before commit; wait_for_async_saves() makes the
    # directory readable, contents identical to the sync save
    apath = os.path.join(str(tmp_path), "orbax_async_ck")
    checkpoint.save_orbax(apath, state, cfg, scaler=scaler,
                          extra={"epoch": 3}, async_save=True)
    checkpoint.wait_for_async_saves()
    restored3, scaler3, extra3 = checkpoint.restore_orbax(
        apath, trainer2.init_state())
    assert extra3 == {"epoch": 3}
    np.testing.assert_allclose(np.asarray(restored3.center),
                               np.asarray(state.center))
    import jax

    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored3.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))


def test_cli_device_pipeline_matches_windows_pipeline(tmp_path):
    """device_pipeline: true routes the CLIs through the fused on-device
    preprocessing (TrajectoryStore); final eval AUC matches the
    materialized-windows pipeline on the same data."""
    import yaml

    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli import train as train_cli

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", "2"])
    base = eval_cli.main(["--config", cfg_path])

    raw = yaml.safe_load(open(cfg_path))
    raw["device_pipeline"] = True
    raw["dir_name"] = "smoke_dev"
    yaml.safe_dump(raw, open(cfg_path, "w"))
    train_cli.main(["--config", cfg_path, "--epochs", "2"])
    dev = eval_cli.main(["--config", cfg_path])

    assert np.isfinite(dev.auc) and dev.auc > 0.6
    # independent training runs; the pipelines must agree on ranking quality
    assert abs(dev.auc - base.auc) < 0.05


def test_train_cli_keeps_two_best_checkpoints(tmp_path):
    """save_top_k=2 parity (reference train_COSKAD.py:70-73): after >= 2
    validated epochs both best.ckpt and best2.ckpt exist, and best's AUC is
    >= best2's (a new best rotates the old best into the runner-up slot)."""
    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.train import checkpoint

    cfg_path = make_synthetic_dataset(str(tmp_path))
    train_cli.main(["--config", cfg_path, "--epochs", "3"])
    ckpt_dir = os.path.join(str(tmp_path), "checkpoints", "Synthetic", "smoke")
    best = checkpoint.read_payload(os.path.join(ckpt_dir, "best.ckpt"))
    best2 = checkpoint.read_payload(os.path.join(ckpt_dir, "best2.ckpt"))
    assert best["extra"]["auc"] >= best2["extra"]["auc"]
    assert best["extra"]["epoch"] != best2["extra"]["epoch"]


def test_eval_cli_save_roc(tmp_path):
    """--save-roc writes per-transform + final ROC PNGs and prints best
    thresholds (reference eval_COSKAD.py:237-241)."""
    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli import train as train_cli

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", "1"])
    roc_dir = str(tmp_path / "roc")
    result = eval_cli.main(["--config", cfg_path, "--save-roc", roc_dir])
    k = len(result.per_transform_auc)
    assert len(result.per_transform_scores) == k
    for t in range(k):
        p = os.path.join(roc_dir, f"t{t}_roc_hyp.png")
        assert os.path.getsize(p) > 0
        assert len(result.per_transform_scores[t]) == len(result.gt)
    assert os.path.getsize(os.path.join(roc_dir, "final_roc.png")) > 0


def test_orbax_restore_onto_different_mesh(tmp_path):
    """Multi-host analogue (VERDICT round-2 item 9): a checkpoint written
    from a single-device layout restores onto a different mesh shape (4x2
    dp x tp over the virtual 8-device CPU mesh) with identical state, and
    the re-laid trainer produces identical latents. This is the restore
    path a real multi-host resume takes: read host arrays, then
    attach_state re-lays them onto whatever mesh the new job has."""
    import jax
    import pytest

    pytest.importorskip("orbax.checkpoint")
    from coskad_tpu.cli.common import load_config, load_split
    from coskad_tpu.parallel import create_mesh
    from coskad_tpu.train import checkpoint
    from coskad_tpu.train.loop import Trainer

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    cfg = load_config(cfg_path)
    ds = load_split(cfg, "train")

    mesh1 = create_mesh(data_parallel=1, devices=jax.devices()[:1])
    trainer1 = Trainer(cfg, ds, mesh=mesh1)
    state = trainer1.initialize_center(trainer1.init_state())
    state, _ = trainer1.fit(state=state, epochs=1)
    path = os.path.join(str(tmp_path), "orbax_mesh_ck")
    checkpoint.save_orbax(path, state, cfg, extra={"epoch": 1})

    mesh8 = create_mesh(data_parallel=4, model_parallel=2)
    trainer8 = Trainer(cfg, ds, mesh=mesh8)
    restored, _, extra = checkpoint.restore_orbax(path, trainer8.init_state())
    assert extra == {"epoch": 1}
    restored = trainer8.attach_state(restored)

    # every leaf equal after the re-lay
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.center),
                                  np.asarray(restored.center))
    # the restored state drives the sharded embed path on the new mesh
    z1 = trainer1.embed_all(state, ds, trainer1.train_data)
    z8 = trainer8.embed_all(restored, ds, trainer8.train_data)
    np.testing.assert_allclose(z1, z8, rtol=2e-5, atol=1e-6)
    # and one sharded train epoch runs (donated state, new layouts)
    restored, metrics = trainer8._train_epoch(
        restored, trainer8.train_data,
        jax.numpy.zeros((1, cfg.data.batch_size), jax.numpy.int32),
    )
    assert np.isfinite(float(np.asarray(metrics["loss"])[0]))
