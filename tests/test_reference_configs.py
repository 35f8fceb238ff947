"""The reference's shipped YAML configs load unchanged into Config trees
with the right variant/hyperparameters."""

import os

import pytest

from coskad_tpu.config import from_reference_yaml

REF_CFG = "/root/reference/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CFG), reason="reference configs unavailable"
)


def test_ubnormal_euclidean_encoder():
    cfg = from_reference_yaml(f"{REF_CFG}/UBnormal/euclidean_encoder.yaml")
    assert cfg.model.variant == "euclidean_dynamic"  # static_center: False
    assert cfg.model.encoder_type == "learnable_gcn"
    assert cfg.model.projector == "mlp"
    assert cfg.model.channels == (32, 16, 32)
    assert cfg.model.h_dim == 64 and cfg.model.latent_dim == 16
    assert cfg.data.seg_len == 12 and cfg.data.num_transform == 5
    assert cfg.data.normalization_strategy == "robust"
    assert cfg.data.batch_size == 2048
    assert cfg.data.path_to_robust  # robust pipeline root
    assert cfg.opt.validation is True
    assert cfg.opt.plateau_patience == 2  # dynamic-center variant


def test_ubnormal_hyperbolic_encoder():
    cfg = from_reference_yaml(f"{REF_CFG}/UBnormal/hyperbolic_encoder.yaml")
    assert cfg.model.variant == "hyperbolic"
    assert cfg.model.distance == "euclidean"  # 'poincare' string normalized
    assert cfg.eval.pad_size == -1
    assert cfg.opt.plateau_patience == 100
    assert cfg.run.debug and cfg.data.num_clips == 5  # debug: True -> 5 clips


def test_ubnormal_spherical_vae():
    cfg = from_reference_yaml(f"{REF_CFG}/UBnormal/spherical_vae.yaml")
    assert cfg.model.variant == "vae"
    assert cfg.model.distribution == "ps"
    assert cfg.model.latent_dim == 8
    assert cfg.model.decoder_channels == (8, 8)
    assert cfg.opt.phi == 1 and cfg.opt.beta == 0.001 and cfg.opt.gamma == 0.01
    assert cfg.eval.pad_size == 10
    # warmup_epochs/opt_scheduler are accepted-and-dropped (dead in the
    # reference's main path too); no silently-ignored OptConfig field exists.
    assert not hasattr(cfg.opt, "warmup_epochs")


def test_ubnormal_euclidean_autoencoder_is_broken_upstream():
    """The reference ships this file with an unescaped apostrophe in
    load_ckpt ('/path_to_model's_checkpoint'), so the reference's own
    yaml.load fails on it too; our loader surfaces the same parse error.
    The autoencoder variant itself is covered by the dict-based loader
    tests and the CLI e2e suite."""
    import yaml

    with pytest.raises(yaml.YAMLError):
        from_reference_yaml(f"{REF_CFG}/UBnormal/euclidean_autoencoder.yaml")

    from coskad_tpu.config import from_reference_dict

    cfg = from_reference_dict({"use_decoder": True, "lambda_": 0.01})
    assert cfg.model.variant == "autoencoder"
    assert cfg.opt.lambda_ == 0.01


def test_stc_and_avenue_configs_load():
    for rel in ("STC/euclidean_encoder.yaml", "STC/hyperbolic_encoder.yaml",
                "Avenue/encoder.yaml"):
        path = f"{REF_CFG}/{rel}"
        if not os.path.exists(path):
            continue
        cfg = from_reference_yaml(path)
        assert cfg.model.variant in (
            "euclidean_static", "euclidean_dynamic", "autoencoder", "vae",
            "hyperbolic",
        )
        assert cfg.data.seg_len > 0 and cfg.data.batch_size > 0


def test_shipped_configs_parse_and_dispatch():
    """Every YAML under config/ loads and selects the variant its filename
    promises, with the TPU precision knob set."""
    import glob

    from coskad_tpu.config import from_reference_yaml

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "config", "*", "*.yaml")))
    assert len(paths) >= 8
    expect = {
        "euclidean_encoder": "euclidean_dynamic",
        "euclidean_autoencoder": "autoencoder",
        "spherical_vae": "vae",
        "hyperbolic_encoder": "hyperbolic",
    }
    for p in paths:
        cfg = from_reference_yaml(p)
        stem = os.path.splitext(os.path.basename(p))[0]
        assert cfg.model.variant == expect[stem], p
        assert cfg.run.compute_dtype == "bfloat16", p
        assert cfg.data.dataset_choice == os.path.basename(os.path.dirname(p)), p


def test_no_silently_ignored_opt_config_fields():
    """Every OptConfig field must be consumed somewhere outside config.py —
    a knob that parses but is never read is a trap (VERDICT round 1, item 7).
    """
    import dataclasses
    import glob

    from coskad_tpu.config import OptConfig

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sources = []
    for p in glob.glob(os.path.join(repo, "coskad_tpu", "**", "*.py"), recursive=True):
        if p.endswith("config.py"):
            continue
        with open(p) as f:
            sources.append(f.read())
    blob = "\n".join(sources)
    for f in dataclasses.fields(OptConfig):
        assert f.name in blob, f"OptConfig.{f.name} is parsed but never consumed"


def test_fused_train_knobs_parse_from_yaml(tmp_path):
    """fused_train / ghost_size YAML keys reach RunConfig (they gate the
    fused ghost-BN kernel, kernels/stse_train.py)."""
    import yaml

    from coskad_tpu.config import from_reference_yaml

    raw = {"exp_dir": str(tmp_path), "dataset_choice": "UBnormal",
           "fused_train": "auto", "ghost_size": 128}
    p = tmp_path / "c.yaml"
    yaml.safe_dump(raw, open(p, "w"))
    cfg = from_reference_yaml(str(p))
    assert cfg.run.fused_train == "auto" and cfg.run.ghost_size == 128
    # defaults when absent
    yaml.safe_dump({"exp_dir": str(tmp_path), "dataset_choice": "UBnormal"},
                   open(p, "w"))
    cfg = from_reference_yaml(str(p))
    assert cfg.run.fused_train == "off" and cfg.run.ghost_size == 64


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_reference_config_loader(seed, tmp_path):
    """Random subsets of known reference keys with in-domain random values
    must load without crashing, and the 4-boolean variant dispatch must
    follow the reference precedence (train_COSKAD.py:36-55) on every draw."""
    import numpy as np
    import yaml

    from coskad_tpu.config import from_reference_yaml

    rng = np.random.default_rng(983_000 + seed)
    pool = {
        "dataset_choice": ["UBnormal", "HR-Avenue", "HR-STC"],
        "use_decoder": [True, False],
        "use_vae": [True, False],
        "hyperbolic": [True, False],
        "static_center": [True, False],
        "distance": ["euclidean", "mahalanobis"],
        "projector": ["linear", "mlp"],
        "encoder_type": ["sts_gcn", "st_gcn", "learnable_gcn", "static_gcn"],
        "distribution": ["ps", "normal"],
        "dataset_normalization_strategy":
            ["markovitz", "robust", "stan", "bbox"],
        "dataset_seg_len": [6, 12, 24],
        "dataset_num_transform": [1, 2, 5],
        "dataset_headless": [True, False],
        "dataset_kp18_format": [True, False],
        "channels": [[32, 16, 32], [8, 8], [16]],
        "h_dim": [16, 64],
        "latent_dim": [4, 16],
        "ae_epochs": [1, 100],
        "debug": [True, False],
        "pad_size": [-1, 5],
        "validation": [True, False],
        "use_hr": [True, False],
        "smoothing": [50],
        "seed": [0, 999],
    }
    d = {}
    for k, vals in pool.items():
        if rng.random() < 0.7:
            d[k] = vals[int(rng.integers(len(vals)))]
    p = tmp_path / f"fuzz{seed}.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(d, f)
    cfg = from_reference_yaml(str(p))
    # variant dispatch precedence (reference train_COSKAD.py:36-55)
    if d.get("use_decoder"):
        assert cfg.model.variant == "autoencoder", d
    elif d.get("use_vae"):
        assert cfg.model.variant == "vae", d
    elif d.get("hyperbolic"):
        assert cfg.model.variant == "hyperbolic", d
    elif d.get("static_center", True):
        assert cfg.model.variant == "euclidean_static", d
    else:
        assert cfg.model.variant == "euclidean_dynamic", d
    if d.get("debug"):
        assert cfg.opt.epochs == 10  # reference smoke cap
    assert cfg.data.seg_len == d.get("dataset_seg_len", 12)
