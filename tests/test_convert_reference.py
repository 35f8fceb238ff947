"""Checkpoint interop: reference Lightning ckpt -> coskad_tpu checkpoint.

Grounds coskad_tpu/interop.py against the actual reference torch modules
(/root/reference/models/sts/{ae,vae}.py): a reference model with randomized
weights/BN stats is saved as a fake Lightning checkpoint, converted, and the
two implementations' eval-mode forwards must agree on random inputs. The
final test drives the cli.convert -> cli.eval pipeline end-to-end."""

import os
import pickle
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_synthetic_dataset

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _reference_sts():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if not hasattr(np, "int"):
        np.int = int
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # The power_spherical package is not installed here (zero egress); the
    # reference VAE imports it at module level but these tests only exercise
    # encode/decode, never distribution sampling — stub the import.
    if "power_spherical" not in sys.modules:
        import types

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("power_spherical stub: sampling unavailable")

        dist = types.ModuleType("power_spherical.distributions")
        dist.PowerSpherical = _Unavailable
        dist.HypersphericalUniform = _Unavailable
        pkg = types.ModuleType("power_spherical")
        pkg.distributions = dist
        sys.modules["power_spherical"] = pkg
        sys.modules["power_spherical.distributions"] = dist
    import models.sts.ae as ref_ae  # type: ignore
    import models.sts.vae as ref_vae  # type: ignore

    return ref_ae, ref_vae


DIMS = dict(input_dim=2, layer_channels=[32, 16, 32], hidden_dimension=64,
            latent_dim=16, n_frames=12, n_joints=17)


def _randomize(ref_model, seed=0):
    """Non-trivial BN running stats + center buffer."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    for m in ref_model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.uniform_(-0.5, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 2.0, generator=gen)
    with torch.no_grad():
        ref_model.c.uniform_(-1.0, 1.0, generator=gen)


def _lightning_ckpt(tmp_path, ref_model, epoch=7):
    """Fake Lightning checkpoint: state_dict under a 'model.' prefix
    (the Lit modules hold the model as self.model)."""
    import torch

    sd = {f"model.{k}": v for k, v in ref_model.state_dict().items()}
    path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd, "epoch": epoch}, path)
    return path


def _convert(tmp_path, ref_model, our_model, with_passthrough=False):
    from coskad_tpu import interop

    sd, meta = interop.load_torch_state_dict(_lightning_ckpt(tmp_path, ref_model))
    assert meta["epoch"] == 7
    params, stats, buffers, passthrough = interop.convert_state_dict(sd, our_model)
    variables = {"params": params, "batch_stats": stats}
    if with_passthrough:
        return variables, buffers, passthrough
    return variables, buffers


def _x(seed=0, b=6, v=17):
    return np.random.default_rng(seed).normal(size=(b, 2, 12, v)).astype(np.float32)


def test_convert_stse_linear(tmp_path):
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu.models import STSE

    torch.manual_seed(0)
    ref = ref_ae.STSE(**DIMS, encoder_type="sts_gcn", projector="linear",
                      distance="euclidean", dropout=0.0)
    ref.eval()
    _randomize(ref)

    ours = STSE(**{k: tuple(val) if isinstance(val, list) else val
                   for k, val in DIMS.items()},
                encoder_type="sts_gcn", projector="linear")
    variables, buffers = _convert(tmp_path, ref, ours)
    np.testing.assert_array_equal(buffers["center"], ref.c.numpy())
    assert "inv_cov" not in buffers  # euclidean: no inv_cov_matrix buffer

    x = _x()
    z = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref_z = ref(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(z), ref_z, rtol=2e-3, atol=2e-4)


def test_convert_stse_mahalanobis_buffer(tmp_path):
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu.models import STSE

    torch.manual_seed(3)
    ref = ref_ae.STSE(**DIMS, encoder_type="sts_gcn", projector="linear",
                      distance="mahalanobis", dropout=0.0)
    ref.eval()
    _randomize(ref, seed=3)
    with torch.no_grad():
        ref.inv_cov_matrix.uniform_(-1.0, 1.0)
    ours = STSE(**{k: tuple(val) if isinstance(val, list) else val
                   for k, val in DIMS.items()}, projector="linear")
    _, buffers = _convert(tmp_path, ref, ours)
    np.testing.assert_array_equal(buffers["inv_cov"], ref.inv_cov_matrix.numpy())


def test_convert_stse_mlp_projector(tmp_path):
    """The shipped reference MLP cannot be constructed (SURVEY.md 0.1:
    ae.py:161 passes hidden_size= to a hidden_layers= constructor), so build
    the evident intent — components.py:209-226's Linear/BN1d/ReLU stack —
    and convert it structurally."""
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu.models import STSE

    torch.manual_seed(1)
    ref = ref_ae.STSE(**DIMS, encoder_type="sts_gcn", projector="linear",
                      distance="euclidean", dropout=0.0)
    flat = DIMS["hidden_dimension"] * DIMS["n_frames"] * DIMS["n_joints"]
    latent = DIMS["latent_dim"]
    ref.btlnk = torch.nn.Sequential(
        torch.nn.Linear(flat, latent), torch.nn.BatchNorm1d(latent),
        torch.nn.ReLU(inplace=True), torch.nn.Linear(latent, latent),
    )
    ref.eval()
    _randomize(ref, seed=1)

    ours = STSE(**{k: tuple(val) if isinstance(val, list) else val
                   for k, val in DIMS.items()},
                projector="mlp", projector_hidden_layers=(latent,))
    variables, _ = _convert(tmp_path, ref, ours)
    x = _x(1)
    z = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref_z = ref(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(z), ref_z, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("encoder_type", ["learnable_gcn", "static_gcn"])
def test_convert_plain_gcn_encoders(tmp_path, encoder_type):
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu.models import STSE

    torch.manual_seed(2)
    ref = ref_ae.STSE(**DIMS, encoder_type=encoder_type, projector="linear",
                      distance="euclidean", dropout=0.0)
    ref.eval()
    _randomize(ref, seed=2)

    ours = STSE(**{k: tuple(val) if isinstance(val, list) else val
                   for k, val in DIMS.items()},
                encoder_type=encoder_type, projector="linear")
    variables, _ = _convert(tmp_path, ref, ours)
    x = _x(2)
    z = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref_z = ref(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(z), ref_z, rtol=2e-3, atol=2e-4)


def test_convert_stsae_reconstruction(tmp_path):
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu.models import STSAE

    torch.manual_seed(4)
    ref = ref_ae.STSAE(**DIMS, encoder_type="sts_gcn", projector="linear",
                       distance="euclidean", dropout=0.0)
    ref.eval()
    _randomize(ref, seed=4)

    ours = STSAE(**{k: tuple(val) if isinstance(val, list) else val
                    for k, val in DIMS.items()}, projector="linear")
    variables, _ = _convert(tmp_path, ref, ours)
    x = _x(4)
    z, recon = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref_z, ref_recon = ref(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(z), ref_z.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(recon), ref_recon.numpy(), rtol=5e-3, atol=5e-4)


def test_convert_stsvae_identity_projector(tmp_path):
    """VAE heads read the channel-major flat hidden in the reference
    (vae.py:151-156); converted kernels must agree on (z_mean, z_var) and
    the decode path for a fixed latent."""
    _, ref_vae = _reference_sts()
    import torch

    from coskad_tpu.models import STSVAE

    torch.manual_seed(5)
    # bias="cpu": the reference STSAE passes (device, bias) positionally
    # into STSE's (bias, device) slots (ae.py:196-198), so STSVAE's
    # threshold_dist buffer is created with device=<the bias argument>; a
    # truthy "cpu" satisfies both swapped roles.
    ref = ref_vae.STSVAE(**DIMS, encoder_type="sts_gcn", projector="linear",
                         distance="euclidean", dropout=0.0, distribution="ps",
                         bias="cpu", device="cpu")
    ref.eval()
    _randomize(ref, seed=5)

    ours = STSVAE(**{k: tuple(val) if isinstance(val, list) else val
                     for k, val in DIMS.items()},
                  projector="linear", distribution="ps")
    variables, _ = _convert(tmp_path, ref, ours)
    x = _x(5)
    z_mean, z_var = ours.apply(
        variables, jnp.asarray(x), method=lambda m, x: m.encode_distribution(x))
    with torch.no_grad():
        ref_mean, ref_var = ref.encode(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(z_mean), ref_mean.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(z_var), ref_var.numpy(),
                               rtol=2e-3, atol=2e-4)

    z_fixed = np.random.default_rng(6).normal(size=(6, DIMS["latent_dim"]))
    z_fixed = (z_fixed / np.linalg.norm(z_fixed, axis=-1, keepdims=True)).astype(np.float32)
    recon = ours.apply(variables, jnp.asarray(z_fixed),
                       method=lambda m, z: m.decode(z))
    shape = (6, DIMS["hidden_dimension"], DIMS["n_frames"], DIMS["n_joints"], 1)
    with torch.no_grad():
        ref_recon = ref.decode(torch.tensor(z_fixed), input_shape=shape)
    np.testing.assert_allclose(np.asarray(recon), ref_recon.numpy(),
                               rtol=5e-3, atol=5e-4)


def _round_trip(tmp_path, ref, ours, distance="euclidean"):
    """ref torch sd -> convert -> export (+ passthrough, as export_checkpoint
    applies it); assert the exported dict equals the original EXACTLY, with
    no missing or extra keys — strict-loadable by construction."""
    from coskad_tpu import interop

    variables, buffers, passthrough = _convert(
        tmp_path, ref, ours, with_passthrough=True)
    exported = interop.export_state_dict(
        ours, variables["params"], variables["batch_stats"], buffers,
        distance=distance)
    exported.update({k: np.asarray(v) for k, v in passthrough.items()})
    original = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    assert set(exported) == set(original), (
        set(original) - set(exported), set(exported) - set(original))
    for k, v in exported.items():
        np.testing.assert_array_equal(
            v, original[k], err_msg=f"round-trip mismatch at {k}")


@pytest.mark.parametrize("encoder_type", ["sts_gcn", "learnable_gcn",
                                          "static_gcn"])
def test_export_round_trip_stse(tmp_path, encoder_type):
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu.models import STSE

    torch.manual_seed(6)
    ref = ref_ae.STSE(**DIMS, encoder_type=encoder_type, projector="linear",
                      distance="euclidean", dropout=0.0)
    ref.eval()
    _randomize(ref, seed=6)
    ours = STSE(**{k: tuple(val) if isinstance(val, list) else val
                   for k, val in DIMS.items()},
                encoder_type=encoder_type, projector="linear")
    _round_trip(tmp_path, ref, ours)


def test_export_round_trip_stsvae(tmp_path):
    _, ref_vae = _reference_sts()
    import torch

    from coskad_tpu.models import STSVAE

    torch.manual_seed(7)
    ref = ref_vae.STSVAE(**DIMS, encoder_type="sts_gcn", projector="linear",
                         distance="euclidean", dropout=0.0, distribution="ps",
                         bias="cpu", device="cpu")
    ref.eval()
    _randomize(ref, seed=7)
    ours = STSVAE(**{k: tuple(val) if isinstance(val, list) else val
                     for k, val in DIMS.items()},
                  projector="linear", distribution="ps")
    _round_trip(tmp_path, ref, ours)


def test_export_strict_torch_load_and_forward(tmp_path):
    """The exported dict must load STRICT into a fresh reference model and
    reproduce our model's forward — a TPU-trained checkpoint flows back into
    the torch ecosystem with no key or layout drift."""
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu import interop
    from coskad_tpu.models import STSAE

    torch.manual_seed(8)
    donor = ref_ae.STSAE(**DIMS, encoder_type="sts_gcn", projector="linear",
                         distance="euclidean", dropout=0.0)
    donor.eval()
    _randomize(donor, seed=8)
    ours = STSAE(**{k: tuple(val) if isinstance(val, list) else val
                    for k, val in DIMS.items()}, projector="linear")
    variables, buffers = _convert(tmp_path, donor, ours)
    exported = interop.export_state_dict(
        ours, variables["params"], variables["batch_stats"], buffers)

    fresh = ref_ae.STSAE(**DIMS, encoder_type="sts_gcn", projector="linear",
                         distance="euclidean", dropout=0.0)
    fresh.load_state_dict({k: torch.tensor(v) for k, v in exported.items()},
                          strict=True)
    fresh.eval()
    x = _x(8)
    z, recon = ours.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref_z, ref_recon = fresh(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(z), ref_z.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(recon), ref_recon.numpy(),
                               rtol=5e-3, atol=5e-4)


def test_convert_rejects_st_gcn(tmp_path):
    from coskad_tpu import interop
    from coskad_tpu.models import STSE

    ours = STSE(encoder_type="st_gcn")
    with pytest.raises(interop.ConversionError, match="st_gcn"):
        interop.convert_state_dict({}, ours)


def test_convert_requires_scaler_for_robust_config(tmp_path):
    """Converting a robust-normalized config without its train-fitted
    scaler pickle must fail loudly — eval would otherwise re-fit on the
    test split and score in the wrong coordinate system."""
    import dataclasses

    from coskad_tpu import interop
    from coskad_tpu.cli.common import load_config

    cfg_path = make_synthetic_dataset(str(tmp_path / "d"), seed=5)
    cfg = load_config(cfg_path)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, normalization_strategy="robust"))
    with pytest.raises(interop.ConversionError, match="robust"):
        interop.convert_checkpoint("/nonexistent.ckpt", cfg)


def test_load_sklearn_scaler(tmp_path):
    sklearn = pytest.importorskip("sklearn.preprocessing")
    from coskad_tpu.interop import load_sklearn_scaler

    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 2)) * [3.0, 0.5] + [1.0, -2.0]
    sk = sklearn.RobustScaler(quantile_range=(10.0, 90.0)).fit(x)
    path = str(tmp_path / "robust.pkl")
    with open(path, "wb") as f:
        pickle.dump(sk, f)
    st = load_sklearn_scaler(path)
    np.testing.assert_allclose(st.center, sk.center_)
    np.testing.assert_allclose(st.scale, sk.scale_)


def test_same_weights_same_auc(tmp_path):
    """The strongest interop contract: a converted reference checkpoint,
    scored by OUR full eval pipeline, must produce the same final AUC as the
    reference's own scoring loop (tests/test_scoring_parity_reference.py's
    oracle port of eval_COSKAD.py:140-253) driven by the TORCH model's
    latents on the identical windows and transforms."""
    ref_ae, _ = _reference_sts()
    import torch

    from test_scoring_parity_reference import (
        _reference_eval_utils,
        _reference_scoring_loop,
    )

    from coskad_tpu import interop
    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli.common import load_config, load_ground_truths, load_split
    from coskad_tpu.data.transforms import apply_transforms, canonical_transforms

    ref_eval = _reference_eval_utils()
    root = str(tmp_path / "data")
    cfg_path = make_synthetic_dataset(root, seed=11)
    cfg = load_config(cfg_path)
    dims = dict(input_dim=cfg.model.num_coords, layer_channels=list(cfg.model.channels),
                hidden_dimension=cfg.model.h_dim, latent_dim=cfg.model.latent_dim,
                n_frames=cfg.data.seg_len, n_joints=cfg.data.n_joints)
    torch.manual_seed(11)
    ref = ref_ae.STSE(**dims, encoder_type="sts_gcn", projector="linear",
                      distance="euclidean", dropout=0.0)
    ref.eval()
    _randomize(ref, seed=11)
    out = str(tmp_path / "converted.ckpt")
    interop.convert_checkpoint(_lightning_ckpt(tmp_path, ref), cfg, out_path=out)

    # Ours: the full eval CLI (in-process) on the converted checkpoint.
    result = eval_cli.main(["--config", cfg_path, "--ckpt", out])

    # Reference side: torch forward on the SAME windows x transforms
    # (transform math is itself oracle-tested vs utils/dataset_utils.py),
    # then the reference scoring loop.
    test_ds = load_split(cfg, "test", stride=1)
    k = cfg.data.num_transform
    table = jnp.asarray(canonical_transforms(k))
    base = jnp.asarray(test_ds.data)  # [NW, C, T, V]
    nw = base.shape[0]
    zs = []
    for t in range(k):
        mats = jnp.broadcast_to(table[t], (nw, 3, 3))
        xt = np.asarray(apply_transforms(base, mats))[:, : cfg.model.num_coords]
        with torch.no_grad():
            zs.append(ref(torch.tensor(xt)).numpy())
    z_all = np.concatenate(zs, 0)
    trans = np.repeat(np.arange(k), nw)
    meta = np.tile(np.asarray(test_ds.meta), (k, 1))
    frames = np.tile(np.asarray(test_ds.frame_ids), (k, 1))
    gts = load_ground_truths(cfg.data.gt_dir)
    ref_auc, ref_pds, _ = _reference_scoring_loop(
        ref_eval, ref.c.numpy(), z_all, trans, meta, frames, gts, k,
        pad_size=cfg.eval.pad_size)

    # fp32 jax-vs-torch forward noise (~2e-3 rtol on latents) propagates
    # through MSE + smoothing; the rank statistic must be tight.
    assert abs(result.auc - ref_auc) < 2e-3, (result.auc, ref_auc)
    np.testing.assert_allclose(result.scores, ref_pds, rtol=0.05, atol=1e-4)


def test_anomaly_scorer_on_converted_checkpoint(tmp_path):
    """The serving surface works off a converted reference checkpoint, and
    score_windows reproduces the torch model's window MSE-to-center."""
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu import interop
    from coskad_tpu.cli.common import load_config, load_split
    from coskad_tpu.serve import AnomalyScorer

    root = str(tmp_path / "data")
    cfg_path = make_synthetic_dataset(root, seed=13)
    cfg = load_config(cfg_path)
    dims = dict(input_dim=cfg.model.num_coords, layer_channels=list(cfg.model.channels),
                hidden_dimension=cfg.model.h_dim, latent_dim=cfg.model.latent_dim,
                n_frames=cfg.data.seg_len, n_joints=cfg.data.n_joints)
    torch.manual_seed(13)
    ref = ref_ae.STSE(**dims, encoder_type="sts_gcn", projector="linear",
                      distance="euclidean", dropout=0.0)
    ref.eval()
    _randomize(ref, seed=13)
    out = str(tmp_path / "converted.ckpt")
    interop.convert_checkpoint(_lightning_ckpt(tmp_path, ref), cfg, out_path=out)

    scorer = AnomalyScorer.from_checkpoint(out)  # cfg via .config.json snapshot
    windows = np.asarray(load_split(cfg, "test", stride=1).data[:32])
    s = np.asarray(scorer.score_windows(windows))
    with torch.no_grad():
        z = ref(torch.tensor(windows[:, : cfg.model.num_coords])).numpy()
    ref_s = np.mean((z - ref.c.numpy()) ** 2, axis=-1)
    np.testing.assert_allclose(s, ref_s, rtol=5e-3, atol=1e-5)


def test_convert_cli_end_to_end(tmp_path):
    """cli.convert on a fake Lightning ckpt shaped like the smoke config,
    then cli.eval --ckpt on the converted checkpoint, then the reverse
    export leg: --to-torch must reproduce the original state_dict
    byte-exactly — INCLUDING nonzero BN num_batches_tracked counters, which
    ride through extra['torch_passthrough']."""
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu.cli.common import load_config

    root = str(tmp_path / "data")
    cfg_path = make_synthetic_dataset(root, seed=9)
    cfg = load_config(cfg_path)
    dims = dict(input_dim=cfg.model.num_coords, layer_channels=list(cfg.model.channels),
                hidden_dimension=cfg.model.h_dim, latent_dim=cfg.model.latent_dim,
                n_frames=cfg.data.seg_len, n_joints=cfg.data.n_joints)
    torch.manual_seed(9)
    ref = ref_ae.STSE(**dims, encoder_type="sts_gcn", projector="linear",
                      distance="euclidean", dropout=0.0)
    ref.eval()
    _randomize(ref, seed=9)
    # Simulate a genuinely trained checkpoint: nonzero BN step counters.
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.num_batches_tracked.fill_(42)
    ref_ckpt = _lightning_ckpt(tmp_path, ref, epoch=3)

    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": ""}
    out = str(tmp_path / "converted.ckpt")
    r = subprocess.run(
        [sys.executable, "-m", "coskad_tpu.cli.convert", "--config", cfg_path,
         "--ckpt", ref_ckpt, "--out", out],
        env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    assert os.path.exists(out)

    r = subprocess.run(
        [sys.executable, "-m", "coskad_tpu.cli.eval", "--config", cfg_path,
         "--ckpt", out],
        env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    assert "final AUC score:" in r.stdout

    back = str(tmp_path / "back.ckpt")
    r = subprocess.run(
        [sys.executable, "-m", "coskad_tpu.cli.convert", "--config", cfg_path,
         "--to-torch", "--ckpt", out, "--out", back],
        env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    orig_sd = torch.load(ref_ckpt, map_location="cpu",
                         weights_only=False)["state_dict"]
    back_sd = torch.load(back, map_location="cpu",
                         weights_only=False)["state_dict"]
    assert set(orig_sd) == set(back_sd)
    for k in orig_sd:
        np.testing.assert_array_equal(
            back_sd[k].numpy(), orig_sd[k].numpy(),
            err_msg=f"CLI round-trip mismatch at {k}")


def test_export_rejects_mismatched_config(tmp_path):
    """Exporting an STSAE's params through an STSE config must refuse: the
    unread decoder/rev_btlnk subtrees mean the --config does not describe
    the checkpoint (silently dropping them would still strict-load)."""
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu import interop
    from coskad_tpu.models import STSAE, STSE

    torch.manual_seed(14)
    donor = ref_ae.STSAE(**DIMS, encoder_type="sts_gcn", projector="linear",
                         distance="euclidean", dropout=0.0)
    donor.eval()
    ours_ae = STSAE(**{k: tuple(val) if isinstance(val, list) else val
                       for k, val in DIMS.items()}, projector="linear")
    variables, buffers = _convert(tmp_path, donor, ours_ae)
    wrong = STSE(**{k: tuple(val) if isinstance(val, list) else val
                    for k, val in DIMS.items()}, projector="linear")
    with pytest.raises(interop.ConversionError, match="wrong --config"):
        interop.export_state_dict(
            wrong, variables["params"], variables["batch_stats"], buffers)


def test_export_writes_scaler_pickle(tmp_path):
    """A checkpoint carrying a fitted scaler exports it as a pickled sklearn
    RobustScaler beside the torch file (the reference's robust.pkl)."""
    import pickle

    from coskad_tpu.interop import _write_sklearn_scaler, load_sklearn_scaler

    path = str(tmp_path / "x.ckpt.robust.pkl")
    _write_sklearn_scaler(
        {"center": np.array([1.0, -2.0]), "scale": np.array([3.0, 0.5])}, path)
    with open(path, "rb") as f:
        sk = pickle.load(f)
    np.testing.assert_allclose(sk.center_, [1.0, -2.0])
    np.testing.assert_allclose(sk.scale_, [3.0, 0.5])
    # and the import direction reads it back
    st = load_sklearn_scaler(path)
    np.testing.assert_allclose(st.center, [1.0, -2.0])
    np.testing.assert_allclose(st.scale, [3.0, 0.5])


def test_convert_opt_state_matches_trainer_layout(tmp_path):
    """The documented fine-tune path: a converted checkpoint dropped in as
    <ckpt_dir>/last.ckpt and resumed with cli.train --resume. The Trainer
    checkpoints optax.flatten-wrapped Adam state (flat mu/nu vectors,
    train/loop.py tx setter); convert_checkpoint must emit the SAME layout —
    flax's from_state_dict performs no structure validation, so a
    tree-shaped mu/nu in the converted file would silently replace the
    template's flat leaves and blow up (or corrupt the update) inside the
    first jitted epoch."""
    ref_ae, _ = _reference_sts()
    import torch

    from coskad_tpu import interop
    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.cli.common import load_config, load_split
    from coskad_tpu.train import checkpoint
    from coskad_tpu.train.loop import Trainer

    root = str(tmp_path / "data")
    cfg_path = make_synthetic_dataset(root, seed=13, n_train_clips=1,
                                      n_test_clips=1)
    cfg = load_config(cfg_path)
    dims = dict(input_dim=cfg.model.num_coords,
                layer_channels=list(cfg.model.channels),
                hidden_dimension=cfg.model.h_dim,
                latent_dim=cfg.model.latent_dim,
                n_frames=cfg.data.seg_len, n_joints=cfg.data.n_joints)
    torch.manual_seed(13)
    ref = ref_ae.STSE(**dims, encoder_type="sts_gcn", projector="linear",
                      distance="euclidean", dropout=0.0)
    ref.eval()
    _randomize(ref, seed=13)
    os.makedirs(cfg.ckpt_dir, exist_ok=True)
    out = os.path.join(cfg.ckpt_dir, "last.ckpt")
    interop.convert_checkpoint(_lightning_ckpt(tmp_path, ref, epoch=0),
                               cfg, out_path=out)

    # Structural contract: restoring the converted ckpt onto a fresh
    # Trainer template must preserve the template's opt_state treedef.
    trainer = Trainer(cfg, load_split(cfg, "train"))
    template = trainer.init_state()
    want = jax.tree_util.tree_structure(template.opt_state)
    restored, _, extra = checkpoint.restore(out, template)
    got = jax.tree_util.tree_structure(restored.opt_state)
    assert want == got, f"opt_state structure drifted:\n{want}\nvs\n{got}"
    assert extra["epoch"] == 0

    # End-to-end: one resumed fine-tune epoch off the converted checkpoint.
    train_cli.main(["--config", cfg_path, "--epochs", "2", "--resume"])
    final, _, extra = checkpoint.restore(out, template)
    assert extra["epoch"] == 1  # epoch 0 came from the ckpt, epoch 1 trained


def test_convert_ps_vae_then_eval_recovers_anchor(tmp_path):
    """'ps' VAE checkpoints CANNOT carry mean_vector (the reference only
    registers that buffer for 'normal', models/sts/vae.py:57-58; its own
    offline eval would AttributeError). The convert->eval flow must not
    silently score the constant 1 - cos(z, 0): cli.eval detects the zeroed
    anchor and recomputes it from the eval split's latents, the same
    empirical mean the reference's in-session hooks use
    (spherical_vae.py:110-116). Round-5 review finding."""
    import yaml

    from fixtures import make_synthetic_dataset

    from coskad_tpu import interop
    from coskad_tpu.cli import eval as eval_cli
    from coskad_tpu.cli.common import load_config

    _, ref_vae = _reference_sts()
    import torch

    torch.manual_seed(9)
    ref = ref_vae.STSVAE(**DIMS, encoder_type="sts_gcn", projector="linear",
                         distance="euclidean", dropout=0.0,
                         distribution="ps", bias="cpu", device="cpu")
    ref.eval()
    _randomize(ref, seed=9)
    ckpt = _lightning_ckpt(tmp_path, ref)

    cfg_path = make_synthetic_dataset(str(tmp_path / "data"))
    d = dict(yaml.safe_load(open(cfg_path)))
    d.update(use_vae=True, use_decoder=False, distribution="ps",
             dataset_kp18_format=False)  # DIMS are 17-joint
    with open(cfg_path, "w") as f:
        yaml.safe_dump(d, f)
    cfg = load_config(cfg_path)
    out = interop.convert_checkpoint(ckpt, cfg,
                                     out_path=str(tmp_path / "conv.ckpt"))

    from coskad_tpu.train import checkpoint as ck

    payload = ck.read_payload(out)
    assert float(np.abs(np.asarray(
        payload["state"]["mean_vector"])).max()) == 0.0  # truly absent

    result = eval_cli.main(["--config", cfg_path, "--ckpt", out])
    # with the recovered anchor the scores are NOT the constant 1.0
    assert float(np.std(result.scores)) > 1e-6
    assert np.isfinite(result.auc)


def test_to_torch_scaler_copied_beside_output(tmp_path):
    """--to-torch --scaler must place the pickle where the reference loads
    it (next to the exported checkpoint as robust.pkl) instead of silently
    dropping it (round-5 review finding)."""
    import pickle

    from fixtures import make_synthetic_dataset

    from coskad_tpu.cli import convert as convert_cli
    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.data.normalize import RobustScalerState

    cfg_path = make_synthetic_dataset(str(tmp_path / "d"), n_train_clips=1,
                                      n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", "1"])
    ckpt = str(tmp_path / "d" / "checkpoints" / "Synthetic" / "smoke" /
               "best.ckpt")
    scaler_pkl = str(tmp_path / "robust_src.pkl")
    with open(scaler_pkl, "wb") as f:
        pickle.dump(RobustScalerState(center=np.zeros(2), scale=np.ones(2)), f)
    outdir = tmp_path / "exported"
    outdir.mkdir()
    out = str(outdir / "ref_format.ckpt")
    convert_cli.main(["--config", cfg_path, "--to-torch", "--ckpt", ckpt,
                      "--out", out, "--scaler", scaler_pkl])
    assert os.path.exists(out)
    assert os.path.exists(str(outdir / "robust.pkl"))
