"""Serialized scoring artifacts (export_hlo): parity with the live
AnomalyScorer across variants (float32-reassociation tolerance — the live
scorer runs sharded over the test mesh, the artifact as one device
program), per-artifact bitwise determinism, the RNG/chunking contract,
artifact layout, and the CLI. The artifact must be runnable with NO model
code — only jax + export_hlo.load_artifact."""

import json
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import synthetic_segments, tiny_config


def _scorer(variant, distance="euclidean", seed=0):
    """AnomalyScorer over a fresh (untrained) state with non-trivial
    geometry state — parity needs identical state on both sides, not a
    converged model."""
    from coskad_tpu.serve import AnomalyScorer
    from coskad_tpu.train.loop import Trainer

    cfg = tiny_config(variant, distance=distance)
    ds, _ = synthetic_segments(seg_len=6, n_joints=5)
    tr = Trainer(cfg, ds)
    state = tr.init_state()
    rng = np.random.default_rng(seed)
    d = cfg.model.latent_dim
    center = rng.normal(size=(d,)).astype(np.float32)
    if variant == "hyperbolic":
        center = 0.3 * center / np.linalg.norm(center)
    mean_vector = rng.normal(size=(d,)).astype(np.float32)
    mean_vector /= np.linalg.norm(mean_vector)
    a = rng.normal(size=(d, d)).astype(np.float32)
    inv_cov = (a @ a.T / d + np.eye(d)).astype(np.float32)
    state = state.replace(
        center=jnp.asarray(center),
        mean_vector=jnp.asarray(mean_vector),
        inv_cov=jnp.asarray(inv_cov),
    )
    return AnomalyScorer(cfg, tr.attach_state(state), trainer=tr)


def _windows(n=50, c=2, t=6, v=5, seed=3):
    return np.random.default_rng(seed).normal(size=(n, c, t, v)).astype(
        np.float32)


@pytest.mark.parametrize(
    "variant,distance",
    [
        ("euclidean_static", "euclidean"),
        ("euclidean_static", "mahalanobis"),
        ("autoencoder", "euclidean"),
        ("vae", "euclidean"),
        ("hyperbolic", "euclidean"),
    ],
)
def test_exported_scores_match_live_scorer(tmp_path, variant, distance):
    """Symbolic-batch artifact reproduces AnomalyScorer.score_windows —
    including the VAE, whose sampled latent pins the whole RNG schedule
    (chunk i scored with fold_in(fold_in(state.rng, 7), i)). Tolerance is
    float32 reassociation (the live scorer runs sharded over the 8-device
    test mesh, the artifact as a single-device program); repeat calls of
    the artifact itself must be bitwise identical."""
    from coskad_tpu.export_hlo import export_scorer, load_artifact

    scorer = _scorer(variant, distance)
    w = _windows(50)  # 2 chunks of 32: exercises padding + the chunk loop
    ref = scorer.score_windows(w)
    path = os.path.join(str(tmp_path), "art.czip")
    meta = export_scorer(scorer, path)
    assert meta["batch_size"] is None  # symbolic batch
    assert meta["variant"] == variant

    es = load_artifact(path)
    got = es.score_windows(w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-6, atol=1e-6)
    assert np.array_equal(got, es.score_windows(w))  # deterministic
    if variant in ("autoencoder", "vae"):
        _, rec = es.score_windows(w, return_rec=True)
        assert rec.shape == (50,) and np.isfinite(rec).all() and (
            rec > 0).all()


def test_exported_artifact_is_model_code_free(tmp_path):
    """The loader path touches only export_hlo + jax: the deserialized
    program scores without Trainer/model imports (guard: score through a
    fresh loader using nothing from the scorer object)."""
    from coskad_tpu.export_hlo import export_scorer, load_artifact

    scorer = _scorer("euclidean_static")
    path = os.path.join(str(tmp_path), "art.czip")
    export_scorer(scorer, path)
    ref = scorer.score_windows(_windows(10))
    del scorer

    es = load_artifact(path)
    # raw single-chunk call with an explicit key
    scores, rec = es(_windows(10), np.asarray(es.meta["base_key"],
                                              np.uint32))
    assert scores.shape == (10,) and np.isfinite(scores).all()
    assert rec.shape == (10,)
    # chunked serve-parity call
    got = es.score_windows(_windows(10))
    np.testing.assert_allclose(got, ref, rtol=5e-6, atol=1e-6)


def test_vae_rng_contract(tmp_path):
    """Same base key -> identical scores; different base key -> different
    (the VAE scores sampled latents, matching the reference's predict)."""
    from coskad_tpu.export_hlo import export_scorer, load_artifact

    scorer = _scorer("vae")
    path = os.path.join(str(tmp_path), "art.czip")
    export_scorer(scorer, path)
    es = load_artifact(path)
    w = _windows(8)
    s1 = es.score_windows(w)
    s2 = es.score_windows(w)
    assert np.array_equal(s1, s2)  # deterministic default key
    s3 = es.score_windows(w, base_key=np.asarray([123, 456], np.uint32))
    assert not np.array_equal(s1, s3)


def test_fixed_batch_export(tmp_path):
    """batch_size pins the leading dimension; with the serve batch size the
    chunking (and therefore the scores) still match the live scorer."""
    from coskad_tpu.export_hlo import export_scorer, load_artifact

    scorer = _scorer("euclidean_static")
    bs = scorer.cfg.data.batch_size
    w = _windows(50)
    ref = scorer.score_windows(w)
    path = os.path.join(str(tmp_path), "art_fixed.czip")
    meta = export_scorer(scorer, path, batch_size=bs)
    assert meta["batch_size"] == bs
    es = load_artifact(path)
    np.testing.assert_allclose(es.score_windows(w), ref, rtol=5e-6,
                               atol=1e-6)
    # A wrong-size raw call must be rejected by the fixed-shape program.
    with pytest.raises(Exception):
        es(_windows(bs + 1), np.zeros(2, np.uint32))


def test_artifact_layout_version_guard_and_scaler(tmp_path):
    from coskad_tpu.data.normalize import RobustScalerState
    from coskad_tpu.export_hlo import (
        ARTIFACT_VERSION, META_MEMBER, SCALER_MEMBER, SCORING_MEMBER,
        export_scorer, load_artifact)

    scorer = _scorer("euclidean_static")
    scorer.scaler = RobustScalerState(
        center=np.arange(4, dtype=np.float64),
        scale=np.arange(1, 5, dtype=np.float64),
    )
    path = os.path.join(str(tmp_path), "art.czip")
    meta = export_scorer(scorer, path)
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert {SCORING_MEMBER, META_MEMBER, SCALER_MEMBER} <= names
    assert meta["artifact_version"] == ARTIFACT_VERSION
    assert meta["preprocess"]["normalization_strategy"] is not None
    assert meta["seg_len"] == 6 and meta["n_joints"] == 5

    es = load_artifact(path)
    np.testing.assert_array_equal(es.scaler_arrays["center"],
                                  np.arange(4, dtype=np.float64))
    np.testing.assert_array_equal(es.scaler_arrays["scale"],
                                  np.arange(1, 5, dtype=np.float64))

    # A future artifact version must be refused, not misread.
    future = os.path.join(str(tmp_path), "future.czip")
    with zipfile.ZipFile(path) as src, zipfile.ZipFile(future, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == META_MEMBER:
                m = json.loads(data)
                m["artifact_version"] = ARTIFACT_VERSION + 1
                data = json.dumps(m)
            dst.writestr(name, data)
    with pytest.raises(ValueError, match="version"):
        load_artifact(future)


def test_export_cli_roundtrip(tmp_path):
    """checkpoint -> cli.export -> load_artifact -> scores match the
    checkpoint-loaded AnomalyScorer."""
    from coskad_tpu.cli import export as export_cli
    from coskad_tpu.export_hlo import load_artifact
    from coskad_tpu.serve import AnomalyScorer
    from coskad_tpu.train import checkpoint

    scorer = _scorer("euclidean_static")
    ckpt = os.path.join(str(tmp_path), "best.ckpt")
    checkpoint.save(ckpt, scorer.state, cfg=scorer.cfg)

    art = os.path.join(str(tmp_path), "model.czip")
    rc = export_cli.main(["--ckpt", ckpt, "--out", art])
    assert rc == 0 and os.path.exists(art)

    es = load_artifact(art)
    # from_checkpoint's placeholder dataset is [1, C+1, T, V]: the CLI
    # artifact expects the production 3-channel window layout.
    assert es.meta["in_channels"] == 3
    w3 = _windows(20, c=3)
    ref = AnomalyScorer.from_checkpoint(ckpt).score_windows(w3)
    np.testing.assert_allclose(es.score_windows(w3), ref, rtol=5e-6,
                               atol=1e-6)
