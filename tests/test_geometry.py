"""Poincare-ball math: closed-form identities + agreement of the two
midpoint formulations (SURVEY.md section 4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.geometry import poincare as pm

K = -1.0


def _random_ball_points(n=64, d=16, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, d)).astype(np.float32) * scale
    return pm.project(pm.expmap0(jnp.asarray(u), K), K)


def test_expmap0_logmap0_roundtrip():
    u = jnp.asarray(np.random.default_rng(1).normal(size=(32, 8)), jnp.float32) * 0.3
    x = pm.expmap0(u, K)
    u_rec = pm.logmap0(x, K)
    np.testing.assert_allclose(u, u_rec, rtol=1e-3, atol=1e-4)  # fp32 tanh/artanh


def test_dist_self_is_zero():
    x = _random_ball_points()
    d = pm.dist(x, x, K)
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_dist_symmetry_and_triangle():
    x = _random_ball_points(seed=2)
    y = _random_ball_points(seed=3)
    z = _random_ball_points(seed=4)
    dxy = pm.dist(x, y, K)
    dyx = pm.dist(y, x, K)
    np.testing.assert_allclose(dxy, dyx, rtol=1e-4, atol=1e-5)
    assert np.all(pm.dist(x, z, K) <= dxy + pm.dist(y, z, K) + 1e-4)


def test_dist0_matches_dist_to_origin():
    x = _random_ball_points(seed=5)
    np.testing.assert_allclose(
        pm.dist0(x, K), pm.dist(jnp.zeros_like(x), x, K), rtol=1e-4, atol=1e-5
    )


def test_mobius_left_cancellation():
    # (-x) (+) (x (+) y) == y  (reference utils/hyper_math.py:153-155)
    x = _random_ball_points(seed=6, scale=0.3)
    y = _random_ball_points(seed=7, scale=0.3)
    rec = pm.mobius_add(-x, pm.mobius_add(x, y, K), K)
    np.testing.assert_allclose(rec, y, rtol=1e-3, atol=1e-4)


def test_project_keeps_max_norm():
    big = jnp.asarray(np.random.default_rng(8).normal(size=(16, 4)), jnp.float32) * 100
    p = pm.project(big, K)
    norms = np.linalg.norm(np.asarray(p), axis=-1)
    assert np.all(norms <= 1.0 - pm.BALL_EPS_F32 + 1e-6)


def test_midpoint_of_symmetric_pair_is_origin():
    x = _random_ball_points(n=1, seed=9, scale=0.4)
    pts = jnp.concatenate([x, -x], axis=0)
    mid = pm.weighted_midpoint(pts, K)
    np.testing.assert_allclose(mid, 0.0, atol=1e-5)


def test_midpoint_inside_ball_and_matches_streaming():
    pts = _random_ball_points(n=128, d=16, seed=10, scale=0.8)
    mid = pm.weighted_midpoint(pts, K)
    assert np.linalg.norm(np.asarray(mid)) < 1.0
    # Streaming (shardable) stats give the same midpoint.
    half1, half2 = pts[:64], pts[64:]
    s1, w1 = pm.streaming_midpoint_stats(half1, K)
    s2, w2 = pm.streaming_midpoint_stats(half2, K)
    mid2 = pm.midpoint_from_stats(s1 + s2, w1 + w2, K)
    np.testing.assert_allclose(mid, mid2, rtol=1e-5, atol=1e-6)


def test_midpoint_of_single_point_is_point():
    x = _random_ball_points(n=1, seed=11, scale=0.5)
    mid = pm.weighted_midpoint(x, K)
    np.testing.assert_allclose(mid, x[0], rtol=1e-4, atol=1e-5)


def test_klein_poincare_roundtrip():
    x = _random_ball_points(seed=12)
    rec = pm.klein_to_poincare(pm.poincare_to_klein(x, K), K)
    np.testing.assert_allclose(rec, x, rtol=1e-4, atol=1e-6)


def test_expmap_logmap_general_roundtrip():
    x = _random_ball_points(n=16, d=8, seed=13, scale=0.2)
    u = jnp.asarray(np.random.default_rng(14).normal(size=(16, 8)), jnp.float32) * 0.2
    y = pm.expmap(x, u, K)
    u_rec = pm.logmap(x, y, K)
    np.testing.assert_allclose(u, u_rec, rtol=1e-3, atol=1e-4)


def test_mobius_scalar_mul_doubling():
    # 2 (x) x == x (+) x
    x = _random_ball_points(n=16, d=8, seed=15, scale=0.3)
    np.testing.assert_allclose(
        pm.mobius_scalar_mul(2.0, x, K),
        pm.mobius_add(x, x, K),
        rtol=1e-3,
        atol=1e-4,
    )


def test_dist_grad_finite_near_boundary():
    x = pm.project(
        jnp.asarray(np.random.default_rng(16).normal(size=(4, 8)), jnp.float32) * 50,
        K,
    )
    g = jax.grad(lambda a: pm.dist(a, jnp.zeros_like(a), K).sum())(x)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("seed", [0, 1])
def test_geoopt_parity_if_available(seed):
    """Distance/expmap parity with geoopt when it is installed (<=1e-5)."""
    geoopt = pytest.importorskip("geoopt")
    import torch

    gmath = geoopt.manifolds.stereographic.math
    u = np.random.default_rng(seed).normal(size=(32, 16)).astype(np.float32)
    k_t = torch.tensor(-1.0)
    ours_exp = np.asarray(pm.project(pm.expmap0(jnp.asarray(u), K), K))
    ref_exp = gmath.project(gmath.expmap0(torch.tensor(u), k=k_t), k=k_t).numpy()
    np.testing.assert_allclose(ours_exp, ref_exp, rtol=1e-5, atol=1e-6)

    c = ref_exp[0]
    ours_d = np.asarray(pm.dist(jnp.asarray(ref_exp), jnp.asarray(c), K))
    ref_d = gmath.dist(torch.tensor(ref_exp), torch.tensor(c), k=k_t).numpy()
    np.testing.assert_allclose(ours_d, ref_d, rtol=1e-4, atol=1e-5)

    ours_mid = np.asarray(pm.weighted_midpoint(jnp.asarray(ref_exp), K))
    ref_mid = gmath.weighted_midpoint(torch.tensor(ref_exp), k=k_t).numpy()
    np.testing.assert_allclose(ours_mid, ref_mid, rtol=1e-4, atol=1e-5)
