"""Poincare-ball math: closed-form identities + agreement of the two
midpoint formulations (SURVEY.md section 4 test plan)."""

import os

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


_GOLDEN = np.load(
    os.path.join(os.path.dirname(__file__), "golden", "golden_geometry.npz")
)


class TestGoldenParity:
    """Unconditional parity against committed float64 goldens.

    geoopt cannot be installed in this environment, so the reference
    semantics (geoopt.manifolds.stereographic.math, used by
    reference models/hyperbolic_encoder.py:110-158) are pinned by
    tests/golden/golden_geometry.npz: float64 values of the same published
    closed forms, computed by an INDEPENDENT numpy implementation with
    geoopt's float32 projection constant (provenance + optional live geoopt
    cross-check: scripts/make_golden_geometry.py). The float32 jnp
    implementation must reproduce them to float32 tolerance — including on
    tangent norms up to 8 and raw norms up to 100, the clamping-sensitive
    ball-edge region.
    """

    def test_expmap0_project_golden(self):
        ours = pm.project(pm.expmap0(jnp.asarray(_GOLDEN["tangents"]), K), K)
        np.testing.assert_allclose(
            np.asarray(ours), _GOLDEN["exp0"], rtol=1e-5, atol=1e-6
        )

    def test_project_golden(self):
        ours = pm.project(jnp.asarray(_GOLDEN["raw_points"]), K)
        np.testing.assert_allclose(
            np.asarray(ours), _GOLDEN["proj"], rtol=1e-5, atol=1e-6
        )

    def test_dist0_golden(self):
        pts = pm.project(pm.expmap0(jnp.asarray(_GOLDEN["tangents"]), K), K)
        # artanh amplifies float32 rounding near the boundary: |d(artanh)/dx|
        # = 1/(1-x^2) ~ 125 at the max norm 1-4e-3, so 1e-7-level input
        # rounding legitimately moves dist0 by ~1e-4 relative.
        np.testing.assert_allclose(
            np.asarray(pm.dist0(pts, K)), _GOLDEN["dist0"], rtol=5e-4
        )

    def test_pairwise_dist_golden(self):
        pts = pm.project(pm.expmap0(jnp.asarray(_GOLDEN["u"]), K), K)
        ours = pm.dist(pts[:, None, :], pts[None, :, :], K)
        np.testing.assert_allclose(
            np.asarray(ours), _GOLDEN["pairwise_dist"], rtol=1e-4, atol=1e-5
        )

    def test_midpoint_golden(self):
        pts = pm.project(pm.expmap0(jnp.asarray(_GOLDEN["u"]), K), K)
        np.testing.assert_allclose(
            np.asarray(pm.weighted_midpoint(pts, K)),
            _GOLDEN["midpoint"], rtol=1e-4, atol=1e-5,
        )

    def test_weighted_midpoint_golden(self):
        pts = pm.project(pm.expmap0(jnp.asarray(_GOLDEN["u"]), K), K)
        ours = pm.weighted_midpoint(
            pts, K, weights=jnp.asarray(_GOLDEN["weights"])
        )
        np.testing.assert_allclose(
            np.asarray(ours), _GOLDEN["midpoint_weighted"],
            rtol=1e-4, atol=1e-5,
        )

    def test_streaming_midpoint_matches_golden(self):
        """The shardable streaming path hits the same golden midpoint."""
        pts = pm.project(pm.expmap0(jnp.asarray(_GOLDEN["u"]), K), K)
        s1, w1 = pm.streaming_midpoint_stats(pts[:16], K)
        s2, w2 = pm.streaming_midpoint_stats(pts[16:], K)
        ours = pm.midpoint_from_stats(s1 + s2, w1 + w2, K)
        np.testing.assert_allclose(
            np.asarray(ours), _GOLDEN["midpoint"], rtol=1e-4, atol=1e-5
        )
