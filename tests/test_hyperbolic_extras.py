"""Extended hyperbolic toolkit: batched ops, analysis utilities, NN layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.geometry import poincare as pm
from coskad_tpu.geometry.hyperbolic_nn import MobiusDist2Hyperplane, MobiusLinear

K = -1.0


def _ball_points(n, d, seed=0, scale=0.4):
    rng = np.random.default_rng(seed)
    return pm.project(pm.expmap0(jnp.asarray(
        rng.normal(size=(n, d)).astype(np.float32)) * scale, K), K)


def test_dist_matrix_consistent_with_pairwise():
    x = _ball_points(6, 8, 0)
    y = _ball_points(5, 8, 1)
    dm = np.asarray(pm.dist_matrix(x, y, K))
    assert dm.shape == (6, 5)
    for i in range(6):
        for j in range(5):
            # reference's batch add carries a +1e-5 denominator epsilon
            np.testing.assert_allclose(
                dm[i, j], float(pm.dist(x[i], y[j], K)), rtol=1e-3, atol=1e-3
            )


def test_dist_matrix_diag_near_zero():
    x = _ball_points(8, 4, 2)
    dm = np.asarray(pm.dist_matrix(x, x, K))
    assert np.abs(np.diag(dm)).max() < 1e-2


def test_delta_hyp_tree_metric_is_zero():
    # A star tree metric is 0-hyperbolic.
    d = np.array([
        [0, 1, 1, 1],
        [1, 0, 2, 2],
        [1, 2, 0, 2],
        [1, 2, 2, 0],
    ], dtype=np.float32)
    assert float(pm.delta_hyp(jnp.asarray(d))) <= 1e-6


def test_relative_delta_in_range():
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(50, 8)), jnp.float32)
    rd = float(pm.relative_delta(emb))
    assert 0.0 <= rd <= 1.0 + 1e-6


def test_auto_select_c_positive():
    for d in (2, 8, 16):
        assert pm.auto_select_c(d) > 0


def test_contrastive_loss_prefers_positives():
    # Reference semantics: the 3rd arg is the cross-view batch whose diagonal
    # holds the positives (see contrastive_loss docstring).
    x = _ball_points(8, 16, 3)
    other = _ball_points(8, 16, 4, scale=0.8)
    loss_aligned, _ = pm.contrastive_loss(x, other, x, tau=0.2, hyp_c=1.0)
    loss_mixed, _ = pm.contrastive_loss(x, x, other, tau=0.2, hyp_c=1.0)
    assert float(loss_aligned) < float(loss_mixed)
    # euclidean (cosine) mode runs too
    l0, logits = pm.contrastive_loss(x, x, other, tau=0.2, hyp_c=0)
    assert np.isfinite(float(l0)) and logits.shape == (8, 16)


def test_hyperbolic_softmax_shapes_and_finiteness():
    x = _ball_points(10, 8, 5)
    a = jnp.asarray(np.random.default_rng(6).normal(size=(3, 8)), jnp.float32)
    p = _ball_points(3, 8, 7, scale=0.2)
    logits = pm.hyperbolic_softmax(x, a, p, K)
    assert logits.shape == (10, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_dist2plane_sign_flips_across_plane():
    # plane through origin with normal e1: points with +x positive distance
    p = jnp.zeros((1, 4))
    a = jnp.asarray([[1.0, 0, 0, 0]])
    x_pos = pm.expmap0(jnp.asarray([[0.3, 0.0, 0.0, 0.0]]), K)
    x_neg = -x_pos
    d_pos = float(pm.dist2plane(x_pos, p, a, K)[0])
    d_neg = float(pm.dist2plane(x_neg, p, a, K)[0])
    assert d_pos > 0 > d_neg
    np.testing.assert_allclose(d_pos, -d_neg, rtol=1e-5)


def test_frechet_mean_agrees_with_midpoint_symmetry():
    x = _ball_points(1, 8, 8, scale=0.4)
    pts = jnp.concatenate([x, -x], axis=0)
    m = pm.frechet_mean(pts, K)
    np.testing.assert_allclose(np.asarray(m), 0.0, atol=1e-5)


def test_frechet_mean_minimizes_distance_sum():
    pts = _ball_points(20, 8, 9, scale=0.5)
    m = pm.frechet_mean(pts, K, num_iters=30)
    obj = float(jnp.sum(pm.dist(pts, m, K) ** 2))
    mid = pm.weighted_midpoint(pts, K)
    obj_mid = float(jnp.sum(pm.dist(pts, mid, K) ** 2))
    # the Frechet mean minimizes the squared-distance sum; the gyromidpoint
    # is only an approximation
    assert obj <= obj_mid + 1e-5
    # perturbations don't improve it
    for seed in range(3):
        delta = 0.01 * np.random.default_rng(seed).normal(size=8).astype(np.float32)
        other = pm.project(m + jnp.asarray(delta), K)
        assert obj <= float(jnp.sum(pm.dist(pts, other, K) ** 2)) + 1e-5


def test_mobius_linear_outputs_on_ball():
    layer = MobiusLinear(features=8)
    x = _ball_points(16, 4, 10)
    variables = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(variables, x)
    assert y.shape == (16, 8)
    norms = np.linalg.norm(np.asarray(y), axis=-1)
    assert np.all(norms < 1.0)


def test_mobius_linear_gradients_finite():
    layer = MobiusLinear(features=4, nonlin=jax.nn.relu)
    x = _ball_points(8, 4, 11)
    variables = layer.init(jax.random.PRNGKey(1), x)

    def loss(params):
        y = layer.apply({"params": params}, x)
        return jnp.sum(pm.dist0(y, K))

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree_util.tree_leaves(g))


def test_dist2hyperplane_layer():
    layer = MobiusDist2Hyperplane(features=5)
    x = _ball_points(12, 6, 12)
    variables = layer.init(jax.random.PRNGKey(2), x)
    d = layer.apply(variables, x)
    assert d.shape == (12, 5)
    assert np.isfinite(np.asarray(d)).all()
