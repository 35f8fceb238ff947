"""PowerSpherical distribution: moments, entropy, KL, reparameterization."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from coskad_tpu.geometry.sphere import (
    HypersphericalUniform,
    PowerSpherical,
    normal_kl_standard,
)


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_samples_on_sphere():
    loc = jnp.asarray(_unit(np.random.default_rng(0).normal(size=(8, 16))))
    scale = jnp.full((8,), 20.0)
    d = PowerSpherical(loc, scale)
    keys = jax.random.split(jax.random.PRNGKey(0), 100)
    xs = jax.vmap(d.rsample)(keys)  # [100, 8, 16]
    norms = np.linalg.norm(np.asarray(xs), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_mean_direction_matches_loc():
    """E[x] = (kappa / (d - 1 + kappa)) * mu for PowerSpherical
    (alpha-beta over alpha+beta of the Beta marginal of mu^T x)."""
    ddim = 8
    kappa = 50.0
    loc = jnp.asarray(_unit(np.ones(ddim)))
    d = PowerSpherical(loc, jnp.asarray(kappa))
    keys = jax.random.split(jax.random.PRNGKey(1), 20000)
    xs = np.asarray(jax.vmap(d.rsample)(keys))
    emp_mean = xs.mean(0)
    expected = (kappa / (ddim - 1 + kappa)) * np.asarray(loc)
    np.testing.assert_allclose(emp_mean, expected, atol=0.01)


def test_log_prob_normalizes():
    """Integral of the density over the sphere == 1 (importance sampling
    from the uniform distribution)."""
    import math

    from coskad_tpu.geometry.sphere import _log_surface_area

    ddim = 8
    loc = jnp.asarray(_unit(np.ones(ddim)))
    ps = PowerSpherical(loc, jnp.asarray(10.0))
    u = HypersphericalUniform(ddim - 1)
    xs = u.sample(jax.random.PRNGKey(0), (100000,))
    lp = np.asarray(jax.vmap(ps.log_prob)(xs))
    est = np.exp(lp).mean() * math.exp(_log_surface_area(ddim - 1))
    np.testing.assert_allclose(est, 1.0, rtol=0.05)


def test_entropy_matches_monte_carlo():
    loc = jnp.asarray(_unit(np.random.default_rng(2).normal(size=16)))
    d = PowerSpherical(loc, jnp.asarray(10.0))
    keys = jax.random.split(jax.random.PRNGKey(2), 50000)
    xs = jax.vmap(d.rsample)(keys)
    mc_entropy = -np.mean(np.asarray(jax.vmap(d.log_prob)(xs)))
    # absolute tolerance: entropy can be near zero at this concentration
    np.testing.assert_allclose(float(d.entropy()), mc_entropy, atol=0.05)


def test_kl_to_uniform_nonnegative_and_zero_at_zero_concentration():
    loc = jnp.asarray(_unit(np.random.default_rng(3).normal(size=(4, 8))))
    kl = PowerSpherical(loc, jnp.asarray([0.0, 1.0, 10.0, 100.0])).kl_to_uniform()
    kl = np.asarray(kl)
    # float32 gammaln limits precision to ~1e-3 absolute
    assert np.all(kl >= -1e-3)
    # kappa = 0 => uniform on the sphere => KL = 0.
    np.testing.assert_allclose(kl[0], 0.0, atol=1e-3)
    assert kl[1] < kl[2] < kl[3]


def test_rsample_gradients_flow():
    loc = jnp.asarray(_unit(np.random.default_rng(4).normal(size=8)))

    def f(kappa):
        d = PowerSpherical(loc, kappa)
        x = d.rsample(jax.random.PRNGKey(3))
        return jnp.sum(x * loc)

    g = jax.grad(f)(jnp.asarray(5.0))
    assert np.isfinite(float(g))
    assert abs(float(g)) > 0  # concentration must influence the sample


def test_uniform_entropy_formula():
    # S^2 in R^3: area = 4*pi.
    h = float(HypersphericalUniform(2).entropy())
    np.testing.assert_allclose(h, np.log(4 * np.pi), rtol=1e-6)


def test_normal_kl_standard_closed_form():
    mean = jnp.asarray([0.0, 1.0, -2.0])
    std = jnp.asarray([1.0, 2.0, 0.5])
    kl = np.asarray(normal_kl_standard(mean, std))
    expected = 0.5 * (np.asarray(std) ** 2 + np.asarray(mean) ** 2 - 1) - np.log(
        np.asarray(std)
    )
    np.testing.assert_allclose(kl, expected, rtol=1e-6)
    assert kl[0] == 0.0  # N(0,1) vs N(0,1)


_GOLDEN = np.load(
    os.path.join(os.path.dirname(__file__), "golden", "golden_geometry.npz")
)


def test_power_spherical_golden_parity():
    """Unconditional parity with the power_spherical package's closed forms.

    The package cannot be installed here (zero egress), so the semantics the
    reference's VAE depends on (reference models/sts/vae.py:109-113) are
    pinned by tests/golden/golden_geometry.npz: float64 log_prob / entropy /
    KL-to-uniform from De Cao & Aziz (2020) eqs. 5-10, computed with an
    independent scipy implementation and cross-checked against the live
    package whenever the fixture is regenerated on a networked machine
    (scripts/make_golden_geometry.py). kappa spans 0.5..300 so the gammaln/
    digamma float32 regime is covered.
    """
    ours = PowerSpherical(
        jnp.asarray(_GOLDEN["ps_loc"]), jnp.asarray(_GOLDEN["ps_kappa"])
    )
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(jnp.asarray(_GOLDEN["ps_x"]))),
        _GOLDEN["ps_log_prob"], rtol=2e-5, atol=1e-5,
    )
    # float32 gammaln at alpha ~ 300 carries ~1e-4 relative error; entropy
    # and KL are small differences of large terms, so absolute tolerance.
    np.testing.assert_allclose(
        np.asarray(ours.entropy()), _GOLDEN["ps_entropy"],
        rtol=1e-4, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ours.kl_to_uniform()), _GOLDEN["ps_kl_uniform"],
        rtol=1e-4, atol=2e-3,
    )
