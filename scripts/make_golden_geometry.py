"""Generate golden parity fixtures for the hyperbolic + spherical geometry.

The reference defines its hyperbolic path through geoopt
(/root/reference/models/hyperbolic_encoder.py:19,110,122,147,157) and its
spherical VAE through the power_spherical package
(/root/reference/models/sts/vae.py:7,109-113). Neither package is installable
in this environment (zero egress), so the parity contract is pinned the next
best way: this script computes the SAME published closed forms in an
INDEPENDENT float64 NumPy/SciPy implementation —

  * Poincare-ball ops from Ganea, Becigneul & Hofmann, "Hyperbolic Neural
    Networks" (NeurIPS 2018), eqs. (expmap0, Mobius addition, distance),
    with geoopt's dtype-dependent projection constant (max norm 1 - 4e-3
    for float32, geoopt/manifolds/stereographic/math.py) so the goldens
    match what geoopt-on-float32 would produce;
  * the Einstein/Klein gyromidpoint (Ungar 2008), which geoopt's
    weighted_midpoint implements up to model isometry;
  * PowerSpherical log-normalizer / log_prob / entropy / KL-to-uniform from
    De Cao & Aziz, "The Power Spherical distribution" (2020), eqs. 5-10 —
    the exact formulas the power_spherical package evaluates with
    torch.lgamma/digamma.

— and writes them to tests/golden/golden_geometry.npz. The committed
fixture makes tests/test_geometry.py + tests/test_sphere.py parity tests
unconditional (no importorskip): coskad_tpu's float32 jnp implementations
must reproduce these float64 values within float32 tolerance.

If geoopt / power_spherical ARE available (e.g. regenerating the fixture on
a networked machine), the script cross-checks the NumPy goldens against the
real packages before writing, so the provenance upgrade is automatic.

Run:  python scripts/make_golden_geometry.py
"""

import os
import sys

import numpy as np
from scipy.special import digamma, gammaln

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "golden_geometry.npz")

BALL_EPS_F32 = 4e-3  # geoopt's float32 projection epsilon
C = 1.0              # curvature magnitude (k = -1), the reference's setting


# ---------------------------------------------------------------------------
# Poincare ball, float64 (independent of coskad_tpu.geometry.poincare)
# ---------------------------------------------------------------------------

def project(x, eps=BALL_EPS_F32):
    maxnorm = (1.0 - eps) / np.sqrt(C)
    norm = np.linalg.norm(x, axis=-1, keepdims=True)
    scaled = x / norm * maxnorm
    return np.where(norm > maxnorm, scaled, x)


def expmap0(u):
    n = np.linalg.norm(u, axis=-1, keepdims=True)
    return np.tanh(np.sqrt(C) * n) * u / (np.sqrt(C) * n)


def mobius_add(x, y):
    x2 = np.sum(x * x, axis=-1, keepdims=True)
    y2 = np.sum(y * y, axis=-1, keepdims=True)
    xy = np.sum(x * y, axis=-1, keepdims=True)
    num = (1 + 2 * C * xy + C * y2) * x + (1 - C * x2) * y
    return num / (1 + 2 * C * xy + C * C * x2 * y2)


def dist(x, y):
    n = np.linalg.norm(mobius_add(-x, y), axis=-1)
    return 2.0 / np.sqrt(C) * np.arctanh(np.sqrt(C) * n)


def dist0(x):
    n = np.linalg.norm(x, axis=-1)
    return 2.0 / np.sqrt(C) * np.arctanh(np.sqrt(C) * n)


def weighted_midpoint(xs, weights=None):
    """Einstein midpoint: Poincare -> Klein, Lorenz-weighted mean, back."""
    klein = 2.0 * xs / (1.0 + C * np.sum(xs * xs, axis=-1, keepdims=True))
    gamma = 1.0 / np.sqrt(1.0 - C * np.sum(klein * klein, axis=-1,
                                           keepdims=True))
    if weights is not None:
        gamma = gamma * weights[:, None]
    mk = np.sum(gamma * klein, axis=0) / np.sum(gamma, axis=0)
    poinc = mk / (1.0 + np.sqrt(1.0 - C * np.sum(mk * mk)))
    return project(poinc)


# ---------------------------------------------------------------------------
# PowerSpherical closed forms, float64 (De Cao & Aziz 2020)
# ---------------------------------------------------------------------------

def ps_log_normalizer(d, kappa):
    beta = (d - 1.0) / 2.0
    alpha = beta + kappa
    return -((alpha + beta) * np.log(2.0) + gammaln(alpha)
             - gammaln(alpha + beta) + beta * np.log(np.pi))


def ps_log_prob(loc, kappa, x):
    d = loc.shape[-1]
    return ps_log_normalizer(d, kappa) + kappa * np.log1p(
        np.sum(loc * x, axis=-1))


def ps_entropy(d, kappa):
    beta = (d - 1.0) / 2.0
    alpha = beta + kappa
    return -(ps_log_normalizer(d, kappa)
             + kappa * (np.log(2.0) + digamma(alpha) - digamma(alpha + beta)))


def log_surface_area(sphere_dim):
    d = sphere_dim + 1
    return np.log(2.0) + (d / 2.0) * np.log(np.pi) - gammaln(d / 2.0)


def ps_kl_to_uniform(d, kappa):
    return -ps_entropy(d, kappa) + log_surface_area(d - 1)


# ---------------------------------------------------------------------------
# Fixture inputs: the SAME float32 arrays the tests will feed both sides.
# Norm grid stresses the ball edge (the clamping-sensitive region).
# ---------------------------------------------------------------------------

def make_inputs():
    rng = np.random.default_rng(2024)
    d = 16
    # Tangent vectors whose expmap0 images sweep the ball radius up to and
    # past the projection boundary: tanh(5) = 0.9999 > 1 - 4e-3.
    norms = np.array([1e-3, 0.1, 0.5, 1.0, 2.0, 3.0, 4.0, 5.0, 8.0])
    dirs = rng.normal(size=(norms.size, d))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    tangents = (dirs * norms[:, None]).astype(np.float32)
    # Raw points to project: norms straddling the 1 - 4e-3 max norm.
    raw_norms = np.array([0.5, 0.99, 1.0 - 4e-3, 0.9999, 1.5, 100.0])
    rdirs = rng.normal(size=(raw_norms.size, d))
    rdirs /= np.linalg.norm(rdirs, axis=-1, keepdims=True)
    raw_points = (rdirs * raw_norms[:, None]).astype(np.float32)
    # A batch of ball points for dist/midpoint goldens. Moderate norms on
    # purpose: per-component 0.25 puts tangent norms ~1.0 and ball norms
    # ~0.76. At the 0.996 clamp boundary the float32 test path and the
    # float64 golden path round the projection condition differently and
    # the Klein Lorenz factor amplifies that into O(1) midpoint error —
    # the boundary regime is pinned by the exp0/proj/dist0 goldens above,
    # where both sides see identical float32 inputs.
    u = rng.normal(size=(32, d)).astype(np.float32) * 0.25
    weights = rng.uniform(0.1, 2.0, size=32).astype(np.float32)
    # PowerSpherical inputs.
    loc = rng.normal(size=(6, 8))
    loc /= np.linalg.norm(loc, axis=-1, keepdims=True)
    loc = loc.astype(np.float32)
    kappa = np.array([0.5, 1.0, 5.0, 20.0, 80.0, 300.0], np.float32)
    xs = rng.normal(size=(6, 8))
    xs /= np.linalg.norm(xs, axis=-1, keepdims=True)
    xs = xs.astype(np.float32)
    return dict(tangents=tangents, raw_points=raw_points, u=u,
                weights=weights, ps_loc=loc, ps_kappa=kappa, ps_x=xs)


def main():
    inp = make_inputs()
    t64 = inp["tangents"].astype(np.float64)
    raw64 = inp["raw_points"].astype(np.float64)
    # Ball points derived the same way the test will derive them.
    pts64 = project(expmap0(inp["u"].astype(np.float64)))
    w64 = inp["weights"].astype(np.float64)

    golden = {
        "exp0": project(expmap0(t64)),
        "proj": project(raw64),
        "dist0": dist0(project(expmap0(t64))),
        "pairwise_dist": dist(pts64[:, None, :], pts64[None, :, :]),
        "midpoint": weighted_midpoint(pts64),
        "midpoint_weighted": weighted_midpoint(pts64, w64),
        "ps_log_prob": ps_log_prob(inp["ps_loc"].astype(np.float64),
                                   inp["ps_kappa"].astype(np.float64),
                                   inp["ps_x"].astype(np.float64)),
        "ps_entropy": ps_entropy(8, inp["ps_kappa"].astype(np.float64)),
        "ps_kl_uniform": ps_kl_to_uniform(8,
                                          inp["ps_kappa"].astype(np.float64)),
    }

    # Cross-check against the real packages when present (networked regen).
    try:
        import geoopt  # noqa: F401
        import torch
        gm = geoopt.manifolds.stereographic.math
        k = torch.tensor(-1.0)
        ref = gm.project(gm.expmap0(torch.tensor(t64, dtype=torch.float64),
                                    k=k.double()), k=k.double()).numpy()
        np.testing.assert_allclose(golden["exp0"], ref, rtol=1e-9, atol=1e-9)
        print("geoopt cross-check: OK")
    except ImportError:
        print("geoopt not installed; goldens from the independent f64 "
              "formulas only (see module docstring)")
    try:
        import power_spherical as psp
        import torch
        theirs = psp.PowerSpherical(
            torch.tensor(inp["ps_loc"], dtype=torch.float64),
            torch.tensor(inp["ps_kappa"], dtype=torch.float64))
        np.testing.assert_allclose(golden["ps_entropy"],
                                   theirs.entropy().numpy(), rtol=1e-9)
        print("power_spherical cross-check: OK")
    except ImportError:
        print("power_spherical not installed; goldens from De Cao & Aziz "
              "closed forms only")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **inp, **golden)
    print(f"wrote {os.path.normpath(OUT)}:")
    for name, arr in {**inp, **golden}.items():
        print(f"  {name}: {np.asarray(arr).shape} {np.asarray(arr).dtype}")


if __name__ == "__main__":
    sys.exit(main())
