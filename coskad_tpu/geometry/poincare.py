"""Poincare-ball (kappa-stereographic, kappa < 0) operations in pure jnp.

TPU-native reimplementation of the hyperbolic math the reference uses through
geoopt (`geoopt.manifolds.stereographic.math`: expmap0 / project / dist /
dist0 / weighted_midpoint, see reference models/hyperbolic_encoder.py:19,110,
122,147,157 and utils/hyper_math.py). Everything is float32-safe: arguments
of artanh are clamped away from +-1 and points are projected to a max-norm
ball shrunk by BALL_EPS, matching geoopt's float32 behaviour so scores
computed here rank identically to the reference.

Conventions: `k` is the (negative) curvature, default -1.0. All ops
broadcast over leading batch dims; the manifold dimension is the last axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# geoopt uses a dtype-dependent max-norm when projecting onto the open ball:
# 1 - 4e-3 for float32 and 1 - 1e-5 for float64. We run in float32 on TPU.
BALL_EPS_F32 = 4e-3
BALL_EPS_F64 = 1e-5

# Clamp for artanh arguments (reference utils/hyper_math.py:21 uses 1e-5;
# geoopt clamps to 1 - eps(dtype)). 1e-7 keeps float32 accuracy while staying
# finite.
_ARTANH_EPS = 1e-7
_MIN_NORM = 1e-15


def _ball_eps(dtype) -> float:
    return BALL_EPS_F64 if dtype == jnp.float64 else BALL_EPS_F32


def artanh(x: jax.Array) -> jax.Array:
    """Numerically safe inverse hyperbolic tangent."""
    x = jnp.clip(x, -1.0 + _ARTANH_EPS, 1.0 - _ARTANH_EPS)
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def arsinh(x: jax.Array) -> jax.Array:
    return jnp.arcsinh(x)


def _norm(x: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.sqrt(
        jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=keepdims), _MIN_NORM)
    )


def project(x: jax.Array, k: float = -1.0) -> jax.Array:
    """Project onto the open ball of radius (1 - eps) / sqrt(|k|).

    Mirrors geoopt's `project` (and reference utils/hyper_math.py:100-105):
    points with larger norm are radially rescaled onto the max-norm sphere.
    """
    sqrt_c = jnp.sqrt(-k)
    maxnorm = (1.0 - _ball_eps(x.dtype)) / sqrt_c
    norm = _norm(x)
    cond = norm > maxnorm
    projected = x / norm * maxnorm
    return jnp.where(cond, projected, x)


def lambda_x(x: jax.Array, k: float = -1.0, keepdims: bool = True) -> jax.Array:
    """Conformal factor lambda_x = 2 / (1 + k * |x|^2)  (k < 0)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=keepdims)
    return 2.0 / jnp.maximum(1.0 + k * x2, _MIN_NORM)


def mobius_add(x: jax.Array, y: jax.Array, k: float = -1.0) -> jax.Array:
    """Mobius addition x (+)_k y on the kappa-stereographic model."""
    c = -k
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1.0 + 2.0 * c * xy + c * y2) * x + (1.0 - c * x2) * y
    denom = 1.0 + 2.0 * c * xy + c * c * x2 * y2
    return num / jnp.maximum(denom, _MIN_NORM)


def expmap0(u: jax.Array, k: float = -1.0) -> jax.Array:
    """Exponential map at the origin: tangent vector -> ball point."""
    sqrt_c = jnp.sqrt(-k)
    u_norm = _norm(u)
    gamma = jnp.tanh(sqrt_c * u_norm) * u / (sqrt_c * u_norm)
    return gamma


def logmap0(y: jax.Array, k: float = -1.0) -> jax.Array:
    """Logarithmic map at the origin: ball point -> tangent vector."""
    sqrt_c = jnp.sqrt(-k)
    y_norm = _norm(y)
    return y / y_norm / sqrt_c * artanh(sqrt_c * y_norm)


def expmap(x: jax.Array, u: jax.Array, k: float = -1.0) -> jax.Array:
    """Exponential map at x."""
    sqrt_c = jnp.sqrt(-k)
    u_norm = _norm(u)
    second = jnp.tanh(sqrt_c / 2.0 * lambda_x(x, k) * u_norm) * u / (sqrt_c * u_norm)
    return mobius_add(x, second, k)


def logmap(x: jax.Array, y: jax.Array, k: float = -1.0) -> jax.Array:
    """Logarithmic map at x."""
    sqrt_c = jnp.sqrt(-k)
    sub = mobius_add(-x, y, k)
    sub_norm = _norm(sub)
    lam = lambda_x(x, k)
    return 2.0 / sqrt_c / lam * artanh(sqrt_c * sub_norm) * sub / sub_norm


def dist(x: jax.Array, y: jax.Array, k: float = -1.0, keepdims: bool = False) -> jax.Array:
    """Geodesic distance d_k(x, y) = 2/sqrt(|k|) * artanh(sqrt(|k|) |(-x) (+) y|)."""
    sqrt_c = jnp.sqrt(-k)
    d = _norm(mobius_add(-x, y, k), keepdims=keepdims)
    return 2.0 / sqrt_c * artanh(sqrt_c * d)


def dist0(x: jax.Array, k: float = -1.0, keepdims: bool = False) -> jax.Array:
    """Geodesic distance to the origin."""
    sqrt_c = jnp.sqrt(-k)
    return 2.0 / sqrt_c * artanh(sqrt_c * _norm(x, keepdims=keepdims))


def mobius_scalar_mul(r, x: jax.Array, k: float = -1.0) -> jax.Array:
    """Mobius scalar multiplication r (x)_k x."""
    sqrt_c = jnp.sqrt(-k)
    x_norm = _norm(x)
    return jnp.tanh(r * artanh(sqrt_c * x_norm)) * x / (x_norm * sqrt_c)


def mobius_matvec(m: jax.Array, x: jax.Array, k: float = -1.0) -> jax.Array:
    """Mobius matrix-vector multiplication M (x)_k x (x @ m.T in the last dim)."""
    sqrt_c = jnp.sqrt(-k)
    x_norm = _norm(x)
    mx = jnp.einsum("...d,ed->...e", x, m)
    mx_norm = _norm(mx)
    res = jnp.tanh(mx_norm / x_norm * artanh(sqrt_c * x_norm)) * mx / (mx_norm * sqrt_c)
    zero_mx = jnp.all(mx == 0.0, axis=-1, keepdims=True)
    return jnp.where(zero_mx, jnp.zeros_like(res), res)


def poincare_to_klein(x: jax.Array, k: float = -1.0) -> jax.Array:
    """Poincare -> Klein coordinates (reference utils/hyper_math.py p2k)."""
    c = -k
    denom = 1.0 + c * jnp.sum(x * x, axis=-1, keepdims=True)
    return 2.0 * x / denom


def klein_to_poincare(x: jax.Array, k: float = -1.0) -> jax.Array:
    """Klein -> Poincare coordinates (reference utils/hyper_math.py k2p)."""
    c = -k
    denom = 1.0 + jnp.sqrt(
        jnp.maximum(1.0 - c * jnp.sum(x * x, axis=-1, keepdims=True), _MIN_NORM)
    )
    return x / denom


def lorenz_factor(x: jax.Array, k: float = -1.0, keepdims: bool = True) -> jax.Array:
    """Lorenz (gamma) factor of a Klein-model point."""
    c = -k
    x2 = jnp.sum(x * x, axis=-1, keepdims=keepdims)
    return 1.0 / jnp.sqrt(jnp.maximum(1.0 - c * x2, _MIN_NORM))


def weighted_midpoint(
    xs: jax.Array,
    k: float = -1.0,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Weighted gyromidpoint (Einstein midpoint) of points on the ball.

    Equivalent to geoopt's `weighted_midpoint` used for the hyperbolic
    center update (reference models/hyperbolic_encoder.py:122,179) and to
    `poincare_mean` (reference utils/hyper_math.py): map to the Klein model,
    take the Lorenz-factor-weighted mean, map back.

    Args:
        xs: [N, D] points on the Poincare ball.
        k: curvature (negative).
        weights: optional [N] non-negative weights (default: uniform).

    Returns:
        [D] midpoint, projected back inside the ball.
    """
    klein = poincare_to_klein(xs, k)
    gamma = lorenz_factor(klein, k)  # [N, 1]
    if weights is not None:
        gamma = gamma * weights[:, None]
    mean_klein = jnp.sum(gamma * klein, axis=0) / jnp.maximum(
        jnp.sum(gamma, axis=0), _MIN_NORM
    )
    return project(klein_to_poincare(mean_klein, k), k)


def streaming_midpoint_stats(xs: jax.Array, k: float = -1.0):
    """Per-shard sufficient statistics for an exact global midpoint.

    The Einstein midpoint is a weighted mean in Klein coordinates, so the
    pair (sum_i gamma_i * x_i^K, sum_i gamma_i) is additive across data
    shards. Summing these with `jax.lax.psum` over the data mesh axis gives
    the exact global midpoint — fixing the reference's per-rank center quirk
    (see SURVEY.md section 2.8).

    Returns:
        (weighted_sum [D], total_weight [1])
    """
    klein = poincare_to_klein(xs, k)
    gamma = lorenz_factor(klein, k)
    return jnp.sum(gamma * klein, axis=0), jnp.sum(gamma, axis=0)


def midpoint_from_stats(weighted_sum: jax.Array, total_weight: jax.Array, k: float = -1.0) -> jax.Array:
    mean_klein = weighted_sum / jnp.maximum(total_weight, _MIN_NORM)
    return project(klein_to_poincare(mean_klein, k), k)


# --------------------------------------------------------------------------
# Batched / analysis utilities (reference utils/hyper_math.py:414-591)
# --------------------------------------------------------------------------


def mobius_addition_batch(x: jax.Array, y: jax.Array, k: float = -1.0) -> jax.Array:
    """All-pairs Mobius addition: x [B, D], y [C, D] -> [B, C, D]
    (reference utils/hyper_math.py:414-426, incl. its 1e-5 denom epsilon)."""
    c = -k
    xy = jnp.einsum("bd,cd->bc", x, y)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # [B, 1]
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)  # [C, 1]
    num = (1 + 2 * c * xy + c * y2.T)[:, :, None] * x[:, None, :]
    num = num + (1 - c * x2)[:, :, None] * y[None, :, :]
    denom = 1 + 2 * c * xy + c**2 * x2 * y2.T
    return num / (denom[:, :, None] + 1e-5)


def dist_matrix(x: jax.Array, y: jax.Array, k: float = -1.0) -> jax.Array:
    """All-pairs geodesic distances: x [B, D], y [C, D] -> [B, C]."""
    sqrt_c = jnp.sqrt(-k)
    norms = jnp.linalg.norm(mobius_addition_batch(-x, y, k), axis=-1)
    return 2.0 / sqrt_c * artanh(sqrt_c * norms)


def hyperbolic_softmax(x: jax.Array, a: jax.Array, p: jax.Array, k: float = -1.0) -> jax.Array:
    """Hyperbolic multinomial logistic regression logits
    (reference utils/hyper_math.py:428-436): x [B, D] points, a [C, D]
    tangent normals, p [C, D] hyperplane offsets -> [B, C] logits."""
    c = -k
    lambda_pkc = 2.0 / (1.0 - c * jnp.sum(p * p, axis=1))
    kk = lambda_pkc * jnp.linalg.norm(a, axis=1) / jnp.sqrt(c)
    mob = mobius_addition_batch(-p, x, k)  # [C, B, D]
    num = 2.0 * jnp.sqrt(c) * jnp.sum(mob * a[:, None, :], axis=-1)
    denom = jnp.linalg.norm(a, axis=1, keepdims=True) * (
        1.0 - c * jnp.sum(mob * mob, axis=2)
    )
    logit = kk[:, None] * arsinh(num / denom)
    return logit.T


def dist2plane(
    x: jax.Array, p: jax.Array, a: jax.Array, k: float = -1.0, signed: bool = True
) -> jax.Array:
    """Signed distance from points x to the Poincare hyperplane through p
    with tangent normal a (geoopt dist2plane semantics; used by
    MobiusDist2Hyperplane, reference utils/hyperbolic.py:240-250)."""
    c = -k
    sqrt_c = jnp.sqrt(c)
    diff = mobius_add(-p, x, k)
    diff2 = jnp.sum(diff * diff, axis=-1)
    sc = jnp.sum(diff * a, axis=-1)
    if not signed:
        sc = jnp.abs(sc)
    a_norm = jnp.linalg.norm(a, axis=-1)
    num = 2.0 * sqrt_c * sc
    denom = jnp.maximum((1.0 - c * diff2) * a_norm, _MIN_NORM)
    return arsinh(num / denom) / sqrt_c


def auto_select_c(d: int) -> float:
    """Curvature such that the d-dimensional ball has volume pi
    (reference utils/hyper_math.py:494-504)."""
    import math

    dim2 = d / 2.0
    r = math.gamma(dim2 + 1) / (math.pi ** (dim2 - 1))
    r = r ** (1.0 / d)
    return 1.0 / (r * r)


def delta_hyp(dismat: jax.Array) -> jax.Array:
    """Gromov delta-hyperbolicity of a distance matrix
    (reference utils/hyper_math.py:536-542)."""
    row = dismat[0, :][None, :]
    col = dismat[:, 0][:, None]
    gromov = 0.5 * (row + col - dismat)
    maxmin = jnp.max(jnp.minimum(gromov[:, :, None], gromov[None, :, :]), axis=1)
    return jnp.max(maxmin - gromov)


def relative_delta(emb: jax.Array) -> jax.Array:
    """2 * delta / diameter of the embedding's Euclidean distance matrix; the
    reference estimates curvature as c = (0.144 / rel_delta)^2
    (utils/hyper_math.py:545-561)."""
    d2 = jnp.sum((emb[:, None, :] - emb[None, :, :]) ** 2, axis=-1)
    dists = jnp.sqrt(jnp.maximum(d2, 0.0))
    return 2.0 * delta_hyp(dists) / jnp.max(dists)


def contrastive_loss(
    x: jax.Array,
    pos: jax.Array,
    neg: jax.Array,
    tau: float,
    hyp_c: float = 1.0,
):
    """Hyperbolic (or cosine when hyp_c == 0) InfoNCE loss
    (reference utils/hyper_math.py:507-531). Returns (loss, logits).

    NOTE on argument semantics (kept identical to the reference, whose names
    are misleading): the classification target for sample i is column i of
    dist(x, `neg`) — i.e. `neg` is the *cross-view batch whose diagonal holds
    the positive pairs*, while `pos` is the same-view batch contributing
    negatives with its diagonal masked out."""
    if hyp_c == 0:
        dist_f = lambda u, v: u @ v.T
    else:
        dist_f = lambda u, v: -dist_matrix(u, v, k=-hyp_c)
    bsize = x.shape[0]
    eye_mask = jnp.eye(bsize) * 1e9
    logits00 = dist_f(x, pos) / tau - eye_mask
    logits01 = dist_f(x, neg) / tau
    logits = jnp.concatenate([logits01, logits00], axis=1)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    log_probs = jax.nn.log_softmax(logits, axis=1)
    target = jnp.arange(bsize)
    loss = -jnp.mean(log_probs[jnp.arange(bsize), target])
    return loss, logits


def frechet_mean(
    xs: jax.Array,
    k: float = -1.0,
    num_iters: int = 30,
    step_size: float = 0.5,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Karcher/Frechet mean on the ball via damped fixed-point iteration:
    m <- exp_m(alpha * mean(log_m(x_i))), initialized at the gyromidpoint.

    A unit step overshoots in negative curvature for spread-out point sets
    (the squared-distance objective is more than 1-strongly convex along
    geodesics), so alpha = 0.5 is used; empirically it converges to |step| ~
    1e-8 within ~20 iterations and strictly improves on the gyromidpoint.
    Differentiable (unrolled via lax.scan); replaces the reference's
    custom-autograd iterative FrechtMean (utils/hyperbolic.py:293-524)."""
    w = weights if weights is not None else jnp.ones(xs.shape[0])
    w = w / jnp.sum(w)
    m0 = weighted_midpoint(xs, k, weights=w * xs.shape[0])

    def body(m, _):
        tangents = logmap(m[None, :], xs, k)  # [N, D]
        step = jnp.sum(w[:, None] * tangents, axis=0)
        m_new = project(expmap(m, step_size * step, k), k)
        return m_new, None

    m, _ = jax.lax.scan(body, m0, None, length=num_iters)
    return m
