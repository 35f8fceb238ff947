"""Probe: combined-graph layer backward — dm-based (XLA autodiff) vs a
factored custom-VJP that never materializes the [n, n] graph-matrix
cotangent.

The layer is h[b,(q,w),c] = sum_{(t,v)} x[b,(t,v),c] * m[(t,v),(q,w)] with
m[(t,v),(q,w)] = T[v,t,q] * A[q,v,w]  (models/stsgcn.py combined mode).

Autodiff computes dm = sum_{b,c} x ⊗ dy — a [216,216]-output dot contracting
b*c = 131k (6-12 GFLOP/layer, profiled 1.2 ms/step over the 8 AE layers,
plus the transposes feeding it). The factored form contracts through the
T / A factors first:

  dT[v,t,q] = sum_{b,c} x[b,t,v,c] * u[b,q,v,c],  u = sum_w dy ⋅ A
  dA[q,v,w] = sum_{b,c} s[b,q,v,c] * dy[b,q,w,c], s = sum_t T ⋅ x

~1.7 GFLOP/layer at C=32 and no [216,216] dot at all. dx keeps the
MXU-friendly combined matmul dy ⋅ m^T.

Usage: python scripts/probe_adj_backward.py [T] [V] [C] [B]
"""

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 12
V = int(sys.argv[2]) if len(sys.argv) > 2 else 18
C = int(sys.argv[3]) if len(sys.argv) > 3 else 32
B = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
N = T * V
DT = jnp.bfloat16


def combined_m(t_adj, a_adj):
    return jnp.einsum("vtq,qvw->tvqw", t_adj, a_adj).reshape(N, N)


def layer_ref(x, t_adj, a_adj):
    m = combined_m(t_adj, a_adj).astype(DT)
    b = x.shape[0]
    return jnp.einsum("bnc,nm->bmc", x.reshape(b, N, C), m).reshape(
        b, T, V, C)


@jax.custom_vjp
def layer_fact(x, t_adj, a_adj):
    return layer_ref(x, t_adj, a_adj)


def _fwd(x, t_adj, a_adj):
    return layer_fact(x, t_adj, a_adj), (x, t_adj, a_adj)


def _bwd(res, dy):
    x, t_adj, a_adj = res
    b = dy.shape[0]
    m = combined_m(t_adj, a_adj).astype(DT)
    dx = jnp.einsum("bmc,nm->bnc", dy.reshape(b, N, C), m).reshape(x.shape)
    ta = t_adj.astype(DT)
    aa = a_adj.astype(DT)
    # u[b,q,v,c] = sum_w dy[b,q,w,c] * A[q,v,w]
    u = jnp.einsum("bqwc,qvw->bqvc", dy, aa)
    dt = jnp.einsum("btvc,bqvc->vtq", x, u,
                    preferred_element_type=jnp.float32)
    # s[b,q,v,c] = sum_t T[v,t,q] * x[b,t,v,c]
    s = jnp.einsum("vtq,btvc->bqvc", ta, x)
    da = jnp.einsum("bqvc,bqwc->qvw", s, dy,
                    preferred_element_type=jnp.float32)
    return dx, dt.astype(jnp.float32), da.astype(jnp.float32)


layer_fact.defvjp(_fwd, _bwd)


def loss(layer, x, t_adj, a_adj):
    # 4 stacked layers so the probe resembles one stack's worth of work
    h = x
    for _ in range(4):
        h = layer(h, t_adj, a_adj)
        h = jnp.maximum(h, 0.02 * h)
    return jnp.sum((h.astype(jnp.float32)) ** 2)


def bench(layer, x, t_adj, a_adj, steps=40):
    g = jax.jit(jax.grad(functools.partial(loss, layer), argnums=(0, 1, 2)))
    dx, dt, da = g(x, t_adj, a_adj)
    float(jnp.sum(dt))  # force fetch (tunnel hazard)
    t0 = time.perf_counter()
    for _ in range(steps):
        dx, dt, da = g(x, t_adj, a_adj)
    s = float(jnp.sum(dt) + jnp.sum(da) + jnp.sum(dx[0, 0, 0, 0]))
    el = (time.perf_counter() - t0) / steps * 1e3
    return el, s


def main():
    k = jax.random.PRNGKey(0)
    kx, kt, ka = jax.random.split(k, 3)
    x = jax.random.normal(kx, (B, T, V, C), DT)
    t_adj = jax.random.normal(kt, (V, T, T), jnp.float32) / T**0.5
    a_adj = jax.random.normal(ka, (T, V, V), jnp.float32) / V**0.5

    # numerics: factored grads == autodiff grads
    g_ref = jax.jit(jax.grad(functools.partial(loss, layer_ref),
                             argnums=(0, 1, 2)))
    g_fac = jax.jit(jax.grad(functools.partial(loss, layer_fact),
                             argnums=(0, 1, 2)))
    r, f = g_ref(x, t_adj, a_adj), g_fac(x, t_adj, a_adj)
    for name, a, b_ in zip(("dx", "dT", "dA"), r, f):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        denom = np.abs(a32).max() + 1e-6
        print(f"{name}: max rel dev {np.abs(a32 - b32).max() / denom:.3e}")

    ms_ref, _ = bench(layer_ref, x, t_adj, a_adj)
    ms_fac, _ = bench(layer_fact, x, t_adj, a_adj)
    print(f"4-layer grad: autodiff(dm) {ms_ref:.3f} ms | factored "
          f"{ms_fac:.3f} ms  ({ms_ref / ms_fac:.2f}x)")


if __name__ == "__main__":
    main()
