"""Probe: logical operand order for the combined-graph + dense layer chain.

The AE step trace (RESULTS.md round 3) shows ~0.9-1.0 ms/step of pure layout
copies on bf16[2048, 216, C] tensors — XLA ping-pongs the sublane dim between
N (for the [N, N] graph contraction) and C (for the 1x1 dense) across the 8
layers. This measures fwd+bwd of a 4-layer graph+dense chain under different
logical orders of the SAME math, steady-state, scan-20, B=2048:

  bnc : current — x[B, N, C]; graph 'bnc,nm->bmc'; dense on minor C
  nbc : x[N, B, C]; graph contracts dim 0 ('nm,nbc->mbc'); dense on minor C
  cbn : x[C, B, N]; graph on minor N; dense 'ck,cbn->kbn'

Each variant computes identical values (checked at fp32 vs bnc); per-layer
params W[C_in, C_out], M[N, N]; BN + PReLU elementwise in between to mimic
the real layer's pass structure.

Usage: python -u scripts/probe_graph_layout.py
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

B, T, V = 2048, 12, 18
N = T * V
CHANS = [3, 32, 16, 32, 64]
DT = jnp.bfloat16


def make_params(key):
    params = []
    for cin, cout in zip(CHANS[:-1], CHANS[1:]):
        key, k1, k2, k3 = jax.random.split(key, 4)
        params.append({
            "m": jax.random.normal(k1, (N, N), jnp.float32) / np.sqrt(N),
            "w": jax.random.normal(k2, (cin, cout), jnp.float32) / np.sqrt(cin),
            "b": jnp.zeros((cout,), jnp.float32),
            "g": jnp.ones((cout,), jnp.float32),
        })
    return params


def norm_act(h, g, b, axes):
    # BN-like normalize over `axes` + affine + PReLU-ish, matching the real
    # layer's elementwise pass count
    mu = jnp.mean(h.astype(jnp.float32), axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=axes,
                   keepdims=True) - mu**2
    y = (h.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
    return jnp.where(y >= 0, y, 0.25 * y).astype(DT)


def fwd_bnc(params, x):  # x [B, N, C]
    for p in params:
        h = jnp.einsum("bnc,nm->bmc", x, p["m"].astype(DT),
                       preferred_element_type=jnp.float32).astype(DT)
        h = h @ p["w"].astype(DT) + p["b"].astype(DT)
        gshape = (1, 1, -1)
        x = norm_act(h, p["g"].reshape(gshape), p["b"].reshape(gshape), (0, 1))
    return x


def fwd_nbc(params, x):  # x [N, B, C]
    for p in params:
        h = jnp.einsum("nm,nbc->mbc", p["m"].astype(DT), x,
                       preferred_element_type=jnp.float32).astype(DT)
        h = h @ p["w"].astype(DT) + p["b"].astype(DT)
        gshape = (1, 1, -1)
        x = norm_act(h, p["g"].reshape(gshape), p["b"].reshape(gshape), (0, 1))
    return x


def fwd_cbn(params, x):  # x [C, B, N]
    for p in params:
        h = jnp.einsum("cbn,nm->cbm", x, p["m"].astype(DT),
                       preferred_element_type=jnp.float32).astype(DT)
        h = jnp.einsum("ck,cbn->kbn", p["w"].astype(DT), h,
                       preferred_element_type=jnp.float32).astype(DT)
        h = h + p["b"].astype(DT)[:, None, None]
        gshape = (-1, 1, 1)
        x = norm_act(h, p["g"].reshape(gshape), p["b"].reshape(gshape), (1, 2))
    return x


def bench(name, fwd, params, x):
    def loss(p, xx):
        return jnp.sum(fwd(p, xx).astype(jnp.float32) ** 2)

    def epoch(p, xx):
        def body(carry, _):
            l, g = jax.value_and_grad(loss)(carry, xx)
            return jax.tree.map(lambda a, d: a - 1e-6 * d, carry, g), l
        return jax.lax.scan(body, p, None, length=20)

    run = jax.jit(epoch)
    for _ in range(2):
        p2, ls = run(params, x)
        jax.block_until_ready(ls)
        float(ls[0])
    t0 = time.perf_counter()
    p2, ls = run(params, x)
    jax.block_until_ready(ls)
    float(ls[0])
    dt = time.perf_counter() - t0
    print(f"{name}: {1e3 * dt / 20:7.3f} ms/step", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, CHANS[0]), DT)
    # value check at small scale
    xs = x[:8].astype(jnp.float32).astype(DT)
    y0 = fwd_bnc(params, xs)
    y1 = jnp.transpose(fwd_nbc(params, jnp.transpose(xs, (1, 0, 2))), (1, 0, 2))
    y2 = jnp.transpose(fwd_cbn(params, jnp.transpose(xs, (2, 0, 1))), (1, 2, 0))
    for nm, y in (("nbc", y1), ("cbn", y2)):
        d = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y0.astype(jnp.float32))))
        print(f"value check {nm}: max|d|={d:.3e}", flush=True)
    bench("bnc (current)", fwd_bnc, params, x)
    bench("nbc          ", fwd_nbc, params, jnp.transpose(x, (1, 0, 2)))
    bench("cbn          ", fwd_cbn, params, jnp.transpose(x, (2, 0, 1)))


if __name__ == "__main__":
    main()
