"""Measurement harness for the fused ghost-BN train kernel vs the XLA step.

Usage (one TPU client at a time; see NEXT.md for the compile-infra hazards):

    python scripts/bench_fused.py xla                 # flax live-BN baseline
    python scripts/bench_fused.py check:64,float32    # compiled-grad parity
    python scripts/bench_fused.py t:64,float32,40     # scan-40 step timing
    python scripts/bench_fused.py fwd:128,bfloat16    # forward-only timing
    python scripts/bench_fused.py probe:small,bfloat16  # tiny-shape compile

Round-2 measurements on v5e-1 at B=2048 (RESULTS.md 'Fused train kernel'):
    flax-XLA live-BN step            7.85 ms  (261k w/s)
    fused fwd-only ghost=128 bf16    0.82 ms  (2.50M w/s)
    fused split fp32 ghost=64        11.06 ms (185k w/s)  <- HBM-boundary
    mono bwd fp32 ghost=128          compiles, runs; scan wrapper OOM-kills
                                     the remote compile helper
    any bf16 backward                Mosaic compile error (no diagnostics
                                     exposed through the axon tunnel)
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from coskad_tpu.kernels import stse_train as K
from coskad_tpu.models import STSE

B, C_IN, T, V = 2048, 2, 12, 18


def build(batch=B, dtype=None):
    kw = {}
    if dtype is not None:
        kw["dtype"] = dtype
    model = STSE(input_dim=C_IN, layer_channels=(32, 16, 32),
                 hidden_dimension=64, latent_dim=16, n_frames=T, n_joints=V,
                 projector="linear", bn_mode="flax", **kw)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((64, C_IN, T, V)))
    x = jnp.asarray(np.random.RandomState(1).randn(batch, C_IN, T, V),
                    jnp.float32)
    return model, variables["params"], variables["batch_stats"], x


def main(argv):
    model, params, bs, x_big = build()
    center = jnp.zeros(16)

    def fused_loss(g, dt_, bwd_mode="split"):
        def loss(p, xx):
            z, _ = K.fused_stse_apply(p, bs, xx, ghost_size=g,
                                      compute_dtype=dt_, bwd_mode=bwd_mode)
            return jnp.mean((z - center) ** 2)
        return loss

    def timed_scan(loss, tag, scan_len=40, batch=B):
        def g_scan(p, xx):
            def body(carry, _):
                l, gr = jax.value_and_grad(loss)(carry, xx)
                newp = jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b,
                                              carry, gr)
                return newp, l
            return jax.lax.scan(body, p, None, length=scan_len)
        f = jax.jit(g_scan)
        t0 = time.perf_counter()
        r = f(params, x_big)
        jax.block_until_ready(r[1])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = f(params, x_big)
        jax.block_until_ready(r[1])
        dt = (time.perf_counter() - t0) / scan_len
        print(f"{tag}: {dt*1e3:.2f} ms/step -> {batch/dt:,.0f} w/s "
              f"(compile {tc:.0f}s)", flush=True)

    for job in argv:
        try:
            if job in ("xla", "xla_bf16"):
                if job == "xla_bf16":
                    model_x, _, _, _ = build(dtype=jnp.bfloat16)
                else:
                    model_x = model

                def loss_xla(p, xx, m=model_x):
                    z, _ = m.apply(
                        {"params": p, "batch_stats": bs}, xx, train=True,
                        mutable=["batch_stats"])
                    return jnp.mean((z.astype(jnp.float32) - center) ** 2)
                timed_scan(loss_xla, f"flax-XLA live-BN [{job}]")
            elif job.startswith("check:"):
                g, dt_ = job[6:].split(",")
                g = int(g)
                g1 = jax.jit(jax.grad(fused_loss(g, dt_)))(params, x_big)
                jax.block_until_ready(g1)
                def loss_ref(p, xx):
                    z, _ = K.ghost_encode_reference(p, xx, ghost_size=g)
                    return jnp.mean((z - center) ** 2)
                g2 = jax.jit(jax.grad(loss_ref))(params, x_big)
                worst = 0.0
                for a, b_ in zip(jax.tree_util.tree_leaves(g2),
                                 jax.tree_util.tree_leaves(g1)):
                    s = max(float(jnp.abs(a).max()), 1e-8)
                    worst = max(worst,
                                float(jnp.abs(b_ - a).max()) / max(s, 1e-3))
                print(f"check {g},{dt_}: worst grad rel err vs fp32 jnp "
                      f"ghost ref {worst:.2e} (fp32-intrinsic band at "
                      f"cnt=27k is ~2e-2)", flush=True)
            elif job.startswith("t:"):
                g, dt_, sl = job[2:].split(",")
                timed_scan(fused_loss(int(g), dt_),
                           f"fused-split ghost={g} {dt_}", int(sl))
            elif job.startswith("tm:"):  # mono backward
                g, dt_, sl = job[3:].split(",")
                timed_scan(fused_loss(int(g), dt_, bwd_mode="mono"),
                           f"fused-mono ghost={g} {dt_}", int(sl))
            elif job.startswith("fwd:"):
                g, dt_ = job[4:].split(",")
                g = int(g)
                def fwd_only(p, xx):
                    z, _ = K.fused_stse_apply(p, bs, xx, ghost_size=g,
                                              compute_dtype=dt_)
                    return jnp.mean(z)
                def scan(p, xx):
                    def body(c, _):
                        return c + fwd_only(p, xx), c
                    return jax.lax.scan(body, jnp.float32(0), None,
                                        length=40)
                f = jax.jit(scan)
                r = f(params, x_big)
                jax.block_until_ready(r[0])
                t0 = time.perf_counter()
                r = f(params, x_big)
                jax.block_until_ready(r[0])
                dt = (time.perf_counter() - t0) / 40
                print(f"fused fwd ghost={g} {dt_}: {dt*1e3:.2f} ms -> "
                      f"{B/dt:,.0f} w/s", flush=True)
        except Exception as e:
            print(f"{job}: FAIL {str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["xla"])
