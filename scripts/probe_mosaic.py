"""Micro-probes to bisect which construct the remote Mosaic compiler
rejects in bf16 backward payloads (round-2/3: every bf16-stored backward
fails `tpu_compile_helper exit 1` while the bf16 forward compiles fine).

Each job compiles ONE small pallas kernel exercising one suspect op class:

    python scripts/probe_mosaic.py dot0_bf16 where_mixed min_bf16 ...

Jobs print OK <ms> or FAIL <error>.
"""

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, BB, N = 32, 64, 256


def run(name, kernel, n_in=2, out_shape=None, dtypes=None):
    dtypes = dtypes or [jnp.float32] * n_in
    out_shape = out_shape or jax.ShapeDtypeStruct((C, BB, N), jnp.float32)
    args = [jnp.asarray(np.random.RandomState(i).randn(C, BB, N), d)
            for i, d in enumerate(dtypes)]
    f = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                               memory_space=pltpu.VMEM) for a in args],
        out_specs=pl.BlockSpec(out_shape.shape,
                               lambda: (0,) * len(out_shape.shape),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    t0 = time.perf_counter()
    try:
        r = jax.jit(lambda *a: f(*a))(*args)
        jax.block_until_ready(r)
        print(f"{name}: OK ({time.perf_counter() - t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:140]} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)


def main(jobs):
    bf = jnp.bfloat16

    def dot0_bf16(a_ref, b_ref, o_ref):
        # lhsT dot (contract dim0 x dim0) on bf16 operands, like the
        # backward's eye-transposes / dm / dwp accumulations
        a = a_ref[:].astype(bf).reshape(C * BB, N)
        eye = jnp.eye(C * BB, dtype=bf)[: C * BB]
        r = jax.lax.dot_general(a, a, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [N, N]
        o_ref[:] = jnp.broadcast_to(r[:C, :BB][:, :, None], (C, BB, N))

    def dot0_small_bf16(a_ref, b_ref, o_ref):
        a = a_ref[:].astype(bf).reshape(C * BB, N)
        r = jax.lax.dot_general(a, a, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:] = jnp.broadcast_to(r[:C, :BB][:, :, None], (C, BB, N))

    def where_mixed(a_ref, b_ref, o_ref):
        # f32 predicate source selecting between bf16 arrays (the PReLU bwd)
        a = a_ref[:].astype(bf)
        b = b_ref[:].astype(bf)
        o_ref[:] = jnp.where(a < 0, jnp.float32(0.25).astype(bf) * b,
                             b).astype(jnp.float32)

    def min_bf16(a_ref, b_ref, o_ref):
        a = a_ref[:].astype(bf)
        b = b_ref[:].astype(bf)
        r = jnp.sum(jnp.sum((b.astype(jnp.float32)
                             * jnp.minimum(a, 0).astype(jnp.float32)),
                            axis=2), axis=1)
        o_ref[:] = jnp.broadcast_to(r[:, None, None], (C, BB, N))

    def transpose_bf16(a_ref, b_ref, o_ref):
        a = a_ref[:].astype(bf)
        o_ref[:] = jnp.transpose(a, (0, 2, 1)).reshape(C, BB, N).astype(
            jnp.float32)

    def dotg_bf16(a_ref, b_ref, o_ref):
        # 2Dx3D dot with bf16 3D operand (used everywhere incl fwd — control)
        w = jnp.ones((C, C), bf)
        a = a_ref[:].astype(bf)
        o_ref[:] = jax.lax.dot_general(
            w, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    table = {k: v for k, v in locals().items() if callable(v)}
    for j in jobs:
        run(j, table[j])


def extra_jobs(jobs):
    bf = jnp.bfloat16

    def where_clean(a_ref, b_ref, o_ref):
        # exactly the backward's dpre line: predicate from bf16 compare,
        # branches bf16 (alpha as a traced scalar from the array)
        a = a_ref[:].astype(bf)
        b = b_ref[:].astype(bf)
        alpha = a_ref[0, 0, 0].astype(bf)
        o_ref[:] = jnp.where(a < 0, alpha * b, b).astype(jnp.float32)

    def where_f32pred(a_ref, b_ref, o_ref):
        a = a_ref[:]  # f32
        b = b_ref[:].astype(bf)
        alpha = a_ref[0, 0, 0].astype(bf)
        o_ref[:] = jnp.where(a < 0, alpha * b, b).astype(jnp.float32)

    def where_const_scalar(a_ref, b_ref, o_ref):
        a = a_ref[:].astype(bf)
        b = b_ref[:].astype(bf)
        o_ref[:] = jnp.where(a < 0, jnp.float32(0.25).astype(bf) * b,
                             b).astype(jnp.float32)

    def transpose_pure(a_ref, b_ref, o_ref):
        # (0,2,1) transpose only, output [C, N, BB]
        a = a_ref[:].astype(bf)
        o_ref[:] = jnp.transpose(a, (0, 2, 1)).astype(jnp.float32)

    def transpose_merge(a_ref, b_ref, o_ref):
        # transpose then major-merge reshape [C, N, BB] -> [C*N, BB]
        # (the projector hcn form)
        a = a_ref[:].astype(bf)
        h = jnp.transpose(a, (0, 2, 1)).reshape(C * N, BB)
        o_ref[:] = jnp.broadcast_to(h[: C, :BB][:, :, None],
                                    (C, BB, N)).astype(jnp.float32)

    table = {k: v for k, v in locals().items() if callable(v)}
    for j in jobs:
        if j == "transpose_pure":
            run(j, table[j],
                out_shape=jax.ShapeDtypeStruct((C, N, BB), jnp.float32))
        else:
            run(j, table[j])


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra_jobs(sys.argv[2:])
    else:
        main(sys.argv[1:] or ["dotg_bf16", "where_mixed", "min_bf16",
                              "dot0_small_bf16", "transpose_bf16"])
