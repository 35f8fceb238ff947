"""Probe: per-row vs per-window slice gather for the trajectory store.

`gather_windows` currently does traj[person[:, None], rows] with rows
[B, T] — advanced indexing that lowers to B*T (=24,576) independent gathers
of tiny [V, 3] rows, profiled at ~0.26 ms/batch — ~25% of the scoring
scan's device time and ~6% of the train step (RESULTS.md round 3).

Window content is T CONSECUTIVE trajectory rows, so the same result is one
lax.gather of [1, T, V, 3] slices at B start positions — 12x fewer, 12x
larger, contiguous slices. This times both inside a scan-20 (the real
dispatch pattern), checks bit-equality, and also times the downstream
normalize to catch layout-regression effects.

Usage: python -u scripts/probe_gather.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

B, T, V, C = 2048, 12, 18, 3
P, F = 100, 412


def gather_rows(traj, person, start):
    rows = start[:, None] + jnp.arange(T)[None, :]
    return traj[person[:, None], rows]


def gather_slices(traj, person, start):
    starts = jnp.stack([person, start], axis=-1).astype(jnp.int32)  # [B, 2]
    return jax.lax.gather(
        traj,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1),
        ),
        slice_sizes=(1, T, V, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def bench(name, fn, traj, person, start, with_norm):
    def one(i):
        # 8 dependent gathers per iteration: rises above the ~1.4 ms scan
        # iteration floor so the gather cost itself dominates the delta.
        acc = 0.0
        p = person
        for r in range(8):
            w = fn(traj, p, start)
            if with_norm:
                xy = w[..., :2] / jnp.asarray([856.0, 480.0])
                xy = 2.0 * xy - 1.0
                xy = xy - jnp.mean(xy, axis=(1, 2), keepdims=True)
                acc = acc + jnp.sum(xy.astype(jnp.float32) ** 2)
            else:
                acc = acc + jnp.sum(w)
            p = (p + i + r + 1) % P  # dependent, un-CSE-able
        return acc

    @jax.jit
    def epoch():
        def body(acc, i):
            return acc + one(i), None
        return jax.lax.scan(body, 0.0, jnp.arange(20))[0]

    for _ in range(2):
        float(epoch())
    t0 = time.perf_counter()
    r = float(epoch())
    dt = time.perf_counter() - t0
    print(f"{name} (norm={with_norm}): {1e3 * dt / 20:7.3f} ms/batch"
          f"  [checksum {r:.1f}]", flush=True)


def gather_slices_flat(traj_flat, person, start):
    """traj stored [P, F, V*C]: the minor dim is 54 lanes (~42% of a 128
    tile) instead of C=3 (~2%); slices are [1, T, 54]."""
    starts = jnp.stack([person, start], axis=-1).astype(jnp.int32)
    w = jax.lax.gather(
        traj_flat,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1),
        ),
        slice_sizes=(1, T, V * C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return w.reshape(w.shape[0], T, V, C)


def main():
    rng = np.random.default_rng(0)
    traj = jnp.asarray(rng.uniform(40, 400, size=(P, F, V, C)).astype(np.float32))
    traj_flat = jnp.asarray(np.asarray(traj).reshape(P, F, V * C))
    person = jnp.asarray(rng.integers(0, P, B).astype(np.int32))
    start = jnp.asarray(rng.integers(0, F - T, B).astype(np.int32))
    a = gather_rows(traj, person, start)
    b = gather_slices(traj, person, start)
    c = gather_slices_flat(traj_flat, person, start)
    print("bit-equal slices:", bool(jnp.all(a == b)),
          " flat:", bool(jnp.all(a == c)), flush=True)
    for with_norm in (False, True):
        bench("rows  ", gather_rows, traj, person, start, with_norm)
        bench("slices", gather_slices, traj, person, start, with_norm)
        bench("flat  ", gather_slices_flat, traj_flat, person, start, with_norm)


if __name__ == "__main__":
    main()
