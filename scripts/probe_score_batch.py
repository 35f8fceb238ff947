"""Probe: scoring throughput vs score-batch size.

The scoring scan (`Trainer._score_many`) takes [K, B] index chunks — B is a
shape of the *call*, not of the model — so eval can run at a larger batch
than training (forward-only memory is light). This measures windows/s for
the same total work (~196k window-scores) at B in {2048, 4096, 8192, 16384}
on the store pipeline, steady-state (two warm epochs per shape).

Usage: python -u scripts/probe_score_batch.py [variant]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "euclidean_static"
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from coskad_tpu.config import (Config, DataConfig, ModelConfig,
                                   OptConfig, RunConfig)
    from coskad_tpu.parallel import create_mesh
    from coskad_tpu.train.loop import Trainer

    cfg = Config(
        model=ModelConfig(variant=variant, channels=bench.CHANNELS,
                          h_dim=bench.H_DIM, latent_dim=bench.LATENT),
        data=DataConfig(seg_len=bench.T, batch_size=bench.BATCH,
                        num_transform=5, n_joints_override=bench.V),
        opt=OptConfig(lr=1e-4),
        run=RunConfig(compute_dtype="bfloat16"),
    )
    ds = bench._bench_dataset("store")
    mesh = create_mesh()
    trainer = Trainer(cfg, ds, mesh=mesh)
    state = trainer.init_state()
    sharding = NamedSharding(mesh, P(None, "data"))
    perm = np.random.default_rng(1).permutation(len(ds))
    total = 96 * 2048  # same logical work for every shape

    for b in (2048, 4096, 8192, 16384):
        k = total // b
        idx = jax.device_put(jnp.asarray(perm[:k * b].reshape(k, b)), sharding)
        for _ in range(2):  # compile + steady-state warm
            s, _ = trainer._score_many(
                state.params, state.batch_stats, trainer.train_data, idx,
                state.rng, state.center, state.inv_cov, state.mean_vector)
            jax.block_until_ready(s)
        t0 = time.perf_counter()
        s, _ = trainer._score_many(
            state.params, state.batch_stats, trainer.train_data, idx,
            state.rng, state.center, state.inv_cov, state.mean_vector)
        jax.block_until_ready(s)
        dt = time.perf_counter() - t0
        print(f"B={b:6d} k={k:3d}  {total / dt:10,.0f} w/s  "
              f"{1e3 * dt / k:7.3f} ms/batch  total {dt * 1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
