"""Profile the REAL bench train step (Trainer._train_epoch over the store
pipeline) and print the per-kernel device table — decomposes the gap
between the whole step (~8 ms) and the bare XLA encode fwd+bwd (~5 ms).

    python scripts/profile_step.py [store|windows] [bfloat16|float32] [variant]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from profile_fused import parse_trace  # noqa: E402

import bench  # noqa: E402


def main():
    pipeline = sys.argv[1] if len(sys.argv) > 1 else "store"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    variant = sys.argv[3] if len(sys.argv) > 3 else "euclidean_static"
    from coskad_tpu.config import (Config, DataConfig, ModelConfig,
                                   OptConfig, RunConfig)
    from coskad_tpu.parallel import create_mesh
    from coskad_tpu.train.loop import Trainer

    cfg = Config(
        model=ModelConfig(variant=variant,
                          channels=bench.CHANNELS, h_dim=bench.H_DIM,
                          latent_dim=bench.LATENT),
        data=DataConfig(seg_len=bench.T, batch_size=bench.BATCH,
                        num_transform=5, n_joints_override=bench.V),
        opt=OptConfig(lr=1e-4),
        run=RunConfig(compute_dtype=dtype),
    )
    ds = bench._bench_dataset(pipeline)
    mesh = create_mesh()
    trainer = Trainer(cfg, ds, mesh=mesh)
    state = trainer.init_state()
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, "data"))
    perm = np.random.default_rng(1).permutation(len(ds))
    idx = jax.device_put(
        jnp.asarray(perm[: 10 * bench.BATCH].reshape(10, bench.BATCH)), sh)

    state, m = trainer._train_epoch(state, trainer.train_data, idx)
    jax.block_until_ready(m["loss"])
    log_dir = f"/tmp/step_trace_{pipeline}_{dtype}_{variant}"
    jax.profiler.start_trace(log_dir)
    state, m = trainer._train_epoch(state, trainer.train_data, idx)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()
    time.sleep(1)
    print(f"trace in {log_dir} (10 steps at B={bench.BATCH})")
    parse_trace(log_dir)


if __name__ == "__main__":
    main()
