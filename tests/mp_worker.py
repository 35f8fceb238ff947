"""Multi-process (multi-host simulation) worker: one rank of a 2-process run.

Spawned by tests/test_multiprocess.py with 4 virtual CPU devices per process
(8 global), wired through parallel/mesh.py::initialize_distributed — the
process boundary the reference crosses with Lightning DDP spawn
(train_COSKAD.py:75-78). Trains the flagship config for 2 epochs on a
deterministic synthetic dataset and (rank 0) dumps loss history + center +
val scores for equality checks against the single-process 8-device run.

Usage: python mp_worker.py <rank> <num_processes> <port> <out_json>
"""

import json
import os
import sys


def main():
    rank, nprocs, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from coskad_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=rank,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    import numpy as np

    from mp_scenario import run_scenario  # shared with the in-process baseline

    result = run_scenario()
    if rank == 0:
        with open(out, "w") as f:
            json.dump(result, f)
    # Block until every process is done before exiting (an early exit tears
    # down the gloo transport under rank 0's final collectives).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main()
