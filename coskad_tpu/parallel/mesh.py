"""Device mesh + sharding layout for COSKAD-TPU.

The reference's only parallelism is DDP data parallelism over NCCL
(train_COSKAD.py:8,78; SURVEY.md section 2.8). The TPU-native equivalent is a
jax.sharding.Mesh with a 'data' axis (batch-sharded, gradient psum over ICI
inserted by XLA under jit) plus an optional 'model' axis sharding the
projector's wide dense layers (the dominant parameter block,
hidden*T*V x latent ~ 209k params) — tensor parallelism the reference never
had, exposed for scale-out.

Everything runs under plain `jax.jit` with NamedSharding annotations: global
semantics (sums over the batch are *global* sums), so the center
initialization/update is exact across shards — fixing the reference's
un-synchronized per-rank center quirk (SURVEY.md section 2.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Create a (data, model) mesh. data_parallel=-1 uses all devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel == -1:
        data_parallel = max(n // model_parallel, 1)
    assert data_parallel * model_parallel <= n, (
        f"mesh {data_parallel}x{model_parallel} needs more than {n} devices"
    )
    grid = mesh_utils.create_device_mesh(
        (data_parallel, model_parallel),
        devices=devices[: data_parallel * model_parallel],
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path_leaf_names, value) -> P:
    """Projector / wide dense kernels get model-sharded on their output dim;
    everything else is replicated (the GCN adjacencies and 1x1 convs are
    tiny)."""
    path = "/".join(path_leaf_names)
    if value.ndim == 2 and ("btlnk" in path or "rev_btlnk" in path):
        if "rev_btlnk" in path:
            # latent -> flat: shard the wide output dim
            return P(None, MODEL_AXIS)
        # flat -> latent: shard the wide input dim
        return P(MODEL_AXIS, None)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply the parameter layout: NamedSharding pytree matching `params`."""

    def to_sharding(path, value):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        return NamedSharding(mesh, _param_spec(names, value))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def device_put_params(params, mesh: Mesh):
    return jax.device_put(params, shard_params(params, mesh))


def device_put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicate(mesh))


def device_put_batch(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree
    )


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host initialization (DCN) for multi-slice / multi-host runs.

    The single-slice path needs nothing: the mesh code above is host-count
    agnostic and XLA routes the 'data'-axis collectives over ICI. Across
    hosts/slices, call this once per process before creating the mesh — it
    wraps jax.distributed.initialize, which wires the DCN coordinator and
    makes jax.devices() global (SURVEY.md section 2.8's multi-host note).
    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment variables (or TPU metadata on Cloud TPU).
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
