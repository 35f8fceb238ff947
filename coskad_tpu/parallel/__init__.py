from .mesh import (batch_sharding, create_mesh, initialize_distributed,
                   replicate, shard_params)

__all__ = ["batch_sharding", "create_mesh", "initialize_distributed",
           "replicate", "shard_params"]
