from .mesh import (MeshConfig, batch_sharding, make_mesh,  # noqa: F401
                   replicated, shard_batch, shard_params)
