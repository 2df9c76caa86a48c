from .mesh import (create_mesh, shard_batch, replicate_tree,  # noqa: F401
                   batch_sharding, replicated_sharding)
