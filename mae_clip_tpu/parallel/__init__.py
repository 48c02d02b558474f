from mae_clip_tpu.parallel.mesh import (create_mesh, local_batch_size,
                                        mesh_from_config)
from mae_clip_tpu.parallel.sharding import (batch_sharding, param_shardings,
                                            replicate, shard_batch)

__all__ = [
    "create_mesh", "mesh_from_config", "local_batch_size",
    "batch_sharding", "param_shardings", "replicate", "shard_batch",
]
