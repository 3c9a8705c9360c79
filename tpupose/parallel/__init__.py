from tpupose.parallel.mesh import (
    MeshManager, create_mesh, batch_sharding, replicated_sharding,
    shard_batch, setup_distributed, is_master,
)

__all__ = [
    "MeshManager", "create_mesh", "batch_sharding", "replicated_sharding",
    "shard_batch", "setup_distributed", "is_master",
]
