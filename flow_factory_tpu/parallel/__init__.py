from .dist import get_world_size, get_rank, is_distributed, host_allgather
from .mesh import MeshConfig, create_mesh, shard_params, shard_batch, param_sharding_rules

__all__ = [
    "get_world_size",
    "get_rank",
    "is_distributed",
    "host_allgather",
    "MeshConfig",
    "create_mesh",
    "shard_params",
    "shard_batch",
    "param_sharding_rules",
]
