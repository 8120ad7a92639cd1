from .distributed import global_mesh, init_distributed, is_primary
from .mesh import (
    make_mesh,
    param_sharding_rules,
    ray_sharding,
    replicated,
    shard_params,
)

__all__ = [
    "global_mesh",
    "init_distributed",
    "is_primary",
    "make_mesh",
    "param_sharding_rules",
    "ray_sharding",
    "replicated",
    "shard_params",
]
