from .mesh import (
    make_mesh,
    param_sharding_rules,
    ray_sharding,
    replicated,
    shard_params,
)

__all__ = [
    "make_mesh",
    "param_sharding_rules",
    "ray_sharding",
    "replicated",
    "shard_params",
]
