from .distributed import global_mesh, init_distributed, is_primary
from .mesh import (
    data_parallel_value_and_grad,
    make_mesh,
    param_sharding_rules,
    ray_sharding,
    replicated,
    shard_params,
)

__all__ = [
    "data_parallel_value_and_grad",
    "global_mesh",
    "init_distributed",
    "is_primary",
    "make_mesh",
    "param_sharding_rules",
    "ray_sharding",
    "replicated",
    "shard_params",
]
