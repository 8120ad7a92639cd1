"""Device mesh + sharding rules.

The reference's distributed story is DDP+NCCL bolted into the Trainer
(nerf/utils.py:325-327, 1104-1119 — see SURVEY.md §2.3).  The TPU-native
equivalent: a `Mesh(('data', 'model'))`,

  * rays (the batch axis) sharded over 'data'  — pure data parallelism; ray
    independence makes this exact, gradients all-reduce over ICI implicitly
    via XLA SPMD;
  * the hash-table rows optionally sharded over 'model' — each chip owns a
    shard of the embedding table; XLA turns the encoder gathers into
    all-gather/all-to-all collectives and the scatter-add gradient stays
    shard-local + reduce-scattered.

Everything else (tiny MLPs, occupancy grid) is replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults: all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def param_sharding_rules(mesh: Mesh, shard_table: bool = True):
    """Path-aware sharding assignment for a model param pytree (and any pytree
    mirroring it, e.g. adam mu/nu): hash-table rows over 'model', rest replicated."""

    def assign(path, leaf):
        is_table = any(
            getattr(p, "key", None) == "embeddings" or getattr(p, "name", None) == "embeddings"
            for p in path
        )
        if shard_table and is_table and leaf.ndim >= 1 and leaf.shape[0] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P("model", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return assign


def shard_params(params, mesh: Mesh, shard_table: bool = True):
    assign = param_sharding_rules(mesh, shard_table)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, assign(path, leaf)), params
    )


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Rays shard along 'data' (and ride 'model' too when it exists — every
    chip should march rays; the table collectives happen inside the encoder)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
