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
        # 4-D tables are the window layout [NW, C, 128, 64] consumed by the
        # Pallas binned kernels, whose scalar-prefetched window-id maps are
        # global — those replicate (the reference's DDP table semantics,
        # nerf/utils.py:325-327); only the canonical 2-D [rows, C] golden
        # table shards row-wise over 'model'.
        if (shard_table and is_table and leaf.ndim == 2
                and leaf.shape[0] % mesh.shape["model"] == 0):
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


def data_parallel_value_and_grad(loss_fn, mesh: Mesh, n_batch_args: int):
    """shard_map data parallelism for loss fns whose non-param args shard on
    the ray (leading) axis.

    `loss_fn(params, *batch, *rest) -> scalar` is traced PER SHARD: each
    device sees its local rays only, so Pallas kernels (the binned window
    encoder) execute on local shapes instead of hitting XLA's
    no-SPMD-partitioning-of-custom-calls wall.  The first `n_batch_args`
    args after params shard over 'data'; any remaining args replicate
    (occupancy bitfields, dilated grids).  Loss and grads are pmean'd over
    'data' — exact vs the single-device mean loss when shards are equal
    size (they are: shapes are static).  The sample-budget compaction
    becomes per-shard (M_local = fraction * N_local * K), which is the
    intended multi-chip semantics: budgets are per-chip, no cross-chip
    sample exchange.
    """
    import jax.numpy as jnp  # noqa: F401  (kept local: mesh.py stays light)

    def sharded(params, *args):
        batch, rest = args[:n_batch_args], args[n_batch_args:]

        def per_shard(p, *a):
            loss, grads = jax.value_and_grad(loss_fn)(p, *a)
            loss = jax.lax.pmean(loss, "data")
            grads = jax.lax.pmean(grads, "data")
            return loss, grads

        fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(),) + (P("data"),) * len(batch) + (P(),) * len(rest),
            out_specs=(P(), P()),
            # pallas_call can't annotate varying-mesh-axes on its outputs, so
            # the vma replication checker must be off; the pmean above is what
            # actually makes loss/grads replicated
            check_vma=False,
        )
        return fn(params, *batch, *rest)

    return sharded
