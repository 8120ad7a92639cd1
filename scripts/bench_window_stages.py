"""Stage-level microbench of the binned window encoder: kernel-only vs glue.

JAX_COMPILATION_CACHE_DIR=/root/.jax_cache PYTHONPATH=/root/repo \
    python scripts/bench_window_stages.py

Every step threads a salt through its inputs and returns it incremented —
the axon tunnel memoizes identical-input executions (CLAUDE.md), so repeated
calls MUST differ.
"""

import time

import jax
import jax.numpy as jnp

from tngp.kernels.window_encoder import (
    _bwd_pallas,
    _fwd_pallas,
    _level_views,
    _wob_local,
    bin_dest,
    bin_dest_pallas,
    padded_size,
)
from tngp.kernels.scatter import scatter_add_auto
from tngp.ops.window_table import WindowSpec

M = 131072
BLOCK = 512
ITERS = 10


def timeit(step, iters=ITERS, warmup=2):
    salt = jnp.float32(0.0)
    for _ in range(warmup):
        out, salt = step(salt)
    jax.block_until_ready((out, salt))
    t0 = time.perf_counter()
    for _ in range(iters):
        out, salt = step(salt)
    jax.block_until_ready((out, salt))
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    spec = WindowSpec.create(desired_resolution=2048)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (3, M))
    win_tab = spec.init_table_win(k2)  # window-layout parameter (kernel native)
    L, C = spec.num_levels, spec.level_dim

    # prebuild sorted inputs once
    dest, tob = jax.jit(bin_dest, static_argnames=("block",))(x, block=BLOCK)
    M_pad = padded_size(M, BLOCK)
    payload = jnp.concatenate([x, jnp.ones((1, M), jnp.float32)], axis=0).T
    xyz4 = scatter_add_auto(dest, payload, M_pad)
    xyz8 = jnp.concatenate(
        [xyz4.T, jnp.zeros((4, M_pad), jnp.float32)], axis=0
    )  # [8, M_pad]
    wob = _wob_local(spec, tob)  # [L, NB]
    g_sorted = jax.random.normal(k3, (L * C, M_pad))
    jax.block_until_ready((xyz8, wob, g_sorted))
    print(f"M_pad={M_pad} NB={M_pad // BLOCK}")

    for name, mxu_f32, swap in (
        ("f32", True, False), ("bf16", False, False), ("bf16+swap", False, True),
    ):
        mxu_dtype = jnp.float32 if mxu_f32 else jnp.bfloat16

        @jax.jit
        def kfwd(salt, swap=swap):
            x2 = xyz8.at[4, :].set(salt)  # input varies per call
            out = _fwd_pallas(
                spec, x2, wob, _level_views(spec, win_tab), block=BLOCK,
                mxu_dtype=mxu_dtype, interpret=False, swap_select=swap,
            )
            return out, salt + 1.0

        t = timeit(kfwd)
        print(f"fwd kernel only ({name}):  {t*1e3:8.2f} ms")

        @jax.jit
        def kbwd(salt, swap=swap):
            x2 = xyz8.at[4, :].set(salt)
            out = _bwd_pallas(
                spec, x2, wob, g_sorted + salt, block=BLOCK, mxu_dtype=mxu_dtype,
                interpret=False, swap_select=swap,
            )
            return out, salt + 1.0

        t = timeit(kbwd)
        print(f"bwd kernel (+zero-mask) ({name}): {t*1e3:8.2f} ms")

    @jax.jit
    def glue_bin(salt):
        xs = (x + salt * 1e-6) % 1.0
        dest, tob = bin_dest(xs, block=BLOCK)
        return (dest, tob), salt + 1.0

    t = timeit(glue_bin)
    print(f"bin_dest (ranks only):  {t*1e3:8.2f} ms")

    @jax.jit
    def glue_bin_k(salt):
        xs = (x + salt * 1e-6) % 1.0
        dest, tob = bin_dest_pallas(xs, block=BLOCK)
        return (dest, tob), salt + 1.0

    t = timeit(glue_bin_k)
    print(f"bin_dest_pallas:        {t*1e3:8.2f} ms")

    @jax.jit
    def glue_sort(salt):
        xs = (x + salt * 1e-6) % 1.0
        p = jnp.concatenate([xs, jnp.ones((1, M), jnp.float32)], axis=0).T
        return scatter_add_auto(dest, p, M_pad), salt + 1.0

    t = timeit(glue_sort)
    print(f"payload scatter-sort:   {t*1e3:8.2f} ms")

    feats = jnp.zeros((M_pad, L * C))

    @jax.jit
    def glue_unsort(salt):
        out = jnp.take(feats + salt, dest, axis=0).T
        return out, salt + 1.0

    t = timeit(glue_unsort)
    print(f"unsort gather:          {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
