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
    _gather_rows_pad,
    _level_views,
    _wob_local,
    bin_samples,
)
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
    dest, perm, tob = jax.jit(bin_samples, static_argnames=("block",))(x, block=BLOCK)
    M_pad = perm.shape[0]
    xyz = _gather_rows_pad(x.T, perm)
    valid = (perm < M).astype(jnp.float32)[:, None]
    xyz8 = jnp.concatenate(
        [xyz, valid, jnp.zeros((M_pad, 4), jnp.float32)], axis=1
    ).T  # [8, M_pad]
    wob = _wob_local(spec, tob)  # [NB, L]
    g_sorted = jax.random.normal(k3, (L * C, M_pad))
    jax.block_until_ready((xyz8, wob, g_sorted))
    print(f"M_pad={M_pad} NB={M_pad // BLOCK}")

    for name, mxu_f32 in (("f32", True), ("bf16", False)):
        mxu_dtype = jnp.float32 if mxu_f32 else jnp.bfloat16

        @jax.jit
        def kfwd(salt):
            x2 = xyz8.at[4, :].set(salt)  # input varies per call
            out = _fwd_pallas(
                spec, x2, wob, _level_views(spec, win_tab), block=BLOCK,
                mxu_dtype=mxu_dtype, interpret=False,
            )
            return out, salt + 1.0

        t = timeit(kfwd)
        print(f"fwd kernel only ({name}):  {t*1e3:8.2f} ms")

        @jax.jit
        def kbwd(salt):
            x2 = xyz8.at[4, :].set(salt)
            out = _bwd_pallas(
                spec, x2, wob, g_sorted + salt, block=BLOCK, mxu_dtype=mxu_dtype,
                interpret=False,
            )
            return out, salt + 1.0

        t = timeit(kbwd)
        print(f"bwd kernel (+zero-mask) ({name}): {t*1e3:8.2f} ms")

    @jax.jit
    def glue_bin(salt):
        xs = (x + salt * 1e-6) % 1.0
        dest, perm, tob = bin_samples(xs, block=BLOCK)
        return (dest, perm, tob), salt + 1.0

    t = timeit(glue_bin)
    print(f"bin_samples (full out): {t*1e3:8.2f} ms")

    feats = jnp.zeros((M_pad, L * C))

    @jax.jit
    def glue_gathers(salt):
        xs = (x + salt * 1e-6) % 1.0
        xyzg = _gather_rows_pad(xs.T, perm)
        out = jnp.take(feats + salt, dest, axis=0).T
        return (xyzg, out), salt + 1.0

    t = timeit(glue_gathers)
    print(f"gather+unsort:          {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
