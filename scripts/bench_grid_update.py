"""Stage breakdown of the partial density-grid update (the hidden 11.6 ms/step
at bench shapes: 186 ms every 16 steps).

Pieces timed separately at H=128 (H3=2M, N=H3/4 queries x2):
  - density query of 2N jittered points (encoder fwd + sigma MLP)
  - occupied-resample searchsorted (inverse CDF, 21 gather rounds x N)
  - tmp scatter (.at[].set 2N) vs Pallas lane-packed scatter_set_flat
  - EMA/packbits epilogue
  - full update_density_grid partial (resample) and slab modes

    python scripts/bench_grid_update.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tngp.models import NGPNetwork
from tngp.render import FieldFns, create, update_density_grid
from tngp.render.occupancy import _cells_to_world_cf, _chunked_density
from tngp.kernels.scatter import scatter_set_flat

H = 128
H3 = H**3
N = H3 // 4
ITERS = 10


def timeit(fn, iters=ITERS, warmup=2):
    salt = jnp.float32(0.0)
    for _ in range(warmup):
        out, salt = fn(salt)
    jax.block_until_ready((out, salt))
    t0 = time.perf_counter()
    for _ in range(iters):
        out, salt = fn(salt)
    jax.block_until_ready((out, salt))
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                       encoding="hashgrid_window")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                        jnp.ones((8, 3)) / np.sqrt(3))
    field = FieldFns.from_model(model)
    grid = create(1, H)
    # a mixed occupancy pattern (~10%) for the CDF stages
    key = jax.random.PRNGKey(1)
    dens = jnp.where(jax.random.uniform(key, (1, H3)) < 0.1,
                     jax.random.uniform(key, (1, H3)) * 20.0, 0.0)
    grid = grid.replace(density_grid=dens)

    # --- density query of 2N points -----------------------------------------
    @jax.jit
    def q_density(salt):
        k = jax.random.fold_in(jax.random.PRNGKey(2), salt.astype(jnp.int32))
        idx = jax.random.randint(k, (2 * N,), 0, H3)
        coords = jnp.stack([idx // (H * H), (idx // H) % H, idx % H], axis=-1)
        jit2 = jax.random.uniform(k, (2 * N, 3), minval=-1., maxval=1.)
        xyz = _cells_to_world_cf(coords, 0, 1.0, H, jit2.T)
        sig = _chunked_density(field.density, params, xyz, 2**17)
        return sig, salt + 1.0

    print(f"density query 2N=1M:    {timeit(q_density)*1e3:8.2f} ms")

    # --- searchsorted occupied resample --------------------------------------
    @jax.jit
    def q_cdf(salt):
        k = jax.random.fold_in(jax.random.PRNGKey(3), salt.astype(jnp.int32))
        occ = (grid.density_grid[0] > 0).astype(jnp.float32)
        cdf = jnp.cumsum(occ)
        total = cdf[-1]
        u = jax.random.uniform(k, (N,)) * jnp.maximum(total, 1.0)
        occ_idx = jnp.clip(jnp.searchsorted(cdf, u, side="left"), 0, H3 - 1)
        return occ_idx, salt + 1.0

    print(f"occ inverse-CDF (N):    {timeit(q_cdf)*1e3:8.2f} ms")

    # --- scatter set: XLA vs Pallas ------------------------------------------
    k = jax.random.PRNGKey(4)
    idx0 = jax.random.randint(k, (2 * N,), 0, H3)
    val0 = jax.random.uniform(k, (2 * N,))

    @jax.jit
    def sc_xla(salt):
        v = val0 + salt * 1e-9
        out = jnp.full((H3,), -1.0).at[idx0].set(v)
        return out, salt + 1.0

    print(f"tmp scatter XLA set:    {timeit(sc_xla)*1e3:8.2f} ms")

    @jax.jit
    def sc_pallas(salt):
        v = val0 + salt * 1e-9
        out = scatter_set_flat(idx0, v, H3)
        return out, salt + 1.0

    t = timeit(sc_pallas)
    # parity while we're here
    a = np.asarray(sc_pallas(jnp.float32(0.0))[0])
    b = np.asarray(sc_xla(jnp.float32(0.0))[0])
    mism = int((a != b).sum())
    print(f"tmp scatter Pallas set: {t*1e3:8.2f} ms   (vs XLA mismatches: {mism})")

    # --- full partial updates -------------------------------------------------
    for mode in ("resample", "slab"):
        def upd(salt, mode=mode):
            g2 = update_density_grid(
                grid, params,
                jax.random.fold_in(jax.random.PRNGKey(5), salt.astype(jnp.int32)),
                density_fn=field.density, bound=1.0, grid_size=H,
                density_thresh=10.0, full=False, partial_mode=mode)
            return g2.bitfield, salt + 1.0

        print(f"partial update ({mode:8s}): {timeit(upd)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
