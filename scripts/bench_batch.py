"""Ray-batch scaling sweep on the real chip: rays/s at N = 4K..32K.

The V100 reference runs 4096 rays/iter (readme.md:211); on TPU the step has
fixed-cost structure (compile-scheduled fusions, marcher coarse stage, glue)
that amortizes with batch size, and the MXU window encoder prefers bigger
sample batches.  This sweep measures steady-state training throughput per
batch size with the demand-adapted budget tier (see bench.py), and renders a
quality sanity PSNR after each short run so a faster config can't silently
be a worse-training one.

JAX_COMPILATION_CACHE_DIR=/root/.jax_cache PYTHONPATH=/root/repo \
    python scripts/bench_batch.py [N ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tngp.data import make_synthetic_dataset, sample_rays
from tngp.models import NGPNetwork
from tngp.render import (
    FieldFns,
    RenderConfig,
    create,
    dilated_chunk_grid,
    mark_untrained_grid,
    render_rays_train,
    update_density_grid,
)

BASELINE_RAYS_PER_S = 97 * 4096


def run_one(N_RAYS: int, ds, warm_steps=64, timed_steps=60):
    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                       encoding="hashgrid_window")
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / np.sqrt(3))
    field = FieldFns.from_model(model)
    cfg = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128,
                       min_near=0.05, compact_fraction=0.25,
                       density_thresh=1.0, march_dense=True, march_group=16)

    grid = create(cfg.cascades, cfg.grid_size)
    grid = mark_untrained_grid(
        grid, jnp.asarray(ds.poses), jnp.asarray(ds.intrinsics),
        bound=cfg.bound, grid_size=cfg.grid_size)
    poses = jnp.asarray(ds.poses)
    images = jnp.asarray(ds.images)
    intr = jnp.asarray(ds.intrinsics)
    H, W, nF = ds.H, ds.W, ds.poses.shape[0]

    tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)

    TIER_FRACS = (cfg.compact_fraction / 4, cfg.compact_fraction / 2,
                  cfg.compact_fraction)
    TIER_M = [max(128, -(-int(N_RAYS * cfg.K * f) // 128) * 128)
              for f in TIER_FRACS]
    step_fns = {}

    def get_step(t):
        if t not in step_fns:
            cfg_t = dataclasses.replace(cfg, compact_fraction=TIER_FRACS[t])

            def loss_fn(p, k, bitfield, dgrid):
                k1, k2, k3 = jax.random.split(k, 3)
                idx = jax.random.randint(k1, (), 0, nF)
                r = sample_rays(k2, poses[idx], intr, H, W, N_RAYS)
                gt = images[idx].reshape(-1, 3)[r["inds"]]
                out = render_rays_train(
                    field, p, r["rays_o"], r["rays_d"], bitfield, cfg_t, key=k3,
                    dilated_grid=dgrid)
                per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)
                rm = out["ray_mask"].astype(jnp.float32)
                loss = (per_ray * rm).sum() / jnp.maximum(rm.sum(), 1.0)
                return loss, (out["num_points"], rm.sum())

            @jax.jit
            def train_step(p, o, k, bitfield, dgrid):
                (l, (npts, kept)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, k, bitfield, dgrid)
                upd, o2 = tx.update(g, o, p)
                return optax.apply_updates(p, upd), o2, l, npts, kept

            step_fns[t] = train_step
        return step_fns[t]

    def adapt(t, npts, kept):
        demand, kf = float(npts), float(kept) / N_RAYS
        if kf < 0.98 and t < len(TIER_FRACS) - 1:
            return t + 1
        if t > 0 and demand * 1.6 < TIER_M[t - 1]:
            return t - 1
        return t

    def grid_update(g, p, k, full):
        return update_density_grid(
            g, p, k, density_fn=field.density, bound=cfg.bound,
            grid_size=cfg.grid_size, density_thresh=cfg.density_thresh,
            full=full)

    tier = len(TIER_FRACS) - 1
    dgrid_fn = jax.jit(lambda bf: dilated_chunk_grid(bf, cfg))
    k = jax.random.PRNGKey(1)
    npts = kept = None
    t_c0 = time.time()
    dgrid = dgrid_fn(grid.bitfield)
    for step in range(warm_steps):
        if step % 16 == 0:
            if npts is not None:
                tier = adapt(tier, npts, kept)
            k, kk = jax.random.split(k)
            grid = grid_update(grid, params, kk, full=(step < 32))
            dgrid = dgrid_fn(grid.bitfield)
            jax.block_until_ready(grid.bitfield)
        k, kk = jax.random.split(k)
        params, opt_state, loss, npts, kept = get_step(tier)(
            params, opt_state, kk, grid.bitfield, dgrid)
    jax.block_until_ready(loss)
    print(f"  [N={N_RAYS}] warmup {time.time()-t_c0:.1f}s tier M={TIER_M[tier]}"
          f" demand={int(npts)}", flush=True)

    t0 = time.time()
    for step in range(timed_steps):
        if step % 16 == 0:
            t_new = adapt(tier, npts, kept)
            if t_new in step_fns:
                tier = t_new
            k, kk = jax.random.split(k)
            grid = grid_update(grid, params, kk, full=False)
            dgrid = dgrid_fn(grid.bitfield)
        k, kk = jax.random.split(k)
        params, opt_state, loss, npts, kept = get_step(tier)(
            params, opt_state, kk, grid.bitfield, dgrid)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    rays_s = timed_steps * N_RAYS / dt
    ms = dt / timed_steps * 1e3
    print(f"  [N={N_RAYS}] {ms:7.2f} ms/step  {rays_s:12,.0f} rays/s  "
          f"(vs_baseline {rays_s / BASELINE_RAYS_PER_S:.3f}, tier M={TIER_M[tier]})",
          flush=True)
    return rays_s


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384, 32768]
    ds = make_synthetic_dataset(n_frames=12, H=128, W=128, seed=0)
    print("backend:", jax.default_backend(), flush=True)
    for n in batches:
        run_one(n, ds)


if __name__ == "__main__":
    main()
