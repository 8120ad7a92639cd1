"""Stage-level profile of the flagship train step (the bench.py workload).

JAX_COMPILATION_CACHE_DIR=/root/.jax_cache PYTHONPATH=/root/repo \
    python scripts/bench_train_stages.py

Times, at the bench config (4096 rays, K=128, compact_fraction=0.25 ->
M=131072 samples):
  - march (flat vs grouped)
  - compaction (mask + gathers)
  - field fwd+bwd at M (encoder + MLPs + SH, via value_and_grad)
  - composite fwd+bwd
  - full train step (loss fwd+bwd + adam)

Iterations are chained through a salt (axon memoizes identical-input runs)
and full results are blocked on (CLAUDE.md benchmarking traps).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tngp.data import make_synthetic_dataset, sample_rays
from tngp.models import NGPNetwork
from tngp.ops import march_rays, near_far_from_aabb
from tngp.ops.composite import composite_rays_cf
from tngp.render import (
    FieldFns,
    RenderConfig,
    create,
    mark_untrained_grid,
    render_rays_train,
    update_density_grid,
)

N_RAYS = 4096
ITERS = 20


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
    encoding = os.environ.get("TNGP_BENCH_ENCODING", "hashgrid_window")
    print("encoding:", encoding)
    ds = make_synthetic_dataset(n_frames=12, H=128, W=128, seed=0)
    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16, encoding=encoding)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / np.sqrt(3))
    field = FieldFns.from_model(model)
    cfg = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128, min_near=0.05,
                       compact_fraction=0.25, density_thresh=1.0, march_dense=True)

    grid = create(cfg.cascades, cfg.grid_size)
    grid = mark_untrained_grid(
        grid, jnp.asarray(ds.poses), jnp.asarray(ds.intrinsics),
        bound=cfg.bound, grid_size=cfg.grid_size,
    )
    poses = jnp.asarray(ds.poses)
    images = jnp.asarray(ds.images)
    intr = jnp.asarray(ds.intrinsics)
    H, W, nF = ds.H, ds.W, ds.poses.shape[0]

    tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)

    # densify the grid so the workload is realistic (a few train steps)
    def loss_fn(p, k, bitfield, dgrid, group):
        k1, k2, k3 = jax.random.split(k, 3)
        idx = jax.random.randint(k1, (), 0, nF)
        r = sample_rays(k2, poses[idx], intr, H, W, N_RAYS)
        gt = images[idx].reshape(-1, 3)[r["inds"]]
        c = cfg if group == 0 else RenderConfig(
            bound=1.0, grid_size=128, max_steps=512, K=128, min_near=0.05,
            compact_fraction=0.25, density_thresh=1.0, march_group=group)
        out = render_rays_train(field, p, r["rays_o"], r["rays_d"], bitfield, c,
                                key=k3, dilated_grid=dgrid)
        per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)
        rm = out["ray_mask"].astype(jnp.float32)
        return (per_ray * rm).sum() / jnp.maximum(rm.sum(), 1.0)

    from tngp.render import dilated_chunk_grid

    dgrid_fn = jax.jit(lambda bf: dilated_chunk_grid(bf, cfg))

    @jax.jit
    def train_step(p, o, k, bitfield, dgrid):
        l, g = jax.value_and_grad(loss_fn)(p, k, bitfield, dgrid, 0)
        upd, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o2, l

    k = jax.random.PRNGKey(1)
    dgrid = dgrid_fn(grid.bitfield)
    for step in range(48):
        if step % 16 == 0:
            k, kk = jax.random.split(k)
            grid = update_density_grid(
                grid, params, kk, density_fn=field.density, bound=cfg.bound,
                grid_size=cfg.grid_size, density_thresh=cfg.density_thresh,
                full=(step < 32))
            dgrid = dgrid_fn(grid.bitfield)
        k, kk = jax.random.split(k)
        params, opt_state, loss = train_step(params, opt_state, kk,
                                             grid.bitfield, dgrid)
    jax.block_until_ready(loss)
    print("warmed up; profiling...")
    bitfield = grid.bitfield

    # fixed ray batch for the stage timings
    r = sample_rays(jax.random.PRNGKey(7), poses[0], intr, H, W, N_RAYS)
    rays_o, rays_d = r["rays_o"], r["rays_d"]
    nears, fars = near_far_from_aabb(rays_o, rays_d, cfg.aabb, cfg.min_near)
    M_budget = 131072

    # --- full step ---------------------------------------------------------
    def full_step(salt):
        k = jax.random.fold_in(jax.random.PRNGKey(3), salt.astype(jnp.int32))
        p2, o2, l = train_step(params, opt_state, k, bitfield, dgrid)
        return l, salt + 1.0

    print(f"full train step:        {timeit(full_step)*1e3:8.2f} ms")

    # --- march (flat vs grouped) ------------------------------------------
    for group in (0, 8, 16):
        @jax.jit
        def march_only(salt):
            noise = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(5), salt.astype(jnp.int32)),
                (N_RAYS,))
            res = march_rays(
                rays_o, rays_d, nears, fars, bitfield,
                bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
                dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps, K=cfg.K,
                noise=noise, group=group)
            return (res.xyzs_cf, res.mask, res.counts), salt + 1.0

        print(f"march (group={group:2d}):        {timeit(march_only)*1e3:8.2f} ms")

    # --- stream-path cumulative stages (the actual train structure) --------
    from tngp.ops import ladder_samples, march_rays_stream
    from tngp.ops.compaction import compact_mask_hier, ray_in_budget_from_counts
    from tngp.ops.composite import composite_stream

    mkw = dict(
        bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
        dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps,
    )

    def stream_march(salt):
        noise = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(5), salt.astype(jnp.int32)),
            (N_RAYS,))
        return march_rays_stream(
            rays_o, rays_d, nears, fars, bitfield, noise=noise, **mkw)

    @jax.jit
    def s_march(salt):
        res = stream_march(salt)
        return (res.mask, res.counts, res.t0), salt + 1.0

    print(f"stream march only:      {timeit(s_march)*1e3:8.2f} ms")

    @jax.jit
    def s_compact(salt):
        res = stream_march(salt)
        comp = compact_mask_hier(res.mask, M_budget)
        ray_id, x_c, d_c, dt_c, t_rel = ladder_samples(
            comp.sel, rays_o, rays_d, res.t0, **mkw)
        rib = ray_in_budget_from_counts(res.counts, comp.m_eff)
        return (x_c, d_c, dt_c, t_rel, ray_id, comp.sel_valid, rib), salt + 1.0

    print(f"+ compact/ladder:       {timeit(s_compact)*1e3:8.2f} ms")

    @jax.jit
    def s_field(salt):
        (x_c, d_c, dt_c, t_rel, ray_id, sv, rib), _ = s_compact.__wrapped__(salt)
        sig, rgb = field.sigma_rgb(params, x_c, d_c)
        return (sig, rgb, dt_c, t_rel, ray_id, sv, rib), salt + 1.0

    print(f"+ field fwd:            {timeit(s_field)*1e3:8.2f} ms")

    @jax.jit
    def s_composite(salt):
        (sig, rgb, dt_c, t_rel, ray_id, sv, rib), _ = s_field.__wrapped__(salt)
        ws, depth, image = composite_stream(
            sig.astype(jnp.float32), rgb, dt_c, None, ray_id,
            sv, N_RAYS, cfg.T_thresh, t_cum=t_rel)
        return (ws, depth, image, rib), salt + 1.0

    print(f"+ stream composite:     {timeit(s_composite)*1e3:8.2f} ms")

    # --- chunked-path cumulative stages (the actual round-2c hot path) -----
    from tngp.ops.march import march_rays_chunked

    def chunk_march(salt):
        noise = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(5), salt.astype(jnp.int32)),
            (N_RAYS,))
        return march_rays_chunked(
            rays_o, rays_d, nears, fars, bitfield, noise=noise,
            M_budget=M_budget, G=8, dilated_grid=dgrid, **mkw)

    @jax.jit
    def c_march(salt):
        cm = chunk_march(salt)
        return (cm.sel, cm.sel_valid, cm.t0, cm.ray_mask, cm.num_points), salt + 1.0

    print(f"chunked march only:     {timeit(c_march)*1e3:8.2f} ms")

    @jax.jit
    def c_ladder(salt):
        cm = chunk_march(salt)
        ray_id, x_c, d_c, dt_c, t_rel = ladder_samples(
            cm.sel, rays_o, rays_d, cm.t0, **mkw)
        return (x_c, d_c, dt_c, t_rel, ray_id, cm.sel_valid), salt + 1.0

    print(f"+ ladder samples:       {timeit(c_ladder)*1e3:8.2f} ms")

    @jax.jit
    def c_field(salt):
        (x_c, d_c, dt_c, t_rel, ray_id, sv), _ = c_ladder.__wrapped__(salt)
        sig, rgb = field.sigma_rgb(params, x_c, d_c)
        return (sig, rgb, dt_c, t_rel, ray_id, sv), salt + 1.0

    print(f"+ field fwd:            {timeit(c_field)*1e3:8.2f} ms")

    @jax.jit
    def c_composite(salt):
        (sig, rgb, dt_c, t_rel, ray_id, sv), _ = c_field.__wrapped__(salt)
        ws, depth, image = composite_stream(
            sig.astype(jnp.float32), rgb, dt_c, None, ray_id,
            sv, N_RAYS, cfg.T_thresh, t_cum=t_rel)
        return (ws, depth, image), salt + 1.0

    print(f"+ stream composite:     {timeit(c_composite)*1e3:8.2f} ms")

    # --- backward attribution: cumulative value_and_grad stages -------------
    @jax.jit
    def c_field_vag(salt):
        def scalar_of_field(p):
            cm = chunk_march(salt)
            ray_id2, x_c, d_c, dt2, tr2 = ladder_samples(
                cm.sel, rays_o, rays_d, cm.t0, **mkw)
            s2, r2 = field.sigma_rgb(p, x_c, d_c)
            return jnp.sum(s2 * dt2) + jnp.sum(r2 * r2)

        l, g = jax.value_and_grad(scalar_of_field)(params)
        return (l, g), salt + 1.0

    print(f"march+field fwd+bwd:    {timeit(c_field_vag)*1e3:8.2f} ms")

    @jax.jit
    def c_comp_vag(salt):
        def scalar_of_comp(p):
            cm = chunk_march(salt)
            ray_id, x_c, d_c, dt_c, t_rel = ladder_samples(
                cm.sel, rays_o, rays_d, cm.t0, **mkw)
            sig, rgb = field.sigma_rgb(p, x_c, d_c)
            ws, depth, image = composite_stream(
                sig.astype(jnp.float32), rgb, dt_c, None, ray_id,
                cm.sel_valid, N_RAYS, cfg.T_thresh, t_cum=t_rel)
            return jnp.sum(image * image) + jnp.sum(ws)

        l, g = jax.value_and_grad(scalar_of_comp)(params)
        return (l, g), salt + 1.0

    print(f"+composite fwd+bwd:     {timeit(c_comp_vag)*1e3:8.2f} ms")

    # --- loss fwd+bwd only (no optimizer) and optimizer-only ----------------
    @jax.jit
    def s_fwd_only(salt):
        k = jax.random.fold_in(jax.random.PRNGKey(3), salt.astype(jnp.int32))
        l = loss_fn(params, k, bitfield, dgrid, 0)
        return l, salt + 1.0

    print(f"loss fwd only:          {timeit(s_fwd_only)*1e3:8.2f} ms")

    @jax.jit
    def s_fwd_bwd(salt):
        k = jax.random.fold_in(jax.random.PRNGKey(3), salt.astype(jnp.int32))
        l, g = jax.value_and_grad(loss_fn)(params, k, bitfield, dgrid, 0)
        return (l, g), salt + 1.0

    print(f"loss fwd+bwd only:      {timeit(s_fwd_bwd)*1e3:8.2f} ms")

    grads0 = jax.jit(
        lambda: jax.grad(loss_fn)(params, jax.random.PRNGKey(3), bitfield, dgrid, 0)
    )()
    jax.block_until_ready(grads0)

    @jax.jit
    def s_adam(salt):
        g2 = jax.tree_util.tree_map(lambda g: g + salt * 1e-12, grads0)
        upd, o2 = tx.update(g2, opt_state, params)
        p2 = optax.apply_updates(params, upd)
        return (p2, o2), salt + 1.0

    print(f"adam update only:       {timeit(s_adam)*1e3:8.2f} ms")

    # --- density-grid maintenance (runs every 16 steps in the train loop) ---
    def s_grid(salt):
        g2 = update_density_grid(
            grid, params, jax.random.fold_in(jax.random.PRNGKey(9),
                                             salt.astype(jnp.int32)),
            density_fn=field.density, bound=cfg.bound, grid_size=cfg.grid_size,
            density_thresh=cfg.density_thresh, full=False)
        return g2.bitfield, salt + 1.0

    print(f"grid update (partial):  {timeit(s_grid)*1e3:8.2f} ms (/16 steps)")

    # --- dilated-grid build (runs inside every chunked march) ---------------
    from tngp.ops.march import build_dilated_cell_grid

    @jax.jit
    def s_dilate(salt):
        bf2 = jnp.bitwise_xor(bitfield, salt.astype(jnp.uint8))
        return build_dilated_cell_grid(
            bf2, bound=cfg.bound, cascades=cfg.cascades,
            grid_size=cfg.grid_size, dilate=2), salt + 1.0

    print(f"dilated grid build:     {timeit(s_dilate)*1e3:8.2f} ms")

    # --- field fwd / fwd+bwd at M ------------------------------------------
    xs = jax.random.uniform(jax.random.PRNGKey(11), (3, M_budget),
                            minval=-1.0, maxval=1.0)
    ds_ = xs / jnp.linalg.norm(xs, axis=0, keepdims=True)

    @jax.jit
    def field_fwd(salt):
        x2 = (xs + salt * 1e-6).clip(-1, 1)
        sig, rgb = field.sigma_rgb(params, x2, ds_)
        return (sig, rgb), salt + 1.0

    print(f"field fwd (M=131K):     {timeit(field_fwd)*1e3:8.2f} ms")

    @jax.jit
    def field_fb(salt):
        x2 = (xs + salt * 1e-6).clip(-1, 1)

        def loss(p):
            sig, rgb = field.sigma_rgb(p, x2, ds_)
            return jnp.sum(rgb * x2) + jnp.sum(sig * x2[0])

        l, g = jax.value_and_grad(loss)(params)
        return (l, g), salt + 1.0

    print(f"field fwd+bwd (M=131K): {timeit(field_fb)*1e3:8.2f} ms")

    # --- composite fwd+bwd -------------------------------------------------
    sig_s = jax.random.uniform(jax.random.PRNGKey(13), (N_RAYS, cfg.K)) * 5
    rgb_s = jax.random.uniform(jax.random.PRNGKey(17), (3, N_RAYS, cfg.K))
    dts = jnp.full((N_RAYS, cfg.K), 0.01)
    mask = jnp.ones((N_RAYS, cfg.K), bool)

    @jax.jit
    def comp_fb(salt):
        def loss(s, r):
            ws, depth, image, _ = composite_rays_cf(
                s + salt * 1e-6, r, dts, dts, mask, cfg.T_thresh)
            return jnp.sum(image) + jnp.sum(ws) + jnp.sum(depth)

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(sig_s, rgb_s)
        return (l, g), salt + 1.0

    print(f"composite fwd+bwd:      {timeit(comp_fb)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
