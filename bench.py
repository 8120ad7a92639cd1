"""Benchmark entry point (run by the round driver on real TPU hardware).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: occupancy-grid NeRF training throughput in rays/s on a synthetic
blob scene (4096 rays/step, grid 128^3, K=128 sample budget — the instant-ngp
`-O` configuration).  Baseline: the reference's V100 number, 97 it/s at 4096
rays/iter = 397,312 rays/s (readme.md:211, BASELINE.md).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tngp.data import make_synthetic_dataset, sample_rays  # noqa: E402
from tngp.models import NGPNetwork  # noqa: E402
from tngp.render import (  # noqa: E402
    FieldFns,
    RenderConfig,
    create,
    dilated_chunk_grid,
    mark_untrained_grid,
    render_rays_train,
    update_density_grid,
)

BASELINE_RAYS_PER_S = 97 * 4096  # V100 reference
N_RAYS = 4096
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "synth_bench.npz")


def get_dataset():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        from tngp.data.provider import NeRFDataset

        return NeRFDataset(
            poses=z["poses"], intrinsics=z["intrinsics"], H=int(z["H"]), W=int(z["W"]),
            images=z["images"],
        )
    ds = make_synthetic_dataset(n_frames=12, H=128, W=128, seed=0)
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    np.savez_compressed(
        CACHE, poses=ds.poses, intrinsics=ds.intrinsics, H=ds.H, W=ds.W, images=ds.images
    )
    return ds


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    t_start = time.time()
    ds = get_dataset()
    log(f"dataset ready {time.time()-t_start:.1f}s")
    # hashgrid_window = binned Pallas MXU encoder (round-2 hot path);
    # TNGP_BENCH_ENCODING=hashgrid falls back to the golden round-1 path
    encoding = os.environ.get("TNGP_BENCH_ENCODING", "hashgrid_window")
    log(f"encoding: {encoding}")
    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16, encoding=encoding)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / np.sqrt(3))
    field = FieldFns.from_model(model)
    # density_thresh 1.0: the synthetic blob scene has soft gaussian shells —
    # the lego-style default (10) culls them and caps reconstruction quality
    # Flat dense march for training: the bench scene is dense (28% fine
    # occupancy) so grouped-budget marching truncates rays and costs PSNR;
    # march_dense skips the per-ray K slab entirely (the global M budget is
    # the only compaction), saving the ~68 ms binary-search/packed-gather.
    # march_group only affects the eval residual rounds here (train is
    # march_dense; the grouped march is exact under resume semantics)
    cfg = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128, min_near=0.05,
                       compact_fraction=0.25, density_thresh=1.0, march_dense=True,
                       march_group=16)

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

    # adaptive sample-budget tiers — the reference's running mean_count
    # allocation (raymarching.py:200-232): demand (valid samples/step) is read
    # once per grid-update interval and the budget drops to the smallest
    # precompiled tier with >=1.6x headroom, rising again the moment rays get
    # budget-dropped.  Steady state on this scene sits well below the
    # configured max (the grid sparsifies as training converges).
    import dataclasses

    TIER_FRACS = (cfg.compact_fraction / 4, cfg.compact_fraction / 2,
                  cfg.compact_fraction)
    TIER_M = [max(128, -(-int(N_RAYS * cfg.K * f) // 128) * 128) for f in TIER_FRACS]
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
                    dilated_grid=dgrid,
                )
                per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)
                rm = out["ray_mask"].astype(jnp.float32)
                loss = (per_ray * rm).sum() / jnp.maximum(rm.sum(), 1.0)
                return loss, (out["num_points"], rm.sum())

            @jax.jit
            def train_step(p, o, k, bitfield, dgrid):
                (l, (npts, kept)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    p, k, bitfield, dgrid
                )
                upd, o2 = tx.update(g, o, p)
                return optax.apply_updates(p, upd), o2, l, npts, kept

            step_fns[t] = train_step
        return step_fns[t]

    tier = len(TIER_FRACS) - 1  # start at the configured max

    def adapt_tier(t, npts, kept):
        demand, kf = float(npts), float(kept) / N_RAYS
        if kf < 0.98 and t < len(TIER_FRACS) - 1:
            return t + 1
        if t > 0 and demand * 1.6 < TIER_M[t - 1]:
            return t - 1
        return t

    dgrid_fn = jax.jit(lambda bf: dilated_chunk_grid(bf, cfg))

    def grid_update(g, p, k, full):
        return update_density_grid(
            g, p, k, density_fn=field.density, bound=cfg.bound,
            grid_size=cfg.grid_size, density_thresh=cfg.density_thresh, full=full,
        )

    log(f"grid marked {time.time()-t_start:.1f}s")

    # warmup: compile everything + densify grid so the workload is realistic;
    # the budget tier settles to the scene's steady-state demand here.
    # 384 steps was NOT enough for the grid to sparsify below the top tier
    # (round-3 verdict weak#3: the bench measured the cold M=131072 tier while
    # 30K-step runs settle at M=65536) — the reference's 97 it/s is itself a
    # steady-state number over a 30K-step run, so warm until the tier is
    # steady across two consecutive adaptation reads or the cap is hit
    k = jax.random.PRNGKey(1)
    npts = kept = None
    dgrid = dgrid_fn(grid.bitfield)
    warm_steps = int(os.environ.get("TNGP_BENCH_WARMUP", "1024"))
    for step in range(warm_steps):
        if step % 16 == 0:
            if npts is not None:
                t_new = adapt_tier(tier, npts, kept)
                if t_new != tier:
                    tier = t_new
                    log(f"tier -> M={TIER_M[tier]} at warmup step {step}")
            k, kk = jax.random.split(k)
            grid = grid_update(grid, params, kk, full=(step < 32))
            dgrid = dgrid_fn(grid.bitfield)
            jax.block_until_ready(grid.bitfield)
            if step == 0:
                log(f"grid update compiled {time.time()-t_start:.1f}s")
        k, kk = jax.random.split(k)
        params, opt_state, loss, npts, kept = get_step(tier)(
            params, opt_state, kk, grid.bitfield, dgrid
        )
        if step == 0:
            jax.block_until_ready(loss)
            log(f"train step compiled {time.time()-t_start:.1f}s")
    jax.block_until_ready(loss)
    log(f"warmup done {time.time()-t_start:.1f}s (tier M={TIER_M[tier]})")

    # timed: 100 steps + periodic partial grid updates + the once-per-16-steps
    # demand read (the true steady-state loop, adaptation cost included)
    t0 = time.time()
    n_timed = 100
    for step in range(n_timed):
        if step % 16 == 0:
            t_new = adapt_tier(tier, npts, kept)
            if t_new != tier and t_new in step_fns:  # never compile in the
                tier = t_new  # timed section — a fresh tier waits for next round
            k, kk = jax.random.split(k)
            grid = grid_update(grid, params, kk, full=False)
            dgrid = dgrid_fn(grid.bitfield)
        k, kk = jax.random.split(k)
        params, opt_state, loss, npts, kept = get_step(tier)(
            params, opt_state, kk, grid.bitfield, dgrid
        )
    jax.block_until_ready(loss)
    dt = time.time() - t0
    log(f"timed done: tier M={TIER_M[tier]}")

    # end-to-end sanity: render one eval view against GT (also exercises the
    # iterative eval path on-chip); reported as a comment, not the metric
    try:
        from tngp.data.rays import full_image_rays
        from tngp.render import render_rays_eval

        o, d_ = full_image_rays(poses[0], intr, H, W)
        eval_fn = jax.jit(
            lambda p, o, d, bf, dg: render_rays_eval(
                field, p, o, d, bf, cfg, dilated_grid=dg
            )["image"]
        )
        pieces = []
        for s in range(0, o.shape[0], 4096):
            pieces.append(np.asarray(eval_fn(params, o[s:s+4096], d_[s:s+4096], grid.bitfield, dgrid)))
        img = np.concatenate(pieces).reshape(H, W, 3)
        mse = float(np.mean((img - np.asarray(images[0])) ** 2))
        log(f"eval view PSNR after warmup+{n_timed} steps: {-10*np.log10(max(mse,1e-12)):.2f} dB")
        # eval throughput (reference: 7.8 it/s at 800x800 on V100, readme.md:211).
        # A different view than the PSNR pass — identical input buffers would be
        # served from the axon result cache (CLAUDE.md benchmarking traps).
        o2, d2 = full_image_rays(poses[1], intr, H, W)
        te0 = time.time()
        for s in range(0, o2.shape[0], 4096):
            out = eval_fn(params, o2[s:s+4096], d2[s:s+4096], grid.bitfield, dgrid)
        jax.block_until_ready(out)
        eval_rays_s = o2.shape[0] / (time.time() - te0)
        log(f"eval throughput: {eval_rays_s:,.0f} rays/s "
            f"({eval_rays_s / (H * W):.2f} frames/s at {H}x{W})")
    except Exception as e:  # never fail the metric on the sanity check
        log(f"eval render failed: {type(e).__name__}: {e}")
        eval_rays_s = None
        mse = None

    # eval at the baseline's definition: 800x800 frames of the trained scene
    # through the frame-level persistent-alive-set renderer (render/
    # frame_eval.py).  Reference: 7.8 test it/s at 800x800 = 4.99M rays/s
    # (readme.md:211).  Fresh orbit poses per frame (axon result cache).
    try:
        from tngp.data.synthetic import orbit_poses
        from tngp.render.frame_eval import FrameRenderer

        R = 800
        s = R / float(H)
        intr800 = intr * jnp.asarray([s, s, s, s])
        # tuned eval policy (round-5 sweep, scripts/sweep_eval.py): a small
        # first-pass budget is the early-termination knob — survivors go to
        # the tier rounds, which kill them at alive-proportional cost
        eval_cfg = dataclasses.replace(
            cfg, eval_budget=0.125, eval_march_chunk=32, eval_round_ladder=256,
            eval_cb_mult=6.0)
        fr = FrameRenderer(field, eval_cfg, chunk=int(os.environ.get(
            "TNGP_BENCH_EVAL_CHUNK", "16384")))
        fr.warmup(params, grid.bitfield, R * R)  # every tier program compiles
        test_poses = orbit_poses(4, radius=2.35, elevation=0.3)
        o8, d8 = full_image_rays(jnp.asarray(test_poses[0]), intr800, R, R)
        img8, _ = fr.render(params, o8, d8, grid.bitfield, dgrid)
        np.asarray(img8)  # compile + warm
        te0 = time.time()
        for p_ in test_poses[1:]:
            o8, d8 = full_image_rays(jnp.asarray(p_), intr800, R, R)
            img8, _ = fr.render(params, o8, d8, grid.bitfield, dgrid)
            np.asarray(img8)
        eval800_rays_s = (len(test_poses) - 1) * R * R / (time.time() - te0)
        log(f"eval800 throughput: {eval800_rays_s:,.0f} rays/s "
            f"({eval800_rays_s / (R * R):.2f} frames/s at {R}x{R})")
    except Exception as e:
        log(f"eval800 render failed: {type(e).__name__}: {e}")
        eval800_rays_s = None

    it_s = n_timed / dt
    rays_s = it_s * N_RAYS
    # eval baseline: 7.8 test-it/s at 800x800 on V100 (readme.md:211).
    # NOTE: this 128^2 blob-scene chunked render is NOT reference conditions —
    # scripts/bench_eval.py (trained 256^2 hard scene at --res 800) is the
    # recorded eval benchmark; these fields just keep eval visible per-round.
    extra = {}
    if eval_rays_s is not None:
        extra = {
            "eval_rays_per_s": round(eval_rays_s, 1),
            "eval_vs_baseline": round(eval_rays_s / (7.8 * 800 * 800), 4),
            "eval_psnr_db": round(-10 * np.log10(max(mse, 1e-12)), 2),
        }
    if eval800_rays_s is not None:
        extra.update({
            "eval800_rays_per_s": round(eval800_rays_s, 1),
            "eval800_vs_baseline": round(eval800_rays_s / (7.8 * 800 * 800), 4),
        })
    print(
        json.dumps(
            {
                "metric": "train_rays_per_s",
                "value": round(rays_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_s / BASELINE_RAYS_PER_S, 3),
                # which budget tier the timed section actually ran (VERDICT r4
                # weak#3: the tier was only visible in stderr, making the
                # stage-ledger reconciliation unverifiable from the JSON)
                "tier_M": TIER_M[tier],
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
