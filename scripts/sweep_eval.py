"""Sweep frame-eval policy knobs on the trained hard scene at 800^2.

Round-5 eval tuning (VERDICT r4 #1/#8): the round-4 measurement showed the
ENTIRE frame cost is the first pass — eval_budget 0.75 queries all ~68
marched samples/ray with zero early termination (0 residual rounds), while
the reference only pays until transmittance saturates (T < 1e-4,
nerf/renderer.py:400-417).  This sweeps (eval_budget, chunk, round_budget)
to find the split between a cheap small-budget first pass and the
tier-ladder residual rounds that actually early-terminate.

    python scripts/sweep_eval.py [--frames 2] [--res 800]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("TNGP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TNGP_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tngp.data.provider import NeRFDataset
from tngp.data.synthetic import orbit_poses
from tngp.models import NGPNetwork
from tngp.render import RenderConfig
from tngp.render.frame_eval import FrameRenderer
from tngp.train import Trainer
from tngp.utils.config import TrainConfig
from tngp.data.rays import full_image_rays

BASELINE_RAYS_PER_S = 7.8 * 800 * 800

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "hard_256.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/hard_base")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--configs", default=None,
                    help="semicolon list of budget,chunk,round_budget_log2 "
                         "triples, e.g. '0.125,8192,19;0.125,16384,18'")
    args = ap.parse_args()

    z = np.load(CACHE)
    poses, intr, images = z["poses"], z["intrinsics"], z["images"]
    H, W = images.shape[1:3]
    ds = NeRFDataset(poses=poses, intrinsics=intr, H=H, W=W,
                     images=images.astype(np.float32))
    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                       encoding="hashgrid_window")
    base_cfg = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128,
                            min_near=0.05, compact_fraction=0.25,
                            density_thresh=10.0, march_dense=True)
    tc = TrainConfig(name=os.path.basename(args.workspace),
                     workspace=args.workspace, use_checkpoint="latest")
    trainer = Trainer(model, ds, base_cfg, tc)
    assert trainer.global_step > 0, "no checkpoint"
    params = trainer.ema_params
    bitfield = trainer.grid.bitfield
    dgrid = trainer._dgrid_fn(bitfield)

    R = args.res
    s = R / float(H)
    intr_r = jnp.asarray(np.asarray(intr) * np.array([s, s, s, s], np.float32))
    # two warmup poses: different poses hit different alive-count tiers, and
    # a tier program first compiled inside the timed section wrecks the
    # timing (round-5 sweep3: one 52 s timed "frame")
    test_poses = orbit_poses(args.frames + 2, radius=2.35, elevation=0.3)
    ray_sets = [full_image_rays(jnp.asarray(p), intr_r, R, R)
                for p in test_poses]

    if args.configs:
        cfgs = []
        for part in args.configs.split(";"):
            b, c, rb, g, rl, cbm = part.split(",")
            cfgs.append((float(b), int(c), 1 << int(rb), int(g), int(rl),
                         float(cbm)))
    else:
        cfgs = [
            (0.125, 16384, 1 << 19, 32, 256, 6.0),
            (0.125, 16384, 1 << 19, 16, 256, 6.0),
            (0.0625, 16384, 1 << 19, 32, 256, 6.0),
            (0.125, 16384, 1 << 19, 32, 256, 3.0),
        ]

    for budget, chunk, rbud, g, rl, cbm in cfgs:
        cfg = dataclasses.replace(base_cfg, eval_budget=budget,
                                  eval_round_budget=rbud,
                                  eval_march_chunk=g, eval_round_ladder=rl,
                                  eval_cb_mult=cbm)
        fr = FrameRenderer(trainer.field, cfg, chunk=chunk)
        tag = (f"budget={budget} chunk={chunk} rbud=2^{rbud.bit_length()-1} "
               f"G={g} rladder={rl} cbm={cbm}")
        print(f"### {tag}", file=sys.stderr, flush=True)
        t0 = time.time()
        fr.warmup(params, bitfield, R * R)
        print(f"#   tier warmup {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)
        t0 = time.time()
        for o, d in ray_sets[:2]:
            img, _ = fr.render(params, o, d, bitfield, dgrid)
            np.asarray(img)
        print(f"#   warmup+compile {time.time()-t0:.1f}s "
              f"rounds={fr.last_rounds}", file=sys.stderr, flush=True)
        t0 = time.time()
        rounds = []
        for o, d in ray_sets[2:]:
            img, _ = fr.render(params, o, d, bitfield, dgrid)
            np.asarray(img)
            rounds.append(fr.last_rounds)
        dt = time.time() - t0
        rays_s = args.frames * R * R / dt
        print(json.dumps({
            "tag": tag, "rays_per_s": round(rays_s, 1),
            "frames_per_s": round(args.frames / dt, 3),
            "rounds": rounds,
            "vs_baseline": round(rays_s / BASELINE_RAYS_PER_S, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
