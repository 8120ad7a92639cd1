"""Eval (test-time) throughput at the reference's conditions: full frames on
a TRAINED scene (occupancy grid sparsified, early termination active).

Reference baseline: 7.8 test it/s at 800x800 on V100 (readme.md:211) =
4.99M rays/s.  Uses the hard-scene checkpoint from scripts/train_hard.py
(/tmp/hard_base by default); training one first is required.

    python scripts/bench_eval.py [--workspace /tmp/hard_base] [--res 800]
                                 [--frames 8] [--eval_budget F]

Prints one JSON line with frames/s, rays/s, and vs_baseline.
"""

import argparse
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
if os.environ.get("TNGP_PLATFORM"):  # axon ignores JAX_PLATFORMS (CLAUDE.md)
    jax.config.update("jax_platforms", os.environ["TNGP_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tngp.data.provider import NeRFDataset
from tngp.data.synthetic import orbit_poses
from tngp.models import NGPNetwork
from tngp.render import RenderConfig
from tngp.train import Trainer
from tngp.utils.config import TrainConfig

BASELINE_RAYS_PER_S = 7.8 * 800 * 800  # V100 test it/s (readme.md:211)

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "hard_256.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/hard_base")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--compact_fraction", type=float, default=0.25)
    ap.add_argument("--eval_budget", type=float, default=0.75,
                    help="first-pass sample budget as a fraction of N*K "
                         "(trained-scene demand is ~68 samples/ray mean, "
                         "p99 286 — the default 0.75*128=96/ray mostly "
                         "avoids residual rounds; smaller budgets trade "
                         "rounds for a cheaper first pass)")
    args = ap.parse_args()

    if not os.path.exists(CACHE):
        print("no .cache/hard_256.npz — run scripts/train_hard.py first",
              file=sys.stderr)
        sys.exit(1)
    z = np.load(CACHE)
    poses, intr, images = z["poses"], z["intrinsics"], z["images"]
    H, W = images.shape[1:3]
    ds = NeRFDataset(poses=poses, intrinsics=intr, H=H, W=W,
                     images=images.astype(np.float32))

    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                       encoding="hashgrid_window")
    cfg = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128,
                       min_near=0.05, compact_fraction=args.compact_fraction,
                       density_thresh=10.0, march_dense=True,
                       eval_budget=args.eval_budget)
    tc = TrainConfig(name=os.path.basename(args.workspace),
                     workspace=args.workspace, use_checkpoint="latest")
    trainer = Trainer(model, ds, cfg, tc)
    if trainer.global_step == 0:
        print(f"no checkpoint found in {args.workspace} — run train_hard.py",
              file=sys.stderr)
        sys.exit(1)

    R = args.res
    # warmup / compile + sanity PSNR at dataset res on a held-out view
    t0 = time.time()
    img, _ = trainer.render_image(ds.poses[0], chunk=args.chunk)
    mse = float(np.mean((img - np.asarray(ds.images[0])[..., :3]) ** 2))
    print(f"# sanity PSNR (256^2 view 0): {-10*np.log10(max(mse,1e-12)):.2f} dB",
          file=sys.stderr, flush=True)
    img, _ = trainer.render_image(ds.poses[1], W=R, H=R, chunk=args.chunk)
    print(f"# warmup+compile {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # timed: fresh orbit poses (distinct from training poses — identical input
    # buffers would be served from the axon result cache)
    test_poses = orbit_poses(args.frames, radius=2.35, elevation=0.3)
    t0 = time.time()
    for p in test_poses:
        img, _ = trainer.render_image(p, W=R, H=R, chunk=args.chunk)
        frs = getattr(trainer, "_frame_renderers", {})
        fr = next(iter(frs.values()), None)
        if fr is not None:
            print(f"# frame: {time.time()-t0:.2f}s cum, "
                  f"{getattr(fr, 'last_rounds', '?')} residual rounds",
                  file=sys.stderr, flush=True)
    dt = time.time() - t0
    frames_s = args.frames / dt
    rays_s = frames_s * R * R
    print(json.dumps({
        "metric": "eval_rays_per_s",
        "value": round(rays_s, 1),
        "unit": "rays/s",
        "frames_per_s": round(frames_s, 3),
        "res": R,
        "vs_baseline": round(rays_s / BASELINE_RAYS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
