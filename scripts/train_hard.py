"""Round-2 quality gate: 30K-step run on the 100-view 256^2 hard scene.

Exercises the full Trainer subsystem at scale (EMA, lr decay tail, density
grid EMA/partial updates, checkpoints, optional error-map sampling) with the
TPU hot path (window encoder + dense march + stream compositing).

    python scripts/train_hard.py [--error_map] [--iters 30000] [--tag name]

Writes a time-to-PSNR curve to <workspace>/curve.json and logs per-epoch.
The error-map A/B (reference gains +0.7 dB, readme.md:211-212) is run as two
invocations.
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tngp.data.provider import NeRFDataset
from tngp.data.synthetic import make_hard_field, orbit_poses, render_gt_images
from tngp.models import NGPNetwork
from tngp.render import RenderConfig
from tngp.train import Trainer
from tngp.utils.config import TrainConfig

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "hard_256.npz")


def get_hard_dataset(n_frames=100, H=256, W=256):
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return z["poses"], z["intrinsics"], z["images"]
    field = make_hard_field(seed=0)
    poses = orbit_poses(n_frames)
    focal = 0.9 * W
    intrinsics = np.array([focal, focal, W / 2, H / 2], np.float32)
    t0 = time.time()
    images = render_gt_images(field, poses, intrinsics, H, W, 1.0, num_steps=1024)
    print(f"# GT rendered in {time.time()-t0:.0f}s")
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    np.savez_compressed(CACHE, poses=poses, intrinsics=intrinsics, images=images)
    return poses, intrinsics, images


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--error_map", action="store_true")
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--compact_fraction", type=float, default=0.25)
    ap.add_argument("--tag", type=str, default=None)
    ap.add_argument("--workspace", type=str, default=None,
                    help="override the /tmp/hard_<tag> default (use a "
                         "persistent dir when the checkpoint feeds later "
                         "benches — /tmp does not survive round restarts)")
    ap.add_argument("--encoding", type=str, default="hashgrid_window",
                    help="hashgrid_window (TPU kernels) | hashgrid (golden) — "
                         "the A/B isolates device-kernel effects on quality")
    ap.add_argument("--no_overdrive", action="store_true",
                    help="disable the above-configured-budget tier (A/B)")
    ap.add_argument("--no_adaptive", action="store_true",
                    help="disable the budget-tier ladder entirely (A/B)")
    ap.add_argument("--march_chunk", type=int, default=8,
                    help="0 = flat dense march (round-2b structure)")
    ap.add_argument("--mxu_f32", action="store_true",
                    help="true-f32 window-encoder matmuls (Precision.HIGHEST;"
                         " 3.5-4x slower) — the bf16 quality A/B")
    args = ap.parse_args()
    if args.mxu_f32:
        os.environ["TNGP_MXU_F32"] = "1"
    tag = args.tag or ("em" if args.error_map else "base")

    poses, intr, images = get_hard_dataset()
    H, W = images.shape[1:3]
    n_val = 5
    train_ds = NeRFDataset(poses=poses[n_val:], intrinsics=intr, H=H, W=W,
                           images=images[n_val:].astype(np.float32))
    val_ds = NeRFDataset(poses=poses[:n_val], intrinsics=intr, H=H, W=W,
                         images=images[:n_val].astype(np.float32))

    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                       encoding=args.encoding)
    cfg = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128,
                       min_near=0.05, compact_fraction=args.compact_fraction,
                       density_thresh=10.0, march_dense=True,
                       march_chunk=args.march_chunk)
    tc = TrainConfig(
        name=f"hard_{tag}", workspace=args.workspace or f"/tmp/hard_{tag}",
        iters=args.iters,
        num_rays=4096, steps_per_epoch=500, eval_interval=5,
        error_map=args.error_map, use_checkpoint="scratch",
        adaptive_budget=not args.no_adaptive,
        adaptive_overdrive=not args.no_overdrive,
    )
    trainer = Trainer(model, train_ds, cfg, tc, valid_dataset=val_ds)

    curve = []
    t0 = time.time()
    steps_per_epoch = tc.steps_per_epoch
    n_epochs = -(-args.iters // steps_per_epoch)
    for _ in range(n_epochs):
        trainer.epoch += 1
        trainer.train_one_epoch(steps_per_epoch)
        if trainer.epoch % tc.eval_interval == 0:
            psnr = float(trainer.evaluate(val_ds))
            curve.append({"step": trainer.global_step, "wall_s": time.time() - t0,
                          "psnr": psnr})
            print(f"# step {trainer.global_step} wall {time.time()-t0:.0f}s "
                  f"PSNR {psnr:.2f}", flush=True)
            with open(os.path.join(tc.workspace, "curve.json"), "w") as f:
                json.dump(curve, f)
            trainer.save_checkpoint(best=False)
    psnr = float(trainer.evaluate(val_ds, write_images=True))
    curve.append({"step": trainer.global_step, "wall_s": time.time() - t0,
                  "psnr": psnr, "final": True})
    with open(os.path.join(tc.workspace, "curve.json"), "w") as f:
        json.dump(curve, f)
    print(json.dumps({"tag": tag, "final_psnr": psnr,
                      "wall_s": time.time() - t0, "curve": curve}))


if __name__ == "__main__":
    main()
