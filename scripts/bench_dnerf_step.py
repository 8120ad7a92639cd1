"""D-NeRF vs NGP train-step cost on the real chip (VERDICT r3 weak #5).

Round-3 landed window-encoder input gradients so D-NeRF's deform backprop
rides the fast encoder (kernels/window_encoder.py dy_dx passes); the claimed
"done" bar is a D-NeRF step within 2x of the NGP step at comparable sample
demand.  This measures both on the same blob scene (the D-NeRF arm sees the
time-rotated variant), identical ray/budget config, pinned tier (adaptive
off), and prints one JSON line.

    python scripts/bench_dnerf_step.py [--steps 100] [--num_rays 4096]
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

from tngp.data.synthetic import make_synthetic_dataset, make_synthetic_dynamic_dataset
from tngp.models import DNeRFNetwork, NGPNetwork
from tngp.render import RenderConfig
from tngp.train import Trainer
from tngp.train.dnerf_trainer import DNeRFTrainer
from tngp.utils.config import TrainConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--num_rays", type=int, default=4096)
    ap.add_argument("--warm", type=int, default=64)
    args = ap.parse_args()

    H = W = 128
    cfg = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128,
                       min_near=0.05, compact_fraction=0.25,
                       density_thresh=1.0, march_dense=True)

    def build(kind, ws):
        tc = TrainConfig(name=kind, workspace=ws, iters=100_000,
                         num_rays=args.num_rays, steps_per_epoch=args.steps,
                         use_checkpoint="scratch", adaptive_budget=False)
        if kind == "ngp":
            ds = make_synthetic_dataset(n_frames=12, H=H, W=W, seed=0)
            model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                               encoding="hashgrid_window")
            return Trainer(model, ds, cfg, tc)
        ds = make_synthetic_dynamic_dataset(n_frames=12, H=H, W=W, seed=0)
        model = DNeRFNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                             encoding="hashgrid_window")
        return DNeRFTrainer(model, ds, cfg, tc, time_size=16,
                            update_interval=16)

    out = {}
    for kind in ("ngp", "dnerf"):
        tr = build(kind, f"/tmp/bench_{kind}_step")
        t0 = time.time()
        tr.train_one_epoch(args.warm)  # compile + densify
        print(f"# {kind}: warm {time.time()-t0:.1f}s", file=sys.stderr,
              flush=True)
        tr.epoch += 1
        t0 = time.time()
        tr.train_one_epoch(args.steps)
        dt = time.time() - t0
        out[kind] = {
            "ms_per_step": round(1e3 * dt / args.steps, 2),
            "rays_per_s": round(args.num_rays * args.steps / dt, 1),
        }
        print(f"# {kind}: {out[kind]}", file=sys.stderr, flush=True)

    ratio = out["dnerf"]["ms_per_step"] / out["ngp"]["ms_per_step"]
    print(json.dumps({
        "metric": "dnerf_step_vs_ngp",
        "value": round(ratio, 3),
        "unit": "x (goal <= 2)",
        "ngp": out["ngp"],
        "dnerf": out["dnerf"],
    }))


if __name__ == "__main__":
    main()
