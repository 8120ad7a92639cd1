"""Cross-backend eval: render the hard-scene val views from a checkpoint on
THIS backend and compare with the PSNR the trainer logged at save time.

The round-2 investigation found device-trained checkpoints evaluating ~8 dB
lower off-TPU because MXU default precision rounds f32 matmul operands to
bf16 (see kernels/window_encoder.py:_mxu_precision); the CPU fallback now
emulates that rounding (window_encode_ref emulate_bf16), so TPU-eval and
CPU-eval of the same checkpoint must agree to interpolation-order noise.

    # CPU re-eval of the latest checkpoint:
    TNGP_PLATFORM=cpu PYTHONPATH=/root/repo python scripts/cross_backend_eval.py
    # or on the chip (one TPU process at a time!):
    python scripts/cross_backend_eval.py [--ckpt path] [--tag base]
"""

import argparse
import glob
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

if os.environ.get("TNGP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TNGP_PLATFORM"])

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tngp.data.provider import NeRFDataset  # noqa: E402
from tngp.models import NGPNetwork  # noqa: E402
from tngp.render import RenderConfig  # noqa: E402
from tngp.train import Trainer  # noqa: E402
from tngp.utils.config import TrainConfig  # noqa: E402
from train_hard import get_hard_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="base")
    ap.add_argument("--ckpt", default=None,
                    help="explicit checkpoint path (default: latest in "
                         "/tmp/hard_<tag>/checkpoints)")
    ap.add_argument("--encoding", default="hashgrid_window",
                    help="encoder the checkpoint was trained with (must match "
                         "train_hard.py --encoding; a mismatch would silently "
                         "keep random template embeddings)")
    args = ap.parse_args()

    ckpt = args.ckpt
    if ckpt is None:
        cands = sorted(glob.glob(f"/tmp/hard_{args.tag}/checkpoints/*.npz"))
        if not cands:
            print(f"no checkpoints under /tmp/hard_{args.tag}/checkpoints")
            return 2
        ckpt = cands[-1]

    poses, intr, images = get_hard_dataset()
    H, W = images.shape[1:3]
    n_val = 5
    val_ds = NeRFDataset(poses=poses[:n_val], intrinsics=intr, H=H, W=W,
                         images=images[:n_val].astype(np.float32))
    train_ds = NeRFDataset(poses=poses[n_val:], intrinsics=intr, H=H, W=W,
                           images=images[n_val:].astype(np.float32))

    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                       encoding=args.encoding)
    cfg = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128,
                       min_near=0.05, compact_fraction=0.25,
                       density_thresh=10.0, march_dense=True)
    tc = TrainConfig(name=f"hard_{args.tag}", workspace=f"/tmp/xeval_{args.tag}",
                     iters=1, num_rays=4096, use_checkpoint="scratch")
    trainer = Trainer(model, train_ds, cfg, tc, valid_dataset=val_ds)
    rep = trainer.load_checkpoint(ckpt) or {}
    bad = [it for kind in ("missing", "mismatched")
           for it in rep.get(kind, []) if "encoder" in str(it)]
    if bad:
        print(f"FATAL: encoder params did not load (wrong --encoding for this "
              f"checkpoint?): {bad}")
        return 3
    psnr = float(trainer.evaluate(val_ds))
    print(f"backend={jax.default_backend()} ckpt={os.path.basename(ckpt)} "
          f"val PSNR {psnr:.2f} dB")

    curve_path = f"/tmp/hard_{args.tag}/curve.json"
    if os.path.exists(curve_path):
        with open(curve_path) as f:
            curve = json.load(f)
        if curve:
            print(f"trainer-logged (train-time backend) last point: "
                  f"step {curve[-1]['step']} PSNR {curve[-1]['psnr']:.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
