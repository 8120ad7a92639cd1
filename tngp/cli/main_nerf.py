"""Instant-NGP NeRF entry point (reference: main_nerf.py)."""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from .common import (add_common_args, apply_platform_override,
                         build_clip_embedder, build_configs, load_dataset)

    apply_platform_override()

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--encoding", type=str, default="hashgrid_window",
                   choices=["hashgrid_window", "hashgrid", "tiledgrid"],
                   help="position encoder; hashgrid_window is the binned "
                        "Pallas MXU path (21.5x the golden encoder on TPU)")
    p.add_argument("--gui", action="store_true", help="launch the web viewer")
    p.add_argument("--gui_port", type=int, default=7860)
    p.add_argument("--mesh_resolution", type=int, default=256)
    p.add_argument("--skip_test_render", action="store_true")
    opt = p.parse_args(argv)

    from ..models import NGPNetwork
    from ..train import Trainer

    cfg, tc = build_configs(opt)
    model = NGPNetwork(
        bound=opt.bound,
        bg_radius=opt.bg_radius,
        encoding=opt.encoding,
        compute_dtype=jnp.bfloat16 if tc.bf16 else jnp.float32,
    )

    if opt.test:
        test_ds = load_dataset(opt, "test")
        trainer = Trainer(model, test_ds, cfg, tc)
        trainer.test(test_ds.poses)
        trainer.save_mesh(resolution=256, threshold=10.0)
        return trainer

    train_ds = load_dataset(opt, "train")
    try:
        valid_ds = load_dataset(opt, "val")
    except FileNotFoundError:
        valid_ds = None
    trainer = Trainer(model, train_ds, cfg, tc, valid_dataset=valid_ds,
                      use_grid=not opt.no_grid,
                      clip_embedder=build_clip_embedder(opt))

    if opt.gui:
        from .viewer import run_viewer

        run_viewer(trainer, port=opt.gui_port)
        return trainer

    steps_per_epoch = tc.steps_per_epoch or train_ds.num_frames
    max_epochs = int(np.ceil(opt.iters / steps_per_epoch))
    trainer.train(max_epochs)
    if valid_ds is not None:
        trainer.evaluate(valid_ds, write_images=True)
    if not opt.skip_test_render:
        try:
            test_ds = load_dataset(opt, "test")
            trainer.test(test_ds.poses)
        except FileNotFoundError:
            pass
    trainer.save_mesh(resolution=opt.mesh_resolution, threshold=10.0)
    return trainer


if __name__ == "__main__":
    main()
