"""TensoRF entry point (reference: main_tensoRF.py)."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    from .common import (add_common_args, apply_platform_override,
                         build_configs, load_dataset)

    apply_platform_override()

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--cp", action="store_true", help="use CP decomposition")
    p.add_argument("--resolution0", type=int, default=128)
    p.add_argument("--resolution1", type=int, default=300)
    p.add_argument("--upsample_model_steps", type=int, action="append",
                   default=[2000, 3000, 4000, 5500, 7000])
    p.add_argument("--l1_reg_weight", type=float, default=1e-4)
    opt = p.parse_args(argv)

    import jax.numpy as jnp

    from ..models import TensoRFNetwork
    from ..train.tensorf_trainer import TensoRFTrainer

    cfg, tc = build_configs(opt)
    if opt.cp:
        model = TensoRFNetwork(
            resolution=(opt.resolution0,) * 3, decomposition="cp",
            sigma_rank=(96, 96, 96), color_rank=(288, 288, 288),
            bound=opt.bound, bg_radius=opt.bg_radius,
            compute_dtype=jnp.bfloat16 if tc.bf16 else jnp.float32,
        )
    else:
        model = TensoRFNetwork(
            resolution=(opt.resolution0,) * 3, bound=opt.bound,
            bg_radius=opt.bg_radius,
            compute_dtype=jnp.bfloat16 if tc.bf16 else jnp.float32,
        )

    train_ds = load_dataset(opt, "train")
    try:
        valid_ds = load_dataset(opt, "val")
    except FileNotFoundError:
        valid_ds = None
    trainer = TensoRFTrainer(
        model, train_ds, cfg, tc, valid_dataset=valid_ds,
        l1_reg_weight=opt.l1_reg_weight,
        upsample_model_steps=tuple(opt.upsample_model_steps),
        resolution1=opt.resolution1,
    )
    if opt.test:
        trainer.test(train_ds.poses)
        return trainer
    steps_per_epoch = tc.steps_per_epoch or train_ds.num_frames
    trainer.train(int(np.ceil(opt.iters / steps_per_epoch)))
    if valid_ds is not None:
        trainer.evaluate(valid_ds, write_images=True)
    return trainer


if __name__ == "__main__":
    main()
