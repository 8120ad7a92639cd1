"""D-NeRF entry point (reference: main_dnerf.py)."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    from .common import (add_common_args, apply_platform_override,
                         build_configs, load_dataset)

    apply_platform_override()

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--time_size", type=int, default=64)
    p.add_argument("--deform_reg", type=float, default=1e-3)
    p.add_argument("--gui", action="store_true",
                   help="launch the web viewer (time slider, dnerf/gui.py:75)")
    p.add_argument("--gui_port", type=int, default=7860)
    p.add_argument("--basis", action="store_true",
                   help="temporal-basis variant (dnerf/network_basis.py)")
    p.add_argument("--hyper", action="store_true",
                   help="ambient-dim variant (dnerf/network_hyper.py)")
    opt = p.parse_args(argv)
    if opt.basis and opt.hyper:
        p.error("--basis and --hyper are mutually exclusive")

    import jax.numpy as jnp

    from ..models import DNeRFBasisNetwork, DNeRFHyperNetwork, DNeRFNetwork
    from ..train.dnerf_trainer import DNeRFTrainer

    cfg, tc = build_configs(opt)
    # model selection parity with reference main_dnerf.py:80-86
    cls = (DNeRFBasisNetwork if opt.basis
           else DNeRFHyperNetwork if opt.hyper else DNeRFNetwork)
    model = cls(
        bound=opt.bound, bg_radius=opt.bg_radius,
        compute_dtype=jnp.bfloat16 if tc.bf16 else jnp.float32,
    )
    train_ds = load_dataset(opt, "train", with_time=True)
    try:
        valid_ds = load_dataset(opt, "val", with_time=True)
    except FileNotFoundError:
        valid_ds = None
    trainer = DNeRFTrainer(
        model, train_ds, cfg, tc, valid_dataset=valid_ds,
        time_size=opt.time_size, deform_reg=opt.deform_reg,
        update_interval=100,
    )
    if opt.gui:
        from .viewer import run_viewer

        run_viewer(trainer, port=opt.gui_port)
        return trainer
    if opt.test:
        trainer.test(train_ds.poses)
        return trainer
    steps_per_epoch = tc.steps_per_epoch or train_ds.num_frames
    trainer.train(int(np.ceil(opt.iters / steps_per_epoch)))
    if valid_ds is not None:
        trainer.evaluate(valid_ds)
    return trainer


if __name__ == "__main__":
    main()
