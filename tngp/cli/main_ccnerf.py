"""CCNeRF entry point (reference: main_CCNeRF.py): rank-residual training,
then finalize -> multi-level compress + eval; `--compose` renders a composed
scene from saved finalized models."""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(argv=None):
    from .common import (add_common_args, apply_platform_override,
                         build_configs, load_dataset)

    apply_platform_override()

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--compose", action="store_true")
    p.add_argument("--lr1", type=float, default=2e-2)
    p.add_argument("--lr2", type=float, default=1e-3)
    p.add_argument("--rank_levels", type=str,
                   default="8,0,8,0;16,2,16,2;32,4,32,16;64,8,64,32;64,16,64,64",
                   help="semicolon-separated (dv,dm,cv,cm) compression levels")
    opt = p.parse_args(argv)

    from ..models.ccnerf import CCConfig, CCScene, cc_compress, cc_finalize
    from ..train.cc_trainer import CCTrainer

    cfg, tc = build_configs(opt)
    cc_cfg = CCConfig(bound=opt.bound)

    if opt.compose:
        # load finalized models saved by a prior run and compose a demo scene
        scene = CCScene()
        base = os.path.join(opt.workspace, "cc_models")
        for i, fname in enumerate(sorted(os.listdir(base))):
            with open(os.path.join(base, fname), "rb") as f:
                params, ccfg = pickle.load(f)
            ang = 0.7 * i
            R = np.array(
                [[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0],
                 [np.sin(ang), 0, np.cos(ang)]], np.float32,
            )
            scene.add(params, ccfg, R=R, s=1.0 / (1 + 0.3 * i),
                      t=np.array([0.4 * i - 0.4, 0, 0], np.float32))
        print(f"[compose] {len(scene.objects)} objects")
        return scene

    train_ds = load_dataset(opt, "train")
    trainer = CCTrainer(cc_cfg, train_ds, cfg, tc, lr1=opt.lr1, lr2=opt.lr2)
    steps_per_epoch = tc.steps_per_epoch or train_ds.num_frames
    trainer.train(int(np.ceil(opt.iters / steps_per_epoch)))

    # finalize + multi-level compression eval (main_CCNeRF.py:206-228)
    fparams, fcfg = cc_finalize(trainer.params, cc_cfg)
    out_dir = os.path.join(opt.workspace, "cc_models")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "full.pkl"), "wb") as f:
        pickle.dump((fparams, fcfg), f)
    for level in opt.rank_levels.split(";"):
        ranks = tuple(int(t) for t in level.split(","))
        cparams, ccfg = cc_compress(fparams, fcfg, ranks)
        n_params = sum(
            np.asarray(x).size
            for x in __import__("jax").tree_util.tree_leaves(cparams)
        )
        with open(os.path.join(out_dir, f"rank_{'_'.join(map(str, ranks))}.pkl"), "wb") as f:
            pickle.dump((cparams, ccfg), f)
        print(f"[compress] ranks={ranks} params={n_params}")
    return trainer


if __name__ == "__main__":
    main()
