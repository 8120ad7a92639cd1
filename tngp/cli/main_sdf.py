"""SDF entry point (reference: main_sdf.py)."""

from __future__ import annotations

import argparse


def main(argv=None):
    from .common import apply_platform_override

    apply_platform_override()
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str, help="mesh .obj path (or 'sphere')")
    p.add_argument("--test", action="store_true")
    p.add_argument("--workspace", type=str, default="workspace")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--fp16", action="store_true")
    p.add_argument("--tcnn", action="store_true", help="(parity flag; single backend here)")
    p.add_argument("--ff", action="store_true", help="(parity flag; single backend here)")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--num_samples", type=int, default=2**18)
    p.add_argument("--epoch_size", type=int, default=100, help="steps per epoch")
    p.add_argument("--mesh_resolution", type=int, default=512)
    p.add_argument("--ckpt", type=str, default="latest")
    opt = p.parse_args(argv)

    import jax.numpy as jnp

    from ..data.sdf import SDFDataset
    from ..models import SDFNetwork
    from ..train.sdf_trainer import SDFTrainer
    from ..utils.config import TrainConfig

    if opt.path == "sphere":
        import numpy as np

        from ..native import marching_tetrahedra

        g = np.linspace(-1, 1, 64, dtype=np.float32)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        verts, faces = marching_tetrahedra(0.6 - np.sqrt(X**2 + Y**2 + Z**2), 0.0)
        ds = SDFDataset(vertices=verts / 63 * 2 - 1, faces=faces,
                        num_samples=opt.num_samples, size=opt.epoch_size)
    else:
        ds = SDFDataset(opt.path, num_samples=opt.num_samples, size=opt.epoch_size)

    model = SDFNetwork(
        compute_dtype=jnp.bfloat16 if opt.fp16 else jnp.float32
    )
    tc = TrainConfig(name="ngp", workspace=opt.workspace, seed=opt.seed,
                     eval_interval=1, use_checkpoint=opt.ckpt)
    trainer = SDFTrainer(model, ds, tc, lr=opt.lr)
    if not opt.test:
        trainer.train(opt.epochs)
    trainer.save_mesh(resolution=opt.mesh_resolution)
    return trainer


if __name__ == "__main__":
    main()
