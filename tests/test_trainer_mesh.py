"""Trainer with a device mesh: trains on the 8-device CPU mesh (dp + sharded
hash table) and matches single-device loss trajectories."""

import jax
import numpy as np

from tngp.data import make_synthetic_dataset
from tngp.models import NGPNetwork
from tngp.parallel import make_mesh
from tngp.render import RenderConfig
from tngp.train import Trainer
from tngp.utils.config import TrainConfig


def make(tmp_path, mesh, shard_table, name):
    ds = make_synthetic_dataset(n_frames=4, H=32, W=32, seed=0, num_steps=96)
    model = NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=96, K=32, min_near=0.05)
    tc = TrainConfig(name=name, workspace=str(tmp_path), iters=100, num_rays=256,
                     steps_per_epoch=10, use_checkpoint="scratch")
    return Trainer(model, ds, cfg, tc, mesh=mesh, shard_table=shard_table)


def test_mesh_trainer_dp_tp(tmp_path):
    mesh = make_mesh(n_data=4, n_model=2)
    tr = make(tmp_path, mesh, shard_table=True, name="mesh")
    with mesh:
        l0 = tr.train_one_epoch(10)
        tr.epoch += 1
        l1 = tr.train_one_epoch(10)
    assert np.isfinite(l1) and l1 < l0 * 1.5

    # same seed, no mesh -> identical loss sequence (SPMD must be exact)
    tr2 = make(tmp_path, None, False, name="single")
    l0s = tr2.train_one_epoch(10)
    np.testing.assert_allclose(l0, l0s, rtol=2e-4)
