"""CCNeRF rank-residual training smoke (CPU)."""

import numpy as np

from tngp.data.synthetic import make_synthetic_dataset
from tngp.models.ccnerf import CCConfig
from tngp.render import RenderConfig
from tngp.train.cc_trainer import CCTrainer
from tngp.utils.config import TrainConfig


def test_cc_trainer(tmp_path):
    ds = make_synthetic_dataset(n_frames=4, H=32, W=32, num_steps=96)
    cc_cfg = CCConfig(
        resolution=(24, 24, 24),
        rank_vec_density=(4, 8), rank_mat_density=(0, 2),
        rank_vec=(4, 8), rank_mat=(0, 2),
    )
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=96, K=48, min_near=0.05)
    tc = TrainConfig(name="cc", workspace=str(tmp_path), iters=100, num_rays=256,
                     steps_per_epoch=10, use_checkpoint="scratch")
    tr = CCTrainer(cc_cfg, ds, cfg, tc)
    l0 = tr.train_one_epoch(10)
    tr.epoch += 1
    l1 = tr.train_one_epoch(10)
    assert np.isfinite(l1) and l1 < l0 * 1.5

    img, _ = tr.render_image(ds.poses[0], use_ema=False)
    assert np.isfinite(img).all()
