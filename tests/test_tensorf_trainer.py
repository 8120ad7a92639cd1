"""TensoRF trainer end-to-end with an upsample milestone (CPU)."""

import numpy as np

from tngp.data.synthetic import make_synthetic_dataset
from tngp.models import TensoRFNetwork
from tngp.render import RenderConfig
from tngp.train.tensorf_trainer import TensoRFTrainer
from tngp.utils.config import TrainConfig


def test_tensorf_trainer_upsample(tmp_path):
    ds = make_synthetic_dataset(n_frames=4, H=32, W=32, num_steps=96)
    model = TensoRFNetwork(resolution=(24, 24, 24), sigma_rank=(4, 4, 4),
                           color_rank=(8, 8, 8))
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=96, K=48, min_near=0.05)
    tc = TrainConfig(name="trf", workspace=str(tmp_path), iters=100, num_rays=256,
                     steps_per_epoch=12, use_checkpoint="scratch")
    tr = TensoRFTrainer(model, ds, cfg, tc, upsample_model_steps=(10,),
                        resolution1=32)
    l0 = tr.train_one_epoch(12)  # crosses the upsample milestone at step 10
    assert tr.model.resolution == (32, 32, 32)
    tr.epoch += 1
    l1 = tr.train_one_epoch(12)
    assert np.isfinite(l1) and l1 < l0 * 2
    img, _ = tr.render_image(ds.poses[0], use_ema=False)
    assert np.isfinite(img).all()
