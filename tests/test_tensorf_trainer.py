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


def test_tensorf_kill_and_resume_across_upsample(tmp_path):
    """Resume from a checkpoint saved AFTER an upsample into a freshly built
    trainer at the pre-upsample resolution (the reference rebuilds the model
    to checkpoint shapes, tensoRF/utils.py:238-401)."""
    ds = make_synthetic_dataset(n_frames=4, H=32, W=32, num_steps=96)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=96, K=48, min_near=0.05)
    tc = TrainConfig(name="trf_resume", workspace=str(tmp_path), iters=100,
                     num_rays=256, steps_per_epoch=12, use_checkpoint="scratch")
    model = TensoRFNetwork(resolution=(24, 24, 24), sigma_rank=(4, 4, 4),
                           color_rank=(8, 8, 8))
    tr = TensoRFTrainer(model, ds, cfg, tc, upsample_model_steps=(10,),
                        resolution1=32)
    tr.epoch = 1
    tr.train_one_epoch(12)  # crosses the upsample milestone
    assert tr.model.resolution == (32, 32, 32)
    tr.save_checkpoint()

    # "kill" + fresh process: new trainer starts at the ORIGINAL resolution
    tc2 = TrainConfig(name="trf_resume", workspace=str(tmp_path), iters=100,
                      num_rays=256, steps_per_epoch=12, use_checkpoint="latest")
    model2 = TensoRFNetwork(resolution=(24, 24, 24), sigma_rank=(4, 4, 4),
                            color_rank=(8, 8, 8))
    tr2 = TensoRFTrainer(model2, ds, cfg, tc2, upsample_model_steps=(10,),
                         resolution1=32)
    assert tr2.model.resolution == (32, 32, 32)  # rebuilt to ckpt geometry
    assert tr2.global_step == tr.global_step
    a = np.asarray(tr.params["params"]["sigma_mat_0"])
    b = np.asarray(tr2.params["params"]["sigma_mat_0"])
    np.testing.assert_allclose(a, b)
    l = tr2.train_one_epoch(4)  # keeps training without shape errors
    assert np.isfinite(l)


def test_checkpoint_tolerant_and_best_drops_grid(tmp_path):
    """Best checkpoints omit the density grid (nerf/utils.py:1226-1228) and
    loads tolerate the missing key (:1254-1259)."""
    from tngp.data.synthetic import make_synthetic_dataset
    from tngp.models import NGPNetwork
    from tngp.train.trainer import Trainer

    ds = make_synthetic_dataset(n_frames=3, H=32, W=32, num_steps=96)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=96, K=48, min_near=0.05)
    tc = TrainConfig(name="ngp_best", workspace=str(tmp_path), iters=50,
                     num_rays=128, steps_per_epoch=4, use_checkpoint="scratch")
    tr = Trainer(NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12), ds, cfg, tc)
    tr.train_one_epoch(2)
    tr.save_checkpoint(best=True)
    import glob
    import os

    best = glob.glob(os.path.join(str(tmp_path), "checkpoints", "*.pth.npz"))[0]
    ep = glob.glob(os.path.join(str(tmp_path), "checkpoints", "*_ep*.npz"))
    assert not ep  # only the best file exists
    grid_before = np.asarray(tr.grid.bitfield).copy()
    tr.load_checkpoint(best)  # must not raise despite the missing grid
    np.testing.assert_array_equal(np.asarray(tr.grid.bitfield), grid_before)
