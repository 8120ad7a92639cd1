"""End-to-end trainer smoke on a tiny synthetic scene (CPU): loss drops,
eval runs, checkpoints roundtrip."""

import os

import jax.numpy as jnp
import numpy as np

from tngp.data import make_synthetic_dataset
from tngp.models import NGPNetwork
from tngp.render import RenderConfig
from tngp.train import Trainer
from tngp.utils.config import TrainConfig


def test_trainer_end_to_end(tmp_path):
    ds = make_synthetic_dataset(n_frames=6, H=40, W=40, seed=0, num_steps=128)
    model = NGPNetwork(bound=1.0, num_levels=8, log2_hashmap_size=14)
    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=128, K=48, K_eval=32,
                       min_near=0.05)
    tc = TrainConfig(name="t", workspace=str(tmp_path), iters=200, num_rays=512,
                     eval_interval=2, steps_per_epoch=25, use_checkpoint="scratch")
    tr = Trainer(model, ds, cfg, tc, valid_dataset=ds)

    l0 = tr.train_one_epoch(25)
    tr.train(max_epochs=3)  # continues to epoch 3, eval at epoch 2
    l1 = tr.stats["loss"][-1]
    assert l1 < l0, f"loss did not drop: {l0} -> {l1}"
    assert tr.stats["best_result"] is not None  # eval ran

    img, dep = tr.render_image(ds.poses[0])
    assert img.shape == (40, 40, 3) and np.isfinite(img).all()

    # checkpoint roundtrip
    tr.save_checkpoint()
    ckpts = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert any(f.endswith(".npz") for f in ckpts)

    tr2 = Trainer(model, ds, cfg, tc, valid_dataset=ds)  # use_checkpoint=scratch
    from tngp.train import latest_checkpoint

    path = latest_checkpoint(str(tmp_path), "t")
    tr2.load_checkpoint(path)
    assert tr2.global_step == tr.global_step
    p1 = jnp.concatenate([x.reshape(-1) for x in
                          __import__("jax").tree_util.tree_leaves(tr.params)])
    p2 = jnp.concatenate([x.reshape(-1) for x in
                          __import__("jax").tree_util.tree_leaves(tr2.params)])
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_trainer_error_map(tmp_path):
    ds = make_synthetic_dataset(n_frames=4, H=32, W=32, seed=1, num_steps=64)
    model = NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=64, K=32, min_near=0.05)
    tc = TrainConfig(name="em", workspace=str(tmp_path), iters=100, num_rays=256,
                     error_map=True, steps_per_epoch=10, use_checkpoint="scratch")
    tr = Trainer(model, ds, cfg, tc)
    tr.train_one_epoch(10)
    em = np.asarray(tr.error_map)
    assert em.shape == (4, 128 * 128)
    assert not np.allclose(em, 1.0)  # updated somewhere


def test_trainer_uniform_path(tmp_path):
    """The reference's non-cuda `run()` path: uniform + PDF sampling trainer."""
    ds = make_synthetic_dataset(n_frames=4, H=32, W=32, seed=2, num_steps=96)
    model = NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=64, K=32, min_near=0.05,
                       num_steps=32, upsample_steps=32)
    tc = TrainConfig(name="ug", workspace=str(tmp_path), iters=100, num_rays=256,
                     steps_per_epoch=15, use_checkpoint="scratch")
    tr = Trainer(model, ds, cfg, tc, use_grid=False)
    l0 = tr.train_one_epoch(15)
    tr.epoch += 1
    l1 = tr.train_one_epoch(15)
    assert np.isfinite(l1) and l1 < l0
    img, dep = tr.render_image(ds.poses[0], use_ema=False)
    assert np.isfinite(img).all()


def test_trainer_adaptive_budget(tmp_path):
    """Budget-tier ladder (reference mean_count semantics): the trainer
    switches to smaller precompiled budgets when demand leaves headroom and
    climbs back when rays get dropped; each tier's step stays usable."""
    ds = make_synthetic_dataset(n_frames=4, H=32, W=32, seed=3, num_steps=64)
    model = NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=64, K=32,
                       min_near=0.05, march_dense=True, compact_fraction=0.5,
                       density_thresh=0.5)
    tc = TrainConfig(name="ab", workspace=str(tmp_path), iters=100,
                     num_rays=256, steps_per_epoch=18,
                     use_checkpoint="scratch", adaptive_budget=True)
    tr = Trainer(model, ds, cfg, tc)
    assert tr._tier_fracs is not None and tr._tier == 2
    assert tr._tier_M == sorted(tr._tier_M)
    # overdrive tier above the configured fraction (reference mean_count
    # grows with demand — the error-map interaction fix)
    assert len(tr._tier_fracs) == 4 and tr._tier_fracs[3] > cfg.compact_fraction

    # mechanics: drop to the smallest tier, then climb on ray drops
    tr._adapt_tier(demand=10.0, kept_frac=1.0)
    assert tr._tier == 1
    tr._adapt_tier(demand=10.0, kept_frac=1.0)
    assert tr._tier == 0
    tr._adapt_tier(demand=10.0, kept_frac=0.5)
    assert tr._tier == 1
    # sustained drops climb through the configured fraction into overdrive
    tr._adapt_tier(demand=1e9, kept_frac=0.5)
    tr._adapt_tier(demand=1e9, kept_frac=0.5)
    assert tr._tier == 3
    # overdrive step trains without error
    l_over = tr.train_one_epoch(2)
    assert np.isfinite(l_over)
    # and falls back once demand clears
    tr._adapt_tier(demand=10.0, kept_frac=1.0)
    assert tr._tier == 2
    tr._tier = 0
    tr._train_step = tr._tier_steps[0]
    # the switched-to step function trains without error and loss is finite
    l0 = tr.train_one_epoch(18)
    assert np.isfinite(l0)

    # subclass trainers / non-dense configs never build the ladder
    cfg2 = RenderConfig(bound=1.0, grid_size=16, max_steps=64, K=32,
                        min_near=0.05)
    tr2 = Trainer(model, ds, cfg2, tc)
    assert tr2._tier_fracs is None
