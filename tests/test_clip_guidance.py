"""CLIP/rand_pose GT-free training path with the stub embedder (CPU).

Reference hooks: nerf/utils.py:431-434,485-499 (rand-pose batches swap the MSE
loss for -cos_sim(CLIP(render), CLIP(text))).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tngp.data.synthetic import make_synthetic_dataset
from tngp.models import NGPNetwork
from tngp.render import RenderConfig
from tngp.train.clip_guidance import StubEmbedder
from tngp.train.trainer import Trainer
from tngp.utils.config import TrainConfig


def test_clip_rand_pose_training(tmp_path):
    ds = make_synthetic_dataset(n_frames=3, H=32, W=32, num_steps=96)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=96, K=48, min_near=0.05)
    tc = TrainConfig(name="clipngp", workspace=str(tmp_path), iters=50,
                     num_rays=256, steps_per_epoch=6, use_checkpoint="scratch",
                     rand_pose=3, clip_text="a red sphere")
    emb = StubEmbedder()
    tr = Trainer(NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12),
                 ds, cfg, tc, clip_embedder=emb)
    assert tr._clip_step is not None
    p0 = np.asarray(tr.params["params"]["sigma_net"]["dense_0"]).copy()
    loss = tr.train_one_epoch(6)  # steps 0 and 3 are clip steps
    assert np.isfinite(loss)
    # the clip step itself must run and return a finite loss
    closs = tr.run_clip_step()
    assert np.isfinite(closs)
    p1 = np.asarray(tr.params["params"]["sigma_net"]["dense_0"])
    assert not np.allclose(p0, p1)  # gradients flowed


def test_clip_step_descends_stub_similarity(tmp_path):
    """Repeated clip steps should not diverge and should (noisily) improve
    the stub similarity objective."""
    ds = make_synthetic_dataset(n_frames=3, H=32, W=32, num_steps=96)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=96, K=48, min_near=0.05)
    tc = TrainConfig(name="clipdesc", workspace=str(tmp_path), iters=50,
                     num_rays=256, steps_per_epoch=4, use_checkpoint="scratch",
                     rand_pose=1, clip_text="a blue cube", lr=5e-3)
    tr = Trainer(NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12),
                 ds, cfg, tc, clip_embedder=StubEmbedder())
    losses = [tr.run_clip_step() for _ in range(12)]
    assert np.isfinite(losses).all()
    assert min(losses[6:]) <= losses[0] + 1e-3  # descending-ish, not diverging
