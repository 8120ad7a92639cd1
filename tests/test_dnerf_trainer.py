"""D-NeRF trainer end-to-end on a tiny dynamic synthetic scene (CPU)."""

import os
import subprocess
import sys

import numpy as np

from tngp.data.synthetic import make_synthetic_dynamic_dataset
from tngp.models import DNeRFNetwork
from tngp.render import RenderConfig
from tngp.train.dnerf_trainer import DNeRFTrainer
from tngp.utils.config import TrainConfig


def test_dnerf_trainer_end_to_end(tmp_path):
    ds = make_synthetic_dynamic_dataset(n_frames=4, H=32, W=32, num_steps=96)
    model = DNeRFNetwork(bound=1.0)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=96, K=48, K_eval=32,
                       min_near=0.05)
    tc = TrainConfig(name="dnerf", workspace=str(tmp_path), iters=100,
                     num_rays=256, steps_per_epoch=15, use_checkpoint="scratch")
    tr = DNeRFTrainer(model, ds, cfg, tc, time_size=4, update_interval=8)
    l0 = tr.train_one_epoch(15)
    tr.epoch += 1
    l1 = tr.train_one_epoch(15)
    assert np.isfinite(l1)
    assert l1 < l0 * 1.5  # noisy, but must not blow up

    img, dep = tr.render_image(ds.poses[0], time=float(ds.times[0]))
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()


def _tiny_variant_run(model, tmp_path, name):
    """Shared e2e harness for the --basis/--hyper variant trainers."""
    ds = make_synthetic_dynamic_dataset(n_frames=4, H=32, W=32, num_steps=96)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=96, K=48, K_eval=32,
                       min_near=0.05)
    tc = TrainConfig(name=name, workspace=str(tmp_path), iters=100,
                     num_rays=256, steps_per_epoch=15, use_checkpoint="scratch")
    tr = DNeRFTrainer(model, ds, cfg, tc, time_size=4, update_interval=8)
    l0 = tr.train_one_epoch(15)
    tr.epoch += 1
    l1 = tr.train_one_epoch(15)
    assert np.isfinite(l1)
    assert l1 < l0 * 1.5
    img, _ = tr.render_image(ds.poses[0], time=float(ds.times[0]))
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()


def test_dnerf_basis_trainer_end_to_end(tmp_path):
    from tngp.models import DNeRFBasisNetwork

    _tiny_variant_run(DNeRFBasisNetwork(bound=1.0), tmp_path, "dnerf_basis")


def test_dnerf_hyper_trainer_end_to_end(tmp_path):
    """FRESH INTERPRETER, same rationale as the dense-stream test below: the
    xdist gw3 arena segfault migrated here in round 5 (it is a property of a
    long-lived worker's accumulated XLA-CPU compile history, not of one
    specific test — this one passes alone, repeatedly)."""
    if os.environ.get("TNGP_DNERF_SUBPROC") == "1":
        from tngp.models import DNeRFHyperNetwork

        _tiny_variant_run(DNeRFHyperNetwork(bound=1.0), tmp_path, "dnerf_hyper")
        return
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x", "-p", "no:cacheprovider",
         __file__ + "::test_dnerf_hyper_trainer_end_to_end"],
        env={**os.environ, "TNGP_DNERF_SUBPROC": "1"},
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, (
        "subprocess run failed:\n" + r.stdout[-4000:] + "\n" + r.stderr[-2000:]
    )


def test_dnerf_trainer_dense_stream_path(tmp_path):
    """D-NeRF training through the dense-march + stream-compact path (the CLI
    default): the aux deform-reg scalar must flow through the compacted
    stream (renderer aux-on-stream branch).

    Runs in a FRESH INTERPRETER: this is the heaviest compile in the suite
    (D-NeRF field x triple-cond bucketed eval) and the round-2/3/4 xdist gw3
    segfault lived exactly here — it only reproduces in a long-lived xdist
    worker with a full-suite compile history (the test passes alone and in
    small groups; per-module jax.clear_caches() did NOT stop it).  Subprocess
    isolation removes the accumulated native XLA-CPU arena from the equation
    by construction."""
    if os.environ.get("TNGP_DNERF_SUBPROC") == "1":
        _dense_stream_body(tmp_path)
        return
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x", "-p", "no:cacheprovider",
         __file__ + "::test_dnerf_trainer_dense_stream_path"],
        env={**os.environ, "TNGP_DNERF_SUBPROC": "1"},
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, (
        "subprocess run failed:\n" + r.stdout[-4000:] + "\n" + r.stderr[-2000:]
    )


def _dense_stream_body(tmp_path):
    ds = make_synthetic_dynamic_dataset(n_frames=4, H=32, W=32, num_steps=64)
    model = DNeRFNetwork(bound=1.0)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=64, K=32, K_eval=32,
                       min_near=0.05, march_dense=True, compact_fraction=0.5)
    tc = TrainConfig(name="dnerf_ds", workspace=str(tmp_path), iters=100,
                     num_rays=256, steps_per_epoch=10, use_checkpoint="scratch")
    tr = DNeRFTrainer(model, ds, cfg, tc, time_size=4, update_interval=8)
    l0 = tr.train_one_epoch(10)
    tr.epoch += 1
    l1 = tr.train_one_epoch(10)
    assert np.isfinite(l1)
    assert l1 < l0 * 1.5
    img, _ = tr.render_image(ds.poses[0], time=float(ds.times[0]))
    assert np.isfinite(img).all()
