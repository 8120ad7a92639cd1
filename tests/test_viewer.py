"""Web viewer drive: server endpoints, dynamic resolution, render overrides,
train-in-loop, and the D-NeRF time slider (reference GUI parity —
nerf/gui.py:135-141,101-106,252-262; dnerf/gui.py:75,129)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from tngp.cli.viewer import ViewerState, _orbit_pose
from tngp.data.synthetic import make_synthetic_dataset
from tngp.models import NGPNetwork
from tngp.render import RenderConfig
from tngp.train import Trainer
from tngp.utils.config import TrainConfig


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    ds = make_synthetic_dataset(n_frames=3, H=48, W=48, num_steps=96)
    model = NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12)
    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=64, K=32, K_eval=16,
                       min_near=0.05, density_thresh=0.5)
    tc = TrainConfig(name="vtest", workspace=str(tmp_path_factory.mktemp("ws")),
                     iters=10, num_rays=128, use_checkpoint="scratch", bf16=False)
    return Trainer(model, ds, cfg, tc)


def test_orbit_pose_orthonormal():
    p = _orbit_pose(1.2, 0.6, 2.5)
    R = p[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.norm(p[:3, 3]) - 2.5) < 1e-5


def test_render_image_resolution_override(tiny_trainer):
    img, dep = tiny_trainer.render_image(tiny_trainer.poses[0], W=32, H=32)
    assert img.shape == (32, 32, 3) and dep.shape == (32, 32)
    img2, _ = tiny_trainer.render_image(tiny_trainer.poses[0])
    assert img2.shape == (48, 48, 3)


def test_viewer_state_throttles(tiny_trainer):
    st = ViewerState(tiny_trainer)
    # slow renders shrink resolution (200ms target, floor 1/4)
    st.update_downscale(render_ms=3200.0, enabled=True)
    assert st.downscale == 0.25
    st.update_downscale(render_ms=10.0, enabled=True)
    assert st.downscale == 1.0
    st.update_downscale(render_ms=3200.0, enabled=False)
    assert st.downscale == 1.0
    # slow training shrinks steps-per-frame (500ms target, floor 4)
    st.train_steps = 16
    st.update_train_steps(train_ms=4000.0)
    assert st.train_steps == 4
    st.update_train_steps(train_ms=10.0)
    assert st.train_steps == 16
    # NGP trainer has no time axis
    assert not st.supports_time


def test_viewer_render_overrides_rebuild_cfg(tiny_trainer):
    """A GUI dt_gamma/max_steps override must affect the NEXT render
    (gui.py:252-262) — every cached eval program keyed on the old cfg has to
    be bypassed, including the FrameRenderer cache (the round-4 stale-cfg
    bug: a single cached instance kept rendering with the old settings)."""
    st = ViewerState(tiny_trainer)
    img0, _ = tiny_trainer.render_image(tiny_trainer.poses[0])  # builds + caches
    old_cfg = tiny_trainer.cfg
    st.apply_render_overrides({"dt_gamma": 0.004, "max_steps": 128})
    assert tiny_trainer.cfg.dt_gamma == 0.004
    assert tiny_trainer.cfg.max_steps == 128
    assert not hasattr(tiny_trainer, "_eval_fn")  # dropped for re-jit
    img, _ = tiny_trainer.render_image(tiny_trainer.poses[0])
    assert np.isfinite(img).all()
    # whichever eval path ran, no renderer built for old_cfg may have served
    # the post-override render at the default chunk
    frs = getattr(tiny_trainer, "_frame_renderers", {})
    if frs:
        assert any(fr.cfg == tiny_trainer.cfg for fr in frs.values())
        for (_, key_cfg), fr in frs.items():
            assert fr.cfg == key_cfg  # cache key matches instance cfg
    # reverting the overrides must reproduce the original render exactly
    # (same cfg + params, deterministic kernels) — fails if either direction
    # of the swap served a stale-cfg program
    st.apply_render_overrides({"dt_gamma": old_cfg.dt_gamma,
                               "max_steps": old_cfg.max_steps})
    assert tiny_trainer.cfg == old_cfg
    img2, _ = tiny_trainer.render_image(tiny_trainer.poses[0])
    np.testing.assert_allclose(img2, img0, atol=1e-6)


def test_viewer_http_endpoints(tiny_trainer):
    import socket

    import tngp.cli.viewer as V

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    t = threading.Thread(
        target=V.run_viewer, args=(tiny_trainer, port, 2), daemon=True
    )
    t.start()
    import time

    deadline = time.time() + 30
    page = None
    while time.time() < deadline:
        try:
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=5
            ).read()
            break
        except Exception:
            time.sleep(0.5)
    assert page and b"tngp viewer" in page

    def post(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps(body).encode(),
            method="POST",
        )
        resp = urllib.request.urlopen(req, timeout=120)
        stats = json.loads(resp.headers.get("X-Stats", "{}"))
        return resp.read(), stats

    jpg, stats = post({"theta": 1.2, "phi": 0.6, "radius": 2.5, "mode": "rgb"})
    assert jpg[:2] == b"\xff\xd8"  # JPEG magic
    assert stats["render_ms"] > 0 and stats["W"] > 0
    jpg_d, _ = post({"mode": "depth"})
    assert jpg_d[:2] == b"\xff\xd8"
    step0 = tiny_trainer.global_step
    _, stats_t = post({"mode": "rgb", "train": True})
    assert tiny_trainer.global_step > step0
    assert stats_t["train_steps"] >= 1 and "loss" in stats_t
