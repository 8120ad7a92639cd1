"""CLI smoke tests: drive the actual entry points end-to-end in subprocesses
on the CPU backend (TNGP_PLATFORM=cpu) with tiny configs."""

import os
import subprocess
import sys

import pytest


def run_cli(args, tmp_path, timeout=600, synth="6,48,48"):
    # NOTE: wall-time sensitive under concurrent load; run serially
    env = dict(os.environ)
    env["TNGP_PLATFORM"] = "cpu"
    env["TNGP_SYNTH"] = synth
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    return subprocess.run(
        [sys.executable, "-m"] + args, capture_output=True, text=True,
        timeout=timeout, cwd=str(tmp_path), env=env,
    )


def test_main_sdf_sphere(tmp_path):
    r = run_cli(
        ["tngp.cli.main_sdf", "sphere", "--epochs", "1", "--num_samples", "4096",
         "--epoch_size", "20", "--mesh_resolution", "32", "--workspace", "ws"],
        tmp_path, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[save_mesh]" in r.stdout
    assert (tmp_path / "ws" / "results" / "mesh.ply").exists()


def test_main_nerf_synthetic(tmp_path):
    """Flagship entry point smoke — always on (trimmed to fit the default
    test budget; the bigger config behind TNGP_RUN_SLOW_CLI is gone)."""
    r = run_cli(
        ["tngp.cli.main_nerf", "synthetic", "--iters", "8", "--num_rays", "128",
         "--max_steps", "48", "--sample_budget", "16", "--bound", "1.0",
         "--dt_gamma", "0", "--min_near", "0.05", "--eval_interval", "100",
         "--skip_test_render", "--mesh_resolution", "24",
         "--workspace", "ws"],
        tmp_path, timeout=600, synth="4,32,32",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epoch" in r.stdout
    assert (tmp_path / "ws" / "checkpoints").exists()
    assert "[eval" in r.stdout and "[save_mesh]" in r.stdout
