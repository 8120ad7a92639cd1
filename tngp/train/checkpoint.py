"""Checkpoint save/load with rotation and best-tracking.

Behavioral reference: torch-ngp `nerf/utils.py:1175-1311`:
  state = {epoch, global_step, stats, model, [full: optimizer, scheduler,
  scaler(absent here: bf16 needs no scaler), ema], [grid: mean_count,
  mean_density]}; rotation keeps `max_keep_ckpt`; best checkpoint drops the
  density grid to save space (:1226-1228); loads tolerate missing keys.

Format: msgpack via flax.serialization for the pytrees + a json sidecar of
scalars — dependency-free and mesh/sharding-agnostic (arrays are host numpy).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    workspace: str,
    name: str,
    epoch: int,
    global_step: int,
    payload: Dict[str, Any],  # pytrees: params, opt_state, ema, grid, ...
    stats: Optional[Dict[str, Any]] = None,
    max_keep: int = 2,
    best: bool = False,
) -> str:
    ckpt_dir = os.path.join(workspace, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    fname = (
        os.path.join(ckpt_dir, f"{name}.pth.npz")
        if best
        else os.path.join(ckpt_dir, f"{name}_ep{epoch:04d}.npz")
    )
    blob = serialization.to_bytes(_to_host(payload))
    meta = {"epoch": epoch, "global_step": global_step, "stats": stats or {}}
    with open(fname, "wb") as f:
        f.write(blob)
    with open(fname + ".json", "w") as f:
        json.dump(meta, f, default=float)  # numpy scalars -> json numbers

    if not best and max_keep > 0:
        ckpts = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.npz")))
        for old in ckpts[:-max_keep]:
            os.remove(old)
            if os.path.exists(old + ".json"):
                os.remove(old + ".json")
    return fname


def latest_checkpoint(workspace: str, name: str) -> Optional[str]:
    ckpts = sorted(glob.glob(os.path.join(workspace, "checkpoints", f"{name}_ep*.npz")))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: str, template: Dict[str, Any]):
    """Restore `template`-shaped payload from `path`. Returns (payload, meta)."""
    with open(path, "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return payload, meta
