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
    geometry: Optional[Dict[str, Any]] = None,  # model shape info for rebuild-on-load
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
    if geometry is not None:
        meta["geometry"] = geometry
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


def load_meta(path: str) -> Dict[str, Any]:
    """Read the json sidecar alone (used to rebuild models to checkpoint
    geometry BEFORE deserializing arrays, tensoRF/utils.py:238-401)."""
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            return json.load(f)
    return {}


def _merge_state(template, loaded, path: str, report: Dict[str, list]):
    """Recursively overlay `loaded` (raw msgpack state dict) onto `template`
    (state dict), tolerating missing / unexpected / shape-mismatched entries
    like the reference's non-strict load (nerf/utils.py:1254-1259)."""
    if isinstance(template, dict):
        out = {}
        loaded = loaded if isinstance(loaded, dict) else {}
        for k, tv in template.items():
            if k in loaded:
                out[k] = _merge_state(tv, loaded[k], f"{path}/{k}", report)
            else:
                report["missing"].append(f"{path}/{k}")
                out[k] = tv
        for k in loaded:
            if k not in template:
                report["unexpected"].append(f"{path}/{k}")
        return out
    # leaf: accept only matching shapes (dtype is cast by from_state_dict)
    t_shape = getattr(template, "shape", None)
    l_shape = getattr(loaded, "shape", None)
    if t_shape is not None and l_shape is not None and tuple(t_shape) != tuple(l_shape):
        report["mismatched"].append(f"{path}: ckpt{tuple(l_shape)} != model{tuple(t_shape)}")
        return template
    return loaded


def load_checkpoint(path: str, template: Dict[str, Any], strict: bool = False):
    """Restore `template`-shaped payload from `path`. Returns (payload, meta).

    Non-strict (default): missing keys keep template values, unexpected keys
    are dropped, shape mismatches keep template values; a `_load_report` entry
    in meta lists all three (reference non-strict semantics,
    nerf/utils.py:1254-1259)."""
    with open(path, "rb") as f:
        blob = f.read()
    if strict:
        payload = serialization.from_bytes(template, blob)
        return payload, load_meta(path)
    raw = serialization.msgpack_restore(blob)
    tmpl_state = serialization.to_state_dict(_to_host(template))
    report = {"missing": [], "unexpected": [], "mismatched": []}
    merged = _merge_state(tmpl_state, raw, "", report)
    payload = serialization.from_state_dict(template, merged)
    meta = load_meta(path)
    meta["_load_report"] = report
    return payload, meta
