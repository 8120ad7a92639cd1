"""Multi-host (multi-process) initialization — the DCN story.

The reference scales with torch DDP over NCCL ranks (nerf/utils.py:325-327,
1104-1119); the TPU-native equivalent is the jax runtime's multi-controller
model: every host runs the same program, `jax.distributed.initialize` wires
the coordinator, and the SAME `Mesh(('data','model'))` code (mesh.py) spans
all hosts' devices — XLA routes 'data' all-reduces over DCN between hosts and
ICI within a host.  Nothing else in the trainer changes: sharding constraints
are global-view.

Environment contract (set by the launcher, torchrun-equivalent):
  TNGP_COORDINATOR   host:port of process 0       (e.g. "10.0.0.2:8476")
  TNGP_NUM_PROCESSES total process count
  TNGP_PROCESS_ID    this process's rank
Falls back to JAX's own cluster auto-detection (TPU pods, GKE) when unset.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime.  Returns True if a multi-process
    setup was initialized, False for single-process (no env, no args).

    Idempotent: repeated calls after successful init are no-ops."""
    coordinator = coordinator or os.environ.get("TNGP_COORDINATOR")
    if num_processes is None and os.environ.get("TNGP_NUM_PROCESSES"):
        num_processes = int(os.environ["TNGP_NUM_PROCESSES"])
    if process_id is None and os.environ.get("TNGP_PROCESS_ID"):
        process_id = int(os.environ["TNGP_PROCESS_ID"])

    if coordinator is None and num_processes is None:
        # TPU pod slices auto-detect through the cluster environment, but the
        # detection is unreliable on single-host tunneled setups (this image's
        # axon plugin sets TPU env vars without a coordinator) — require an
        # explicit TNGP_MULTIHOST=1 opt-in for auto-detection.
        if os.environ.get("TNGP_MULTIHOST"):
            jax.distributed.initialize()
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(n_model: int = 1):
    """('data','model') mesh over ALL processes' devices.

    Device order from jax.devices() is process-major, so the 'data' axis
    splits across hosts first — gradient all-reduce segments ride DCN once
    per host pair while 'model' collectives (table shards) stay on ICI
    within a host.  Requires total devices % n_model == 0."""
    from .mesh import make_mesh

    devices = jax.devices()
    return make_mesh(len(devices) // n_model, n_model, devices=devices)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
