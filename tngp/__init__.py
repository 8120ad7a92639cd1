"""tngp — a TPU-native instant-ngp-style neural rendering framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of torch-ngp
(instant-ngp NeRF + SDF, TensoRF VM/CP, CCNeRF, D-NeRF), built for TPU:

- static-shape budgeted ray marching instead of atomic stream compaction,
- associative-scan transmittance compositing instead of per-thread loops,
- gather/segment-sum hash-grid autodiff instead of atomicAdd scatter,
- bf16 MXU matmuls instead of fp16 wmma tensor cores,
- `jax.sharding` data/model meshes instead of DDP/NCCL.

Layer map (mirrors the reference's de-facto layering, SURVEY.md §1):
  ops/       pure-jnp golden numerics (hash grid, SH, compositing, marching, ...)
  kernels/   Pallas TPU kernels for the hot ops (same signatures as ops/)
  encoders/  encoder modules + `get_encoder` factory (reference encoding.py)
  models/    field networks: NGP NeRF, SDF, TensoRF VM/CP, CCNeRF, D-NeRF
  render/    occupancy grid state + volume renderer (train / eval paths)
  train/     trainer, metrics, EMA, checkpoints, lr schedules
  data/      dataset providers (transforms.json NeRF, mesh SDF, synthetic)
  parallel/  device mesh + sharding rules (data axis = rays, model axis = tables)
  native/    C++ runtime pieces (marching cubes, mesh SDF/BVH, obj IO)
  cli/       entry points with flag parity to main_nerf.py etc.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU lowers f32 matmuls at Precision.DEFAULT to a single bf16xbf16 MXU pass
# (bit-identical to pre-rounding both operands to bf16) while CPU computes
# true f32 — so every un-annotated f32 matmul/einsum (ray-direction rotation,
# compositing, custom-VJP einsums) silently carried ~0.4% device-only error
# and device-trained checkpoints evaluated ~7 dB lower on other backends.
# Framework stance: f32 means f32 everywhere; the hot paths that want MXU
# speed opt in EXPLICITLY (compute_dtype=bf16 MLPs, mxu_f32=False window
# kernels with a bf16-emulating reference path).  The tiny geometry/composite
# matmuls this default upgrades are nowhere near the step's critical path.
# NOTE: this mutates process-global JAX state — embedding applications that
# want DEFAULT-precision matmuls for their own code can opt out with
# TNGP_NO_GLOBAL_PRECISION=1 (tngp's own f32 correctness then rests on the
# per-call annotations in the kernels/ops, which remain explicit).
import os as _os

if not _os.environ.get("TNGP_NO_GLOBAL_PRECISION"):
    _jax.config.update("jax_default_matmul_precision", "float32")
