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
