"""Ray utility ops: AABB intersection, background-sphere coords.

Behavioral reference: torch-ngp `raymarching/src/raymarching.cu`:
  kernel_near_far_from_aabb (:92-145)  — slab test, min_near clamp, miss -> +inf
  kernel_sph_from_ray       (:163-198) — far sphere intersection -> (theta, phi)
                                         normalized to [-1, 1] (y-up)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# plain python float: a module-level jnp array would initialize the default
# backend (axon) at import time, before CLIs can apply TNGP_PLATFORM=cpu —
# and hangs every tngp import when the TPU tunnel is unreachable
_BIG = 3.4e38


def near_far_from_aabb(
    rays_o: jax.Array, rays_d: jax.Array, aabb: jax.Array, min_near: float = 0.05
):
    """Slab-test ray/AABB intersection.

    rays_o/rays_d `[..., 3]`, aabb `[6]` = (xmin, ymin, zmin, xmax, ymax, zmax).
    Returns (nears, fars) `[...]`; rays that miss get near = far = +big
    (matching the CUDA float max sentinel).  near is clamped to `min_near`.
    """
    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    inv_d = 1.0 / d  # +-inf for axis-parallel rays; IEEE semantics match CUDA
    t0 = (aabb[:3] - o) * inv_d
    t1 = (aabb[3:] - o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _BIG, near)
    far = jnp.where(miss, _BIG, far)
    return near.astype(rays_o.dtype), far.astype(rays_o.dtype)


def sph_from_ray(rays_o: jax.Array, rays_d: jax.Array, radius: float) -> jax.Array:
    """Intersect rays with the background sphere `||o + t d|| = radius` (larger
    root) and return `[..., 2]` (theta, phi) coords normalized to [-1, 1]."""
    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    A = jnp.sum(d * d, axis=-1)
    B = jnp.sum(o * d, axis=-1)
    C = jnp.sum(o * o, axis=-1) - radius * radius
    t = (-B + jnp.sqrt(jnp.maximum(B * B - A * C, 0.0))) / A
    p = o + t[..., None] * d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)  # [0, pi)
    phi = jnp.arctan2(z, x)  # [-pi, pi)
    inv_pi = 1.0 / jnp.pi
    out = jnp.stack([2.0 * theta * inv_pi - 1.0, phi * inv_pi], axis=-1)
    return out.astype(rays_o.dtype)
