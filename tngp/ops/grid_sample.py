"""Bilinear grid sampling, channels-first — the TensoRF lookup primitive.

Behavioral reference: `F.grid_sample(..., align_corners=True)` with zeros
padding as used by tensoRF/network.py:112-151 (plane [1, R, H, W] sampled at
normalized coords in [-1, 1]; lines as fake-2D [1, R, D, 1]).

TPU layout: features stay `[R, B]` (batch minor); the plane is flattened to
`[R, H*W]` and corners fetched with 32-bit gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d_cf(
    plane: jax.Array, u: jax.Array, v: jax.Array, align_corners: bool = True
) -> jax.Array:
    """plane [R, H, W]; u (width coord), v (height coord) in [-1, 1], shape [B].

    Returns [R, B].  Out-of-range corners contribute zero (torch zeros
    padding).  align_corners=False uses torch's pixel-center convention
    (((u+1)*W - 1) / 2), as used by CCNeRF (network_cc.py grid_sample calls).
    """
    R, H, W = plane.shape
    if align_corners:
        fx = (u.astype(jnp.float32) + 1.0) * 0.5 * (W - 1)
        fy = (v.astype(jnp.float32) + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((u.astype(jnp.float32) + 1.0) * W - 1.0) * 0.5
        fy = ((v.astype(jnp.float32) + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = plane.reshape(R, H * W)
    out = jnp.zeros((R, u.shape[0]), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            val = jnp.take(flat, idx, axis=1)  # [R, B]
            w = (tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
            out = out + val * (w * inb.astype(jnp.float32))[None, :]
    return out


def grid_sample_1d_cf(
    line: jax.Array, w: jax.Array, align_corners: bool = True
) -> jax.Array:
    """line [R, D]; w in [-1, 1], shape [B] -> [R, B]."""
    R, D = line.shape
    if align_corners:
        fx = (w.astype(jnp.float32) + 1.0) * 0.5 * (D - 1)
    else:
        fx = ((w.astype(jnp.float32) + 1.0) * D - 1.0) * 0.5
    x0 = jnp.floor(fx)
    tx = fx - x0
    x0i = x0.astype(jnp.int32)
    out = jnp.zeros((R, w.shape[0]), jnp.float32)
    for dx in (0, 1):
        xi = x0i + dx
        inb = (xi >= 0) & (xi < D)
        val = jnp.take(line, jnp.clip(xi, 0, D - 1), axis=1)
        wgt = (tx if dx else 1.0 - tx) * inb.astype(jnp.float32)
        out = out + val * wgt[None, :]
    return out
