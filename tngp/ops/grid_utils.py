"""Occupancy-grid utility ops: morton codes, bit packing, bitfield probes.

Behavioral reference: torch-ngp `raymarching/src/raymarching.cu`:
  __expand_bits / __morton3D / __morton3D_invert  (:56-81)
  kernel_packbits                                  (:268-289)

TPU-first note: the CUDA marcher stores the density grid in Morton order for
cache locality of the DDA walk.  On TPU all probes are batched gathers, so the
framework stores the grid in plain *linear* (x-major) order; `morton3d` /
`morton3d_invert` are still provided for API/tooling parity and for converting
reference checkpoints.  Bit order inside each packed byte matches the CUDA
kernel: cell i maps to byte i>>3, bit (1 << (i & 7)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand_bits(v: jax.Array) -> jax.Array:
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jax.Array) -> jax.Array:
    """`[..., 3]` int coords (10 bits each) -> `[...]` uint32 morton codes."""
    c = coords.astype(jnp.uint32)
    xx = _expand_bits(c[..., 0])
    yy = _expand_bits(c[..., 1])
    zz = _expand_bits(c[..., 2])
    return xx | (yy << 1) | (zz << 2)


def _compact_bits(x: jax.Array) -> jax.Array:
    x = x & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(codes: jax.Array) -> jax.Array:
    """`[...]` uint32 morton codes -> `[..., 3]` int32 coords."""
    c = codes.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(c), _compact_bits(c >> 1), _compact_bits(c >> 2)], axis=-1
    ).astype(jnp.int32)


def packbits(grid: jax.Array, thresh: jax.Array | float) -> jax.Array:
    """Pack density grid `[..., N]` (N % 8 == 0) into a uint8 bitfield `[..., N//8]`.

    bit i of byte b is set iff grid[b*8+i] > thresh (raymarching.cu:281-288).
    """
    occ = (grid > thresh).astype(jnp.uint8)
    occ = occ.reshape(*grid.shape[:-1], grid.shape[-1] // 8, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)).astype(jnp.uint8)
    return (occ * weights).sum(axis=-1).astype(jnp.uint8)


def bitfield_probe(bitfield: jax.Array, cell_index: jax.Array) -> jax.Array:
    """Test occupancy bits: flat `bitfield` uint8, int cell indices -> bool.

    Probes through an int32-word view (4 bytes/word) — TPU gathers are
    index-count-bound, so word probes cut the gather count 4x vs byte probes
    while preserving the CUDA bit convention (byte i>>3, bit 1<<(i&7))."""
    idx = cell_index.astype(jnp.uint32)
    words = jax.lax.bitcast_convert_type(
        bitfield.reshape(-1, 4), jnp.int32
    )  # little-endian: byte b is bits [8b, 8b+8)
    w = jnp.take(words, (idx >> 5).astype(jnp.int32), axis=0)
    bit = (w >> (idx & 31).astype(jnp.int32)) & 1
    return bit.astype(jnp.bool_)
