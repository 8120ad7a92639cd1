"""Windowed hash-table parameterization — the TPU-local layout of the
multiresolution grid encoder.

Why this exists (see PERF.md "Round-2 encoder design")
------------------------------------------------------
The CUDA encoder (gridencoder/src/gridencoder.cu:88-337) random-gathers and
atomically scatter-adds over a 2^19-row table per level.  XLA's TPU gather
runs ~150M idx/s and scatter ~12M idx/s — 10-130x off the speed of light —
and Mosaic has no vector gather/scatter over large VMEM operands.  The only
TPU-fast formulation is the MXU: with a *small* table window resident in
VMEM, a gather is `onehot(idx_hi) @ window` and the scatter-add backward is
the transposed matmul `onehot(idx_hi)^T @ onehot-weighted-grads` — dense,
deterministic, systolic.

That requires spatial locality: every sample in a compute block must touch
one window.  So this module re-parameterizes each level's table as per-tile
windows:

* space ([0,1]^3) is cut into P = 4^3 = 64 tiles;
* each level owns `n_win` windows of 8192 rows (hi = row>>7 in [0,64),
  lo = row & 127 on the 128-lane axis);
* a tile maps to window `tile * n_win // 64`; every corner lookup of a sample
  uses the *sample's* tile window ("clamped-tile" semantics — for hashed
  levels this is just a tile-dependent hash function, same collision class
  as the reference's spatial hash);
* levels small enough to fit one window (side^3 <= 8192) keep the exact
  dense strided indexing of the reference (gridencoder.cu:67-84) — bitwise
  identical lookups;
* larger levels hash with the reference's XOR-prime `fast_hash`
  (gridencoder.cu:54) masked to the window.

Total parameter count stays within one window-round-up of the reference
sizing (min(2^log2_hashmap_size, side^3) per level).

The canonical parameter is a flat `[total_rows, level_dim]` array (row-major
by (level, window, hi, lo)) so optimizers / sharding / checkpoints treat it
exactly like the golden layout.  `window_view` reshapes it (free) to the
kernel layout `[n_windows, 64, 128, level_dim]`.

This module holds the *spec* and a pure-XLA reference implementation of the
semantics (used on CPU and as the golden for the Pallas kernel in
tngp/kernels/window_encoder.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

WIN_ROWS = 8192
WIN_HI = WIN_ROWS // 128  # 64 sublane groups
WIN_LANES = 128
TILES_SIDE = 4
N_TILES = TILES_SIDE**3  # 64

# fast_hash primes for dims 0..2 (gridencoder.cu:54; prime[0] == 1)
_P1 = 2654435761
_P2 = 805459861


@dataclass(frozen=True)
class WindowSpec:
    """Static geometry of the windowed grid encoder (hashable, jit-safe)."""

    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    per_level_scale: float = 2.0
    log2_hashmap_size: int = 19
    align_corners: bool = False
    interpolation: str = "linear"  # 'linear' | 'smoothstep'

    @staticmethod
    def create(
        num_levels: int = 16,
        level_dim: int = 2,
        base_resolution: int = 16,
        per_level_scale: float = 2.0,
        log2_hashmap_size: int = 19,
        desired_resolution: int | None = None,
        align_corners: bool = False,
        interpolation: str = "linear",
    ) -> "WindowSpec":
        if desired_resolution is not None:
            per_level_scale = float(
                np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
            )
        return WindowSpec(
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            per_level_scale=float(per_level_scale),
            log2_hashmap_size=log2_hashmap_size,
            align_corners=align_corners,
            interpolation=interpolation,
        )

    # ---- static derived geometry (all plain python/numpy) -------------------

    def level_scale(self, level: int) -> float:
        return 2.0 ** (level * math.log2(self.per_level_scale)) * self.base_resolution - 1.0

    def level_side(self, level: int) -> int:
        res = int(math.ceil(self.level_scale(level))) + 1
        return res if self.align_corners else res + 1

    def level_dense(self, level: int) -> bool:
        return self.level_side(level) ** 3 <= WIN_ROWS

    def level_n_win(self, level: int) -> int:
        cells = self.level_side(level) ** 3
        cap = 2**self.log2_hashmap_size
        return max(1, min(N_TILES, -(-min(cells, cap) // WIN_ROWS)))

    @property
    def win_offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for l in range(self.num_levels):
            offs.append(offs[-1] + self.level_n_win(l))
        return tuple(offs)

    @property
    def n_windows(self) -> int:
        return self.win_offsets[-1]

    @property
    def total_rows(self) -> int:
        return self.n_windows * WIN_ROWS

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def tile_window(self, level: int) -> np.ndarray:
        """[N_TILES] int32: window index (within the level) for each tile."""
        nw = self.level_n_win(level)
        return (np.arange(N_TILES, dtype=np.int32) * nw) // N_TILES

    # packed per-level constant tables for the kernels -----------------------

    def const_tables(self):
        """(scales f32 [L], sides i32 [L], dense i32 [L], twin i32 [L, 64],
        woff i32 [L]) as numpy."""
        L = self.num_levels
        scales = np.array([self.level_scale(l) for l in range(L)], np.float32)
        sides = np.array([self.level_side(l) for l in range(L)], np.int32)
        dense = np.array([int(self.level_dense(l)) for l in range(L)], np.int32)
        twin = np.stack([self.tile_window(l) for l in range(L)]).astype(np.int32)
        woff = np.array(self.win_offsets[:-1], np.int32)
        return scales, sides, dense, twin, woff

    def init_table(self, key: jax.Array, dtype=jnp.float32) -> jax.Array:
        """U(-1e-4, 1e-4) init matching the reference (grid.py:796-798).
        Canonical flat layout [total_rows, C]."""
        return jax.random.uniform(
            key, (self.total_rows, self.level_dim), dtype=dtype,
            minval=-1e-4, maxval=1e-4,
        )

    def init_table_win(self, key: jax.Array, dtype=jnp.float32) -> jax.Array:
        """Same init in the transposed window layout [NW, C, 128, 64] — the
        *parameter* format of the binned TPU path (keeping it avoids a 50 MB
        transpose per train step to build the tile-major fat table)."""
        return jax.random.uniform(
            key, (self.n_windows, self.level_dim, WIN_LANES, WIN_HI),
            dtype=dtype, minval=-1e-4, maxval=1e-4,
        )


def window_view(table: jax.Array, spec: WindowSpec) -> jax.Array:
    """[total_rows, C] canonical -> [n_windows, C, WIN_LANES, WIN_HI]
    transposed kernel layout (samples ride the lane axis in the kernels, so
    the window matmul operand wants hi on lanes: G^T = win^T @ onehot^T)."""
    C = spec.level_dim
    return table.reshape(spec.n_windows, WIN_HI, WIN_LANES, C).transpose(0, 3, 2, 1)


def window_unview(win: jax.Array, spec: WindowSpec) -> jax.Array:
    """Inverse of window_view: [NW, C, WIN_LANES, WIN_HI] -> [total_rows, C]."""
    C = spec.level_dim
    return win.transpose(0, 3, 2, 1).reshape(spec.total_rows, C)


def sample_tiles(x01_cf: jax.Array) -> jax.Array:
    """[3, B] in [0,1] -> [B] int32 tile id (x-major, z-fastest linear order)."""
    ti = jnp.clip(jnp.floor(x01_cf * TILES_SIDE), 0, TILES_SIDE - 1).astype(jnp.int32)
    return (ti[0] * TILES_SIDE + ti[1]) * TILES_SIDE + ti[2]


def _corner_rows(
    spec: WindowSpec, level: int, x01: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-corner window rows + interp weights at `level`.

    x01: [3, B] in [0,1].  Returns (rows [8, B] int32 in [0, WIN_ROWS),
    weights [8, B] f32)."""
    scale = spec.level_scale(level)
    side = spec.level_side(level)
    shift = 0.0 if spec.align_corners else 0.5
    pos = x01.astype(jnp.float32) * scale + shift
    pg = jnp.floor(pos)
    frac = pos - pg
    if spec.interpolation == "smoothstep":
        frac = frac * frac * (3.0 - 2.0 * frac)
    pgi = pg.astype(jnp.int32)
    rows, ws = [], []
    for k in range(8):
        cc = [pgi[d] + ((k >> d) & 1) for d in range(3)]
        if spec.level_dense(level):
            row = cc[0] + cc[1] * side + cc[2] * side * side
        else:
            h = (
                cc[0].astype(jnp.uint32)
                ^ (cc[1].astype(jnp.uint32) * jnp.uint32(_P1))
                ^ (cc[2].astype(jnp.uint32) * jnp.uint32(_P2))
            )
            row = (h & jnp.uint32(WIN_ROWS - 1)).astype(jnp.int32)
        rows.append(row)
        w = jnp.ones_like(frac[0])
        for d in range(3):
            w = w * (frac[d] if (k >> d) & 1 else 1.0 - frac[d])
        ws.append(w)
    return jnp.stack(rows), jnp.stack(ws)


@partial(jax.jit, static_argnames=("spec", "emulate_bf16"))
def window_encode_ref(
    x01_cf: jax.Array,
    table: jax.Array,
    spec: WindowSpec,
    emulate_bf16: bool = False,
) -> jax.Array:
    """Pure-XLA reference of the windowed encoding semantics.

    x01_cf: [3, B] in [0,1]; table: [total_rows, C].  Returns [L*C, B]
    (level-major feature order, matching ops/hashgrid.py).  Differentiable by
    XLA autodiff — the golden for the Pallas kernel and the CPU fallback.

    emulate_bf16=True reproduces the Pallas kernel's bf16-operand MXU pass
    (the `mxu_f32=False` training default): table values and interpolation
    weights round to bf16, products/accumulation stay f32 (bf16xbf16
    products are exact in f32, so this emulation is bitwise-faithful up to
    accumulation order).  Without it, checkpoints trained on-device deviate
    ~1% per feature on other backends — the round-2 8 dB cross-backend eval
    gap.  Mirrors the reference's fp16 table semantics under `-O`
    (gridencoder supports fp16 embeddings, nerf/network.py fp16 path).
    """
    L, C = spec.num_levels, spec.level_dim
    B = x01_cf.shape[1]
    tile = sample_tiles(x01_cf)  # [B]
    table_t = table.astype(jnp.float32).T  # [C, total_rows]
    outs = []
    for level in range(L):
        rows, ws = _corner_rows(spec, level, x01_cf)  # [8, B]
        twin = jnp.asarray(spec.tile_window(level))
        w_id = spec.win_offsets[level] + jnp.take(twin, tile)  # [B]
        grow = w_id[None, :] * WIN_ROWS + rows  # [8, B] global rows
        vals = jnp.take(table_t, grow.reshape(-1), axis=1)  # [C, 8B]
        vals = vals.reshape(C, 8, B)
        if emulate_bf16:
            vals = vals.astype(jnp.bfloat16).astype(jnp.float32)
            ws = ws.astype(jnp.bfloat16).astype(jnp.float32)
        outs.append(jnp.sum(ws[None] * vals, axis=1))  # [C, B]
    return jnp.concatenate(outs, axis=0).astype(table.dtype)  # [(l,c) major, B]
