"""Multiresolution hash/tiled grid encoding — pure-jnp golden implementation.

Behavioral reference: torch-ngp `gridencoder/src/gridencoder.cu` (kernel_grid,
get_grid_index, fast_hash) and `gridencoder/grid.py:754-819` (GridEncoder).

TPU-first design notes
----------------------
The CUDA version launches one thread per (point, level) and scatter-adds the
gradient with atomicAdd.  Here the forward is a single batched gather over a
flat `[total_params, C]` table (8 corners x L levels of indices computed with
static per-level strides), and the backward is whatever XLA derives for the
gather — a deterministic scatter-add — so no custom VJP is needed for
correctness.  All index math is uint32 with wraparound, exactly matching the
CUDA `fast_hash` / `get_grid_index` logic, so tables are interchangeable with
the reference layout.

Level geometry (matches gridencoder.cu:137-156):
  S     = log2(per_level_scale)
  scale = 2^(level*S) * H - 1          (H = base_resolution)
  res   = ceil(scale) + 1
  pos   = x * scale + (0 if align_corners else 0.5)
Table sizing (matches grid.py:776-789):
  params_in_level = min(2^log2_hashmap_size, (res if align else res+1)^D)
  rounded up to a multiple of 8.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Spatial hash primes, gridencoder.cu:54 (standard instant-ngp constants).
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)

GRIDTYPE_HASH = "hash"
GRIDTYPE_TILED = "tiled"


@dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of a multiresolution grid encoder (hashable, jit-safe)."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    per_level_scale: float = 2.0
    log2_hashmap_size: int = 19
    gridtype: str = GRIDTYPE_HASH
    align_corners: bool = False
    interpolation: str = "linear"  # 'linear' | 'smoothstep'
    # Whether the custom-VJP backward computes dL/dx (the CUDA dy_dx path,
    # gridencoder.cu:196-241).  It costs a full extra table gather per level;
    # paths whose positions are non-differentiable (NGP training: positions
    # come from the march) should disable it rather than rely on XLA DCE
    # across the custom_vjp boundary.  D-NeRF's deform backprop needs it.
    input_grad: bool = True

    @staticmethod
    def create(
        input_dim: int = 3,
        num_levels: int = 16,
        level_dim: int = 2,
        base_resolution: int = 16,
        per_level_scale: float = 2.0,
        log2_hashmap_size: int = 19,
        desired_resolution: int | None = None,
        gridtype: str = GRIDTYPE_HASH,
        align_corners: bool = False,
        interpolation: str = "linear",
        input_grad: bool = True,
    ) -> "HashGridSpec":
        # desired_resolution overrides per_level_scale (grid.py:758-760)
        if desired_resolution is not None:
            per_level_scale = float(
                np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
            )
        return HashGridSpec(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            per_level_scale=float(per_level_scale),
            log2_hashmap_size=log2_hashmap_size,
            gridtype=gridtype,
            align_corners=align_corners,
            interpolation=interpolation,
            input_grad=input_grad,
        )

    # ---- static derived geometry -------------------------------------------------

    @property
    def s_log2(self) -> float:
        return math.log2(self.per_level_scale)

    def level_scale(self, level: int) -> float:
        return 2.0 ** (level * self.s_log2) * self.base_resolution - 1.0

    def level_resolution(self, level: int) -> int:
        return int(math.ceil(self.level_scale(level))) + 1

    @property
    def max_params(self) -> int:
        return 2 ** self.log2_hashmap_size

    @property
    def offsets(self) -> Tuple[int, ...]:
        offs = [0]
        for l in range(self.num_levels):
            res = int(np.ceil(self.base_resolution * self.per_level_scale**l))
            side = res if self.align_corners else res + 1
            params = min(self.max_params, side**self.input_dim)
            params = int(math.ceil(params / 8) * 8)
            offs.append(offs[-1] + params)
        return tuple(offs)

    @property
    def total_params(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def init_table(self, key: jax.Array, dtype=jnp.float32) -> jax.Array:
        """U(-1e-4, 1e-4) init, grid.py:796-798."""
        return jax.random.uniform(
            key, (self.total_params, self.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
        )


def _corner_offsets(input_dim: int) -> np.ndarray:
    """[2^D, D] binary corner offsets, unrolled like gridencoder.cu:164-177."""
    n = 1 << input_dim
    return np.array(
        [[(idx >> d) & 1 for d in range(input_dim)] for idx in range(n)], dtype=np.int64
    )


def _level_indices(spec: HashGridSpec, level: int, corner_coords: jax.Array) -> jax.Array:
    """uint32 table row index for integer corner coords `[..., D]` at `level`.

    Mirrors get_grid_index (gridencoder.cu:67-84): dense strided index while the
    running stride fits in the level's hashmap, else spatial hash; modulo the
    level size; plus the level offset into the flat table.
    """
    offsets = spec.offsets
    hashmap_size = offsets[level + 1] - offsets[level]
    res = spec.level_resolution(level)
    side = res if spec.align_corners else res + 1

    cc = corner_coords.astype(jnp.uint32)
    index = jnp.zeros(cc.shape[:-1], dtype=jnp.uint32)
    stride = 1
    for d in range(spec.input_dim):
        if stride > hashmap_size:
            break
        index = index + cc[..., d] * jnp.uint32(stride & 0xFFFFFFFF)
        stride *= side
    use_hash = spec.gridtype == GRIDTYPE_HASH and stride > hashmap_size
    if use_hash:
        h = jnp.zeros(cc.shape[:-1], dtype=jnp.uint32)
        for d in range(spec.input_dim):
            h = h ^ (cc[..., d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
        index = h
    return (index % jnp.uint32(hashmap_size)) + jnp.uint32(offsets[level])


@partial(jax.jit, static_argnames=("spec",))
def hash_encode_cf(x_cf: jax.Array, table: jax.Array, spec: HashGridSpec) -> jax.Array:
    """Channels-first encode: `x_cf` `[D, B]` in [0,1] -> features `[L*C, B]`.

    TPU layout note: every intermediate keeps the batch dimension minor (the
    128-lane axis).  Feature-minor layouts like `[B, L, 8, C]` tile to (8, 128)
    with up to 64x padding on TPU — a 768K-sample batch would materialize
    multi-GB temps.  Here the gathered corner values live as `[C, L, 8, B]`
    (B last => dense tiling), and only the final compact `[L*C, B]` output is
    produced.  Feature order is level-major (l, c) matching the reference's
    [L, B, C] -> [B, L*C] permute (grid.py:59-69).
    """
    D = spec.input_dim
    if x_cf.shape[0] != D:
        raise ValueError(f"expected [{D}, B] channels-first input, got {x_cf.shape}")
    B = x_cf.shape[1]
    L = spec.num_levels
    C = spec.level_dim
    x = x_cf.astype(jnp.float32)

    oob = jnp.any((x < 0.0) | (x > 1.0), axis=0)  # [B]

    idx_all = []  # L * 2^D entries of [B] uint32
    w_all = []  # L * 2^D entries of [B] f32
    corners = _corner_offsets(D)
    for level in range(L):
        scale = spec.level_scale(level)
        shift = 0.0 if spec.align_corners else 0.5
        pos = x * scale + shift  # [D, B]
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        pg = pos_grid.astype(jnp.int32)  # [D, B]
        for k in range(1 << D):
            cc = [pg[d] + int(corners[k, d]) for d in range(D)]  # D x [B]
            idx_all.append(_level_indices_cf(spec, level, cc))
            w = jnp.ones((B,), jnp.float32)
            for d in range(D):
                w = w * (frac[d] if corners[k, d] else 1.0 - frac[d])
            w_all.append(w)

    idx = jnp.stack(idx_all, axis=0)  # [L*2^D, B]
    w = jnp.stack(w_all, axis=0)  # [L*2^D, B]

    table_t = table.astype(jnp.float32).T  # [C, T] — compact (T minor)
    vals = jnp.take(table_t, idx.reshape(-1).astype(jnp.int32), axis=1)
    vals = vals.reshape(C, L, 1 << D, B)
    out = jnp.sum(w.reshape(1, L, 1 << D, B) * vals, axis=2)  # [C, L, B]
    out = jnp.where(oob[None, None, :], 0.0, out)
    # (c, l, b) -> (l*C + c, b): level-major feature order
    out = out.transpose(1, 0, 2).reshape(L * C, B)
    return out.astype(table.dtype)


def _level_indices_cf(spec: HashGridSpec, level: int, cc: list) -> jax.Array:
    """uint32 table row index from per-dim corner coord vectors (each [B])."""
    offsets = spec.offsets
    hashmap_size = offsets[level + 1] - offsets[level]
    res = spec.level_resolution(level)
    side = res if spec.align_corners else res + 1

    index = jnp.zeros(cc[0].shape, dtype=jnp.uint32)
    stride = 1
    for d in range(spec.input_dim):
        if stride > hashmap_size:
            break
        index = index + cc[d].astype(jnp.uint32) * jnp.uint32(stride & 0xFFFFFFFF)
        stride *= side
    if spec.gridtype == GRIDTYPE_HASH and stride > hashmap_size:
        h = jnp.zeros(cc[0].shape, dtype=jnp.uint32)
        for d in range(spec.input_dim):
            h = h ^ (cc[d].astype(jnp.uint32) * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
        index = h
    return (index % jnp.uint32(hashmap_size)) + jnp.uint32(offsets[level])


def hash_encode(inputs: jax.Array, table: jax.Array, spec: HashGridSpec) -> jax.Array:
    """Batch-first wrapper: `[..., D]` -> `[..., L*C]` (see hash_encode_cf)."""
    if inputs.shape[-1] != spec.input_dim:
        raise ValueError(f"expected [..., {spec.input_dim}] inputs, got {inputs.shape}")
    prefix = inputs.shape[:-1]
    x_cf = inputs.reshape(-1, spec.input_dim).T
    out = hash_encode_cf(x_cf, table, spec)
    return out.T.reshape(*prefix, spec.output_dim)


# ---------------------------------------------------------------------------
# custom-VJP variant: Pallas scatter-add backward (the TPU hot path)
# ---------------------------------------------------------------------------


def _level_geometry(spec: HashGridSpec, level: int, x: jax.Array):
    """Per-level interp geometry for `x` [D, B] fp32 in [0, 1].

    Returns (idx_local [2^D, B] int32 rows within the level, w [2^D, B] f32
    weights, frac [D, B], raw_frac [D, B] pre-smoothstep)."""
    D = spec.input_dim
    scale = spec.level_scale(level)
    shift = 0.0 if spec.align_corners else 0.5
    pos = x * scale + shift
    pos_grid = jnp.floor(pos)
    raw_frac = pos - pos_grid
    frac = raw_frac
    if spec.interpolation == "smoothstep":
        frac = frac * frac * (3.0 - 2.0 * frac)
    pg = pos_grid.astype(jnp.int32)
    corners = _corner_offsets(D)
    idxs, ws = [], []
    for k in range(1 << D):
        cc = [pg[d] + int(corners[k, d]) for d in range(D)]
        idxs.append(
            (_level_indices_cf(spec, level, cc) - jnp.uint32(spec.offsets[level])).astype(
                jnp.int32
            )
        )
        w = jnp.ones_like(frac[0])
        for d in range(D):
            w = w * (frac[d] if corners[k, d] else 1.0 - frac[d])
        ws.append(w)
    return jnp.stack(idxs), jnp.stack(ws), frac, raw_frac


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_cf_vjp(x_cf: jax.Array, table: jax.Array, spec: HashGridSpec):
    """hash_encode_cf with a hand-written backward: per-level Pallas
    scatter-add for the table gradient (XLA's TPU scatter is ~12M rows/s; the
    kernel in tngp/kernels/scatter.py runs ~70M rows/s — see PERF.md) and an
    analytic input gradient matching the CUDA dy_dx path
    (gridencoder.cu:196-241)."""
    return hash_encode_cf(x_cf, table, spec)


def _hash_vjp_fwd(x_cf, table, spec: HashGridSpec):
    out = hash_encode_cf(x_cf, table, spec)
    return out, (x_cf, table)


def _hash_vjp_bwd(spec: HashGridSpec, res, g):
    from ..kernels.scatter import scatter_add_auto

    x_cf, table = res
    D, L, C = spec.input_dim, spec.num_levels, spec.level_dim
    B = x_cf.shape[1]
    x = x_cf.astype(jnp.float32)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=0)  # [B]
    valid = (~oob).astype(jnp.float32)
    g = g.astype(jnp.float32).reshape(L, C, B) * valid[None, None, :]
    corners = _corner_offsets(D)
    table_f = table.astype(jnp.float32)

    grad_levels = []
    gx = jnp.zeros((D, B), jnp.float32)
    for level in range(L):
        idx, w, frac, raw_frac = _level_geometry(spec, level, x)  # [K8,B],[K8,B]
        gl = g[level]  # [C, B]
        # table gradient: rows idx[k] += w[k] * gl   (scatter over this level)
        vals = jnp.einsum("kb,cb->kbc", w, gl).reshape(-1, C)  # [8B, C]
        size = spec.offsets[level + 1] - spec.offsets[level]
        grad_levels.append(scatter_add_auto(idx.reshape(-1), vals, size))

        if not spec.input_grad:
            continue
        # input gradient (dy_dx): dL/dfrac_d = sum_k gv_k * dw_k/dfrac_d
        vals_g = jnp.take(table_f, (idx + spec.offsets[level]).astype(jnp.int32), axis=0)
        gv = jnp.einsum("kbc,cb->kb", vals_g.reshape(1 << D, B, C), gl)  # [8, B]
        scale = spec.level_scale(level)
        dfrac = jnp.ones_like(frac)
        if spec.interpolation == "smoothstep":
            dfrac = 6.0 * raw_frac * (1.0 - raw_frac)
        for d in range(D):
            dw = jnp.zeros((B,), jnp.float32)
            for k in range(1 << D):
                prod = jnp.ones((B,), jnp.float32)
                for d2 in range(D):
                    if d2 == d:
                        continue
                    prod = prod * (frac[d2] if corners[k, d2] else 1.0 - frac[d2])
                sign = 1.0 if corners[k, d] else -1.0
                dw = dw + gv[k] * sign * prod
            gx = gx.at[d].add(dw * scale * dfrac[d] * valid)

    grad_table = jnp.concatenate(grad_levels, axis=0).astype(table.dtype)
    return gx.astype(x_cf.dtype), grad_table


hash_encode_cf_vjp.defvjp(_hash_vjp_fwd, _hash_vjp_bwd)


def hash_encode_tv_grad(
    inputs: jax.Array, table: jax.Array, spec: HashGridSpec, weight: float = 1e-7
) -> jax.Array:
    """Total-variation gradient for the grid table (reference kernel_grad_tv,
    gridencoder.cu:503-607; grad_total_variation grid.py:822-843).

    Returns a `[total_params, C]` gradient contribution to *add* to the table
    grad.  TV at sampled points: for each point/level, sum over dims of
    (val[corner] - val[corner +- e_d]) differences at the floor corner.
    Implemented as autodiff of 0.5*weight*sum((v(p)-v(p+e_d))^2) at floor cells.
    """

    def tv_energy(tbl):
        x = inputs.reshape(-1, spec.input_dim).astype(jnp.float32)
        total = 0.0
        for level in range(spec.num_levels):
            scale = spec.level_scale(level)
            shift = 0.0 if spec.align_corners else 0.5
            res = spec.level_resolution(level)
            pos_grid = jnp.floor(x * scale + shift).astype(jnp.int32)
            base_idx = _level_indices(spec, level, pos_grid)
            v0 = jnp.take(tbl, base_idx.astype(jnp.int32), axis=0)
            for d in range(spec.input_dim):
                nb = pos_grid.at[:, d].add(1)
                ok = nb[:, d] < res
                vi = jnp.take(tbl, _level_indices(spec, level, nb).astype(jnp.int32), axis=0)
                diff = jnp.where(ok[:, None], v0 - vi, 0.0)
                total = total + 0.5 * jnp.sum(diff.astype(jnp.float32) ** 2)
        return weight * total

    return jax.grad(tv_energy)(table)
