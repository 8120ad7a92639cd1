"""Occupancy-grid ray marching with static shapes — pure jnp, TPU-first.

Behavioral reference: torch-ngp `raymarching/src/raymarching.cu`:
  kernel_march_rays_train (:311-480), kernel_march_rays (:709-814),
  mip_from_pos / mip_from_dt (:42-54).

TPU-first design
----------------
The CUDA marcher is one thread per ray: a data-dependent while-loop that
DDA-skips empty voxels and atomically compacts emitted samples into a flat
`[M, ...]` buffer sized by a running `mean_count` estimate (with silent ray
drops on overflow).  None of that maps to XLA's static-shape model.

Key observation: the reference's t-advance is the *same ladder* whether a point
is occupied (emit + step) or empty (DDA-skip = repeatedly step the ladder until
past the voxel).  So the set of t values it visits is exactly the deterministic
ladder

    t_{j+1} = t_j + clamp(t_j * dt_gamma, dt_min, dt_max)

which has a closed form (uniform -> geometric -> uniform phases) and can be
evaluated for all `max_steps` rungs of all rays *in parallel*.  Marching then
becomes: evaluate ladder -> probe the occupancy bitfield at every rung ->
compact the first K occupied rungs per ray into a fixed `[N, K]` slab
(via top_k on monotone keys), with a validity mask.  K plays the role of the
reference's `mean_count` budget: overflowing samples (not whole rays) are
dropped, and callers can iterate with `next_t` to resume (the inference-path
equivalent of the alive-ray loop).

  dt_min = 2*sqrt(3)/max_steps, dt_max = 2*sqrt(3)*2^(C-1)/H (:345-346)
  cascade level = max(mip_from_pos, mip_from_dt), mip bound = min(2^lvl, bound)

The density bitfield uses *linear* cell order (ix major, iz fastest) rather
than the CUDA Morton order — see ops/grid_utils.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .grid_utils import bitfield_probe

SQRT3 = math.sqrt(3.0)


class MarchResult(NamedTuple):
    # TPU layout: positions/directions are channels-first [3, N, K] so the big
    # (N*K) extent stays on the dense tile axes (a [N, K, 3] layout pads the
    # 3-lane minor dim 42x on TPU).
    xyzs_cf: jax.Array  # [3, N, K] sample positions (clamped to +-bound)
    dirs_cf: jax.Array  # [3, N, K] ray directions (broadcast)
    dts: jax.Array  # [N, K] marching dt at each sample
    gaps: jax.Array  # [N, K] real t advance since previous sample (depth delta)
    ts: jax.Array  # [N, K] sample t values
    mask: jax.Array  # [N, K] bool validity
    counts: jax.Array  # [N] int32 number of occupied rungs found (uncapped)
    next_t: jax.Array  # [N] resume t for iterative (inference) marching

    @property
    def xyzs(self) -> jax.Array:  # [N, K, 3] convenience view (test/debug use)
        return jnp.moveaxis(self.xyzs_cf, 0, -1)

    @property
    def dirs(self) -> jax.Array:
        return jnp.moveaxis(self.dirs_cf, 0, -1)


def _t_ladder(t0: jax.Array, j: jax.Array, dt_gamma: float, dt_min: float, dt_max: float):
    """t value at ladder rung j (closed form of the clamp recurrence).

    t0: [N] start t; j: [S] rung indices shared across rays, or [N, S]
    per-ray rungs.  Returns [N, S] float32.
    """
    t0 = t0[:, None].astype(jnp.float32)
    jf = j.astype(jnp.float32)
    if jf.ndim == 1:
        jf = jf[None, :]
    if dt_gamma <= 0.0:
        return t0 + jf * dt_min
    a = dt_min / dt_gamma  # below: uniform dt_min
    b = dt_max / dt_gamma  # above: uniform dt_max
    g = 1.0 + dt_gamma
    lg = math.log(g)
    # phase 1: k uniform steps of dt_min until t >= a
    n1 = jnp.ceil(jnp.maximum(a - t0, 0.0) / dt_min)
    tA = t0 + n1 * dt_min
    # phase 2: geometric until t >= b
    n2 = jnp.ceil(jnp.maximum(jnp.log(jnp.maximum(b / tA, 1.0)), 0.0) / lg)
    tB = tA * jnp.exp(n2 * lg)
    k = jf
    t_p1 = t0 + k * dt_min
    t_p2 = tA * jnp.exp((k - n1) * lg)
    t_p3 = tB + (k - n1 - n2) * dt_max
    return jnp.where(k < n1, t_p1, jnp.where(k < n1 + n2, t_p2, t_p3))


def _float_exponent(x: jax.Array) -> jax.Array:
    """frexp-style exponent: x = m * 2^e with m in [0.5, 1). Exact via bit ops."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return ((bits >> 23) & 0xFF) - 126


def mip_level_from_max(mx: jax.Array, dt: jax.Array, cascades: int, grid_size: int) -> jax.Array:
    """Cascade selection from max |coord|, raymarching.cu:42-54.

    cascades == 1 (bound <= 1, the common case) short-circuits to constant 0:
    the exponent bit-twiddles over [N, S]-sized arrays are pure waste there,
    and the static `cascades` makes the fold safe at trace time."""
    if cascades == 1:
        return jnp.zeros(mx.shape, jnp.int32)
    e_pos = jnp.where(mx > 0, _float_exponent(jnp.maximum(mx, 1e-30)), -100)
    mdt = dt * grid_size * 0.5
    e_dt = jnp.where(mdt > 0, _float_exponent(jnp.maximum(mdt, 1e-30)), -100)
    lvl = jnp.maximum(e_pos, e_dt)
    return jnp.clip(lvl, 0, cascades - 1)


def mip_level(xyz: jax.Array, dt: jax.Array, cascades: int, grid_size: int) -> jax.Array:
    """Batch-first wrapper over mip_level_from_max (xyz `[..., 3]`)."""
    return mip_level_from_max(jnp.max(jnp.abs(xyz), axis=-1), dt, cascades, grid_size)


def grid_cell_index_comp(
    px: jax.Array, py: jax.Array, pz: jax.Array, level: jax.Array,
    bound: float, cascades: int, grid_size: int,
) -> jax.Array:
    """Linear cell index `level*H^3 + ((ix*H)+iy)*H + iz`, componentwise."""
    H = grid_size
    inv_mip_bound = 1.0 / jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)

    def cell(p):
        return jnp.clip(0.5 * (p * inv_mip_bound + 1.0) * H, 0.0, float(H - 1)).astype(jnp.int32)

    lin = (cell(px) * H + cell(py)) * H + cell(pz)
    return level.astype(jnp.int32) * (H**3) + lin


def grid_cell_index(
    xyz: jax.Array, level: jax.Array, bound: float, cascades: int, grid_size: int
) -> jax.Array:
    """Batch-first wrapper (xyz `[..., 3]`)."""
    return grid_cell_index_comp(
        xyz[..., 0], xyz[..., 1], xyz[..., 2], level, bound, cascades, grid_size
    )


def _coarse_cascade_map(b_c: float, bound: float, hc: int) -> np.ndarray:
    """[hc, hc] 0/1 matrix mapping cascade-cube coarse cells (cube [-b_c, b_c])
    onto global coarse cells (cube [-bound, bound]), per dimension.  Entry
    (i, j) = 1 iff cascade cell i's world interval overlaps global cell j."""
    import numpy as np

    M = np.zeros((hc, hc), np.float32)
    w_c = 2.0 * b_c / hc
    for i in range(hc):
        x0 = -b_c + i * w_c
        x1 = x0 + w_c
        g0 = int(np.floor((x0 + bound) / (2.0 * bound) * hc + 1e-6))
        g1 = int(np.ceil((x1 + bound) / (2.0 * bound) * hc - 1e-6)) - 1
        M[i, max(0, g0) : min(hc, g1 + 1)] = 1.0
    return M


def build_coarse_occupancy(
    bitfield: jax.Array,
    *,
    bound: float,
    cascades: int,
    grid_size: int,
    halfext: float,
    hc: int = 16,
) -> jax.Array:
    """Cascade-union dilated coarse occupancy for group-level march probing.

    Pools each cascade's [H^3] fine bits down to [hc^3], maps every cascade
    cube into the single global coarse grid over [-bound, bound], ORs them,
    and max-pool-dilates by ceil(halfext / coarse_cell) cells so that probing
    the cell of a group's t-midpoint is conservative for every rung within
    +-halfext of it (a displacement < d*cell crosses at most d cell
    boundaries per axis).  Returns flat [hc^3] bool, linear cell order.

    This replaces the CUDA marcher's per-rung DDA skipping
    (raymarching.cu:378-427) with a two-level probe that XLA vectorizes:
    rungs are probed in groups and only live groups pay fine probes.
    """
    H = grid_size
    hc = min(hc, H)
    if H % hc:
        raise ValueError(f"grid_size {H} must be a multiple of coarse size {hc}")
    r = H // hc
    bits = (bitfield[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    bits = bits.reshape(cascades, hc, r, hc, r, hc, r)
    pooled = bits.max(axis=(2, 4, 6)).astype(jnp.float32)  # [CAS, hc, hc, hc]

    coarse = jnp.zeros((hc, hc, hc), jnp.float32)
    for cas in range(cascades):
        b_c = min(2.0**cas, bound)
        if b_c >= bound:
            coarse = coarse + pooled[cas]
        else:
            M = jnp.asarray(_coarse_cascade_map(b_c, bound, hc))
            coarse = coarse + jnp.einsum("ijk,ia,jb,kc->abc", pooled[cas], M, M, M)

    dil = max(1, int(math.ceil(halfext / (2.0 * bound / hc))))
    w = 2 * dil + 1
    coarse = jax.lax.reduce_window(
        coarse, -jnp.inf, jax.lax.max, (w, w, w), (1, 1, 1), "SAME"
    )
    return (coarse > 0.5).reshape(-1)


def _first_k_ranks(valid: jax.Array, kk: int):
    """Branch-free binary search: slot k holds the first column s with
    cumsum(valid)[s] >= k+1.  valid: [N, S] bool -> (found [N, kk] int32
    clamped to S-1, counts [N] int32)."""
    N, S = valid.shape
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
    counts = rank[:, -1]
    want = jnp.arange(1, kk + 1, dtype=jnp.int32)[None, :]
    lo = jnp.zeros((N, kk), jnp.int32)
    hi = jnp.full((N, kk), S, jnp.int32)
    for _ in range(max(1, S.bit_length())):
        mid = (lo + hi) >> 1
        r = jnp.take_along_axis(rank, jnp.minimum(mid, S - 1), axis=1)
        go_right = r < want
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return jnp.minimum(lo, S - 1), counts


@partial(
    jax.jit,
    static_argnames=(
        "bound", "cascades", "grid_size", "dt_gamma", "max_steps", "K", "group",
    ),
)
def march_rays(
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    t_start: jax.Array,  # [N] start t (nears for training; rays_t when iterating)
    fars: jax.Array,  # [N]
    bitfield: jax.Array,  # [cascades * H^3 // 8] uint8, linear cell order
    *,
    bound: float,
    cascades: int,
    grid_size: int,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    K: int = 128,
    noise: jax.Array | None = None,  # [N] in [0,1), perturb fraction of first dt
    group: int = 0,  # >0: two-level coarse-grouped march (see below)
) -> MarchResult:
    N = rays_o.shape[0]
    S = max_steps
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascades - 1)) / grid_size

    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    t0 = t_start.astype(jnp.float32)
    if noise is not None:
        dt0 = jnp.clip(t0 * dt_gamma, dt_min, dt_max)
        t0 = t0 + dt0 * noise.astype(jnp.float32)

    if group > 0:
        return _march_rays_grouped(
            o, d, t0, fars.astype(jnp.float32), bitfield,
            bound=bound, cascades=cascades, grid_size=grid_size,
            dt_gamma=dt_gamma, max_steps=max_steps, K=K, group=group,
        )

    j = jnp.arange(S, dtype=jnp.int32)
    ts = _t_ladder(t0, j, dt_gamma, dt_min, dt_max)  # [N, S]
    dts = jnp.clip(ts * dt_gamma, dt_min, dt_max) if dt_gamma > 0 else jnp.full_like(ts, dt_min)

    # componentwise positions: [N, S] each (never materialize [N, S, 3])
    px = jnp.clip(o[:, 0:1] + ts * d[:, 0:1], -bound, bound)
    py = jnp.clip(o[:, 1:2] + ts * d[:, 1:2], -bound, bound)
    pz = jnp.clip(o[:, 2:3] + ts * d[:, 2:3], -bound, bound)
    mx = jnp.maximum(jnp.abs(px), jnp.maximum(jnp.abs(py), jnp.abs(pz)))
    lvl = mip_level_from_max(mx, dts, cascades, grid_size)
    cell = grid_cell_index_comp(px, py, pz, lvl, bound, cascades, grid_size)
    occ = bitfield_probe(bitfield, cell.reshape(-1)).reshape(N, S)

    in_range = ts < fars.astype(jnp.float32)[:, None]
    valid = occ & in_range  # [N, S]
    counts = valid.sum(axis=-1).astype(jnp.int32)

    # Compact the first K (+1 for the resume point) valid rungs per ray via
    # branch-free binary search on the nondecreasing rank = cumsum(valid):
    # slot k holds the first s with rank[s] >= k+1.  log2(S) rounds of cheap
    # [N, K+1] take_along_axis gathers — much friendlier to the TPU compiler
    # than a top_k/sort network over [N, S].
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=-1)  # [N, S]
    # always K+1 slots (even when S < K: unmatched slots search to S and are
    # masked invalid) so slab shapes stay [N, K] for any (S, K) combination
    kk = K + 1
    want = jnp.arange(1, kk + 1, dtype=jnp.int32)[None, :]  # [1, K+1]
    lo = jnp.zeros((N, kk), jnp.int32)
    hi = jnp.full((N, kk), S, jnp.int32)
    for _ in range(max(1, S.bit_length())):  # ceil(log2(S+1)) rounds
        mid = (lo + hi) >> 1
        r = jnp.take_along_axis(rank, jnp.minimum(mid, S - 1), axis=1)
        go_right = r < want
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    found = jnp.minimum(lo, S - 1)  # [N, K+1]
    valid_slot = counts[:, None] >= want  # slot k valid iff count > k
    sel_idx = found[:, :K]
    sel_valid = valid_slot[:, :K]

    # one packed gather for (t, dt, x, y, z): 5x fewer gather indices than
    # five separate take_along_axis calls (TPU gathers are index-count-bound)
    packed = jnp.stack([ts, dts, px, py, pz], axis=0)  # [5, N, S]
    sel = jnp.take_along_axis(packed, sel_idx[None, :, :], axis=2)  # [5, N, K]
    t_sel, dt_sel = sel[0], sel[1]
    xyz_sel_cf = sel[2:]  # [3, N, K]
    maskf = sel_valid

    # gap = (t_i + dt_i) - (t_{i-1} + dt_{i-1}), with t_{-1}+dt_{-1} := t0
    t_post = t_sel + dt_sel
    prev = jnp.concatenate([t0[:, None], t_post[:, :-1]], axis=1)
    gaps = jnp.where(maskf, t_post - prev, 0.0)

    # resume t for the iterative inference loop: the (K+1)-th valid rung if the
    # budget overflowed, else one rung past the ladder end.
    ladder_end = ts[:, -1] + dts[:, -1]
    overflow = counts > K
    if kk > K:
        resume_t = jnp.take_along_axis(ts, found[:, K:K + 1], axis=1)[:, 0]
        next_t = jnp.where(overflow, resume_t, ladder_end)
    else:
        next_t = ladder_end
    next_t = jnp.minimum(next_t, fars.astype(jnp.float32))

    dirs_cf = jnp.broadcast_to(d.T[:, :, None], (3, N, K))
    zero = jnp.zeros((), jnp.float32)
    return MarchResult(
        xyzs_cf=jnp.where(maskf[None, :, :], xyz_sel_cf, zero),
        dirs_cf=dirs_cf,
        dts=jnp.where(maskf, dt_sel, zero),
        gaps=gaps,
        ts=jnp.where(maskf, t_sel, zero),
        mask=maskf,
        counts=counts,
        next_t=next_t,
    )


@partial(
    jax.jit,
    static_argnames=(
        "bound", "cascades", "grid_size", "dt_gamma", "max_steps",
    ),
)
def march_rays_dense(
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    t_start: jax.Array,  # [N]
    fars: jax.Array,  # [N]
    bitfield: jax.Array,
    *,
    bound: float,
    cascades: int,
    grid_size: int,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    noise: jax.Array | None = None,
) -> MarchResult:
    """Slab-free march: probe every ladder rung, return the FULL [N, S]
    rung arrays with a validity mask — no per-ray compaction.

    The training path's per-ray K-slab (binary-search compaction + packed
    gathers, ~68 ms of the 81 ms flat march at bench shapes) exists only to
    bound the field-query batch; when the caller already applies the *global*
    M-sample budget (ops/compaction.py — the reference's mean_count
    semantics, raymarching.py:200-232), compacting per ray first is redundant
    work.  The compositor runs over S rungs instead of K (prefix sums are
    cheap); invalid rungs carry zero dt/gap and masked positions.

    next_t is the ladder end (no resume semantics — training marches once).
    """
    N = rays_o.shape[0]
    S = max_steps
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascades - 1)) / grid_size

    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    t0 = t_start.astype(jnp.float32)
    if noise is not None:
        dt0 = jnp.clip(t0 * dt_gamma, dt_min, dt_max)
        t0 = t0 + dt0 * noise.astype(jnp.float32)

    j = jnp.arange(S, dtype=jnp.int32)
    ts = _t_ladder(t0, j, dt_gamma, dt_min, dt_max)  # [N, S]
    dts = (
        jnp.clip(ts * dt_gamma, dt_min, dt_max)
        if dt_gamma > 0
        else jnp.full_like(ts, dt_min)
    )
    px = jnp.clip(o[:, 0:1] + ts * d[:, 0:1], -bound, bound)
    py = jnp.clip(o[:, 1:2] + ts * d[:, 1:2], -bound, bound)
    pz = jnp.clip(o[:, 2:3] + ts * d[:, 2:3], -bound, bound)
    mx = jnp.maximum(jnp.abs(px), jnp.maximum(jnp.abs(py), jnp.abs(pz)))
    lvl = mip_level_from_max(mx, dts, cascades, grid_size)
    cell = grid_cell_index_comp(px, py, pz, lvl, bound, cascades, grid_size)
    occ = bitfield_probe(bitfield, cell.reshape(-1)).reshape(N, S)
    maskf = occ & (ts < fars[:, None])
    counts = maskf.sum(axis=-1).astype(jnp.int32)

    # gap = advance since the previous valid rung (invalid rungs interleaved)
    t_post = ts + dts
    run = jax.lax.cummax(jnp.where(maskf, t_post, -jnp.inf), axis=1)
    prev = jnp.concatenate([t0[:, None], run[:, :-1]], axis=1)
    prev = jnp.maximum(prev, t0[:, None])
    gaps = jnp.where(maskf, t_post - prev, 0.0)

    ladder_end = ts[:, -1] + dts[:, -1]
    dirs_cf = jnp.broadcast_to(d.T[:, :, None], (3, N, S))
    zero = jnp.zeros((), jnp.float32)
    return MarchResult(
        xyzs_cf=jnp.where(maskf[None, :, :], jnp.stack([px, py, pz]), zero),
        dirs_cf=dirs_cf,
        dts=jnp.where(maskf, dts, zero),
        gaps=gaps,
        ts=jnp.where(maskf, ts, zero),
        mask=maskf,
        counts=counts,
        next_t=jnp.minimum(ladder_end, fars.astype(jnp.float32)),
    )


def build_dilated_cell_grid(
    bitfield: jax.Array,
    *,
    bound: float,
    cascades: int,
    grid_size: int,
    dilate: int,
) -> jax.Array:
    """Full-resolution cascade-union occupancy, max-pool dilated by `dilate`
    cells per axis.  Returns flat [H^3] bool over the global cube
    [-bound, bound] (linear cell order).

    Conservative chunk test for the two-level march: a ladder rung within
    dilate*cell (L-inf, world units) of a probe point cannot be occupied
    unless the probe point's dilated cell is set — every cascade's occupied
    cells are ORed into the overlapping global cells first (so whichever mip
    level a rung probes, its cell is covered).  Dilation is separable
    (three 1-D max pools)."""
    H = grid_size
    bits = (bitfield[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    bits = bits.reshape(cascades, H, H, H).astype(jnp.float32)
    g = jnp.zeros((H, H, H), jnp.float32)
    for cas in range(cascades):
        b_c = min(2.0**cas, bound)
        if b_c >= bound:
            g = g + bits[cas]
        else:
            M = jnp.asarray(_coarse_cascade_map(b_c, bound, H))
            g = g + jnp.einsum("ijk,ia,jb,kc->abc", bits[cas], M, M, M)
    w = 2 * dilate + 1
    for axis in range(3):
        win = tuple(w if a == axis else 1 for a in range(3))
        g = jax.lax.reduce_window(g, -jnp.inf, jax.lax.max, win, (1, 1, 1), "SAME")
    return (g > 0.5).reshape(-1)


def chunk_dilate(G: int, max_steps: int, grid_size: int, bound: float) -> int:
    """Dilation radius (cells) used by march_rays_chunked for chunk size G.

    Callers that precompute the dilated grid (e.g. the eval residual-round
    loop, which marches many times per frame) must build it with exactly this
    radius so the conservative chunk test holds."""
    dt_min = 2.0 * SQRT3 / max_steps
    cell = 2.0 * bound / grid_size
    return max(1, int(math.ceil(0.5 * (G - 1) * dt_min / cell)))


class ChunkedMarch(NamedTuple):
    """Result of march_rays_chunked: compaction outputs, no [N, S] arrays."""

    sel: jax.Array  # [M_budget] flat (ray*S + rung) indices, ascending
    sel_valid: jax.Array  # [M_budget] bool
    m_eff: jax.Array  # [] int32 number of real samples selected
    ray_mask: jax.Array  # [N] bool: ray kept ALL its valid samples
    num_points: jax.Array  # [] int32 valid rungs in considered chunks
    t0: jax.Array  # [N] noise-shifted ladder origin
    resume_t: jax.Array  # [N] t of the first un-selected valid rung (eval
    #                      resume; = ladder end clipped to fars if none)


@partial(
    jax.jit,
    static_argnames=(
        "bound", "cascades", "grid_size", "dt_gamma", "max_steps",
        "M_budget", "G", "chunk_budget", "ladder_steps", "ray_chunk_cap",
    ),
)
def march_rays_chunked(
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    t_start: jax.Array,  # [N]
    fars: jax.Array,  # [N]
    bitfield: jax.Array,
    *,
    bound: float,
    cascades: int,
    grid_size: int,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    M_budget: int,
    G: int = 8,
    chunk_budget: int | None = None,
    noise: jax.Array | None = None,
    dilated_grid: jax.Array | None = None,
    ladder_steps: int | None = None,
    ray_chunk_cap: int | None = None,
) -> ChunkedMarch:
    """Two-level march + compaction in one pass: probe G-rung chunk midpoints
    against the dilated full-resolution grid, then fine-probe ONLY candidate
    chunks — ~3x fewer gather indices than probing every rung (the XLA gather
    ceiling, ~6.5 ns/idx, is the probe's whole cost; see PERF.md), and the
    coarse flags double as the hierarchical compaction's first stage.

    Exact-prefix semantics (same contract as march_rays_stream +
    compact_mask_hier): the dilated coarse test is conservative, so candidate
    chunks are a superset of live chunks IN FLAT ORDER, and the selected set
    is exactly the first m_eff valid samples with m_eff = min(M_budget,
    valid samples in the first chunk_budget coarse-live chunks).  Chunks
    whose t-span exceeds the dilation coverage are forced live (the
    dt_gamma > 0 far field), preserving conservativeness for any ladder.

    ladder_steps < max_steps considers only the first `ladder_steps` rungs
    of the ladder this call (a WINDOW — dt stays set by max_steps, so the
    sampling numerics are unchanged).  Rays whose remaining span exceeds the
    window resume at its end (resume_t) and a later call continues — the
    eval residual rounds' cheap-march mode: round coarse-probe cost drops to
    N * ladder_steps / G for a round that only needs the next ~k samples.
    """
    N = rays_o.shape[0]
    S = max_steps
    S_lad = S if ladder_steps is None else min(ladder_steps, S)
    if S % G or S_lad % G:
        raise ValueError(f"max_steps {S} / ladder_steps {S_lad} must be "
                         f"multiples of chunk size {G}")
    NCr = S_lad // G
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascades - 1)) / grid_size
    cell = 2.0 * bound / grid_size
    # dilation sized for the uniform-dt_min regime; chunks with a larger
    # t-span (geometric/dt_max phases) fall back to live=True
    dilate = chunk_dilate(G, max_steps, grid_size, bound)

    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    t0 = t_start.astype(jnp.float32)
    if noise is not None:
        dt0 = jnp.clip(t0 * dt_gamma, dt_min, dt_max)
        t0 = t0 + dt0 * noise.astype(jnp.float32)
    fars = fars.astype(jnp.float32)

    if dilated_grid is None:
        grid = build_dilated_cell_grid(
            bitfield, bound=bound, cascades=cascades, grid_size=grid_size,
            dilate=dilate,
        )
    else:
        # precomputed by the caller (must use chunk_dilate's radius) — the
        # eval residual loop marches many times against one bitfield and
        # must not pay the 3-pool dilated build per round
        grid = dilated_grid

    # ---- coarse stage: one dilated-grid probe per chunk midpoint ----------
    jg = jnp.arange(NCr, dtype=jnp.int32) * G
    t_lo = _t_ladder(t0, jg, dt_gamma, dt_min, dt_max)  # [N, NCr]
    t_hi = _t_ladder(t0, jg + (G - 1), dt_gamma, dt_min, dt_max)
    tc = 0.5 * (t_lo + t_hi)
    halfext = 0.5 * (t_hi - t_lo)
    H = grid_size
    cix = []
    for c in range(3):
        p = jnp.clip(o[:, c : c + 1] + tc * d[:, c : c + 1], -bound, bound)
        cix.append(
            jnp.clip(
                jnp.floor((p + bound) / (2.0 * bound) * H), 0.0, float(H - 1)
            ).astype(jnp.int32)
        )
    ccell = (cix[0] * H + cix[1]) * H + cix[2]
    live = jnp.take(grid, ccell.reshape(-1)).reshape(N, NCr)
    # span exceeds dilation coverage -> force live.  The epsilon keeps float
    # rounding of the ladder difference from tipping the uniform-dt_min
    # regime (halfext == dilate*cell analytically at exact-ceil boundaries)
    # into all-chunks-live, which would flood the chunk budget; the slack is
    # ~1e-4 of a cell, the same collision-class noise as clamped tiles.
    live = live | (halfext > dilate * cell + 1e-6)
    live = live & (t_lo < fars[:, None])

    # optional per-ray live-chunk cap (eval fast path): keep only each ray's
    # first `ray_chunk_cap` live chunks so the GLOBAL chunk budget is spent
    # fairly across rays instead of flooding on camera-near rays (a wide
    # eval dilation makes many conservative-live chunks).  Rays that lose
    # chunks to the cap are marked truncated -> resume_t stops at their last
    # taken sample and a residual round continues them (exactness preserved).
    if ray_chunk_cap is not None:
        lrank = jnp.cumsum(live.astype(jnp.int32), axis=1)  # [N, NCr]
        cap_cut = lrank[:, -1] > ray_chunk_cap  # [N]
        # t at the start of each ray's FIRST cut chunk: a cap-cut ray whose
        # considered chunks held zero valid rungs must resume HERE, not at
        # t0 — a t0 resume would re-march identically forever (the pre-cap
        # counts==0 no-progress case is fine because the global budget
        # eventually covers it; the cap would not).
        cut1 = live & (lrank == ray_chunk_cap + 1)  # [N, NCr]
        j_cut = jnp.argmax(cut1, axis=1)  # first cut chunk (0 if none)
        t_cut = jnp.take_along_axis(t_lo, j_cut[:, None], axis=1)[:, 0]
        live = live & (lrank <= ray_chunk_cap)
    else:
        cap_cut = jnp.zeros((N,), bool)

    # ---- chunk selection (= hierarchical compaction stage 1) --------------
    if chunk_budget is None:
        chunk_budget = -(-3 * M_budget // G)
    CB = min(N * NCr, -(-chunk_budget // 128) * 128)
    flat_live = live.reshape(-1)
    (csel,) = jnp.nonzero(flat_live, size=CB, fill_value=N * NCr - 1)
    csel = csel.astype(jnp.int32)
    n_live = flat_live.sum().astype(jnp.int32)
    slot_ok = jnp.arange(CB, dtype=jnp.int32) < n_live  # [CB]

    # ---- fine stage: exact ladder + bitfield probe on candidates only -----
    cray = csel // NCr  # [CB] nondecreasing
    jc = (csel - cray * NCr)[:, None] * G + jnp.arange(G, dtype=jnp.int32)  # [CB, G]
    t0c = jnp.take(t0, cray)
    ts = _t_ladder(t0c, jc, dt_gamma, dt_min, dt_max)  # [CB, G]
    dts = (
        jnp.clip(ts * dt_gamma, dt_min, dt_max)
        if dt_gamma > 0
        else jnp.full_like(ts, dt_min)
    )
    oc = jnp.take(o, cray, axis=0)  # [CB, 3]
    dc = jnp.take(d, cray, axis=0)
    px = jnp.clip(oc[:, 0:1] + ts * dc[:, 0:1], -bound, bound)
    py = jnp.clip(oc[:, 1:2] + ts * dc[:, 1:2], -bound, bound)
    pz = jnp.clip(oc[:, 2:3] + ts * dc[:, 2:3], -bound, bound)
    mx = jnp.maximum(jnp.abs(px), jnp.maximum(jnp.abs(py), jnp.abs(pz)))
    lvl = mip_level_from_max(mx, dts, cascades, grid_size)
    ccells = grid_cell_index_comp(px, py, pz, lvl, bound, cascades, grid_size)
    occ = bitfield_probe(bitfield, ccells.reshape(-1)).reshape(CB, G)
    cand = occ & (ts < jnp.take(fars, cray)[:, None]) & slot_ok[:, None]

    # ---- sample selection (= compaction stage 2) ---------------------------
    ccum = jnp.cumsum(cand.reshape(-1).astype(jnp.int32))  # [CB*G] inclusive
    total = ccum[-1]
    m_eff = jnp.minimum(total, M_budget)
    (s2,) = jnp.nonzero(cand.reshape(-1), size=M_budget, fill_value=0)
    s2 = s2.astype(jnp.int32)
    # flat (ray*S + rung): csel is ray*NCr + chunk, and rungs are ladder-
    # window-relative, so re-expand against the FULL ladder stride S (equal
    # to csel*G + off only when ladder_steps == max_steps)
    csel_s = jnp.take(csel, s2 // G)
    ray_s = csel_s // NCr
    sel = ray_s * S + (csel_s - ray_s * NCr) * G + (s2 % G)
    sel = jnp.minimum(sel, N * S - 1)
    want = jnp.arange(1, M_budget + 1, dtype=jnp.int32)

    # ---- per-ray totals: candidates of a ray are contiguous in csel order —
    # cum_counts[n] = ccum at the END of ray n's candidate range, found by
    # binary search over the nondecreasing cray (17 rounds x [N] tiny gathers)
    nq = jnp.arange(N, dtype=jnp.int32)
    lo = jnp.zeros((N,), jnp.int32)
    hi = jnp.full((N,), CB, jnp.int32)
    for _ in range(max(1, CB.bit_length())):
        mid = (lo + hi) >> 1
        v = jnp.take(cray, jnp.minimum(mid, CB - 1))
        ok_slot = jnp.take(slot_ok, jnp.minimum(mid, CB - 1))
        # rank among candidates with (ray <= n); dead fill slots sort last
        go_right = (v <= nq) & ok_slot & (mid < CB)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    # lo = number of candidate chunks belonging to rays <= n
    cum_counts = jnp.where(
        lo > 0, jnp.take(ccum, jnp.clip(lo * G - 1, 0, CB * G - 1)), 0
    )
    # a ray is loss-eligible iff the sample budget kept all its valid samples
    # AND the chunk budget considered all its live chunks (rays at/after a
    # chunk-budget cut are conservatively excluded)
    g_trunc = (lo >= CB) & (n_live > CB)  # chunk budget cut this ray's range
    truncated = g_trunc | cap_cut
    ray_mask = (cum_counts <= m_eff) & jnp.logical_not(truncated)

    # ---- eval resume: t just past each ray's LAST SELECTED sample ---------
    # ray n took taken_n = clip(m_eff - base_n, 0, counts_n) of its counts_n
    # valid rungs (prefix selection).  Resuming after its last taken sample
    # is universally safe: the next valid rung (first dropped, or a rung in
    # an unconsidered chunk) starts strictly later, and the rungs in between
    # are invalid — a residual round re-probes them but cannot double-count.
    # Locate the (base+taken)-th valid candidate: binary search the
    # per-chunk valid-count cumsum, then a G-wide scan inside the chunk.
    counts = cum_counts - jnp.concatenate([jnp.zeros((1,), jnp.int32), cum_counts[:-1]])
    base = cum_counts - counts
    taken = jnp.clip(m_eff - base, 0, counts)
    has_drop = (taken < counts) | truncated
    cend = ccum.reshape(CB, G)[:, -1]  # [CB] inclusive valid count per chunk
    want_rank = jnp.maximum(base + taken, 1)  # rank of the last taken valid
    clo = jnp.zeros((N,), jnp.int32)
    chi = jnp.full((N,), CB, jnp.int32)
    for _ in range(max(1, CB.bit_length())):  # first chunk with cend >= want
        mid = (clo + chi) >> 1
        v = jnp.take(cend, jnp.minimum(mid, CB - 1))
        go_right = (v < want_rank) & (mid < CB)
        clo = jnp.where(go_right, mid + 1, clo)
        chi = jnp.where(go_right, chi, mid)
    cidx = jnp.minimum(clo, CB - 1)  # [N] chunk holding the last taken rung
    cflags = jnp.take(cand, cidx, axis=0)  # [N, G]
    prev = jnp.take(cend, cidx) - cflags.sum(axis=1)  # valid before the chunk
    in_rank = jnp.cumsum(cflags.astype(jnp.int32), axis=1) + prev[:, None]
    hit = cflags & (in_rank == want_rank[:, None])  # exactly one true (if any)
    g_off = jnp.argmax(hit, axis=1).astype(jnp.int32)
    rung = (jnp.take(csel, cidx) - jnp.take(cray, cidx) * NCr) * G + g_off
    t_sel_last = _t_ladder(t0, rung[:, None], dt_gamma, dt_min, dt_max)[:, 0]
    dt_sel = (
        jnp.clip(t_sel_last * dt_gamma, dt_min, dt_max) if dt_gamma > 0 else dt_min
    )
    t_after = jnp.where(taken > 0, t_sel_last + dt_sel, t0)
    t_last = _t_ladder(t0, jnp.full((N, 1), S_lad - 1, jnp.int32), dt_gamma, dt_min, dt_max)[:, 0]
    dt_last = jnp.clip(t_last * dt_gamma, dt_min, dt_max) if dt_gamma > 0 else dt_min
    ladder_end = t_last + dt_last
    resume_t = jnp.minimum(jnp.where(has_drop, t_after, ladder_end), fars)
    if ray_chunk_cap is not None:
        # only when the ray's CAPPED chunk set was fully considered — a ray
        # cut by the GLOBAL chunk budget has unprobed chunks BEFORE t_cut,
        # and advancing past them would silently skip their samples (the
        # round-5 capped-eval energy-loss bug); such rays keep the
        # no-progress resume and a later round covers them.
        no_take = cap_cut & (counts == 0) & jnp.logical_not(g_trunc)
        resume_t = jnp.where(no_take, jnp.minimum(t_cut, fars), resume_t)

    return ChunkedMarch(
        sel=sel,
        sel_valid=want <= m_eff,
        m_eff=m_eff,
        ray_mask=ray_mask,
        num_points=total,
        t0=t0,
        resume_t=resume_t,
    )


class StreamMarch(NamedTuple):
    """Result of the materialization-free training march (march_rays_stream).

    Only the occupancy verdict is stored; per-sample t/dt/positions are
    recomputed after global compaction from the closed-form ladder
    (ladder_samples) — 131K vector flops instead of writing + gathering
    24 MB [3, N, S] arrays.
    """

    mask: jax.Array  # [N, S] bool rung validity
    counts: jax.Array  # [N] int32 valid rungs per ray
    t0: jax.Array  # [N] noise-shifted start t (the ladder origin)
    next_t: jax.Array  # [N] resume t (ladder end, clipped to fars)


@partial(
    jax.jit,
    static_argnames=("bound", "cascades", "grid_size", "dt_gamma", "max_steps"),
)
def march_rays_stream(
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    t_start: jax.Array,  # [N]
    fars: jax.Array,  # [N]
    bitfield: jax.Array,
    *,
    bound: float,
    cascades: int,
    grid_size: int,
    dt_gamma: float = 0.0,
    max_steps: int = 1024,
    noise: jax.Array | None = None,
) -> StreamMarch:
    """march_rays_dense minus the [*, N, S] materialization: probe every
    ladder rung, return ONLY the validity mask (+ counts / ladder origin).

    Same rung semantics as march_rays_dense (identical ladder, position,
    mip-level and probe math); callers reconstruct compacted per-sample
    geometry with ladder_samples, which telescopes the depth accumulator
    (t_cum = t + dt - t0) so the dense path's [N, S] cummax/gaps apparatus
    is never built.
    """
    N = rays_o.shape[0]
    S = max_steps
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascades - 1)) / grid_size

    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    t0 = t_start.astype(jnp.float32)
    if noise is not None:
        dt0 = jnp.clip(t0 * dt_gamma, dt_min, dt_max)
        t0 = t0 + dt0 * noise.astype(jnp.float32)

    j = jnp.arange(S, dtype=jnp.int32)
    ts = _t_ladder(t0, j, dt_gamma, dt_min, dt_max)  # [N, S]
    dts = (
        jnp.clip(ts * dt_gamma, dt_min, dt_max)
        if dt_gamma > 0
        else jnp.full_like(ts, dt_min)
    )
    px = jnp.clip(o[:, 0:1] + ts * d[:, 0:1], -bound, bound)
    py = jnp.clip(o[:, 1:2] + ts * d[:, 1:2], -bound, bound)
    pz = jnp.clip(o[:, 2:3] + ts * d[:, 2:3], -bound, bound)
    mx = jnp.maximum(jnp.abs(px), jnp.maximum(jnp.abs(py), jnp.abs(pz)))
    lvl = mip_level_from_max(mx, dts, cascades, grid_size)
    cell = grid_cell_index_comp(px, py, pz, lvl, bound, cascades, grid_size)
    occ = bitfield_probe(bitfield, cell.reshape(-1)).reshape(N, S)
    maskf = occ & (ts < fars[:, None])

    ladder_end = ts[:, -1] + dts[:, -1]
    return StreamMarch(
        mask=maskf,
        counts=maskf.sum(axis=-1).astype(jnp.int32),
        t0=t0,
        next_t=jnp.minimum(ladder_end, fars.astype(jnp.float32)),
    )


def ladder_samples(
    sel: jax.Array,  # [M] flat (ray*S + rung) indices from the compaction
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    t0: jax.Array,  # [N] ladder origin from march_rays_stream
    *,
    bound: float,
    cascades: int,
    grid_size: int,
    dt_gamma: float,
    max_steps: int,
):
    """Reconstruct per-sample geometry for compacted stream slots.

    Returns (ray_id [M], x_cf [3, M], d_cf [3, M], dt [M], t_rel [M]) where
    t_rel = t + dt - t0[ray] is the telescoped per-ray advance the stream
    compositor uses for depth (sum of march gaps telescopes to exactly this).
    All formulas match march_rays_dense bit-for-bit (same ladder closed form,
    same clipped positions).
    """
    S = max_steps
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascades - 1)) / grid_size
    sel = sel.astype(jnp.int32)
    ray_id = sel // S
    rung = sel - ray_id * S

    t0s = jnp.take(t0, ray_id)
    t = _t_ladder(t0s, rung.reshape(-1, 1), dt_gamma, dt_min, dt_max)[:, 0]
    dt = (
        jnp.clip(t * dt_gamma, dt_min, dt_max)
        if dt_gamma > 0
        else jnp.full_like(t, dt_min)
    )
    od = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32)], axis=1
    ).T  # [6, N]
    ods = jnp.take(od, ray_id, axis=1)  # [6, M]
    o_cf, d_cf = ods[:3], ods[3:]
    x_cf = jnp.clip(o_cf + t[None, :] * d_cf, -bound, bound)
    t_rel = t + dt - t0s
    return ray_id, x_cf, d_cf, dt, t_rel


def _march_rays_grouped(
    o, d, t0, fars, bitfield, *,
    bound, cascades, grid_size, dt_gamma, max_steps, K, group,
) -> MarchResult:
    """Two-level march: probe the ladder in groups of `group` rungs against a
    dilated coarse occupancy grid, then fine-probe only the first K/group
    live groups per ray.

    vs the flat path: the [N, S] ladder/position/probe apparatus (S = 512-1024
    rungs) shrinks to [N, S/g] coarse probes + [N, K] fine work — the TPU
    analogue of the CUDA marcher's empty-space DDA skip
    (raymarching.cu:378-427), measured ~4-5x cheaper at bench shapes.

    Budget semantics differ from the flat path under overflow: the flat path
    keeps the first K *occupied* rungs; this path keeps all rungs of the first
    K/g *coarse-live* groups (some of which fine-probe empty).  Both resume
    exactly at the first unprocessed rung/group via next_t, so iterative eval
    converges to the same integral.
    """
    N = o.shape[0]
    S = max_steps
    g = group
    if S % g or K % g:
        raise ValueError(f"max_steps {S} and K {K} must be multiples of group {g}")
    G = S // g
    Gk = K // g
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * (2 ** (cascades - 1)) / grid_size

    # group t-span bound: with dt_gamma=0 every rung advances exactly dt_min —
    # using dt_max here over-dilated the coarse grid 5x (live fraction 0.86 vs
    # 0.47 measured on the bench scene) and truncated rays' group budgets
    halfext = 0.5 * g * (dt_min if dt_gamma <= 0 else dt_max)
    hc = min(32, grid_size)
    coarse = build_coarse_occupancy(
        bitfield, bound=bound, cascades=cascades, grid_size=grid_size,
        halfext=halfext, hc=hc,
    )

    # ---- coarse stage: one probe at each group's t-midpoint ---------------
    jg = jnp.arange(G, dtype=jnp.int32) * g
    t_lo = _t_ladder(t0, jg, dt_gamma, dt_min, dt_max)  # [N, G]
    t_hi = _t_ladder(t0, jg + (g - 1), dt_gamma, dt_min, dt_max)
    tc = 0.5 * (t_lo + t_hi)
    cix = []
    for c in range(3):
        p = jnp.clip(o[:, c : c + 1] + tc * d[:, c : c + 1], -bound, bound)
        cix.append(
            jnp.clip(
                jnp.floor((p + bound) / (2.0 * bound) * hc), 0.0, float(hc - 1)
            ).astype(jnp.int32)
        )
    ccell = (cix[0] * hc + cix[1]) * hc + cix[2]
    live = jnp.take(coarse, ccell.reshape(-1)).reshape(N, G)
    live = live & (t_lo < fars[:, None])

    # ---- select the first Gk live groups (+1 for the resume point) --------
    found, live_counts = _first_k_ranks(live, Gk + 1)
    grp_sel = found[:, :Gk]  # [N, Gk]
    grp_valid = live_counts[:, None] >= jnp.arange(1, Gk + 1, dtype=jnp.int32)[None, :]

    # ---- fine stage: ladder + occupancy probe on selected rungs only ------
    jsel = (grp_sel[:, :, None] * g + jnp.arange(g, dtype=jnp.int32)).reshape(N, K)
    ts = _t_ladder(t0, jsel, dt_gamma, dt_min, dt_max)  # [N, K]
    dts = (
        jnp.clip(ts * dt_gamma, dt_min, dt_max)
        if dt_gamma > 0
        else jnp.full_like(ts, dt_min)
    )
    px = jnp.clip(o[:, 0:1] + ts * d[:, 0:1], -bound, bound)
    py = jnp.clip(o[:, 1:2] + ts * d[:, 1:2], -bound, bound)
    pz = jnp.clip(o[:, 2:3] + ts * d[:, 2:3], -bound, bound)
    mx = jnp.maximum(jnp.abs(px), jnp.maximum(jnp.abs(py), jnp.abs(pz)))
    lvl = mip_level_from_max(mx, dts, cascades, grid_size)
    cell = grid_cell_index_comp(px, py, pz, lvl, bound, cascades, grid_size)
    occ = bitfield_probe(bitfield, cell.reshape(-1)).reshape(N, K)
    gvalid = jnp.repeat(grp_valid, g, axis=1)  # [N, K]
    maskf = occ & (ts < fars[:, None]) & gvalid
    counts = maskf.sum(axis=-1).astype(jnp.int32)

    # gap = advance since the previous VALID sample (invalid rungs are
    # interleaved here, unlike the flat path's compacted slab)
    t_post = ts + dts
    run = jax.lax.cummax(jnp.where(maskf, t_post, -jnp.inf), axis=1)
    prev = jnp.concatenate([t0[:, None], run[:, :-1]], axis=1)
    prev = jnp.maximum(prev, t0[:, None])
    gaps = jnp.where(maskf, t_post - prev, 0.0)

    # resume at the (Gk+1)-th live group's first rung; else past the ladder
    t_last = _t_ladder(t0, jnp.array([S - 1], jnp.int32), dt_gamma, dt_min, dt_max)[:, 0]
    dt_last = jnp.clip(t_last * dt_gamma, dt_min, dt_max) if dt_gamma > 0 else dt_min
    ladder_end = t_last + dt_last
    resume_t = _t_ladder(
        t0, (found[:, Gk] * g)[:, None], dt_gamma, dt_min, dt_max
    )[:, 0]
    next_t = jnp.where(live_counts > Gk, resume_t, ladder_end)
    next_t = jnp.minimum(next_t, fars)

    dirs_cf = jnp.broadcast_to(d.T[:, :, None], (3, N, K))
    zero = jnp.zeros((), jnp.float32)
    return MarchResult(
        xyzs_cf=jnp.where(maskf[None, :, :], jnp.stack([px, py, pz]), zero),
        dirs_cf=dirs_cf,
        dts=jnp.where(maskf, dts, zero),
        gaps=gaps,
        ts=jnp.where(maskf, ts, zero),
        mask=maskf,
        counts=counts,
        next_t=next_t,
    )
