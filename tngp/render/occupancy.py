"""Occupancy (density) grid maintenance — the -O path's acceleration state.

Behavioral reference: torch-ngp `nerf/renderer.py`:
  buffers/init           (:92-102)  density_grid [CAS, H^3], bitfield, counters
  reset_extra_state      (:114)
  mark_untrained_grid    (:434-496) frustum-visibility culling -> grid = -1
  update_extra_state     (:499-598) full/partial density queries, EMA max,
                                    mean_density, packbits at
                                    min(mean_density, density_thresh)

TPU-first notes
---------------
* Cells are stored in *linear* order (cell = (ix*H + iy)*H + iz), not Morton —
  see ops/grid_utils.py.  All queries are one batched density evaluation.
* The reference's partial update draws H^3/4 random cells plus H^3/4 resampled
  occupied cells via `torch.nonzero` (dynamic shape).  Here the occupied
  resample uses inverse-CDF sampling over the occupancy mask (static shape).
* Updates run under jit with the field's density function closed over; `full`
  is a static flag (the trainer uses full updates for the first 16 rounds like
  the reference's `iter_density < 16`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import packbits


@flax.struct.dataclass
class OccupancyGrid:
    density_grid: jax.Array  # [CAS, H^3] float32; -1 marks untrained cells
    bitfield: jax.Array  # [CAS * H^3 // 8] uint8
    mean_density: jax.Array  # scalar float32
    iter_density: jax.Array  # scalar int32

    @property
    def cascades(self) -> int:
        return self.density_grid.shape[0]


def create(cascades: int, grid_size: int) -> OccupancyGrid:
    H3 = grid_size**3
    return OccupancyGrid(
        density_grid=jnp.zeros((cascades, H3), jnp.float32),
        bitfield=jnp.zeros((cascades * H3 // 8,), jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def _linear_coords(grid_size: int) -> jnp.ndarray:
    """[H^3, 3] int32 cell coords in linear order (ix major, iz fastest)."""
    H = grid_size
    r = jnp.arange(H, dtype=jnp.int32)
    ix, iy, iz = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([ix.reshape(-1), iy.reshape(-1), iz.reshape(-1)], axis=-1)


def _cells_to_world_cf(coords, cas: int, bound: float, grid_size: int, jitter):
    """Cell coords [N, 3] -> jittered world positions [3, N] (channels-first),
    renderer.py:527-533."""
    cas_bound = min(2.0**cas, bound)
    half = cas_bound / grid_size
    xyz = 2.0 * coords.T.astype(jnp.float32) / (grid_size - 1) - 1.0  # [3, N]
    xyz = xyz * (cas_bound - half)
    if jitter is not None:
        xyz = xyz + jitter * half
    return xyz


def _chunked_density(density_fn, params, xyz_cf: jax.Array, chunk: int) -> jax.Array:
    """Query density over [3, N] channels-first points in fixed-size chunks
    (lax.map) to bound the encoder's gather intermediates in HBM."""
    N = xyz_cf.shape[1]
    if N <= chunk:
        return density_fn(params, xyz_cf).reshape(-1)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    xyz_p = jnp.pad(xyz_cf, ((0, 0), (0, pad))).reshape(3, n_chunks, chunk)
    xyz_p = jnp.moveaxis(xyz_p, 1, 0)  # [n_chunks, 3, chunk]
    sig = jax.lax.map(lambda c: density_fn(params, c).reshape(-1), xyz_p)
    return sig.reshape(-1)[:N]


def _sample_occupied_cells(occ: jax.Array, key: jax.Array, n: int):
    """Uniformly sample `n` cell indices from the occupied set — the
    reference's inverse-CDF `searchsorted(cumsum(occ), U(0, total))`
    (renderer.py:556-562), computed by hierarchical 128-way CDF descent.

    Distribution-identical to the flat searchsorted: "first index whose
    running count >= u" decomposes exactly over block partial sums (picking
    the first block whose cumulative count >= u, then descending with the
    residual rank).  On TPU the flat form is 21 binary-search rounds x n
    RANDOM gathers over the H^3 CDF (~171 ms at H=128, N=524K —
    bench_grid_update.py round 4); the descent is 2-3 contiguous row-gathers
    plus [n, <=128]-shaped vector compares.

    Returns (idx [n] int32, total occupied count, float32 scalar)."""
    total = jnp.sum(occ.astype(jnp.float32))
    u = jax.random.uniform(key, (n,)) * jnp.maximum(total, 1.0)
    return _occupied_rank_descend(occ, u), total


def _occupied_rank_descend(occ: jax.Array, u: jax.Array) -> jax.Array:
    """Index of the first cell whose running occupied-count >= u, for each u
    — exactly `searchsorted(cumsum(occ), u, side="left")` (clipped), by
    hierarchical descent.  Factored out of _sample_occupied_cells so tests
    can pin it against the flat form with explicit u."""
    H3 = occ.shape[0]
    occ = occ.astype(jnp.float32)

    def root_descend(cdf, u):
        """Shared root CDF [W]: child = first j with cdf[j] >= u (the
        compare broadcasts without materializing a cumsum per query)."""
        child = jnp.sum((cdf[None, :] < u[:, None]).astype(jnp.int32), axis=1)
        child = jnp.minimum(child, cdf.shape[0] - 1)
        prev = jnp.where(child > 0, jnp.take(cdf, jnp.maximum(child - 1, 0)), 0.0)
        return child, u - prev

    def level_descend(base_idx, need, counts_rows):
        """counts_rows [n, W]: per-child counts under each query's current
        node.  Picks child = first j with cumsum(counts)[j] >= need;
        returns (child index within node, residual need)."""
        cdf_rows = jnp.cumsum(counts_rows, axis=1)
        child = jnp.sum((cdf_rows < need[:, None]).astype(jnp.int32), axis=1)
        child = jnp.minimum(child, counts_rows.shape[1] - 1)
        prev = jnp.where(
            child > 0,
            jnp.take_along_axis(
                cdf_rows, jnp.maximum(child - 1, 0)[:, None], axis=1
            )[:, 0],
            0.0,
        )
        return base_idx * counts_rows.shape[1] + child, need - prev

    if H3 % (128 * 128) == 0 and H3 >= 128 * 128 * 2:
        # three levels: [B2, 128, 128] cells
        B2 = H3 // (128 * 128)
        f = occ.reshape(B2, 128, 128)
        c_block = f.sum(axis=2)  # [B2, 128]
        cdf_super = jnp.cumsum(c_block.sum(axis=1))  # [B2]
        node, need = root_descend(cdf_super, u)
        node, need = level_descend(node, need, jnp.take(c_block, node, axis=0))
        node, _ = level_descend(
            node, need, jnp.take(f.reshape(B2 * 128, 128), node, axis=0)
        )
        return node
    if H3 % 128 == 0 and H3 >= 256:
        B = H3 // 128
        f = occ.reshape(B, 128)
        cdf_block = jnp.cumsum(f.sum(axis=1))  # [B]
        node, need = root_descend(cdf_block, u)
        node, _ = level_descend(node, need, jnp.take(f, node, axis=0))
        return node
    # tiny grids (tests): flat reference form
    cdf = jnp.cumsum(occ)
    return jnp.clip(
        jnp.searchsorted(cdf, u, side="left"), 0, H3 - 1
    ).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "density_fn", "bound", "grid_size", "density_thresh", "full",
        "decay", "density_scale", "chunk", "partial_mode",
    ),
)
def update_density_grid(
    state: OccupancyGrid,
    params,
    key: jax.Array,
    *,
    density_fn: Callable,  # (params, x_cf [3, N]) -> sigma [N] (channels-first)
    bound: float,
    grid_size: int,
    density_thresh: float,
    full: bool,
    decay: float = 0.95,
    density_scale: float = 1.0,
    chunk: int = 2**17,
    partial_mode: str = "resample",
) -> OccupancyGrid:
    cascades = state.density_grid.shape[0]
    H3 = grid_size**3
    tmp = jnp.full_like(state.density_grid, -1.0)
    eff_decay = decay

    if full:
        coords = _linear_coords(grid_size)  # [H^3, 3]
        for cas in range(cascades):
            key, jk = jax.random.split(key)
            jitter = jax.random.uniform(jk, (H3, 3), minval=-1.0, maxval=1.0)
            jitter = jitter.T  # [3, H^3]
            xyz_cf = _cells_to_world_cf(coords, cas, bound, grid_size, jitter)
            sig = _chunked_density(density_fn, params, xyz_cf, chunk) * density_scale
            tmp = tmp.at[cas].set(sig.astype(jnp.float32))
    elif partial_mode == "slab":
        # rotating contiguous half-grid sweep: every cell is refreshed every
        # 2 partial updates, with NO scatter (dynamic-roll + static slice)
        # and NO occupied-cell inverse-CDF — the reference's random-quarter +
        # occupied-quarter resample (renderer.py:549-574) costs a 524K-query
        # searchsorted over a 2M CDF (~21 gather rounds) plus a 1M-element
        # XLA set-scatter, together ~150 ms of the 186 ms partial update at
        # bench shapes.  Refresh-rate accounting vs the reference: occupied
        # cells there are re-queried ~every update, here every 2 — decay^2
        # per refresh keeps the effective per-update EMA decay of live cells
        # identical; empty cells refresh 2x FASTER (every 2 updates vs ~4).
        N2 = H3 // 2
        eff_decay = decay * decay
        for cas in range(cascades):
            key, jk = jax.random.split(key)
            off = (state.iter_density.astype(jnp.int32) % 2) * N2
            idx = (off + jnp.arange(N2, dtype=jnp.int32)) % H3
            H = grid_size
            coords = jnp.stack([idx // (H * H), (idx // H) % H, idx % H], axis=-1)
            jitter = jax.random.uniform(jk, (N2, 3), minval=-1.0, maxval=1.0)
            xyz_cf = _cells_to_world_cf(coords, cas, bound, grid_size, jitter.T)
            sig = _chunked_density(density_fn, params, xyz_cf, chunk) * density_scale
            row = jnp.roll(tmp[cas], -off)
            row = row.at[:N2].set(sig.astype(jnp.float32))
            tmp = tmp.at[cas].set(jnp.roll(row, off))
    else:  # "resample": the reference's exact random+occupied scheme
        N = H3 // 4
        for cas in range(cascades):
            key, k1, k2, jk = jax.random.split(key, 4)
            rand_idx = jax.random.randint(k1, (N,), 0, H3)
            # occupied resample: uniform over occupied cells (the reference's
            # inverse-CDF, renderer.py:556-562).  A flat
            # searchsorted(cumsum(occ), u) is 21 binary-search rounds x N
            # random gathers over the H^3 CDF — measured 171 ms of the 192 ms
            # partial update at H=128 (bench_grid_update.py, round 4); the
            # 128-way hierarchical descent below is distribution-identical
            # and costs 3 row-gathers + [N, 128] vector compares.
            occ = (state.density_grid[cas] > 0).astype(jnp.float32)
            occ_idx, total = _sample_occupied_cells(occ, k2, N)
            occ_idx = jnp.where(total > 0, occ_idx, rand_idx)
            idx = jnp.concatenate([rand_idx, occ_idx])  # [2N]
            H = grid_size
            coords = jnp.stack([idx // (H * H), (idx // H) % H, idx % H], axis=-1)
            jitter = jax.random.uniform(jk, (2 * N, 3), minval=-1.0, maxval=1.0)
            xyz_cf = _cells_to_world_cf(coords, cas, bound, grid_size, jitter.T)
            sig = _chunked_density(density_fn, params, xyz_cf, chunk) * density_scale
            # plain XLA set-scatter: 7.6 ms for 1M indices at H=128 — the
            # lane-packed Pallas set kernel measured SLOWER (11.1 ms), so the
            # round-3 "~80 ms scatter" attribution was wrong (it was the
            # searchsorted above); keep XLA (bench_grid_update.py, round 4)
            tmp = tmp.at[cas, idx].set(sig.astype(jnp.float32))

    valid = (state.density_grid >= 0) & (tmp >= 0)
    grid = jnp.where(
        valid, jnp.maximum(state.density_grid * eff_decay, tmp), state.density_grid
    )
    mean_density = jnp.mean(jnp.maximum(grid, 0.0))
    thresh = jnp.minimum(mean_density, density_thresh)
    bitfield = packbits(grid.reshape(-1), thresh)
    return OccupancyGrid(
        density_grid=grid,
        bitfield=bitfield,
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
    )


@flax.struct.dataclass
class TimeOccupancyGrid:
    """Time-extended density grid for D-NeRF (dnerf/renderer.py:74-100):
    density_grid [T, CAS, H^3], bitfield [T, CAS*H^3//8]; the marcher indexes
    bitfield[floor(time * T)]."""

    density_grid: jax.Array
    bitfield: jax.Array
    mean_density: jax.Array
    iter_density: jax.Array


def create_time(time_size: int, cascades: int, grid_size: int) -> TimeOccupancyGrid:
    H3 = grid_size**3
    return TimeOccupancyGrid(
        density_grid=jnp.zeros((time_size, cascades, H3), jnp.float32),
        bitfield=jnp.zeros((time_size, cascades * H3 // 8), jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def time_slice_index(time, time_size: int):
    """floor(time * T) clamped — the bitfield slice for a render at `time`
    (dnerf/renderer.py:285)."""
    return jnp.clip(
        jnp.floor(jnp.asarray(time, jnp.float32) * time_size).astype(jnp.int32),
        0, time_size - 1,
    )


@partial(
    jax.jit,
    static_argnames=(
        "density_fn", "bound", "grid_size", "density_thresh", "full",
        "decay", "density_scale", "chunk",
    ),
)
def update_time_density_grid(
    state: TimeOccupancyGrid,
    params,
    key: jax.Array,
    *,
    density_fn: Callable,  # (params, x_cf [3, N], t scalar) -> sigma [N]
    bound: float,
    grid_size: int,
    density_thresh: float,
    full: bool,
    decay: float = 0.95,
    density_scale: float = 1.0,
    chunk: int = 2**17,
) -> TimeOccupancyGrid:
    """Per-time-slice update with time jitter (dnerf/renderer.py:454-547).
    Full mode queries every cell of every slice; partial mode samples
    H^3/4 random + H^3/4 occupied cells per (time, cascade)."""
    T, cascades, H3 = state.density_grid.shape
    times = (jnp.arange(T, dtype=jnp.float32) + 0.5) / T
    keys = jax.random.split(key, T)

    def one_slice(args):
        """Update one time slice -> tmp [CAS, H^3] (mapped over T, so the graph
        contains a single copy regardless of time_size)."""
        t_base, k, slice_grid = args
        k, tk = jax.random.split(k)
        # time jitter within the slice (dnerf/renderer.py:470)
        t_val = t_base + (jax.random.uniform(tk) - 0.5) / T
        tmp_s = jnp.full((cascades, H3), -1.0, jnp.float32)
        if full:
            coords = _linear_coords(grid_size)
            for cas in range(cascades):
                k, jk = jax.random.split(k)
                jitter = jax.random.uniform(jk, (3, H3), minval=-1.0, maxval=1.0)
                xyz_cf = _cells_to_world_cf(coords, cas, bound, grid_size, jitter)
                sig = _chunked_density(
                    lambda p, x: density_fn(p, x, t_val), params, xyz_cf, chunk
                ) * density_scale
                tmp_s = tmp_s.at[cas].set(sig.astype(jnp.float32))
        else:
            N = H3 // 4
            for cas in range(cascades):
                k, k1, k2, jk = jax.random.split(k, 4)
                rand_idx = jax.random.randint(k1, (N,), 0, H3)
                occ = (slice_grid[cas] > 0).astype(jnp.float32)
                occ_idx, total = _sample_occupied_cells(occ, k2, N)
                occ_idx = jnp.where(total > 0, occ_idx, rand_idx)
                idx = jnp.concatenate([rand_idx, occ_idx])
                H = grid_size
                coords = jnp.stack([idx // (H * H), (idx // H) % H, idx % H], axis=-1)
                jitter = jax.random.uniform(jk, (3, 2 * N), minval=-1.0, maxval=1.0)
                xyz_cf = _cells_to_world_cf(coords, cas, bound, grid_size, jitter)
                sig = _chunked_density(
                    lambda p, x: density_fn(p, x, t_val), params, xyz_cf, chunk
                ) * density_scale
                tmp_s = tmp_s.at[cas, idx].set(sig.astype(jnp.float32))
        return tmp_s

    tmp = jax.lax.map(one_slice, (times, keys, state.density_grid))

    valid = (state.density_grid >= 0) & (tmp >= 0)
    grid = jnp.where(valid, jnp.maximum(state.density_grid * decay, tmp), state.density_grid)
    mean_density = jnp.mean(jnp.maximum(grid, 0.0))
    thresh = jnp.minimum(mean_density, density_thresh)
    bitfield = jax.vmap(lambda g: packbits(g.reshape(-1), thresh))(grid)
    return TimeOccupancyGrid(
        density_grid=grid,
        bitfield=bitfield,
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
    )


@partial(jax.jit, static_argnames=("bound", "grid_size"))
def mark_untrained_grid(
    state: OccupancyGrid,
    poses: jax.Array,  # [B, 4, 4] c2w
    intrinsics: jax.Array,  # [4] fx, fy, cx, cy
    *,
    bound: float,
    grid_size: int,
) -> OccupancyGrid:
    """Mark cells invisible from every training camera as -1 (renderer.py:434-496)."""
    cascades = state.density_grid.shape[0]
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    coords = _linear_coords(grid_size)
    world = 2.0 * coords.astype(jnp.float32) / (grid_size - 1) - 1.0  # [H^3, 3]

    grid = state.density_grid
    H3 = grid_size**3
    chunk = 2**17
    n_chunks = -(-H3 // chunk)
    for cas in range(cascades):
        cas_bound = min(2.0**cas, bound)
        half = cas_bound / grid_size
        pts = world * (cas_bound - half)  # [H^3, 3]
        pad = n_chunks * chunk - H3
        pts_p = jnp.pad(pts, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)

        def visible_count(p):
            # world -> cam: (p - t) @ R, componentwise to avoid a [B, chunk, 3]
            # feature-minor temp (42x tile padding on TPU)
            rel = [p[:, d][None, :] - poses[:, d, 3][:, None] for d in range(3)]  # 3x [B, chunk]
            cam = [
                sum(rel[j] * poses[:, j, k][:, None] for j in range(3)) for k in range(3)
            ]
            mask_z = cam[2] > 0
            mask_x = jnp.abs(cam[0]) < cx / fx * cam[2] + half * 2
            mask_y = jnp.abs(cam[1]) < cy / fy * cam[2] + half * 2
            return (mask_z & mask_x & mask_y).sum(axis=0)

        count = jax.lax.map(visible_count, pts_p).reshape(-1)[:H3]
        grid = grid.at[cas].set(jnp.where(count == 0, -1.0, grid[cas]))
    return state.replace(density_grid=grid)
