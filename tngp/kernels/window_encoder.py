"""Binned window encoder — Pallas MXU kernels for the windowed hash table.

The TPU replacement for gridencoder.cu's gather/atomic-scatter hot loop
(gridencoder/src/gridencoder.cu:88-337).  Semantics are defined by
`tngp/ops/window_table.py` (window_encode_ref is the golden).

Pipeline (all static shapes):
  1. `bin_samples`: counting-sort the M samples into 64 spatial tiles
     (histogram + cumsum ranks — pure vector ops; the permutation is realized
     with one Pallas scatter pass).  Per-tile regions are padded to the
     compute block size so every block is tile-pure.
  2. Precompute the tiny `[NB, L]` per-(block, level) window-id table and
     scalar-prefetch it: each kernel step DMAs every level's window slice
     straight out of the window-layout parameter (no tile-major "fat table"
     is ever materialized — an earlier fat-gather variant cost ~3 ms and
     64 MB of HBM traffic per pass).  One grid step processes every level of
     a block, amortizing per-step overhead 16x (measured: a (NB, L) grid
     spent ~9 us/step on overhead = 46 ms/pass).
  3. forward kernel, grid (NB,): per level build `onehot(row>>7) * w`
     `[8*S, 64]` and matmul against the window (`[8*S, 64] @ [64, 128]` on
     the MXU); a lane-onehot reduce selects `row & 127`.  Level constants
     are static Python — no in-kernel level dispatch.
  4. backward kernel, grid (NB,): the window gradient is the transposed
     matmul `onehot_hi^T @ (onehot_lane * w * g)` per level, written
     directly into per-level `[n_win, C, 128, 64]` outputs.  Blocks hitting
     one window are consecutive grid steps (tile-sorted blocks, monotone
     tile->window maps) — the canonical Pallas revisit-accumulate pattern,
     fp32, deterministic (no atomics, unlike the reference's atomicAdd at
     gridencoder.cu:246-337).

Layout rule: every sample-major array is row-major `[M_pad, *]` (samples on
sublanes) because the onehot matmuls need samples as matrix rows — this keeps
the kernels free of lane<->sublane relayouts.

Input gradients (dy_dx): off by default (NGP training never differentiates
positions), opt-in via `input_grads=True` — the backward runs three extra
forward passes whose interpolation weights are replaced by their per-dim
derivatives (the reference caches dy_dx in the forward instead,
gridencoder.cu:196-241; recomputing is cheaper than materializing a
[M, L*C, 3] tensor).  This is what lets D-NeRF's deform backprop ride the
fast encoder.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.window_table import (
    N_TILES,
    WIN_HI,
    WIN_LANES,
    WIN_ROWS,
    WindowSpec,
    sample_tiles,
)

# fast_hash primes as wrapping int32 (same bit patterns as the uint32 math)
_P1_I32 = np.int32(np.uint32(2654435761).astype(np.int64) - (1 << 32))
_P2_I32 = np.int32(805459861)

DEFAULT_BLOCK = 512


# ---------------------------------------------------------------------------
# binning (counting sort into tile-pure blocks)
# ---------------------------------------------------------------------------


def padded_size(M: int, block: int) -> int:
    """Static upper bound on the tile-padded sample count."""
    return -(-(M + N_TILES * (block - 1)) // block) * block


@partial(jax.jit, static_argnames=("block",))
def bin_dest(x01_cf: jax.Array, block: int = DEFAULT_BLOCK):
    """Counting-sort destinations: M samples -> tile-pure blocks.

    x01_cf: [3, M] in [0,1].  Returns (dest [M] int32 sorted position of each
    sample — an injection into [0, M_pad) — and tob [NB] int32 tile id per
    block).  The hot path never materializes the inverse permutation: sorted
    arrays are realized by scattering payload rows to `dest` (unique indices,
    so the deterministic scatter-add IS the sort), and the un-sort is a
    `dest` gather.
    """
    M = x01_cf.shape[1]
    M_pad = padded_size(M, block)
    NB = M_pad // block

    key = sample_tiles(x01_cf)  # [M]
    # stable within-tile rank via a two-level counting scan: block-local
    # cumsums (short axis-1 scans) + an exclusive block-base cumsum over the
    # tiny [M/BS, 64] totals — equivalent to cumsum(onehot, axis=0) over
    # [M, 64] but without the M-long scan axis (the slow direction on TPU)
    BS = 512
    padm = (-M) % BS
    keyp = jnp.concatenate([key, jnp.full((padm,), -1, jnp.int32)]) if padm else key
    NBk = keyp.shape[0] // BS
    onehot = (
        keyp.reshape(NBk, BS)[:, :, None]
        == jnp.arange(N_TILES, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.int32)  # [NBk, BS, 64]
    blk_cum = jnp.cumsum(onehot, axis=1)  # [NBk, BS, 64]
    blk_tot = blk_cum[:, -1, :]  # [NBk, 64]
    blk_base = jnp.cumsum(blk_tot, axis=0) - blk_tot  # exclusive [NBk, 64]
    counts = blk_tot.sum(axis=0)  # [64]
    padded = -(-counts // block) * block
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )  # [64] exclusive, block-aligned
    cum = (blk_base[:, None, :] + blk_cum).reshape(-1, N_TILES)[:M]  # [M, 64]
    within = jnp.take_along_axis(cum, key[:, None], axis=1)[:, 0] - 1
    dest = jnp.take(starts, key) + within  # [M], unique, < M_pad

    b_start = jnp.arange(NB, dtype=jnp.int32) * block
    tob = jnp.sum(
        (starts[None, :] <= b_start[:, None]).astype(jnp.int32), axis=1
    ) - 1  # [NB], nondecreasing
    return dest, tob


_RANK_BS = 512  # samples per bin-rank kernel block
_RANK_ROWS = 8  # blocks per grid step (Pallas: sublane block dim % 8 == 0)


def _make_bin_rank_kernel(BS: int):
    """Per-block tile ranks + histogram, no [NBk, BS, 64] materialization.

    The XLA formulation of the within-tile counting ranks builds and cumsums
    a [NBk, BS, 64] one-hot (33 MB of HBM traffic at M=131K).  Here each
    block computes its inclusive one-hot cumsum as ONE MXU matmul against a
    lower-triangular constant (0/1 operands in bf16 are exact; accumulation
    is f32, exact to 2^24), extracts each sample's own rank with a 64-row
    one-hot reduce, and emits the block histogram as a second tiny matmul —
    everything stays in VMEM.  Each grid step handles _RANK_ROWS independent
    blocks (static unroll) so the sublane block dim satisfies the Pallas
    divisible-by-8 rule; interpret mode does not enforce it, the device does.
    """

    def kernel(key_ref, lt_ref, rank_ref, tot_ref):
        lt = lt_ref[:]
        tid = jax.lax.broadcasted_iota(jnp.int32, (N_TILES, BS), 0)
        for r in range(_RANK_ROWS):
            keys = key_ref[r : r + 1, :]  # [1, BS] int32 (pad slots = -1)
            mask = keys == tid  # [64, BS] bool — int compare; Mosaic rejects
            onehot = mask.astype(jnp.bfloat16)  # bf16 cmpf ("Target does not
            cum = jnp.dot(                      # support this comparison")
                onehot, lt, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,  # bf16 ops: fp32
            )  # [64, BS] inclusive lane cumsum    # contract is rejected
            own = jnp.sum(
                jnp.where(mask, cum, 0.0), axis=0, keepdims=True
            )  # [1, BS] own-rank+1 (0 for pad slots)
            rank_ref[r : r + 1, :] = own.astype(jnp.int32) - 1
            ones = jnp.ones((1, BS), jnp.bfloat16)
            tot_ref[r : r + 1, :] = jax.lax.dot_general(
                ones, onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ).astype(jnp.int32)  # [1, 64]

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def _bin_ranks_pallas(keyp: jax.Array, interpret: bool = False):
    """keyp: [NBk*BS] int32 padded keys -> (rank [NBk*BS], tot [NBk, 64])."""
    BS = _RANK_BS
    NBk = keyp.shape[0] // BS
    R = _RANK_ROWS
    NBk_pad = -(-NBk // R) * R
    keys2 = keyp.reshape(NBk, BS)
    if NBk_pad != NBk:  # pad rows get key -1 (no tile) -> rank -1, tot 0
        keys2 = jnp.concatenate(
            [keys2, jnp.full((NBk_pad - NBk, BS), -1, jnp.int32)]
        )
    lt = jnp.asarray(
        np.tril(np.ones((BS, BS), np.float32)).T, jnp.bfloat16
    )  # LT[i, j] = 1 iff i <= j
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NBk_pad // R,),
        in_specs=[
            pl.BlockSpec((R, BS), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, BS), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, BS), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, N_TILES), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
    )
    rank, tot = pl.pallas_call(
        _make_bin_rank_kernel(BS),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NBk_pad, BS), jnp.int32),
            jax.ShapeDtypeStruct((NBk_pad, N_TILES), jnp.int32),
        ],
        interpret=interpret,
    )(keys2, lt)
    return rank[:NBk].reshape(-1), tot[:NBk]


@partial(jax.jit, static_argnames=("block", "interpret"))
def bin_dest_pallas(
    x01_cf: jax.Array, block: int = DEFAULT_BLOCK, interpret: bool = False
):
    """bin_dest with the per-block rank/histogram stage on the MXU
    (_bin_ranks_pallas); same contract as bin_dest."""
    M = x01_cf.shape[1]
    M_pad = padded_size(M, block)
    NB = M_pad // block

    key = sample_tiles(x01_cf)  # [M]
    BS = _RANK_BS
    padm = (-M) % BS
    keyp = (
        jnp.concatenate([key, jnp.full((padm,), -1, jnp.int32)]) if padm else key
    )
    rank_blk, tot = _bin_ranks_pallas(keyp, interpret=interpret)
    blk_base = jnp.cumsum(tot, axis=0) - tot  # exclusive [NBk, 64]
    counts = tot.sum(axis=0)  # [64]
    padded = -(-counts // block) * block
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    sidx = jnp.arange(M, dtype=jnp.int32)
    base_s = jnp.take(blk_base.reshape(-1), (sidx // BS) * N_TILES + key)
    dest = jnp.take(starts, key) + base_s + rank_blk[:M]

    b_start = jnp.arange(NB, dtype=jnp.int32) * block
    tob = jnp.sum(
        (starts[None, :] <= b_start[:, None]).astype(jnp.int32), axis=1
    ) - 1
    return dest, tob


@partial(jax.jit, static_argnames=("block",))
def bin_samples(x01_cf: jax.Array, block: int = DEFAULT_BLOCK):
    """bin_dest plus the explicit inverse permutation (tests / debugging;
    perm [M_pad] int32 with sentinel M for padding slots)."""
    M = x01_cf.shape[1]
    dest, tob = bin_dest(x01_cf, block=block)
    M_pad = padded_size(M, block)
    perm = jnp.full((M_pad,), M, jnp.int32).at[dest].set(
        jnp.arange(M, dtype=jnp.int32)
    )
    return dest, perm, tob


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _level_corner_geometry(spec: WindowSpec, level: int, xyz_blk, S: int,
                           deriv: int = -1):
    """In-kernel geometry for one (static) level from an `[8, S]` xyz block
    (rows x,y,z,valid — samples on LANES).  Returns (hi [1,8S] i32,
    lo [1,8S] i32, w [1,8S] f32) corner-major along lanes (col = corner*S +
    sample), weights folded with the validity row.

    deriv in {0,1,2}: replace the interpolation weight with its derivative
    wrt x01[deriv] (the trilinear weight is piecewise-linear per dim, so the
    derivative is the same corner product with dim-`deriv`'s factor replaced
    by ±scale; smoothstep adds the 6f(1-f) chain factor) — a forward pass
    with deriv weights computes dfeat/dx01[deriv], the input-gradient path
    (gridencoder.cu dy_dx semantics, :196-241).

    Everything here is a [1, S]-row op: full lane utilization, no narrow
    column intermediates (a [S, 1] op pays a 128x lane-padding tax)."""
    scale = float(spec.level_scale(level))
    side = int(spec.level_side(level))
    dense = spec.level_dense(level)
    shift = 0.0 if spec.align_corners else 0.5
    pos = [xyz_blk[d : d + 1, :] * scale + shift for d in range(3)]  # [1,S]
    vrow = xyz_blk[3:4, :]
    pg = [jnp.floor(p) for p in pos]
    frac_raw = [p - g for p, g in zip(pos, pg)]
    if spec.interpolation == "smoothstep":
        frac = [f * f * (3.0 - 2.0 * f) for f in frac_raw]
        dfrac = [6.0 * f * (1.0 - f) for f in frac_raw]  # ds/dpos
    else:
        frac = frac_raw
        dfrac = None
    pgi = [g.astype(jnp.int32) for g in pg]
    his, los, ws = [], [], []
    for k in range(8):
        cc = [pgi[d] + ((k >> d) & 1) for d in range(3)]
        if dense:
            row = cc[0] + cc[1] * side + cc[2] * (side * side)
        else:
            row = (cc[0] ^ (cc[1] * _P1_I32) ^ (cc[2] * _P2_I32)) & (WIN_ROWS - 1)
        his.append(row >> 7)
        los.append(row & (WIN_LANES - 1))
        w = vrow
        for d in range(3):
            bit = (k >> d) & 1
            if d == deriv:
                term = 1.0 if bit else -1.0
                if dfrac is not None:
                    w = w * (term * dfrac[d])
                elif bit:
                    pass  # * +1
                else:
                    w = -w
            else:
                w = w * (frac[d] if bit else 1.0 - frac[d])
        if deriv >= 0:
            w = w * scale  # dpos/dx01
        ws.append(w)
    hi = jnp.concatenate(his, axis=1)  # [1, 8S]
    lo = jnp.concatenate(los, axis=1)
    w = jnp.concatenate(ws, axis=1)
    return hi, lo, w


def _mxu_precision(mxu_dtype):
    """TPU lowers f32 matmuls at DEFAULT precision to ONE bf16xbf16 MXU pass
    (measured bit-identical to pre-rounding both operands to bf16) — so
    mxu_f32=True silently rounded the table AND the interpolation weights to
    bf16, and checkpoints trained on-device deviated ~1% from the f32 golden
    path on other backends (the round-2 8 dB cross-backend eval gap).
    HIGHEST forces true-f32 multi-pass accumulation.  bf16 operands must say
    DEFAULT *explicitly*: the package sets jax_default_matmul_precision to
    float32, and Mosaic rejects an fp32 contract precision on bf16 vectors."""
    return (jax.lax.Precision.HIGHEST if mxu_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _make_fwd_kernel(spec: WindowSpec, S: int, mxu_dtype, swap_select=False,
                     deriv: int = -1):
    L, C = spec.num_levels, spec.level_dim
    R = 8 * S
    prec = _mxu_precision(mxu_dtype)

    def kernel(wob_ref, xyz_ref, *win_and_out):
        win_refs, out_ref = win_and_out[:L], win_and_out[L]
        xyz = xyz_ref[:]  # [8, S]
        hrow = jax.lax.broadcasted_iota(jnp.int32, (WIN_HI, R), 0)
        srow = jax.lax.broadcasted_iota(jnp.int32, (WIN_LANES, R), 0)
        rows = []
        for l in range(L):
            hi, lo, w = _level_corner_geometry(spec, l, xyz, S, deriv=deriv)
            if swap_select:
                # contract over LANES on the MXU (K=128, full array depth)
                # and one-hot-reduce over the 64 hi rows — less VPU select
                # work than the hi-contract + 128-row reduce below.  Both
                # channels ride ONE matmul: the per-channel [128,64] windows
                # concatenate to a [128, 64C] operand, so the systolic
                # array's 128 output rows are fully used instead of half
                # (round-5 fwd-kernel utilization fix).
                Bt = jnp.where(srow == lo, w, 0.0).astype(mxu_dtype)  # [128, 8S]
                selh = hrow == hi  # [64, 8S]
                win2 = jnp.concatenate(
                    [win_refs[l][0, c].astype(mxu_dtype) for c in range(C)],
                    axis=1,
                )  # [128, 64C]
                g2 = jax.lax.dot_general(
                    win2, Bt, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # [64C, 8S]
                for c in range(C):
                    g = g2[c * WIN_HI : (c + 1) * WIN_HI]  # 64-row sublane slice
                    val = jnp.sum(jnp.where(selh, g, 0.0), axis=0, keepdims=True)
                    out_c = val[:, 0:S]
                    for k in range(1, 8):  # static lane slices (512-aligned)
                        out_c = out_c + val[:, k * S : (k + 1) * S]
                    rows.append(out_c)
                continue
            At = jnp.where(hrow == hi, w, 0.0).astype(mxu_dtype)  # [64, 8S]
            selm = srow == lo  # [128, 8S]
            for c in range(C):
                win_t = win_refs[l][0, c].astype(mxu_dtype)  # [128, 64]
                # NOTE: Mosaic requires a 32-bit matmul accumulator
                # (preferred_element_type=bf16 fails verification on-device
                # while PASSING in interpret mode — do not retry)
                g = jnp.dot(win_t, At, preferred_element_type=jnp.float32,
                            precision=prec)
                # lane-select row lo via sublane one-hot reduce -> [1, 8S]
                val = jnp.sum(jnp.where(selm, g, 0.0), axis=0, keepdims=True)
                out_c = val[:, 0:S]
                for k in range(1, 8):  # static lane slices (512-aligned)
                    out_c = out_c + val[:, k * S : (k + 1) * S]
                rows.append(out_c)
        out_ref[:] = jnp.concatenate(rows, axis=0)  # [LC, S]

    return kernel


def _make_bwd_kernel(spec: WindowSpec, S: int, mxu_dtype, swap_select=False):
    L, C = spec.num_levels, spec.level_dim
    R = 8 * S
    prec = _mxu_precision(mxu_dtype)

    def kernel(wob_ref, xyz_ref, g_ref, *out_refs):
        b = pl.program_id(0)
        xyz = xyz_ref[:]  # [8, S]
        g_blk = g_ref[:]  # [LC, S]
        hrow = jax.lax.broadcasted_iota(jnp.int32, (WIN_HI, R), 0)
        srow = jax.lax.broadcasted_iota(jnp.int32, (WIN_LANES, R), 0)
        for l in range(L):
            # blocks hitting the same window are consecutive (tiles are
            # block-sorted and tile->window is monotone): the canonical
            # Pallas revisit-accumulate pattern, per level
            first = (b == 0) | (wob_ref[l, b] != wob_ref[l, jnp.maximum(b - 1, 0)])
            hi, lo, w = _level_corner_geometry(spec, l, xyz, S)
            if swap_select:
                # unweighted lane one-hot built ONCE per level; the coef
                # weighting moves to the 64-row hi one-hot per channel
                Bt = (srow == lo).astype(mxu_dtype)  # [128, 8S]
            else:
                At = (hrow == hi).astype(mxu_dtype)  # [64, 8S] unweighted onehot
                selm = srow == lo  # [128, 8S]
            for c in range(C):
                gc = g_blk[l * C + c : l * C + c + 1, :]  # [1, S]
                coef = w * jnp.concatenate([gc] * 8, axis=1)  # [1, 8S]
                if swap_select:
                    Ac = jnp.where(hrow == hi, coef, 0.0).astype(mxu_dtype)  # [64, 8S]
                    gw_t = jax.lax.dot_general(
                        Bt, Ac, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )  # [128, 64]
                else:
                    Bt = jnp.where(selm, coef, 0.0).astype(mxu_dtype)  # [128, 8S]
                    gw_t = jax.lax.dot_general(
                        Bt, At, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )  # [128, 64] = grad window (transposed layout)

                @pl.when(first)
                def _():
                    out_refs[l][0, c] = gw_t

                @pl.when(jnp.logical_not(first))
                def _():
                    out_refs[l][0, c] = out_refs[l][0, c] + gw_t

    return kernel


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _wob_local(spec: WindowSpec, tob: jax.Array) -> jax.Array:
    """[L, NB] within-level window index of each block (prefetched so the
    kernels DMA level slices straight from the window-layout parameter —
    no 64 MB tile-major fat table is ever materialized).

    LEVEL-MAJOR ON PURPOSE: Mosaic lane-pads each ROW of a scalar-prefetch
    operand to 128 entries in SMEM, so the old [NB, L] layout cost
    NB*128*4 = M_pad bytes — at eval chunk 16384 (M_pad = 1,605,632) that
    overflowed the 1 MB SMEM envelope ("prefetched SMEM operand 0",
    u8[1605632] — the round-4 eval800 compile failure).  [L, NB] puts the
    long axis on lanes: L*ceil(NB/128)*512 B ~= M_pad/8, good to ~8M
    samples per call."""
    _, _, _, twin, _ = spec.const_tables()  # twin: [L, 64]
    return jnp.take(jnp.asarray(twin.T), tob, axis=0).T  # [L, NB]


def _level_views(spec: WindowSpec, table_win: jax.Array):
    """Per-level [n_win_l, C, 128, 64] views of the window-layout parameter."""
    offs = spec.win_offsets
    return [table_win[offs[l] : offs[l + 1]] for l in range(spec.num_levels)]


def _fwd_pallas(spec, xyz8, wob, wins, *, block, mxu_dtype, interpret,
                swap_select=False, deriv: int = -1):
    L, C = spec.num_levels, spec.level_dim
    M_pad = xyz8.shape[1]
    NB = M_pad // block

    def win_spec(l):
        return pl.BlockSpec(
            (1, C, WIN_LANES, WIN_HI),
            lambda b, wob, l=l: (wob[l, b], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((8, block), lambda b, wob: (0, b), memory_space=pltpu.VMEM),
        ] + [win_spec(l) for l in range(L)],
        out_specs=pl.BlockSpec(
            (L * C, block), lambda b, wob: (0, b), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_fwd_kernel(spec, block, mxu_dtype, swap_select, deriv),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L * C, M_pad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(wob, xyz8, *wins)


def _bwd_pallas(spec, xyz8, wob, g_sorted, *, block, mxu_dtype, interpret,
                swap_select=False):
    L, C = spec.num_levels, spec.level_dim
    M_pad = xyz8.shape[1]
    NB = M_pad // block
    n_wins = [spec.level_n_win(l) for l in range(L)]

    def out_spec(l):
        return pl.BlockSpec(
            (1, C, WIN_LANES, WIN_HI),
            lambda b, wob, l=l: (wob[l, b], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((8, block), lambda b, wob: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L * C, block), lambda b, wob: (0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[out_spec(l) for l in range(L)],
    )
    gwins = pl.pallas_call(
        _make_bwd_kernel(spec, block, mxu_dtype, swap_select),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_wins[l], C, WIN_LANES, WIN_HI), jnp.float32)
            for l in range(L)
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(wob, xyz8, g_sorted)
    # windows never visited by any block hold uninitialized memory -> zero
    # them, then reassemble the [NW, C, 128, 64] gradient
    out = []
    for l in range(L):
        visited = jnp.zeros((n_wins[l],), jnp.int32).at[wob[l]].set(1)
        out.append(
            jnp.where(visited[:, None, None, None] == 1, gwins[l], 0.0)
        )
    return jnp.concatenate(out, axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def window_encode_binned(
    x01_cf: jax.Array,
    table_win: jax.Array,
    spec: WindowSpec,
    block: int = DEFAULT_BLOCK,
    mxu_f32: bool = True,
    interpret: bool = False,
    swap_select: bool = False,
    input_grads: bool = False,
) -> jax.Array:
    """Windowed grid encode via the binned Pallas path.

    x01_cf: [3, M] in [0,1]; table_win: [NW, C, 128, 64] window-layout
    parameter (window_view of the canonical [total_rows, C]).  Returns
    [L*C, M] f32 features (level-major).  Table gradients flow (in window
    layout).  input_grads=True additionally backprops into x01 (the
    reference's cached-dy_dx path, gridencoder.cu:196-241) via three
    derivative-weight forward passes — needed by D-NeRF's deform backprop;
    off by default because the NGP hot paths never differentiate positions.
    """
    out, _ = _binned_fwd(
        x01_cf, table_win, spec, block, mxu_f32, interpret, swap_select,
        input_grads,
    )
    return out


def _binned_fwd(x01_cf, table_win, spec, block, mxu_f32, interpret,
                swap_select=False, input_grads=False):
    mxu_dtype = jnp.float32 if mxu_f32 else jnp.bfloat16
    M = x01_cf.shape[1]
    dest, tob = bin_dest_pallas(x01_cf, block=block, interpret=interpret)
    M_pad = padded_size(M, block)
    # realize the tile sort by scattering (x, y, z, 1) rows to dest — unique
    # indices, so the deterministic scatter-add IS the sort; padding slots
    # stay zero, which doubles as the validity channel
    from .scatter import scatter_add_auto

    payload = jnp.concatenate(
        [x01_cf.astype(jnp.float32), jnp.ones((1, M), jnp.float32)], axis=0
    ).T  # [M, 4]
    xyz4 = scatter_add_auto(dest, payload, M_pad)  # [M_pad, 4]
    xyz8 = jnp.concatenate(
        [xyz4.T, jnp.zeros((4, M_pad), jnp.float32)], axis=0
    )  # [8, M_pad] channels-first (samples on lanes)
    # per-(block, level) window ids, prefetched: the kernels DMA level slices
    # straight out of the window-layout parameter
    wob = _wob_local(spec, tob)  # [NB, L]
    wins = _level_views(spec, table_win.astype(jnp.float32))
    feats_sorted = _fwd_pallas(
        spec, xyz8, wob, wins, block=block, mxu_dtype=mxu_dtype,
        interpret=interpret, swap_select=swap_select,
    )  # [LC, M_pad]
    feats = jnp.take(feats_sorted.T, dest, axis=0).T  # [LC, M] unsort
    res = (xyz8, dest, wob, M, table_win if input_grads else None)
    return feats, res


def _binned_bwd(spec, block, mxu_f32, interpret, swap_select, input_grads,
                res, g):
    mxu_dtype = jnp.float32 if mxu_f32 else jnp.bfloat16
    from .scatter import scatter_add_auto

    xyz8, dest, wob, M, table_win = res
    M_pad = xyz8.shape[1]
    # sort the cotangents the same way the inputs were sorted
    g_sorted = scatter_add_auto(dest, g.astype(jnp.float32).T, M_pad).T
    gtab_win = _bwd_pallas(
        spec, xyz8, wob, g_sorted, block=block, mxu_dtype=mxu_dtype,
        interpret=interpret, swap_select=swap_select,
    )  # [NW, C, 128, 64]
    if not input_grads:
        return jnp.zeros((3, M), jnp.float32), gtab_win
    # input gradients: dfeat/dx01[j] is the SAME one-hot matmul program with
    # dim-j's interpolation factor replaced by its derivative
    # (_level_corner_geometry deriv=j); contract with the cotangents over
    # the LC feature rows, then unsort
    wins = _level_views(spec, table_win.astype(jnp.float32))
    gx_rows = []
    for j in range(3):
        dj = _fwd_pallas(
            spec, xyz8, wob, wins, block=block, mxu_dtype=mxu_dtype,
            interpret=interpret, swap_select=swap_select, deriv=j,
        )  # [LC, M_pad]
        gx_rows.append(jnp.sum(g_sorted * dj, axis=0))  # [M_pad]
    gx_sorted = jnp.stack(gx_rows, axis=0)  # [3, M_pad]
    gx = jnp.take(gx_sorted.T, dest, axis=0).T  # [3, M]
    return gx, gtab_win


window_encode_binned.defvjp(_binned_fwd, _binned_bwd)
