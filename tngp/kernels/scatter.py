"""Pallas TPU scatter-add — the primitive XLA lacks.

XLA lowers `.at[idx].add(vals)` on TPU to a ~12M rows/s serial loop; Mosaic
has no vector scatter either (PERF.md).  This kernel runs a scalar fori_loop
over indices with the accumulator resident in VMEM — measured ~107M rows/s
on v5e for tables up to 2^17 rows.

VMEM geometry: a narrow [rows, C] f32 buffer pads to 512 B/row (128 lanes),
capping one window at 2^17 rows (64 MB).  Larger tables run several MASKED
passes of the same unguarded kernel (out-of-chunk updates write zeros to row
0): measured cheaper than predicated skipping (@pl.when branches cost more
than the wasted accumulate).

Determinism: the grid runs sequentially on the single TPU core and the loop
is sequential, so accumulation order is fixed (unlike the reference's
atomicAdd kernels, gridencoder.cu:246-337).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 8192
_CHUNK_ROWS_F32 = 1 << 17  # 64MB f32 VMEM window (512 B/row after lane padding)
_CHUNK_ROWS_BF16 = 1 << 18  # 64MB bf16 window (256 B/row)


def _scatter_kernel(idx_ref, val_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, _):
        t = idx_ref[j]
        out_ref[pl.ds(t, 1), :] += val_ref[pl.ds(j, 1), :]
        return 0

    jax.lax.fori_loop(0, _BLK, body, 0)


def _one_chunk(idx, vals, rows):
    M, C = vals.shape
    return pl.pallas_call(
        _scatter_kernel,
        grid=(M // _BLK,),
        in_specs=[
            pl.BlockSpec((_BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), vals.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(idx, vals)


def _scatter_kernel_acc(idx_ref, val_ref, acc_hbm, out_ref, sem):
    # the output VMEM window starts UNINITIALIZED (aliasing affects the HBM
    # buffer, not the pipeline window) — seed it from the previous
    # index-chunk's accumulation.  acc stays in HBM (ANY): a VMEM window for
    # it would double the 64 MB footprint past the 128 MB VMEM budget.
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp = pltpu.make_async_copy(acc_hbm, out_ref, sem)
        cp.start()
        cp.wait()

    def body(j, _):
        t = idx_ref[j]
        out_ref[pl.ds(t, 1), :] += val_ref[pl.ds(j, 1), :]
        return 0

    jax.lax.fori_loop(0, _BLK, body, 0)


def _one_chunk_acc(idx, vals, acc):
    """Continue accumulating a later index chunk into `acc` (aliased)."""
    M, C = vals.shape
    rows = acc.shape[0]
    return pl.pallas_call(
        _scatter_kernel_acc,
        grid=(M // _BLK,),
        in_specs=[
            pl.BlockSpec((_BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((rows, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), jnp.float32),
        input_output_aliases={2: 0},
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(idx, vals, acc)


# Mosaic allocates the WHOLE index operand in SMEM (1 MB) regardless of the
# BlockSpec, so one call handles at most ~2^17 int32 indices (512 KB, leaving
# headroom); longer streams run several calls accumulating into an aliased
# buffer.  Measured working envelope on v5e: 131K-index calls compile,
# 270K-index calls are rejected ("prefetched SMEM operand 0" over 1 MB).
_IDX_CHUNK = 1 << 17


def _scatter_window(idx, vals, rows):
    """Scatter a full index stream into one <=2^17-row window, chunking the
    stream itself when it exceeds the SMEM envelope."""
    M = idx.shape[0]
    if M <= _IDX_CHUNK:
        return _one_chunk(idx, vals, rows)
    out = _one_chunk(idx[:_IDX_CHUNK], vals[:_IDX_CHUNK], rows)
    for m0 in range(_IDX_CHUNK, M, _IDX_CHUNK):
        out = _one_chunk_acc(idx[m0:m0 + _IDX_CHUNK], vals[m0:m0 + _IDX_CHUNK],
                             out)
    return out


@partial(jax.jit, static_argnames=("num_rows",))
def scatter_add(
    idx: jax.Array,  # [M] int32 row indices into the output
    vals: jax.Array,  # [M, C] values
    num_rows: int,
) -> jax.Array:
    """Deterministic out[idx[j], :] += vals[j, :]; returns [num_rows, C] f32.

    Tables over 2^17 rows run multiple masked f32 passes.  (A bf16
    accumulator would halve the passes, but Mosaic rejects single-row dynamic
    RMW on 16-sublane bf16 tiles — revisit with paired-row writes.)"""
    M, C = vals.shape
    pad = (-M) % _BLK
    idx = idx.astype(jnp.int32)
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, C), vals.dtype)])
    vals = vals.astype(jnp.float32)
    if num_rows <= _CHUNK_ROWS_F32:
        return _scatter_window(idx, vals, num_rows)
    chunk = _CHUNK_ROWS_F32
    n_chunks = -(-num_rows // chunk)
    outs = []
    for c in range(n_chunks):
        local = idx - c * chunk
        rows = min(chunk, num_rows - c * chunk)
        in_chunk = (local >= 0) & (local < rows)
        outs.append(
            _scatter_window(
                jnp.where(in_chunk, local, 0),
                vals * in_chunk[:, None].astype(jnp.float32),
                rows,
            )
        )
    return jnp.concatenate(outs, axis=0)


def scatter_add_auto(idx: jax.Array, vals: jax.Array, num_rows: int) -> jax.Array:
    """Pallas on TPU, plain XLA scatter elsewhere (CPU tests)."""
    if jax.default_backend() == "tpu":
        return scatter_add(idx, vals, num_rows)
    return jnp.zeros((num_rows, vals.shape[1]), jnp.float32).at[idx].add(
        vals.astype(jnp.float32)
    )


# ---------------------------------------------------------------------------
# lane-packed scalar SET-scatter: out.flat[idx] = val for 1-channel targets
# ---------------------------------------------------------------------------
#
# A [cells] f32 target stored [cells//128, 128] keeps the WHOLE density grid
# (128^3 = 8 MB) in one VMEM window — no masked multi-pass.  Each index
# routes its value to lane idx%128 of row idx//128 with an in-kernel one-hot
# select (Mosaic has no dynamic lane indexing).  Sequential loop ->
# deterministic last-write-wins on duplicates (the reference's tmp_grid
# writes race on duplicates instead, renderer.py:549-574).

_SET_BLK = 8192


def _scatter_set_kernel(idx_ref, val_ref, init_ref, out_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, init_ref[0])

    def body(j, _):
        t = idx_ref[j]
        r = t >> 7
        lane = t & 127
        row = out_ref[pl.ds(r, 1), :]
        out_ref[pl.ds(r, 1), :] = jnp.where(lanes == lane, val_ref[j], row)
        return 0

    jax.lax.fori_loop(0, _SET_BLK, body, 0)


@partial(jax.jit, static_argnames=("num_cells", "init"))
def scatter_set_flat(
    idx: jax.Array,  # [M] int32 flat cell indices in [0, num_cells), or -1
    vals: jax.Array,  # [M] f32 values
    num_cells: int,
    init: float = -1.0,
) -> jax.Array:
    """out[idx[j]] = vals[j] over a flat f32 target, lane-packed.

    Returns [num_cells] f32 initialized to `init`.  num_cells % 128 == 0.
    Duplicates resolve to the LAST write (sequential loop — deterministic,
    unlike the reference's racing tmp_grid writes).  idx == -1 skips (pad
    slots) by routing to an overflow cell appended past the target."""
    assert num_cells % 128 == 0
    M = idx.shape[0]
    pad = (-M) % _SET_BLK
    idx = idx.astype(jnp.int32)
    vals = vals.astype(jnp.float32)
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), jnp.float32)])
    idx = jnp.where(idx < 0, num_cells, idx)  # overflow row absorbs skips
    rows = num_cells // 128 + 1
    out2 = pl.pallas_call(
        _scatter_set_kernel,
        grid=(idx.shape[0] // _SET_BLK,),
        in_specs=[
            pl.BlockSpec((_SET_BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_SET_BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(idx, vals, jnp.full((1,), init, jnp.float32))
    return out2.reshape(-1)[:num_cells]


def scatter_set_flat_auto(idx, vals, num_cells, init=-1.0):
    """Pallas on TPU; XLA scatter elsewhere (CPU tests).  NOTE: on duplicate
    indices the XLA fallback's winner is formally undefined (in practice the
    last update wins on the CPU backend, matching the kernel)."""
    if jax.default_backend() == "tpu":
        return scatter_set_flat(idx, vals, num_cells, init)
    base = jnp.full((num_cells + 1,), jnp.float32(init))
    safe = jnp.where(idx < 0, num_cells, idx.astype(jnp.int32))
    return base.at[safe].set(vals.astype(jnp.float32))[:num_cells]
