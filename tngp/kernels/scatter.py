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
