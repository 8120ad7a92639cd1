"""Global valid-sample compaction — the TPU analogue of the reference's
`mean_count` point budget (raymarching.py:200-232: march allocates M ~=
mean_count points and drops overflow).

After marching, only ~counts/K of the [N, K] slab slots are valid; querying
the field on every slot wastes encoder gathers and (especially) backward
scatter-adds, which are the TPU bottleneck (see PERF.md).  This op compacts
the first `M_budget` valid samples across ALL rays into a tight buffer (same
budget semantics as the reference: overflow samples are dropped), and returns
the rank map to broadcast field outputs back to slab form — a gather, never a
scatter.

All index math is the branch-free binary search over a monotone cumsum (see
ops/march.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Compaction(NamedTuple):
    sel: jax.Array  # [M_budget] flat slab index of each compacted sample
    sel_valid: jax.Array  # [M_budget] bool: slot holds a real sample
    rank: jax.Array  # [N, K] int32 rank of each slab slot among valid (clipped)
    in_budget: jax.Array  # [N, K] bool: slot valid AND within budget


class StreamCompaction(NamedTuple):
    """Prefix compaction without the [N, K] rank/in_budget maps.

    Selects the first `m_eff` valid samples in flat (ray-major) order, where
    m_eff = min(M_budget, number of valid samples inside the selected chunk
    prefix) — see compact_mask_hier.  Everything a stream consumer needs
    (which rays lost samples, which slots are padding) derives from `m_eff`
    and the per-ray valid counts the march already computed, so the 2M-flag
    rank cumsum of the flat path is never built.
    """

    sel: jax.Array  # [M_budget] flat slab index, ascending (ray-major)
    sel_valid: jax.Array  # [M_budget] bool: slot holds a real sample
    m_eff: jax.Array  # [] int32: number of real samples selected


def ray_in_budget_from_counts(counts: jax.Array, m_eff) -> jax.Array:
    """[N] bool: ray kept ALL of its valid samples under the budget.

    Samples are selected as a prefix of flat ray-major order, so a ray is
    fully in budget iff the inclusive cumsum of per-ray valid counts is
    <= m_eff (the reference's overflow-ray drop, raymarching.cu:521-528)."""
    return jnp.cumsum(counts.astype(jnp.int32)) <= m_eff


@partial(jax.jit, static_argnames=("M_budget",))
def compact_mask(mask: jax.Array, M_budget: int) -> Compaction:
    """mask: [N, K] bool -> compaction to M_budget samples (ray-major order)."""
    N, K = mask.shape
    M = N * K
    flat = mask.reshape(-1)
    rank_incl = jnp.cumsum(flat.astype(jnp.int32))  # [M] inclusive
    total = rank_incl[-1]

    # sel[j] = flat index of the j-th valid sample.  jnp.nonzero with a
    # static size measures ~20% faster than the 21-round binary search over
    # rank_incl on v5e (19.1 vs 23.9 ms at M=131K over 2M flags)
    (sel,) = jnp.nonzero(flat, size=M_budget, fill_value=M - 1)
    sel = sel.astype(jnp.int32)
    want = jnp.arange(1, M_budget + 1, dtype=jnp.int32)
    sel_valid = want <= total

    rank = (rank_incl.reshape(N, K) - 1).astype(jnp.int32)
    in_budget = mask & (rank < M_budget)
    return Compaction(
        sel=sel, sel_valid=sel_valid,
        rank=jnp.clip(rank, 0, M_budget - 1), in_budget=in_budget,
    )


@partial(jax.jit, static_argnames=("M_budget", "G", "chunk_budget"))
def compact_mask_hier(
    mask: jax.Array, M_budget: int, G: int = 8, chunk_budget: int | None = None
) -> StreamCompaction:
    """Two-level prefix compaction: nonzero over rung-chunks, then over the
    selected chunks' slots — ~G x less scan/scatter work than the flat
    jnp.nonzero over N*K flags (measured 18 ms of the 86 ms train step at
    bench shapes; jnp.nonzero lowers to cumsum + bincount-scatter over every
    flag).

    Exact-prefix semantics: chunks are selected in flat order, and all valid
    samples live in live chunks, so the selected sample set is exactly the
    first m_eff valid samples in flat order with
    m_eff = min(M_budget, #valid in the first `chunk_budget` live chunks).
    With chunk_budget >= N*K/G this degenerates to the flat compaction.
    """
    N, K = mask.shape
    M = N * K
    flat = mask.reshape(-1)
    pad = (-M) % G
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), bool)])
    NC = (M + pad) // G
    flags = flat.reshape(NC, G)
    chunk_any = flags.any(axis=1)

    if chunk_budget is None:
        # covers the full budget whenever live chunks average >= G/3 valid
        # rungs (march validity is run-clustered; see PERF.md)
        chunk_budget = -(-3 * M_budget // G)
    CB = min(NC, -(-chunk_budget // 128) * 128)

    (csel,) = jnp.nonzero(chunk_any, size=CB, fill_value=NC - 1)
    csel = csel.astype(jnp.int32)
    n_live = chunk_any.sum().astype(jnp.int32)
    # fill slots alias chunk NC-1: zero their flags so stage 2 never double
    # counts a real chunk
    cand = jnp.take(flags, csel, axis=0) & (
        jnp.arange(CB, dtype=jnp.int32)[:, None] < n_live
    )  # [CB, G]
    m_eff = jnp.minimum(cand.sum().astype(jnp.int32), M_budget)

    (s2,) = jnp.nonzero(cand.reshape(-1), size=M_budget, fill_value=0)
    s2 = s2.astype(jnp.int32)
    sel = jnp.take(csel, s2 // G) * G + (s2 % G)
    sel = jnp.minimum(sel, M - 1)
    want = jnp.arange(1, M_budget + 1, dtype=jnp.int32)
    return StreamCompaction(sel=sel, sel_valid=want <= m_eff, m_eff=m_eff)


def gather_cf(x_cf: jax.Array, comp: Compaction) -> jax.Array:
    """[C, N*K] channels-first samples -> [C, M_budget] compacted."""
    return jnp.take(x_cf, comp.sel, axis=1)


def expand_to_slab(values: jax.Array, comp: Compaction, N: int, K: int) -> jax.Array:
    """[M_budget] (or [C, M_budget]) field outputs -> [N, K] (or [C, N, K]),
    zero outside the budget."""
    if values.ndim == 1:
        out = jnp.take(values, comp.rank.reshape(-1)).reshape(N, K)
        return jnp.where(comp.in_budget, out, 0.0)
    C = values.shape[0]
    out = jnp.take(values, comp.rank.reshape(-1), axis=1).reshape(C, N, K)
    return jnp.where(comp.in_budget[None], out, 0.0)
