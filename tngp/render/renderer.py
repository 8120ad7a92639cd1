"""Volume renderer: occupancy-grid path (train + iterative eval) and the
uniform/PDF sampling path.

Behavioral reference: torch-ngp `nerf/renderer.py`:
  run_cuda (:257-426) — the -O hot path: near/far, bg model, march, field
      query, composite, `image += (1-ws)*bg`,
      `depth = clamp(depth - nears, 0) / (fars - nears)`
  run      (:126-254) — uniform `num_steps` sampling + sample_pdf upsampling,
      vectorized cumprod transmittance
  render   (:601-629) — dispatcher (staged chunking handled by the caller here)

TPU-first notes
---------------
* Training marches once with a static sample budget K (ops/march.py); the
  CUDA mean_count-driven allocation becomes the static K, tunable per config.
* Eval replaces the alive-ray compaction loop (renderer.py:376-420) with a
  `lax.while_loop` over at most ceil(max_steps / K_eval) rounds; every round
  marches ALL rays from their current `rays_t` (dead rays produce zero valid
  samples) — no dynamic shapes, wasted lanes instead of compaction.
* The field is queried on every slab slot including masked-off ones (their
  sigma contribution is masked in the compositor); this is the static-shape
  price, minimized by the budget K.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import (
    march_rays,
    near_far_from_aabb,
    sample_pdf,
    sph_from_ray,
)
from ..ops.composite import composite_rays_cf, composite_stream, composite_weights


@dataclass(frozen=True)
class RenderConfig:
    bound: float = 1.0
    cascades: int = 1  # 1 + ceil(log2(bound)) in the reference (renderer.py:84)
    grid_size: int = 128
    min_near: float = 0.2
    density_scale: float = 1.0
    dt_gamma: float = 0.0
    max_steps: int = 1024
    K: int = 128  # train sample budget per ray
    K_eval: int = 64  # per-round eval budget
    T_thresh: float = 1e-4
    bg_radius: float = -1.0
    density_thresh: float = 10.0  # occupancy threshold (main_nerf.py --density_thresh)
    num_steps: int = 128  # uniform-path coarse samples (reference --num_steps)
    upsample_steps: int = 128  # uniform-path importance samples (--upsample_steps)
    # >0: two-level coarse-grouped march (ops/march.py _march_rays_grouped) —
    # the TPU analogue of the CUDA marcher's empty-space skip
    # (raymarching.cu:378-427).  0 = flat probe-every-rung path.
    march_group: int = 0
    # global sample budget M (as a fraction of N*K) for train-time compaction —
    # the reference's mean_count semantics (raymarching.py:200-232): only the
    # first M valid samples are queried/backpropped, overflow is dropped.
    # 1.0 disables compaction.
    compact_fraction: float = 1.0
    # slab-free training march (ops/march.py march_rays_dense): skip the
    # per-ray K compaction and let the global budget do all the work — saves
    # ~68 ms/step at bench shapes.  Requires compact_fraction < 1.
    march_dense: bool = False
    # single-pass stream eval: dense-march the whole ladder once, field-query
    # the first N*K*eval_budget valid samples in one stream batch, composite;
    # residual rounds run over alive-compacted rays only
    eval_stream: bool = True
    # first-pass eval sample budget as a multiple of N*K (0.75 covers the
    # mean ray with headroom; long-tail rays finish in residual rounds)
    eval_budget: float = 0.75
    # >0: two-level chunked march for the dense train/eval stream paths
    # (ops/march.py march_rays_chunked): probe G-rung chunk midpoints against
    # a dilated full-resolution grid, fine-probe only candidate chunks —
    # ~3x fewer probe gathers (the march's whole cost is the XLA gather
    # ceiling).  0 = flat probe-every-rung stream path.
    march_chunk: int = 8
    # frame-level eval (render/frame_eval.py FrameRenderer) policy: alive-
    # buffer sizes of the residual-round tier ladder (each tier's round
    # program compiles once) and the total sample budget shared by one
    # residual round (reference semantics: n_step = max(min(N//n_alive, 8),
    # 1), nerf/renderer.py:392 — crowded rounds march shallow, the long
    # tail marches deep).
    eval_tiers: tuple = (1024, 4096, 16384, 32768, 65536)
    eval_round_budget: int = 1 << 19
    # eval march granularity: probe-chunk size G for the FrameRenderer's
    # first pass and residual rounds.  The eval march wall is coarse-ladder
    # probe count (N * max_steps / G gathers) + the [N * NCr] live-mask
    # compaction, NOT occupancy work (round-5 stage profile: 35 ms of a
    # 43 ms first-pass chunk at G=8, N=16384) — a larger G cuts both
    # linearly, at the price of a wider dilation radius (more conservative
    # live chunks; the chunk budget caps that cost and rays truncated by it
    # just resume next round).  0 = use march_chunk.
    eval_march_chunk: int = 16
    # ladder window (rungs) a residual round considers from each ray's
    # resume t — rounds need the next ~k samples, not the full remaining
    # ladder; rays that exhaust the window resume at its end (march
    # ladder_steps semantics).  0 = full max_steps.
    eval_round_ladder: int = 256
    # first-pass chunk budget as a multiple of M/G.  A larger eval G widens
    # the dilation radius, so more (conservatively) live chunks compete for
    # the chunk budget; 3.0 truncated ~2x more rays into residual rounds at
    # G=32 than G=8 (round-5 sweep).  Fine-probe cost is mult * M gathers.
    eval_cb_mult: float = 6.0
    # per-ray live-chunk cap for the eval march (march ray_chunk_cap): each
    # ray keeps only its first P live chunks, spending the global chunk
    # budget fairly instead of flooding on camera-near rays; capped rays
    # resume in a residual round.  0 = uncapped.
    eval_ray_chunk_cap: int = 8

    @staticmethod
    def from_bound(bound: float, **kw) -> "RenderConfig":
        import math

        cascades = 1 + max(0, math.ceil(math.log2(bound))) if bound > 1 else 1
        return RenderConfig(bound=bound, cascades=cascades, **kw)

    @property
    def aabb(self):
        b = self.bound
        return jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)


class FieldFns(NamedTuple):
    """Functional field interface (the renderer never sees module internals).

    Channels-first (batch minor — the TPU hot-path layout, see ops/hashgrid.py):
    sigma_rgb: (params, x_cf[3,B], d_cf[3,B]) -> (sigma[B], rgb_cf[3,B])
    density:   (params, x_cf[3,B]) -> sigma[B]
    background:(params, sph_cf[2,B], d_cf[3,B]) -> rgb_cf[3,B], or None
    """

    sigma_rgb: Callable
    density: Callable
    background: Optional[Callable] = None

    @staticmethod
    def from_model(model, method_prefix: str = "") -> "FieldFns":
        """Build from a flax module exposing sigma_rgb_cf/density_cf[/background_cf]."""
        bg = None
        if getattr(model, "bg_radius", -1.0) > 0:
            bg = lambda p, sph_cf, d_cf: model.apply(
                p, sph_cf, d_cf, method=type(model).background_cf
            )
        return FieldFns(
            sigma_rgb=lambda p, x_cf, d_cf: model.apply(
                p, x_cf, d_cf, method=type(model).sigma_rgb_cf
            ),
            density=lambda p, x_cf: model.apply(
                p, x_cf, method=type(model).density_cf
            )["sigma"],
            background=bg,
        )


def dilated_chunk_grid(bitfield: jax.Array, cfg: RenderConfig):
    """Precompute the chunked-march dilated occupancy grid for `cfg`.

    Returns None when the chunked path is off.  Trainers call this whenever
    the bitfield changes (every update_extra_interval steps) and pass the
    result to render_rays_train/eval via `dilated_grid` so the 3-pool dilated
    build leaves the per-step program."""
    if not (cfg.march_chunk > 0 and cfg.max_steps % cfg.march_chunk == 0):
        return None
    from ..ops.march import build_dilated_cell_grid, chunk_dilate

    return build_dilated_cell_grid(
        bitfield, bound=cfg.bound, cascades=cfg.cascades,
        grid_size=cfg.grid_size,
        dilate=chunk_dilate(cfg.march_chunk, cfg.max_steps, cfg.grid_size,
                            cfg.bound),
    )


def _resolve_bg(field: FieldFns, params, rays_o, rays_d, cfg: RenderConfig, bg_color):
    if cfg.bg_radius > 0 and field.background is not None:
        sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)
        rgb_cf = field.background(params, sph.T, rays_d.T)
        return rgb_cf.T  # [N, 3]
    if bg_color is None:
        return jnp.ones((), jnp.float32)
    return bg_color


def render_rays_train(
    field: FieldFns,
    params,
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    bitfield: jax.Array,
    cfg: RenderConfig,
    key: jax.Array | None = None,  # None -> no perturb
    bg_color=None,  # None -> 1.0, or [N, 3] / [3]
    dilated_grid=None,  # precomputed build_dilated_cell_grid(bitfield) — the
    # bitfield only changes every update_extra_interval steps, so trainers
    # hoist the 3-pool dilated build out of the per-step program (see
    # Trainer.maybe_update_grid); None rebuilds it inline (same numerics)
):
    """Single-march budgeted training render. Returns dict(image, depth,
    weights_sum, num_points)."""
    N = rays_o.shape[0]
    nears, fars = near_far_from_aabb(rays_o, rays_d, cfg.aabb, cfg.min_near)
    bg = _resolve_bg(field, params, rays_o, rays_d, cfg, bg_color)

    noise = None
    if key is not None:
        noise = jax.random.uniform(key, (N,))
    if cfg.march_dense:
        if cfg.compact_fraction >= 1.0:
            raise ValueError("march_dense requires compact_fraction < 1")
        from ..ops.compaction import compact_mask_hier, ray_in_budget_from_counts
        from ..ops.march import (
            ladder_samples,
            march_rays_chunked,
            march_rays_stream,
        )

        S = cfg.max_steps
        M_budget = min(
            N * S,
            max(128, -(-int(N * cfg.K * cfg.compact_fraction) // 128) * 128),
        )
        # materialization-free march: only validity survives the march;
        # compacted per-sample geometry is recomputed from the closed-form
        # ladder (march.py ladder_samples) — no [3, N, S] buffers, no
        # 2M-element rank cumsum, no per-sample dt/gap gathers
        if cfg.march_chunk > 0 and S % cfg.march_chunk == 0:
            cm = march_rays_chunked(
                rays_o, rays_d, nears, fars, bitfield,
                bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
                dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps,
                M_budget=M_budget, G=cfg.march_chunk, noise=noise,
                dilated_grid=dilated_grid,
            )
            sel, sel_valid, t0 = cm.sel, cm.sel_valid, cm.t0
            ray_mask, num_points = cm.ray_mask, cm.num_points
        else:
            res = march_rays_stream(
                rays_o, rays_d, nears, fars, bitfield,
                bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
                dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps, noise=noise,
            )
            comp = compact_mask_hier(res.mask, M_budget)
            sel, sel_valid, t0 = comp.sel, comp.sel_valid, res.t0
            # rays that lost samples to the global budget must not contribute
            # to the loss (reference drops overflow rays,
            # raymarching.cu:521-528)
            ray_mask = ray_in_budget_from_counts(res.counts, comp.m_eff)
            num_points = res.counts.sum()
        ray_id, x_c, d_c, dt_c, t_rel = ladder_samples(
            sel, rays_o, rays_d, t0,
            bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
            dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps,
        )
        out = field.sigma_rgb(params, x_c, d_c)
        valid_f = sel_valid.astype(jnp.float32)
        aux = None
        if len(out) == 3:
            sig_c, rgb_c, aux_c = out
            denom = jnp.maximum(num_points.astype(jnp.float32), 1.0)
            aux = jax.tree_util.tree_map(
                lambda a: (a.reshape(-1) * valid_f).sum() / denom, aux_c
            )
        else:
            sig_c, rgb_c = out
        ws, depth_raw, image = composite_stream(
            sig_c.astype(jnp.float32) * cfg.density_scale,
            rgb_c, dt_c, None, ray_id, sel_valid, N, cfg.T_thresh,
            t_cum=t_rel,
        )
        image = image + (1.0 - ws)[:, None] * bg
        depth = jnp.clip(depth_raw - nears, 0.0) / jnp.maximum(fars - nears, 1e-6)
        results = {
            "image": image,
            "depth": depth,
            "weights_sum": ws,
            "num_points": num_points,
            "ray_mask": ray_mask,
        }
        if aux is not None:
            results["aux"] = aux
        return results
    else:
        res = march_rays(
            rays_o, rays_d, nears, fars, bitfield,
            bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
            dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps, K=cfg.K, noise=noise,
            group=cfg.march_group,
        )
    K_eff = res.mask.shape[-1]  # K (slab) or max_steps (dense)

    if cfg.compact_fraction < 1.0:
        # query only the first M valid samples across all rays (global
        # budget), then composite on the compacted stream — field query AND
        # compositor both see exactly M samples; the [N, K] slab is never
        # rebuilt (expand-to-slab was ~8M gather indices/step at bench shapes)
        from ..ops.compaction import compact_mask, gather_cf

        # budget is defined in units of N*K regardless of slab vs dense march
        M_budget = min(
            N * K_eff,
            max(128, -(-int(N * cfg.K * cfg.compact_fraction) // 128) * 128),
        )
        comp = compact_mask(res.mask, M_budget)
        ray_id = comp.sel.astype(jnp.int32) // K_eff  # [M] nondecreasing
        x_c = gather_cf(res.xyzs_cf.reshape(3, -1), comp)
        # directions per sample are just the ray's direction — gather from the
        # tiny [3, N] array instead of materializing a [3, N, K] broadcast
        d_c = jnp.take(rays_d.T.astype(jnp.float32), ray_id, axis=1)
        out = field.sigma_rgb(params, x_c, d_c)
        valid_f = comp.sel_valid.astype(jnp.float32)
        aux = None
        if len(out) == 3:
            sig_c, rgb_c, aux_c = out
            denom = jnp.maximum(res.mask.sum().astype(jnp.float32), 1.0)
            aux = jax.tree_util.tree_map(
                lambda a: (a.reshape(-1) * valid_f).sum() / denom, aux_c
            )
        else:
            sig_c, rgb_c = out
        # composite directly on the compacted stream — no expand-to-slab
        dt_c = jnp.take(res.dts.reshape(-1), comp.sel)
        gap_c = jnp.take(res.gaps.reshape(-1), comp.sel)
        ws, depth_raw, image = composite_stream(
            sig_c.astype(jnp.float32) * cfg.density_scale,
            rgb_c, dt_c, gap_c, ray_id, comp.sel_valid, N, cfg.T_thresh,
        )
        # rays that lost samples to the global budget must not contribute to
        # the loss (reference: overflow rays are zeroed and skipped,
        # raymarching.cu:521-528) — surface the mask for the trainer
        ray_in_budget = jnp.all(comp.in_budget == res.mask, axis=-1)
        image = image + (1.0 - ws)[:, None] * bg
        depth = jnp.clip(depth_raw - nears, 0.0) / jnp.maximum(fars - nears, 1e-6)
        results = {
            "image": image,
            "depth": depth,
            "weights_sum": ws,
            "num_points": res.counts.sum(),
            "counts": res.counts,
            "ray_mask": ray_in_budget,
        }
        if aux is not None:
            results["aux"] = aux
        return results

    # no global budget: query every slab slot and composite slab-wise
    out = field.sigma_rgb(
        params, res.xyzs_cf.reshape(3, -1), res.dirs_cf.reshape(3, -1)
    )
    # optional aux dict of [B]-shaped per-sample scalars (e.g. |deform| for
    # the D-NeRF regularizer) as a third return value
    aux = None
    if len(out) == 3:
        sigmas, rgbs_cf, aux = out
    else:
        sigmas, rgbs_cf = out
    sigmas = (sigmas.reshape(N, K_eff).astype(jnp.float32)) * cfg.density_scale
    rgbs_cf = rgbs_cf.reshape(3, N, K_eff)

    ws, depth, image, _ = composite_rays_cf(
        sigmas, rgbs_cf, res.dts, res.gaps, res.mask, cfg.T_thresh
    )
    image = image + (1.0 - ws)[:, None] * bg
    depth = jnp.clip(depth - nears, 0.0) / jnp.maximum(fars - nears, 1e-6)
    results = {
        "image": image,
        "depth": depth,
        "weights_sum": ws,
        "num_points": res.counts.sum(),
        "counts": res.counts,
        "ray_mask": jnp.ones((N,), bool),
    }
    if aux is not None:
        m = res.mask.reshape(-1).astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)
        results["aux"] = jax.tree_util.tree_map(
            lambda a: (a.reshape(-1) * m).sum() / denom, aux
        )
    return results


def _eval_stream_pass(
    field, params, rays_o, rays_d, nears, fars, bitfield, cfg, dgrid=None,
    G=None,
):
    """First eval pass: dense march once, field-query the first M valid
    samples globally (ray-major), stream-composite.  Rays whose samples were
    dropped by the global budget resume at their first un-queried rung —
    correctness is preserved by the residual round loop, so the budget only
    trades a (rare) extra residual round for never padding per-ray batches.
    Returns (rays_t, ws, depth_raw, image) accumulated state."""
    from ..ops.compaction import compact_mask_hier
    from ..ops.march import (
        SQRT3,
        _t_ladder,
        march_rays_chunked,
        march_rays_stream,
    )

    N = rays_o.shape[0]
    S = cfg.max_steps
    M = min(N * S, max(128, -(-int(N * cfg.K * cfg.eval_budget) // 128) * 128))
    G = cfg.march_chunk if G is None else G
    if cfg.march_chunk > 0 and S % G == 0:
        cb = -(-int(cfg.eval_cb_mult * M) // G)
        cap = cfg.eval_ray_chunk_cap or None
        cm = march_rays_chunked(
            rays_o, rays_d, nears, fars, bitfield,
            bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
            dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps,
            M_budget=M, G=G, dilated_grid=dgrid, chunk_budget=cb,
            ray_chunk_cap=cap,
        )
        sel, sel_valid, t0, rays_t = cm.sel, cm.sel_valid, cm.t0, cm.resume_t
    else:
        res = march_rays_stream(
            rays_o, rays_d, nears, fars, bitfield,
            bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
            dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps,
        )
        comp = compact_mask_hier(res.mask, M)
        sel, sel_valid, t0 = comp.sel, comp.sel_valid, res.t0
        # resume t: first budget-dropped valid rung, else the ladder end.
        # Samples are a flat prefix (compact_mask_hier), so ray n got
        # taken = clip(m_eff - base_n, 0, counts_n) of its counts_n valid
        # rungs; the first dropped rung is its (taken+1)-th valid rung —
        # found by binary search over the per-row valid-rank cumsum.
        base = jnp.cumsum(res.counts) - res.counts  # exclusive
        taken = jnp.clip(comp.m_eff - base, 0, res.counts)
        has_drop = taken < res.counts
        rank_row = jnp.cumsum(res.mask.astype(jnp.int32), axis=-1)  # [N, S]
        want = (taken + 1)[:, None]
        lo = jnp.zeros((N, 1), jnp.int32)
        hi = jnp.full((N, 1), S, jnp.int32)
        for _ in range(max(1, S.bit_length())):
            mid = (lo + hi) >> 1
            r = jnp.take_along_axis(rank_row, jnp.minimum(mid, S - 1), axis=1)
            go_right = r < want
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        found = jnp.minimum(lo[:, 0], S - 1)
        dt_min = 2.0 * SQRT3 / cfg.max_steps
        dt_max = 2.0 * SQRT3 * (2 ** (cfg.cascades - 1)) / cfg.grid_size
        t_res = _t_ladder(
            res.t0, found[:, None], cfg.dt_gamma, dt_min, dt_max
        )[:, 0]
        rays_t = jnp.where(has_drop, t_res, res.next_t)
    ws, depth_raw, image = _bucketed_stream_query(
        field, params, sel, sel_valid, rays_o, rays_d, t0, N, cfg
    )
    # the stream compositor's t_cum is relative to the ray start; the eval
    # accumulator (and residual rounds) work in absolute t
    depth_raw = depth_raw + nears.astype(jnp.float32) * ws
    return rays_t, ws, depth_raw, image


def _bucketed_stream_query(field, params, sel, sel_valid, rays_o, rays_d, t0,
                           n_rays, cfg):
    """Field-query + stream-composite the selected sample prefix at bucketed
    width.  The prefix is exact, so querying only the first M/4 (or M/2)
    slots is IDENTICAL whenever m_eff fits — slots past m_eff are invalid
    padding.  lax.cond executes one branch, so sky-dominated chunks (small
    m_eff) skip 75% of the field+composite work while dense chunks take the
    full-width branch; every branch returns [n_rays]-shaped accumulators."""
    from ..ops.march import ladder_samples

    m_eff = jnp.sum(sel_valid.astype(jnp.int32))

    def pass_with(Mq):
        def run():
            ray_id, x_c, d_c, dt_c, t_rel = ladder_samples(
                sel[:Mq], rays_o, rays_d, t0,
                bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
                dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps,
            )
            out = field.sigma_rgb(params, x_c, d_c)
            sig_c, rgb_c = out[0], out[1]
            return composite_stream(
                sig_c.astype(jnp.float32) * cfg.density_scale,
                rgb_c, dt_c, None, ray_id, sel_valid[:Mq], n_rays,
                cfg.T_thresh, t_cum=t_rel,
            )

        return run

    def empty():
        # sky-only chunk (image-ordered rays are spatially coherent, so at
        # 800^2 whole 8-16K-ray chunks are frequently empty): skip the
        # field/composite entirely
        z = jnp.zeros((n_rays,), jnp.float32)
        return z, z, jnp.zeros((n_rays, 3), jnp.float32)

    M_total = sel.shape[0]
    # power-of-two bucket ladder down to M/16 (floored at 4096): image-
    # ordered chunks are spatially coherent, so m_eff is bimodal — dense
    # object chunks near M_total, sky-adjacent chunks tiny.  Each bucket is
    # one compiled branch of the full query program; the 4096 floor bounds
    # the branch count (lax.cond executes exactly one).
    ladder = []
    for div in (16, 8, 4, 2):
        mq = max(128, (M_total // div // 128) * 128)
        if mq >= M_total or (M_total // div) < 4096:
            continue
        if not ladder or mq > ladder[-1]:
            ladder.append(mq)
    if not ladder:
        return jax.lax.cond(m_eff == 0, empty, pass_with(M_total))

    def chain(i):
        if i == len(ladder):
            return pass_with(M_total)
        return lambda: jax.lax.cond(
            m_eff <= ladder[i], pass_with(ladder[i]), chain(i + 1)
        )

    return jax.lax.cond(m_eff == 0, empty, chain(0))


def render_rays_eval(
    field: FieldFns,
    params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    bitfield: jax.Array,
    cfg: RenderConfig,
    bg_color=None,
    dilated_grid=None,  # optional precomputed dilated chunk grid (see
    # render_rays_train) — callers rendering many chunks of one frame hoist it
):
    """Full-quality render: single-pass stream eval (cfg.eval_stream) with an
    alive-ray round loop as residual / fallback (statically shaped)."""
    N = rays_o.shape[0]
    K = cfg.K_eval
    nears, fars = near_far_from_aabb(rays_o, rays_d, cfg.aabb, cfg.min_near)
    bg = _resolve_bg(field, params, rays_o, rays_d, cfg, bg_color)
    max_rounds = max(1, -(-cfg.max_steps // K))

    def eval_round(o_r, d_r, t_r, far_r, ws_in, K_round):
        """One marched-slab round over an arbitrary ray batch, continuing
        from accumulated transmittance.  Returns (next_t, d_ws, d_depth,
        d_image) deltas."""
        Nr = o_r.shape[0]
        res = march_rays(
            o_r, d_r, t_r, far_r, bitfield,
            bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
            dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps, K=K_round,
            group=cfg.march_group if K_round % max(cfg.march_group, 1) == 0 else 0,
        )
        out = field.sigma_rgb(
            params, res.xyzs_cf.reshape(3, -1), res.dirs_cf.reshape(3, -1)
        )
        sigmas, rgbs_cf = out[0], out[1]  # optional aux ignored at eval
        sigmas = sigmas.reshape(Nr, K_round).astype(jnp.float32) * cfg.density_scale
        rgbs_cf = rgbs_cf.reshape(3, Nr, K_round).astype(jnp.float32)

        # incremental composite continuing from accumulated weight_sum
        # (kernel_composite_rays: T = 1 - weight_sum, raymarching.cu:884)
        w = composite_weights(sigmas, res.dts, res.mask, 0.0)
        T_in = jnp.maximum(1.0 - ws_in, 0.0)[:, None]
        w = T_in * w
        # early stop on the *global* running transmittance
        tau = sigmas * res.dts * res.mask.astype(jnp.float32)
        T_run = T_in * jnp.exp(-jnp.cumsum(tau, axis=-1))
        stopped = jnp.cumsum((T_run < cfg.T_thresh).astype(jnp.float32), axis=-1)
        alive_s = (stopped - (T_run < cfg.T_thresh)) < 0.5
        w = w * alive_s.astype(jnp.float32)

        t_cum = t_r[:, None] + jnp.cumsum(res.gaps, axis=-1)
        return (
            res.next_t,
            w.sum(axis=-1),
            (w * t_cum).sum(axis=-1),
            jnp.einsum("nk,cnk->nc", w, rgbs_cf),
        )

    if cfg.eval_stream:
        # chunked path: build the dilated coarse grid ONCE and share it with
        # the first pass and every residual round (it only depends on the
        # bitfield — rebuilding it per round was most of the round cost)
        dgrid = dilated_grid
        use_chunk = cfg.march_chunk > 0 and cfg.max_steps % cfg.march_chunk == 0
        if use_chunk and dgrid is None:
            from ..ops.march import build_dilated_cell_grid, chunk_dilate

            dgrid = build_dilated_cell_grid(
                bitfield, bound=cfg.bound, cascades=cfg.cascades,
                grid_size=cfg.grid_size,
                dilate=chunk_dilate(
                    cfg.march_chunk, cfg.max_steps, cfg.grid_size, cfg.bound
                ),
            )
        t0, ws0, depth0, image0 = _eval_stream_pass(
            field, params, rays_o, rays_d, nears, fars, bitfield, cfg, dgrid
        )
        state0 = (jnp.zeros((), jnp.int32), t0, ws0, depth0, image0)
        # residual rounds over ALIVE-COMPACTED rays: a handful of long-tail
        # rays must not pay full-width rounds (the CUDA eval loop compacts
        # n_alive the same way, nerf/renderer.py:376-420)
        Na = max(min(256, N), N // 4)
        max_res_rounds = max(1, -(-cfg.max_steps // K)) + 2

        def res_cond(state):
            rnd, rays_t, ws, depth, image = state
            alive = (rays_t < fars) & (1.0 - ws >= cfg.T_thresh)
            return (rnd < max_res_rounds) & jnp.any(alive)

        def _first_alive(rays_t, ws):
            """First Na alive rays (binary search over the monotone rank).
            Returns (sel [Na] int32, slot_ok [Na] bool)."""
            alive = (rays_t < fars) & (1.0 - ws >= cfg.T_thresh)
            arank = jnp.cumsum(alive.astype(jnp.int32))
            n_alive = arank[-1]
            want = jnp.arange(1, Na + 1, dtype=jnp.int32)
            lo = jnp.zeros((Na,), jnp.int32)
            hi = jnp.full((Na,), N, jnp.int32)
            for _ in range(max(1, N.bit_length())):
                mid = (lo + hi) >> 1
                r = jnp.take(arank, jnp.minimum(mid, N - 1))
                go_right = r < want
                lo = jnp.where(go_right, mid + 1, lo)
                hi = jnp.where(go_right, hi, mid)
            return jnp.minimum(lo, N - 1), want <= n_alive

        def res_body_slab(state):
            rnd, rays_t, ws, depth, image = state
            sel, slot_ok = _first_alive(rays_t, ws)
            o_a = jnp.take(rays_o, sel, axis=0)
            d_a = jnp.take(rays_d, sel, axis=0)
            t_a = jnp.take(rays_t, sel)
            f_a = jnp.take(fars, sel)
            ws_a = jnp.take(ws, sel)
            nt, dws, ddep, dimg = eval_round(o_a, d_a, t_a, f_a, ws_a, K)
            # all updates are scatter-ADDs of zero-masked deltas: invalid
            # slots clamp to ray N-1, and a .set with duplicate indices
            # would nondeterministically clobber that ray's real update
            okf = slot_ok.astype(jnp.float32)
            rays_t = rays_t.at[sel].add((nt - t_a) * okf)
            ws = ws.at[sel].add(dws * okf)
            depth = depth.at[sel].add(ddep * okf)
            image = image.at[sel].add(dimg * okf[:, None])
            return rnd + 1, rays_t, ws, depth, image

        def res_body_stream(state):
            """Chunked-stream residual round: march only the alive subset
            from its resume t, field-query exactly the selected samples, and
            stream-composite — no [Na, K] slab, no field work on masked
            slots, no per-round dilated-grid rebuild."""
            from ..ops.march import march_rays_chunked

            rnd, rays_t, ws, depth, image = state
            sel, slot_ok = _first_alive(rays_t, ws)
            o_a = jnp.take(rays_o, sel, axis=0)
            d_a = jnp.take(rays_d, sel, axis=0)
            t_a = jnp.take(rays_t, sel)
            f_a = jnp.take(fars, sel)
            # dead fill slots march an empty interval (t_start >= far)
            t_a = jnp.where(slot_ok, t_a, f_a)
            ws_a = jnp.take(ws, sel)
            M_res = max(128, -(-Na * K // 128) * 128)
            cm = march_rays_chunked(
                o_a, d_a, t_a, f_a, bitfield,
                bound=cfg.bound, cascades=cfg.cascades,
                grid_size=cfg.grid_size, dt_gamma=cfg.dt_gamma,
                max_steps=cfg.max_steps, M_budget=M_res, G=cfg.march_chunk,
                dilated_grid=dgrid,
            )
            ws_c, dep_c, img_c = _bucketed_stream_query(
                field, params, cm.sel, cm.sel_valid, o_a, d_a, cm.t0, Na, cfg
            )
            # continue from accumulated transmittance: the round's local
            # weights scale by T_in (kernel_composite_rays,
            # raymarching.cu:884); depth absolutizes the round-relative
            # t_cum by the round's start t
            okf = slot_ok.astype(jnp.float32)
            T_in = jnp.maximum(1.0 - ws_a, 0.0) * okf
            rays_t = rays_t.at[sel].add((cm.resume_t - t_a) * okf)
            ws = ws.at[sel].add(T_in * ws_c)
            depth = depth.at[sel].add(T_in * (dep_c + t_a * ws_c))
            image = image.at[sel].add(T_in[:, None] * img_c)
            return rnd + 1, rays_t, ws, depth, image

        res_body = res_body_stream if use_chunk else res_body_slab
        _, _, ws, depth, image = jax.lax.while_loop(res_cond, res_body, state0)
    else:
        # reference-style full-width round loop
        def round_body(state):
            rnd, rays_t, ws, depth, image = state
            nt, dws, ddep, dimg = eval_round(rays_o, rays_d, rays_t, fars, ws, K)
            return rnd + 1, nt, ws + dws, depth + ddep, image + dimg

        def round_cond(state):
            rnd, rays_t, ws, depth, image = state
            alive = (rays_t < fars) & (1.0 - ws >= cfg.T_thresh)
            return (rnd < max_rounds) & jnp.any(alive)

        init = (
            jnp.zeros((), jnp.int32),
            nears.astype(jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N, 3), jnp.float32),
        )
        _, _, ws, depth, image = jax.lax.while_loop(round_cond, round_body, init)

    image = image + (1.0 - ws)[:, None] * bg
    depth = jnp.clip(depth - nears, 0.0) / jnp.maximum(fars - nears, 1e-6)
    return {"image": image, "depth": depth, "weights_sum": ws}


def render_rays_uniform(
    field: FieldFns,
    params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    cfg: RenderConfig,
    num_steps: int = 128,
    upsample_steps: int = 128,
    key: jax.Array | None = None,
    bg_color=None,
):
    """Grid-free path (reference `run`, renderer.py:126-254): uniform sampling
    in [near, far] + one round of inverse-CDF importance upsampling."""
    N = rays_o.shape[0]
    nears, fars = near_far_from_aabb(rays_o, rays_d, cfg.aabb, cfg.min_near)
    nears = jnp.where(nears > 1e30, 0.05, nears)  # missed rays: tiny dummy interval
    fars = jnp.where(fars > 1e30, 0.06, fars)
    bg = _resolve_bg(field, params, rays_o, rays_d, cfg, bg_color)

    z = jnp.linspace(0.0, 1.0, num_steps)
    z_vals = nears[:, None] + (fars - nears)[:, None] * z[None, :]  # [N, S]
    sample_dist = (fars - nears) / num_steps
    if key is not None:
        key, k1 = jax.random.split(key)
        z_vals = z_vals + (jax.random.uniform(k1, z_vals.shape) - 0.5) * sample_dist[:, None]

    def points_cf(zv):
        """[N, S] z values -> [3, N*S] channels-first clamped positions."""
        comps = [
            jnp.clip(rays_o[:, c : c + 1] + rays_d[:, c : c + 1] * zv, -cfg.bound, cfg.bound)
            for c in range(3)
        ]
        return jnp.stack([c.reshape(-1) for c in comps], axis=0)

    sigmas = field.density(params, points_cf(z_vals)).reshape(z_vals.shape)

    if upsample_steps > 0:
        deltas = jnp.diff(z_vals, axis=-1)
        deltas = jnp.concatenate([deltas, sample_dist[:, None]], axis=-1)
        alphas = 1.0 - jnp.exp(-cfg.density_scale * deltas * sigmas.astype(jnp.float32))
        alphas_shifted = jnp.concatenate(
            [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-15], axis=-1
        )
        weights = alphas * jnp.cumprod(alphas_shifted, axis=-1)[:, :-1]
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        if key is not None:
            key, k2 = jax.random.split(key)
        else:
            k2 = None
        new_z = sample_pdf(
            z_mid, weights[:, 1:-1], upsample_steps, det=(key is None), key=k2
        )
        new_z = jax.lax.stop_gradient(new_z)
        z_vals = jnp.sort(jnp.concatenate([z_vals, new_z], axis=-1), axis=-1)

    S = z_vals.shape[-1]
    dirs_cf = jnp.broadcast_to(rays_d.T[:, :, None], (3, N, S)).reshape(3, -1)
    sigmas, rgbs_cf = field.sigma_rgb(params, points_cf(z_vals), dirs_cf)
    sigmas = sigmas.reshape(N, S).astype(jnp.float32) * cfg.density_scale
    rgbs_cf = rgbs_cf.reshape(3, N, S).astype(jnp.float32)

    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate([deltas, sample_dist[:, None]], axis=-1)
    alphas = 1.0 - jnp.exp(-deltas * sigmas)
    alphas_shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-15], axis=-1
    )
    weights = alphas * jnp.cumprod(alphas_shifted, axis=-1)[:, :-1]  # [N, S]

    ws = weights.sum(axis=-1)
    depth_raw = (weights * z_vals).sum(axis=-1)
    image = jnp.einsum("ns,cns->nc", weights, rgbs_cf)
    image = image + (1.0 - ws)[:, None] * bg
    depth = jnp.clip(depth_raw - nears, 0.0) / jnp.maximum(fars - nears, 1e-6)
    return {"image": image, "depth": depth, "weights_sum": ws}
