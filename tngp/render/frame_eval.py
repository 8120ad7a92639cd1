"""Frame-level eval with a persistent alive set — the round-4 eval engine.

Behavioral reference: torch-ngp `nerf/renderer.py:376-420` (run_cuda test
branch): an iterative loop that compacts `n_alive` rays, marches each alive
ray `n_step = max(min(N // n_alive, 8), 1)` samples, composites, and kills
rays whose transmittance drops under `T_thresh` — the cost of every
iteration is proportional to the number of rays still alive.

The round-2/3 TPU eval approximated this with a PER-CHUNK `lax.while_loop`
whose rounds ran at a fixed Na = chunk/4 slot count and a fixed Na*K march
budget: a chunk with 3 surviving long-tail rays paid the same as one with
2000, and long-tail rays chained ~10 rounds — measured 5.5K rays/s at the
reference's 800^2 conditions, with the residual loop (not the first-pass
field query) as the wall (PERF.md round 3).

This module restructures eval around the reference's actual invariant:

1. The FIRST PASS still runs per chunk (async-dispatched across the frame):
   one chunked march + one bucketed stream field query per chunk is the
   cheapest way to retire ~90% of all samples (renderer._eval_stream_pass).
2. RESIDUAL ROUNDS become frame-global: alive rays from ALL chunks are
   compacted into ONE buffer whose size is picked per round from a tier
   ladder (host reads the alive count once per round — eval dispatch is not
   latency-bound like training).  March budgets are sized to the tier, so a
   round with 900 alive rays costs ~Na=1024 work instead of 79 chunks x
   Na=2048 slots.  Rays advance their persistent resume-t; the loop ends
   when every ray is dead (T < T_thresh or marched past `far`).

Equivalence: each round reuses march_rays_chunked resume semantics and the
bucketed stream query exactly as the per-chunk loop did (renderer.py
res_body_stream); only the batching of rays into rounds changes, which the
compositing math is associative over (weights scale by the accumulated
transmittance T_in).  tests/test_frame_eval.py pins frame-path output to
render_rays_eval to ~1e-4.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import near_far_from_aabb
from .renderer import (
    RenderConfig,
    FieldFns,
    _bucketed_stream_query,
    _eval_stream_pass,
    _resolve_bg,
)


#: Back-compat aliases — the policy now lives in RenderConfig (eval_tiers /
#: eval_round_budget) so eval-tuning sweeps are scriptable without editing
#: source.  The ladder is frame-scale, not chunk-scale: residual demand right
#: after the first pass can be tens of thousands of rays across an 800^2
#: frame, then collapses to a long tail of hundreds.
TIERS = RenderConfig.eval_tiers
ROUND_BUDGET = RenderConfig.eval_round_budget


class FrameRenderer:
    """Caches the jitted first-pass / round / finalize programs for one
    (field, cfg) pair.  Trainers hold one instance per eval configuration."""

    def __init__(self, field: FieldFns, cfg: RenderConfig, chunk: int = 8192,
                 k_res: int | None = None):
        self.field = field
        self.cfg = cfg
        self.chunk = chunk
        # per-ray sample budget of one residual round; residual rays are the
        # long tail, so default to the configured eval round width
        self.k_res = k_res or cfg.K_eval
        self.tiers = tuple(cfg.eval_tiers)
        # eval march policy: probe granularity + residual-round ladder window
        # (renderer.RenderConfig eval_march_chunk / eval_round_ladder — the
        # round-5 eval wall was the coarse-ladder probe count, not the field)
        self.G_eval = cfg.eval_march_chunk or cfg.march_chunk
        if cfg.max_steps % self.G_eval:
            self.G_eval = cfg.march_chunk
        rl = cfg.eval_round_ladder or cfg.max_steps
        self.round_ladder = rl if rl % self.G_eval == 0 else cfg.max_steps
        from ..ops.march import build_dilated_cell_grid, chunk_dilate

        self._dg = jax.jit(partial(
            build_dilated_cell_grid, bound=cfg.bound, cascades=cfg.cascades,
            grid_size=cfg.grid_size,
            dilate=chunk_dilate(self.G_eval, cfg.max_steps, cfg.grid_size,
                                cfg.bound),
        ))
        self._first = jax.jit(self._first_pass)
        # donate the frame-state arrays (rays_t, ws, depth, image = args
        # 5..8 after the bound `na`): each round rewrites them in place
        self._round = {
            na: jax.jit(partial(self._residual_round, na),
                        donate_argnums=(5, 6, 7, 8))
            for na in self.tiers
        }
        self._count = jax.jit(self._alive_count)
        self._compact = {
            na: jax.jit(partial(self._compact_alive, na)) for na in self.tiers
        }
        # device-resident tier loops: a while_loop of compact->round->recount
        # at one tier that exits when alive drops into the next tier down.
        # Host syncs ONE scalar per tier SWITCH (<= len(tiers)+1 per frame)
        # instead of per round — through the tunnel a per-round host sync
        # costs ~0.5-2 s, 10-20x the round's actual compute (round-4 debug
        # trace: 16384-tier rounds at 1.6-2.5 s wall vs ~100 ms of work).
        self._tier = {
            ti: jax.jit(partial(self._run_tier, ti), donate_argnums=(5, 6, 7, 8))
            for ti in range(len(self.tiers))
        }
        self._fin = jax.jit(self._finalize)
        self._nearfar = jax.jit(lambda o, d: near_far_from_aabb(
            o, d, cfg.aabb, cfg.min_near))
        self._occ_bbox = jax.jit(self._occ_bbox_impl)
        # per-chunk hit bitmap (sky-chunk skip): a chunk is skippable when
        # none of its rays enters the tight bbox of OCCUPIED cells — rays
        # can cross the scene AABB yet never touch an occupied cell (at
        # 800^2 on a trained scene that's most of the frame border), and a
        # sample is only ever selected inside an occupied cell.
        self._chunk_hit = jax.jit(
            lambda o, d, bbox, nc, ck: (
                lambda nf, ff: (nf < ff).reshape(nc, ck).any(axis=1)
            )(*near_far_from_aabb(o, d, bbox, cfg.min_near)),
            static_argnums=(3, 4))

    def _occ_bbox_impl(self, bitfield):
        """World-space AABB of all occupied cells (+1-cell margin), cascade
        union — [6] f32.  Empty bitfield degenerates to the scene AABB."""
        cfg = self.cfg
        H = cfg.grid_size
        bits = (bitfield[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
        bits = bits.reshape(cfg.cascades, H, H, H) > 0
        lo = jnp.full((3,), jnp.inf, jnp.float32)
        hi = jnp.full((3,), -jnp.inf, jnp.float32)
        idx = jnp.arange(H, dtype=jnp.float32)
        for cas in range(cfg.cascades):
            b_c = min(2.0 ** cas, float(cfg.bound))
            cell = 2.0 * b_c / H
            m = bits[cas]
            any_ax = [m.any(axis=tuple(a for a in range(3) if a != d))
                      for d in range(3)]
            big = jnp.float32(H)
            lo_i = jnp.stack([jnp.min(jnp.where(a, idx, big)) for a in any_ax])
            hi_i = jnp.stack([jnp.max(jnp.where(a, idx, -1.0)) for a in any_ax])
            has = any_ax[0].any() | any_ax[1].any() | any_ax[2].any()
            lo_c = jnp.where(has, -b_c + (lo_i - 1.0) * cell, jnp.inf)
            hi_c = jnp.where(has, -b_c + (hi_i + 2.0) * cell, -jnp.inf)
            lo = jnp.minimum(lo, lo_c)
            hi = jnp.maximum(hi, hi_c)
        b = float(cfg.bound)
        empty = ~jnp.isfinite(lo[0])
        lo = jnp.where(empty, -b, jnp.clip(lo, -b, b))
        hi = jnp.where(empty, b, jnp.clip(hi, -b, b))
        return jnp.concatenate([lo, hi])

    # ---------------------------------------------------------------- stages
    def _first_pass(self, params, o, d, bitfield, dgrid):
        cfg = self.cfg
        nears, fars = near_far_from_aabb(o, d, cfg.aabb, cfg.min_near)
        rays_t, ws, depth, image = _eval_stream_pass(
            self.field, params, o, d, nears, fars, bitfield, cfg, dgrid,
            G=self.G_eval,
        )
        return rays_t, ws, depth, image, nears, fars

    def _alive_count(self, rays_t, ws, fars):
        alive = (rays_t < fars) & (1.0 - ws >= self.cfg.T_thresh)
        return alive.sum(dtype=jnp.int32)

    def _compact_alive(self, na, rays_t, ws, fars):
        """First `na` alive ray indices + slot validity.

        Branch-free binary search over the alive-rank cumsum (the
        renderer._first_alive pattern) — jnp.nonzero lowers to a cumsum +
        bincount-scatter over the full ~704K-slot padded frame, avoidable
        work inside every while_loop round body."""
        alive = (rays_t < fars) & (1.0 - ws >= self.cfg.T_thresh)
        n = alive.shape[0]
        arank = jnp.cumsum(alive.astype(jnp.int32))
        n_alive = arank[-1]
        want = jnp.arange(1, na + 1, dtype=jnp.int32)
        lo = jnp.zeros((na,), jnp.int32)
        hi = jnp.full((na,), n, jnp.int32)
        for _ in range(max(1, n.bit_length())):
            mid = (lo + hi) >> 1
            r = jnp.take(arank, jnp.minimum(mid, n - 1))
            go_right = r < want
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        ok = want <= n_alive
        # dead fill slots point at ray 0 (matching nonzero's fill_value=0 —
        # every state update is a zero-masked scatter-ADD, so the target is
        # irrelevant as long as it is in range)
        idx = jnp.where(ok, jnp.minimum(lo, n - 1), 0).astype(jnp.int32)
        return idx, ok

    def _residual_round(self, na, params, bitfield, dgrid, o_f, d_f,
                        rays_t, ws, depth, image, fars_f, idx, ok):
        """One frame-global residual round over `na` compacted alive rays.

        Same continuation math as renderer.res_body_stream: local weights
        scale by the accumulated transmittance T_in (kernel_composite_rays,
        raymarching.cu:884), depth absolutizes the round-relative t_cum, and
        every state update is a scatter-ADD of zero-masked deltas (fill slots
        all point at ray 0; a .set would clobber its real update)."""
        from ..ops.march import march_rays_chunked

        cfg = self.cfg
        o_a = jnp.take(o_f, idx, axis=0)
        d_a = jnp.take(d_f, idx, axis=0)
        t_a = jnp.take(rays_t, idx)
        f_a = jnp.take(fars_f, idx)
        t_a = jnp.where(ok, t_a, f_a)  # dead fill slots march nothing
        ws_a = jnp.take(ws, idx)
        k_tier = max(8, min(self.k_res, int(cfg.eval_round_budget) // na))
        m_res = max(128, -(-na * k_tier // 128) * 128)
        cm = march_rays_chunked(
            o_a, d_a, t_a, f_a, bitfield,
            bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
            dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps,
            M_budget=m_res, G=self.G_eval, dilated_grid=dgrid,
            ladder_steps=self.round_ladder,
            ray_chunk_cap=cfg.eval_ray_chunk_cap or None,
        )
        ws_c, dep_c, img_c = _bucketed_stream_query(
            self.field, params, cm.sel, cm.sel_valid, o_a, d_a, cm.t0, na, cfg
        )
        okf = ok.astype(jnp.float32)
        T_in = jnp.maximum(1.0 - ws_a, 0.0) * okf
        rays_t = rays_t.at[idx].add((cm.resume_t - t_a) * okf)
        ws = ws.at[idx].add(T_in * ws_c)
        depth = depth.at[idx].add(T_in * (dep_c + t_a * ws_c))
        image = image.at[idx].add(T_in[:, None] * img_c)
        return rays_t, ws, depth, image

    def _run_tier(self, ti, params, bitfield, dgrid, o_f, d_f,
                  rays_t, ws, depth, image, fars_f, n_alive0, cap):
        """Device-resident residual loop at tier `ti`: iterate
        compact -> round -> recount until the alive count falls into the
        next tier down (0 for the smallest tier).  Returns the new frame
        state + the device alive count (ONE host sync per tier switch).
        `cap` is the REMAINING host round budget (render()'s max_rounds
        minus rounds already spent) so max_rounds is a real frame bound."""
        na = self.tiers[ti]
        stop = self.tiers[ti - 1] if ti > 0 else 0
        cap = jnp.asarray(cap, jnp.int32)

        def cond(st):
            it, alive = st[0], st[1]
            return (alive > stop) & (it < cap)

        def body(st):
            it, _, rays_t, ws, depth, image = st
            idx, ok = self._compact_alive(na, rays_t, ws, fars_f)
            rays_t, ws, depth, image = self._residual_round(
                na, params, bitfield, dgrid, o_f, d_f,
                rays_t, ws, depth, image, fars_f, idx, ok,
            )
            alive = self._alive_count(rays_t, ws, fars_f)
            return (it + 1, alive, rays_t, ws, depth, image)

        it, alive, rays_t, ws, depth, image = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.asarray(n_alive0, jnp.int32),
             rays_t, ws, depth, image),
        )
        return it, alive, rays_t, ws, depth, image

    def _finalize(self, params, o, d, ws, depth, image, nears, fars, bg_color):
        cfg = self.cfg
        bg = _resolve_bg(self.field, params, o, d, cfg, bg_color)
        image = image + (1.0 - ws)[:, None] * bg
        depth = jnp.clip(depth - nears, 0.0) / jnp.maximum(fars - nears, 1e-6)
        return image, depth

    # ------------------------------------------------------------------ drive
    def warmup(self, params, bitfield, n_rays: int):
        """Force-compile every tier-loop program (and the first pass) for a
        frame of `n_rays` rays (pass the real frame size — tier programs are
        shaped by the padded frame).  Which tiers a frame visits depends on
        its alive-count trajectory, so without this a NEW POSE can hit a
        never-compiled tier program mid-benchmark (round-5: a 16 s 'frame'
        that was one tier compile).  cap=0 makes every loop exit after the
        cond evaluation — compile cost only, ~no device work."""
        cfg = self.cfg
        chunk = self.chunk
        quantum = (65536 if (n_rays >= 65536 and 65536 % chunk == 0)
                   else chunk)
        n = n_rays + ((-n_rays) % quantum)
        dgrid = self._dg(bitfield)
        o = jnp.tile(jnp.asarray([[0.0, 0.0, 3.0 * cfg.bound]], jnp.float32),
                     (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        self._first(params, o[: self.chunk], d[: self.chunk], bitfield, dgrid)
        ff = jnp.full((n,), 1e10, jnp.float32)
        for ti in range(len(self.tiers)):
            # fresh state per tier: the tier programs DONATE their state
            # args, so reusing one buffer across calls trips XLA's
            # donated-buffer check (the round-5 bench InvalidArgument)
            z = jnp.zeros((n,), jnp.float32)
            img = jnp.zeros((n, 3), jnp.float32)
            _ = self._tier[ti](params, bitfield, dgrid, o, d,
                               z, jnp.zeros((n,), jnp.float32),
                               jnp.zeros((n,), jnp.float32), img, ff,
                               jnp.int32(0), 0)
        jax.block_until_ready(_)

    def render(self, params, rays_o, rays_d, bitfield, dgrid, bg_color=None,
               max_rounds: int = 64):
        """Render an arbitrary ray batch (a full frame, typically).

        Host-driven: first pass per chunk (all chunks dispatched before any
        sync), then frame-global residual rounds sized to the live alive
        count (one scalar D2H per round).  Returns (image [N, 3],
        depth [N]) numpy-convertible device arrays."""
        import os
        import sys
        import time

        dbg_env = os.environ.get("TNGP_FRAME_DEBUG", "0")
        dbg = dbg_env == "1"
        # "2" = light telemetry: time the first pass and the tier loops with
        # two extra device syncs, but keep the PRODUCTION tier-loop programs
        # (full debug swaps in per-round programs, a different compile set)
        dbg2 = dbg_env == "2"
        # the caller's dilated grid was built for cfg.march_chunk's dilation
        # radius; the eval march granularity needs its own (built once per
        # frame — a jitted 3-pool build, ~ms on chip)
        if self.G_eval != self.cfg.march_chunk or dgrid is None:
            dgrid = self._dg(bitfield)
        n = rays_o.shape[0]
        chunk = self.chunk
        # pad to a fixed 64K multiple (when the chunk divides it) so the
        # frame-state shapes — and therefore the compiled tier-loop
        # programs — are shared across first-pass chunk sizes
        quantum = 65536 if (n >= 65536 and 65536 % chunk == 0) else chunk
        pad = (-n) % quantum
        # pad with rays that MISS the aabb (origin outside, pointing away):
        # near_far gives near = far = BIG and the first pass retires them.
        # An all-zeros pad (d = 0) gets far = +inf under the slab test and
        # stays alive forever, pinning every frame at max_rounds (the
        # round-4 "stuck at alive=7168 = pad count" bug).
        b = float(self.cfg.bound)
        o_pad = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 3.0 * b], rays_o.dtype), (pad, 3))
        d_pad = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], rays_d.dtype), (pad, 3))
        o = jnp.concatenate([rays_o, o_pad])
        d_ = jnp.concatenate([rays_d, d_pad])
        t0 = time.time()
        # sky-chunk skip: a chunk none of whose rays hits the AABB needs no
        # march/query at all — its first-pass state is analytic (rays_t =
        # far = dead, zero radiance).  Row-ordered 800^2 chunks above/below
        # the object's screen extent are ~40% of the frame; ONE tiny host
        # sync (the per-chunk hit bitmap) buys skipping them entirely.
        nf_f, ff_f = self._nearfar(o, d_)
        nchunks = (n + pad) // chunk
        hits = np.asarray(
            self._chunk_hit(o, d_, self._occ_bbox(bitfield), nchunks, chunk))
        parts = []
        for ci, s in enumerate(range(0, n + pad, chunk)):
            if hits[ci]:
                parts.append(self._first(
                    params, o[s:s + chunk], d_[s:s + chunk], bitfield, dgrid))
            else:
                z = jnp.zeros((chunk,), jnp.float32)
                parts.append((ff_f[s:s + chunk], z, z,
                              jnp.zeros((chunk, 3), jnp.float32),
                              nf_f[s:s + chunk], ff_f[s:s + chunk]))
        rays_t, ws, depth, image, nears, fars = (
            jnp.concatenate([p[i] for p in parts]) for i in range(6)
        )
        if dbg or dbg2:
            jax.block_until_ready(rays_t)
            print(f"#   first pass ({int(hits.sum())}/{nchunks} chunks "
                  f"marched): {time.time()-t0:.2f}s", file=sys.stderr,
                  flush=True)
            t0 = time.time()

        self.last_rounds = 0  # telemetry: rounds this frame took
        if dbg:
            # host-driven per-round loop: one sync per round (slow through
            # the tunnel) but prints per-round alive/na/wall for diagnosis
            for r in range(max_rounds):
                t0 = time.time()
                n_alive = int(self._count(rays_t, ws, fars))
                if n_alive == 0:
                    break
                self.last_rounds = r + 1
                na = next((t for t in self.tiers if t >= n_alive), self.tiers[-1])
                idx, ok = self._compact[na](rays_t, ws, fars)
                rays_t, ws, depth, image = self._round[na](
                    params, bitfield, dgrid, o, d_,
                    rays_t, ws, depth, image, fars, idx, ok,
                )
                jax.block_until_ready(rays_t)
                print(f"#   round {r}: alive={n_alive} na={na} "
                      f"{time.time()-t0:.3f}s", file=sys.stderr, flush=True)
        else:
            # device-resident tier loops; host syncs once per tier switch
            alive_dev = self._count(rays_t, ws, fars)
            n_alive = int(alive_dev)
            while n_alive > 0 and self.last_rounds < max_rounds:
                ti = next((i for i, t in enumerate(self.tiers)
                           if t >= n_alive), len(self.tiers) - 1)
                it, alive_dev, rays_t, ws, depth, image = self._tier[ti](
                    params, bitfield, dgrid, o, d_,
                    rays_t, ws, depth, image, fars, alive_dev,
                    max_rounds - self.last_rounds,
                )
                self.last_rounds += int(it)
                n_alive = int(alive_dev)
            if dbg2:
                jax.block_until_ready(rays_t)
                print(f"#   tier loops ({self.last_rounds} rounds): "
                      f"{time.time()-t0:.2f}s", file=sys.stderr, flush=True)

        bg = jnp.ones((), jnp.float32) if bg_color is None else bg_color
        image, depth = self._fin(params, o, d_, ws, depth, image, nears, fars, bg)
        return image[:n], depth[:n]
