"""Trainer — the experiment engine.

Behavioral reference: torch-ngp `nerf/utils.py:277-1311` (Trainer):
  train/evaluate/test loops, per-step Adam(0.9, 0.99, eps=1e-15) with
  exponential lr decay to 0.1x over `iters` (main_nerf.py:198-201), per-epoch
  EMA (:1051), periodic density-grid maintenance every
  `update_extra_interval` steps (:937, upstream semantics), random background
  compositing for RGBA data (:516-521), error-map EMA updates (:579-600),
  PSNR eval with image dumps (:1130-1147), checkpoint rotation + best (:1175).

TPU-first: there is no DataLoader — images/poses live in HBM and each jitted
train step samples its own rays on device (the `--preload` path is the only
path).  The whole step (sample -> march -> field -> composite -> loss -> adam)
is one XLA program with donated params/optimizer state.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.provider import NeRFDataset
from ..data.rays import full_image_rays, sample_rays
from ..render import (
    FieldFns,
    OccupancyGrid,
    RenderConfig,
    create as create_grid,
    dilated_chunk_grid,
    mark_untrained_grid,
    render_rays_eval,
    render_rays_train,
    render_rays_uniform,
    update_density_grid,
)
from ..utils.colors import srgb_to_linear
from ..utils.config import TrainConfig
from .checkpoint import latest_checkpoint, load_checkpoint, load_meta, save_checkpoint
from .ema import ema_init
from .metrics import PSNRMeter


def make_optimizer(tc: TrainConfig):
    """Adam(0.9, 0.99, eps 1e-15) + exponential decay to 0.1x over iters,
    clamped after iters like the reference's lr_lambda = 0.1 ** min(step/iters, 1)
    (main_nerf.py:198-201)."""
    schedule = optax.exponential_decay(
        init_value=tc.lr, transition_steps=tc.iters, decay_rate=0.1,
        end_value=tc.lr * 0.1,
    )
    return optax.adam(schedule, b1=0.9, b2=0.99, eps=1e-15)


class Trainer:
    """Occupancy-grid NeRF trainer over a functional field."""

    # subclasses whose march path cannot use a precomputed dilated chunk grid
    # (D-NeRF: time-indexed bitfield selected inside the step; CCNeRF: slab
    # march) set this False
    _wants_dgrid = True

    def __init__(
        self,
        model,
        dataset: NeRFDataset,
        cfg: RenderConfig,
        tc: TrainConfig,
        valid_dataset: Optional[NeRFDataset] = None,
        field: Optional[FieldFns] = None,
        mesh=None,  # jax.sharding.Mesh('data'[, 'model']) for multi-chip runs
        shard_table: bool = False,  # shard hash-table rows over 'model'
        use_grid: bool = True,  # False = the reference's non-cuda `run()` path
        clip_embedder=None,  # differentiable image/text embedder (clip_guidance)
    ):
        self.model = model
        self.cfg = cfg
        self.tc = tc
        self.dataset = dataset
        self.valid_dataset = valid_dataset
        self.field = field if field is not None else FieldFns.from_model(model)
        self.key = jax.random.PRNGKey(tc.seed)
        self.mesh = mesh
        self.shard_table = shard_table
        self.use_grid = use_grid

        # device-resident data
        images = dataset.images
        if images is not None and tc.color_space == "linear":
            images = images.copy()
            images[..., :3] = srgb_to_linear(images[..., :3])
        self.images = jnp.asarray(images) if images is not None else None
        self.poses = jnp.asarray(dataset.poses)
        self.intrinsics = jnp.asarray(dataset.intrinsics)
        self.H, self.W = dataset.H, dataset.W
        self.n_frames = dataset.num_frames
        self.channels = int(images.shape[-1]) if images is not None else 3

        self.error_map = (
            jnp.ones((self.n_frames, 128 * 128), jnp.float32) if tc.error_map else None
        )

        # params / optimizer / ema / grid
        self.key, init_key = jax.random.split(self.key)
        self.params = self._init_params(init_key)
        if self.mesh is not None:
            # DDP-equivalent (SURVEY §2.3): params replicated (hash-table rows
            # optionally sharded over 'model'); rays shard over 'data' inside
            # the jitted step; XLA SPMD inserts the psum over ICI.
            from ..parallel import shard_params

            self.params = shard_params(self.params, self.mesh, self.shard_table)
        self.tx = make_optimizer(tc)
        self.opt_state = self.tx.init(self.params)
        self.ema_params = ema_init(self.params)
        self.grid = create_grid(cfg.cascades, cfg.grid_size)
        self.grid = mark_untrained_grid(
            self.grid, self.poses, self.intrinsics, bound=cfg.bound, grid_size=cfg.grid_size
        )

        self.epoch = 0
        self.global_step = 0
        self.stats = {"loss": [], "results": [], "best_result": None}

        os.makedirs(tc.workspace, exist_ok=True)
        self.log_path = os.path.join(tc.workspace, f"log_{tc.name}.txt")
        self.writer = None
        try:  # tensorboard scalars (utils.py:713-714), optional
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(os.path.join(tc.workspace, "run", tc.name))
        except Exception:
            pass

        # the base NGP step threads a precomputed dilated chunk grid through
        # render_rays_train (rebuilt only when the bitfield changes); subclass
        # steps keep the 6-arg signature
        self._step_has_dgrid = (
            type(self)._build_train_step is Trainer._build_train_step
        )
        # static cfg arg: jit caches one program per cfg, so a GUI cfg
        # override (dataclasses.replace on trainer.cfg) can't serve a stale
        # dilation radius from the old trace
        self._dgrid_jit = jax.jit(dilated_chunk_grid, static_argnums=(1,))
        self._dgrid_fn = lambda bf: self._dgrid_jit(bf, self.cfg)
        self._dgrid = (
            self._dgrid_fn(self.grid.bitfield)
            if self._wants_dgrid and self.use_grid and cfg.march_dense
            else None
        )
        self._train_step = self._build_train_step()

        # adaptive sample-budget tiers (reference mean_count semantics,
        # raymarching.py:200-232): a short ladder of compact_fractions below
        # the configured one; each tier's step compiles once (persistent
        # cache) and the trainer switches on measured demand at grid-update
        # boundaries.  Only the base NGP grid path supports this (subclasses
        # build their own steps).
        self._tier_fracs = None
        if (
            tc.adaptive_budget and self.use_grid and cfg.march_dense
            and type(self)._build_train_step is Trainer._build_train_step
            and 0.0 < cfg.compact_fraction < 1.0
        ):
            f = cfg.compact_fraction
            self._tier_fracs = [f / 4.0, f / 2.0, f]
            # overdrive tier ABOVE the configured fraction: the reference's
            # mean_count budget GROWS with demand (raymarching.py:200-232) —
            # error-map sampling concentrates rays on-object and raises
            # demand past the configured budget, and without headroom half
            # the rays get budget-dropped every step (the round-2 −1.6 dB
            # at 30K).  The step is slower at 2f, engaged only while rays
            # are actually being dropped (reference drops 97 -> 50 it/s
            # with error_map for the same reason, readme.md:212).
            f_over = min(2.0 * f, 0.9)
            if tc.adaptive_overdrive and f_over > f:
                self._tier_fracs.append(f_over)
            self._tier = 2  # start at the configured fraction
            self._tier_steps = {self._tier: self._train_step}
            self._tier_M = [
                max(128, -(-int(tc.num_rays * cfg.K * tf) // 128) * 128)
                for tf in self._tier_fracs
            ]

        # CLIP-guided GT-free step (every rand_pose-th iteration,
        # nerf/utils.py:431-434,485-499)
        self.clip_embedder = clip_embedder
        self._clip_step = None
        self._clip_text_feat = None
        if tc.rand_pose and tc.rand_pose > 0 and clip_embedder is not None:
            if not tc.clip_text:
                raise ValueError("--rand_pose > 0 needs --clip_text")
            self._clip_text_feat = jnp.asarray(clip_embedder.embed_text(tc.clip_text))
            self._clip_step = self._build_clip_step()

        if tc.use_checkpoint == "latest":
            ckpt = latest_checkpoint(tc.workspace, tc.name)
            if ckpt:
                self.load_checkpoint(ckpt)

    def _init_params(self, key):
        return self.model.init(
            key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / np.sqrt(3.0)
        )

    # ------------------------------------------------------------------ logging
    def log(self, msg: str):
        print(msg, flush=True)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    # --------------------------------------------------------------- train step
    def _build_train_step(self, cfg=None):
        field, cfg, tc = self.field, cfg or self.cfg, self.tc
        H, W, C = self.H, self.W, self.channels
        n_frames = self.n_frames
        images, poses, intr = self.images, self.poses, self.intrinsics
        tx = self.tx
        use_error_map = self.error_map is not None
        use_grid = self.use_grid

        mesh = self.mesh

        ema_decay = self.tc.ema_decay

        @partial(jax.jit, donate_argnums=(0, 1, 2, 4))
        def step(params, opt_state, ema_params, key, error_map, bitfield,
                 dgrid=None):
            k_idx, k_rays, k_perturb, k_bg = jax.random.split(key, 4)
            idx = jax.random.randint(k_idx, (), 0, n_frames)
            em = error_map[idx] if use_error_map else None
            r = sample_rays(
                k_rays, poses[idx], intr, H, W, tc.num_rays,
                error_map=em, patch_size=tc.patch_size,
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rs = NamedSharding(mesh, P("data"))
                r = {
                    k: (jax.lax.with_sharding_constraint(v, rs) if v.ndim >= 1 else v)
                    for k, v in r.items()
                }
            gt = images[idx].reshape(-1, C)[r["inds"]]  # [N, C]

            if C == 4 and cfg.bg_radius <= 0:
                bg = jax.random.uniform(k_bg, (tc.num_rays, 3))  # pixel-wise random
                gt_rgb = gt[:, :3] * gt[:, 3:] + bg * (1.0 - gt[:, 3:])
            else:
                bg = None  # -> 1.0 inside render (or bg model)
                gt_rgb = gt[:, :3]

            def loss_fn(p):
                if use_grid:
                    out = render_rays_train(
                        field, p, r["rays_o"], r["rays_d"], bitfield, cfg,
                        key=k_perturb, bg_color=bg, dilated_grid=dgrid,
                    )
                    rm = out["ray_mask"].astype(jnp.float32)
                    npts = out["num_points"]
                else:  # uniform + importance sampling (reference run(), renderer.py:126)
                    out = render_rays_uniform(
                        field, p, r["rays_o"], r["rays_d"], cfg,
                        num_steps=cfg.num_steps, upsample_steps=cfg.upsample_steps,
                        key=k_perturb, bg_color=bg,
                    )
                    rm = jnp.ones((tc.num_rays,), jnp.float32)
                    npts = jnp.int32(tc.num_rays * (cfg.num_steps + cfg.upsample_steps))
                per_ray = jnp.mean((out["image"] - gt_rgb) ** 2, axis=-1)  # [N]
                loss = (per_ray * rm).sum() / jnp.maximum(rm.sum(), 1.0)
                return loss, (per_ray, rm, npts)

            (loss, (per_ray, rm_out, npts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # per-STEP EMA fused into the step program (a separate jitted
            # ema_update per step costs one dispatch + a full param-tree
            # read/write round trip; see PERF.md trainer-loop lessons)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                ema_params, params,
            )

            if use_error_map:
                # budget-dropped rays render incomplete images — their
                # per_ray error is an artifact, and writing it back inflates
                # the map, which oversamples them, which drops more rays (a
                # diverging feedback loop, measured -6 dB at 10K steps).
                # Keep the old entry for dropped rays.
                em_row = error_map[idx]
                old = em_row[r["inds_coarse"]]
                new_vals = jnp.where(rm_out > 0, 0.1 * old + 0.9 * per_ray, old)
                em_row = em_row.at[r["inds_coarse"]].set(new_vals)
                error_map = error_map.at[idx].set(em_row)

            # n_kept = rays that kept all their samples under the budget —
            # the demand signal for adaptive budget tiers
            return params, opt_state, ema_params, error_map, loss, npts, rm_out.sum()

        return step

    def _build_clip_step(self):
        """Render a random orbit pose at low resolution and descend
        -cos_sim(embed(render), embed(text)) — one jitted XLA program
        (reference renders rand poses in train_step, nerf/utils.py:485-499)."""
        field, cfg, tc = self.field, self.cfg, self.tc
        embed = self.clip_embedder
        tx = self.tx
        # square render whose pixel count matches the ray budget
        side = max(16, int(np.sqrt(tc.num_rays)) // 8 * 8)
        intr = jnp.asarray(
            [side * 0.7, side * 0.7, side / 2.0, side / 2.0], jnp.float32
        )

        @partial(jax.jit, donate_argnums=(0, 1))
        def clip_step(params, opt_state, pose, text_feat, bitfield):
            o, d = full_image_rays(pose, intr, side, side)

            def loss_fn(p):
                out = render_rays_train(field, p, o, d, bitfield, cfg)
                img = out["image"].reshape(1, side, side, 3)
                feats = embed.embed_images(img)  # [1, D]
                return -jnp.mean(feats @ text_feat)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return clip_step

    def run_clip_step(self):
        from ..data.provider import rand_poses

        pose = jnp.asarray(
            rand_poses(np.random.default_rng(self.global_step), 1,
                       radius=float(self.cfg.bound) * 1.5)[0]
        )
        self.params, self.opt_state, loss = self._clip_step(
            self.params, self.opt_state, pose, self._clip_text_feat,
            self.grid.bitfield,
        )
        return float(loss)

    def _adapt_tier(self, demand: float, kept_frac: float):
        """Move the budget tier: up as soon as rays get dropped, down when
        demand leaves >1.6x headroom below the next tier (hysteresis keeps
        the ladder from oscillating).  Each tier's step compiles once."""
        t = self._tier
        nt = len(self._tier_fracs)
        if kept_frac < 0.98 and t < nt - 1:
            t += 1
        elif t > 0 and demand * 1.6 < self._tier_M[t - 1]:
            t -= 1
        if t == self._tier:
            return
        self._tier = t
        step = self._tier_steps.get(t)
        if step is None:
            import dataclasses

            cfg_t = dataclasses.replace(
                self.cfg, compact_fraction=self._tier_fracs[t]
            )
            step = self._build_train_step(cfg_t)
            self._tier_steps[t] = step
        self._train_step = step
        self.log(
            f"[adaptive_budget] step {self.global_step}: tier -> "
            f"M={self._tier_M[t]} (demand {int(demand)}, kept {kept_frac:.3f})"
        )

    def maybe_update_grid(self):
        tc, cfg = self.tc, self.cfg
        if not self.use_grid:
            return
        if self.global_step % tc.update_extra_interval != 0:
            return
        self.key, k = jax.random.split(self.key)
        full = int(self.grid.iter_density) < 16
        self.grid = update_density_grid(
            self.grid, self.params, k,
            density_fn=self.field.density, bound=cfg.bound, grid_size=cfg.grid_size,
            density_thresh=cfg.density_thresh,
            full=full, density_scale=cfg.density_scale,
            # "resample" (default): the reference's exact random+occupied
            # scheme.  TNGP_GRID_PARTIAL=slab selects the scatter-free
            # rotating half-grid sweep — ~2x faster grid updates but the
            # slower live-cell refresh measured −0.65 dB @2.5K on the hard
            # scene (probeG 42.72 vs probeH 42.05), so speed runs opt in
            partial_mode=os.environ.get("TNGP_GRID_PARTIAL", "resample"),
        )
        if self._dgrid is not None:
            self._dgrid = self._dgrid_fn(self.grid.bitfield)

    def train_one_epoch(self, steps: int):
        # first epoch optionally runs under a jax.profiler trace (§5.1)
        if self.tc.profile_dir and self.epoch <= 1:
            from ..utils.profiling import profile_trace

            with profile_trace(self.tc.profile_dir):
                out = self._train_one_epoch(steps)
            self.log(f"profiler trace written to {self.tc.profile_dir}")
            return out
        return self._train_one_epoch(steps)

    def _train_one_epoch(self, steps: int):
        t0 = time.time()
        losses, pts = [], []
        last_npts = last_kept = None
        for _ in range(steps):
            if (
                self._tier_fracs is not None
                and last_npts is not None
                and self.global_step % self.tc.update_extra_interval == 0
            ):
                # one host sync per grid-update interval (a per-step float()
                # would serialize dispatch; see the trainer-loop lesson)
                self._adapt_tier(
                    float(last_npts), float(last_kept) / self.tc.num_rays
                )
            self.maybe_update_grid()
            if (
                self._clip_step is not None
                and self.global_step % self.tc.rand_pose == 0
            ):
                closs = self.run_clip_step()
                self.global_step += 1
                if self.writer is not None:
                    self.writer.add_scalar("train/clip_loss", closs, self.global_step)
                continue
            self.key, k = jax.random.split(self.key)
            em = self.error_map if self.error_map is not None else jnp.zeros((1, 1))
            # per-STEP EMA, fused into the step.  The reference's NeRF
            # trainer updates per epoch (nerf/utils.py:1051-1052) but its SDF
            # trainer per step (sdf/utils.py:349-350); we follow the SDF
            # cadence — at our 500-step epochs a per-epoch EMA lags so far
            # behind that eval renders ~30 dB below the train fit
            args = (
                self.params, self.opt_state, self.ema_params, k, em,
                self.grid.bitfield,
            )
            if self._step_has_dgrid:
                args += (self._dgrid,)
            out = self._train_step(*args)
            (self.params, self.opt_state, self.ema_params, em, loss, npts) = out[:6]
            if len(out) > 6:  # base NGP step also reports kept-ray count
                last_npts, last_kept = npts, out[6]
            if self.error_map is not None:
                self.error_map = em
            self.global_step += 1
            # keep the scalars on-device: a float() here would sync every
            # step and dominate wall time (measured 3.4 -> 11 it/s on chip)
            losses.append(loss)
            pts.append(npts)
        total_loss = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        total_pts = int(jnp.sum(jnp.stack(pts))) if pts else 0
        dt = time.time() - t0
        avg = total_loss / steps
        self.stats["loss"].append(avg)
        if self.writer is not None:
            self.writer.add_scalar("train/loss", avg, self.global_step)
            self.writer.add_scalar("train/its_per_s", steps / dt, self.global_step)
        self.log(
            f"[epoch {self.epoch}] loss={avg:.6f} psnr~{-10*np.log10(max(avg,1e-12)):.2f} "
            f"steps={steps} {steps/dt:.1f} it/s pts/step={total_pts//steps}"
        )
        return avg

    def train(self, max_epochs: int):
        steps = self.tc.steps_per_epoch or self.n_frames
        for _ in range(self.epoch, max_epochs):
            self.epoch += 1
            self.train_one_epoch(steps)
            if self.epoch % self.tc.eval_interval == 0 and self.valid_dataset is not None:
                result = self.evaluate(self.valid_dataset)
                self.stats["results"].append(result)
                best = self.stats["best_result"]
                if best is None or result > best:
                    self.stats["best_result"] = result
                    self.save_checkpoint(best=True)
            self.save_checkpoint(best=False)
            if self.global_step >= self.tc.iters:
                break

    # ------------------------------------------------------------------- eval
    def render_image(self, pose, intrinsics=None, use_ema: bool = True,
                     chunk: int = 4096, bg_color=None, W=None, H=None):
        """Full-image eval render (staged chunking, max_ray_batch=4096 parity).

        W/H override the dataset resolution (the GUI's dynamic-resolution
        throttle, nerf/gui.py:135-141); intrinsics are rescaled to match."""
        intrinsics = self.intrinsics if intrinsics is None else intrinsics
        if W is None or H is None:
            W, H = self.W, self.H
        elif (W, H) != (self.W, self.H):
            s = np.array([W / self.W, H / self.H, W / self.W, H / self.H],
                         np.float32)
            intrinsics = jnp.asarray(np.asarray(intrinsics) * s)
        params = self.ema_params if use_ema else self.params
        o, d = full_image_rays(jnp.asarray(pose), intrinsics, H, W)
        cfg = self.cfg
        if (
            self.use_grid and cfg.eval_stream and cfg.march_chunk > 0
            and cfg.max_steps % cfg.march_chunk == 0
        ):
            # frame-level eval: per-chunk first pass + frame-global residual
            # rounds over a persistent alive set (render/frame_eval.py) —
            # residual cost proportional to the actual alive count instead of
            # chunks x fixed-width while_loop rounds
            # cache per (chunk, cfg): a GUI dt_gamma/max_steps override swaps
            # cfg (round-4 stale-cfg bug — the single cached instance kept
            # rendering with the old settings), and the GUI's dynamic-
            # resolution throttle alternates chunk sizes (compiled tier-loop
            # programs are shape-shared via the 64K padding quantum, so
            # per-key instances are cheap)
            frs = getattr(self, "_frame_renderers", None)
            if frs is None:
                frs = self._frame_renderers = {}
            fr = frs.get((chunk, cfg))
            if fr is None:
                from ..render.frame_eval import FrameRenderer

                fr = frs[(chunk, cfg)] = FrameRenderer(self.field, cfg,
                                                       chunk=chunk)
            dgrid = self._dgrid_fn(self.grid.bitfield)
            bg = jnp.ones((), jnp.float32) if bg_color is None else bg_color
            img, dep = fr.render(params, o, d, self.grid.bitfield, dgrid, bg)
            img = np.asarray(img).reshape(H, W, 3)
            dep = np.asarray(dep).reshape(H, W)
            return img, dep
        if not hasattr(self, "_eval_fn"):
            field, cfg = self.field, self.cfg
            use_grid = self.use_grid

            @jax.jit
            def eval_fn(p, o, d, bitfield, bg, dgrid=None):
                if use_grid:
                    out = render_rays_eval(field, p, o, d, bitfield, cfg,
                                           bg_color=bg, dilated_grid=dgrid)
                else:
                    out = render_rays_uniform(
                        field, p, o, d, cfg, num_steps=cfg.num_steps,
                        upsample_steps=cfg.upsample_steps, bg_color=bg,
                    )
                return out["image"], out["depth"]

            self._eval_fn = eval_fn
        n = o.shape[0]
        pad = (-n) % chunk
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)))
        imgs, deps = [], []
        bg = jnp.ones((), jnp.float32) if bg_color is None else bg_color
        # dilated chunk grid shared across the frame's ray chunks (the
        # bitfield is fixed within one render)
        dgrid = (
            self._dgrid_fn(self.grid.bitfield) if self.use_grid else None
        )
        # dispatch every chunk before any D2H read: np.asarray inside the
        # loop would block on each chunk and serialize device work with the
        # host-side glue (jax dispatch is async — queue it all, collect after)
        for s in range(0, n + pad, chunk):
            img, dep = self._eval_fn(
                params, o[s : s + chunk], d[s : s + chunk], self.grid.bitfield,
                bg, dgrid,
            )
            imgs.append(img)
            deps.append(dep)
        img = np.concatenate([np.asarray(x) for x in imgs])[:n].reshape(H, W, 3)
        dep = np.concatenate([np.asarray(x) for x in deps])[:n].reshape(H, W)
        return img, dep

    def evaluate(self, dataset: NeRFDataset, write_images: bool = False) -> float:
        meter = PSNRMeter()
        out_dir = os.path.join(self.tc.workspace, "validation")
        if write_images:
            os.makedirs(out_dir, exist_ok=True)
        for i in range(dataset.num_frames):
            img, dep = self.render_image(dataset.poses[i])
            gt = dataset.images[i]
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1.0 - gt[..., 3:])
            meter.update(img, gt)
            if write_images:
                import imageio.v2 as imageio

                imageio.imwrite(
                    os.path.join(out_dir, f"{self.tc.name}_{self.epoch:04d}_{i:04d}.png"),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8),
                )
        psnr = meter.measure()
        self.log(f"[eval epoch {self.epoch}] {meter.report()}")
        return psnr

    def test(self, poses, out_dir: Optional[str] = None, write_video: bool = True):
        """Render a pose path; save PNG sequence or mp4 (utils.py:743-796)."""
        out_dir = out_dir or os.path.join(self.tc.workspace, "results")
        os.makedirs(out_dir, exist_ok=True)
        frames = []
        for i, pose in enumerate(poses):
            img, dep = self.render_image(pose)
            frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
        import imageio.v2 as imageio

        if write_video:
            try:
                imageio.mimwrite(
                    os.path.join(out_dir, f"{self.tc.name}_rgb.mp4"), frames, fps=10,
                    quality=8, macro_block_size=1,
                )
                return frames
            except Exception as e:  # no ffmpeg backend in this environment
                self.log(f"[test] mp4 writer unavailable ({e}); writing PNGs")
        for i, fr in enumerate(frames):
            imageio.imwrite(os.path.join(out_dir, f"{self.tc.name}_{i:04d}.png"), fr)
        return frames

    def save_mesh(self, path: Optional[str] = None, resolution: int = 256,
                  threshold: float = 10.0, chunk: int = 2**17):
        """Density field -> isosurface mesh (utils.py:688-708 / extract_geometry
        :190-202); marching tetrahedra instead of mcubes."""
        from ..native import marching_tetrahedra, save_obj, save_ply

        path = path or os.path.join(self.tc.workspace, "meshes",
                                    f"{self.tc.name}_{self.epoch}.ply")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        b = self.cfg.bound
        g = np.linspace(-b, b, resolution, dtype=np.float32)

        density_fn = self.field.density
        params = self.params

        @jax.jit
        def q(p_cf):
            return density_fn(params, p_cf)

        field3d = np.empty((resolution,) * 3, np.float32)
        for i in range(resolution):
            X, Y, Z = np.meshgrid(g[i : i + 1], g, g, indexing="ij")
            pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=0)
            vals = []
            for s in range(0, pts.shape[1], chunk):
                vals.append(np.asarray(q(jnp.asarray(pts[:, s : s + chunk]))))
            field3d[i] = np.concatenate(vals).reshape(resolution, resolution)
        verts, faces = marching_tetrahedra(field3d, threshold)
        verts = verts / (resolution - 1) * 2 * b - b
        (save_obj if path.endswith(".obj") else save_ply)(path, verts, faces)
        self.log(f"[save_mesh] {path}: {len(verts)} verts, {len(faces)} faces")
        return path

    # ------------------------------------------------------------- checkpoints
    def _payload(self):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "ema": self.ema_params,
            "grid": self.grid,
            "error_map": self.error_map if self.error_map is not None else jnp.zeros(0),
        }

    def _geometry(self):
        """Model shape metadata recorded in the json sidecar so load can
        rebuild the model to checkpoint shapes first (overridden by
        TensoRF/CCNeRF trainers; reference tensoRF/utils.py:238-401)."""
        return None

    def _rebuild_to_geometry(self, geometry):
        """Hook: reshape self.model/params/opt_state to `geometry` before the
        arrays are deserialized.  Default: nothing to do (static shapes)."""

    def save_checkpoint(self, best: bool = False):
        payload = self._payload()
        if best:
            # best checkpoints drop the density grid — it is cheap to rebuild
            # and dominates file size (nerf/utils.py:1226-1228)
            payload = {k: v for k, v in payload.items() if k != "grid"}
        save_checkpoint(
            self.tc.workspace, self.tc.name, self.epoch, self.global_step,
            payload, stats={"best_result": self.stats["best_result"]},
            max_keep=self.tc.max_keep_ckpt, best=best,
            geometry=self._geometry(),
        )

    def load_checkpoint(self, path: str):
        meta0 = load_meta(path)
        if meta0.get("geometry"):
            self._rebuild_to_geometry(meta0["geometry"])
        payload, meta = load_checkpoint(path, self._payload())
        rep = meta.get("_load_report", {})
        for kind in ("missing", "unexpected", "mismatched"):
            for item in rep.get(kind, []):
                self.log(f"[load_checkpoint] {kind}: {item}")
        # flax deserialization restores HOST numpy leaves.  Leaving them in
        # the live trees makes every subsequent jitted call silently re-upload
        # them host->device (49 MB of params per eval dispatch through the
        # axon tunnel = 1.5-4 s/call — the round-4 "2.8 s/chunk" eval wall).
        # Commit everything to device ONCE here; device leaves pass through.
        payload = jax.tree_util.tree_map(
            lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
            payload,
        )
        self.params = payload["params"]
        self.opt_state = payload["opt_state"]
        self.ema_params = payload["ema"]
        self.grid = payload["grid"]
        if self.error_map is not None:
            self.error_map = payload["error_map"]
        self.epoch = meta.get("epoch", 0)
        self.global_step = meta.get("global_step", 0)
        best = (meta.get("stats") or {}).get("best_result")
        if best is not None:
            self.stats["best_result"] = best
        self.log(f"[load_checkpoint] {path} (epoch {self.epoch}, step {self.global_step})")
        return rep
