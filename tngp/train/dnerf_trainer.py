"""D-NeRF trainer: time-conditioned rendering over the time-extended grid.

Behavioral reference: torch-ngp `dnerf/utils.py:5-130`:
  * train_step adds 1e-3 * |deform|.mean() regularization (:118-119)
  * density grid update interval 100 (main_dnerf.py:30), full updates stop
    after 100 rounds (dnerf/renderer.py:454-547)
  * each batch renders at its frame's time; the marcher uses
    density_bitfield[floor(t * T)] (dnerf/renderer.py:285).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.provider import NeRFDataset
from ..data.rays import sample_rays
from ..models.dnerf import DNeRFNetwork
from ..render import (
    FieldFns,
    RenderConfig,
    create_time,
    render_rays_eval,
    render_rays_train,
    time_slice_index,
    update_time_density_grid,
)
from ..utils.config import TrainConfig
from .trainer import Trainer


class DNeRFTrainer(Trainer):
    _wants_dgrid = False  # bitfield is selected per sampled time INSIDE the step
    def __init__(
        self,
        model: DNeRFNetwork,
        dataset: NeRFDataset,
        cfg: RenderConfig,
        tc: TrainConfig,
        valid_dataset: Optional[NeRFDataset] = None,
        time_size: int = 64,
        deform_reg: float = 1e-3,
        update_interval: int = 100,
    ):
        self.time_size = time_size
        self.deform_reg = deform_reg
        self.update_interval = update_interval
        assert dataset.times is not None, "D-NeRF needs per-frame times"
        self.times = jnp.asarray(dataset.times)
        super().__init__(model, dataset, cfg, tc, valid_dataset=valid_dataset,
                         field=self._make_field(model))
        # replace the static grid with the time-extended one
        self.grid = create_time(time_size, cfg.cascades, cfg.grid_size)

    def _init_params(self, key):
        return self.model.init(
            key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / np.sqrt(3.0), jnp.float32(0.0)
        )

    @staticmethod
    def _make_field(model) -> FieldFns:
        # time is bound per-call via field_at_time; this static field is only
        # used by generic code paths that don't thread time (t=0)
        return DNeRFTrainer.field_at_time(model, 0.0)

    @staticmethod
    def field_at_time(model, t) -> FieldFns:
        """Model-generic: works for DNeRFNetwork and the --basis/--hyper
        variants (all expose sigma_rgb_cf/density_cf with a trailing time arg;
        selection parity with reference main_dnerf.py:80-86)."""
        cls = type(model)
        return FieldFns(
            sigma_rgb=lambda p, xc, dc: model.apply(
                p, xc, dc, t, method=cls.sigma_rgb_cf
            )[:2],
            density=lambda p, xc: model.apply(
                p, xc, t, method=cls.density_cf
            )["sigma"],
            background=(
                (lambda p, sph, dc: model.apply(
                    p, sph, dc, method=cls.background_cf
                ))
                if getattr(model, "bg_radius", -1.0) > 0 and hasattr(cls, "background_cf")
                else None
            ),
        )

    def _build_train_step(self):
        model, cfg, tc = self.model, self.cfg, self.tc
        H, W, C = self.H, self.W, self.channels
        n_frames = self.n_frames
        images, poses, intr = self.images, self.poses, self.intrinsics
        times, time_size = self.times, self.time_size
        tx = self.tx
        deform_reg = self.deform_reg

        ema_decay = tc.ema_decay

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, opt_state, ema_params, key, _unused_em, bitfield_t):
            k_idx, k_rays, k_perturb, k_bg = jax.random.split(key, 4)
            idx = jax.random.randint(k_idx, (), 0, n_frames)
            t = times[idx]
            r = sample_rays(k_rays, poses[idx], intr, H, W, tc.num_rays)
            gt = images[idx].reshape(-1, C)[r["inds"]]

            bitfield = bitfield_t[time_slice_index(t, time_size)]

            if C == 4 and cfg.bg_radius <= 0:
                bg = jax.random.uniform(k_bg, (tc.num_rays, 3))
                gt_rgb = gt[:, :3] * gt[:, 3:] + bg * (1.0 - gt[:, 3:])
            else:
                bg = None
                gt_rgb = gt[:, :3]

            # only the deformation-field model regularizes |deform|
            # (dnerf/utils.py:118-119); basis/hyper return deform=None
            has_deform = isinstance(model, DNeRFNetwork)
            cls = type(model)

            def with_aux_field(p):
                def sigma_rgb(pp, xc, dc):
                    sig, rgb, deform = model.apply(
                        pp, xc, dc, t, method=cls.sigma_rgb_cf
                    )
                    if not has_deform:
                        return sig, rgb
                    return sig, rgb, {"deform_abs": jnp.abs(deform).mean(axis=0)}

                return FieldFns(
                    sigma_rgb=sigma_rgb,
                    density=lambda pp, xc: model.apply(
                        pp, xc, t, method=cls.density_cf
                    )["sigma"],
                )

            def loss_fn(p):
                out = render_rays_train(
                    with_aux_field(p), p, r["rays_o"], r["rays_d"], bitfield, cfg,
                    key=k_perturb, bg_color=bg,
                )
                per_ray = jnp.mean((out["image"] - gt_rgb) ** 2, axis=-1)
                rm = out["ray_mask"].astype(jnp.float32)
                rgb_loss = (per_ray * rm).sum() / jnp.maximum(rm.sum(), 1.0)
                if has_deform:
                    rgb_loss = rgb_loss + deform_reg * out["aux"]["deform_abs"]
                return rgb_loss, out["num_points"]

            (loss, npts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                ema_params, params,
            )
            return params, opt_state, ema_params, jnp.zeros((1, 1)), loss, npts

        return step

    def maybe_update_grid(self):
        if self.global_step % self.update_interval != 0:
            return
        cfg = self.cfg
        self.key, k = jax.random.split(self.key)
        full = int(self.grid.iter_density) < 16
        model = self.model

        def density_fn(p, x_cf, t):
            return model.apply(p, x_cf, t, method=type(model).density_cf)["sigma"]

        self.grid = update_time_density_grid(
            self.grid, self.params, k, density_fn=density_fn, bound=cfg.bound,
            grid_size=cfg.grid_size, density_thresh=cfg.density_thresh, full=full,
        )

    def render_image(self, pose, intrinsics=None, use_ema: bool = True,
                     chunk: int = 4096, bg_color=None, time: float = 0.0,
                     W=None, H=None):
        from ..data.rays import full_image_rays

        intrinsics = self.intrinsics if intrinsics is None else intrinsics
        if W is None or H is None:
            W, H = self.W, self.H
        elif (W, H) != (self.W, self.H):
            s = np.array([W / self.W, H / self.H, W / self.W, H / self.H],
                         np.float32)
            intrinsics = jnp.asarray(np.asarray(intrinsics) * s)
        params = self.ema_params if use_ema else self.params
        o, d = full_image_rays(jnp.asarray(pose), intrinsics, H, W)
        field = self.field_at_time(self.model, float(time))
        bitfield = self.grid.bitfield[int(time_slice_index(time, self.time_size))]
        n = o.shape[0]
        pad = (-n) % chunk
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)))
        bg = jnp.ones((), jnp.float32) if bg_color is None else bg_color
        imgs, deps = [], []
        for s in range(0, n + pad, chunk):
            out = render_rays_eval(
                field, params, o[s : s + chunk], d[s : s + chunk], bitfield,
                self.cfg, bg_color=bg,
            )
            imgs.append(np.asarray(out["image"]))
            deps.append(np.asarray(out["depth"]))
        img = np.concatenate(imgs)[:n].reshape(H, W, 3)
        dep = np.concatenate(deps)[:n].reshape(H, W)
        return img, dep

    def evaluate(self, dataset: NeRFDataset, write_images: bool = False) -> float:
        from .metrics import PSNRMeter

        meter = PSNRMeter()
        for i in range(dataset.num_frames):
            t = float(dataset.times[i]) if dataset.times is not None else 0.0
            img, _ = self.render_image(dataset.poses[i], time=t)
            gt = dataset.images[i]
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1.0 - gt[..., 3:])
            meter.update(img, gt)
        psnr = meter.measure()
        self.log(f"[dnerf eval epoch {self.epoch}] {meter.report()}")
        return psnr
