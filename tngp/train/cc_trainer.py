"""CCNeRF trainer: rank-residual training (all K cumulative outputs rendered,
loss averaged over K).

Behavioral reference: torch-ngp `main_CCNeRF.py:89-228` + `nerf/renderer.py:
351-363` (per-K compositing loop) + `nerf/utils.py:574-576` (loss mean over K).
Optimizer: Adam with lr1 (factors U) / lr2 (projections S) (network_cc.py
get_params; main_CCNeRF.py uses lr 0.02 and 0.001).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..data.provider import NeRFDataset
from ..data.rays import sample_rays
from ..models.ccnerf import CCConfig, cc_density_cf, cc_init, cc_sigma_rgb_cf
from ..ops import march_rays, near_far_from_aabb
from ..ops.composite import composite_rays_cf
from ..render import FieldFns, RenderConfig
from ..utils.config import TrainConfig
from .trainer import Trainer


class CCTrainer(Trainer):
    _wants_dgrid = False  # residual-K training marches the [N, K] slab path
    def __init__(
        self,
        cc_cfg: CCConfig,
        dataset: NeRFDataset,
        cfg: RenderConfig,
        tc: TrainConfig,
        valid_dataset: Optional[NeRFDataset] = None,
        lr1: float = 2e-2,
        lr2: float = 1e-3,
    ):
        self.cc_cfg = cc_cfg
        self.lr1, self.lr2 = lr1, lr2
        # Trainer expects a "model"; we pass a tiny shim exposing what it uses
        super().__init__(_CCModelShim(cc_cfg), dataset, cfg, tc,
                         valid_dataset=valid_dataset,
                         field=self._cc_field(cc_cfg))

    def _cc_field(self, cc_cfg) -> FieldFns:
        return FieldFns(
            sigma_rgb=lambda p, xc, dc: cc_sigma_rgb_cf(p, cc_cfg, xc, dc, residual=False),
            density=lambda p, xc: cc_density_cf(p, cc_cfg, xc),
        )

    def _init_params(self, key):
        return cc_init(key, self.cc_cfg)

    def _make_tx(self):
        def label(path, leaf):
            name = "".join(str(getattr(p, "key", getattr(p, "idx", ""))) for p in path)
            return "S" if "_S_" in name else "U"

        sched1 = optax.exponential_decay(self.lr1, self.tc.iters, 0.1)
        sched2 = optax.exponential_decay(self.lr2, self.tc.iters, 0.1)
        return optax.multi_transform(
            {
                "U": optax.adam(sched1, b1=0.9, b2=0.99, eps=1e-15),
                "S": optax.adam(sched2, b1=0.9, b2=0.99, eps=1e-15),
            },
            lambda params: jax.tree_util.tree_map_with_path(label, params),
        )

    # ------------------------------------------------------ shape-aware resume
    def _geometry(self):
        c = self.cc_cfg
        return {
            "resolution": [int(r) for r in c.resolution],
            "rank_vec_density": list(c.rank_vec_density),
            "rank_mat_density": list(c.rank_mat_density),
            "rank_vec": list(c.rank_vec),
            "rank_mat": list(c.rank_mat),
        }

    def _rebuild_to_geometry(self, geometry):
        """Rebuild params/optimizer to the checkpoint's CCConfig ranks before
        deserializing (compress/finalize change group ranks; reference rebuild
        semantics tensoRF/utils.py:238-401)."""
        import dataclasses

        c = self.cc_cfg
        new_cfg = dataclasses.replace(
            c,
            resolution=tuple(int(r) for r in geometry.get("resolution", c.resolution)),
            rank_vec_density=tuple(geometry.get("rank_vec_density", c.rank_vec_density)),
            rank_mat_density=tuple(geometry.get("rank_mat_density", c.rank_mat_density)),
            rank_vec=tuple(geometry.get("rank_vec", c.rank_vec)),
            rank_mat=tuple(geometry.get("rank_mat", c.rank_mat)),
        )
        if new_cfg == c:
            return
        self.log(f"[ccnerf resume] rebuilding to ckpt geometry {geometry}")
        self.cc_cfg = new_cfg
        self.field = self._cc_field(new_cfg)
        self.key, k = jax.random.split(self.key)
        self.params = self._init_params(k)
        # real copy: params and ema are both donated into the fused step —
        # aliased buffers would be donated twice
        from .ema import ema_init

        self.ema_params = ema_init(self.params)
        self._train_step = self._build_train_step()  # re-inits tx/opt_state
        if hasattr(self, "_eval_fn"):
            del self._eval_fn
        self.__dict__.pop("_frame_renderers", None)  # captures self.field

    def _build_train_step(self):
        # uses custom optimizer with per-group lr
        self.tx = self._make_tx()
        self.opt_state = self.tx.init(self.params)

        cfg, tc, cc_cfg = self.cfg, self.tc, self.cc_cfg
        H, W, C = self.H, self.W, self.channels
        n_frames = self.n_frames
        images, poses, intr = self.images, self.poses, self.intrinsics
        tx = self.tx
        K = cc_cfg.K

        ema_decay = tc.ema_decay

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, opt_state, ema_params, key, _em, bitfield):
            k_idx, k_rays, k_perturb, k_bg = jax.random.split(key, 4)
            idx = jax.random.randint(k_idx, (), 0, n_frames)
            r = sample_rays(k_rays, poses[idx], intr, H, W, tc.num_rays)
            gt = images[idx].reshape(-1, C)[r["inds"]]
            if C == 4:
                bg = jax.random.uniform(k_bg, (tc.num_rays, 3))
                gt_rgb = gt[:, :3] * gt[:, 3:] + bg * (1.0 - gt[:, 3:])
            else:
                bg = jnp.ones((), jnp.float32)
                gt_rgb = gt[:, :3]

            N = tc.num_rays
            nears, fars = near_far_from_aabb(
                r["rays_o"], r["rays_d"], cfg.aabb, cfg.min_near
            )
            noise = jax.random.uniform(k_perturb, (N,))
            res = march_rays(
                r["rays_o"], r["rays_d"], nears, fars, bitfield,
                bound=cfg.bound, cascades=cfg.cascades, grid_size=cfg.grid_size,
                dt_gamma=cfg.dt_gamma, max_steps=cfg.max_steps, K=cfg.K,
                noise=noise,
            )

            def loss_fn(p):
                sig, rgb = cc_sigma_rgb_cf(
                    p, cc_cfg, res.xyzs_cf.reshape(3, -1),
                    res.dirs_cf.reshape(3, -1), residual=True,
                )  # [K, B], [K, 3, B]
                sig = sig.reshape(K, N, cfg.K) * cfg.density_scale
                rgb = rgb.reshape(K, 3, N, cfg.K)

                def one(s, c):
                    ws, depth, image, _ = composite_rays_cf(
                        s, c, res.dts, res.gaps, res.mask, cfg.T_thresh
                    )
                    return image + (1.0 - ws)[:, None] * bg

                images_k = jax.vmap(one)(sig, rgb)  # [K, N, 3]
                return jnp.mean((images_k - gt_rgb[None]) ** 2), res.counts.sum()

            (loss, npts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                ema_params, params,
            )
            return params, opt_state, ema_params, jnp.zeros((1, 1)), loss, npts

        return step


class _CCModelShim:
    """Minimal object so the generic Trainer can hold CC params."""

    def __init__(self, cc_cfg: CCConfig):
        self.cc_cfg = cc_cfg
        self.bg_radius = -1.0

    def init(self, key, *a):  # pragma: no cover - unused (CCTrainer overrides)
        return cc_init(key, self.cc_cfg)
