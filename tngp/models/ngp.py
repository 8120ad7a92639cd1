"""Instant-NGP NeRF field network.

Behavioral reference: torch-ngp `nerf/network_ff.py:11-120` (the working
upstream semantics — the fork's `nerf/network.py` has `density()` asserted out,
see SURVEY.md §7) plus the background model from `nerf/network.py:105-129,198-213`.

Architecture: hash-grid encode -> 2x64 bias-free MLP -> (sigma via trunc_exp,
15-dim geo feature); SH(dir) ++ geo_feat ++ zero-pad -> 3x64 MLP -> sigmoid RGB.
Optional background: 2D hash grid over sphere coords ++ SH(dir) -> 2x64 MLP.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..encoders import get_encoder
from ..ops import trunc_exp
from .common import MLP


class NGPNetwork(nn.Module):
    bound: float = 1.0
    encoding: str = "hashgrid"
    encoding_dir: str = "sphere_harmonics"
    encoding_bg: str = "hashgrid"
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    bg_radius: float = -1.0  # >0 enables the background network
    log2_hashmap_size: int = 19
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder, self.in_dim = get_encoder(
            self.encoding,
            num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=self.base_resolution,
            log2_hashmap_size=self.log2_hashmap_size,
            desired_resolution=int(2048 * self.bound),
            # positions come from the march and are never differentiated in
            # any NGP training path — skip the dy_dx gather in the backward
            input_grad=False,
        )
        self.sigma_net = MLP(
            hidden_dim=self.hidden_dim,
            output_dim=1 + self.geo_feat_dim,
            num_layers=self.num_layers,
            compute_dtype=self.compute_dtype,
        )
        self.encoder_dir, self.in_dim_dir = get_encoder(self.encoding_dir)
        self.color_net = MLP(
            hidden_dim=self.hidden_dim_color,
            output_dim=3,
            num_layers=self.num_layers_color,
            compute_dtype=self.compute_dtype,
        )
        if self.bg_radius > 0:
            self.encoder_bg, self.in_dim_bg = get_encoder(
                self.encoding_bg,
                input_dim=2,
                num_levels=4,
                log2_hashmap_size=19,
                desired_resolution=2048,
                input_grad=False,  # sphere coords are non-differentiable
            )
            self.bg_net = MLP(
                hidden_dim=self.hidden_dim_bg,
                output_dim=3,
                num_layers=self.num_layers_bg,
                compute_dtype=self.compute_dtype,
            )

    # ---- channels-first hot path (batch on the TPU lane axis) ----------------

    def density_cf(self, x_cf: jax.Array):
        """x_cf: [3, B] in [-bound, bound] -> {'sigma': [B], 'geo_feat': [15, B]}"""
        h = self.encoder.cf(x_cf, bound=self.bound)  # [L*C, B]
        h = self.sigma_net.cf(h)  # [16, B]
        sigma = trunc_exp(h[0].astype(jnp.float32))
        geo_feat = h[1:]
        return {"sigma": sigma, "geo_feat": geo_feat}

    def color_cf(self, x_cf: jax.Array, d_cf: jax.Array, geo_feat: jax.Array) -> jax.Array:
        de = self.encoder_dir.cf(d_cf)  # [16, B]
        pad = jnp.zeros_like(geo_feat[:1])  # pad color input to 32 (network_ff.py:67)
        h = jnp.concatenate([de.astype(geo_feat.dtype), geo_feat, pad], axis=0)
        h = self.color_net.cf(h)  # [3, B]
        return jax.nn.sigmoid(h.astype(jnp.float32))

    def sigma_rgb_cf(self, x_cf: jax.Array, d_cf: jax.Array):
        out = self.density_cf(x_cf)
        rgb = self.color_cf(x_cf, d_cf, out["geo_feat"])
        return out["sigma"], rgb  # [B], [3, B]

    def background_cf(self, sph_cf: jax.Array, d_cf: jax.Array) -> jax.Array:
        """sph_cf: [2, B] normalized sphere coords; d_cf: [3, B] -> rgb [3, B]."""
        h = self.encoder_bg.cf(sph_cf, bound=1.0)
        de = self.encoder_dir.cf(d_cf)
        h = jnp.concatenate([de.astype(h.dtype), h], axis=0)
        h = self.bg_net.cf(h)
        return jax.nn.sigmoid(h.astype(jnp.float32))

    # ---- batch-first API (reference signature parity) ------------------------

    def density(self, x: jax.Array):
        """x: [..., 3] in [-bound, bound] -> {'sigma': [...], 'geo_feat': [..., 15]}"""
        prefix = x.shape[:-1]
        out = self.density_cf(x.reshape(-1, 3).T)
        return {
            "sigma": out["sigma"].reshape(prefix),
            "geo_feat": out["geo_feat"].T.reshape(*prefix, self.geo_feat_dim),
        }

    def background(self, sph: jax.Array, d: jax.Array) -> jax.Array:
        prefix = sph.shape[:-1]
        rgb = self.background_cf(sph.reshape(-1, 2).T, d.reshape(-1, 3).T)
        return rgb.T.reshape(*prefix, 3)

    def __call__(self, x: jax.Array, d: jax.Array):
        prefix = x.shape[:-1]
        sigma, rgb = self.sigma_rgb_cf(x.reshape(-1, 3).T, d.reshape(-1, 3).T)
        return sigma.reshape(prefix), rgb.T.reshape(*prefix, 3)
