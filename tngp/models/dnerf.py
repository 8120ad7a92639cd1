"""D-NeRF: deformation-field dynamic NeRF.

Behavioral reference: torch-ngp `dnerf/network.py:10-230`:
  * deform net: freq(x, multires 10) ++ freq(t, multires 6) -> 5x128 bias-free
    MLP -> delta x (applied to x before the canonical grid encode)
  * canonical encoder defaults to 'tiledgrid' (hash collisions hurt over time)
  * sigma input concatenates [enc(x + dx), enc_ori_x, enc_t] (:123-165)
  * color: SH(dir) ++ geo_feat -> 3x64 MLP (no padding, unlike network_ff)
  * per-batch single time t in [0, 1] (t: [1, 1] in the reference)

The time-extended occupancy grid lives in render/occupancy.py
(TimeOccupancyGrid, density grid [T, CAS, H^3], dnerf/renderer.py:74-100).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..encoders import get_encoder
from ..ops import trunc_exp
from ..ops.freq import freq_encode
from .common import MLP


def _freq_cf(x_cf: jax.Array, degree: int) -> jax.Array:
    outs = [x_cf]
    for i in range(degree):
        xi = x_cf * (2.0**i)
        outs.append(jnp.sin(xi))
        outs.append(jnp.cos(xi))
    return jnp.concatenate(outs, axis=0)


class DNeRFNetwork(nn.Module):
    bound: float = 1.0
    encoding: str = "tiledgrid"
    encoding_dir: str = "sphere_harmonics"
    multires_deform: int = 10
    multires_time: int = 6
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_deform: int = 5
    hidden_dim_deform: int = 128
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    bg_radius: float = -1.0
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder_deform, self.in_dim_deform = get_encoder(
            "frequency", multires=self.multires_deform
        )
        self.encoder_time, self.in_dim_time = get_encoder(
            "frequency", input_dim=1, multires=self.multires_time
        )
        self.deform_net = MLP(
            hidden_dim=self.hidden_dim_deform, output_dim=3,
            num_layers=self.num_layers_deform, compute_dtype=self.compute_dtype,
        )
        self.encoder, self.in_dim = get_encoder(
            self.encoding, desired_resolution=int(2048 * self.bound),
            # the canonical encode happens at x+Δx, so grads must flow back
            # through positions into the deform net (dnerf/network.py:123-165)
            # — the window encoder computes them via derivative-weight passes
            input_grads=True,
        )
        self.sigma_net = MLP(
            hidden_dim=self.hidden_dim, output_dim=1 + self.geo_feat_dim,
            num_layers=self.num_layers, compute_dtype=self.compute_dtype,
        )
        self.encoder_dir, self.in_dim_dir = get_encoder(self.encoding_dir)
        self.color_net = MLP(
            hidden_dim=self.hidden_dim_color, output_dim=3,
            num_layers=self.num_layers_color, compute_dtype=self.compute_dtype,
        )
        if self.bg_radius > 0:
            self.encoder_bg, self.in_dim_bg = get_encoder(
                "hashgrid", input_dim=2, num_levels=4, log2_hashmap_size=19,
                desired_resolution=2048,
            )
            self.bg_net = MLP(
                hidden_dim=self.hidden_dim_bg, output_dim=3,
                num_layers=self.num_layers_bg, compute_dtype=self.compute_dtype,
            )

    # ---- channels-first hot path --------------------------------------------

    def _deform_cf(self, x_cf: jax.Array, t):
        """Returns (enc_ori_x [63, B], enc_t [13, B], deform [3, B])."""
        B = x_cf.shape[1]
        enc_ori = _freq_cf(x_cf.astype(jnp.float32), self.multires_deform)
        t_arr = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(1, 1), (1, B))
        enc_t = _freq_cf(t_arr, self.multires_time)
        h = jnp.concatenate([enc_ori, enc_t], axis=0)
        deform = self.deform_net.cf(h).astype(jnp.float32)  # [3, B]
        return enc_ori, enc_t, deform

    def density_cf(self, x_cf: jax.Array, t):
        enc_ori, enc_t, deform = self._deform_cf(x_cf, t)
        x_d = x_cf + deform
        h = self.encoder.cf(x_d, bound=self.bound)
        h = jnp.concatenate(
            [h, enc_t.astype(h.dtype), enc_ori.astype(h.dtype)], axis=0
        )
        h = self.sigma_net.cf(h)
        sigma = trunc_exp(h[0].astype(jnp.float32))
        return {"sigma": sigma, "geo_feat": h[1:], "deform": deform}

    def sigma_rgb_cf(self, x_cf: jax.Array, d_cf: jax.Array, t):
        out = self.density_cf(x_cf, t)
        de = self.encoder_dir.cf(d_cf)
        h = jnp.concatenate([de.astype(out["geo_feat"].dtype), out["geo_feat"]], axis=0)
        rgb = jax.nn.sigmoid(self.color_net.cf(h).astype(jnp.float32))
        return out["sigma"], rgb, out["deform"]

    def background_cf(self, sph_cf: jax.Array, d_cf: jax.Array) -> jax.Array:
        h = self.encoder_bg.cf(sph_cf, bound=1.0)
        de = self.encoder_dir.cf(d_cf)
        h = jnp.concatenate([de.astype(h.dtype), h], axis=0)
        return jax.nn.sigmoid(self.bg_net.cf(h).astype(jnp.float32))

    # ---- batch-first API ----------------------------------------------------

    def density(self, x: jax.Array, t):
        prefix = x.shape[:-1]
        out = self.density_cf(x.reshape(-1, 3).T, t)
        return {
            "sigma": out["sigma"].reshape(prefix),
            "geo_feat": out["geo_feat"].T.reshape(*prefix, self.geo_feat_dim),
            "deform": out["deform"].T.reshape(*prefix, 3),
        }

    def __call__(self, x: jax.Array, d: jax.Array, t):
        prefix = x.shape[:-1]
        sigma, rgb, deform = self.sigma_rgb_cf(
            x.reshape(-1, 3).T, d.reshape(-1, 3).T, t
        )
        return sigma.reshape(prefix), rgb.T.reshape(*prefix, 3), deform.T.reshape(*prefix, 3)


class DNeRFBasisNetwork(nn.Module):
    """Temporal-basis D-NeRF variant (`--basis`, dnerf/network_basis.py:10-180):
    a time MLP produces sigma/color basis coefficients; the spatial net outputs
    per-basis features contracted against them."""

    bound: float = 1.0
    encoding: str = "tiledgrid"
    multires_time: int = 6
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 32
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sigma_basis_dim: int = 32
    color_basis_dim: int = 8
    num_layers_basis: int = 5
    hidden_dim_basis: int = 128
    bg_radius: float = -1.0
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder_time, _ = get_encoder(
            "frequency", input_dim=1, multires=self.multires_time
        )
        self.basis_net = MLP(
            hidden_dim=self.hidden_dim_basis,
            output_dim=self.sigma_basis_dim + self.color_basis_dim,
            num_layers=self.num_layers_basis, compute_dtype=self.compute_dtype,
        )
        self.encoder, _ = get_encoder(
            self.encoding, desired_resolution=int(2048 * self.bound)
        )
        self.sigma_net = MLP(
            hidden_dim=self.hidden_dim,
            output_dim=self.sigma_basis_dim + self.geo_feat_dim,
            num_layers=self.num_layers, compute_dtype=self.compute_dtype,
        )
        self.encoder_dir, _ = get_encoder("sphere_harmonics")
        self.color_net = MLP(
            hidden_dim=self.hidden_dim_color, output_dim=3 * self.color_basis_dim,
            num_layers=self.num_layers_color, compute_dtype=self.compute_dtype,
        )

    def _basis(self, t):
        t_arr = jnp.asarray(t, jnp.float32).reshape(1, 1)
        enc_t = _freq_cf(t_arr, self.multires_time)  # [13, 1]
        h = self.basis_net.cf(enc_t)[:, 0].astype(jnp.float32)
        return h[: self.sigma_basis_dim], h[self.sigma_basis_dim:]

    def density_cf(self, x_cf: jax.Array, t):
        sigma_basis, _ = self._basis(t)
        h = self.encoder.cf(x_cf, bound=self.bound)
        h = self.sigma_net.cf(h).astype(jnp.float32)  # [SB+G, B]
        sigma = trunc_exp(jnp.einsum("s,sb->b", sigma_basis, h[: self.sigma_basis_dim]))
        return {"sigma": sigma, "geo_feat": h[self.sigma_basis_dim:]}

    def sigma_rgb_cf(self, x_cf: jax.Array, d_cf: jax.Array, t):
        sigma_basis, color_basis = self._basis(t)
        h = self.encoder.cf(x_cf, bound=self.bound)
        h = self.sigma_net.cf(h).astype(jnp.float32)
        sigma = trunc_exp(jnp.einsum("s,sb->b", sigma_basis, h[: self.sigma_basis_dim]))
        geo = h[self.sigma_basis_dim:]
        de = self.encoder_dir.cf(d_cf)
        hc = jnp.concatenate([de.astype(geo.dtype), geo], axis=0)
        hc = self.color_net.cf(hc).astype(jnp.float32)  # [3*CB, B]
        hc = hc.reshape(3, self.color_basis_dim, -1)
        rgb = jax.nn.sigmoid(jnp.einsum("c,kcb->kb", color_basis, hc))
        return sigma, rgb, None

    def __call__(self, x: jax.Array, d: jax.Array, t):
        prefix = x.shape[:-1]
        sigma, rgb, _ = self.sigma_rgb_cf(x.reshape(-1, 3).T, d.reshape(-1, 3).T, t)
        return sigma.reshape(prefix), rgb.T.reshape(*prefix, 3), None


class DNeRFHyperNetwork(nn.Module):
    """Hyper/ambient-dim D-NeRF variant (`--hyper`, dnerf/network_hyper.py:
    57-145): a time MLP emits `ambient_dim` extra coordinates (tanh * bound)
    appended to x before a (3+ambient_dim)-D grid encode."""

    bound: float = 1.0
    encoding: str = "tiledgrid"
    ambient_dim: int = 2
    multires_time: int = 6
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_ambient: int = 3
    hidden_dim_ambient: int = 64
    bg_radius: float = -1.0
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder_time, _ = get_encoder(
            "frequency", input_dim=1, multires=self.multires_time
        )
        self.ambient_net = MLP(
            hidden_dim=self.hidden_dim_ambient, output_dim=self.ambient_dim,
            num_layers=self.num_layers_ambient, compute_dtype=self.compute_dtype,
        )
        self.encoder, _ = get_encoder(
            self.encoding, input_dim=3 + self.ambient_dim,
            desired_resolution=int(2048 * self.bound),
        )
        self.sigma_net = MLP(
            hidden_dim=self.hidden_dim, output_dim=1 + self.geo_feat_dim,
            num_layers=self.num_layers, compute_dtype=self.compute_dtype,
        )
        self.encoder_dir, _ = get_encoder("sphere_harmonics")
        self.color_net = MLP(
            hidden_dim=self.hidden_dim_color, output_dim=3,
            num_layers=self.num_layers_color, compute_dtype=self.compute_dtype,
        )

    def _ambient(self, t):
        t_arr = jnp.asarray(t, jnp.float32).reshape(1, 1)
        enc_t = _freq_cf(t_arr, self.multires_time)
        amb = self.ambient_net.cf(enc_t).astype(jnp.float32)  # [A, 1]
        return jnp.tanh(amb) * self.bound

    def density_cf(self, x_cf: jax.Array, t):
        amb = self._ambient(t)  # [A, 1]
        B = x_cf.shape[1]
        xa = jnp.concatenate([x_cf, jnp.broadcast_to(amb, (self.ambient_dim, B))], axis=0)
        h = self.encoder.cf(xa, bound=self.bound)
        h = self.sigma_net.cf(h)
        sigma = trunc_exp(h[0].astype(jnp.float32))
        return {"sigma": sigma, "geo_feat": h[1:]}

    def sigma_rgb_cf(self, x_cf: jax.Array, d_cf: jax.Array, t):
        out = self.density_cf(x_cf, t)
        de = self.encoder_dir.cf(d_cf)
        h = jnp.concatenate([de.astype(out["geo_feat"].dtype), out["geo_feat"]], axis=0)
        rgb = jax.nn.sigmoid(self.color_net.cf(h).astype(jnp.float32))
        return out["sigma"], rgb, None

    def __call__(self, x: jax.Array, d: jax.Array, t):
        prefix = x.shape[:-1]
        sigma, rgb, _ = self.sigma_rgb_cf(x.reshape(-1, 3).T, d.reshape(-1, 3).T, t)
        return sigma.reshape(prefix), rgb.T.reshape(*prefix, 3), None
