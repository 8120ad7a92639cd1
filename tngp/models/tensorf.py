"""TensoRF field networks: VM (vector-matrix) and CP (rank-1) decompositions.

Behavioral reference: torch-ngp `tensoRF/network.py:13-334` (VM) and
`tensoRF/network_cp.py:14-255` (CP):
  * sigma_feat = sum_i <plane_i(x), line_i(x)> over 3 axis pairings
    (mat_ids [[0,1],[0,2],[1,2]], vec_ids [2,1,0]); trunc_exp density
  * color_feat = basis_mat(cat_i plane_i*line_i) -> freq encode (multires 2)
    ++ freq(dir, multires 2) -> 3x128 bias-free MLP -> sigmoid
  * params init N(0, 1) * 0.1 (init_one_svd:99); basis_mat bias-free Linear
  * inputs normalized to [-1, 1] by the (shrinkable) aabb (:160)
  * upsample_model: bilinear resize of planes/lines (:277); shrink_model:
    crop factors to the occupied aabb (:283) — both rebuild the optimizer
    (tensoRF/utils.py:111-129); here they are pure functions params -> params.

TPU-first: all lookups are channels-first [R, B] gathers (ops/grid_sample.py);
features never become the padded minor dim.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import freq_encode, trunc_exp
from ..ops.grid_sample import (grid_sample_1d_cf_vjp as grid_sample_1d_cf,
                               grid_sample_2d_cf_vjp as grid_sample_2d_cf)
from .common import MLP

MAT_IDS = ((0, 1), (0, 2), (1, 2))
VEC_IDS = (2, 1, 0)


def _freq_encode_cf(x_cf: jax.Array, degree: int) -> jax.Array:
    """[F, B] -> [F*(1+2*degree), B], octave-major like ops/freq.py."""
    outs = [x_cf]
    for i in range(degree):
        xi = x_cf * (2.0**i)
        outs.append(jnp.sin(xi))
        outs.append(jnp.cos(xi))
    return jnp.concatenate(outs, axis=0)


class TensoRFNetwork(nn.Module):
    """VM decomposition (decomposition='vm') or CP (decomposition='cp')."""

    resolution: Tuple[int, int, int] = (128, 128, 128)
    sigma_rank: Tuple[int, ...] = (16, 16, 16)
    color_rank: Tuple[int, ...] = (48, 48, 48)
    color_feat_dim: int = 27
    num_layers: int = 3
    hidden_dim: int = 128
    bound: float = 1.0
    # trainable region; shrink_params crops factors and tightens this
    # (reference aabb_train, tensoRF/network.py:283-318)
    aabb: Tuple[float, ...] = ()
    decomposition: str = "vm"  # 'vm' | 'cp'
    bg_radius: float = -1.0
    bg_resolution: Tuple[int, int] = (512, 512)
    bg_rank: int = 8
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        init = lambda key, shape: 0.1 * jax.random.normal(key, shape)
        res = self.resolution
        if self.decomposition == "vm":
            self.sigma_mat = [
                self.param(f"sigma_mat_{i}", init,
                           (self.sigma_rank[i], res[MAT_IDS[i][1]], res[MAT_IDS[i][0]]))
                for i in range(3)
            ]
            self.color_mat = [
                self.param(f"color_mat_{i}", init,
                           (self.color_rank[i], res[MAT_IDS[i][1]], res[MAT_IDS[i][0]]))
                for i in range(3)
            ]
        self.sigma_vec = [
            self.param(f"sigma_vec_{i}", init, (self.sigma_rank[i], res[VEC_IDS[i]]))
            for i in range(3)
        ]
        self.color_vec = [
            self.param(f"color_vec_{i}", init, (self.color_rank[i], res[VEC_IDS[i]]))
            for i in range(3)
        ]
        basis_in = sum(self.color_rank) if self.decomposition == "vm" else self.color_rank[0]
        self.basis_mat = self.param(
            "basis_mat",
            lambda k, s: jax.random.uniform(k, s, minval=-1, maxval=1)
            / np.sqrt(s[0]),
            (basis_in, self.color_feat_dim),
        )
        enc_dim = self.color_feat_dim * 5  # freq multires 2
        enc_dim_dir = 3 * 5
        self.color_net = MLP(
            hidden_dim=self.hidden_dim, output_dim=3, num_layers=self.num_layers,
            compute_dtype=self.compute_dtype,
        )
        self._in_dim = enc_dim + enc_dim_dir
        if self.bg_radius > 0:
            self.bg_mat = self.param(
                "bg_mat", init, (self.bg_rank, self.bg_resolution[0], self.bg_resolution[1])
            )
            self.bg_net = MLP(
                hidden_dim=self.hidden_dim_bg, output_dim=3,
                num_layers=self.num_layers_bg, compute_dtype=self.compute_dtype,
            )

    # ---- factor lookups (x normalized to [-1, 1]) ---------------------------

    def _normalize(self, x_cf: jax.Array) -> jax.Array:
        # [-bound, bound] world -> [-1, 1] inside the (shrinkable) aabb
        # (tensoRF/network.py:160)
        aabb = self.aabb or (-self.bound,) * 3 + (self.bound,) * 3
        lo = jnp.asarray(aabb[:3], jnp.float32)[:, None]
        hi = jnp.asarray(aabb[3:], jnp.float32)[:, None]
        return 2.0 * (x_cf - lo) / (hi - lo) - 1.0

    def _pair_feat(self, mats, vecs, x_cf):
        feats = []
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            mat_f = grid_sample_2d_cf(mats[i], x_cf[m0], x_cf[m1])
            vec_f = grid_sample_1d_cf(vecs[i], x_cf[VEC_IDS[i]])
            feats.append(mat_f * vec_f)  # [R_i, B]
        return feats

    def _cp_prod(self, vecs, x_cf):
        f = grid_sample_1d_cf(vecs[0], x_cf[VEC_IDS[0]])
        for i in (1, 2):
            f = f * grid_sample_1d_cf(vecs[i], x_cf[VEC_IDS[i]])
        return f  # [R, B]

    def sigma_feat_cf(self, xn_cf: jax.Array) -> jax.Array:
        if self.decomposition == "cp":
            return self._cp_prod(self.sigma_vec, xn_cf).sum(axis=0)
        feats = self._pair_feat(self.sigma_mat, self.sigma_vec, xn_cf)
        return sum(f.sum(axis=0) for f in feats)

    def color_feat_cf(self, xn_cf: jax.Array) -> jax.Array:
        if self.decomposition == "cp":
            cat = self._cp_prod(self.color_vec, xn_cf)  # [R, B]
        else:
            feats = self._pair_feat(self.color_mat, self.color_vec, xn_cf)
            cat = jnp.concatenate(feats, axis=0)  # [3R, B]
        return jnp.einsum("rc,rb->cb", self.basis_mat, cat)  # [feat_dim, B]

    # ---- field interface ----------------------------------------------------

    def density_cf(self, x_cf: jax.Array):
        xn = self._normalize(x_cf)
        sigma = trunc_exp(self.sigma_feat_cf(xn))
        return {"sigma": sigma, "geo_feat": None}

    def sigma_rgb_cf(self, x_cf: jax.Array, d_cf: jax.Array):
        xn = self._normalize(x_cf)
        sigma = trunc_exp(self.sigma_feat_cf(xn))
        cf = self.color_feat_cf(xn)
        h = jnp.concatenate(
            [_freq_encode_cf(cf, 2), _freq_encode_cf(d_cf.astype(jnp.float32), 2)],
            axis=0,
        )
        rgb = jax.nn.sigmoid(self.color_net.cf(h).astype(jnp.float32))
        return sigma, rgb

    def background_cf(self, sph_cf: jax.Array, d_cf: jax.Array) -> jax.Array:
        h = grid_sample_2d_cf(self.bg_mat, sph_cf[0], sph_cf[1])  # [bg_rank, B]
        h = jnp.concatenate([h, _freq_encode_cf(d_cf.astype(jnp.float32), 2)], axis=0)
        return jax.nn.sigmoid(self.bg_net.cf(h).astype(jnp.float32))

    def __call__(self, x: jax.Array, d: jax.Array):
        prefix = x.shape[:-1]
        sigma, rgb = self.sigma_rgb_cf(x.reshape(-1, 3).T, d.reshape(-1, 3).T)
        return sigma.reshape(prefix), rgb.T.reshape(*prefix, 3)


# ---- progressive upsampling / shrinking (pure param transforms) -------------


def _resize_linear(arr: np.ndarray, new_len: int, axis: int) -> jnp.ndarray:
    """1D linear resize along `axis` (align_corners=True semantics)."""
    a = jnp.moveaxis(jnp.asarray(arr), axis, -1)
    old = a.shape[-1]
    pos = jnp.linspace(0.0, old - 1.0, new_len)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, old - 1)
    i1 = jnp.clip(i0 + 1, 0, old - 1)
    t = pos - i0
    out = a[..., i0] * (1 - t) + a[..., i1] * t
    return jnp.moveaxis(out, -1, axis)


def shrink_params(
    params: dict,
    model: "TensoRFNetwork",
    density_grid_coarsest,  # [H^3] linear order (ix major, iz fastest)
    grid_size: int,
    thresh: float,
):
    """Crop factor grids to the occupied AABB (tensoRF/network.py:283-318).

    Returns (new_params, new_model) — the functional form of the reference's
    in-place shrink (optimizer must be rebuilt by the caller, like
    tensoRF/utils.py:127-129)."""
    g = np.asarray(density_grid_coarsest).reshape(grid_size, grid_size, grid_size)
    occ = np.argwhere(g > thresh)  # [Nz, 3] (ix, iy, iz)
    bound = model.bound
    aabb_old = np.asarray(model.aabb or (-bound,) * 3 + (bound,) * 3, np.float32)
    if len(occ) == 0:
        return params, model
    half = bound / grid_size
    pos = (2 * occ / (grid_size - 1) - 1) * (bound - half)
    min_pos = pos.min(0) - half
    max_pos = pos.max(0) + half

    reso = np.asarray(model.resolution)
    units = (aabb_old[3:] - aabb_old[:3]) / reso
    tl = np.clip(np.round((min_pos - aabb_old[:3]) / units).astype(int), 0, None)
    br = np.minimum(np.round((max_pos - aabb_old[:3]) / units).astype(int), reso)

    p = dict(params["params"]) if "params" in params else dict(params)
    out = {}
    for name, leaf in p.items():
        if name.startswith(("sigma_vec_", "color_vec_")):
            i = int(name[-1])
            v = VEC_IDS[i]
            leaf = leaf[:, tl[v] : br[v]]
        elif name.startswith(("sigma_mat_", "color_mat_")):
            i = int(name[-1])
            m0, m1 = MAT_IDS[i]
            leaf = leaf[:, tl[m1] : br[m1], tl[m0] : br[m0]]
        out[name] = leaf
    new_res = tuple(int(b - t) for t, b in zip(tl, br))
    new_model = model.clone(
        resolution=new_res,
        aabb=tuple(np.concatenate([min_pos, max_pos]).astype(float)),
    )
    new_params = {"params": out} if "params" in params else out
    return new_params, new_model


def upsample_params(params: dict, new_resolution: Sequence[int]) -> dict:
    """Bilinearly resize all VM/CP factors to `new_resolution`
    (tensoRF/network.py:277-281).  `params` is the flax param dict of a
    TensoRFNetwork; returns a new dict for a module built with the new
    resolution."""
    res = tuple(new_resolution)
    p = dict(params["params"]) if "params" in params else dict(params)
    out = {}
    for name, leaf in p.items():
        if name.startswith(("sigma_mat_", "color_mat_")):
            i = int(name[-1])
            m0, m1 = MAT_IDS[i]
            leaf = _resize_linear(leaf, res[m1], axis=1)
            leaf = _resize_linear(leaf, res[m0], axis=2)
        elif name.startswith(("sigma_vec_", "color_vec_")):
            i = int(name[-1])
            leaf = _resize_linear(leaf, res[VEC_IDS[i]], axis=1)
        out[name] = leaf
    return {"params": out} if "params" in params else out
