"""CCNeRF: rank-residual compressible/composable tensor radiance field.

Behavioral reference: torch-ngp `tensoRF/network_cc.py:13-643`:
  * grouped decomposition: K groups of (vec triple-products, mat
    triple-products) for density (out_dim 1) and color (out_dim 3*degree^2),
    each group projected by an S matrix; grid_sample align_corners=FALSE
  * training computes K *cumulative* outputs for the rank-residual loss
    (:274-295); color = <S feats, SH(d)> summed over the SH axis (:297-310)
  * finalize: per-group rank sort by |S| column * prod of U row norms, then
    concat groups (:462-516); compress(ranks) = prefix slice (:520-549)
  * compose: concatenation of finalized objects with per-object rigid
    transforms; render sums densities and softmax-weights colors (:551-624)

Because finalize/compress/compose morph parameter shapes, the model is NOT a
flax module: parameters live in a plain dict pytree (`cc_init`) consumed by
pure functions; shape-changing surgery happens host-side on numpy arrays.
All hot-path math is channels-first ([R, B], batch minor).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import trunc_exp
from ..ops.grid_sample import (grid_sample_1d_cf_vjp as grid_sample_1d_cf,
                               grid_sample_2d_cf_vjp as grid_sample_2d_cf)
from ..ops.sh import sh_encode_cf
from .tensorf import MAT_IDS, VEC_IDS


@dataclass(frozen=True)
class CCConfig:
    """Static structure of one CCNeRF object (group ranks etc.)."""

    resolution: Tuple[int, int, int] = (128, 128, 128)
    degree: int = 4
    rank_vec_density: Tuple[int, ...] = (64, 64, 64, 64, 64)
    rank_mat_density: Tuple[int, ...] = (0, 4, 8, 12, 16)
    rank_vec: Tuple[int, ...] = (64, 64, 64, 64, 64)
    rank_mat: Tuple[int, ...] = (0, 4, 16, 32, 64)
    bound: float = 1.0

    @property
    def K(self) -> int:
        return len(self.rank_vec)

    @property
    def out_dim(self) -> int:
        return 3 * self.degree**2

    def groups(self, ranks: Tuple[int, ...]) -> List[int]:
        return list(np.diff(np.asarray(ranks), prepend=0))


def _init_u_vec(key, r, D):
    return 0.2 * jax.random.normal(key, (r, D))


def _init_u_mat(key, r, H, W):
    return 0.2 * jax.random.normal(key, (r, H, W))


def _kaiming(key, shape):
    # torch kaiming_normal_ on [fan_out, fan_in]: std = sqrt(2 / fan_in)
    return jax.random.normal(key, shape) * np.sqrt(2.0 / shape[1])


def cc_init(key: jax.Array, cfg: CCConfig) -> dict:
    """Parameter pytree for one (un-finalized) object: per non-empty group g,
    `{kind}_U_{g}` -> [3][...], `{kind}_S_{g}` -> [out, r]."""
    params = {}
    res = cfg.resolution
    specs = [
        ("vd", cfg.groups(cfg.rank_vec_density), 1, "vec"),
        ("md", cfg.groups(cfg.rank_mat_density), 1, "mat"),
        ("vc", cfg.groups(cfg.rank_vec), cfg.out_dim, "vec"),
        ("mc", cfg.groups(cfg.rank_mat), cfg.out_dim, "mat"),
    ]
    for kind, groups, out_dim, shape_kind in specs:
        for g, r in enumerate(groups):
            if r <= 0:
                continue
            us = []
            for i in range(3):
                key, k = jax.random.split(key)
                if shape_kind == "vec":
                    us.append(_init_u_vec(k, r, res[VEC_IDS[i]]))
                else:
                    m0, m1 = MAT_IDS[i]
                    us.append(_init_u_mat(k, r, res[m1], res[m0]))
            key, k = jax.random.split(key)
            params[f"{kind}_U_{g}"] = us
            params[f"{kind}_S_{g}"] = _kaiming(k, (out_dim, r))
    return params


def _group_feat(us, x_cf, shape_kind: str) -> jax.Array:
    """Triple product of the three factor lookups -> [r, B]
    (align_corners=False per the reference)."""
    if shape_kind == "vec":
        f = grid_sample_1d_cf(us[0], x_cf[VEC_IDS[0]], align_corners=False)
        for i in (1, 2):
            f = f * grid_sample_1d_cf(us[i], x_cf[VEC_IDS[i]], align_corners=False)
    else:
        f = None
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            fi = grid_sample_2d_cf(us[i], x_cf[m0], x_cf[m1], align_corners=False)
            f = fi if f is None else f * fi
    return f


def _compute(params: dict, cfg: CCConfig, x_cf, kinds, K: int, residual: bool):
    """Cumulative group outputs.  kinds = ('vd','md') or ('vc','mc').
    Returns [K, out, B] if residual else [out, B]."""
    outs = []
    last = None
    for g in range(K):
        y = None
        for kind in kinds:
            if f"{kind}_U_{g}" not in params:
                continue
            feat = _group_feat(params[f"{kind}_U_{g}"], x_cf,
                               "vec" if kind in ("vd", "vc") else "mat")
            contrib = params[f"{kind}_S_{g}"] @ feat  # [out, B]
            y = contrib if y is None else y + contrib
        if y is None:
            y = jnp.zeros_like(last) if last is not None else None
        if last is not None and y is not None:
            y = y + last
        last = y
        if residual:
            outs.append(y)
    return jnp.stack(outs, axis=0) if residual else last


def cc_sigma_h_cf(
    params: dict, cfg: CCConfig, x_cf: jax.Array, d_cf: jax.Array,
    K: int = -1, residual: bool = False,
):
    """Pre-sigmoid outputs: sigma [(K,) B], h [(K,) 3, B]."""
    if K <= 0:
        K = cfg.K
    xn = x_cf / cfg.bound
    dens = _compute(params, cfg, xn, ("vd", "md"), K, residual)  # [(K,)1,B]
    enc_d = sh_encode_cf(d_cf, cfg.degree)  # [deg^2, B]
    col = _compute(params, cfg, xn, ("vc", "mc"), K, residual)  # [(K,)3*deg^2,B]
    if residual:
        sigma = trunc_exp(dens[:, 0, :])  # [K, B]
        B = x_cf.shape[1]
        h = col.reshape(K, 3, cfg.degree**2, B)
        h = (h * enc_d[None, None]).sum(axis=2)  # [K, 3, B]
    else:
        sigma = trunc_exp(dens[0])
        h = col.reshape(3, cfg.degree**2, -1)
        h = (h * enc_d[None]).sum(axis=1)  # [3, B]
    return sigma, h


def cc_sigma_rgb_cf(
    params: dict, cfg: CCConfig, x_cf: jax.Array, d_cf: jax.Array,
    K: int = -1, residual: bool = False,
):
    """sigma [(K,) B], rgb [(K,) 3, B]; x in [-bound, bound]."""
    sigma, h = cc_sigma_h_cf(params, cfg, x_cf, d_cf, K, residual)
    return sigma, jax.nn.sigmoid(h)


def cc_density_cf(params: dict, cfg: CCConfig, x_cf: jax.Array) -> jax.Array:
    dens = _compute(params, cfg, x_cf / cfg.bound, ("vd", "md"), cfg.K, False)
    return trunc_exp(dens[0])


# ---- host-side parameter surgery --------------------------------------------


def _np(params):
    return jax.tree_util.tree_map(np.asarray, params)


def cc_finalize(params: dict, cfg: CCConfig) -> Tuple[dict, CCConfig]:
    """Sort ranks by importance within each group, then fuse all groups into
    one (network_cc.py:462-516)."""
    p = _np(params)
    out = {}
    for kind, ranks in (
        ("vd", cfg.rank_vec_density), ("md", cfg.rank_mat_density),
        ("vc", cfg.rank_vec), ("mc", cfg.rank_mat),
    ):
        us_all, s_all = [[], [], []], []
        for g in range(cfg.K):
            if f"{kind}_U_{g}" not in p:
                continue
            us = p[f"{kind}_U_{g}"]
            S = p[f"{kind}_S_{g}"]
            importance = np.abs(S).sum(0)
            for j in range(3):
                importance = importance * np.linalg.norm(
                    us[j].reshape(us[j].shape[0], -1), axis=-1
                )
            inds = np.argsort(-importance)
            s_all.append(S[:, inds])
            for j in range(3):
                us_all[j].append(us[j][inds])
        if s_all:
            out[f"{kind}_U_0"] = [np.concatenate(u, axis=0) for u in us_all]
            out[f"{kind}_S_0"] = np.concatenate(s_all, axis=1)
    new_cfg = replace(
        cfg,
        rank_vec_density=(cfg.rank_vec_density[-1],),
        rank_mat_density=(cfg.rank_mat_density[-1],),
        rank_vec=(cfg.rank_vec[-1],),
        rank_mat=(cfg.rank_mat[-1],),
    )
    return out, new_cfg


def cc_compress(params: dict, cfg: CCConfig, ranks: Sequence[int]) -> Tuple[dict, CCConfig]:
    """Prefix-slice a finalized model to (density_vec, density_mat, color_vec,
    color_mat) ranks (network_cc.py:520-549)."""
    if cfg.K != 1:
        params, cfg = cc_finalize(params, cfg)
    p = _np(params)
    out = {}
    for kind, rank in zip(("vd", "md", "vc", "mc"), ranks):
        if rank <= 0 or f"{kind}_U_0" not in p:
            continue
        out[f"{kind}_U_0"] = [u[:rank].copy() for u in p[f"{kind}_U_0"]]
        out[f"{kind}_S_0"] = p[f"{kind}_S_0"][:, :rank].copy()
    new_cfg = replace(
        cfg,
        rank_vec_density=(int(ranks[0]),), rank_mat_density=(int(ranks[1]),),
        rank_vec=(int(ranks[2]),), rank_mat=(int(ranks[3]),),
    )
    return out, new_cfg


@dataclass
class CCScene:
    """A composed scene of finalized objects with per-object transforms
    (network_cc.py compose/:551-624)."""

    objects: List[Tuple[dict, CCConfig]] = field(default_factory=list)
    transforms: List[np.ndarray] = field(default_factory=list)  # [4,4] world->obj
    rotations: List[np.ndarray] = field(default_factory=list)  # [3,3] dir rotation

    def add(self, params: dict, cfg: CCConfig, R=None, s: float = 1.0, t=None):
        if cfg.K != 1:
            params, cfg = cc_finalize(params, cfg)
        R = np.eye(3, dtype=np.float32) if R is None else np.asarray(R, np.float32)
        t = np.zeros(3, np.float32) if t is None else np.asarray(t, np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R * s
        T[:3, 3] = t
        self.objects.append((params, cfg))
        self.transforms.append(np.linalg.inv(T))
        self.rotations.append(R.T)
        return self

    def sigma_rgb_cf(self, x_cf: jax.Array, d_cf: jax.Array):
        """Sum densities; softmax(sigma)-weighted PRE-sigmoid colors, then
        sigmoid (network_cc.py:297-335: rgb_all = sigmoid(sum h*w))."""
        sigmas, hs = [], []
        for (params, cfg), T, Rr in zip(self.objects, self.transforms, self.rotations):
            T = jnp.asarray(T)
            xo = T[:3, :3] @ x_cf + T[:3, 3:4]
            # reference: d @ R.T with R = rotations[oid] already transposed
            do = jnp.asarray(Rr) @ d_cf
            sig, h = cc_sigma_h_cf(params, cfg, xo, do, K=1, residual=False)
            sigmas.append(sig)
            hs.append(h)
        sig_all = sum(sigmas)
        ws = jax.nn.softmax(jnp.stack(sigmas, axis=0), axis=0)  # [O, B]
        rgb_all = jax.nn.sigmoid(sum(h * w[None] for h, w in zip(hs, ws)))
        return sig_all, rgb_all

    def density_cf(self, x_cf: jax.Array):
        total = None
        for (params, cfg), T in zip(self.objects, self.transforms):
            T = jnp.asarray(T)
            xo = T[:3, :3] @ x_cf + T[:3, 3:4]
            s = cc_density_cf(params, cfg, xo)
            total = s if total is None else total + s
        return total
