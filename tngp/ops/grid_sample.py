"""Bilinear grid sampling, channels-first — the TensoRF lookup primitive.

Behavioral reference: `F.grid_sample(..., align_corners=True)` with zeros
padding as used by tensoRF/network.py:112-151 (plane [1, R, H, W] sampled at
normalized coords in [-1, 1]; lines as fake-2D [1, R, D, 1]).

TPU layout: features stay `[R, B]` (batch minor); the plane is flattened to
`[R, H*W]` and corners fetched with 32-bit gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def grid_sample_2d_cf(
    plane: jax.Array, u: jax.Array, v: jax.Array, align_corners: bool = True
) -> jax.Array:
    """plane [R, H, W]; u (width coord), v (height coord) in [-1, 1], shape [B].

    Returns [R, B].  Out-of-range corners contribute zero (torch zeros
    padding).  align_corners=False uses torch's pixel-center convention
    (((u+1)*W - 1) / 2), as used by CCNeRF (network_cc.py grid_sample calls).
    """
    R, H, W = plane.shape
    if align_corners:
        fx = (u.astype(jnp.float32) + 1.0) * 0.5 * (W - 1)
        fy = (v.astype(jnp.float32) + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((u.astype(jnp.float32) + 1.0) * W - 1.0) * 0.5
        fy = ((v.astype(jnp.float32) + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = plane.reshape(R, H * W)
    out = jnp.zeros((R, u.shape[0]), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            val = jnp.take(flat, idx, axis=1)  # [R, B]
            w = (tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
            out = out + val * (w * inb.astype(jnp.float32))[None, :]
    return out


def grid_sample_1d_cf(
    line: jax.Array, w: jax.Array, align_corners: bool = True
) -> jax.Array:
    """line [R, D]; w in [-1, 1], shape [B] -> [R, B]."""
    R, D = line.shape
    if align_corners:
        fx = (w.astype(jnp.float32) + 1.0) * 0.5 * (D - 1)
    else:
        fx = ((w.astype(jnp.float32) + 1.0) * D - 1.0) * 0.5
    x0 = jnp.floor(fx)
    tx = fx - x0
    x0i = x0.astype(jnp.int32)
    out = jnp.zeros((R, w.shape[0]), jnp.float32)
    for dx in (0, 1):
        xi = x0i + dx
        inb = (xi >= 0) & (xi < D)
        val = jnp.take(line, jnp.clip(xi, 0, D - 1), axis=1)
        wgt = (tx if dx else 1.0 - tx) * inb.astype(jnp.float32)
        out = out + val * wgt[None, :]
    return out


# ---------------------------------------------------------------------------
# custom-VJP variants: Pallas scatter-add table gradients (the TensoRF factor
# grids fit a single VMEM window, so the whole backward rides the fast path —
# XLA's TPU scatter is ~12M rows/s vs the kernel's ~107M, see PERF.md)
# ---------------------------------------------------------------------------


def _corners_2d(plane_shape, u, v, align_corners: bool):
    R, H, W = plane_shape
    if align_corners:
        fx = (u.astype(jnp.float32) + 1.0) * 0.5 * (W - 1)
        fy = (v.astype(jnp.float32) + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((u.astype(jnp.float32) + 1.0) * W - 1.0) * 0.5
        fy = ((v.astype(jnp.float32) + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    out = []
    for dy in (0, 1):
        for dx in (0, 1):
            xi, yi = x0 + dx, y0 + dy
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            wgt = (tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
            out.append((idx, wgt * inb.astype(jnp.float32), inb.astype(jnp.float32)))
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def grid_sample_2d_cf_vjp(plane, u, v, align_corners: bool = True):
    """grid_sample_2d_cf with a Pallas scatter-add plane gradient."""
    return grid_sample_2d_cf(plane, u, v, align_corners)


def _gs2_fwd(plane, u, v, align_corners):
    return grid_sample_2d_cf(plane, u, v, align_corners), (plane, u, v)


def _gs2_bwd(align_corners, res, g):
    from ..kernels.scatter import scatter_add_auto

    plane, u, v = res
    R, H, W = plane.shape
    g = g.astype(jnp.float32)  # [R, B]
    corners = _corners_2d(plane.shape, u, v, align_corners)
    idx = jnp.concatenate([c[0] for c in corners])  # [4B]
    vals = jnp.concatenate([(g * c[1][None, :]).T for c in corners])  # [4B, R]
    grad_flat = scatter_add_auto(idx, vals, H * W)  # [H*W, R]
    grad_plane = grad_flat.T.reshape(R, H, W).astype(plane.dtype)

    # coordinate grads (analytic; DCE'd when unused).  Each corner's weight in
    # the forward is w_k * inb_k, so its contribution to d/dfrac carries inb_k.
    flat = plane.astype(jnp.float32).reshape(R, H * W)
    gdot = [
        jnp.einsum("rb,rb->b", g, jnp.take(flat, c[0], axis=1)) * c[2]
        for c in corners
    ]
    if align_corners:
        sx, sy = 0.5 * (W - 1), 0.5 * (H - 1)
    else:
        sx, sy = 0.5 * W, 0.5 * H
    # corners ordered (dy,dx): (0,0),(0,1),(1,0),(1,1); w = (tx^dx)(ty^dy)
    _, _, tx, ty = _fracs_2d(plane.shape, u, v, align_corners)
    du = (-(1 - ty) * gdot[0] + (1 - ty) * gdot[1] - ty * gdot[2] + ty * gdot[3]) * sx
    dv = (-(1 - tx) * gdot[0] - tx * gdot[1] + (1 - tx) * gdot[2] + tx * gdot[3]) * sy
    return grad_plane, du.astype(u.dtype), dv.astype(v.dtype)


def _fracs_2d(plane_shape, u, v, align_corners):
    R, H, W = plane_shape
    if align_corners:
        fx = (u.astype(jnp.float32) + 1.0) * 0.5 * (W - 1)
        fy = (v.astype(jnp.float32) + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((u.astype(jnp.float32) + 1.0) * W - 1.0) * 0.5
        fy = ((v.astype(jnp.float32) + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    return x0, y0, fx - x0, fy - y0


grid_sample_2d_cf_vjp.defvjp(_gs2_fwd, _gs2_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_1d_cf_vjp(line, w, align_corners: bool = True):
    """grid_sample_1d_cf with a Pallas scatter-add line gradient."""
    return grid_sample_1d_cf(line, w, align_corners)


def _gs1_fwd(line, w, align_corners):
    return grid_sample_1d_cf(line, w, align_corners), (line, w)


def _gs1_bwd(align_corners, res, g):
    from ..kernels.scatter import scatter_add_auto

    line, w = res
    R, D = line.shape
    g = g.astype(jnp.float32)
    if align_corners:
        fx = (w.astype(jnp.float32) + 1.0) * 0.5 * (D - 1)
        s = 0.5 * (D - 1)
    else:
        fx = ((w.astype(jnp.float32) + 1.0) * D - 1.0) * 0.5
        s = 0.5 * D
    x0 = jnp.floor(fx).astype(jnp.int32)
    tx = fx - x0
    idxs, wgts = [], []
    for dx in (0, 1):
        xi = x0 + dx
        inb = ((xi >= 0) & (xi < D)).astype(jnp.float32)
        idxs.append(jnp.clip(xi, 0, D - 1))
        wgts.append((tx if dx else 1.0 - tx) * inb)
    idx = jnp.concatenate(idxs)
    vals = jnp.concatenate([(g * wg[None, :]).T for wg in wgts])  # [2B, R]
    grad_line = scatter_add_auto(idx, vals, D).T.astype(line.dtype)  # [R, D]

    inbs = [((x0 + dx >= 0) & (x0 + dx < D)).astype(jnp.float32) for dx in (0, 1)]
    gdot = [
        jnp.einsum("rb,rb->b", g, jnp.take(line.astype(jnp.float32), i, axis=1)) * ib
        for i, ib in zip(idxs, inbs)
    ]
    dw = (gdot[1] - gdot[0]) * s
    return grad_line, dw.astype(w.dtype)


grid_sample_1d_cf_vjp.defvjp(_gs1_fwd, _gs1_bwd)
