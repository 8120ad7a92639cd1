"""Synthetic analytic scene: dataset generator + ground-truth oracle.

The CI environment ships no nerf_synthetic data, so tests and benchmarks train
against procedurally generated views of an *analytic* radiance field (gaussian
blobs with position-dependent albedo).  Ground truth comes from dense uniform
quadrature through the true field — an oracle independent of the framework's
occupancy/marching machinery, so end-to-end PSNR climbing toward the oracle
validates the whole training stack.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..render import FieldFns, RenderConfig, render_rays_uniform
from .provider import NeRFDataset
from .rays import full_image_rays


def make_blob_field(seed: int = 0, n_blobs: int = 6, sigma_scale: float = 60.0) -> FieldFns:
    rng = np.random.default_rng(seed)
    centers = jnp.asarray(rng.uniform(-0.5, 0.5, (n_blobs, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.1, 0.25, (n_blobs,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0.2, 1.0, (n_blobs, 3)), jnp.float32)

    def _blob_w(x_cf):
        # x_cf: [3, B] -> per-blob gaussian weights [n, B] (channels-first)
        d2 = jnp.sum((x_cf[:, None, :] - centers.T[:, :, None]) ** 2, axis=0)  # [n, B]
        return jnp.exp(-d2 / (2 * radii[:, None] ** 2))

    def density(params, x_cf):
        return sigma_scale * jnp.sum(_blob_w(x_cf), axis=0)

    def sigma_rgb(params, x_cf, d_cf):
        w = _blob_w(x_cf)  # [n, B]
        sig = sigma_scale * jnp.sum(w, axis=0)
        rgb_cf = (colors.T @ w) / (jnp.sum(w, axis=0, keepdims=True) + 1e-6)  # [3, B]
        return sig, jnp.clip(rgb_cf, 0.0, 1.0)

    return FieldFns(sigma_rgb=sigma_rgb, density=density)


def orbit_poses(n: int, radius: float = 2.2, elevation: float = 0.45) -> np.ndarray:
    """Deterministic ring of cameras looking at the origin (ngp convention:
    camera looks down +z in its own frame, matching data/rays.py unprojection)."""
    poses = []
    for k in range(n):
        phi = 2 * np.pi * k / n
        theta = np.pi / 2 - elevation * np.sin(2 * phi + 0.7)
        c = radius * np.array(
            [np.sin(theta) * np.sin(phi), np.cos(theta), np.sin(theta) * np.cos(phi)]
        )
        forward = -c / np.linalg.norm(c)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, forward)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.stack([right, up2, forward], axis=-1)
        pose[:3, 3] = c
        poses.append(pose)
    return np.stack(poses)


def render_gt_images(
    field: FieldFns,
    poses: np.ndarray,
    intrinsics: np.ndarray,
    H: int,
    W: int,
    bound: float = 1.0,
    num_steps: int = 512,
    chunk: int = 8192,
) -> np.ndarray:
    cfg = RenderConfig(bound=bound, min_near=0.05)
    images = []

    @jax.jit
    def render_chunk(o, d):
        out = render_rays_uniform(field, None, o, d, cfg, num_steps=num_steps, upsample_steps=0)
        return out["image"]

    for pose in poses:
        o, d = full_image_rays(jnp.asarray(pose), jnp.asarray(intrinsics), H, W)
        pieces = []
        for s in range(0, o.shape[0], chunk):
            pieces.append(np.asarray(render_chunk(o[s : s + chunk], d[s : s + chunk])))
        images.append(np.concatenate(pieces).reshape(H, W, 3))
    return np.stack(images)


def make_synthetic_dataset(
    n_frames: int = 20,
    H: int = 128,
    W: int = 128,
    seed: int = 0,
    bound: float = 1.0,
    num_steps: int = 512,
) -> NeRFDataset:
    field = make_blob_field(seed)
    poses = orbit_poses(n_frames)
    focal = 0.9 * W
    intrinsics = np.array([focal, focal, W / 2, H / 2], np.float32)
    images = render_gt_images(field, poses, intrinsics, H, W, bound, num_steps)
    return NeRFDataset(
        poses=poses, intrinsics=intrinsics, H=H, W=W, images=images.astype(np.float32)
    )


def make_hard_field(seed: int = 0, n_shapes: int = 10, sharpness: float = 80.0) -> FieldFns:
    """Hard benchmark scene: solid sharp-surface shapes with high-frequency
    procedural textures (VERDICT: quality gate needs a harder scene than the
    soft blobs — sharp boundaries stress the marcher, fine texture stresses
    the fine hash levels)."""
    rng = np.random.default_rng(seed)
    centers = jnp.asarray(rng.uniform(-0.55, 0.55, (n_shapes, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.08, 0.22, (n_shapes,)), jnp.float32)
    base_col = jnp.asarray(rng.uniform(0.15, 0.95, (n_shapes, 3)), jnp.float32)
    tex_freq = jnp.asarray(rng.uniform(12.0, 42.0, (n_shapes, 3)), jnp.float32)
    tex_phase = jnp.asarray(rng.uniform(0, 2 * np.pi, (n_shapes, 3)), jnp.float32)
    # exponent p in [2, 6]: sphere -> rounded box (superellipsoid distance)
    powr = jnp.asarray(rng.uniform(2.0, 6.0, (n_shapes,)), jnp.float32)

    def _occupancy(x_cf):
        """[3, B] -> per-shape soft indicator [n, B] with sharp falloff."""
        d = jnp.abs(x_cf[:, None, :] - centers.T[:, :, None])  # [3, n, B]
        p = powr[None, :, None]
        dist = jnp.sum(d**p, axis=0) ** (1.0 / powr[:, None])  # [n, B]
        return jax.nn.sigmoid(sharpness * (radii[:, None] - dist) / radii[:, None])

    def density(params, x_cf):
        occ = _occupancy(x_cf)
        return 250.0 * jnp.sum(occ, axis=0)

    def sigma_rgb(params, x_cf, d_cf):
        occ = _occupancy(x_cf)  # [n, B]
        sig = 250.0 * jnp.sum(occ, axis=0)
        # high-frequency per-shape texture: product of sinusoids over dims
        ph = tex_freq.T[:, :, None] * x_cf[:, None, :] + tex_phase.T[:, :, None]
        tex = 0.62 + 0.38 * jnp.prod(jnp.sin(ph), axis=0)  # [n, B]
        cols = base_col.T[:, :, None] * tex[None, :, :]  # [3, n, B]
        wsum = jnp.sum(occ, axis=0, keepdims=True) + 1e-6
        rgb_cf = jnp.einsum("cnb,nb->cb", cols, occ) / wsum
        return sig, jnp.clip(rgb_cf, 0.0, 1.0)

    return FieldFns(sigma_rgb=sigma_rgb, density=density)


def make_hard_dataset(
    n_frames: int = 100,
    H: int = 256,
    W: int = 256,
    seed: int = 0,
    bound: float = 1.0,
    num_steps: int = 1024,
) -> NeRFDataset:
    """100-view 256^2 textured hard scene (the round-2 quality benchmark)."""
    field = make_hard_field(seed)
    poses = orbit_poses(n_frames)
    focal = 0.9 * W
    intrinsics = np.array([focal, focal, W / 2, H / 2], np.float32)
    images = render_gt_images(field, poses, intrinsics, H, W, bound, num_steps)
    return NeRFDataset(
        poses=poses, intrinsics=intrinsics, H=H, W=W, images=images.astype(np.float32)
    )


def make_time_blob_field(t: float, seed: int = 0, n_blobs: int = 4) -> FieldFns:
    """Analytic dynamic scene: blobs orbit the origin as a function of time."""
    base = make_blob_field(seed, n_blobs)
    ang = 0.6 * float(t)
    c, s = np.cos(ang), np.sin(ang)
    rot = jnp.asarray([[c, 0, -s], [0, 1, 0], [s, 0, c]], jnp.float32)

    def density(params, x_cf):
        return base.density(params, rot @ x_cf)

    def sigma_rgb(params, x_cf, d_cf):
        return base.sigma_rgb(params, rot @ x_cf, d_cf)

    return FieldFns(sigma_rgb=sigma_rgb, density=density)


def make_synthetic_dynamic_dataset(
    n_frames: int = 12,
    H: int = 64,
    W: int = 64,
    seed: int = 0,
    bound: float = 1.0,
    num_steps: int = 256,
) -> NeRFDataset:
    """Dynamic scene: each frame at time t in [0, 1] sees the rotated field."""
    poses = orbit_poses(n_frames)
    times = np.linspace(0.0, 1.0, n_frames).astype(np.float32)
    focal = 0.9 * W
    intrinsics = np.array([focal, focal, W / 2, H / 2], np.float32)
    images = []
    for pose, t in zip(poses, times):
        field = make_time_blob_field(float(t), seed)
        img = render_gt_images(field, pose[None], intrinsics, H, W, bound, num_steps)
        images.append(img[0])
    return NeRFDataset(
        poses=poses, intrinsics=intrinsics, H=H, W=W,
        images=np.stack(images).astype(np.float32), times=times,
    )
