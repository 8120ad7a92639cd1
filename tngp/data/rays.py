"""Ray generation from camera poses — on-device, statically shaped.

Behavioral reference: torch-ngp `nerf/utils.py:53-136` (get_rays): pixel-center
offsets (+0.5), pinhole unprojection, normalized directions, random / error-map
weighted / patch sampling modes.  TPU note: the reference generates rays inside
the DataLoader collate on GPU; here ray sampling is a jitted function over the
preloaded pose/intrinsic stacks, called from inside the train step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pixel_dirs(i, j, intrinsics):
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    dirs = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("H", "W", "N", "patch_size"))
def sample_rays(
    key: jax.Array,
    pose: jax.Array,  # [4, 4] c2w (ngp convention)
    intrinsics: jax.Array,  # [4] fx fy cx cy
    H: int,
    W: int,
    N: int,
    error_map: jax.Array | None = None,  # [128*128] sampling weights
    patch_size: int = 1,
):
    """Sample N pixel rays from one camera. Returns dict with rays_o/rays_d
    [N, 3], inds [N] flat pixel indices (j*W + i ordering matches reference's
    row-major inds = x*W + y), and inds_coarse when error_map is given."""
    out = {}
    if patch_size > 1:
        num_patch = N // (patch_size**2)
        k1, k2 = jax.random.split(key)
        px = jax.random.randint(k1, (num_patch,), 0, H - patch_size)
        py = jax.random.randint(k2, (num_patch,), 0, W - patch_size)
        pi, pj = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size), indexing="ij")
        offs = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)  # [p^2, 2]
        coords = jnp.stack([px, py], axis=-1)[:, None, :] + offs[None, :, :]
        coords = coords.reshape(-1, 2)
        inds = coords[:, 0] * W + coords[:, 1]
    elif error_map is None:
        inds = jax.random.randint(key, (N,), 0, H * W)
    else:
        k1, k2, k3 = jax.random.split(key, 3)
        # weighted sample on the 128x128 error grid (without replacement in the
        # reference; with replacement here — identical in expectation)
        cdf = jnp.cumsum(jnp.maximum(error_map, 1e-12))
        u = jax.random.uniform(k1, (N,)) * cdf[-1]
        inds_coarse = jnp.clip(jnp.searchsorted(cdf, u), 0, 128 * 128 - 1)
        ix, iy = inds_coarse // 128, inds_coarse % 128
        sx, sy = H / 128.0, W / 128.0
        ix = jnp.clip((ix * sx + jax.random.uniform(k2, (N,)) * sx).astype(jnp.int32), 0, H - 1)
        iy = jnp.clip((iy * sy + jax.random.uniform(k3, (N,)) * sy).astype(jnp.int32), 0, W - 1)
        inds = ix * W + iy
        out["inds_coarse"] = inds_coarse

    jj = (inds // W).astype(jnp.float32) + 0.5  # row
    ii = (inds % W).astype(jnp.float32) + 0.5  # col
    dirs = _pixel_dirs(ii, jj, intrinsics)  # [N, 3]
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    out.update({"rays_o": rays_o, "rays_d": rays_d, "inds": inds})
    return out


@partial(jax.jit, static_argnames=("H", "W"))
def full_image_rays(pose: jax.Array, intrinsics: jax.Array, H: int, W: int):
    """All H*W rays in row-major order -> rays_o/rays_d [H*W, 3]."""
    jj, ii = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    dirs = _pixel_dirs(ii.reshape(-1), jj.reshape(-1), intrinsics)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d
