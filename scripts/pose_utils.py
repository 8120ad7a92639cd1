"""Shared pose-normalization helpers for the dataset conversion scripts.

The reference repeats this block in colmap2nerf/llff2nerf/hyper2nerf
("the following stuff are from colmap2nerf...") — factored here once:
axis permutation into the nerf world convention, mean-camera-up alignment
to +z, recentering on the mutual focus point of all camera rays, and the
4/average-radius rescale.
"""

from __future__ import annotations

import numpy as np


def rotation_between(a, b):
    """Rotation matrix taking unit vector a to unit vector b (Rodrigues)."""
    a = a / (np.linalg.norm(a) + 1e-12)
    b = b / (np.linalg.norm(b) + 1e-12)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-8:  # antiparallel: perturb and retry
        return rotation_between(a + np.random.uniform(-1e-2, 1e-2, 3), b)
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + vx + vx @ vx / (1 + c)


def closest_point_2_lines(oa, da, ob, db):
    """Point closest to both rays (oa, da) and (ob, db), plus a weight."""
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    ta, tb = min(ta, 0), min(tb, 0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def normalize_world(poses: np.ndarray, w_thresh: float = 0.01) -> np.ndarray:
    """colmap2nerf-style normalization on a [N, 4, 4] c2w pose stack:
    flip camera y/z, swap world x/y, flip world z, align mean up to +z,
    recenter on the mutual ray focus, rescale to average radius 4."""
    poses = poses.copy()
    poses[:, 0:3, 1] *= -1
    poses[:, 0:3, 2] *= -1
    poses = poses[:, [1, 0, 2, 3], :]
    poses[:, 2, :] *= -1

    up = poses[:, 0:3, 1].sum(0)
    Rup = np.pad(rotation_between(up, np.array([0.0, 0.0, 1.0])), [(0, 1), (0, 1)])
    Rup[3, 3] = 1.0
    poses = Rup @ poses

    totw, totp = 0.0, np.zeros(3)
    N = poses.shape[0]
    for i in range(N):
        for j in range(i + 1, N):
            p, w = closest_point_2_lines(
                poses[i, :3, 3], poses[i, :3, 2], poses[j, :3, 3], poses[j, :3, 2]
            )
            if w > w_thresh:
                totp += p * w
                totw += w
    if totw > 0:
        poses[:, :3, 3] -= totp / totw
    avglen = np.linalg.norm(poses[:, :3, 3], axis=-1).mean()
    poses[:, :3, 3] *= 4.0 / max(avglen, 1e-6)
    return poses
