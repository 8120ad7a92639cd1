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


def dump_poses_ply(poses: np.ndarray, path: str, size: float = 0.1) -> None:
    """Headless stand-in for the reference's trimesh `visualize_poses`
    (scripts/llff2nerf.py:36-63, hyper2nerf.py:9-33): writes each camera as
    the same 9-segment frustum wireframe (4 corner rays, 4 image-plane edges,
    1 view-direction spike) plus a unit-bound box, as an ASCII PLY with edge
    elements — viewable in any mesh tool instead of an interactive window."""
    verts, edges = [], []

    def seg(a, b):
        edges.append((len(verts), len(verts) + 1))
        verts.extend([a, b])

    # [-1, 1]^3 bound box outline (reference draws a 2-extent box)
    corners = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], float
    )
    for i in range(8):
        for j in range(i + 1, 8):
            if np.sum(corners[i] != corners[j]) == 1:  # axis-aligned edge
                seg(corners[i], corners[j])

    for pose in poses:
        pos = pose[:3, 3]
        a = pos + size * pose[:3, 0] + size * pose[:3, 1] + size * pose[:3, 2]
        b = pos - size * pose[:3, 0] + size * pose[:3, 1] + size * pose[:3, 2]
        c = pos - size * pose[:3, 0] - size * pose[:3, 1] + size * pose[:3, 2]
        d = pos + size * pose[:3, 0] - size * pose[:3, 1] + size * pose[:3, 2]
        dir = (a + b + c + d) / 4 - pos
        dir = dir / (np.linalg.norm(dir) + 1e-8)
        o = pos + dir * 3
        for s, e in ((pos, a), (pos, b), (pos, c), (pos, d),
                     (a, b), (b, c), (c, d), (d, a), (pos, o)):
            seg(s, e)

    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element edge {len(edges)}\n"
            "property int vertex1\nproperty int vertex2\nend_header\n"
        )
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for e in edges:
            f.write(f"{e[0]} {e[1]}\n")


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
