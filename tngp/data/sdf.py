"""SDF dataset: mesh loading, normalization, online point sampling with
ground-truth signed distances.

Behavioral reference: torch-ngp `sdf/provider.py:28-88` (SDFDataset):
  * normalize mesh to fit [-1, 1] (diagonal-scaled, 0.95 margin)
  * per step: 7/8 surface samples (second half perturbed by N(0, 0.01)),
    1/8 uniform in [-1,1]^3
  * sdf labels: 0 for pure surface points, `-sdf_fn(...)` for the rest
    (pysdf is positive-inside, so labels are positive OUTSIDE)

The trimesh/pysdf dependencies are replaced by the native BVH mesh ops
(tngp/native): same sampling distribution, same sign convention.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..native import MeshSDF, load_obj


def normalize_mesh(vertices: np.ndarray) -> np.ndarray:
    vmin, vmax = vertices.min(0), vertices.max(0)
    center = (vmin + vmax) / 2
    scale = 2.0 / np.sqrt(np.sum((vmax - vmin) ** 2)) * 0.95
    return ((vertices - center) * scale).astype(np.float32)


class SDFDataset:
    def __init__(
        self,
        path: Optional[str] = None,
        size: int = 100,
        num_samples: int = 2**18,
        clip_sdf: Optional[float] = None,
        vertices: Optional[np.ndarray] = None,
        faces: Optional[np.ndarray] = None,
    ):
        if path is not None:
            vertices, faces = load_obj(path)
        if vertices is None or faces is None:
            raise ValueError("need either path or (vertices, faces)")
        self.vertices = normalize_mesh(np.asarray(vertices, np.float32))
        self.faces = np.asarray(faces, np.int32)
        self.sdf_fn = MeshSDF(self.vertices, self.faces)
        assert num_samples % 8 == 0, "num_samples must be divisible by 8"
        self.num_samples = num_samples
        self.clip_sdf = clip_sdf
        self.size = size  # steps per epoch

    def sample(self, seed: int) -> Tuple[np.ndarray, np.ndarray]:
        """One training batch: (points [N, 3], sdfs [N, 1]) float32."""
        n = self.num_samples
        rng = np.random.default_rng(seed)
        surface = self.sdf_fn.sample_surface(n * 7 // 8, seed=seed)
        # global indices n/2 .. 7n/8 get gaussian perturbation (provider.py:70)
        surface[n // 2 :] += (
            0.01 * rng.standard_normal((n * 7 // 8 - n // 2, 3))
        ).astype(np.float32)
        uniform = (rng.random((n // 8, 3), dtype=np.float32) * 2 - 1).astype(np.float32)
        points = np.concatenate([surface, uniform]).astype(np.float32)

        sdfs = np.zeros((n, 1), np.float32)
        sdfs[n // 2 :, 0] = -self.sdf_fn(points[n // 2 :])
        if self.clip_sdf is not None:
            sdfs = sdfs.clip(-self.clip_sdf, self.clip_sdf)
        return points, sdfs
