"""Native (C++) runtime components, loaded via ctypes.

Mirrors the reference's JIT extension pattern (`gridencoder/backend.py:31-38`
builds CUDA extensions on first import); here a plain g++ shared library is
built on first use.  Components: mesh SDF (BVH closest-point + ray-parity
sign), area-weighted surface sampling, marching-tetrahedra isosurface
extraction.  See src/meshops.cpp.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "meshops.cpp")
_LIB = os.path.join(_DIR, "libmeshops.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
        "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.sdf_build.restype = ctypes.c_void_p
    lib.sdf_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int64,
    ]
    lib.sdf_free.argtypes = [ctypes.c_void_p]
    lib.sdf_query.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.sdf_sample_surface.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mt_extract.restype = ctypes.c_void_p
    lib.mt_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float,
    ]
    lib.mt_num_verts.restype = ctypes.c_int64
    lib.mt_num_verts.argtypes = [ctypes.c_void_p]
    lib.mt_num_faces.restype = ctypes.c_int64
    lib.mt_num_faces.argtypes = [ctypes.c_void_p]
    lib.mt_get.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)
    ]
    lib.mt_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


class MeshSDF:
    """Signed distance queries against a triangle mesh (positive inside,
    matching the pysdf convention used by sdf/provider.py)."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        self.vertices = np.ascontiguousarray(vertices, np.float32)
        self.faces = np.ascontiguousarray(faces, np.int32)
        lib = get_lib()
        self._h = lib.sdf_build(
            _fptr(self.vertices), len(self.vertices), _iptr(self.faces), len(self.faces)
        )

    def __call__(self, points: np.ndarray) -> np.ndarray:
        pts = np.ascontiguousarray(points, np.float32)
        out = np.empty(len(pts), np.float32)
        get_lib().sdf_query(self._h, _fptr(pts), len(pts), _fptr(out))
        return out

    def sample_surface(self, n: int, seed: int = 0) -> np.ndarray:
        out = np.empty((n, 3), np.float32)
        get_lib().sdf_sample_surface(self._h, n, seed, _fptr(out))
        return out

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                get_lib().sdf_free(self._h)
        except Exception:
            pass


def marching_tetrahedra(
    field: np.ndarray, iso: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso surface of a [X, Y, Z] scalar field (grid coordinates).

    Returns (vertices [V, 3] float32, faces [F, 3] int32)."""
    f = np.ascontiguousarray(field, np.float32)
    X, Y, Z = f.shape
    lib = get_lib()
    h = lib.mt_extract(_fptr(f), X, Y, Z, iso)
    nv, nf = lib.mt_num_verts(h), lib.mt_num_faces(h)
    verts = np.empty((nv, 3), np.float32)
    faces = np.empty((nf, 3), np.int32)
    if nv:
        lib.mt_get(h, _fptr(verts), _iptr(faces))
    lib.mt_free(h)
    return verts, faces


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ loader (v/f records, polygon fan triangulation)."""
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                verts.append([float(t) for t in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(t.split("/")[0]) - 1 for t in line.split()[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as fh:
        for v in vertices:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")


def save_ply(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    """Binary-less ascii PLY (what trimesh.export produced for the reference)."""
    with open(path, "w") as fh:
        fh.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(vertices)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        for v in vertices:
            fh.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces:
            fh.write(f"3 {f[0]} {f[1]} {f[2]}\n")
