#!/usr/bin/env python
"""Convert a Tanks&Temples scene (NSVF layout: pose/*.txt 4x4 c2w matrices,
intrinsics.txt, rgb/*.png) to instant-ngp `transforms.json` (capability parity
with scripts/tanks2nerf.py)."""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="scene root (contains pose/, rgb/, intrinsics.txt)")
    p.add_argument("--aabb_scale", type=int, default=2)
    args = p.parse_args()

    intr = np.loadtxt(os.path.join(args.path, "intrinsics.txt"))
    if intr.ndim == 2:  # 4x4 matrix form
        fl_x, fl_y = intr[0, 0], intr[1, 1]
        cx, cy = intr[0, 2], intr[1, 2]
    else:  # fx cx cy ... scalar form
        fl_x = fl_y = intr[0]
        cx, cy = intr[1], intr[2]

    pose_files = sorted(glob.glob(os.path.join(args.path, "pose", "*.txt")))
    img_files = sorted(
        glob.glob(os.path.join(args.path, "rgb", "*.png"))
        + glob.glob(os.path.join(args.path, "rgb", "*.jpg"))
    )
    assert len(pose_files) == len(img_files), (len(pose_files), len(img_files))

    import cv2

    H, W = cv2.imread(img_files[0]).shape[:2]

    frames = []
    for pf, imf in zip(pose_files, img_files):
        c2w = np.loadtxt(pf).reshape(4, 4)
        # NSVF camera: [right down forward] -> nerf [right up back]
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        frames.append({
            "file_path": os.path.relpath(imf, args.path),
            "transform_matrix": c2w.tolist(),
        })

    out = {
        "fl_x": float(fl_x), "fl_y": float(fl_y),
        "cx": float(cx), "cy": float(cy), "w": W, "h": H,
        "aabb_scale": args.aabb_scale, "frames": frames,
    }
    out_path = os.path.join(args.path, "transforms.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[tanks2nerf] wrote {out_path} with {len(frames)} frames")


if __name__ == "__main__":
    main()
